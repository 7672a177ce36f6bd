"""Import reference PyTorch checkpoints (state_dicts) into flax pytrees.

The reference trains with SpeechBrain's Checkpointer, whose `model.ckpt`
is the state_dict of `torch.nn.ModuleList([CNN, Transformer, ctc_lin])`
for CTC configs (/root/reference/hparams/CTC/conmamba_large.yaml:226) or
`ModuleList([CNN, Transformer, seq_lin, ctc_lin])` for S2S configs
(/root/reference/hparams/S2S/conmamba_large.yaml:321); the decode-time
TransformerLM arrives flat via the Pretrainer
(/root/reference/train_S2S.py:1235-1236). This module maps those key
namespaces onto this package's flax parameter pytrees so a reference
checkpoint (or one converted from HF) drops straight into `ASRModel` /
`TransformerLM` — the one artifact needed to exercise the WER-parity
contract the moment real weights or a corpus become available.

Key naming sources:
- reference-local modules: attribute names read directly from
  /root/reference/modules/{TransformerASR,Transformer,Conformer,
  Conmamba}.py and /root/reference/modules/mamba/bimamba.py.
- SpeechBrain 1.0 wrappers (package absent from this image; conventions
  from its public source): `sb.nnet.linear.Linear` wraps nn.Linear as
  `.w`; `sb.nnet.normalization.LayerNorm` wraps as `.norm`;
  `sb.nnet.attention.MultiheadAttention` wraps torch MHA as `.att`
  (packed `in_proj_weight`/`in_proj_bias`, `out_proj`);
  `sb.nnet.attention.RelPosMHAXL` holds packed `in_proj_weight` (3E, E,
  no bias), `linear_pos` (nn.Linear, no bias), `out_proj` (nn.Linear),
  `pos_bias_u`/`pos_bias_v`; `ConvolutionFrontEnd` blocks are
  `convblock_{i}.convs.{conv_0 (.conv), norm_0 (.norm)}`;
  `sb.nnet.embedding.Embedding` wraps nn.Embedding as `.Embedding`.
  Where upstream stores a transposable parameter in the opposite
  orientation (pos_bias_*), shapes disambiguate at import time.

Every weight is converted to float32 numpy; Linear kernels transpose
from torch (out, in) to flax (in, out); depthwise conv taps keep their
time orientation (torch left-pad K-1 and ops.causal_conv1d agree that
the LAST tap multiplies the current frame).

Returned ASR trees use the *unrolled* per-layer layout (`layer_{i}`);
convert with models.params_convert.unrolled_to_scanned for
`scan_layers=true` models.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "import_asr_params",
    "import_lm_params",
    "import_normalizer_stats",
    "load_torch_asr",
    "load_torch_lm",
    "StateDictView",
]


def _as_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class StateDictView:
    """Consumption-tracked view of a torch state_dict.

    `take` marks keys used; `finalize` raises if any non-ignorable key
    was never consumed (catches silent arch/config mismatches, the
    classic failure mode of name-mapping importers).
    """

    def __init__(self, sd: Mapping[str, Any]):
        self._sd = dict(sd)
        self._used: set = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self._sd:
            raise KeyError(
                f"state_dict missing '{key}' "
                f"(nearby: {[k for k in self._sd if k.startswith(key.rsplit('.', 2)[0])][:6]})"
            )
        self._used.add(key)
        return _as_np(self._sd[key])

    def has(self, key: str) -> bool:
        return key in self._sd

    def finalize(self, ignore_substrings=(".pe", "positional_encoding")):
        unused = [
            k
            for k in self._sd
            if k not in self._used
            and not any(s in k for s in ignore_substrings)
        ]
        if unused:
            raise ValueError(
                f"{len(unused)} state_dict keys were not consumed by the "
                f"import (first 10): {sorted(unused)[:10]}"
            )

    # -- wrapper-aware helpers -------------------------------------------

    def linear(self, key: str) -> Dict[str, np.ndarray]:
        """nn.Linear at `key` -> flax Dense dict (kernel transposed)."""
        out = {"kernel": self.take(f"{key}.weight").T}
        if self.has(f"{key}.bias"):
            out["bias"] = self.take(f"{key}.bias")
        return out

    def sb_linear(self, key: str) -> Dict[str, np.ndarray]:
        """speechbrain.nnet.linear.Linear wraps nn.Linear as `.w`."""
        return self.linear(f"{key}.w")

    def layer_norm(self, key: str) -> Dict[str, np.ndarray]:
        """Plain torch nn.LayerNorm -> flax LayerNorm dict."""
        return {
            "scale": self.take(f"{key}.weight"),
            "bias": self.take(f"{key}.bias"),
        }

    def sb_layer_norm(self, key: str) -> Dict[str, np.ndarray]:
        """speechbrain LayerNorm wraps nn.LayerNorm as `.norm`."""
        return self.layer_norm(f"{key}.norm")


# ---------------------------------------------------------------------------
# Sub-module importers
# ---------------------------------------------------------------------------


def _pwff(sd: StateDictView, key: str) -> Dict[str, Any]:
    """sb PositionalwiseFeedForward: .ffn = Sequential(Linear, act,
    Dropout, Linear) -> our two Dense layers."""
    return {
        "Dense_0": sd.linear(f"{key}.ffn.0"),
        "Dense_1": sd.linear(f"{key}.ffn.3"),
    }


def _scan_head(sd: StateDictView, prefix: str, b: bool) -> Dict[str, Any]:
    """One scan direction of (Bi)Mamba -> our _ScanHead params.

    Reference names (/root/reference/modules/mamba/bimamba.py:137-174):
    fwd = conv1d / x_proj / dt_proj / A_log / D; the backward direction
    appends `_b` (conv1d_b, ..., A_b_log, D_b).
    """
    sfx = "_b" if b else ""
    a_key = f"{prefix}.A_b_log" if b else f"{prefix}.A_log"
    head = {
        # torch depthwise conv1d weight (Din, 1, K) -> ours (K, Din);
        # both orient tap K-1 at the current frame (left pad K-1).
        "conv_w": sd.take(f"{prefix}.conv1d{sfx}.weight")[:, 0, :].T,
        "x_proj": {"kernel": sd.take(f"{prefix}.x_proj{sfx}.weight").T},
        "dt_kernel": sd.take(f"{prefix}.dt_proj{sfx}.weight").T,
        "dt_bias": sd.take(f"{prefix}.dt_proj{sfx}.bias"),
        "A_log": sd.take(a_key),
        "D": sd.take(f"{prefix}.D{'_b' if b else ''}"),
    }
    if sd.has(f"{prefix}.conv1d{sfx}.bias"):
        head["conv_b"] = sd.take(f"{prefix}.conv1d{sfx}.bias")
    return head


def _mamba(sd: StateDictView, prefix: str, bidirectional: bool) -> Dict[str, Any]:
    """(Bi)Mamba mixer -> our MambaBlock/BiMambaBlock subtree."""
    out = {
        "in_proj": sd.linear(f"{prefix}.in_proj"),
        "out_proj": sd.linear(f"{prefix}.out_proj"),
        "fwd": _scan_head(sd, prefix, b=False),
    }
    if bidirectional:
        out["bwd"] = _scan_head(sd, prefix, b=True)
    return out


def _conv_module(sd: StateDictView, prefix: str) -> Dict[str, Any]:
    """Conformer/ConMamba ConvolutionModule
    (/root/reference/modules/Conmamba.py:268-307): layer_norm ->
    bottleneck Conv1d(k=1, 2x)+GLU -> depthwise k31 -> LN+Swish+Linear."""
    return {
        "layer_norm": sd.layer_norm(f"{prefix}.layer_norm"),
        # pointwise Conv1d weight (2D, D, 1) -> Dense kernel (D, 2D)
        "bottleneck": {
            "kernel": sd.take(f"{prefix}.bottleneck.0.weight")[:, :, 0].T,
            "bias": sd.take(f"{prefix}.bottleneck.0.bias"),
        },
        # depthwise Conv1d weight (D, 1, K) -> (K, D)
        "dw_kernel": sd.take(f"{prefix}.conv.weight")[:, 0, :].T,
        "dw_bias": sd.take(f"{prefix}.conv.bias"),
        "after_norm": sd.layer_norm(f"{prefix}.after_conv.0"),
        "pointwise_out": sd.linear(f"{prefix}.after_conv.2"),
    }


def _split_qkv(w: np.ndarray, b=None):
    """Packed torch (3E, E) in_proj -> q/k/v flax Dense dicts."""
    e = w.shape[1]
    parts = {}
    for i, name in enumerate(("q", "k", "v")):
        d = {"kernel": w[i * e : (i + 1) * e].T}
        if b is not None:
            d["bias"] = b[i * e : (i + 1) * e]
        parts[name] = d
    return parts


def _sb_mha(sd: StateDictView, prefix: str) -> Dict[str, Any]:
    """sb MultiheadAttention wraps torch nn.MultiheadAttention as
    `.att` -> our {q, k, v, out} Dense tree."""
    w = sd.take(f"{prefix}.att.in_proj_weight")
    b = (
        sd.take(f"{prefix}.att.in_proj_bias")
        if sd.has(f"{prefix}.att.in_proj_bias")
        else None
    )
    out = _split_qkv(w, b)
    out["out"] = sd.linear(f"{prefix}.att.out_proj")
    return out


def _relpos_mha(sd: StateDictView, prefix: str, nhead: int) -> Dict[str, Any]:
    """sb RelPosMHAXL -> our RelPosMHAXL {q,k,v,pos,out,pos_bias_u/v}."""
    out = _split_qkv(sd.take(f"{prefix}.in_proj_weight"))
    out["out"] = sd.linear(f"{prefix}.out_proj")
    out["pos"] = {"kernel": sd.take(f"{prefix}.linear_pos.weight").T}
    for name in ("pos_bias_u", "pos_bias_v"):
        p = sd.take(f"{prefix}.{name}")
        if p.shape[0] != nhead:  # stored (head_dim, nhead)
            p = p.T
        out[name] = p
    return out


def _conmamba_encoder_layer(
    sd: StateDictView, prefix: str, bidirectional: bool
) -> Dict[str, Any]:
    """/root/reference/modules/Conmamba.py:565-650. ffn_module{1,2} =
    Sequential(nn.LayerNorm, PWFF, Dropout); norm1/2 are sb LayerNorm."""
    return {
        "ffn1_norm": sd.layer_norm(f"{prefix}.ffn_module1.0"),
        "ffn1": _pwff(sd, f"{prefix}.ffn_module1.1"),
        "mamba": _mamba(sd, f"{prefix}.mamba", bidirectional),
        "conv": _conv_module(sd, f"{prefix}.convolution_module"),
        "ffn2_norm": sd.layer_norm(f"{prefix}.ffn_module2.0"),
        "ffn2": _pwff(sd, f"{prefix}.ffn_module2.1"),
        "norm1": sd.sb_layer_norm(f"{prefix}.norm1"),
        "norm2": sd.sb_layer_norm(f"{prefix}.norm2"),
    }


def _conformer_encoder_layer(
    sd: StateDictView, prefix: str, nhead: int, attention_type: str
) -> Dict[str, Any]:
    """/root/reference/modules/Conformer.py:1511-1630 (same ffn/conv
    skeleton as ConMamba, `mha_layer` in place of `mamba`)."""
    if attention_type == "RelPosMHAXL":
        mha = _relpos_mha(sd, f"{prefix}.mha_layer", nhead)
    else:
        mha = _sb_mha(sd, f"{prefix}.mha_layer")
    return {
        "ffn1_norm": sd.layer_norm(f"{prefix}.ffn_module1.0"),
        "ffn1": _pwff(sd, f"{prefix}.ffn_module1.1"),
        "mha": mha,
        "conv": _conv_module(sd, f"{prefix}.convolution_module"),
        "ffn2_norm": sd.layer_norm(f"{prefix}.ffn_module2.0"),
        "ffn2": _pwff(sd, f"{prefix}.ffn_module2.1"),
        "norm1": sd.sb_layer_norm(f"{prefix}.norm1"),
        "norm2": sd.sb_layer_norm(f"{prefix}.norm2"),
    }


def _transformer_encoder_layer(sd: StateDictView, prefix: str) -> Dict[str, Any]:
    """/root/reference/modules/Transformer.py:1069-1194 (regularMHA,
    regularFFN — the shipped LM/decoder configuration)."""
    return {
        "self_att": _sb_mha(sd, f"{prefix}.self_att"),
        "ffn": _pwff(sd, f"{prefix}.pos_ffn"),
        "norm1": sd.sb_layer_norm(f"{prefix}.norm1"),
        "norm2": sd.sb_layer_norm(f"{prefix}.norm2"),
    }


def _transformer_decoder_layer(sd: StateDictView, prefix: str) -> Dict[str, Any]:
    """/root/reference/modules/Transformer.py:1347-1524: self_attn,
    multihead_attn (cross), pos_ffn, norm1/2/3."""
    return {
        "self_attn": _sb_mha(sd, f"{prefix}.self_attn"),
        "cross_attn": _sb_mha(sd, f"{prefix}.multihead_attn"),
        "ffn": _pwff(sd, f"{prefix}.pos_ffn"),
        "norm1": sd.sb_layer_norm(f"{prefix}.norm1"),
        "norm2": sd.sb_layer_norm(f"{prefix}.norm2"),
        "norm3": sd.sb_layer_norm(f"{prefix}.norm3"),
    }


def _mamba_decoder_layer(sd: StateDictView, prefix: str) -> Dict[str, Any]:
    """/root/reference/modules/Conmamba.py:839-953: self_mamba,
    cross_mamba (both unidirectional), pos_ffn, norm1/2/3."""
    return {
        "self_mamba": _mamba(sd, f"{prefix}.self_mamba", bidirectional=False),
        "cross_mamba": _mamba(sd, f"{prefix}.cross_mamba", bidirectional=False),
        "pos_ffn": _pwff(sd, f"{prefix}.pos_ffn"),
        "norm1": sd.sb_layer_norm(f"{prefix}.norm1"),
        "norm2": sd.sb_layer_norm(f"{prefix}.norm2"),
        "norm3": sd.sb_layer_norm(f"{prefix}.norm3"),
    }


def _frontend(sd: StateDictView, prefix: str, num_blocks: int) -> Dict[str, Any]:
    """sb ConvolutionFrontEnd: convblock_{i}.convs.conv_0 (sb Conv2d ->
    `.conv`) + norm_0 (sb LayerNorm). torch conv2d weight (O, I, kh, kw)
    -> flax (kh, kw, I, O)."""
    out = {}
    for i in range(num_blocks):
        blk = f"{prefix}.convblock_{i}.convs"
        out[f"conv{i}"] = {
            "kernel": sd.take(f"{blk}.conv_0.conv.weight").transpose(2, 3, 1, 0),
            "bias": sd.take(f"{blk}.conv_0.conv.bias"),
        }
        out[f"norm{i}"] = sd.sb_layer_norm(f"{blk}.norm_0")
    return out


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def import_asr_params(state_dict: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Reference `model` ModuleList state_dict -> ASRModel params tree.

    cfg: models.asr.ASRConfig for the matching architecture. Returns the
    unrolled (`layer_{i}`) encoder layout; apply
    params_convert.unrolled_to_scanned for scanned models. Raises if the
    state_dict has missing or extra parameter keys.
    """
    sd = StateDictView(state_dict)
    params: Dict[str, Any] = {}

    params["frontend"] = _frontend(sd, "0", len(cfg.frontend_channels))
    params["src_proj"] = sd.sb_linear("1.custom_src_module.layers.0")

    enc: Dict[str, Any] = {}
    for i in range(cfg.num_encoder_layers):
        lp = f"1.encoder.layers.{i}"
        if cfg.encoder_module == "conmamba":
            enc[f"layer_{i}"] = _conmamba_encoder_layer(
                sd, lp, cfg.bidirectional and not cfg.causal
            )
        elif cfg.encoder_module == "conformer":
            enc[f"layer_{i}"] = _conformer_encoder_layer(
                sd, lp, cfg.nhead, cfg.attention_type
            )
        elif cfg.encoder_module == "transformer":
            enc[f"layer_{i}"] = _transformer_encoder_layer(sd, lp)
        else:
            # branchformer: the reference cannot CONSTRUCT this encoder
            # (NameError at /root/reference/modules/Transformer.py:728),
            # so no reference checkpoint with branchformer weights can
            # exist to import.
            raise ValueError(
                f"no torch checkpoint layout exists for encoder_module="
                f"{cfg.encoder_module!r}"
            )
    enc["norm"] = sd.sb_layer_norm("1.encoder.norm")
    params["encoder"] = enc

    if cfg.num_decoder_layers > 0:
        params["tgt_embed"] = {
            "embed": {
                "embedding": sd.take(
                    "1.custom_tgt_module.layers.0.emb.Embedding.weight"
                )
            }
        }
        dec: Dict[str, Any] = {}
        for i in range(cfg.num_decoder_layers):
            lp = f"1.decoder.layers.{i}"
            if cfg.decoder_module == "mamba":
                dec[f"layer_{i}"] = _mamba_decoder_layer(sd, lp)
            else:
                dec[f"layer_{i}"] = _transformer_decoder_layer(sd, lp)
        dec["norm"] = sd.sb_layer_norm("1.decoder.norm")
        params["decoder"] = dec
        # S2S ModuleList: [CNN, Transformer, seq_lin, ctc_lin]
        params["seq_head"] = sd.sb_linear("2")
        params["ctc_head"] = sd.sb_linear("3")
    else:
        # CTC ModuleList: [CNN, Transformer, ctc_lin]
        params["ctc_head"] = sd.sb_linear("2")

    sd.finalize()
    return params


def import_lm_params(
    state_dict: Mapping[str, Any], num_layers: int = 12
) -> Dict[str, Any]:
    """SpeechBrain TransformerLM state_dict (flat, as the Pretrainer
    loads it — /root/reference/hparams/S2S/conmamba_large.yaml:477-484)
    -> our models.lm.TransformerLM params tree.

    sb lobes TransformerLM: custom_src_module = NormalizedEmbedding,
    encoder = TransformerEncoder (regularMHA), output_proj = sb Linear.
    """
    sd = StateDictView(state_dict)
    enc: Dict[str, Any] = {}
    for i in range(num_layers):
        enc[f"layer_{i}"] = _transformer_encoder_layer(
            sd, f"encoder.layers.{i}"
        )
    enc["norm"] = sd.sb_layer_norm("encoder.norm")
    params = {
        "embed": {
            "embed": {
                "embedding": sd.take("custom_src_module.emb.Embedding.weight")
            }
        },
        "encoder": enc,
        "out": sd.sb_linear("output_proj"),
    }
    sd.finalize()
    return params


def import_normalizer_stats(obj: Mapping[str, Any]):
    """sb InputNormalization saved stats (glob_mean/glob_std/count) ->
    (mean, std, count) float32 arrays for training.normalizer."""
    mean = _as_np(obj["glob_mean"])
    std = _as_np(obj["glob_std"])
    count = float(_as_np(obj.get("count", np.float32(0.0))).reshape(-1)[0])
    return mean, std, count


_SCAN_INNER_KEY = {
    "conmamba": "ConmambaEncoderLayer_0",
    "conformer": "ConformerEncoderLayer_0",
    "branchformer": "BranchformerEncoderLayer_0",
}


def load_torch_asr(path_or_sd, cfg) -> Dict[str, Any]:
    """One-call user entry: reference `model.ckpt` (path or state_dict)
    -> this package's ASRModel params in the MODEL's layout (scanned
    encoder stack when cfg.scan_layers). This is the executable form of
    the reference's Pretrainer contract
    (/root/reference/train_S2S.py:1235-1236): point `--torch_ckpt` at a
    reference checkpoint in recognize.py / evaluate.py and decode.

    cfg: models.asr.ASRConfig.
    """
    sd = _load_state_dict(path_or_sd)
    params = import_asr_params(sd, cfg)
    if getattr(cfg, "scan_layers", False):
        from mamba_asr_tpu.models.params_convert import unrolled_to_scanned

        params["encoder"] = unrolled_to_scanned(
            params["encoder"],
            cfg.num_encoder_layers,
            inner_key=_SCAN_INNER_KEY[cfg.encoder_module],
        )
    return params


def load_torch_lm(path_or_sd, num_layers: int = 12) -> Dict[str, Any]:
    """Reference TransformerLM checkpoint (path or flat state_dict, as
    the Pretrainer fetches it) -> our TransformerLM params tree."""
    return import_lm_params(_load_state_dict(path_or_sd), num_layers)


def _load_state_dict(path_or_sd) -> Mapping[str, Any]:
    if not isinstance(path_or_sd, (str, bytes)):
        return path_or_sd
    import torch  # the one optional torch dependency ([torch-import])

    obj = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    # SpeechBrain Checkpointer saves the bare state_dict; tolerate the
    # common {"model": state_dict} / {"state_dict": ...} wrappers too.
    for key in ("state_dict", "model"):
        if key in obj and isinstance(obj[key], Mapping):
            obj = obj[key]
            break
    return obj
