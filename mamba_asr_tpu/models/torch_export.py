"""Export this package's flax params as reference PyTorch state_dicts.

The exact inverse of models/torch_import.py: a checkpoint trained here
can be loaded by the reference stack (SpeechBrain Checkpointer
`model.ckpt` of `nn.ModuleList([CNN, Transformer, (seq_lin,) ctc_lin])`,
/root/reference/hparams/CTC/conmamba_large.yaml:226 /
/root/reference/hparams/S2S/conmamba_large.yaml:321) or by any torch
code using the reference's module naming. Together with the importer
this closes the interchange loop in both directions: reference users can
consume TPU-trained weights, not just the other way around.

Every tensor orientation transform here is the inverse of the importer's
(Linear kernels transpose back to torch (out, in); depthwise conv taps
back to (D, 1, K); packed q/k/v re-concatenated into torch MHA
`in_proj_weight`). Completeness is enforced in both directions: the
exporter raises if any flax param leaf is left unconsumed (arch/config
mismatch), and the importer's consumption tracking guarantees the
exported dict has exactly the reference's key set — asserted by the
round-trip tests (tests/test_torch_export.py), which also strict-load
an export into independently-coded torch replicas and match forwards.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "export_asr_params",
    "export_lm_params",
    "export_normalizer_stats",
    "save_torch_asr",
    "save_torch_lm",
    "ParamTreeView",
]


def _as_np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


class ParamTreeView:
    """Consumption-tracked view of a flax params tree.

    Mirror of torch_import.StateDictView on the other side: `take`
    resolves a '/'-joined path and marks it used; `finalize` raises if
    any leaf was never consumed, so exporting a tree the reference
    layout cannot represent (extra heads, wrong module) fails loudly
    instead of silently dropping weights.
    """

    def __init__(self, params: Mapping[str, Any]):
        self._params = params
        self._used: set = set()
        self._leaves = set(self._walk(params, ()))

    @staticmethod
    def _walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                yield from ParamTreeView._walk(v, prefix + (str(k),))
        else:
            yield "/".join(prefix)

    def take(self, path: str) -> np.ndarray:
        node = self._params
        for part in path.split("/"):
            if not isinstance(node, Mapping) or part not in node:
                near = sorted(
                    leaf for leaf in self._leaves
                    if leaf.startswith(path.rsplit("/", 2)[0])
                )[:6]
                raise KeyError(
                    f"params tree missing '{path}' (nearby: {near})"
                )
            node = node[part]
        self._used.add(path)
        return _as_np(node)

    def has(self, path: str) -> bool:
        node = self._params
        for part in path.split("/"):
            if not isinstance(node, Mapping) or part not in node:
                return False
            node = node[part]
        return True

    def finalize(self):
        unused = sorted(self._leaves - self._used)
        if unused:
            raise ValueError(
                f"{len(unused)} param leaves were not exported (the "
                f"reference layout cannot hold them; first 10): "
                f"{unused[:10]}"
            )


# ---------------------------------------------------------------------------
# Sub-module exporters (each the inverse of its torch_import twin)
# ---------------------------------------------------------------------------


def _linear(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    out[f"{key}.weight"] = pt.take(f"{path}/kernel").T
    if pt.has(f"{path}/bias"):
        out[f"{key}.bias"] = pt.take(f"{path}/bias")


def _sb_linear(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    _linear(pt, path, f"{key}.w", out)


def _layer_norm(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    out[f"{key}.weight"] = pt.take(f"{path}/scale")
    out[f"{key}.bias"] = pt.take(f"{path}/bias")


def _sb_layer_norm(pt, path, key, out):
    _layer_norm(pt, path, f"{key}.norm", out)


def _pwff(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    _linear(pt, f"{path}/Dense_0", f"{key}.ffn.0", out)
    _linear(pt, f"{path}/Dense_1", f"{key}.ffn.3", out)


def _scan_head(pt: ParamTreeView, path: str, key: str, b: bool,
               out: Dict[str, Any]):
    sfx = "_b" if b else ""
    # ours (K, Din) -> torch depthwise conv1d weight (Din, 1, K)
    out[f"{key}.conv1d{sfx}.weight"] = pt.take(f"{path}/conv_w").T[:, None, :]
    if pt.has(f"{path}/conv_b"):
        out[f"{key}.conv1d{sfx}.bias"] = pt.take(f"{path}/conv_b")
    out[f"{key}.x_proj{sfx}.weight"] = pt.take(f"{path}/x_proj/kernel").T
    out[f"{key}.dt_proj{sfx}.weight"] = pt.take(f"{path}/dt_kernel").T
    out[f"{key}.dt_proj{sfx}.bias"] = pt.take(f"{path}/dt_bias")
    out[f"{key}.A_b_log" if b else f"{key}.A_log"] = pt.take(f"{path}/A_log")
    out[f"{key}.D{'_b' if b else ''}"] = pt.take(f"{path}/D")


def _mamba(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    _linear(pt, f"{path}/in_proj", f"{key}.in_proj", out)
    _linear(pt, f"{path}/out_proj", f"{key}.out_proj", out)
    _scan_head(pt, f"{path}/fwd", key, False, out)
    if pt.has(f"{path}/bwd"):
        _scan_head(pt, f"{path}/bwd", key, True, out)


def _conv_module(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    _layer_norm(pt, f"{path}/layer_norm", f"{key}.layer_norm", out)
    # Dense kernel (D, 2D) -> pointwise Conv1d weight (2D, D, 1)
    out[f"{key}.bottleneck.0.weight"] = (
        pt.take(f"{path}/bottleneck/kernel").T[:, :, None]
    )
    out[f"{key}.bottleneck.0.bias"] = pt.take(f"{path}/bottleneck/bias")
    # (K, D) -> depthwise Conv1d weight (D, 1, K)
    out[f"{key}.conv.weight"] = pt.take(f"{path}/dw_kernel").T[:, None, :]
    out[f"{key}.conv.bias"] = pt.take(f"{path}/dw_bias")
    _layer_norm(pt, f"{path}/after_norm", f"{key}.after_conv.0", out)
    _linear(pt, f"{path}/pointwise_out", f"{key}.after_conv.2", out)


def _merge_qkv(pt: ParamTreeView, path: str):
    ws, bs = [], []
    for name in ("q", "k", "v"):
        ws.append(pt.take(f"{path}/{name}/kernel").T)
        if pt.has(f"{path}/{name}/bias"):
            bs.append(pt.take(f"{path}/{name}/bias"))
    w = np.concatenate(ws, axis=0)
    b = np.concatenate(bs, axis=0) if bs else None
    return w, b


def _sb_mha(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    w, b = _merge_qkv(pt, path)
    out[f"{key}.att.in_proj_weight"] = w
    if b is not None:
        out[f"{key}.att.in_proj_bias"] = b
    _linear(pt, f"{path}/out", f"{key}.att.out_proj", out)


def _relpos_mha(pt: ParamTreeView, path: str, key: str, out: Dict[str, Any]):
    w, _ = _merge_qkv(pt, path)
    out[f"{key}.in_proj_weight"] = w
    _linear(pt, f"{path}/out", f"{key}.out_proj", out)
    out[f"{key}.linear_pos.weight"] = pt.take(f"{path}/pos/kernel").T
    # sb RelPosMHAXL stores (num_heads, head_dim) — our orientation.
    out[f"{key}.pos_bias_u"] = pt.take(f"{path}/pos_bias_u")
    out[f"{key}.pos_bias_v"] = pt.take(f"{path}/pos_bias_v")


def _conmamba_encoder_layer(pt, path, key, out):
    _layer_norm(pt, f"{path}/ffn1_norm", f"{key}.ffn_module1.0", out)
    _pwff(pt, f"{path}/ffn1", f"{key}.ffn_module1.1", out)
    _mamba(pt, f"{path}/mamba", f"{key}.mamba", out)
    _conv_module(pt, f"{path}/conv", f"{key}.convolution_module", out)
    _layer_norm(pt, f"{path}/ffn2_norm", f"{key}.ffn_module2.0", out)
    _pwff(pt, f"{path}/ffn2", f"{key}.ffn_module2.1", out)
    _sb_layer_norm(pt, f"{path}/norm1", f"{key}.norm1", out)
    _sb_layer_norm(pt, f"{path}/norm2", f"{key}.norm2", out)


def _conformer_encoder_layer(pt, path, key, attention_type, out):
    _layer_norm(pt, f"{path}/ffn1_norm", f"{key}.ffn_module1.0", out)
    _pwff(pt, f"{path}/ffn1", f"{key}.ffn_module1.1", out)
    if attention_type == "RelPosMHAXL":
        _relpos_mha(pt, f"{path}/mha", f"{key}.mha_layer", out)
    else:
        _sb_mha(pt, f"{path}/mha", f"{key}.mha_layer", out)
    _conv_module(pt, f"{path}/conv", f"{key}.convolution_module", out)
    _layer_norm(pt, f"{path}/ffn2_norm", f"{key}.ffn_module2.0", out)
    _pwff(pt, f"{path}/ffn2", f"{key}.ffn_module2.1", out)
    _sb_layer_norm(pt, f"{path}/norm1", f"{key}.norm1", out)
    _sb_layer_norm(pt, f"{path}/norm2", f"{key}.norm2", out)


def _transformer_encoder_layer(pt, path, key, out):
    _sb_mha(pt, f"{path}/self_att", f"{key}.self_att", out)
    _pwff(pt, f"{path}/ffn", f"{key}.pos_ffn", out)
    _sb_layer_norm(pt, f"{path}/norm1", f"{key}.norm1", out)
    _sb_layer_norm(pt, f"{path}/norm2", f"{key}.norm2", out)


def _transformer_decoder_layer(pt, path, key, out):
    _sb_mha(pt, f"{path}/self_attn", f"{key}.self_attn", out)
    _sb_mha(pt, f"{path}/cross_attn", f"{key}.multihead_attn", out)
    _pwff(pt, f"{path}/ffn", f"{key}.pos_ffn", out)
    _sb_layer_norm(pt, f"{path}/norm1", f"{key}.norm1", out)
    _sb_layer_norm(pt, f"{path}/norm2", f"{key}.norm2", out)
    _sb_layer_norm(pt, f"{path}/norm3", f"{key}.norm3", out)


def _mamba_decoder_layer(pt, path, key, out):
    _mamba(pt, f"{path}/self_mamba", f"{key}.self_mamba", out)
    _mamba(pt, f"{path}/cross_mamba", f"{key}.cross_mamba", out)
    _pwff(pt, f"{path}/pos_ffn", f"{key}.pos_ffn", out)
    _sb_layer_norm(pt, f"{path}/norm1", f"{key}.norm1", out)
    _sb_layer_norm(pt, f"{path}/norm2", f"{key}.norm2", out)
    _sb_layer_norm(pt, f"{path}/norm3", f"{key}.norm3", out)


def _frontend(pt: ParamTreeView, path: str, key: str, num_blocks: int,
              out: Dict[str, Any]):
    for i in range(num_blocks):
        blk = f"{key}.convblock_{i}.convs"
        # flax (kh, kw, I, O) -> torch conv2d (O, I, kh, kw)
        out[f"{blk}.conv_0.conv.weight"] = (
            pt.take(f"{path}/conv{i}/kernel").transpose(3, 2, 0, 1)
        )
        out[f"{blk}.conv_0.conv.bias"] = pt.take(f"{path}/conv{i}/bias")
        _sb_layer_norm(pt, f"{path}/norm{i}", f"{blk}.norm_0", out)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def export_asr_params(params: Mapping[str, Any], cfg) -> Dict[str, np.ndarray]:
    """ASRModel params tree -> reference `model` ModuleList state_dict.

    Accepts either layout: scanned encoder stacks (cfg.scan_layers) are
    converted to the unrolled per-layer form first. Raises if any param
    leaf cannot be represented in the reference naming (e.g. an encoder
    family the reference cannot construct).
    """
    if cfg.encoder_module not in ("conmamba", "conformer", "transformer"):
        raise ValueError(
            f"no torch checkpoint layout exists for encoder_module="
            f"{cfg.encoder_module!r} (the reference cannot construct it)"
        )
    params = dict(params)
    if "layer_0" not in params.get("encoder", {}) and cfg.num_encoder_layers:
        from mamba_asr_tpu.models.params_convert import convert_encoder_layout

        params = convert_encoder_layout(
            params, cfg.num_encoder_layers, to_scanned=False
        )
    pt = ParamTreeView(params)
    out: Dict[str, np.ndarray] = {}

    _frontend(pt, "frontend", "0", len(cfg.frontend_channels), out)
    _sb_linear(pt, "src_proj", "1.custom_src_module.layers.0", out)

    for i in range(cfg.num_encoder_layers):
        lp, key = f"encoder/layer_{i}", f"1.encoder.layers.{i}"
        if cfg.encoder_module == "conmamba":
            _conmamba_encoder_layer(pt, lp, key, out)
        elif cfg.encoder_module == "conformer":
            _conformer_encoder_layer(pt, lp, key, cfg.attention_type, out)
        else:
            _transformer_encoder_layer(pt, lp, key, out)
    _sb_layer_norm(pt, "encoder/norm", "1.encoder.norm", out)

    if cfg.num_decoder_layers > 0:
        out["1.custom_tgt_module.layers.0.emb.Embedding.weight"] = pt.take(
            "tgt_embed/embed/embedding"
        )
        for i in range(cfg.num_decoder_layers):
            lp, key = f"decoder/layer_{i}", f"1.decoder.layers.{i}"
            if cfg.decoder_module == "mamba":
                _mamba_decoder_layer(pt, lp, key, out)
            else:
                _transformer_decoder_layer(pt, lp, key, out)
        _sb_layer_norm(pt, "decoder/norm", "1.decoder.norm", out)
        _sb_linear(pt, "seq_head", "2", out)
        _sb_linear(pt, "ctc_head", "3", out)
    else:
        _sb_linear(pt, "ctc_head", "2", out)

    pt.finalize()
    return out


def export_lm_params(
    params: Mapping[str, Any], num_layers: int = 12
) -> Dict[str, np.ndarray]:
    """models.lm.TransformerLM params -> flat SpeechBrain TransformerLM
    state_dict (the layout the reference Pretrainer loads,
    /root/reference/hparams/S2S/conmamba_large.yaml:477-484)."""
    pt = ParamTreeView(params)
    out: Dict[str, np.ndarray] = {}
    out["custom_src_module.emb.Embedding.weight"] = pt.take(
        "embed/embed/embedding"
    )
    for i in range(num_layers):
        _transformer_encoder_layer(
            pt, f"encoder/layer_{i}", f"encoder.layers.{i}", out
        )
    _sb_layer_norm(pt, "encoder/norm", "encoder.norm", out)
    _sb_linear(pt, "out", "output_proj", out)
    pt.finalize()
    return out


def export_normalizer_stats(normalizer) -> Dict[str, np.ndarray]:
    """training.normalizer NormalizerState -> the dict layout sb
    InputNormalization saves (glob_mean/glob_std/count)."""
    count = float(np.asarray(normalizer.count))
    mean = _as_np(normalizer.mean)
    if count > 0:
        std = np.sqrt(_as_np(normalizer.m2) / count).astype(np.float32)
    else:
        std = np.ones_like(mean)
    return {
        "glob_mean": mean,
        "glob_std": std,
        "count": np.float32(count),
    }


def _torch_save(sd: Dict[str, np.ndarray], path: str):
    import torch  # optional dependency, as in torch_import

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)


def save_torch_asr(params, cfg, path: str):
    """Export + torch.save an ASR checkpoint the reference can load."""
    _torch_save(export_asr_params(params, cfg), path)


def save_torch_lm(params, path: str, num_layers: int = 12):
    _torch_save(export_lm_params(params, num_layers), path)
