"""Round-trip test of the reference-checkpoint importer.

Builds torch modules whose parameter NAMES mirror the reference's saved
`model` ModuleList exactly (attribute names from
/root/reference/modules/*.py + SpeechBrain wrapper conventions, see
models/torch_import.py) and whose forwards independently implement the
documented math. Then: `state_dict()` -> import_asr_params /
import_lm_params -> flax apply, asserting the two frameworks produce the
same outputs. This exercises every mapping the importer performs —
kernel transposes, packed-qkv splits, conv tap orientation, GLU halves,
the fwd/bwd BiMamba parameter suffixes — for all four architecture
families the 9 reference configs use (ConMamba-CTC, Conformer-CTC,
ConMamba+Transformer-decoder S2S, ConMambaMamba S2S) plus the
TransformerLM.

Known sub-tolerance deviations vs a REAL SpeechBrain checkpoint (not
exercised here, both < 1e-4 relative): flax LayerNorm eps 1e-6 vs
torch's 1e-5 default in some reference norms; this file pins the torch
replica to eps=1e-6 to isolate mapping errors from epsilon noise.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.lm import TransformerLM
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.models.torch_import import (
    import_asr_params,
    import_lm_params,
)
from tests.test_reference_parity import _t_selective_scan

@pytest.fixture(autouse=True)
def _torch_no_grad():
    """Scope grad-off to this module: a module-level
    torch.set_grad_enabled(False) leaks into later test modules
    (test_reference_parity drives torch autograd) in a combined run."""
    prev = torch.is_grad_enabled()
    torch.set_grad_enabled(False)
    yield
    torch.set_grad_enabled(prev)

EPS = 1e-6  # match flax LayerNorm


def _ln(d):
    return nn.LayerNorm(d, eps=EPS)


def _randomize(module: nn.Module, seed: int):
    """Moderate-scale random parameters (keeps scans/softmaxes sane)."""
    g = torch.Generator().manual_seed(seed)
    for name, p in module.named_parameters():
        if name.endswith("A_log") or name.endswith("A_b_log"):
            p.copy_(torch.log(
                0.5 + 1.5 * torch.rand(p.shape, generator=g)
            ))
        elif "dt_proj" in name and name.endswith("bias"):
            p.copy_(0.1 * torch.randn(p.shape, generator=g) - 2.0)
        elif name.endswith(".D") or name.endswith(".D_b") or name.split(".")[-1] in ("D", "D_b"):
            p.copy_(1.0 + 0.1 * torch.randn(p.shape, generator=g))
        elif "pos_bias" in name:
            p.copy_(0.2 * torch.randn(p.shape, generator=g))
        elif p.ndim >= 2:
            p.copy_(torch.randn(p.shape, generator=g) * p.shape[-1] ** -0.5)
        else:
            p.copy_(0.1 * torch.randn(p.shape, generator=g))


# ---------------------------------------------------------------------------
# SpeechBrain wrapper replicas (naming parity)
# ---------------------------------------------------------------------------


class SBLinear(nn.Module):
    def __init__(self, i, o, bias=True):
        super().__init__()
        self.w = nn.Linear(i, o, bias=bias)

    def forward(self, x):
        return self.w(x)


class SBLayerNorm(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.norm = _ln(d)

    def forward(self, x):
        return self.norm(x)


class SBModuleList(nn.Module):
    def __init__(self, *mods):
        super().__init__()
        self.layers = nn.ModuleList(mods)

    def forward(self, x):
        for m in self.layers:
            x = m(x)
        return x


class SBEmbedding(nn.Module):
    def __init__(self, vocab, d):
        super().__init__()
        self.Embedding = nn.Embedding(vocab, d)

    def forward(self, x):
        return self.Embedding(x)


class NormalizedEmbedding(nn.Module):
    """Transformer.py:1851-1860: embedding * sqrt(d_model)."""

    def __init__(self, d, vocab):
        super().__init__()
        self.emb = SBEmbedding(vocab, d)
        self.d = d

    def forward(self, x):
        return self.emb(x) * math.sqrt(self.d)


class PositionalwiseFeedForward(nn.Module):
    def __init__(self, d_model, d_ffn, act):
        super().__init__()
        self.ffn = nn.Sequential(
            nn.Linear(d_model, d_ffn), act(), nn.Dropout(0.0),
            nn.Linear(d_ffn, d_model),
        )

    def forward(self, x):
        return self.ffn(x)


class SBMultiheadAttention(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.att = nn.MultiheadAttention(d, h, batch_first=True)

    def forward(self, q, k, v, attn_mask=None, key_padding_mask=None):
        out, _ = self.att(
            q, k, v, attn_mask=attn_mask,
            key_padding_mask=key_padding_mask, need_weights=False,
        )
        return out


class RelPosMHAXL(nn.Module):
    """sb RelPosMHAXL parameter surface; Transformer-XL scoring."""

    def __init__(self, d, h):
        super().__init__()
        self.in_proj_weight = nn.Parameter(torch.empty(3 * d, d))
        self.linear_pos = nn.Linear(d, d, bias=False)
        self.out_proj = nn.Linear(d, d)
        self.pos_bias_u = nn.Parameter(torch.empty(h, d // h))
        self.pos_bias_v = nn.Parameter(torch.empty(h, d // h))
        self.h = h

    def forward(self, x, pos_embs):
        bsz, length, d = x.shape
        h, dh = self.h, d // self.h
        q, k, v = (x @ self.in_proj_weight.t()).chunk(3, dim=-1)
        q = q.view(bsz, length, h, dh)
        k = k.view(bsz, length, h, dh)
        v = v.view(bsz, length, h, dh)
        p = self.linear_pos(pos_embs).view(-1, h, dh)  # (2L-1, h, dh)
        content = torch.einsum("bqhd,bkhd->bhqk", q + self.pos_bias_u, k)
        pos_all = torch.einsum("bqhd,rhd->bhqr", q + self.pos_bias_v, p)
        x2 = F.pad(pos_all, (0, 1)).reshape(bsz, h, length * 2 * length)
        x2 = x2[:, :, length - 1 : length - 1 + length * (2 * length - 1)]
        pos_score = x2.reshape(bsz, h, length, 2 * length - 1)[..., :length]
        attn = ((content + pos_score) / math.sqrt(dh)).softmax(-1)
        out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bsz, length, d)
        return self.out_proj(out)


# ---------------------------------------------------------------------------
# Mamba replicas (reference bimamba.py parameter names)
# ---------------------------------------------------------------------------


def _causal_conv_silu(x, conv):
    """x (B, L, Din); conv: depthwise nn.Conv1d(k, groups=Din)."""
    k = conv.kernel_size[0]
    xp = F.pad(x.transpose(1, 2), (k - 1, 0))
    y = F.conv1d(xp, conv.weight, bias=conv.bias, groups=conv.in_channels)
    return F.silu(y.transpose(1, 2))


def _head_forward(x, z, conv, x_proj, dt_proj, A_log, D, dt_rank, d_state):
    xc = _causal_conv_silu(x, conv)
    dbl = x_proj(xc)
    dt, bm, cm = torch.split(dbl, [dt_rank, d_state, d_state], dim=-1)
    delta = dt @ dt_proj.weight.t()
    return _t_selective_scan(
        xc, delta, -torch.exp(A_log), bm, cm, D, z, dt_proj.bias
    )


class RefMamba(nn.Module):
    """Unidirectional Mamba (bimamba.py type 'none' / mamba_ssm Mamba)."""

    def __init__(self, d_model, d_state, d_conv, expand, dt_rank):
        super().__init__()
        din = expand * d_model
        self.d_state, self.dt_rank = d_state, dt_rank
        self.in_proj = nn.Linear(d_model, 2 * din, bias=False)
        self.conv1d = nn.Conv1d(din, din, d_conv, groups=din, bias=True)
        self.x_proj = nn.Linear(din, dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(dt_rank, din, bias=True)
        self.A_log = nn.Parameter(torch.empty(din, d_state))
        self.D = nn.Parameter(torch.empty(din))
        self.out_proj = nn.Linear(din, d_model, bias=False)

    def forward(self, x):
        xin, z = self.in_proj(x).chunk(2, dim=-1)
        y = _head_forward(
            xin, z, self.conv1d, self.x_proj, self.dt_proj, self.A_log,
            self.D, self.dt_rank, self.d_state,
        )
        return self.out_proj(y)


class RefBiMamba(nn.Module):
    """BiMamba v2 (bimamba.py:146-253): shared in/out proj, per-direction
    conv/x_proj/dt_proj/A_log/D (backward = `_b` names), 0.5 combine."""

    def __init__(self, d_model, d_state, d_conv, expand, dt_rank):
        super().__init__()
        din = expand * d_model
        self.d_state, self.dt_rank = d_state, dt_rank
        self.in_proj = nn.Linear(d_model, 2 * din, bias=False)
        self.out_proj = nn.Linear(din, d_model, bias=False)
        self.conv1d = nn.Conv1d(din, din, d_conv, groups=din, bias=True)
        self.x_proj = nn.Linear(din, dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(dt_rank, din, bias=True)
        self.A_log = nn.Parameter(torch.empty(din, d_state))
        self.D = nn.Parameter(torch.empty(din))
        self.conv1d_b = nn.Conv1d(din, din, d_conv, groups=din, bias=True)
        self.x_proj_b = nn.Linear(din, dt_rank + 2 * d_state, bias=False)
        self.dt_proj_b = nn.Linear(dt_rank, din, bias=True)
        self.A_b_log = nn.Parameter(torch.empty(din, d_state))
        self.D_b = nn.Parameter(torch.empty(din))

    def forward(self, x):
        xin, z = self.in_proj(x).chunk(2, dim=-1)
        y_f = _head_forward(
            xin, z, self.conv1d, self.x_proj, self.dt_proj, self.A_log,
            self.D, self.dt_rank, self.d_state,
        )
        y_b = _head_forward(
            xin.flip(1), z.flip(1), self.conv1d_b, self.x_proj_b,
            self.dt_proj_b, self.A_b_log, self.D_b, self.dt_rank,
            self.d_state,
        ).flip(1)
        return self.out_proj(0.5 * y_f + 0.5 * y_b)


# ---------------------------------------------------------------------------
# Encoder / decoder layer replicas (reference module attribute names)
# ---------------------------------------------------------------------------


class ConvolutionModule(nn.Module):
    """Conmamba.py:268-307 / Conformer.py:1005-1230 (non-causal)."""

    def __init__(self, d, k, act):
        super().__init__()
        self.layer_norm = _ln(d)
        self.bottleneck = nn.Sequential(
            nn.Conv1d(d, 2 * d, kernel_size=1, bias=True), nn.GLU(dim=1)
        )
        self.conv = nn.Conv1d(
            d, d, kernel_size=k, padding=(k - 1) // 2, groups=d, bias=True
        )
        self.after_conv = nn.Sequential(
            _ln(d), act(), nn.Linear(d, d, bias=True), nn.Dropout(0.0)
        )

    def forward(self, x):
        out = self.layer_norm(x).transpose(1, 2)
        out = self.bottleneck(out)
        out = self.conv(out).transpose(1, 2)
        return self.after_conv(out)


class _MacaronLayer(nn.Module):
    """Shared ConMamba/Conformer encoder-layer skeleton
    (Conmamba.py:565-650, Conformer.py:1511-1630)."""

    def __init__(self, d, d_ffn, k, act, mixer):
        super().__init__()
        self._mixer_name = mixer  # 'mamba' or 'mha_layer'
        self.ffn_module1 = nn.Sequential(
            _ln(d), PositionalwiseFeedForward(d, d_ffn, act), nn.Dropout(0.0)
        )
        self.ffn_module2 = nn.Sequential(
            _ln(d), PositionalwiseFeedForward(d, d_ffn, act), nn.Dropout(0.0)
        )
        self.convolution_module = ConvolutionModule(d, k, act)
        self.norm1 = SBLayerNorm(d)
        self.norm2 = SBLayerNorm(d)

    def forward(self, x, pos_embs=None):
        x = x + 0.5 * self.ffn_module1(x)
        skip = x
        xn = self.norm1(x)
        mixer = getattr(self, self._mixer_name)
        if self._mixer_name == "mamba":
            x = mixer(xn) + skip
        else:
            x = mixer(xn, pos_embs) + skip
        x = x + self.convolution_module(x)
        return self.norm2(x + 0.5 * self.ffn_module2(x))


def conmamba_layer(d, d_ffn, k, act, mcfg):
    layer = _MacaronLayer(d, d_ffn, k, act, "mamba")
    layer.mamba = RefBiMamba(d, **mcfg)
    return layer


def conformer_layer(d, d_ffn, k, act, nhead):
    layer = _MacaronLayer(d, d_ffn, k, act, "mha_layer")
    layer.mha_layer = RelPosMHAXL(d, nhead)
    return layer


class RefEncoder(nn.Module):
    def __init__(self, layers, d):
        super().__init__()
        self.layers = nn.ModuleList(layers)
        self.norm = SBLayerNorm(d)

    def forward(self, x, pos_embs=None):
        for layer in self.layers:
            x = layer(x, pos_embs)
        return self.norm(x)


class RefTransformerEncoderLayer(nn.Module):
    """Transformer.py:1069-1194, regularMHA / regularFFN, post-LN."""

    def __init__(self, d, d_ffn, nhead, act, normalize_before=False):
        super().__init__()
        self.self_att = SBMultiheadAttention(d, nhead)
        self.pos_ffn = PositionalwiseFeedForward(d, d_ffn, act)
        self.norm1 = SBLayerNorm(d)
        self.norm2 = SBLayerNorm(d)
        self.normalize_before = normalize_before

    def forward(self, x, attn_mask=None):
        xn = self.norm1(x) if self.normalize_before else x
        x = x + self.self_att(xn, xn, xn, attn_mask=attn_mask)
        if not self.normalize_before:
            x = self.norm1(x)
        xn = self.norm2(x) if self.normalize_before else x
        x = x + self.pos_ffn(xn)
        if not self.normalize_before:
            x = self.norm2(x)
        return x


class RefTransformerDecoderLayer(nn.Module):
    """Transformer.py:1347-1524: self_attn / multihead_attn / pos_ffn,
    pre-LN (normalize_before: True in every reference S2S yaml)."""

    def __init__(self, d, d_ffn, nhead, act):
        super().__init__()
        self.self_attn = SBMultiheadAttention(d, nhead)
        self.multihead_attn = SBMultiheadAttention(d, nhead)
        self.pos_ffn = PositionalwiseFeedForward(d, d_ffn, act)
        self.norm1 = SBLayerNorm(d)
        self.norm2 = SBLayerNorm(d)
        self.norm3 = SBLayerNorm(d)

    def forward(self, tgt, memory, tgt_mask):
        xn = self.norm1.norm(tgt)
        tgt = tgt + self.self_attn(xn, xn, xn, attn_mask=tgt_mask)
        xn = self.norm2.norm(tgt)
        tgt = tgt + self.multihead_attn(xn, memory, memory)
        xn = self.norm3.norm(tgt)
        return tgt + self.pos_ffn(xn)


class RefMambaDecoderLayer(nn.Module):
    """Conmamba.py:839-953, pre-LN."""

    def __init__(self, d, d_ffn, act, mcfg):
        super().__init__()
        self.self_mamba = RefMamba(d, **mcfg)
        self.cross_mamba = RefMamba(d, **mcfg)
        self.pos_ffn = PositionalwiseFeedForward(d, d_ffn, act)
        self.norm1 = SBLayerNorm(d)
        self.norm2 = SBLayerNorm(d)
        self.norm3 = SBLayerNorm(d)

    def forward(self, tgt, memory, tgt_mask=None):
        tgt = tgt + self.self_mamba(self.norm1.norm(tgt))
        xn = self.norm2.norm(tgt)
        cross = self.cross_mamba(torch.cat([memory, xn], dim=1))
        tgt = tgt + cross[:, -xn.shape[1]:]
        return tgt + self.pos_ffn(self.norm3.norm(tgt))


class RefDecoder(nn.Module):
    def __init__(self, layers, d):
        super().__init__()
        self.layers = nn.ModuleList(layers)
        self.norm = SBLayerNorm(d)

    def forward(self, tgt, memory, tgt_mask):
        for layer in self.layers:
            tgt = layer(tgt, memory, tgt_mask)
        return self.norm(tgt)


# ---------------------------------------------------------------------------
# CNN frontend replica (sb ConvolutionFrontEnd naming)
# ---------------------------------------------------------------------------


class SBConv2d(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride)
        self.k, self.stride = k, stride

    def forward(self, x):
        """x (B, T, F, C) channels-last; flax-SAME padding."""

        def same_pad(n):
            out = -(-n // self.stride)
            tot = max((out - 1) * self.stride + self.k - n, 0)
            return tot // 2, tot - tot // 2

        pt = same_pad(x.shape[1])
        pf = same_pad(x.shape[2])
        xp = x.permute(0, 3, 1, 2)  # (B, C, T, F)
        xp = F.pad(xp, (pf[0], pf[1], pt[0], pt[1]))
        return self.conv(xp).permute(0, 2, 3, 1)


class ConvBlock(nn.Module):
    def __init__(self, cin, cout, k, stride):
        super().__init__()
        self.convs = nn.ModuleDict(
            {"conv_0": SBConv2d(cin, cout, k, stride),
             "norm_0": SBLayerNorm(cout)}
        )

    def forward(self, x):
        x = self.convs["conv_0"](x)
        x = self.convs["norm_0"](x)
        return F.leaky_relu(x, 0.01)


class RefCNN(nn.Module):
    """sb ConvolutionFrontEnd: convblock_{i} children."""

    def __init__(self, channels, k=3, stride=2):
        super().__init__()
        cin = 1
        for i, c in enumerate(channels):
            setattr(self, f"convblock_{i}", ConvBlock(cin, c, k, stride))
            cin = c
        self.n = len(channels)

    def forward(self, feats):
        x = feats.unsqueeze(-1)  # (B, T, F, 1)
        for i in range(self.n):
            x = getattr(self, f"convblock_{i}")(x)
        return x


# ---------------------------------------------------------------------------
# Full reference-model replicas
# ---------------------------------------------------------------------------


class RefTransformerASR(nn.Module):
    """The '1.' entry of the saved ModuleList (TransformerASR)."""

    def __init__(self, cfg: ASRConfig, act):
        super().__init__()
        d, mc = cfg.d_model, cfg.mamba
        mcfg = dict(d_state=mc.d_state, d_conv=mc.d_conv, expand=mc.expand,
                    dt_rank=mc.resolved_dt_rank(d))
        in_dim = cfg.frontend_output_dim
        self.custom_src_module = SBModuleList(
            SBLinear(in_dim, d), nn.Dropout(0.0)
        )
        if cfg.encoder_module == "conmamba":
            layers = [
                conmamba_layer(d, cfg.d_ffn, cfg.kernel_size, act, mcfg)
                for _ in range(cfg.num_encoder_layers)
            ]
        else:
            layers = [
                conformer_layer(d, cfg.d_ffn, cfg.kernel_size, act, cfg.nhead)
                for _ in range(cfg.num_encoder_layers)
            ]
        self.encoder = RefEncoder(layers, d)
        if cfg.num_decoder_layers > 0:
            self.custom_tgt_module = SBModuleList(
                NormalizedEmbedding(d, cfg.vocab_size)
            )
            if cfg.decoder_module == "mamba":
                dec_layers = [
                    RefMambaDecoderLayer(d, cfg.d_ffn, act, mcfg)
                    for _ in range(cfg.num_decoder_layers)
                ]
            else:
                dec_layers = [
                    RefTransformerDecoderLayer(d, cfg.d_ffn, cfg.nhead, act)
                    for _ in range(cfg.num_decoder_layers)
                ]
            self.decoder = RefDecoder(dec_layers, d)
        self.cfg = cfg

    def forward(self, src_flat, tokens=None, pos_embs=None, pe_tgt=None):
        x = self.custom_src_module(src_flat)
        enc = self.encoder(x, pos_embs)
        dec = None
        if tokens is not None:
            tgt = self.custom_tgt_module(tokens) + pe_tgt[: tokens.shape[1]]
            s = tokens.shape[1]
            causal = torch.triu(torch.ones(s, s, dtype=torch.bool), 1)
            dec = self.decoder(tgt, enc, causal)
        return enc, dec


def build_ref_model(cfg: ASRConfig, act, seed=0):
    """The saved ModuleList: CTC [CNN, Transformer, ctc_lin];
    S2S [CNN, Transformer, seq_lin, ctc_lin]."""
    mods = [RefCNN(cfg.frontend_channels), RefTransformerASR(cfg, act)]
    if cfg.num_decoder_layers > 0:
        mods.append(SBLinear(cfg.d_model, cfg.vocab_size))  # seq_lin
    mods.append(SBLinear(cfg.d_model, cfg.vocab_size))  # ctc_lin
    model = nn.ModuleList(mods)
    _randomize(model, seed)
    return model


def ref_forward(model, cfg, feats_np, tokens_np=None):
    """Full reference forward -> (ctc_log_probs, seq_log_probs or None)."""
    from mamba_asr_tpu.models.attention import rel_pos_encoding
    from mamba_asr_tpu.models.transformer import (
        sinusoidal_position_encoding,
    )

    feats = torch.from_numpy(feats_np)
    x = model[0](feats)
    b, t, f, c = x.shape
    src_flat = x.reshape(b, t, f * c)
    pos = None
    if cfg.encoder_module == "conformer":
        pos = torch.from_numpy(
            np.asarray(rel_pos_encoding(t, cfg.d_model), np.float32)
        )
    pe_tgt = None
    tokens = None
    if tokens_np is not None:
        tokens = torch.from_numpy(tokens_np)
        pe_tgt = torch.from_numpy(np.asarray(
            sinusoidal_position_encoding(tokens_np.shape[1], cfg.d_model),
            np.float32,
        ))
    enc, dec = model[1](src_flat, tokens, pos, pe_tgt)
    if cfg.num_decoder_layers > 0:
        seq_lp = F.log_softmax(model[2](dec), dim=-1)
        ctc_lp = F.log_softmax(model[3](enc), dim=-1)
        return ctc_lp.numpy(), seq_lp.numpy()
    ctc_lp = F.log_softmax(model[2](enc), dim=-1)
    return ctc_lp.numpy(), None


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

MAMBA = MambaConfig(d_state=4, d_conv=4, expand=2, dt_rank=2)


def _cfg(**kw):
    base = dict(
        vocab_size=13, n_mels=10, d_model=16, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=24,
        dropout=0.0, activation="gelu", encoder_module="conmamba",
        attention_type="RelPosMHAXL", kernel_size=7,
        frontend_channels=(4, 6), frontend_strides=(2, 2),
        mamba=MAMBA, bidirectional=True, scan_layers=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return ASRConfig(**base)


def _run_roundtrip(cfg, seed, with_decoder):
    act = lambda: nn.GELU()  # exact erf GELU, the reference default
    ref = build_ref_model(cfg, act, seed=seed)
    rng = np.random.default_rng(seed)
    feats = np.asarray(rng.normal(size=(2, 24, cfg.n_mels)), np.float32)
    tokens = (
        np.asarray(rng.integers(1, cfg.vocab_size, size=(2, 5)), np.int32)
        if with_decoder else None
    )
    ctc_ref, seq_ref = ref_forward(ref, cfg, feats, tokens)

    params = import_asr_params(ref.state_dict(), cfg)
    model = ASRModel(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(feats), None,
        jnp.asarray(tokens) if tokens is not None else None,
    )
    np.testing.assert_allclose(
        np.asarray(out["ctc_log_probs"]), ctc_ref, atol=2e-4, rtol=2e-4
    )
    if with_decoder:
        np.testing.assert_allclose(
            np.asarray(out["seq_log_probs"]), seq_ref, atol=2e-4, rtol=2e-4
        )


def test_import_conmamba_ctc():
    _run_roundtrip(_cfg(), seed=0, with_decoder=False)


def test_import_conformer_ctc():
    _run_roundtrip(
        _cfg(encoder_module="conformer"), seed=1, with_decoder=False
    )


def test_import_conmamba_s2s_transformer_decoder():
    _run_roundtrip(
        _cfg(num_decoder_layers=2, decoder_module="transformer"),
        seed=2, with_decoder=True,
    )


def test_import_conmambamamba_s2s():
    _run_roundtrip(
        _cfg(num_decoder_layers=2, decoder_module="mamba"),
        seed=3, with_decoder=True,
    )


def test_import_scanned_layout_roundtrip():
    """Imported (unrolled) params convert to the scan_layers layout and
    produce identical encoder outputs."""
    from mamba_asr_tpu.models.params_convert import convert_encoder_layout

    cfg = _cfg()
    act = lambda: nn.GELU()
    ref = build_ref_model(cfg, act, seed=4)
    params = import_asr_params(ref.state_dict(), cfg)

    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.normal(size=(2, 24, cfg.n_mels)), jnp.float32)
    out_unrolled = ASRModel(cfg).apply({"params": params}, feats, None)

    cfg_s = _cfg(scan_layers=True)
    params_s = convert_encoder_layout(
        params, cfg.num_encoder_layers, to_scanned=True
    )
    out_scanned = ASRModel(cfg_s).apply({"params": params_s}, feats, None)
    np.testing.assert_allclose(
        np.asarray(out_scanned["ctc_log_probs"]),
        np.asarray(out_unrolled["ctc_log_probs"]),
        atol=1e-5, rtol=1e-5,
    )


class RefTransformerLM(nn.Module):
    """sb lobes TransformerLM naming: custom_src_module (NormalizedEmbedding),
    encoder (post-LN TransformerEncoder), output_proj (sb Linear)."""

    def __init__(self, vocab, d, nhead, layers, d_ffn):
        super().__init__()
        self.custom_src_module = NormalizedEmbedding(d, vocab)
        enc = nn.Module()
        enc.layers = nn.ModuleList(
            [
                RefTransformerEncoderLayer(
                    d, d_ffn, nhead, nn.GELU, normalize_before=False
                )
                for _ in range(layers)
            ]
        )
        enc.norm = SBLayerNorm(d)
        self.encoder = enc
        self.output_proj = SBLinear(d, vocab)
        self.d = d

    def forward(self, tokens, pe):
        x = self.custom_src_module(tokens) + pe[: tokens.shape[1]]
        s = tokens.shape[1]
        causal = torch.triu(torch.ones(s, s, dtype=torch.bool), 1)
        for layer in self.encoder.layers:
            x = layer(x, attn_mask=causal)
        x = self.encoder.norm(x)
        return self.output_proj(x)


def test_import_transformer_lm():
    from mamba_asr_tpu.models.transformer import (
        sinusoidal_position_encoding,
    )

    vocab, d, nhead, layers, d_ffn = 13, 16, 2, 2, 24
    ref = RefTransformerLM(vocab, d, nhead, layers, d_ffn)
    _randomize(ref, seed=5)

    rng = np.random.default_rng(5)
    tokens = np.asarray(rng.integers(1, vocab, size=(2, 7)), np.int32)
    pe = torch.from_numpy(
        np.asarray(sinusoidal_position_encoding(7, d), np.float32)
    )
    logits_ref = ref(torch.from_numpy(tokens), pe).numpy()

    params = import_lm_params(ref.state_dict(), num_layers=layers)
    lm = TransformerLM(
        vocab_size=vocab, d_model=d, nhead=nhead, num_layers=layers,
        d_ffn=d_ffn, normalize_before=False,
    )
    logits = lm.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(logits), logits_ref, atol=2e-4, rtol=2e-4
    )


def test_import_rejects_unconsumed_keys():
    cfg = _cfg()
    ref = build_ref_model(cfg, lambda: nn.GELU(), seed=6)
    sd = dict(ref.state_dict())
    sd["1.encoder.layers.0.mystery.weight"] = torch.zeros(3, 3)
    with pytest.raises(ValueError, match="not consumed"):
        import_asr_params(sd, cfg)


def test_import_reports_missing_keys():
    cfg = _cfg()
    ref = build_ref_model(cfg, lambda: nn.GELU(), seed=7)
    sd = dict(ref.state_dict())
    del sd["1.encoder.norm.norm.weight"]
    with pytest.raises(KeyError, match="missing"):
        import_asr_params(sd, cfg)


def test_import_relpos_bias_orientation_autodetect():
    """pos_bias stored (head_dim, nhead) transposes on import (the two
    public sb variants disagree; shapes disambiguate)."""
    cfg = _cfg(encoder_module="conformer", nhead=2)
    ref = build_ref_model(cfg, lambda: nn.GELU(), seed=8)
    sd = {
        k: (v.t().contiguous() if "pos_bias" in k else v)
        for k, v in ref.state_dict().items()
    }
    p1 = import_asr_params(ref.state_dict(), cfg)
    p2 = import_asr_params(sd, cfg)
    a = p1["encoder"]["layer_0"]["mha"]["pos_bias_u"]
    b = p2["encoder"]["layer_0"]["mha"]["pos_bias_u"]
    np.testing.assert_allclose(a, b)


def test_load_torch_asr_ckpt_file_scanned(tmp_path):
    """User-facing loader: torch.save'd model.ckpt -> params in the
    MODEL's layout (scanned encoder stack), forward matches the torch
    replica. This is the recognize.py/evaluate.py --torch_ckpt path."""
    from mamba_asr_tpu.models.torch_import import load_torch_asr

    cfg_unrolled = _cfg(scan_layers=False)
    ref = build_ref_model(cfg_unrolled, lambda: nn.GELU(), seed=9)
    path = tmp_path / "model.ckpt"
    torch.save(ref.state_dict(), str(path))

    rng = np.random.default_rng(9)
    feats = np.asarray(rng.normal(size=(2, 24, 10)), np.float32)
    ctc_ref, _ = ref_forward(ref, cfg_unrolled, feats)

    cfg = _cfg(scan_layers=True)
    params = load_torch_asr(str(path), cfg)
    model = ASRModel(cfg)
    out = model.apply({"params": params}, jnp.asarray(feats), None, None)
    np.testing.assert_allclose(
        np.asarray(out["ctc_log_probs"]), ctc_ref, atol=2e-4, rtol=2e-4
    )
    # The loader must have produced the scanned layout exactly as the
    # model initializes it (same tree structure).
    init = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats), None, None
    )["params"]
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, params)
    ) == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, init)
    )


def test_load_torch_lm_ckpt_file(tmp_path):
    """decode.lm_path ending in .ckpt routes through load_torch_lm
    (cli.load_lm's reference-Pretrainer branch)."""
    from mamba_asr_tpu.models.torch_import import load_torch_lm

    vocab, d, nhead, layers, d_ffn = 13, 16, 2, 2, 24
    ref = RefTransformerLM(vocab, d, nhead, layers, d_ffn)
    _randomize(ref, seed=10)
    path = tmp_path / "lm.ckpt"
    torch.save(ref.state_dict(), str(path))

    params = load_torch_lm(str(path), num_layers=layers)
    lm = TransformerLM(
        vocab_size=vocab, d_model=d, nhead=nhead, num_layers=layers,
        d_ffn=d_ffn, normalize_before=False,
    )
    rng = np.random.default_rng(10)
    tokens = np.asarray(rng.integers(1, vocab, size=(2, 7)), np.int32)
    from mamba_asr_tpu.models.transformer import (
        sinusoidal_position_encoding,
    )

    pe = torch.from_numpy(
        np.asarray(sinusoidal_position_encoding(7, d), np.float32)
    )
    logits_ref = ref(torch.from_numpy(tokens), pe).numpy()
    logits = lm.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(
        np.asarray(logits), logits_ref, atol=2e-4, rtol=2e-4
    )
