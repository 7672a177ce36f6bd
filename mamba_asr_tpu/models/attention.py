"""Attention modules: regular MHA and Transformer-XL relative-position MHA.

Reference behavior: SpeechBrain's `nnet.attention.MultiheadAttention`
and `RelPosMHAXL` + `RelPosEncXL`, which the reference's Conformer layers
use via attention_type="RelPosMHAXL"
(/root/reference/modules/Conformer.py:1536-1542 and the hparams at
/root/reference/hparams/CTC/conformer_large.yaml).

RelPosMHAXL math (Transformer-XL, Dai et al. 2019):

    score(i, j) = (q_i + u)·k_j  +  (q_i + v)·p_{j-i}
    attn = softmax(score / sqrt(d_head) + masks)

with learned per-head biases u (content) and v (position) and sinusoidal
relative embeddings p projected by a learned matrix.

TPU notes: everything is expressed as batched matmuls (MXU); the
relative-position term is computed against all 2L-1 offsets and aligned
to (i, j) with the Transformer-XL pad-and-reshape shift (the equivalent
take_along_axis gather lowers catastrophically on TPU — 6.8x slower
Conformer train step). Masks are boolean (True = disallowed), additive
-inf.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

NEG_INF = -1e9


def rel_pos_encoding(length: int, d_model: int, dtype=jnp.float32) -> Array:
    """Sinusoidal embeddings for relative offsets r = j - i.

    Returns (2L-1, d_model); row index r + (L-1) holds offset r in
    [-(L-1), L-1]. Mirrors SpeechBrain's RelPosEncXL output (which the
    reference requests once per utterance and passes down as `pos_embs`).
    """
    positions = jnp.arange(-(length - 1), length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((2 * length - 1, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(positions * div))
    pe = pe.at[:, 1::2].set(jnp.cos(positions * div))
    return pe.astype(dtype)


def _apply_masks(
    scores: Array,
    attn_mask: Optional[Array],
    key_padding_mask: Optional[Array],
) -> Array:
    """scores (B, H, Lq, Lk); attn_mask (Lq, Lk) bool True=disallow;
    key_padding_mask (B, Lk) bool True=pad."""
    if attn_mask is not None:
        scores = jnp.where(attn_mask[None, None], NEG_INF, scores)
    if key_padding_mask is not None:
        scores = jnp.where(
            key_padding_mask[:, None, None, :], NEG_INF, scores
        )
    return scores


class MultiheadAttention(nn.Module):
    """Standard multi-head attention (SpeechBrain regularMHA equivalent).

    Incremental-decoding support (used by the S2S/LM beam search so each
    step is O(1) new work instead of the reference's full-prefix re-scan,
    SURVEY.md §3.2):
      - `cache=(k_buf, v_buf)` (B, H, S_max, dh) + `cache_index=s`:
        query/key/value are a single position (B, 1, D); the new K/V are
        written at position s, attention runs over positions <= s, and
        the return is (out, (new_k_buf, new_v_buf)).
      - `cache` + `anc` (S, N) int32 ancestor table: APPEND-ONLY
        beam-search mode.
        Buffers are (H, S_max, B, dh); row i writes at [:, s, i] and is
        never reordered — attention gathers each hypothesis' prefix
        through the ancestor mask (ops/pallas/beam_attention.py). This
        removes the per-step full-buffer beam-reorder traffic that
        dominated the round-2 beam step.
      - `static_kv=(k, v)`: use precomputed projected K/V (cross-attention
        over a fixed encoder memory) — no K/V projection matmuls per step.
      - `precompute_kv=True`: returns the projected (k, v) of key/value
        (for building a static_kv once).
    """

    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        attn_mask: Optional[Array] = None,
        key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        train: bool = False,
        cache: Optional[Tuple[Array, Array]] = None,
        cache_index: Optional[Array] = None,
        static_kv: Optional[Tuple[Array, Array]] = None,
        precompute_kv: bool = False,
        anc: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        del pos_embs  # absolute-PE path adds encodings to inputs instead
        d_model = query.shape[-1]
        h = self.num_heads
        dh = d_model // h
        assert dh * h == d_model

        def proj(x, name):
            y = nn.Dense(d_model, dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], h, dh)

        if precompute_kv:
            return proj(key, "k"), proj(value, "v")

        q = proj(query, "q")  # (B, Lq, H, dh)
        new_cache = None
        heads_major = False  # k/v layout: (B, S, H, dh) vs (B, H, S, dh)
        if cache is not None and anc is not None:
            from mamba_asr_tpu.ops.pallas.beam_attention import (
                beam_attention,
            )

            # Append-only beam cache (H, S_max, B, dh): write this row's
            # K/V at cache_index, attend through the ancestor mask.
            k_buf, v_buf = cache
            k_new = jnp.transpose(proj(key, "k"), (2, 1, 0, 3))
            v_new = jnp.transpose(proj(value, "v"), (2, 1, 0, 3))
            k_buf = jax.lax.dynamic_update_slice_in_dim(
                k_buf, k_new.astype(k_buf.dtype), cache_index, axis=1
            )
            v_buf = jax.lax.dynamic_update_slice_in_dim(
                v_buf, v_new.astype(v_buf.dtype), cache_index, axis=1
            )
            out = beam_attention(
                q[:, 0], k_buf, v_buf, anc, cache_index
            )[:, None]  # (B, 1, H, dh)
            out = out.reshape(*out.shape[:-2], d_model)
            out = nn.Dense(d_model, dtype=self.dtype, name="out")(out)
            return out, (k_buf, v_buf)
        if static_kv is not None:
            k, v = static_kv
        elif cache is not None:
            # Cache buffers are HEADS-MAJOR (B, H, S_max, dh) — the
            # standard decode layout; the attention contraction reads
            # them without a transpose. (Measured perf-neutral vs
            # seq-major on v5e at beam 66 x S 257 x d768: the beam-step
            # LM cost is bounded by the reorder-gather traffic, not
            # attention layout.)
            k_buf, v_buf = cache
            k_new = proj(key, "k").astype(k_buf.dtype)  # (B, 1, H, dh)
            v_new = proj(value, "v").astype(v_buf.dtype)
            k_buf = jax.lax.dynamic_update_slice_in_dim(
                k_buf, jnp.swapaxes(k_new, 1, 2), cache_index, axis=2
            )
            v_buf = jax.lax.dynamic_update_slice_in_dim(
                v_buf, jnp.swapaxes(v_new, 1, 2), cache_index, axis=2
            )
            k, v = k_buf, v_buf
            new_cache = (k_buf, v_buf)
            heads_major = True
            # Only positions <= cache_index are valid.
            future = jnp.arange(k.shape[2])[None, :] > cache_index
            key_padding_mask = (
                future
                if key_padding_mask is None
                else (key_padding_mask | future)
            )
        else:
            k = proj(key, "k")
            v = proj(value, "v")
        if heads_major and q.shape[1] == 1:
            # Single-query decode step: per-head matvecs as fused
            # broadcast-multiply + reduce on the VPU (B*H tiny (S, dh)
            # dot_generals don't tile the MXU; measured equal on v5e,
            # kept for its simpler lowering).
            qh = jnp.swapaxes(q, 1, 2)  # (B, H, 1, dh)
            scores = (qh * k.astype(q.dtype)).sum(-1)[:, :, None, :]
            scores = scores / math.sqrt(dh)  # (B, H, 1, S)
            scores = _apply_masks(scores, attn_mask, key_padding_mask)
            attn = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(scores.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = (attn[:, :, 0, :, None] * v.astype(attn.dtype)).sum(
                axis=2
            )[:, None]  # (B, 1, H, dh)
        else:
            k_eq = "bhkd" if heads_major else "bkhd"
            scores = jnp.einsum(
                f"bqhd,{k_eq}->bhqk", q, k.astype(q.dtype)
            ) / math.sqrt(dh)
            scores = _apply_masks(scores, attn_mask, key_padding_mask)
            attn = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(scores.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum(
                f"bhqk,{k_eq}->bqhd", attn, v.astype(attn.dtype)
            )
        out = out.reshape(*out.shape[:-2], d_model)
        out = nn.Dense(d_model, dtype=self.dtype, name="out")(out)
        return out, (new_cache if cache is not None else attn)


class RelPosMHAXL(nn.Module):
    """Transformer-XL relative-position multi-head self-attention."""

    num_heads: int
    dropout: float = 0.0
    mask_pos_future: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        attn_mask: Optional[Array] = None,
        key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        d_model = query.shape[-1]
        h = self.num_heads
        dh = d_model // h
        lq, lk = query.shape[1], key.shape[1]

        def proj(x, name):
            y = nn.Dense(d_model, use_bias=False, dtype=self.dtype, name=name)(x)
            return y.reshape(*y.shape[:-1], h, dh)

        q = proj(query, "q")
        k = proj(key, "k")
        v = proj(value, "v")

        if pos_embs is None:
            pos_embs = rel_pos_encoding(lk, d_model, dtype=query.dtype)
        p = nn.Dense(d_model, use_bias=False, dtype=self.dtype, name="pos")(
            pos_embs
        ).reshape(-1, h, dh)  # (2Lk-1, H, dh)

        u = self.param(
            "pos_bias_u", nn.initializers.zeros, (h, dh), jnp.float32
        )
        vb = self.param(
            "pos_bias_v", nn.initializers.zeros, (h, dh), jnp.float32
        )

        content = jnp.einsum("bqhd,bkhd->bhqk", q + u.astype(q.dtype), k)
        # Position scores against all offsets: want
        # pos_score[..., i, j] = pos_all[..., i, j - i + Lk - 1].
        pos_all = jnp.einsum("bqhd,rhd->bhqr", q + vb.astype(q.dtype), p)
        if lq == lk:
            # Transformer-XL relative shift: pad one column and reslice —
            # pure reshapes. The take_along_axis gather this replaces was
            # the Conformer train step's bottleneck on TPU (generic
            # gathers of (B, H, L, L) from (B, H, L, 2L-1) lower badly).
            b_ = pos_all.shape[0]
            x = jnp.pad(pos_all, ((0, 0), (0, 0), (0, 0), (0, 1)))
            x = x.reshape(b_, h, lq * 2 * lk)
            x = x[:, :, lk - 1 : lk - 1 + lq * (2 * lk - 1)]
            pos_score = x.reshape(b_, h, lq, 2 * lk - 1)[..., :lk]
        else:
            offset_idx = (
                jnp.arange(lk)[None, :] - jnp.arange(lq)[:, None] + (lk - 1)
            )  # (Lq, Lk) in [0, 2Lk-2]
            pos_score = jnp.take_along_axis(
                pos_all, offset_idx[None, None], axis=-1
            )

        scores = (content + pos_score) / math.sqrt(dh)
        if self.mask_pos_future:
            future = jnp.triu(jnp.ones((lq, lk), bool), k=1)
            scores = jnp.where(future[None, None], NEG_INF, scores)
        scores = _apply_masks(scores, attn_mask, key_padding_mask)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            scores.dtype
        )
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*out.shape[:-2], d_model)
        out = nn.Dense(d_model, dtype=self.dtype, name="out")(out)
        return out, attn
