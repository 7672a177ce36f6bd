"""Ancestor-masked single-query attention over append-only beam KV caches.

The round-2 S2S beam step was bounded by KV-cache *reorder* traffic: every
step gathered whole (B, H, S, dh) K/V buffers through the beam's parent
permutation (12 LM layers -> ~1.9 GB/step at beam 66 x S 257 x d768).
Reference context: SpeechBrain's S2S searcher instead re-runs the full
decoder/LM prefix per step (/root/reference/train_S2S.py:382-394) — both
designs pay for beam divergence; this one removes the cost entirely.

TPU-native design (gather-at-read):
- K/V buffers are APPEND-ONLY in layout (H, S, B, dh): hypothesis row i
  writes its step-s projection at [:, s, i, :] and nothing is ever moved.
- The searcher maintains an ancestor table anc(j, n) = physical row that
  holds position j of hypothesis n's prefix (updated per step by one
  (S, B) int32 gather), rendered once per step into a boolean plane
  anc_mask(j, r, n) = [anc(j, n) == r and j <= s].
- Attention for hypothesis n runs over the whole (position, row) plane
  with that mask: since exactly one row is valid per (n, j <= s), the
  masked softmax over (j, r) equals the softmax over the gathered
  prefix. Extra FLOPs are B x on the score/value contractions — MXU
  work that costs ~nothing next to the HBM reads the reorder used to pay
  for.
- The Pallas kernel is a flash-style online-softmax sweep over S chunks,
  and skips chunks beyond the current position: block index maps clamp
  to the last valid chunk (Pallas elides the repeat DMA), so HBM traffic
  per step is proportional to the VALID prefix, not the S_max buffer.

Numerics match the gather formulation exactly up to float association;
`beam_attention_xla` is the jnp oracle used on CPU and in tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG = -1e30
J_CHUNK = 64


def build_anc_mask(anc: Array, pos, n_rows: int, dtype=jnp.bfloat16) -> Array:
    """anc (S, N) int32 ancestor table -> (S, R, N) 0/1 mask with
    mask[j, r, n] = (anc[j, n] == r) & (j <= pos)."""
    s = anc.shape[0]
    r_iota = jnp.arange(n_rows, dtype=jnp.int32)
    j_iota = jnp.arange(s, dtype=jnp.int32)
    m = (anc[:, None, :] == r_iota[None, :, None]) & (
        j_iota[:, None, None] <= pos
    )
    return m.astype(dtype)


def beam_attention_xla(q: Array, k_buf: Array, v_buf: Array,
                       anc_mask: Array) -> Array:
    """Oracle: q (B, H, dh), k_buf/v_buf (H, S, B, dh),
    anc_mask (S, R, B) -> out (B, H, dh)."""
    h, s, b, dh = k_buf.shape
    scores = jnp.einsum(
        "nhd,hjrd->hnjr", q.astype(jnp.float32),
        k_buf.astype(jnp.float32),
    ) / math.sqrt(dh)  # (H, N, S, R)
    m = jnp.transpose(anc_mask, (2, 0, 1))[None]  # (1, N, S, R)
    scores = jnp.where(m > 0, scores, NEG)
    attn = jax.nn.softmax(scores.reshape(h, b, s * b), axis=-1).reshape(
        h, b, s, b
    )
    out = jnp.einsum("hnjr,hjrd->nhd", attn, v_buf.astype(jnp.float32))
    return out.astype(q.dtype)


def _beam_attn_kernel(s_ref, q_ref, k_ref, v_ref, m_ref, out_ref,
                      macc, lacc, oacc, *, j_chunk: int, scale: float):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    c_valid = s_ref[0] // j_chunk

    @pl.when(c == 0)
    def _init():
        macc[...] = jnp.full(macc.shape, NEG, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

    @pl.when(c <= c_valid)
    def _compute():
        q = q_ref[0]       # (N, dh)
        k = k_ref[0]       # (J, R, dh)
        v = v_ref[0]
        mask = m_ref[...].astype(jnp.float32)  # (J, R, N)
        scores = jax.lax.dot_general(
            k, q, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale          # (J, R, N)
        # 0 where valid, NEG where masked; garbage scores are zeroed
        # first so padding can't produce NaNs.
        scores = scores * mask + (mask - 1.0) * (-NEG)
        m_prev = macc[...]                               # (1, 1, N)
        m_new = jnp.maximum(
            m_prev, jnp.max(scores, axis=(0, 1), keepdims=True)
        )
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)                      # (J, R, N) f32
        lacc[...] = lacc[...] * alpha + jnp.sum(
            e, axis=(0, 1), keepdims=True
        )
        pv = jax.lax.dot_general(
            v, e.astype(v.dtype), (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (dh, N)
        oacc[...] = oacc[...] * alpha[0] + pv
        macc[...] = m_new

    @pl.when(c == nc - 1)
    def _emit():
        out_ref[0] = (oacc[...] / lacc[0]).astype(out_ref.dtype)


def beam_attention_pallas(q: Array, k_buf: Array, v_buf: Array,
                          anc_mask: Array, pos, *,
                          j_chunk: int = J_CHUNK,
                          interpret: bool = False) -> Array:
    """q (B, H, dh), k_buf/v_buf (H, S, B, dh), anc_mask (S, R, B),
    pos = current position (attend j <= pos) -> (B, H, dh)."""
    h, s, b, dh = k_buf.shape
    assert s % j_chunk == 0, (
        f"cache length {s} must be a multiple of j_chunk {j_chunk} "
        "(round the cache size up at allocation)"
    )
    nc = s // j_chunk
    qh = jnp.swapaxes(q, 0, 1)  # (H, N, dh)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape((1,))

    def clamp(c, s_):
        return jnp.minimum(c, s_[0] // j_chunk)

    out = pl.pallas_call(
        functools.partial(
            _beam_attn_kernel, j_chunk=j_chunk, scale=1.0 / math.sqrt(dh)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h, nc),
            in_specs=[
                pl.BlockSpec((1, b, dh), lambda h_, c, s_: (h_, 0, 0)),
                pl.BlockSpec(
                    (1, j_chunk, b, dh),
                    lambda h_, c, s_: (h_, clamp(c, s_), 0, 0),
                ),
                pl.BlockSpec(
                    (1, j_chunk, b, dh),
                    lambda h_, c, s_: (h_, clamp(c, s_), 0, 0),
                ),
                pl.BlockSpec(
                    (j_chunk, b, b),
                    lambda h_, c, s_: (clamp(c, s_), 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, dh, b), lambda h_, c, s_: (h_, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((1, 1, b), jnp.float32),
                pltpu.VMEM((1, 1, b), jnp.float32),
                pltpu.VMEM((dh, b), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((h, dh, b), q.dtype),
        interpret=interpret,
    )(pos_arr, qh, k_buf, v_buf, anc_mask)
    return jnp.transpose(out, (2, 0, 1))  # (B, H, dh)


def beam_attention(q: Array, k_buf: Array, v_buf: Array, anc_mask: Array,
                   pos) -> Array:
    """Dispatch: Pallas kernel on TPU (cache length permitting), XLA
    mask-plane formulation elsewhere."""
    s = k_buf.shape[1]
    if jax.default_backend() == "tpu" and s % J_CHUNK == 0:
        return beam_attention_pallas(q, k_buf, v_buf, anc_mask, pos)
    return beam_attention_xla(q, k_buf, v_buf, anc_mask)
