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
  (S, B) int32 gather). The kernel receives anc DIRECTLY and renders the
  validity plane [anc(j, n) == r and j <= pos] on the fly from iotas —
  materializing it as a (S, R, B) mask array (the round-2 design) cost a
  ~1.5 ms/step XLA build plus its HBM round-trip and a 4 MB f32 VMEM
  resident per kernel cell, for data that is a pure function of a
  (S, B) int32 table.
- Attention for hypothesis n runs over the whole (position, row) plane
  with that mask: since exactly one row is valid per (n, j <= pos), the
  masked softmax over (j, r) equals the softmax over the gathered
  prefix. Extra FLOPs are B x on the score/value contractions — MXU
  work that costs ~nothing next to the HBM reads the reorder used to pay
  for.
- The Pallas kernel is a flash-style online-softmax sweep over S chunks,
  and skips chunks beyond the current position: block index maps clamp
  to the last valid chunk (Pallas elides the repeat DMA), so HBM traffic
  per step is proportional to the VALID prefix, not the S_max buffer.
- Heads are blocked h_block per grid cell (statically unrolled): fewer
  grid cells amortizes per-cell DMA/setup, and the ancestor plane is
  rendered once per cell instead of once per head.

Numerics match the gather formulation exactly up to float association;
`beam_attention_xla` (driven via `build_anc_mask`) is the jnp oracle
used on CPU and in tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG = -1e30
J_CHUNK = 64


def build_anc_mask(anc: Array, pos, n_rows: int, dtype=jnp.bfloat16) -> Array:
    """anc (S, N) int32 ancestor table -> (S, R, N) 0/1 mask with
    mask[j, r, n] = (anc[j, n] == r) & (j <= pos). Used by the XLA
    oracle; the Pallas kernel renders this plane in-kernel instead."""
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


def _beam_attn_kernel(s_ref, q_ref, k_ref, v_ref, anc_ref, out_ref,
                      macc, lacc, oacc, *, j_chunk: int, scale: float,
                      h_block: int):
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    pos = s_ref[0]
    c_valid = pos // j_chunk

    @pl.when(c == 0)
    def _init():
        macc[...] = jnp.full(macc.shape, NEG, jnp.float32)
        lacc[...] = jnp.zeros(lacc.shape, jnp.float32)
        oacc[...] = jnp.zeros(oacc.shape, jnp.float32)

    @pl.when(c <= c_valid)
    def _compute():
        # Validity plane rendered from the raw ancestor chunk: the k/v
        # row r holds position j of hypothesis n iff anc[j, n] == r, and
        # only positions j <= pos have been written. Iotas stay 2D (the
        # j <= pos condition folds into the table as a -1 sentinel) so
        # the only (J, R, N) intermediate is the compare itself.
        anc_c = anc_ref[...]  # (J, N) int32
        n = anc_c.shape[-1]
        j2 = jax.lax.broadcasted_iota(jnp.int32, (j_chunk, n), 0)
        anc_m = jnp.where(j2 + c * j_chunk <= pos, anc_c, -1)
        r2 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # (R, N)
        valid = anc_m[:, None, :] == r2[None]  # (J, R, N)
        for i in range(h_block):
            q = q_ref[i]       # (N, dh)
            k = k_ref[i]       # (J, R, dh)
            v = v_ref[i]
            scores = jax.lax.dot_general(
                k, q, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale          # (J, R, N)
            # where() is NaN-safe for the unselected branch, so garbage
            # K rows (never-written buffer tail) cannot leak through.
            scores = jnp.where(valid, scores, NEG)
            m_prev = macc[i]                                 # (1, N)
            m_new = jnp.maximum(
                m_prev, jnp.max(scores, axis=(0, 1), keepdims=True)[0]
            )
            alpha = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new[None])                # (J, R, N) f32
            lacc[i] = lacc[i] * alpha + jnp.sum(e, axis=(0, 1),
                                                keepdims=True)[0]
            # Mosaic's tpu.matmul takes exactly one contracting dim:
            # batch over J, contract R, reduce the J batch dim after.
            pv = jax.lax.dot_general(
                v, e.astype(v.dtype), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).sum(axis=0)                                # (J, dh, N) -> (dh, N)
            oacc[i] = oacc[i] * alpha + pv
            macc[i] = m_new

    @pl.when(c == nc - 1)
    def _emit():
        out_ref[...] = (oacc[...] / lacc[...]).astype(out_ref.dtype)


def _pick_h_block(h: int, j_chunk: int, b: int, dh: int,
                  kv_bytes: int) -> Optional[int]:
    """Largest head-block whose per-cell VMEM set fits a ~12 MB budget
    (headroom under the 16 MB scoped limit): double-buffered K+V chunk
    blocks, PER-ITERATION f32 scores/e (Mosaic's stack allocator does
    not observably reuse them across the unrolled head loop — measured
    19.6 MB at a shape a reuse model put at 10 MB), the validity plane,
    and the f32 accumulators. Returns None when even h_block=1 cannot
    fit — the in-kernel validity plane is O(j_chunk * n^2), so large
    hypothesis counts (big batch x beam) must take the gather path
    (seen: n=448 from a 56-utterance test batch x beam 8 asked 56 MB)."""
    budget = 12 * 1024 * 1024
    plane = j_chunk * b * b * 4  # valid (i32-backed bool)
    for hb in (8, 6, 4, 3, 2, 1):
        kv = 2 * 2 * hb * j_chunk * b * dh * kv_bytes
        inter = hb * 2 * j_chunk * b * b * 4  # scores + e per iteration
        accs = hb * b * (dh + 2) * 4
        if h % hb == 0 and kv + inter + plane + accs <= budget:
            return hb
    return None


def beam_attention_gather(q: Array, k_buf: Array, v_buf: Array,
                          anc: Array, pos) -> Array:
    """Gather-at-read formulation: materialize each hypothesis's OWN
    prefix K/V through the ancestor table (one (S, N) take_along_axis
    per buffer), then plain masked single-query attention.

    O(N*S) memory instead of the mask-plane formulations' O(S*N^2) —
    the scalable path when batch x beam is large (short-utterance batch
    decode); the Pallas kernel stays preferred when its VMEM set fits
    (long caches, many heads, small N: the LM-fusion decode regime)."""
    h, s, b, dh = k_buf.shape
    n = anc.shape[1]
    qh = jnp.swapaxes(q, 0, 1).astype(jnp.float32)  # (H, N, dh)
    idx = anc[None, :, :, None]  # (1, S, N, 1) broadcasts over H, dh
    k_sel = jnp.take_along_axis(k_buf, idx, axis=2).astype(jnp.float32)
    v_sel = jnp.take_along_axis(v_buf, idx, axis=2).astype(jnp.float32)
    scores = jnp.einsum("hnd,hjnd->hnj", qh, k_sel) / math.sqrt(dh)
    j_valid = jnp.arange(s, dtype=jnp.int32) <= pos
    scores = jnp.where(j_valid[None, None, :], scores, NEG)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hnj,hjnd->nhd", attn, v_sel)
    return out.astype(q.dtype)


def beam_attention_pallas(q: Array, k_buf: Array, v_buf: Array,
                          anc: Array, pos, *,
                          j_chunk: int = J_CHUNK,
                          h_block: Optional[int] = None,
                          interpret: bool = False) -> Array:
    """q (B, H, dh), k_buf/v_buf (H, S, B, dh), anc (S, N) int32
    ancestor table, pos = current position (attend j <= pos)
    -> (B, H, dh)."""
    h, s, b, dh = k_buf.shape
    assert s % j_chunk == 0, (
        f"cache length {s} must be a multiple of j_chunk {j_chunk} "
        "(round the cache size up at allocation)"
    )
    nc = s // j_chunk
    if h_block is None:
        h_block = _pick_h_block(h, j_chunk, b, dh, k_buf.dtype.itemsize)
        assert h_block is not None, (
            f"beam_attention_pallas: no h_block fits VMEM at "
            f"(h={h}, s={s}, n={b}, dh={dh}) — use beam_attention_gather"
        )
    qh = jnp.swapaxes(q, 0, 1)  # (H, N, dh)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape((1,))

    def clamp(c, s_):
        return jnp.minimum(c, s_[0] // j_chunk)

    out = pl.pallas_call(
        functools.partial(
            _beam_attn_kernel, j_chunk=j_chunk, scale=1.0 / math.sqrt(dh),
            h_block=h_block,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h // h_block, nc),
            in_specs=[
                pl.BlockSpec((h_block, b, dh), lambda h_, c, s_: (h_, 0, 0)),
                pl.BlockSpec(
                    (h_block, j_chunk, b, dh),
                    lambda h_, c, s_: (h_, clamp(c, s_), 0, 0),
                ),
                pl.BlockSpec(
                    (h_block, j_chunk, b, dh),
                    lambda h_, c, s_: (h_, clamp(c, s_), 0, 0),
                ),
                pl.BlockSpec(
                    (j_chunk, b), lambda h_, c, s_: (clamp(c, s_), 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (h_block, dh, b), lambda h_, c, s_: (h_, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((h_block, 1, b), jnp.float32),
                pltpu.VMEM((h_block, 1, b), jnp.float32),
                pltpu.VMEM((h_block, dh, b), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((h, dh, b), q.dtype),
        interpret=interpret,
    )(pos_arr, qh, k_buf, v_buf, anc.astype(jnp.int32))
    return jnp.transpose(out, (2, 0, 1))  # (B, H, dh)


def beam_attention(q: Array, k_buf: Array, v_buf: Array, anc: Array,
                   pos) -> Array:
    """Dispatch: Pallas kernel on TPU (cache length permitting), XLA
    mask-plane formulation elsewhere. anc is the raw (S, N) int32
    ancestor table in both cases."""
    h, s, b, dh = k_buf.shape
    if (jax.default_backend() == "tpu" and s % J_CHUNK == 0
            and _pick_h_block(h, J_CHUNK, b, dh,
                              k_buf.dtype.itemsize) is not None):
        return beam_attention_pallas(q, k_buf, v_buf, anc, pos)
    return beam_attention_gather(q, k_buf, v_buf, anc, pos)
