"""Fused CTC-select DP: both log-semiring frame recurrences in one
Pallas launch.

`CTCPrefixScorer.select` (decoding/ctc_prefix_scorer.py) advances the
r_nb/r_b rows of every surviving hypothesis with two first-order linear
recurrences in the log semiring (⊕ = logaddexp, ⊗ = +):

    r_nb(t) = (r_nb(t-1) ⊗ a_nb(t)) ⊕ grow(t)
    r_b(t)  = (r_b(t-1) ⊗ lpb(t)) ⊕ (valid(t) ? r_nb(t-1) ⊗ lpb(t) : -inf)

As two `lax.associative_scan`s over T ≈ 1500 these are *stage-count*
bound on TPU: XLA's binary odd/even decomposition issues ~2·log2(T)
dependent sub-stages per scan, each a sliver of elementwise work plus
fixed overhead, and the second scan serializes behind the first
(~6 ms/beam-step measured at T 1500, beam 66 on a v5e — pure latency,
~0 bytes and ~0 FLOPs). Reference context: this DP is the ESPnet
CTCPrefixScore frame loop (run on CPU per step there;
/root/reference/hparams/S2S/conmamba_large.yaml:331-361).

Kernel design: everything lives in VMEM at once ((T, N) f32 planes are
~0.8 MB each at T 1536, N 128), so both recurrences run back-to-back in
ONE launch with a two-level scan each — Hillis-Steele doubling over
affine-map pairs within 128-frame rows (log2(128) = 7 vector steps over
the whole (rows, 128, N) block), then a static Python loop carries the
~dozen row boundaries. Same decomposition as the selective-scan kernel
(ops/pallas/scan.py::_forward_chunk_scan). Lanes = hypotheses (the
recurrences are independent across N), so wide beams vectorize for free;
the N axis is grid-tiled if it outgrows one VMEM block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

NEG = -1e30
_COLS = 128
_N_TILE = 128


def _linlog_2level(a: Array, b: Array, rows: int, cols: int) -> Array:
    """Solve x(t) = logaddexp(x(t-1) + a(t), b(t)), x(-1) = -inf, over a
    (rows, cols, N) block: doubling within rows, carried across rows.

    The affine map m_t : x -> (x ⊗ a_t) ⊕ b_t composes as
    (m2 ∘ m1)(x) = (x ⊗ (a1+a2)) ⊕ ((b1 ⊗ a2) ⊕ b2); Hillis-Steele
    doubling leaves (A, B)[c] = composition of maps 0..c within the row,
    so x(c) = B[c] ⊕ (x_rowstart ⊗ A[c])."""
    A, B = a, b
    k = 1
    while k < cols:
        # Identity map (0, -inf) shifted in below row start.
        Ash = jnp.concatenate(
            [jnp.zeros_like(A[:, :k]), A[:, :-k]], axis=1
        )
        Bsh = jnp.concatenate(
            [jnp.full_like(B[:, :k], NEG), B[:, :-k]], axis=1
        )
        A, B = Ash + A, jnp.logaddexp(Bsh + A, B)
        k *= 2
    carry = jnp.full(a.shape[-1:], NEG, jnp.float32)
    out = []
    for r in range(rows):
        xr = jnp.logaddexp(carry[None, :] + A[r], B[r])  # (cols, N)
        out.append(xr)
        carry = xr[cols - 1]
    return jnp.stack(out, axis=0)


def _ctc_dp_kernel(a_nb_ref, grow_ref, lpb_ref, valid_ref,
                   rnb_ref, rb_ref, *, rows: int, cols: int):
    shape = (rows, cols, a_nb_ref.shape[-1])
    a_nb = a_nb_ref[...].reshape(shape)
    grow = grow_ref[...].reshape(shape)
    r_nb = _linlog_2level(a_nb, grow, rows, cols)
    flat = r_nb.reshape(rows * cols, shape[-1])
    rnb_ref[...] = flat

    # r_b consumes r_nb shifted one frame: global shift via concat.
    rnb_sh = jnp.concatenate(
        [jnp.full_like(flat[:1], NEG), flat[:-1]], axis=0
    )
    lpb = lpb_ref[...]
    valid = valid_ref[...]
    b_b = jnp.where(valid > 0.0, rnb_sh + lpb, NEG)
    r_b = _linlog_2level(
        lpb.reshape(shape), b_b.reshape(shape), rows, cols
    )
    rb_ref[...] = r_b.reshape(rows * cols, shape[-1])


def ctc_dp_pallas(a_nb: Array, grow: Array, lpb: Array, valid: Array,
                  interpret: bool = False) -> tuple[Array, Array]:
    """(T, N) f32 inputs -> (r_nb, r_b), both (T, N) f32.

    a_nb: ⊗-coefficient of the r_nb recurrence (0 at invalid frames);
    grow: ⊕-input of r_nb (-inf at invalid frames);
    lpb: blank log-prob per frame (0 at invalid frames);
    valid: 1.0 where the frame is within the utterance, else 0.0.
    Pads T up to a multiple of 128 (identity maps) and tiles hypotheses
    over the lane axis."""
    t, n = a_nb.shape
    tp = -(-t // _COLS) * _COLS
    rows = tp // _COLS
    f32 = jnp.float32

    def padt(x, fill):
        return jnp.pad(x.astype(f32), ((0, tp - t), (0, 0)),
                       constant_values=fill)

    a_p, g_p = padt(a_nb, 0.0), padt(grow, NEG)
    l_p, v_p = padt(lpb, 0.0), padt(valid, 0.0)

    n_tile = min(_N_TILE, -(-n // 128) * 128)
    npad = -(-n // n_tile) * n_tile

    def padn(x, fill):
        return jnp.pad(x, ((0, 0), (0, npad - n)), constant_values=fill)

    a_p, g_p = padn(a_p, 0.0), padn(g_p, NEG)
    l_p, v_p = padn(l_p, 0.0), padn(v_p, 0.0)

    spec = pl.BlockSpec((tp, n_tile), lambda i: (0, i))
    r_nb, r_b = pl.pallas_call(
        functools.partial(_ctc_dp_kernel, rows=rows, cols=_COLS),
        grid=(npad // n_tile,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((tp, npad), f32),
            jax.ShapeDtypeStruct((tp, npad), f32),
        ),
        interpret=interpret,
    )(a_p, g_p, l_p, v_p)
    return r_nb[:t, :n], r_b[:t, :n]
