"""Pallas fused selective-scan kernel (TPU).

Replaces the reference's `selective_scan_cuda.fwd`
(/root/reference/modules/mamba/selective_scan_interface.py:42,218): the
discretization (softplus, exp), first-order recurrence, output
contraction, D-skip, and silu(z) gating run in one VMEM-resident kernel —
the (L, D, N) discretized tensors never touch HBM. HBM traffic is exactly
the inputs once in + outputs once out.

Layout (TPU tiling: last dim = 128 lanes, 2nd-to-last = sublanes):
  per grid cell (batch b, d-tile d, length-chunk l):
    u/delta/z blocks   (L_CHUNK, d_tile)       d_tile = up to 4x128 lanes
    B/C blocks         (L_CHUNK, N)
    A^T, carry h       (N, d_tile)
  the in-chunk recurrence runs as a two-level parallel scan over the
  leading L axis of (L_CHUNK, N, d_tile) arrays — log-depth fully
  vectorized VPU passes instead of L sequential steps — and the running
  state h is carried across length-chunks in a VMEM scratch accumulator
  (grid iterates the L axis innermost).

Backward: jax.custom_vjp whose bwd on TPU is the ANALYTIC Pallas adjoint
(_scan_bwd_kernel via selective_scan_bwd_pallas): the forward kernel
emits its per-chunk boundary states (a few MB of f32 residual), then
each (batch, d-tile, time-chunk) cell re-runs the forward chunk scan
from its boundary state and a reverse g-recurrence entirely in VMEM —
the same recompute-in-backward strategy as the reference kernel's
checkpoint_lvl=1 (selective_scan_interface.py:223-226), but without the
XLA boundary-recompute pass (which materialized (B, L, N, D) arrays and
cost more than the kernel itself). On non-TPU backends the bwd falls
back to the chunk-checkpointed XLA adjoint
(ops.selective_scan.selective_scan_vjp).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Tile sizes, swept on a v5e at the heavy-config shapes (B8 T376 D1024
# N16, 2026-08): fwd+bwd ms/op — (128,128) 3.78, (128,256) 3.51,
# (64,128) 2.87, (64,256) 2.74 <- best; L_CHUNK=256 fails to compile
# (VMEM). Smaller L chunks shrink the (L, N, D_TILE) live set; D_TILE
# 256 amortizes per-cell overheads over two lane groups.
L_CHUNK = 64
COLS = 8  # within-row sequential width of the two-level in-chunk scan
D_TILE_MAX = 512
# Compute y through the fused combine+contraction
# (_forward_chunk_scan_fused_y) instead of materialize-then-contract.
# MEASURED PERF-NEUTRAL in the production kernel (in-process A/B,
# scripts/ab_scan_fused.py, v5e 2026-08-20: fwd-only 0.291 vs 0.289,
# fwd+bwd 0.883 vs 0.870 ms/op — within repeat spread), even though the
# residual-free harness kernel showed 0.251 -> 0.213
# (exp_scan_variants --variants base,fusedy): Mosaic already fuses the
# combine into the contraction here. Kept off as the recorded ablation,
# like _merged_chunk_scans.
FUSED_Y = False

# The kernels take A^T pre-scaled by log2(e) and discretize with exp2:
# exp(dt*A) = exp2(dt * (A*log2e)). The *log2e multiply moves off the
# per-element (L, N, D) hot path onto the tiny (N, D) parameter (exp on
# the VPU is exp2 plus that multiply). LN2 undoes the scale for the one
# adjoint term that needs the raw A (ddt's sum over gh*A).
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


def _d_tile(d_in: int, n_state: int = 16) -> int:
    """Feature-tile width: wide tiles amortize per-cell overheads —
    (64, 512) swept best at d_inner 1024 / N 16 (2.44 ms fwd+bwd vs 3.78
    at the old (128, 128)) — capped by the padded feature size so small
    models (e.g. d_inner 288) don't pad to 512, and by the VMEM budget
    when N grows: the bwd cell holds ~8 live (L_CHUNK, N, d_tile) fp32
    arrays (da, dbu, hs, h_prev, dh, g, gh, ash), so at N 16 / d_tile 512
    that is 8 * 64*16*512*4B = 16 MB (~the whole VMEM, compiles because
    not all are simultaneously live); N 32 at the same width would ask
    for 2x that, so halve the tile instead (same live bytes)."""
    cap = D_TILE_MAX if n_state <= 16 else D_TILE_MAX * 16 // _round_up(n_state, 8)
    # Lane alignment: tiles must stay multiples of the 128-lane group
    # (n_state 17..24 would otherwise yield 341 and mis-tile the blocks).
    cap = max(128, cap // 128 * 128)
    return min(cap, ((d_in + 127) // 128) * 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(u: Array, A: Array, h0, return_last_state: bool) -> bool:
    """Whether the Pallas kernel covers this config on this backend.

    h0 / return_last_state ARE supported (carried-state streaming and
    decoder-cache priming run fused), matching the reference kernel's
    x= / return_last_state options
    (/root/reference/modules/mamba/selective_scan_interface.py:30-79).
    """
    del h0, return_last_state
    if jax.default_backend() != "tpu":
        return False
    b, length, d = u.shape
    n = A.shape[1]
    # _d_tile() shrinks the feature tile as N grows so the bwd cell's
    # ~8 live (L_CHUNK, N, d_tile) fp32 arrays stay within the ~16 MB
    # VMEM that the swept N=16/d_tile=512 point occupies; beyond N=32
    # the tile would drop below one 128-lane group — fall back to XLA.
    return n <= 32 and length >= 1 and d >= 1


def _chunk_scan_prefixes(da, dbu, h_carry, lchunk, n_state):
    """Shared two-level machinery of the inclusive scan
    h_i = da_i h_{i-1} + dbu_i, h_{-1} = h_carry: reshape L into
    (ROWS, COLS), run a *sequential* inclusive scan within each row
    (COLS-1 cheap passes over 1/COLS of the data; slices + concat, no
    in-kernel scatter) and a log-depth Hillis scan over the ROWS
    row-aggregates. Returns (a, b, pref_h): row-local transmissions /
    inputs (ROWS, COLS, N, D) and the per-row entry state (ROWS, N, D),
    with hs = a * pref_h[:, None] + b.
    """
    rows, cols = lchunk // COLS, COLS
    a_in = da.reshape(rows, cols, n_state, da.shape[-1])
    b_in = dbu.reshape(rows, cols, n_state, dbu.shape[-1])
    pa, pb = a_in[:, 0:1], b_in[:, 0:1]
    cols_a, cols_b = [pa], [pb]
    for c in range(1, cols):
        cur_a = a_in[:, c : c + 1]
        cur_b = b_in[:, c : c + 1]
        pb = cur_a * pb + cur_b
        pa = cur_a * pa
        cols_a.append(pa)
        cols_b.append(pb)
    a = jnp.concatenate(cols_a, axis=1)
    b = jnp.concatenate(cols_b, axis=1)

    ra, rb = pa[:, 0], pb[:, 0]  # (ROWS, N, D) row aggregates
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    off = 1
    while off < rows:
        sa = jnp.roll(ra, off, axis=0)
        sb = jnp.roll(rb, off, axis=0)
        valid = row_idx >= off
        rb = jnp.where(valid, ra * sb + rb, rb)
        ra = jnp.where(valid, ra * sa, ra)
        off *= 2

    # Exclusive row prefixes with the carried state folded in.
    ex_a = jnp.roll(ra, 1, axis=0)
    ex_b = jnp.roll(rb, 1, axis=0)
    first = row_idx == 0
    ex_a = jnp.where(first, 1.0, ex_a)
    ex_b = jnp.where(first, 0.0, ex_b)
    pref_h = ex_a * h_carry[None] + ex_b  # (ROWS, N, D)
    return a, b, pref_h


def _forward_chunk_scan(da, dbu, h_carry, lchunk, n_state):
    """Inclusive scan via _chunk_scan_prefixes; returns hs (L, N, D)."""
    a, b, pref_h = _chunk_scan_prefixes(da, dbu, h_carry, lchunk, n_state)
    hs = a * pref_h[:, None] + b  # (ROWS, COLS, N, D)
    return hs.reshape(lchunk, n_state, hs.shape[-1])


def _forward_chunk_scan_fused_y(da, dbu, h_carry, cmat, lchunk, n_state):
    """Forward chunk scan with the y C-contraction folded into the
    combine: y = sum_n (a*pref_h + b) * C, so the (L, N, D) hs tensor is
    never materialized (h_last comes from the last (a, b, pref_h)
    slice). Bitwise-identical y/h_last to _forward_chunk_scan followed
    by the separate contraction (same expression tree: t = a*pref+b is
    still formed and rounded before the multiply by C). In the
    residual-free harness kernel this measured 0.251 -> 0.213 ms/op
    (exp_scan_variants --variants base,fusedy, v5e 2026-08-20), but in
    the PRODUCTION kernel it is perf-neutral (see FUSED_Y); kept as the
    recorded ablation. Returns (y (L, D), h_last (N, D)).
    """
    rows, cols = lchunk // COLS, COLS
    a, b, pref_h = _chunk_scan_prefixes(da, dbu, h_carry, lchunk, n_state)
    h_last = a[rows - 1, cols - 1] * pref_h[rows - 1] + b[rows - 1, cols - 1]
    c_in = cmat.reshape(rows, cols, n_state, 1)
    y = jnp.sum((a * pref_h[:, None] + b) * c_in, axis=2)
    return y.reshape(lchunk, a.shape[-1]), h_last


def _reverse_chunk_scan(ash, d, lchunk, n_state):
    """Reverse recurrence g_i = d_i + ash_i * g_{i+1}, g_L = 0.

    Mirror of _forward_chunk_scan running right-to-left (no lax.rev in
    Mosaic): backward within-row passes, a reverse row-aggregate scan,
    and a combine with row-boundary values. Returns g (L, N, D).
    """
    rows, cols = lchunk // COLS, COLS
    a_in = ash.reshape(rows, cols, n_state, ash.shape[-1])
    d_in = d.reshape(rows, cols, n_state, d.shape[-1])

    # Backward within-row scan G (row-local, assuming g after row = 0)
    # and suffix transmissions S[:, c] = prod_{j=c..cols-1} ash[:, j].
    pg = d_in[:, cols - 1 : cols]
    ps = a_in[:, cols - 1 : cols]
    cols_g, cols_s = [pg], [ps]
    for c in range(cols - 2, -1, -1):
        cur_a = a_in[:, c : c + 1]
        pg = d_in[:, c : c + 1] + cur_a * pg
        ps = cur_a * ps
        cols_g.append(pg)
        cols_s.append(ps)
    g_local = jnp.concatenate(cols_g[::-1], axis=1)  # (R, C, N, D)
    s_suffix = jnp.concatenate(cols_s[::-1], axis=1)

    # Row boundaries B_r = g at (r, 0) = G[r,0] + S[r,0] * B_{r+1}:
    # reverse first-order scan over rows (log-depth, rolls upward).
    rg = g_local[:, 0]  # (ROWS, N, D)
    rs = s_suffix[:, 0]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    off = 1
    while off < rows:
        sg = jnp.roll(rg, -off, axis=0)
        ss = jnp.roll(rs, -off, axis=0)
        valid = row_idx <= rows - 1 - off
        rg = jnp.where(valid, rg + rs * sg, rg)
        rs = jnp.where(valid, rs * ss, rs)
        off *= 2
    # rg[r] = B_r. Next-row boundary, 0 past the last row.
    b_next = jnp.roll(rg, -1, axis=0)
    b_next = jnp.where(row_idx == rows - 1, 0.0, b_next)

    g = g_local + s_suffix * b_next[:, None]  # (R, C, N, D)
    return g.reshape(lchunk, n_state, g.shape[-1])


def _merged_chunk_scans(da, dbu, h_carry, ash, dh, lchunk, n_state):
    """The bwd cell's two independent chunk scans — forward h recompute
    (h_i = da_i h_{i-1} + dbu_i) and reverse g recurrence
    (g_i = dh_i + ash_i g_{i+1}) — interleaved statement-by-statement in
    ONE pass so Mosaic can overlap their dependency chains (each scan
    alone is a serial multiply-add chain; interleaving doubles the
    instruction-level parallelism of the sequential within-row phase).
    Bitwise-identical results to running _forward_chunk_scan +
    _reverse_chunk_scan separately (same expression trees, just
    reordered independent statements). Returns (hs, g).

    MEASURED PERF-NEUTRAL on v5e (0.677 vs 0.680 ms/op at B8 T376 D1024
    N16, 2026-08-19): Mosaic's scheduler already extracts the available
    ILP — the bwd cell is VPU-throughput/VMEM-bound, not dependency-
    latency-bound. Kept (off by default) as the recorded ablation that
    rules out latency-oriented restructuring of the chunk scans; it also
    rules out the analogous dual-direction forward kernel idea."""
    rows, cols = lchunk // COLS, COLS
    d_lane = da.shape[-1]
    a_in = da.reshape(rows, cols, n_state, d_lane)
    b_in = dbu.reshape(rows, cols, n_state, d_lane)
    ra_in = ash.reshape(rows, cols, n_state, d_lane)
    rd_in = dh.reshape(rows, cols, n_state, d_lane)

    # Interleaved within-row sequential passes: fwd col c ascending,
    # rev col cols-1-c descending.
    pa, pb = a_in[:, 0:1], b_in[:, 0:1]
    pg, ps = rd_in[:, cols - 1 : cols], ra_in[:, cols - 1 : cols]
    cols_a, cols_b = [pa], [pb]
    cols_g, cols_s = [pg], [ps]
    for c in range(1, cols):
        cur_a = a_in[:, c : c + 1]
        cur_b = b_in[:, c : c + 1]
        rc = cols - 1 - c
        cur_ra = ra_in[:, rc : rc + 1]
        pb = cur_a * pb + cur_b
        pg = rd_in[:, rc : rc + 1] + cur_ra * pg
        pa = cur_a * pa
        ps = cur_ra * ps
        cols_a.append(pa)
        cols_b.append(pb)
        cols_g.append(pg)
        cols_s.append(ps)
    a = jnp.concatenate(cols_a, axis=1)
    b = jnp.concatenate(cols_b, axis=1)
    g_local = jnp.concatenate(cols_g[::-1], axis=1)
    s_suffix = jnp.concatenate(cols_s[::-1], axis=1)

    # Interleaved row-aggregate scans (fwd Hillis down, rev up).
    fra, frb = a[:, cols - 1], b[:, cols - 1]
    rg, rs = g_local[:, 0], s_suffix[:, 0]
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1, 1), 0)
    off = 1
    while off < rows:
        sa = jnp.roll(fra, off, axis=0)
        sb = jnp.roll(frb, off, axis=0)
        sg = jnp.roll(rg, -off, axis=0)
        ss = jnp.roll(rs, -off, axis=0)
        fvalid = row_idx >= off
        rvalid = row_idx <= rows - 1 - off
        frb = jnp.where(fvalid, fra * sb + frb, frb)
        rg = jnp.where(rvalid, rg + rs * sg, rg)
        fra = jnp.where(fvalid, fra * sa, fra)
        rs = jnp.where(rvalid, rs * ss, rs)
        off *= 2

    # Fwd combine: exclusive row prefixes with the carried state.
    ex_a = jnp.roll(fra, 1, axis=0)
    ex_b = jnp.roll(frb, 1, axis=0)
    first = row_idx == 0
    ex_a = jnp.where(first, 1.0, ex_a)
    ex_b = jnp.where(first, 0.0, ex_b)
    pref_h = ex_a * h_carry[None] + ex_b
    hs = a * pref_h[:, None] + b

    # Rev combine: next-row boundary, 0 past the last row.
    b_next = jnp.roll(rg, -1, axis=0)
    b_next = jnp.where(row_idx == rows - 1, 0.0, b_next)
    g = g_local + s_suffix * b_next[:, None]

    return (
        hs.reshape(lchunk, n_state, d_lane),
        g.reshape(lchunk, n_state, d_lane),
    )


def _scan_kernel(
    u_ref, dt_ref, bmat_ref, cmat_ref, at_ref, dtb_ref, dskip_ref, z_ref,
    h0_ref, out_ref, hb_ref, *rest,
    n_state: int, delta_softplus: bool, lchunk: int, emit_dt: bool,
):
    if emit_dt:
        dtp_ref, ypre_ref, h_ref = rest
    else:
        (h_ref,) = rest
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _():
        h_ref[...] = h0_ref[0].astype(h_ref.dtype)

    u = u_ref[0].astype(jnp.float32)          # (L, D)
    dt = dt_ref[0].astype(jnp.float32)        # (L, D)
    bmat = bmat_ref[0].astype(jnp.float32)    # (L, N)
    cmat = cmat_ref[0].astype(jnp.float32)    # (L, N)
    a_t2 = at_ref[...].astype(jnp.float32)    # (N, D), pre-scaled by log2e
    dt_bias = dtb_ref[...].astype(jnp.float32)  # (1, D)
    d_skip = dskip_ref[...].astype(jnp.float32)  # (1, D)
    z = z_ref[0].astype(jnp.float32)          # (L, D)

    dt = dt + dt_bias
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    if emit_dt:
        # Post-bias(+softplus) dt saved as a residual for the adjoint:
        # softplus (log1p+exp) + sigmoid on the (L, D) hot path cost the
        # backward ~0.30 of its 0.76 ms/op (ablation 2026-08-18) — an
        # extra f32 write here (+ one read there) is ~0.03 ms of HBM.
        dtp_ref[0] = dt.astype(dtp_ref.dtype)

    # (L, N, D) discretized transition / input.
    da = jnp.exp2(dt[:, None, :] * a_t2[None, :, :])
    dbu = (dt * u)[:, None, :] * bmat[:, :, None]

    h_carry = h_ref[...].astype(jnp.float32)  # (N, D)
    if FUSED_Y:
        # Fused combine+contraction: hs never materialized (DESIGN §8b).
        y, h_last = _forward_chunk_scan_fused_y(
            da, dbu, h_carry, cmat, lchunk, n_state
        )
    else:  # A/B escape hatch (trace-time flag; bitwise-identical)
        hs = _forward_chunk_scan(da, dbu, h_carry, lchunk, n_state)
        h_last = hs[lchunk - 1]
        y = jnp.sum(hs * cmat[:, :, None], axis=1)
    h_ref[...] = h_last
    # Per-chunk boundary state, indexed by the l axis: h_bounds[:, l] is
    # the state AFTER chunk l. The final chunk's entry is h_last (padding
    # steps are identity), and the backward pass seeds each chunk cell
    # from h_bounds[:, l-1] — which removes the whole XLA
    # boundary-recompute pass the adjoint otherwise needs.
    hb_ref[0, 0] = h_last.astype(hb_ref.dtype)

    y = y + u * d_skip
    if emit_dt:
        # Pre-gate y saved for the adjoint's dz term: one extra f32
        # write here (+ one read there) replaces the adjoint's own
        # sum-over-N recontraction of hs*C (~0.08 ms of its 0.25 ms
        # reduce_n budget at the heavy shape, ablation 2026-08-18).
        ypre_ref[0] = y.astype(ypre_ref.dtype)
    y = y * jax.nn.silu(z)
    out_ref[0] = y.astype(out_ref.dtype)


def _scan_bwd_kernel(
    u_ref, dt_ref, bmat_ref, cmat_ref, at_ref, dskip_ref, z_ref,
    dout_ref, hstart_ref, dhl_ref, *rest,
    n_state: int, delta_softplus: bool, lchunk: int,
    valid_len: int, merged: bool = False, have_ypre: bool = False,
):
    """Adjoint of one (batch, d-tile, time-chunk) cell.

    The time-chunk grid axis iterates REVERSED (index maps feed chunks
    last-to-first); the VMEM scratch g_ref carries
    a_first * g_first of the chunk to its predecessor. dA partials
    accumulate into a per-(batch, d-tile) output block (constant across
    the innermost l axis, so the block stays VMEM-resident).

    The last-state cotangent dhl seeds g_ref (it adds to dL/dh at the
    final position with coefficient 1 — padded steps are identity, so it
    propagates to the true last step unchanged); the final g_ref value,
    da_first * g_first of the temporally-first chunk, is exactly dL/dh0
    and is emitted through dh0_ref. Unlike the reference kernel, which
    drops the last-state gradient (selective_scan_interface.py:84-86),
    this adjoint is complete.
    """
    if have_ypre:
        (ypre_ref, du_ref, ddt_ref, dbm_ref, dcm_ref, dz_ref, dapart_ref,
         dh0_ref, ddsum_ref, ddbsum_ref, g_ref) = rest
    else:
        ypre_ref = None
        (du_ref, ddt_ref, dbm_ref, dcm_ref, dz_ref, dapart_ref,
         dh0_ref, ddsum_ref, ddbsum_ref, g_ref) = rest
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _():
        g_ref[...] = dhl_ref[0].astype(g_ref.dtype)
        dapart_ref[...] = jnp.zeros_like(dapart_ref)
        ddsum_ref[...] = jnp.zeros_like(ddsum_ref)
        ddbsum_ref[...] = jnp.zeros_like(ddbsum_ref)

    u = u_ref[0].astype(jnp.float32)
    # dt_ref carries the POST-bias(+softplus) dt the forward emitted (or
    # an XLA precompute on the direct-call path) — padded rows are 0.
    dt = dt_ref[0].astype(jnp.float32)
    bmat = bmat_ref[0].astype(jnp.float32)
    cmat = cmat_ref[0].astype(jnp.float32)
    a_t2 = at_ref[...].astype(jnp.float32)  # pre-scaled by log2e
    d_skip = dskip_ref[...].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    dout = dout_ref[0].astype(jnp.float32)
    h_start = hstart_ref[0, 0].astype(jnp.float32)  # (N, D)

    if delta_softplus:
        # sigmoid(x) recovered from softplus(x) without the raw x:
        # d softplus/dx = sigmoid(x) = 1 - exp(-softplus(x)). Mosaic has
        # no expm1, so the subtraction form is used; for dt < ~1e-7 it
        # cancels to ~dt with ~1e-7 ABSOLUTE error — a perturbation of a
        # gradient that is itself vanishing there, measured invisible at
        # f32 test tolerances.
        dsp = 1.0 - jnp.exp2(-LOG2E * dt)
    else:
        dsp = jnp.ones_like(dt)

    da = jnp.exp2(dt[:, None, :] * a_t2[None, :, :])  # (L, N, D)
    dbu = (dt * u)[:, None, :] * bmat[:, :, None]

    sig = jax.nn.sigmoid(z)
    silu = z * sig
    dy = dout * silu  # (L, D)

    dh = dy[:, None, :] * cmat[:, :, None]  # (L, N, D)
    # Fold the carry from the (temporally) next chunk into the last
    # position: carry already includes its a coefficient.
    g_carry = g_ref[...].astype(jnp.float32)
    dh = jnp.concatenate([dh[:-1], dh[-1:] + g_carry[None]], axis=0)
    # ash_i = a_{i+1} within the chunk; the cross-chunk term lives in the
    # folded carry, so ash at the last position is 0.
    ash = jnp.concatenate([da[1:], jnp.zeros_like(da[:1])], axis=0)
    if merged:
        # One interleaved pass over both serial chains (see
        # _merged_chunk_scans) — bitwise-identical, higher ILP.
        hs, g = _merged_chunk_scans(
            da, dbu, h_start, ash, dh, lchunk, n_state
        )
    else:
        hs = _forward_chunk_scan(da, dbu, h_start, lchunk, n_state)
        g = _reverse_chunk_scan(ash, dh, lchunk, n_state)
    carry = da[0] * g[0]
    g_ref[...] = carry
    # dh0 block is constant across l: final (temporally-first) write wins.
    dh0_ref[0] = carry.astype(dh0_ref.dtype)

    # gh = g * h_prev * da, with da*h_prev recovered as hs - dbu (the
    # recurrence hs = da*h_prev + dbu, rearranged): drops the h_prev
    # concat + one (L, N, D) multiply. Cancellation when hs ≈ dbu only
    # amplifies gh's RELATIVE error; its absolute error stays at the
    # rounding of hs, which bounds the dA/ddt sums the same either way.
    gh = g * (hs - dbu)  # (L, N, D) — shared by dA and the a-path of ddt
    t1 = jnp.sum(g * bmat[:, :, None], axis=1)  # (L, D)
    # a_t2 = A^T*log2e, so the raw-A contraction needs the LN2 unscale.
    ddt = t1 * u + jnp.sum(gh * a_t2[None], axis=1) * LN2
    du = t1 * dt + dy * d_skip
    dbm = jnp.sum(g * (dt * u)[:, None, :], axis=2)  # (L, N)
    dcm = jnp.sum(hs * dy[:, None, :], axis=2)       # (L, N)
    if have_ypre:
        y_pre = ypre_ref[0].astype(jnp.float32)
    else:
        y_pre = jnp.sum(hs * cmat[:, :, None], axis=1) + u * d_skip
    dz = dout * y_pre * (sig * (1.0 + z * (1.0 - sig)))

    du_ref[0] = du.astype(du_ref.dtype)
    ddt_ref[0] = (ddt * dsp).astype(ddt_ref.dtype)
    # dD / ddb accumulate IN-KERNEL over the l axis (block constant in l
    # stays VMEM-resident) — the alternative XLA epilogue re-reads
    # dout/z/u (dD) and ddt (ddb) from HBM, ~4 (B, L, D) passes per op.
    # dD needs no time mask (padded dout/u are zero); ddb does in the
    # delta_softplus=False case (padded rows carry a nonzero gh term).
    # The l grid axis is REVERSED: this cell covers time rows starting
    # at (nl_total - 1 - l_idx) * lchunk, where nl_total = num_programs.
    nl_total = pl.num_programs(2)
    t0_row = (nl_total - 1 - l_idx) * lchunk
    row = jax.lax.broadcasted_iota(jnp.int32, (lchunk, 1), 0)
    tvalid = (t0_row + row) < valid_len
    ddsum_ref[...] += jnp.sum(dy * u, axis=0)[None, None].astype(
        ddsum_ref.dtype
    )
    ddbsum_ref[...] += jnp.sum(
        jnp.where(tvalid, ddt * dsp, 0.0), axis=0
    )[None, None].astype(ddbsum_ref.dtype)
    # dB/dC are reductions over ALL of D: each d-tile writes its partial
    # into a tile-indexed slot (summed outside) — a block indexed only by
    # (b, l) would be overwritten, not accumulated, across d-tiles.
    dbm_ref[0, 0] = dbm.astype(dbm_ref.dtype)
    dcm_ref[0, 0] = dcm.astype(dcm_ref.dtype)
    dz_ref[0] = dz.astype(dz_ref.dtype)
    dapart_ref[...] += jnp.sum(gh * dt[:, None, :], axis=0).astype(
        dapart_ref.dtype
    )[None]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9,)
)
def _selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias, h0,
                           delta_softplus):
    return _pallas_fwd_impl(u, delta, A, B, C, D, z, delta_bias,
                            delta_softplus, h0=h0)


def _pad_delta_identity(delta, dtb, length, lp, dp, delta_softplus):
    """Pad delta so padded time steps are identity (da=1, dbu=0): after
    adding dt_bias and (optionally) softplus, dt on padding must be 0."""
    d_in = delta.shape[-1]
    delta_p = jnp.pad(
        delta,
        ((0, 0), (0, lp - length), (0, dp - d_in)),
        constant_values=-1e9 if delta_softplus else 0.0,
    )
    if not delta_softplus and lp > length:
        t_idx = jnp.arange(lp)[None, :, None]
        delta_p = jnp.where(t_idx < length, delta_p, -dtb[None])
    return delta_p


def _pallas_fwd_impl(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                     h0=None, interpret: bool = False,
                     want_bounds: bool = False):
    """Returns (out (B, L, D) in u.dtype, h_last (B, D, N) float32), plus
    — when `want_bounds` (the training path) — the per-chunk boundary
    states (B, n_chunks, N, Dp) float32, the post-softplus dt
    (B, Lp, Dp) float32, and the pre-gate y (B, Lp, Dp) float32, all in
    kernel layout (consumed by the analytic adjoint, which then needs no
    softplus/sigmoid recompute and no hs*C recontraction for dz)."""
    bsz, length, d_in = u.shape
    n = A.shape[1]
    dtype_in = u.dtype

    lp = _round_up(length, L_CHUNK)
    d_tile = _d_tile(d_in, n)
    dp = _round_up(d_in, d_tile)

    def pad_ld(x):  # (B, L, D)
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, dp - d_in)))

    def pad_ln(x):  # (B, L, N)
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, 0)))

    u_p = pad_ld(u)
    dtb = jnp.pad(
        delta_bias if delta_bias is not None else jnp.zeros((d_in,)),
        (0, dp - d_in),
    )[None, :]
    delta_p = _pad_delta_identity(delta, dtb, length, lp, dp, delta_softplus)
    z_p = pad_ld(z) if z is not None else jnp.zeros_like(u_p)
    b_p = pad_ln(B)
    c_p = pad_ln(C)
    # Kernels discretize with exp2: pre-scale A^T by log2e (see LOG2E).
    a_t = jnp.pad(A.T.astype(jnp.float32) * LOG2E,
                  ((0, 0), (0, dp - d_in)))  # (N, Dp)
    dsk = jnp.pad(
        D if D is not None else jnp.zeros((d_in,)), (0, dp - d_in)
    )[None, :]
    # h0 in kernel layout (B, N, Dp), float32.
    if h0 is None:
        h0_t = jnp.zeros((bsz, n, dp), jnp.float32)
    else:
        h0_t = jnp.pad(
            jnp.swapaxes(h0.astype(jnp.float32), 1, 2),
            ((0, 0), (0, 0), (0, dp - d_in)),
        )

    nl = lp // L_CHUNK
    grid = (bsz, dp // d_tile, nl)

    out_specs = [
        pl.BlockSpec((1, L_CHUNK, d_tile), lambda b, d, l: (b, l, d)),
        # Inference paths don't consume per-chunk boundaries: collapse
        # the l axis to one block (the TPU grid runs chunks in order,
        # so the final chunk's write wins == h_last) instead of
        # streaming nl dead (N, Dp) blocks to HBM per scan call.
        pl.BlockSpec(
            (1, 1, n, d_tile),
            (lambda b, d, l: (b, l, 0, d)) if want_bounds
            else (lambda b, d, l: (b, 0, 0, d)),
        ),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((bsz, lp, dp), dtype_in),
        jax.ShapeDtypeStruct(
            (bsz, nl if want_bounds else 1, n, dp), jnp.float32
        ),
    ]
    if want_bounds:  # training: also emit post-softplus dt + pre-gate y
        out_specs.append(
            pl.BlockSpec((1, L_CHUNK, d_tile), lambda b, d, l: (b, l, d))
        )
        out_shapes.append(jax.ShapeDtypeStruct((bsz, lp, dp), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, L_CHUNK, d_tile), lambda b, d, l: (b, l, d))
        )
        out_shapes.append(jax.ShapeDtypeStruct((bsz, lp, dp), jnp.float32))

    outs = pl.pallas_call(
        functools.partial(
            _scan_kernel,
            n_state=n,
            delta_softplus=delta_softplus,
            lchunk=L_CHUNK,
            emit_dt=want_bounds,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L_CHUNK, d_tile), lambda b, d, l: (b, l, d)),
            pl.BlockSpec((1, L_CHUNK, d_tile), lambda b, d, l: (b, l, d)),
            pl.BlockSpec((1, L_CHUNK, n), lambda b, d, l: (b, l, 0)),
            pl.BlockSpec((1, L_CHUNK, n), lambda b, d, l: (b, l, 0)),
            pl.BlockSpec((n, d_tile), lambda b, d, l: (0, d)),
            pl.BlockSpec((1, d_tile), lambda b, d, l: (0, d)),
            pl.BlockSpec((1, d_tile), lambda b, d, l: (0, d)),
            pl.BlockSpec((1, L_CHUNK, d_tile), lambda b, d, l: (b, l, d)),
            pl.BlockSpec((1, n, d_tile), lambda b, d, l: (b, 0, d)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((n, d_tile), jnp.float32)],
        interpret=interpret,
    )(u_p, delta_p, b_p, c_p, a_t, dtb, dsk, z_p, h0_t)
    out, h_bounds = outs[0], outs[1]
    h_last = jnp.swapaxes(h_bounds[:, -1, :, :d_in], 1, 2)  # (B, D, N)
    if want_bounds:
        return out[:, :length, :d_in], h_last, h_bounds, outs[2], outs[3]
    return out[:, :length, :d_in], h_last


def selective_scan_bwd_pallas(
    residuals, dout, delta_softplus: bool, interpret: bool = False,
    boundaries=None, dt_post=None, merged: bool = False, y_pre=None,
):
    """Pallas adjoint: per-cell VMEM-resident backward (see
    _scan_bwd_kernel).

    residuals: (u, delta, A, B, C, D, z, delta_bias) or the same + h0.
    dout: out cotangent, or a (dout, dhlast) tuple when the forward also
    returned the last state.
    The dD and ddb reductions happen inside the kernel cells (accumulated
    over the time-chunk grid axis); only (B, Dp) batch sums run in XLA.
    boundaries: optional per-chunk boundary states (B, nl, N, Dp) emitted
    by the forward kernel (want_bounds=True); when absent they are
    recomputed with an XLA chunk-aggregate pass.
    dt_post: optional post-bias(+softplus) dt (B, Lp, Dp) f32 in kernel
    layout, as emitted by the forward (padded rows 0); when absent it is
    computed here in XLA. Either way the kernel itself runs no
    softplus/sigmoid (~0.30 of its 0.76 ms/op at the heavy shape).
    y_pre: optional pre-gate y (B, Lp, Dp) f32 emitted by the forward;
    when present the kernel's dz term reads it instead of recontracting
    hs*C over N. There is no XLA fallback (it would need hs) — absent
    means compute in-kernel, as before.
    Returns grads matching the residuals' arity.
    """
    if len(residuals) == 9:
        u, delta, A, B, C, D, z, delta_bias, h0 = residuals
    else:
        (u, delta, A, B, C, D, z, delta_bias), h0 = residuals, None
    if isinstance(dout, (tuple, list)):
        dout, dhlast = dout
    else:
        dhlast = None
    bsz, length, d_in = u.shape
    n = A.shape[1]

    lp = _round_up(length, L_CHUNK)
    d_tile = _d_tile(d_in, n)
    dp = _round_up(d_in, d_tile)
    nl = lp // L_CHUNK

    def pad_ld(x):
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, dp - d_in)))

    def pad_ln(x):
        return jnp.pad(x, ((0, 0), (0, lp - length), (0, 0)))

    def pad_nd(x):  # (B, D, N) state/cotangent -> kernel (B, N, Dp) f32
        if x is None:
            return jnp.zeros((bsz, n, dp), jnp.float32)
        return jnp.pad(
            jnp.swapaxes(x.astype(jnp.float32), 1, 2),
            ((0, 0), (0, 0), (0, dp - d_in)),
        )

    u_p = pad_ld(u)
    if dt_post is None:
        dtb = jnp.pad(delta_bias, (0, dp - d_in))[None, :]
        delta_p = _pad_delta_identity(
            delta, dtb, length, lp, dp, delta_softplus
        )
        dtf = delta_p.astype(jnp.float32) + dtb.astype(jnp.float32)
        dt_post = jax.nn.softplus(dtf) if delta_softplus else dtf
    z_p = pad_ld(z)
    b_p = pad_ln(B)
    c_p = pad_ln(C)
    dout_p = pad_ld(dout)
    a_t = jnp.pad(A.T.astype(jnp.float32) * LOG2E, ((0, 0), (0, dp - d_in)))
    dsk = jnp.pad(D, (0, dp - d_in))[None, :]
    h0_t = pad_nd(h0)
    dhl_t = pad_nd(dhlast)

    if boundaries is not None:
        # Forward-kernel-emitted boundary states: h before chunk l is h0
        # for l=0, else the state after chunk l-1.
        h_starts = jnp.concatenate(
            [h0_t[:, None], boundaries[:, :-1].astype(jnp.float32)], axis=1
        )
    else:
        # Chunk-boundary states (XLA forward over chunk aggregates) —
        # only for direct calls; the custom_vjp path passes `boundaries`.
        dtf = dt_post.astype(jnp.float32)
        uf = u_p.astype(jnp.float32)
        atf = a_t.astype(jnp.float32)

        def chunked(x):
            return jnp.moveaxis(
                x.reshape(bsz, nl, L_CHUNK, x.shape[-1]), 1, 0
            )

        u_c, dt_c, b_c = (
            chunked(uf), chunked(dtf), chunked(b_p.astype(jnp.float32))
        )

        def boundary_body(h, xs):
            uu, dd, bb = xs  # (B, L, D) / (B, L, N)
            # atf is the kernel-layout A^T*log2e — exp2 matches the kernel.
            da = jnp.exp2(dd[:, :, None, :] * atf[None, None])  # (B,L,N,D)
            dbu = (dd * uu)[:, :, None, :] * bb[:, :, :, None]
            dbu = dbu.at[:, 0].add(da[:, 0] * h)

            def comb(x, y):
                return (y[0] * x[0], y[0] * x[1] + y[1])

            pa, pb = jax.lax.associative_scan(comb, (da, dbu), axis=1)
            return pb[:, -1], h

        _, h_starts = jax.lax.scan(boundary_body, h0_t, (u_c, dt_c, b_c))
        h_starts = jnp.moveaxis(h_starts, 0, 1)  # (B, nc, N, Dp)

    grid = (bsz, dp // d_tile, nl)
    rev = lambda b, d, l: (b, nl - 1 - l, d)
    rev_n = lambda b, d, l: (b, nl - 1 - l, 0)

    in_specs = [
        pl.BlockSpec((1, L_CHUNK, d_tile), rev),
        pl.BlockSpec((1, L_CHUNK, d_tile), rev),
        pl.BlockSpec((1, L_CHUNK, n), rev_n),
        pl.BlockSpec((1, L_CHUNK, n), rev_n),
        pl.BlockSpec((n, d_tile), lambda b, d, l: (0, d)),
        pl.BlockSpec((1, d_tile), lambda b, d, l: (0, d)),
        pl.BlockSpec((1, L_CHUNK, d_tile), rev),
        pl.BlockSpec((1, L_CHUNK, d_tile), rev),
        pl.BlockSpec((1, 1, n, d_tile), lambda b, d, l: (b, nl - 1 - l, 0, d)),
        pl.BlockSpec((1, n, d_tile), lambda b, d, l: (b, 0, d)),
    ]
    operands = [u_p, dt_post, b_p, c_p, a_t, dsk, z_p, dout_p, h_starts,
                dhl_t]
    if y_pre is not None:
        in_specs.append(pl.BlockSpec((1, L_CHUNK, d_tile), rev))
        operands.append(y_pre)

    outs = pl.pallas_call(
        functools.partial(
            _scan_bwd_kernel,
            n_state=n,
            delta_softplus=delta_softplus,
            lchunk=L_CHUNK,
            valid_len=length,
            merged=merged,
            have_ypre=y_pre is not None,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, L_CHUNK, d_tile), rev),
            pl.BlockSpec((1, L_CHUNK, d_tile), rev),
            pl.BlockSpec((1, 1, L_CHUNK, n), lambda b, d, l: (d, b, nl - 1 - l, 0)),
            pl.BlockSpec((1, 1, L_CHUNK, n), lambda b, d, l: (d, b, nl - 1 - l, 0)),
            pl.BlockSpec((1, L_CHUNK, d_tile), rev),
            pl.BlockSpec((1, n, d_tile), lambda b, d, l: (b, 0, d)),
            pl.BlockSpec((1, n, d_tile), lambda b, d, l: (b, 0, d)),
            # (B, 1, Dp) with a unit middle axis: Mosaic requires the
            # block's second-to-last dim to divide 8 or equal the array
            # dim — a (1, d_tile) block on (B, Dp) violates that.
            pl.BlockSpec((1, 1, d_tile), lambda b, d, l: (b, 0, d)),
            pl.BlockSpec((1, 1, d_tile), lambda b, d, l: (b, 0, d)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, lp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, dp), jnp.float32),
            jax.ShapeDtypeStruct((dp // d_tile, bsz, lp, n), jnp.float32),
            jax.ShapeDtypeStruct((dp // d_tile, bsz, lp, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, dp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, dp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, dp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, dp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n, d_tile), jnp.float32)],
        interpret=interpret,
    )(*operands)

    du_p, ddt_p, dbm_p, dcm_p, dz_p, dapart, dh0_p, ddsum, ddbsum = outs
    du = du_p[:, :length, :d_in].astype(u.dtype)
    ddt = ddt_p[:, :length, :d_in]
    dB = dbm_p.sum(axis=0)[:, :length].astype(B.dtype)
    dC = dcm_p.sum(axis=0)[:, :length].astype(C.dtype)
    dz = dz_p[:, :length, :d_in].astype(z.dtype)
    dA = dapart[:, :, :d_in].sum(axis=0).T.astype(A.dtype)  # (D, N)

    # dD / ddb were reduced over L inside the kernel; only the tiny
    # (B, Dp) batch sum remains here.
    dD = ddsum[:, 0, :d_in].sum(axis=0).astype(D.dtype)
    ddb = ddbsum[:, 0, :d_in].sum(axis=0).astype(delta_bias.dtype)
    grads = (du, ddt.astype(delta.dtype), dA, dB, dC, dD, dz, ddb)
    if h0 is None:
        return grads
    dh0 = jnp.swapaxes(dh0_p[:, :, :d_in], 1, 2).astype(h0.dtype)
    return grads + (dh0,)


def _fwd(u, delta, A, B, C, D, z, delta_bias, h0, delta_softplus):
    # NOTE: _fwd/_bwd branch on jax.default_backend() at TRACE time (the
    # repo-wide convention: one backend per process; tests force CPU via
    # jax.config before any device use). Jitting this op with an explicit
    # non-default backend=/device= override is therefore unsupported — it
    # would pick the wrong branch (e.g. the TPU-only Pallas adjoint traced
    # for a CPU executable). There is no public jit(backend=...) usage in
    # this repo, and committed-device derivation is impossible here: the
    # inputs are abstract tracers at this point.
    if jax.default_backend() == "tpu":
        out, h_last, bounds, dt_post, y_pre = _pallas_fwd_impl(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, h0=h0,
            want_bounds=True,
        )
    else:
        out, h_last = _pallas_fwd_impl(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, h0=h0
        )
        bounds = dt_post = y_pre = None
    return (out, h_last), (u, delta, A, B, C, D, z, delta_bias, h0, bounds,
                           dt_post, y_pre)


def _bwd(delta_softplus, residuals, g):
    """Analytic adjoint, VMEM-resident Pallas kernel on TPU (two in-cell
    chunk scans: h recompute + reverse g recurrence — the reference CUDA
    kernel's recompute strategy, selective_scan_interface.py bwd), seeded
    with the forward kernel's chunk-boundary states; autodiff of the
    chunked XLA scan is the non-TPU fallback."""
    *res, bounds, dt_post, y_pre = residuals
    if jax.default_backend() == "tpu":
        return selective_scan_bwd_pallas(tuple(res), g, delta_softplus,
                                         boundaries=bounds, dt_post=dt_post,
                                         y_pre=y_pre)
    from mamba_asr_tpu.ops.selective_scan import selective_scan_chunked

    def f(u, delta, A, B, C, D, z, delta_bias, h0):
        return selective_scan_chunked(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, h0, True
        )

    _, vjp_fn = jax.vjp(f, *res)
    return vjp_fn(g)


_selective_scan_pallas.defvjp(_fwd, _bwd)


def selective_scan_pallas(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    h0: Optional[Array] = None,
    return_last_state: bool = False,
):
    """Public fused entry (custom_vjp; see module docstring).

    Returns out (B, L, D), or (out, h_last (B, D, N) float32) when
    return_last_state — matching the reference kernel's carried-state
    contract (selective_scan_interface.py:80-86), but with a complete
    adjoint (dh0 and d(h_last) both flow).
    """
    bsz, _, d_in = u.shape
    n = A.shape[1]
    if D is None:
        D = jnp.zeros((d_in,), jnp.float32)
    if z is None:
        raise ValueError("pallas kernel requires the silu gate z")
    if delta_bias is None:
        delta_bias = jnp.zeros((d_in,), jnp.float32)
    if h0 is None:
        h0 = jnp.zeros((bsz, d_in, n), jnp.float32)
    out, h_last = _selective_scan_pallas(
        u, delta, A, B, C, D, z, delta_bias, h0, delta_softplus
    )
    if return_last_state:
        return out, h_last
    return out
