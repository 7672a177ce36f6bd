"""Sequence (context) parallelism for the selective scan and causal conv.

The reference scales long audio only algorithmically (linear-time SSM);
its one parallelism is DDP (/root/reference/train_CTC.py:1062). On a TPU
mesh the time axis itself can be sharded: each device holds a contiguous
time slice of the activations, and the SSM recurrence is chained across
shards with ICI collectives. This module provides the two time-coupled
ops that need cross-shard communication — everything else in a ConMamba
layer (LN, FFN, projections, gating) is pointwise in time and runs on
local shards untouched.

Exactness, not approximation: `sp_selective_scan` reproduces the
unsharded scan bit-for-bit up to fp associativity.

How the recurrence is chained (two fused-kernel passes):

1. Every shard runs the local fused scan with h0 = 0 and takes its last
   state `h_loc`. The shard's transmission matrix — the product of its
   per-step transitions prod_t exp(dt_t * A) — collapses to ONE exp of
   the summed dt because A is diagonal and time-invariant:
   A_k = exp(A * sum_t dt_t). No extra scan, just a (B, D) sum.
2. The tiny per-shard pairs (A_k, h_loc) are all-gathered over the mesh
   axis; every shard combines them (a static n_shards-step loop on
   replicated values) into its true incoming state
   h0_k = sum_{j<k} (prod_{j<i<k} A_i) h_loc_j + (prod_{i<k} A_i) h0,
   then re-runs the local fused scan seeded with h0_k.

Cost: 2 local scans of T/n steps each + one all-gather of two (B, D, N)
tensors, i.e. ~2/n of the unsharded scan time — a 4x speedup at n = 8 —
while the (B, L, D) activations never leave their shards. The backward
pass differentiates the same composition: the Pallas kernel's complete
adjoint (dh0 in, d(h_last) out — ops/pallas/scan.py) is exactly what
makes the chain differentiable without custom glue.

The causal conv needs only a (K-1)-frame halo from the predecessor
shard (`ppermute`); the first shard zero-pads, matching the unsharded
left-pad semantics.

`reverse=True` runs the anti-causal direction (BiMamba's second scan,
/root/reference/modules/mamba/bimamba.py:221-253): locally time-flipped
compute with the shard chain traversed last-to-first, so callers keep
their natural data layout and simply flag the direction.

All functions are written to run INSIDE `jax.shard_map` (or any context
where `axis_name` is bound) with the time axis sharded; see
tests/test_sequence_parallel.py for the canonical wiring.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from mamba_asr_tpu.ops.causal_conv1d import causal_conv1d
from mamba_asr_tpu.ops.selective_scan import selective_scan

Array = jax.Array


def _axis_size(axis_name: str) -> int:
    return jax.lax.psum(1, axis_name)


def sp_halo_exchange(
    x: Array, left: int, right: int, axis_name: str = "seq"
) -> Array:
    """Extend a time-sharded x (B, L_local, D) with `left` frames from
    the predecessor shard and `right` frames from the successor
    (boundary shards zero-pad, matching an unsharded SAME/causal pad).
    Returns (B, left + L_local + right, D)."""
    n = _axis_size(axis_name)
    assert max(left, right) <= x.shape[1], (
        f"halo ({left}/{right} frames) exceeds the local shard length "
        f"{x.shape[1]} — use fewer shards or longer sequences"
    )
    parts = [x]
    if n == 1:
        if left:
            parts.insert(0, jnp.zeros_like(x[:, :left]))
        if right:
            parts.append(jnp.zeros_like(x[:, :right]))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x
    idx = jax.lax.axis_index(axis_name)
    if left:
        tail = x[:, x.shape[1] - left:, :]
        prev = jax.lax.ppermute(
            tail, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        parts.insert(0, jnp.where(idx == 0, jnp.zeros_like(prev), prev))
    if right:
        head = x[:, :right, :]
        nxt = jax.lax.ppermute(
            head, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        parts.append(jnp.where(idx == n - 1, jnp.zeros_like(nxt), nxt))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def sp_causal_conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
    axis_name: str = "seq",
    reverse: bool = False,
) -> Array:
    """Depthwise causal conv over a time-sharded x (B, L_local, D).

    Exchanges the (K-1)-frame halo with the neighbouring shard over the
    mesh axis; the boundary shard zero-pads exactly like the unsharded
    op's left padding. With reverse=True the conv is anti-causal in
    global time (taps read forward), i.e. equivalent to
    flip(causal_conv1d(flip(x_global))).
    """
    k = weight.shape[0]
    n = _axis_size(axis_name)
    assert k - 1 <= x.shape[1], (
        f"conv halo (k-1={k-1}) exceeds the local shard length "
        f"{x.shape[1]} — use fewer shards or longer sequences"
    )
    if k <= 1 or n == 1:
        if reverse:
            return causal_conv1d(
                x[:, ::-1], weight, bias, activation
            )[:, ::-1]
        return causal_conv1d(x, weight, bias, activation)

    idx = jax.lax.axis_index(axis_name)
    if not reverse:
        halo = x[:, x.shape[1] - (k - 1):, :]
        # shard i sends its tail to shard i+1.
        perm = [(i, i + 1) for i in range(n - 1)]
        prev = jax.lax.ppermute(halo, axis_name, perm)
        prev = jnp.where(idx == 0, jnp.zeros_like(prev), prev)
        xx = jnp.concatenate([prev, x], axis=1)
        return causal_conv1d(xx, weight, bias, activation)[:, k - 1:, :]
    # Anti-causal: local flip + halo from the successor shard.
    xr = x[:, ::-1]
    halo = xr[:, xr.shape[1] - (k - 1):, :]  # earliest local frames
    perm = [(i + 1, i) for i in range(n - 1)]
    nxt = jax.lax.ppermute(halo, axis_name, perm)
    nxt = jnp.where(idx == n - 1, jnp.zeros_like(nxt), nxt)
    xx = jnp.concatenate([nxt, xr], axis=1)
    return causal_conv1d(xx, weight, bias, activation)[:, k - 1:, :][:, ::-1]


def _softplus_sum_dt(
    delta: Array, delta_bias: Optional[Array], delta_softplus: bool
) -> Array:
    """sum_t dt (B, D) with the same dt preprocessing as the scan."""
    dt = delta.astype(jnp.float32)
    if delta_bias is not None:
        dt = dt + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        dt = jax.nn.softplus(dt)
    return jnp.sum(dt, axis=1)


def sp_selective_scan(
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
    implementation: str = "auto",
    axis_name: str = "seq",
    reverse: bool = False,
) -> Union[Array, Tuple[Array, Array]]:
    """Selective scan over a time-sharded sequence (see module doc).

    Args mirror ops.selective_scan.selective_scan; u/delta/B/C/z hold
    the LOCAL time shard (B, L_local, ...); h0 is the global initial
    state. Returns the local output shard (and, with return_last_state,
    the GLOBAL final state, replicated across shards). reverse=True
    scans global time right-to-left (inputs/outputs stay in natural
    left-to-right layout).
    """
    n = _axis_size(axis_name)
    if reverse:
        u, delta, B, C = u[:, ::-1], delta[:, ::-1], B[:, ::-1], C[:, ::-1]
        z = z[:, ::-1] if z is not None else None
    if n == 1:
        out = selective_scan(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, h0,
            return_last_state, implementation,
        )
        if reverse:
            if return_last_state:
                return out[0][:, ::-1], out[1]
            return out[:, ::-1]
        return out

    # Pass 1: local last-state with zero initial state.
    _, h_loc = selective_scan(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus, None,
        True, implementation,
    )  # (B, D, N) float32

    # Shard transmission A_k = exp(A * sum_t dt_t): (B, D, N).
    sum_dt = _softplus_sum_dt(delta, delta_bias, delta_softplus)
    a_k = jnp.exp(sum_dt[:, :, None] * A.astype(jnp.float32)[None])

    # All-gather the tiny aggregates; combine on every shard (the loop
    # is over the static shard count, on replicated values). With
    # reverse=True the chain runs from the LAST shard backwards.
    gathered = jax.lax.all_gather(
        (a_k, h_loc), axis_name, axis=0, tiled=False
    )
    a_all, h_all = gathered  # (n, B, D, N) each
    order = range(n - 1, -1, -1) if reverse else range(n)
    state = (
        jnp.zeros_like(h_loc) if h0 is None else h0.astype(jnp.float32)
    )
    prefix = []  # state BEFORE each shard, in `order`
    for j in order:
        prefix.append(state)
        state = a_all[j] * state + h_all[j]
    idx = jax.lax.axis_index(axis_name)
    # `state` holds the global last state, numerically identical on
    # every shard — but shard_map's varying-axes analysis cannot prove
    # that (all_gather outputs count as device-varying). A masked psum
    # makes the replication provable without changing the value: only
    # shard 0 contributes its (identical) copy.
    h_final = jax.lax.psum(
        jnp.where(idx == 0, state, jnp.zeros_like(state)), axis_name
    )
    # prefix[i] is the incoming state of shard order[i]; map back to
    # shard-indexed order for the dynamic lookup below.
    prefix_by_shard = [None] * n
    for i, j in enumerate(order):
        prefix_by_shard[j] = prefix[i]
    h0_k = jnp.stack(prefix_by_shard)[idx]

    # Pass 2: the real local scan, seeded with the chained state.
    out = selective_scan(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus,
        h0_k.astype(h_loc.dtype), False, implementation,
    )
    if reverse:
        out = out[:, ::-1]
    if return_last_state:
        return out, h_final
    return out
