"""Pipeline parallelism (GPipe microbatch schedule) over a "pipe" mesh axis.

The reference's only parallelism is DDP (/root/reference/train_CTC.py:1062,
SURVEY.md §2.3); this module adds layer-pipeline parallelism the TPU way:
no per-stage processes, no send/recv threads — ONE jitted SPMD program in
which every device runs the same tick loop and activations hop stages over
ICI with `lax.ppermute`.

Why it composes for free with this repo's encoders: with
`model.scan_layers=true` the layer stack's parameters are already a single
pytree with a leading layer axis (`nn.scan`, models/conmamba.py:141-174).
Sharding that leading axis over the "pipe" mesh axis IS the stage
assignment — `jax.shard_map` hands each device its contiguous
layers-per-stage slice, and `stage_from_layer_fn` below runs the slice as
a local `lax.scan`.

Schedule (GPipe, batch B split into M microbatches, S stages):

    tick t = 0 .. M+S-2   (lax.scan; every device runs every tick)
      stage 0 injects microbatch min(t, M-1)
      every stage applies its layers to its current activation
      stage S-1 writes its output to slot t-(S-1)  (masked while t < S-1)
      activations ppermute one stage forward

Devices compute garbage in the fill/drain bubble (the standard GPipe
cost, (S-1)/(M+S-1) of the ticks); correctness is unaffected because the
output buffer only accepts writes from valid (stage, tick) pairs and the
result is replicated off the last stage with a masked psum. The whole
schedule is plain jax (scan/ppermute/dynamic slices), so `jax.grad`
differentiates it directly — ppermute transposes to the reverse ppermute,
giving the textbook reverse pipeline for the backward pass without any
hand-written adjoint.

Exactness, not approximation: microbatches are independent in every layer
this repo pipelines (LN/FFN/SSM/conv act per-example), so the pipelined
forward and its gradients match the unsharded stack bit-for-bit up to fp
associativity. Anything batch-coupled (BatchNorm in training mode) would
see microbatch statistics instead — same caveat as GPipe itself.

Composes with data parallelism: shard_map over a ("data", "pipe") mesh
with the batch sharded on "data" runs an independent pipeline per data
row; shard_map's transpose inserts the gradient psum over "data" because
the stage params enter replicated along it.

See tests/test_pipeline.py for canonical wiring, including the real
ConMamba scanned stack, and `__graft_entry__._dryrun_pp` for the
multi-chip dry run.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _axis_size(axis_name: str) -> int:
    # psum of a literal 1 constant-folds to the static mesh-axis size.
    return jax.lax.psum(1, axis_name)


def stage_from_layer_fn(layer_fn: Callable) -> Callable:
    """Lift a single-layer apply into a stage apply.

    layer_fn(layer_params, x) -> x applies ONE layer given one slice of
    the stacked params. The returned stage_fn(stacked_local, x) runs this
    device's layers-per-stage slice sequentially with a local lax.scan —
    the same traced-once-per-body compile behaviour as the model's own
    nn.scan stack.
    """

    def stage_fn(stacked_local, x):
        def body(h, p):
            return layer_fn(p, h), None

        y, _ = jax.lax.scan(body, x, stacked_local)
        return y

    return stage_fn


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: Array,
    n_microbatches: int,
    axis_name: str = "pipe",
) -> Array:
    """Apply S pipeline stages to x with the GPipe microbatch schedule.

    Must run inside `jax.shard_map` with `axis_name` bound. Each device
    holds its own `stage_params` (shard the stacked layer axis over
    `axis_name` via in_specs) and the SAME x (replicated over the pipe
    axis; shard it over "data" for dp x pp).

    stage_fn(stage_params, mb) -> mb must preserve the activation shape
    (stages circulate through one buffer).

    x: (B, ...) with B % n_microbatches == 0.
    Returns (B, ...) outputs, replicated over the pipe axis.
    """
    s = _axis_size(axis_name)
    m = int(n_microbatches)
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
    if s == 1:
        return stage_fn(stage_params, x)
    stage = jax.lax.axis_index(axis_name)
    x_mb = x.reshape(m, b // m, *x.shape[1:])
    fwd = [(i, i + 1) for i in range(s - 1)]

    def tick(carry, t):
        cur, out = carry
        # Stage 0 injects microbatch t (clamped during the drain ticks —
        # that work is garbage and never lands in `out`).
        inj = x_mb[jnp.minimum(t, m - 1)]
        inp = jnp.where(stage == 0, inj, cur)
        y = stage_fn(stage_params, inp)
        # Stage S-1 finished microbatch j = t-(S-1) this tick.
        j = t - (s - 1)
        slot = jnp.maximum(j, 0)
        valid = jnp.logical_and(stage == s - 1, j >= 0)
        old = jax.lax.dynamic_index_in_dim(out, slot, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(
            out, jnp.where(valid, y, old), slot, 0
        )
        # Hop one stage forward. Devices outside the permutation's image
        # (stage 0) receive zeros; stage 0 never reads `cur` anyway.
        nxt = jax.lax.ppermute(y, axis_name, fwd)
        return (nxt, out), None

    # The carries start as literal zeros (device-invariant) but the tick
    # body makes them device-varying; shard_map's varying-axes typing
    # requires the initial values to be cast explicitly.
    zero = jax.lax.pcast(jnp.zeros_like(x_mb[0]), (axis_name,), to="varying")
    out0 = jax.lax.pcast(jnp.zeros_like(x_mb), (axis_name,), to="varying")
    (_, out_buf), _ = jax.lax.scan(tick, (zero, out0), jnp.arange(m + s - 1))
    # Only the last stage holds real outputs; replicate them everywhere.
    out_buf = jax.lax.psum(
        jnp.where(stage == s - 1, out_buf, jnp.zeros_like(out_buf)),
        axis_name,
    )
    return out_buf.reshape(b, *x.shape[1:])
