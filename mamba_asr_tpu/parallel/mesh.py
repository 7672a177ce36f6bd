"""Device mesh and sharding helpers.

The reference's only parallelism is DDP over NCCL
(/root/reference/train_CTC.py:1062, SURVEY.md §2.3). The TPU-native
equivalent: a `jax.sharding.Mesh` with a "data" axis (batch sharding over
ICI/DCN) and a "model" axis kept in the mesh signature so tensor-parallel
shardings can be added without replumbing (SURVEY.md §2.3 mapping note).
Gradient all-reduce is inserted by XLA under jit when inputs are
batch-sharded and params replicated.

Rank guards (`run_on_main`, /root/reference/train_CTC.py:1080) map to
`is_main_process()` == (jax.process_index() == 0).
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model", "seq", "pipe") mesh over the available
    devices. Unused axes have size 1 and cost nothing; the axis ORDER
    puts "data" outermost so batch shards ride the slowest links and the
    tp/sp/pp collectives stay within the innermost (fastest) ICI
    neighbourhoods."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * seq * pipe)
    assert data * model * seq * pipe == n, (
        f"{data}x{model}x{seq}x{pipe} != {n} devices"
    )
    dev_array = np.array(devices).reshape(data, model, seq, pipe)
    return Mesh(dev_array, ("data", "model", "seq", "pipe"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, process_sharded: bool = True) -> dict:
    """Place numpy batch dict onto the mesh, batch axis sharded on "data".

    Non-array entries (ids, bucket tags) pass through untouched.

    Multi-process meshes (after `parallel.distributed.initialize`):
    the global batch is assembled from process-local data with
    `jax.make_array_from_process_local_data` — no host holds the full
    batch. `process_sharded=True` means each process loaded its OWN
    rows of the global batch (the training path,
    `BucketedLoader(process_count=N)`): global batch = local rows × N
    concatenated in process order, which is exactly the "data"-axis
    device order of `make_mesh` (jax.devices() is process-major).
    `process_sharded=False` means every process holds the IDENTICAL
    full batch (the valid/test path) and each keeps only its own
    slice; batch dims that don't divide the data axis replicate.
    """
    sharding = batch_sharding(mesh)
    nproc = jax.process_count()
    data_size = mesh.shape.get("data", 1)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
            if nproc > 1:
                v = np.asarray(v)
                gb = v.shape[0] * (nproc if process_sharded else 1)
                if gb % data_size != 0:
                    if process_sharded:
                        raise ValueError(
                            f"batch entry {k}: global batch {gb} does not "
                            f"divide the data axis ({data_size}); give the "
                            "training loader batch_divisor=data axis size"
                        )
                    out[k] = jax.device_put(v, replicate(mesh))
                    continue
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, (gb,) + v.shape[1:]
                )
            else:
                out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def is_main_process() -> bool:
    return jax.process_index() == 0


def infer_param_shardings(
    params,
    mesh: Mesh,
    min_elements: int = 1 << 14,
):
    """Tensor-parallel placement over the reserved "model" axis.

    Shards the output-feature (last) axis of every large >=2-D kernel
    whose last dim divides the model-axis size; everything else is
    replicated. Under jit, GSPMD propagates these placements through the
    computation and inserts the collectives — megatron-style TP without
    touching the model code (SURVEY.md §2.3: "leave mesh axes in place so
    vocab and d_ffn matmuls *can* be sharded later").

    Returns a pytree of NamedShardings congruent with `params`.
    """
    model_size = mesh.shape["model"]

    def rule(leaf):
        if (
            model_size > 1
            and getattr(leaf, "ndim", 0) >= 2
            and leaf.size >= min_elements
            and leaf.shape[-1] % model_size == 0
        ):
            spec = P(*([None] * (leaf.ndim - 1) + ["model"]))
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_params(params, mesh: Mesh, min_elements: int = 1 << 14):
    """Place params per infer_param_shardings."""
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, s),
        params,
        infer_param_shardings(params, mesh, min_elements),
    )


def place_state(state, mesh: Mesh, min_elements: int = 1 << 14,
                pipeline_layers: int = 0):
    """Place a full TrainState onto the mesh.

    The tensor-parallel placement rule depends only on leaf shape, so it
    applies uniformly to params AND optimizer state (Adam's mu/nu and
    MultiSteps' grad accumulators mirror the param shapes — they must
    shard identically or every update step would reshuffle them).
    Scalars / 1-D leaves (counters, normalizer stats, LN params)
    replicate. With model axis size 1 this is plain replication.

    pipeline_layers > 0 (with a >1 "pipe" mesh axis) additionally shards
    the LEADING axis of every stacked per-layer leaf (the nn.scan
    encoder layout: leading dim == num_encoder_layers) over "pipe" —
    each stage then holds only its own layers' params and optimizer
    mirrors, which is the point of pipeline parallelism.
    """
    model_size = mesh.shape.get("model", 1)
    pipe_size = mesh.shape.get("pipe", 1)

    def rule(path, leaf):
        nd = getattr(leaf, "ndim", 0)
        in_stack = any(
            getattr(p, "key", None) == "stack" for p in path
        )
        if (
            pipe_size > 1
            and pipeline_layers > 0
            and in_stack
            and nd >= 1
            and leaf.shape[0] == pipeline_layers
            and pipeline_layers % pipe_size == 0
        ):
            spec = P(*(["pipe"] + [None] * (nd - 1)))
        elif (
            model_size > 1
            and nd >= 2
            and leaf.size >= min_elements
            and leaf.shape[-1] % model_size == 0
        ):
            spec = P(*([None] * (nd - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(rule, state)


# --- activation sharding constraints ---------------------------------------
# Layer-boundary activations are constrained to batch-sharding over the
# "data" axis (features replicated over "model" between layers —
# megatron-style: the model axis is contracted away inside each sharded
# matmul pair). Model code calls `constrain_batch` unconditionally; it is
# a no-op unless a mesh has been activated for the current trace.
#
# The active mesh is SCOPED, never ambiently set: it only applies inside an
# `activation_mesh(mesh)` block (or a callable wrapped by `scoped_to_mesh`).
# The constraint bakes into whatever executable is traced inside the scope,
# so each trainer wraps its own jitted steps — two trainers with different
# meshes in one process can no longer contaminate each other's traces
# (the round-3 full-suite failure: an 8-device mesh leaked from an earlier
# TrainLoop into a 4-device shard_map trace).

_ACTIVE_MESH: Optional[Mesh] = None


def set_activation_mesh(mesh: Optional[Mesh]) -> None:
    """Activate (or clear, with None) the mesh used by constrain_batch.

    Prefer the scoped forms (`activation_mesh` / `scoped_to_mesh`); this
    bare setter remains for call sites that manage their own reset (the
    dryrun harness). Meshes without a >1 "data" axis clear the state —
    constraints are meaningless there."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = (
        mesh if mesh is not None and mesh.shape.get("data", 1) > 1 else None
    )


@contextmanager
def activation_mesh(mesh: Optional[Mesh]):
    """Scope constrain_batch's mesh to this block, restoring the previous
    value on exit (exception-safe). Trace-time: wrap the *call* of a jitted
    function so any (re)trace inside sees the right mesh."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    set_activation_mesh(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def scoped_to_mesh(fn, mesh: Optional[Mesh]):
    """Wrap `fn` so every call (and therefore every trace it triggers)
    runs under `activation_mesh(mesh)`. Per-call overhead is one global
    save/restore — nothing next to a step dispatch."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with activation_mesh(mesh):
            return fn(*args, **kwargs)

    return wrapped


def constrain_batch(x):
    """with_sharding_constraint(x, P("data", None, ...)) under the active
    mesh; identity when no multi-device mesh is active or the (static)
    batch dim does not divide the data axis (e.g. model.init's 1-example
    trace)."""
    mesh = _ACTIVE_MESH
    if mesh is None or getattr(x, "ndim", 0) < 1:
        return x
    if x.shape[0] % mesh.shape["data"] != 0:
        return x
    spec = P(*(["data"] + [None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
