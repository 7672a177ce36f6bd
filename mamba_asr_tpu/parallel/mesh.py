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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place numpy batch dict onto the mesh, batch axis sharded on "data".

    Non-array entries (ids, bucket tags) pass through untouched.
    """
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and getattr(v, "ndim", 0) >= 1:
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
