"""Multi-process (multi-host) runtime: jax.distributed wiring, global
batch assembly, and host-gather helpers.

Reference capability matched: multi-GPU data-parallel training launched
with torchrun (`ddp_init_group` at /root/reference/train_CTC.py:1062,
launcher docs /root/reference/README.md:246-257). The TPU-native mapping
(SURVEY.md §5.8) is one Python process per host:

- `initialize()` connects the processes (`jax.distributed.initialize`);
  after it, `jax.devices()` is the GLOBAL device list, so the existing
  `parallel.mesh.make_mesh()` mesh spans the whole pod slice unchanged.
- Each process loads only its slice of every global batch
  (`BucketedLoader(process_index=, process_count=)`) and
  `mesh.shard_batch` assembles the global on-device batch with
  `jax.make_array_from_process_local_data` — no host ever materializes
  the full batch, which is what makes the input pipeline scale with
  hosts (the reference gets this from DistributedSampler).
- Collectives (grad all-reduce etc.) are inserted by GSPMD exactly as in
  single-process mode; nothing in the model or train step changes.
- Checkpoint/log writes stay on process 0 (`mesh.is_main_process`),
  mirroring the reference's `run_on_main` (train_CTC.py:1080).

On a TPU pod slice, `initialize()` with no arguments auto-detects the
coordinator from the TPU metadata; on CPU/GPU clusters pass coordinator
address / process count / process id explicitly (or via the MASR_*
environment variables), which is also how the 2-process CPU test drives
this path (tests/test_multiprocess.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_ENV_COORD = "MASR_COORDINATOR"
_ENV_NPROC = "MASR_NUM_PROCESSES"
_ENV_PID = "MASR_PROCESS_ID"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` with environment-variable fallback.

    Explicit arguments win; otherwise MASR_COORDINATOR /
    MASR_NUM_PROCESSES / MASR_PROCESS_ID are used when set; otherwise
    the no-argument auto-detection path (TPU pods, SLURM) runs. Call
    BEFORE any other jax API touches a device.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get(_ENV_COORD) or None
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process). Used to order
    process-0 filesystem side effects (manifest prep, tokenizer fit)
    before the other processes read the results."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def fetch_global(x) -> np.ndarray:
    """A host numpy copy of `x`'s GLOBAL value, valid on every process.

    Single-process (and fully-replicated / fully-addressable arrays):
    plain device_get. Cross-process sharded arrays are resharded to
    fully-replicated first (jit with replicated out_shardings — XLA
    emits the all-gather), which is correct for ANY input sharding,
    including last-axis tensor-parallel layouts where a naive axis-0
    concatenation of per-process shards would interleave wrongly.

    NOTE: collective — when any input is cross-process sharded, every
    process must call this at the same point.
    """
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_replicated or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = x.sharding
    if not isinstance(sharding, NamedSharding):
        raise TypeError(
            f"cannot gather array with non-named sharding {sharding}"
        )
    rep = jax.jit(
        lambda a: a, out_shardings=NamedSharding(sharding.mesh, P())
    )(x)
    return np.asarray(jax.device_get(rep))


def tree_fetch_global(tree):
    """`fetch_global` over every leaf of a pytree (e.g. a TrainState
    before checkpointing under a multi-host tensor-parallel layout)."""
    return jax.tree_util.tree_map(fetch_global, tree)
