"""Device mesh + sharding utilities (pjit data parallelism)."""

from mamba_asr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    is_main_process,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "is_main_process"]
