"""Device mesh + sharding utilities (dp/tp via pjit, sp/pp via shard_map)."""

from mamba_asr_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    is_main_process,
)
from mamba_asr_tpu.parallel.pipeline import (
    pipeline_apply,
    stage_from_layer_fn,
)
from mamba_asr_tpu.parallel.sequence import (
    sp_causal_conv1d,
    sp_halo_exchange,
    sp_selective_scan,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "is_main_process",
    "pipeline_apply",
    "stage_from_layer_fn",
    "sp_causal_conv1d",
    "sp_halo_exchange",
    "sp_selective_scan",
]
