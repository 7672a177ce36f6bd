"""Model layer: SSM blocks, encoders, decoders, ASR assembly."""

from mamba_asr_tpu.models.mamba import MambaBlock, BiMambaBlock, MambaConfig
from mamba_asr_tpu.models.asr import ASRConfig, ASRModel, EncoderWrapper
from mamba_asr_tpu.models.branchformer import (
    BranchformerEncoder,
    BranchformerEncoderLayer,
)
from mamba_asr_tpu.models.conformer import ConformerEncoder, ConformerEncoderLayer
from mamba_asr_tpu.models.conmamba import (
    ConmambaEncoder,
    ConmambaEncoderLayer,
    MambaDecoder,
    MambaDecoderLayer,
)
from mamba_asr_tpu.models.transformer import (
    NormalizedEmbedding,
    TransformerDecoder,
    TransformerEncoder,
)

__all__ = [
    "MambaBlock",
    "BiMambaBlock",
    "MambaConfig",
    "ASRConfig",
    "ASRModel",
    "BranchformerEncoder",
    "BranchformerEncoderLayer",
    "ConformerEncoder",
    "ConformerEncoderLayer",
    "ConmambaEncoder",
    "ConmambaEncoderLayer",
    "MambaDecoder",
    "MambaDecoderLayer",
    "NormalizedEmbedding",
    "TransformerDecoder",
    "TransformerEncoder",
]
