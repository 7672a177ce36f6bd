"""Model layer: SSM blocks, encoders, decoders, ASR assembly."""

from mamba_asr_tpu.models.mamba import MambaBlock, BiMambaBlock, MambaConfig

__all__ = ["MambaBlock", "BiMambaBlock", "MambaConfig"]
