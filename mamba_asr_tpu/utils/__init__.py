"""Utilities: profiling/tracing, RTF meters."""

from mamba_asr_tpu.utils.profiling import StepTimer, profile_trace, rtfx

__all__ = ["StepTimer", "profile_trace", "rtfx"]
