"""TPU-native compute kernels (XLA + Pallas) for the ASR stack.

Each op ships with a pure-jnp sequential reference implementation that
serves as the numeric spec and golden test oracle — the same pattern the
reference repo uses (`selective_scan_ref` at
/root/reference/modules/mamba/selective_scan_interface.py:91-157).
"""

from mamba_asr_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
    ssm_step,
)
from mamba_asr_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_ref,
    causal_conv1d_step,
)
from mamba_asr_tpu.ops.ctc import ctc_loss, ctc_forward_score
from mamba_asr_tpu.ops.fbank import log_mel_spectrogram, mel_filterbank

__all__ = [
    "selective_scan",
    "selective_scan_ref",
    "ssm_step",
    "causal_conv1d",
    "causal_conv1d_ref",
    "causal_conv1d_step",
    "ctc_loss",
    "ctc_forward_score",
    "log_mel_spectrogram",
    "mel_filterbank",
]
