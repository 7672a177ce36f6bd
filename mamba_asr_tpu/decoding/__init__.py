"""Decoders: CTC greedy/beam, S2S joint beam search with scorers."""

from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode

__all__ = ["ctc_greedy_decode"]
