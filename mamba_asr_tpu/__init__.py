"""mamba_asr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) ASR framework.

A from-scratch rebuild of the capabilities of mattmireles/Mamba-ASR
(Conformer / ConMamba encoders, CTC and joint CTC-attention training,
Transformer / Mamba decoders, LibriSpeech recipes) designed TPU-first:

- selective-scan SSM recurrence as a parallel associative scan
  (XLA + Pallas kernels) instead of CUDA sequential kernels,
- fused log-mel frontend built on MXU matmuls,
- static bucketed padding instead of dynamic batch shapes,
- pjit/shard_map data parallelism over a jax.sharding.Mesh,
- on-device CTC/S2S decoding with stateful SSM caches.

Reference parity map lives in SURVEY.md; each module cites the reference
file:line whose behavior it reproduces.
"""

__version__ = "0.1.0"
