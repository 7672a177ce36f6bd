"""Production streaming-ASR serving: slot-batched engine + socket server.

The reference repo stops at offline batch decoding scripts
(/root/reference/train_CTC.py:233-270 runs test-set evaluation only);
serving many concurrent real-time audio streams is left to the user.
This package is the TPU-native serving story: a fixed-shape slot-batched
engine that multiplexes independent streaming sessions onto one chip
with a single jitted dispatch per tick (`engine.StreamingServer`), and a
small length-prefixed TCP protocol on top (`server.serve` /
`server.StreamingClient`).
"""

from mamba_asr_tpu.serving.engine import StreamingServer
from mamba_asr_tpu.serving.export import ExportedASR, export_ctc_bundle

__all__ = ["StreamingServer", "ExportedASR", "export_ctc_bundle"]
