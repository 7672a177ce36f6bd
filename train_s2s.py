#!/usr/bin/env python
"""S2S (joint CTC/attention) training entry point
(reference: /root/reference/train_S2S.py).

    python train_s2s.py hparams/S2S/conmamba_large.yaml \
        --data.data_folder /path/to/LibriSpeech
"""

from mamba_asr_tpu.cli import run_training

if __name__ == "__main__":
    run_training()
