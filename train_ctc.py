#!/usr/bin/env python
"""CTC training entry point (reference: /root/reference/train_CTC.py).

    python train_ctc.py hparams/CTC/conmamba_small.yaml \
        --data.data_folder /path/to/LibriSpeech
"""

from mamba_asr_tpu.cli import run_training

if __name__ == "__main__":
    run_training()
