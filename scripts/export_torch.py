#!/usr/bin/env python
"""Export a trained experiment as reference-format PyTorch checkpoints.

The inverse of `--torch_ckpt` consumption: where recognize.py /
evaluate.py IMPORT a reference checkpoint (the Pretrainer contract,
/root/reference/train_S2S.py:1235-1236), this writes one — the
state_dict of `nn.ModuleList([CNN, Transformer, (seq_lin,) ctc_lin])`
under the reference's module naming (models/torch_export.py), plus the
InputNormalization stats dict — so a SpeechBrain/reference user can load
TPU-trained weights directly.

    python scripts/export_torch.py hparams/CTC/conmamba_small.yaml \
        --ckpt_dir <exp>/save --out_dir /tmp/export [--key value ...]

Writes <out_dir>/model.ckpt and <out_dir>/normalizer.ckpt. Restores the
same top-k-averaged parameters evaluation uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv:
        raise SystemExit(
            "usage: export_torch.py <hparams.yaml> --ckpt_dir DIR "
            "--out_dir DIR [--key value ...]"
        )
    ckpt_dir = out_dir = ""
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--ckpt_dir":
            ckpt_dir = next(it)
        elif a == "--out_dir":
            out_dir = next(it)
        else:
            rest.append(a)
    if not ckpt_dir or not out_dir:
        raise SystemExit("need --ckpt_dir and --out_dir")

    import numpy as np
    import torch

    from mamba_asr_tpu.cli import restore_asr_state
    from mamba_asr_tpu.configs.loader import load_config, parse_overrides
    from mamba_asr_tpu.models.torch_export import (
        export_asr_params,
        export_normalizer_stats,
    )

    cfg = load_config(rest[0], parse_overrides(rest[1:]))
    _, state = restore_asr_state(cfg, ckpt_dir=ckpt_dir)

    os.makedirs(out_dir, exist_ok=True)
    sd = export_asr_params(state.params, cfg.model)
    model_path = os.path.join(out_dir, "model.ckpt")
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        model_path,
    )
    norm_path = os.path.join(out_dir, "normalizer.ckpt")
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(np.atleast_1d(v)))
         for k, v in export_normalizer_stats(state.normalizer).items()},
        norm_path,
    )
    print(f"wrote {model_path} ({len(sd)} tensors) and {norm_path}")


if __name__ == "__main__":
    main()
