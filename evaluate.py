#!/usr/bin/env python
"""Evaluation-only entry point (the reference's `skip_train: True` mode,
/root/reference/hparams/CTC/conmamba_large.yaml:83 — the training driver
as an eval harness).

    python evaluate.py hparams/CTC/conmamba_small.yaml \
        --data.data_folder /path/to/LibriSpeech \
        [--torch_ckpt model.ckpt [--torch_normalizer normalizer.ckpt]]
Uses the experiment's saved checkpoints (top-k averaged) — or, with
--torch_ckpt, a reference PyTorch checkpoint imported via
models/torch_import.py — and writes wer_<split>.txt files.
"""

from __future__ import annotations

import os
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        raise SystemExit("usage: evaluate.py <hparams.yaml> [--key value ...]")
    torch_ckpt = torch_normalizer = ""
    rest = []
    it = iter(argv)
    for a in it:
        if a == "--torch_ckpt":
            torch_ckpt = next(it)
        elif a == "--torch_normalizer":
            torch_normalizer = next(it)
        else:
            rest.append(a)
    argv = rest

    from mamba_asr_tpu.cli import build_tokenizer
    from mamba_asr_tpu.configs.loader import load_config, parse_overrides
    from mamba_asr_tpu.data.dataset import ASRDataset, BucketedLoader
    from mamba_asr_tpu.data.librispeech import prepare_librispeech
    from mamba_asr_tpu.parallel.mesh import is_main_process
    from mamba_asr_tpu.training.loop import Trainer

    cfg = load_config(argv[0], parse_overrides(argv[1:]))
    manifest_dir = os.path.join(cfg.output_folder, "manifests")
    if is_main_process():
        prepare_librispeech(
            data_folder=cfg.data.data_folder,
            save_folder=manifest_dir,
            te_splits=cfg.data.test_splits,
            tr_splits=cfg.data.train_splits,
            merge_lst=cfg.data.train_splits,
            merge_name=cfg.data.train_csv,
            skip_prep=cfg.data.skip_prep,
        )
    tokenizer = build_tokenizer(
        cfg, os.path.join(manifest_dir, cfg.data.train_csv)
    )
    trainer = Trainer(cfg, tokenizer)

    for split in cfg.data.test_splits:
        ds = ASRDataset.from_csv(
            os.path.join(manifest_dir, split + ".csv"), tokenizer,
            cfg.data.sample_rate,
        )
        loader = BucketedLoader(
            ds, num_buckets=max(cfg.data.num_buckets // 2, 2),
            max_batch_seconds=cfg.data.valid_max_batch_seconds,
            shuffle=False, speed_perturb=False,
            num_workers=cfg.data.num_workers,
        )
        if trainer.state is None:
            trainer.init_state(next(iter(loader)))
            if torch_ckpt:
                import jax
                import jax.numpy as jnp
                import numpy as np

                from mamba_asr_tpu.models.torch_import import (
                    import_normalizer_stats,
                    load_torch_asr,
                )

                params = jax.tree_util.tree_map(
                    jnp.asarray, load_torch_asr(torch_ckpt, cfg.model)
                )
                trainer.state = trainer.state.replace(params=params)
                if torch_normalizer:
                    import torch

                    obj = torch.load(torch_normalizer, map_location="cpu",
                                     weights_only=True)
                    mean, std, count = import_normalizer_stats(obj)
                    trainer.state = trainer.state.replace(
                        normalizer=trainer.state.normalizer._replace(
                            count=jnp.asarray(count, jnp.float32),
                            mean=jnp.asarray(mean, jnp.float32),
                            m2=jnp.asarray(
                                std.astype(np.float64) ** 2 * count,
                                jnp.float32,
                            ),
                        )
                    )
        decoder = (
            trainer.s2s_decoder(test=True) if trainer.is_s2s
            else trainer.ctc_decoder()
        )
        summary = trainer.evaluate(
            loader, test_name=split, decoder=decoder,
            use_averaged=not torch_ckpt,
        )
        print(f"{split}: {summary}")


if __name__ == "__main__":
    main()
