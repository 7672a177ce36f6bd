#!/usr/bin/env python
"""Peak-memory comparison of ConMamba vs Conformer train steps (TPU).

The reference claims 40-50 % lower training memory than Transformer ASR
(/root/reference/README.md:14,79 — directional per SURVEY.md §6). This
quantifies it honestly from the compiler: each config's full jitted train
step is lowered + compiled (never executed — compile-only, so it is safe
during restricted windows) and XLA's memory_analysis() reports the peak
HBM the executable reserves.

    python scripts/bench_memory.py [--seconds 15 60 --batch 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_bytes(asr_cfg, frontend, batch, seconds, tgt_len=64):
    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.training.trainer import (
        SpecAugmentConfig,
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    model = ASRModel(asr_cfg)
    is_s2s = asr_cfg.num_decoder_layers > 0
    tcfg = TrainConfig(
        grad_accumulation_factor=1,
        ctc_weight=0.3 if is_s2s else 1.0,
        label_smoothing=0.1 if is_s2s else 0.0,
    )
    tx = make_optimizer(tcfg)
    n = int(seconds * frontend.sample_rate)
    rng = np.random.default_rng(0)
    tokens = rng.integers(4, asr_cfg.vocab_size, size=(batch, tgt_len))
    batch_data = {
        "wav": rng.normal(0, 0.1, size=(batch, n)).astype(np.float32),
        "wav_lens": np.full((batch,), n, np.int32),
        "tokens": tokens.astype(np.int32),
        "token_lens": np.full((batch,), tgt_len, np.int32),
        "tokens_bos": np.concatenate(
            [np.full((batch, 1), 1), tokens], axis=1).astype(np.int32),
        "tokens_eos": np.concatenate(
            [tokens, np.full((batch, 1), 2)], axis=1).astype(np.int32),
        "eos_lens": np.full((batch,), tgt_len + 1, np.int32),
        "weight": np.ones((batch,), np.float32),
    }
    # init on CPU-side abstract eval only: use eval_shape-compatible path —
    # init_train_state materializes params; acceptable (params are small
    # next to activations and the step executable is never run).
    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0),
                             batch_data)
    step = make_train_step(model, tx, frontend, tcfg, SpecAugmentConfig())
    jb = {k: jnp.asarray(v) for k, v in batch_data.items()}
    t0 = time.perf_counter()
    compiled = jax.jit(step).lower(
        state, jb, jax.random.PRNGKey(1), jnp.asarray(True)
    ).compile()
    dt = time.perf_counter() - t0
    ma = compiled.memory_analysis()
    # Fields per jax docs: *_size_in_bytes. Peak = temp + args + outputs
    # is an over-count (aliasing); report XLA's own numbers verbatim.
    return ma, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, nargs="+", default=[15.0, 60.0])
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    from mamba_asr_tpu.models.asr import ASRConfig
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.training.trainer import FrontendConfig

    frontend = FrontendConfig(n_fft=400)
    conmamba = ASRConfig(
        vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
        num_decoder_layers=0, d_ffn=1024, encoder_module="conmamba",
        compute_dtype="bfloat16", mamba=MambaConfig(), scan_layers=True,
    )
    # scan_layers=True for BOTH: remat_layers only takes effect through
    # the scanned stack (the unrolled path silently ignores it), and the
    # trainer's default config is scan_layers=true anyway.
    conformer = ASRConfig(
        vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
        num_decoder_layers=0, d_ffn=1024, encoder_module="conformer",
        compute_dtype="bfloat16", scan_layers=True,
    )

    for seconds in args.seconds:
        # Long clips halve the batch, mirroring bench_train's 60 s row.
        batch = args.batch if seconds <= 30 else max(args.batch // 2, 1)
        for name, cfg in (("conmamba_large_ctc", conmamba),
                          ("conformer_large_ctc", conformer)):
            variants = [
                ("", cfg),
                ("+remat", dataclasses.replace(cfg, remat_layers=True)),
            ]
            for tag, vcfg in variants:
                try:
                    ma, dt = peak_bytes(vcfg, frontend, batch, seconds)
                    print(
                        f"{name}{tag} @ {seconds:.0f}s x B{batch}: "
                        f"temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
                        f"args {ma.argument_size_in_bytes/2**30:.2f} GiB, "
                        f"output {ma.output_size_in_bytes/2**30:.2f} GiB, "
                        f"alias {ma.alias_size_in_bytes/2**30:.2f} GiB "
                        f"(compile {dt:.0f}s)",
                        flush=True,
                    )
                except Exception as e:  # OOM-at-compile is a result too
                    msg = str(e).split("\n")[0][:200]
                    print(f"{name}{tag} @ {seconds:.0f}s x B{batch}: "
                          f"FAILED — {msg}", flush=True)


if __name__ == "__main__":
    main()
