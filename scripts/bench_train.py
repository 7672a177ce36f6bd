#!/usr/bin/env python
"""Training-step throughput benchmark on the current accelerator.

Measures the full jitted train step (fbank -> normalize -> SpecAugment ->
encoder -> CTC loss -> grads -> AdamW update) for ConMamba Small and
Conformer Large CTC — the reference claims ConMamba trains 25-40 % faster
than an equivalent Conformer (README.md:78); this quantifies it on TPU.

    python scripts/bench_train.py [--seconds 15 --batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(name, asr_cfg, frontend, batch, seconds, steps=20):
    import time as _t
    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.training.trainer import (
        SpecAugmentConfig,
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
        num_params,
    )

    model = ASRModel(asr_cfg)
    tcfg = TrainConfig(grad_accumulation_factor=1)
    tx = make_optimizer(tcfg)
    n = int(seconds * frontend.sample_rate)
    rng = np.random.default_rng(0)
    batch_data = {
        "wav": rng.normal(0, 0.1, size=(batch, n)).astype(np.float32),
        "wav_lens": np.full((batch,), n, np.int32),
        "tokens": rng.integers(4, asr_cfg.vocab_size, size=(batch, 64)).astype(np.int32),
        "token_lens": np.full((batch,), 64, np.int32),
        "tokens_bos": np.zeros((batch, 65), np.int32),
        "tokens_eos": np.zeros((batch, 65), np.int32),
        "eos_lens": np.full((batch,), 65, np.int32),
        "weight": np.ones((batch,), np.float32),
    }
    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0),
                             batch_data)
    step = make_train_step(model, tx, frontend, tcfg, SpecAugmentConfig())
    jb = {k: jnp.asarray(v) for k, v in batch_data.items()}

    c0 = _t.perf_counter()
    state, m = step(state, jb, jax.random.PRNGKey(1), jnp.asarray(True))
    jax.block_until_ready(m["loss"])
    print(f"{name}: compiled in {_t.perf_counter()-c0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, jb, jax.random.PRNGKey(i), jnp.asarray(True))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / steps
    audio_per_step = batch * seconds
    print(
        f"{name}: {num_params(state.params)/1e6:.1f}M params, "
        f"{dt*1000:.1f} ms/step, train-RTFx {audio_per_step/dt:.0f} "
        f"audio-sec/sec"
    )
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()

    from mamba_asr_tpu.models.asr import ASRConfig
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.training.trainer import FrontendConfig

    frontend = FrontendConfig(n_fft=400)
    small = ASRConfig(
        vocab_size=31, d_model=144, nhead=4, num_encoder_layers=12,
        num_decoder_layers=0, d_ffn=1024, encoder_module="conmamba",
        compute_dtype="bfloat16", mamba=MambaConfig(), scan_layers=True,
    )
    conf_large = ASRConfig(
        vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
        num_decoder_layers=0, d_ffn=1024, encoder_module="conformer",
        compute_dtype="bfloat16",
    )
    conm_large = ASRConfig(
        vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
        num_decoder_layers=0, d_ffn=1024, encoder_module="conmamba",
        compute_dtype="bfloat16", mamba=MambaConfig(), scan_layers=True,
    )
    dt_small = bench_config("conmamba_small_ctc", small, frontend,
                            args.batch, args.seconds)
    dt_cl = bench_config("conformer_large_ctc", conf_large, frontend,
                         args.batch, args.seconds)
    dt_ml = bench_config("conmamba_large_ctc", conm_large, frontend,
                         args.batch, args.seconds)
    print(f"conmamba_large vs conformer_large: "
          f"{(dt_cl - dt_ml) / dt_cl * 100:.0f}% faster "
          f"(reference claims 25-40%)")


if __name__ == "__main__":
    main()
