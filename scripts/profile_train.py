#!/usr/bin/env python
"""Component ablation profile of the heaviest train step (TPU).

Times the ConMambaMamba Large S2S step (hparams/S2S/
conmambamamba_large.yaml dims) and its components so the MFU story is
attributable: full step (fwd+bwd+AdamW), loss forward only, encoder-only
forward, frontend (fbank+normalize+specaug) only, and the full step with
the XLA chunked scan instead of the Pallas kernel. Uses the same
K-step-scan differencing as bench_train.py to cancel tunnel dispatch.

    python scripts/profile_train.py [--seconds 15 --batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_time(fn, arg, k1=4, k2=12, reps=3):
    """Per-iteration device time of arg->arg function `fn` via K-step
    lax.scan differencing (cancels fixed dispatch cost)."""
    import jax
    import jax.numpy as jnp

    def k_steps(k):
        def body(c, i):
            return fn(c, i), ()

        return jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(k))[0])

    run1, run2 = k_steps(k1), k_steps(k2)
    s1 = run1(arg)
    _ = float(np.asarray(jax.tree_util.tree_leaves(s1)[0]).ravel()[0])
    s2 = run2(arg)
    _ = float(np.asarray(jax.tree_util.tree_leaves(s2)[0]).ravel()[0])

    def timed(run):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(reps))
    t2 = min(timed(run2) for _ in range(reps))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--tgt", type=int, default=48)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram
    from mamba_asr_tpu.training.trainer import (
        FrontendConfig,
        SpecAugmentConfig,
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    frontend = FrontendConfig(n_fft=400)
    tcfg = TrainConfig(grad_accumulation_factor=1, ctc_weight=0.3,
                       label_smoothing=0.1)

    def build(scan_impl):
        cfg = ASRConfig(
            vocab_size=5000, d_model=512, nhead=8, num_encoder_layers=12,
            num_decoder_layers=6, d_ffn=2048, encoder_module="conmamba",
            decoder_module="mamba", compute_dtype="bfloat16",
            mamba=MambaConfig(scan_impl=scan_impl), scan_layers=True,
        )
        return ASRModel(cfg)

    b = args.batch
    n = int(args.seconds * frontend.sample_rate)
    rng = np.random.default_rng(0)
    tokens = rng.integers(4, 5000, size=(b, args.tgt))
    batch = {
        "wav": rng.normal(0, 0.1, size=(b, n)).astype(np.float32),
        "wav_lens": np.full((b,), n, np.int32),
        "tokens": tokens.astype(np.int32),
        "token_lens": np.full((b,), args.tgt, np.int32),
        "tokens_bos": np.concatenate(
            [np.full((b, 1), 1), tokens], axis=1).astype(np.int32),
        "tokens_eos": np.concatenate(
            [tokens, np.full((b, 1), 2)], axis=1).astype(np.int32),
        "eos_lens": np.full((b,), args.tgt + 1, np.int32),
        "weight": np.ones((b,), np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    model = build("auto")
    tx = make_optimizer(tcfg)
    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0),
                             batch)
    step = make_train_step(model, tx, frontend, tcfg, SpecAugmentConfig())

    feats = log_mel_spectrogram(
        jb["wav"], sample_rate=frontend.sample_rate, n_fft=frontend.n_fft,
        n_mels=frontend.n_mels, win_length_ms=frontend.win_length_ms,
        hop_length_ms=frontend.hop_length_ms,
    )
    flens = jnp.full((b,), feats.shape[1], jnp.int32)
    print(f"batch {b} x {args.seconds:.0f}s, feats {feats.shape}",
          flush=True)

    results = {}

    # 1. Full train step.
    def full_step(s, i):
        s2, _ = step(s, jb, jax.random.fold_in(jax.random.PRNGKey(1), i),
                     jnp.asarray(True))
        return s2

    results["full_step"] = device_time(full_step, state)
    print(f"full step: {results['full_step']*1000:.1f} ms", flush=True)

    # 2. Loss forward only (same loss math, no grad/update). Carry a
    # scalar accumulator so the scan has a data dependence.
    from mamba_asr_tpu.training.trainer import make_eval_step  # noqa: F401

    def loss_only(acc, i):
        feats_i = feats
        out = model.apply(
            state.params, feats_i, flens, jb["tokens_bos"],
        )
        lp = out["ctc_log_probs"]
        return acc + lp.mean() + out["seq_log_probs"].mean()

    results["fwd_loss"] = device_time(loss_only, jnp.zeros(()))
    print(f"forward (enc+dec heads): {results['fwd_loss']*1000:.1f} ms",
          flush=True)

    # 3. Encoder-only forward.
    def enc_only(acc, i):
        enc, _ = model.apply(state.params, feats, flens,
                             method=ASRModel.encode)
        return acc + enc.mean().astype(jnp.float32)

    results["fwd_encoder"] = device_time(enc_only, jnp.zeros(()))
    print(f"forward (encoder only): {results['fwd_encoder']*1000:.1f} ms",
          flush=True)

    # 4. Frontend only (fbank recompute per iteration).
    def fb_only(acc, i):
        f = log_mel_spectrogram(
            jb["wav"], sample_rate=frontend.sample_rate,
            n_fft=frontend.n_fft, n_mels=frontend.n_mels,
            win_length_ms=frontend.win_length_ms,
            hop_length_ms=frontend.hop_length_ms,
        )
        return acc + f.mean()

    results["fbank"] = device_time(fb_only, jnp.zeros(()))
    print(f"fbank: {results['fbank']*1000:.1f} ms", flush=True)

    # 5. Full step with the chunked XLA scan (no Pallas).
    model_x = build("xla")
    step_x = make_train_step(model_x, tx, frontend, tcfg,
                             SpecAugmentConfig())

    def full_step_x(s, i):
        s2, _ = step_x(s, jb, jax.random.fold_in(jax.random.PRNGKey(1), i),
                       jnp.asarray(True))
        return s2

    results["full_step_xla_scan"] = device_time(full_step_x, state)
    print(f"full step (XLA scan): "
          f"{results['full_step_xla_scan']*1000:.1f} ms", flush=True)

    bwd_opt = results["full_step"] - results["fwd_loss"]
    dec = results["fwd_loss"] - results["fwd_encoder"]
    print(
        f"\nbreakdown: encoder fwd {results['fwd_encoder']*1000:.1f} ms, "
        f"decoder+heads fwd {dec*1000:.1f} ms, "
        f"bwd+opt {bwd_opt*1000:.1f} ms, "
        f"fbank {results['fbank']*1000:.1f} ms; "
        f"pallas speedup vs xla scan "
        f"{results['full_step_xla_scan']/results['full_step']:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
