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

    # Sync on the LAST leaf: measurement carries put the step-dependent
    # scalar accumulator there. Fetching a pass-through leaf (e.g. the
    # unchanged params) can return before execution completes over the
    # axon tunnel and fakes near-zero timings.
    run1, run2 = k_steps(k1), k_steps(k2)
    s1 = run1(arg)
    _ = float(np.asarray(jax.tree_util.tree_leaves(s1)[-1]).ravel()[0])
    s2 = run2(arg)
    _ = float(np.asarray(jax.tree_util.tree_leaves(s2)[-1]).ravel()[0])

    def timed(run):
        t0 = time.perf_counter()
        out = run(arg)
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[0])
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

    # 2. Loss forward only (same loss math, no grad/update). Carry a
    # scalar accumulator so the scan has a data dependence.
    from mamba_asr_tpu.training.trainer import make_eval_step  # noqa: F401

    # Params ride the scan carry — closing over them would embed 0.5 GB
    # of constants in the HLO and choke the remote compiler.
    def loss_only(c, i):
        params, acc = c
        # i-dependent input defeats loop-invariant code motion (an
        # i-independent body gets hoisted and measures ~0 ms).
        out = model.apply(
            {"params": params}, feats * (1.0 + 1e-6 * i), flens,
            jb["tokens_bos"],
        )
        lp = out["ctc_log_probs"]
        return (params, acc + lp.mean() + out["seq_log_probs"].mean())

    results["fwd_loss"] = device_time(
        loss_only, (state.params, jnp.zeros(())))
    print(f"forward (enc+dec heads): {results['fwd_loss']*1000:.1f} ms",
          flush=True)

    # 3. Encoder-only forward.
    def enc_only(c, i):
        params, acc = c
        enc, _ = model.apply({"params": params},
                             feats * (1.0 + 1e-6 * i), flens,
                             method=ASRModel.encode)
        return (params, acc + enc.mean().astype(jnp.float32))

    results["fwd_encoder"] = device_time(
        enc_only, (state.params, jnp.zeros(())))
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

    # 1. Full train step.
    def full_step(s, i):
        s2, _ = step(s, jb, jax.random.fold_in(jax.random.PRNGKey(1), i),
                     jnp.asarray(True))
        return s2

    results["full_step"] = device_time(full_step, state)
    print(f"full step: {results['full_step']*1000:.1f} ms", flush=True)


    # 5. The chunked-XLA-scan variant of this step does not compile at
    # these dims: XLA asks for 48.3 GB of HBM (measured 2026-08) — its
    # (B, chunks, D, N) scan intermediates spill where the Pallas kernel
    # stays VMEM-resident. Recorded here instead of timed.
    print("full step (XLA scan): OOM at compile (48.3 GB HBM needed)",
          flush=True)

    bwd_opt = results["full_step"] - results["fwd_loss"]
    dec = results["fwd_loss"] - results["fwd_encoder"]
    print(
        f"\nbreakdown: encoder fwd {results['fwd_encoder']*1000:.1f} ms, "
        f"decoder+heads fwd {dec*1000:.1f} ms, "
        f"bwd+opt {bwd_opt*1000:.1f} ms, "
        f"fbank {results['fbank']*1000:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
