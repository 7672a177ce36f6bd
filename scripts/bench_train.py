#!/usr/bin/env python
"""Training-step throughput benchmark on the current accelerator.

Measures the full jitted train step (fbank -> normalize -> SpecAugment ->
encoder -> loss -> grads -> AdamW update) for the CTC configs and the
heaviest S2S config. The reference claims ConMamba trains 25-40 % faster
than an equivalent Conformer (/root/reference/README.md:78); this
quantifies it on TPU, and reports a FLOP-based MFU (XLA's own cost
analysis of the compiled executable / elapsed / peak) plus the device
kind so the numbers are physically checkable.

    python scripts/bench_train.py [--seconds 15 --batch 16 --steps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bf16 peak TFLOP/s per chip by device kind (dense). Sources: public TPU
# spec sheets. Unknown kinds report MFU vs v5e peak with a marker.
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,  # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
    "TPU v6e": 918.0,
}


def _device_peak():
    import jax

    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(kind)
    note = ""
    if peak is None:
        peak = 197.0
        note = " (unknown kind; MFU vs v5e peak)"
    return kind, peak, note


def bench_config(name, asr_cfg, frontend, batch, seconds, steps=30,
                 tgt_len=64, accum=1):
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
    is_s2s = asr_cfg.num_decoder_layers > 0
    tcfg = TrainConfig(
        grad_accumulation_factor=accum,
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
    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0),
                             batch_data)
    step = make_train_step(model, tx, frontend, tcfg, SpecAugmentConfig())
    jb = {k: jnp.asarray(v) for k, v in batch_data.items()}

    c0 = time.perf_counter()
    lowered = jax.jit(step).lower(state, jb, jax.random.PRNGKey(1),
                                  jnp.asarray(True))
    compiled = lowered.compile()
    print(f"{name}: compiled in {time.perf_counter()-c0:.1f}s", flush=True)
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    # Warm-up (allocations, first dispatch). A device->host value fetch is
    # the only true sync over the axon tunnel: block_until_ready returns
    # before execution completes (measured a fake 52 PFLOP/s with it).
    state2, m = compiled(state, jb, jax.random.PRNGKey(1), jnp.asarray(True))
    loss_val = float(np.asarray(m["loss"]))
    assert np.isfinite(loss_val), f"{name}: non-finite loss {loss_val}"

    # Pure device time per step: run K steps inside ONE executable
    # (lax.scan over the step body, state carried on device) and
    # difference two K values to cancel the fixed per-call dispatch cost
    # (~hundreds of ms over the tunnel; ~50 us on a local chip).
    # Timed loop uses the shipped recipes' PRNG (train.rng_impl:
    # unsafe_rbg — TPU hardware RngBitGenerator; threefry mask bit-gen
    # costs +15.9 ms/step on ConMamba Large, docs/DESIGN.md §8c).
    bench_key = jax.random.key(2, impl="unsafe_rbg")

    def k_steps(k):
        def body(s, i):
            s, mm = step(s, jb, jax.random.fold_in(bench_key, i),
                         jnp.asarray(True))
            return s, mm["loss"]

        return jax.jit(
            lambda s: jax.lax.scan(body, s, jnp.arange(k))
        )

    import jax.numpy as _jnp  # noqa: F401
    k1, k2 = max(steps // 2, 4), max(steps, 8)
    run1, run2 = k_steps(k1), k_steps(k2)
    # Compile + warm both.
    _ = float(np.asarray(run1(state)[1][-1]))
    _ = float(np.asarray(run2(state)[1][-1]))

    def timed(run):
        t0 = time.perf_counter()
        _, losses = run(state)
        _ = float(np.asarray(losses[-1]))
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(3))
    t2 = min(timed(run2) for _ in range(3))
    dt = max((t2 - t1) / (k2 - k1), 1e-9)  # device time per step
    dispatch = max(t1 - dt * k1, 0.0)

    kind, peak, note = _device_peak()
    mfu = flops / dt / (peak * 1e12) * 100.0
    audio_per_step = batch * seconds
    print(
        f"{name}: {num_params(state.params)/1e6:.1f}M params, "
        f"{dt*1000:.1f} ms/step device time "
        f"(+{dispatch*1000:.0f} ms per-call dispatch over this tunnel), "
        f"train-RTFx {audio_per_step/dt:.0f}, "
        f"{flops/1e12:.2f} TFLOP/step, MFU {mfu:.1f}% "
        f"[{kind}, peak {peak:.0f} bf16 TFLOP/s{note}]"
    )
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--only", type=str, default=None,
                   help="substring filter on config name")
    p.add_argument("--remat", action="store_true",
                   help="recompute layer activations in bwd (long seqs)")
    p.add_argument("--accum", type=int, default=1,
                   help="grad_accumulation_factor (recipe-true micro-step "
                        "cost; skip micro-steps run under the emit cond)")
    args = p.parse_args()

    from mamba_asr_tpu.models.asr import ASRConfig
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.training.trainer import FrontendConfig

    frontend = FrontendConfig(n_fft=400)
    configs = [
        # (name, cfg, batch, tgt_len)
        ("conmamba_small_ctc", ASRConfig(
            vocab_size=31, d_model=144, nhead=4, num_encoder_layers=12,
            num_decoder_layers=0, d_ffn=1024, encoder_module="conmamba",
            compute_dtype="bfloat16", mamba=MambaConfig(), scan_layers=True,
        ), args.batch, 64),
        ("conformer_large_ctc", ASRConfig(
            vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
            num_decoder_layers=0, d_ffn=1024, encoder_module="conformer",
            compute_dtype="bfloat16",
        ), args.batch, 64),
        # Beyond-reference encoder family (the reference's branchformer
        # path is a NameError; hparams/CTC/branchformer_large.yaml).
        ("branchformer_large_ctc", ASRConfig(
            vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
            num_decoder_layers=0, encoder_module="branchformer",
            csgu_linear_units=2048, compute_dtype="bfloat16",
        ), args.batch, 64),
        ("conmamba_large_ctc", ASRConfig(
            vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
            num_decoder_layers=0, d_ffn=1024, encoder_module="conmamba",
            compute_dtype="bfloat16", mamba=MambaConfig(), scan_layers=True,
        ), args.batch, 64),
        # The heaviest shipped config: S2S joint CTC+CE with the Mamba
        # decoder (hparams/S2S/conmambamamba_large.yaml dims).
        ("conmambamamba_large_s2s", ASRConfig(
            vocab_size=5000, d_model=512, nhead=8, num_encoder_layers=12,
            num_decoder_layers=6, d_ffn=2048, encoder_module="conmamba",
            decoder_module="mamba", compute_dtype="bfloat16",
            mamba=MambaConfig(), scan_layers=True,
        ), max(args.batch // 2, 1), 48),
    ]
    times = {}
    for name, cfg, batch, tgt in configs:
        if args.only and args.only not in name:
            continue
        if args.remat:
            import dataclasses as _dc

            cfg = _dc.replace(cfg, remat_layers=True)
        times[name] = bench_config(name, cfg, frontend, batch,
                                   args.seconds, steps=args.steps,
                                   tgt_len=tgt, accum=args.accum)
    if "conformer_large_ctc" in times and "conmamba_large_ctc" in times:
        dt_cl, dt_ml = times["conformer_large_ctc"], times["conmamba_large_ctc"]
        print(f"conmamba_large vs conformer_large at {args.seconds:.0f}s "
              f"clips: {dt_cl / dt_ml:.2f}x (the linear-SSM advantage is "
              f"length-dependent — crossover ~25-30s; reference claims "
              f"25-40% on GPU)")


if __name__ == "__main__":
    main()
