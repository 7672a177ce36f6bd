#!/usr/bin/env python
"""Component ablation profile of the ConMamba Large CTC train step (TPU).

The reference's load-bearing training-speed claim is ConMamba vs
Conformer at LibriSpeech clip lengths (/root/reference/README.md:78).
This attributes the ConMamba Large CTC step (hparams/CTC/
conmamba_large.yaml dims, batch 16 x 15 s) so kernel work aims at the
real bottleneck: full step, encoder fwd, encoder fwd+bwd, and the
measured cost of the 36 directional selective scans at the exact layer
shape (B, T/4, d_inner) for comparison.

    python scripts/profile_ctc.py [--seconds 15 --batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_time(fn, arg, k1=4, k2=12, reps=3):
    """Per-iteration device time via K-step lax.scan differencing
    (cancels the ~250 ms tunnel dispatch; sync by fetching a value)."""
    import jax
    import jax.numpy as jnp

    def k_steps(k):
        def body(c, i):
            return fn(c, i), ()

        return jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(k))[0])

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
    p.add_argument("--config", default="hparams/CTC/conmamba_large.yaml",
                   help="recipe yaml (conformer_large.yaml for the "
                        "same-flags comparison row)")
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--tgt", type=int, default=48)
    p.add_argument("--ablate", action="store_true",
                   help="encoder-variant attribution: re-measure encoder "
                        "fwd+bwd with one component cheapened at a time "
                        "(conv k31->k1, unidirectional scan, d_ffn/4, "
                        "fp32->bf16 LNs) — the deltas attribute the "
                        "non-scan-kernel share of the backward")
    p.add_argument("--ablate-acts", action="store_true",
                   help="encoder fwd+bwd with activation gelu (erf) vs "
                        "gelu_tanh vs swish — quantifies the erf tax "
                        "in-graph (standalone probe: 219.8 vs 21.7 vs "
                        "9.5 us/op)")
    p.add_argument("--full-only", action="store_true",
                   help="measure only the full train step (for dropout/"
                        "rng-impl attribution runs)")
    p.add_argument("--gelu-tanh", action="store_true",
                   help="override model.activation=gelu_tanh (the "
                        "erf-free FFN activation)")
    p.add_argument("--dropout0", action="store_true",
                   help="override model.dropout=0 — attributes the "
                        "dropout-mask (threefry bit-gen) share of the step")
    p.add_argument("--rng-impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="PRNG impl for the in-step dropout/specaug keys; "
                        "rbg/unsafe_rbg use the TPU hardware RngBitGenerator")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.configs.loader import load_config
    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram
    from mamba_asr_tpu.training.trainer import (
        SpecAugmentConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    overrides = {"model.scan_layers": True,
                 "train.grad_accumulation_factor": 1}
    if args.dropout0:
        overrides["model.dropout"] = 0.0
    if args.gelu_tanh:
        overrides["model.activation"] = "gelu_tanh"
    cfg = load_config(args.config, overrides)
    frontend = cfg.frontend
    tcfg = cfg.train

    b = args.batch
    n = int(args.seconds * frontend.sample_rate)
    rng = np.random.default_rng(0)
    vocab = cfg.model.vocab_size
    tokens = rng.integers(4, vocab, size=(b, args.tgt))
    batch = {
        "wav": rng.normal(0, 0.1, size=(b, n)).astype(np.float32),
        "wav_lens": np.full((b,), n, np.int32),
        "tokens": tokens.astype(np.int32),
        "token_lens": np.full((b,), args.tgt, np.int32),
        "weight": np.ones((b,), np.float32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    model = ASRModel(cfg.model)
    tx = make_optimizer(tcfg)
    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0),
                             batch)
    step = make_train_step(model, tx, frontend, tcfg, SpecAugmentConfig())
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"{cfg.name} ({n_params/1e6:.1f}M params), "
          f"batch {b} x {args.seconds:.0f}s", flush=True)

    feats = log_mel_spectrogram(
        jb["wav"], sample_rate=frontend.sample_rate, n_fft=frontend.n_fft,
        n_mels=frontend.n_mels, win_length_ms=frontend.win_length_ms,
        hop_length_ms=frontend.hop_length_ms,
    )
    flens = jnp.full((b,), feats.shape[1], jnp.int32)
    print(f"feats {feats.shape}", flush=True)

    results = {}

    if not (args.full_only or args.ablate_acts):
        # Encoder forward only.
        def enc_only(c, i):
            params, acc = c
            enc, _ = model.apply({"params": params},
                                 feats * (1.0 + 1e-6 * i), flens,
                                 method=ASRModel.encode)
            return (params, acc + enc.mean().astype(jnp.float32))

        results["fwd_encoder"] = device_time(
            enc_only, (state.params, jnp.zeros(())))
        print(f"encoder fwd: {results['fwd_encoder']*1000:.1f} ms",
              flush=True)

        # Encoder fwd+bwd (grad wrt params of a scalar over encoder out).
        def enc_loss(params, f):
            enc, _ = model.apply({"params": params}, f, flens,
                                 method=ASRModel.encode)
            return enc.mean().astype(jnp.float32)

        enc_grad = jax.grad(enc_loss)

        def enc_fb(c, i):
            params, acc = c
            g = enc_grad(params, feats * (1.0 + 1e-6 * i))
            # Consume EVERY grad leaf — reading one leaf lets XLA
            # dead-code eliminate the rest of the backward (measured
            # 0.5 ms "fwd+bwd").
            tot = jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum().astype(jnp.float32), g,
                jnp.zeros(()))
            return (params, acc + tot)

        results["encoder_fwd_bwd"] = device_time(
            enc_fb, (state.params, jnp.zeros(())))
        print(f"encoder fwd+bwd: {results['encoder_fwd_bwd']*1000:.1f} ms",
              flush=True)

    if args.ablate or args.ablate_acts:
        import dataclasses

        def enc_fb_time(tag, mcfg):
            m = ASRModel(mcfg)
            prm = m.init(
                jax.random.PRNGKey(0), feats[:1], flens[:1]
            )["params"]

            def lf(params, f):
                enc, _ = m.apply({"params": params}, f, flens,
                                 method=ASRModel.encode)
                return enc.mean().astype(jnp.float32)

            g = jax.grad(lf)

            def fb(c, i):
                params, acc = c
                gr = g(params, feats * (1.0 + 1e-6 * i))
                tot = jax.tree_util.tree_reduce(
                    lambda a, x: a + x.sum().astype(jnp.float32), gr,
                    jnp.zeros(()))
                return (params, acc + tot)

            t = device_time(fb, (prm, jnp.zeros(())))
            print(f"encoder fwd+bwd [{tag}]: {t*1000:.1f} ms", flush=True)
            return t

        base_cfg = cfg.model
        if args.ablate_acts:
            enc_fb_time("gelu (erf)", base_cfg)
            enc_fb_time("gelu_tanh", dataclasses.replace(
                base_cfg, activation="gelu_tanh"))
            enc_fb_time("swish", dataclasses.replace(
                base_cfg, activation="swish"))
            return
        enc_fb_time("base", base_cfg)
        enc_fb_time("conv k31->k1",
                    dataclasses.replace(base_cfg, kernel_size=1))
        enc_fb_time("unidirectional",
                    dataclasses.replace(base_cfg, bidirectional=False))
        enc_fb_time("d_ffn/4",
                    dataclasses.replace(base_cfg, d_ffn=base_cfg.d_ffn // 4))
        enc_fb_time("d_state 16->4", dataclasses.replace(
            base_cfg,
            mamba=dataclasses.replace(base_cfg.mamba, d_state=4),
        ))
        # The scan heads' k=4 causal convs (2 per layer + adjoints) ride
        # XLA's depthwise conv, whose bwd lowering can be disproportionate
        # on TPU — k=1 makes them pointwise and attributes the cost.
        enc_fb_time("mamba d_conv 4->1", dataclasses.replace(
            base_cfg,
            mamba=dataclasses.replace(base_cfg.mamba, d_conv=1),
        ))
        return

    # Full-step closure (also used by --full-only attribution runs).
    # The in-step dropout/specaug keys derive from this key, so
    # --rng-impl rbg/unsafe_rbg routes the mask bit-gen through the TPU
    # hardware RngBitGenerator instead of threefry's VPU shuffle net.
    step_key = jax.random.key(1, impl=args.rng_impl)

    def full_step(s, i):
        s2, _ = step(s, jb, jax.random.fold_in(step_key, i),
                     jnp.asarray(True))
        return s2

    if args.full_only:
        t = device_time(full_step, state)
        print(f"full step [dropout0={args.dropout0}, "
              f"rng={args.rng_impl}, act={cfg.model.activation}]: "
              f"{t*1000:.1f} ms", flush=True)
        return

    # Frontend only (fbank; the in-step normalize/specaug are elementwise).
    def fb_only(acc, i):
        f = log_mel_spectrogram(
            jb["wav"] * (1.0 + 1e-6 * i), sample_rate=frontend.sample_rate,
            n_fft=frontend.n_fft, n_mels=frontend.n_mels,
            win_length_ms=frontend.win_length_ms,
            hop_length_ms=frontend.hop_length_ms,
        )
        return acc + f.mean()

    results["fbank"] = device_time(fb_only, jnp.zeros(()))
    print(f"fbank: {results['fbank']*1000:.1f} ms", flush=True)

    # CTC loss fwd+bwd on fixed log-probs-shaped activations.
    from mamba_asr_tpu.ops.ctc import ctc_loss

    t4 = feats.shape[1] // 4
    lp_base = jnp.asarray(
        rng.normal(size=(b, t4, vocab)).astype(np.float32))
    llens = jnp.full((b,), t4, jnp.int32)

    def ctc_fb(c, i):
        lp, acc = c
        def lf(x):
            logp = jax.nn.log_softmax(x * (1.0 + 1e-6 * i), axis=-1)
            return ctc_loss(logp, jb["tokens"], llens,
                            jb["token_lens"]).mean()
        v, g = jax.value_and_grad(lf)(lp)
        return (lp, acc + v + g.sum())

    results["ctc_fwd_bwd"] = device_time(
        ctc_fb, (lp_base, jnp.zeros(())))
    print(f"ctc loss fwd+bwd: {results['ctc_fwd_bwd']*1000:.1f} ms",
          flush=True)

    # Optimizer only: AdamW update on the real param tree.
    def opt_only(c, i):
        params, opt_state, acc = c
        g = jax.tree_util.tree_map(
            lambda p: (p * (1e-9 * i)).astype(p.dtype), params)
        upd, opt_state = tx.update(g, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
        leaf = jax.tree_util.tree_leaves(params)[-1]
        return (params, opt_state, acc + leaf.sum())

    results["opt"] = device_time(
        opt_only, (state.params, state.opt_state, jnp.zeros(())))
    print(f"optimizer: {results['opt']*1000:.1f} ms", flush=True)

    # The small in-step services (candidates for the unattributed gap).
    from mamba_asr_tpu.data.augment import spec_augment
    from mamba_asr_tpu.training.normalizer import update_normalizer
    import optax

    def sa_only(acc, i):
        f = spec_augment(
            feats * (1.0 + 1e-6 * i),
            jax.random.fold_in(jax.random.PRNGKey(2), i),
            num_time_drops=4, time_drop_width=20,
            num_freq_drops=4, freq_drop_width=10,
        )
        return acc + f.mean()

    results["specaug"] = device_time(sa_only, jnp.zeros(()))
    print(f"specaug: {results['specaug']*1000:.1f} ms", flush=True)

    fmask = jnp.ones(feats.shape[:2], bool)

    def norm_only(c, i):
        st, acc = c
        st2 = update_normalizer(st, feats * (1.0 + 1e-6 * i), fmask)
        return (st2, acc + st2.mean.sum())

    results["norm_update"] = device_time(
        norm_only, (state.normalizer, jnp.zeros(())))
    print(f"normalizer update: {results['norm_update']*1000:.1f} ms",
          flush=True)

    def gn_only(c, i):
        params, acc = c
        g = jax.tree_util.tree_map(lambda p: p * (1e-9 * i), params)
        return (params, acc + optax.global_norm(g))

    results["grad_norm"] = device_time(
        gn_only, (state.params, jnp.zeros(())))
    print(f"extra grad_norm: {results['grad_norm']*1000:.1f} ms",
          flush=True)

    # Full train step.
    results["full_step"] = device_time(full_step, state)
    print(f"full step: {results['full_step']*1000:.1f} ms", flush=True)

    rest = (results["full_step"] - results["encoder_fwd_bwd"]
            - results["fbank"] - results["ctc_fwd_bwd"] - results["opt"]
            - results["specaug"] - results["norm_update"]
            - results["grad_norm"])
    print(
        f"\nbreakdown: encoder fwd {results['fwd_encoder']*1000:.1f} ms, "
        f"encoder bwd {1000*(results['encoder_fwd_bwd']-results['fwd_encoder']):.1f} ms, "
        f"fbank {results['fbank']*1000:.1f} ms, "
        f"ctc {results['ctc_fwd_bwd']*1000:.1f} ms, "
        f"opt {results['opt']*1000:.1f} ms, "
        f"specaug {results['specaug']*1000:.1f} ms, "
        f"norm {results['norm_update']*1000:.1f} ms, "
        f"gradnorm {results['grad_norm']*1000:.1f} ms, "
        f"unattributed {rest*1000:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
