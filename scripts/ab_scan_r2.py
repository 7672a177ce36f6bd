#!/usr/bin/env python
"""In-process A/B: HEAD inference forward vs the round-2 kernel.

Adjudicates the bench.py RTFx drop (r1 21,190 / r2 20,640 -> r4 17,612 /
r5 17,592 with only 0.6 % block spread — reproducible, NOT tunnel
noise). Two levels, both in ONE process so tunnel/day drift cancels:

1. kernel: fwd-only ms/op of `selective_scan_pallas`, HEAD vs the
   round-2 file (fetched via `git show <r2>:ops/pallas/scan.py`), at
   the bench's ConMamba-Small shapes (B32, T750, D288, N16) and the
   heavy shapes (B8, T376, D1024, N16).
2. pipeline: the full bench.py `infer_k` (fbank -> encoder -> CTC ->
   greedy, 10 iterations in one on-device lax.scan), HEAD kernel vs
   the r2 kernel monkeypatched into ops.selective_scan's dispatch.

    python scripts/ab_scan_r2.py [--skip-pipeline]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R2_COMMIT = "49d7c21"  # round 2: VERDICT + ADVICE + BENCH


def load_r2_scan():
    src = subprocess.run(
        ["git", "show", f"{R2_COMMIT}:mamba_asr_tpu/ops/pallas/scan.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/_scan_r2_ab.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("_scan_r2_ab", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def time_pair(f1, f2, u, k1, k2, rounds):
    """K-step differencing, round-robin in-process medians (ms/op)."""
    vals = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        _ = float(f1(u))
        t1 = time.perf_counter()
        _ = float(f2(u))
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000)
    return vals


def bench_kernel(scan_mod, shapes, rounds):
    import jax
    import jax.numpy as jnp

    b, t, d, n = shapes
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(b, t, d)) * 0.5, jnp.float32)
    delta = jnp.asarray(rng.normal(size=(b, t, d)) * 0.3, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32))
    B = jnp.asarray(rng.normal(size=(b, t, n)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, t, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    dtb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)

    def mk(k):
        @jax.jit
        def f(u0):
            def body(c, _):
                out = scan_mod.selective_scan_pallas(
                    u0 + c * 1e-20, delta, A, B, C, D, z=z,
                    delta_bias=dtb, delta_softplus=True,
                )
                return c + jnp.sum(out * out) * 1e-26, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return f

    k1, k2 = 20, 120
    f1, f2 = mk(k1), mk(k2)
    _ = float(f1(u))
    _ = float(f2(u))
    return f1, f2, u, k1, k2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    import jax  # noqa: F401

    import mamba_asr_tpu.ops.pallas.scan as head_scan

    r2_scan = load_r2_scan()

    for shapes in ((32, 750, 288, 16), (8, 376, 1024, 16)):
        pairs = {}
        for name, mod in (("head", head_scan), ("r2", r2_scan)):
            pairs[name] = bench_kernel(mod, shapes, args.rounds)
        results = {k: [] for k in pairs}
        for _ in range(args.rounds):
            for name, (f1, f2, u, k1, k2) in pairs.items():
                results[name].extend(time_pair(f1, f2, u, k1, k2, 1))
        print(f"shapes B{shapes[0]} T{shapes[1]} D{shapes[2]} N{shapes[3]}:")
        for name, vals in results.items():
            med = sorted(vals)[len(vals) // 2]
            print(f"  {name:5s} fwd {med:6.3f} ms/op "
                  f"{['%.3f' % v for v in vals]}", flush=True)

    if args.skip_pipeline:
        return

    # Full bench pipeline with each kernel (monkeypatch the module
    # object ops.selective_scan resolves at trace time).
    import jax.numpy as jnp

    from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode
    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram

    cfg = ASRConfig(
        vocab_size=31, n_mels=80, d_model=144, nhead=4,
        num_encoder_layers=12, num_decoder_layers=0, d_ffn=1024,
        dropout=0.0, encoder_module="conmamba", kernel_size=31,
        compute_dtype="bfloat16",
        mamba=MambaConfig(d_state=16, expand=2, d_conv=4),
        scan_layers=True,
    )
    model = ASRModel(cfg)
    batch, seconds, sr, iters = 32, 30.0, 16000, 10
    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0.0, 0.1, size=(batch, n)), jnp.float32)
    wav_lens = jnp.full((batch,), n, jnp.int32)
    feats0 = log_mel_spectrogram(wav[:1], n_fft=400)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), feats0,
        jnp.full((1,), feats0.shape[1], jnp.int32),
    )

    def build_infer_k():
        def infer(wav_, lens_):
            feats = log_mel_spectrogram(wav_, n_fft=400)
            flens = jnp.minimum(lens_ // 160 + 1, feats.shape[1])
            out = model.apply(params, feats, flens)
            return ctc_greedy_decode(
                out["ctc_log_probs"], out["enc_lengths"]
            )

        @jax.jit
        def infer_k(w):
            def body(w_, _):
                toks, lens = infer(w_, wav_lens)
                return w_ + lens[0].astype(w_.dtype) * 1e-30, (toks, lens)

            _, (toks, lens) = jax.lax.scan(body, w, jnp.arange(iters))
            return toks[-1], lens[-1]

        return infer_k

    import mamba_asr_tpu.ops.pallas as pallas_pkg

    fns = {}
    for name, mod in (("head", head_scan), ("r2", r2_scan)):
        pallas_pkg.scan = mod
        sys.modules["mamba_asr_tpu.ops.pallas.scan"] = mod
        f = build_infer_k()
        toks, lens = f(wav)
        _ = np.asarray(lens)  # compile+warm under this kernel
        toks, lens = f(wav)
        _ = np.asarray(lens)
        fns[name] = f
    pallas_pkg.scan = head_scan
    sys.modules["mamba_asr_tpu.ops.pallas.scan"] = head_scan

    audio_seconds = batch * seconds * iters
    results = {k: [] for k in fns}
    for _ in range(5):
        for name, f in fns.items():
            t0 = time.perf_counter()
            toks, lens = f(wav)
            _ = (np.asarray(toks), np.asarray(lens))
            results[name].append(audio_seconds / (time.perf_counter() - t0))
    print("pipeline RTFx (bench.py shapes, round-robin):")
    for name, vals in results.items():
        med = sorted(vals)[len(vals) // 2]
        print(f"  {name:5s} {med:9.1f} {['%.0f' % v for v in vals]}",
              flush=True)


if __name__ == "__main__":
    main()
