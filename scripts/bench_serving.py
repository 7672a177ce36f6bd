#!/usr/bin/env python
"""Slot-scaling benchmark for the streaming serving engine.

Sweeps the number of concurrent streams (slots) and times the compiled
steady-state tick (fbank -> conv frontend -> encoder chunk -> CTC
argmax for every slot in ONE dispatch) with K-tick on-device scan
differencing (cancels tunnel dispatch cost, per CLAUDE.md timing
rules). Reports per-tick latency, per-stream cost, and the real-time
capacity streams-per-chip = n_slots * chunk_sec / tick_sec.

    python scripts/bench_serving.py [--slots 1 2 4 8 16] \
        [--d_model 512 --layers 12 --chunk_frames 64] [--bf16]

All numbers in one table are from ONE process (in-process comparisons
only — cross-process kernel timings vary up to ~20%).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d_ffn", type=int, default=2048)
    ap.add_argument("--chunk_frames", type=int, default=64)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (serving-realistic)")
    ap.add_argument("--scan_layers", action="store_true",
                    help="nn.scan layer stack (O(1)-depth compile — "
                         "required for deep encoders over the "
                         "remote-compile tunnel)")
    ap.add_argument("--k", type=int, nargs=2, default=[8, 40],
                    metavar=("K1", "K2"), help="tick counts to difference")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.serving.engine import StreamingServer
    from mamba_asr_tpu.training.trainer import FrontendConfig

    cfg = ASRConfig(
        vocab_size=31, n_mels=80, d_model=args.d_model, nhead=8,
        num_encoder_layers=args.layers, num_decoder_layers=0,
        d_ffn=args.d_ffn, dropout=0.0, encoder_module="conmamba",
        kernel_size=31, causal=True, bidirectional=False,
        mamba=MambaConfig(d_state=16, d_conv=4, expand=2),
        compute_dtype="bfloat16" if args.bf16 else "float32",
        scan_layers=args.scan_layers,
    )
    frontend = FrontendConfig()
    model = ASRModel(cfg)
    feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), feats, jnp.array([16]))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    chunk_sec = args.chunk_frames * frontend.hop / frontend.sample_rate
    print(f"model: conmamba d{args.d_model} x{args.layers} "
          f"({n_params/1e6:.1f}M params), chunk {args.chunk_frames} frames "
          f"= {chunk_sec*1000:.0f} ms audio, "
          f"dtype {cfg.compute_dtype}", flush=True)

    rng = np.random.default_rng(0)
    print(f"{'slots':>5} {'ms/tick':>9} {'ms/stream':>10} "
          f"{'rt streams/chip':>15}", flush=True)
    rows = []
    for n_slots in args.slots:
        server = StreamingServer(
            model, params, frontend, n_slots=n_slots,
            chunk_frames=args.chunk_frames,
        )
        audio = jnp.asarray(
            rng.normal(0, 0.3, size=(n_slots, server.chunk_samples)),
            jnp.float32,
        )
        mask = jnp.ones((n_slots,), bool)
        tick = server._tick_fn

        def k_ticks(k):
            # params/audio/mask enter as ARGUMENTS: a closure capture
            # would inline all 80M params as dense HLO constants
            # (~324 MB serialized) and blow the remote-compile
            # endpoint's request-size limit (HTTP 413).
            def body(carry, i):
                p, st = carry
                best, _, st2 = tick(p, st,
                                    audio + 1e-9 * i.astype(jnp.float32),
                                    mask)
                return (p, st2), best[:, 0]
            return jax.jit(
                lambda p, st: jax.lax.scan(
                    body, (p, st), jnp.arange(k)
                )[1]
            )

        k1, k2 = args.k
        run1, run2 = k_ticks(k1), k_ticks(k2)
        st = server._state
        t0 = time.perf_counter()
        _ = np.asarray(run1(params, st)).sum()  # compile + 1-time warmup
        _ = np.asarray(run2(params, st)).sum()
        print(f"  [slots={n_slots}] compile+warmup "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

        def timed(run):
            t0 = time.perf_counter()
            _ = np.asarray(run(params, st)).sum()  # device->host sync
            return time.perf_counter() - t0

        t1 = min(timed(run1) for _ in range(3))
        t2 = min(timed(run2) for _ in range(3))
        ms_tick = (t2 - t1) / (k2 - k1) * 1000
        ms_stream = ms_tick / n_slots
        capacity = n_slots * chunk_sec / (ms_tick / 1000)
        rows.append((n_slots, ms_tick, ms_stream, capacity))
        print(f"{n_slots:>5} {ms_tick:>9.2f} {ms_stream:>10.2f} "
              f"{capacity:>15.0f}", flush=True)

    best = max(rows, key=lambda r: r[3])
    print(f"\nbest: {best[0]} slots -> {best[1]:.2f} ms/tick, "
          f"{best[3]:.0f} real-time streams/chip "
          f"(chunk {chunk_sec*1000:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
