#!/usr/bin/env python
"""Sweep the Pallas selective-scan tiling knobs (L_CHUNK, COLS,
D_TILE_MAX) for the full fwd+bwd op IN ONE PROCESS, so the numbers are
comparable (cross-process/day tunnel variance here reaches ~±20 %, see
CLAUDE.md). All points are numerically-correct configurations — this is
a tuning sweep, not an ablation (scripts/exp_scan_variants.py).

    python scripts/sweep_scan_tiles.py [--b 8 --t 376 --d 1024 --n 16]
        [--grid "64:8:512,64:4:512,..."]   # L_CHUNK:COLS:D_TILE_MAX
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GRID = [
    (64, 8, 512),   # production config (baseline)
    (64, 4, 512),
    (64, 16, 512),
    (64, 8, 256),
    (128, 8, 512),
    (128, 16, 256),
    (32, 8, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=376)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--grid", default=None)
    ap.add_argument("--rounds", type=int, default=1,
                    help="round-robin repetitions of the whole grid "
                         "(per-config medians; defeats slow clock drift "
                         "that aliases into config deltas)")
    args = ap.parse_args()

    grid = DEFAULT_GRID
    if args.grid:
        grid = [
            tuple(int(x) for x in item.split(":"))
            for item in args.grid.split(",")
        ]
    grid = grid * args.rounds

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.ops.pallas import scan as scan_mod

    b, t, d, n = args.b, args.t, args.d, args.n
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(b, t, d)) * 0.5, jnp.float32)
    delta = jnp.asarray(rng.normal(size=(b, t, d)) * 0.3, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32))
    B = jnp.asarray(rng.normal(size=(b, t, n)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(b, t, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
    dtb = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)

    keep_alive = []  # pin fresh fn objects so ids never collide in jit cache
    results = []
    expected = None
    for lchunk, cols, dmax in grid:
        scan_mod.L_CHUNK = lchunk
        scan_mod.COLS = cols
        scan_mod.D_TILE_MAX = dmax

        def loss(u_, delta_, A_, B_, C_, D_, z_, dtb_):
            out = scan_mod.selective_scan_pallas(
                u_, delta_, A_, B_, C_, D_, z=z_, delta_bias=dtb_,
                delta_softplus=True,
            )
            return jnp.sum(out * out) * 1e-6

        grad_fn = jax.value_and_grad(loss, argnums=tuple(range(8)))

        def op(u_, delta_, _g=grad_fn):
            val, grads = _g(u_, delta_, A, B, C, D, z, dtb)
            gsum = sum(jnp.sum(g) * 1e-9 for g in grads)
            return val + gsum

        def k_steps(k, _op=op):
            def body(c, i):
                uu, dd, acc = c
                return (uu, dd, acc + _op(uu, dd + 1e-9 * i)), ()

            fn = lambda c: jax.lax.scan(body, c, jnp.arange(k))[0]
            keep_alive.append((fn, body, _op))
            return jax.jit(fn)

        try:
            # ~100 ops of delta: at ~1 ms/op that is ~100 ms, an order
            # above the tunnel's fetch jitter (k1=3/k2=9 differencing
            # produced NEGATIVE per-op times on occasion).
            k1, k2 = 20, 120
            run1, run2 = k_steps(k1), k_steps(k2)
            carry = (u, delta, jnp.zeros(()))
            t0 = time.perf_counter()
            out = run1(carry)
            v1 = float(np.asarray(out[2]))
            warm = time.perf_counter() - t0
            out = run2(carry)
            _ = float(np.asarray(out[2]))

            # Cross-config correctness guard: the k1-scan loss is
            # config-independent (same math, different tiling).
            if expected is None:
                expected = v1
            elif not np.isclose(v1, expected, rtol=1e-4):
                print(f"  WARNING value mismatch: {v1} vs {expected}")

            def timed(run, _c=carry):
                t0 = time.perf_counter()
                o = run(_c)
                _ = float(np.asarray(o[2]))
                return time.perf_counter() - t0

            t1 = min(timed(run1) for _ in range(3))
            t2 = min(timed(run2) for _ in range(3))
            per = (t2 - t1) / (k2 - k1) * 1000
            results.append((lchunk, cols, dmax, per))
            print(
                f"L_CHUNK={lchunk:4d} COLS={cols:3d} D_TILE_MAX={dmax:4d}: "
                f"{per:6.3f} ms/op   (warmup {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # VMEM overflow etc.: record and continue
            results.append((lchunk, cols, dmax, None))
            print(
                f"L_CHUNK={lchunk:4d} COLS={cols:3d} D_TILE_MAX={dmax:4d}: "
                f"FAILED ({type(e).__name__}: {str(e)[:120]})",
                flush=True,
            )

    ok = [r for r in results if r[3] is not None]
    if ok:
        by_cfg = {}
        for lc, co, dm, per in ok:
            by_cfg.setdefault((lc, co, dm), []).append(per)
        meds = {k: float(np.median(v)) for k, v in by_cfg.items()}
        if args.rounds > 1:
            for (lc, co, dm), m in sorted(meds.items(), key=lambda kv: kv[1]):
                vals = ", ".join(f"{v:.3f}" for v in by_cfg[(lc, co, dm)])
                print(f"median L_CHUNK={lc} COLS={co} D_TILE_MAX={dm}: "
                      f"{m:.3f} ms/op  [{vals}]")
        best = min(meds.items(), key=lambda kv: kv[1])
        print(
            f"best: L_CHUNK={best[0][0]} COLS={best[0][1]} "
            f"D_TILE_MAX={best[0][2]} -> {best[1]:.3f} ms/op"
        )


if __name__ == "__main__":
    main()
