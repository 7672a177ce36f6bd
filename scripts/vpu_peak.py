#!/usr/bin/env python
"""Measure the attainable f32 VPU rate with a trivial Pallas kernel, to
anchor the selective-scan roofline (docs/DESIGN.md §8b).

The kernel streams (L_CHUNK, D_TILE) f32 blocks and runs K dependent
FMA-shaped updates per element in VMEM — the same op mix as the scan
cell's hot loop (multiply-add chains), with no scan structure, no
transcendentals, no reductions. ops/s = elements * K * 2 / time gives
the empirical ceiling the scan cell competes against. A second variant
(--independent) runs 4 independent chains to expose the ILP-limited
vs throughput-limited gap.

    python scripts/vpu_peak.py [--k 64] [--independent]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=384)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--k", type=int, default=64, help="FMAs per element")
    ap.add_argument("--independent", action="store_true",
                    help="4 independent chains instead of 1 dependent")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    L_CHUNK, D_TILE = 64, 512
    b, t, d, k = args.b, args.t, args.d, args.k
    lp = (t + L_CHUNK - 1) // L_CHUNK * L_CHUNK

    def kernel(x_ref, o_ref, *, k: int, independent: bool):
        # acc = acc * x + c is NOT foldable (data-dependent multiplier);
        # a constant-coefficient chain acc = acc*a + x is linear in x and
        # the compiler collapses all K steps to one multiply (measured:
        # a bogus 15 Tops/s). |x| < 1 keeps the iteration bounded.
        x = x_ref[0].astype(jnp.float32)
        if independent:
            accs = [x * (1.0 + 0.125 * i) for i in range(4)]
            for i in range(k // 4):
                for j in range(4):
                    accs[j] = accs[j] * x + (0.25 + 0.125 * j)
            acc = accs[0] + accs[1] + accs[2] + accs[3]
        else:
            acc = x
            for _ in range(k):
                acc = acc * x + 0.5
        o_ref[0] = acc.astype(o_ref.dtype)

    grid = (b, d // D_TILE, lp // L_CHUNK)
    spec = pl.BlockSpec((1, L_CHUNK, D_TILE), lambda b_, d_, l_: (b_, l_, d_))

    fn = pl.pallas_call(
        functools.partial(kernel, k=k, independent=args.independent),
        grid=grid,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, lp, d), jnp.float32),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.1, 0.9, size=(b, lp, d)), jnp.float32)

    def k_steps(n):
        def body(c, i):
            xx, acc = c
            return (xx, acc + fn(xx + 1e-9 * i).sum() * 1e-9), ()

        return jax.jit(lambda c: jax.lax.scan(body, c, jnp.arange(n))[0])

    # Each call is only ~0.1 ms: the k-differencing needs hundreds of
    # calls for the delta to clear the tunnel's dispatch noise (k1=3 /
    # k2=9 measured a NEGATIVE delta here).
    k1, k2 = 100, 1100
    run1, run2 = k_steps(k1), k_steps(k2)
    carry = (x, jnp.zeros(()))
    t0 = time.perf_counter()
    _ = float(np.asarray(run1(carry)[1]))
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)
    _ = float(np.asarray(run2(carry)[1]))

    def timed(run):
        t0 = time.perf_counter()
        _ = float(np.asarray(run(carry)[1]))
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(3))
    t2 = min(timed(run2) for _ in range(3))
    per = (t2 - t1) / (k2 - k1)
    elems = b * lp * d
    tops = elems * k * 2 / per / 1e12
    mode = "independent-4" if args.independent else "dependent"
    print(
        f"vpu peak probe ({mode}, K={k}, {elems/1e6:.1f}M elems): "
        f"{per*1000:.3f} ms/call -> {tops:.2f} Tops/s f32 (FMA=2)",
        flush=True,
    )


if __name__ == "__main__":
    main()
