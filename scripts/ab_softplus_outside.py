#!/usr/bin/env python
"""In-process A/B: softplus(dt)+bias INSIDE the Pallas scan kernel vs
precomputed by XLA outside (kernel called with delta_softplus=False).

Motivation (DESIGN §8b ablation): `nosoftplus` is the largest single
fwd cut (0.264 -> 0.180 ms/op) — log1p + the sigmoid divide are the
kernel's slow transcendentals. XLA computing softplus outside fuses it
into the surrounding elementwise/matmul pipeline where the VPU can
overlap the MXU; HBM traffic is unchanged (delta travels to the kernel
as fp32 either way). If the composite (XLA softplus + nosoftplus
kernel) beats the in-kernel softplus, wire it as the production path.

    python scripts/ab_softplus_outside.py [--b 16 --t 376 --d 1024]
    python scripts/ab_softplus_outside.py --fwd-only
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
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--t", type=int, default=376)
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import mamba_asr_tpu.ops.pallas.scan as scan_mod

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

    def scan_inside(u_, delta_):
        return scan_mod.selective_scan_pallas(
            u_, delta_, A, B, C, D, z=z, delta_bias=dtb,
            delta_softplus=True,
        )

    def scan_outside(u_, delta_):
        dt = jax.nn.softplus(delta_ + dtb[None, None, :])
        return scan_mod.selective_scan_pallas(
            u_, dt, A, B, C, D, z=z, delta_bias=None,
            delta_softplus=False,
        )

    def mk(op, k):
        if args.fwd_only:
            def body_val(u_):
                out = op(u_, delta)
                return jnp.sum(out * out) * 1e-26
        else:
            def loss(u_, delta_):
                out = op(u_, delta_)
                return jnp.sum(out * out) * 1e-6

            grad = jax.grad(loss, argnums=(0, 1))

            def body_val(u_):
                gu, gd = grad(u_, delta)
                return (jnp.sum(gu * gu) + jnp.sum(gd * gd)) * 1e-26

        @jax.jit
        def f(u0):
            def body(c, _):
                return c + body_val(u0 + c * 1e-20), ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return c

        return f

    # Numerics check first (CPU-interpret unnecessary: both paths run
    # the same kernel; only softplus placement differs).
    y1 = np.asarray(scan_inside(u, delta))
    y2 = np.asarray(scan_outside(u, delta))
    err = float(np.max(np.abs(y1 - y2)))
    print(f"max |inside - outside| = {err:.3e}", flush=True)

    k1, k2 = 20, 120
    fns = {}
    for name, op in (("inside", scan_inside), ("outside", scan_outside)):
        f1, f2 = mk(op, k1), mk(op, k2)
        _ = float(f1(u))
        _ = float(f2(u))
        fns[name] = (f1, f2)

    results = {k: [] for k in fns}
    for _ in range(args.rounds):
        for name, (f1, f2) in fns.items():
            t0 = time.perf_counter()
            _ = float(f1(u))
            t1 = time.perf_counter()
            _ = float(f2(u))
            t2 = time.perf_counter()
            results[name].append(((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1000)
    for name, vals in results.items():
        med = sorted(vals)[len(vals) // 2]
        print(f"{name:8s} {med:6.3f} ms/op  {['%.3f' % v for v in vals]}",
              flush=True)


if __name__ == "__main__":
    main()
