#!/usr/bin/env python
"""In-process A/B of the fused-y forward kernel (scan.FUSED_Y).

Compiles the full fwd+bwd op twice in ONE process — once with the fused
combine+contraction, once with the materialize-then-contract original —
and round-robin-times both (K-step on-device scan differencing). Only
in-process medians are trustworthy on this tunnel (±20 % across
processes/days; CLAUDE.md).

    python scripts/ab_scan_fused.py [--b 8 --t 376 --d 1024 --n 16]
    python scripts/ab_scan_fused.py --fwd-only
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
    ap.add_argument("--b", type=int, default=8)
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

    def build():
        """Trace NOW (FUSED_Y read at trace time), return jitted k-step."""
        if args.fwd_only:
            def op(u_, delta_):
                out = scan_mod.selective_scan_pallas(
                    u_, delta_, A, B, C, D, z=z, delta_bias=dtb,
                    delta_softplus=True,
                )
                return jnp.sum(out * out) * 1e-6
        else:
            def loss(u_, delta_):
                out = scan_mod.selective_scan_pallas(
                    u_, delta_, A, B, C, D, z=z, delta_bias=dtb,
                    delta_softplus=True,
                )
                return jnp.sum(out * out) * 1e-6

            grad = jax.grad(loss, argnums=(0, 1))

            def op(u_, delta_):
                gu, gd = grad(u_, delta_)
                return jnp.sum(gu * gu) * 1e-9 + jnp.sum(gd * gd) * 1e-9

        def k_steps(k):
            @jax.jit
            def f(u0):
                def body(c, _):
                    s = op(u0 + c * 1e-20, delta)
                    return c + s * 1e-20, ()

                c, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=k
                )
                return c

            return f

        return k_steps

    K1, K2 = 20, 120
    variants = {}
    for name, fused in (("fused", True), ("unfused", False)):
        scan_mod.FUSED_Y = fused
        mk = build()
        f1, f2 = mk(K1), mk(K2)
        _ = float(f1(u))  # trace+compile+warm while FUSED_Y holds
        _ = float(f2(u))
        variants[name] = (f1, f2)
    scan_mod.FUSED_Y = True

    results = {"fused": [], "unfused": []}
    for r in range(args.rounds):
        for name, (f1, f2) in variants.items():
            t0 = time.perf_counter()
            _ = float(f1(u))
            t1 = time.perf_counter()
            _ = float(f2(u))
            t2 = time.perf_counter()
            per = ((t2 - t1) - (t1 - t0)) / (K2 - K1) * 1000
            results[name].append(per)
    for name, vals in results.items():
        med = sorted(vals)[len(vals) // 2]
        print(f"{name:8s} {med:6.3f} ms/op  {['%.3f' % v for v in vals]}",
              flush=True)


if __name__ == "__main__":
    main()
