#!/usr/bin/env python
"""Micro-benchmark the Pallas selective-scan kernel fwd+bwd.

Times value_and_grad of a scalar loss over the kernel at the heavy
config's shapes (B8 T376 D1024 N16 by default) with K-step scan
differencing (cancels the tunnel dispatch cost), and prints ms/op.

    python scripts/bench_scan_kernel.py [--b 8 --t 376 --d 1024 --n 16]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.ops.pallas.scan import selective_scan_pallas

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

    if args.fwd_only:
        def op(u_, delta_):
            out = selective_scan_pallas(
                u_, delta_, A, B, C, D, z=z, delta_bias=dtb,
                delta_softplus=True,
            )
            return jnp.sum(out * out) * 1e-6
    else:
        def loss(u_, delta_, A_, B_, C_, D_, z_, dtb_):
            out = selective_scan_pallas(
                u_, delta_, A_, B_, C_, D_, z=z_, delta_bias=dtb_,
                delta_softplus=True,
            )
            return jnp.sum(out * out) * 1e-6

        # Differentiate w.r.t. ALL tensor inputs — exactly what the
        # training step pays (D/z/delta_bias adjoints included).
        grad_fn = jax.value_and_grad(loss, argnums=tuple(range(8)))

        def op(u_, delta_):
            val, grads = grad_fn(u_, delta_, A, B, C, D, z, dtb)
            # Consume EVERY grad leaf: anything unused is dead code XLA
            # strips from the timed program (the dA/dB/dC reductions and
            # the (B, L, D) dD epilogue are real training-path work).
            gsum = sum(jnp.sum(g) * 1e-9 for g in grads)
            return val + gsum, None

    def k_steps(k):
        def body(c, i):
            uu, dd, acc = c
            if args.fwd_only:
                acc = acc + op(uu, dd + 1e-9 * i)
            else:
                v, _ = op(uu, dd + 1e-9 * i)
                acc = acc + v
            return (uu, dd, acc), ()

        return jax.jit(
            lambda c: jax.lax.scan(body, c, jnp.arange(k))[0]
        )

    # ~100 ops of delta clears the tunnel's fetch jitter (k1=3/k2=9
    # differencing occasionally measured negative per-op times).
    k1, k2 = 20, 120
    run1, run2 = k_steps(k1), k_steps(k2)
    carry = (u, delta, jnp.zeros(()))
    t0 = time.perf_counter()
    out = run1(carry)
    _ = float(np.asarray(out[2]))
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)
    out = run2(carry)
    _ = float(np.asarray(out[2]))

    def timed(run):
        t0 = time.perf_counter()
        o = run(carry)
        _ = float(np.asarray(o[2]))
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(3))
    t2 = min(timed(run2) for _ in range(3))
    per = (t2 - t1) / (k2 - k1) * 1000
    mode = "fwd" if args.fwd_only else "fwd+bwd"
    print(f"scan kernel {mode} (B{b} T{t} D{d} N{n}): {per:.2f} ms/op",
          flush=True)


if __name__ == "__main__":
    main()
