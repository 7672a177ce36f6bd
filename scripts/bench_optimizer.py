#!/usr/bin/env python
"""Isolated optimizer-step benchmark: clip+AdamW under gradient
accumulation on the real S2S-Large-sized parameter tree (123 M fp32).

Motivation: optax.MultiSteps computes the FULL inner update every micro
step and discards it with per-leaf `jnp.where(emit, ...)` selects — at
factor 8 that is ~7/8 of all optimizer HBM traffic thrown away.
`cond_multi_steps` (training/trainer.py) runs the inner update under
`lax.cond` instead. This script measures ms per micro-step for both on
the current accelerator.

    python scripts/bench_optimizer.py [--accum 8 --steps 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--accum", type=int, default=8)
    p.add_argument("--steps", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.training.trainer import (
        TrainConfig,
        apply_accumulated_update,
        cond_multi_steps,
        make_optimizer,
        num_params,
    )

    cfg = ASRConfig(
        vocab_size=5000, d_model=512, nhead=8, num_encoder_layers=12,
        num_decoder_layers=6, d_ffn=2048, encoder_module="conmamba",
        decoder_module="mamba", compute_dtype="bfloat16",
        mamba=MambaConfig(), scan_layers=True,
    )
    model = ASRModel(cfg)
    shapes = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 32, cfg.n_mels), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1, 8), jnp.int32),
    )["params"]
    params = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes
        )
    )()
    grads = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes
        )
    )()
    print(f"params: {num_params(params)/1e6:.1f}M, accum={args.accum}",
          flush=True)

    tcfg = TrainConfig(grad_accumulation_factor=1)
    inner = make_optimizer(tcfg)
    variants = {
        "optax.MultiSteps": optax.MultiSteps(
            inner, every_k_schedule=args.accum
        ),
        "cond_multi_steps": cond_multi_steps(inner, args.accum),
    }

    variants["cond fused (apply_accumulated_update)"] = cond_multi_steps(
        inner, args.accum
    )

    for name, tx in variants.items():
        opt0 = jax.jit(tx.init)(params)
        fused = name.startswith("cond fused")

        def body(carry, _):
            p, s = carry
            if fused:
                p, s = apply_accumulated_update(tx, grads, s, p)
            else:
                u, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, u)
            return (p, s), jnp.float32(0)

        def k_steps(k):
            return jax.jit(
                lambda p, s: jax.lax.scan(body, (p, s), None, length=k)[0]
            )

        k1, k2 = max(args.steps // 4, 4), args.steps
        run1, run2 = k_steps(k1), k_steps(k2)
        # Warm both executables; sync via a value fetch.
        _ = float(np.asarray(jax.tree_util.tree_leaves(
            run1(params, opt0)[0])[0].ravel()[0]))
        _ = float(np.asarray(jax.tree_util.tree_leaves(
            run2(params, opt0)[0])[0].ravel()[0]))

        def timed(run):
            t0 = time.perf_counter()
            out = run(params, opt0)
            _ = float(np.asarray(
                jax.tree_util.tree_leaves(out[0])[0].ravel()[0]))
            return time.perf_counter() - t0

        t1 = min(timed(run1) for _ in range(3))
        t2 = min(timed(run2) for _ in range(3))
        dt = (t2 - t1) / (k2 - k1)
        print(f"{name}: {dt*1000:.2f} ms/micro-step "
              f"({k2 - k1} steps differenced)", flush=True)


if __name__ == "__main__":
    main()
