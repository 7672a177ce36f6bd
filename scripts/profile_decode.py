#!/usr/bin/env python
"""Micro-profile the S2S beam step's components in isolation on the
current accelerator: CTC scorer score/select, LM step (ancestor-mask
kernel), ASR decode_step, mask build, and top-k bookkeeping.

Each piece is jitted with a loop of ITERS applications inside one
lax.fori_loop (single dispatch; the tunnel's ~250 ms per-call cost would
otherwise swamp ms-scale kernels), then timed steady-state.

    python scripts/profile_decode.py [--seconds 60 --beam 66]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 20


def timed(name, fn, *args):
    import jax

    jitted = jax.jit(fn)
    t0 = time.perf_counter()
    out = jitted(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        times.append(time.perf_counter() - t0)
    per = min(times) / ITERS * 1000
    print(f"{name:28s} {per:8.3f} ms/step   (compile {compile_s:.1f}s)",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--beam", type=int, default=66)
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument("--s-cache", type=int, default=320)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.decoding.ctc_prefix_scorer import (
        CTCPrefixScorer,
        CTCPrefixState,
    )
    from mamba_asr_tpu.models.lm import TransformerLM
    from mamba_asr_tpu.ops.pallas.beam_attention import build_anc_mask

    k = args.beam
    v = args.vocab
    t = int(args.seconds * 100) // 4
    s_cache = args.s_cache
    n = k
    rng = np.random.default_rng(0)
    print(f"beam {k} vocab {v} T {t} s_cache {s_cache} "
          f"[{jax.devices()[0].device_kind}]", flush=True)

    def loop(body, init):
        def f(*args_):
            def it(i, c):
                return body(c, i)
            return jax.lax.fori_loop(0, ITERS, it, init(*args_))
        return f

    # --- CTC scorer -------------------------------------------------
    lp = jnp.asarray(
        np.log(rng.dirichlet(np.ones(v) * 0.05, size=(1, t)) + 1e-9),
        jnp.float32,
    )
    scorer = CTCPrefixScorer(lp, jnp.array([t]), k)
    state0 = scorer.init_state()

    def score_body(carry, i):
        st = carry
        scores, aux = scorer.score(st)
        # fold scores back so nothing is dead-code-eliminated
        return CTCPrefixState(
            r_nb=st.r_nb + 0.0 * scores[:, :1], r_b=st.r_b,
            psi=st.psi + 0.0 * scores[:, 0], last=st.last,
        )

    timed("ctc.score (full vocab)", loop(score_body, lambda s: s), state0)

    toks = jnp.asarray(rng.integers(3, v, size=(n,)), jnp.int32)
    reorder = jnp.asarray(rng.integers(0, n, size=(n,)), jnp.int32)
    aux0 = {"psi": jnp.zeros((n, v))}

    def select_body(carry, i):
        return scorer.select(carry, aux0, toks, reorder)

    timed("ctc.select", loop(select_body, lambda s: s), state0)

    # --- LM step (ancestor kernel) -----------------------------------
    lm = TransformerLM(vocab_size=v, dtype=jnp.bfloat16)
    lm_params = jax.jit(lm.init)(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32)
    )
    lm_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, lm_params
    )
    cache0 = lm.init_cache(n, s_cache, beam_gather=True)
    anc = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (s_cache, 1))

    def lm_body(carry, i):
        cache, tok = carry
        pos = jnp.minimum(i + 128, s_cache - 1)  # mid-prefix position
        logits, cache = lm.apply(
            lm_params, tok, cache=cache, cache_index=pos, anc=anc
        )
        return cache, jnp.argmax(logits, -1).astype(jnp.int32)

    timed("lm.step (12L, kernel)", loop(lm_body, lambda c, t_: (c, t_)),
          cache0, toks)

    # Same step with the attention forced to the O(N*S) gather-at-read
    # fallback (breaking J_CHUNK divisibility makes beam_attention()
    # dispatch to beam_attention_gather, NOT the XLA mask-plane oracle).
    import mamba_asr_tpu.ops.pallas.beam_attention as _ba

    old_chunk = _ba.J_CHUNK
    _ba.J_CHUNK = s_cache + 1
    try:
        timed("lm.step (12L, gather attn)",
              loop(lm_body, lambda c, t_: (c, t_)), cache0, toks)
    finally:
        _ba.J_CHUNK = old_chunk


    # --- beam attention in isolation (one layer's worth) ---------------
    from mamba_asr_tpu.ops.pallas.beam_attention import (
        beam_attention_pallas,
        beam_attention_xla,
    )

    h, dh = 12, 64
    q1 = jnp.asarray(rng.normal(size=(n, h, dh)), jnp.bfloat16)
    kb = jnp.asarray(rng.normal(size=(h, s_cache, n, dh)), jnp.bfloat16)
    vb = jnp.asarray(rng.normal(size=(h, s_cache, n, dh)), jnp.bfloat16)
    m128 = build_anc_mask(anc, 128, n, jnp.bfloat16)

    def battn_body(impl, plane):
        def body(carry, i):
            o = impl(carry, kb, vb, plane)
            return carry + 0.0 * o.astype(carry.dtype)
        return body

    timed(
        "beam_attn pallas (1L, pos128)",
        loop(battn_body(
            lambda q_, k_, v_, a_: beam_attention_pallas(q_, k_, v_, a_, 128),
            anc,
        ), lambda q_: q_),
        q1,
    )
    timed(
        "beam_attn xla    (1L, pos128)",
        loop(battn_body(beam_attention_xla, m128), lambda q_: q_),
        q1,
    )

    # --- top-k + token bookkeeping ------------------------------------
    total = jnp.asarray(rng.normal(size=(n, v)), jnp.float32)
    tokens_buf = jnp.zeros((n, s_cache), jnp.int32)

    def topk_body(carry, i):
        buf, scores = carry
        cand = (scores[:, None] * 0.0 + total.reshape(1, n, v))[0]
        cand = (scores[:, None] + cand).reshape(1, k * v)
        top_val, top_idx = jax.lax.top_k(cand, k)
        parent = (top_idx // v).reshape(n)
        tok = (top_idx % v).astype(jnp.int32).reshape(n)
        buf = buf[parent].at[:, jnp.minimum(i, s_cache - 1)].set(tok)
        return buf, top_val.reshape(n)

    timed("top-k + token reorder", loop(topk_body, lambda b, s: (b, s)),
          tokens_buf, jnp.zeros((n,)))

    # --- ASR decode step (mamba decoder) ------------------------------
    from mamba_asr_tpu.configs.loader import load_config
    from mamba_asr_tpu.models.asr import ASRModel

    cfg = load_config("hparams/S2S/conmambamamba_large.yaml")
    model = ASRModel(cfg.model)
    feats = jnp.zeros((1, 64, cfg.frontend.n_mels), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), feats, jnp.array([64]),
        jnp.array([[1, 3, 4]], jnp.int32),
    )
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params
    )
    enc = jnp.asarray(rng.normal(size=(n, t, cfg.model.d_model)),
                      jnp.bfloat16)
    dec_cache = model.apply(params, n, s_cache,
                            method=ASRModel.init_decoder_cache)
    dec_cache = model.apply(params, enc, dec_cache,
                            jnp.full((n,), t, jnp.int32),
                            method=ASRModel.prime_decoder_cache)

    def dec_body(carry, i):
        cache, tok = carry
        logits, cache = model.apply(
            params, tok, jnp.minimum(i + 1, s_cache - 1), cache,
            method=ASRModel.decode_step,
        )
        return cache, jnp.argmax(logits, -1).astype(jnp.int32)

    timed("asr.decode_step (mamba)", loop(dec_body, lambda c, t_: (c, t_)),
          dec_cache, toks)


if __name__ == "__main__":
    main()
