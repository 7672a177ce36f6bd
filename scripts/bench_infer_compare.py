#!/usr/bin/env python
"""Inference RTFx vs clip length: ConMamba / Conformer / Branchformer.

Adjudicates the reference's inference claim — "2-4x faster inference
than attention-based models for long sequences"
(/root/reference/README.md:80) — on TPU, with the same dispatch-free
measurement discipline as bench.py (all iterations inside one jitted
lax.scan; sync via device->host fetches; first run discarded).

    python scripts/bench_infer_compare.py [--seconds 15 60] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_params(cfg):
    """Params are length-independent: init ONCE per config on tiny
    shapes, under jit (eager init dispatches one op at a time over the
    tunnel — ~3x slower even for small models, see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.models.asr import ASRModel

    model = ASRModel(cfg)
    feats0 = jnp.zeros((1, 32, cfg.n_mels), jnp.float32)
    lens0 = jnp.full((1,), 32, jnp.int32)
    return model, jax.jit(model.init)(jax.random.PRNGKey(0), feats0, lens0)


def bench(name, model, params, batch, seconds, iters=8):
    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram

    sr = 16000
    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(0, 0.1, size=(batch, n)).astype(np.float32))
    wav_lens = jnp.full((batch,), n, jnp.int32)

    def infer(w):
        feats = log_mel_spectrogram(w, n_fft=400)
        flens = jnp.minimum(wav_lens // 160 + 1, feats.shape[1])
        out = model.apply(params, feats, flens)
        return ctc_greedy_decode(out["ctc_log_probs"], out["enc_lengths"])

    @jax.jit
    def infer_k(w):
        def body(carry, _):
            toks, lens = infer(carry)
            return carry + lens[0].astype(carry.dtype) * 1e-30, (toks, lens)

        _, (toks, lens) = jax.lax.scan(body, w, jnp.arange(iters))
        return toks[-1], lens[-1]

    toks, lens = infer_k(wav)  # compile + backend warmup
    _ = np.asarray(lens)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, lens = infer_k(wav)
        _ = (np.asarray(toks), np.asarray(lens))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    rtfx = batch * seconds * iters / dt
    print(json.dumps({
        "config": name, "seconds": seconds, "batch": batch,
        "ms_per_batch": round(dt / iters * 1e3, 2),
        "rtfx": round(rtfx, 1),
    }), flush=True)
    return rtfx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, nargs="+", default=[15.0, 60.0])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--only", type=str, default=None)
    args = p.parse_args()

    from mamba_asr_tpu.models.asr import ASRConfig
    from mamba_asr_tpu.models.mamba import MambaConfig

    configs = [
        ("conmamba_large_ctc", ASRConfig(
            vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
            num_decoder_layers=0, d_ffn=1024, encoder_module="conmamba",
            dropout=0.0, compute_dtype="bfloat16", mamba=MambaConfig(),
            scan_layers=True,
        )),
        ("conformer_large_ctc", ASRConfig(
            vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
            num_decoder_layers=0, d_ffn=1024, encoder_module="conformer",
            dropout=0.0, compute_dtype="bfloat16", scan_layers=True,
        )),
        ("branchformer_large_ctc", ASRConfig(
            vocab_size=31, d_model=256, nhead=4, num_encoder_layers=18,
            num_decoder_layers=0, encoder_module="branchformer",
            csgu_linear_units=2048, dropout=0.0, compute_dtype="bfloat16",
            scan_layers=True,
        )),
    ]
    results = {}
    for name, cfg in configs:
        if args.only and args.only not in name:
            continue
        model, params = make_params(cfg)
        for sec in args.seconds:
            results[(name, sec)] = bench(name, model, params, args.batch,
                                         sec, args.iters)
    for sec in args.seconds:
        cm = results.get(("conmamba_large_ctc", sec))
        cf = results.get(("conformer_large_ctc", sec))
        if cm and cf:
            print(f"# {sec:.0f}s: ConMamba/Conformer inference speed "
                  f"ratio = {cm / cf:.2f}x")


if __name__ == "__main__":
    main()
