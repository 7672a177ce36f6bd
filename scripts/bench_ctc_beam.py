#!/usr/bin/env python
"""On-device CTC prefix beam search at the reference test scale.

The CTC recipes' test-time decoder is beam 100 with logp pruning
-12 / -1.2 (/root/reference/hparams/CTC/conmamba_large.yaml:232-237).
This benchmarks the single-dispatch jitted search at T ~ 750-1500 with
REALISTIC emission density: either logits from a trained checkpoint
(--ckpt_dir + --corpus) or a synthetic peaked-emission distribution
(--synthetic: per-frame argmax mass ~0.8, long blank runs — the shape
real acoustic models produce, unlike uniform noise which explodes the
prefix count).

    python scripts/bench_ctc_beam.py [--seconds 30 --beam 100] \
        [--ckpt_dir <save> --corpus <dir> --config <yaml>] [--synthetic]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_log_probs(t: int, v: int, seed: int = 0) -> np.ndarray:
    """Peaked emissions like a trained model's: blank-dominated frames
    with token bursts every few frames."""
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 1.0, size=(t, v)).astype(np.float32)
    # Token bursts: every ~6 frames, 2-3 frames of one confident token.
    pos = 0
    while pos < t:
        run = int(rng.integers(2, 4))
        tok = int(rng.integers(1, v))
        logits[pos: pos + run, tok] += 6.0
        pos += run + int(rng.integers(2, 6))
    # Elsewhere blank dominates.
    logits[:, 0] += 3.0
    x = logits - logits.max(-1, keepdims=True)
    lse = np.log(np.exp(x).sum(-1, keepdims=True))
    return x - lse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--beam", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--vocab", type=int, default=31)
    ap.add_argument("--config", default="hparams/CTC/conmamba_small.yaml")
    ap.add_argument("--ckpt_dir", default="")
    ap.add_argument("--corpus", default="")
    ap.add_argument("--split", default="test-clean")
    args, extra = ap.parse_known_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search

    t_enc = int(args.seconds * 100) // 4  # 10 ms frames, 4x downsample
    if args.ckpt_dir:
        import glob

        from flax import serialization

        from mamba_asr_tpu.configs.loader import load_config, parse_overrides
        from mamba_asr_tpu.data.audio import read_audio
        from mamba_asr_tpu.models.asr import ASRModel
        from mamba_asr_tpu.training.checkpoint import CheckpointManager
        from mamba_asr_tpu.training.trainer import (
            init_train_state,
            make_eval_step,
            make_optimizer,
        )

        cfg = load_config(args.config, parse_overrides(extra))
        model = ASRModel(cfg.model)
        tx = make_optimizer(cfg.train)
        dummy = {
            "wav": np.zeros((1, 16000), np.float32),
            "wav_lens": np.array([16000], np.int32),
            "tokens_bos": np.zeros((1, 4), np.int32),
        }
        state = init_train_state(
            model, tx, cfg.frontend, jax.random.PRNGKey(0), dummy
        )
        mgr = CheckpointManager(args.ckpt_dir, keep=cfg.train.keep_checkpoints)
        avg_params, raw = mgr.restore_averaged_raw(
            k=cfg.train.avg_checkpoints, min_key="WER"
        )
        state = state.replace(
            params=serialization.from_state_dict(state.params, avg_params),
            normalizer=serialization.from_state_dict(
                state.normalizer, raw["normalizer"]
            ),
        )
        wavs = sorted(glob.glob(os.path.join(
            args.corpus, args.split, "*", "*", "*.wav"
        )))
        # Tile real utterances up to --seconds of audio so the emission
        # density is a trained model's at reference-scale T.
        wav = np.concatenate(
            [read_audio(w)[0] for w in wavs], axis=0
        )
        need = int(args.seconds * cfg.frontend.sample_rate)
        wav = np.tile(wav, need // len(wav) + 1)[:need]
        eval_step = make_eval_step(model, cfg.frontend)
        out = eval_step(state.params, state.normalizer, {
            "wav": jnp.asarray(wav)[None].repeat(args.batch, 0),
            "wav_lens": jnp.full((args.batch,), len(wav), jnp.int32),
            "tokens_bos": np.zeros((args.batch, 4), np.int32),
        })
        lp = out["ctc_log_probs"]
        lens = out["enc_lengths"]
        t_enc = int(np.asarray(lens)[0])
        v = lp.shape[-1]
        src = "checkpoint"
    else:
        v = args.vocab
        lp = jnp.asarray(
            np.stack([
                synthetic_log_probs(t_enc, v, seed=i)
                for i in range(args.batch)
            ])
        )
        lens = jnp.full((args.batch,), t_enc, jnp.int32)
        src = "synthetic-peaked"

    fn = jax.jit(lambda l, n: ctc_beam_search(
        l, n, beam_size=args.beam,
        beam_prune_logp=-12.0, token_prune_min_logp=-1.2,
    ))
    t0 = time.perf_counter()
    toks, out_lens = fn(lp, lens)
    _ = np.asarray(toks)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        toks, out_lens = fn(lp, lens)
        _ = np.asarray(toks)
        times.append(time.perf_counter() - t0)
    dec = min(times)
    audio_s = args.batch * args.seconds
    kind = jax.devices()[0].device_kind
    print(
        f"[ctc-beam] {src}: beam {args.beam} vocab {v} T {t_enc} "
        f"batch {args.batch}: compile {compile_s:.1f}s, "
        f"decode {dec * 1000:.1f} ms/batch "
        f"({dec * 1000 / args.batch:.1f} ms/utt), "
        f"decode-RTFx {audio_s / dec:,.0f} [{kind}]",
        flush=True,
    )


if __name__ == "__main__":
    main()
