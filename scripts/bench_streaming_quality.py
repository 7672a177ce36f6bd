#!/usr/bin/env python
"""Quantify streaming-vs-offline quality for the BIDIRECTIONAL encoder.

The causal configuration streams exactly (tested bit-exact); the
bidirectional ConMamba streams through a documented compromise — the
backward SSM pass is chunk-local (models/mamba.py BiMamba streaming) —
so its divergence from the offline forward is a function of chunk size.
This script measures that operating curve on a trained checkpoint:

  per chunk size: mean/max |ctc log-prob delta|, frame argmax agreement,
  and WER of the streamed transcript against the OFFLINE transcript
  (streaming regression, not absolute WER).

    python scripts/bench_streaming_quality.py <hparams.yaml> \
        --ckpt_dir <exp>/save --corpus <LibriSpeech-layout dir> \
        [--chunks 32,64,128,256]

Reference context: the reference ships streaming contexts for Conformer
only and documents-but-never-implements ConMamba streaming
(/root/reference/modules/Conformer.py:1632-1717, SURVEY.md §3.3); this
framework streams both, and this script supplies the quality bound a
deployment needs to pick the chunk size.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--corpus", required=True,
                    help="dir with <split>/spk/chap/*.wav (LibriSpeech layout)")
    ap.add_argument("--split", default="test-clean")
    ap.add_argument("--chunks", default="32,64,128,256",
                    help="chunk sizes in feature frames (10 ms each)")
    ap.add_argument("--max_utts", type=int, default=8)
    args, extra = ap.parse_known_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.configs.loader import load_config, parse_overrides
    from mamba_asr_tpu.data.audio import read_audio
    from mamba_asr_tpu.decoding.ctc_greedy import (
        ctc_greedy_decode,
        tokens_to_lists,
    )
    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.models.streaming import StreamingASRSession
    from mamba_asr_tpu.training.checkpoint import CheckpointManager
    from mamba_asr_tpu.training.metrics import edit_distance_counts
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
    state = init_train_state(model, tx, cfg.frontend, jax.random.PRNGKey(0),
                             dummy)
    mgr = CheckpointManager(args.ckpt_dir, keep=cfg.train.keep_checkpoints)
    restored = mgr.restore_averaged_raw(k=cfg.train.avg_checkpoints,
                                        min_key="WER")
    if restored is None:
        raise SystemExit(f"no checkpoints in {args.ckpt_dir}")
    from flax import serialization

    avg_params, raw = restored
    state = state.replace(
        params=serialization.from_state_dict(state.params, avg_params),
        normalizer=serialization.from_state_dict(
            state.normalizer, raw["normalizer"]
        ),
    )

    wavs = sorted(glob.glob(
        os.path.join(args.corpus, args.split, "*", "*", "*.wav")
    ))[: args.max_utts]
    if not wavs:
        raise SystemExit(f"no wavs under {args.corpus}/{args.split}")
    eval_step = make_eval_step(model, cfg.frontend)

    for chunk in [int(c) for c in args.chunks.split(",")]:
        deltas, agrees, errs, n_ref = [], [], 0, 0
        for path in wavs:
            wav, _ = read_audio(path)
            batch = {
                "wav": jnp.asarray(wav)[None],
                "wav_lens": jnp.array([len(wav)], jnp.int32),
                "tokens_bos": np.zeros((1, 4), np.int32),
            }
            out = eval_step(state.params, state.normalizer, batch)
            off_lp = np.array(out["ctc_log_probs"])[0]
            off_toks, off_lens = ctc_greedy_decode(
                out["ctc_log_probs"], out["enc_lengths"]
            )
            off_ids = tokens_to_lists(np.array(off_toks),
                                      np.array(off_lens))[0]

            sess = StreamingASRSession(
                model, {"params": state.params}, cfg.frontend,
                normalizer=state.normalizer, chunk_frames=chunk,
                collect_log_probs=True,
            )
            ids = []
            step = chunk * cfg.frontend.hop
            for off in range(0, len(wav), step):
                ids += sess.feed(wav[None, off: off + step])[0]
            ids += sess.finish()[0]
            st_lp = np.concatenate(
                [l[0] for l in sess.log_probs], axis=0
            )
            t = min(len(off_lp), len(st_lp))
            d = np.abs(st_lp[:t] - off_lp[:t])
            deltas.append((d.mean(), d.max()))
            agrees.append(
                (st_lp[:t].argmax(-1) == off_lp[:t].argmax(-1)).mean()
            )
            s_, i_, d_ = edit_distance_counts(off_ids, ids)
            errs += s_ + i_ + d_
            n_ref += max(len(off_ids), 1)
        mean_d = float(np.mean([a for a, _ in deltas]))
        max_d = float(np.max([b for _, b in deltas]))
        print(json.dumps({
            "chunk_frames": chunk,
            "chunk_ms": chunk * 10,
            "mean_abs_logprob_delta": round(mean_d, 4),
            "max_abs_logprob_delta": round(max_d, 3),
            "frame_argmax_agreement": round(float(np.mean(agrees)), 4),
            "wer_vs_offline_pct": round(100.0 * errs / n_ref, 2),
            "utts": len(wavs),
        }), flush=True)


if __name__ == "__main__":
    main()
