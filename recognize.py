#!/usr/bin/env python
"""Transcribe audio files with a trained checkpoint.

    python recognize.py <hparams.yaml> --ckpt_dir results/.../save \
        audio1.wav audio2.flac [--beam 0|N] [--streaming] [--s2s]

Decodes with greedy CTC (--beam 0), on-device CTC beam search (--beam N),
chunked streaming greedy (--streaming), or the joint CTC/attention beam
through the S2S decoder (--s2s; reference behavior: the test_searcher
applied to any batch, /root/reference/train_S2S.py:387-394) with optional
LM shallow fusion when `decode.lm_path` is configured. Prints one line
per file: <path>\t<transcript>.
"""

from __future__ import annotations

import argparse
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("audio", nargs="+")
    p.add_argument("--ckpt_dir", default="",
                   help="experiment save dir (top-k averaged restore)")
    p.add_argument("--torch_ckpt", default="",
                   help="reference PyTorch model.ckpt to import instead "
                        "of --ckpt_dir (models/torch_import.py; the "
                        "reference Pretrainer path made executable)")
    p.add_argument("--torch_normalizer", default="",
                   help="reference normalizer.ckpt (glob_mean/glob_std) "
                        "to import alongside --torch_ckpt")
    p.add_argument("--tokenizer", default="")
    p.add_argument("--beam", type=int, default=0)
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--s2s", action="store_true",
                   help="joint CTC/attention beam via the S2S decoder "
                        "(requires an S2S config; uses decode.* weights)")
    p.add_argument("--chunk_frames", type=int, default=64)
    p.add_argument("--timestamps", action="store_true",
                   help="also print greedy-aligned word times, one "
                        "'start\\tend\\tconf\\tword' line per word (CTC "
                        "path only)")
    p.add_argument("--batch", type=int, default=1,
                   help="offline CTC path: decode files in "
                        "duration-sorted batches of this size (wav "
                        "lengths bucket to 1 s multiples so shapes "
                        "recompile rarely) — the throughput mode")
    args, extra = p.parse_known_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamba_asr_tpu.configs.loader import load_config, parse_overrides
    from mamba_asr_tpu.data.audio import read_audio
    from mamba_asr_tpu.data.tokenizer import load_tokenizer
    from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search
    from mamba_asr_tpu.decoding.ctc_greedy import (
        ctc_greedy_decode,
        tokens_to_lists,
    )
    from mamba_asr_tpu.cli import restore_asr_state
    from mamba_asr_tpu.training.trainer import make_eval_step

    cfg = load_config(args.config, parse_overrides(extra))
    tok_path = args.tokenizer or f"{cfg.output_folder}/tokenizer_{cfg.data.tokenizer_type}.json"
    tokenizer = load_tokenizer(tok_path)
    model, state = restore_asr_state(
        cfg, ckpt_dir=args.ckpt_dir, torch_ckpt=args.torch_ckpt,
        torch_normalizer=args.torch_normalizer,
    )

    if args.streaming:
        from mamba_asr_tpu.models.streaming import StreamingASRSession

        for path in args.audio:
            wav, sr = read_audio(path)
            sess = StreamingASRSession(
                model, {"params": state.params}, cfg.frontend,
                normalizer=state.normalizer,
                chunk_frames=args.chunk_frames,
            )
            ids = []
            step = args.chunk_frames * cfg.frontend.hop
            for off in range(0, len(wav), step):
                ids += sess.feed(wav[None, off : off + step])[0]
            # Flush the remaining center-framing frames, canonical-pad
            # the feature stream to a downsample multiple, and flush the
            # conv frontend's lookahead: the streamed transcript equals
            # the offline greedy decode on the canonically padded feats
            # for ALL frame counts (causal config) — see
            # StreamingASRSession._canonical_pad_frames.
            ids += sess.finish()[0]
            print(f"{path}\t{tokenizer.decode(ids)}")
        return

    eval_step = make_eval_step(model, cfg.frontend)

    if args.s2s:
        if cfg.model.num_decoder_layers <= 0:
            raise SystemExit("--s2s needs a config with decoder layers")
        from mamba_asr_tpu.cli import load_lm
        from mamba_asr_tpu.decoding.s2s_beam import (
            S2SBeamSearcher,
            strip_special,
        )

        d = cfg.decode
        lm_model, lm_params = load_lm(cfg, tokenizer)
        searcher = S2SBeamSearcher(
            model,
            beam_size=args.beam or d.s2s_test_beam_size,
            ctc_weight=d.ctc_weight_decode,
            ctc_candidates=d.ctc_candidates,
            lm_weight=d.lm_weight if lm_model is not None else 0.0,
            temperature=d.temperature,
            temperature_lm=d.temperature_lm,
            length_normalization=d.length_normalization,
            max_decode_ratio=d.max_decode_ratio,
            min_decode_ratio=d.min_decode_ratio,
            lm_model=lm_model,
        )
        for path in args.audio:
            wav, sr = read_audio(path)
            batch = {
                "wav": jnp.asarray(wav)[None],
                "wav_lens": jnp.array([len(wav)], jnp.int32),
                "tokens_bos": jnp.zeros((1, 4), jnp.int32),
            }
            out = eval_step(state.params, state.normalizer, batch)
            toks, lens, _ = searcher(
                {"params": state.params}, out["enc_out"],
                out["enc_lengths"], ctc_log_probs=out["ctc_log_probs"],
                lm_params=lm_params,
            )
            ids = strip_special(np.array(toks), np.array(lens))[0]
            print(f"{path}\t{tokenizer.decode(ids)}")
        return

    # Offline CTC path, batched: duration-sorted groups, wav lengths
    # padded to 1 s multiples (compile-once per (B, bucket) shape),
    # short groups row-padded to the full batch. --batch 1 is the
    # single-file special case of the same loop.
    wavs = {}
    for path in args.audio:
        wavs[path], _ = read_audio(path)
    ordered = sorted(args.audio, key=lambda p: len(wavs[p]))
    results = {}
    bucket = cfg.frontend.sample_rate  # 1 s
    for i in range(0, len(ordered), args.batch):
        group = ordered[i:i + args.batch]
        max_len = max(len(wavs[p]) for p in group)
        pad_len = -(-max_len // bucket) * bucket
        wav_mat = np.zeros((args.batch, pad_len), np.float32)
        wav_lens = np.ones((args.batch,), np.int32)  # padded rows: 1
        for r, p in enumerate(group):
            wav_mat[r, : len(wavs[p])] = wavs[p]
            wav_lens[r] = len(wavs[p])
        batch = {
            "wav": jnp.asarray(wav_mat),
            "wav_lens": jnp.asarray(wav_lens),
            "tokens_bos": jnp.zeros((args.batch, 4), jnp.int32),
        }
        out = eval_step(state.params, state.normalizer, batch)
        if args.beam > 0:
            toks, lens = ctc_beam_search(
                out["ctc_log_probs"], out["enc_lengths"],
                beam_size=args.beam,
                beam_prune_logp=cfg.decode.beam_prune_logp,
                token_prune_min_logp=cfg.decode.token_prune_min_logp,
            )
        else:
            toks, lens = ctc_greedy_decode(
                out["ctc_log_probs"], out["enc_lengths"]
            )
        id_lists = tokens_to_lists(np.array(toks), np.array(lens))
        times = None
        if args.timestamps:
            from mamba_asr_tpu.decoding.ctc_greedy import (
                ctc_greedy_decode_with_times,
            )

            times = jax.device_get(
                ctc_greedy_decode_with_times(
                    out["ctc_log_probs"], out["enc_lengths"]
                )
            )
        for r, p in enumerate(group):
            results[p] = (id_lists[r], times, r)

    for path in args.audio:
        ids, times, r = results[path]
        print(f"{path}\t{tokenizer.decode(ids)}")
        if times is not None:
            from mamba_asr_tpu.decoding.timestamps import (
                encoder_frame_seconds,
                word_timestamps,
            )

            t_ids, t_lens, ons, offs, confs = times
            n = int(t_lens[r])
            for word, start, end, conf in word_timestamps(
                t_ids[r, :n], ons[r, :n], offs[r, :n], tokenizer,
                encoder_frame_seconds(cfg.frontend, cfg.model),
                confs=confs[r, :n],
            ):
                print(f"{start:.3f}\t{end:.3f}\t{conf:.3f}\t{word}")


if __name__ == "__main__":
    main()
