#!/usr/bin/env python
"""Export a trained checkpoint to a portable StableHLO bundle.

    python scripts/export_model.py <hparams.yaml> --ckpt_dir results/.../save \
        --out exported_model/ --batches 1,8 --seconds 10,20,30 \
        [--platforms tpu] [--allow_custom_calls tpu_custom_call] \
        [--torch_ckpt model.ckpt --torch_normalizer normalizer.ckpt]

Produces one serialized StableHLO function per (batch, seconds)
bucket plus params.msgpack + manifest.json (see
mamba_asr_tpu/serving/export.py). A worker then transcribes with no
model code:

    from mamba_asr_tpu.serving.export import ExportedASR
    asr = ExportedASR("exported_model/")
    ctc_log_probs, enc_lengths = asr(wav, wav_lens)
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt_dir", default="")
    p.add_argument("--torch_ckpt", default="")
    p.add_argument("--torch_normalizer", default="")
    p.add_argument("--batches", default="1,8",
                   help="comma-separated batch sizes to export")
    p.add_argument("--seconds", default="10,20,30",
                   help="comma-separated max audio seconds per bucket")
    p.add_argument("--platforms", default="",
                   help="comma-separated lowering platforms "
                        "(default: the session backend)")
    p.add_argument("--allow_custom_calls", default="",
                   help="comma-separated custom-call targets to exempt "
                        "from the export stability check (TPU Pallas "
                        "kernels need tpu_custom_call here)")
    p.add_argument("--s2s", action="store_true",
                   help="export the full joint CTC/attention beam "
                        "search surface (S2S configs; includes the "
                        "fusion LM when decode.lm_path is set)")
    p.add_argument("--beam", type=int, default=0,
                   help="--s2s beam size override (default: the "
                        "config's test beam)")
    args, extra = p.parse_known_args()

    from mamba_asr_tpu.cli import restore_asr_state
    from mamba_asr_tpu.configs.loader import load_config, parse_overrides
    from mamba_asr_tpu.serving.export import (
        export_ctc_bundle,
        export_s2s_bundle,
    )

    cfg = load_config(args.config, parse_overrides(extra))
    model, state = restore_asr_state(
        cfg, ckpt_dir=args.ckpt_dir, torch_ckpt=args.torch_ckpt,
        torch_normalizer=args.torch_normalizer,
    )
    sr = cfg.frontend.sample_rate
    buckets = [
        (int(b), int(float(s) * sr))
        for b in args.batches.split(",")
        for s in args.seconds.split(",")
    ]
    platforms = args.platforms.split(",") if args.platforms else None
    allow = (
        args.allow_custom_calls.split(",")
        if args.allow_custom_calls else ()
    )
    if args.s2s:
        if cfg.model.num_decoder_layers <= 0:
            raise SystemExit("--s2s needs a config with decoder layers")
        from mamba_asr_tpu.cli import load_lm
        from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher

        d = cfg.decode
        # No tokenizer needed: load_lm sizes the LM from the config, so
        # --torch_ckpt imports work without {output_folder}/tokenizer_*.json.
        lm_model, lm_params = load_lm(cfg)
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
        manifest = export_s2s_bundle(
            model, state.params, state.normalizer, cfg.frontend,
            searcher, args.out, buckets, platforms=platforms,
            allow_custom_calls=allow, lm_params=lm_params,
        )
    else:
        manifest = export_ctc_bundle(
            model, state.params, state.normalizer, cfg.frontend,
            args.out, buckets, platforms=platforms,
            allow_custom_calls=allow,
        )
    print(f"exported {len(manifest['buckets'])} buckets -> {args.out}")


if __name__ == "__main__":
    main()
