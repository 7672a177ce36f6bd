#!/usr/bin/env python
"""Reference-scale S2S beam-decode benchmark on the current accelerator.

Proves the shipped test-decode contract at real shapes: beam 66 +
TransformerLM shallow fusion (weight 0.6, temperature 1.15) + CTC prefix
scoring (weight 0.4) over the BPE-5000 vocab, exactly as configured by
`hparams/S2S/conmambamamba_large.yaml` (reference behavior:
/root/reference/hparams/S2S/conmamba_large.yaml:331-373, invoked at
/root/reference/train_S2S.py:382-394).

Builds ConMambaMamba Large with random params plus the 12-layer d768 LM,
synthesizes `--seconds` of audio per utterance (60 s -> enc T = 1500),
runs the full encoder forward and the single-dispatch jitted beam search,
and reports compile time, steady-state decode wall-clock, and decode
RTFx (= audio seconds / decode seconds). Random params are worst-case
for the search: eos rarely wins, so the while-loop runs to the full
s_max cap — real checkpoints terminate earlier and decode faster.

    python scripts/bench_decode.py [--seconds 60 --batch 1 --beam 66]
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
    p.add_argument("--seconds", type=float, default=60.0)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--beam", type=int, default=66)
    p.add_argument("--max-steps", type=int, default=256)
    p.add_argument("--config", default="hparams/S2S/conmambamamba_large.yaml")
    p.add_argument("--no-lm", action="store_true")
    p.add_argument("--ablate", action="store_true",
                   help="also time no-lm / no-ctc / bare variants")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.configs.loader import load_config
    from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher
    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.models.lm import TransformerLM
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram
    from mamba_asr_tpu.training.trainer import num_params

    cfg = load_config(args.config)
    model = ASRModel(cfg.model)
    fe = cfg.frontend
    d = cfg.decode

    b = args.batch
    n = int(args.seconds * fe.sample_rate)
    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.1, size=(b, n)).astype(np.float32)

    feat_fn = jax.jit(
        lambda w: log_mel_spectrogram(
            w, sample_rate=fe.sample_rate, n_fft=fe.n_fft, n_mels=fe.n_mels,
            win_length_ms=fe.win_length_ms, hop_length_ms=fe.hop_length_ms,
        )
    )
    feats = feat_fn(jnp.asarray(wav))
    t_frames = feats.shape[1]
    lens = jnp.full((b,), t_frames, jnp.int32)
    print(f"audio {args.seconds:.0f}s x {b} -> {t_frames} frames "
          f"-> enc T ~ {t_frames // 4}", flush=True)

    # Params are shape-independent in T: init on a short clip (jitted —
    # eager init costs one ~250 ms tunnel dispatch per op), run the
    # jitted forward at full length.
    init_feats = jnp.zeros((1, 64, fe.n_mels), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), init_feats, jnp.array([64]),
        jnp.array([[1, 3, 4]], jnp.int32),
    )
    jax.block_until_ready(params)
    print(f"ASR init ({num_params(params)/1e6:.1f}M params) "
          f"in {time.perf_counter()-t0:.1f}s", flush=True)

    lm = lm_params = None
    if not args.no_lm:
        lm = TransformerLM(vocab_size=cfg.model.vocab_size,
                           dtype=jnp.dtype(d.lm_dtype))
        t0 = time.perf_counter()
        lm_params = jax.jit(lm.init)(
            jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32)
        )
        jax.block_until_ready(lm_params)
        print(f"LM init ({num_params(lm_params)/1e6:.1f}M params) "
              f"in {time.perf_counter()-t0:.1f}s", flush=True)

    fwd = jax.jit(lambda p, f, l: model.apply(p, f, l))
    # First execution of a fresh executable costs ~60 s over the axon
    # tunnel (one-time backend warmup) — time the steady state only,
    # synced by a device->host value fetch (block_until_ready returns
    # early over this tunnel).
    t0 = time.perf_counter()
    out = fwd(params, feats, lens)
    _ = float(np.asarray(out["ctc_log_probs"][0, 0, 0]))
    print(f"encoder fwd compile+warmup {time.perf_counter()-t0:.1f}s",
          flush=True)
    enc_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(params, feats, lens)
        _ = float(np.asarray(out["ctc_log_probs"][0, 0, 0]))
        enc_times.append(time.perf_counter() - t0)
    enc_dev = min(enc_times)
    print(f"encoder fwd steady {enc_dev*1000:.1f} ms "
          f"(enc-RTFx {b*args.seconds/enc_dev:,.0f})", flush=True)

    def run_variant(tag, ctc_w, lm_w, lm_mdl, lm_p):
        searcher = S2SBeamSearcher(
            model,
            beam_size=args.beam,
            ctc_weight=ctc_w,
            ctc_candidates=d.ctc_candidates,
            lm_weight=lm_w,
            temperature=d.temperature,
            temperature_lm=d.temperature_lm,
            length_normalization=d.length_normalization,
            max_decode_ratio=d.max_decode_ratio,
            min_decode_ratio=d.min_decode_ratio,
            lm_model=lm_mdl,
            max_steps_cap=args.max_steps,
        )
        clp = out["ctc_log_probs"] if ctc_w > 0 else None
        t0 = time.perf_counter()
        toks, hyplens, scores = searcher(
            params, out["enc_out"], out["enc_lengths"],
            ctc_log_probs=clp, lm_params=lm_p,
        )
        _ = np.asarray(scores)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            toks, hyplens, scores = searcher(
                params, out["enc_out"], out["enc_lengths"],
                ctc_log_probs=clp, lm_params=lm_p,
            )
            _ = np.asarray(scores)
            times.append(time.perf_counter() - t0)
        decode_s = min(times)
        steps = int(np.asarray(hyplens).max())
        audio_s = b * args.seconds
        kind = jax.devices()[0].device_kind
        print(
            f"[{tag}] beam {args.beam} vocab {cfg.model.vocab_size}: "
            f"compile+warmup {compile_s:.1f}s, decode {decode_s:.2f}s "
            f"({steps} steps, {decode_s/max(steps,1)*1000:.1f} ms/step), "
            f"decode-RTFx {audio_s/decode_s:.1f}, "
            f"full-pipeline-RTFx {audio_s/(decode_s+enc_dev):.1f} [{kind}]",
            flush=True,
        )
        return decode_s

    lm_w = 0.0 if args.no_lm else d.lm_weight
    run_variant("full", d.ctc_weight_decode, lm_w, lm, lm_params)
    if args.ablate:
        run_variant("no-lm", d.ctc_weight_decode, 0.0, None, None)
        run_variant("no-ctc", 0.0, lm_w, lm, lm_params)
        run_variant("bare", 0.0, 0.0, None, None)


if __name__ == "__main__":
    main()
