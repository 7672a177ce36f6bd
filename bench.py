#!/usr/bin/env python
"""Benchmark: inference RTFx (audio-seconds decoded per wall-second per
chip) of ConMamba Small CTC on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference reports inference RTF 0.05x on A100 at batch 32
(/root/reference/README/DEVICE_OPTIMIZATION_GUIDE.md:290-292), i.e.
RTFx == 20 audio-sec/sec. BASELINE.json's target is RTFx >= 100 per v5e
chip; vs_baseline is reported against the A100 reference number (20).

Pipeline measured: waveform -> log-mel -> ConMamba encoder -> CTC head ->
greedy decode (token ids + lengths), all inside one jitted function.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_RTFX = 20.0


def _fail_json(why: str) -> None:
    """Emit the scoreboard line as a STRUCTURED failure and exit fast.

    A dead tunnel must convert to parseable output, not an rc=124 after
    the driver's whole window (round-3 lesson: BENCH_r03.json recorded
    parsed=null because this script out-waited the driver)."""
    print(json.dumps({
        "metric": "inference_rtfx_conmamba_small_ctc",
        "value": 0.0,
        "unit": "audio-sec/sec/chip",
        "vs_baseline": 0.0,
        "error": why,
    }), flush=True)
    # os._exit: probe threads may be wedged in backend init and would
    # block a normal interpreter exit.
    os._exit(0)


def _watchdog(total_budget_s: float) -> None:
    """If anything after the probe (compile, first execution) wedges —
    e.g. the tunnel dies mid-run — still emit structured output well
    inside any plausible driver window."""
    def fire():
        time.sleep(total_budget_s)
        _fail_json(f"watchdog: run exceeded {total_budget_s:.0f}s")

    threading.Thread(target=fire, daemon=True).start()


def _wait_for_backend(max_wait_s: float = 360.0) -> None:
    """Bounded retry for device acquisition.

    A dead remote-backend tunnel makes the first device touch hang
    indefinitely (observed: multi-hour axon outages); probing in a
    killable daemon thread and retrying keeps a transient outage from
    silently eating the benchmark run. On exhaustion this emits the
    structured failure line and exits 0 — never rc=124.
    """
    import jax

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        result = {}

        def probe(out=result):
            try:
                out["n"] = len(jax.devices())
            except Exception as e:  # noqa: BLE001
                out["err"] = e

        # Daemon thread: a probe stuck in backend init must neither stall
        # this loop nor block interpreter exit (non-daemon pool threads
        # are joined at exit).
        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(timeout=90.0)
        if result.get("n", 0) >= 1:
            return
        why = type(result["err"]).__name__ if "err" in result else "timeout"
        print(f"# backend probe {attempt} failed: {why}",
              file=sys.stderr, flush=True)
        if time.time() + 90.0 > deadline:
            _fail_json(
                f"no accelerator became available in {max_wait_s:.0f}s "
                f"({attempt} probes; last: {why})"
            )
        time.sleep(30.0)


def main():
    _wait_for_backend()
    # Total budget must cover retries: one attempt costs up to ~150 s
    # compile + ~700 s first execution (worst observed warmup). A new
    # attempt only starts while >=900 s of budget remains, so the
    # watchdog cannot kill a retry that would have succeeded; 1740 s
    # total stays inside the driver's window (BENCH_r03's rc=124 came
    # from out-waiting it at 1800 s+).
    total_budget_s = 1740.0
    _watchdog(total_budget_s)
    t0 = time.time()
    # The remote-compile service occasionally 500s mid-run even when the
    # backend probe succeeds (observed 2026-08-19: "tpu_compile_helper
    # subprocess exit signal (15)") — transient infra, not a model error.
    # Retry the measurement while budget allows, then emit the
    # structured failure line.
    last = None
    attempt = 0
    while attempt == 0 or time.time() - t0 < total_budget_s - 900.0:
        attempt += 1
        try:
            _run()
        except Exception as e:  # noqa: BLE001
            last = f"{type(e).__name__}: {e}"
            print(f"# bench attempt {attempt} failed: {last[:300]}",
                  file=sys.stderr, flush=True)
            time.sleep(20.0)
    _fail_json(f"{attempt} bench attempts failed; last: {last[:500]}")


def _run():
    import jax
    import jax.numpy as jnp

    from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode
    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram

    cfg = ASRConfig(
        vocab_size=31, n_mels=80, d_model=144, nhead=4,
        num_encoder_layers=12, num_decoder_layers=0, d_ffn=1024,
        dropout=0.0, encoder_module="conmamba", kernel_size=31,
        compute_dtype="bfloat16",
        mamba=MambaConfig(d_state=16, expand=2, d_conv=4),
        scan_layers=True,
    )
    model = ASRModel(cfg)

    batch, seconds, sr = 32, 30.0, 16000
    n = int(seconds * sr)
    rng = np.random.default_rng(0)
    wav_np = rng.normal(0.0, 0.1, size=(batch, n)).astype(np.float32)
    wav = jnp.asarray(wav_np)
    wav_lens = jnp.full((batch,), n, jnp.int32)

    feats0 = log_mel_spectrogram(wav[:1], n_fft=400)
    params = model.init(
        jax.random.PRNGKey(0), feats0,
        jnp.full((1,), feats0.shape[1], jnp.int32),
    )

    @jax.jit
    def infer(wav, wav_lens):
        feats = log_mel_spectrogram(wav, n_fft=400)
        flens = jnp.minimum(wav_lens // 160 + 1, feats.shape[1])
        out = model.apply(params, feats, flens)
        toks, lens = ctc_greedy_decode(out["ctc_log_probs"], out["enc_lengths"])
        return toks, lens

    # All iterations run inside ONE jitted lax.scan (single dispatch):
    # the per-call enqueue cost over the axon tunnel varies from ~45 to
    # ~250 ms with tunnel state, which at batch-seconds this size would
    # otherwise dominate and make the metric measure the tunnel, not the
    # chip. Each iteration's input depends on the previous output so no
    # work can be elided.
    iters = 10

    @jax.jit
    def infer_k(wav):
        def body(w, _):
            toks, lens = infer(w, wav_lens)
            # Data-dependent, numerically negligible (~1e-27) carry
            # update: not provably zero, so XLA cannot hoist the body
            # out of the loop as loop-invariant.
            return w + lens[0].astype(w.dtype) * 1e-30, (toks, lens)

        _, (toks, lens) = jax.lax.scan(body, wav, jnp.arange(iters))
        return toks[-1], lens[-1]

    # Warmup (compile + first-execution backend warmup; sync via a
    # device->host value fetch — block_until_ready can return early over
    # the tunnel).
    toks, lens = infer_k(wav)
    _ = np.asarray(lens)

    # Median of >=5 independent on-device blocks + spread: a single
    # 10-iteration reading is noise-dominated over the tunnel (round-4's
    # 17,612 vs rounds 1/2's ~21k was exactly that — the forward kernel
    # config is unchanged r3->r4, FUSED_Y off; docs/DESIGN.md §8d).
    # Median (not min) is the honest central tendency when per-block
    # variance comes from the environment, and spread_pct quantifies it
    # in the scoreboard line itself.
    audio_seconds = batch * seconds * iters
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        toks, lens = infer_k(wav)
        _ = (np.asarray(toks), np.asarray(lens))
        dts.append(time.perf_counter() - t0)
    blocks = sorted(audio_seconds / d for d in dts)
    rtfx = float(np.median(blocks))
    spread_pct = 100.0 * (blocks[-1] - blocks[0]) / rtfx
    print(json.dumps({
        "metric": "inference_rtfx_conmamba_small_ctc",
        "value": round(rtfx, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(rtfx / BASELINE_RTFX, 3),
        "spread_pct": round(spread_pct, 1),
        "blocks": [round(b, 1) for b in blocks],
    }), flush=True)
    # Wedged backend threads must not block exit after the result is out.
    os._exit(0)


if __name__ == "__main__":
    main()
