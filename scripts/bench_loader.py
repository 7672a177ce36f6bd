#!/usr/bin/env python
"""Host input-pipeline throughput benchmark (CPU only — no TPU client).

Proves the loader sustains the measured TPU train-step rate (VERDICT r1
next#5): synthesizes a FLAC corpus at real shapes, then measures
batches/s and audio-seconds/s through the full BucketedLoader path
(native FLAC decode -> speed perturb -> tokenize -> static-shape
collate) for several thread-pool widths, plus the prefetch-overlapped
rate a training loop would see. Compare the audio-seconds/s against
bench_train.py's train-RTFx (audio-seconds/s consumed by the step):
loader >= consumer means host IO does not bound training. Reference
equivalent: torch DataLoader worker processes
(/root/reference/train_CTC.py:930-937).

    python scripts/bench_loader.py [--files 64 --seconds 15 --epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU

    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=64)
    p.add_argument("--seconds", type=float, default=15.0)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--max-batch-seconds", type=float, default=240.0)
    args = p.parse_args()

    from mamba_asr_tpu.data.audio import write_flac
    from mamba_asr_tpu.data.dataset import (
        ASRDataset,
        BucketedLoader,
        prefetch_iterator,
    )
    from mamba_asr_tpu.data.librispeech import Utterance
    from mamba_asr_tpu.data.tokenizer import CharTokenizer

    rng = np.random.default_rng(0)
    words = ["the", "quick", "brown", "fox", "jumped", "over", "lazy"]
    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    utts = []
    t0 = time.perf_counter()
    for i in range(args.files):
        dur = float(rng.uniform(0.7, 1.0) * args.seconds)
        n = int(dur * 16000)
        wav = rng.normal(0, 0.2, n).astype(np.float32)
        path = os.path.join(tmp, f"u{i:04d}.flac")
        write_flac(path, wav, 16000)
        text = " ".join(rng.choice(words, 12)).upper()
        utts.append(Utterance(f"u{i:04d}", dur, path, "1-1", text))
    corpus_s = sum(u.duration for u in utts)
    ncpu = os.cpu_count()
    print(f"corpus: {args.files} FLAC files, {corpus_s:.0f}s audio, "
          f"written in {time.perf_counter()-t0:.1f}s; host has {ncpu} "
          f"CPU(s) — thread speedup is bounded by this", flush=True)

    tok = CharTokenizer.fit([u.words for u in utts])

    def run(num_workers, prefetch=0):
        ds = ASRDataset(utts, tok)
        loader = BucketedLoader(
            ds, num_buckets=4,
            max_batch_seconds=args.max_batch_seconds,
            shuffle=True, speed_perturb=True,
            num_workers=num_workers,
        )
        # Warm epoch (pool spin-up, page cache).
        for _ in loader.epoch(0):
            pass
        t0 = time.perf_counter()
        nb = 0
        for e in range(args.epochs):
            it = loader.epoch(e + 1)
            if prefetch:
                it = prefetch_iterator(it, size=prefetch)
            for _ in it:
                nb += 1
        dt = time.perf_counter() - t0
        rate = args.epochs * corpus_s / dt
        print(f"workers={num_workers:2d} prefetch={prefetch}: "
              f"{nb/dt:.1f} batches/s, {rate:,.0f} audio-s/s "
              f"(loader-RTFx {rate:,.0f})", flush=True)
        return rate

    r1 = run(1)
    r8 = run(8)
    run(16)
    rp = run(8, prefetch=4)
    print(f"speedup workers 8 vs 1: {r8 / r1:.2f}x; "
          f"with prefetch(4) overlap: {rp / r1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
