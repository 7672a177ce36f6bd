"""CSV-manifest dataset + bucketed batch loader.

Replaces the reference's DynamicItemDataset pipelines
(/root/reference/train_CTC.py:720-1018): audio pipeline (read + optional
speed perturb in workers), text pipeline (words -> token ids and the
bos/eos variants used by S2S, train_S2S.py:1047-1101), and the batch
collation — here with *static* shapes from data/batching.py.

Each batch is a dict of numpy arrays:
  wav (B, Lb) float32, wav_lens (B,) int32 (post-perturb sample counts),
  tokens (B, Sb) int32 (no bos/eos), token_lens (B,),
  tokens_bos (B, Sb+1), tokens_eos (B, Sb+1), eos_lens (B,),
  weight (B,) float32 (0 for repeated pad rows of partial batches),
  ids: list of utterance ids.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional

import numpy as np

from mamba_asr_tpu.data.audio import read_audio
from mamba_asr_tpu.data.augment import SPEED_FACTORS, speed_perturb
from mamba_asr_tpu.data.batching import BucketPlan, BucketSampler, make_bucket_plan
from mamba_asr_tpu.data.librispeech import Utterance, load_manifest
from mamba_asr_tpu.data.tokenizer import BOS_ID, EOS_ID, PAD_ID


def prefetch_iterator(it: Iterator, size: int = 2) -> Iterator:
    """Run `it` in a background thread, keeping `size` items ready —
    overlaps host-side audio IO/collation with device compute (the
    reference gets this from torch DataLoader workers,
    train_CTC.py:930-937)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        yield item


@dataclasses.dataclass
class ASRDataset:
    utterances: List[Utterance]
    tokenizer: object
    sample_rate: int = 16000

    @classmethod
    def from_csv(cls, csv_path: str, tokenizer, sample_rate: int = 16000):
        return cls(load_manifest(csv_path), tokenizer, sample_rate)

    def __len__(self):
        return len(self.utterances)

    @property
    def durations(self) -> List[float]:
        return [u.duration for u in self.utterances]

    @property
    def label_lengths(self) -> List[int]:
        return [len(self.tokenizer.encode(u.words)) for u in self.utterances]


class BucketedLoader:
    """Iterates static-shape batches; speed perturb on train epochs."""

    def __init__(
        self,
        dataset: ASRDataset,
        plan: Optional[BucketPlan] = None,
        num_buckets: int = 8,
        max_batch_seconds: float = 850.0,
        max_batch_ex: int = 128,
        shuffle: bool = True,
        speed_perturb: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        batch_divisor: int = 1,
        num_workers: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.ds = dataset
        self.speed_perturb = speed_perturb
        self.seed = seed
        # Multi-process (multi-host) training: every process builds the
        # IDENTICAL plan/sampler (same seed, same manifest), then loads
        # only its own row slice of each global batch; the global batch
        # is reassembled on device by parallel.mesh.shard_batch
        # (process_sharded=True). The reference gets the same split from
        # torch's DistributedSampler (SURVEY.md §5.8).
        assert 0 <= process_index < process_count
        self.process_index = process_index
        self.process_count = process_count
        # Per-utterance decode+perturb parallelism; 0 = one thread per
        # host CPU. Both the FLAC decode and the resample are single
        # ctypes calls into native/flac_decode.cpp (GIL released for the
        # whole foreign call), so threads scale to real core counts —
        # the reference gets the same overlap from torch DataLoader
        # worker *processes* (/root/reference/train_CTC.py:930-937).
        if num_workers <= 0:
            import os

            num_workers = os.cpu_count() or 1
        self.num_workers = num_workers
        self._pool = None
        # Speed perturb can lengthen audio by 1/0.95; reserve headroom.
        durations = np.asarray(dataset.durations)
        plan_durations = durations / 0.95 if speed_perturb else durations
        self.plan = plan or make_bucket_plan(
            plan_durations,
            dataset.label_lengths,
            num_buckets=num_buckets,
            max_batch_seconds=max_batch_seconds,
            max_batch_ex=max_batch_ex,
            sample_rate=dataset.sample_rate,
            batch_divisor=batch_divisor,
        )
        self.sampler = BucketSampler(
            plan_durations, self.plan, shuffle=shuffle, seed=seed,
            drop_last=drop_last,
        )

    def num_batches(self) -> int:
        return self.sampler.num_batches()

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed * 7919 + epoch)
        pc, pi = self.process_count, self.process_index
        for bucket_idx, indices, real in self.sampler.epoch(epoch):
            # Perturb factors are drawn for the FULL global batch in
            # index order before any slicing, so the realized factor
            # sequence (and therefore the training trajectory) is
            # identical to the single-process run on the same seed.
            if self.speed_perturb:
                factors = [
                    SPEED_FACTORS[rng.integers(len(SPEED_FACTORS))]
                    for _ in indices
                ]
            else:
                factors = [1.0] * len(indices)
            if pc > 1:
                bsz = len(indices)
                if bsz % pc != 0:
                    raise ValueError(
                        f"batch size {bsz} not divisible by process "
                        f"count {pc}: construct the loader with "
                        "batch_divisor = data-axis size"
                    )
                shard = bsz // pc
                lo = pi * shard
                indices = indices[lo : lo + shard]
                factors = factors[lo : lo + shard]
                # Global pad rows are the TRAILING rows; this process's
                # real-row count is the overlap of [lo, lo+shard) with
                # [0, real).
                real = min(max(real - lo, 0), shard)
            yield self._collate(bucket_idx, indices, real, factors)

    def __iter__(self):
        return self.epoch(0)

    def _load_one(self, idx: int, factor: float, n_samples: int, s_max: int):
        """Decode + perturb + tokenize one utterance (thread-pool body)."""
        utt = self.ds.utterances[idx]
        audio, sr = read_audio(utt.path)
        if sr != self.ds.sample_rate:
            raise ValueError(
                f"{utt.path}: sample rate {sr} != {self.ds.sample_rate}"
            )
        if factor != 1.0:
            audio = speed_perturb(audio, factor)
        toks = self.ds.tokenizer.encode(utt.words)[:s_max]
        return utt.utt_id, audio[:n_samples], toks

    def _collate(
        self, bucket_idx, indices, real, factors
    ) -> Dict[str, np.ndarray]:
        bucket = self.plan.buckets[bucket_idx]
        n_samples = self.plan.padded_samples(bucket_idx)
        s_max = bucket.max_label_len
        bsz = len(indices)

        wav = np.zeros((bsz, n_samples), np.float32)
        wav_lens = np.zeros((bsz,), np.int32)
        tokens = np.full((bsz, s_max), PAD_ID, np.int32)
        token_lens = np.zeros((bsz,), np.int32)
        tokens_bos = np.full((bsz, s_max + 1), PAD_ID, np.int32)
        tokens_eos = np.full((bsz, s_max + 1), PAD_ID, np.int32)
        ids = []

        # Perturb factors arrive pre-drawn (in global index order, see
        # epoch()): the realized factor sequence is identical to the
        # sequential implementation, independent of thread scheduling
        # AND of the process sharding.
        if self.num_workers > 1 and bsz > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(self.num_workers)
            rows = list(self._pool.map(
                self._load_one, indices, factors,
                [n_samples] * bsz, [s_max] * bsz,
            ))
        else:
            rows = [
                self._load_one(idx, f, n_samples, s_max)
                for idx, f in zip(indices, factors)
            ]

        for i, (utt_id, audio, toks) in enumerate(rows):
            n = len(audio)
            wav[i, :n] = audio
            wav_lens[i] = n
            tokens[i, : len(toks)] = toks
            token_lens[i] = len(toks)
            tokens_bos[i, 0] = BOS_ID
            tokens_bos[i, 1 : len(toks) + 1] = toks
            tokens_eos[i, : len(toks)] = toks
            tokens_eos[i, len(toks)] = EOS_ID
            ids.append(utt_id)

        weight = np.zeros((bsz,), np.float32)
        weight[:real] = 1.0
        return {
            "wav": wav,
            "wav_lens": wav_lens,
            "tokens": tokens,
            "token_lens": token_lens,
            "tokens_bos": tokens_bos,
            "tokens_eos": tokens_eos,
            "eos_lens": token_lens + 1,
            "weight": weight,
            "ids": ids,
            "bucket": bucket_idx,
        }
