"""Static duration-bucketed batching (the TPU answer to SpeechBrain's
DynamicBatchSampler, /root/reference/hparams/CTC/conmamba_large.yaml:112-132
and /root/reference/train_CTC.py:994-1010).

The reference batches by summed duration with dynamic shapes; under XLA
that causes a recompilation per new shape. Here utterances are assigned
to a *fixed* set of duration buckets; every batch from a bucket has the
same (batch_size, padded_samples) shape, so the number of compiled
train-step variants equals the number of buckets (north-star item:
"static bucketed padding for variable-length utterance batches").

Per-bucket batch size targets a constant total audio duration
(max_batch_seconds ~ the reference's max_batch_length 850 s), so long
utterances ride in small batches exactly like the reference.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterator, List, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class Bucket:
    max_seconds: float  # padded length of every utterance in this bucket
    batch_size: int
    max_label_len: int  # static label padding for this bucket


@dataclasses.dataclass(frozen=True)
class BucketPlan:
    buckets: List[Bucket]
    sample_rate: int

    def bucket_for(self, duration: float) -> int:
        for i, b in enumerate(self.buckets):
            if duration <= b.max_seconds:
                return i
        return len(self.buckets) - 1

    def padded_samples(self, bucket_idx: int) -> int:
        return int(round(self.buckets[bucket_idx].max_seconds * self.sample_rate))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_bucket_plan(
    durations: Sequence[float],
    label_lengths: Sequence[int],
    num_buckets: int = 8,
    max_batch_seconds: float = 850.0,
    max_batch_ex: int = 128,
    sample_rate: int = 16000,
    min_batch_size: int = 1,
    batch_divisor: int = 1,
) -> BucketPlan:
    """Build bucket boundaries from the duration distribution (quantiles),
    each with a batch size targeting `max_batch_seconds` of audio.

    batch_divisor: every batch size is rounded up to a multiple of this
    (the mesh "data"-axis size, so batches shard evenly over devices).
    """
    durations = np.asarray(durations, np.float64)
    label_lengths = np.asarray(label_lengths, np.int64)
    qs = np.linspace(0, 1, num_buckets + 1)[1:]
    bounds = np.quantile(durations, qs)
    bounds[-1] = durations.max()
    # Deduplicate near-equal boundaries.
    uniq = []
    for b in bounds:
        if not uniq or b > uniq[-1] * 1.01:
            uniq.append(float(b))
    buckets = []
    for b in uniq:
        bs = int(
            np.clip(max_batch_seconds // max(b, 0.1), min_batch_size, max_batch_ex)
        )
        bs = _round_up(bs, batch_divisor)
        in_bucket = label_lengths[durations <= b]
        max_lab = int(in_bucket.max()) if in_bucket.size else 16
        buckets.append(
            Bucket(
                max_seconds=math.ceil(b * 10) / 10,
                batch_size=bs,
                max_label_len=_round_up(max(max_lab, 1), 16),
            )
        )
    return BucketPlan(buckets=buckets, sample_rate=sample_rate)


class BucketSampler:
    """Yields (bucket_idx, example_indices) with static per-bucket sizes.

    The final partial batch of each bucket is padded by repeating indices
    (flagged via the loader's example-weight mask) so shapes stay static.
    """

    def __init__(
        self,
        durations: Sequence[float],
        plan: BucketPlan,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.plan = plan
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.assignments = [plan.bucket_for(d) for d in durations]
        self.num_examples = len(self.assignments)

    def __iter__(self) -> Iterator[tuple]:
        return self.epoch(0)

    def epoch(self, epoch: int) -> Iterator[tuple]:
        rng = np.random.default_rng(self.seed + epoch)
        by_bucket: List[List[int]] = [[] for _ in self.plan.buckets]
        order = np.arange(self.num_examples)
        if self.shuffle:
            rng.shuffle(order)
        batches = []
        for idx in order:
            b = self.assignments[idx]
            by_bucket[b].append(int(idx))
            if len(by_bucket[b]) == self.plan.buckets[b].batch_size:
                batches.append((b, by_bucket[b]))
                by_bucket[b] = []
        if not self.drop_last:
            for b, rest in enumerate(by_bucket):
                if rest:
                    bs = self.plan.buckets[b].batch_size
                    # Pad by repeating; loader masks the repeats out.
                    padded = rest + rest * ((bs - len(rest)) // len(rest) + 1)
                    batches.append((b, padded[:bs], len(rest)))
        if self.shuffle:
            rng.shuffle(batches)
        for item in batches:
            if len(item) == 2:
                yield item[0], item[1], len(item[1])
            else:
                yield item

    def num_batches(self) -> int:
        counts = [0] * len(self.plan.buckets)
        for b in self.assignments:
            counts[b] += 1
        total = 0
        for b, c in enumerate(counts):
            bs = self.plan.buckets[b].batch_size
            total += c // bs if self.drop_last else -(-c // bs)
        return total
