"""Greedy CTC decoding: argmax -> collapse repeats -> drop blanks.

Reference: speechbrain.decoders.ctc_greedy_decode used for validation
(/root/reference/train_CTC.py:306-310).

The argmax runs on device; the collapse is a small jnp computation that
returns fixed-shape token buffers + lengths, so the whole decode can stay
inside a jitted eval step (host conversion only at the very end).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def ctc_greedy_collapse(
    best: Array, input_lengths: Array, blank_id: int = 0
) -> Tuple[Array, Array]:
    """(B, T) argmax ids -> (tokens (B, T) left-packed, lengths (B,)).

    Keeps positions where the id differs from its predecessor and is not
    blank, then left-packs them with a stable sort on the drop mask.
    """
    b, t = best.shape
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=blank_id)[:, :t]
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    keep = (best != blank_id) & (best != prev) & valid
    # Left-pack: order by (not keep), stable.
    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(best, order, axis=1)
    lengths = keep.sum(axis=1)
    packed = jnp.where(jnp.arange(t)[None, :] < lengths[:, None], packed, 0)
    return packed, lengths


def ctc_greedy_decode(
    log_probs: Array, input_lengths: Array, blank_id: int = 0
) -> Tuple[Array, Array]:
    """(B, T, V) log probs -> (tokens (B, T), lengths (B,)), jittable."""
    best = jnp.argmax(log_probs, axis=-1)
    return ctc_greedy_collapse(best, input_lengths, blank_id)


def ctc_greedy_decode_with_times(
    log_probs: Array, input_lengths: Array, blank_id: int = 0
) -> Tuple[Array, Array, Array, Array, Array]:
    """Greedy decode that also returns each token's frame span and
    confidence.

    Returns (tokens (B, T), lengths (B,), onsets (B, T), offsets (B, T),
    confs (B, T)): onset = first encoder frame of the token's argmax
    run, offset = last frame of that run (inclusive), conf = the
    geometric-mean frame posterior of the argmax over the run,
    exp(mean log p). Jittable; the reference exposes no time-alignment
    or confidence surface at all (its ctc_greedy_decode returns bare
    ids), so this is a framework extension used by
    `recognize.py --timestamps` and the serving engine.
    """
    b, t = log_probs.shape[:2]
    best = jnp.argmax(log_probs, axis=-1)
    valid = jnp.arange(t)[None, :] < input_lengths[:, None]
    # Padded frames become blank so no token run can extend past the
    # valid region.
    best = jnp.where(valid, best, blank_id)
    prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=blank_id)[:, :t]
    keep = (best != blank_id) & (best != prev)

    # Run end per frame: the last consecutive frame holding this frame's
    # id — a reversed cumulative-min over frame indices marked at run
    # boundaries.
    idx = jnp.arange(t)[None, :]
    nxt = jnp.pad(best, ((0, 0), (0, 1)), constant_values=blank_id)[:, 1:]
    is_run_end = best != nxt  # last frame of every run (incl. frame t-1)
    end_mark = jnp.where(is_run_end, idx, t)
    run_end = jnp.flip(
        jax.lax.cummin(jnp.flip(end_mark, axis=1), axis=1), axis=1
    )

    # Per-frame argmax log-prob, prefix-summed so each token's run mean
    # is two gathers: (csum[offset+1] - csum[onset]) / run_length.
    mlp = jnp.max(log_probs, axis=-1)
    csum = jnp.pad(jnp.cumsum(mlp, axis=1), ((0, 0), (1, 0)))

    order = jnp.argsort(~keep, axis=1, stable=True)
    packed = jnp.take_along_axis(best, order, axis=1)
    onsets = jnp.take_along_axis(
        jnp.broadcast_to(idx, (b, t)), order, axis=1
    )
    offsets = jnp.take_along_axis(run_end, order, axis=1)
    run_len = (offsets - onsets + 1).astype(log_probs.dtype)
    seg = (
        jnp.take_along_axis(csum, offsets + 1, axis=1)
        - jnp.take_along_axis(csum, onsets, axis=1)
    )
    confs = jnp.exp(seg / jnp.maximum(run_len, 1.0))
    lengths = keep.sum(axis=1)
    in_range = jnp.arange(t)[None, :] < lengths[:, None]
    packed = jnp.where(in_range, packed, 0)
    onsets = jnp.where(in_range, onsets, 0)
    offsets = jnp.where(in_range, offsets, 0)
    confs = jnp.where(in_range, confs, 0.0)
    return packed, lengths, onsets, offsets, confs


def tokens_to_lists(
    tokens: np.ndarray, lengths: np.ndarray
) -> List[List[int]]:
    return [list(map(int, tokens[i, : int(lengths[i])])) for i in range(len(lengths))]
