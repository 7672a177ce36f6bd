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


def tokens_to_lists(
    tokens: np.ndarray, lengths: np.ndarray
) -> List[List[int]]:
    return [list(map(int, tokens[i, : int(lengths[i])])) for i in range(len(lengths))]
