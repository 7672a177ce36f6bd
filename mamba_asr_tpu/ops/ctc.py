"""CTC loss as a vectorized log-semiring forward pass in JAX.

Replaces the cuDNN CTC kernel the reference reaches through
`speechbrain.nnet.losses.ctc_loss` (configured at
/root/reference/hparams/CTC/conmamba_large.yaml:239-241, used at
/root/reference/train_CTC.py:405 with reduction="batchmean").

Design: the classic alpha recursion over the blank-interleaved label
lattice (length 2S+1), vectorized over the batch and lattice axes and
scanned over time with `lax.scan` — static shapes throughout, so one
compilation per (T, S) bucket. All arithmetic in float32 log-space.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30


def _interleave_blanks(labels: Array, blank_id: int) -> Array:
    """(B, S) -> (B, 2S+1) lattice: blank, l1, blank, l2, ..., blank."""
    bsz, s = labels.shape
    z = jnp.full((bsz, 2 * s + 1), blank_id, dtype=labels.dtype)
    return z.at[:, 1::2].set(labels)


def ctc_forward_score(
    log_probs: Array,
    labels: Array,
    input_lengths: Array,
    label_lengths: Array,
    blank_id: int = 0,
) -> Array:
    """Per-utterance CTC negative log likelihood.

    Args:
      log_probs:     (B, T, V) log-softmax outputs.
      labels:        (B, S) int labels, padded arbitrarily past length.
      input_lengths: (B,) valid frames per utterance.
      label_lengths: (B,) valid labels per utterance.
      blank_id:      blank token index.

    Returns:
      (B,) float32 negative log likelihood (sum over the utterance, the
      same convention as torch's ctc_loss with reduction="none").
    """
    log_probs = log_probs.astype(jnp.float32)
    bsz, t_max, _ = log_probs.shape
    s = labels.shape[1]
    z = _interleave_blanks(labels, blank_id)  # (B, 2S+1)
    zlen = 2 * label_lengths + 1

    # Transition masks, static over time.
    # alpha[i] <- alpha[i] + alpha[i-1] + alpha[i-2] (last only if
    # z[i] != blank and z[i] != z[i-2]).
    z_prev2 = jnp.pad(z, ((0, 0), (2, 0)), constant_values=blank_id)[:, : 2 * s + 1]
    allow_skip = (z != blank_id) & (z != z_prev2)
    lattice_idx = jnp.arange(2 * s + 1)

    # Emission scores per lattice position per frame: (B, T, 2S+1).
    emit = jnp.take_along_axis(
        log_probs, z[:, None, :].astype(jnp.int32), axis=2
    )

    alpha0 = jnp.full((bsz, 2 * s + 1), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(emit[:, 0, 0])
    if s > 0:
        alpha0 = alpha0.at[:, 1].set(
            jnp.where(label_lengths > 0, emit[:, 0, 1], _NEG_INF)
        )

    def step(alpha, inputs):
        emit_t, t = inputs
        a_prev1 = jnp.pad(
            alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF
        )[:, : 2 * s + 1]
        a_prev2 = jnp.pad(
            alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF
        )[:, : 2 * s + 1]
        a_prev2 = jnp.where(allow_skip, a_prev2, _NEG_INF)
        stacked = jnp.stack([alpha, a_prev1, a_prev2], axis=0)
        new_alpha = jax.nn.logsumexp(stacked, axis=0) + emit_t
        # Past the utterance end, carry alpha unchanged.
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        # Positions beyond the label lattice are invalid.
        new_alpha = jnp.where(
            lattice_idx[None, :] < zlen[:, None], new_alpha, _NEG_INF
        )
        return new_alpha, None

    ts = jnp.arange(1, t_max)
    # The body touches only (B, 2S+1) values — tiny next to the scan's
    # per-step control overhead at T in the hundreds. Unrolling lets XLA
    # fuse 8 steps per loop iteration (the sequential dependence stays).
    alpha, _ = jax.lax.scan(
        step, alpha0, (jnp.moveaxis(emit[:, 1:], 1, 0), ts), unroll=8
    )

    # Final score: logsumexp of the last blank and last label positions.
    end_blank = jnp.take_along_axis(alpha, (zlen - 1)[:, None], axis=1)[:, 0]
    end_label = jnp.take_along_axis(
        alpha, jnp.maximum(zlen - 2, 0)[:, None], axis=1
    )[:, 0]
    end_label = jnp.where(label_lengths > 0, end_label, _NEG_INF)
    ll = jnp.logaddexp(end_blank, end_label)
    return -ll


def ctc_loss(
    log_probs: Array,
    labels: Array,
    input_lengths: Array,
    label_lengths: Array,
    blank_id: int = 0,
    reduction: str = "batchmean",
    weight: Optional[Array] = None,
    zero_infinity: bool = True,
) -> Array:
    """CTC loss with SpeechBrain-compatible reductions.

    zero_infinity: zero out infeasible utterances (label lattice longer
    than the input), matching torch's ctc_loss(zero_infinity=True) — with
    static bucket padding an occasional infeasible row must not poison
    the batch.

    reduction:
      "none"      — (B,) per-utterance NLL.
      "batchmean" — sum / batch_size (the reference's training config).
      "mean"      — mean over utterances of NLL / label_length.
      "sum"       — sum over utterances.
    weight: optional (B,) per-utterance weights (e.g. to zero out padding
      rows inside a static bucket).
    """
    nll = ctc_forward_score(
        log_probs, labels, input_lengths, label_lengths, blank_id
    )
    if zero_infinity:
        nll = jnp.where(nll > 0.5 * -_NEG_INF, 0.0, nll)
    if weight is not None:
        nll = nll * weight
    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    if reduction == "batchmean":
        denom = (
            weight.sum() if weight is not None else jnp.float32(nll.shape[0])
        )
        return nll.sum() / jnp.maximum(denom, 1.0)
    if reduction == "mean":
        per = nll / jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
        if weight is not None:
            return per.sum() / jnp.maximum(weight.sum(), 1.0)
        return per.mean()
    raise ValueError(f"unknown reduction: {reduction}")
