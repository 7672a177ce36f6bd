"""Sequence losses: label-smoothed KL-divergence + joint CTC/attention.

Reference:
- `kldiv_loss` with label_smoothing 0.1, reduction "batchmean"
  (/root/reference/hparams/S2S/conmamba_large.yaml:378-384).
- Joint objective: ctc_weight * CTC + (1 - ctc_weight) * KLdiv with
  ctc_weight 0.3 (/root/reference/train_S2S.py:518-529).

Label-smoothed KL-divergence against the smoothed one-hot target equals
cross-entropy with smoothing up to a constant; SpeechBrain's version is
the true KL (includes the -H(target) constant), reproduced here so loss
curves are comparable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def kldiv_loss(
    log_probs: Array,
    targets: Array,
    target_lengths: Optional[Array] = None,
    label_smoothing: float = 0.0,
    pad_idx: int = 0,
    reduction: str = "batchmean",
    weight: Optional[Array] = None,
) -> Array:
    """KL(smoothed one-hot || p) summed over valid tokens.

    log_probs: (B, S, V); targets: (B, S) int; target_lengths: (B,)
    valid-token counts (falls back to `targets != pad_idx`).
    """
    lp = log_probs.astype(jnp.float32)
    b, s, v = lp.shape
    if target_lengths is not None:
        valid = jnp.arange(s)[None, :] < target_lengths[:, None]
    else:
        valid = targets != pad_idx

    onehot_lp = jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = label_smoothing / (v - 1)
        confidence = 1.0 - label_smoothing
        # KL(q||p) = sum_i q_i (log q_i - log p_i); entropy term constant.
        q_logq = confidence * jnp.log(confidence) + (v - 1) * smooth * jnp.log(
            jnp.maximum(smooth, 1e-20)
        )
        cross = confidence * onehot_lp + smooth * (lp.sum(-1) - onehot_lp)
        per_tok = q_logq - cross
    else:
        per_tok = -onehot_lp

    per_tok = jnp.where(valid, per_tok, 0.0)
    per_utt = per_tok.sum(-1)
    if weight is not None:
        per_utt = per_utt * weight
    if reduction == "none":
        return per_utt
    if reduction == "sum":
        return per_utt.sum()
    if reduction == "batchmean":
        denom = weight.sum() if weight is not None else jnp.float32(b)
        return per_utt.sum() / jnp.maximum(denom, 1.0)
    if reduction == "mean":
        tok_w = valid.astype(jnp.float32)
        if weight is not None:
            tok_w = tok_w * weight[:, None]
        return per_tok.sum() / jnp.maximum(tok_w.sum(), 1.0)
    raise ValueError(reduction)


def joint_ctc_attention_loss(
    ctc: Array, att: Array, ctc_weight: float = 0.3
) -> Array:
    """0.3*CTC + 0.7*attention (train_S2S.py:526-529)."""
    return ctc_weight * ctc + (1.0 - ctc_weight) * att
