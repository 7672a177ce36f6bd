"""Global input normalization with freeze-after-epoch statistics.

Reference: speechbrain.processing.features.InputNormalization with
norm_type "global" and update_until_epoch 4
(/root/reference/hparams/CTC/conmamba_large.yaml:216-218, applied at
/root/reference/train_CTC.py:287): running mean/std over all feature
frames, updated only during training while epoch <= update_until_epoch,
then frozen; the statistics are checkpointed.

Functional design: state is an explicit pytree updated inside the jitted
train step (masked Welford accumulation over valid frames).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class NormalizerState(NamedTuple):
    count: Array  # scalar float32, frames seen
    mean: Array   # (F,)
    m2: Array     # (F,) sum of squared deviations


def init_normalizer(num_features: int) -> NormalizerState:
    return NormalizerState(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros((num_features,), jnp.float32),
        m2=jnp.zeros((num_features,), jnp.float32),
    )


def update_normalizer(
    state: NormalizerState, feats: Array, frame_mask: Array
) -> NormalizerState:
    """Chan/Welford parallel merge of masked batch statistics.

    feats (B, T, F); frame_mask (B, T) True for valid frames.
    """
    f = feats.astype(jnp.float32)
    m = frame_mask.astype(jnp.float32)[..., None]
    n_b = m.sum()
    mean_b = (f * m).sum((0, 1)) / jnp.maximum(n_b, 1.0)
    m2_b = (((f - mean_b) ** 2) * m).sum((0, 1))

    n_a, mean_a, m2_a = state.count, state.mean, state.m2
    n = n_a + n_b
    delta = mean_b - mean_a
    mean = mean_a + delta * n_b / jnp.maximum(n, 1.0)
    m2 = m2_a + m2_b + delta**2 * n_a * n_b / jnp.maximum(n, 1.0)
    return NormalizerState(count=n, mean=mean, m2=m2)


def apply_normalizer(
    state: NormalizerState, feats: Array, eps: float = 1e-10
) -> Array:
    std = jnp.sqrt(state.m2 / jnp.maximum(state.count - 1.0, 1.0))
    std = jnp.maximum(std, eps)
    out = (feats.astype(jnp.float32) - state.mean) / std
    # Before any statistics exist, pass features through unchanged.
    return jnp.where(state.count > 0, out, feats).astype(feats.dtype)
