"""Depthwise causal 1-D convolution (+ optional SiLU), time-major.

Reference behavior: the `causal_conv1d` CUDA package used at
/root/reference/modules/mamba/bimamba.py:282-287 — depthwise conv with
left padding k-1 (output length == input length) followed by SiLU — and
its O(1) decode variant `causal_conv1d_update`
(/root/reference/modules/mamba/bimamba.py:327-341), which rolls a
(B, D, K) state buffer and dots it with the kernel.

TPU-native design: expressed as `lax.conv_general_dilated` with feature
grouping == channels in (B, L, D) layout, which XLA lowers to an efficient
fused op; for k=4 this is a handful of shifted adds that XLA fuses into
neighbors. Inside the Pallas selective-scan kernel the same conv is fused
into the scan prologue (ops/pallas/scan.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def causal_conv1d_ref(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
) -> Array:
    """Sequential-math golden reference.

    Args:
      x:      (B, L, D).
      weight: (K, D) depthwise taps; tap k multiplies x[t - (K-1) + k].
      bias:   (D,), optional.
    """
    k = weight.shape[0]
    xf = x.astype(jnp.float32)
    out = jnp.zeros_like(xf)
    for i in range(k):
        shift = k - 1 - i
        xi = jnp.pad(xf, ((0, 0), (shift, 0), (0, 0)))[:, : x.shape[1], :]
        out = out + xi * weight[i].astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if activation == "silu":
        out = jax.nn.silu(out)
    return out.astype(x.dtype)


def causal_conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
) -> Array:
    """Depthwise causal conv + optional SiLU. x (B, L, D), weight (K, D)."""
    d = x.shape[-1]
    k = weight.shape[0]
    if k <= 8:
        # k-tap shift-and-add: k fused elementwise passes. XLA's grouped
        # conv op (feature_group_count = D) measured 1.26 ms for this at
        # (8, 376, 1024) k=4 on a v5e — ~100x above the elementwise
        # cost — so the conv formulation is reserved for large k.
        xf = x.astype(jnp.float32)
        out = xf * weight[k - 1].astype(jnp.float32)
        for i in range(k - 1):
            shift = k - 1 - i
            xi = jnp.pad(xf, ((0, 0), (shift, 0), (0, 0)))[:, : x.shape[1]]
            out = out + xi * weight[i].astype(jnp.float32)
    else:
        # Depthwise conv: feature_group_count = D, kernel (K, 1, D), HIO.
        kernel = weight.astype(jnp.float32).reshape(k, 1, d)
        out = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernel,
            window_strides=(1,),
            padding=[(k - 1, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=d,
            precision=jax.lax.Precision.HIGHEST,
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if activation == "silu":
        out = jax.nn.silu(out)
    return out.astype(x.dtype)


def causal_conv1d_step(
    conv_state: Array,
    x_t: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
) -> Tuple[Array, Array]:
    """O(1) per-token conv update for decode/streaming.

    Args:
      conv_state: (B, K, D) rolling buffer of the last K inputs
                  (conv_state[:, -1] is the most recent).
      x_t:        (B, D) new input token.

    Returns:
      (y_t, new_conv_state).
    """
    new_state = jnp.concatenate(
        [conv_state[:, 1:], x_t[:, None].astype(conv_state.dtype)], axis=1
    )
    y = jnp.einsum(
        "bkd,kd->bd",
        new_state.astype(jnp.float32),
        weight.astype(jnp.float32),
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation == "silu":
        y = jax.nn.silu(y)
    return y.astype(x_t.dtype), new_state
