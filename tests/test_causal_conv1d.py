"""Depthwise causal conv: XLA impl vs reference math, step path."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_ref,
    causal_conv1d_step,
)


def _inputs(key, bsz=2, length=13, d=6, k=4):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (bsz, length, d))
    w = jax.random.normal(k2, (k, d))
    b = jax.random.normal(k3, (d,))
    return x, w, b


def test_matches_ref():
    x, w, b = _inputs(jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        causal_conv1d(x, w, b), causal_conv1d_ref(x, w, b), rtol=1e-5, atol=1e-5
    )


def test_causality():
    """Output at t must not depend on inputs after t."""
    x, w, b = _inputs(jax.random.PRNGKey(1))
    out1 = causal_conv1d(x, w, b)
    x2 = x.at[:, 7:].set(999.0)
    out2 = causal_conv1d(x2, w, b)
    np.testing.assert_allclose(out1[:, :7], out2[:, :7], rtol=1e-5)


def test_step_matches_full():
    x, w, b = _inputs(jax.random.PRNGKey(2), length=9, k=4)
    full = causal_conv1d(x, w, b)
    state = jnp.zeros((x.shape[0], 4, x.shape[2]))
    outs = []
    for t in range(x.shape[1]):
        y, state = causal_conv1d_step(state, x[:, t], w, b)
        outs.append(y)
    np.testing.assert_allclose(
        full, jnp.stack(outs, axis=1), rtol=1e-5, atol=1e-5
    )


def test_no_activation_matches_torch_conv():
    """Cross-check against torch's depthwise Conv1d with left pad."""
    import torch
    import torch.nn.functional as F

    x, w, b = _inputs(jax.random.PRNGKey(3), bsz=3, length=21, d=5, k=4)
    ours = causal_conv1d(x, w, b, activation=None)
    xt = torch.tensor(np.array(x)).transpose(1, 2)  # (B, D, L)
    wt = torch.tensor(np.array(w)).T.unsqueeze(1)  # (D, 1, K)
    bt = torch.tensor(np.array(b))
    theirs = F.conv1d(F.pad(xt, (3, 0)), wt, bt, groups=5).transpose(1, 2)
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-5, atol=1e-5)
