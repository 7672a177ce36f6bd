"""Golden parity vs an independently-coded torch replica of the
reference's Mamba math.

The reference's slow-path forward (pure PyTorch, no CUDA needed) is
specified at /root/reference/modules/mamba/bimamba.py:271-315 with the
scan semantics of selective_scan_ref
(/root/reference/modules/mamba/selective_scan_interface.py:91-157):

    xz   = in_proj(x)                      # (B, L, 2*Din), split x | z
    x_c  = silu(depthwise_causal_conv(x))  # k taps, left pad k-1
    dt,B,C = split(x_proj(x_c))            # dt_rank | N | N
    delta = softplus(dt @ dt_w^T + dt_bias)
    h_t  = exp(delta_t * A) * h_{t-1} + delta_t * B_t * u_t
    y_t  = <h_t, C_t> + D * u_t            # then y *= silu(z)
    out  = out_proj(y)                     # BiMamba v2: 0.5*fwd + 0.5*
                                           # flip(bwd(flip(.)))  (:251-253)

The replica below is written from that contract, NOT copied: it is a
plain-loop torch implementation. We transplant identical weights into
the flax blocks and assert forward (and gradient) equality. This is the
strongest golden test achievable in this image (speechbrain/mamba_ssm /
causal_conv1d are absent, so the reference itself cannot be imported —
/root/reference/modules/mamba/selective_scan_interface.py:14 fails).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mamba_asr_tpu.models.mamba import BiMambaBlock, MambaBlock, MambaConfig

# ---------------------------------------------------------------------------
# Torch replica (independent implementation of the documented math)
# ---------------------------------------------------------------------------


def _t_selective_scan(u, delta, A, B, C, D, z, delta_bias):
    """Sequential scan, torch, fp32. u/delta/z: (B, L, Din); B/C: (B, L, N);
    A: (Din, N); D/delta_bias: (Din,). Returns (B, L, Din)."""
    bsz, length, din = u.shape
    n = A.shape[1]
    delta = F.softplus(delta + delta_bias)
    h = torch.zeros(bsz, din, n, dtype=torch.float32)
    ys = []
    for t in range(length):
        dt = delta[:, t]  # (B, Din)
        da = torch.exp(dt[:, :, None] * A[None])  # (B, Din, N)
        dbu = dt[:, :, None] * B[:, t][:, None, :] * u[:, t][:, :, None]
        h = da * h + dbu
        ys.append((h * C[:, t][:, None, :]).sum(-1))
    y = torch.stack(ys, dim=1) + u * D[None, None]
    return y * F.silu(z)


def _t_causal_conv_silu(x, w, b):
    """x: (B, L, Din); w: (Din, K) with w[:, -1] the current tap; b: (Din,)."""
    k = w.shape[1]
    xp = F.pad(x.transpose(1, 2), (k - 1, 0))  # (B, Din, L+k-1)
    y = F.conv1d(xp, w[:, None, :], bias=b, groups=w.shape[0])
    return F.silu(y.transpose(1, 2))


class TorchHeadParams:
    """One scan direction's parameters, torch fp32."""

    def __init__(self, g, d_inner, d_state, d_conv, dt_rank):
        def r(*shape, scale=1.0):
            return (torch.randn(*shape, generator=g) * scale).requires_grad_()

        self.conv_w = r(d_inner, d_conv, scale=0.4)
        self.conv_b = r(d_inner, scale=0.1)
        self.x_proj_w = r(dt_rank + 2 * d_state, d_inner, scale=d_inner**-0.5)
        self.dt_w = r(d_inner, dt_rank, scale=dt_rank**-0.5)
        # softplus(dt_bias) in a sane dt range, like the reference init.
        dt = torch.exp(
            torch.rand(d_inner, generator=g) * (math.log(0.1) - math.log(1e-3))
            + math.log(1e-3)
        ).clamp(min=1e-4)
        self.dt_bias = (dt + torch.log(-torch.expm1(-dt))).requires_grad_()
        self.A_log = torch.log(
            torch.arange(1, d_state + 1, dtype=torch.float32)
            .expand(d_inner, d_state)
            .contiguous()
        ).requires_grad_()
        self.D = torch.ones(d_inner).requires_grad_()

    def all(self):
        return [
            self.conv_w, self.conv_b, self.x_proj_w, self.dt_w,
            self.dt_bias, self.A_log, self.D,
        ]


def _t_head_forward(p: TorchHeadParams, x, z, dt_rank, d_state):
    x_c = _t_causal_conv_silu(x, p.conv_w, p.conv_b)
    x_dbl = x_c @ p.x_proj_w.T
    dt, bmat, cmat = torch.split(x_dbl, [dt_rank, d_state, d_state], dim=-1)
    delta = dt @ p.dt_w.T
    return _t_selective_scan(
        x_c, delta, -torch.exp(p.A_log), bmat, cmat, p.D, z, p.dt_bias
    )


def _head_flax_params(p: TorchHeadParams):
    def np32(t):
        return jnp.asarray(t.detach().numpy(), jnp.float32)

    return {
        "conv_w": np32(p.conv_w).T,  # torch (Din, K) -> flax (K, Din)
        "conv_b": np32(p.conv_b),
        "x_proj": {"kernel": np32(p.x_proj_w).T},
        "dt_kernel": np32(p.dt_w).T,
        "dt_bias": np32(p.dt_bias),
        "A_log": np32(p.A_log),
        "D": np32(p.D),
    }


D_MODEL, D_STATE, D_CONV, L, BATCH = 32, 16, 4, 48, 2


def _make_inputs(seed=0):
    g = torch.Generator().manual_seed(seed)
    x = torch.randn(BATCH, L, D_MODEL, generator=g)
    return g, x


def test_mamba_block_matches_torch_replica():
    cfg = MambaConfig(d_state=D_STATE, d_conv=D_CONV, expand=2, scan_impl="xla")
    d_inner = 2 * D_MODEL
    dt_rank = cfg.resolved_dt_rank(D_MODEL)
    g, x = _make_inputs(0)

    w_in = torch.randn(2 * d_inner, D_MODEL, generator=g) * D_MODEL**-0.5
    w_out = torch.randn(D_MODEL, d_inner, generator=g) * d_inner**-0.5
    head = TorchHeadParams(g, d_inner, D_STATE, D_CONV, dt_rank)

    xz = x @ w_in.T
    xp, z = xz.chunk(2, dim=-1)
    y = _t_head_forward(head, xp, z, dt_rank, D_STATE)
    out_torch = (y @ w_out.T).detach().numpy()

    block = MambaBlock(d_model=D_MODEL, cfg=cfg)
    params = {
        "in_proj": {"kernel": jnp.asarray(w_in.numpy()).T},
        "fwd": _head_flax_params(head),
        "out_proj": {"kernel": jnp.asarray(w_out.numpy()).T},
    }
    out_jax = block.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=2e-4, atol=2e-5)


def test_bimamba_block_matches_torch_replica():
    """BiMamba v2 (/root/reference/modules/mamba/bimamba.py:221-253):
    backward direction runs on the flipped sequence with its own
    parameter set; output = out_proj(0.5*fwd + 0.5*flip(bwd))."""
    cfg = MambaConfig(d_state=D_STATE, d_conv=D_CONV, expand=2, scan_impl="xla")
    d_inner = 2 * D_MODEL
    dt_rank = cfg.resolved_dt_rank(D_MODEL)
    g, x = _make_inputs(1)

    w_in = (
        torch.randn(2 * d_inner, D_MODEL, generator=g) * D_MODEL**-0.5
    ).requires_grad_()
    w_out = torch.randn(D_MODEL, d_inner, generator=g) * d_inner**-0.5
    fwd = TorchHeadParams(g, d_inner, D_STATE, D_CONV, dt_rank)
    bwd = TorchHeadParams(g, d_inner, D_STATE, D_CONV, dt_rank)

    xz = x @ w_in.T
    xp, z = xz.chunk(2, dim=-1)
    y_f = _t_head_forward(fwd, xp, z, dt_rank, D_STATE)
    y_b = _t_head_forward(
        bwd, torch.flip(xp, [1]), torch.flip(z, [1]), dt_rank, D_STATE
    )
    y = 0.5 * y_f + 0.5 * torch.flip(y_b, [1])
    out_torch = y @ w_out.T

    block = BiMambaBlock(d_model=D_MODEL, cfg=cfg)
    params = {
        "in_proj": {"kernel": jnp.asarray(w_in.detach().numpy()).T},
        "fwd": _head_flax_params(fwd),
        "bwd": _head_flax_params(bwd),
        "out_proj": {"kernel": jnp.asarray(w_out.detach().numpy()).T},
    }
    xj = jnp.asarray(x.numpy())
    out_jax = block.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.asarray(out_jax), out_torch.detach().numpy(), rtol=2e-4, atol=2e-5
    )

    # Gradient cross-check: d loss / d params must agree with torch
    # autograd through the sequential replica (validates the parallel
    # associative-scan adjoint end to end, not just the forward).
    probe = torch.randn(BATCH, L, D_MODEL, generator=g)
    (out_torch * probe).sum().backward()
    probe_j = jnp.asarray(probe.numpy())

    def loss_fn(p):
        return (block.apply({"params": p}, xj) * probe_j).sum()

    grads = jax.grad(loss_fn)(params)
    checks = {
        ("fwd", "A_log"): fwd.A_log.grad,
        ("fwd", "dt_bias"): fwd.dt_bias.grad,
        ("fwd", "D"): fwd.D.grad,
        ("bwd", "A_log"): bwd.A_log.grad,
        ("bwd", "dt_kernel"): bwd.dt_w.grad.T,
        ("fwd", "conv_b"): fwd.conv_b.grad,
    }
    for (head_name, key), g_t in checks.items():
        g_j = np.asarray(grads[head_name][key])
        np.testing.assert_allclose(
            g_j, g_t.detach().numpy(), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch: {head_name}/{key}",
        )
    g_in = np.asarray(grads["in_proj"]["kernel"])
    np.testing.assert_allclose(
        g_in, w_in.grad.detach().numpy().T, rtol=5e-3, atol=1e-4
    )


def test_mamba_step_matches_torch_replica():
    """O(1) decode path (bimamba.py:320-366) agrees with the replica's
    full-sequence scan at every position."""
    cfg = MambaConfig(d_state=D_STATE, d_conv=D_CONV, expand=2, scan_impl="ref")
    d_inner = 2 * D_MODEL
    dt_rank = cfg.resolved_dt_rank(D_MODEL)
    g, x = _make_inputs(2)

    w_in = torch.randn(2 * d_inner, D_MODEL, generator=g) * D_MODEL**-0.5
    w_out = torch.randn(D_MODEL, d_inner, generator=g) * d_inner**-0.5
    head = TorchHeadParams(g, d_inner, D_STATE, D_CONV, dt_rank)

    xz = x @ w_in.T
    xp, z = xz.chunk(2, dim=-1)
    y = _t_head_forward(head, xp, z, dt_rank, D_STATE)
    out_torch = (y @ w_out.T).detach().numpy()

    block = MambaBlock(d_model=D_MODEL, cfg=cfg)
    params = {
        "params": {
            "in_proj": {"kernel": jnp.asarray(w_in.numpy()).T},
            "fwd": _head_flax_params(head),
            "out_proj": {"kernel": jnp.asarray(w_out.numpy()).T},
        }
    }
    cache = block.apply(params, BATCH, method=MambaBlock.init_cache)
    xj = jnp.asarray(x.numpy())
    outs = []
    for t in range(L):
        y_t, cache = block.apply(params, xj[:, t], cache, method=MambaBlock.step)
        outs.append(np.asarray(y_t))
    np.testing.assert_allclose(
        np.stack(outs, axis=1), out_torch, rtol=2e-4, atol=2e-5
    )
