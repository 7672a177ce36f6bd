"""Mamba and bidirectional Mamba (BiMamba v2) blocks in flax.linen.

Behavioral contract from the reference's vendored Vim implementation
(/root/reference/modules/mamba/bimamba.py):

- `MambaBlock` == class Mamba with bimamba_type="none": shared in_proj
  (d_model -> 2*d_inner, no bias), depthwise causal conv (k=d_conv, bias)
  + SiLU, x_proj (d_inner -> dt_rank + 2*d_state, no bias), dt_proj
  (dt_rank -> d_inner; its bias enters the scan as delta_bias under
  softplus), S4D-real A_log init, D skip init to ones, out_proj
  (d_inner -> d_model, no bias).  (bimamba.py:81-134, 271-315)
- `BiMambaBlock` == bimamba_type="v2": shared in_proj/out_proj, separate
  fwd/bwd conv, x_proj, dt_proj, A_log, D; output = out_proj(0.5*fwd +
  0.5*flip(bwd(flip(x)))) since if_devide_out defaults True.
  (bimamba.py:146-174, 221-253)
- O(1) decode step carrying (conv_state, ssm_state), mirroring
  Mamba.step / allocate_inference_cache (bimamba.py:320-406).

TPU-native: the recurrence runs through ops.selective_scan (parallel
associative scan / Pallas kernel) instead of a sequential CUDA kernel;
projections are plain Dense matmuls that XLA maps onto the MXU; the
whole block is functional so streaming state is an explicit pytree.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_step
from mamba_asr_tpu.ops.selective_scan import selective_scan, ssm_step

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    """Hyperparameters of a Mamba mixer (reference bimamba.py:40-61)."""

    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None  # None -> ceil(d_model / 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    # "auto" | "xla" | "pallas" | "ref" — forwarded to ops.selective_scan.
    scan_impl: str = "auto"
    # Sequence parallelism: name of a mesh axis the TIME dimension is
    # sharded over. When set, the block must run inside jax.shard_map
    # with (B, L, D) activations sharded on L over that axis; the conv
    # exchanges halos and the scan chains states across shards
    # (parallel/sequence.py). Batch __call__ paths only — the O(1)
    # step/streaming caches are inherently sequential and unsharded.
    seq_axis: Optional[str] = None

    def resolved_dt_rank(self, d_model: int) -> int:
        return self.dt_rank or math.ceil(d_model / 16)


def _dt_proj_kernel_init(dt_rank: int, cfg: MambaConfig):
    std = dt_rank**-0.5 * cfg.dt_scale
    if cfg.dt_init == "constant":
        return nn.initializers.constant(std)
    if cfg.dt_init == "random":

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(
                key, shape, dtype, minval=-std, maxval=std
            )

        return init
    raise NotImplementedError(cfg.dt_init)


def _dt_bias_init(cfg: MambaConfig):
    """softplus(bias) ~ LogUniform(dt_min, dt_max)  (bimamba.py:110-118)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(
            u * (math.log(cfg.dt_max) - math.log(cfg.dt_min))
            + math.log(cfg.dt_min)
        )
        dt = jnp.maximum(dt, cfg.dt_init_floor)
        # Inverse of softplus.
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


def _a_log_init(d_state: int):
    """S4D-real: A[d, n] = n+1, stored as log  (bimamba.py:122-129)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        d_inner, n = shape
        a = jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32)[None, :], (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


class _ScanHead(nn.Module):
    """One direction's scan parameters: conv + x_proj + dt_proj + A, D.

    Factored out so BiMambaBlock instantiates two of them around shared
    in/out projections, exactly like the reference's *_b parameter set.
    """

    d_inner: int
    dt_rank: int
    cfg: MambaConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.conv_w = self.param(
            "conv_w",
            nn.initializers.lecun_normal(),
            (cfg.d_conv, self.d_inner),
            jnp.float32,
        )
        self.conv_b = (
            self.param("conv_b", nn.initializers.zeros, (self.d_inner,), jnp.float32)
            if cfg.conv_bias
            else None
        )
        self.x_proj = nn.Dense(
            self.dt_rank + 2 * cfg.d_state,
            use_bias=False,
            dtype=self.dtype,
            name="x_proj",
        )
        self.dt_kernel = self.param(
            "dt_kernel",
            _dt_proj_kernel_init(self.dt_rank, cfg),
            (self.dt_rank, self.d_inner),
            jnp.float32,
        )
        self.dt_bias = self.param(
            "dt_bias", _dt_bias_init(cfg), (self.d_inner,), jnp.float32
        )
        self.a_log = self.param(
            "A_log", _a_log_init(cfg.d_state), (self.d_inner, cfg.d_state), jnp.float32
        )
        self.d_skip = self.param("D", nn.initializers.ones, (self.d_inner,), jnp.float32)

    def _dt_bc(self, x: Array):
        cfg = self.cfg
        x_dbl = self.x_proj(x)  # (..., dt_rank + 2N)
        dt, b_mat, c_mat = jnp.split(
            x_dbl, [self.dt_rank, self.dt_rank + cfg.d_state], axis=-1
        )
        delta = dt @ self.dt_kernel.astype(dt.dtype)
        return delta, b_mat, c_mat

    def __call__(self, x: Array, z: Array, reverse: bool = False) -> Array:
        """reverse=True scans global time right-to-left; only meaningful
        under sequence parallelism (cfg.seq_axis) — the unsharded
        BiMamba flips the data instead."""
        if self.cfg.seq_axis is not None:
            from mamba_asr_tpu.parallel.sequence import (
                sp_causal_conv1d,
                sp_selective_scan,
            )

            x = sp_causal_conv1d(
                x, self.conv_w, self.conv_b, activation="silu",
                axis_name=self.cfg.seq_axis, reverse=reverse,
            )
            delta, b_mat, c_mat = self._dt_bc(x)
            return sp_selective_scan(
                x, delta, -jnp.exp(self.a_log), b_mat, c_mat,
                D=self.d_skip, z=z, delta_bias=self.dt_bias,
                delta_softplus=True, implementation=self.cfg.scan_impl,
                axis_name=self.cfg.seq_axis, reverse=reverse,
            )
        assert not reverse, "reverse scan requires cfg.seq_axis"
        x = causal_conv1d(x, self.conv_w, self.conv_b, activation="silu")
        delta, b_mat, c_mat = self._dt_bc(x)
        # softplus(dt + bias) stays INSIDE the scan op: computing it in
        # XLA instead is bit-identical but SHAPE-DEPENDENT on hardware —
        # −8 % fwd at d_inner 1024 (compute-bound cell) yet +36 % at
        # d_inner 288, because the pre-computed dt must travel to the
        # kernel as fp32 (2× the bf16 delta's HBM bytes), which dominates
        # at narrow widths (scripts/ab_softplus_outside.py, DESIGN §8b).
        return selective_scan(
            x,
            delta,
            -jnp.exp(self.a_log),
            b_mat,
            c_mat,
            D=self.d_skip,
            z=z,
            delta_bias=self.dt_bias,
            delta_softplus=True,
            implementation=self.cfg.scan_impl,
        )

    def step(
        self, x_t: Array, z_t: Array, cache: Tuple[Array, Array]
    ) -> Tuple[Array, Tuple[Array, Array]]:
        """O(1) single-token update. x_t, z_t: (B, d_inner)."""
        conv_state, ssm_state = cache
        x_c, conv_state = causal_conv1d_step(conv_state, x_t, self.conv_w, self.conv_b)
        delta, b_mat, c_mat = self._dt_bc(x_c)
        y, ssm_state = ssm_step(
            ssm_state, x_c, delta, -jnp.exp(self.a_log), b_mat, c_mat,
            D=self.d_skip, z=z_t, delta_bias=self.dt_bias, delta_softplus=True,
        )
        return y, (conv_state, ssm_state)

    def forward_chunk(
        self, x: Array, z: Array, cache: Tuple[Array, Array]
    ) -> Tuple[Array, Tuple[Array, Array]]:
        """Chunk-level streaming: carried conv tail + SSM state.

        cache = (conv_tail (B, K-1, d_inner) of raw pre-conv inputs,
                 ssm_state (B, d_inner, N)).
        """
        conv_tail, h = cache
        k = self.cfg.d_conv
        buf = jnp.concatenate([conv_tail.astype(x.dtype), x], axis=1)
        new_tail = buf[:, -(k - 1):]
        x_c = causal_conv1d(buf, self.conv_w, self.conv_b, activation="silu")
        x_c = x_c[:, k - 1:]
        delta, b_mat, c_mat = self._dt_bc(x_c)
        y, h_new = selective_scan(
            x_c, delta, -jnp.exp(self.a_log), b_mat, c_mat,
            D=self.d_skip, z=z, delta_bias=self.dt_bias, delta_softplus=True,
            h0=h, return_last_state=True,
            implementation=self.cfg.scan_impl,
        )
        return y, (new_tail, h_new)


class MambaBlock(nn.Module):
    """Unidirectional Mamba mixer (reference bimamba.py, type "none")."""

    d_model: int
    cfg: MambaConfig = MambaConfig()
    dtype: Any = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.cfg.expand * self.d_model

    def setup(self):
        cfg = self.cfg
        self.in_proj = nn.Dense(
            2 * self.d_inner, use_bias=cfg.bias, dtype=self.dtype, name="in_proj"
        )
        self.head = _ScanHead(
            self.d_inner, cfg.resolved_dt_rank(self.d_model), cfg,
            dtype=self.dtype, name="fwd",
        )
        self.out_proj = nn.Dense(
            self.d_model, use_bias=cfg.bias, dtype=self.dtype, name="out_proj"
        )

    def __call__(self, x: Array) -> Array:
        """x: (B, L, d_model) -> (B, L, d_model)."""
        xz = self.in_proj(x)
        x_in, z = jnp.split(xz, 2, axis=-1)
        y = self.head(x_in, z)
        return self.out_proj(y)

    def init_cache(self, batch: int, dtype=jnp.float32) -> Tuple[Array, Array]:
        """(conv_state (B,K,Din), ssm_state (B,Din,N)) — bimamba.py:367-378."""
        return (
            jnp.zeros((batch, self.cfg.d_conv, self.d_inner), dtype),
            jnp.zeros((batch, self.d_inner, self.cfg.d_state), jnp.float32),
        )

    def step(
        self, x_t: Array, cache: Tuple[Array, Array]
    ) -> Tuple[Array, Tuple[Array, Array]]:
        """Single-token decode. x_t: (B, d_model)."""
        xz = self.in_proj(x_t)
        x_in, z = jnp.split(xz, 2, axis=-1)
        y, cache = self.head.step(x_in, z, cache)
        return self.out_proj(y), cache

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        """(conv_tail (B, K-1, Din), ssm_state (B, Din, N)) for
        chunk-level streaming."""
        return (
            jnp.zeros((batch, self.cfg.d_conv - 1, self.d_inner), dtype),
            jnp.zeros((batch, self.d_inner, self.cfg.d_state), jnp.float32),
        )

    def extend_prime(
        self, x_seq: Array, cache: Tuple[Array, Array]
    ) -> Tuple[Array, Array]:
        """Advance a step-format cache by scanning a further context
        chunk — lets the decoder's cross-mamba ingest encoder memory
        incrementally (long-form streaming S2S: each new audio chunk
        extends every layer's cross state in one scan)."""
        conv_state, h = cache
        k = self.cfg.d_conv
        head = self.head
        tail = conv_state[:, 1:]  # last K-1 raw inputs
        xz = self.in_proj(x_seq)
        x_in, z = jnp.split(xz, 2, axis=-1)
        buf = jnp.concatenate([tail.astype(x_in.dtype), x_in], axis=1)
        x_c = causal_conv1d(buf, head.conv_w, head.conv_b, activation="silu")
        x_c = x_c[:, k - 1:]
        delta, b_mat, c_mat = head._dt_bc(x_c)
        _, h_new = selective_scan(
            x_c, delta, -jnp.exp(head.a_log), b_mat, c_mat,
            D=head.d_skip, z=z, delta_bias=head.dt_bias, delta_softplus=True,
            h0=h, return_last_state=True,
            implementation=self.cfg.scan_impl,
        )
        new_tail = buf[:, -(k - 1):]
        new_conv_state = jnp.concatenate(
            [jnp.zeros_like(new_tail[:, :1]), new_tail], axis=1
        )
        return (new_conv_state, h_new)

    def prime(self, x_seq: Array) -> Tuple[Array, Array]:
        """Scan a context sequence and return the step-cache positioned
        after it — used to prime the decoder's cross-mamba with the
        encoder memory so generation continues the scan in O(1)/token."""
        head = self.head
        k = self.cfg.d_conv
        xz = self.in_proj(x_seq)
        x_in, z = jnp.split(xz, 2, axis=-1)
        x_c = causal_conv1d(x_in, head.conv_w, head.conv_b, activation="silu")
        delta, b_mat, c_mat = head._dt_bc(x_c)
        _, h = selective_scan(
            x_c, delta, -jnp.exp(head.a_log), b_mat, c_mat,
            D=head.d_skip, z=z, delta_bias=head.dt_bias, delta_softplus=True,
            return_last_state=True,
            implementation=self.cfg.scan_impl,
        )
        # Step conv_state holds the last K raw inputs (most recent last);
        # the oldest slot is rolled off on the first step.
        pad_rows = max(k - 1 - x_seq.shape[1], 0)
        tail = x_in[:, x_in.shape[1] - (k - 1 - pad_rows):]
        if pad_rows:
            tail = jnp.concatenate(
                [jnp.zeros((x_in.shape[0], pad_rows, self.d_inner),
                           x_in.dtype), tail], axis=1,
            )
        conv_state = jnp.concatenate(
            [jnp.zeros_like(tail[:, :1]), tail], axis=1
        )
        return (conv_state, h)

    def forward_chunk(self, x: Array, cache) -> Tuple[Array, Tuple]:
        """Chunk-level streaming forward. x: (B, L_chunk, d_model)."""
        xz = self.in_proj(x)
        x_in, z = jnp.split(xz, 2, axis=-1)
        y, cache = self.head.forward_chunk(x_in, z, cache)
        return self.out_proj(y), cache


class BiMambaBlock(nn.Module):
    """Bidirectional Mamba (reference bimamba.py bimamba_type="v2").

    out = out_proj(0.5 * scan_fwd(xz) + 0.5 * flip(scan_bwd(flip(xz))))
    with independent parameters per direction but shared in/out
    projections (bimamba.py:221-253, if_devide_out=True default).
    """

    d_model: int
    cfg: MambaConfig = MambaConfig()
    dtype: Any = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.cfg.expand * self.d_model

    def setup(self):
        cfg = self.cfg
        dt_rank = cfg.resolved_dt_rank(self.d_model)
        self.in_proj = nn.Dense(
            2 * self.d_inner, use_bias=cfg.bias, dtype=self.dtype, name="in_proj"
        )
        self.fwd = _ScanHead(self.d_inner, dt_rank, cfg, dtype=self.dtype, name="fwd")
        self.bwd = _ScanHead(self.d_inner, dt_rank, cfg, dtype=self.dtype, name="bwd")
        self.out_proj = nn.Dense(
            self.d_model, use_bias=cfg.bias, dtype=self.dtype, name="out_proj"
        )

    def __call__(self, x: Array) -> Array:
        """x: (B, L, d_model) -> (B, L, d_model)."""
        xz = self.in_proj(x)
        x_in, z = jnp.split(xz, 2, axis=-1)
        y_f = self.fwd(x_in, z)
        if self.cfg.seq_axis is not None:
            # Time is sharded: the anti-causal direction runs via the
            # ops' reverse flag (shard chain traversed last-to-first)
            # instead of materialized global flips.
            y_b = self.bwd(x_in, z, reverse=True)
        else:
            y_b = self.bwd(x_in[:, ::-1], z[:, ::-1])[:, ::-1]
        return self.out_proj(0.5 * y_f + 0.5 * y_b)

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        """Streaming state of the *forward* direction only."""
        return (
            jnp.zeros((batch, self.cfg.d_conv - 1, self.d_inner), dtype),
            jnp.zeros((batch, self.d_inner, self.cfg.d_state), jnp.float32),
        )

    def forward_chunk(self, x: Array, cache) -> Tuple[Array, Tuple]:
        """Chunk-level streaming: the forward scan carries state across
        chunks; the backward scan is chunk-local (it would need future
        context — the standard streaming compromise for bidirectional
        SSMs; the reference never implemented ConMamba streaming at all,
        SURVEY.md §3.3)."""
        xz = self.in_proj(x)
        x_in, z = jnp.split(xz, 2, axis=-1)
        y_f, cache = self.fwd.forward_chunk(x_in, z, cache)
        y_b = self.bwd(x_in[:, ::-1], z[:, ::-1])[:, ::-1]
        return self.out_proj(0.5 * y_f + 0.5 * y_b), cache
