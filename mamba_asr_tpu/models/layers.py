"""Shared model layers: FFN, Conformer convolution module, conv frontend.

Reference behaviors reproduced:
- PositionalwiseFeedForward (SpeechBrain nnet.attention, used by both
  Conformer and ConMamba layers): Dense(d_ffn) -> activation -> dropout
  -> Dense(d_model).
- ConvolutionModule (/root/reference/modules/Conformer.py:759-1230, and
  its near-identical copy /root/reference/modules/Conmamba.py:182-454):
  LN -> pointwise 2x expansion + GLU -> depthwise conv (k=31) -> LN +
  Swish + pointwise Dense -> dropout, with causal chomp or symmetric
  padding, plus the Dynamic Chunk Convolution path (pad/reframe into
  per-chunk windows so no output frame sees past its chunk end).
- ConvolutionFrontEnd (SpeechBrain lobes.models.convolution, configured
  at /root/reference/hparams/CTC/conmamba_large.yaml:186-194): N blocks
  of Conv2d(stride 2) + LayerNorm + activation -> 4x time downsampling.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def swish(x: Array) -> Array:
    return jax.nn.silu(x)


class PositionalwiseFeedForward(nn.Module):
    """Dense(d_ffn) -> activation -> dropout -> Dense(d_model)."""

    d_ffn: int
    activation: Callable[[Array], Array] = swish
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        d_model = x.shape[-1]
        h = nn.Dense(self.d_ffn, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(d_model, dtype=self.dtype)(h)


class CNNFeedForward(nn.Module):
    """1d-CNN positionwise FFN: Conv1d(d_ffn, k0) -> ReLU -> Conv1d(d_model,
    k1) — the reference's `ffn_type: 1dcnn` encoder-layer option
    (/root/reference/modules/Transformer.py:1115-1130), with causal
    left-padding when `causal` (padding="causal" there)."""

    d_ffn: int
    kernel_sizes: Tuple[int, int] = (3, 3)
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        del train  # the reference's 1dcnn branch has no dropout inside
        d_model = x.shape[-1]
        pad = "CAUSAL" if self.causal else "SAME"
        h = nn.Conv(self.d_ffn, (self.kernel_sizes[0],), padding=pad,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        return nn.Conv(d_model, (self.kernel_sizes[1],), padding=pad,
                       dtype=self.dtype, name="conv2")(h)


def _depthwise_conv1d(
    x: Array, kernel: Array, bias: Optional[Array], padding
) -> Array:
    """x (B, L, D), kernel (K, D) -> (B, L', D) depthwise conv."""
    d = x.shape[-1]
    k = kernel.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        kernel.reshape(k, 1, d).astype(x.dtype),
        window_strides=(1,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=d,
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class ConvolutionModule(nn.Module):
    """Conformer convolution module with Dynamic Chunk Convolution.

    Matches /root/reference/modules/Conformer.py:1005-1230. `mask` is a
    padding mask (True where padded) applied to the output; with
    `chunk_size` set, the depthwise conv is computed per chunk with only
    left context visible (Dynamic Chunk Convolution,
    Conformer.py:1090-1213).
    """

    kernel_size: int = 31
    bias: bool = True
    activation: Callable[[Array], Array] = swish
    dropout: float = 0.0
    causal: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32
    # Sequence parallelism: mesh axis the time dim is sharded over (run
    # inside jax.shard_map); the depthwise conv exchanges halo frames
    # with neighbour shards instead of zero-padding (parallel/sequence).
    seq_axis: Optional[str] = None

    d_model: int = 0  # required (static, for setup-time param shapes)

    @property
    def padding_amount(self) -> int:
        if self.causal:
            return (self.kernel_size - 1) * self.dilation
        return (self.kernel_size - 1) * self.dilation // 2

    def setup(self):
        assert self.d_model > 0, "ConvolutionModule requires d_model"
        self.layer_norm = nn.LayerNorm(dtype=self.dtype, name="layer_norm")
        self.bottleneck = nn.Dense(
            2 * self.d_model, use_bias=self.bias, dtype=self.dtype,
            name="bottleneck",
        )
        self.dw_kernel = self.param(
            "dw_kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.d_model),
            jnp.float32,
        )
        self.dw_bias = (
            self.param("dw_bias", nn.initializers.zeros, (self.d_model,),
                       jnp.float32)
            if self.bias
            else None
        )
        self.after_norm = nn.LayerNorm(dtype=self.dtype, name="after_norm")
        self.pointwise_out = nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            name="pointwise_out",
        )
        self.drop = nn.Dropout(self.dropout)

    def _pre(self, x: Array) -> Array:
        out = self.layer_norm(x)
        out = self.bottleneck(out)
        a, g = jnp.split(out, 2, axis=-1)
        return a * jax.nn.sigmoid(g)

    def _post(self, out: Array, mask, train: bool) -> Array:
        out = self.after_norm(out)
        out = self.activation(out)
        out = self.pointwise_out(out)
        out = self.drop(out, deterministic=not train)
        if mask is not None:
            out = jnp.where(mask, 0.0, out)
        return out

    def __call__(
        self,
        x: Array,
        mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        out = self._pre(x)
        if self.seq_axis is not None:
            assert chunk_size is None, (
                "dynamic-chunk conv is incompatible with sequence "
                "parallelism (chunk windows would straddle shards)"
            )
            assert self.dilation == 1
            from mamba_asr_tpu.parallel.sequence import sp_halo_exchange

            p = self.padding_amount
            left, right = (p, 0) if self.causal else (p, p)
            buf = sp_halo_exchange(out, left, right, self.seq_axis)
            out = _depthwise_conv1d(buf, self.dw_kernel, self.dw_bias,
                                    "VALID")
        elif chunk_size is not None:
            assert not self.causal, "chunked conv incompatible with causal"
            assert self.dilation == 1
            out = self._chunked_depthwise(
                out, self.dw_kernel, self.dw_bias, chunk_size
            )
        elif self.causal:
            out = _depthwise_conv1d(
                out, self.dw_kernel, self.dw_bias, [(self.padding_amount, 0)]
            )
        else:
            p = self.padding_amount
            out = _depthwise_conv1d(out, self.dw_kernel, self.dw_bias, [(p, p)])
        return self._post(out, mask, train)

    def init_stream_state(self, batch: int, dtype=jnp.float32) -> Array:
        """Left-context tail carried across chunks: (B, pad, D)."""
        return jnp.zeros((batch, self.padding_amount, self.d_model), dtype)

    def forward_chunk(
        self, x: Array, tail: Array
    ) -> Tuple[Array, Array]:
        """Streaming chunk: conv over [tail, chunk]; non-causal convs see
        zero right padding (the per-chunk view of Dynamic Chunk
        Convolution, Conformer.py:1701-1707), causal convs are exact.
        Returns (out, new_tail)."""
        out = self._pre(x)
        pad = self.padding_amount
        buf = jnp.concatenate([tail.astype(out.dtype), out], axis=1)
        new_tail = buf[:, -pad:] if pad else tail
        if not self.causal and pad:
            buf = jnp.pad(buf, ((0, 0), (0, pad), (0, 0)))
        conv = _depthwise_conv1d(buf, self.dw_kernel, self.dw_bias, "VALID")
        return self._post(conv, None, False), new_tail

    def _chunked_depthwise(
        self, x: Array, kernel: Array, bias: Optional[Array], chunk_size: int
    ) -> Array:
        return dynamic_chunk_depthwise(
            x, kernel, bias, self.padding_amount, chunk_size
        )


def dynamic_chunk_depthwise(
    x: Array, kernel: Array, bias: Optional[Array], pad: int,
    chunk_size: int,
) -> Array:
    """Dynamic Chunk Convolution (Conformer.py:1090-1213).

    Frames the padded sequence into per-chunk windows carrying `pad`
    frames of left context and zero right context, runs a VALID
    depthwise conv per chunk, and re-flattens. Shared by the Conformer
    ConvolutionModule and the Branchformer CSGU.
    """
    bsz, t, d = x.shape
    rem = t % chunk_size
    right = (chunk_size - rem) if rem else 0
    num_chunks = (t + right) // chunk_size
    xp = jnp.pad(x, ((0, 0), (pad, right), (0, 0)))
    # Windows of [left context (pad frames) + chunk]; the right side of
    # each window is *zero*-padded (future masked), not real frames.
    win = pad + chunk_size
    starts = jnp.arange(num_chunks) * chunk_size
    idx = starts[:, None] + jnp.arange(win)[None, :]
    windows = xp[:, idx]  # (B, num_chunks, win, D)
    windows = jnp.pad(windows, ((0, 0), (0, 0), (0, pad), (0, 0)))
    windows = windows.reshape(bsz * num_chunks, win + pad, d)
    out = _depthwise_conv1d(windows, kernel, bias, "VALID")
    # VALID output length = win - k + 1 = chunk_size + 2*pad - k + 1
    # = chunk_size (k = 2*pad + 1).
    out = out.reshape(bsz, num_chunks * chunk_size, d)
    return out[:, :t]


class ConvolutionFrontEnd(nn.Module):
    """Conv2d subsampling stack: (B, T, n_mels) -> (B, T/2^N, F', C_last).

    Matches the reference's CNN frontend (2 blocks, out_channels (64, 32),
    k=3, stride 2; /root/reference/hparams/CTC/conmamba_large.yaml:186-194).
    Output is flattened to (B, T', F'*C) by the caller (TransformerASR.py
    reshapes at :760-762).
    """

    out_channels: Sequence[int] = (64, 32)
    kernel_sizes: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        # Explicit names keep the param tree identical to the previous
        # nn.compact layout (conv0/norm0/...).
        for i, (c, k, s) in enumerate(
            zip(self.out_channels, self.kernel_sizes, self.strides)
        ):
            setattr(self, f"conv{i}", nn.Conv(
                c, (k, k), strides=(s, s), padding="SAME",
                dtype=self.dtype, name=f"conv{i}",
            ))
            setattr(self, f"norm{i}", nn.LayerNorm(
                dtype=self.dtype, name=f"norm{i}"
            ))
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, feats: Array, train: bool = False) -> Array:
        x = feats[..., None]  # (B, T, F, 1)
        for i in range(len(self.out_channels)):
            x = getattr(self, f"conv{i}")(x)
            x = getattr(self, f"norm{i}")(x)
            x = nn.leaky_relu(x)
            x = self.drop(x, deterministic=not train)
        return x  # (B, T', F', C)

    def apply_level(self, i: int, x: Array, time_pad: Tuple[int, int]) -> Array:
        """One subsampling level with EXPLICIT time padding (freq padding
        matches offline SAME for the static freq size) — the streaming
        building block: the caller buffers inputs so mid-stream chunks run
        VALID (time_pad (0,0)) and the session flush supplies the final
        (0,1) zero, reproducing the offline SAME computation exactly.

        x: (B, T, F, C_in) level input. Returns (B, T', F', C_out).
        """
        k = self.kernel_sizes[i]
        s = self.strides[i]
        f_in = x.shape[2]
        f_out = -(-f_in // s)
        f_tot = max((f_out - 1) * s + k - f_in, 0)
        p = self.variables["params"][f"conv{i}"]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            p["kernel"].astype(self.dtype),
            window_strides=(s, s),
            padding=[tuple(time_pad), (f_tot // 2, f_tot - f_tot // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + p["bias"].astype(self.dtype)
        y = getattr(self, f"norm{i}")(y)
        return nn.leaky_relu(y)

    def output_dim(self, n_mels: int) -> int:
        f = n_mels
        for s in self.strides:
            f = -(-f // s)
        return f * self.out_channels[-1]

    def downsample_factor(self) -> int:
        d = 1
        for s in self.strides:
            d *= s
        return d
