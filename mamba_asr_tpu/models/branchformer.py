"""Branchformer encoder (parallel attention + cgMLP branches).

The reference ADVERTISES this encoder — `encoder_module="branchformer"`
is a documented option of its model factory
(/root/reference/modules/TransformerASR.py:571-572, with the cgMLP
hyperparameters `csgu_linear_units`/`gate_activation`/
`use_linear_after_conv` threaded at :700-702) — but its selection branch
references an undefined `BranchformerEncoder`
(/root/reference/modules/Transformer.py:728) and raises NameError: the
path is aspirational, dead in every reference config. PARITY.md records
it as such; this module CLOSES that config space with a working
implementation of the published architecture (Peng et al. 2022,
"Branchformer: Parallel MLP-Attention Architectures to Capture Local
and Global Context", arXiv 2207.02971), built TPU-first in this repo's
idiom.

Per layer, two branches read the SAME input in parallel and merge:

    xa = Dropout(MHA(LN(x)))                        # global context
    xb = Dropout(cgMLP(LN(x)))                      # local context
    x  = x + Dropout(Dense_{2d->d}(concat[xa, xb]))

cgMLP (gMLP with a Convolutional Spatial Gating Unit):

    u = act(Dense_{d->U}(x))           # U = csgu_linear_units
    r, g = split(u, 2)                 # each U/2
    g = DepthwiseConv1d(LN(g), K)      # spatial (time) mixing
    g = gate_act(g)                    # Identity by default
    y = Dropout(r * g); out = Dense_{U/2->d}(y)

Init follows the paper: the depthwise-conv kernel starts near zero with
bias 1 so each CSGU begins as the identity gate (g ~= 1, y ~= r) and the
network learns where to mix time.

Dynamic Chunk Training and streaming mirror the Conformer encoder's
(the reference's Conformer streaming semantics, Conformer.py:1632-1717,
applied to this architecture): chunked attention arrives via src_mask,
the CSGU conv runs the shared Dynamic Chunk Convolution under
`chunk_size`, and `init_stream_state`/`forward_chunk` carry a left
attention-context window plus the conv tail across chunks — streaming
output == the chunked-training forward, chunk by chunk (tested).

TPU mapping: both branches are matmul-shaped (MXU) except the depthwise
conv (XLA depthwise, fp32-pinned like the Conformer ConvModule) and run
from one shared residual read; the merge concat is fused into the output
projection by XLA. Mask convention: True = padded/disallowed. The gate
branch is zeroed on padded rows BEFORE the conv so valid frames near the
boundary see exactly the zeros a shorter batch would give them
(padding-invariant outputs; tested).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.models.attention import (
    MultiheadAttention,
    RelPosMHAXL,
    rel_pos_encoding,
)
from mamba_asr_tpu.models.layers import (
    _depthwise_conv1d,
    dynamic_chunk_depthwise,
)
from mamba_asr_tpu.models.stacking import ScannedStack

Array = jax.Array


def _gelu_exact(x: Array) -> Array:
    # Repo convention (models/asr.py::_ACTIVATIONS): the string "gelu"
    # means ERF-exact; flax's tanh default is exposed only as the
    # explicit opt-in "gelu_tanh".
    return nn.gelu(x, approximate=False)


_GATE_ACTIVATIONS = {
    "identity": lambda x: x,
    "gelu": _gelu_exact,
    "tanh": jnp.tanh,
    "silu": nn.silu,
    "swish": nn.silu,
}


class ConvolutionalSpatialGatingUnit(nn.Module):
    """CSGU: gate half the channels with a depthwise-conv'd view of the
    other half (arXiv 2207.02971 §3.2; hyperparameter surface
    /root/reference/modules/TransformerASR.py:700-702)."""

    units: int  # input feature size U; the output is U // 2
    kernel_size: int = 31
    causal: bool = False
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @property
    def padding_amount(self) -> int:
        if self.causal:
            return self.kernel_size - 1
        return (self.kernel_size - 1) // 2

    def setup(self):
        half = self.units // 2
        self.norm = nn.LayerNorm(dtype=self.dtype)
        # Identity-at-init gating: kernel ~ 0, bias = 1 -> g ~= 1.
        self.dw_kernel = self.param(
            "dw_kernel",
            nn.initializers.normal(stddev=1e-6),
            (self.kernel_size, half),
            jnp.float32,
        )
        self.dw_bias = self.param(
            "dw_bias", nn.initializers.ones, (half,), jnp.float32
        )
        if self.use_linear_after_conv:
            self.linear_after_conv = nn.Dense(
                half,
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(stddev=1e-6),
                bias_init=nn.initializers.ones,
            )
        self.drop = nn.Dropout(self.dropout)

    def _gate_post(self, g: Array, r: Array, train: bool) -> Array:
        if self.use_linear_after_conv:
            g = self.linear_after_conv(g)
        g = _GATE_ACTIVATIONS[self.gate_activation](g)
        return self.drop(r * g, deterministic=not train)

    def __call__(
        self,
        x: Array,
        pad_mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        """x (B, L, U) -> (B, L, U//2); pad_mask (B, L) True = padded."""
        half = self.units // 2
        r, g = x[..., :half], x[..., half:]
        g = self.norm(g)
        if pad_mask is not None:
            # Zero padded rows BEFORE the conv: boundary-adjacent valid
            # frames then see the same zeros a shorter batch would.
            g = jnp.where(pad_mask[..., None], 0.0, g)
        if chunk_size is not None:
            # Dynamic Chunk Convolution (shared with the Conformer conv
            # module): per-chunk left context, zero future.
            assert not self.causal, "chunked conv incompatible with causal"
            g = dynamic_chunk_depthwise(
                g, self.dw_kernel, self.dw_bias, self.padding_amount,
                chunk_size,
            )
        elif self.causal:
            g = _depthwise_conv1d(
                g, self.dw_kernel, self.dw_bias,
                [(self.padding_amount, 0)],
            )
        else:
            p = self.padding_amount
            g = _depthwise_conv1d(
                g, self.dw_kernel, self.dw_bias,
                [(p, self.kernel_size - 1 - p)],
            )
        return self._gate_post(g, r, train)

    # -- streaming ---------------------------------------------------------

    def init_stream_state(self, batch: int, dtype=jnp.float32) -> Array:
        """Left-context tail of the normed gate branch: (B, pad, U//2)."""
        return jnp.zeros(
            (batch, self.padding_amount, self.units // 2), dtype
        )

    def forward_chunk(self, x: Array, tail: Array) -> Tuple[Array, Array]:
        """Conv over [tail, chunk]; non-causal convs see zero right
        padding (the per-chunk Dynamic Chunk Convolution view), causal
        convs are exact. Returns (out, new_tail)."""
        half = self.units // 2
        r, g = x[..., :half], x[..., half:]
        g = self.norm(g)
        pad = self.padding_amount
        buf = jnp.concatenate([tail.astype(g.dtype), g], axis=1)
        new_tail = buf[:, -pad:] if pad else tail
        if not self.causal and pad:
            buf = jnp.pad(buf, ((0, 0), (0, pad), (0, 0)))
        g = _depthwise_conv1d(buf, self.dw_kernel, self.dw_bias, "VALID")
        return self._gate_post(g, r, False), new_tail


class CgMLP(nn.Module):
    """Channel proj up -> activation -> CSGU -> channel proj down."""

    d_model: int
    csgu_linear_units: int = 3072
    kernel_size: int = 31
    causal: bool = False
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    activation: Callable[[Array], Array] = _gelu_exact
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.channel_proj1 = nn.Dense(
            self.csgu_linear_units, dtype=self.dtype
        )
        self.csgu = ConvolutionalSpatialGatingUnit(
            units=self.csgu_linear_units,
            kernel_size=self.kernel_size,
            causal=self.causal,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.channel_proj2 = nn.Dense(self.d_model, dtype=self.dtype)

    def __call__(
        self,
        x: Array,
        pad_mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        x = self.activation(self.channel_proj1(x))
        x = self.csgu(x, pad_mask=pad_mask, chunk_size=chunk_size,
                      train=train)
        return self.channel_proj2(x)

    def init_stream_state(self, batch: int, dtype=jnp.float32) -> Array:
        return self.csgu.init_stream_state(batch, dtype)

    def forward_chunk(self, x: Array, tail: Array) -> Tuple[Array, Array]:
        x = self.activation(self.channel_proj1(x))
        x, tail = self.csgu.forward_chunk(x, tail)
        return self.channel_proj2(x), tail


class BranchformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    kernel_size: int = 31
    csgu_linear_units: int = 3072
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    activation: Callable[[Array], Array] = _gelu_exact
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    left_context_frames: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.norm_mha = nn.LayerNorm(dtype=self.dtype)
        self.norm_mlp = nn.LayerNorm(dtype=self.dtype)
        if self.attention_type == "RelPosMHAXL":
            self.mha = RelPosMHAXL(
                self.nhead, self.dropout, mask_pos_future=self.causal,
                dtype=self.dtype,
            )
        elif self.attention_type == "hypermixing":
            # The reference's branchformer path is aspirational (NameError)
            # so there is no construction to mirror; hypernet_size follows
            # the conformer/transformer convention of "the layer's large
            # hidden dim", which here is csgu_linear_units.
            from mamba_asr_tpu.models.hypermixing import HyperMixing

            self.mha = HyperMixing(
                input_output_dim=self.d_model,
                hypernet_size=self.csgu_linear_units,
                tied=False,
                num_heads=self.nhead,
                fix_tm_hidden_size=False,
                dtype=self.dtype,
            )
        else:
            self.mha = MultiheadAttention(
                self.nhead, self.dropout, dtype=self.dtype
            )
        self.cgmlp = CgMLP(
            d_model=self.d_model,
            csgu_linear_units=self.csgu_linear_units,
            kernel_size=self.kernel_size,
            causal=self.causal,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            activation=self.activation,
            dropout=self.dropout,
            dtype=self.dtype,
        )
        self.merge_proj = nn.Dense(self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        src_key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        deterministic = not train

        if self.causal and self.attention_type != "RelPosMHAXL":
            # RelPosMHAXL masks the future itself (mask_pos_future);
            # regularMHA needs an explicit lookahead mask or a "causal"
            # layer would silently attend forward.
            from mamba_asr_tpu.models.transformer import get_lookahead_mask

            la = get_lookahead_mask(x.shape[1])
            src_mask = la if src_mask is None else (src_mask | la)

        xa = self.norm_mha(x)
        xa, attn = self.mha(
            xa, xa, xa,
            attn_mask=src_mask,
            key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs,
            train=train,
        )
        xa = self.drop(xa, deterministic=deterministic)

        xb = self.norm_mlp(x)
        xb = self.cgmlp(xb, pad_mask=src_key_padding_mask,
                        chunk_size=chunk_size, train=train)
        xb = self.drop(xb, deterministic=deterministic)

        merged = self.merge_proj(jnp.concatenate([xa, xb], axis=-1))
        x = x + self.drop(merged, deterministic=deterministic)
        from mamba_asr_tpu.parallel.mesh import constrain_batch

        return constrain_batch(x), attn

    # -- streaming ---------------------------------------------------------

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        return {
            # Post-norm_mha activations of the previous chunk(s) + a
            # validity count (ramps up from 0 at stream start).
            "mha_left": jnp.zeros(
                (batch, self.left_context_frames, self.d_model), dtype
            ),
            "mha_left_len": jnp.zeros((batch,), jnp.int32),
            "csgu": self.cgmlp.init_stream_state(batch, dtype),
        }

    def forward_chunk(self, x: Array, state) -> Tuple[Array, dict]:
        """Chunked streaming forward (the Conformer streaming semantics,
        Conformer.py:1632-1717, applied to the Branchformer layer):
        attention over [carried left context, chunk], conv-tail carry in
        the CSGU."""
        lc = self.left_context_frames
        xa = self.norm_mha(x)
        window = jnp.concatenate([state["mha_left"].astype(xa.dtype), xa],
                                 axis=1)
        chunk = x.shape[1]
        filled = state["mha_left_len"]  # (B,)
        pad_mask = jnp.concatenate(
            [
                jnp.arange(lc)[None, :] < (lc - filled[:, None]),
                jnp.zeros((x.shape[0], chunk), bool),
            ],
            axis=1,
        )
        pos = rel_pos_encoding(window.shape[1], self.d_model, dtype=xa.dtype)
        att_out, _ = self.mha(
            window, window, window,
            key_padding_mask=pad_mask,
            pos_embs=pos,
        )
        xa = att_out[:, lc:] if lc else att_out

        xb, csgu_tail = self.cgmlp.forward_chunk(
            self.norm_mlp(x), state["csgu"]
        )

        merged = self.merge_proj(jnp.concatenate([xa, xb], axis=-1))
        x = x + merged
        new_left = window[:, -lc:] if lc else state["mha_left"]
        new_len = jnp.minimum(filled + chunk, lc)
        return x, {
            "mha_left": new_left,
            "mha_left_len": new_len,
            "csgu": csgu_tail,
        }


class BranchformerEncoder(nn.Module):
    """Stack of Branchformer layers + final LN (the repo's encoder-stack
    convention, matching ConformerEncoder)."""

    num_layers: int
    d_model: int
    nhead: int
    kernel_size: int = 31
    csgu_linear_units: int = 3072
    use_linear_after_conv: bool = False
    gate_activation: str = "identity"
    activation: Callable[[Array], Array] = _gelu_exact
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    left_context_frames: int = 16
    scan_layers: bool = False
    remat_layers: bool = False
    dtype: Any = jnp.float32

    def _layer_kwargs(self) -> dict:
        return dict(
            d_model=self.d_model,
            nhead=self.nhead,
            kernel_size=self.kernel_size,
            csgu_linear_units=self.csgu_linear_units,
            use_linear_after_conv=self.use_linear_after_conv,
            gate_activation=self.gate_activation,
            activation=self.activation,
            dropout=self.dropout,
            causal=self.causal,
            attention_type=self.attention_type,
            left_context_frames=self.left_context_frames,
            dtype=self.dtype,
        )

    def setup(self):
        if self.scan_layers:
            self.stack = ScannedStack(
                layer_cls=BranchformerEncoderLayer,
                num_layers=self.num_layers,
                layer_kwargs=self._layer_kwargs(),
                remat=self.remat_layers,
                name="stack",
            )
            self.layers = ()
        else:
            self.layers = [
                BranchformerEncoderLayer(**self._layer_kwargs(),
                                         name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")

    def __call__(
        self,
        src: Array,
        src_mask: Optional[Array] = None,
        src_key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        out = src
        attn = None
        if self.scan_layers:
            out = self.stack(out, src_mask, src_key_padding_mask, pos_embs,
                             chunk_size=chunk_size, train=train)
        else:
            for layer in self.layers:
                out, attn = layer(out, src_mask, src_key_padding_mask,
                                  pos_embs, chunk_size=chunk_size,
                                  train=train)
        return self.norm(out), attn

    # -- streaming ---------------------------------------------------------

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        if self.scan_layers:
            from mamba_asr_tpu.models.stacking import scanned_stream_state

            return scanned_stream_state(
                BranchformerEncoderLayer, self._layer_kwargs(),
                self.num_layers, batch, dtype,
            )
        return [l.init_stream_state(batch, dtype) for l in self.layers]

    def forward_chunk(self, x: Array, state) -> Tuple[Array, list]:
        if self.scan_layers:
            from mamba_asr_tpu.models.stacking import stream_chunk_scanned

            x, new_state = stream_chunk_scanned(self.stack, x, state)
            return self.norm(x), new_state
        new_state = []
        for layer, s in zip(self.layers, state):
            x, s2 = layer.forward_chunk(x, s)
            new_state.append(s2)
        return self.norm(x), new_state
