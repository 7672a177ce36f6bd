"""Conformer encoder (the O(L^2) attention baseline path).

Reference: /root/reference/modules/Conformer.py —
ConformerEncoderLayer (:1511-1630): Macaron structure

    x = x + 0.5 * ffn1(x)            # ffn includes its own pre-LN
    x = x + MHA(LN(x))               # RelPosMHAXL by default
    x = x + ConvModule(x)
    x = LN(x + 0.5 * ffn2(x))

ConformerEncoder (:1737-2175). Streaming (forward_streaming,
:1632-1717): each layer carries (a) up to `left_context_frames` of its
pre-MHA activations — attention runs over [left, chunk] and keeps the
chunk outputs — and (b) a (kernel-1)/2 conv tail for the Dynamic Chunk
Convolution; reproduced here as explicit state pytrees
(init_stream_state / forward_chunk).
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
    ConvolutionModule,
    PositionalwiseFeedForward,
    swish,
)
from mamba_asr_tpu.models.stacking import ScannedStack

Array = jax.Array

MACARON_FFN_SCALE = 0.5  # Conformer.py:156-158


class ConformerEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    left_context_frames: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.ffn1_norm = nn.LayerNorm(dtype=self.dtype)
        self.ffn1 = PositionalwiseFeedForward(
            self.d_ffn, self.activation, self.dropout, dtype=self.dtype
        )
        self.ffn2_norm = nn.LayerNorm(dtype=self.dtype)
        self.ffn2 = PositionalwiseFeedForward(
            self.d_ffn, self.activation, self.dropout, dtype=self.dtype
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        if self.attention_type == "RelPosMHAXL":
            self.mha = RelPosMHAXL(
                self.nhead, self.dropout, mask_pos_future=self.causal,
                dtype=self.dtype,
            )
        elif self.attention_type == "hypermixing":
            # Reference construction Conformer.py:1543-1549: tied=False,
            # hypernet_size=d_ffn, fix_tm_hidden_size=False.
            from mamba_asr_tpu.models.hypermixing import HyperMixing

            self.mha = HyperMixing(
                input_output_dim=self.d_model,
                hypernet_size=self.d_ffn,
                tied=False,
                num_heads=self.nhead,
                fix_tm_hidden_size=False,
                dtype=self.dtype,
            )
        else:
            self.mha = MultiheadAttention(
                self.nhead, self.dropout, dtype=self.dtype
            )
        self.conv = ConvolutionModule(
            d_model=self.d_model,
            kernel_size=self.kernel_size,
            bias=self.bias,
            activation=self.activation,
            dropout=self.dropout,
            causal=self.causal,
            dtype=self.dtype,
        )

    def _ffn(self, which: int, x: Array, train: bool) -> Array:
        norm = self.ffn1_norm if which == 1 else self.ffn2_norm
        ffn = self.ffn1 if which == 1 else self.ffn2
        return self.drop(ffn(norm(x), train=train), deterministic=not train)

    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        src_key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        conv_mask = (
            src_key_padding_mask[..., None]
            if src_key_padding_mask is not None
            else None
        )
        x = x + MACARON_FFN_SCALE * self._ffn(1, x, train)

        skip = x
        xn = self.norm1(x)
        att_out, attn = self.mha(
            xn, xn, xn,
            attn_mask=src_mask,
            key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs,
            train=train,
        )
        x = att_out + skip

        x = x + self.conv(x, conv_mask, chunk_size=chunk_size, train=train)
        x = self.norm2(x + MACARON_FFN_SCALE * self._ffn(2, x, train))
        # Layer-boundary activation sharding (batch over "data"; no-op
        # without an active multi-device mesh).
        from mamba_asr_tpu.parallel.mesh import constrain_batch

        return constrain_batch(x), attn

    # -- streaming ----------------------------------------------------------

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        return {
            # Pre-MHA activations of the previous chunk(s) + a validity
            # count (ramps up from 0 at stream start).
            "mha_left": jnp.zeros(
                (batch, self.left_context_frames, self.d_model), dtype
            ),
            "mha_left_len": jnp.zeros((batch,), jnp.int32),
            "conv": self.conv.init_stream_state(batch, dtype),
        }

    def forward_chunk(self, x: Array, state) -> Tuple[Array, dict]:
        """Chunked streaming forward (Conformer.py:1632-1717 semantics)."""
        lc = self.left_context_frames
        x = x + MACARON_FFN_SCALE * self._ffn(1, x, False)

        skip = x
        xn = self.norm1(x)
        window = jnp.concatenate([state["mha_left"].astype(xn.dtype), xn],
                                 axis=1)
        chunk = x.shape[1]
        # Mask out left-context slots not yet filled.
        filled = state["mha_left_len"]  # (B,)
        pad_mask = jnp.concatenate(
            [
                jnp.arange(lc)[None, :] < (lc - filled[:, None]),
                jnp.zeros((x.shape[0], chunk), bool),
            ],
            axis=1,
        )
        pos = rel_pos_encoding(window.shape[1], self.d_model, dtype=xn.dtype)
        att_out, _ = self.mha(
            window, window, window,
            key_padding_mask=pad_mask,
            pos_embs=pos,
        )
        # Queries included the left context; keep the chunk tail only.
        x = (att_out[:, lc:] if lc else att_out) + skip

        c, conv_tail = self.conv.forward_chunk(x, state["conv"])
        x = x + c
        x = self.norm2(x + MACARON_FFN_SCALE * self._ffn(2, x, False))

        new_left = window[:, -lc:] if lc else state["mha_left"]
        new_len = jnp.minimum(filled + chunk, lc)
        return x, {
            "mha_left": new_left,
            "mha_left_len": new_len,
            "conv": conv_tail,
        }


class ConformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    left_context_frames: int = 16
    scan_layers: bool = False
    # Recompute layer activations in bwd (memory <-> time; long seqs).
    remat_layers: bool = False
    dtype: Any = jnp.float32

    def _layer_kwargs(self) -> dict:
        return dict(
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            nhead=self.nhead,
            kernel_size=self.kernel_size,
            activation=self.activation,
            bias=self.bias,
            dropout=self.dropout,
            causal=self.causal,
            attention_type=self.attention_type,
            left_context_frames=self.left_context_frames,
            dtype=self.dtype,
        )

    def setup(self):
        if self.scan_layers:
            self.stack = ScannedStack(
                layer_cls=ConformerEncoderLayer,
                num_layers=self.num_layers,
                layer_kwargs=self._layer_kwargs(),
                remat=self.remat_layers,
                name="stack",
            )
            self.layers = ()
        else:
            self.layers = [
                ConformerEncoderLayer(**self._layer_kwargs(),
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

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        if self.scan_layers:
            from mamba_asr_tpu.models.stacking import scanned_stream_state

            return scanned_stream_state(
                ConformerEncoderLayer, self._layer_kwargs(),
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


class ConformerDecoderLayer(nn.Module):
    """Conformer *decoder* layer (/root/reference/modules/Conformer.py:
    2178-2442): the Macaron skeleton with CROSS-attention over the
    encoder memory in the MHA slot and a causal ConvModule providing the
    target-side (autoregressive) mixing — there is NO target
    self-attention in this design:

        tgt = tgt + 0.5 * ffn1(tgt)
        x = tgt + MHA(LN(tgt), memory, memory)      # cross-attn only
        x = x + CausalConvModule(x)
        x = LN(x + 0.5 * ffn2(x))

    The reference class is unreachable from its own configs
    (Transformer.py:764-788 only builds transformer/mamba decoders);
    ported for component parity, and — unlike the reference — wired as a
    selectable `decoder_module: conformer` in ASRModel. Cross-attention
    is regularMHA (the reference forces regularMHA in every decoder it
    actually builds, Transformer.py:773)."""

    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        assert self.causal, (
            "ConformerDecoderLayer must be causal (the conv is the only "
            "autoregressive mixer; the reference warns on non-causal too)"
        )
        self.ffn1_norm = nn.LayerNorm(dtype=self.dtype)
        self.ffn1 = PositionalwiseFeedForward(
            self.d_ffn, self.activation, self.dropout, dtype=self.dtype
        )
        self.ffn2_norm = nn.LayerNorm(dtype=self.dtype)
        self.ffn2 = PositionalwiseFeedForward(
            self.d_ffn, self.activation, self.dropout, dtype=self.dtype
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.mha = MultiheadAttention(
            self.nhead, self.dropout, dtype=self.dtype
        )
        self.conv = ConvolutionModule(
            d_model=self.d_model,
            kernel_size=self.kernel_size,
            bias=self.bias,
            activation=self.activation,
            dropout=self.dropout,
            causal=True,
            dtype=self.dtype,
        )

    def _ffn(self, which: int, x: Array, train: bool) -> Array:
        norm = self.ffn1_norm if which == 1 else self.ffn2_norm
        ffn = self.ffn1 if which == 1 else self.ffn2
        return self.drop(ffn(norm(x), train=train), deterministic=not train)

    def __call__(
        self,
        tgt: Array,
        memory: Array,
        memory_key_padding_mask: Optional[Array] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        tgt = tgt + MACARON_FFN_SCALE * self._ffn(1, tgt, train)
        att_out, attn = self.mha(
            self.norm1(tgt), memory, memory,
            key_padding_mask=memory_key_padding_mask,
            train=train,
        )
        x = att_out + tgt
        x = x + self.conv(x, None, train=train)
        x = self.norm2(x + MACARON_FFN_SCALE * self._ffn(2, x, train))
        return x, attn


class ConformerDecoder(nn.Module):
    """Layer stack + final LN (/root/reference/modules/Conformer.py:
    2444-2479)."""

    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            ConformerDecoderLayer(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                activation=self.activation,
                bias=self.bias,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")

    def __call__(
        self,
        tgt: Array,
        memory: Array,
        memory_key_padding_mask: Optional[Array] = None,
        train: bool = False,
    ) -> Tuple[Array, list]:
        attns = []
        out = tgt
        for layer in self.layers:
            out, attn = layer(
                out, memory,
                memory_key_padding_mask=memory_key_padding_mask,
                train=train,
            )
            attns.append(attn)
        return self.norm(out), attns
