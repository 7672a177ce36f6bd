"""Conformer encoder (the O(L^2) attention baseline path).

Reference: /root/reference/modules/Conformer.py —
ConformerEncoderLayer (:1511-1630): Macaron structure

    x = x + 0.5 * ffn1(x)            # ffn includes its own pre-LN
    x = x + MHA(LN(x))               # RelPosMHAXL by default
    x = x + ConvModule(x)
    x = LN(x + 0.5 * ffn2(x))

ConformerEncoder (:1737-2175): layer stack; the chunked-mask +
Dynamic Chunk Convolution streaming capability is exposed through
`chunk_size`/`left_context_chunks` here, with the stateful per-chunk
streaming path in mamba_asr_tpu/models/streaming.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.models.attention import MultiheadAttention, RelPosMHAXL
from mamba_asr_tpu.models.layers import (
    ConvolutionModule,
    PositionalwiseFeedForward,
    swish,
)

Array = jax.Array

MACARON_FFN_SCALE = 0.5  # Conformer.py:156-158


class ConformerEncoderLayer(nn.Module):
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        src_mask: Optional[Array] = None,
        src_key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        drop = nn.Dropout(self.dropout, deterministic=not train)

        def ffn(name):
            def run(h):
                h = nn.LayerNorm(dtype=self.dtype, name=f"{name}_norm")(h)
                h = PositionalwiseFeedForward(
                    self.d_ffn, self.activation, self.dropout,
                    dtype=self.dtype, name=name,
                )(h, train=train)
                return drop(h)

            return run

        conv_mask = (
            src_key_padding_mask[..., None]
            if src_key_padding_mask is not None
            else None
        )

        x = x + MACARON_FFN_SCALE * ffn("ffn1")(x)

        skip = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.attention_type == "RelPosMHAXL":
            mha = RelPosMHAXL(
                self.nhead, self.dropout, mask_pos_future=self.causal,
                dtype=self.dtype, name="mha",
            )
        else:
            mha = MultiheadAttention(
                self.nhead, self.dropout, dtype=self.dtype, name="mha"
            )
        att_out, attn = mha(
            x, x, x,
            attn_mask=src_mask,
            key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs,
            train=train,
        )
        x = att_out + skip

        x = x + ConvolutionModule(
            kernel_size=self.kernel_size,
            bias=self.bias,
            activation=self.activation,
            dropout=self.dropout,
            causal=self.causal,
            dtype=self.dtype,
            name="conv",
        )(x, conv_mask, chunk_size=chunk_size, train=train)

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            x + MACARON_FFN_SCALE * ffn("ffn2")(x)
        )
        return x, attn


class ConformerEncoder(nn.Module):
    num_layers: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    attention_type: str = "RelPosMHAXL"
    dtype: Any = jnp.float32

    @nn.compact
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
        for i in range(self.num_layers):
            out, attn = ConformerEncoderLayer(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                activation=self.activation,
                bias=self.bias,
                dropout=self.dropout,
                causal=self.causal,
                attention_type=self.attention_type,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(out, src_mask, src_key_padding_mask, pos_embs,
              chunk_size=chunk_size, train=train)
        out = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        return out, attn
