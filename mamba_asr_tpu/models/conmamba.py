"""ConMamba encoder and Mamba decoder (the SSM architectures).

Reference: /root/reference/modules/Conmamba.py —

ConmambaEncoderLayer (:623-650):
    x = x + 0.5 * ffn1(x)         # ffn has its own pre-LN
    x = x + mamba(LN(x))          # BiMamba when not causal & bidirectional
    x = x + ConvModule(x)
    x = LN(x + 0.5 * ffn2(x))

ConmambaEncoder (:653-727): layer stack + final LN. Note the reference
prints that dropout is unused inside Mamba (:670); dropout only appears
in the FFN/conv submodules, reproduced here.

MambaDecoderLayer (:883-953):
    tgt += self_mamba(tgt)                          (+LN per norm style)
    tgt += cross_mamba(cat([memory, tgt], axis=1))[:, -len(tgt):]
    tgt += ffn(tgt)
The cross-"attention" is a causal scan over the concatenated
[encoder memory; target] sequence, keeping the target positions —
attention via state instead of pairwise scores. No masks are needed
(inherent causality).

MambaDecoder (:956-1031): layer stack + final LN.

TPU notes: the decoder's O(1)-per-token decode cache (conv tail + SSM
state per mamba) is first-class here — `init_cache`/`step` mirror
bimamba.py:320-406 and are used by the S2S beam search so ConMambaMamba
decodes without the reference's full-prefix re-scan per step
(SURVEY.md §3.2 note).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.models.layers import (
    ConvolutionModule,
    PositionalwiseFeedForward,
    swish,
)
from mamba_asr_tpu.models.mamba import BiMambaBlock, MambaBlock, MambaConfig

Array = jax.Array

FFN_RESIDUAL_SCALE = 0.5  # Conmamba.py ConMambaConstants.FFN_RESIDUAL_SCALE


class ConmambaEncoderLayer(nn.Module):
    d_ffn: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        src_key_padding_mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        del src_key_padding_mask  # reference zeroes conv_mask (Conmamba.py:631)
        d_model = x.shape[-1]
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

        x = x + FFN_RESIDUAL_SCALE * ffn("ffn1")(x)

        skip = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.causal or not self.bidirectional:
            mamba = MambaBlock(d_model, self.mamba_cfg, dtype=self.dtype,
                               name="mamba")
        else:
            mamba = BiMambaBlock(d_model, self.mamba_cfg, dtype=self.dtype,
                                 name="mamba")
        x = mamba(x) + skip

        x = x + ConvolutionModule(
            kernel_size=self.kernel_size,
            bias=self.bias,
            activation=self.activation,
            dropout=self.dropout,
            causal=self.causal,
            dtype=self.dtype,
            name="conv",
        )(x, None, chunk_size=chunk_size, train=train)

        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            x + FFN_RESIDUAL_SCALE * ffn("ffn2")(x)
        )
        return x


class ConmambaEncoder(nn.Module):
    num_layers: int
    d_ffn: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    bidirectional: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: Array,
        src_key_padding_mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        out = src
        for i in range(self.num_layers):
            out = ConmambaEncoderLayer(
                d_ffn=self.d_ffn,
                kernel_size=self.kernel_size,
                activation=self.activation,
                bias=self.bias,
                dropout=self.dropout,
                causal=self.causal,
                mamba_cfg=self.mamba_cfg,
                bidirectional=self.bidirectional,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(out, src_key_padding_mask, chunk_size=chunk_size, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(out)


class MambaDecoderLayer(nn.Module):
    d_ffn: int
    activation: Callable[[Array], Array] = nn.relu
    dropout: float = 0.0
    normalize_before: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    dtype: Any = jnp.float32

    # Decoder mambas are always unidirectional (Conmamba.py:854-862).

    @nn.compact
    def __call__(
        self,
        tgt: Array,
        memory: Array,
        train: bool = False,
    ) -> Array:
        d_model = tgt.shape[-1]
        drop = nn.Dropout(self.dropout, deterministic=not train)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        self_mamba = MambaBlock(d_model, self.mamba_cfg, dtype=self.dtype,
                                name="self_mamba")
        cross_mamba = MambaBlock(d_model, self.mamba_cfg, dtype=self.dtype,
                                 name="cross_mamba")

        x = norm1(tgt) if self.normalize_before else tgt
        tgt = tgt + drop(self_mamba(x))
        if not self.normalize_before:
            tgt = norm1(tgt)

        x = norm2(tgt) if self.normalize_before else tgt
        # Cross-mamba: scan over [memory; tgt], keep the tgt tail
        # (Conmamba.py:932-934).
        joint = jnp.concatenate([memory, x], axis=1)
        cross = cross_mamba(joint)[:, -x.shape[1]:]
        tgt = tgt + drop(cross)
        if not self.normalize_before:
            tgt = norm2(tgt)

        x = norm3(tgt) if self.normalize_before else tgt
        ffn_out = PositionalwiseFeedForward(
            self.d_ffn, self.activation, self.dropout, dtype=self.dtype,
            name="ffn",
        )(x, train=train)
        tgt = tgt + drop(ffn_out)
        if not self.normalize_before:
            tgt = norm3(tgt)
        return tgt


class MambaDecoder(nn.Module):
    num_layers: int
    d_ffn: int
    activation: Callable[[Array], Array] = nn.relu
    dropout: float = 0.0
    normalize_before: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: Array, memory: Array, train: bool = False) -> Array:
        out = tgt
        for i in range(self.num_layers):
            out = MambaDecoderLayer(
                d_ffn=self.d_ffn,
                activation=self.activation,
                dropout=self.dropout,
                normalize_before=self.normalize_before,
                mamba_cfg=self.mamba_cfg,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(out, memory, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(out)
