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

TPU-native additions over the reference:
- chunk-level *streaming* encode (init_stream_state / forward_chunk):
  forward-scan SSM state + conv tails carried across chunks — the
  ConMamba streaming path the reference documents but never implemented
  (SURVEY.md §3.3);
- an O(1)-per-token decode cache for the decoder (init_cache /
  prime_cache / step): the cross-mamba state is primed by scanning the
  encoder memory once, then each generated token is a single state
  update — replacing the reference's full-prefix re-scan per beam step
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
from mamba_asr_tpu.models.stacking import ScannedStack
from mamba_asr_tpu.models.mamba import BiMambaBlock, MambaBlock, MambaConfig

Array = jax.Array

FFN_RESIDUAL_SCALE = 0.5  # Conmamba.py ConMambaConstants.FFN_RESIDUAL_SCALE


class ConmambaEncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    bidirectional: bool = True
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
        if self.causal or not self.bidirectional:
            self.mamba = MambaBlock(self.d_model, self.mamba_cfg,
                                    dtype=self.dtype)
        else:
            self.mamba = BiMambaBlock(self.d_model, self.mamba_cfg,
                                      dtype=self.dtype)
        self.conv = ConvolutionModule(
            d_model=self.d_model,
            kernel_size=self.kernel_size,
            bias=self.bias,
            activation=self.activation,
            dropout=self.dropout,
            causal=self.causal,
            # Time-sharded (sequence-parallel) execution propagates from
            # the mamba config: the conv module is the only other
            # time-coupled op in the layer.
            seq_axis=self.mamba_cfg.seq_axis,
            dtype=self.dtype,
        )

    def _ffn(self, which: int, x: Array, train: bool) -> Array:
        norm = self.ffn1_norm if which == 1 else self.ffn2_norm
        ffn = self.ffn1 if which == 1 else self.ffn2
        return self.drop(ffn(norm(x), train=train), deterministic=not train)

    def __call__(
        self,
        x: Array,
        src_key_padding_mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        del src_key_padding_mask  # reference zeroes conv_mask (Conmamba.py:631)
        x = x + FFN_RESIDUAL_SCALE * self._ffn(1, x, train)
        x = self.mamba(self.norm1(x)) + x
        x = x + self.conv(x, None, chunk_size=chunk_size, train=train)
        x = self.norm2(x + FFN_RESIDUAL_SCALE * self._ffn(2, x, train))
        # Layer-boundary activation sharding (batch over "data"; no-op
        # without an active multi-device mesh).
        from mamba_asr_tpu.parallel.mesh import constrain_batch

        return constrain_batch(x)

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        return {
            "mamba": self.mamba.init_stream_state(batch, dtype),
            "conv": self.conv.init_stream_state(batch, dtype),
        }

    def forward_chunk(self, x: Array, state) -> Tuple[Array, dict]:
        x = x + FFN_RESIDUAL_SCALE * self._ffn(1, x, False)
        y, mamba_state = self.mamba.forward_chunk(self.norm1(x), state["mamba"])
        x = y + x
        c, conv_tail = self.conv.forward_chunk(x, state["conv"])
        x = x + c
        x = self.norm2(x + FFN_RESIDUAL_SCALE * self._ffn(2, x, False))
        return x, {"mamba": mamba_state, "conv": conv_tail}


class ConmambaEncoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    kernel_size: int = 31
    activation: Callable[[Array], Array] = swish
    bias: bool = True
    dropout: float = 0.0
    causal: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    bidirectional: bool = True
    # Stack layers with nn.scan (stacked params, O(1)-depth compile).
    # Checkpoint layouts differ between the two modes.
    scan_layers: bool = False
    # Recompute layer activations in bwd (memory <-> time; long seqs).
    remat_layers: bool = False
    dtype: Any = jnp.float32

    def _layer_kwargs(self) -> dict:
        return dict(
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            kernel_size=self.kernel_size,
            activation=self.activation,
            bias=self.bias,
            dropout=self.dropout,
            causal=self.causal,
            mamba_cfg=self.mamba_cfg,
            bidirectional=self.bidirectional,
            dtype=self.dtype,
        )

    def setup(self):
        if self.scan_layers:
            self.stack = ScannedStack(
                layer_cls=ConmambaEncoderLayer,
                num_layers=self.num_layers,
                layer_kwargs=self._layer_kwargs(),
                remat=self.remat_layers,
                name="stack",
            )
            self.layers = ()
        else:
            self.layers = [
                ConmambaEncoderLayer(**self._layer_kwargs(), name=f"layer_{i}")
                for i in range(self.num_layers)
            ]
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")

    def __call__(
        self,
        src: Array,
        src_key_padding_mask: Optional[Array] = None,
        chunk_size: Optional[int] = None,
        train: bool = False,
    ) -> Array:
        out = src
        if self.scan_layers:
            out = self.stack(out, None, chunk_size=chunk_size,
                             train=train)
        else:
            for layer in self.layers:
                out = layer(out, src_key_padding_mask, chunk_size=chunk_size,
                            train=train)
        return self.norm(out)

    def init_stream_state(self, batch: int, dtype=jnp.float32):
        if self.scan_layers:
            from mamba_asr_tpu.models.stacking import scanned_stream_state

            return scanned_stream_state(
                ConmambaEncoderLayer, self._layer_kwargs(),
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


class MambaDecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    activation: Callable[[Array], Array] = nn.relu
    dropout: float = 0.0
    normalize_before: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    dtype: Any = jnp.float32

    def setup(self):
        # Decoder mambas are always unidirectional (Conmamba.py:854-862).
        self.self_mamba = MambaBlock(self.d_model, self.mamba_cfg,
                                     dtype=self.dtype)
        self.cross_mamba = MambaBlock(self.d_model, self.mamba_cfg,
                                      dtype=self.dtype)
        self.pos_ffn = PositionalwiseFeedForward(
            self.d_ffn, self.activation, self.dropout, dtype=self.dtype
        )
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, tgt: Array, memory: Array, train: bool = False) -> Array:
        d = lambda h: self.drop(h, deterministic=not train)

        x = self.norm1(tgt) if self.normalize_before else tgt
        tgt = tgt + d(self.self_mamba(x))
        if not self.normalize_before:
            tgt = self.norm1(tgt)

        x = self.norm2(tgt) if self.normalize_before else tgt
        # Cross-mamba: scan over [memory; tgt], keep the tgt tail
        # (Conmamba.py:932-934).
        joint = jnp.concatenate([memory, x], axis=1)
        cross = self.cross_mamba(joint)[:, -x.shape[1]:]
        tgt = tgt + d(cross)
        if not self.normalize_before:
            tgt = self.norm2(tgt)

        x = self.norm3(tgt) if self.normalize_before else tgt
        tgt = tgt + d(self.pos_ffn(x, train=train))
        if not self.normalize_before:
            tgt = self.norm3(tgt)
        return tgt

    # -- O(1) decode cache --------------------------------------------------

    def init_cache(self, batch: int, dtype=jnp.float32):
        return {
            "self": self.self_mamba.init_cache(batch, dtype),
            "cross": self.cross_mamba.init_cache(batch, dtype),
        }

    def prime_cache(self, memory: Array, cache) -> dict:
        """Run the cross-mamba over the encoder memory once, keeping its
        (conv_state, ssm_state) so decode steps continue the scan."""
        return {"self": cache["self"],
                "cross": self.cross_mamba.prime(memory)}

    def extend_cache(self, memory_chunk: Array, cache) -> dict:
        """Advance the cross-mamba state with further encoder memory
        (incremental priming for long-form streaming)."""
        return {
            "self": cache["self"],
            "cross": self.cross_mamba.extend_prime(
                memory_chunk, cache["cross"]
            ),
        }

    def step(self, tgt_t: Array, cache) -> Tuple[Array, dict]:
        """Single-token decode step. tgt_t: (B, d_model)."""
        x = self.norm1(tgt_t) if self.normalize_before else tgt_t
        y, self_cache = self.self_mamba.step(x, cache["self"])
        tgt_t = tgt_t + y
        if not self.normalize_before:
            tgt_t = self.norm1(tgt_t)

        x = self.norm2(tgt_t) if self.normalize_before else tgt_t
        y, cross_cache = self.cross_mamba.step(x, cache["cross"])
        tgt_t = tgt_t + y
        if not self.normalize_before:
            tgt_t = self.norm2(tgt_t)

        x = self.norm3(tgt_t) if self.normalize_before else tgt_t
        tgt_t = tgt_t + self.pos_ffn(x)
        if not self.normalize_before:
            tgt_t = self.norm3(tgt_t)
        return tgt_t, {"self": self_cache, "cross": cross_cache}


class MambaDecoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    activation: Callable[[Array], Array] = nn.relu
    dropout: float = 0.0
    normalize_before: bool = False
    mamba_cfg: MambaConfig = MambaConfig()
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            MambaDecoderLayer(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                activation=self.activation,
                dropout=self.dropout,
                normalize_before=self.normalize_before,
                mamba_cfg=self.mamba_cfg,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")

    def __call__(self, tgt: Array, memory: Array, train: bool = False) -> Array:
        out = tgt
        for layer in self.layers:
            out = layer(out, memory, train=train)
        return self.norm(out)

    def init_cache(self, batch: int, dtype=jnp.float32):
        return [l.init_cache(batch, dtype) for l in self.layers]

    def prime_cache(self, memory: Array, cache) -> list:
        """Prime every layer's cross-mamba with the encoder memory.

        Layer i's cross input is layer i-1's *full* output sequence, so
        priming must run the full stack over the memory... but the memory
        only feeds cross_mamba directly (the tgt stream is separate), so
        each layer's cross cache depends only on `memory` itself — prime
        all layers from the same memory tensor.
        """
        return [l.prime_cache(memory, c) for l, c in zip(self.layers, cache)]

    def extend_cache(self, memory_chunk: Array, cache) -> list:
        return [
            l.extend_cache(memory_chunk, c)
            for l, c in zip(self.layers, cache)
        ]

    def step(self, tgt_t: Array, cache) -> Tuple[Array, list]:
        new = []
        x = tgt_t
        for layer, c in zip(self.layers, cache):
            x, c2 = layer.step(x, c)
            new.append(c2)
        return self.norm(x), new
