"""Vanilla Transformer infrastructure: embeddings, PEs, masks, blocks.

Reference: /root/reference/modules/Transformer.py —
- PositionalEncoding (sinusoidal buffer, :796-1022),
- NormalizedEmbedding (embedding scaled by sqrt(d_model), :1650-1860),
- TransformerEncoderLayer/Encoder (:1025-1344; pre/post-norm),
- TransformerDecoderLayer/Decoder (:1347-1647; the reference's decoder is
  always causal with regularMHA, :773-774),
- mask helpers get_key_padding_mask/get_lookahead_mask (:1863-1933) and
  the chunked streaming mask make_transformer_src_mask
  (/root/reference/modules/TransformerASR.py:305-364).

Mask convention in this framework: boolean, True = disallowed/padded.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.models.attention import MultiheadAttention, RelPosMHAXL
from mamba_asr_tpu.models.layers import CNNFeedForward, PositionalwiseFeedForward

Array = jax.Array


# --------------------------------------------------------------------------
# Positional encodings / embeddings
# --------------------------------------------------------------------------


def sinusoidal_position_encoding(
    length: int, d_model: int, dtype=jnp.float32
) -> Array:
    """Absolute sinusoidal PE table (length, d_model)."""
    pos = jnp.arange(length, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe.astype(dtype)


class NormalizedEmbedding(nn.Module):
    """Token embedding scaled by sqrt(d_model) (Transformer.py:1851-1860)."""

    vocab_size: int
    d_model: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        emb = nn.Embed(
            self.vocab_size,
            self.d_model,
            dtype=self.dtype,
            embedding_init=nn.initializers.normal(stddev=1.0),
            name="embed",
        )(tokens)
        return emb * math.sqrt(self.d_model)


# --------------------------------------------------------------------------
# Masks
# --------------------------------------------------------------------------


def lengths_to_padding_mask(lengths: Array, max_len: int) -> Array:
    """(B,) absolute lengths -> (B, max_len) bool, True = padding."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def get_key_padding_mask(tokens: Array, pad_idx: int = 0) -> Array:
    """(B, L) tokens -> (B, L) bool, True where token == pad."""
    return tokens == pad_idx


def get_lookahead_mask(length: int) -> Array:
    """(L, L) bool causal mask, True above the diagonal (= disallowed)."""
    return jnp.triu(jnp.ones((length, length), bool), k=1)


def make_chunked_src_mask(
    length: int, chunk_size: int, left_context_chunks: Optional[int] = None
) -> Array:
    """Chunked-attention mask for Dynamic Chunk Training
    (TransformerASR.py:305-364): frame i may attend to frames in its own
    chunk and up to `left_context_chunks` chunks back (all past if None).
    Returns (L, L) bool, True = disallowed."""
    idx = jnp.arange(length)
    chunk_id = idx // chunk_size
    future = chunk_id[None, :] > chunk_id[:, None]
    if left_context_chunks is None:
        return future
    too_old = chunk_id[None, :] < (chunk_id[:, None] - left_context_chunks)
    return future | too_old


# --------------------------------------------------------------------------
# Encoder / decoder blocks
# --------------------------------------------------------------------------


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN block (Transformer.py:1025-1194)."""

    d_ffn: int
    nhead: int
    dropout: float = 0.1
    activation: Callable[[Array], Array] = nn.relu
    normalize_before: bool = False
    attention_type: str = "regularMHA"
    # "regularFFN" | "1dcnn" (Transformer.py:1107-1130); the CNN variant
    # uses `ffn_cnn_kernel_sizes` and causal padding when `causal`.
    ffn_type: str = "regularFFN"
    ffn_cnn_kernel_sizes: Tuple[int, int] = (3, 3)
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: Array,
        src_mask: Optional[Array] = None,
        src_key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        train: bool = False,
        cache: Optional[Tuple[Array, Array]] = None,
        cache_index: Optional[Array] = None,
        anc: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """With `cache`/`cache_index` (regularMHA only), src is one
        position (B, 1, D) and the second return is the updated KV cache
        instead of attention weights (incremental decoding). `anc`
        switches the cache to the append-only beam-gather layout
        (attention.py)."""
        if self.attention_type == "RelPosMHAXL":
            mha = RelPosMHAXL(self.nhead, self.dropout, dtype=self.dtype,
                              name="self_att")
        elif self.attention_type == "hypermixing":
            # Reference construction Transformer.py:1099-1106: tied=False,
            # hypernet_size=d_ffn, fix_tm_hidden_size=False. No KV-cache
            # decode path — hypermixing is an encoder-side option.
            from mamba_asr_tpu.models.hypermixing import HyperMixing

            src_d = src.shape[-1]
            mha = HyperMixing(
                input_output_dim=src_d,
                hypernet_size=self.d_ffn,
                tied=False,
                num_heads=self.nhead,
                fix_tm_hidden_size=False,
                dtype=self.dtype,
                name="self_att",
            )
        else:
            mha = MultiheadAttention(self.nhead, self.dropout,
                                     dtype=self.dtype, name="self_att")
        drop = nn.Dropout(self.dropout, deterministic=not train)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")

        x = norm1(src) if self.normalize_before else src
        att_out, attn = mha(
            x, x, x,
            attn_mask=src_mask,
            key_padding_mask=src_key_padding_mask,
            pos_embs=pos_embs,
            train=train,
            cache=cache,
            cache_index=cache_index,
            anc=anc,
        )
        src = src + drop(att_out)
        if not self.normalize_before:
            src = norm1(src)

        x = norm2(src) if self.normalize_before else src
        if self.ffn_type == "1dcnn":
            ffn_out = CNNFeedForward(
                self.d_ffn, self.ffn_cnn_kernel_sizes, causal=self.causal,
                dtype=self.dtype, name="ffn",
            )(x, train=train)
        else:
            ffn_out = PositionalwiseFeedForward(
                self.d_ffn, self.activation, self.dropout, dtype=self.dtype,
                name="ffn",
            )(x, train=train)
        src = src + drop(ffn_out)
        if not self.normalize_before:
            src = norm2(src)
        return src, attn


class TransformerEncoder(nn.Module):
    """Stack of encoder layers + final LN (Transformer.py:1197-1344),
    with optional layerdrop (training-time random layer skipping,
    Transformer.py:1324-1342)."""

    num_layers: int
    d_ffn: int
    nhead: int
    dropout: float = 0.1
    activation: Callable[[Array], Array] = nn.relu
    normalize_before: bool = False
    attention_type: str = "regularMHA"
    ffn_type: str = "regularFFN"
    ffn_cnn_kernel_sizes: Tuple[int, int] = (3, 3)
    causal: bool = False
    layerdrop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: Array,
        src_mask: Optional[Array] = None,
        src_key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        train: bool = False,
        cache: Optional[list] = None,
        cache_index: Optional[Array] = None,
        anc: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """With `cache` (list of per-layer (k_buf, v_buf)) and
        `cache_index`, src is a single position (B, 1, D) and the second
        return is the updated cache list (incremental decoding — used by
        the TransformerLM inside the beam search)."""
        out = src
        attn = None
        drop_keys = None
        if train and self.layerdrop > 0.0:
            drop_keys = jax.random.bernoulli(
                self.make_rng("dropout"), self.layerdrop, (self.num_layers,)
            )
        new_caches = []
        for i in range(self.num_layers):
            new_out, attn = TransformerEncoderLayer(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                ffn_type=self.ffn_type,
                ffn_cnn_kernel_sizes=self.ffn_cnn_kernel_sizes,
                causal=self.causal,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(out, src_mask, src_key_padding_mask, pos_embs, train=train,
              cache=None if cache is None else cache[i],
              cache_index=cache_index, anc=anc)
            if cache is not None:
                new_caches.append(attn)  # attn slot carries the new cache
            if drop_keys is not None:
                out = jnp.where(drop_keys[i], out, new_out)
            else:
                out = new_out
        out = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        return out, (new_caches if cache is not None else attn)


class TransformerDecoderLayer(nn.Module):
    """Causal self-attn + cross-attn + FFN (Transformer.py:1347-1524)."""

    d_ffn: int
    nhead: int
    dropout: float = 0.1
    activation: Callable[[Array], Array] = nn.relu
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: Array,
        memory: Optional[Array],
        tgt_mask: Optional[Array] = None,
        memory_mask: Optional[Array] = None,
        tgt_key_padding_mask: Optional[Array] = None,
        memory_key_padding_mask: Optional[Array] = None,
        train: bool = False,
        cache: Optional[dict] = None,
        cache_index: Optional[Array] = None,
        compute_cross_kv: bool = False,
        anc: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array]:
        """Incremental decoding:
        - `compute_cross_kv=True`: returns the cross-attention's projected
          (k, v) of `memory` (computed once when priming a decode cache).
        - `cache={'self': (k_buf, v_buf), 'cross': (k, v)}` + `cache_index`:
          tgt is one position (B, 1, D); self-attention appends at
          cache_index, cross-attention uses the precomputed memory K/V;
          returns (tgt, new_cache, None).
        """
        if compute_cross_kv:
            kv = MultiheadAttention(
                self.nhead, self.dropout, dtype=self.dtype, name="cross_attn"
            )(memory, memory, memory, precompute_kv=True)
            return kv, None, None

        drop = nn.Dropout(self.dropout, deterministic=not train)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        stepping = cache is not None

        x = norm1(tgt) if self.normalize_before else tgt
        sa_out, sa = MultiheadAttention(
            self.nhead, self.dropout, dtype=self.dtype, name="self_attn"
        )(x, x, x, attn_mask=tgt_mask,
          key_padding_mask=tgt_key_padding_mask, train=train,
          cache=cache["self"] if stepping else None,
          cache_index=cache_index, anc=anc)
        tgt = tgt + drop(sa_out)
        if not self.normalize_before:
            tgt = norm1(tgt)

        x = norm2(tgt) if self.normalize_before else tgt
        ca_out, ca = MultiheadAttention(
            self.nhead, self.dropout, dtype=self.dtype, name="cross_attn"
        )(x, memory, memory, attn_mask=memory_mask,
          key_padding_mask=memory_key_padding_mask, train=train,
          static_kv=cache["cross"] if stepping else None)
        tgt = tgt + drop(ca_out)
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
        if stepping:
            return tgt, {"self": sa, "cross": cache["cross"]}, None
        return tgt, sa, ca


class TransformerDecoder(nn.Module):
    """Stack of decoder layers + final LN (Transformer.py:1527-1647).

    Carries an O(1)-per-token decode cache (init_cache / prime_cache /
    step) so beam search never re-scores the full prefix — the TPU
    answer to the reference's full-prefix re-run per step (SURVEY.md
    §3.2): self-attention K/V buffers append in place, cross-attention
    K/V are projected from the encoder memory exactly once.
    """

    num_layers: int
    d_ffn: int
    nhead: int
    dropout: float = 0.1
    activation: Callable[[Array], Array] = nn.relu
    normalize_before: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
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
        tgt_mask: Optional[Array] = None,
        memory_mask: Optional[Array] = None,
        tgt_key_padding_mask: Optional[Array] = None,
        memory_key_padding_mask: Optional[Array] = None,
        train: bool = False,
    ) -> Tuple[Array, Array, Array]:
        out = tgt
        sa = ca = None
        for layer in self.layers:
            out, sa, ca = layer(
                out, memory, tgt_mask, memory_mask,
                tgt_key_padding_mask, memory_key_padding_mask, train=train,
            )
        out = self.norm(out)
        return out, sa, ca

    # -- O(1) decode cache ----------------------------------------------

    def init_cache(self, batch: int, s_max: int, d_model: int,
                   dtype=jnp.float32, beam_gather: bool = False):
        dh = d_model // self.nhead
        # Heads-major (B, H, S, dh), or append-only (H, S, B, dh) when
        # beam-gather decoding: see attention.py cache branch.
        if beam_gather:
            z = lambda: jnp.zeros((self.nhead, s_max, batch, dh), dtype)
        else:
            z = lambda: jnp.zeros((batch, self.nhead, s_max, dh), dtype)
        return {
            "layers": [
                {"self": (z(), z()), "cross": None}
                for _ in range(self.num_layers)
            ],
            "mem_mask": None,
        }

    def prime_cache(self, memory: Array, cache,
                    memory_key_padding_mask: Optional[Array] = None):
        """Project the encoder memory into every layer's cross K/V once."""
        layers = []
        for layer, c in zip(self.layers, cache["layers"]):
            kv, _, _ = layer(memory, memory, compute_cross_kv=True)
            layers.append({"self": c["self"], "cross": kv})
        return {"layers": layers, "mem_mask": memory_key_padding_mask}

    def step(self, tgt_t: Array, pos: Array, cache,
             anc: Optional[Array] = None) -> Tuple[Array, dict]:
        """One decode step. tgt_t (B, d_model), pos scalar int."""
        x = tgt_t[:, None]
        new_layers = []
        for layer, c in zip(self.layers, cache["layers"]):
            x, new_c, _ = layer(
                x, None, cache=c, cache_index=pos,
                memory_key_padding_mask=cache["mem_mask"],
                anc=anc,
            )
            new_layers.append(new_c)
        out = self.norm(x)[:, 0]
        return out, {"layers": new_layers, "mem_mask": cache["mem_mask"]}
