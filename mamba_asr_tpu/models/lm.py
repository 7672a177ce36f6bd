"""Transformer language model for shallow fusion at decode time.

Reference: the SpeechBrain TransformerLM the S2S recipes download from HF
(speechbrain/asr-transformer-transformerlm-librispeech) and use only in
test-time beam search with weight 0.6 / temperature 1.15
(/root/reference/hparams/S2S/conmamba_large.yaml:289-298,331-373):
12 layers, d_model 768, nhead 12, d_ffn 3072, BPE-5000 vocab, causal
self-attention only.

The reference *downloads* pretrained weights; this framework additionally
ships `train_lm.py` so the LM can be trained natively (zero-egress
environments have no HF access).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_asr_tpu.models.transformer import (
    NormalizedEmbedding,
    TransformerEncoder,
    get_lookahead_mask,
    get_key_padding_mask,
    sinusoidal_position_encoding,
)

Array = jax.Array


class TransformerLM(nn.Module):
    vocab_size: int = 5000
    d_model: int = 768
    nhead: int = 12
    num_layers: int = 12
    d_ffn: int = 3072
    dropout: float = 0.0
    # The reference LM is post-LN (normalize_before: False,
    # /root/reference/hparams/S2S/conmamba_large.yaml:298) — imported
    # reference checkpoints require False. Pre-LN remains available for
    # natively trained LMs.
    normalize_before: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: Array,
        pad_idx: int = 0,
        train: bool = False,
        cache: Optional[list] = None,
        cache_index: Optional[Array] = None,
        anc: Optional[Array] = None,
    ) -> Array:
        """tokens (B, S) -> logits (B, S, vocab).

        Incremental mode (`cache` = per-layer KV buffers from
        `init_cache`, `cache_index` = position): tokens is (B,) — the
        single token at that position — and the return is
        (logits (B, vocab), new_cache). O(1) work per step instead of
        re-scoring the full prefix; this is what makes beam-66 shallow
        fusion with the 12-layer LM affordable on TPU.
        """
        stepping = cache is not None
        if stepping:
            # (B, H, S, dh) heads-major or (H, S, B, dh) beam-gather.
            s_ctx = cache[0][0].shape[1 if anc is not None else 2]
            x = NormalizedEmbedding(
                self.vocab_size, self.d_model, dtype=self.dtype, name="embed"
            )(tokens[:, None])
            pe = sinusoidal_position_encoding(s_ctx, self.d_model, x.dtype)
            x = x + jax.lax.dynamic_slice_in_dim(pe, cache_index, 1, axis=0)
            src_mask = None
            kpm = None
        else:
            s = tokens.shape[1]
            x = NormalizedEmbedding(
                self.vocab_size, self.d_model, dtype=self.dtype, name="embed"
            )(tokens)
            x = x + sinusoidal_position_encoding(s, self.d_model, x.dtype)
            src_mask = get_lookahead_mask(s)
            kpm = get_key_padding_mask(tokens, pad_idx) if train else None
        out, new_cache = TransformerEncoder(
            num_layers=self.num_layers,
            d_ffn=self.d_ffn,
            nhead=self.nhead,
            dropout=self.dropout,
            # Exact GELU: the reference LM uses torch.nn.GELU (erf).
            activation=lambda x: nn.gelu(x, approximate=False),
            normalize_before=self.normalize_before,
            attention_type="regularMHA",
            dtype=self.dtype,
            name="encoder",
        )(x, src_mask=src_mask, src_key_padding_mask=kpm, train=train,
          cache=cache, cache_index=cache_index, anc=anc)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, name="out")(
            out.astype(jnp.float32)
        )
        if stepping:
            return logits[:, 0], new_cache
        return logits

    def init_cache(self, batch: int, s_max: int, beam_gather: bool = False):
        """Per-layer (k, v) buffers, heads-major (B, H, s_max, dh) — or
        append-only (H, s_max, B, dh) when `beam_gather` (ancestor-mask
        beam decoding, attention.py). Pure shapes — no params touched,
        callable on the bare module."""
        dh = self.d_model // self.nhead
        if beam_gather:
            z = lambda: jnp.zeros((self.nhead, s_max, batch, dh), self.dtype)
        else:
            z = lambda: jnp.zeros((batch, self.nhead, s_max, dh), self.dtype)
        return [(z(), z()) for _ in range(self.num_layers)]
