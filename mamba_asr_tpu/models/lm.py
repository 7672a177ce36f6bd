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

from typing import Any

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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, tokens: Array, pad_idx: int = 0, train: bool = False
    ) -> Array:
        """tokens (B, S) -> logits (B, S, vocab)."""
        s = tokens.shape[1]
        x = NormalizedEmbedding(
            self.vocab_size, self.d_model, dtype=self.dtype, name="embed"
        )(tokens)
        x = x + sinusoidal_position_encoding(s, self.d_model, x.dtype)
        kpm = get_key_padding_mask(tokens, pad_idx) if train else None
        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            d_ffn=self.d_ffn,
            nhead=self.nhead,
            dropout=self.dropout,
            activation=nn.gelu,
            normalize_before=True,
            attention_type="regularMHA",
            dtype=self.dtype,
            name="encoder",
        )(x, src_mask=get_lookahead_mask(s), src_key_padding_mask=kpm,
          train=train)
        return nn.Dense(self.vocab_size, dtype=jnp.float32, name="out")(
            out.astype(jnp.float32)
        )
