"""HyperMixing token mixing — the linear-time attention alternative.

Reference surface: `attention_type: "hypermixing"` is a live option of
the reference's attention selection
(/root/reference/modules/Transformer.py:669 allowlist, :1099-1106
construction; /root/reference/modules/Conformer.py:1543-1549), backed by
SpeechBrain's `speechbrain.nnet.hypermixing.HyperMixing` (HyperMixer:
Mai et al., "HyperMixer: An MLP-based Low Cost Alternative to
Transformers", 2022). Semantics reproduced here:

- Instead of a T x T attention matrix, a hypernetwork generates the
  weights of a token-mixing MLP from the (position-encoded) inputs:
  per head, `W1, W2 in R^{T x k}` (k = hypernet_size / num_heads when
  `fix_tm_hidden_size=False`, the reference's setting), and the head's
  (d_head, T) feature block is mixed as
  `out = W2 @ gelu(W1^T @ block^T)^T` — O(T·k·d) rather than O(T²·d).
- The hypernetwork is a pair of per-head two-layer MLPs over each
  head's feature slice (`ParallelMLPs`; ReLU hidden of size
  d_model/num_heads), untied W1/W2 generators for `tied=False` (the
  reference's setting).
- The module adds its OWN absolute sinusoidal position encoding to the
  hypernetwork input (token mixing needs position information); the
  surrounding model therefore passes `pos_embs=None` and adds no input
  PE, exactly the reference's dispatch
  (/root/reference/modules/TransformerASR.py:775-781).
- Padded positions (key_padding_mask True) are zeroed both in the mixed
  features and in the generated W1/W2 columns, so padding neither
  contributes nor receives mixing mass.
- `attn_mask` is accepted for signature compatibility and IGNORED —
  token mixing is global; SpeechBrain's module has no causal support
  (it returns a dummy all-zeros attention map). Causal/streaming
  encoder variants must not select hypermixing.

TPU notes: everything is einsum/batched-matmul (MXU-friendly); the
per-head token-mix contracts (T, k) x (T, d_h) blocks which XLA tiles
directly. No gathers, no dynamic shapes.

SpeechBrain itself is not installable in this environment; the golden
cross-check in tests/test_hypermixing.py transplants weights into a
line-by-line torch replica of the published module structure and
asserts forward agreement.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ParallelMLPs(nn.Module):
    """`num_mlps` independent 2-layer MLPs, one per head, each seeing
    only its head's slice of the feature dim (SpeechBrain
    `hypermixing.ParallelMLPs`). Input (B, T, D) -> (B, H, T, out)."""

    input_size: int          # full feature dim D (split over heads)
    hidden_size: int         # full hidden size (split over heads)
    output_size: int         # full output size
    num_mlps: int = 1
    keep_output_size: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = self.num_mlps
        d_in = self.input_size // h
        d_hid = self.hidden_size // h
        d_out = (
            self.output_size if self.keep_output_size
            else self.output_size // h
        )
        # Parameters hold one weight block per head; normal(std=1/sqrt)
        # fan-in scaling mirrors torch's default Linear-style scale.
        w1 = self.param(
            "fc1_weights",
            nn.initializers.normal(stddev=d_in ** -0.5),
            (h, d_hid, d_in), jnp.float32,
        )
        b1 = self.param(
            "fc1_biases", nn.initializers.zeros, (h, d_hid), jnp.float32
        )
        w2 = self.param(
            "fc2_weights",
            nn.initializers.normal(stddev=d_hid ** -0.5),
            (h, d_out, d_hid), jnp.float32,
        )
        b2 = self.param(
            "fc2_biases", nn.initializers.zeros, (h, d_out), jnp.float32
        )
        b, t, _ = x.shape
        xs = x.reshape(b, t, h, d_in).transpose(0, 2, 1, 3)  # (B, H, T, d_in)
        y = jnp.einsum(
            "bhti,hji->bhtj", xs, w1.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) + b1[None, :, None, :]
        y = nn.relu(y)
        y = jnp.einsum(
            "bhtj,hoj->bhto", y.astype(self.dtype), w2.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ) + b2[None, :, None, :]
        return y  # (B, H, T, d_out)


class HyperMixing(nn.Module):
    """Drop-in replacement for the MHA call signature
    (query/key/value/attn_mask/key_padding_mask/pos_embs ->
    (out, attn)); only the self-attention form (q is k is v) is
    meaningful, matching the reference's encoder usage."""

    input_output_dim: int
    hypernet_size: int
    tied: bool = False
    num_heads: int = 1
    fix_tm_hidden_size: bool = False
    max_length: int = 3000  # doc only; PE is computed for the trace length
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        attn_mask: Optional[Array] = None,
        key_padding_mask: Optional[Array] = None,
        pos_embs: Optional[Array] = None,
        train: bool = False,
        **_unused,
    ) -> Tuple[Array, Optional[Array]]:
        del key, value, attn_mask, pos_embs  # token mixing is global self-mixing
        from mamba_asr_tpu.models.transformer import (
            sinusoidal_position_encoding,
        )

        d = self.input_output_dim
        h = self.num_heads
        b, t, _ = query.shape
        out = query
        if key_padding_mask is not None:
            # Boolean, True = padded (repo-wide convention).
            keep = (~key_padding_mask)[..., None].astype(out.dtype)
            out = out * keep
        else:
            keep = None

        hyp_in = out + sinusoidal_position_encoding(t, d, out.dtype)[None]
        w1_gen = ParallelMLPs(
            d, d, self.hypernet_size, num_mlps=h,
            keep_output_size=self.fix_tm_hidden_size, dtype=self.dtype,
            name="hyper_w1_gen",
        )
        W1 = w1_gen(hyp_in)  # (B, H, T, k)
        if self.tied:
            W2 = W1
        else:
            W2 = ParallelMLPs(
                d, d, self.hypernet_size, num_mlps=h,
                keep_output_size=self.fix_tm_hidden_size, dtype=self.dtype,
                name="hyper_w2_gen",
            )(hyp_in)
        if keep is not None:
            W1 = W1 * keep[:, None, :, 0:1]
            W2 = W2 * keep[:, None, :, 0:1]

        # Token mixing per head: features (B, H, d_h, T) through the
        # generated T->k->T MLP with GELU, all as einsums on the MXU.
        feats = out.reshape(b, t, h, d // h).transpose(0, 2, 3, 1)
        mixed = jnp.einsum(
            "bhdt,bhtk->bhdk", feats.astype(self.dtype), W1.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        mixed = nn.gelu(mixed, approximate=False)
        mixed = jnp.einsum(
            "bhdk,bhtk->bhdt", mixed.astype(self.dtype), W2.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        mixed = mixed.transpose(0, 3, 1, 2).reshape(b, t, d)
        mixed = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(mixed)
        return mixed.astype(query.dtype), None
