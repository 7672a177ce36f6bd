"""N-best rescoring: combine CTC n-best scores with an external LM.

BASELINE.json config 3 names "on-device CTC beam search + n-best
rescoring": take the final beam of the CTC search
(decoding/ctc_beam.ctc_beam_search_nbest) and re-rank by

    score = ctc_logp + lm_weight * lm_logp (+ length_bonus * len)

with the TransformerLM scoring every hypothesis in ONE batched forward
(hypotheses are short; this is cheap relative to the search).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mamba_asr_tpu.data.tokenizer import BOS_ID, EOS_ID

Array = jax.Array


def lm_nbest_scores(
    lm_model,
    lm_params,
    tokens: Array,   # (B, N, U)
    lengths: Array,  # (B, N)
    temperature: float = 1.0,
) -> Array:
    """Summed LM log prob of each hypothesis, (B, N)."""
    b, n, u = tokens.shape
    flat = tokens.reshape(b * n, u)
    flat_len = lengths.reshape(b * n)
    inp = jnp.concatenate(
        [jnp.full((b * n, 1), BOS_ID, jnp.int32), flat], axis=1
    )  # (BN, U+1)
    logits = lm_model.apply(lm_params, inp[:, :-1])
    lp = jax.nn.log_softmax(logits.astype(jnp.float32) / temperature, -1)
    tok_lp = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
    valid = jnp.arange(u)[None, :] < flat_len[:, None]
    scores = jnp.where(valid, tok_lp, 0.0).sum(axis=1)
    # + eos after the last token.
    eos_pos = jnp.minimum(flat_len, u - 1)
    eos_lp = jnp.take_along_axis(
        lp, eos_pos[:, None, None], axis=1
    )[:, 0, EOS_ID]
    scores = scores + jnp.where(flat_len < u, eos_lp, 0.0)
    return scores.reshape(b, n)


def rescore_nbest(
    tokens: Array,      # (B, N, U)
    lengths: Array,     # (B, N)
    ctc_scores: Array,  # (B, N)
    lm_model=None,
    lm_params=None,
    lm_weight: float = 0.6,
    temperature_lm: float = 1.0,
    length_bonus: float = 0.0,
) -> Tuple[Array, Array]:
    """Re-rank the n-best; returns the 1-best (tokens (B, U), lengths)."""
    combined = ctc_scores
    if lm_model is not None and lm_params is not None and lm_weight:
        combined = combined + lm_weight * lm_nbest_scores(
            lm_model, lm_params, tokens, lengths, temperature_lm
        )
    if length_bonus:
        combined = combined + length_bonus * lengths.astype(jnp.float32)
    best = jnp.argmax(combined, axis=1)
    out_toks = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    out_lens = jnp.take_along_axis(lengths, best[:, None], axis=1)[:, 0]
    return out_toks, out_lens
