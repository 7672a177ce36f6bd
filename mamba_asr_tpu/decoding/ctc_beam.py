"""CTC prefix beam search: host oracle + fully on-device implementation.

Reference behavior: speechbrain.decoders.CTCBeamSearcher, lexicon-free,
beam 100, beam_prune_logp -12.0, token_prune_min_logp -1.2
(/root/reference/hparams/CTC/conmamba_large.yaml:168-172,232-237, used at
/root/reference/train_CTC.py:306-310) — the classic prefix beam search
(Hannun et al. 2014) maintaining (blank, non-blank) log probabilities per
prefix with full duplicate-prefix merging.

Two implementations:
- `ctc_beam_search_ref`: plain-Python/numpy oracle, exact merging (the
  reference's decoder is likewise a CPU Python loop).
- `ctc_beam_search`: TPU-native — the beam state lives in fixed-shape
  arrays, each frame expands (beam x vocab) candidates, duplicate
  prefixes are merged via rolling-hash equality (sort + segment-logsumexp)
  and the top-K survive; the whole search is a single `lax.scan` over
  frames under jit (north star: decoding fully on-device).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG_INF = -1e30


def _logaddexp(a, b):
    return np.logaddexp(a, b)


def ctc_beam_search_ref(
    log_probs: np.ndarray,
    input_length: int,
    beam_size: int = 100,
    blank_id: int = 0,
    beam_prune_logp: float = -12.0,
    token_prune_min_logp: float = -1.2,
) -> List[int]:
    """Host prefix beam search for ONE utterance. log_probs (T, V)."""
    beams = {(): (0.0, -math.inf)}  # prefix -> (p_blank, p_nonblank)
    for t in range(int(input_length)):
        lp = log_probs[t]
        best_tok = lp.max()
        new: dict = {}

        def acc(prefix, pb=None, pnb=None):
            old = new.get(prefix, (-math.inf, -math.inf))
            new[prefix] = (
                old[0] if pb is None else _logaddexp(old[0], pb),
                old[1] if pnb is None else _logaddexp(old[1], pnb),
            )

        for prefix, (pb, pnb) in beams.items():
            p_tot = _logaddexp(pb, pnb)
            # blank extends the same prefix.
            acc(prefix, pb=p_tot + lp[blank_id])
            # repeated last token extends the same prefix (non-blank path).
            if prefix:
                acc(prefix, pnb=pnb + lp[prefix[-1]])
            for c in range(len(lp)):
                if c == blank_id or lp[c] < token_prune_min_logp:
                    continue
                contrib = (pb if prefix and c == prefix[-1] else p_tot) + lp[c]
                acc(prefix + (c,), pnb=contrib)

        scored = {
            p: v for p, v in new.items()
        }
        best = max(_logaddexp(*v) for v in scored.values())
        pruned = {
            p: v for p, v in scored.items()
            if _logaddexp(*v) >= best + beam_prune_logp
        }
        beams = dict(
            sorted(pruned.items(), key=lambda kv: -_logaddexp(*kv[1]))[:beam_size]
        )
    best_prefix = max(beams.items(), key=lambda kv: _logaddexp(*kv[1]))[0]
    return list(best_prefix)


# ---------------------------------------------------------------------------
# On-device implementation
# ---------------------------------------------------------------------------

# Two independent 32-bit rolling hashes (x64 is disabled under jit, so a
# single 32-bit hash would collide too often at beam 100 x vocab x frames;
# requiring equality of both makes false merges vanishingly unlikely).
_HASH_MULT1 = np.uint32(1000003)
_HASH_MULT2 = np.uint32(69069)


def ctc_beam_search(
    log_probs: Array,
    input_lengths: Array,
    beam_size: int = 100,
    blank_id: int = 0,
    beam_prune_logp: float = -12.0,
    token_prune_min_logp: float = -1.2,
    max_tokens: Optional[int] = None,
) -> Tuple[Array, Array]:
    """Batched on-device prefix beam search.

    Args:
      log_probs: (B, T, V); input_lengths: (B,).
      max_tokens: static cap on emitted tokens (default T).

    Returns:
      (tokens (B, max_tokens) int32, lengths (B,)) of the best prefix.
    """
    toks, lens, total = _beam_search_full(
        log_probs, input_lengths, beam_size, blank_id,
        beam_prune_logp, token_prune_min_logp,
        max_tokens or log_probs.shape[1],
    )
    best = jnp.argmax(total, axis=1)
    best_toks = jnp.take_along_axis(toks, best[:, None, None], axis=1)[:, 0]
    best_lens = jnp.take_along_axis(lens, best[:, None], axis=1)[:, 0]
    return best_toks, best_lens


def _beam_search_full(
    log_probs: Array,
    input_lengths: Array,
    beam_size: int,
    blank_id: int,
    beam_prune_logp: float,
    token_prune_min_logp: float,
    u_max: int,
) -> Tuple[Array, Array, Array]:
    """Core search; returns the full final beam (toks, lens, scores)."""
    bsz, t_max, vocab = log_probs.shape
    k = beam_size

    # Beam state (per batch row):
    #   pb, pnb   (B, K)            blank / non-blank log prob
    #   toks      (B, K, U)         prefix buffer
    #   lens      (B, K)            prefix length
    #   last      (B, K)            last token (-1 if empty)
    #   hash      (B, K)            rolling hash of the prefix
    pb0 = jnp.full((bsz, k), NEG_INF).at[:, 0].set(0.0)
    pnb0 = jnp.full((bsz, k), NEG_INF)
    toks0 = jnp.zeros((bsz, k, u_max), jnp.int32)
    lens0 = jnp.zeros((bsz, k), jnp.int32)
    last0 = jnp.full((bsz, k), -1, jnp.int32)
    hash1_0 = jnp.zeros((bsz, k), jnp.uint32).at[:, 1:].set(
        jnp.arange(1, k, dtype=jnp.uint32) * jnp.uint32(2654435761)
    )  # distinct hashes so empty dead beams don't merge with beam 0
    hash2_0 = jnp.zeros((bsz, k), jnp.uint32).at[:, 1:].set(
        jnp.arange(1, k, dtype=jnp.uint32) * jnp.uint32(40503) + jnp.uint32(7)
    )

    def step(state, inputs):
        pb, pnb, toks, lens, last, h1, h2 = state
        lp, t = inputs  # (B, V), scalar frame index
        active = (t < input_lengths)[:, None]  # (B, 1)

        p_tot = jnp.logaddexp(pb, pnb)  # (B, K)

        # --- candidate class 1: stay on the same prefix --------------------
        stay_pb = p_tot + lp[:, blank_id][:, None]
        rep_lp = jnp.take_along_axis(
            lp, jnp.maximum(last, 0), axis=1
        )  # (B, K) logp of repeating the last token
        stay_pnb = jnp.where(last >= 0, pnb + rep_lp, NEG_INF)

        # --- candidate class 2: extend with token c ------------------------
        # (B, K, V) contribution to the NEW prefix's non-blank prob.
        same_as_last = (
            jnp.arange(vocab)[None, None, :] == last[..., None]
        )
        base = jnp.where(same_as_last, pb[..., None], p_tot[..., None])
        ext = base + lp[:, None, :]
        tok_ok = (
            (jnp.arange(vocab)[None, None, :] != blank_id)
            & (lp[:, None, :] >= token_prune_min_logp)
            & (lens[..., None] < u_max)
        )
        ext = jnp.where(tok_ok, ext, NEG_INF)

        # Merge "extend" candidates that produce identical prefixes.
        # New hashes for prefix+c (order-dependent rolling hashes).
        tok_u32 = jnp.arange(vocab, dtype=jnp.uint32)[None, None, :]
        new_h1 = h1[..., None] * _HASH_MULT1 + tok_u32 + jnp.uint32(1)
        new_h2 = h2[..., None] * _HASH_MULT2 + tok_u32 + jnp.uint32(101)
        # Candidates: K "stay" + K*V "extend".
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((bsz, k * vocab), NEG_INF)], axis=1
        )
        cand_pnb = jnp.concatenate(
            [stay_pnb, ext.reshape(bsz, k * vocab)], axis=1
        )
        cand_h1 = jnp.concatenate(
            [h1, new_h1.reshape(bsz, k * vocab)], axis=1
        )
        cand_h2 = jnp.concatenate(
            [h2, new_h2.reshape(bsz, k * vocab)], axis=1
        )
        # Source beam and extension token of each candidate.
        src_beam = jnp.concatenate(
            [
                jnp.tile(jnp.arange(k)[None], (bsz, 1)),
                jnp.tile(
                    jnp.repeat(jnp.arange(k), vocab)[None], (bsz, 1)
                ),
            ],
            axis=1,
        )
        ext_tok = jnp.concatenate(
            [
                jnp.full((bsz, k), -1, jnp.int32),
                jnp.tile(jnp.tile(jnp.arange(vocab, dtype=jnp.int32), k)[None],
                         (bsz, 1)),
            ],
            axis=1,
        )

        # Sort by composite hash; merge adjacent equal (h1, h2) runs.
        # (x64 disabled: use a stable lexsort — argsort h2 then stable h1.)
        n_cand = k + k * vocab
        order2 = jnp.argsort(cand_h2, axis=1, stable=True)
        h1_by2 = jnp.take_along_axis(cand_h1, order2, axis=1)
        order1 = jnp.argsort(h1_by2, axis=1, stable=True)
        order = jnp.take_along_axis(order2, order1, axis=1)
        s_h1 = jnp.take_along_axis(cand_h1, order, axis=1)
        s_h2 = jnp.take_along_axis(cand_h2, order, axis=1)
        s_pb = jnp.take_along_axis(cand_pb, order, axis=1)
        s_pnb = jnp.take_along_axis(cand_pnb, order, axis=1)
        s_src = jnp.take_along_axis(src_beam, order, axis=1)
        s_ext = jnp.take_along_axis(ext_tok, order, axis=1)

        is_head = jnp.concatenate(
            [
                jnp.ones((bsz, 1), bool),
                (s_h1[:, 1:] != s_h1[:, :-1])
                | (s_h2[:, 1:] != s_h2[:, :-1]),
            ],
            axis=1,
        )
        seg_id = jnp.cumsum(is_head.astype(jnp.int32), axis=1) - 1  # (B, n)
        # segment logsumexp via one-hot matmul is O(n^2); instead use
        # sorted-order segment max then exp-sum with scatter-add.
        def seg_lse(vals):
            seg_max = jnp.full((bsz, n_cand), NEG_INF)
            seg_max = seg_max.at[
                jnp.arange(bsz)[:, None], seg_id
            ].max(vals)
            vmax = jnp.take_along_axis(seg_max, seg_id, axis=1)
            expv = jnp.exp(jnp.maximum(vals - vmax, -80.0))
            expv = jnp.where(vals <= NEG_INF * 0.5, 0.0, expv)
            seg_sum = jnp.zeros((bsz, n_cand))
            seg_sum = seg_sum.at[
                jnp.arange(bsz)[:, None], seg_id
            ].add(expv)
            tot = jnp.take_along_axis(seg_sum, seg_id, axis=1)
            out = vmax + jnp.log(jnp.maximum(tot, 1e-38))
            return jnp.where(tot > 0, out, NEG_INF)

        m_pb = seg_lse(s_pb)
        m_pnb = seg_lse(s_pnb)
        m_tot = jnp.logaddexp(m_pb, m_pnb)
        # Only segment heads represent unique prefixes.
        m_tot = jnp.where(is_head, m_tot, NEG_INF)

        # Beam pruning relative to the best candidate.
        best = m_tot.max(axis=1, keepdims=True)
        m_tot = jnp.where(m_tot >= best + beam_prune_logp, m_tot, NEG_INF)

        # Top-K unique prefixes.
        top_val, top_idx = jax.lax.top_k(m_tot, k)  # (B, K)

        def gather(x):
            return jnp.take_along_axis(x, top_idx, axis=1)

        n_pb = gather(m_pb)
        n_pnb = gather(m_pnb)
        n_h1 = gather(s_h1)
        n_h2 = gather(s_h2)
        n_src = gather(s_src)
        n_ext = gather(s_ext)

        # Rebuild token buffers from the source beam (+ extension).
        src_toks = jnp.take_along_axis(
            toks, n_src[..., None], axis=1
        )  # (B, K, U)
        src_lens = jnp.take_along_axis(lens, n_src, axis=1)
        src_last = jnp.take_along_axis(last, n_src, axis=1)
        extended = n_ext >= 0
        pos = jnp.minimum(src_lens, u_max - 1)
        new_toks = jnp.where(
            (jnp.arange(u_max)[None, None, :] == pos[..., None])
            & extended[..., None],
            n_ext[..., None],
            src_toks,
        )
        n_lens = jnp.where(extended, src_lens + 1, src_lens)
        n_last = jnp.where(extended, n_ext, src_last)

        # Dead beams (NEG_INF score) keep unique hashes to avoid merging.
        dead = top_val <= NEG_INF * 0.5
        salt = (
            jnp.arange(k, dtype=jnp.uint32)[None, :]
            + jnp.uint32(977) * t.astype(jnp.uint32)
        )
        n_h1 = jnp.where(dead, jnp.uint32(0x9E3779B9) + salt, n_h1)
        n_h2 = jnp.where(dead, jnp.uint32(0x85EBCA6B) + salt * 3, n_h2)

        # Frames past the utterance end leave the state untouched.
        def keep(new, old):
            act = active
            while act.ndim < new.ndim:
                act = act[..., None]
            return jnp.where(act, new, old)

        out_state = (
            keep(n_pb, pb),
            keep(n_pnb, pnb),
            keep(new_toks, toks),
            keep(n_lens, lens),
            keep(n_last, last),
            keep(n_h1, h1),
            keep(n_h2, h2),
        )
        return out_state, None

    lps = jnp.moveaxis(log_probs.astype(jnp.float32), 1, 0)  # (T, B, V)
    ts = jnp.arange(t_max)
    (pb, pnb, toks, lens, last, _, _) = jax.lax.scan(
        step, (pb0, pnb0, toks0, lens0, last0, hash1_0, hash2_0), (lps, ts)
    )[0]
    total = jnp.logaddexp(pb, pnb)
    return toks, lens, total


def ctc_beam_search_nbest(
    log_probs: Array,
    input_lengths: Array,
    nbest: int = 10,
    beam_size: int = 100,
    blank_id: int = 0,
    beam_prune_logp: float = -12.0,
    token_prune_min_logp: float = -1.2,
    max_tokens: Optional[int] = None,
) -> Tuple[Array, Array, Array]:
    """N-best variant: returns (tokens (B, n, U), lengths (B, n),
    scores (B, n)) sorted best-first — feeds decoding/rescore.py."""
    # Run the same search but harvest the final beam set.
    toks, lens, total = _beam_search_full(
        log_probs, input_lengths, beam_size, blank_id,
        beam_prune_logp, token_prune_min_logp,
        max_tokens or log_probs.shape[1],
    )
    n = min(nbest, beam_size)
    top_val, top_idx = jax.lax.top_k(total, n)
    nb_toks = jnp.take_along_axis(toks, top_idx[..., None], axis=1)
    nb_lens = jnp.take_along_axis(lens, top_idx, axis=1)
    return nb_toks, nb_lens, top_val
