"""Batched CTC prefix scorer for joint CTC/attention beam search.

Reference behavior: speechbrain.decoders.scorer.CTCScorer (the ESPnet
CTCPrefixScore formulation) configured with ctc_weight 0.4 in the test
scorer at /root/reference/hparams/S2S/conmamba_large.yaml:331-361.

Math (Watanabe et al. 2017, log space; per hypothesis g, candidate c):
    r_nb(t, c) = logaddexp(r_nb(t-1, c), phi(t-1, c)) + logp(t, c)
    r_b(t, c)  = logaddexp(r_nb(t-1, c), r_b(t-1, c)) + logp(t, blank)
    phi(t, c)  = r_b^g(t) + (c == last(g) ? -inf : r_nb^g(t))
    psi(c)     = logsumexp_t[ phi(t-1, c) + logp(t, c) ]  (+ final blank)
where r^g is the state of the parent prefix. The returned score for a
step is psi(c) - psi_prev (incremental), so summing per-step scores
gives the full CTC prefix log probability.

Fully vectorized over (hyps, vocab); the frame recurrences are
first-order linear in the log semiring (⊕ = logaddexp, ⊗ = +), so they
run as `lax.associative_scan` over T — log-depth on device instead of
T sequential steps. At enc T = 1500 the sequential form cost ~45 ms per
beam step (2 x 1500 tiny iterations, pure loop latency).

Round-3 cost split: `score` needs only psi(c) — a logsumexp over frames
of phi(t-1, c) + logp(t, c), a PURE REDUCTION — while the r_nb/r_b frame
recurrences are only ever needed for the ONE token each surviving
hypothesis actually selects. So `score` runs no scans at all, and
`select` re-runs the two log-semiring associative scans at C = 1 on
(T, N) arrays.

TPU-native psi: since phi(t-1, c) separates into a per-hypothesis frame
vector (the same-token correction touches exactly ONE column per row),
the reduction is a probability-space MATMUL on the MXU:

    psi[n, v] = m[n] + log( exp(phi_sh[n, :] - m[n]) @ exp(lp[b(n)]) )

with exp(lp) (T, V) precomputed once per utterance. That scores the
FULL vocab exactly — no candidate gather, no (N, T, C) materialization;
the per-step cost is one (K, T) x (T, V) matmul reading exp(lp) once
(~30 MB at T 1500 x vocab 5000, ~1 GFLOP). The reference's ESPnet
scorer restricts to candidate tokens to stay affordable; this
formulation does not need to.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e30

# A/B escape hatch for the fused Pallas select-DP (benchmarks flip this
# to time the XLA associative-scan formulation on TPU).
USE_DP_KERNEL = True


def _linear_log_scan(a: Array, b: Array) -> Array:
    """Solve x(t) = logaddexp(x(t-1) + a(t), b(t)) with x(-1) = -inf,
    along axis 0, via associative composition of the affine maps
    (a, b): x -> a ⊗ x ⊕ b in the log semiring."""

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al + ar, jnp.logaddexp(bl + ar, br)

    _, x = jax.lax.associative_scan(combine, (a, b), axis=0)
    return x


class CTCPrefixState(NamedTuple):
    r_nb: Array   # (N, T) non-blank end prob of current prefix
    r_b: Array    # (N, T) blank end prob of current prefix
    psi: Array    # (N,) accumulated prefix score
    last: Array   # (N,) last token of prefix (-1 = empty)


class CTCPrefixScorer:
    """Scorer over a flattened hypothesis batch of size N = B * beam."""

    def __init__(self, log_probs: Array, input_lengths: Array, beam: int,
                 blank_id: int = 0, eos_id: int = 2):
        # log_probs stays (B, T, V); hypothesis rows index into it via
        # row // beam (a beam-66 x vocab-5000 x T-1500 repeat would pin
        # ~2 GB of HBM for the whole search).
        b, t, v = log_probs.shape
        self.lp = log_probs.astype(jnp.float32)
        self.beam = beam
        self.lens = jnp.repeat(input_lengths, beam, axis=0)
        self.blank = blank_id
        self.eos = eos_id
        self.n = b * beam
        self.t = t
        self.v = v
        frame_valid = jnp.arange(t)[None, :] < self.lens[:, None]
        self.frame_valid = frame_valid  # (N, T)
        # Pre-extract blank row (N, T).
        self.lp_blank = jnp.where(
            frame_valid,
            jnp.repeat(self.lp[:, :, blank_id], beam, axis=0),
            0.0,
        )
        # Probabilities, precomputed once per utterance: the per-step psi
        # reduction is a probability-space matmul against this (see
        # module docstring).
        self.p = jnp.exp(self.lp)  # (B, T, V)
        # Token-major copy for the per-step frame-row gathers (score's
        # last-token row, select's chosen-token row): a column gather
        # from (T, V) is T strided reads per hypothesis; from (V, T) the
        # row is contiguous. Costs one extra (B, T, V) f32 in HBM.
        self.lp_t = jnp.swapaxes(self.lp, 1, 2)  # (B, V, T)

    def init_state(self) -> CTCPrefixState:
        """State of the empty prefix: r_b(t) = sum of blanks up to t."""
        cum_blank = jnp.cumsum(self.lp_blank, axis=1)
        r_b = jnp.where(self.frame_valid, cum_blank, NEG_INF)
        r_nb = jnp.full((self.n, self.t), NEG_INF)
        return CTCPrefixState(
            r_nb=r_nb,
            r_b=r_b,
            psi=jnp.zeros((self.n,)),
            last=jnp.full((self.n,), -1, jnp.int32),
        )

    def score(
        self, state: CTCPrefixState, candidates: Optional[Array] = None
    ) -> Tuple[Array, dict]:
        """Incremental prefix scores for next tokens — EXACT over the
        full vocab via the probability-space matmul (module docstring).

        candidates: optional (N, C) token ids — when given, non-candidate
        scores are masked to NEG_INF (kept for API/recipe parity with the
        reference's partial scorer; the full computation costs the same).
        Returns (scores (N, V), aux) where aux carries the full psi plane
        `select` advances the state from.
        """
        n, t, v = self.n, self.t, self.v
        b = self.lp.shape[0]
        k = self.beam

        # phi(t-1, ·) for c != last: one frame-vector per hypothesis.
        phi_ne = jnp.logaddexp(state.r_b, state.r_nb)  # (N, T)
        empty = state.last < 0
        boundary = jnp.where(empty, 0.0, NEG_INF)  # (N,)
        phi_sh = jnp.concatenate(
            [boundary[:, None], phi_ne[:, :-1]], axis=1
        )
        phi_sh = jnp.where(self.frame_valid, phi_sh, NEG_INF)

        # psi[n, v] = m + log(exp(phi_sh - m) @ p): one (B, K, T) x
        # (B, T, V) matmul on the MXU, p read once per step.
        m = jnp.max(phi_sh, axis=1)  # (N,)
        e_phi = jnp.exp(phi_sh - m[:, None])  # in [0, 1], 0 at -inf
        # HIGHEST precision: on TPU a default-precision f32 einsum
        # lowers to bf16 MXU passes (~2^-9 relative error), which would
        # silently degrade the "EXACT over the full vocab" contract by
        # ~1e-3 nat in psi — enough to flip near-tied beam hypotheses.
        acc = jnp.einsum(
            "bkt,btv->bkv",
            e_phi.reshape(b, k, t),
            self.p,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(n, v)
        # Floor, don't ban: a token whose emission prob underflows f32 at
        # every frame (lp < ~-87) gets acc == 0; the log-space
        # formulation would return a finite very-negative psi, and
        # s2s_beam treats <= NEG_INF/2 as a hard ban — so clamp to
        # m + log(TINY), an upper bound of the true psi ~69 nats below
        # the best prefix mass, keeping such tokens selectable when the
        # attention decoder strongly favors them. TINY must be a NORMAL
        # f32 (1e-38 is subnormal and flushes to zero under XLA's FTZ,
        # which is what made the previous formulation ban them).
        psi = m[:, None] + jnp.log(jnp.maximum(acc, 1e-30))
        psi = jnp.where(jnp.isfinite(psi), psi, NEG_INF)

        # Same-token correction: phi uses r_b only for c == last — exactly
        # one column per row.
        bidx = jnp.arange(n, dtype=jnp.int32) // k
        lp_last = jax.vmap(lambda bi, c: self.lp_t[bi, c])(
            bidx, jnp.maximum(state.last, 0)
        )  # (N, T)
        phi_same_sh = jnp.concatenate(
            [boundary[:, None], state.r_b[:, :-1]], axis=1
        )
        phi_same_sh = jnp.where(self.frame_valid, phi_same_sh, NEG_INF)
        psi_same = jax.nn.logsumexp(phi_same_sh + lp_last, axis=1)  # (N,)
        col = jnp.arange(v, dtype=jnp.int32)[None, :]
        psi = jnp.where(col == state.last[:, None], psi_same[:, None], psi)

        # EOS score = full prefix probability of g itself at the last
        # valid frame (r_b + r_nb at T_end).
        idx = jnp.maximum(self.lens - 1, 0)[:, None]  # (N, 1)
        end_b = jnp.take_along_axis(state.r_b, idx, axis=1)[:, 0]
        end_nb = jnp.take_along_axis(state.r_nb, idx, axis=1)[:, 0]
        eos_psi = jnp.logaddexp(end_b, end_nb)
        eos_psi = jnp.where(empty, 0.0, eos_psi)

        scores = psi - state.psi[:, None]  # incremental
        scores = jnp.where(
            col == self.eos, (eos_psi - state.psi)[:, None], scores
        )
        scores = jnp.where(col == self.blank, NEG_INF, scores)
        if candidates is not None:
            member = jnp.zeros((n, v), bool)
            member = jax.vmap(lambda mrow, c: mrow.at[c].set(True))(
                member, candidates
            )
            scores = jnp.where(member, scores, NEG_INF)
        return scores, {"psi": psi}

    def select(
        self, state: CTCPrefixState, aux: dict, tokens: Array,
        reorder: Array,
    ) -> CTCPrefixState:
        """Advance the state after beam selection.

        tokens: (N,) chosen next token per surviving hypothesis;
        reorder: (N,) index of the parent hypothesis row.

        Re-runs the r_nb/r_b frame recurrences for the ONE chosen token
        per row — two C=1 log-semiring associative scans on (T, N)
        arrays, ~C x cheaper than materializing the DP for every scored
        candidate at score time.
        """
        def take(x):
            return x[reorder]

        n, t = self.n, self.t
        bidx = jnp.arange(n, dtype=jnp.int32) // self.beam
        # aux["psi"] covers the full vocab (exact matmul scoring), so the
        # chosen token's psi is a direct gather.
        psi = jnp.take_along_axis(
            take(aux["psi"]), tokens[:, None], axis=1
        )[:, 0]

        # Recompute the chosen token's DP rows from the parent state —
        # identical math to the pre-round-3 per-candidate scans at C=1.
        r_b_par = take(state.r_b)     # (N, T)
        r_nb_par = take(state.r_nb)
        last_par = take(state.last)
        lp_tok = jax.vmap(lambda bi, c: self.lp_t[bi, c])(
            bidx, tokens
        )  # (N, T)
        same = tokens == last_par
        phi = jnp.where(
            same[:, None], r_b_par, jnp.logaddexp(r_b_par, r_nb_par)
        )
        empty = last_par < 0
        phi_shift = jnp.concatenate(
            [jnp.where(empty, 0.0, NEG_INF)[:, None], phi[:, :-1]], axis=1
        )
        valid = self.frame_valid  # (N, T)
        grow = jnp.where(valid, phi_shift + lp_tok, NEG_INF)
        a_nb = jnp.where(valid, lp_tok, 0.0)
        if USE_DP_KERNEL and jax.default_backend() == "tpu":
            # Both recurrences fused into one Pallas launch: as two XLA
            # associative scans over T this is stage-count bound
            # (~6 ms/step at T 1500 of pure sub-stage latency).
            from mamba_asr_tpu.ops.pallas.log_scan import ctc_dp_pallas

            r_nb_t, r_b_t = ctc_dp_pallas(
                a_nb.T, grow.T, self.lp_blank.T,
                valid.T.astype(jnp.float32),
            )
            r_nb, r_b = r_nb_t.T, r_b_t.T
        else:
            r_nb = _linear_log_scan(a_nb.T, grow.T).T  # (N, T)
            r_nb_shift = jnp.concatenate(
                [jnp.full((n, 1), NEG_INF), r_nb[:, :-1]], axis=1
            )
            a_b = self.lp_blank  # (N, T), 0 at invalid frames
            b_b = jnp.where(valid, r_nb_shift + self.lp_blank, NEG_INF)
            r_b = _linear_log_scan(a_b.T, b_b.T).T

        # Hypotheses that chose EOS keep their parent state.
        keep_old = (tokens == self.eos)[:, None]
        old = CTCPrefixState(*[take(x) for x in state])
        return CTCPrefixState(
            r_nb=jnp.where(keep_old, old.r_nb, r_nb),
            r_b=jnp.where(keep_old, old.r_b, r_b),
            psi=jnp.where(keep_old[:, 0], old.psi, psi),
            last=jnp.where(keep_old[:, 0], old.last, tokens),
        )
