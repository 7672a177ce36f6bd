"""Joint CTC/attention beam search with optional LM shallow fusion.

Reference behavior: speechbrain.decoders.S2STransformerBeamSearcher +
ScorerBuilder as configured at
/root/reference/hparams/S2S/conmamba_large.yaml:331-373 and invoked at
/root/reference/train_S2S.py:382-394:
- autoregressive beam over `model.decode(tokens_so_far, enc_out)`;
- combined step score = log_softmax(attn_logits / temperature)
  + ctc_weight_decode * CTCPrefixScorer + lm_weight *
  log_softmax(lm_logits / temperature_lm);
- valid: beam 10, CTC scorer only; test: beam 66 + TransformerLM;
- length normalization of final scores.

TPU-native design: one jitted step function with fully static shapes —
tokens live in a (B*K, S_max) buffer, the decoder re-scores the padded
buffer each step (causality makes the padding inert) and position `s` is
read dynamically, so the whole search compiles ONCE; the per-step loop on
the host just feeds step indices. The reference re-runs the decoder on
the growing prefix per step (SURVEY.md §3.2) — same asymptotics, but here
nothing recompiles and everything stays on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.decoding.ctc_prefix_scorer import CTCPrefixScorer

Array = jax.Array
NEG_INF = -1e30


@dataclasses.dataclass
class S2SBeamSearcher:
    """Beam search over an ASRModel's decoder."""

    model: object               # ASRModel
    beam_size: int = 10
    bos_id: int = 1
    eos_id: int = 2
    blank_id: int = 0
    min_decode_ratio: float = 0.0
    max_decode_ratio: float = 1.0
    ctc_weight: float = 0.0
    lm_weight: float = 0.0
    temperature: float = 1.0
    temperature_lm: float = 1.0
    length_normalization: bool = True
    lm_model: Optional[object] = None   # TransformerLM
    max_steps_cap: int = 256
    # O(1)-per-token decode: mamba decoders step through their primed
    # (conv_state, ssm_state) cache; transformer decoders through
    # self-attention KV buffers + once-projected cross K/V. The
    # reference re-scans the full prefix every step (SURVEY.md §3.2).
    # Default on for both decoder types; set False to force the
    # full-prefix re-score path.
    use_cache: Optional[bool] = None
    # CTC prefix scoring restricted to the top-C tokens by decoder(+LM)
    # score (partial-scorer pattern; 0 = score the full vocab). The full
    # DP materializes (beams, T, V) per step — prohibitive at vocab 5000.
    ctc_candidates: int = 0
    # Append-only KV caches + ancestor-mask gather-at-read for the LM and
    # transformer-decoder self-attention (ops/pallas/beam_attention.py):
    # removes the per-step full-buffer beam-reorder traffic that bounded
    # the round-2 beam step (~1.9 GB/step at beam 66 x d768 x S 257).
    # False = legacy reorder path (kept for A/B benchmarking).
    beam_gather: bool = True

    def __post_init__(self):
        self._jit_cache = {}

    def __call__(
        self,
        params,
        enc_out: Array,
        enc_lens: Array,
        ctc_log_probs: Optional[Array] = None,
        lm_params=None,
    ) -> Tuple[Array, Array, Array]:
        """Returns (tokens (B, S) without bos/eos, lengths (B,), scores).

        The ENTIRE search — cache priming, all beam steps
        (lax.while_loop with early exit), final selection — runs as one
        jitted device program: a single dispatch per call, compiled once
        per input shape. A host-stepped loop pays one dispatch round-trip
        per token; fully on-device is the TPU-native shape of the search
        (north star: "decoding runs fully on-device")."""
        has_ctc = self.ctc_weight > 0.0 and ctc_log_probs is not None
        key = (
            enc_out.shape, enc_lens.shape,
            None if not has_ctc else ctc_log_probs.shape,
            lm_params is not None,
        )
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(
                self._make_search(enc_out.shape[0], enc_out.shape[1],
                                  has_ctc, lm_params is not None)
            )
            self._jit_cache[key] = fn
        return fn(params, lm_params, enc_out, enc_lens,
                  ctc_log_probs if has_ctc else None)

    # ------------------------------------------------------------------

    def _make_search(self, b: int, t_enc: int, has_ctc: bool, has_lm: bool):
        model = self.model
        lm_model = self.lm_model
        eos = self.eos_id
        k = self.beam_size
        n = b * k
        s_max = min(self.max_steps_cap, int(self.max_decode_ratio * t_enc) + 1)
        min_steps = int(self.min_decode_ratio * t_enc)
        use_cache = self.use_cache
        if use_cache is None:
            use_cache = getattr(model.cfg, "decoder_module", "") in (
                "mamba", "transformer"
            )
        dec_is_transformer = (
            getattr(model.cfg, "decoder_module", "") == "transformer"
        )
        # Ancestor-mask mode applies wherever per-hypothesis KV buffers
        # exist: the fusion LM, and transformer-decoder self-attention.
        use_anc = self.beam_gather and (
            has_lm or (use_cache and dec_is_transformer)
        )
        if use_anc:
            from mamba_asr_tpu.ops.pallas.beam_attention import J_CHUNK

            # Round the cache length up so the Pallas chunked kernel
            # applies on TPU (it skips chunks past the current position,
            # so the extra tail costs nothing).
            s_cache = -(-(s_max + 1) // J_CHUNK) * J_CHUNK
        else:
            s_cache = s_max + 1

        def search(params, lm_params, enc_out, enc_lens, ctc_log_probs):
            # Cast decode-time weights to the compute dtype ONCE per
            # search (outside the step loop): every beam step re-reads
            # all decoder/LM parameters, so fp32 storage would double
            # that HBM traffic for bf16-compute models. The fp32 output
            # heads (ASRModel.seq_head/ctc_head, TransformerLM's "out")
            # are excluded: those modules compute logits in fp32 by
            # design, and quantizing their weights to bf16 would break
            # train/decode score parity for near-tied hypotheses.
            FP32_HEADS = ("seq_head", "ctc_head", "out")

            def cast_tree(tree, dt):
                def cast(path, x):
                    if any(
                        getattr(p, "key", None) in FP32_HEADS
                        for p in path
                    ):
                        return x
                    if jnp.issubdtype(x.dtype, jnp.floating):
                        return x.astype(dt)
                    return x

                return jax.tree_util.tree_map_with_path(cast, tree)

            if model.cfg.dtype == jnp.bfloat16:
                params = cast_tree(params, jnp.bfloat16)
            if (
                lm_model is not None and lm_params is not None
                and lm_model.dtype == jnp.bfloat16
            ):
                lm_params = cast_tree(lm_params, jnp.bfloat16)
            enc_rep = jnp.repeat(enc_out, k, axis=0)
            enc_lens_rep = jnp.repeat(enc_lens, k, axis=0)

            scorer = None
            scorer_state = None
            if has_ctc:
                scorer = CTCPrefixScorer(
                    ctc_log_probs, enc_lens, k, self.blank_id, self.eos_id
                )
                scorer_state = scorer.init_state()

            dec_cache = None
            if use_cache:
                from mamba_asr_tpu.models.asr import ASRModel

                dec_cache = model.apply(
                    params, n, s_cache,
                    method=ASRModel.init_decoder_cache,
                    beam_gather=use_anc and dec_is_transformer,
                )
                dec_cache = model.apply(
                    params, enc_rep, dec_cache, enc_lens_rep,
                    method=ASRModel.prime_decoder_cache,
                )

            lm_cache = None
            if has_lm and lm_model is not None:
                lm_cache = lm_model.init_cache(
                    n, s_cache, beam_gather=use_anc
                )

            # anc[j, n] = physical cache row holding position j of
            # hypothesis n's prefix. Row n writes position s at row n
            # itself, so the identity init is correct for every not-yet-
            # reordered position.
            anc0 = (
                jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (s_cache, 1))
                if use_anc
                else None
            )

            tokens0 = jnp.full((n, s_max + 1), 0, jnp.int32).at[:, 0].set(
                self.bos_id
            )
            scores0 = jnp.tile(
                jnp.concatenate(
                    [jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)]
                )[None],
                (b, 1),
            ).reshape(n)
            carry0 = (
                jnp.zeros((), jnp.int32),  # step counter
                tokens0,
                scores0,
                jnp.zeros((n,), bool),
                jnp.zeros((n,), jnp.int32),
                scorer_state,
                dec_cache,
                lm_cache,
                anc0,
            )

            def cond(carry):
                s, finished = carry[0], carry[3]
                return (s < s_max) & ~finished.all()

            def body(carry):
                s = carry[0]
                new = step_body(params, lm_params, carry[1:], s, scorer,
                                enc_rep, enc_lens_rep)
                return (s + 1,) + new

            carry = jax.lax.while_loop(cond, body, carry0)
            _, tokens, scores, finished, lengths, _, _, _, _ = carry

            # Unfinished hypotheses: count full length.
            lengths = jnp.where(finished, lengths, s_max)
            final = jnp.where(
                self.length_normalization,
                scores / jnp.maximum(lengths.astype(jnp.float32), 1.0),
                scores,
            )
            final = final.reshape(b, k)
            best = jnp.argmax(final, axis=1)
            tokens = tokens.reshape(b, k, s_max + 1)
            best_toks = jnp.take_along_axis(
                tokens, best[:, None, None], axis=1
            )[:, 0, 1:]  # strip bos
            best_lens = jnp.take_along_axis(
                lengths.reshape(b, k), best[:, None], axis=1
            )[:, 0]
            best_scores = jnp.take_along_axis(final, best[:, None], axis=1)[:, 0]
            return best_toks, best_lens, best_scores

        def step_body(params, lm_params, carry, s, scorer, enc_rep,
                      enc_lens_rep):
            (tokens, scores, finished, lengths, sc_state, dec_cache,
             lm_cache, anc) = carry

            if use_anc:
                # Position s is written by each row itself this step —
                # pin row s to the identity before the attention reads
                # (earlier end-of-step gathers shuffled every row). The
                # raw int32 table goes straight to the attention kernel,
                # which renders the validity plane in-VMEM (rendering a
                # (S, R, B) mask array here cost ~1.5 ms/step).
                anc = jax.lax.dynamic_update_slice(
                    anc, jnp.arange(n, dtype=jnp.int32)[None], (s, 0)
                )

            prev_tok = jnp.take_along_axis(
                tokens, s[None, None].astype(jnp.int32), axis=1
            )[:, 0]
            if use_cache:
                from mamba_asr_tpu.models.asr import ASRModel

                step_logits, dec_cache = model.apply(
                    params, prev_tok, s, dec_cache,
                    method=ASRModel.decode_step,
                    anc=anc if (use_anc and dec_is_transformer) else None,
                )
                lp = jax.nn.log_softmax(step_logits / self.temperature,
                                        axis=-1)
            else:
                dec = model.apply(
                    params,
                    tokens[:, :-1],
                    enc_rep,
                    enc_lens_rep,
                    method=model.decode,
                )
                logits = model.apply(
                    params,
                    dec,
                    method=lambda mdl, d: mdl.seq_head(d.astype(jnp.float32)),
                )
                step_logits = jnp.take_along_axis(
                    logits, s[None, None, None].astype(jnp.int32), axis=1
                )[:, 0]  # (N, V)
                lp = jax.nn.log_softmax(step_logits / self.temperature,
                                        axis=-1)
            total = lp

            if lm_model is not None and lm_params is not None:
                # Incremental LM step through per-layer KV buffers: O(1)
                # per step (full-prefix re-scoring of the 12-layer d768 LM
                # per step is what makes beam 66 x vocab 5000 infeasible).
                lm_step, lm_cache = lm_model.apply(
                    lm_params, prev_tok, cache=lm_cache, cache_index=s,
                    anc=anc if use_anc else None,
                )
                lm_lp = jax.nn.log_softmax(
                    lm_step / self.temperature_lm, axis=-1
                )
                total = total + self.lm_weight * lm_lp

            aux = None
            if scorer is not None:
                cand = None
                if 0 < self.ctc_candidates < total.shape[-1]:
                    # Top C-1 by decoder(+LM) score, plus eos (so finishing
                    # is always scoreable).
                    cand = jax.lax.top_k(total, self.ctc_candidates - 1)[1]
                    cand = jnp.concatenate(
                        [cand.astype(jnp.int32),
                         jnp.full((cand.shape[0], 1), eos, jnp.int32)],
                        axis=1,
                    )
                ctc_scores, aux = scorer.score(sc_state, candidates=cand)
                total = jnp.where(
                    ctc_scores <= NEG_INF * 0.5,
                    NEG_INF,
                    total + self.ctc_weight * ctc_scores,
                )

            v = total.shape[-1]
            # Forbid eos before min_steps.
            total = jnp.where(
                (s < min_steps)
                & (jnp.arange(v)[None, :] == eos),
                NEG_INF,
                total,
            )
            # Finished hypotheses only propagate via eos with 0 increment.
            is_eos = jnp.arange(v)[None, :] == eos
            total = jnp.where(
                finished[:, None], jnp.where(is_eos, 0.0, NEG_INF), total
            )

            cand = scores[:, None] + total  # (N, V)
            cand = cand.reshape(b, k * v)
            top_val, top_idx = jax.lax.top_k(cand, k)  # (B, K)
            parent = top_idx // v  # beam index within the batch row
            tok = (top_idx % v).astype(jnp.int32)
            # Flatten parent to hypothesis-row indices.
            reorder = (
                parent + jnp.arange(b)[:, None] * k
            ).reshape(n)
            tok = tok.reshape(n)
            new_scores = top_val.reshape(n)

            new_tokens = tokens[reorder].at[:, s + 1].set(tok)
            was_finished = finished[reorder]
            new_finished = was_finished | (tok == eos)
            # Length counts emitted tokens incl. eos, frozen once finished.
            new_lengths = jnp.where(
                was_finished, lengths[reorder], s + 1
            ).astype(jnp.int32)

            new_state = sc_state
            if scorer is not None:
                new_state = scorer.select(sc_state, aux, tok, reorder)
            new_cache = dec_cache
            if use_cache:
                if isinstance(dec_cache, dict) and "layers" in dec_cache:
                    # Transformer decoder. Ancestor mode: the self KV
                    # buffers are append-only — nothing to gather. Legacy
                    # mode: gather only the per-hypothesis self buffers;
                    # the cross K/V and memory mask are identical across
                    # beams of a batch row and reorder preserves row
                    # groups — skip gathering those (they are
                    # (N, T_enc, H, dh): hundreds of MB at reference
                    # scale).
                    if not use_anc:
                        new_cache = {
                            "layers": [
                                {
                                    "self": jax.tree_util.tree_map(
                                        lambda x: x[reorder], c["self"]
                                    ),
                                    "cross": c["cross"],
                                }
                                for c in dec_cache["layers"]
                            ],
                            "mem_mask": dec_cache["mem_mask"],
                        }
                else:
                    # Mamba decoder: per-hypothesis (conv, ssm) states are
                    # O(d_inner) per layer — the gather is cheap and the
                    # states are mutated in place each step, so ancestor
                    # indexing does not apply.
                    new_cache = jax.tree_util.tree_map(
                        lambda x: x[reorder], dec_cache
                    )
            new_lm_cache = lm_cache
            if lm_cache is not None and not use_anc:
                new_lm_cache = jax.tree_util.tree_map(
                    lambda x: x[reorder], lm_cache
                )
            new_anc = anc
            if use_anc:
                # New hypothesis i extends old row reorder[i]: its whole
                # prefix (including the position-s entry just written at
                # row reorder[i]) relocates by one (S, N) int32 gather.
                new_anc = anc[:, reorder]
            return (new_tokens, new_scores, new_finished, new_lengths,
                    new_state, new_cache, new_lm_cache, new_anc)

        return search


def strip_special(tokens: np.ndarray, lengths: np.ndarray, eos_id: int = 2
                  ) -> List[List[int]]:
    """(B, S) padded hyps -> lists of ids up to (excl.) eos."""
    out = []
    for i in range(tokens.shape[0]):
        seq = []
        for t in tokens[i, : int(lengths[i])]:
            if t == eos_id:
                break
            seq.append(int(t))
        out.append(seq)
    return out
