"""CTC prefix beam search: on-device vs host oracle vs greedy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search, ctc_beam_search_ref
from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode


def _rand_logprobs(seed, bsz=2, t=12, v=6, peaky=2.0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(bsz, t, v)).astype(np.float32) * peaky
    return np.array(jax.nn.log_softmax(jnp.asarray(logits), -1))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_beam_matches_host_oracle(seed):
    lp = _rand_logprobs(seed)
    lens = np.array([12, 9])
    toks, tlens = jax.jit(
        lambda l, il: ctc_beam_search(l, il, beam_size=8,
                                      token_prune_min_logp=-5.0)
    )(jnp.asarray(lp), jnp.asarray(lens))
    for b in range(lp.shape[0]):
        ref = ctc_beam_search_ref(
            lp[b], lens[b], beam_size=8, token_prune_min_logp=-5.0
        )
        got = list(np.array(toks[b, : int(tlens[b])]))
        assert got == ref, (seed, b, got, ref)


def test_device_beam_matches_oracle_longer_ref_params():
    """Longer sequence, the reference's pruning params (-12 / -1.2)."""
    lp = _rand_logprobs(11, bsz=2, t=40, v=8, peaky=1.5)
    lens = np.array([40, 33])
    toks, tlens = ctc_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), beam_size=12,
        beam_prune_logp=-12.0, token_prune_min_logp=-1.2,
    )
    for b in range(2):
        ref = ctc_beam_search_ref(lp[b], lens[b], beam_size=12)
        got = list(np.array(toks[b, : int(tlens[b])]))
        assert got == ref, (b, got, ref)


def test_beam_equals_greedy_when_peaky():
    """With a dominant per-frame path, beam must reduce to greedy."""
    lp = _rand_logprobs(5, bsz=2, t=20, v=6, peaky=8.0)
    lens = np.array([20, 20])
    toks_b, lens_b = ctc_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), beam_size=8
    )
    toks_g, lens_g = ctc_greedy_decode(jnp.asarray(lp), jnp.asarray(lens))
    for b in range(2):
        gb = list(np.array(toks_b[b, : int(lens_b[b])]))
        gg = list(np.array(toks_g[b, : int(lens_g[b])]))
        assert gb == gg


def test_sharp_path_decodes_exactly():
    v, t = 5, 8
    path = [0, 1, 1, 0, 2, 0, 3, 3]  # -> [1, 2, 3]
    logits = np.full((1, t, v), -15.0, np.float32)
    for i, c in enumerate(path):
        logits[0, i, c] = 10.0
    lp = np.array(jax.nn.log_softmax(jnp.asarray(logits), -1))
    toks, lens = ctc_beam_search(jnp.asarray(lp), jnp.asarray([t]), beam_size=4)
    assert list(np.array(toks[0, : int(lens[0])])) == [1, 2, 3]


def test_nbest_and_rescoring():
    from mamba_asr_tpu.decoding.ctc_beam import ctc_beam_search_nbest
    from mamba_asr_tpu.decoding.rescore import rescore_nbest
    from mamba_asr_tpu.models.lm import TransformerLM

    lp = _rand_logprobs(3, bsz=2, t=14, v=6)
    lens = np.array([14, 11])
    toks, tlens, scores = ctc_beam_search_nbest(
        jnp.asarray(lp), jnp.asarray(lens), nbest=4, beam_size=8,
        token_prune_min_logp=-8.0,
    )
    assert toks.shape[:2] == (2, 4)
    # Scores sorted best-first and 1-best equals ctc_beam_search's pick.
    s = np.array(scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()
    best_toks, best_lens = ctc_beam_search(
        jnp.asarray(lp), jnp.asarray(lens), beam_size=8,
        token_prune_min_logp=-8.0,
    )
    for b in range(2):
        np.testing.assert_array_equal(
            np.array(toks[b, 0, : int(tlens[b, 0])]),
            np.array(best_toks[b, : int(best_lens[b])]),
        )

    # LM rescoring runs and returns a hypothesis from the n-best set.
    lm = TransformerLM(vocab_size=6, d_model=16, nhead=2, num_layers=1,
                       d_ffn=16)
    lm_params = lm.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
    r_toks, r_lens = rescore_nbest(
        toks, tlens, scores, lm, lm_params, lm_weight=0.5,
    )
    for b in range(2):
        cand = [list(np.array(toks[b, i, : int(tlens[b, i])]))
                for i in range(4)]
        assert list(np.array(r_toks[b, : int(r_lens[b])])) in cand


def test_ctc_beam_reference_shape_regime():
    """The CTC recipes' test decoder shape: beam 100, prune -12/-1.2,
    T 512 (hparams/CTC/conmamba_large.yaml:232-237), with realistic
    peaked emissions. Device search must match the host oracle's top
    hypothesis."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from bench_ctc_beam import synthetic_log_probs

    t, v = 512, 31
    lp = synthetic_log_probs(t, v, seed=3)
    toks, lens = ctc_beam_search(
        jnp.asarray(lp)[None], jnp.asarray([t]), beam_size=100,
        beam_prune_logp=-12.0, token_prune_min_logp=-1.2,
    )
    got = list(np.array(toks[0, : int(lens[0])]))
    want = ctc_beam_search_ref(
        np.asarray(lp), t, beam_size=100,
        beam_prune_logp=-12.0, token_prune_min_logp=-1.2,
    )
    assert got == list(want), (got[:20], list(want)[:20])


def test_ctc_dp_pallas_matches_xla_scans():
    """Fused Pallas select-DP kernel (interpret mode) vs the XLA
    associative-scan formulation, including ragged lengths (carry-through
    at invalid frames) and T not a multiple of the kernel's 128 cols."""
    import jax.numpy as jnp

    from mamba_asr_tpu.decoding.ctc_prefix_scorer import (
        NEG_INF,
        _linear_log_scan,
    )
    from mamba_asr_tpu.ops.pallas.log_scan import ctc_dp_pallas

    rng = np.random.default_rng(7)
    t, n = 300, 5
    lens = np.array([300, 215, 300, 1, 77])
    valid = (np.arange(t)[None, :] < lens[:, None])  # (N, T)
    lp_tok = np.log(rng.dirichlet(np.ones(4), size=(n, t))[:, :, 0] + 1e-9)
    phi = rng.normal(size=(n, t)) * 2 - 5
    lpb = np.where(valid, np.log(rng.uniform(0.1, 0.9, size=(n, t))), 0.0)

    grow = np.where(valid, phi + lp_tok, NEG_INF)
    a_nb = np.where(valid, lp_tok, 0.0)
    a_nb_j, grow_j, lpb_j = map(jnp.asarray, (a_nb, grow, lpb))

    r_nb_ref = _linear_log_scan(a_nb_j.T, grow_j.T).T
    r_nb_shift = jnp.concatenate(
        [jnp.full((n, 1), NEG_INF), r_nb_ref[:, :-1]], axis=1
    )
    b_b = jnp.where(valid, r_nb_shift + lpb_j, NEG_INF)
    r_b_ref = _linear_log_scan(lpb_j.T, b_b.T).T

    r_nb_t, r_b_t = ctc_dp_pallas(
        a_nb_j.T, grow_j.T, lpb_j.T,
        jnp.asarray(valid.astype(np.float32)).T, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(r_nb_t.T), np.asarray(r_nb_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_b_t.T), np.asarray(r_b_ref), rtol=1e-5, atol=1e-5
    )
