"""Ancestor-masked beam attention: kernel vs gather oracle, and
end-to-end searcher equivalence vs the legacy reorder path.

Reference behavior: the beam search's KV bookkeeping must be
semantically identical to physically reordering caches by the parent
permutation each step (what SpeechBrain's searcher achieves by
re-running the full prefix, /root/reference/train_S2S.py:382-394).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_asr_tpu.ops.pallas.beam_attention import (
    _pick_h_block,
    beam_attention,
    beam_attention_gather,
    beam_attention_pallas,
    beam_attention_xla,
    build_anc_mask,
)


def _gather_oracle(q, k, v, anc, pos):
    """Direct per-hypothesis gather + softmax (numpy)."""
    h, s, b, dh = k.shape
    q, k, v, anc = map(np.asarray, (q, k, v, anc))
    out = np.zeros((b, h, dh), np.float32)
    for n in range(b):
        ke = np.stack([k[:, j, anc[j, n]] for j in range(pos + 1)], 1)
        ve = np.stack([v[:, j, anc[j, n]] for j in range(pos + 1)], 1)
        sc = np.einsum("hd,hjd->hj", q[n], ke) / math.sqrt(dh)
        a = np.exp(sc - sc.max(-1, keepdims=True))
        a /= a.sum(-1, keepdims=True)
        out[n] = np.einsum("hj,hjd->hd", a, ve)
    return out


@pytest.mark.parametrize("h_block", [1, 2])
@pytest.mark.parametrize("pos", [0, 5, 63, 64, 100, 127])
def test_beam_attention_matches_gather_oracle(pos, h_block):
    rng = np.random.default_rng(0)
    h, s, b, dh = 2, 128, 5, 8
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, s, b, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, s, b, dh)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, b, size=(s, b)), jnp.int32)
    mask = build_anc_mask(anc, pos, b, jnp.float32)
    ref = _gather_oracle(q, k, v, anc, pos)

    out_xla = np.asarray(beam_attention_xla(q, k, v, mask))
    np.testing.assert_allclose(out_xla, ref, atol=1e-5)

    # Pallas in interpreter mode exercises the chunked online-softmax +
    # chunk-skip (clamped index map) + in-kernel ancestor-plane logic on
    # any backend, at both the blocked and unblocked head paths.
    out_pl = np.asarray(
        beam_attention_pallas(q, k, v, anc, pos, j_chunk=32,
                              h_block=h_block, interpret=True)
    )
    np.testing.assert_allclose(out_pl, ref, atol=1e-5)


def test_beam_attention_bf16_cache():
    rng = np.random.default_rng(1)
    h, s, b, dh = 2, 64, 4, 8
    pos = 30
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, s, b, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(h, s, b, dh)), jnp.bfloat16)
    anc = jnp.asarray(rng.integers(0, b, size=(s, b)), jnp.int32)
    ref = _gather_oracle(
        q, k.astype(jnp.float32), v.astype(jnp.float32), anc, pos
    )
    out_pl = np.asarray(
        beam_attention_pallas(q, k, v, anc, pos, j_chunk=32,
                              interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(out_pl, ref, atol=3e-2)


@pytest.mark.parametrize("pos", [0, 5, 63, 100, 127])
def test_beam_attention_gather_matches_oracle(pos):
    """The O(N*S) gather-at-read path (large batch x beam fallback)."""
    rng = np.random.default_rng(2)
    h, s, b, dh = 2, 128, 5, 8
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, s, b, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, s, b, dh)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, b, size=(s, b)), jnp.int32)
    ref = _gather_oracle(q, k, v, anc, pos)
    out = np.asarray(beam_attention_gather(q, k, v, anc, pos))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_beam_attention_large_n_dispatch():
    """Regression for the 56-utt x beam-8 VMEM OOM: at n = batch x beam
    = 448 the kernel's O(j_chunk * n^2) validity plane cannot fit VMEM
    (observed 56 MB ask vs 16 MB limit on a v5e); _pick_h_block must
    signal no-fit and the dispatch must produce correct output through
    the gather path at exactly that shape."""
    assert _pick_h_block(2, 64, 448, 32, 4) is None
    # The LM-fusion decode regime must keep the kernel.
    assert _pick_h_block(12, 64, 66, 64, 2) is not None

    rng = np.random.default_rng(4)
    h, s, n, dh = 2, 448, 448, 32
    pos = 37
    q = jnp.asarray(rng.normal(size=(n, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, s, n, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, s, n, dh)), jnp.float32)
    anc = jnp.asarray(rng.integers(0, n, size=(s, n)), jnp.int32)
    out = np.asarray(beam_attention(q, k, v, anc, pos))
    # Spot-check a few hypotheses against the scalar oracle (the full
    # 448-row oracle is O(n^2 * s) python — too slow for CI).
    q_np, k_np, v_np, anc_np = map(np.asarray, (q, k, v, anc))
    for n_i in (0, 7, 211, 447):
        ke = np.stack([k_np[:, j, anc_np[j, n_i]]
                       for j in range(pos + 1)], 1)
        ve = np.stack([v_np[:, j, anc_np[j, n_i]]
                       for j in range(pos + 1)], 1)
        sc = np.einsum("hd,hjd->hj", q_np[n_i], ke) / math.sqrt(dh)
        a = np.exp(sc - sc.max(-1, keepdims=True))
        a /= a.sum(-1, keepdims=True)
        exp = np.einsum("hj,hjd->hd", a, ve)
        np.testing.assert_allclose(out[n_i], exp, atol=1e-5)


def _tiny_s2s_setup(decoder_module):
    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig

    cfg = ASRConfig(
        vocab_size=17, n_mels=12, d_model=16, nhead=2,
        num_encoder_layers=1, num_decoder_layers=2, d_ffn=24,
        encoder_module="transformer", decoder_module=decoder_module,
        attention_type="regularMHA", dropout=0.0,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, 32, 12)), jnp.float32)
    lens = jnp.asarray([32, 24], jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats, lens,
        jnp.asarray([[1, 3, 4], [1, 5, 2]], jnp.int32),
    )
    out = model.apply(params, feats, lens)
    return model, params, out


@pytest.mark.parametrize("decoder_module", ["transformer", "mamba"])
def test_searcher_beam_gather_matches_reorder(decoder_module):
    """Full search: ancestor-mask mode == legacy reorder mode."""
    from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher
    from mamba_asr_tpu.models.lm import TransformerLM

    model, params, out = _tiny_s2s_setup(decoder_module)
    lm = TransformerLM(vocab_size=17, d_model=16, nhead=2, num_layers=2,
                       d_ffn=24)
    lm_params = lm.init(jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32))

    results = {}
    for mode in (True, False):
        searcher = S2SBeamSearcher(
            model, beam_size=4, ctc_weight=0.3, lm_weight=0.4,
            lm_model=lm, max_steps_cap=12, beam_gather=mode,
            ctc_candidates=8,
        )
        toks, lens_, scores = searcher(
            params, out["enc_out"], out["enc_lengths"],
            ctc_log_probs=out["ctc_log_probs"], lm_params=lm_params,
        )
        results[mode] = (np.asarray(toks), np.asarray(lens_),
                         np.asarray(scores))

    np.testing.assert_array_equal(results[True][0], results[False][0])
    np.testing.assert_array_equal(results[True][1], results[False][1])
    np.testing.assert_allclose(results[True][2], results[False][2],
                               atol=1e-4)
