"""Branchformer encoder: the reference's aspirational encoder_module
("branchformer" at /root/reference/modules/TransformerASR.py:571-572
selects an undefined class and raises NameError) implemented for real
(models/branchformer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.models.branchformer import (
    BranchformerEncoder,
    BranchformerEncoderLayer,
    ConvolutionalSpatialGatingUnit,
)


def test_branchformer_encoder_shapes():
    for attn in ("RelPosMHAXL", "regularMHA"):
        enc = BranchformerEncoder(
            num_layers=2, d_model=8, nhead=2, kernel_size=7,
            csgu_linear_units=16, attention_type=attn, dropout=0.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
        p = enc.init(jax.random.PRNGKey(1), x)
        y, _ = enc.apply(p, x)
        assert y.shape == (2, 12, 8)
        assert np.isfinite(np.array(y)).all()


def test_csgu_identity_at_init():
    """Paper init: depthwise kernel ~0, bias 1, identity gate -> the
    CSGU starts as a pass-through of the residual half."""
    csgu = ConvolutionalSpatialGatingUnit(units=16, kernel_size=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    p = csgu.init(jax.random.PRNGKey(1), x)
    y = csgu.apply(p, x)
    np.testing.assert_allclose(np.array(y), np.array(x[..., :8]),
                               rtol=1e-4, atol=1e-4)


def test_branchformer_padding_invariance():
    """Valid-frame outputs must be independent of padded-frame contents:
    attention masks padded keys; the cgMLP gate branch is zeroed on
    padded rows BEFORE its depthwise conv."""
    enc = BranchformerEncoder(
        num_layers=2, d_model=8, nhead=2, kernel_size=7,
        csgu_linear_units=16, dropout=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 8))
    p = enc.init(jax.random.PRNGKey(1), x)
    kpm = jnp.arange(24)[None, :] >= 20
    y1, _ = enc.apply(p, x, None, kpm)
    y2, _ = enc.apply(p, x.at[:, 20:].set(9.0), None, kpm)
    np.testing.assert_allclose(np.array(y1[:, :20]), np.array(y2[:, :20]),
                               rtol=1e-4, atol=1e-5)


def test_branchformer_causal():
    """causal=True: attention masks the future AND the CSGU conv pads
    left-only, so outputs at t < k must ignore changes at t >= k —
    for BOTH attention types (regularMHA needs an explicit lookahead
    mask the layer must build itself)."""
    for attn in ("RelPosMHAXL", "regularMHA"):
        layer = BranchformerEncoderLayer(
            d_model=8, nhead=2, kernel_size=5, csgu_linear_units=16,
            dropout=0.0, causal=True, attention_type=attn,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 8))
        p = layer.init(jax.random.PRNGKey(1), x)
        y1, _ = layer.apply(p, x)
        y2, _ = layer.apply(p, x.at[:, 8:].set(5.0))
        np.testing.assert_allclose(np.array(y1[:, :8]), np.array(y2[:, :8]),
                                   rtol=1e-4, atol=1e-5, err_msg=attn)


def test_branchformer_scan_layers_equivalence():
    """scan_layers=True (stacked params) == unrolled, via the generic
    layout converter."""
    from mamba_asr_tpu.models.params_convert import unrolled_to_scanned

    kw = dict(num_layers=3, d_model=8, nhead=2, kernel_size=7,
              csgu_linear_units=16, dropout=0.0)
    enc_u = BranchformerEncoder(**kw)
    enc_s = BranchformerEncoder(**kw, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    p_u = enc_u.init(jax.random.PRNGKey(1), x)
    p_s = {
        "params": unrolled_to_scanned(
            dict(p_u["params"]), 3,
            inner_key="BranchformerEncoderLayer_0",
        )
    }
    y_u, _ = enc_u.apply(p_u, x)
    y_s, _ = enc_s.apply(p_s, x)
    np.testing.assert_allclose(np.array(y_u), np.array(y_s),
                               rtol=1e-5, atol=1e-5)


def test_branchformer_csgu_chunked_no_future():
    """Dynamic Chunk Convolution in the CSGU: no output frame may
    depend on frames past its chunk end."""
    csgu = ConvolutionalSpatialGatingUnit(units=16, kernel_size=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
    # Break the identity init for a real dependence structure.
    p = csgu.init(jax.random.PRNGKey(1), x)
    p = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.ones_like(a), p
    )
    y1 = csgu.apply(p, x, None, 5)
    y2 = csgu.apply(p, x.at[:, 5:].set(7.0), None, 5)
    np.testing.assert_allclose(np.array(y1[:, :5]), np.array(y2[:, :5]),
                               rtol=1e-4, atol=1e-5)
    # And chunked != full (in-window future is masked).
    assert not np.allclose(np.array(csgu.apply(p, x)), np.array(y1),
                           atol=1e-5)


def test_branchformer_streaming_matches_chunked_training():
    """Streaming forward_chunk == the chunked-mask training forward it
    approximates (same contract as the Conformer encoder): chunked
    attention mask + DCConv offline, left-context window + conv tail
    streamed."""
    from mamba_asr_tpu.models.attention import rel_pos_encoding
    from mamba_asr_tpu.models.transformer import make_chunked_src_mask

    c, k, L = 8, 2, 32
    enc = BranchformerEncoder(
        num_layers=2, d_model=16, nhead=2, kernel_size=7,
        csgu_linear_units=32, dropout=0.0, left_context_frames=k * c,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (2, L, 16))
    params = enc.init(jax.random.PRNGKey(4), x)

    src_mask = make_chunked_src_mask(L, c, k)
    pos = rel_pos_encoding(L, 16)
    y_train, _ = enc.apply(params, x, src_mask, None, pos, c, False)

    state = enc.apply(params, 2, method=BranchformerEncoder.init_stream_state)
    outs = []
    for i in range(L // c):
        y, state = enc.apply(params, x[:, i * c:(i + 1) * c], state,
                             method=BranchformerEncoder.forward_chunk)
        outs.append(np.array(y))
    y_stream = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        y_stream, np.array(y_train), rtol=2e-4, atol=2e-5
    )


def test_branchformer_asr_model_ctc_grads():
    """End-to-end: ASRModel(encoder_module='branchformer') trains — CTC
    loss differentiates to finite grads on every param."""
    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.ops.ctc import ctc_loss

    cfg = ASRConfig(
        vocab_size=12, n_mels=16, d_model=16, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=32,
        encoder_module="branchformer", csgu_linear_units=32,
        kernel_size=7, dropout=0.1, frontend_channels=(4, 4),
    )
    model = ASRModel(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    feat_lens = jnp.array([32, 24])
    tokens = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    tok_lens = jnp.array([3, 2])
    params = model.init({"params": jax.random.PRNGKey(1)}, feats, feat_lens)

    def loss_fn(p):
        out = model.apply(
            p, feats, feat_lens, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return ctc_loss(
            out["ctc_log_probs"], tokens, out["enc_lengths"], tok_lens
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.array(g)).all() for g in leaves)
