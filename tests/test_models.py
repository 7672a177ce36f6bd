"""Encoder/decoder/ASR assembly: shapes, masking, decode paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.conformer import ConformerEncoder
from mamba_asr_tpu.models.conmamba import ConmambaEncoder, MambaDecoder
from mamba_asr_tpu.models.layers import ConvolutionFrontEnd, ConvolutionModule
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.models.transformer import (
    TransformerDecoder,
    TransformerEncoder,
    get_lookahead_mask,
    make_chunked_src_mask,
)

MCFG = MambaConfig(d_state=4, d_conv=4, expand=2, scan_impl="xla")


def test_conv_module_shapes_and_chunking():
    m = ConvolutionModule(d_model=8, kernel_size=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 8))
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # Dynamic chunk conv: no output frame may depend on frames past its
    # chunk end.
    y_chunk = m.apply(params, x, None, 5)
    x2 = x.at[:, 5:].set(7.0)
    y_chunk2 = m.apply(params, x2, None, 5)
    np.testing.assert_allclose(
        y_chunk[:, :5], y_chunk2[:, :5], rtol=1e-4, atol=1e-5
    )
    # And chunked != full (future within window is masked).
    assert not np.allclose(np.array(y), np.array(y_chunk), atol=1e-5)


def test_frontend_downsampling():
    fe = ConvolutionFrontEnd()
    feats = jnp.ones((2, 40, 80))
    params = fe.init(jax.random.PRNGKey(0), feats)
    y = fe.apply(params, feats)
    assert y.shape == (2, 10, 20, 32)
    assert fe.output_dim(80) == 640
    assert fe.downsample_factor() == 4


def test_conmamba_encoder():
    enc = ConmambaEncoder(num_layers=2, d_model=8, d_ffn=16, kernel_size=7, mamba_cfg=MCFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    params = enc.init(jax.random.PRNGKey(1), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 12, 8)


def test_conformer_encoder_padding_invariance():
    """Padded frames must not change unpadded outputs (attention mask)."""
    enc = ConformerEncoder(num_layers=1, d_model=8, d_ffn=16, nhead=2,
                           kernel_size=31, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 8))
    params = enc.init(jax.random.PRNGKey(1), x)
    kpm = jnp.arange(24)[None, :] >= 20
    y1, _ = enc.apply(params, x, None, kpm)
    y2, _ = enc.apply(params, x.at[:, 20:].set(9.0), None, kpm)
    # Conv module still mixes padding locally (kernel 31 reaches 15 frames);
    # check frames far from the pad boundary.
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], rtol=1e-3, atol=1e-4)


def test_transformer_encoder_decoder():
    enc = TransformerEncoder(num_layers=2, d_ffn=16, nhead=2,
                             attention_type="regularMHA")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    p = enc.init(jax.random.PRNGKey(1), x)
    y, _ = enc.apply(p, x)
    assert y.shape == (2, 10, 8)

    dec = TransformerDecoder(num_layers=2, d_ffn=16, nhead=2)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))
    pd = dec.init(jax.random.PRNGKey(3), tgt, y)
    out, _, _ = dec.apply(pd, tgt, y, get_lookahead_mask(5))
    assert out.shape == (2, 5, 8)


def test_decoder_causality():
    dec = TransformerDecoder(num_layers=1, d_ffn=16, nhead=2, dropout=0.0)
    mem = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    p = dec.init(jax.random.PRNGKey(2), tgt, mem)
    mask = get_lookahead_mask(6)
    y1, _, _ = dec.apply(p, tgt, mem, mask)
    y2, _, _ = dec.apply(p, tgt.at[:, 4:].set(3.0), mem, mask)
    np.testing.assert_allclose(y1[:, :4], y2[:, :4], rtol=1e-4, atol=1e-5)


def test_conformer_decoder_causality_and_memory():
    """ConformerDecoder (/root/reference/modules/Conformer.py:2178-2479,
    unreachable from reference configs — ported + wired here): the
    causal ConvModule is the only target-side mixer, so position t must
    not see tgt positions > t; the cross-attention must see memory."""
    from mamba_asr_tpu.models.conformer import ConformerDecoder

    dec = ConformerDecoder(num_layers=2, d_model=8, d_ffn=16, nhead=2,
                           kernel_size=5, dropout=0.0)
    mem = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    p = dec.init(jax.random.PRNGKey(2), tgt, mem)
    y1, attns = dec.apply(p, tgt, mem)
    assert y1.shape == (1, 6, 8) and len(attns) == 2
    y2, _ = dec.apply(p, tgt.at[:, 4:].set(3.0), mem)
    np.testing.assert_allclose(y1[:, :4], y2[:, :4], rtol=1e-4, atol=1e-5)
    y3, _ = dec.apply(p, tgt, mem * 2.0)
    assert not np.allclose(np.array(y1), np.array(y3), atol=1e-6)


def test_mamba_decoder_cross_scan():
    dec = MambaDecoder(num_layers=1, d_model=8, d_ffn=16, mamba_cfg=MCFG)
    mem = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 8))
    tgt = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    p = dec.init(jax.random.PRNGKey(2), tgt, mem)
    y = dec.apply(p, tgt, mem)
    assert y.shape == (2, 4, 8)
    # Memory influences the output (cross-mamba state passes through).
    y2 = dec.apply(p, tgt, mem * 2.0)
    assert not np.allclose(np.array(y), np.array(y2), atol=1e-6)


def test_chunked_mask():
    m = make_chunked_src_mask(8, 3, left_context_chunks=1)
    assert not m[4, 3]   # same chunk
    assert not m[4, 2]   # one chunk back
    assert m[4, 6]       # future chunk
    assert m[7, 0]       # two chunks back (> left context)


@pytest.mark.parametrize(
    "enc_mod,dec_layers,dec_mod",
    [("conmamba", 0, "transformer"),
     ("conmamba", 2, "transformer"),
     ("conmamba", 2, "mamba"),
     ("conmamba", 2, "conformer"),
     ("conformer", 0, "transformer")],
)
def test_asr_model_forward(enc_mod, dec_layers, dec_mod):
    cfg = ASRConfig(
        vocab_size=11,
        n_mels=16,
        d_model=8,
        nhead=2,
        num_encoder_layers=1,
        num_decoder_layers=dec_layers,
        d_ffn=16,
        dropout=0.0,
        encoder_module=enc_mod,
        decoder_module=dec_mod,
        kernel_size=7,
        mamba=MCFG,
    )
    model = ASRModel(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    lens = jnp.array([24, 17])
    toks = jnp.array([[1, 3, 4, 0], [1, 5, 0, 0]])
    params = model.init(
        jax.random.PRNGKey(1), feats, lens,
        toks if dec_layers else None,
    )
    out = model.apply(params, feats, lens, toks if dec_layers else None)
    t_out = 24 // 4
    assert out["ctc_log_probs"].shape == (2, t_out, 11)
    assert np.array_equal(np.array(out["enc_lengths"]), [6, 5])
    if dec_layers:
        assert out["seq_log_probs"].shape == (2, 4, 11)
    # log-softmax sanity
    s = np.exp(np.array(out["ctc_log_probs"])).sum(-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_scan_layers_equivalent_to_unrolled():
    """Transplanting per-layer params into the stacked layout must give
    identical outputs (nn.scan vs unrolled loop)."""
    from mamba_asr_tpu.models.conmamba import ConmambaEncoder

    kwargs = dict(num_layers=3, d_model=8, d_ffn=16, kernel_size=7,
                  mamba_cfg=MCFG, dropout=0.0)
    loop_enc = ConmambaEncoder(**kwargs, scan_layers=False)
    scan_enc = ConmambaEncoder(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    loop_params = loop_enc.init(jax.random.PRNGKey(1), x)
    scan_params = scan_enc.init(jax.random.PRNGKey(1), x)

    # Stack the loop layers' params along a new leading axis.
    per_layer = [loop_params["params"][f"layer_{i}"] for i in range(3)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_layer
    )
    # Param trees must be congruent.
    ref_shapes = jax.tree_util.tree_map(jnp.shape, stacked)
    inner = scan_params["params"]["stack"]["layers"]
    (inner_key,) = inner.keys()  # Body wrapper's child layer
    scan_shapes = jax.tree_util.tree_map(jnp.shape, inner[inner_key])
    assert ref_shapes == scan_shapes
    transplanted = {
        "params": {
            "stack": {"layers": {inner_key: stacked}},
            "norm": loop_params["params"]["norm"],
        }
    }
    y_loop = loop_enc.apply(loop_params, x)
    y_scan = scan_enc.apply(transplanted, x)
    np.testing.assert_allclose(y_loop, y_scan, rtol=2e-5, atol=2e-5)


def test_params_layout_conversion_roundtrip():
    from mamba_asr_tpu.models.conmamba import ConmambaEncoder
    from mamba_asr_tpu.models.params_convert import (
        scanned_to_unrolled,
        unrolled_to_scanned,
    )

    kwargs = dict(num_layers=3, d_model=8, d_ffn=16, kernel_size=7,
                  mamba_cfg=MCFG, dropout=0.0)
    loop_enc = ConmambaEncoder(**kwargs, scan_layers=False)
    scan_enc = ConmambaEncoder(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    scan_params = scan_enc.init(jax.random.PRNGKey(1), x)

    unrolled = scanned_to_unrolled(scan_params["params"], 3)
    y_scan = scan_enc.apply(scan_params, x)
    y_loop = loop_enc.apply({"params": unrolled}, x)
    np.testing.assert_allclose(y_scan, y_loop, rtol=2e-5, atol=2e-5)

    back = unrolled_to_scanned(unrolled, 3)
    flat_a = jax.tree_util.tree_leaves(back)
    flat_b = jax.tree_util.tree_leaves(scan_params["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_conformer_scan_layers_runs():
    from mamba_asr_tpu.models.conformer import ConformerEncoder

    enc = ConformerEncoder(num_layers=2, d_model=8, d_ffn=16, nhead=2,
                           kernel_size=7, dropout=0.0, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 8))
    params = enc.init(jax.random.PRNGKey(1), x)
    y, _ = enc.apply(params, x)
    assert y.shape == (2, 12, 8)


def test_layerdrop():
    enc = TransformerEncoder(num_layers=2, d_ffn=16, nhead=2,
                             attention_type="regularMHA", layerdrop=1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    p = enc.init(jax.random.PRNGKey(1), x)
    # layerdrop=1.0 at train time: every layer skipped -> output is just
    # the final LayerNorm of the input.
    y, _ = enc.apply(p, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    import flax.linen as fnn
    ln = fnn.LayerNorm()
    ln_params = {"params": p["params"]["norm"]}
    np.testing.assert_allclose(
        np.array(y), np.array(ln.apply(ln_params, x)), rtol=1e-5, atol=1e-5
    )
    # eval: all layers run.
    y_eval, _ = enc.apply(p, x)
    assert not np.allclose(np.array(y), np.array(y_eval), atol=1e-4)


def test_remat_layers_matches_plain_grads():
    """remat_layers must change memory, not math: grads equal (both
    encoders, scan_layers on)."""
    from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
    from mamba_asr_tpu.models.mamba import MambaConfig

    for enc in ("conmamba", "conformer"):
        grads = []
        for remat in (False, True):
            cfg = ASRConfig(
                vocab_size=9, n_mels=8, d_model=16, nhead=2,
                num_encoder_layers=2, num_decoder_layers=0, d_ffn=16,
                dropout=0.0, encoder_module=enc, kernel_size=7,
                mamba=MambaConfig(d_state=4, scan_impl="xla"),
                scan_layers=True, remat_layers=remat,
            )
            m = ASRModel(cfg)
            feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
            lens = jnp.array([16, 12])
            params = m.init(jax.random.PRNGKey(1), feats, lens)

            def loss(p):
                return m.apply(p, feats, lens)["ctc_log_probs"].sum()

            grads.append(jax.grad(loss)(params))
        a, b = (jax.tree_util.tree_leaves(g) for g in grads)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.array(x), np.array(y),
                                       rtol=3e-4, atol=1e-5)


def test_cnn_ffn_variant():
    """ffn_type="1dcnn" (Transformer.py:1115-1130): conv FFN replaces the
    dense FFN; the causal variant never sees future frames."""
    enc = TransformerEncoder(num_layers=2, d_ffn=16, nhead=2,
                             ffn_type="1dcnn", ffn_cnn_kernel_sizes=(3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
    p = enc.init(jax.random.PRNGKey(1), x)
    flat = jax.tree_util.tree_leaves_with_path(p)
    names = {jax.tree_util.keystr(k) for k, _ in flat}
    assert any("conv1" in n for n in names) and not any(
        "ffn']['Dense" in n for n in names
    )
    y, _ = enc.apply(p, x)
    assert y.shape == (2, 10, 8)

    # Causal: position t output independent of inputs > t when the
    # attention is causal-masked and the conv FFN left-pads.
    enc_c = TransformerEncoder(num_layers=2, d_ffn=16, nhead=2,
                               ffn_type="1dcnn", causal=True, dropout=0.0)
    p = enc_c.init(jax.random.PRNGKey(1), x)
    mask = get_lookahead_mask(10)
    y1, _ = enc_c.apply(p, x, mask)
    y2, _ = enc_c.apply(p, x.at[:, 6:].set(5.0), mask)
    np.testing.assert_allclose(y1[:, :6], y2[:, :6], rtol=1e-4, atol=1e-5)


def test_encoder_wrapper_matches_encode():
    """EncoderWrapper (TransformerASR.py:1056-1105): plain application ==
    ASRModel.encode; forward_streaming == encode_chunk."""
    from mamba_asr_tpu.models.asr import EncoderWrapper

    cfg = ASRConfig(
        vocab_size=11, n_mels=16, d_model=8, nhead=2,
        num_encoder_layers=1, num_decoder_layers=0, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", kernel_size=7, mamba=MCFG,
    )
    model = ASRModel(cfg)
    wrapper = EncoderWrapper(asr=model)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 16))
    lens = jnp.array([24, 17])
    wp = wrapper.init(jax.random.PRNGKey(1), feats, lens)
    enc_w, len_w = wrapper.apply(wp, feats, lens)
    enc_m, len_m = model.apply({"params": wp["params"]["asr"]},
                               feats, lens, method=ASRModel.encode)
    np.testing.assert_allclose(np.array(enc_w), np.array(enc_m), rtol=1e-6)
    np.testing.assert_array_equal(np.array(len_w), np.array(len_m))

    state = wrapper.apply(wp, 2, method=EncoderWrapper.make_streaming_context)
    chunk = feats[:, :8]
    out_w, _ = wrapper.apply(wp, chunk, state,
                             method=EncoderWrapper.forward_streaming)
    out_m, _ = model.apply({"params": wp["params"]["asr"]}, chunk, state,
                           method=ASRModel.encode_chunk)
    np.testing.assert_allclose(np.array(out_w), np.array(out_m), rtol=1e-6)
