"""StableHLO export bundles: serialize -> reload -> exact parity.

The deployment contract is that an ExportedASR bundle, loaded with no
model code, reproduces make_eval_step's CTC surface exactly (same
program, same platform). The reference has no deployment/export path
(docs-only CoreML exploration); these tests pin ours."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.serving.export import (
    ExportedASR,
    export_ctc_bundle,
)
from mamba_asr_tpu.training.normalizer import init_normalizer
from mamba_asr_tpu.training.trainer import FrontendConfig, make_eval_step

FRONTEND = FrontendConfig(n_fft=256, n_mels=20, win_length_ms=16.0)
SR = FRONTEND.sample_rate


def _model_and_params():
    cfg = ASRConfig(
        vocab_size=9, n_mels=20, d_model=8, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=16,
        dropout=0.0, encoder_module="conmamba", kernel_size=7,
        causal=True, bidirectional=False,
        mamba=MambaConfig(d_state=4, d_conv=4, expand=2, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), feats, jnp.array([16]))
    return model, variables["params"]


def _rand_wav(rng, n):
    return rng.normal(0, 0.3, size=n).astype(np.float32)


def test_export_roundtrip_exact(tmp_path):
    """Export two buckets, reload from disk, and match make_eval_step
    bitwise on an input that exercises bucket padding (shorter wav and
    fewer rows than the chosen bucket)."""
    model, params = _model_and_params()
    normalizer = init_normalizer(FRONTEND.n_mels)
    out = str(tmp_path / "bundle")
    buckets = [(1, SR // 2), (2, SR)]
    manifest = export_ctc_bundle(
        model, params, normalizer, FRONTEND, out, buckets
    )
    assert sorted(tuple(b) for b in manifest["buckets"]) == sorted(buckets)
    assert os.path.exists(os.path.join(out, "params.msgpack"))

    asr = ExportedASR(out)
    rng = np.random.default_rng(0)

    # 1 row, 0.7 s: must pick the (2, SR) bucket and pad both axes.
    n = int(0.7 * SR)
    wav = _rand_wav(rng, n)[None]
    lens = np.array([n], np.int32)
    lp, el = asr(wav, lens)
    assert lp.shape[0] == 1 and el.shape == (1,)
    assert lp.shape[2] == model.cfg.vocab_size

    # Reference: the in-framework eval step on the SAME padded shapes.
    eval_step = make_eval_step(model, FRONTEND)
    wav_pad = np.zeros((2, SR), np.float32)
    wav_pad[0, :n] = wav[0]
    batch = {
        "wav": jnp.asarray(wav_pad),
        "wav_lens": jnp.asarray(np.array([n, 1], np.int32)),
        "tokens_bos": jnp.zeros((2, 4), jnp.int32),
    }
    ref = eval_step(params, normalizer, batch)
    np.testing.assert_allclose(
        lp, np.asarray(ref["ctc_log_probs"])[:1], rtol=0, atol=0
    )
    np.testing.assert_array_equal(el, np.asarray(ref["enc_lengths"])[:1])

    # Exact-fit input picks the small bucket (no padding path).
    wav2 = _rand_wav(rng, SR // 2)[None]
    lp2, el2 = asr(wav2, np.array([SR // 2], np.int32))
    batch2 = {
        "wav": jnp.asarray(wav2),
        "wav_lens": jnp.asarray(np.array([SR // 2], np.int32)),
        "tokens_bos": jnp.zeros((1, 4), jnp.int32),
    }
    ref2 = eval_step(params, normalizer, batch2)
    np.testing.assert_allclose(
        lp2, np.asarray(ref2["ctc_log_probs"]), rtol=0, atol=0
    )
    np.testing.assert_array_equal(el2, np.asarray(ref2["enc_lengths"]))


def test_export_bucket_selection_and_overflow(tmp_path):
    """Smallest fitting bucket wins; inputs that fit no bucket raise."""
    model, params = _model_and_params()
    normalizer = init_normalizer(FRONTEND.n_mels)
    out = str(tmp_path / "bundle")
    export_ctc_bundle(
        model, params, normalizer, FRONTEND, out,
        [(1, SR // 2), (4, SR // 2), (1, SR)],
    )
    asr = ExportedASR(out)
    assert asr._pick(1, SR // 4) == (1, SR // 2)
    assert asr._pick(2, SR // 4) == (4, SR // 2)
    assert asr._pick(1, 3 * SR // 4) == (1, SR)
    try:
        asr._pick(2, SR)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_export_weights_not_inlined(tmp_path):
    """Params must be exported as ARGUMENTS, not HLO constants (the
    serialized-HLO size trap, docs/DESIGN.md §9): the StableHLO size
    must not grow with parameter count. Compare two exports that
    differ only in d_model."""
    normalizer = init_normalizer(FRONTEND.n_mels)
    sizes = {}
    for d_model in (8, 32):
        cfg = ASRConfig(
            vocab_size=9, n_mels=20, d_model=d_model, nhead=2,
            num_encoder_layers=2, num_decoder_layers=0, d_ffn=4 * d_model,
            dropout=0.0, encoder_module="conmamba", kernel_size=7,
            causal=True, bidirectional=False,
            mamba=MambaConfig(d_state=4, d_conv=4, expand=2,
                              scan_impl="xla"),
        )
        model = ASRModel(cfg)
        feats = jnp.zeros((1, 16, cfg.n_mels), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(1), feats, jnp.array([16])
        )["params"]
        out = str(tmp_path / f"b{d_model}")
        export_ctc_bundle(
            model, params, normalizer, FRONTEND, out, [(1, SR // 2)]
        )
        fn = [f for f in os.listdir(out) if f.endswith(".stablehlo")][0]
        sizes[d_model] = os.path.getsize(os.path.join(out, fn))
        n_param_bytes = sum(
            x.size * x.dtype.itemsize
            for x in jax.tree.leaves(jax.tree.map(np.asarray, params))
        )
    # 16x the parameters must not balloon the program text: allow only
    # small growth (shape literals etc.), nothing near n_param_bytes.
    assert sizes[32] < 1.5 * sizes[8], sizes
    assert sizes[32] < n_param_bytes + sizes[8], sizes


def test_export_manifest_fields(tmp_path):
    model, params = _model_and_params()
    normalizer = init_normalizer(FRONTEND.n_mels)
    out = str(tmp_path / "bundle")
    export_ctc_bundle(
        model, params, normalizer, FRONTEND, out, [(1, SR // 2)]
    )
    with open(os.path.join(out, "manifest.json")) as f:
        m = json.load(f)
    assert m["sample_rate"] == SR
    assert m["vocab_size"] == 9
    assert m["platforms"] == [jax.default_backend()]
