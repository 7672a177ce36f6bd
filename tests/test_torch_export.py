"""Tests for the flax -> reference-torch checkpoint exporter.

Three layers of proof, mirroring test_torch_import.py on the other side:

1. export -> import round-trip is the identity on the params tree, for
   all four architecture families (the importer's consumption tracking
   additionally guarantees the exported dict carries exactly the
   reference's key set — no extra, no missing).
2. An export strict-loads into the independently-coded torch replicas
   from test_torch_import (the reference's module naming) and the torch
   forward then matches the flax forward — i.e. a reference user really
   can run our weights.
3. Unrepresentable trees fail loudly (branchformer; stray leaves).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.lm import TransformerLM
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.models.torch_export import (
    export_asr_params,
    export_lm_params,
    export_normalizer_stats,
)
from mamba_asr_tpu.models.torch_import import (
    import_asr_params,
    import_lm_params,
    import_normalizer_stats,
)

@pytest.fixture(autouse=True)
def _torch_no_grad():
    """The torch replicas from test_torch_import randomize params
    in-place; scope grad-off here the same way that module does."""
    prev = torch.is_grad_enabled()
    torch.set_grad_enabled(False)
    yield
    torch.set_grad_enabled(prev)


MAMBA = MambaConfig(d_state=4, d_conv=4, expand=2, dt_rank=2)


def _cfg(**kw):
    base = dict(
        vocab_size=13, n_mels=10, d_model=16, nhead=2,
        num_encoder_layers=2, num_decoder_layers=0, d_ffn=24,
        dropout=0.0, activation="gelu", encoder_module="conmamba",
        attention_type="RelPosMHAXL", kernel_size=7,
        frontend_channels=(4, 6), frontend_strides=(2, 2),
        mamba=MAMBA, bidirectional=True, scan_layers=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return ASRConfig(**base)


def _init_params(cfg, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(2, 24, cfg.n_mels)), jnp.float32)
    tokens = (
        jnp.asarray(rng.integers(1, cfg.vocab_size, size=(2, 5)), jnp.int32)
        if cfg.num_decoder_layers > 0
        else None
    )
    model = ASRModel(cfg)
    params = model.init(jax.random.PRNGKey(seed), feats, None, tokens)[
        "params"
    ]
    return model, params, feats, tokens


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(b)}
    assert {jax.tree_util.keystr(p) for p, _ in la} == set(lb)
    for p, va in la:
        np.testing.assert_array_equal(
            np.asarray(va, np.float32), lb[jax.tree_util.keystr(p)],
            err_msg=jax.tree_util.keystr(p),
        )


@pytest.mark.parametrize(
    "kw",
    [
        {},  # ConMamba CTC
        {"encoder_module": "conformer"},  # Conformer CTC
        {"num_decoder_layers": 2, "decoder_module": "transformer"},
        {"num_decoder_layers": 2, "decoder_module": "mamba"},
        {"encoder_module": "conformer", "attention_type": "regularMHA"},
    ],
)
def test_export_import_identity(kw):
    cfg = _cfg(**kw)
    _, params, _, _ = _init_params(cfg)
    sd = export_asr_params(params, cfg)
    back = import_asr_params(sd, cfg)  # finalize() checks key exactness
    _assert_tree_equal(params, back)


def test_export_scanned_layout():
    """Scanned-stack params export to the same state_dict as their
    unrolled conversion, and round-trip back exactly."""
    from mamba_asr_tpu.models.params_convert import convert_encoder_layout

    cfg_s = _cfg(scan_layers=True)
    _, params_s, _, _ = _init_params(cfg_s, seed=1)
    sd = export_asr_params(params_s, cfg_s)
    back = import_asr_params(sd, _cfg())
    unrolled = convert_encoder_layout(
        params_s, cfg_s.num_encoder_layers, to_scanned=False
    )
    _assert_tree_equal(unrolled, back)


@pytest.mark.parametrize(
    "kw,seed",
    [
        ({}, 10),
        ({"encoder_module": "conformer"}, 11),
        ({"num_decoder_layers": 2, "decoder_module": "transformer"}, 12),
        ({"num_decoder_layers": 2, "decoder_module": "mamba"}, 13),
    ],
)
def test_export_loads_into_reference_replica(kw, seed):
    """The exported state_dict drops into the reference-named torch
    replica (strict on parameters; only PE buffers may be absent) and
    the torch forward matches the flax forward."""
    from tests.test_torch_import import build_ref_model, ref_forward

    cfg = _cfg(**kw)
    model, params, feats, tokens = _init_params(cfg, seed=seed)
    out = model.apply(
        {"params": params}, feats, None, tokens,
    )

    sd = export_asr_params(params, cfg)
    ref = build_ref_model(cfg, lambda: torch.nn.GELU(), seed=99)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not unexpected, unexpected
    assert all(".pe" in k or "positional_encoding" in k for k in missing), (
        missing
    )
    ctc_ref, seq_ref = ref_forward(
        ref, cfg, np.asarray(feats),
        np.asarray(tokens) if tokens is not None else None,
    )
    np.testing.assert_allclose(
        np.asarray(out["ctc_log_probs"]), ctc_ref, atol=2e-4, rtol=2e-4
    )
    if tokens is not None:
        np.testing.assert_allclose(
            np.asarray(out["seq_log_probs"]), seq_ref, atol=2e-4, rtol=2e-4
        )


def test_export_lm_roundtrip():
    lm = TransformerLM(vocab_size=11, d_model=16, nhead=2, num_layers=2,
                       d_ffn=24)
    params = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 6), jnp.int32)
    )["params"]
    sd = export_lm_params(params, num_layers=2)
    back = import_lm_params(sd, num_layers=2)
    _assert_tree_equal(params, back)


def test_export_rejects_branchformer():
    cfg = _cfg(encoder_module="branchformer")
    with pytest.raises(ValueError, match="branchformer"):
        export_asr_params({}, cfg)


def test_export_rejects_stray_leaves():
    """A leaf the reference layout cannot hold must raise, not vanish."""
    cfg = _cfg()
    _, params, _, _ = _init_params(cfg)
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["extra_head"] = {"kernel": np.zeros((2, 2), np.float32)}
    with pytest.raises(ValueError, match="not exported"):
        export_asr_params(params, cfg)


def test_export_normalizer_roundtrip():
    from mamba_asr_tpu.training.normalizer import NormalizerState

    rng = np.random.default_rng(0)
    mean = rng.normal(size=(10,)).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=(10,)).astype(np.float32)
    count = 37.0
    st = NormalizerState(
        mean=jnp.asarray(mean),
        m2=jnp.asarray(std**2 * count),
        count=jnp.asarray(count, jnp.float32),
    )
    obj = export_normalizer_stats(st)
    m2, s2, c2 = import_normalizer_stats(obj)
    np.testing.assert_allclose(m2, mean, rtol=1e-6)
    np.testing.assert_allclose(s2, std, rtol=1e-5)
    assert c2 == count


def test_save_torch_asr_file(tmp_path):
    """File-level round trip through torch.save/torch.load."""
    from mamba_asr_tpu.models.torch_export import save_torch_asr
    from mamba_asr_tpu.models.torch_import import load_torch_asr

    cfg = _cfg()
    _, params, _, _ = _init_params(cfg, seed=7)
    path = str(tmp_path / "model.ckpt")
    save_torch_asr(params, cfg, path)
    back = load_torch_asr(path, cfg)
    _assert_tree_equal(params, back)
