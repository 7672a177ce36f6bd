"""End-to-end smoke test: tiny ConMamba-CTC learns a synthetic task.

Mirrors SURVEY.md §4's recommendation: tiny config, synthetic audio,
assert the loss decreases and greedy decode runs — the minimum
train_CTC.py-equivalent slice, on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.decoding.ctc_greedy import ctc_greedy_decode
from mamba_asr_tpu.models.asr import ASRConfig, ASRModel
from mamba_asr_tpu.models.mamba import MambaConfig
from mamba_asr_tpu.training.trainer import (
    FrontendConfig,
    SpecAugmentConfig,
    TrainConfig,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    num_params,
)


def _synthetic_batch(rng, bsz=4, seconds=0.5, sr=16000, vocab=8, s_max=6):
    n = int(seconds * sr)
    # Tones whose frequency depends on the label sequence.
    tokens = rng.integers(4, vocab, size=(bsz, s_max))
    token_lens = np.full((bsz,), s_max, np.int32)
    t = np.arange(n) / sr
    wav = np.zeros((bsz, n), np.float32)
    for b in range(bsz):
        for i, tok in enumerate(tokens[b]):
            seg = slice(i * n // s_max, (i + 1) * n // s_max)
            wav[b, seg] = np.sin(2 * np.pi * (300 + 200 * tok) * t[seg])
    return {
        "wav": wav,
        "wav_lens": np.full((bsz,), n, np.int32),
        "tokens": tokens.astype(np.int32),
        "token_lens": token_lens,
        "tokens_bos": np.zeros((bsz, s_max + 1), np.int32),
        "tokens_eos": np.zeros((bsz, s_max + 1), np.int32),
        "eos_lens": token_lens + 1,
        "weight": np.ones((bsz,), np.float32),
    }


def test_ctc_training_learns():
    cfg = ASRConfig(
        vocab_size=8,
        n_mels=20,
        d_model=32,
        num_encoder_layers=1,
        num_decoder_layers=0,
        d_ffn=32,
        dropout=0.0,
        encoder_module="conmamba",
        kernel_size=7,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    frontend = FrontendConfig(n_mels=20, n_fft=256, win_length_ms=16.0)
    tcfg = TrainConfig(
        lr=2e-3, warmup_steps=20, grad_accumulation_factor=1,
        normalizer_update_epochs=1,
    )
    tx = make_optimizer(tcfg)
    batch = _synthetic_batch(np.random.default_rng(0))

    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0), batch)
    assert num_params(state.params) > 0

    train_step = make_train_step(
        model, tx, frontend, tcfg, SpecAugmentConfig(enabled=False)
    )
    losses = []
    for i in range(40):
        state, metrics = train_step(
            state, batch, jax.random.PRNGKey(i), jnp.asarray(i < 10)
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::8]
    # Normalizer gathered statistics during the first 10 steps, then froze.
    assert float(state.normalizer.count) > 0

    eval_step = make_eval_step(model, frontend)
    out = eval_step(state.params, state.normalizer, batch)
    toks, lens = ctc_greedy_decode(out["ctc_log_probs"], out["enc_lengths"])
    assert toks.shape[0] == 4
    assert (np.array(lens) <= np.array(out["enc_lengths"])).all()


def test_s2s_training_step_runs():
    cfg = ASRConfig(
        vocab_size=12,
        n_mels=20,
        d_model=16,
        nhead=2,
        num_encoder_layers=1,
        num_decoder_layers=1,
        d_ffn=16,
        dropout=0.1,
        encoder_module="conmamba",
        decoder_module="mamba",
        kernel_size=7,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    frontend = FrontendConfig(n_mels=20, n_fft=256, win_length_ms=16.0)
    tcfg = TrainConfig(
        lr=1e-3, warmup_steps=10, grad_accumulation_factor=2,
        ctc_weight=0.3, label_smoothing=0.1,
    )
    tx = make_optimizer(tcfg)
    rng = np.random.default_rng(1)
    batch = _synthetic_batch(rng, vocab=12)
    batch["tokens_bos"][:, 0] = 1
    batch["tokens_bos"][:, 1:] = batch["tokens"]
    batch["tokens_eos"][:, :-1] = batch["tokens"]
    batch["tokens_eos"][:, -1] = 2

    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(model, tx, frontend, tcfg, SpecAugmentConfig())
    for i in range(4):
        state, metrics = train_step(
            state, batch, jax.random.PRNGKey(i), jnp.asarray(True)
        )
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_att" in metrics and "loss_ctc" in metrics
    assert int(state.step) == 4


def test_s2s_training_learns():
    """The joint CTC+attention loop actually LEARNS: loss decreases and
    decoder token accuracy rises well above chance (the reference's
    training contract, train_S2S.py:682-821 — a regression in e.g.
    kldiv masking or the decoder stack would pass a finiteness-only
    check)."""
    cfg = ASRConfig(
        vocab_size=12,
        n_mels=20,
        d_model=32,
        nhead=2,
        num_encoder_layers=1,
        num_decoder_layers=1,
        d_ffn=32,
        dropout=0.0,
        encoder_module="conmamba",
        decoder_module="mamba",
        kernel_size=7,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    frontend = FrontendConfig(n_mels=20, n_fft=256, win_length_ms=16.0)
    tcfg = TrainConfig(
        lr=2e-3, warmup_steps=30, grad_accumulation_factor=1,
        ctc_weight=0.3, label_smoothing=0.1, normalizer_update_epochs=1,
    )
    tx = make_optimizer(tcfg)
    rng = np.random.default_rng(1)
    batch = _synthetic_batch(rng, vocab=12)
    batch["tokens_bos"][:, 0] = 1
    batch["tokens_bos"][:, 1:] = batch["tokens"]
    batch["tokens_eos"][:, :-1] = batch["tokens"]
    batch["tokens_eos"][:, -1] = 2

    state = init_train_state(model, tx, frontend, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(
        model, tx, frontend, tcfg, SpecAugmentConfig(enabled=False)
    )
    losses, att_losses = [], []
    for i in range(60):
        state, metrics = train_step(
            state, batch, jax.random.PRNGKey(i), jnp.asarray(i < 10)
        )
        losses.append(float(metrics["loss"]))
        att_losses.append(float(metrics["loss_att"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, losses[::10]
    assert att_losses[-1] < att_losses[0] * 0.7, att_losses[::10]

    eval_step = make_eval_step(model, frontend)
    out = eval_step(state.params, state.normalizer, batch)
    pred = np.asarray(out["seq_log_probs"]).argmax(-1)
    tgt = batch["tokens_eos"]
    valid = np.arange(tgt.shape[1])[None, :] < batch["eos_lens"][:, None]
    acc = ((pred == tgt) & valid).sum() / valid.sum()
    assert acc > 0.5, f"teacher-forced token accuracy {acc:.2f}"


def test_augmenter_concat_parity_mode():
    """SpecAugment concat-original semantics: with identity augmentation
    (zero drops), [orig; 2 copies] must reproduce the loss of a manually
    tripled batch exactly (reference Augmenter batch composition +
    replicate_labels, train_CTC.py:401-405)."""
    cfg = ASRConfig(
        vocab_size=8,
        n_mels=20,
        d_model=32,
        num_encoder_layers=1,
        num_decoder_layers=0,
        d_ffn=32,
        dropout=0.0,
        encoder_module="conmamba",
        kernel_size=7,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    frontend = FrontendConfig(n_mels=20, n_fft=256, win_length_ms=16.0)
    tcfg = TrainConfig(
        lr=2e-3, warmup_steps=20, grad_accumulation_factor=1,
        normalizer_update_epochs=0,
    )
    batch = _synthetic_batch(np.random.default_rng(0))
    identity_aug = SpecAugmentConfig(
        enabled=True, num_time_drops=0, num_freq_drops=0,
        apply_time_warp=False, concat_original=True, repeat_augment=2,
    )
    manual = {
        k: np.concatenate([v] * 3, axis=0) for k, v in batch.items()
    }

    losses = {}
    for tag, b, sa in (
        ("concat", batch, identity_aug),
        ("manual", manual, SpecAugmentConfig(enabled=False)),
    ):
        tx = make_optimizer(tcfg)
        state = init_train_state(
            model, tx, frontend, jax.random.PRNGKey(0), batch
        )
        step = make_train_step(model, tx, frontend, tcfg, sa)
        _, metrics = step(state, b, jax.random.PRNGKey(0), jnp.asarray(False))
        losses[tag] = float(metrics["loss"])
    np.testing.assert_allclose(losses["concat"], losses["manual"], rtol=1e-5)


def test_grad_accumulation_matches_single_step():
    """Accumulation semantics: with identical micro-batches, k micro-steps
    under grad_accumulation_factor=k must produce exactly the parameters of
    ONE step at k=1 (the reference divides the loss by k then SUMS
    micro-grads — i.e. the mean of unscaled micro-grads, which is what
    optax.MultiSteps computes; a double division would shrink grads k× and
    let clip_by_global_norm fire at 5k in reference units)."""
    cfg = ASRConfig(
        vocab_size=8,
        n_mels=20,
        d_model=32,
        num_encoder_layers=1,
        num_decoder_layers=0,
        d_ffn=32,
        dropout=0.0,
        encoder_module="conmamba",
        kernel_size=7,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    frontend = FrontendConfig(n_mels=20, n_fft=256, win_length_ms=16.0)
    batch = _synthetic_batch(np.random.default_rng(0))
    specaug = SpecAugmentConfig(enabled=False)
    k = 4

    results = {}
    grad_norms = {}
    for accum in (1, k):
        tcfg = TrainConfig(
            lr=2e-3, warmup_steps=20, grad_accumulation_factor=accum,
            normalizer_update_epochs=0,
        )
        tx = make_optimizer(tcfg)
        state = init_train_state(
            model, tx, frontend, jax.random.PRNGKey(0), batch
        )
        step = make_train_step(model, tx, frontend, tcfg, specaug)
        for _ in range(1 if accum == 1 else k):
            state, metrics = step(
                state, batch, jax.random.PRNGKey(0), jnp.asarray(False)
            )
        results[accum] = jax.device_get(state.params)
        grad_norms[accum] = float(metrics["grad_norm"])

    # Micro-grad norms are unscaled (no loss/k division).
    assert np.isclose(grad_norms[1], grad_norms[k], rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(results[1])
    flatk = jax.tree_util.tree_leaves(results[k])
    for a, b in zip(flat1, flatk):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_train_step_typed_rng_keys():
    """train.rng_impl plumbing: the step accepts typed PRNG keys —
    threefry typed keys reproduce the legacy raw-PRNGKey bits exactly,
    and unsafe_rbg (TPU hardware RngBitGenerator; see DESIGN.md §8c)
    runs and learns the same step with different-but-valid masks."""
    cfg = ASRConfig(
        vocab_size=8, n_mels=20, d_model=32, num_encoder_layers=1,
        num_decoder_layers=0, d_ffn=32, dropout=0.1,
        encoder_module="conmamba", kernel_size=7,
        mamba=MambaConfig(d_state=4, scan_impl="xla"),
    )
    model = ASRModel(cfg)
    frontend = FrontendConfig(n_mels=20, n_fft=256, win_length_ms=16.0)
    tcfg = TrainConfig(lr=1e-3, warmup_steps=10, grad_accumulation_factor=1)
    tx = make_optimizer(tcfg)
    batch = _synthetic_batch(np.random.default_rng(2))
    state0 = init_train_state(
        model, tx, frontend, jax.random.PRNGKey(0), batch)
    step = make_train_step(
        model, tx, frontend, tcfg, SpecAugmentConfig(enabled=True))

    def fresh():  # the jitted step donates the state buffers
        return jax.tree_util.tree_map(jnp.copy, state0)

    _, m_raw = step(fresh(), batch, jax.random.PRNGKey(5),
                    jnp.asarray(True))
    _, m_tf = step(fresh(), batch,
                   jax.random.key(5, impl="threefry2x32"), jnp.asarray(True))
    np.testing.assert_allclose(
        float(m_raw["loss"]), float(m_tf["loss"]), rtol=0, atol=0)

    _, m_rbg = step(fresh(), batch,
                    jax.random.key(5, impl="unsafe_rbg"), jnp.asarray(True))
    assert np.isfinite(float(m_rbg["loss"]))
