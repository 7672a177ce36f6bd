"""CTC loss vs torch.nn.functional.ctc_loss (CPU golden)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mamba_asr_tpu.ops.ctc import ctc_forward_score, ctc_loss


def _random_case(seed, bsz=3, t_max=20, s_max=6, vocab=7):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(bsz, t_max, vocab)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    input_lengths = rng.integers(s_max * 2 + 2, t_max + 1, size=bsz)
    label_lengths = rng.integers(1, s_max + 1, size=bsz)
    labels = rng.integers(1, vocab, size=(bsz, s_max))
    return np.array(log_probs), labels, input_lengths, label_lengths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_torch(seed):
    log_probs, labels, in_len, lab_len = _random_case(seed)
    ours = ctc_forward_score(
        jnp.asarray(log_probs), jnp.asarray(labels),
        jnp.asarray(in_len), jnp.asarray(lab_len), blank_id=0,
    )
    lp_t = torch.tensor(log_probs).transpose(0, 1)  # (T, B, V)
    theirs = F.ctc_loss(
        lp_t, torch.tensor(labels), torch.tensor(in_len),
        torch.tensor(lab_len), blank=0, reduction="none",
        zero_infinity=False,
    )
    np.testing.assert_allclose(np.array(ours), theirs.numpy(), rtol=1e-4, atol=1e-4)


def test_repeated_labels():
    """Repeats force blank transitions — the allow_skip mask path."""
    rng = np.random.default_rng(7)
    bsz, t_max, vocab = 2, 18, 5
    logits = rng.normal(size=(bsz, t_max, vocab)).astype(np.float32)
    log_probs = np.array(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = np.array([[1, 1, 2, 2], [3, 3, 3, 3]])
    in_len = np.array([18, 16])
    lab_len = np.array([4, 4])
    ours = ctc_forward_score(
        jnp.asarray(log_probs), jnp.asarray(labels),
        jnp.asarray(in_len), jnp.asarray(lab_len),
    )
    theirs = F.ctc_loss(
        torch.tensor(log_probs).transpose(0, 1), torch.tensor(labels),
        torch.tensor(in_len), torch.tensor(lab_len),
        blank=0, reduction="none",
    )
    np.testing.assert_allclose(np.array(ours), theirs.numpy(), rtol=1e-4, atol=1e-4)


def test_gradient_matches_torch():
    """Compare d(loss)/d(logits) — torch's ctc_loss backward returns the
    logits gradient even though it takes log_probs, so push both through
    log_softmax for an apples-to-apples check."""
    rng = np.random.default_rng(3)
    bsz, t_max, s_max, vocab = 2, 15, 4, 7
    logits = rng.normal(size=(bsz, t_max, vocab)).astype(np.float32)
    in_len = rng.integers(s_max * 2 + 2, t_max + 1, size=bsz)
    lab_len = rng.integers(1, s_max + 1, size=bsz)
    labels = rng.integers(1, vocab, size=(bsz, s_max))

    def f(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len),
            jnp.asarray(lab_len), reduction="sum",
        )

    g_ours = jax.grad(f)(jnp.asarray(logits))

    lg_t = torch.tensor(logits, requires_grad=True)
    loss = F.ctc_loss(
        torch.log_softmax(lg_t, dim=-1).transpose(0, 1),
        torch.tensor(labels), torch.tensor(in_len),
        torch.tensor(lab_len), blank=0, reduction="sum",
    )
    loss.backward()
    np.testing.assert_allclose(
        np.array(g_ours), lg_t.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_batchmean_reduction_and_weights():
    log_probs, labels, in_len, lab_len = _random_case(4)
    lp, lb = jnp.asarray(log_probs), jnp.asarray(labels)
    il, ll = jnp.asarray(in_len), jnp.asarray(lab_len)
    per = ctc_loss(lp, lb, il, ll, reduction="none")
    bm = ctc_loss(lp, lb, il, ll, reduction="batchmean")
    np.testing.assert_allclose(float(bm), float(per.sum() / per.shape[0]), rtol=1e-6)
    w = jnp.array([1.0, 1.0, 0.0])
    bmw = ctc_loss(lp, lb, il, ll, reduction="batchmean", weight=w)
    np.testing.assert_allclose(float(bmw), float(per[:2].sum() / 2.0), rtol=1e-6)


def test_perfect_alignment_low_loss():
    """A sharp correct alignment should have near-zero loss."""
    labels = jnp.array([[1, 2, 3]])
    t_max, vocab = 7, 5
    path = [1, 0, 2, 0, 3, 0, 0]
    logits = np.full((1, t_max, vocab), -20.0, np.float32)
    for t, c in enumerate(path):
        logits[0, t, c] = 20.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    nll = ctc_forward_score(lp, labels, jnp.array([7]), jnp.array([3]))
    assert float(nll[0]) < 1e-3
