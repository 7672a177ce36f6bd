"""Log-mel frontend: matmul-DFT vs numpy rfft, shapes, mel filters."""

import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.ops.fbank import (
    _dft_bases_np,
    frame_signal,
    log_mel_spectrogram,
    mel_filterbank,
    num_feature_frames,
)


def test_dft_matches_numpy_rfft():
    rng = np.random.default_rng(0)
    n_fft, win = 512, 400
    frames = rng.normal(size=(3, win)).astype(np.float32)
    cos_b, sin_b = _dft_bases_np(n_fft, win)
    re = frames @ cos_b
    im = frames @ sin_b
    windowed = frames * np.hamming(win).astype(np.float32)
    padded = np.pad(windowed, ((0, 0), (0, n_fft - win)))
    ref = np.fft.rfft(padded, axis=-1)
    np.testing.assert_allclose(re, ref.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(im, ref.imag, rtol=1e-3, atol=1e-3)


def test_framing_shape_and_content():
    wav = jnp.arange(1600, dtype=jnp.float32)[None, :]
    frames = frame_signal(wav, win_samples=400, hop=160, center=True)
    assert frames.shape == (1, (1600 + 400 - 400) // 160 + 1, 400)
    # First frame starts at -200 (zero pad), so element 200 == wav[0].
    assert float(frames[0, 0, 200]) == 0.0
    assert float(frames[0, 1, 40]) == 0.0  # starts at sample -40


def test_mel_filters_partition():
    fb = np.array(mel_filterbank(80, 512, 16000))
    assert fb.shape == (257, 80)
    # Interior frequency bins are covered by at least one filter.
    coverage = fb.sum(axis=1)
    assert (coverage[5:250] > 0).all()


def test_log_mel_shapes():
    rng = np.random.default_rng(1)
    wav = jnp.asarray(rng.normal(size=(2, 16000)).astype(np.float32))
    feats = log_mel_spectrogram(wav, n_fft=512, win_length_ms=25.0)
    assert feats.shape == (2, num_feature_frames(16000), 80)
    assert np.isfinite(np.array(feats)).all()

    feats_small = log_mel_spectrogram(wav, n_fft=400, win_length_ms=25.0)
    assert feats_small.shape == (2, 101, 80)


def test_pure_tone_hits_right_mel_bin():
    """A 1 kHz tone should concentrate energy near the 1 kHz mel bin."""
    sr = 16000
    t = np.arange(sr) / sr
    wav = jnp.asarray(np.sin(2 * np.pi * 1000 * t, dtype=np.float32))[None]
    feats = np.array(log_mel_spectrogram(wav, top_db=None))
    mean_spec = feats.mean(axis=1)[0]
    peak_bin = int(mean_spec.argmax())
    # Locate the mel filter whose center is closest to 1 kHz.
    fb = np.array(mel_filterbank(80, 512, sr))
    freqs = np.linspace(0, sr / 2, fb.shape[0])
    centers = freqs[fb.argmax(axis=0)]
    expected = int(np.abs(centers - 1000).argmin())
    assert abs(peak_bin - expected) <= 1
