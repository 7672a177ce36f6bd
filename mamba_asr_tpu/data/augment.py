"""Augmentation: speed perturbation (host) + SpecAugment (jittable).

Reference behaviors:
- SpeedPerturb 95/100/105 % applied in dataloader workers
  (/root/reference/hparams/CTC/conmamba_large.yaml:260-264,
  /root/reference/train_CTC.py:930-937) — time-domain resampling, train
  only. Implemented as host-side linear-interp resampling.
- Augmenter of SpectrogramDrop over time and frequency
  (/root/reference/hparams/CTC/conmamba_large.yaml:273-320: 4 time drops
  of up to 20 frames, 4 freq drops of up to 10 bins) and, in S2S, a
  bicubic time Warping (/root/reference/hparams/S2S/conmamba_large.yaml:
  409-459). Implemented as a single jittable function on the feature
  batch with static shapes (mask construction from uniform draws).

The reference's Augmenter concatenates augmented copies and replicates
labels (train_CTC.py:401-403); this framework applies augmentation
in-place per batch (concat_original=False equivalent), the standard
SpecAugment formulation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

SPEED_FACTORS = (0.95, 1.0, 1.05)


SINC_WIDTH = 6  # speechbrain Resample lowpass_filter_width default


def speed_perturb(
    wav: np.ndarray, factor: float,
    rng: Optional[np.random.Generator] = None,
    quality: str = "sinc",
) -> np.ndarray:
    """Resample a waveform by `factor` (host-side).

    factor > 1 -> faster playback -> shorter output.

    quality="sinc" (default) is a Kaldi-style windowed-sinc lowpass
    resample — the quality class of the reference's SpeedPerturb
    (speechbrain Resample, /root/reference/hparams/CTC/
    conmamba_large.yaml:260-264); "linear" keeps the cheap interpolation
    (aliases content above half-Nyquist).
    """
    if factor == 1.0 or len(wav) == 0:
        return wav
    n_out = int(round(len(wav) / factor))
    lib = _resample_lib()
    if lib is not None and wav.dtype == np.float32:
        import ctypes

        src = np.ascontiguousarray(wav)
        out = np.empty(n_out, np.float32)
        fp = ctypes.POINTER(ctypes.c_float)
        if quality == "sinc":
            n = lib.sinc_resample(
                src.ctypes.data_as(fp), len(src), float(factor),
                out.ctypes.data_as(fp), n_out, SINC_WIDTH,
            )
        else:
            n = lib.linear_resample(
                src.ctypes.data_as(fp), len(src), float(factor),
                out.ctypes.data_as(fp), n_out,
            )
        return out[:n]
    if quality == "sinc":
        return sinc_resample_np(wav, factor).astype(wav.dtype)
    src_pos = np.arange(n_out, dtype=np.float64) * factor
    return np.interp(src_pos, np.arange(len(wav)), wav).astype(wav.dtype)


def sinc_resample_np(
    wav: np.ndarray, factor: float, width: int = SINC_WIDTH
) -> np.ndarray:
    """Vectorized numpy restatement of native sinc_resample (compiler-less
    fallback AND the test oracle for the C++ kernel)."""
    n_in = len(wav)
    n_out = int(round(n_in / factor))
    fc = 0.99 * 0.5 * min(1.0, 1.0 / factor)
    support = width / (2.0 * fc)
    half = int(np.ceil(support))
    t = np.arange(n_out, dtype=np.float64) * factor  # (n_out,)
    j0 = np.floor(t).astype(np.int64) - half
    k = np.arange(2 * half + 1)  # (taps,)
    j = j0[:, None] + k[None, :]  # (n_out, taps)
    x = j.astype(np.float64) - t[:, None]
    window = np.where(
        np.abs(x) < support, 0.5 * (1.0 + np.cos(np.pi * x / support)), 0.0
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(
            x == 0.0, 2.0 * fc, np.sin(2.0 * np.pi * fc * x) / (np.pi * x)
        )
    h = s * window
    valid = (j >= 0) & (j < n_in)
    samples = np.where(valid, wav[np.clip(j, 0, n_in - 1)], 0.0)
    return (h * samples * valid).sum(axis=1)


_RESAMPLE_LIB = None


def _resample_lib():
    """C++ resampler (GIL-free under loader threads); None -> np.interp."""
    global _RESAMPLE_LIB
    if _RESAMPLE_LIB is None:
        try:
            from mamba_asr_tpu import native

            _RESAMPLE_LIB = native.flac_lib() or False
        except Exception:
            _RESAMPLE_LIB = False
    return _RESAMPLE_LIB or None


def random_speed_perturb(
    wav: np.ndarray, rng: np.random.Generator,
    factors: Tuple[float, ...] = SPEED_FACTORS,
) -> np.ndarray:
    return speed_perturb(wav, factors[rng.integers(len(factors))])


def _drop_mask(
    key: Array, length: int, num_drops: int, max_width: int, batch: int
) -> Array:
    """(B, length) bool mask with `num_drops` random spans of width
    <= max_width set True per example."""
    k1, k2 = jax.random.split(key)
    starts = jax.random.randint(k1, (batch, num_drops), 0, max(length, 1))
    widths = jax.random.randint(k2, (batch, num_drops), 1, max_width + 1)
    pos = jnp.arange(length)[None, None, :]
    spans = (pos >= starts[..., None]) & (pos < (starts + widths)[..., None])
    return spans.any(axis=1)


def _cubic_weights(frac: Array) -> Array:
    """Keys cubic-convolution weights (a = -0.75, the torch/OpenCV
    convention used by F.interpolate(mode="bicubic")) for the 4 taps at
    offsets [-1, 0, 1, 2] around the sample point; frac in [0, 1).
    Returns (..., 4)."""
    a = -0.75
    d = jnp.stack(
        [frac + 1.0, frac, 1.0 - frac, 2.0 - frac], axis=-1
    )  # |x| distances of the 4 taps
    near = (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0
    far = a * d ** 3 - 5.0 * a * d ** 2 + 8.0 * a * d - 4.0 * a
    return jnp.where(d <= 1.0, near, far)


def _cubic_time_gather(
    feats: Array, src: Array, lo_bound: Array, hi_bound: Array
) -> Array:
    """Sample (B, T, F) features at fractional time positions `src`
    (B, T) with 4-tap cubic interpolation. Taps clamp to
    [lo_bound, hi_bound] per position — each warp SEGMENT is
    interpolated with replicate borders at its own edges, exactly like
    torch's per-segment bicubic interpolate calls."""
    lo = jnp.floor(src)
    frac = src - lo
    w = _cubic_weights(frac)  # (B, T, 4)
    base = lo.astype(jnp.int32)
    gather = jax.vmap(lambda x, i: x[i])
    out = 0.0
    for tap, off in enumerate((-1, 0, 1, 2)):
        idx = jnp.clip(base + off, lo_bound, hi_bound)
        out = out + w[..., tap : tap + 1] * gather(feats, idx)
    return out


def time_warp_bicubic(
    feats: Array, key: Array, window: int
) -> Array:
    """SpeechBrain `augment.freq_domain.Warping` semantics
    (/root/reference/hparams/S2S/conmamba_large.yaml:439-445): ONE
    (center c, target w) pair per batch — c ~ U[window, T-window),
    w ~ U[c-window, c+window] — then the [0, c) and [c, T) time
    segments are resized to lengths w and T-w with bicubic
    interpolation, align_corners=True. (The reference interpolates the
    (time, freq) image in 2D, but the freq size is unchanged and
    align_corners=True makes integer grid points exact, so the freq
    axis is identity — this reduces to 1-D cubic along time.)

    Expressed as a static-shape source-position map + 4-tap cubic
    gather so the dynamic (c, w) stay traced scalars under jit."""
    t = feats.shape[1]
    k_c, k_w = jax.random.split(key)
    c = jax.random.randint(k_c, (), window, t - window).astype(jnp.float32)
    w = (
        jax.random.randint(k_w, (), -window, window) + 1
    ).astype(jnp.float32) + c
    pos = jnp.arange(t, dtype=jnp.float32)
    # align_corners=True segment maps: [0, w) <- [0, c), [w, T) <- [c, T)
    left = pos * (c - 1.0) / jnp.maximum(w - 1.0, 1.0)
    right = c + (pos - w) * (t - c - 1.0) / jnp.maximum(t - w - 1.0, 1.0)
    in_left = pos < w
    src = jnp.clip(jnp.where(in_left, left, right), 0.0, t - 1.0)
    ci = c.astype(jnp.int32)
    lo_bound = jnp.where(in_left, 0, ci)
    hi_bound = jnp.where(in_left, ci - 1, t - 1)
    b = feats.shape[0]
    return _cubic_time_gather(
        feats,
        src[None, :].repeat(b, 0),
        lo_bound[None, :].repeat(b, 0),
        hi_bound[None, :].repeat(b, 0),
    )


def spec_augment(
    feats: Array,
    key: Array,
    num_time_drops: int = 4,
    time_drop_width: int = 20,
    num_freq_drops: int = 4,
    freq_drop_width: int = 10,
    time_warp_window: int = 5,
    apply_time_warp: bool = False,
    time_warp_mode: str = "bicubic",
    mask_value: float = 0.0,
) -> Array:
    """SpecAugment on (B, T, F) log-mel features, fully jittable.

    time_warp_mode "bicubic" is the reference recipe's setting
    (conmamba_large.yaml:441, SpeechBrain Warping); "linear" keeps the
    r1-r4 piecewise-linear per-example warp as an option."""
    b, t, f = feats.shape
    k_t, k_f, k_w = jax.random.split(key, 3)

    if apply_time_warp and t > 2 * time_warp_window + 2:
        if time_warp_mode == "bicubic":
            feats = time_warp_bicubic(feats, k_w, time_warp_window)
        elif time_warp_mode == "linear":
            # Piecewise-linear warp: per-example random center +/- window.
            center = jax.random.randint(
                k_w, (b,), time_warp_window + 1, t - time_warp_window - 1
            ).astype(jnp.float32)
            shift = jax.random.randint(
                jax.random.fold_in(k_w, 1), (b,), -time_warp_window,
                time_warp_window + 1,
            ).astype(jnp.float32)
            target = center + shift
            pos = jnp.arange(t, dtype=jnp.float32)[None, :]
            # Map output position -> source position piecewise linearly.
            left = pos * (center / jnp.maximum(target, 1.0))[:, None]
            right = center[:, None] + (pos - target[:, None]) * (
                (t - 1 - center) / jnp.maximum(t - 1 - target, 1.0)
            )[:, None]
            src = jnp.where(pos <= target[:, None], left, right)
            src = jnp.clip(src, 0.0, t - 1.0)
            lo = jnp.floor(src).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, t - 1)
            w = (src - lo)[..., None]
            gather = jax.vmap(lambda x, i: x[i])
            feats = (1 - w) * gather(feats, lo) + w * gather(feats, hi)
        else:
            raise ValueError(f"unknown time_warp_mode {time_warp_mode!r}")

    tmask = _drop_mask(k_t, t, num_time_drops, time_drop_width, b)
    fmask = _drop_mask(k_f, f, num_freq_drops, freq_drop_width, b)
    feats = jnp.where(tmask[:, :, None], mask_value, feats)
    feats = jnp.where(fmask[:, None, :], mask_value, feats)
    return feats
