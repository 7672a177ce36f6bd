"""Ahead-of-time model export: portable StableHLO inference bundles.

`jax.export` serializes the jitted recognition forward (waveform ->
CTC log-probs) to StableHLO with cross-version stability guarantees,
so a serving fleet can load and run a trained model WITHOUT the
framework's model code on the worker -- the TPU-native analogue of a
TorchScript/ONNX deployment artifact. The reference has no executable
deployment surface (its Apple-Silicon/CoreML export story is docs
only, /root/reference/README/Mamba-ASR-Apple-Silicon.md); this makes
deployment a first-class framework capability.

Design notes:
- Params are ARGUMENTS of the exported function, never closed-over
  constants: closing over them would inline every weight into the HLO
  as a dense constant (the 324 MB serialized-HLO trap documented in
  docs/DESIGN.md §9). Weights ship alongside in `params.msgpack`.
- Static shapes per (batch, samples) bucket: one exported function
  per bucket, mirroring recognize.py --batch's 1 s wav bucketing.
  The loader picks the smallest fitting bucket and zero-pads; model
  outputs are length-masked by wav_lens so padding is inert.
- Two exportable surfaces. The CTC surface (ctc_log_probs,
  enc_lengths) feeds greedy decode, host-side CTC beam search, and
  timestamp extraction. The S2S surface exports the ENTIRE joint
  CTC/attention beam search (decoding/s2s_beam.py's single-dispatch
  lax.while_loop program, optional LM fusion included) as one
  StableHLO function: waveform in, beam-decoded token ids out.
- The normalizer's global mean/std (2 x n_mels floats) ARE baked in
  as constants -- tiny, and it makes the artifact self-contained.

Bundle layout (a directory):
    manifest.json             format, buckets, platforms, vocab, rates
    params.msgpack            flax msgpack of the params pytree
    fn_b{B}_t{T}.stablehlo    one serialized Exported per bucket
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from mamba_asr_tpu.training.normalizer import apply_normalizer
from mamba_asr_tpu.training.trainer import (
    FrontendConfig,
    compute_features,
    frame_lengths,
)

FORMAT_VERSION = 1
MANIFEST = "manifest.json"
PARAMS_FILE = "params.msgpack"
LM_PARAMS_FILE = "lm_params.msgpack"


def _fn_file(batch: int, samples: int) -> str:
    return f"fn_b{batch}_t{samples}.stablehlo"


def _check_platforms(platforms, unsafe_mixed_platforms: bool):
    """Refuse multi-platform exports traced from a TPU session.

    The selective scan (and the beam-attention kernel) choose their
    implementation at TRACE time from `jax.default_backend()`: a
    TPU-session trace embeds `tpu_custom_call` Pallas kernels that can
    never execute on a 'cpu' platform listed in the same export, so the
    artifact would load and then fail at call time on that platform.
    Pass `unsafe_mixed_platforms=True` to override (e.g. when the
    traced model is known to avoid every backend-branched op).
    """
    if not platforms or len(platforms) < 2 or unsafe_mixed_platforms:
        return
    if jax.default_backend() == "tpu":
        raise ValueError(
            f"multi-platform export {list(platforms)} traced from a TPU "
            "session would bake TPU-only Pallas custom calls into the "
            "bundle; export each platform from a session whose default "
            "backend matches it, or pass unsafe_mixed_platforms=True "
            "if the traced program is known to be platform-neutral"
        )


def export_ctc_bundle(
    model,
    params,
    normalizer,
    frontend: FrontendConfig,
    out_dir: str,
    buckets: Sequence[Tuple[int, int]],
    platforms: Optional[Sequence[str]] = None,
    allow_custom_calls: Sequence[str] = (),
    unsafe_mixed_platforms: bool = False,
) -> dict:
    """Serialize `(params, wav, wav_lens) -> (ctc_log_probs,
    enc_lengths)` for every (batch, samples) bucket into `out_dir`.

    `platforms` defaults to the session's default backend; pass e.g.
    ("cpu", "tpu") for a multi-platform artifact (note: the selective
    scan picks its implementation at trace time from the default
    backend, so cross-platform exports should be produced from a
    session whose default backend matches the target).
    `allow_custom_calls` opts out of jax.export's custom-call
    stability check for the named targets (Pallas kernels lower to
    custom calls whose forward-compatibility window is narrower than
    plain StableHLO).

    Returns the manifest dict.
    """
    _check_platforms(platforms, unsafe_mixed_platforms)
    params = jax.tree.map(np.asarray, jax.device_get(params))
    os.makedirs(out_dir, exist_ok=True)

    def fwd(p, wav, wav_lens):
        feats = compute_features(frontend, wav)
        t = feats.shape[1]
        flens = jnp.minimum(frame_lengths(frontend, wav_lens), t)
        feats = apply_normalizer(normalizer, feats)
        out = model.apply({"params": p}, feats, flens, None, train=False)
        return out["ctc_log_probs"], out["enc_lengths"]

    p_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    disabled = [
        jax.export.DisabledSafetyCheck.custom_call(t)
        for t in allow_custom_calls
    ]
    written = []
    for batch, samples in buckets:
        exported = jax.export.export(
            jax.jit(fwd), platforms=platforms, disabled_checks=disabled
        )(
            p_specs,
            jax.ShapeDtypeStruct((batch, samples), jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
        )
        with open(os.path.join(out_dir, _fn_file(batch, samples)), "wb") as f:
            f.write(exported.serialize())
        written.append([int(batch), int(samples)])

    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(params))

    manifest = _manifest(model, frontend, written, platforms, "ctc")
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _manifest(model, frontend, buckets, platforms, surface):
    return {
        "format": FORMAT_VERSION,
        "surface": surface,
        "buckets": buckets,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "sample_rate": int(frontend.sample_rate),
        "n_mels": int(frontend.n_mels),
        "vocab_size": int(model.cfg.vocab_size),
        "downsample": int(model.cfg.downsample),
    }


def export_s2s_bundle(
    model,
    params,
    normalizer,
    frontend: FrontendConfig,
    searcher,
    out_dir: str,
    buckets: Sequence[Tuple[int, int]],
    platforms: Optional[Sequence[str]] = None,
    allow_custom_calls: Sequence[str] = (),
    lm_params=None,
    unsafe_mixed_platforms: bool = False,
) -> dict:
    """Serialize full S2S transcription — waveform -> joint
    CTC/attention beam search -> `(tokens (B, S), lengths (B,),
    scores (B,))` — one StableHLO function per bucket. The searcher's
    whole lax.while_loop program (cache priming, beam steps, LM
    fusion, final selection) is part of the exported function, so a
    worker transcribes S2S models with no framework code. Tokens are
    returned exactly as `S2SBeamSearcher.__call__` returns them:
    WITHOUT bos/eos framing.

    When the searcher fuses an LM (`lm_weight > 0` and `lm_params`
    given), the LM weights become a second msgpack argument file; the
    loader feeds them automatically.
    """
    _check_platforms(platforms, unsafe_mixed_platforms)
    params = jax.tree.map(np.asarray, jax.device_get(params))
    has_lm = searcher.lm_model is not None and lm_params is not None
    if lm_params is not None:
        lm_params = jax.tree.map(np.asarray, jax.device_get(lm_params))
    has_ctc = searcher.ctc_weight > 0.0
    os.makedirs(out_dir, exist_ok=True)

    def fwd(p, lm_p, wav, wav_lens):
        feats = compute_features(frontend, wav)
        t = feats.shape[1]
        flens = jnp.minimum(frame_lengths(frontend, wav_lens), t)
        feats = apply_normalizer(normalizer, feats)
        out = model.apply({"params": p}, feats, flens, None, train=False)
        enc = out["enc_out"]
        search = searcher._make_search(
            enc.shape[0], enc.shape[1], has_ctc, has_lm
        )
        return search(
            {"params": p},
            lm_p,
            enc,
            out["enc_lengths"],
            out["ctc_log_probs"] if has_ctc else None,
        )

    p_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    lm_specs = (
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), lm_params)
        if has_lm
        else None
    )
    disabled = [
        jax.export.DisabledSafetyCheck.custom_call(t)
        for t in allow_custom_calls
    ]
    written = []
    for batch, samples in buckets:
        exported = jax.export.export(
            jax.jit(fwd), platforms=platforms, disabled_checks=disabled
        )(
            p_specs,
            lm_specs,
            jax.ShapeDtypeStruct((batch, samples), jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
        )
        with open(os.path.join(out_dir, _fn_file(batch, samples)), "wb") as f:
            f.write(exported.serialize())
        written.append([int(batch), int(samples)])

    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    if has_lm:
        with open(os.path.join(out_dir, LM_PARAMS_FILE), "wb") as f:
            f.write(serialization.msgpack_serialize(lm_params))

    manifest = _manifest(model, frontend, written, platforms, "s2s")
    manifest["has_lm"] = bool(has_lm)
    manifest["bos_id"] = int(searcher.bos_id)
    manifest["eos_id"] = int(searcher.eos_id)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedASR:
    """Load a bundle and transcribe acoustics with NO model code.

    CTC bundles: `__call__(wav (B, T) float32, wav_lens (B,) int) ->
    (ctc_log_probs (B, T', V), enc_lengths (B,))`. S2S bundles:
    `-> (tokens (B, S), lengths (B,), scores (B,))` from the exported
    beam search (LM weights fed automatically when bundled). Rows
    beyond B and frames beyond each enc_length are the padding
    bucket's artifacts and are already stripped/maskable by the
    caller. Deserialized executables are cached per bucket.
    """

    def __init__(self, bundle_dir: str):
        self.dir = bundle_dir
        with open(os.path.join(bundle_dir, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format"] != FORMAT_VERSION:
            raise ValueError(
                f"bundle format {self.manifest['format']} != "
                f"{FORMAT_VERSION}"
            )
        self.surface = self.manifest.get("surface", "ctc")
        with open(os.path.join(bundle_dir, PARAMS_FILE), "rb") as f:
            self.params = serialization.msgpack_restore(f.read())
        self.lm_params = None
        if self.manifest.get("has_lm"):
            with open(os.path.join(bundle_dir, LM_PARAMS_FILE), "rb") as f:
                self.lm_params = serialization.msgpack_restore(f.read())
        # Sorted so "smallest fitting bucket" is the first match.
        self.buckets = sorted(tuple(b) for b in self.manifest["buckets"])
        self._fns = {}

    def _fn(self, bucket: Tuple[int, int]):
        if bucket not in self._fns:
            with open(os.path.join(self.dir, _fn_file(*bucket)), "rb") as f:
                self._fns[bucket] = jax.export.deserialize(f.read())
        return self._fns[bucket]

    def _pick(self, batch: int, samples: int) -> Tuple[int, int]:
        fits = [
            (bs * ts, (bs, ts))
            for bs, ts in self.buckets
            if bs >= batch and ts >= samples
        ]
        if not fits:
            raise ValueError(
                f"no exported bucket fits (batch={batch}, "
                f"samples={samples}); have {self.buckets}"
            )
        return min(fits)[1]

    def __call__(self, wav: np.ndarray, wav_lens):
        wav = np.asarray(wav, np.float32)
        wav_lens = np.asarray(wav_lens, np.int32)
        b, t = wav.shape
        bb, tt = self._pick(b, t)
        wav_pad = np.zeros((bb, tt), np.float32)
        wav_pad[:b, :t] = wav
        lens_pad = np.ones((bb,), np.int32)
        lens_pad[:b] = wav_lens
        if self.surface == "s2s":
            outs = self._fn((bb, tt)).call(
                self.params, self.lm_params, wav_pad, lens_pad
            )
        else:
            outs = self._fn((bb, tt)).call(self.params, wav_pad, lens_pad)
        return tuple(np.asarray(o)[:b] for o in outs)
