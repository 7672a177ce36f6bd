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


STATE_FILE = "state_init.npz"


def _streaming_fns(server):
    """Build the pure device functions of the slot engine as flat-state
    jax functions (state pytrees travel as flat leaf lists so the
    loader never needs the pytree structure):

      tick(p, [leaves], audio (S, chunk), mask (S,)) ->
          (best (S, E_tick), [new leaves])
      bootstrap(p, audio (1, chunk)) -> (best (1, E_boot), [row leaves])
      flush(p, [row leaves], audio (1, A), rem, extra) -> best (1, E)
      flush_fresh(p, audio (1, A_f), rem, extra) -> best (1, E_f)

    `flush` reproduces the session's exact finish semantics
    (models/streaming.py: remaining center-framing frames, canonical
    padding to a downsample multiple, per-level SAME lookahead flush)
    with STATIC shapes: the frame/level counts that are dynamic in the
    session become traced scalars (`rem` = mel frames still to emit,
    `extra` = canonical zero-frames) and between-level masks zero
    everything past each level's valid emission count — positions a
    valid output can read are then bit-identical to the session's
    buffers. Consolidating the session's separate enc_fn calls into one
    `forward_chunk` requires a CAUSAL encoder (partition-invariant
    chunking); export_streaming_bundle enforces it.
    """
    import jax.tree_util as jtu

    from mamba_asr_tpu.models.asr import ASRModel
    from mamba_asr_tpu.ops.fbank import log_mel_spectrogram

    model, frontend, normalizer = (
        server.model, server.frontend, server.normalizer,
    )
    hop, win = server.hop, server.win
    chunk_samples, chunk_frames = server.chunk_samples, server.chunk_frames
    strides = model.cfg.frontend_strides
    ds = model.cfg.downsample
    tail_len = server._tail_len
    carry_lens = [s[1] for s in server._carry_shapes]
    state_treedef = jtu.tree_structure(server._state)

    def fbank_norm(window):
        feats = log_mel_spectrogram(
            window,
            sample_rate=frontend.sample_rate,
            n_fft=frontend.n_fft,
            n_mels=frontend.n_mels,
            win_length_ms=frontend.win_length_ms,
            hop_length_ms=frontend.hop_length_ms,
            center=False,
        )
        if normalizer is not None:
            feats = apply_normalizer(normalizer, feats)
        return feats

    def apply_level(p, i, buf):
        return model.apply(
            p, i, buf, (0, 0),
            method=lambda m, j, x, pd: m.frontend.apply_level(j, x, pd),
        )

    def enc_ctc_best(p, x, enc_state):
        b, t, f, c = x.shape
        enc, new_state = model.apply(
            p, x.reshape(b, t, f * c), enc_state,
            method=lambda m, z, s: m.encoder.forward_chunk(
                m.src_proj(z), s
            ),
        )
        ctc = model.apply(
            p, enc.astype(jnp.float32),
            method=lambda m, e: m.ctc_head(e),
        )
        best = jnp.argmax(jax.nn.log_softmax(ctc, -1), axis=-1)
        return best.astype(jnp.int32), new_state

    def tick_flat(p, leaves, audio, mask):
        state = jtu.tree_unflatten(state_treedef, leaves)
        best, _enc, new_state = server._tick_fn.__wrapped__(
            p, state, audio, mask
        )
        return best, jtu.tree_leaves(new_state)

    def bootstrap(p, audio):
        buf = jnp.concatenate(
            [jnp.zeros((1, win // 2), jnp.float32), audio], axis=1
        )
        n_frames = 1 + (buf.shape[1] - win) // hop
        window = buf[:, : win + (n_frames - 1) * hop]
        new_tail = buf[:, n_frames * hop:]
        assert new_tail.shape[1] == tail_len, (
            "bootstrap tail does not land on the steady template"
        )
        x = fbank_norm(window)[..., None]
        carries = []
        for i, s in enumerate(strides):
            e = (x.shape[1] - 3) // s + 1
            out = apply_level(p, i, x)
            carries.append(x[:, e * s:])
            assert carries[-1].shape[1] == carry_lens[i]
            x = out
        enc0 = model.apply(p, 1, method=ASRModel.init_streaming_state)
        best, new_enc = enc_ctc_best(p, x, enc0)
        row = {"tail": new_tail, "carry": tuple(carries), "enc": new_enc}
        return best, jtu.tree_leaves(row)

    # Static flush sizes: M mel frames cover the max remaining real
    # frames + canonical pad + per-level flush zeros, for both the
    # steady (promoted-slot) and fresh (never-promoted) tails.
    def flush_sizes(t_len):
        m = (t_len + chunk_samples - 1) // hop + 1 + ds + 1
        a = win + (m - 1) * hop - t_len
        assert a >= chunk_samples - 1
        return m, a

    def make_flush(fresh: bool):
        t_len = win // 2 if fresh else tail_len
        m, a = flush_sizes(t_len)

        def body(p, tail, carries, enc_state, audio, rem, extra):
            buf = jnp.concatenate([tail, audio], axis=1)
            window = buf[:, : win + (m - 1) * hop]
            feats = fbank_norm(window)
            pos = jnp.arange(m)
            feats = feats * (pos < rem)[None, :, None]
            x = feats[..., None]
            vin = rem + extra + 1  # + the level-0 SAME flush zero
            for i, s in enumerate(strides):
                c = 0 if carries is None else carries[i].shape[1]
                bufi = (
                    x if carries is None
                    else jnp.concatenate(
                        [carries[i].astype(x.dtype), x], axis=1
                    )
                )
                e = jnp.maximum((c + vin - 3) // s + 1, 0)
                out = apply_level(p, i, bufi)
                opos = jnp.arange(out.shape[1])
                x = out * (opos < e)[None, :, None, None]
                vin = e + 1
            best, _ = enc_ctc_best(p, x, enc_state)
            return best

        if fresh:
            def flush_fresh(p, audio, rem, extra):
                tail = jnp.zeros((1, win // 2), jnp.float32)
                enc0 = model.apply(
                    p, 1, method=ASRModel.init_streaming_state
                )
                return body(p, tail, None, enc0, audio, rem, extra)

            return flush_fresh, m, a

        def flush(p, leaves, audio, rem, extra):
            row = jtu.tree_unflatten(state_treedef, leaves)
            return body(
                p, row["tail"], row["carry"], row["enc"], audio,
                rem, extra,
            )

        return flush, m, a

    flush, m_s, a_s = make_flush(fresh=False)
    flush_fresh, m_f, a_f = make_flush(fresh=True)
    dims = {
        "flush_frames": m_s, "flush_samples": a_s,
        "flush_fresh_frames": m_f, "flush_fresh_samples": a_f,
    }
    return tick_flat, bootstrap, flush, flush_fresh, dims


def export_streaming_bundle(
    server,
    out_dir: str,
    platforms: Optional[Sequence[str]] = None,
    allow_custom_calls: Sequence[str] = (),
    unsafe_mixed_platforms: bool = False,
) -> dict:
    """Serialize the slot-batched streaming engine's device surface —
    steady `tick`, first-chunk `bootstrap`, end-of-stream `flush` /
    `flush_fresh`, plus the initial slot-state arrays — so
    `ExportedStreamingServer` runs real-time multi-stream serving with
    NO framework model code (the streaming analogue of
    export_ctc_bundle; VERDICT r4 item 7).

    Requires a CAUSAL encoder (`model.cfg.causal`): the exported flush
    consolidates the session's piecewise finish into one static-shape
    encoder call, which is exact only when chunk partitioning cannot
    change outputs. Greedy streaming only — the optional final-pass
    beam decode is a separate offline bundle (export_ctc_bundle /
    export_s2s_bundle over the accumulated utterance).
    """
    _check_platforms(platforms, unsafe_mixed_platforms)
    if not server.model.cfg.causal:
        raise ValueError(
            "export_streaming_bundle requires a causal encoder config "
            "(the exported flush consolidates chunked encoder calls)"
        )
    if server.mesh is not None:
        raise ValueError(
            "export the single-chip engine (mesh=None); shard slots "
            "across exported workers instead"
        )
    os.makedirs(out_dir, exist_ok=True)
    params = jax.tree.map(np.asarray, jax.device_get(server.params))
    p_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    state_leaves = [
        np.asarray(x) for x in jax.tree_util.tree_leaves(
            jax.device_get(server._state)
        )
    ]
    leaf_specs = [
        jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state_leaves
    ]
    row_specs = [
        jax.ShapeDtypeStruct((1,) + x.shape[1:], x.dtype)
        for x in state_leaves
    ]
    scalar = jax.ShapeDtypeStruct((), jnp.int32)
    tick, bootstrap, flush, flush_fresh, dims = _streaming_fns(server)
    disabled = [
        jax.export.DisabledSafetyCheck.custom_call(t)
        for t in allow_custom_calls
    ]

    def ex(fn, *specs):
        return jax.export.export(
            jax.jit(fn), platforms=platforms, disabled_checks=disabled
        )(p_specs, *specs).serialize()

    n_slots, chunk = server.n_slots, server.chunk_samples
    blobs = {
        "stream_tick.stablehlo": ex(
            tick, leaf_specs,
            jax.ShapeDtypeStruct((n_slots, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_slots,), jnp.bool_),
        ),
        "stream_bootstrap.stablehlo": ex(
            bootstrap, jax.ShapeDtypeStruct((1, chunk), jnp.float32)
        ),
        "stream_flush.stablehlo": ex(
            flush, row_specs,
            jax.ShapeDtypeStruct(
                (1, dims["flush_samples"]), jnp.float32
            ),
            scalar, scalar,
        ),
        "stream_flush_fresh.stablehlo": ex(
            flush_fresh,
            jax.ShapeDtypeStruct(
                (1, dims["flush_fresh_samples"]), jnp.float32
            ),
            scalar, scalar,
        ),
    }
    for name, blob in blobs.items():
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    np.savez(
        os.path.join(out_dir, STATE_FILE),
        **{f"leaf_{i:03d}": x for i, x in enumerate(state_leaves)},
    )

    boot_frames = 1 + (server.win // 2 + chunk - server.win) // server.hop
    manifest = _manifest(server.model, server.frontend, [], platforms,
                         "streaming")
    manifest.update({
        "n_slots": n_slots,
        "chunk_samples": chunk,
        "chunk_frames": server.chunk_frames,
        "hop": server.hop,
        "win": server.win,
        "tail_len": server._tail_len,
        "boot_frames": boot_frames,
        "n_state_leaves": len(state_leaves),
        **dims,
    })
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedStreamingServer:
    """Framework-free slot-batched streaming engine driven entirely by
    a bundle from `export_streaming_bundle`: same attach/feed/tick/
    finish/abort protocol and EXACTLY the same transcripts as
    `serving.engine.StreamingServer` (tested equal stream-for-stream,
    tests/test_export.py). Host logic is numpy + the four exported
    functions; slot state lives as a flat list of leading-dim-n_slots
    arrays."""

    def __init__(self, bundle_dir: str):
        self.dir = bundle_dir
        with open(os.path.join(bundle_dir, MANIFEST)) as f:
            self.m = json.load(f)
        assert self.m["surface"] == "streaming", self.m["surface"]
        with open(os.path.join(bundle_dir, PARAMS_FILE), "rb") as f:
            self.params = serialization.msgpack_restore(f.read())
        z = np.load(os.path.join(bundle_dir, STATE_FILE))
        self.state = [z[f"leaf_{i:03d}"].copy()
                      for i in range(self.m["n_state_leaves"])]
        self._fns = {}
        n = self.m["n_slots"]
        self.chunk = self.m["chunk_samples"]
        self.hop, self.ds = self.m["hop"], self.m["downsample"]
        self._bufs = [np.zeros((0,), np.float32) for _ in range(n)]
        self._active = [False] * n
        self._promoted = [False] * n
        self._samples = [0] * n
        self._frames = [0] * n
        self._enc_done = [0] * n
        self._last_tok = [0] * n
        self._sid_of_slot = [None] * n
        self._slot_of_sid = {}
        self._next_sid = 0
        self._pending = {}
        # Engine-protocol compatibility (AsrTcpServer drives either
        # engine through the same surface): no final-pass decode in the
        # exported greedy engine, plus endpointing bookkeeping.
        self.final_decode = None
        self.n_slots = n
        self._silence = [0] * n
        self._n_ticks = 0
        self._n_attached = 0
        self._n_finished = 0
        self._tokens_out = 0

    def _fn(self, name):
        if name not in self._fns:
            with open(os.path.join(self.dir, name + ".stablehlo"), "rb") as f:
                self._fns[name] = jax.export.deserialize(f.read())
        return self._fns[name]

    # -- protocol ------------------------------------------------------
    @property
    def free_slots(self) -> int:
        return sum(not a for a in self._active)

    @property
    def frame_seconds(self) -> float:
        return (self.hop / self.m["sample_rate"]) * self.ds

    def ready_slots(self):
        return [
            slot for slot in range(self.m["n_slots"])
            if self._active[slot] and self._bufs[slot].size >= self.chunk
        ]

    def trailing_silence_s(self, sid: int) -> float:
        return self._silence[self._slot_of_sid[sid]] * self.frame_seconds

    def stats(self):
        return {
            "slots": self.m["n_slots"],
            "active_streams": self.m["n_slots"] - self.free_slots,
            "attached_total": self._n_attached,
            "finished_total": self._n_finished,
            "ticks_total": self._n_ticks,
            "tokens_out": self._tokens_out,
        }

    def attach(self) -> int:
        for slot in range(self.m["n_slots"]):
            if not self._active[slot]:
                sid = self._next_sid
                self._next_sid += 1
                self._active[slot] = True
                self._promoted[slot] = False
                self._bufs[slot] = np.zeros((0,), np.float32)
                self._samples[slot] = 0
                self._frames[slot] = 0
                self._enc_done[slot] = 0
                self._last_tok[slot] = 0
                self._silence[slot] = 0
                self._sid_of_slot[slot] = sid
                self._slot_of_sid[sid] = slot
                self._n_attached += 1
                return sid
        raise RuntimeError("server full")

    def feed(self, sid: int, samples: np.ndarray) -> None:
        slot = self._slot_of_sid[sid]
        s = np.asarray(samples, np.float32).reshape(-1)
        self._bufs[slot] = np.concatenate([self._bufs[slot], s])
        self._samples[slot] += s.size

    def _collapse(self, slot: int, best_row: np.ndarray, n_out: int):
        out = []
        prev = self._last_tok[slot]
        row = best_row[:n_out]
        for t in row:
            t = int(t)
            if t != 0 and t != prev:
                out.append(t)
            prev = t
        self._last_tok[slot] = prev
        # Endpointing signal: trailing CTC-blank run over argmax frames.
        nz = np.nonzero(np.asarray(row) != 0)[0]
        if nz.size:
            self._silence[slot] = len(row) - 1 - int(nz[-1])
        else:
            self._silence[slot] += len(row)
        self._tokens_out += len(out)
        return out

    def _bootstrap(self, slot: int):
        audio = self._bufs[slot][: self.chunk][None]
        self._bufs[slot] = self._bufs[slot][self.chunk:]
        best, row = self._fn("stream_bootstrap").call(self.params, audio)
        for i, leaf in enumerate(row):
            self.state[i][slot: slot + 1] = np.asarray(leaf)
        self._promoted[slot] = True
        self._frames[slot] = self.m["boot_frames"]
        n_out = np.asarray(best).shape[1]
        self._enc_done[slot] = n_out
        return self._collapse(slot, np.asarray(best)[0], n_out)

    def tick(self):
        """Advance every stream with a full chunk buffered; returns new
        token ids keyed by stream id (plus any left pending by a
        concurrent finish — the engine's emission protocol)."""
        out = self._pending
        self._pending = {}
        for sid, toks in self._tick_once().items():
            out.setdefault(sid, []).extend(toks)
        return out

    def _tick_once(self):
        n = self.m["n_slots"]
        out = {}
        boots, steady = [], []
        for slot in range(n):
            if (self._active[slot]
                    and self._bufs[slot].size >= self.chunk):
                (steady if self._promoted[slot] else boots).append(slot)
        for slot in boots:
            toks = self._bootstrap(slot)
            if toks:
                out[self._sid_of_slot[slot]] = toks
        if steady:
            audio = np.zeros((n, self.chunk), np.float32)
            mask = np.zeros((n,), bool)
            for slot in steady:
                audio[slot] = self._bufs[slot][: self.chunk]
                self._bufs[slot] = self._bufs[slot][self.chunk:]
                mask[slot] = True
            best, new_leaves = self._fn("stream_tick").call(
                self.params, self.state, audio, mask
            )
            # np.array (copy): .call outputs are read-only views and
            # _bootstrap writes slot rows in place.
            self.state = [np.array(x) for x in new_leaves]
            best = np.asarray(best)
            e_tick = self.m["chunk_frames"] // self.ds
            for slot in steady:
                self._frames[slot] += self.m["chunk_frames"]
                self._enc_done[slot] += e_tick
                toks = self._collapse(slot, best[slot], e_tick)
                if toks:
                    out.setdefault(
                        self._sid_of_slot[slot], []
                    ).extend(toks)
            self._n_ticks += 1
        return out

    def finish(self, sid: int):
        slot = self._slot_of_sid[sid]
        while self._bufs[slot].size >= self.chunk:
            for s2, toks in self._tick_once().items():
                self._pending.setdefault(s2, []).extend(toks)
        out = list(self._pending.pop(sid, []))
        total_frames = self._samples[slot] // self.hop + 1
        extra = (-total_frames) % self.ds
        rem = total_frames - self._frames[slot]
        n_out = (total_frames + extra) // self.ds - self._enc_done[slot]
        rest = self._bufs[slot]
        if self._promoted[slot]:
            a = self.m["flush_samples"]
            audio = np.zeros((1, a), np.float32)
            audio[0, : rest.size] = rest
            row = [leaf[slot: slot + 1] for leaf in self.state]
            best = self._fn("stream_flush").call(
                self.params, row, audio,
                np.int32(max(rem, 0)), np.int32(extra),
            )
        else:
            a = self.m["flush_fresh_samples"]
            audio = np.zeros((1, a), np.float32)
            audio[0, : rest.size] = rest
            best = self._fn("stream_flush_fresh").call(
                self.params, audio,
                np.int32(max(rem, 0)), np.int32(extra),
            )
        out.extend(self._collapse(slot, np.asarray(best)[0], n_out))
        self.abort(sid)
        self._n_finished += 1
        return out

    def abort(self, sid: int) -> None:
        slot = self._slot_of_sid.pop(sid)
        self._active[slot] = False
        self._sid_of_slot[slot] = None
        self._bufs[slot] = np.zeros((0,), np.float32)


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
