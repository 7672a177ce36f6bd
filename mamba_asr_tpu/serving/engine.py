"""Slot-batched streaming ASR engine: many independent real-time audio
streams multiplexed onto one accelerator.

The reference framework has no serving path — inference is the offline
test-set loop (/root/reference/train_CTC.py:233-270) and its streaming
support is a single-stream forward context
(/root/reference/modules/TransformerASR.py:931-1049). A production
deployment needs N *independent* microphone streams sharing one chip.

TPU-native design:

- The chip sees ONE executable: `tick(params, state, audio, mask)` — a
  fixed-shape jitted function over `n_slots` stacked sessions that runs
  fbank -> conv frontend -> encoder chunk -> CTC argmax for every slot
  in one dispatch. Fixed shapes mean it compiles once; XLA batches all
  slots' work onto the MXU/VPU together, so per-stream cost falls as
  slots fill (see scripts/bench_serving.py).
- All per-slot device state (audio framing tail, per-level frontend
  carries, encoder SSM/conv/attention state) lives RESIDENT on the
  device as leading-dim-`n_slots` pytrees; the host never round-trips
  it. Slots that have no audio ready this tick are masked: the tick
  computes them on zero rows and a `jnp.where` keeps their old state.
- Sessions attach and detach mid-flight. The irregular endpoints — the
  very first chunk (center-padding framing, empty conv carries) and the
  final flush (offline-SAME lookahead realization, canonical padding) —
  run through the exact, already-tested single-stream
  `StreamingASRSession` path (models/streaming.py) at batch=1, and the
  state is transplanted into/out of the slot batch. Steady-state ticks
  therefore produce EXACTLY the tokens the single-stream session (and
  hence the offline forward, tests/test_streaming.py) produces: the
  batched tick is the same op sequence over stacked rows.

Emission protocol: `feed()` buffers audio per stream on the host;
`tick()` consumes one fixed chunk from every stream that has one ready
and returns newly emitted token ids per stream id; `finish()` flushes a
stream and frees its slot.
"""

from __future__ import annotations

import time as _time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.models.asr import ASRModel
from mamba_asr_tpu.models.streaming import StreamingASRSession
from mamba_asr_tpu.ops.fbank import log_mel_spectrogram
from mamba_asr_tpu.training.normalizer import NormalizerState, apply_normalizer
from mamba_asr_tpu.training.trainer import FrontendConfig


class _SlotBuffer:
    """Host-side per-stream PCM buffer (float32 mono samples)."""

    def __init__(self):
        self.parts: List[np.ndarray] = []
        self.size = 0

    def push(self, samples: np.ndarray) -> None:
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            self.parts.append(samples)
            self.size += samples.size

    def pop(self, n: int) -> np.ndarray:
        assert n <= self.size
        out, got = [], 0
        while got < n:
            p = self.parts[0]
            take = min(p.size, n - got)
            out.append(p[:take])
            if take == p.size:
                self.parts.pop(0)
            else:
                self.parts[0] = p[take:]
            got += take
        self.size -= n
        return np.concatenate(out) if len(out) != 1 else out[0]

    def pop_all(self) -> np.ndarray:
        if not self.parts:
            return np.zeros((0,), np.float32)
        out = np.concatenate(self.parts)
        self.parts, self.size = [], 0
        return out


class StreamingServer:
    """Fixed-capacity slot-batched streaming recognizer.

    Args:
      model/params: a streamable ASRModel (encoder with forward_chunk;
        `causal: true` configs give offline-exact transcripts, see
        models/streaming.py).
      frontend: fbank parameters (must match training).
      normalizer: frozen InputNormalization statistics (or None).
      n_slots: concurrent-stream capacity (the compiled batch size).
      chunk_frames: feature frames consumed per stream per tick; must be
        a multiple of the frontend downsample factor. 64 frames = 640 ms
        of audio at the LibriSpeech 10 ms hop.
    """

    def __init__(
        self,
        model: ASRModel,
        params,
        frontend: FrontendConfig,
        normalizer: Optional[NormalizerState] = None,
        n_slots: int = 8,
        chunk_frames: int = 64,
        mesh=None,
        final_decode: Optional[str] = None,
        beam_size: int = 8,
        decode_opts: Optional[dict] = None,
        lm_model=None,
        lm_params=None,
    ):
        assert final_decode in (None, "ctc_beam", "s2s")
        assert chunk_frames % model.cfg.downsample == 0, (
            "chunk_frames must be a multiple of the frontend downsample "
            f"factor {model.cfg.downsample}"
        )
        self.model = model
        self.frontend = frontend
        self.normalizer = normalizer
        self.n_slots = n_slots
        self.chunk_frames = chunk_frames
        # Multi-chip serving: shard the slot batch over the mesh's
        # "data" axis (pure data parallelism — the tick has no
        # cross-slot ops, so XLA partitions it with zero collectives;
        # capacity scales linearly in devices). Params replicate.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            assert n_slots % n_data == 0, (
                f"n_slots {n_slots} must divide over the data axis "
                f"({n_data} devices)"
            )
            self._slot_sharding = NamedSharding(mesh, P("data"))
            self._repl_sharding = NamedSharding(mesh, P())
        self.params = params
        # Params replica for the slot-batched tick (the batch=1
        # bootstrap/finish sessions stay on the default device).
        self._tick_params = (
            jax.device_put(params, self._repl_sharding)
            if mesh is not None else params
        )
        self.hop = frontend.hop
        self.chunk_samples = chunk_frames * self.hop
        win = int(round(frontend.sample_rate * frontend.win_length_ms / 1000))
        self.win = min(win, frontend.n_fft)
        assert self.chunk_samples >= self.win, (
            "chunk must cover at least one fbank window"
        )

        # Prototype session: owns the compiled batch=1 closures every
        # per-stream session reuses (attach/finish path).
        self._proto = StreamingASRSession(
            model, params, frontend, normalizer, chunk_frames, batch=1
        )

        # Derive the steady-state template (audio-tail length, per-level
        # frontend carry shapes) by dry-running chunks through the exact
        # session, and assert it is a fixed point: every stream reaches
        # this state after its first chunk and stays in it, so one
        # compiled tick shape serves all promoted slots forever.
        tmpl = StreamingASRSession(
            model, params, frontend, normalizer, chunk_frames, batch=1,
            shared=self._proto,
        )
        zeros = np.zeros((1, self.chunk_samples), np.float32)
        tmpl.feed(zeros)
        shapes = self._state_shapes(tmpl)
        for _ in range(2):
            tmpl.feed(zeros)
            assert self._state_shapes(tmpl) == shapes, (
                "streaming state did not reach a fixed point after one "
                f"chunk: {shapes} vs {self._state_shapes(tmpl)}"
            )
        self._tail_len = tmpl.audio_tail.shape[1]
        self._carry_shapes = [tuple(np.asarray(c).shape) for c in tmpl.fe_stream.carry]

        # Device-resident slot-batched state.
        def tile(x):
            x = jnp.asarray(x)
            return jnp.zeros((n_slots,) + x.shape[1:], x.dtype)

        enc0 = model.apply(params, n_slots, method=ASRModel.init_streaming_state)
        self._state = {
            "tail": jnp.zeros((n_slots, self._tail_len), jnp.float32),
            "carry": tuple(tile(c) for c in tmpl.fe_stream.carry),
            "enc": enc0,
        }
        if mesh is not None:
            self._state_shardings = jax.tree_util.tree_map(
                lambda _: self._slot_sharding, self._state
            )
            self._state = jax.device_put(self._state, self._state_shardings)

        self._tick_fn = self._build_tick()

        @jax.jit
        def insert(state, slot_state, idx):
            return jax.tree_util.tree_map(
                lambda a, b: jax.lax.dynamic_update_slice_in_dim(
                    a, b.astype(a.dtype), idx, axis=0
                ),
                state, slot_state,
            )

        @jax.jit
        def extract(state, idx):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, idx, 1, axis=0),
                state,
            )

        self._insert = insert
        self._extract = extract

        # Host-side slot bookkeeping.
        self._sessions: List[Optional[StreamingASRSession]] = [None] * n_slots
        self._bufs: List[_SlotBuffer] = [_SlotBuffer() for _ in range(n_slots)]
        self._promoted = [False] * n_slots
        self._sid_of_slot: List[Optional[int]] = [None] * n_slots
        self._slot_of_sid: Dict[int, int] = {}
        self._next_sid = 0
        self._pending: Dict[int, List[int]] = {}

        # Final-pass beam decode: accumulate every stream's encoder
        # states (host-side, in compute dtype) and beam-decode the whole
        # utterance at finish_final() — streamed greedy partials for
        # latency, one accurate final transcript for quality. "ctc_beam"
        # runs the on-device prefix beam (decoding/ctc_beam.py); "s2s"
        # the joint attention/CTC(+LM) searcher (decoding/s2s_beam.py).
        self.final_decode = final_decode
        self.beam_size = beam_size
        self._decode_opts = dict(decode_opts or {})
        self._enc_acc: List[Optional[List[np.ndarray]]] = [None] * n_slots

        # Endpointing: trailing-silence frame count per slot (host-only
        # bookkeeping over the argmax frames the tick already returns —
        # zero extra device work). See trailing_silence_s().
        self._silence_frames: List[int] = [0] * n_slots

        # Aggregate serving counters (host-only; see stats()).
        self._n_ticks = 0
        self._n_batched_rows = 0
        self._n_attached = 0
        self._n_finished = 0
        self._n_aborted = 0
        self._audio_samples_in = 0
        self._tokens_out = 0
        self._tick_seconds = 0.0
        if final_decode is not None:
            from mamba_asr_tpu.decoding.ctc_greedy import (
                ctc_greedy_decode_with_times,
            )

            @jax.jit
            def align(params, enc, lens):
                ctc = model.apply(
                    params, enc.astype(jnp.float32),
                    method=lambda m_, e_: m_.ctc_head(e_),
                )
                return ctc_greedy_decode_with_times(
                    jax.nn.log_softmax(ctc, -1), lens
                )

            self._align_fn = align
        self._lm_model, self._lm_params = lm_model, lm_params
        if final_decode == "ctc_beam":
            from mamba_asr_tpu.decoding.ctc_beam import (
                ctc_beam_search,
                ctc_beam_search_nbest,
            )

            prune = {
                k: self._decode_opts[k]
                for k in ("beam_prune_logp", "token_prune_min_logp")
                if k in self._decode_opts
            }

            if lm_model is not None:
                # CTC n-best + LM rescoring (decoding/rescore.py) as the
                # final pass. lm_params MUST travel as an argument —
                # closing over them would inline the LM as dense HLO
                # constants (the remote-compile 413 trap, DESIGN §9).
                from mamba_asr_tpu.decoding.rescore import rescore_nbest

                lm_weight = self._decode_opts.get("lm_weight", 0.6)
                temperature_lm = self._decode_opts.get(
                    "temperature_lm", 1.0
                )
                nbest = self._decode_opts.get("nbest", min(beam_size, 10))

                @jax.jit
                def final_ctc_lm(params, lm_ps, enc, lens):
                    ctc = model.apply(
                        params, enc.astype(jnp.float32),
                        method=lambda m_, e_: m_.ctc_head(e_),
                    )
                    lp = jax.nn.log_softmax(ctc, -1)
                    toks, lens_n, scores = ctc_beam_search_nbest(
                        lp, lens, nbest=nbest, beam_size=beam_size,
                        **prune,
                    )
                    return rescore_nbest(
                        toks, lens_n, scores, lm_model, lm_ps,
                        lm_weight=lm_weight,
                        temperature_lm=temperature_lm,
                    )

                self._final_ctc = lambda params, enc, lens: final_ctc_lm(
                    params, self._lm_params, enc, lens
                )
            else:
                @jax.jit
                def final_ctc(params, enc, lens):
                    ctc = model.apply(
                        params, enc.astype(jnp.float32),
                        method=lambda m_, e_: m_.ctc_head(e_),
                    )
                    lp = jax.nn.log_softmax(ctc, -1)
                    return ctc_beam_search(
                        lp, lens, beam_size=beam_size, **prune
                    )

                self._final_ctc = final_ctc
        elif final_decode == "s2s":
            from mamba_asr_tpu.decoding.s2s_beam import S2SBeamSearcher

            self._s2s_searcher = S2SBeamSearcher(
                model, beam_size=beam_size, **self._decode_opts
            )

            @jax.jit
            def ctc_lp(params, enc):
                ctc = model.apply(
                    params, enc.astype(jnp.float32),
                    method=lambda m_, e_: m_.ctc_head(e_),
                )
                return jax.nn.log_softmax(ctc, -1)

            self._ctc_lp = ctc_lp

    # ------------------------------------------------------------------
    @staticmethod
    def _state_shapes(sess: StreamingASRSession):
        return (
            sess.audio_tail.shape,
            tuple(tuple(np.asarray(c).shape) for c in sess.fe_stream.carry),
        )

    def _build_tick(self):
        model, frontend, normalizer = self.model, self.frontend, self.normalizer
        hop, chunk_frames = self.hop, self.chunk_frames
        strides = model.cfg.frontend_strides
        kernels = tuple(3 for _ in strides)
        carry_lens = [s[1] for s in self._carry_shapes]

        # Static per-level emission schedule (the VALID conv consumes
        # e*s inputs and leaves the carry length invariant — asserted).
        emits, m = [], chunk_frames
        for c, k, s in zip(carry_lens, kernels, strides):
            e = (c + m - k) // s + 1
            assert c + m - e * s == c, (
                "frontend carry not steady at this chunk size"
            )
            emits.append(e)
            m = e

        @jax.jit
        def tick(params, state, audio, mask):
            # audio: (S, chunk_samples) f32; mask: (S,) bool.
            window = jnp.concatenate([state["tail"], audio], axis=1)
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
            assert feats.shape[1] == chunk_frames, feats.shape
            new_tail = window[:, chunk_frames * hop:]

            x = feats[..., None]
            new_carries = []
            for i, (e, s) in enumerate(zip(emits, strides)):
                buf = jnp.concatenate([state["carry"][i], x], axis=1)
                x = model.apply(
                    params, i, buf, (0, 0),
                    method=lambda m_, j, z, p: m_.frontend.apply_level(j, z, p),
                )
                assert x.shape[1] == e, (x.shape, e)
                new_carries.append(buf[:, e * s:])

            b, t, f, c = x.shape
            enc, new_enc = model.apply(
                params, x.reshape(b, t, f * c), state["enc"],
                method=lambda m_, z, st: m_.encoder.forward_chunk(
                    m_.src_proj(z), st
                ),
            )
            ctc = model.apply(
                params, enc.astype(jnp.float32),
                method=lambda m_, e_: m_.ctc_head(e_),
            )
            best = jnp.argmax(jax.nn.log_softmax(ctc, -1), axis=-1)
            best = best.astype(jnp.int32)

            new_state = {
                "tail": new_tail,
                "carry": tuple(new_carries),
                "enc": new_enc,
            }

            def keep(new, old):
                m_ = mask.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m_, new, old)

            return best, enc, jax.tree_util.tree_map(keep, new_state, state)

        return tick

    # -- session lifecycle ---------------------------------------------
    @property
    def free_slots(self) -> int:
        return sum(s is None for s in self._sessions)

    def attach(self) -> int:
        """Open a stream; returns its stream id. Raises when full."""
        for slot, s in enumerate(self._sessions):
            if s is None:
                sid = self._next_sid
                self._next_sid += 1
                acc: Optional[List[np.ndarray]] = (
                    [] if self.final_decode is not None else None
                )
                self._enc_acc[slot] = acc
                self._sessions[slot] = StreamingASRSession(
                    self.model, self.params, self.frontend, self.normalizer,
                    self.chunk_frames, batch=1, shared=self._proto,
                    enc_sink=acc,
                )
                self._bufs[slot] = _SlotBuffer()
                self._promoted[slot] = False
                self._sid_of_slot[slot] = sid
                self._slot_of_sid[sid] = slot
                self._silence_frames[slot] = 0
                self._n_attached += 1
                return sid
        raise RuntimeError(f"server full ({self.n_slots} slots)")

    def feed(self, sid: int, samples: np.ndarray) -> None:
        """Buffer PCM float32 samples for stream `sid` (host only)."""
        self._audio_samples_in += int(np.asarray(samples).size)
        self._bufs[self._slot_of_sid[sid]].push(samples)

    def ready_slots(self) -> List[int]:
        return [
            slot for slot, sess in enumerate(self._sessions)
            if sess is not None
            and self._bufs[slot].size >= self.chunk_samples
        ]

    def tick(self) -> Dict[int, List[int]]:
        """Advance every stream that has a full chunk buffered; returns
        newly emitted token ids keyed by stream id (including any tokens
        left pending by a concurrent finish())."""
        for sid, toks in self._tick_once().items():
            self._pending.setdefault(sid, []).extend(toks)
        out = self._pending
        self._pending = {}
        self._tokens_out += sum(len(t) for t in out.values())
        return out

    def _tick_once(self) -> Dict[int, List[int]]:
        emitted: Dict[int, List[int]] = {}
        ready = self.ready_slots()

        # First chunk of a fresh stream: exact batch=1 session path
        # (center-padding framing + empty carries), then promote the
        # session state into the device slot batch.
        enc_frames = self.chunk_frames // self.model.cfg.downsample
        steady = []
        for slot in ready:
            sess = self._sessions[slot]
            if not self._promoted[slot]:
                chunk = self._bufs[slot].pop(self.chunk_samples)
                toks = sess.feed(chunk[None])[0]
                # Bootstrap path exposes no per-frame argmax; approximate
                # silence by token emission for this first chunk.
                if toks:
                    self._silence_frames[slot] = 0
                else:
                    self._silence_frames[slot] += enc_frames
                if toks:
                    emitted[self._sid_of_slot[slot]] = toks
                assert self._state_shapes(sess) == (
                    (1, self._tail_len),
                    tuple(self._carry_shapes),
                ), "bootstrap did not land on the steady template"
                self._promote(slot)
            else:
                steady.append(slot)

        if steady:
            t0 = _time.perf_counter()
            audio = np.zeros((self.n_slots, self.chunk_samples), np.float32)
            mask = np.zeros((self.n_slots,), bool)
            for slot in steady:
                audio[slot] = self._bufs[slot].pop(self.chunk_samples)
                mask[slot] = True
            audio_d, mask_d = jnp.asarray(audio), jnp.asarray(mask)
            if self.mesh is not None:
                audio_d = jax.device_put(audio_d, self._slot_sharding)
                mask_d = jax.device_put(mask_d, self._slot_sharding)
            best, enc, self._state = self._tick_fn(
                self._tick_params, self._state, audio_d, mask_d
            )
            best = np.asarray(best)
            enc_np = (
                np.asarray(enc) if self.final_decode is not None else None
            )
            for slot in steady:
                sess = self._sessions[slot]
                sess._samples_fed += self.chunk_samples
                sess._frames_done += self.chunk_frames
                if enc_np is not None:
                    self._enc_acc[slot].append(enc_np[slot:slot + 1])
                # Trailing-blank run for endpointing: the tick's argmax
                # row is already on the host.
                row = best[slot]
                nz = np.nonzero(row != 0)[0]
                if nz.size:
                    self._silence_frames[slot] = (
                        len(row) - 1 - int(nz[-1])
                    )
                else:
                    self._silence_frames[slot] += len(row)
                toks = sess._collapse(best[slot:slot + 1])[0]
                if toks:
                    emitted.setdefault(
                        self._sid_of_slot[slot], []
                    ).extend(toks)
            self._n_ticks += 1
            self._n_batched_rows += len(steady)
            self._tick_seconds += _time.perf_counter() - t0
        return emitted

    def _promote(self, slot: int) -> None:
        sess = self._sessions[slot]
        slot_state = {
            "tail": jnp.asarray(sess.audio_tail, jnp.float32),
            "carry": tuple(jnp.asarray(c) for c in sess.fe_stream.carry),
            "enc": sess.enc_state,
        }
        if self.mesh is not None:
            # Replicate the batch=1 row so the insert's operands share a
            # device set; re-pin the result to the canonical slot layout.
            slot_state = jax.device_put(slot_state, self._repl_sharding)
        self._state = self._insert(
            self._state, slot_state, jnp.int32(slot)
        )
        if self.mesh is not None:
            self._state = jax.device_put(self._state, self._state_shardings)
        self._promoted[slot] = True

    def _demote(self, slot: int) -> None:
        st = self._extract(self._state, jnp.int32(slot))
        if self.mesh is not None:
            # Hand the row back to the default-device batch=1 session.
            st = jax.device_put(st, jax.devices()[0])
        sess = self._sessions[slot]
        sess.audio_tail = np.asarray(st["tail"])
        sess.fe_stream.carry = list(st["carry"])
        sess.enc_state = st["enc"]
        self._promoted[slot] = False

    def finish(self, sid: int) -> List[int]:
        """Flush stream `sid` exactly (remaining buffered audio, offline
        SAME lookahead, canonical padding), free its slot, and return its
        final newly emitted token ids. Tokens other streams emit during
        the drain are delivered by the next tick()."""
        slot = self._slot_of_sid[sid]
        # Drain this stream's full chunks through the normal tick path
        # (other ready streams advance too — their tokens go pending).
        while self._bufs[slot].size >= self.chunk_samples:
            for s2, toks in self._tick_once().items():
                self._pending.setdefault(s2, []).extend(toks)
        out = list(self._pending.pop(sid, []))

        sess = self._sessions[slot]
        if self._promoted[slot]:
            self._demote(slot)
        rest = self._bufs[slot].pop_all()
        if rest.size:
            out.extend(sess.feed(rest[None])[0])
        out.extend(sess.finish()[0])

        self._sessions[slot] = None
        self._sid_of_slot[slot] = None
        del self._slot_of_sid[sid]
        self._n_finished += 1
        return out

    def finish_final(self, sid: int, want_times: bool = False):
        """Flush stream `sid` exactly like finish(), then beam-decode the
        accumulated whole-utterance encoder states with the configured
        final pass. Returns (greedy_tail_ids, final_ids): the streamed
        greedy partials + tail give low-latency output; final_ids is the
        single accurate whole-utterance transcript.

        With want_times=True, additionally returns token spans
        [(token_id, onset_frame, offset_frame, confidence)] from a
        greedy alignment
        over the SAME accumulated encoder states (one extra small
        dispatch; decoding/ctc_greedy.ctc_greedy_decode_with_times).
        The aligned tokens are the greedy path — they may differ from
        the beam transcript near ties; convert frames to seconds with
        `frame_seconds`.

        T is bucketed up to a multiple of 128 encoder frames (true
        length passed separately), so distinct utterance lengths share a
        small set of compiled decodes."""
        assert self.final_decode is not None, (
            "engine built without final_decode"
        )
        slot = self._slot_of_sid[sid]
        acc = self._enc_acc[slot]
        tail = self.finish(sid)  # flush; the session's enc_sink catches
        self._enc_acc[slot] = None  # the bootstrap/flush chunks
        if not acc:
            return (tail, [], []) if want_times else (tail, [])
        enc = np.concatenate(acc, axis=1)  # (1, T, d), compute dtype
        t = enc.shape[1]
        tb = -(-t // 128) * 128
        enc_p = jnp.asarray(
            np.concatenate(
                [enc, np.zeros((1, tb - t, enc.shape[2]), enc.dtype)],
                axis=1,
            )
        )
        lens = jnp.asarray([t], jnp.int32)
        if self.final_decode == "ctc_beam":
            toks, out_lens = self._final_ctc(self.params, enc_p, lens)
        else:
            toks, out_lens, _ = self._s2s_searcher(
                self.params, enc_p, lens,
                ctc_log_probs=self._ctc_lp(self.params, enc_p),
            )
        final = [int(x) for x in
                 np.asarray(toks[0])[: int(np.asarray(out_lens[0]))]]
        if not want_times:
            return tail, final
        ids, n, ons, offs, confs = jax.device_get(
            self._align_fn(self.params, enc_p, lens)
        )
        spans = [
            (int(ids[0, i]), int(ons[0, i]), int(offs[0, i]),
             float(confs[0, i]))
            for i in range(int(n[0]))
        ]
        return tail, final, spans

    @property
    def frame_seconds(self) -> float:
        """Duration of one encoder output frame in seconds."""
        from mamba_asr_tpu.decoding.timestamps import encoder_frame_seconds

        return encoder_frame_seconds(self.frontend, self.model.cfg)

    def trailing_silence_s(self, sid: int) -> float:
        """Seconds of trailing CTC silence on stream `sid` — the length
        of the current trailing blank-argmax run (host bookkeeping over
        the tick's argmax rows; the bootstrap chunk approximates by
        token emission). The endpointing signal: a server finalizes a
        stream once this exceeds its silence threshold, the standard
        CTC end-of-utterance detector. Chunk-granular: it only advances
        as chunks are processed."""
        return (
            self._silence_frames[self._slot_of_sid[sid]]
            * self.frame_seconds
        )

    def abort(self, sid: int) -> None:
        """Drop stream `sid` immediately and free its slot — host-only,
        no device work (an abandoned client must not cost a flush
        dispatch). The slot's device-state row goes stale; the next
        occupant's _promote() overwrites it before any tick reads it."""
        slot = self._slot_of_sid.pop(sid)
        self._sessions[slot] = None
        self._sid_of_slot[slot] = None
        self._bufs[slot] = _SlotBuffer()
        self._promoted[slot] = False
        self._enc_acc[slot] = None
        self._pending.pop(sid, None)
        self._n_aborted += 1

    def stats(self) -> Dict[str, float]:
        """Aggregate serving counters (host bookkeeping only — reading
        them costs no device work). tick_ms_avg covers the batched
        steady-state dispatches (sync included); audio_seconds_in /
        wall-clock gives the served real-time load."""
        sr = self.frontend.sample_rate
        return {
            "slots": self.n_slots,
            "active_streams": self.n_slots - self.free_slots,
            "attached_total": self._n_attached,
            "finished_total": self._n_finished,
            "aborted_total": self._n_aborted,
            "ticks_total": self._n_ticks,
            "batched_rows_total": self._n_batched_rows,
            "audio_seconds_in": self._audio_samples_in / sr,
            "tokens_out": self._tokens_out,
            "tick_ms_avg": (
                self._tick_seconds / self._n_ticks * 1000
                if self._n_ticks else 0.0
            ),
        }
