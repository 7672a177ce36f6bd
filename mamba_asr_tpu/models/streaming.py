"""Stateful streaming ASR session: long-form audio in, tokens out.

Subsumes the reference's Conformer streaming contexts
(/root/reference/modules/Conformer.py:203-756, TransformerASR.py:931-1049)
and adds the stateful ConMamba streaming path the reference documents but
never implemented (SURVEY.md §3.3) — BASELINE.json config 5:
"streaming inference with stateful encoder/decoder Mamba caches on
long-form audio".

State carried across audio chunks:
- raw-audio tail for fbank framing continuity,
- frozen global normalizer statistics,
- per-layer encoder state (SSM state + conv tails for ConMamba; MHA left
  context + conv tails for Conformer),
- greedy-CTC collapse state (last emitted frame id).

The per-chunk compute is one jitted function with a fixed chunk shape —
feeding equal-sized chunks never recompiles.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamba_asr_tpu.models.asr import ASRModel
from mamba_asr_tpu.ops.fbank import log_mel_spectrogram
from mamba_asr_tpu.training.normalizer import NormalizerState, apply_normalizer
from mamba_asr_tpu.training.trainer import FrontendConfig

Array = jax.Array


class StreamingFrontend:
    """EXACT chunked conv-frontend: the offline ConvolutionFrontEnd pads
    SAME — at even time length that is (0, 1), i.e. one zero frame of
    *future* lookahead per level. Streaming therefore buffers each
    level's un-consumed inputs (steady-state carry of k-1 = 2 frames),
    runs the level VALID over [carry, chunk], and emits only outputs
    whose full window is real; `finish()` flushes the one trailing zero
    per level. Output == offline forward exactly when the total frame
    count is even at every level (chunk counts that are multiples of 4
    guarantee it). Replaces the previous per-chunk SAME application,
    whose zero padding at every chunk boundary corrupted 2 of every
    chunk_frames/4 encoder inputs."""

    def __init__(
        self,
        model: ASRModel,
        params,
        batch: int,
        shared: Optional["StreamingFrontend"] = None,
    ):
        self.model = model
        self.params = params
        self.n_levels = len(model.cfg.frontend_channels)
        self.strides = model.cfg.frontend_strides
        self.kernels = tuple(3 for _ in range(self.n_levels))
        self.carry = [None] * self.n_levels  # (B, c, F_i, C_i) np arrays

        if shared is not None:
            # Reuse another frontend's jitted level closures (jax.jit
            # caches by function identity: per-instance closures would
            # recompile per session — the serving engine creates one
            # session per attach and shares a prototype's executables).
            assert shared.model is model
            self._level = shared._level
            return

        def level_fn(i):
            @jax.jit
            def fn(params, buf):
                return model.apply(
                    params, i, buf, (0, 0),
                    method=lambda m, j, x, p: m.frontend.apply_level(j, x, p),
                )
            return fn

        self._level = [level_fn(i) for i in range(self.n_levels)]

    def _feed_level(self, i: int, x):
        """x (B, T, F, C) new inputs for level i; returns emitted outputs
        (possibly length 0) and updates the carry."""
        buf = x if self.carry[i] is None else jnp.concatenate(
            [self.carry[i], x], axis=1
        )
        n = buf.shape[1]
        k, s = self.kernels[i], self.strides[i]
        e = max(0, (n - k) // s + 1)
        if e == 0:
            self.carry[i] = buf
            return None
        out = self._level[i](self.params, buf)
        self.carry[i] = buf[:, e * s:]
        return out

    def feed(self, feats):
        """feats (B, T, n_mels) -> emitted (B, T_out, F', C) or None."""
        x = feats[..., None]
        for i in range(self.n_levels):
            x = self._feed_level(i, x)
            if x is None:
                return None
        return x

    def finish(self):
        """Flush: one zero frame per level realizes the offline SAME
        right padding; returns the final emitted outputs (or None).
        Each level receives the previous level's flush emission plus its
        own trailing zero frame."""
        x = None  # flush emission flowing down the levels
        for i in range(self.n_levels):
            template = self.carry[i] if self.carry[i] is not None else x
            if template is None:
                continue  # level never received any frames
            zero = jnp.zeros_like(template[:, :1])
            new_in = zero if x is None else jnp.concatenate([x, zero], axis=1)
            x = self._feed_level(i, new_in)
        return x


class StreamingS2SSession:
    """Long-form streaming for the pure-SSM ConMambaMamba model.

    Combines the two stateful primitives (both exact-match tested):
    - causal ConMamba encoder chunk streaming (SSM state + conv tails),
    - decoder caches whose cross-mamba state is *extended* by each new
      chunk of encoder memory (ASRModel.extend_decoder_cache) — audio
      only ever advances state; nothing is recomputed (BASELINE
      config 5: "streaming inference with stateful encoder/decoder
      Mamba caches on long-form audio").

    Protocol: `feed(audio_chunk)` advances encoder + decoder-memory
    state; `decode_greedy(max_new)` emits tokens from the current state
    (committing the decoder's self-mamba state, transducer-style).
    """

    def __init__(
        self,
        model: ASRModel,
        params,
        frontend: FrontendConfig,
        normalizer: Optional[NormalizerState] = None,
        chunk_frames: int = 64,
        batch: int = 1,
        bos_id: int = 1,
        eos_id: int = 2,
    ):
        assert model.cfg.decoder_module == "mamba"
        self.inner = StreamingASRSession(
            model, params, frontend, normalizer, chunk_frames, batch
        )
        self.model = model
        self.params = params
        self.batch = batch
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.dec_cache = model.apply(
            params, batch, method=ASRModel.init_decoder_cache
        )
        self.last_token = np.full((batch,), bos_id, np.int32)
        self.pos = 0

        @jax.jit
        def extend_fn(params, enc_chunk, cache):
            return model.apply(
                params, enc_chunk, cache,
                method=ASRModel.extend_decoder_cache,
            )

        @jax.jit
        def step_fn(params, tok, pos, cache):
            logits, cache = model.apply(
                params, tok, pos, cache, method=ASRModel.decode_step
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        self._extend = extend_fn
        self._step = step_fn

    def feed(self, audio_chunk: np.ndarray) -> None:
        """Advance encoder + decoder-memory state with new audio."""
        if audio_chunk.ndim == 1:
            audio_chunk = audio_chunk[None]
        self.inner._samples_fed += audio_chunk.shape[1]
        window, n_frames = self.inner._frame_window(audio_chunk)
        if n_frames <= 0:
            return
        feats = self.inner._feats_fn(self.params, jnp.asarray(window))
        self._extend_with(self.inner.fe_stream.feed(feats))

    def _extend_with(self, fe_out) -> None:
        if fe_out is None or fe_out.shape[1] == 0:
            return
        enc, _, _, self.inner.enc_state = self.inner._enc_fn(
            self.params, fe_out, self.inner.enc_state
        )
        self.dec_cache = self._extend(self.params, enc, self.dec_cache)

    def finish(self) -> None:
        """Flush remaining frames, canonical-pad to a downsample multiple
        (see StreamingASRSession._canonical_pad_frames), and flush the
        frontend lookahead into the encoder/decoder state."""
        self._extend_with(self.inner._flush_frames())
        pad = self.inner._canonical_pad_frames()
        if pad is not None:
            self._extend_with(self.inner.fe_stream.feed(pad))
        self._extend_with(self.inner.fe_stream.finish())

    def decode_greedy(self, max_new: int = 32) -> List[List[int]]:
        """Greedily emit up to max_new tokens from the current state."""
        out: List[List[int]] = [[] for _ in range(self.batch)]
        tok = jnp.asarray(self.last_token)
        done = np.zeros(self.batch, bool)
        for _ in range(max_new):
            tok, self.dec_cache = self._step(
                self.params, tok, jnp.asarray(self.pos), self.dec_cache
            )
            self.pos += 1
            tok_np = np.array(tok)
            for b in range(self.batch):
                if not done[b]:
                    if tok_np[b] == self.eos_id:
                        done[b] = True
                    else:
                        out[b].append(int(tok_np[b]))
            if done.all():
                break
        self.last_token = np.array(tok)
        return out


class StreamingASRSession:
    """Greedy streaming CTC recognition over chunked audio."""

    def __init__(
        self,
        model: ASRModel,
        params,
        frontend: FrontendConfig,
        normalizer: Optional[NormalizerState] = None,
        chunk_frames: int = 64,
        batch: int = 1,
        collect_log_probs: bool = False,
        shared: Optional["StreamingASRSession"] = None,
        enc_sink: Optional[List] = None,
    ):
        self.model = model
        self.params = params
        self.frontend = frontend
        self.normalizer = normalizer
        self.batch = batch
        self.chunk_frames = chunk_frames
        hop = frontend.hop
        win = int(round(frontend.sample_rate * frontend.win_length_ms / 1000))
        self.win = min(win, frontend.n_fft)
        self.hop = hop
        self.chunk_samples = chunk_frames * hop

        self.enc_state = model.apply(
            params, batch, method=ASRModel.init_streaming_state
        )
        # fbank framing tail: first chunk gets the center padding.
        self.audio_tail = np.zeros(
            (batch, self.win // 2), np.float32
        )
        self.last_frame_tok = np.zeros((batch,), np.int64)
        # Exact chunked conv frontend (per-level input buffering).
        self.fe_stream = StreamingFrontend(
            model, params, batch,
            shared=shared.fe_stream if shared is not None else None,
        )
        # Optional per-frame CTC log-prob capture (streaming-quality
        # measurement: divergence vs the offline forward).
        self.collect_log_probs = collect_log_probs
        self.log_probs: List[np.ndarray] = []
        # Optional encoder-output sink: every emitted enc chunk is
        # appended as (B, T_chunk, d) — the serving engine's final-pass
        # beam decode accumulates the whole utterance's encoder states
        # through this (serving/engine.py finish_final).
        self.enc_sink = enc_sink
        # Offline-equivalence accounting: center-framing yields
        # S//hop + 1 frames for S samples; finish() pads zeros to emit
        # exactly the remainder (the offline right center-padding).
        self._samples_fed = 0
        self._frames_done = 0

        if shared is not None:
            # Reuse a prototype session's compiled closures (the serving
            # engine attaches one session per stream; fresh jitted
            # closures would recompile identical executables each time).
            assert shared.model is model and shared.normalizer is normalizer
            assert shared.frontend == frontend
            self._feats_fn = shared._feats_fn
            self._enc_fn = shared._enc_fn
            return

        @jax.jit
        def feats_fn(params, wav_window):
            feats = log_mel_spectrogram(
                wav_window,
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

        @jax.jit
        def enc_fn(params, fe_out, enc_state):
            b, t, f, c = fe_out.shape
            enc, new_state = model.apply(
                params, fe_out.reshape(b, t, f * c), enc_state,
                method=lambda m, x, s: m.encoder.forward_chunk(
                    m.src_proj(x), s
                ),
            )
            ctc = model.apply(
                params, enc.astype(jnp.float32),
                method=lambda m, e: m.ctc_head(e),
            )
            lp = jax.nn.log_softmax(ctc, -1)
            best = jnp.argmax(lp, axis=-1)
            return enc, best, lp, new_state

        self._feats_fn = feats_fn
        self._enc_fn = enc_fn

    def _frame_window(self, audio_chunk: np.ndarray) -> Tuple[np.ndarray, int]:
        """[tail, chunk] window covering whole frames; the un-framed
        remainder becomes the next tail."""
        buf = np.concatenate([self.audio_tail.astype(np.float32),
                              audio_chunk.astype(np.float32)], axis=1)
        if buf.shape[1] < self.win:
            self.audio_tail = buf
            return buf, 0
        n_frames = 1 + (buf.shape[1] - self.win) // self.hop
        consumed = n_frames * self.hop
        self.audio_tail = buf[:, consumed:]
        self._frames_done += n_frames
        return buf[:, : self.win + (n_frames - 1) * self.hop], n_frames

    def _advance(self, fe_out) -> Optional[np.ndarray]:
        """Run emitted frontend output through the encoder + CTC argmax;
        returns per-frame best tokens (or None when nothing emitted)."""
        if fe_out is None or fe_out.shape[1] == 0:
            return None
        enc, best, lp, self.enc_state = self._enc_fn(
            self.params, fe_out, self.enc_state
        )
        if self.collect_log_probs:
            self.log_probs.append(np.array(lp))
        if self.enc_sink is not None:
            self.enc_sink.append(np.asarray(enc))
        return np.array(best)

    def _collapse(self, best: Optional[np.ndarray]) -> List[List[int]]:
        out: List[List[int]] = [[] for _ in range(self.batch)]
        if best is None:
            return out
        for b in range(self.batch):
            prev = self.last_frame_tok[b]
            for t in best[b]:
                if t != 0 and t != prev:
                    out[b].append(int(t))
                prev = t
            self.last_frame_tok[b] = prev
        return out

    def feed(self, audio_chunk: np.ndarray) -> List[List[int]]:
        """Feed (B, chunk_samples) audio; returns newly emitted token ids
        per stream (greedy CTC with cross-chunk collapse)."""
        if audio_chunk.ndim == 1:
            audio_chunk = audio_chunk[None]
        self._samples_fed += audio_chunk.shape[1]
        window, n_frames = self._frame_window(audio_chunk)
        if n_frames <= 0:
            return [[] for _ in range(self.batch)]
        feats = self._feats_fn(self.params, jnp.asarray(window))
        best = self._advance(self.fe_stream.feed(feats))
        return self._collapse(best)

    def _flush_frames(self):
        """Emit the remaining center-framing frames (offline right
        padding) through fbank + frontend; returns fe output or None."""
        target = self._samples_fed // self.hop + 1
        rem = target - self._frames_done
        if rem <= 0:
            return None
        need = self.win + (rem - 1) * self.hop
        z = max(0, need - self.audio_tail.shape[1])
        window, n_frames = self._frame_window(
            np.zeros((self.batch, z), np.float32)
        )
        if n_frames <= 0:
            return None
        feats = self._feats_fn(self.params, jnp.asarray(window))
        return self.fe_stream.feed(feats)

    def _canonical_pad_frames(self):
        """Zero feature-frames (post-normalization domain) that round the
        total frame count up to a multiple of the frontend downsample
        factor. SAME padding's split depends on each level's count parity
        (odd counts get a LEADING zero — unknowable mid-stream), so the
        session canonicalizes: with the count a multiple of the total
        stride product, every level is even, where the per-level trailing
        flush in StreamingFrontend.finish reproduces offline SAME
        exactly. The offline equal is the same canonical padding: feats
        -> normalize -> zero-pad to the multiple -> model."""
        mult = self.model.cfg.downsample
        extra = (-self._frames_done) % mult
        if extra == 0:
            return None
        self._frames_done += extra
        return jnp.zeros(
            (self.batch, extra, self.frontend.n_mels), jnp.float32
        )

    def finish(self) -> List[List[int]]:
        """End of stream: emit the remaining center-framing frames,
        canonical-pad to a downsample multiple, flush the frontend's conv
        lookahead, and return the final tokens. Streamed output ==
        offline greedy decode on the canonically padded feats for ALL
        frame counts (see _canonical_pad_frames)."""
        out = self._collapse(self._advance(self._flush_frames()))
        pad = self._canonical_pad_frames()
        if pad is not None:
            more = self._collapse(self._advance(self.fe_stream.feed(pad)))
            out = [a + b for a, b in zip(out, more)]
        tail = self._collapse(self._advance(self.fe_stream.finish()))
        return [a + b for a, b in zip(out, tail)]
