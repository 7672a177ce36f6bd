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
        window, n_frames = self.inner._frame_window(audio_chunk)
        if n_frames <= 0:
            return
        enc, self.inner.enc_state = self._enc_chunk(window)
        self.dec_cache = self._extend(self.params, enc, self.dec_cache)

    def _enc_chunk(self, window: np.ndarray):
        if not hasattr(self, "_enc_fn"):
            model, frontend = self.model, self.inner.frontend
            normalizer = self.inner.normalizer

            @jax.jit
            def enc_fn(params, wav_window, enc_state):
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
                return model.apply(
                    params, feats, enc_state, method=ASRModel.encode_chunk
                )

            self._enc_fn = enc_fn
        return self._enc_fn(self.params, jnp.asarray(window),
                            self.inner.enc_state)

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

        @jax.jit
        def chunk_fn(params, wav_window, enc_state):
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
            enc, new_state = model.apply(
                params, feats, enc_state, method=ASRModel.encode_chunk
            )
            ctc = model.apply(
                params, enc.astype(jnp.float32),
                method=lambda m, e: m.ctc_head(e),
            )
            best = jnp.argmax(jax.nn.log_softmax(ctc, -1), axis=-1)
            return best, new_state

        self._chunk_fn = chunk_fn

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
        return buf[:, : self.win + (n_frames - 1) * self.hop], n_frames

    def feed(self, audio_chunk: np.ndarray) -> List[List[int]]:
        """Feed (B, chunk_samples) audio; returns newly emitted token ids
        per stream (greedy CTC with cross-chunk collapse)."""
        if audio_chunk.ndim == 1:
            audio_chunk = audio_chunk[None]
        window, n_frames = self._frame_window(audio_chunk)
        if n_frames <= 0:
            return [[] for _ in range(self.batch)]
        best, self.enc_state = self._chunk_fn(
            self.params, jnp.asarray(window), self.enc_state
        )
        best = np.array(best)
        out: List[List[int]] = []
        for b in range(self.batch):
            toks = []
            prev = self.last_frame_tok[b]
            for t in best[b]:
                if t != 0 and t != prev:
                    toks.append(int(t))
                prev = t
            self.last_frame_tok[b] = prev
            out.append(toks)
        return out
