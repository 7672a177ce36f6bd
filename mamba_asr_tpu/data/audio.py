"""Audio IO: native WAV codec, FLAC duration probing, backend registry.

Replaces the reference's dependence on torchaudio/soundfile
(`sb.dataio.dataio.read_audio` at /root/reference/train_CTC.py:899,933 and
the FLAC-header duration probe in
/root/reference/librispeech_prepare.py:503-565).

WAV read/write is implemented natively (PCM16/24/32 and float32) so the
framework has no hard audio dependency; FLAC decode dispatches to
soundfile/torchaudio when present (duration probing parses the FLAC
STREAMINFO header directly, no decoder needed).
"""

from __future__ import annotations

import os
import wave
from typing import Tuple

import numpy as np


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono waveform in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            a[:, 0].astype(np.int32)
            | (a[:, 1].astype(np.int32) << 8)
            | (a[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        data = ints.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def write_wav(path: str, wav: np.ndarray, sample_rate: int) -> None:
    """Write mono float32 [-1, 1] to 16-bit PCM WAV."""
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


def _utf8_code(n: int) -> bytes:
    """FLAC frame-number coding (standard UTF-8 of the integer)."""
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    if n < 0x10000:
        return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F),
                      0x80 | (n & 0x3F)])
    raise ValueError(f"frame number too large: {n}")


def write_flac(path: str, wav: np.ndarray, sample_rate: int,
               block: int = 4096) -> None:
    """Write mono float32 [-1, 1] as 16-bit FLAC (verbatim subframes).

    Verbatim frames carry raw big-endian PCM and every field lands on a
    byte boundary, so the whole file assembles with numpy — no per-bit
    work. Used to synthesize FLAC corpora for tests and for the loader
    benchmark (LibriSpeech itself ships FLAC,
    /root/reference/librispeech_prepare.py:530-545); decode cost of a
    verbatim stream is the floor of the native decoder's real cost.
    """
    pcm = (np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    n = len(pcm)
    si = 0
    for val, w in [(block, 16), (block, 16), (0, 24), (0, 24),
                   (sample_rate, 20), (0, 3), (15, 5), (n, 36), (0, 128)]:
        si = (si << w) | val
    parts = [b"fLaC", bytes([0x80, 0, 0, 34]), si.to_bytes(34, "big")]
    # Frame header: sync(14) 0 0 | blocksize-code 0111, rate-code 0000 |
    # channels 0000, bps 100, 0  ->  FF F8 70 08.
    fixed = bytes([0xFF, 0xF8, 0x70, 0x08])
    for frame_no, idx in enumerate(range(0, max(n, 1), block)):
        chunk = pcm[idx: idx + block]
        bs = len(chunk)
        parts.append(
            fixed + _utf8_code(frame_no) + (bs - 1).to_bytes(2, "big")
            + b"\x00"            # crc8 (decoder skips)
            + b"\x02"            # subframe: pad 0, type VERBATIM, wasted 0
            + chunk.astype(">i2").tobytes()
            + b"\x00\x00"        # crc16 (decoder skips)
        )
    with open(path, "wb") as f:
        f.write(b"".join(parts))


def flac_stream_info(path: str) -> Tuple[int, int]:
    """Parse FLAC STREAMINFO -> (total_samples, sample_rate).

    Pure header parse (the duration probe the reference does through
    torchaudio.info at librispeech_prepare.py:530-545) — no decoding.
    """
    with open(path, "rb") as f:
        if f.read(4) != b"fLaC":
            raise ValueError(f"not a FLAC file: {path}")
        header = f.read(4)
        block_type = header[0] & 0x7F
        length = int.from_bytes(header[1:4], "big")
        if block_type != 0:
            raise ValueError(f"STREAMINFO not first metadata block: {path}")
        info = f.read(length)
    # STREAMINFO layout: 16+16+24+24 bits, then 20 bits sample rate,
    # 3 bits channels-1, 5 bits bps-1, 36 bits total samples.
    bits = int.from_bytes(info[10:18], "big")
    sample_rate = bits >> 44
    total_samples = bits & ((1 << 36) - 1)
    return total_samples, sample_rate


_FLAC_BACKEND = None


def _flac_backend():
    global _FLAC_BACKEND
    if _FLAC_BACKEND is None:
        try:
            from mamba_asr_tpu import native

            if native.flac_lib() is not None:
                _FLAC_BACKEND = "native"
        except Exception:
            pass
    if _FLAC_BACKEND is None:
        try:
            import soundfile  # noqa: F401

            _FLAC_BACKEND = "soundfile"
        except ImportError:
            try:
                import torchaudio  # noqa: F401

                _FLAC_BACKEND = "torchaudio"
            except ImportError:
                _FLAC_BACKEND = "none"
    return _FLAC_BACKEND


def _read_flac_native(path: str) -> Tuple[np.ndarray, int]:
    """Decode via the in-repo C++ decoder (native/flac_decode.cpp)."""
    import ctypes

    from mamba_asr_tpu import native

    lib = native.flac_lib()
    total, sr = flac_stream_info(path)
    if total == 0:
        # Unknown length in STREAMINFO: ask the decoder (rare).
        total = lib.flac_decode_file(
            path.encode(), None, 0, ctypes.byref(ctypes.c_int32())
        )
        if total < 0:
            raise ValueError(f"FLAC decode failed: {path}")
    out = np.zeros(int(total), np.float32)
    sr_out = ctypes.c_int32(0)
    n = lib.flac_decode_file(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
        ctypes.byref(sr_out),
    )
    if n < 0:
        raise ValueError(f"FLAC decode failed: {path}")
    return out[:n], int(sr_out.value)


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Read WAV or FLAC -> (float32 mono waveform, sample_rate)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return read_wav(path)
    if ext == ".flac":
        backend = _flac_backend()
        if backend == "native":
            return _read_flac_native(path)
        if backend == "soundfile":
            import soundfile

            data, sr = soundfile.read(path, dtype="float32")
            if data.ndim > 1:
                data = data.mean(axis=1)
            return data.astype(np.float32), sr
        if backend == "torchaudio":
            import torchaudio

            data, sr = torchaudio.load(path)
            return data.mean(dim=0).numpy().astype(np.float32), sr
        raise RuntimeError(
            "no FLAC decode backend available (need soundfile or torchaudio); "
            "convert the corpus to WAV or install a backend"
        )
    raise ValueError(f"unsupported audio format: {path}")


def audio_duration(path: str) -> float:
    """Duration in seconds from the file header (no decode)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".flac":
        total, sr = flac_stream_info(path)
        return total / sr
    if ext == ".wav":
        with wave.open(path, "rb") as w:
            return w.getnframes() / w.getframerate()
    raise ValueError(f"unsupported audio format: {path}")
