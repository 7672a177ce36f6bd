"""Native (C++) host-side components, built on first use with g++.

The reference's native code lives in CUDA pip packages (SURVEY.md §2.2);
this framework's device code is Pallas/XLA, and the *host*-side hot paths
(WER alignment, FLAC decode) are C++ here, bound via ctypes (no pybind11
in the image).

Build model: `g++ -O3 -shared -fPIC` at first import into a cached .so
under the package dir; every binding has a pure-Python fallback so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build_and_load(name: str) -> Optional[ctypes.CDLL]:
    """Compile <name>.cpp -> lib<name>.so (cached) and dlopen it."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        try:
            if not os.path.isfile(so) or (
                os.path.getmtime(so) < os.path.getmtime(src)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     src, "-o", so],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib


def edit_distance_lib() -> Optional[ctypes.CDLL]:
    lib = _build_and_load("edit_distance")
    if lib is not None and not getattr(lib, "_configured", False):
        lib.edit_distance_counts.restype = ctypes.c_int64
        lib.edit_distance_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.edit_distance_batch.restype = ctypes.c_int64
        lib.edit_distance_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib._configured = True
    return lib


def flac_lib() -> Optional[ctypes.CDLL]:
    lib = _build_and_load("flac_decode")
    if lib is not None and not getattr(lib, "_configured", False):
        lib.flac_decode_file.restype = ctypes.c_int64
        lib.flac_decode_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.linear_resample.restype = ctypes.c_int64
        lib.linear_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.sinc_resample.restype = ctypes.c_int64
        lib.sinc_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib._configured = True
    return lib
