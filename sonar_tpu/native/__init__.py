"""Native (C++) runtime components: build-on-demand + ctypes bindings.

The C++ sources here replace the host-side hot loops that the reference
delegates to the external fairseq2n C++ library (SURVEY §2.3): currently the
SentencePiece unigram Viterbi encoder. The library is compiled once with the
system toolchain and cached next to the sources; every consumer has a pure-
Python fallback, so a missing compiler never breaks functionality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "_sonar_native.so"
_SOURCES = [_DIR / "spm.cpp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _needs_build() -> bool:
    if not _LIB_PATH.exists():
        return True
    lib_mtime = _LIB_PATH.stat().st_mtime
    return any(s.stat().st_mtime > lib_mtime for s in _SOURCES)


def _build() -> bool:
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        *(str(s) for s in _SOURCES),
        "-o",
        str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, PermissionError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (if stale) and load the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SONAR_TPU_NO_NATIVE"):
            return None
        if _needs_build() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.spm_create.restype = ctypes.c_void_p
        lib.spm_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.spm_destroy.argtypes = [ctypes.c_void_p]
        lib.spm_encode.restype = ctypes.c_int32
        lib.spm_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


class NativeSpmEncoder:
    """ctypes wrapper over the C++ Viterbi core; one instance per model."""

    def __init__(self, pieces, ids, scores, unk_id: int, unk_score: float,
                 byte_ids: dict):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        n = len(pieces)
        arr = (ctypes.c_char_p * n)(*[p.encode("utf-8") for p in pieces])
        idc = (ctypes.c_int32 * n)(*ids)
        sc = (ctypes.c_float * n)(*scores)
        bt = (ctypes.c_int32 * 256)(*[byte_ids.get(b, -1) for b in range(256)])
        self._handle = lib.spm_create(
            arr, idc, sc, n, unk_id if unk_id is not None else 0,
            ctypes.c_float(unk_score), bt,
        )
        self._out_cap = 4096
        self._out = (ctypes.c_int32 * self._out_cap)()

    def encode_normalized(self, text: str):
        data = text.encode("utf-8")
        while True:
            n = self._lib.spm_encode(
                self._handle, data, len(data), self._out, self._out_cap
            )
            if n >= 0:
                return list(self._out[:n])
            self._out_cap *= 4
            self._out = (ctypes.c_int32 * self._out_cap)()

    def __del__(self):
        try:
            self._lib.spm_destroy(self._handle)
        except Exception:
            pass
