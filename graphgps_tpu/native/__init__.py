"""Native (C++) host-side ops: build-on-first-use + ctypes bindings.

The shared library is compiled from collate.cpp with the system g++ the first
time it is needed and cached next to the source. Every native entry point has a
pure-numpy fallback (graphgps_tpu/data/batching.py), so a missing toolchain
degrades gracefully to the Python path.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading

log = logging.getLogger("graphgps_tpu")

_SRC = os.path.join(os.path.dirname(__file__), "collate.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libggps_collate.so")
_HASH = _LIB + ".srchash"  # sha256 of collate.cpp the .so was built from
_lock = threading.Lock()
_lib = None
_failed = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _lib_current() -> bool:
    """True when the cached .so was built from the current source on this
    machine (content hash, not mtime — a fresh clone gives every file the
    same mtime, which would silently reuse a stale or wrong-arch binary)."""
    if not os.path.exists(_LIB) or not os.path.exists(_HASH):
        return False
    try:
        with open(_HASH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(_HASH, "w") as f:
            f.write(_src_hash())
        return True
    except Exception as e:
        log.warning("native collate build failed (%s) — using numpy fallback", e)
        return False


def get_lib():
    """The loaded shared library, building it if necessary; None on failure."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _lib_current():
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.warning("native collate load failed (%s)", e)
            _failed = True
            return None
        i64, u8p, i32p, i64p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int64))
        lib.collate_batch.restype = ctypes.c_int
        lib.collate_batch.argtypes = [
            i64p, i64p, u8p, u8p, i32p, i32p, i64p,
            i64, i64, i64, i64, i64, i64,
            u8p, u8p, i32p, i32p, u8p, u8p, u8p]
        lib.pad_node_rows.restype = ctypes.c_int
        lib.pad_node_rows.argtypes = [i64p, u8p, i64p, i64, i64, i64, i64, u8p]
        _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None
