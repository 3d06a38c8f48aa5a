"""Native (C++) runtime components, bound via ctypes — no pybind11.

Components (each with a pure-Python fallback when the toolchain is
unavailable):
  gridio.cpp   — fast Plumed-1 grid text I/O
  hillslog.cpp — hills-log event-stream formatter (output_hill trace)

Shared libraries are built on demand with the system toolchain into a
cache keyed on a hash of the source (a stale binary can never be loaded
silently).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading

_HERE = pathlib.Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build(stem: str = "gridio") -> pathlib.Path | None:
    # Cache keyed on a hash of the source: a stale binary (e.g. after a
    # checkout that preserves mtimes) can never be loaded silently.
    src = _HERE / f"{stem}.cpp"
    try:
        digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    except OSError:
        return None
    cache = pathlib.Path(
        os.environ.get("EDM_TPU_NATIVE_CACHE", _HERE / "_build")
    )
    so = cache / f"_{stem}-{digest}.so"
    if so.exists():
        return so
    try:
        cache.mkdir(parents=True, exist_ok=True)
        tmp = so.with_suffix(f".tmp{os.getpid()}")
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
        return so
    except Exception:
        return None


def load():
    """Return the loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("EDM_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        lib.edm_write_grid.restype = ctypes.c_int
        lib.edm_write_grid.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
        lib.edm_read_grid_data.restype = ctypes.c_long
        lib.edm_read_grid_data.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
        return _LIB


_HL_LIB = None
_HL_TRIED = False


def load_hillslog():
    """Return the hills-log formatter library, or None if unavailable."""
    global _HL_LIB, _HL_TRIED
    with _LOCK:
        if _HL_TRIED:
            return _HL_LIB
        _HL_TRIED = True
        if os.environ.get("EDM_TPU_NO_NATIVE"):
            return None
        so = _build("hillslog")
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        dp = ctypes.POINTER(ctypes.c_double)
        u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.edm_format_round.restype = ctypes.c_long
        lib.edm_format_round.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_double,
            ctypes.c_long, dp, dp, dp, dp, u8, u8,
            ctypes.c_long, dp, dp, dp, dp, u8, u8, u8,
        ]
        _HL_LIB = lib
        return _HL_LIB
