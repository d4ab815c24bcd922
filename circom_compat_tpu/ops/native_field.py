"""ctypes bridge to native/field_ops.cpp — bulk host Montgomery ops.

Fills the role of ark-ff's asm backend (reference: Cargo.toml:25) for the
HOST side of the pipeline: multi-million-element Montgomery strips of zkey
coefficient sections (reference semantics: src/zkey.rs:320-325) run ~100x
faster in 4x64-limb C++ than the numpy 16x16-limb fallback
(ops/limbs.mont_strip_np).

Built on demand with g++ (same pattern as witness/wasm/native.py); import
never raises — callers check `available()` and fall back to numpy.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libfield_ops.so"
_BUILD_LOCK = threading.Lock()

_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            src = _NATIVE_DIR / "field_ops.cpp"
            if (
                not _SO_PATH.exists()
                or _SO_PATH.stat().st_mtime < src.stat().st_mtime
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO_PATH))
            lib.mont_strip.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64, ctypes.c_int,
            ]
            lib.mont_mul_const.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    if os.environ.get("CIRCOM_TPU_NATIVE", "1") == "0":
        return False
    return _load_lib() is not None


def _p_limbs64(p: int) -> "ctypes.Array":
    return (ctypes.c_uint64 * 4)(*[(p >> (64 * i)) & ((1 << 64) - 1) for i in range(4)])


def _np64(p: int) -> int:
    return (-pow(p, -1, 1 << 64)) % (1 << 64)


def _nthreads(n: int) -> int:
    return min(os.cpu_count() or 1, max(1, n // 65536))


def mont_strip(values_u16: np.ndarray, p: int) -> Optional[np.ndarray]:
    """(n, 16) uint16 LE limbs of v -> limbs of v * 2^-256 mod p, or None if
    the native library is unavailable."""
    lib = _load_lib() if available() else None
    if lib is None:
        return None
    src = np.ascontiguousarray(values_u16, dtype="<u2")
    out = np.empty_like(src)
    n = src.shape[0]
    if n:
        lib.mont_strip(
            src.ctypes.data, out.ctypes.data, n,
            _p_limbs64(p), _np64(p), _nthreads(n),
        )
    return out


def mont_mul_const(values_u16: np.ndarray, c: int, p: int) -> Optional[np.ndarray]:
    """(n, 16) uint16 limbs of v -> limbs of v * c * 2^-256 mod p.

    With c in plain form this maps Montgomery-form inputs v=x*R to (x*c)*R
    ... * R^-1 * R: i.e. multiplies the underlying value by c while keeping
    the representation's Montgomery factor count unchanged only if c itself
    carries one. Callers pick the form of c accordingly.
    """
    lib = _load_lib() if available() else None
    if lib is None:
        return None
    src = np.ascontiguousarray(values_u16, dtype="<u2")
    out = np.empty_like(src)
    n = src.shape[0]
    if n:
        c_arr = (ctypes.c_uint64 * 4)(
            *[(c >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]
        )
        lib.mont_mul_const(
            src.ctypes.data, out.ctypes.data, n,
            c_arr, _p_limbs64(p), _np64(p), _nthreads(n),
        )
    return out
