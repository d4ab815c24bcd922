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
            lib.msm_g1_window_sums.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_uint64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_void_p, ctypes.c_int,
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


def msm_g1_window_sums_native(
    xs_u16: np.ndarray,
    ys_u16: np.ndarray,
    scalars_plain_u16: np.ndarray,
    window_bits: int,
    nthreads: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Host Pippenger G1 window sums (the measured CPU baseline for
    bench.py's vs_baseline; plays the role of ark-ec's parallel MSM,
    reference: Cargo.toml:26).

    xs/ys: (n, 16) uint16 affine Montgomery limbs (zkey storage layout,
    all-zero row = infinity); scalars: (n, 16) uint16 plain canonical.
    Returns (W, 3, 4) uint64 Jacobian Montgomery sums or None if the
    native library is unavailable.
    """
    lib = _load_lib() if available() else None
    if lib is None:
        return None
    from ..constants import Q

    xs = np.ascontiguousarray(xs_u16, dtype="<u2")
    ys = np.ascontiguousarray(ys_u16, dtype="<u2")
    sc = np.ascontiguousarray(scalars_plain_u16, dtype="<u2")
    n = xs.shape[0]
    w_count = -(-254 // window_bits)
    out = np.zeros((w_count, 3, 4), dtype="<u8")
    one_mont = (1 << 256) % Q
    one_arr = (ctypes.c_uint64 * 4)(
        *[(one_mont >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]
    )
    if n:
        lib.msm_g1_window_sums(
            xs.ctypes.data, ys.ctypes.data, sc.ctypes.data, n,
            int(window_bits), _p_limbs64(Q), _np64(Q), one_arr,
            out.ctypes.data, nthreads or (os.cpu_count() or 1),
        )
    return out


def msm_g1_native(points_u16_xy, scalars, window_bits: int = 13,
                  nthreads: Optional[int] = None):
    """Full host MSM: native window sums + exact Horner fold. Returns an
    affine (x, y) int pair or None (infinity / library unavailable)."""
    from ..constants import Q
    from ..ops import limbs as limb_codec
    from ..refmath import curve as rc

    xs, ys = points_u16_xy
    sc16 = limb_codec.ints_to_limbs(
        [int(s) for s in scalars], dtype=np.uint16
    )
    sums = msm_g1_window_sums_native(xs, ys, sc16, window_bits, nthreads)
    if sums is None:
        return None
    r_inv = pow(1 << 256, -1, Q)

    def decode(jac_row):
        X, Y, Z = (
            int.from_bytes(np.ascontiguousarray(c).tobytes(), "little")
            * r_inv % Q
            for c in jac_row
        )
        if Z == 0:
            return None
        zi = pow(Z, -1, Q)
        return (X * zi * zi % Q, Y * zi * zi % Q * zi % Q)

    acc = None
    for w in reversed(range(sums.shape[0])):
        if acc is not None:
            for _ in range(window_bits):
                acc = rc.G1.double(acc)
        acc = rc.G1.add(acc, decode(sums[w]))
    return acc
