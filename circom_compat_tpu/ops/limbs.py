"""Limb-decomposition codecs between Python ints, bytes, and numpy arrays.

Device field elements are little-endian vectors of NUM_LIMBS=16 limbs of
LIMB_BITS=16 bits, stored in uint32 lanes (canonical on device) or uint16
(compact host staging, exactly the .zkey/.r1cs wire layout reinterpreted).

This module is numpy-only (no jax import) so parsers can use it cheaply.
"""

from __future__ import annotations

import numpy as np

from ..constants import LIMB_BITS, NUM_LIMBS, LIMB_MASK

_BYTES_PER_LIMB = LIMB_BITS // 8
_ELEM_BYTES = NUM_LIMBS * _BYTES_PER_LIMB  # 32


def int_to_limbs(x: int, dtype=np.uint32) -> np.ndarray:
    """One field element -> (NUM_LIMBS,) limb vector (little-endian limbs)."""
    if x < 0 or x >> (LIMB_BITS * NUM_LIMBS):
        raise ValueError("value out of 256-bit range")
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS)], dtype=dtype
    )


def limbs_to_int(limbs: np.ndarray) -> int:
    """(NUM_LIMBS,) limb vector -> Python int."""
    acc = 0
    for i in range(NUM_LIMBS - 1, -1, -1):
        acc = (acc << LIMB_BITS) | int(limbs[i])
    return acc


def ints_to_limbs(values, dtype=np.uint32) -> np.ndarray:
    """Iterable of ints -> (N, NUM_LIMBS) limb array.

    Via int.to_bytes into a preallocated bytearray: the 32-byte LE encoding
    IS the LE 16-bit limb layout. Writing through a memoryview measures 6x
    faster than b"".join(generator) at 2^20 (join rescans its operand list;
    the assignment encode is ~15% of a 2^20 steady-state prove)."""
    values = list(values)
    buf = bytearray(len(values) * _ELEM_BYTES)
    mv = memoryview(buf)
    off = 0
    try:
        for v in values:
            mv[off : off + _ELEM_BYTES] = v.to_bytes(_ELEM_BYTES, "little")
            off += _ELEM_BYTES
    except (OverflowError, AttributeError) as e:
        raise ValueError("value out of 256-bit range") from e
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(values), NUM_LIMBS)
    return arr.astype(dtype)  # astype copies: frombuffer views are read-only


def limbs_to_ints(limbs: np.ndarray) -> list:
    """(..., NUM_LIMBS) limb array -> nested list of Python ints."""
    arr = np.asarray(limbs)
    if arr.ndim == 1:
        return limbs_to_int(arr)
    flat = np.ascontiguousarray(arr.reshape(-1, NUM_LIMBS).astype("<u2"))
    raw = flat.tobytes()
    out = [
        int.from_bytes(raw[i * _ELEM_BYTES : (i + 1) * _ELEM_BYTES], "little")
        for i in range(flat.shape[0])
    ]
    return np.array(out, dtype=object).reshape(arr.shape[:-1]).tolist()


def bytes_to_limbs(buf: bytes, count: int) -> np.ndarray:
    """`count` consecutive 32-byte LE field elements -> (count, NUM_LIMBS) uint16.

    Zero-copy reinterpretation: the .zkey/.r1cs little-endian byte layout IS
    the little-endian 16-bit limb layout.
    """
    arr = np.frombuffer(buf, dtype="<u2", count=count * NUM_LIMBS)
    return arr.reshape(count, NUM_LIMBS)


def limbs_to_bytes(limbs: np.ndarray) -> bytes:
    """(N, NUM_LIMBS) limb array -> concatenated 32-byte LE encodings."""
    return np.ascontiguousarray(limbs.astype("<u2")).tobytes()


def mont_strip(values: np.ndarray, p: int, nprime: int) -> np.ndarray:
    """Montgomery strip dispatcher: native C++ (ops/native_field.py) when
    buildable, else the numpy fallback below. Identical results."""
    try:
        from . import native_field

        out = native_field.mont_strip(values, p)
        if out is not None:
            return out
    except Exception:
        pass
    return mont_strip_np(values, p, nprime)


def mont_strip_np(values: np.ndarray, p: int, nprime: int) -> np.ndarray:
    """Vectorized Montgomery strip: (n, 16) uint16 limbs of v -> v*R^-1 mod p.

    Pure-numpy uint64 REDC over ONE preallocated (n, 33) work buffer with
    offset indexing — no per-iteration allocation or concatenate copies.
    Limb bound check: each work limb accumulates <=16 products < 2^32 plus
    carries, staying < 2^37, far inside uint64.
    """
    mask = np.uint64(LIMB_MASK)
    shift = np.uint64(LIMB_BITS)
    p_limbs = int_to_limbs(p).astype(np.uint64)
    pc_limbs = int_to_limbs((1 << 256) - p).astype(np.uint64)
    np_ = np.uint64(nprime)

    n = values.shape[0]
    t = np.zeros((n, 2 * NUM_LIMBS + 1), np.uint64)
    t[:, :NUM_LIMBS] = values  # one-pass widen of the (possibly strided) input
    for i in range(NUM_LIMBS):
        m = (t[:, i] * np_) & mask
        t[:, i : i + NUM_LIMBS] += m[:, None] * p_limbs
        t[:, i + 1] += t[:, i] >> shift  # low 16 bits of limb i now zero

    t = t[:, NUM_LIMBS:]  # (n, 17) result limbs (REDC divides by 2^256)

    def normalize(x):  # in-place ripple; limbs < 2^37 resolve in ~3 passes
        hi = x >> shift
        while hi.any():
            x &= mask
            x[:, 1:] += hi[:, :-1]
            hi = x >> shift
        return x

    t = normalize(t)[:, :NUM_LIMBS]
    # conditional subtract p via the 2^256 - p trick in 17-limb space:
    # the sum overflows into the guard limb iff t >= p.
    u17 = np.zeros((n, NUM_LIMBS + 1), np.uint64)
    u17[:, :NUM_LIMBS] = t
    u17[:, :NUM_LIMBS] += pc_limbs
    u17 = normalize(u17)
    ge = u17[:, NUM_LIMBS] != 0
    out = np.where(ge[:, None], u17[:, :NUM_LIMBS], t)
    return out.astype(np.uint16)
