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
    """Iterable of ints -> (N, NUM_LIMBS) limb array."""
    values = list(values)
    out = np.empty((len(values), NUM_LIMBS), dtype=dtype)
    for row, v in enumerate(values):
        if v < 0 or v >> (LIMB_BITS * NUM_LIMBS):
            raise ValueError("value out of 256-bit range")
        for i in range(NUM_LIMBS):
            out[row, i] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_ints(limbs: np.ndarray) -> list:
    """(..., NUM_LIMBS) limb array -> nested list of Python ints."""
    arr = np.asarray(limbs)
    if arr.ndim == 1:
        return limbs_to_int(arr)
    flat = arr.reshape(-1, NUM_LIMBS).astype(np.uint64)
    weights = (np.uint64(1) << (np.arange(NUM_LIMBS, dtype=np.uint64) * np.uint64(LIMB_BITS)))
    # Use Python ints to avoid overflow: fold pairwise through object dtype.
    out = []
    for row in flat:
        acc = 0
        for i in range(NUM_LIMBS - 1, -1, -1):
            acc = (acc << LIMB_BITS) | int(row[i])
        out.append(acc)
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
