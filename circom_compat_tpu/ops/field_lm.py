"""Limb-major BN254 field arithmetic for Pallas kernels.

Same algorithms as ops/field_jax.py (CIOS Montgomery multiply, Kogge-Stone
carry resolution, borrow-free conditional subtract) but with the limb axis
at -2 and the batch (lane) axis last:

    Fq element block:  (..., 16, L)
    Fq2 element block: (..., 2, 16, L)

On TPU the minor-most axis maps to the 128 vector lanes. The (N, 16)
limb-minor layout used by the XLA pipeline fills only 16/128 lanes inside a
Pallas kernel (measured 0.51 M point-adds/s vs 0.85 M for XLA-composed,
BASELINE.md); transposed to (16, L) every vector op runs at full width and
the limb-axis shifts become cheap sublane moves.

All functions are written to be lowerable by Mosaic: fully-unrolled static
loops, no captured numpy array constants (the modulus limbs are passed in as
arguments shaped (16, 1); the only embedded constants are scalars and
iota-derived masks), no scatter/gather, no pjit.

Replaces the role of ark-ff's x86-asm Montgomery backend on the MSM hot
path (reference: Cargo.toml:25 `features = ["asm"]`). Ground truth:
refmath/field.py; parity tests in tests/test_curve_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS

_MASK = np.uint32(LIMB_MASK)


def _shift_up_k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Limb index i -> i+k along axis -2, zeros shifted in at the bottom."""
    if k == 0:
        return x
    zeros = jnp.zeros_like(x[..., :k, :])
    return jnp.concatenate([zeros, x[..., :-k, :]], axis=-2)


def _one_pass_u(t: jnp.ndarray) -> jnp.ndarray:
    lo = t & _MASK
    hi = t >> LIMB_BITS
    return lo + _shift_up_k(hi, 1)


def normalize_u(t: jnp.ndarray, pre_passes: int = 2) -> jnp.ndarray:
    """Exact carry propagation of loose uint32 limbs, branch-free.

    Same scheme as field_jax.normalize_u: `pre_passes` plain passes bring
    every limb to <= 2^16, then the residual 0/1 ripple resolves with a
    Kogge-Stone generate/propagate prefix along the limb (sublane) axis.
    """
    for _ in range(pre_passes):
        t = _one_pass_u(t)
    g = (t >> LIMB_BITS).astype(jnp.uint32)
    p = (t == _MASK).astype(jnp.uint32)
    G = _shift_up_k(g, 1)
    P = _shift_up_k(p, 1)
    k = 1
    L = t.shape[-2]
    while k < L:
        G = G | (P & _shift_up_k(G, k))
        P = P & _shift_up_k(P, k)
        k <<= 1
    return (t + G) & _MASK


def _pad_top(x: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    zeros = jnp.zeros(x.shape[:-2] + (n,) + x.shape[-1:], dtype=x.dtype)
    return jnp.concatenate([x, zeros], axis=-2)


def cond_sub_p(pc_col: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """If t >= p subtract p once; pc_col = (16, 1) limbs of 2^256 - p."""
    u = _pad_top(t) + _pad_top(pc_col)
    u = normalize_u(u, pre_passes=1)
    ge = u[..., 16:17, :] != 0
    return jnp.where(ge, u[..., :16, :], t)


def add(p_col: jnp.ndarray, pc_col: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    s = normalize_u(a + b, pre_passes=1)
    return cond_sub_p(pc_col, s)


def sub(p_col: jnp.ndarray, pc_col: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """a - b + p via limbwise complement (see field_jax.sub for the trick)."""
    comp = _MASK - b
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    # 1 at limb 0 of the 17-limb column, built from iota (no array consts).
    limb_idx = jax.lax.broadcasted_iota(jnp.uint32, (NUM_LIMBS + 1, 1), 0)
    e0 = (limb_idx == 0).astype(jnp.uint32)
    u = (
        _pad_top(jnp.broadcast_to(a, shape))
        + _pad_top(jnp.broadcast_to(comp, shape))
        + _pad_top(p_col)
        + e0
    )
    u = normalize_u(u, pre_passes=2)
    return cond_sub_p(pc_col, u[..., :16, :])


def neg(p_col: jnp.ndarray, pc_col: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    return sub(p_col, pc_col, jnp.zeros_like(a), a)


def mont_mul(
    p_col: jnp.ndarray, pc_col: jnp.ndarray, nprime: int, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """(a * b * R^-1) mod p, CIOS fully unrolled (16 static steps).

    Identical arithmetic to field_jax.mont_mul; the unrolled form is the
    in-register chain Mosaic wants (no dynamic_slice inside kernels).
    """
    np_ = np.uint32(nprime)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t = jnp.zeros(shape[:-2] + (NUM_LIMBS + 1,) + shape[-1:], jnp.uint32)

    def _shift_up17(x):  # (..., 16, L) -> (..., 17, L), limbs moved one up
        return jnp.concatenate([jnp.zeros_like(x[..., :1, :]), x], axis=-2)

    for i in range(NUM_LIMBS):
        bi = b[..., i : i + 1, :]
        prod = a * bi  # exact: < 2^32
        t = t + _pad_top(prod & _MASK) + _shift_up17(prod >> LIMB_BITS)
        m = ((t[..., 0:1, :] & _MASK) * np_) & _MASK
        mq = m * p_col  # exact: < 2^32
        t = t + _pad_top(mq & _MASK) + _shift_up17(mq >> LIMB_BITS)
        carry0 = t[..., 0:1, :] >> LIMB_BITS
        t = _pad_top(t[..., 1:, :])  # shift one limb down
        t = t + _pad_top(carry0, NUM_LIMBS)
    t = normalize_u(t)
    return cond_sub_p(pc_col, t[..., :16, :])


# ---------------------------------------------------------------------------
# Lazy-reduction variants: values live in [0, 2p)
#
# BN254 has p < R/4 (p ≈ 0.189 · 2^256), so CIOS on inputs a, b < 2p yields
# t < (2p·2p)/R + p < 2p with NO final conditional subtraction — the
# dominant per-mul overhead after the 16-step ladder. Additions reduce
# mod 2p instead of p (same cost as before); only the host decode
# canonicalizes. Safe for the RCB projective group law, which contains no
# equality tests on computed values (ops/curve_pallas.py).
# ---------------------------------------------------------------------------


def mont_mul_lazy(
    p_col: jnp.ndarray, nprime: int, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """(a * b * R^-1) mod* p for a, b < 2p: result < 2p, no cond-subtract."""
    np_ = np.uint32(nprime)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t = jnp.zeros(shape[:-2] + (NUM_LIMBS + 1,) + shape[-1:], jnp.uint32)

    def _shift_up17(x):
        return jnp.concatenate([jnp.zeros_like(x[..., :1, :]), x], axis=-2)

    for i in range(NUM_LIMBS):
        bi = b[..., i : i + 1, :]
        prod = a * bi
        t = t + _pad_top(prod & _MASK) + _shift_up17(prod >> LIMB_BITS)
        m = ((t[..., 0:1, :] & _MASK) * np_) & _MASK
        mq = m * p_col
        t = t + _pad_top(mq & _MASK) + _shift_up17(mq >> LIMB_BITS)
        carry0 = t[..., 0:1, :] >> LIMB_BITS
        t = _pad_top(t[..., 1:, :])
        t = t + _pad_top(carry0, NUM_LIMBS)
    return normalize_u(t)[..., :16, :]


def add_lazy(p2c_col: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """a + b mod* 2p for a, b < 2p; p2c_col = (16, L) limbs of 2^256 - 2p."""
    s = normalize_u(a + b, pre_passes=1)
    return cond_sub_p(p2c_col, s)


def sub_lazy(p2_col: jnp.ndarray, p2c_col: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
    """a - b mod* 2p for a, b < 2p (adds 2p, complement trick, reduces)."""
    comp = _MASK - b
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    limb_idx = jax.lax.broadcasted_iota(jnp.uint32, (NUM_LIMBS + 1, 1), 0)
    e0 = (limb_idx == 0).astype(jnp.uint32)
    u = (
        _pad_top(jnp.broadcast_to(a, shape))
        + _pad_top(jnp.broadcast_to(comp, shape))
        + _pad_top(p2_col)
        + e0
    )
    u = normalize_u(u, pre_passes=2)
    return cond_sub_p(p2c_col, u[..., :16, :])


# ---------------------------------------------------------------------------
# Layout codecs (XLA side, outside kernels)
# ---------------------------------------------------------------------------


def fq_to_lm(x: jnp.ndarray) -> jnp.ndarray:
    """(M, 16) -> (16, M)."""
    return x.T


def fq_from_lm(x: jnp.ndarray) -> jnp.ndarray:
    """(16, M) -> (M, 16)."""
    return x.T


def fq2_to_lm(x: jnp.ndarray) -> jnp.ndarray:
    """(M, 2, 16) -> (2, 16, M)."""
    return jnp.transpose(x, (1, 2, 0))


def fq2_from_lm(x: jnp.ndarray) -> jnp.ndarray:
    """(2, 16, M) -> (M, 2, 16)."""
    return jnp.transpose(x, (2, 0, 1))
