"""Vectorized BN254 field arithmetic on TPU (JAX, limb-decomposed Montgomery).

Field elements are little-endian vectors of NUM_LIMBS=16 limbs of
LIMB_BITS=16 bits held in uint32 lanes, batched over arbitrary leading axes.
All heavy ops (mul, inv chains, NTT butterflies, curve formulas) run in the
Montgomery domain (x*R mod p, R = 2^256) — exactly the form .zkey stores Fq
point coordinates in (reference: src/zkey.rs:327-332), so zkey limbs flow to
the device without any host-side transform.

This replaces the role of ark-ff's x86-asm Montgomery backend in the
reference stack (reference: Cargo.toml:25 `features = ["asm"]`). The 16x16
split keeps every partial product exact in uint32 (max (2^16-1)^2 < 2^32)
and lets the CIOS inner loop accumulate "loose" limbs (< 2^22) without carry
chains; carries are only resolved once per multiply.

Ground truth: refmath/field.py (plain Python ints); parity tests in
tests/test_field_jax.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    MONT_R2_Q,
    MONT_R2_R,
    MONT_R_Q,
    MONT_R_R,
    NPRIME_Q,
    NPRIME_R,
    Q,
    R_SCALAR,
)
from . import limbs as limb_codec

_MASK = np.uint32(LIMB_MASK)


class _PallasMode:
    """Trace-time flag: kernels in ops/*_pallas.py set this while tracing
    their bodies so limb loops pick the Mosaic-friendly unroll."""

    def __init__(self):
        self.active = False

    def __enter__(self):
        self.active = True
        return self

    def __exit__(self, *exc):
        self.active = False


PALLAS_MODE = _PallasMode()


# ---------------------------------------------------------------------------
# Field specification
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class FieldSpec:
    """Static per-modulus constants, kept as numpy so tracing embeds them.

    eq=False: FQ/FR are singletons compared/hashed by identity so a spec can
    be a `static_argnums` argument under jax.jit.
    """

    name: str
    modulus: int
    nprime: int  # -p^-1 mod 2^LIMB_BITS
    p_limbs: np.ndarray  # (16,) uint32
    pc_limbs: np.ndarray  # (16,) uint32: 2^256 - p (for conditional subtract)
    one_mont: np.ndarray  # (16,) uint32: R mod p
    r2_limbs: np.ndarray  # (16,) uint32: R^2 mod p
    zero: np.ndarray  # (16,) uint32

    @staticmethod
    def make(name: str, p: int, nprime: int, r_mod: int, r2: int) -> "FieldSpec":
        return FieldSpec(
            name=name,
            modulus=p,
            nprime=nprime,
            p_limbs=limb_codec.int_to_limbs(p),
            pc_limbs=limb_codec.int_to_limbs((1 << 256) - p),
            one_mont=limb_codec.int_to_limbs(r_mod),
            r2_limbs=limb_codec.int_to_limbs(r2),
            zero=np.zeros(NUM_LIMBS, dtype=np.uint32),
        )


FQ = FieldSpec.make("fq", Q, NPRIME_Q, MONT_R_Q, MONT_R2_Q)
FR = FieldSpec.make("fr", R_SCALAR, NPRIME_R, MONT_R_R, MONT_R2_R)


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------


def _one_pass_u(t: jnp.ndarray) -> jnp.ndarray:
    """One vectorized carry pass (unsigned); carries move one limb up."""
    lo = t & _MASK
    hi = t >> LIMB_BITS
    return lo + jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)


def _shift_up_k(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Limb index i -> i+k, zeros shifted in at the bottom."""
    if k == 0:
        return x
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :k]), x[..., :-k]], axis=-1
    )


def normalize_u(t: jnp.ndarray, pre_passes: int = 2) -> jnp.ndarray:
    """Exact carry propagation of loose uint32 limbs, branch-free.

    `pre_passes` plain passes first bring every limb to <= 2^16 (callers
    pick the count from their bound: inputs < 2^17 need 1; < 2^22 need 2).
    The residual +1 ripple is then resolved with a Kogge-Stone
    generate/propagate prefix in log2(L) steps — no data-dependent control
    flow, so graphs embedding thousands of field ops stay while-loop-free.
    """
    for _ in range(pre_passes):
        t = _one_pass_u(t)
    # limbs now in [0, 2^16]; carries are 0/1.
    g = (t >> LIMB_BITS).astype(jnp.uint32)  # generate: limb == 2^16
    p = (t == _MASK).astype(jnp.uint32)  # propagate: limb == 0xffff
    G = _shift_up_k(g, 1)  # carry INTO limb i from limb i-1
    P = _shift_up_k(p, 1)
    k = 1
    L = t.shape[-1]
    while k < L:
        G = G | (P & _shift_up_k(G, k))
        P = P & _shift_up_k(P, k)
        k <<= 1
    return (t + G) & _MASK


def _pad_top(x: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (n,), dtype=x.dtype)], axis=-1
    )


def cond_sub_p(field: FieldSpec, t: jnp.ndarray) -> jnp.ndarray:
    """If t >= p subtract p once. t: canonical 16 limbs, value < 2p < 2^256.

    Implemented branch-free as t + (2^256 - p) in 17-limb space; the borrow
    trick: the sum overflows into limb 16 iff t >= p, in which case the low
    16 limbs are exactly t - p.
    """
    u = _pad_top(t) + _pad_top(jnp.asarray(field.pc_limbs))
    u = normalize_u(u, pre_passes=1)
    ge = (u[..., 16:17] != 0).astype(jnp.uint32)
    return jnp.where(ge != 0, u[..., :16], t)


# ---------------------------------------------------------------------------
# Basic modular ops (inputs canonical: 16 limbs < 2^16, value < p)
# ---------------------------------------------------------------------------


def add(field: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = normalize_u(a + b, pre_passes=1)  # < 2p < 2^256: no top overflow
    return cond_sub_p(field, s)


def sub(field: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b + p, borrow-free: 2^256 - b == ~b + 1 limbwise (b canonical),
    so a - b + p = (a + ~b + p + 1) - 2^256 and the 2^256 appears as a
    guaranteed 1 in limb 16 of the 17-limb sum."""
    comp = _MASK - b  # limbwise complement: no borrows since b_i <= 0xffff
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    # (no .at[].set here: that lowers to scatter, unsupported in Mosaic)
    e0 = jnp.concatenate(
        [
            jnp.ones(shape[:-1] + (1,), jnp.uint32),
            jnp.zeros(shape[:-1] + (NUM_LIMBS,), jnp.uint32),
        ],
        axis=-1,
    )
    u = (
        _pad_top(jnp.broadcast_to(a, shape))
        + _pad_top(comp)
        + _pad_top(jnp.asarray(field.p_limbs))
        + e0
    )
    u = normalize_u(u, pre_passes=2)  # limbs <= 3*0xffff + 1 < 2^18
    return cond_sub_p(field, u[..., :16])  # drop the 2^256 in limb 16


def neg(field: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(field, jnp.zeros_like(a), a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    """(...,) bool mask: all limbs zero."""
    return ~jnp.any(a != 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """where(mask, a, b) with mask shaped (...,) broadcasting over limbs."""
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS with loose accumulation)
# ---------------------------------------------------------------------------


def mont_mul(field: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b * R^-1) mod p over Montgomery-form limbs.

    Interleaved operand scanning: 16 unrolled iterations; each adds one
    b-limb partial product (split lo/hi so every lane stays exact in uint32)
    and one Montgomery reduction step, then shifts one limb down. Loose
    limbs stay < 2^22; carries resolve once at the end.
    """
    pl = jnp.asarray(field.p_limbs)
    np_ = jnp.uint32(field.nprime)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    t0 = jnp.zeros(shape[:-1] + (NUM_LIMBS + 1,), jnp.uint32)

    def _shift_up17(x):  # (..., 16) -> (..., 17), limbs moved one up
        return jnp.concatenate([jnp.zeros_like(x[..., :1]), x], axis=-1)

    def step(bi, t):
        prod = a * bi  # exact: < 2^32
        t = t + _pad_top(prod & _MASK) + _shift_up17(prod >> LIMB_BITS)
        m = ((t[..., 0:1] & _MASK) * np_) & _MASK
        mq = m * pl  # exact: < 2^32
        t = t + _pad_top(mq & _MASK) + _shift_up17(mq >> LIMB_BITS)
        carry0 = t[..., 0:1] >> LIMB_BITS  # low 16 bits are 0 by construction
        t = _pad_top(t[..., 1:])  # shift one limb down
        return t + _pad_top(carry0, NUM_LIMBS)

    if PALLAS_MODE.active:
        # Inside Pallas kernels: static Python loop — the in-register chain
        # Mosaic wants, and dynamic_slice (unsupported there) never appears.
        t = t0
        for i in range(NUM_LIMBS):
            t = step(b[..., i : i + 1], t)
    else:
        # Plain XLA graphs: rolled loop — a 16x-unrolled flat graph repeated
        # across every scan combine made compiles pathological.
        def body(i, t):
            return step(jax.lax.dynamic_slice_in_dim(b, i, 1, axis=-1), t)

        t = jax.lax.fori_loop(0, NUM_LIMBS, body, t0)
    t = normalize_u(t)  # result < 2p < 2^255: limb 16 ends up 0
    return cond_sub_p(field, t[..., :16])


def mont_sqr(field: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(field, a, a)


def to_mont(field: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(field, a, jnp.asarray(field.r2_limbs))


def from_mont(field: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros(NUM_LIMBS, jnp.uint32).at[0].set(1)
    return mont_mul(field, a, one)


def pow_const(field: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a static Python-int exponent.

    Square-and-multiply via lax.scan over the (static) bit string so the
    compiled graph holds one butterfly body, not e.bit_length() copies.
    """
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(field.one_mont), a.shape).astype(jnp.uint32)
    bits = np.array([int(c) for c in bin(e)[2:]], dtype=np.int32)

    def body(acc, bit):
        acc = mont_sqr(field, acc)
        acc = jnp.where(bit != 0, mont_mul(field, acc, a), acc)
        return acc, None

    init = jnp.broadcast_to(jnp.asarray(field.one_mont), a.shape).astype(jnp.uint32)
    out, _ = jax.lax.scan(body, init, jnp.asarray(bits))
    return out


def inv(field: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched Fermat inversion a^(p-2); 0 maps to 0."""
    return pow_const(field, a, field.modulus - 2)


# ---------------------------------------------------------------------------
# Host <-> device codecs
# ---------------------------------------------------------------------------


def encode_plain(values, field: FieldSpec | None = None) -> np.ndarray:
    """Python ints -> (N, 16) uint32 canonical (non-Montgomery) limbs."""
    if field is not None:
        values = [v % field.modulus for v in values]
    return limb_codec.ints_to_limbs(values, dtype=np.uint32)


def encode_mont(values, field: FieldSpec) -> np.ndarray:
    """Python ints -> (N, 16) uint32 Montgomery limbs (host-side transform)."""
    p = field.modulus
    r = 1 << 256
    return limb_codec.ints_to_limbs([(v % p) * r % p for v in values], dtype=np.uint32)


# jit the public batch ops: eager callers get compiled+cached kernels (the
# raw bodies stay available with a _impl suffix for composition in traces).
add_impl, sub_impl, neg_impl, mont_mul_impl = add, sub, neg, mont_mul
to_mont_impl, from_mont_impl, inv_impl = to_mont, from_mont, inv
add = jax.jit(add_impl, static_argnums=0)
sub = jax.jit(sub_impl, static_argnums=0)
neg = jax.jit(neg_impl, static_argnums=0)
mont_mul = jax.jit(mont_mul_impl, static_argnums=0)
to_mont = jax.jit(to_mont_impl, static_argnums=0)
from_mont = jax.jit(from_mont_impl, static_argnums=0)
inv = jax.jit(inv_impl, static_argnums=0)
pow_const = jax.jit(pow_const, static_argnums=(0, 2))
mont_sqr = jax.jit(mont_sqr, static_argnums=0)


def decode(arr, field: FieldSpec, mont: bool = True):
    """(..., 16) limb array -> nested list of canonical Python ints."""
    vals = limb_codec.limbs_to_ints(np.asarray(arr))
    p = field.modulus
    rinv = pow(1 << 256, -1, p)

    def fix(v):
        if isinstance(v, list):
            return [fix(x) for x in v]
        return (v * rinv) % p if mont else v % p

    return fix(vals)
