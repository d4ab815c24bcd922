"""Vectorized BN254 G1/G2 group law on TPU (Jacobian coords, Montgomery Fq).

Replaces ark-ec/ark-bn254's curve arithmetic (reference: Cargo.toml:26-28;
G1Affine/G2Affine in src/zkey.rs:39-40). Points are pytrees
(X, Y, Z) of limb tensors:
  G1: each coord (..., 16)      — Fq limbs
  G2: each coord (..., 2, 16)   — Fq2 (c0, c1) limbs
Z == 0 encodes the point at infinity (matching the zkey all-zero-affine
convention, reference: src/zkey.rs:340-360, via affine_to_jacobian).

Branch-free: general add, doubling and the infinity/equal/negative cases
are all computed and combined with selects — the only control flow XLA
sees is straight-line vector code.

Ground truth: refmath/curve.py; parity tests in tests/test_curve_jax.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field_jax as fj

# ---------------------------------------------------------------------------
# Field adapters: uniform op table over Fq ((...,16)) and Fq2 ((...,2,16))
# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class FieldAdapter:
    name: str
    add: Callable
    sub: Callable
    mul: Callable
    sqr: Callable
    neg: Callable
    is_zero: Callable  # (...,coord) -> (...) bool
    eq: Callable
    select: Callable  # (mask (...), a, b) -> coord
    one: np.ndarray  # Montgomery one, coord-shaped
    zero: np.ndarray
    double: Callable  # x -> 2x (cheaper than mul by 2)
    # x -> 3b*x with b the curve constant of the group this field hosts
    # (G1/Fq: b=3 so 3b=9, an add chain; G2/Fq2: 3b' = 9/(9+u), a constant
    # mul). Used by the complete projective group law (proj_add/proj_madd).
    mul_b3: Callable = None


def _fq_double(a):
    return fj.add(fj.FQ, a, a)


def _fq_mul9(a):
    """9x = 8x + x via three doublings — 4 field adds, no multiply."""
    x2 = fj.add(fj.FQ, a, a)
    x4 = fj.add(fj.FQ, x2, x2)
    x8 = fj.add(fj.FQ, x4, x4)
    return fj.add(fj.FQ, x8, a)


FQ_ADAPTER = FieldAdapter(
    name="fq",
    add=lambda a, b: fj.add(fj.FQ, a, b),
    sub=lambda a, b: fj.sub(fj.FQ, a, b),
    mul=lambda a, b: fj.mont_mul(fj.FQ, a, b),
    sqr=lambda a: fj.mont_mul(fj.FQ, a, a),
    neg=lambda a: fj.neg(fj.FQ, a),
    is_zero=fj.is_zero,
    eq=fj.eq,
    select=fj.select,
    one=fj.FQ.one_mont,
    zero=fj.FQ.zero,
    double=_fq_double,
    mul_b3=_fq_mul9,
)


def _fq2_split(a):
    return a[..., 0, :], a[..., 1, :]


def _fq2_join(c0, c1):
    return jnp.stack([c0, c1], axis=-2)


def _fq2_add(a, b):
    return _fq2_join(*[fj.add(fj.FQ, x, y) for x, y in zip(_fq2_split(a), _fq2_split(b))])


def _fq2_sub(a, b):
    return _fq2_join(*[fj.sub(fj.FQ, x, y) for x, y in zip(_fq2_split(a), _fq2_split(b))])


def _fq2_neg(a):
    a0, a1 = _fq2_split(a)
    return _fq2_join(fj.neg(fj.FQ, a0), fj.neg(fj.FQ, a1))


def _fq2_mul(a, b):
    # Karatsuba over Fq[u]/(u^2+1): 3 base muls.
    a0, a1 = _fq2_split(a)
    b0, b1 = _fq2_split(b)
    v0 = fj.mont_mul(fj.FQ, a0, b0)
    v1 = fj.mont_mul(fj.FQ, a1, b1)
    s = fj.mont_mul(fj.FQ, fj.add(fj.FQ, a0, a1), fj.add(fj.FQ, b0, b1))
    c0 = fj.sub(fj.FQ, v0, v1)
    c1 = fj.sub(fj.FQ, fj.sub(fj.FQ, s, v0), v1)
    return _fq2_join(c0, c1)


def _fq2_sqr(a):
    # (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u — 2 base muls.
    a0, a1 = _fq2_split(a)
    c0 = fj.mont_mul(fj.FQ, fj.add(fj.FQ, a0, a1), fj.sub(fj.FQ, a0, a1))
    t = fj.mont_mul(fj.FQ, a0, a1)
    c1 = fj.add(fj.FQ, t, t)
    return _fq2_join(c0, c1)


def _fq2_is_zero(a):
    return jnp.all(a == 0, axis=(-1, -2))


def _fq2_eq(a, b):
    return jnp.all(a == b, axis=(-1, -2))


def _fq2_select(mask, a, b):
    return jnp.where(mask[..., None, None], a, b)


def _fq2_double(a):
    return _fq2_add(a, a)


def _b3_g2_mont() -> np.ndarray:
    """3*b' for the G2 twist y^2 = x^3 + 3/(9+u): 9/(9+u) = (81 - 9u)/82,
    Montgomery-encoded (2, 16) limbs."""
    from ..constants import Q as _Q
    from . import limbs as _lc

    inv82 = pow(82, -1, _Q)
    c0 = 81 * inv82 % _Q
    c1 = (-9 * inv82) % _Q
    return np.stack(
        [_lc.int_to_limbs((c0 << 256) % _Q), _lc.int_to_limbs((c1 << 256) % _Q)]
    )


B3_G2_MONT = _b3_g2_mont()


def _fq2_mul_b3(a):
    return _fq2_mul(a, jnp.asarray(B3_G2_MONT))


FQ2_ADAPTER = FieldAdapter(
    name="fq2",
    add=_fq2_add,
    sub=_fq2_sub,
    mul=_fq2_mul,
    sqr=_fq2_sqr,
    neg=_fq2_neg,
    is_zero=_fq2_is_zero,
    eq=_fq2_eq,
    select=_fq2_select,
    one=np.stack([fj.FQ.one_mont, fj.FQ.zero]),
    zero=np.stack([fj.FQ.zero, fj.FQ.zero]),
    double=_fq2_double,
    mul_b3=_fq2_mul_b3,
)


# ---------------------------------------------------------------------------
# Jacobian group law, generic over the coordinate field
# ---------------------------------------------------------------------------

Point = Tuple[Any, Any, Any]  # (X, Y, Z) coordinate pytree


def infinity(F: FieldAdapter, batch_shape=()):
    shape = batch_shape + np.asarray(F.one).shape
    z = jnp.zeros(shape, jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(F.one), shape).astype(jnp.uint32)
    return (one, one, z)


def identity_const(F: FieldAdapter):
    """Identity as numpy (for segment-reduce identities): (1, 1, 0) mont."""
    return (
        np.asarray(F.one, np.uint32),
        np.asarray(F.one, np.uint32),
        np.asarray(F.zero, np.uint32),
    )


def affine_to_jacobian(F: FieldAdapter, x, y, inf_mask=None):
    """Affine Montgomery coords -> Jacobian; all-zero (x,y) (or an explicit
    mask) maps to infinity (Z=0), matching the zkey encoding
    (reference: src/zkey.rs:340-360)."""
    if inf_mask is None:
        inf_mask = F.is_zero(x) & F.is_zero(y)
    one = jnp.broadcast_to(jnp.asarray(F.one), x.shape).astype(jnp.uint32)
    z = F.select(inf_mask, jnp.zeros_like(x), one)
    return (x, y, z)


def is_infinity(F: FieldAdapter, p: Point):
    return F.is_zero(p[2])


def double(F: FieldAdapter, p: Point) -> Point:
    """2P, Jacobian (dbl-2007-bl style, a=0). Handles Y=0 / Z=0 via Z3=0."""
    X, Y, Z = p
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    t = F.sqr(F.add(X, B))
    D = F.double(F.sub(F.sub(t, A), C))  # 2((X+B)^2 - A - C)
    E = F.add(F.double(A), A)  # 3A
    Fv = F.sqr(E)
    X3 = F.sub(Fv, F.double(D))
    eightC = F.double(F.double(F.double(C)))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), eightC)
    Z3 = F.double(F.mul(Y, Z))
    return (X3, Y3, Z3)


def add(F: FieldAdapter, p: Point, q: Point) -> Point:
    """P + Q, complete over all cases via selects (constant ~16 field muls).

    Cases: P=inf -> Q; Q=inf -> P; P==Q -> double; P==-Q -> inf; else the
    general Jacobian addition (add-2007-bl).
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q

    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    Rr = F.sub(S2, S1)

    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    X3 = F.sub(F.sub(F.sqr(Rr), HHH), F.double(V))
    Y3 = F.sub(F.mul(Rr, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(F.mul(Z1, Z2), H)
    gen = (X3, Y3, Z3)

    # call the un-jitted body: this function must stay lowerable inside
    # Pallas kernels (ops/curve_pallas.py), where a pjit primitive is not.
    dbl = double_impl(F, p)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(Rr)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

    def coord_select(idx):
        out = gen[idx]
        out = F.select(same, dbl[idx], out)
        out = F.select(q_inf, p[idx], out)
        out = F.select(p_inf, q[idx], out)
        if idx == 2:  # Z -> 0 for P == -Q
            out = F.select(opposite & ~p_inf & ~q_inf, jnp.zeros_like(out), out)
        return out

    return (coord_select(0), coord_select(1), coord_select(2))


def madd(F: FieldAdapter, p: Point, q: Point) -> Point:
    """P + Q where Q is affine-encoded: Z2 == one (or 0 for infinity).

    Mixed addition (madd-2007-bl): 8M+3S vs 11M+5S for the general add —
    used as the leaf combine of the MSM bucket scans, where the second
    operand is always an original query point (ops/segments.py Phase A).
    All edge cases handled branch-free exactly like `add`.
    """
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q

    Z1Z1 = F.sqr(Z1)
    U2 = F.mul(X2, Z1Z1)
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, X1)  # U1 = X1
    Rr = F.sub(S2, Y1)  # S1 = Y1

    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(X1, HH)
    X3 = F.sub(F.sub(F.sqr(Rr), HHH), F.double(V))
    Y3 = F.sub(F.mul(Rr, F.sub(V, X3)), F.mul(Y1, HHH))
    Z3 = F.mul(Z1, H)
    gen = (X3, Y3, Z3)

    dbl = double_impl(F, p)

    p_inf = F.is_zero(Z1)
    q_inf = F.is_zero(Z2)
    h_zero = F.is_zero(H)
    r_zero = F.is_zero(Rr)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

    def coord_select(idx):
        out = gen[idx]
        out = F.select(same, dbl[idx], out)
        out = F.select(q_inf, p[idx], out)
        out = F.select(p_inf, q[idx], out)
        if idx == 2:
            out = F.select(opposite & ~p_inf & ~q_inf, jnp.zeros_like(out), out)
        return out

    return (coord_select(0), coord_select(1), coord_select(2))


def neg(F: FieldAdapter, p: Point) -> Point:
    return (p[0], F.neg(p[1]), p[2])


# ---------------------------------------------------------------------------
# Complete homogeneous-projective group law (Renes-Costello-Batina 2015,
# algorithms 7/8 specialized to a = 0). Identity = (0, 1, 0).
#
# One straight-line formula covers EVERY case — doubling, identity operands,
# P + (-P) — with no comparisons or selects, unlike the branch-free Jacobian
# law above, and with no field squarings: 12M + 2 mul_b3 (add: alg 7) /
# 11M + 2 mul_b3 + one q-at-infinity select (madd: alg 8) vs the fused
# Jacobian add+double's 23 muls. This is the MSM scan combine (ops/msm.py);
# validated against refmath/curve.py on identity/double/inverse/projective-
# scaled inputs (tests/test_curve_jax.py).
# ---------------------------------------------------------------------------


def proj_identity_const(F: FieldAdapter):
    """(0, 1, 0), Montgomery-encoded numpy (for scan identities)."""
    return (
        np.asarray(F.zero, np.uint32),
        np.asarray(F.one, np.uint32),
        np.asarray(F.zero, np.uint32),
    )


def proj_infinity(F: FieldAdapter, batch_shape=()):
    shape = batch_shape + np.asarray(F.one).shape
    one = jnp.broadcast_to(jnp.asarray(F.one), shape).astype(jnp.uint32)
    z = jnp.zeros(shape, jnp.uint32)
    return (z, one, z)


def affine_to_proj(F: FieldAdapter, x, y, inf_mask=None):
    """Affine Montgomery coords -> homogeneous projective; all-zero (x, y)
    rows (zkey infinity convention, reference: src/zkey.rs:340-360) map to
    the RCB identity (0, 1, 0) — note Y must be 1, not 0."""
    if inf_mask is None:
        inf_mask = F.is_zero(x) & F.is_zero(y)
    one = jnp.broadcast_to(jnp.asarray(F.one), x.shape).astype(jnp.uint32)
    z = F.select(inf_mask, jnp.zeros_like(x), one)
    y = F.select(inf_mask, one, y)
    return (x, y, z)


def proj_add(F: FieldAdapter, p: Point, q: Point) -> Point:
    """P + Q, complete for all projective inputs (RCB alg 7, a = 0)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
    t4 = F.sub(t4, F.add(t1, t2))
    Y3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
    Y3 = F.sub(Y3, F.add(t0, t2))
    t0 = F.add(F.double(t0), t0)  # 3*X1*X2
    t2 = F.mul_b3(t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(Y3)
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
    Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
    return (X3, Y3, Z3)


def proj_madd(F: FieldAdapter, p: Point, q: Point) -> Point:
    """P + Q with Q affine-encoded (Z2 == one, or identity): RCB alg 8
    (complete for any projective P) plus one select for Q at infinity."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t3 = F.mul(F.add(X2, Y2), F.add(X1, Y1))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.add(F.mul(Y2, Z1), Y1)
    Y3 = F.add(F.mul(X2, Z1), X1)
    t0 = F.add(F.double(t0), t0)  # 3*X1*X2
    t2 = F.mul_b3(Z1)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(Y3)
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
    Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
    q_inf = F.is_zero(Z2)
    return tuple(F.select(q_inf, a, b) for a, b in zip(p, (X3, Y3, Z3)))


def decode_g1_proj(point: Point):
    """Projective G1 device points -> canonical affine (x, y) ints or None.
    Host-side exact math (final MSM outputs only)."""
    from ..constants import Q
    from . import limbs as limb_codec

    X, Y, Z = [np.asarray(c).reshape(-1, 16) for c in point]
    rinv = pow(1 << 256, -1, Q)
    out = []
    for xi, yi, zi in zip(X, Y, Z):
        x = limb_codec.limbs_to_int(xi) * rinv % Q
        y = limb_codec.limbs_to_int(yi) * rinv % Q
        z = limb_codec.limbs_to_int(zi) * rinv % Q
        if z == 0:
            out.append(None)
            continue
        zinv = pow(z, -1, Q)
        out.append((x * zinv % Q, y * zinv % Q))
    return out


def decode_g2_proj(point: Point):
    from ..constants import Q
    from . import limbs as limb_codec
    from ..refmath import field as rf

    X, Y, Z = [np.asarray(c).reshape(-1, 2, 16) for c in point]
    rinv = pow(1 << 256, -1, Q)

    def dec(c):
        return (
            limb_codec.limbs_to_int(c[0]) * rinv % Q,
            limb_codec.limbs_to_int(c[1]) * rinv % Q,
        )

    out = []
    for xi, yi, zi in zip(X, Y, Z):
        x, y, z = dec(xi), dec(yi), dec(zi)
        if z == (0, 0):
            out.append(None)
            continue
        zinv = rf.fq2_inv(z)
        out.append((rf.fq2_mul(x, zinv), rf.fq2_mul(y, zinv)))
    return out


def scalar_mul_const(F: FieldAdapter, p: Point, k: int) -> Point:
    """Batched p*k for a static Python-int scalar shared by the whole batch.

    MSB-first double-and-add via lax.scan over the (static) bit string, so
    the compiled graph holds one double + one add body regardless of
    k.bit_length() — the device path for ceremony-contribution rescaling of
    the L/H query sections (circom/contribute.py), where every point is
    multiplied by the same delta^-1.
    """
    if k == 0:
        return infinity(F, p[0].shape[: p[0].ndim - np.asarray(F.one).ndim])
    bits = np.array([int(c) for c in bin(k)[2:]], dtype=np.int32)

    def body(acc, bit):
        acc = double_impl(F, acc)
        added = add_impl(F, acc, p)
        acc = tuple(
            F.select(jnp.broadcast_to(bit != 0, is_infinity(F, acc).shape), a, b)
            for a, b in zip(added, acc)
        )
        return acc, None

    init = infinity(F, p[0].shape[: p[0].ndim - np.asarray(F.one).ndim])
    out, _ = jax.lax.scan(body, init, jnp.asarray(bits))
    return out


def scalar_mul(F: FieldAdapter, p: Point, k: int) -> Point:
    """Double-and-add by a static Python-int scalar (host-side small uses)."""
    one = jnp.broadcast_to(jnp.asarray(F.one), p[0].shape).astype(jnp.uint32)
    acc = (one, one, jnp.zeros_like(p[0]))
    addend = p
    while k:
        if k & 1:
            acc = add(F, acc, addend)
        addend = double(F, addend)
        k >>= 1
    return acc


# jit public group-law entry points (adapter static; cached per shape)
add_impl, double_impl, madd_impl = add, double, madd
add = jax.jit(add_impl, static_argnums=0)
double = jax.jit(double_impl, static_argnums=0)
madd = jax.jit(madd_impl, static_argnums=0)
proj_add_impl, proj_madd_impl = proj_add, proj_madd
proj_add = jax.jit(proj_add_impl, static_argnums=0)
proj_madd = jax.jit(proj_madd_impl, static_argnums=0)


# ---------------------------------------------------------------------------
# Host codecs (decode device Jacobian -> canonical affine ints)
# ---------------------------------------------------------------------------


def decode_g1(point: Point):
    """Single (unbatched or batch-1) Jacobian G1 point -> affine (x, y) ints
    or None. Host-side exact arithmetic (tiny: used on final MSM outputs)."""
    from ..constants import Q
    from . import limbs as limb_codec

    X, Y, Z = [np.asarray(c).reshape(-1, 16) for c in point]
    out = []
    rinv = pow(1 << 256, -1, Q)
    for xi, yi, zi in zip(X, Y, Z):
        x = limb_codec.limbs_to_int(xi) * rinv % Q
        y = limb_codec.limbs_to_int(yi) * rinv % Q
        z = limb_codec.limbs_to_int(zi) * rinv % Q
        if z == 0:
            out.append(None)
            continue
        zinv = pow(z, -1, Q)
        zinv2 = zinv * zinv % Q
        out.append((x * zinv2 % Q, y * zinv2 * zinv % Q))
    return out


def decode_g2(point: Point):
    from ..constants import Q
    from . import limbs as limb_codec

    X, Y, Z = [np.asarray(c).reshape(-1, 2, 16) for c in point]
    rinv = pow(1 << 256, -1, Q)

    def dec(c):
        return (
            limb_codec.limbs_to_int(c[0]) * rinv % Q,
            limb_codec.limbs_to_int(c[1]) * rinv % Q,
        )

    from ..refmath import field as rf

    out = []
    for xi, yi, zi in zip(X, Y, Z):
        x, y, z = dec(xi), dec(yi), dec(zi)
        if z == (0, 0):
            out.append(None)
            continue
        zinv = rf.fq2_inv(z)
        zinv2 = rf.fq2_square(zinv)
        out.append(
            (rf.fq2_mul(x, zinv2), rf.fq2_mul(y, rf.fq2_mul(zinv2, zinv)))
        )
    return out


def encode_g1_affine(points) -> Tuple[np.ndarray, np.ndarray]:
    """Canonical affine G1 [(x,y) | None] -> Montgomery (N,16) x/y arrays
    with all-zero rows for infinity (zkey convention)."""
    from ..constants import Q

    n = len(points)
    xs = np.zeros((n, 16), np.uint32)
    ys = np.zeros((n, 16), np.uint32)
    from . import limbs as limb_codec

    for i, pt in enumerate(points):
        if pt is None:
            continue
        xs[i] = limb_codec.int_to_limbs((pt[0] << 256) % Q)
        ys[i] = limb_codec.int_to_limbs((pt[1] << 256) % Q)
    return xs, ys


def encode_g2_affine(points) -> Tuple[np.ndarray, np.ndarray]:
    from ..constants import Q
    from . import limbs as limb_codec

    n = len(points)
    xs = np.zeros((n, 2, 16), np.uint32)
    ys = np.zeros((n, 2, 16), np.uint32)
    for i, pt in enumerate(points):
        if pt is None:
            continue
        (x0, x1), (y0, y1) = pt
        xs[i, 0] = limb_codec.int_to_limbs((x0 << 256) % Q)
        xs[i, 1] = limb_codec.int_to_limbs((x1 << 256) % Q)
        ys[i, 0] = limb_codec.int_to_limbs((y0 << 256) % Q)
        ys[i, 1] = limb_codec.int_to_limbs((y1 << 256) % Q)
    return xs, ys
