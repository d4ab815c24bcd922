"""Host-side reference elliptic-curve arithmetic for BN254 G1 and G2.

Ground truth for the TPU curve kernels (ops/curve_jax.py) and the host path
for final proof assembly. Replaces the reference's use of ark-ec/ark-bn254
(reference: Cargo.toml:26-28; G1Affine/G2Affine in src/zkey.rs:39).

Points are affine tuples; None is the point at infinity:
  G1: (x, y) with ints mod Q
  G2: ((x0, x1), (y0, y1)) with Fq2 coefficient tuples
"""

from __future__ import annotations

from ..constants import Q, R_SCALAR, B_G1, B_G2, G1_GEN, G2_GEN
from . import field as F


class _CurveOps:
    """Affine short-Weierstrass group law generic over the coefficient field."""

    def __init__(self, add, sub, mul, neg, inv, sq, zero, one, b, is_zero):
        self.fadd, self.fsub, self.fmul, self.fneg = add, sub, mul, neg
        self.finv, self.fsq = inv, sq
        self.zero, self.one, self.b = zero, one, b
        self.fis_zero = is_zero

    def is_on_curve(self, p) -> bool:
        if p is None:
            return True
        x, y = p
        lhs = self.fsq(y)
        rhs = self.fadd(self.fmul(self.fsq(x), x), self.b)
        return lhs == rhs

    def neg(self, p):
        if p is None:
            return None
        return (p[0], self.fneg(p[1]))

    def add(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        if x1 == x2:
            if y1 == y2:
                return self.double(p1)
            return None
        m = self.fmul(self.fsub(y2, y1), self.finv(self.fsub(x2, x1)))
        x3 = self.fsub(self.fsub(self.fsq(m), x1), x2)
        y3 = self.fsub(self.fmul(m, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def double(self, p):
        if p is None:
            return None
        x, y = p
        if self.fis_zero(y):
            return None
        m = self.fmul(
            self.fadd(self.fadd(self.fsq(x), self.fsq(x)), self.fsq(x)),
            self.finv(self.fadd(y, y)),
        )
        x3 = self.fsub(self.fsq(m), self.fadd(x, x))
        y3 = self.fsub(self.fmul(m, self.fsub(x, x3)), y)
        return (x3, y3)

    def mul(self, p, k: int):
        k %= R_SCALAR
        result = None
        addend = p
        while k:
            if k & 1:
                result = self.add(result, addend)
            addend = self.double(addend)
            k >>= 1
        return result

    def msm(self, points, scalars):
        """Naive multi-scalar multiplication (reference only; device MSM in ops/msm.py)."""
        acc = None
        for p, s in zip(points, scalars):
            if s % R_SCALAR == 0 or p is None:
                continue
            acc = self.add(acc, self.mul(p, s))
        return acc


def _fq_add(a, b):
    return (a + b) % Q


def _fq_sub(a, b):
    return (a - b) % Q


def _fq_mul(a, b):
    return (a * b) % Q


def _fq_neg(a):
    return (-a) % Q


def _fq_sq(a):
    return (a * a) % Q


G1 = _CurveOps(
    _fq_add, _fq_sub, _fq_mul, _fq_neg, F.fq_inv, _fq_sq,
    0, 1, B_G1, lambda a: a == 0,
)

G2 = _CurveOps(
    F.fq2_add, F.fq2_sub, F.fq2_mul, F.fq2_neg, F.fq2_inv, F.fq2_square,
    F.FQ2_ZERO, F.FQ2_ONE, B_G2, F.fq2_is_zero,
)

# Subgroup check for G2 requires multiplying by the group order; G1 points on
# the curve are automatically in the subgroup (cofactor 1 for BN254 G1).


def g1_generator():
    return G1_GEN


def g2_generator():
    return G2_GEN


def g1_in_correct_subgroup(p) -> bool:
    return G1.is_on_curve(p)


def g2_in_correct_subgroup(p) -> bool:
    return G2.is_on_curve(p) and G2.mul(p, R_SCALAR) is None
