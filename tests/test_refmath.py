"""refmath ground-truth tests: field towers, curve law, pairing bilinearity,
NTT correctness, and the pinned Fr root-of-unity convention."""

import random

import pytest

from circom_compat_tpu.constants import (
    Q,
    R_SCALAR,
    TWO_ADIC_ROOT_OF_UNITY,
    fr_root_of_unity,
    G1_GEN,
    G2_GEN,
)
from circom_compat_tpu.refmath import curve, pairing, poly
from circom_compat_tpu.refmath.field import FQ12, fq2_inv, fq2_mul, FQ2_ONE

rng = random.Random(1234)


def test_two_adic_root():
    # Pinned: 5^((r-1)/2^28) — matches both arkworks ark-bn254 Fr
    # TWO_ADIC_ROOT_OF_UNITY and snarkjs/ffjavascript's w28.
    assert pow(TWO_ADIC_ROOT_OF_UNITY, 2**28, R_SCALAR) == 1
    assert pow(TWO_ADIC_ROOT_OF_UNITY, 2**27, R_SCALAR) == R_SCALAR - 1
    assert (
        TWO_ADIC_ROOT_OF_UNITY
        == 19103219067921713944291392827692070036145651957329286315305642004821462161904
    )


def test_domain_roots():
    for log_n in (1, 2, 5, 10):
        w = fr_root_of_unity(1 << log_n)
        assert pow(w, 1 << log_n, R_SCALAR) == 1
        assert pow(w, 1 << (log_n - 1), R_SCALAR) == R_SCALAR - 1


def test_fq2():
    for _ in range(20):
        a = (rng.randrange(Q), rng.randrange(Q))
        assert fq2_mul(a, fq2_inv(a)) == FQ2_ONE


def test_fq12_inverse():
    for _ in range(5):
        a = FQ12([rng.randrange(Q) for _ in range(12)])
        assert a * a.inv() == FQ12.one()


def test_g1_group_law():
    g = G1_GEN
    g2 = curve.G1.double(g)
    g3a = curve.G1.add(g2, g)
    g3b = curve.G1.add(g, g2)
    assert g3a == g3b
    assert curve.G1.is_on_curve(g3a)
    assert curve.G1.add(g, curve.G1.neg(g)) is None
    assert curve.G1.mul(g, R_SCALAR) is None  # order r


def test_g2_group_law():
    g = G2_GEN
    assert curve.G2.is_on_curve(g)
    assert curve.G2.mul(g, R_SCALAR) is None
    d = curve.G2.double(g)
    assert curve.G2.is_on_curve(d)


def test_scalar_mul_linearity():
    g = G1_GEN
    a, b = rng.randrange(R_SCALAR), rng.randrange(R_SCALAR)
    lhs = curve.G1.mul(g, (a + b) % R_SCALAR)
    rhs = curve.G1.add(curve.G1.mul(g, a), curve.G1.mul(g, b))
    assert lhs == rhs


def test_msm_matches_naive():
    pts = [curve.G1.mul(G1_GEN, rng.randrange(1, 1000)) for _ in range(8)]
    scalars = [rng.randrange(R_SCALAR) for _ in range(8)]
    acc = None
    for p, s in zip(pts, scalars):
        acc = curve.G1.add(acc, curve.G1.mul(p, s))
    assert curve.G1.msm(pts, scalars) == acc


@pytest.mark.slow
def test_pairing_bilinearity():
    a, b = 6, 11
    p_a = curve.G1.mul(G1_GEN, a)
    q_b = curve.G2.mul(G2_GEN, b)
    e_ab = pairing.pairing(q_b, p_a)
    e_base = pairing.pairing(G2_GEN, G1_GEN)
    assert e_ab == e_base ** (a * b)
    assert e_base ** R_SCALAR == FQ12.one()


def test_ntt_roundtrip():
    n = 16
    coeffs = [rng.randrange(R_SCALAR) for _ in range(n)]
    assert poly.ifft(poly.fft(coeffs)) == coeffs


def test_ntt_is_evaluation():
    n = 8
    coeffs = [rng.randrange(R_SCALAR) for _ in range(n)]
    evals = poly.fft(coeffs)
    w = fr_root_of_unity(n)
    for i in range(n):
        assert evals[i] == poly.evaluate_poly(coeffs, pow(w, i, R_SCALAR))
