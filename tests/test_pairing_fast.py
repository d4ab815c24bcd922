"""Decomposed final exponentiation must equal the naive (q^12-1)/r pow
on arbitrary FQ12 values, and the Frobenius linear map must equal f**q."""

import random

import pytest

from circom_compat_tpu.constants import Q
from circom_compat_tpu.refmath.field import FQ12
from circom_compat_tpu.refmath.pairing import (
    final_exponentiate,
    final_exponentiate_naive,
    frobenius,
    pairing,
)


def _rand_fq12(rng):
    return FQ12([rng.randrange(Q) for _ in range(12)])


def test_frobenius_matches_pow():
    rng = random.Random(11)
    f = _rand_fq12(rng)
    assert frobenius(f, 1) == f**Q
    assert frobenius(f, 2) == (f**Q) ** Q


def test_final_exp_matches_naive():
    rng = random.Random(12)
    for _ in range(2):
        f = _rand_fq12(rng)
        assert final_exponentiate(f) == final_exponentiate_naive(f)


@pytest.mark.slow
def test_final_exp_matches_naive_more():
    rng = random.Random(13)
    for _ in range(6):
        f = _rand_fq12(rng)
        assert final_exponentiate(f) == final_exponentiate_naive(f)


def test_pairing_bilinearity_still_holds():
    from circom_compat_tpu.refmath import curve as rc

    g1, g2 = rc.g1_generator(), rc.g2_generator()
    assert pairing(rc.G2.mul(g2, 7), g1) == pairing(g2, rc.G1.mul(g1, 7))


def test_miller_fq2_matches_twisted_fq12_loop():
    import random

    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.refmath import curve as rc
    from circom_compat_tpu.refmath.pairing import (
        cast_g1,
        miller_loop,
        miller_loop_fq2,
        twist,
    )

    rng = random.Random(21)
    g1, g2 = rc.g1_generator(), rc.g2_generator()
    for _ in range(2):
        P = rc.G1.mul(g1, rng.randrange(1, R_SCALAR))
        Q2 = rc.G2.mul(g2, rng.randrange(1, R_SCALAR))
        assert miller_loop_fq2(Q2, P) == miller_loop(twist(Q2), cast_g1(P))
