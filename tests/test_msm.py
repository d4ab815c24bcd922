"""MSM parity tests: device Pippenger vs refmath naive MSM."""

import random

from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import msm as msm_ops
from circom_compat_tpu.refmath import curve as rc

RNG = random.Random(0x4D534D)


def _rand_g1(n):
    pts = [rc.G1.mul(rc.g1_generator(), RNG.randrange(1, 1 << 62)) for _ in range(n)]
    return pts


def test_msm_g1_matches_reference():
    n = 37  # odd size, hits empty buckets + duplicate digits
    pts = _rand_g1(n)
    pts[5] = None  # infinity in the base set (zkey all-zero rows)
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R_SCALAR - 1

    got = msm_ops.msm_g1(cj.encode_g1_affine(pts), scalars)
    want = rc.G1.msm(pts, scalars)
    assert got == want


def test_msm_g1_window_bits_invariance():
    n = 16
    pts = _rand_g1(n)
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    enc = cj.encode_g1_affine(pts)
    # 6-bit windows straddle 16-bit limb boundaries; 8-bit never do.
    assert msm_ops.msm_g1(enc, scalars, window_bits=8) == msm_ops.msm_g1(
        enc, scalars, window_bits=6
    )


def test_msm_g2_matches_reference():
    n = 9
    pts = [rc.G2.mul(rc.g2_generator(), RNG.randrange(1, 1 << 62)) for _ in range(n)]
    pts[3] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    got = msm_ops.msm_g2(cj.encode_g2_affine(pts), scalars)
    want = rc.G2.msm(pts, scalars)
    assert got == want
