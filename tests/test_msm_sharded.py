"""Standalone mesh-sharded MSM (parallel/msm_sharded.py) vs host reference."""

import random


from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.parallel.mesh import make_mesh
from circom_compat_tpu.parallel.msm_sharded import msm_g1_sharded
from circom_compat_tpu.refmath import curve as rc

RNG = random.Random(0x5A)


def test_sharded_msm_matches_host():
    n = 37  # not a multiple of the mesh size: exercises infinity padding
    pts = [rc.G1.mul(rc.g1_generator(), RNG.randrange(1, 1 << 62)) for _ in range(n)]
    pts[4] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = 0
    mesh = make_mesh(8)
    got = msm_g1_sharded(cj.encode_g1_affine(pts), scalars, mesh)
    assert got == rc.G1.msm(pts, scalars)
