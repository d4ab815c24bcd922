"""Parity tests: native C++ host field ops (native/field_ops.cpp) vs the
numpy fallback and exact Python-int arithmetic.

The native strip replicates the reference's one-time Montgomery reduction
of zkey section-4 Fr coefficients (reference: src/zkey.rs:320-325)."""

import random

import numpy as np
import pytest

from circom_compat_tpu.constants import NPRIME_Q, NPRIME_R, Q, R_SCALAR
from circom_compat_tpu.ops import limbs as lc
from circom_compat_tpu.ops import native_field


pytestmark = pytest.mark.skipif(
    not native_field.available(), reason="native field lib unavailable"
)


@pytest.mark.parametrize("p,nprime", [(R_SCALAR, NPRIME_R), (Q, NPRIME_Q)])
def test_mont_strip_matches_numpy_and_exact(p, nprime):
    rng = random.Random(11)
    vals = (
        [rng.randrange(p) for _ in range(257)]
        + [0, 1, p - 1, p - 2]
        + [rng.randrange(1 << 256) for _ in range(64)]  # unreduced inputs
    )
    arr = lc.ints_to_limbs(vals, dtype=np.uint16)
    native = native_field.mont_strip(arr, p)
    fallback = lc.mont_strip_np(arr, p, nprime)
    assert np.array_equal(native, fallback)

    rinv = pow(1 << 256, -1, p)
    for v, row in zip(vals, native):
        assert lc.limbs_to_int(row) == v * rinv % p


def test_mont_mul_const_exact():
    rng = random.Random(12)
    c = rng.randrange(R_SCALAR)
    vals = [rng.randrange(R_SCALAR) for _ in range(129)] + [0, 1, R_SCALAR - 1]
    arr = lc.ints_to_limbs(vals, dtype=np.uint16)
    out = native_field.mont_mul_const(arr, c, R_SCALAR)
    rinv = pow(1 << 256, -1, R_SCALAR)
    for v, row in zip(vals, out):
        assert lc.limbs_to_int(row) == v * c * rinv % R_SCALAR


def test_dispatcher_prefers_native_and_falls_back(monkeypatch):
    rng = random.Random(13)
    vals = [rng.randrange(R_SCALAR) for _ in range(33)]
    arr = lc.ints_to_limbs(vals, dtype=np.uint16)
    via_dispatch = lc.mont_strip(arr, R_SCALAR, NPRIME_R)
    monkeypatch.setenv("CIRCOM_TPU_NATIVE", "0")
    via_numpy = lc.mont_strip(arr, R_SCALAR, NPRIME_R)
    assert np.array_equal(via_dispatch, via_numpy)


def test_native_msm_window_sums_parity():
    """Native Pippenger (field_ops.cpp msm_g1_window_sums, the bench.py CPU
    baseline) vs the exact-int refmath MSM, incl. infinity rows and zero
    scalars."""
    import random

    import numpy as np

    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.ops import curve_jax as cj
    from circom_compat_tpu.ops import native_field as nf
    from circom_compat_tpu.refmath import curve as rc

    if not nf.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = random.Random(99)
    n = 512
    base = rc.g1_generator()
    pts = [rc.G1.mul(base, rng.randrange(1, 1 << 60)) for _ in range(n)]
    xs, ys = cj.encode_g1_affine(pts)
    xs = np.asarray(xs, np.uint16)
    ys = np.asarray(ys, np.uint16)
    xs[3] = 0
    ys[3] = 0  # infinity row (zkey convention)
    scalars = [rng.randrange(R_SCALAR) for _ in range(n)]
    scalars[7] = 0

    for wb in (8, 13):
        got = nf.msm_g1_native((xs, ys), scalars, window_bits=wb)
        want = None
        for i, (p, s) in enumerate(zip(pts, scalars)):
            if i == 3:
                continue
            want = rc.G1.add(want, rc.G1.mul(p, s))
        assert got == want
