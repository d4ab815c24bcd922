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
