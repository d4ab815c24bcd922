"""Parity tests: the Pallas-fused limb-major point-add kernel vs refmath.

Runs on the CPU test mesh via pallas interpret mode (ops/curve_pallas.py
sets interpret=True when the backend is CPU), with a small lane block so
the padded interpret-mode arrays stay cheap. Covers the same general/edge
cases as tests/test_curve_jax.py plus its use as a segmented-scan combine
(the exact MSM integration point, ops/msm.py combine_for).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np

from circom_compat_tpu.refmath import curve as rc
from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import curve_pallas as cp

RNG = random.Random(0xFA11A5)

# Small lane block: interpret mode materializes full blocks on host.
_g1_add = cp.make_pallas_add(False, block=128)
_g2_add = cp.make_pallas_add(True, block=128)


def _rand_g1(n):
    return [rc.G1.mul(rc.g1_generator(), RNG.randrange(1, 1 << 60)) for _ in range(n)]


def _rand_g2(n):
    return [rc.G2.mul(rc.g2_generator(), RNG.randrange(1, 1 << 60)) for _ in range(n)]


def _g1_dev(points):
    xs, ys = cj.encode_g1_affine(points)
    return cj.affine_to_jacobian(cj.FQ_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))


def _g2_dev(points):
    xs, ys = cj.encode_g2_affine(points)
    return cj.affine_to_jacobian(cj.FQ2_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))


def test_g1_pallas_add_general_and_edges():
    pts = _rand_g1(6)
    p_list = pts[:3] + [None, pts[4], pts[4], pts[5]]
    q_list = pts[3:6] + [pts[3], None, rc.G1.neg(pts[4]), pts[5]]
    out = _g1_add(_g1_dev(p_list), _g1_dev(q_list))
    got = cj.decode_g1(out)
    want = [rc.G1.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g2_pallas_add_general_and_edges():
    pts = _rand_g2(4)
    p_list = [pts[0], pts[2], None, pts[3], pts[1]]
    q_list = [pts[1], rc.G2.neg(pts[2]), pts[0], pts[3], None]
    out = _g2_add(_g2_dev(p_list), _g2_dev(q_list))
    got = cj.decode_g2(out)
    want = [rc.G2.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g1_pallas_add_multidim_batch():
    """Combine is called with (T, K)-shaped leading dims inside the scans."""
    pts = _rand_g1(12)
    P = jax.tree_util.tree_map(lambda c: c.reshape(3, 2, 16), _g1_dev(pts[:6]))
    Q = jax.tree_util.tree_map(lambda c: c.reshape(3, 2, 16), _g1_dev(pts[6:]))
    out = _g1_add(P, Q)
    flat = jax.tree_util.tree_map(lambda c: c.reshape(6, 16), out)
    want = [rc.G1.add(a, b) for a, b in zip(pts[:6], pts[6:])]
    assert cj.decode_g1(flat) == want


def test_pallas_combine_in_segmented_reduce():
    from circom_compat_tpu.ops import segments

    pts = _rand_g1(8)
    keys = jnp.array([0, 0, 1, 3, 3, 3, 6, 6], dtype=jnp.int32)
    P = _g1_dev(pts)
    ident = tuple(jnp.asarray(c) for c in cj.identity_const(cj.FQ_ADAPTER))
    out = segments.reduce_by_sorted_key(_g1_add, P, keys, 8, ident)
    got = cj.decode_g1(out)
    want = []
    for seg in range(8):
        acc = None
        for k, p in zip(keys.tolist(), pts):
            if k == seg:
                acc = rc.G1.add(acc, p)
        want.append(acc)
    assert got == want


def test_msm_window_sums_pallas_matches_xla():
    """End-to-end MSM window sums with the Pallas combine forced on."""
    from circom_compat_tpu.ops import msm as msm_ops
    from circom_compat_tpu.ops import field_jax as fj

    n = 32
    pts = _rand_g1(n)
    scalars = [RNG.randrange(0, rc.R_SCALAR) for _ in range(n)]
    sc = jnp.asarray(fj.encode_plain(scalars, fj.FR))
    jac = _g1_dev(pts)
    ref = msm_ops.window_sums_impl(cj.FQ_ADAPTER, jac, sc, 8, use_pallas=False)
    got = msm_ops.window_sums_impl(cj.FQ_ADAPTER, jac, sc, 8, use_pallas=True)
    assert cj.decode_g1(got) == cj.decode_g1(ref)
