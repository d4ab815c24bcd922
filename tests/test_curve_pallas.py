"""Parity tests: the Pallas-fused limb-major point-add kernel vs refmath.

Runs on the CPU test mesh via pallas interpret mode (ops/curve_pallas.py
sets interpret=True when the backend is CPU), with a small lane block so
the padded interpret-mode arrays stay cheap. Covers the same general/edge
cases as tests/test_curve_jax.py plus its use as a segmented-scan combine
(the exact MSM integration point, ops/msm.py combine_for). The kernels
compute the RCB complete projective group law; points here are encoded
with affine_to_proj and decoded with decode_g*_proj.
"""

import pytest
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
    return cj.affine_to_proj(cj.FQ_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))


def _g2_dev(points):
    xs, ys = cj.encode_g2_affine(points)
    return cj.affine_to_proj(cj.FQ2_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))


def test_g1_pallas_add_general_and_edges():
    pts = _rand_g1(6)
    p_list = pts[:3] + [None, pts[4], pts[4], pts[5]]
    q_list = pts[3:6] + [pts[3], None, rc.G1.neg(pts[4]), pts[5]]
    out = _g1_add(_g1_dev(p_list), _g1_dev(q_list))
    got = cj.decode_g1_proj(out)
    want = [rc.G1.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want


@pytest.mark.slow
def test_g2_pallas_add_general_and_edges():
    pts = _rand_g2(4)
    p_list = [pts[0], pts[2], None, pts[3], pts[1]]
    q_list = [pts[1], rc.G2.neg(pts[2]), pts[0], pts[3], None]
    out = _g2_add(_g2_dev(p_list), _g2_dev(q_list))
    got = cj.decode_g2_proj(out)
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
    assert cj.decode_g1_proj(flat) == want


def test_pallas_combine_in_segmented_reduce():
    from circom_compat_tpu.ops import segments

    pts = _rand_g1(8)
    keys = jnp.array([0, 0, 1, 3, 3, 3, 6, 6], dtype=jnp.int32)
    P = _g1_dev(pts)
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(cj.FQ_ADAPTER))
    out = segments.reduce_by_sorted_key(_g1_add, P, keys, 8, ident)
    got = cj.decode_g1_proj(out)
    want = []
    for seg in range(8):
        acc = None
        for k, p in zip(keys.tolist(), pts):
            if k == seg:
                acc = rc.G1.add(acc, p)
        want.append(acc)
    assert got == want


def _expected_tile_scan(pts_list, flags, T, K, group):
    """Python-int reference of the within-tile segmented scan semantics."""
    out = []
    carry = []
    for t in range(T):
        acc = None
        row = []
        for k in range(K):
            v = pts_list[t * K + k]
            acc = v if flags[t * K + k] else group.add(acc, v)
            row.append(acc)
        out.append(row)
        carry.append(acc)
    return out, carry


def test_tile_scan_kernel_g1():
    """Direct parity of the fused Phase-A kernel (madd leaf) vs refmath:
    out[t,k] = inclusive within-tile segmented scan, carry[t] = tile total.
    Full-size integration runs on real TPU (scripts/bench_pallas_combine
    --stages check)."""
    T, K = 3, 16
    n = T * K
    pts = _rand_g1(n)
    flags = [(i % K == 0) or (i % 7 == 3) for i in range(n)]
    P = _g1_dev(pts)
    vt = jax.tree_util.tree_map(lambda c: c.reshape(T, K, 16), P)
    ft = jnp.asarray(np.array(flags).reshape(T, K))
    ts = cp.make_tile_scan(False, block=128, mixed=True)
    out, carry = ts(vt, ft)
    out_flat = jax.tree_util.tree_map(lambda c: c.reshape(T * K, 16), out)
    want_out, want_carry = _expected_tile_scan(pts, flags, T, K, rc.G1)
    assert cj.decode_g1_proj(out_flat) == [x for row in want_out for x in row]
    assert cj.decode_g1_proj(carry) == want_carry


def test_tile_scan_kernel_g1_general_projective():
    """General (non-madd) kernel with non-affine projective inputs (Z != 1):
    proj_add(p, p) yields a scaled representation of 2p."""
    T, K = 2, 8
    n = T * K
    pts = _rand_g1(n)
    flags = [i % K == 0 for i in range(n)]
    P1 = _g1_dev(pts)
    P2 = cj.proj_add(cj.FQ_ADAPTER, P1, P1)
    vt = jax.tree_util.tree_map(lambda c: c.reshape(T, K, 16), P2)
    ft = jnp.asarray(np.array(flags).reshape(T, K))
    ts = cp.make_tile_scan(False, block=128)
    out, carry = ts(vt, ft)
    doubled = [rc.G1.double(p) for p in pts]
    want_out, want_carry = _expected_tile_scan(doubled, flags, T, K, rc.G1)
    out_flat = jax.tree_util.tree_map(lambda c: c.reshape(T * K, 16), out)
    assert cj.decode_g1_proj(out_flat) == [x for row in want_out for x in row]
    assert cj.decode_g1_proj(carry) == want_carry


@pytest.mark.slow
def test_tile_scan_kernel_g2():
    T, K = 2, 8
    n = T * K
    pts = _rand_g2(n - 1) + [None]  # include infinity
    flags = [i % K == 0 for i in range(n)]
    P = _g2_dev(pts)
    vt = jax.tree_util.tree_map(lambda c: c.reshape(T, K, 2, 16), P)
    ft = jnp.asarray(np.array(flags).reshape(T, K))
    ts = cp.make_tile_scan(True, block=128, mixed=True)
    out, carry = ts(vt, ft)
    want_out, want_carry = _expected_tile_scan(pts, flags, T, K, rc.G2)
    out_flat = jax.tree_util.tree_map(lambda c: c.reshape(T * K, 2, 16), out)
    assert cj.decode_g2_proj(out_flat) == [x for row in want_out for x in row]
    assert cj.decode_g2_proj(carry) == want_carry
