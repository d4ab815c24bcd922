"""Parity tests: ops/curve_jax.py Jacobian group law vs refmath/curve.py."""

import random
from functools import partial

import jax
import jax.numpy as jnp

from circom_compat_tpu.refmath import curve as rc
from circom_compat_tpu.ops import curve_jax as cj

RNG = random.Random(0xEC)

# Eager dispatch of limb arithmetic is orders of magnitude slower than the
# compiled path; always exercise the group law under jit.
_jadd = jax.jit(cj.add, static_argnums=0)
_jdouble = jax.jit(cj.double, static_argnums=0)


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


def test_g1_add_general_and_edges():
    pts = _rand_g1(6)
    p_list = pts[:3] + [None, pts[4], pts[4]]
    q_list = pts[3:6] + [pts[3], None, rc.G1.neg(pts[4])]
    # also P == Q (doubling through add)
    p_list.append(pts[5])
    q_list.append(pts[5])

    P = _g1_dev(p_list)
    Q = _g1_dev(q_list)
    out = _jadd(cj.FQ_ADAPTER, P, Q)
    got = cj.decode_g1(out)
    want = [rc.G1.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g1_madd_general_and_edges():
    """Mixed add: q affine-encoded (Z in {0, one}); all edge cases."""
    _jmadd = jax.jit(cj.madd, static_argnums=0)
    pts = _rand_g1(6)
    # p is doubled on device first so it is genuinely Jacobian (Z != 1);
    # q stays affine. Edges: p=inf, q=inf, same (2p == q), opposite.
    p_list = pts[:3] + [None, pts[4], pts[4], pts[5]]
    q_list = pts[3:6] + [
        pts[3], None, rc.G1.neg(rc.G1.double(pts[4])), rc.G1.double(pts[5]),
    ]
    P2 = _jdouble(cj.FQ_ADAPTER, _g1_dev(p_list))
    got = cj.decode_g1(_jmadd(cj.FQ_ADAPTER, P2, _g1_dev(q_list)))
    want = [rc.G1.add(rc.G1.double(a), b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g2_madd():
    _jmadd = jax.jit(cj.madd, static_argnums=0)
    pts = _rand_g2(4)
    p_list = [pts[0], pts[2], None, pts[3]]
    q_list = [pts[1], rc.G2.neg(pts[2]), pts[0], pts[3]]
    P2 = _jdouble(cj.FQ2_ADAPTER, _g2_dev(p_list))
    got = cj.decode_g2(_jmadd(cj.FQ2_ADAPTER, P2, _g2_dev(q_list)))
    want = [rc.G2.add(rc.G2.double(a), b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g1_double():
    pts = _rand_g1(4) + [None]
    P = _g1_dev(pts)
    got = cj.decode_g1(_jdouble(cj.FQ_ADAPTER, P))
    assert got == [rc.G1.double(p) for p in pts]


def test_g1_scalar_mul():
    pts = _rand_g1(3)
    P = _g1_dev(pts)
    k = 0x2B7  # small: scalar_mul unrolls k.bit_length() point ops
    got = cj.decode_g1(jax.jit(partial(cj.scalar_mul, cj.FQ_ADAPTER, k=k))(P))
    assert got == [rc.G1.mul(p, k) for p in pts]


def test_g2_add_and_double():
    pts = _rand_g2(4)
    p_list = [pts[0], pts[2], None, pts[3]]
    q_list = [pts[1], rc.G2.neg(pts[2]), pts[0], pts[3]]
    P = _g2_dev(p_list)
    Q = _g2_dev(q_list)
    got = cj.decode_g2(_jadd(cj.FQ2_ADAPTER, P, Q))
    want = [rc.G2.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want

    got_d = cj.decode_g2(_jdouble(cj.FQ2_ADAPTER, P))
    assert got_d == [rc.G2.double(p) for p in p_list]


def test_segmented_point_reduce():
    """MSM building block: reduce_by_sorted_key with Jacobian adds."""
    from circom_compat_tpu.ops import segments

    pts = _rand_g1(8)
    keys = jnp.array([0, 0, 1, 3, 3, 3, 6, 6], dtype=jnp.int32)
    P = _g1_dev(pts)
    ident = tuple(jnp.asarray(c) for c in cj.identity_const(cj.FQ_ADAPTER))
    reduce_fn = jax.jit(
        lambda pts, ks: segments.reduce_by_sorted_key(
            lambda a, b: cj.add(cj.FQ_ADAPTER, a, b), pts, ks, 8, ident
        )
    )
    out = reduce_fn(P, keys)
    got = cj.decode_g1(out)
    want = []
    for seg in range(8):
        acc = None
        for k, p in zip(keys.tolist(), pts):
            if k == seg:
                acc = rc.G1.add(acc, p)
        want.append(acc)
    assert got == want


# ---------------------------------------------------------------------------
# RCB complete projective law (proj_add / proj_madd) — the MSM combine
# ---------------------------------------------------------------------------


def _g1_proj(points):
    xs, ys = cj.encode_g1_affine(points)
    return cj.affine_to_proj(cj.FQ_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))


def _g2_proj(points):
    xs, ys = cj.encode_g2_affine(points)
    return cj.affine_to_proj(cj.FQ2_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))


def test_g1_proj_add_general_and_edges():
    pts = _rand_g1(6)
    # general, identity operands, doubling, inverse — one formula for all
    p_list = pts[:3] + [None, pts[4], pts[4], pts[5], None]
    q_list = pts[3:6] + [pts[3], None, rc.G1.neg(pts[4]), pts[5], None]
    out = cj.proj_add(cj.FQ_ADAPTER, _g1_proj(p_list), _g1_proj(q_list))
    got = cj.decode_g1_proj(out)
    want = [rc.G1.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g1_proj_add_scaled_representations():
    """Inputs with Z != 1 (sums of sums) still decode to the right points."""
    pts = _rand_g1(4)
    P = cj.proj_add(cj.FQ_ADAPTER, _g1_proj(pts[:2]), _g1_proj(pts[2:]))
    # (p0+p2) + (p1+p3), both operands projective-scaled
    out = cj.proj_add(
        cj.FQ_ADAPTER,
        jax.tree_util.tree_map(lambda c: c[:1], P),
        jax.tree_util.tree_map(lambda c: c[1:], P),
    )
    want = [rc.G1.add(rc.G1.add(pts[0], pts[2]), rc.G1.add(pts[1], pts[3]))]
    assert cj.decode_g1_proj(out) == want


def test_g1_proj_madd_edges():
    pts = _rand_g1(5)
    # acc is projective-scaled (via proj_add with itself); q stays affine
    p_list = [pts[0], pts[1], None, pts[2], pts[3]]
    q_list = [pts[1], rc.G1.neg(pts[1]), pts[4], None, pts[3]]
    acc = cj.proj_add(cj.FQ_ADAPTER, _g1_proj(p_list), _g1_proj([None] * 5))
    out = cj.proj_madd(cj.FQ_ADAPTER, acc, _g1_proj(q_list))
    got = cj.decode_g1_proj(out)
    want = [rc.G1.add(a, b) for a, b in zip(p_list, q_list)]
    assert got == want


def test_g2_proj_add_and_madd():
    pts = _rand_g2(4)
    p_list = [pts[0], pts[2], None, pts[3], pts[1]]
    q_list = [pts[1], rc.G2.neg(pts[2]), pts[0], pts[3], None]
    out = cj.proj_add(cj.FQ2_ADAPTER, _g2_proj(p_list), _g2_proj(q_list))
    want = [rc.G2.add(a, b) for a, b in zip(p_list, q_list)]
    assert cj.decode_g2_proj(out) == want
    out = cj.proj_madd(cj.FQ2_ADAPTER, _g2_proj(p_list), _g2_proj(q_list))
    assert cj.decode_g2_proj(out) == want
