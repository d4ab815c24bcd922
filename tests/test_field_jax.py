"""Parity tests: ops/field_jax.py vs refmath (plain Python ints)."""

import random

import jax
import numpy as np
import pytest

from circom_compat_tpu.constants import Q, R_SCALAR
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.ops import limbs as limb_codec

RNG = random.Random(0xC1BC0)


def _rand_elems(p, n):
    vals = [RNG.randrange(p) for _ in range(n)]
    # Sprinkle edge cases.
    vals[:4] = [0, 1, p - 1, p // 2]
    return vals


def _to_mont_host(vals, p):
    return [(v << 256) % p for v in vals]


CASES = [(fj.FQ, Q), (fj.FR, R_SCALAR)]


@pytest.mark.parametrize("field,p", CASES, ids=["fq", "fr"])
def test_add_sub_neg(field, p):
    n = 64
    a = _rand_elems(p, n)
    b = _rand_elems(p, n)
    da = fj.encode_plain(a)
    db = fj.encode_plain(b)
    got_add = fj.decode(jax.jit(fj.add, static_argnums=0)(field, da, db), field, mont=False)
    got_sub = fj.decode(jax.jit(fj.sub, static_argnums=0)(field, da, db), field, mont=False)
    got_neg = fj.decode(jax.jit(fj.neg, static_argnums=0)(field, da), field, mont=False)
    assert got_add == [(x + y) % p for x, y in zip(a, b)]
    assert got_sub == [(x - y) % p for x, y in zip(a, b)]
    assert got_neg == [(-x) % p for x in a]


@pytest.mark.parametrize("field,p", CASES, ids=["fq", "fr"])
def test_mont_mul(field, p):
    n = 64
    a = _rand_elems(p, n)
    b = list(reversed(_rand_elems(p, n)))
    da = fj.encode_mont(a, field)
    db = fj.encode_mont(b, field)
    got = fj.decode(jax.jit(fj.mont_mul, static_argnums=0)(field, da, db), field)
    assert got == [x * y % p for x, y in zip(a, b)]


@pytest.mark.parametrize("field,p", CASES, ids=["fq", "fr"])
def test_mont_roundtrip(field, p):
    vals = _rand_elems(p, 32)
    d = fj.encode_plain(vals)
    m = jax.jit(fj.to_mont, static_argnums=0)(field, d)
    assert fj.decode(m, field) == vals
    back = jax.jit(fj.from_mont, static_argnums=0)(field, m)
    assert fj.decode(back, field, mont=False) == vals


@pytest.mark.parametrize("field,p", CASES, ids=["fq", "fr"])
def test_inv(field, p):
    vals = [v for v in _rand_elems(p, 16) if v != 0]
    d = fj.encode_mont(vals, field)
    got = fj.decode(jax.jit(fj.inv, static_argnums=0)(field, d), field)
    assert got == [pow(v, -1, p) for v in vals]
    # inv(0) == 0 convention
    z = fj.encode_mont([0], field)
    assert fj.decode(fj.inv(field, z), field) == [0]


def test_pow_const_matches_python():
    p = R_SCALAR
    vals = _rand_elems(p, 8)
    d = fj.encode_mont(vals, fj.FR)
    e = 0xDEADBEEFCAFE
    got = fj.decode(fj.pow_const(fj.FR, d, e), fj.FR)
    assert got == [pow(v, e, p) for v in vals]


def test_is_zero_eq_select():
    import jax.numpy as jnp

    a = fj.encode_plain([0, 5, 7])
    b = fj.encode_plain([0, 5, 8])
    assert fj.is_zero(jnp.asarray(a)).tolist() == [True, False, False]
    assert fj.eq(jnp.asarray(a), jnp.asarray(b)).tolist() == [True, True, False]
    sel = fj.select(jnp.array([True, False, True]), jnp.asarray(a), jnp.asarray(b))
    assert limb_codec.limbs_to_ints(np.asarray(sel)) == [0, 5, 7]
