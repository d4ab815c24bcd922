"""Parity tests for the Pallas batched Fr ops (ops/field_pallas.py) vs
exact Python-int arithmetic — interpret mode on the CPU mesh, small blocks.

Lazy-representation contract: outputs are in [0, 2p) and compare equal
mod r; fr_from_mont/fr_mul_canon outputs must be strictly canonical.
"""

import random

import jax.numpy as jnp
import numpy as np

from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.ops import field_pallas as fp
from circom_compat_tpu.ops import limbs as lc

RNG = random.Random(0xF1E1D)
R = 1 << 256


def _enc(vals):
    return jnp.asarray(
        np.stack([lc.int_to_limbs((v << 256) % R_SCALAR) for v in vals])
    )


def _dec(arr):
    return [lc.limbs_to_int(row) for row in np.asarray(arr)]


def _vals(n):
    return [RNG.randrange(R_SCALAR) for _ in range(n)]


def test_fr_mul_add_sub_lazy():
    n = 96
    a, b = _vals(n), _vals(n)
    am, bm = _enc(a), _enc(b)

    got = _dec(fp.fr_add(am, bm))
    want = [((x + y) << 256) % R_SCALAR for x, y in zip(a, b)]
    assert all(g < 2 * R_SCALAR for g in got)
    assert [g % R_SCALAR for g in got] == want

    got = _dec(fp.fr_sub(am, bm))
    want = [((x - y) << 256) % R_SCALAR for x, y in zip(a, b)]
    assert all(g < 2 * R_SCALAR for g in got)
    assert [g % R_SCALAR for g in got] == want

    got = _dec(fp.fr_mul(am, bm))
    want = [((x * y) << 256) % R_SCALAR for x, y in zip(a, b)]
    assert all(g < 2 * R_SCALAR for g in got)
    assert [g % R_SCALAR for g in got] == want


def test_fr_canon_and_from_mont():
    n = 64
    a = _vals(n)
    am = _enc(a)
    # force lazy inputs: add p to half the rows (still ≡ same values)
    lazy = np.asarray(am).astype(np.uint64)
    p_limbs = lc.int_to_limbs(R_SCALAR).astype(np.uint64)
    lazy[::2] += p_limbs  # limbwise sum < 2^17 per limb: normalize below
    # propagate carries host-side to valid 16-bit limbs
    fixed = np.zeros_like(lazy, dtype=np.uint32)
    for i, row in enumerate(lazy):
        v = sum(int(x) << (16 * j) for j, x in enumerate(row))
        fixed[i] = lc.int_to_limbs(v)
    lazy = jnp.asarray(fixed)

    got = _dec(fp.fr_canon(lazy))
    want = [(v << 256) % R_SCALAR for v in a]
    assert got == want  # strictly canonical

    got = _dec(fp.fr_from_mont(lazy))
    assert got == a  # plain canonical values


def test_fr_butterfly():
    n = 48
    u, v, tw = _vals(n), _vals(n), _vals(n)
    hi, lo = fp.fr_butterfly(_enc(u), _enc(v), _enc(tw), block=128)
    hi, lo = _dec(hi), _dec(lo)
    for g1, g2, x, y, t in zip(hi, lo, u, v, tw):
        assert g1 < 2 * R_SCALAR and g2 < 2 * R_SCALAR
        assert g1 % R_SCALAR == ((x + t * y) << 256) % R_SCALAR
        assert g2 % R_SCALAR == ((x - t * y) << 256) % R_SCALAR


def test_fr_tile_scan_segment_sums():
    from circom_compat_tpu.ops import segments

    n = 96
    vals = _vals(n)
    keys = np.sort(np.array([RNG.randrange(12) for _ in range(n)], np.int32))
    vm = _enc(vals)
    out = segments.reduce_by_sorted_key(
        fp.fr_add,
        vm,
        jnp.asarray(keys),
        12,
        np.zeros(16, np.uint32),
        tile_scan=lambda vt, ft: fp.fr_tile_scan(vt, ft, block=128),
        tile_scan_general=lambda vt, ft: fp.fr_tile_scan(vt, ft, block=128),
    )
    got = [g % R_SCALAR for g in _dec(out)]
    want = []
    for seg in range(12):
        acc = 0
        for k, v in zip(keys.tolist(), vals):
            if k == seg:
                acc = (acc + v) % R_SCALAR
        want.append((acc << 256) % R_SCALAR)
    assert got == want


import pytest


@pytest.mark.parametrize(
    "n", [1024, pytest.param(4096, marks=pytest.mark.slow)]
)
def test_witness_map_transforms_lm_parity(n, monkeypatch):
    """The limb-major Pallas pipeline (flat DIF/DIT at 1024, four-step at
    4096 via a lowered threshold — interpret mode does not enforce
    Mosaic's 128-lane block minimum) must match the XLA witness-map tail
    mod r."""
    import jax

    from circom_compat_tpu.ops import ntt

    monkeypatch.setattr(ntt, "FOUR_STEP_MIN", 4096)

    plan = ntt.get_plan(n)
    a_i = _vals(n)
    b_i = _vals(n)
    a, b = _enc(a_i), _enc(b_i)

    got = np.asarray(ntt._witness_map_transforms_lm(plan, a, b))

    c = fj.mont_mul(fj.FR, a, b)
    ax = ntt.coset_shift_impl(plan, ntt.ifft_impl(plan, a))
    bx = ntt.coset_shift_impl(plan, ntt.ifft_impl(plan, b))
    ax = ntt.fft_impl(plan, ax)
    bx = ntt.fft_impl(plan, bx)
    ab = fj.mont_mul(fj.FR, ax, bx)
    cx = ntt.fft_impl(plan, ntt.coset_shift_impl(plan, ntt.ifft_impl(plan, c)))
    want = np.asarray(fj.sub(fj.FR, ab, cx))

    got_i = [g % R_SCALAR for g in _dec(got)]
    want_i = [w % R_SCALAR for w in _dec(want)]
    assert got_i == want_i
