"""Parity tests: device NTT / witness map vs refmath.poly and circom.qap."""

import random

import jax.numpy as jnp
import numpy as np

from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.circom import qap
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.ops import ntt
from circom_compat_tpu.refmath import poly

RNG = random.Random(7)


def _rand_vec(n):
    return [RNG.randrange(R_SCALAR) for _ in range(n)]


def test_fft_ifft_roundtrip_and_parity():
    for n in (1, 2, 8, 64):
        plan = ntt.get_plan(n)
        vals = _rand_vec(n)
        d = jnp.asarray(fj.encode_mont(vals, fj.FR))
        ev = ntt.fft(plan, d)
        assert fj.decode(ev, fj.FR) == poly.fft(vals)
        back = ntt.ifft(plan, ev)
        assert fj.decode(back, fj.FR) == vals


def test_coset_shift():
    from circom_compat_tpu.constants import fr_root_of_unity

    n = 16
    plan = ntt.get_plan(n)
    vals = _rand_vec(n)
    d = jnp.asarray(fj.encode_mont(vals, fj.FR))
    got = fj.decode(ntt.coset_shift(plan, d), fj.FR)
    assert got == poly.distribute_powers(vals, fr_root_of_unity(2 * n))


def _coo_from_rows(rows_list):
    """[(value, signal)] per row -> sorted COO device arrays."""
    rows, cols, vals = [], [], []
    for r, entries in enumerate(rows_list):
        for v, s in entries:
            rows.append(r)
            cols.append(s)
            vals.append(v)
    order = np.argsort(np.array(rows), kind="stable")
    rows = np.array(rows, np.int32)[order]
    cols = np.array(cols, np.int32)[order]
    vals = fj.encode_mont([vals[i] for i in order], fj.FR)
    return jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)


def test_witness_map_parity():
    # Random sparse system: 5 constraints, 3 "inputs", 9 variables.
    num_constraints, num_inputs, num_vars = 5, 3, 9
    matrix_a = []
    matrix_b = []
    for _ in range(num_constraints):
        matrix_a.append(
            [(RNG.randrange(R_SCALAR), RNG.randrange(num_vars)) for _ in range(3)]
        )
        matrix_b.append(
            [(RNG.randrange(R_SCALAR), RNG.randrange(num_vars)) for _ in range(2)]
        )
    assignment = [1] + _rand_vec(num_vars - 1)

    want = qap.witness_map_from_matrices(
        matrix_a, matrix_b, num_inputs, num_constraints, assignment
    )

    plan = ntt.get_plan(qap.domain_size_for(num_constraints, num_inputs))
    ar, ac, av = _coo_from_rows(matrix_a)
    br, bc, bv = _coo_from_rows(matrix_b)
    w = jnp.asarray(fj.encode_mont(assignment, fj.FR))
    got = ntt.witness_map(
        plan, ar, ac, av, br, bc, bv, w, num_constraints, num_inputs
    )
    assert fj.decode(got, fj.FR) == want
