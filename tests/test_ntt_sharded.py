"""Distributed four-step NTT on the 8-device virtual CPU mesh: parity with
the single-chip NTT / host reference."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.parallel import ntt_sharded
from circom_compat_tpu.parallel.mesh import make_mesh
from circom_compat_tpu.refmath import poly

RNG = random.Random(41)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_dist_fft_parity(mesh):
    n = 256
    plan = ntt_sharded.get_dist_plan(n, 8)
    vals = [RNG.randrange(R_SCALAR) for _ in range(n)]
    want = poly.fft(vals)

    x = jnp.asarray(fj.encode_mont(vals, fj.FR)).reshape(plan.n1, plan.n2, 16)
    fft_d, ifft_d = ntt_sharded.make_dist_ntt(plan, mesh)
    y = jax.jit(fft_d)(x)

    flat = np.asarray(y).reshape(n, 16)
    got_td = fj.decode(flat, fj.FR)
    # natural j lives at TD position td_perm[j]
    got = [got_td[plan.td_perm[j]] for j in range(n)]
    assert got == want

    back = jax.jit(ifft_d)(y)
    got_back = fj.decode(np.asarray(back).reshape(n, 16), fj.FR)
    assert got_back == vals


@pytest.mark.slow
def test_dist_witness_map_parity(mesh):
    from circom_compat_tpu.circom import qap

    num_constraints, num_inputs, num_vars = 200, 3, 40
    # synthetic sparse system
    matrix_a, matrix_b = [], []
    for _ in range(num_constraints):
        matrix_a.append([(RNG.randrange(R_SCALAR), RNG.randrange(num_vars)) for _ in range(3)])
        matrix_b.append([(RNG.randrange(R_SCALAR), RNG.randrange(num_vars)) for _ in range(2)])
    assignment = [1] + [RNG.randrange(R_SCALAR) for _ in range(num_vars - 1)]

    want = qap.witness_map_from_matrices(
        matrix_a, matrix_b, num_inputs, num_constraints, assignment
    )

    n = qap.domain_size_for(num_constraints, num_inputs)
    plan = ntt_sharded.get_dist_plan(n, 8)

    def coo_td(rows_list):
        rows, cols, vals = [], [], []
        for r, entries in enumerate(rows_list):
            for v, sgn in entries:
                rows.append(int(plan.td_perm[r]))
                cols.append(sgn)
                vals.append(v)
        order = np.argsort(np.array(rows), kind="stable")
        return (
            jnp.asarray(np.array(rows, np.int32)[order]),
            jnp.asarray(np.array(cols, np.int32)[order]),
            jnp.asarray(fj.encode_mont([vals[i] for i in order], fj.FR)),
        )

    ar, ac, av = coo_td(matrix_a)
    br, bc, bv = coo_td(matrix_b)
    pub_td = jnp.asarray(
        plan.td_perm[num_constraints : num_constraints + num_inputs].astype(np.int32)
    )
    w = jnp.asarray(fj.encode_mont(assignment, fj.FR))

    got_td = ntt_sharded.witness_map_dist(
        plan, mesh, ar, ac, av, br, bc, bv, w,
        num_constraints, num_inputs, pub_td,
    )
    got_td = fj.decode(np.asarray(got_td), fj.FR)
    got = [got_td[plan.td_perm[j]] for j in range(n)]
    assert got == want
