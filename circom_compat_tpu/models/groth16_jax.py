"""Groth16 prover, device backend: NTT witness map + 5 Pippenger MSMs.

Mirrors ark_groth16::create_proof_with_reduction_and_matrices as invoked by
the reference (reference: src/zkey.rs:903-912): witness map via
CircomReduction (device NTT, ops/ntt.py), then MSMs over the zkey query
sections — A(G1), B1(G1), B2(G2), L(G1, aux), H(G1) — with the r,s
randomizer algebra done host-side on the five tiny results.

The DeviceProvingKey stages the zkey's Montgomery limb arrays onto the
device once (sorted COO matrices + query points); repeated proofs reuse it
(the "checkpoint/resume" analogue per SURVEY §5 — PK device residency).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..circom import qap
from ..circom.zkey import ConstraintMatrices, ProvingKey
from ..constants import R_SCALAR
from ..ops import curve_jax as cj
from ..ops import field_jax as fj
from ..ops import limbs as limb_codec
from ..ops import msm as msm_ops
from ..ops import ntt


def _sorted_coo(rows, cols, vals_mont_u16, num_nnz_pad: Optional[int] = None):
    order = np.argsort(np.asarray(rows), kind="stable")
    r = np.asarray(rows, np.int32)[order]
    c = np.asarray(cols, np.int32)[order]
    v = np.asarray(vals_mont_u16, np.uint16)[order].astype(np.uint32)
    return jnp.asarray(r), jnp.asarray(c), jnp.asarray(v)


@dataclass
class DeviceProvingKey:
    """Device-resident, limb-decomposed proving key + matrices."""

    pk: ProvingKey  # host copy (for vk + tiny base points)
    num_inputs: int
    num_constraints: int
    domain_size: int
    # matrices (sorted COO, Montgomery values)
    a_rows: jnp.ndarray
    a_cols: jnp.ndarray
    a_vals: jnp.ndarray
    b_rows: jnp.ndarray
    b_cols: jnp.ndarray
    b_vals: jnp.ndarray
    # query points (affine Montgomery limbs; all-zero row = infinity)
    a_query: tuple  # ((n,16),(n,16))
    b_g1_query: tuple
    b_g2_query: tuple  # ((n,2,16),(n,2,16))
    l_query: tuple
    h_query: tuple

    @staticmethod
    def build(
        pk: ProvingKey, matrices: ConstraintMatrices, num_constraints: int
    ) -> "DeviceProvingKey":
        num_inputs = matrices.num_instance_variables

        def g1(section):
            limbs = np.asarray(section.limbs, np.uint16).astype(np.uint32)
            return (jnp.asarray(limbs[:, 0]), jnp.asarray(limbs[:, 1]))

        def g2(section):
            limbs = np.asarray(section.limbs, np.uint16).astype(np.uint32)
            return (jnp.asarray(limbs[:, 0:2]), jnp.asarray(limbs[:, 2:4]))

        ar, ac, av = _sorted_coo(matrices.a_rows, matrices.a_cols, matrices.a_values_mont)
        br, bc, bv = _sorted_coo(matrices.b_rows, matrices.b_cols, matrices.b_values_mont)
        return DeviceProvingKey(
            pk=pk,
            num_inputs=num_inputs,
            num_constraints=num_constraints,
            domain_size=pk.domain_size,
            a_rows=ar, a_cols=ac, a_vals=av,
            b_rows=br, b_cols=bc, b_vals=bv,
            a_query=g1(pk.a_query),
            b_g1_query=g1(pk.b_g1_query),
            b_g2_query=g2(pk.b_g2_query),
            l_query=g1(pk.l_query),
            h_query=g1(pk.h_query),
        )


def compute_h(dpk: DeviceProvingKey, assignment_mont: jnp.ndarray) -> jnp.ndarray:
    """Device witness map -> H scalars in plain (non-Montgomery) form."""
    plan = ntt.get_plan(dpk.domain_size)
    h_mont = ntt.witness_map(
        plan,
        dpk.a_rows, dpk.a_cols, dpk.a_vals,
        dpk.b_rows, dpk.b_cols, dpk.b_vals,
        assignment_mont,
        dpk.num_constraints,
        dpk.num_inputs,
    )
    return fj.from_mont(fj.FR, h_mont)


def prove(
    pk: ProvingKey,
    r: int,
    s: int,
    matrices,
    num_inputs: int,
    num_constraints: int,
    full_assignment: Sequence[int],
    window_bits: int = 8,
):
    """Device-backed prove; drop-in for the host backend in models/groth16.py."""
    if isinstance(matrices, ConstraintMatrices):
        dpk = DeviceProvingKey.build(pk, matrices, num_constraints)
    else:
        # Generic duck-typed matrices (row lists) — build COO on the fly.
        dpk = _device_pk_from_rows(pk, matrices, num_inputs, num_constraints)
    return prove_prepared(dpk, r, s, full_assignment, window_bits)


def _device_pk_from_rows(pk, matrices, num_inputs, num_constraints):
    def coo(rows_list):
        rows, cols, vals = [], [], []
        for ri, entries in enumerate(rows_list):
            for v, sig in entries:
                rows.append(ri)
                cols.append(sig)
                vals.append((v << 256) % R_SCALAR)
        vals16 = limb_codec.ints_to_limbs(vals, dtype=np.uint16) if vals else np.zeros((0, 16), np.uint16)
        return (
            np.array(rows, np.int32),
            np.array(cols, np.int32),
            vals16,
        )

    ar_, ac_, av_ = coo(matrices.a)
    br_, bc_, bv_ = coo(matrices.b)

    class _Shim:
        num_instance_variables = num_inputs
        a_rows, a_cols, a_values_mont = ar_, ac_, av_
        b_rows, b_cols, b_values_mont = br_, bc_, bv_

    return DeviceProvingKey.build(pk, _Shim, num_constraints)


def prove_prepared(
    dpk: DeviceProvingKey,
    r: int,
    s: int,
    full_assignment: Sequence[int],
    window_bits: int = 8,
):
    from ..refmath import curve as rc
    from .groth16 import Proof

    assignment = [int(a) % R_SCALAR for a in full_assignment]
    n_vars = len(assignment)

    asg_plain = jnp.asarray(fj.encode_plain(assignment))
    asg_mont = fj.to_mont(fj.FR, asg_plain)

    h_plain = compute_h(dpk, asg_mont)

    # Five MSMs on device (window sums), folded on host.
    def g1_msm(query, scalars_dev, count):
        xs, ys = query
        if count == 0:
            return None
        jac = cj.affine_to_jacobian(cj.FQ_ADAPTER, xs[:count], ys[:count])
        sums = msm_ops.msm_window_sums(
            cj.FQ_ADAPTER, jac, scalars_dev[:count], window_bits
        )
        return msm_ops._fold_windows_host(
            cj.decode_g1(sums), rc.G1, window_bits
        )

    def g2_msm(query, scalars_dev, count):
        xs, ys = query
        if count == 0:
            return None
        jac = cj.affine_to_jacobian(cj.FQ2_ADAPTER, xs[:count], ys[:count])
        sums = msm_ops.msm_window_sums(
            cj.FQ2_ADAPTER, jac, scalars_dev[:count], window_bits
        )
        return msm_ops._fold_windows_host(
            cj.decode_g2(sums), rc.G2, window_bits
        )

    pk = dpk.pk
    num_inputs = dpk.num_inputs
    aux_len = len(pk.l_query)

    g_a_msm = g1_msm(dpk.a_query, asg_plain, min(n_vars, dpk.a_query[0].shape[0]))
    g_b1_msm = g1_msm(dpk.b_g1_query, asg_plain, min(n_vars, dpk.b_g1_query[0].shape[0]))
    g_b2_msm = g2_msm(dpk.b_g2_query, asg_plain, min(n_vars, dpk.b_g2_query[0].shape[0]))
    aux_scalars = asg_plain[num_inputs : num_inputs + aux_len]
    g_l = g1_msm(dpk.l_query, aux_scalars, aux_scalars.shape[0])
    g_h = g1_msm(dpk.h_query, h_plain, min(h_plain.shape[0], dpk.h_query[0].shape[0]))

    # Host randomizer algebra (tiny): same as the host backend.
    g1o, g2o = rc.G1, rc.G2
    g_a = g1o.add(g1o.add(g_a_msm, pk.vk.alpha_g1), g1o.mul(pk.delta_g1, r))
    g_b1 = g1o.add(g1o.add(g_b1_msm, pk.beta_g1), g1o.mul(pk.delta_g1, s))
    g_b2 = g2o.add(g2o.add(g_b2_msm, pk.vk.beta_g2), g2o.mul(pk.vk.delta_g2, s))
    g_c = g1o.add(g_l, g_h)
    g_c = g1o.add(g_c, g1o.mul(g_a, s))
    g_c = g1o.add(g_c, g1o.mul(g_b1, r))
    g_c = g1o.add(g_c, g1o.mul(pk.delta_g1, (-r * s) % R_SCALAR))

    return Proof(a=g_a, b=g_b2, c=g_c)
