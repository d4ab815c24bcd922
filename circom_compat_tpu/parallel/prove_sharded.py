"""Full Groth16 prove step compiled over a device mesh.

One jitted function: replicated witness map (device NTT) + the five MSMs
with bases/scalars sharded over the mesh (shard_map + all_gather), emitting
replicated per-window sums for A, B1, B2(G2), L and H. The host then does
the tiny Horner fold + randomizer algebra exactly as the single-chip path.

This is the multi-chip analogue of the reference prover hot path
(reference: SURVEY §3.4); distributed NTT (four-step all_to_all) is the
next scaling stage and slots in behind the same interface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.groth16_jax import DeviceProvingKey
from ..ops import curve_jax as cj
from ..ops import field_jax as fj
from ..ops import msm as msm_ops
from ..ops import ntt
from ..ops import segments
from .mesh import SHARD_AXIS


def _pad_rows(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] >= target:
        return arr[:target]
    pad = np.zeros((target - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([np.asarray(arr), pad], axis=0)


@dataclass
class ShardedProver:
    dpk: DeviceProvingKey
    mesh: Mesh
    window_bits: int
    step: Callable  # jitted: assignment_plain (n_pad, 16) -> dict of window sums
    n_vars_padded: int

    def window_sums(self, assignment_plain: np.ndarray) -> Dict[str, object]:
        asg = _pad_rows(np.asarray(assignment_plain, np.uint32), self.n_vars_padded)
        return self.step(jnp.asarray(asg))


def build_sharded_prover(
    dpk: DeviceProvingKey, mesh: Mesh, window_bits: int = 8
) -> ShardedProver:
    D = int(mesh.shape[SHARD_AXIS])

    def ceil_mult(n):
        return max(-(-n // D) * D, D)

    n_vars = dpk.a_query[0].shape[0]
    n_pad = ceil_mult(n_vars)
    aux_len = dpk.l_query[0].shape[0]
    aux_pad = ceil_mult(aux_len)
    h_len = dpk.h_query[0].shape[0]
    h_pad = ceil_mult(h_len)

    # Pre-padded device-resident query sections (all-zero rows = infinity).
    def pad_q(q, target):
        return tuple(jnp.asarray(_pad_rows(np.asarray(c), target)) for c in q)

    a_q = pad_q(dpk.a_query, n_pad)
    b1_q = pad_q(dpk.b_g1_query, n_pad)
    b2_q = pad_q(dpk.b_g2_query, n_pad)
    l_q = pad_q(dpk.l_query, aux_pad)
    h_q = pad_q(dpk.h_query, h_pad)

    num_inputs = dpk.num_inputs

    def sharded_msm(F, query, scalars):
        combine = lambda a, b: cj.add(F, a, b)

        def local(xs_l, ys_l, sc_l):
            jac = cj.affine_to_jacobian(F, xs_l, ys_l)
            sums = msm_ops.window_sums_impl(F, jac, sc_l, window_bits)
            gathered = jax.lax.all_gather(sums, SHARD_AXIS)
            return segments.tree_fold(combine, gathered, D)

        sp = P(SHARD_AXIS)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(sp, sp, sp),
            out_specs=P(),
            check_rep=False,
        )(query[0], query[1], scalars)

    plan = ntt.get_plan(dpk.domain_size)

    def step(assignment_plain):  # (n_pad, 16) uint32, replicated
        asg_mont = fj.to_mont(fj.FR, assignment_plain)
        h_mont = ntt.witness_map(
            plan,
            dpk.a_rows, dpk.a_cols, dpk.a_vals,
            dpk.b_rows, dpk.b_cols, dpk.b_vals,
            asg_mont[:n_vars] if n_pad != n_vars else asg_mont,
            dpk.num_constraints,
            num_inputs,
        )
        h_plain = fj.from_mont(fj.FR, h_mont)

        asg = assignment_plain  # (n_pad, 16) — padding rows are zero scalars
        aux = asg[num_inputs : num_inputs + aux_len]
        aux = jnp.pad(aux, ((0, aux_pad - aux_len), (0, 0)))
        h_sc = h_plain[:h_len]
        h_sc = jnp.pad(h_sc, ((0, h_pad - h_len), (0, 0)))

        return {
            "a": sharded_msm(cj.FQ_ADAPTER, a_q, asg),
            "b1": sharded_msm(cj.FQ_ADAPTER, b1_q, asg),
            "b2": sharded_msm(cj.FQ2_ADAPTER, b2_q, asg),
            "l": sharded_msm(cj.FQ_ADAPTER, l_q, aux),
            "h": sharded_msm(cj.FQ_ADAPTER, h_q, h_sc),
        }

    return ShardedProver(
        dpk=dpk,
        mesh=mesh,
        window_bits=window_bits,
        step=jax.jit(step),
        n_vars_padded=n_pad,
    )


def prove_sharded(
    dpk: DeviceProvingKey,
    prover: ShardedProver,
    r: int,
    s: int,
    full_assignment,
):
    """Host wrapper: sharded window sums -> host fold -> (A, B, C)."""
    from ..constants import R_SCALAR
    from ..models.groth16 import Proof
    from ..refmath import curve as rc

    assignment = [int(a) % R_SCALAR for a in full_assignment]
    asg_plain = fj.encode_plain(assignment)
    sums = prover.window_sums(asg_plain)
    wb = prover.window_bits

    g_a_msm = msm_ops._fold_windows_host(cj.decode_g1(sums["a"]), rc.G1, wb)
    g_b1_msm = msm_ops._fold_windows_host(cj.decode_g1(sums["b1"]), rc.G1, wb)
    g_b2_msm = msm_ops._fold_windows_host(cj.decode_g2(sums["b2"]), rc.G2, wb)
    g_l = msm_ops._fold_windows_host(cj.decode_g1(sums["l"]), rc.G1, wb)
    g_h = msm_ops._fold_windows_host(cj.decode_g1(sums["h"]), rc.G1, wb)

    pk = dpk.pk
    g1o, g2o = rc.G1, rc.G2
    g_a = g1o.add(g1o.add(g_a_msm, pk.vk.alpha_g1), g1o.mul(pk.delta_g1, r))
    g_b1 = g1o.add(g1o.add(g_b1_msm, pk.beta_g1), g1o.mul(pk.delta_g1, s))
    g_b2 = g2o.add(g2o.add(g_b2_msm, pk.vk.beta_g2), g2o.mul(pk.vk.delta_g2, s))
    g_c = g1o.add(g_l, g_h)
    g_c = g1o.add(g_c, g1o.mul(g_a, s))
    g_c = g1o.add(g_c, g1o.mul(g_b1, r))
    g_c = g1o.add(g_c, g1o.mul(pk.delta_g1, (-r * s) % R_SCALAR))
    return Proof(a=g_a, b=g_b2, c=g_c)
