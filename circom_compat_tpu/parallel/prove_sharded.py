"""Full Groth16 prove step compiled over a device mesh.

One jitted function: replicated witness map (device NTT) + the MSMs with
bases/scalars sharded over the mesh (shard_map + all_gather), emitting
replicated per-window sums for [A, B1, L, H] (one batched G1 call — the
bucket-scan graph is instantiated once) and B2 (G2). The host then does
the tiny Horner fold + randomizer algebra exactly as the single-chip path.

This is the multi-chip analogue of the reference prover hot path
(reference: SURVEY §3.4); the four-step distributed NTT
(parallel/ntt_sharded.py) slots in behind the same interface once domains
exceed one chip.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import groth16_jax as gj
from ..ops import curve_jax as cj
from ..ops import field_jax as fj
from ..ops import msm as msm_ops
from ..ops import segments
from .mesh import SHARD_AXIS, shmap


@dataclass
class ShardedProver:
    dpk: gj.DeviceProvingKey
    mesh: Mesh
    window_bits: int
    step: Callable  # jitted: assignment_plain (n_vars, 16) -> (g1 sums, g2 sums)


def build_sharded_prover(
    dpk: gj.DeviceProvingKey,
    mesh: Mesh,
    window_bits: int = None,
    dist_ntt: bool = None,
) -> ShardedProver:
    """dist_ntt: run the witness map through the four-step distributed NTT
    (ntt_sharded) instead of replicating it per device. Defaults to on when
    the domain is large enough to shard over the mesh."""
    if window_bits is None:
        window_bits = gj.default_window_bits()
    D = int(mesh.shape[SHARD_AXIS])

    from . import ntt_sharded

    if dist_ntt is None:
        try:
            ntt_sharded.get_dist_plan(dpk.domain_size, D)
            dist_ntt = True
        except ValueError:
            dist_ntt = False

    n_max = dpk.g1_stack_x.shape[1]
    n_pad = -(-n_max // D) * D
    g2_len = dpk.b_g2_query[0].shape[0]
    g2_pad = -(-g2_len // D) * D

    def pad_n(arr, target, axis):
        pads = [(0, 0)] * arr.ndim
        pads[axis] = (0, target - arr.shape[axis])
        return jnp.pad(jnp.asarray(arr), pads)

    g1_x = pad_n(dpk.g1_stack_x, n_pad, 1)  # (4, n_pad, 16)
    g1_y = pad_n(dpk.g1_stack_y, n_pad, 1)
    g2_x = pad_n(dpk.b_g2_query[0], g2_pad, 0)
    g2_y = pad_n(dpk.b_g2_query[1], g2_pad, 0)

    if dist_ntt:
        # Distributed witness map emits H scalars in the four-step NTT's
        # transposed-digit (TD) layout; fold the layout into the key once:
        # TD-permute the matrix rows + the H point row, and fold the
        # public-input identity rows into the A matrix (those rows carry no
        # coefficients, so the additive sparse eval equals the reference's
        # scatter, reference: src/circom/qap.rs:46-50).
        plan = ntt_sharded.get_dist_plan(dpk.domain_size, D)
        td = plan.td_perm
        nat_of_td = np.argsort(td)
        nc, ni = dpk.num_constraints, dpk.num_inputs

        def td_sorted(rows, cols, vals):
            r = td[np.asarray(rows)].astype(np.int64)
            order = np.argsort(r, kind="stable")
            return (
                r[order],
                np.asarray(cols)[order].astype(np.int64),
                np.asarray(vals)[order],
            )

        a_rows_np = np.concatenate([np.asarray(dpk.a_rows), np.arange(nc, nc + ni)])
        a_cols_np = np.concatenate([np.asarray(dpk.a_cols), np.arange(ni)])
        one_mont = fj.FR.one_mont.astype(np.uint32)
        a_vals_np = np.concatenate(
            [np.asarray(dpk.a_vals), np.tile(one_mont, (ni, 1))]
        )
        a_coo = ntt_sharded.partition_coo_td(
            plan, *td_sorted(a_rows_np, a_cols_np, a_vals_np), D
        )
        b_coo = ntt_sharded.partition_coo_td(
            plan, *td_sorted(dpk.b_rows, dpk.b_cols, dpk.b_vals), D
        )
        dist_wm = ntt_sharded.make_sharded_witness_map(plan, mesh, a_coo, b_coo)

        h_perm = jnp.asarray(
            np.concatenate([nat_of_td, np.arange(plan.n, n_pad)]).astype(np.int32)
        )
        g1_x = g1_x.at[3].set(g1_x[3][h_perm])
        g1_y = g1_y.at[3].set(g1_y[3][h_perm])

    la, lb1 = dpk.g1_lengths[0], dpk.g1_lengths[1]
    share_sorts = (n_pad // D) <= msm_ops.CHUNK_POINTS

    def g1_body(xs, ys, sc):  # local shards (4, n_pad/D, 16)
        if share_sorts:
            # A and B1 share the assignment scalars, so their local
            # shards' per-window argsorts are identical (ops/msm.py
            # window_orders — same sharing as the single-chip core).
            oa, ka = msm_ops.window_orders(sc[0], window_bits)
            ob1, kb1 = (
                (oa, ka) if lb1 == la
                else msm_ops.window_orders(sc[1], window_bits)
            )
            ol, kl = msm_ops.window_orders(sc[2], window_bits)
            oh, kh = msm_ops.window_orders(sc[3], window_bits)
            orders = jnp.stack([oa, ob1, ol, oh])
            keys = jnp.stack([ka, kb1, kl, kh])

            def one(args):
                x, y, s, o, k = args
                return msm_ops.window_sums_affine_impl(
                    cj.FQ_ADAPTER, x, y, s, window_bits, precomp=(o, k)
                )

            sums = jax.lax.map(one, (xs, ys, sc, orders, keys))
        else:

            def one(args):
                x, y, s = args
                # points ride the mesh AND the gathers in compact uint16
                return msm_ops.window_sums_affine_impl(
                    cj.FQ_ADAPTER, x, y, s, window_bits
                )

            sums = jax.lax.map(one, (xs, ys, sc))  # (4, W, pt)
        gathered = jax.lax.all_gather(sums, SHARD_AXIS)  # (D, 4, W, pt)
        return segments.tree_fold(
            lambda a, b: cj.proj_add(cj.FQ_ADAPTER, a, b), gathered, D
        )

    def g2_body(xs, ys, sc):
        sums = msm_ops.window_sums_affine_impl(
            cj.FQ2_ADAPTER, xs, ys, sc, window_bits
        )
        gathered = jax.lax.all_gather(sums, SHARD_AXIS)
        return segments.tree_fold(
            lambda a, b: cj.proj_add(cj.FQ2_ADAPTER, a, b), gathered, D
        )

    sp_g1 = P(None, SHARD_AXIS)
    sp_g2 = P(SHARD_AXIS)
    g1_sm = shmap(g1_body, mesh=mesh, in_specs=(sp_g1, sp_g1, sp_g1), out_specs=P())
    g2_sm = shmap(g2_body, mesh=mesh, in_specs=(sp_g2, sp_g2, sp_g2), out_specs=P())

    def step(asg_plain):  # (n_vars, 16) uint32, replicated
        from ..ops import field_pallas as fp

        if fp.use_pallas():
            asg_mont = fp.fr_to_mont(asg_plain)
        else:
            asg_mont = fj.to_mont_impl(fj.FR, asg_plain)
        if dist_ntt:
            # TD flat order — paired with the TD-permuted H point row
            h_mont = dist_wm(asg_mont)
        else:
            h_mont = gj._witness_map_mont(dpk, asg_mont)
        if fp.use_pallas():
            h_plain = fp.fr_from_mont(h_mont)
        else:
            h_plain = fj.from_mont_impl(fj.FR, h_mont)
        sc = gj._scalar_stack(dpk, asg_plain, h_plain)  # (4, n_max, 16)
        sc = jnp.pad(sc, ((0, 0), (0, n_pad - n_max), (0, 0)))
        g1_sums = g1_sm(g1_x, g1_y, sc)
        sc2 = jnp.pad(
            asg_plain[:g2_len], ((0, g2_pad - min(g2_len, asg_plain.shape[0])), (0, 0))
        )
        g2_sums = g2_sm(g2_x, g2_y, sc2)
        return g1_sums, g2_sums

    return ShardedProver(
        dpk=dpk, mesh=mesh, window_bits=window_bits, step=jax.jit(step)
    )


def prove_sharded(
    dpk: gj.DeviceProvingKey,
    prover: ShardedProver,
    r: int,
    s: int,
    full_assignment,
):
    """Host wrapper: sharded window sums -> host fold -> (A, B, C)."""
    from ..constants import R_SCALAR

    assignment = [int(a) % R_SCALAR for a in full_assignment]
    asg_plain = jnp.asarray(fj.encode_plain(assignment))
    g1_sums, g2_sums = prover.step(asg_plain)
    return gj.assemble_proof(dpk, r, s, g1_sums, g2_sums, prover.window_bits)
