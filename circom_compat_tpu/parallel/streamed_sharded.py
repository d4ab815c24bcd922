"""Streamed x sharded Groth16 prove: host-resident key sections chunked
into a DEVICE MESH (VERDICT r4 missing #3 — the pod-scale >HBM story).

The resident sharded prover (parallel/prove_sharded.py) stages full padded
query sections per device; the single-chip streamed prover
(models/streamed.py) bounds device memory but owns only one chip. This
module composes them: each chunk of host rows is device_put SHARDED along
the point axis (each device receives chunk/D rows over its own ICI/DCN
link), every device folds its rows into a LOCAL (W, B, point) bucket
accumulator under shard_map, and the O(B log B) suffix scans + cross-device
fold run once at the end. Bucket sums are additive across any point
partition, so the result is bit-exact vs the host prover regardless of
chunk size or mesh shape (tests/test_streamed_sharded.py).

    peak HBM per device = chunk/D rows + accumulators + witness tensors
    host->mesh traffic  = key bytes / D per device, once per proof

The witness map stays replicated (domain-sized tensors are small next to
the key sections; the distributed four-step NTT of prove_sharded.py can
slot in for domains that outgrow one chip).

Reference analogue: the zkey sections the reference streams from disk
section-by-section (reference: src/zkey.rs:103-133, 218-228) combined with
its Rayon scalar-chunking (reference: Cargo.toml:25-30) — here the chunks
go to different accelerators instead of different cores.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import groth16_jax as gj
from ..models import streamed as sm
from ..ops import curve_jax as cj
from ..ops import msm as msm_ops
from ..ops import segments
from .mesh import SHARD_AXIS, shmap


def _init_accs_sharded(mesh: Mesh, F, window_bits: int, D: int, lead=()):
    """(D, *lead, W, B, coord) all-identity accumulators, sharded on
    axis 0 (one accumulator block per device)."""
    W = msm_ops.num_windows(window_bits)
    B = 1 << window_bits
    sh = NamedSharding(mesh, P(SHARD_AXIS))
    return tuple(
        jax.device_put(
            np.tile(
                np.asarray(c, np.uint32),
                (D,) + lead + (W, B) + (1,) * np.ndim(c),
            ),
            sh,
        )
        for c in cj.proj_identity_const(F)
    )


def _build_jits(spk: sm.StreamedProvingKey, mesh: Mesh, window_bits: int,
                chunk: int):
    """One fused per-chunk jit (shard_map: local bucket updates) and one
    deferred-scan jit (local scans + all_gather + tree fold)."""
    D = int(mesh.shape[SHARD_AXIS])
    assert chunk % D == 0, f"chunk {chunk} must divide by mesh size {D}"
    local = chunk // D
    FQ, FQ2 = cj.FQ_ADAPTER, cj.FQ2_ADAPTER
    cmb1, cmb2 = msm_ops.combine_for(FQ), msm_ops.combine_for(FQ2)
    n_vars, num_inputs, aux_len = spk.n_vars, spk.num_inputs, spk.aux_len

    def prep(asg_dev, h_dev, Pn):
        def fit(x):
            p = Pn - x.shape[0]
            x = jnp.pad(x, ((0, p), (0, 0))) if p > 0 else x[:Pn]
            return x.astype(jnp.uint16)

        return (
            fit(asg_dev[:n_vars]),
            fit(asg_dev[num_inputs : num_inputs + aux_len]),
            fit(h_dev),
        )

    def body(abq, lpk, hpk, sc_asg, sc_l, sc_h, lo, acc_g1, acc_g2):
        # local shard: (local, ...) packed rows (assembled host-side by
        # streamed._stage_packed_host); accumulators arrive with a leading
        # local dim of 1. The packed body (gj._packed_window_sums) gives
        # each device the same one-256B-take-per-window gather and single
        # G1 pipeline instantiation as the single-chip provers.
        from ..models import groth16_jax as gj

        idx = jax.lax.axis_index(SHARD_AXIS)
        off = lo + idx.astype(jnp.int32) * np.int32(local)

        def sl(full):
            return jax.lax.dynamic_slice_in_dim(full, off, local, 0)

        oa, ka = msm_ops.window_orders(
            sl(sc_asg).astype(jnp.uint32), window_bits
        )
        ol, kl = msm_ops.window_orders(
            sl(sc_l).astype(jnp.uint32), window_bits
        )
        oh, kh = msm_ops.window_orders(
            sl(sc_h).astype(jnp.uint32), window_bits
        )
        g1_b, g2_b = gj._packed_window_sums(
            abq, lpk, hpk, (oa, ka, ol, kl, oh, kh), window_bits,
            want_buckets=True,
        )
        sq = lambda acc: jax.tree_util.tree_map(lambda x: x[0], acc)
        ex = lambda acc: jax.tree_util.tree_map(lambda x: x[None], acc)
        return (
            ex(cmb1(sq(acc_g1), g1_b)),
            ex(cmb2(sq(acc_g2), g2_b)),
        )

    rows = P(SHARD_AXIS)
    repl = P()
    acc_spec = tuple(P(SHARD_AXIS) for _ in range(3))
    fused_sm = shmap(
        body, mesh=mesh,
        in_specs=(rows,) * 3 + (repl,) * 4 + (acc_spec,) * 2,
        out_specs=(acc_spec,) * 2,
    )

    def scans_body(acc_g1, acc_g2):
        sq = lambda acc: jax.tree_util.tree_map(lambda x: x[0], acc)
        g1 = sq(acc_g1)  # (4, W, B, pt)
        four, W = g1[0].shape[:2]
        g1_flat = jax.tree_util.tree_map(
            lambda x: x.reshape((four * W,) + x.shape[2:]), g1
        )
        g1_sums = msm_ops.windows_from_buckets_impl(FQ, g1_flat)
        g1_sums = jax.tree_util.tree_map(
            lambda x: x.reshape((four, W) + x.shape[1:]), g1_sums
        )
        g2_sums = msm_ops.windows_from_buckets_impl(FQ2, sq(acc_g2))
        # fold the D partial window sums into replicated totals
        g1_all = jax.lax.all_gather(g1_sums, SHARD_AXIS)  # (D, 4, W, pt)
        g2_all = jax.lax.all_gather(g2_sums, SHARD_AXIS)
        g1_tot = segments.tree_fold(
            lambda a, b: cj.proj_add(FQ, a, b), g1_all, D
        )
        g2_tot = segments.tree_fold(
            lambda a, b: cj.proj_add(FQ2, a, b), g2_all, D
        )
        return g1_tot, g2_tot

    scans_sm = shmap(
        scans_body, mesh=mesh,
        in_specs=(acc_spec,) * 2, out_specs=(repl, repl),
    )

    return {
        "fused": jax.jit(fused_sm, donate_argnums=(7, 8)),
        "scans": jax.jit(scans_sm),
        "prep": jax.jit(prep, static_argnums=(2,)),
    }


def prove_streamed_sharded(
    spk: sm.StreamedProvingKey,
    mesh: Mesh,
    r: int,
    s: int,
    full_assignment: Sequence[int],
    window_bits: Optional[int] = None,
    jits: Optional[dict] = None,
):
    """Full prove: host-resident sections streamed into the mesh in
    chunks; bit-exact vs the host/resident/streamed provers."""
    D = int(mesh.shape[SHARD_AXIS])
    chunk = min(spk.chunk_points, 1 << max(spk.n_vars - 1, 1).bit_length())
    chunk = max(chunk, D)
    chunk = -(-chunk // D) * D
    if window_bits is None:
        # per-DEVICE sort length is the chunked Pippenger's n (see
        # models/streamed.prove_streamed — bucket memory scales 2^w)
        window_bits = gj.default_window_bits(max(chunk // D, 1))

    asg_plain_np = np.asarray(gj._encode_assignment(full_assignment))
    n = max(max(sec[0].shape[0] for sec in spk.g1_sections),
            spk.g2_section[0].shape[0], spk.n_vars, spk.domain_size)
    Pn = -(-n // chunk) * chunk

    if jits is None:
        jits = _build_jits(spk, mesh, window_bits, chunk)

    if "witness" not in spk._cache:
        spk._cache["witness"] = sm._witness_jit(spk)
    asg_dev = jax.device_put(asg_plain_np)
    h_dev = spk._cache["witness"](sm._witness_arrays(spk), asg_dev)
    sc_asg, sc_l, sc_h = jits["prep"](asg_dev, h_dev, Pn)

    accs = (
        _init_accs_sharded(mesh, cj.FQ_ADAPTER, window_bits, D, lead=(4,)),
        _init_accs_sharded(mesh, cj.FQ2_ADAPTER, window_bits, D),
    )

    sh = NamedSharding(mesh, P(SHARD_AXIS))

    def stage(lo):
        packed = sm._stage_packed_host(
            spk.g1_sections, spk.g2_section, lo, chunk
        )
        return [jax.device_put(b, sh) for b in packed]

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(stage, 0)
        for lo in range(0, n, chunk):
            cur = fut.result()
            if lo + chunk < n:
                fut = pool.submit(stage, lo + chunk)
            accs = jits["fused"](
                *cur, sc_asg, sc_l, sc_h, np.int32(lo), *accs
            )
    g1_sums, g2_sums = jits["scans"](*accs)
    g1_sums = jax.tree_util.tree_map(np.asarray, g1_sums)
    g2_sums = jax.tree_util.tree_map(np.asarray, g2_sums)
    return gj.assemble_proof(spk, r, s, g1_sums, g2_sums, window_bits)
