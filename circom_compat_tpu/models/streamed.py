"""Streamed Groth16 prover: proving keys LARGER than device memory.

The reference reads zkey sections streaming from disk (reference:
src/zkey.rs:103-133, 218-228) and is bounded only by host RAM. The
device analogue (VERDICT r1 item 4): the multi-GB G1/G2 query sections
stay HOST-side as mmap-backed uint16 views; the device sees only
fixed-size chunks. Window sums are additive across point subsets, so each
chunk's Pippenger window sums fold into a running accumulator on device:

    peak HBM = chunk bytes + accumulators + witness-map tensors
             (independent of key size)

The H2D transfers overlap compute for free: jax dispatch is async, so
chunk i+1's device_put queues while chunk i's window-sum kernel runs.

Everything is bit-exact vs the resident-key prover — same witness map,
same window-sum kernels, same host fold (tests/test_streamed.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve_jax as cj
from ..ops import field_jax as fj
from ..ops import msm as msm_ops
from ..ops import ntt
from . import groth16_jax as gj


@dataclass
class StreamedProvingKey:
    """Matrices + NTT tables device-resident (domain-sized); query point
    sections host-resident (zkey mmap views page in lazily)."""

    pk: object
    num_inputs: int
    num_constraints: int
    domain_size: int
    n_vars: int
    aux_len: int
    # device: sorted COO matrices (as in DeviceProvingKey)
    a_rows: jnp.ndarray
    a_cols: jnp.ndarray
    a_vals: jnp.ndarray
    b_rows: jnp.ndarray
    b_cols: jnp.ndarray
    b_vals: jnp.ndarray
    # host: (n, 16) uint16 affine Montgomery views per section
    g1_sections: tuple  # ((xs, ys) for a, b1, l, h)
    g2_section: tuple  # (xs (n, 2, 16), ys (n, 2, 16))
    chunk_points: int = 1 << 20
    _cache: dict = field(default_factory=dict, repr=False)

    @staticmethod
    def build(
        pk, matrices, num_constraints: int,
        num_inputs: Optional[int] = None, chunk_points: int = 1 << 20,
    ) -> "StreamedProvingKey":
        if num_inputs is None:
            num_inputs = matrices.num_instance_variables
        ar, ac, av = gj._sorted_coo(
            matrices.a_rows, matrices.a_cols, matrices.a_values_mont
        )
        br, bc, bv = gj._sorted_coo(
            matrices.b_rows, matrices.b_cols, matrices.b_values_mont
        )

        def sec_xy(sec):
            limbs = sec.limbs  # (n, 2, 16) uint16, possibly mmap-backed
            return limbs[:, 0], limbs[:, 1]

        g2 = pk.b_g2_query.limbs  # (n, 4, 16)
        return StreamedProvingKey(
            pk=pk,
            num_inputs=num_inputs,
            num_constraints=num_constraints,
            domain_size=pk.domain_size,
            n_vars=len(pk.a_query),
            aux_len=len(pk.l_query),
            a_rows=ar, a_cols=ac, a_vals=av,
            b_rows=br, b_cols=bc, b_vals=bv,
            g1_sections=tuple(
                sec_xy(s)
                for s in (pk.a_query, pk.b_g1_query, pk.l_query, pk.h_query)
            ),
            g2_section=(g2[:, 0:2], g2[:, 2:4]),
            chunk_points=chunk_points,
        )


def _witness_jit(spk: StreamedProvingKey):
    """(ntt tables + matrices as args, asg_plain) -> h_plain limbs."""
    num_constraints = spk.num_constraints
    num_inputs = spk.num_inputs
    domain_size = spk.domain_size

    def run(arrays, asg_plain):
        from ..ops import field_pallas as fp

        plan_t = gj._TracedNTTPlan(domain_size, arrays["ntt"])
        if fp.use_pallas():
            asg_mont = fp.fr_to_mont(asg_plain)
        else:
            asg_mont = fj.to_mont_impl(fj.FR, asg_plain)
        h_mont = ntt.witness_map_impl(
            plan_t,
            arrays["a_rows"], arrays["a_cols"], arrays["a_vals"],
            arrays["b_rows"], arrays["b_cols"], arrays["b_vals"],
            asg_mont, num_constraints, num_inputs,
        )
        if fp.use_pallas():
            return fp.fr_from_mont(h_mont)
        return fj.from_mont_impl(fj.FR, h_mont)

    return jax.jit(run)


def _witness_arrays(spk: StreamedProvingKey) -> dict:
    if "arrays" not in spk._cache:
        plan = ntt.get_plan(spk.domain_size)
        tables = {
            "tw_fwd": jnp.asarray(plan.tw_fwd),
            "tw_inv": jnp.asarray(plan.tw_inv),
            "coset": jnp.asarray(plan.coset),
            "bitrev": jnp.asarray(plan.bitrev),
            "n_inv": jnp.asarray(plan.n_inv),
        }
        for key in (
            "tw_fwd_lm", "tw_inv_lm", "coset_inv_bitrev_lm",
            "t3_fwd_lm", "t3_inv_lm", "coset4_lm",
            "tw1_fwd_lm", "tw1_inv_lm", "tw2_fwd_lm", "tw2_inv_lm",
        ):
            if hasattr(plan, key):
                tables[key] = jnp.asarray(getattr(plan, key))
        spk._cache["arrays"] = {
            "a_rows": spk.a_rows, "a_cols": spk.a_cols, "a_vals": spk.a_vals,
            "b_rows": spk.b_rows, "b_cols": spk.b_cols, "b_vals": spk.b_vals,
            "ntt": tables,
        }
    return spk._cache["arrays"]


def _chunk_jits(spk: StreamedProvingKey, window_bits: int):
    """One fixed-shape window-sum graph per curve + the fold combine."""
    key = ("chunk", window_bits)
    if key not in spk._cache:
        g1 = jax.jit(
            lambda xs, ys, sc: msm_ops.window_sums_affine_impl(
                cj.FQ_ADAPTER, xs, ys, sc, window_bits
            )
        )
        g2 = jax.jit(
            lambda xs, ys, sc: msm_ops.window_sums_affine_impl(
                cj.FQ2_ADAPTER, xs, ys, sc, window_bits
            )
        )
        acc_g1 = jax.jit(lambda a, b: cj.proj_add(cj.FQ_ADAPTER, a, b))
        acc_g2 = jax.jit(lambda a, b: cj.proj_add(cj.FQ2_ADAPTER, a, b))
        spk._cache[key] = (g1, g2, acc_g1, acc_g2)
    return spk._cache[key]


def _stream_section(run, acc, xs_host, ys_host, sc_host, chunk: int):
    """Accumulate window sums over host chunks, DOUBLE-BUFFERED: chunk i+1
    is sliced/padded and its device_put issued before chunk i's window-sum
    result is consumed, so the host prep + H2D of the next chunk overlaps
    the device compute of the current one (jax dispatch is async; nothing
    here forces a result). Last chunk zero-padded (zero scalars land in
    bucket 0, all-zero affine rows decode to infinity — both ignored by
    construction)."""
    n = xs_host.shape[0]

    def stage(lo):
        hi = min(lo + chunk, n)
        xs = np.asarray(xs_host[lo:hi], dtype=np.uint16)
        ys = np.asarray(ys_host[lo:hi], dtype=np.uint16)
        sc = np.asarray(sc_host[lo:hi])
        if hi - lo < chunk:
            pad = chunk - (hi - lo)
            xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:], xs.dtype)])
            ys = np.concatenate([ys, np.zeros((pad,) + ys.shape[1:], ys.dtype)])
            sc = np.concatenate([sc, np.zeros((pad,) + sc.shape[1:], sc.dtype)])
        return (jax.device_put(xs), jax.device_put(ys), jax.device_put(sc))

    sums = None
    cur = stage(0)
    for lo in range(0, n, chunk):
        nxt = stage(lo + chunk) if lo + chunk < n else None
        part = run(*cur)
        sums = part if sums is None else acc(sums, part)
        cur = nxt
    return sums


def prove_streamed(
    spk: StreamedProvingKey,
    r: int,
    s: int,
    full_assignment: Sequence[int],
    window_bits: Optional[int] = None,
):
    """Full prove with host-resident query sections (bit-exact vs the
    resident-key prover)."""
    if window_bits is None:
        window_bits = gj.default_window_bits(
            max(spk.n_vars, spk.domain_size)
        )
    chunk = min(spk.chunk_points, 1 << max(spk.n_vars - 1, 1).bit_length())

    from ..utils import trace

    with trace.stage("prove.encode"):
        asg_plain_np = np.asarray(gj._encode_assignment(full_assignment))

    with trace.stage("prove.witness_map"):
        if "witness" not in spk._cache:
            spk._cache["witness"] = _witness_jit(spk)
        h_plain = np.asarray(
            spk._cache["witness"](
                _witness_arrays(spk), jnp.asarray(asg_plain_np)
            )
        )

    g1_run, g2_run, acc_g1, acc_g2 = _chunk_jits(spk, window_bits)

    scalars = (
        asg_plain_np[: spk.n_vars],
        asg_plain_np[: spk.n_vars],
        asg_plain_np[spk.num_inputs : spk.num_inputs + spk.aux_len],
        h_plain,
    )
    g1_sums = []
    for name, (xs_h, ys_h), sc_h in zip(
        ("a", "b1", "l", "h"), spk.g1_sections, scalars
    ):
        n = min(xs_h.shape[0], sc_h.shape[0])
        with trace.stage(f"prove.msm_{name}"):
            g1_sums.append(
                _stream_section(
                    g1_run, acc_g1, xs_h[:n], ys_h[:n], sc_h[:n], chunk
                )
            )
    # stack to the (4, W, pt) layout assemble_proof expects
    g1_sums = jax.tree_util.tree_map(
        lambda *leaves: np.stack([np.asarray(x) for x in leaves]), *g1_sums
    )

    xs2, ys2 = spk.g2_section
    n2 = min(xs2.shape[0], asg_plain_np.shape[0])
    with trace.stage("prove.msm_b2"):
        g2_sums = _stream_section(
            g2_run, acc_g2, xs2[:n2], ys2[:n2], asg_plain_np[:n2], chunk
        )
        g2_sums = jax.tree_util.tree_map(np.asarray, g2_sums)

    with trace.stage("prove.assemble"):
        return gj.assemble_proof(spk, r, s, g1_sums, g2_sums, window_bits)
