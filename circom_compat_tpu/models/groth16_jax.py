"""Groth16 prover, device backend: NTT witness map + Pippenger MSMs.

Mirrors ark_groth16::create_proof_with_reduction_and_matrices as invoked by
the reference (reference: src/zkey.rs:903-912): witness map via
CircomReduction (device NTT, ops/ntt.py), then MSMs over the zkey query
sections — A(G1), B1(G1), B2(G2), L(G1, aux), H(G1) — with the r,s
randomizer algebra done host-side on the five tiny results.

Graph-size discipline: the four G1 MSMs are padded to one shape and run
through a single lax.map'd window-sums body, so the (expensive to compile)
bucket-scan graph is instantiated once for G1 and once for G2 per proof
function — not five times.

The DeviceProvingKey stages the zkey's Montgomery limb arrays onto the
device once (sorted COO matrices + query points); repeated proofs reuse it
(the "checkpoint/resume" analogue per SURVEY §5 — PK device residency).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..circom.zkey import ConstraintMatrices, ProvingKey
from ..constants import R_SCALAR
from ..ops import curve_jax as cj
from ..ops import field_jax as fj
from ..ops import limbs as limb_codec
from ..ops import msm as msm_ops
from ..ops import ntt


def _sorted_coo(rows, cols, vals_mont_u16):
    from ..utils.xfer import put_chunked

    order = np.argsort(np.asarray(rows), kind="stable")
    r = np.asarray(rows, np.int32)[order]
    c = np.asarray(cols, np.int32)[order]
    v = np.asarray(vals_mont_u16, np.uint16)[order]  # widened on device
    return put_chunked(r), put_chunked(c), put_chunked(v)


def _pad_rows_np(arr: np.ndarray, target: int) -> np.ndarray:
    if arr.shape[0] >= target:
        return np.asarray(arr)[:target]
    pad = np.zeros((target - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([np.asarray(arr), pad], axis=0)


@dataclass
class DeviceProvingKey:
    """Device-resident, limb-decomposed proving key + matrices."""

    pk: ProvingKey  # host copy (for vk + tiny base points)
    num_inputs: int
    num_constraints: int
    domain_size: int
    n_vars: int
    aux_len: int
    # matrices (sorted COO, Montgomery values)
    a_rows: jnp.ndarray
    a_cols: jnp.ndarray
    a_vals: jnp.ndarray
    b_rows: jnp.ndarray
    b_cols: jnp.ndarray
    b_vals: jnp.ndarray
    # G1 queries stacked [a, b1, l, h], padded to one length:
    # (4, N_max, 16) x and y (affine Montgomery; all-zero row = infinity).
    # Query/value limb arrays are staged in uint16 (zkey wire width) and
    # widened to the kernels' uint32 on device inside the prove core.
    g1_stack_x: jnp.ndarray
    g1_stack_y: jnp.ndarray
    g1_lengths: tuple  # true lengths (n_vars, n_vars, aux_len, h_len)
    # G2 query (B2): ((n_max, 2, 16), (n_max, 2, 16)), zero-padded
    b_g2_query: tuple
    g2_len: int = 0  # true (unpadded) B2 section length
    _cache: dict = field(default_factory=dict, repr=False)

    @staticmethod
    def build(
        pk: ProvingKey, matrices, num_constraints: int, num_inputs: Optional[int] = None
    ) -> "DeviceProvingKey":
        from ..utils import trace

        with trace.stage("key.stage"):
            return DeviceProvingKey._build(
                pk, matrices, num_constraints, num_inputs
            )

    @staticmethod
    def _build(
        pk: ProvingKey, matrices, num_constraints: int, num_inputs: Optional[int] = None
    ) -> "DeviceProvingKey":
        if num_inputs is None:
            num_inputs = matrices.num_instance_variables

        # Fill the final stacked layout in ONE widening pass per coordinate,
        # straight from the (possibly mmap-backed) uint16 section views — the
        # astype+stack+pad chain this replaces copied the ~1 GB of 2^20-scale
        # query points five times over.
        # Stage in uint16 — the zkey's own limb width. Widening to the
        # kernels' uint32 happens ON DEVICE at the top of the prove core:
        # halves the host->device bytes (which ride a ~1 GB/s tunnel under
        # axon) and avoids host-side cast passes over GB-scale sections.
        sections = (pk.a_query, pk.b_g1_query, pk.l_query, pk.h_query)
        lengths = tuple(len(s) for s in sections)
        n_max = max(lengths)
        xs = np.zeros((4, n_max, 16), np.uint16)
        ys = np.zeros((4, n_max, 16), np.uint16)
        for k, sec in enumerate(sections):
            n = len(sec)
            xs[k, :n] = sec.limbs[:, 0]
            ys[k, :n] = sec.limbs[:, 1]

        # G2 padded to the same n_max as the G1 stack (all-zero rows decode
        # to infinity) so the B2 MSM can reuse the assignment's window sort.
        g2_src = pk.b_g2_query.limbs  # (n, 4, 16) uint16
        n2 = g2_src.shape[0]
        g2_x = np.zeros((n_max, 2, 16), np.uint16)
        g2_y = np.zeros((n_max, 2, 16), np.uint16)
        g2_x[:n2] = g2_src[:, 0:2]
        g2_y[:n2] = g2_src[:, 2:4]

        ar, ac, av = _sorted_coo(matrices.a_rows, matrices.a_cols, matrices.a_values_mont)
        br, bc, bv = _sorted_coo(matrices.b_rows, matrices.b_cols, matrices.b_values_mont)
        from ..utils.xfer import put_chunked

        def put_stack(a):  # (4, n, 16): chunk along the flattened rows
            return put_chunked(a.reshape(-1, a.shape[-1])).reshape(a.shape)

        return DeviceProvingKey(
            pk=pk,
            num_inputs=num_inputs,
            num_constraints=num_constraints,
            domain_size=pk.domain_size,
            n_vars=lengths[0],
            aux_len=lengths[2],
            a_rows=ar, a_cols=ac, a_vals=av,
            b_rows=br, b_cols=bc, b_vals=bv,
            g1_stack_x=put_stack(xs),
            g1_stack_y=put_stack(ys),
            g1_lengths=lengths,
            b_g2_query=(put_chunked(g2_x), put_chunked(g2_y)),
            g2_len=n2,
        )

    @staticmethod
    def from_matrix_rows(pk, rows_a, rows_b, num_inputs, num_constraints):
        """Build from [(value, signal)] row lists (circuit-derived path)."""

        def coo(rows_list):
            rows, cols, vals = [], [], []
            for ri, entries in enumerate(rows_list):
                for v, sig in entries:
                    rows.append(ri)
                    cols.append(sig)
                    vals.append((v << 256) % R_SCALAR)
            vals16 = (
                limb_codec.ints_to_limbs(vals, dtype=np.uint16)
                if vals
                else np.zeros((0, 16), np.uint16)
            )
            return np.array(rows, np.int32), np.array(cols, np.int32), vals16

        ar_, ac_, av_ = coo(rows_a)
        br_, bc_, bv_ = coo(rows_b)

        class _Shim:
            num_instance_variables = num_inputs
            a_rows, a_cols, a_values_mont = ar_, ac_, av_
            b_rows, b_cols, b_values_mont = br_, bc_, bv_

        return DeviceProvingKey.build(pk, _Shim, num_constraints, num_inputs)


def _witness_map_mont(dpk: DeviceProvingKey, asg_mont: jnp.ndarray) -> jnp.ndarray:
    plan = ntt.get_plan(dpk.domain_size)
    return ntt.witness_map_impl(
        plan,
        dpk.a_rows, dpk.a_cols, dpk.a_vals,
        dpk.b_rows, dpk.b_cols, dpk.b_vals,
        asg_mont,
        dpk.num_constraints,
        dpk.num_inputs,
    )


def _device_arrays(dpk: DeviceProvingKey) -> dict:
    """All large device buffers of the prove core as ONE pytree, passed as
    jit ARGUMENTS. Closure-capturing them embeds ~GBs of literals in the
    HLO at 2^20 scale, which breaks the axon remote-compile transport (and
    bloats any compile); as arguments they ship as device buffers."""
    if "arrays" not in dpk._cache:
        plan = ntt.get_plan(dpk.domain_size)
        dpk._cache["arrays"] = {
            "a_rows": dpk.a_rows, "a_cols": dpk.a_cols, "a_vals": dpk.a_vals,
            "b_rows": dpk.b_rows, "b_cols": dpk.b_cols, "b_vals": dpk.b_vals,
            "g1_x": dpk.g1_stack_x, "g1_y": dpk.g1_stack_y,
            "g2_x": dpk.b_g2_query[0], "g2_y": dpk.b_g2_query[1],
            "ntt": {
                "tw_fwd": jnp.asarray(plan.tw_fwd),
                "tw_inv": jnp.asarray(plan.tw_inv),
                "coset": jnp.asarray(plan.coset),
                "bitrev": jnp.asarray(plan.bitrev),
                "n_inv": jnp.asarray(plan.n_inv),
                # limb-major tables for the Pallas witness-map pipeline:
                # four-step tables for domains >= 4096, flat DIF/DIT
                # tables otherwise (ntt._witness_map_transforms_lm)
                **(
                    {
                        "t3_fwd_lm": jnp.asarray(plan.t3_fwd_lm),
                        "t3_inv_lm": jnp.asarray(plan.t3_inv_lm),
                        "coset4_lm": jnp.asarray(plan.coset4_lm),
                        "tw1_fwd_lm": jnp.asarray(plan.tw1_fwd_lm),
                        "tw1_inv_lm": jnp.asarray(plan.tw1_inv_lm),
                        "tw2_fwd_lm": jnp.asarray(plan.tw2_fwd_lm),
                        "tw2_inv_lm": jnp.asarray(plan.tw2_inv_lm),
                    }
                    if plan.n >= ntt.FOUR_STEP_MIN
                    else {
                        "tw_fwd_lm": jnp.asarray(plan.tw_fwd_lm),
                        "tw_inv_lm": jnp.asarray(plan.tw_inv_lm),
                        "coset_inv_bitrev_lm": jnp.asarray(plan.coset_inv_bitrev_lm),
                    }
                ),
            },
        }
    return dpk._cache["arrays"]


def _scalar_stack(dpk: DeviceProvingKey, asg_plain: jnp.ndarray, h_plain: jnp.ndarray):
    """(4, N_max, 16) scalars for [a, b1, l, h]; padding rows are zero."""
    n_max = dpk.g1_stack_x.shape[1]

    def fit(sc, true_len):
        sc = sc[:true_len]
        return jnp.pad(sc, ((0, n_max - sc.shape[0]), (0, 0)))

    la, lb1, ll, lh = dpk.g1_lengths
    return jnp.stack(
        [
            fit(asg_plain, la),
            fit(asg_plain, lb1),
            fit(asg_plain[dpk.num_inputs : dpk.num_inputs + dpk.aux_len], ll),
            fit(h_plain, lh),
        ]
    )


class _TracedNTTPlan:
    """NTTPlan look-alike whose tables are traced arrays (jit arguments)
    while n/log_n stay static — drop-in for ntt's *_impl functions."""

    def __init__(self, n: int, tables: dict):
        self.n = n
        self.log_n = n.bit_length() - 1
        self.tw_fwd = tables["tw_fwd"]
        self.tw_inv = tables["tw_inv"]
        self.coset = tables["coset"]
        self.bitrev = tables["bitrev"]
        self.n_inv = tables["n_inv"]
        for key in (
            "tw_fwd_lm", "tw_inv_lm", "coset_inv_bitrev_lm",
            "t3_fwd_lm", "t3_inv_lm", "coset4_lm",
            "tw1_fwd_lm", "tw1_inv_lm", "tw2_fwd_lm", "tw2_inv_lm",
        ):
            if key in tables:
                setattr(self, key, tables[key])

    @property
    def n1(self):
        return 1 << (self.log_n // 2)

    @property
    def n2(self):
        return self.n // self.n1


def _prove_core(dpk: DeviceProvingKey, window_bits: int):
    """(arrays, assignment plain limbs) -> (g1 window sums (4, W, pt), g2 (W, pt)).

    `arrays` is the _device_arrays pytree: every large buffer is a traced
    ARGUMENT so the compiled HLO contains no GB-scale literals (critical
    for 2^20 keys and the axon remote-compile transport). Only small
    static metadata (sizes, window bits) is baked into the graph."""
    num_constraints = dpk.num_constraints
    num_inputs = dpk.num_inputs
    domain_size = dpk.domain_size
    g1_lengths = dpk.g1_lengths
    aux_len = dpk.aux_len
    g2_len = dpk.g2_len

    def core(arrays, asg_plain):
        plan_t = _TracedNTTPlan(domain_size, arrays["ntt"])
        from ..ops import field_pallas as fp

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
            h_plain = fp.fr_from_mont(h_mont)
        else:
            h_plain = fj.from_mont_impl(fj.FR, h_mont)

        n_max = arrays["g1_x"].shape[1]

        def fit(sc, true_len):
            sc = sc[:true_len]
            return jnp.pad(sc, ((0, n_max - sc.shape[0]), (0, 0)))

        la, lb1, ll, lh = g1_lengths
        sc_a = fit(asg_plain, la)
        sc_b1 = sc_a if lb1 == la else fit(asg_plain, lb1)
        sc_l = fit(asg_plain[num_inputs : num_inputs + aux_len], ll)
        sc_h = fit(h_plain, lh)
        sc = jnp.stack([sc_a, sc_b1, sc_l, sc_h])

        # A, B1 and B2 share the assignment scalars, so their per-window
        # argsorts are identical: compute each distinct scalar set's sort
        # ONCE (msm_ops.window_orders) and feed the sums precomputed
        # (orders, keys). Chunked window sums re-index per chunk, so the
        # sharing only applies when one chunk covers n_max.
        share = n_max <= msm_ops.CHUNK_POINTS
        if share:
            oa, ka = msm_ops.window_orders(sc_a, window_bits)
            ob1, kb1 = (
                (oa, ka) if sc_b1 is sc_a
                else msm_ops.window_orders(sc_b1, window_bits)
            )
            ol, kl = msm_ops.window_orders(sc_l, window_bits)
            oh, kh = msm_ops.window_orders(sc_h, window_bits)
            orders = jnp.stack([oa, ob1, ol, oh])
            keys = jnp.stack([ka, kb1, kl, kh])

            def g1_one(args):
                xs, ys, s, o, k = args
                # uint16 affine rows go straight into the per-window
                # gathers (64 B/point); widen + projective encode happen
                # post-gather
                return msm_ops.window_sums_affine_impl(
                    cj.FQ_ADAPTER, xs, ys, s, window_bits, precomp=(o, k)
                )

            g1_sums = jax.lax.map(
                g1_one, (arrays["g1_x"], arrays["g1_y"], sc, orders, keys)
            )
            if g2_len == la:
                sc2, pre2 = sc_a, (oa, ka)
            else:
                sc2 = fit(asg_plain, g2_len)
                pre2 = msm_ops.window_orders(sc2, window_bits)
            g2_sums = msm_ops.window_sums_affine_impl(
                cj.FQ2_ADAPTER, arrays["g2_x"], arrays["g2_y"],
                sc2, window_bits, precomp=pre2,
            )
        else:

            def g1_one(args):
                xs, ys, s = args
                return msm_ops.window_sums_affine_impl(
                    cj.FQ_ADAPTER, xs, ys, s, window_bits
                )

            g1_sums = jax.lax.map(
                g1_one, (arrays["g1_x"], arrays["g1_y"], sc)
            )
            g2_sums = msm_ops.window_sums_affine_impl(
                cj.FQ2_ADAPTER, arrays["g2_x"], arrays["g2_y"],
                fit(asg_plain, g2_len), window_bits,
            )
        return g1_sums, g2_sums

    return core


def default_window_bits(n: Optional[int] = None) -> int:
    """Size-tuned window on TPU (ops/msm.pick_window_bits, validated by the
    2^20 sweep); fixed 8 on the CPU-simulated test mesh, where the large
    bucket shapes are too heavy."""
    import jax

    if jax.default_backend() == "cpu":
        return 8
    if n is None:
        return 13
    return msm_ops.pick_window_bits(n)





def get_prove_core(dpk: DeviceProvingKey, window_bits: Optional[int] = None):
    """Returns run(asg_plain) -> (g1_sums, g2_sums); the underlying jitted
    function takes the key arrays as arguments (see _prove_core)."""
    if window_bits is None:
        window_bits = default_window_bits(max(dpk.n_vars, dpk.domain_size))
    key = ("core", window_bits)
    if key not in dpk._cache:
        jitted = jax.jit(_prove_core(dpk, window_bits))
        arrays = _device_arrays(dpk)
        dpk._cache[key] = lambda asg_plain: jitted(arrays, asg_plain)
    return dpk._cache[key]


def assemble_proof(dpk, r, s, g1_sums, g2_sums, window_bits):
    """Host: decode window sums, Horner-fold, apply r,s randomizer algebra."""
    from ..refmath import curve as rc
    from .groth16 import Proof

    g1d = cj.decode_g1_proj(g1_sums)  # (4*W) flattened row-major
    w = g1_sums[0].shape[1]
    folds = [
        msm_ops._fold_windows_host(g1d[i * w : (i + 1) * w], rc.G1, window_bits)
        for i in range(4)
    ]
    g_a_msm, g_b1_msm, g_l, g_h = folds
    g_b2_msm = msm_ops._fold_windows_host(cj.decode_g2_proj(g2_sums), rc.G2, window_bits)

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


def _encode_assignment(full_assignment) -> np.ndarray:
    """Assignment -> (N, 16) uint32 canonical limbs. ndarray inputs (from
    WitnessCalculator.calculate_witness_limbs / read_wtns_limbs) are
    already canonical limb rows and skip the Python-int pass entirely."""
    if isinstance(full_assignment, np.ndarray) and full_assignment.ndim == 2:
        return np.ascontiguousarray(full_assignment, dtype=np.uint32)
    assignment = [int(a) % R_SCALAR for a in full_assignment]
    return fj.encode_plain(assignment)


def prove_prepared(
    dpk: DeviceProvingKey,
    r: int,
    s: int,
    full_assignment: Sequence[int],
    window_bits: Optional[int] = None,
):
    from ..utils import trace

    if window_bits is None:
        window_bits = default_window_bits(max(dpk.n_vars, dpk.domain_size))
    with trace.stage("prove.encode"):
        from ..utils.xfer import put_chunked

        # chunked H2D: a 2^20 assignment is 64 MB and the axon tunnel's
        # monolithic device_put collapses to ~30 MB/s at that size
        asg_plain = put_chunked(_encode_assignment(full_assignment))
    # jax dispatch is async: "device" includes the window-sum readback that
    # forces the computation; "dispatch" is trace+enqueue only.
    with trace.stage("prove.device"):
        core = get_prove_core(dpk, window_bits)
        with trace.stage("dispatch"):
            g1_sums, g2_sums = core(asg_plain)
        g1_sums = jax.tree_util.tree_map(np.asarray, g1_sums)
        g2_sums = jax.tree_util.tree_map(np.asarray, g2_sums)
    with trace.stage("prove.assemble"):
        return assemble_proof(dpk, r, s, g1_sums, g2_sums, window_bits)


def prove(
    pk: ProvingKey,
    r: int,
    s: int,
    matrices,
    num_inputs: int,
    num_constraints: int,
    full_assignment: Sequence[int],
    window_bits: Optional[int] = None,
):
    """Device-backed prove; drop-in for the host backend in models/groth16.py."""
    if isinstance(matrices, ConstraintMatrices):
        dpk = DeviceProvingKey.build(pk, matrices, num_constraints)
    else:
        dpk = DeviceProvingKey.from_matrix_rows(
            pk, matrices.a, matrices.b, num_inputs, num_constraints
        )
    return prove_prepared(dpk, r, s, full_assignment, window_bits)