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
from ..ops import segments


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
    # Query sections in GATHER-PACKED layout (round 5): the A, B1 and B2
    # MSMs of a proof share one scalar vector (the assignment), hence one
    # per-window sort permutation — so their affine rows are interleaved
    # into ONE (N_max, 128) uint16 array [A.x | A.y | B1.x | B1.y | B2.x0
    # B2.x1 | B2.y0 B2.y1] and each window's six coordinate gathers become
    # ONE 256 B-row take. Measured (scripts/bench_gather2.py, 2^20, v5e):
    # XLA's take is per-ROW issue-bound — 32 B rows gather in 19.1 ms,
    # 256 B rows in 15.0 ms — so the packed gather is ~8x cheaper than six
    # narrow ones, the post-gather slices + u32 widen are free, BUT ONLY
    # for 2-D operands: a (N, 8, 16) 3-D layout of the same bytes gathers
    # at 94 ms (take-3d-w256B) — hence the flat trailing axis here. L and
    # H have their own scalar orders and ride (N_max, 32) xy-packs.
    # All-zero rows = infinity (zkey convention); uint16 is the zkey wire
    # width, widened on device post-gather.
    abq_pack: jnp.ndarray  # (N_max, 128) uint16
    l_pack: jnp.ndarray  # (N_max, 32) uint16 [x | y]
    h_pack: jnp.ndarray  # (N_max, 32) uint16
    g1_lengths: tuple  # true lengths (n_vars, n_vars, aux_len, h_len)
    g2_len: int = 0  # true (unpadded) B2 section length
    _cache: dict = field(default_factory=dict, repr=False)

    @property
    def n_points(self) -> int:
        return self.abq_pack.shape[0]

    # Legacy (4, N_max, 16) stacked views for the sharded/multihost
    # builders, materialized on demand (those paths re-pad into their own
    # layouts at build time, so the transient copy is short-lived).
    @property
    def g1_stack_x(self):
        return jnp.stack([
            self.abq_pack[:, 0:16], self.abq_pack[:, 32:48],
            self.l_pack[:, 0:16], self.h_pack[:, 0:16],
        ])

    @property
    def g1_stack_y(self):
        return jnp.stack([
            self.abq_pack[:, 16:32], self.abq_pack[:, 48:64],
            self.l_pack[:, 16:32], self.h_pack[:, 16:32],
        ])

    @property
    def b_g2_query(self):
        n = self.abq_pack.shape[0]
        return (
            self.abq_pack[:, 64:96].reshape(n, 2, 16),
            self.abq_pack[:, 96:128].reshape(n, 2, 16),
        )

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

        # Fill the gather-packed layout in ONE pass per coordinate straight
        # from the (possibly mmap-backed) uint16 section views. Stage in
        # uint16 — the zkey's own limb width. Widening to the kernels'
        # uint32 happens ON DEVICE post-gather inside the prove core:
        # halves the host->device bytes (which ride a ~1 GB/s tunnel under
        # axon) and avoids host-side cast passes over GB-scale sections.
        # All padding rows stay zero = infinity, neutral in any bucket.
        sections = (pk.a_query, pk.b_g1_query, pk.l_query, pk.h_query)
        lengths = tuple(len(s) for s in sections)
        n_max = max(lengths)
        g2_src = pk.b_g2_query.limbs  # (n, 4, 16) uint16
        n2 = g2_src.shape[0]

        abq = np.zeros((n_max, 128), np.uint16)
        abq_v = abq.reshape(n_max, 8, 16)
        a_l, b1_l = lengths[0], lengths[1]
        abq_v[:a_l, 0:2] = pk.a_query.limbs
        abq_v[:b1_l, 2:4] = pk.b_g1_query.limbs
        abq_v[:n2, 4:8] = g2_src

        def xy_pack(sec):
            n = len(sec)
            out = np.zeros((n_max, 32), np.uint16)
            out.reshape(n_max, 2, 16)[:n] = sec.limbs
            return out

        ar, ac, av = _sorted_coo(matrices.a_rows, matrices.a_cols, matrices.a_values_mont)
        br, bc, bv = _sorted_coo(matrices.b_rows, matrices.b_cols, matrices.b_values_mont)
        from ..utils.xfer import put_chunked as put_rows

        return DeviceProvingKey(
            pk=pk,
            num_inputs=num_inputs,
            num_constraints=num_constraints,
            domain_size=pk.domain_size,
            n_vars=lengths[0],
            aux_len=lengths[2],
            a_rows=ar, a_cols=ac, a_vals=av,
            b_rows=br, b_cols=bc, b_vals=bv,
            abq_pack=put_rows(abq),
            l_pack=put_rows(xy_pack(pk.l_query)),
            h_pack=put_rows(xy_pack(pk.h_query)),
            g1_lengths=lengths,
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


def _ntt_tables_for(plan, host: bool = False) -> dict:
    """The NTT tables the ACTIVE witness-map path reads — and nothing
    else. The Pallas limb-major pipeline (TPU, n >= 1024) never touches
    the flat (n, 16) tw/coset tables or bitrev, which cost 3+ GB of HBM
    at a 2^24 domain; the XLA fallback path (CPU mesh, tiny domains)
    needs exactly those and none of the lm variants. With host=True the
    tables come back as numpy (the lm plan attributes are recomputing
    @properties — callers that restage per prove cache the host dict)."""
    from ..ops import field_pallas as fp

    conv = np.asarray if host else jnp.asarray
    pallas_map = fp.use_pallas() and plan.n >= 1024
    tables = {"n_inv": conv(plan.n_inv)}
    if not pallas_map:
        tables.update(
            tw_fwd=conv(plan.tw_fwd),
            tw_inv=conv(plan.tw_inv),
            coset=conv(plan.coset),
            bitrev=conv(plan.bitrev),
        )
        return tables
    # limb-major tables for the Pallas witness-map pipeline: four-step
    # tables for domains >= FOUR_STEP_MIN, flat DIF/DIT tables otherwise
    # (ntt._witness_map_transforms_lm)
    if plan.n >= ntt.FOUR_STEP_MIN:
        keys = ("t3_fwd_lm", "t3_inv_lm", "coset4_lm", "tw1_fwd_lm",
                "tw1_inv_lm", "tw2_fwd_lm", "tw2_inv_lm")
    else:
        keys = ("tw_fwd_lm", "tw_inv_lm", "coset_inv_bitrev_lm")
    for key in keys:
        tables[key] = conv(getattr(plan, key))
    return tables


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
            "abq": dpk.abq_pack, "lpk": dpk.l_pack, "hpk": dpk.h_pack,
            "ntt": _ntt_tables_for(plan),
        }
    return dpk._cache["arrays"]


def _scalar_stack(dpk: DeviceProvingKey, asg_plain: jnp.ndarray, h_plain: jnp.ndarray):
    """(4, N_max, 16) scalars for [a, b1, l, h]; padding rows are zero."""
    n_max = dpk.n_points

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
        self.n_inv = tables["n_inv"]
        # only the tables the active path staged exist (_ntt_tables_for);
        # the code paths that read an attribute are exactly the ones whose
        # tables were staged for this backend/domain
        for key in (
            "tw_fwd", "tw_inv", "coset", "bitrev",
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

        n_max = arrays["abq"].shape[0]

        def fit(sc, true_len):
            sc = sc[:true_len]
            return jnp.pad(sc, ((0, n_max - sc.shape[0]), (0, 0)))

        la, lb1, ll, lh = g1_lengths
        sc_a = fit(asg_plain, la)
        sc_l = fit(asg_plain[num_inputs : num_inputs + aux_len], ll)
        sc_h = fit(h_plain, lh)
        # A, B1 and B2 share the assignment scalar vector (reference: the
        # a_i driving ark-groth16's three query MSMs), so one per-window
        # argsort serves all three; L and H sort their own scalars. Beyond
        # the shared sort, the round-5 layout shares the per-window GATHER:
        # rows of the abq pack carry all six A/B1/B2 coordinates, so each
        # window issues ONE 256 B-row take + two 64 B-row takes (L, H)
        # instead of ten narrow ones — see DeviceProvingKey.abq_pack.
        oa, ka = msm_ops.window_orders(sc_a, window_bits)
        ol, kl = msm_ops.window_orders(sc_l, window_bits)
        oh, kh = msm_ops.window_orders(sc_h, window_bits)

        return _packed_window_sums(
            arrays["abq"], arrays["lpk"], arrays["hpk"],
            (oa, ka, ol, kl, oh, kh), window_bits,
        )

    return core


def _packed_window_sums(abq, lpk, hpk, sorts, window_bits, _ablate=None,
                        want_buckets=False):
    """All five MSMs' window sums from packed rows + precomputed sorts.

    Returns ((4, W, pt) G1 sums for [A, B1, L, H], (W, pt) G2 sums); with
    want_buckets=True the suffix scans are deferred and the shapes are
    ((4, W, B, pt), (W, B, pt)) — bucket sums are additive across point
    subsets, which is what the streamed provers accumulate per chunk. The
    per-window body gathers the 256 B abq rows once (A/B1/B2 share the
    order), the L/H xy-packs once each, then runs ONE instantiation of the
    G1 bucket pipeline (lax.map over the four gathered sets) and one G2.

    Rows beyond CHUNK_POINTS are processed in an inner chunk loop: chunk
    slices of a sorted key vector stay sorted, bucket sums are additive
    across chunks, and the tail chunk's (order 0, key 0) padding lands in
    bucket 0 which the suffix scan drops — so peak per-window transients
    stay bounded at any N.

    _ablate: in-jit measurement hook for scripts/ablate_core20.py (the
    only attribution method that survives the axon tunnel): "no-g2" drops
    the B2 pipeline (identity output), "no-gather" replaces the three
    takes with contiguous slices (same downstream shapes/work)."""
    FQ, FQ2 = cj.FQ_ADAPTER, cj.FQ2_ADAPTER
    cmb1, cmb2 = msm_ops.combine_for(FQ), msm_ops.combine_for(FQ2)
    leaf1, leaf2 = msm_ops.leaf_combine_for(FQ), msm_ops.leaf_combine_for(FQ2)
    ts1, ts2 = msm_ops.tile_scans_for(FQ), msm_ops.tile_scans_for(FQ2)
    ident1 = tuple(jnp.asarray(c) for c in cj.proj_identity_const(FQ))
    ident2 = tuple(jnp.asarray(c) for c in cj.proj_identity_const(FQ2))
    B = 1 << window_bits
    N = abq.shape[0]
    CH = min(N, msm_ops.CHUNK_POINTS)
    pad = (-N) % CH
    C = (N + pad) // CH
    sorts = tuple(
        jnp.pad(s, ((0, 0), (0, pad))).reshape(s.shape[0], C, CH)
        for s in sorts
    )

    def per_chunk(t):
        o_a, k_a, o_l, k_l, o_h, k_h = t
        ch = o_a.shape[0]
        if _ablate == "no-gather":
            big = abq[:ch].astype(jnp.uint32)
            lg = lpk[:ch].astype(jnp.uint32)
            hg = hpk[:ch].astype(jnp.uint32)
        else:
            # 2-D gathers only — a 3-D operand of the same bytes is ~6x
            # slower (take-3d-* rows in scripts/bench_gather2.py)
            big = abq.at[o_a].get(
                mode="promise_in_bounds"
            ).astype(jnp.uint32)  # (CH, 128)
            lg = lpk.at[o_l].get(
                mode="promise_in_bounds"
            ).astype(jnp.uint32)  # (CH, 32)
            hg = hpk.at[o_h].get(
                mode="promise_in_bounds"
            ).astype(jnp.uint32)
        xs4 = jnp.stack([
            big[:, 0:16], big[:, 32:48], lg[:, 0:16], hg[:, 0:16]
        ])
        ys4 = jnp.stack([
            big[:, 16:32], big[:, 48:64], lg[:, 16:32], hg[:, 16:32]
        ])
        keys4 = jnp.stack([k_a, k_a, k_l, k_h])

        def g1_one(args):
            x, y, k = args
            pts = cj.affine_to_proj(FQ, x, y)
            return msm_ops._bucket_reduce(
                cmb1, leaf1, ts1, pts, k, B, ident1
            )

        g1_b = jax.lax.map(g1_one, (xs4, ys4, keys4))  # (4, B, pt)
        if _ablate == "no-g2":
            g2_b = jax.tree_util.tree_map(
                lambda c: jnp.broadcast_to(
                    c, (B,) + np.shape(c)
                ).astype(jnp.uint32),
                ident2,
            )
        else:
            pts2 = cj.affine_to_proj(
                FQ2,
                big[:, 64:96].reshape(ch, 2, 16),
                big[:, 96:128].reshape(ch, 2, 16),
            )
            g2_b = msm_ops._bucket_reduce(
                cmb2, leaf2, ts2, pts2, k_a, B, ident2
            )
        return g1_b, g2_b

    def per_window(t):
        if C == 1:
            g1_b, g2_b = per_chunk(
                jax.tree_util.tree_map(lambda x: x[0], t)
            )
        else:
            g1_parts, g2_parts = jax.lax.map(per_chunk, t)  # (C, ...)
            g1_b = segments.fold(cmb1, g1_parts, ident1)
            g2_b = segments.fold(cmb2, g2_parts, ident2)
        if want_buckets:
            return g1_b, g2_b
        g1_w = jax.lax.map(
            lambda b: msm_ops._scan_buckets(cmb1, ts1, b, ident1), g1_b
        )
        if _ablate == "no-g2":
            g2_w = jax.tree_util.tree_map(
                lambda c: jnp.asarray(c, jnp.uint32), ident2
            )
        else:
            g2_w = msm_ops._scan_buckets(cmb2, ts2, g2_b, ident2)
        return g1_w, g2_w

    g1_wm, g2_sums = jax.lax.map(per_window, sorts)
    # (W, 4, ...) -> (4, W, ...) to match the host fold's layout
    g1_sums = jax.tree_util.tree_map(
        lambda x: jnp.swapaxes(x, 0, 1), g1_wm
    )
    return g1_sums, g2_sums


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