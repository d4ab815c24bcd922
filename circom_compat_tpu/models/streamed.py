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

from concurrent.futures import ThreadPoolExecutor
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

# High-water mark of device-visible JAX array bytes, sampled at chunk
# boundaries of the last prove_streamed call — the >HBM evidence channel
# on backends whose device.memory_stats() is unavailable (axon returns
# None). Excludes XLA scratch, but the staged buffers it tracks are
# exactly what a resident prover would have pinned.
LAST_PEAK_LIVE_BYTES = 0


def _sample_live_bytes():
    global LAST_PEAK_LIVE_BYTES
    try:
        now = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                  for a in jax.live_arrays())
    except Exception:
        return
    LAST_PEAK_LIVE_BYTES = max(LAST_PEAK_LIVE_BYTES, now)


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
    """asg_plain (device) -> h_plain limbs, as TWO sequenced donated jits:
    eval_ab (to-mont + both sparse evals + the public-input insert) and
    transforms (the 6-NTT tail, donating a and b). One fused graph wanted
    16.37 GB of HBM at a 2^24 domain
    (measurements/round5/round5_streamed24_oom2.log); sequencing halves
    the live set and lets XLA reuse the donated (n, 16) buffers."""
    num_constraints = spk.num_constraints
    num_inputs = spk.num_inputs
    domain_size = spk.domain_size

    def eval_ab(arrays, asg_plain):
        from ..ops import field_pallas as fp

        if fp.use_pallas():
            asg_mont = fp.fr_to_mont(asg_plain)
        else:
            asg_mont = fj.to_mont_impl(fj.FR, asg_plain)
        n = domain_size
        a = ntt.sparse_eval_impl(
            arrays["a_rows"], arrays["a_cols"], arrays["a_vals"],
            asg_mont, n,
        )
        b = ntt.sparse_eval_impl(
            arrays["b_rows"], arrays["b_cols"], arrays["b_vals"],
            asg_mont, n,
        )
        a = a.at[num_constraints : num_constraints + num_inputs].set(
            asg_mont[:num_inputs]
        )
        return a, b

    def transforms(tables, a, b):
        from ..ops import field_pallas as fp

        plan_t = gj._TracedNTTPlan(domain_size, tables)
        h_mont = ntt.witness_map_from_ab(plan_t, a, b)
        if fp.use_pallas():
            return fp.fr_from_mont(h_mont)
        return fj.from_mont_impl(fj.FR, h_mont)

    ev = jax.jit(eval_ab)
    tr = jax.jit(transforms, donate_argnums=(1, 2))

    def run(arrays, asg_plain):
        a, b = ev(arrays, asg_plain)
        return tr(arrays["ntt"], a, b)

    return run


def _witness_arrays(spk: StreamedProvingKey) -> dict:
    """Witness-map operands: matrices (permanently device-resident spk
    fields) + the active path's NTT tables staged PER PROVE from a cached
    host dict — at a 2^24 domain the four-step tables are ~3 GB and
    pinning them across the MSM chunk loop (which needs every byte of
    HBM) contributed to the round-5 runtime OOM. The per-prove put train
    costs ~bytes/1.48 GB/s and the buffers free as soon as the witness
    jits retire (nothing else references the dict)."""
    from ..utils.xfer import put_chunked

    if "ntt_host" not in spk._cache:
        plan = ntt.get_plan(spk.domain_size)
        spk._cache["ntt_host"] = gj._ntt_tables_for(plan, host=True)
    return {
        "a_rows": spk.a_rows, "a_cols": spk.a_cols, "a_vals": spk.a_vals,
        "b_rows": spk.b_rows, "b_cols": spk.b_cols, "b_vals": spk.b_vals,
        "ntt": {
            k: put_chunked(v) for k, v in spk._cache["ntt_host"].items()
        },
    }


def _init_buckets(F, window_bits: int, lead=()):
    """(*lead, W, B, point) all-identity bucket accumulator (concrete
    buffers so the chunk jits can donate them)."""
    W = msm_ops.num_windows(window_bits)
    B = 1 << window_bits
    return tuple(
        jnp.tile(
            jnp.asarray(c), lead + (W, B) + (1,) * np.ndim(c)
        ).astype(jnp.uint32)
        for c in cj.proj_identity_const(F)
    )


def _chunk_jits(spk: StreamedProvingKey, window_bits: int):
    """Fixed-shape per-chunk graphs (round-4 fused rework).

    The r3 design ran 4-5 separate jits per chunk (orders + one bucket
    update per MSM); through the axon tunnel each dispatch carries a
    35-400 ms fixed cost (BASELINE r1 notes) and the separate graphs deny
    XLA any cross-MSM overlap — measured 23.7 s streamed vs 8.34 s
    resident at 2^20. Now ONE jit per chunk runs the shared per-window
    argsort (A/B1/B2 reuse it — same sharing as the resident core) plus
    ALL FIVE bucket updates into donated (W, B, pt) accumulators, and ONE
    jit runs the five deferred suffix scans at the end (bucket sums are
    additive across chunks, so the O(B log B) scan is paid once per MSM,
    not once per chunk). Scalars travel as uint16 (limb values < 2^16):
    half the H2D bytes; widened on device.
    """
    key = ("chunk", window_bits)
    if key not in spk._cache:
        FQ, FQ2 = cj.FQ_ADAPTER, cj.FQ2_ADAPTER
        cmb1, cmb2 = msm_ops.combine_for(FQ), msm_ops.combine_for(FQ2)
        num_inputs, aux_len = spk.num_inputs, spk.aux_len
        n_vars = spk.n_vars

        def prep(asg_dev, h_dev, P):
            """Device-side per-proof scalar prep: slice the aux window out
            of the assignment and zero-pad all three vectors to the loop
            length P (dynamic_slice CLAMPS at the end — padding makes the
            last chunk read zeros, which land in dropped bucket 0)."""

            def fit(x):
                p = P - x.shape[0]
                x = jnp.pad(x, ((0, p), (0, 0))) if p > 0 else x[:P]
                # plain canonical limb values are < 2^16: store the
                # device-resident copies at u16 (halves their HBM), the
                # fused jit widens the per-chunk slice
                return x.astype(jnp.uint16)

            return (
                fit(asg_dev[:n_vars]),
                fit(asg_dev[num_inputs : num_inputs + aux_len]),
                fit(h_dev),
            )

        def fused(abq, lpk, hpk, sc_asg_full, sc_l_full, sc_h_full, lo,
                  acc_g1, acc_g2):
            # scalars stay DEVICE-RESIDENT for the whole prove (uploaded
            # once / produced on device by the witness jit) and are sliced
            # here — per-chunk scalar H2D and the h_plain D2H round-trip
            # (~4 s at 2^20 through the tunnel) are gone.
            chunk = abq.shape[0]

            def sl(full):
                return jax.lax.dynamic_slice_in_dim(full, lo, chunk, 0)

            # Per-chunk gather packs (round 5): the prefetch thread
            # assembles the (chunk, 128)/(chunk, 32) packed rows HOST-side
            # (_stage_packed_host) so each chunk is three put trains and
            # zero device relayout passes, and every window issues one
            # 256 B A/B1/B2 take + two 64 B L/H takes instead of ten
            # narrow ones (see DeviceProvingKey.abq_pack). The packed body
            # also instantiates the G1 bucket pipeline ONCE (lax.map over
            # the four sections) instead of four times — the fused chunk
            # graph is correspondingly smaller to compile.
            from . import groth16_jax as gj

            oa, ka = msm_ops.window_orders(
                sl(sc_asg_full).astype(jnp.uint32), window_bits
            )
            ol, kl = msm_ops.window_orders(
                sl(sc_l_full).astype(jnp.uint32), window_bits
            )
            oh, kh = msm_ops.window_orders(
                sl(sc_h_full).astype(jnp.uint32), window_bits
            )
            g1_b, g2_b = gj._packed_window_sums(
                abq, lpk, hpk, (oa, ka, ol, kl, oh, kh), window_bits,
                want_buckets=True,
            )
            return cmb1(acc_g1, g1_b), cmb2(acc_g2, g2_b)

        def scans(acc_g1, acc_g2):
            four, W = acc_g1[0].shape[:2]
            g1_flat = jax.tree_util.tree_map(
                lambda x: x.reshape((four * W,) + x.shape[2:]), acc_g1
            )
            g1_sums = msm_ops.windows_from_buckets_impl(FQ, g1_flat)
            g1_sums = jax.tree_util.tree_map(
                lambda x: x.reshape((four, W) + x.shape[1:]), g1_sums
            )
            g2_sums = msm_ops.windows_from_buckets_impl(FQ2, acc_g2)
            return g1_sums, g2_sums

        spk._cache[key] = {
            "fused": jax.jit(fused, donate_argnums=(7, 8)),
            "scans": jax.jit(scans),
            "prep": jax.jit(prep, static_argnums=(2,)),
        }
    return spk._cache[key]


# The axon tunnel's H2D throughput CLIFFS on large single transfers
# (838 MB/s at 4 MB, 26 MB/s at 128 MB); piecewise puts sustain 1.48 GB/s.
# This was the dominant cost of the r3 streamed prover (237 s at 2^22,
# ~2 GB H2D per proof). See utils/xfer.py.
from ..utils.xfer import put_chunked as _put_chunked


def _stage_rows_host(xs_host, ys_host, lo: int, chunk: int):
    """Slice/zero-pad one chunk of affine storage rows into fresh host
    buffers (mmap page-in + memcpy only — NO device transfer). Rows past
    the section end are all-zero = infinity (neutral in ANY bucket under
    the complete group law), so short sections in a shared chunk loop are
    safe even where the shared scalar is nonzero."""
    n = xs_host.shape[0]
    lo_c = min(max(lo, 0), n)
    hi_c = min(lo + chunk, n)
    xs = np.zeros((chunk,) + xs_host.shape[1:], np.uint16)
    ys = np.zeros((chunk,) + ys_host.shape[1:], np.uint16)
    if hi_c > lo_c:
        xs[: hi_c - lo_c] = xs_host[lo_c:hi_c]
        ys[: hi_c - lo_c] = ys_host[lo_c:hi_c]
    return xs, ys


def _stage_packed_host(g1_secs, g2_sec, lo: int, chunk: int):
    """One chunk of the five sections assembled HOST-side into the packed
    gather rows (DeviceProvingKey.abq_pack layout): abq (chunk, 128) =
    [A.x | A.y | B1.x | B1.y | B2.x | B2.y], lpk/hpk (chunk, 32) = [x | y].
    Runs in the prefetch thread (mmap page-in + strided memcpy, no device
    work), so each chunk is THREE put trains and the fused jit gathers
    straight from the arrival buffers — the first streamed-packed cut
    concatenated ten narrow arrays ON DEVICE every chunk, a full extra
    HBM relayout pass per chunk. Rows past a section end stay all-zero =
    infinity, neutral in any bucket."""
    sec_a, sec_b1, sec_l, sec_h = g1_secs
    abq = np.zeros((chunk, 8, 16), np.uint16)
    for j, src in enumerate((sec_a[0], sec_a[1], sec_b1[0], sec_b1[1])):
        n = src.shape[0]
        lo_c, hi_c = min(lo, n), min(lo + chunk, n)
        if hi_c > lo_c:
            abq[: hi_c - lo_c, j] = src[lo_c:hi_c]
    for j, src in enumerate(g2_sec):  # (n, 2, 16) each
        n = src.shape[0]
        lo_c, hi_c = min(lo, n), min(lo + chunk, n)
        if hi_c > lo_c:
            abq[: hi_c - lo_c, 4 + 2 * j : 6 + 2 * j] = src[lo_c:hi_c]

    def xy(sec):
        out = np.zeros((chunk, 2, 16), np.uint16)
        n = sec[0].shape[0]
        lo_c, hi_c = min(lo, n), min(lo + chunk, n)
        if hi_c > lo_c:
            out[: hi_c - lo_c, 0] = sec[0][lo_c:hi_c]
            out[: hi_c - lo_c, 1] = sec[1][lo_c:hi_c]
        return out.reshape(chunk, 32)

    return abq.reshape(chunk, 128), xy(sec_l), xy(sec_h)


def _stream_all(jits, g1_secs, g2_sec, scalars_dev, chunk, window_bits, n):
    """All five MSMs' bucket accumulation over host ROW chunks: one fused
    dispatch per chunk, one scans dispatch at the end. Scalars
    (`scalars_dev` = padded device-resident asg/aux/h vectors) never
    leave the device — the fused jit slices them per chunk.

    Staging schedule: a prefetch thread assembles the packed host rows
    (_stage_packed_host) AND issues chunk i+1's put train while the
    device runs chunk i — the r4-measured overlapped form (15.7 s / 56 s
    at 2^20 / 2^22). A round-5 variant that serialized the put trains
    into device-idle windows (block on chunk i's accumulators before any
    device_put, rationale: tunnel H2D collapses ~30x when concurrent with
    compute) measured a large REGRESSION on chip — 19.0 s / 98.0 s —
    i.e. the concurrent-H2D collapse is still cheaper than paying the
    transfer serially. Kept behind CIRCOM_TPU_STREAM_SERIAL=1 for
    re-evaluation on non-tunnel hardware."""
    import os

    serial = os.environ.get("CIRCOM_TPU_STREAM_SERIAL", "0") == "1"
    sc_asg_f, sc_l_f, sc_h_f = scalars_dev

    accs = (
        _init_buckets(cj.FQ_ADAPTER, window_bits, lead=(4,)),
        _init_buckets(cj.FQ2_ADAPTER, window_bits),
    )

    def stage_host(lo):
        return _stage_packed_host(g1_secs, g2_sec, lo, chunk)

    def stage_put(lo):
        return [_put_chunked(b) for b in stage_host(lo)]

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(stage_host if serial else stage_put, 0)
        if serial:
            jax.block_until_ready(scalars_dev)
        for lo in range(0, n, chunk):
            cur = fut.result()
            if lo + chunk < n:
                fut = pool.submit(
                    stage_host if serial else stage_put, lo + chunk
                )
            if serial:
                # wait for the previous chunk's compute so the put train
                # runs device-idle, then transfer
                jax.block_until_ready(accs)
                cur = [_put_chunked(b) for b in cur]
            accs = jits["fused"](
                *cur, sc_asg_f, sc_l_f, sc_h_f, np.int32(lo), *accs
            )
            del cur
            _sample_live_bytes()
            if os.environ.get("CIRCOM_TPU_STREAM_DEBUG", "0") == "1":
                jax.block_until_ready(accs)
                print(
                    f"[stream] chunk lo={lo} done, live "
                    f"{LAST_PEAK_LIVE_BYTES/1e9:.2f} GB peak",
                    flush=True,
                )
    return jits["scans"](*accs)


def prove_streamed(
    spk: StreamedProvingKey,
    r: int,
    s: int,
    full_assignment: Sequence[int],
    window_bits: Optional[int] = None,
):
    """Full prove with host-resident query sections (bit-exact vs the
    resident-key prover)."""
    chunk = min(spk.chunk_points, 1 << max(spk.n_vars - 1, 1).bit_length())
    if window_bits is None:
        # The per-sort n of the chunked Pippenger is CHUNK, not the total
        # point count — and bucket memory scales 2^w: sizing w from the
        # 2^24 total picked w17, whose (4, W, B, pt) accumulators + the
        # per-chunk bucket outputs alone cost ~9 GB and OOM'd the first
        # 2^24 chunk loop at runtime (round5_streamed24_oom3.log). Sizing
        # from the chunk gives the same w the resident core would pick
        # for a chunk-sized key (w13 at 2^20) with ~190 MB accumulators.
        window_bits = gj.default_window_bits(chunk)

    from ..utils import trace

    with trace.stage("prove.encode"):
        asg_plain_np = np.asarray(gj._encode_assignment(full_assignment))

    # Rows past their scalar vector would be gathered with an implicit ZERO
    # scalar (bucket 0, dropped) — correct for Groth16's layout only
    # because every section is <= its scalar length. Fail loudly on a
    # malformed key instead of silently dropping real points (ADVICE r3).
    sec_a, sec_b1, sec_l, sec_h = spk.g1_sections
    checks = [
        ("A", sec_a, spk.n_vars), ("B1", sec_b1, spk.n_vars),
        ("L", sec_l, spk.aux_len), ("H", sec_h, spk.domain_size),
        ("B2", spk.g2_section, spk.n_vars),
    ]
    for name, sec, limit in checks:
        if sec[0].shape[0] > limit:
            raise ValueError(
                f"streamed prove: section {name} has {sec[0].shape[0]} rows "
                f"but only {limit} scalars cover them"
            )

    n = max(max(s[0].shape[0] for s in spk.g1_sections),
            spk.g2_section[0].shape[0], spk.n_vars, spk.domain_size)
    P = -(-n // chunk) * chunk  # loop length the device scalars pad to

    jits = _chunk_jits(spk, window_bits)

    global LAST_PEAK_LIVE_BYTES
    LAST_PEAK_LIVE_BYTES = 0
    with trace.stage("prove.witness_map"):
        if "witness" not in spk._cache:
            spk._cache["witness"] = _witness_jit(spk)
        asg_dev = _put_chunked(asg_plain_np)
        # h stays DEVICE-resident: its D2H + per-chunk re-upload was ~4 s
        # of the 2^20 streamed prove (scripts/ablate_streamed.py)
        h_dev = spk._cache["witness"](_witness_arrays(spk), asg_dev)
        scalars_dev = jits["prep"](asg_dev, h_dev, P)
        del asg_dev, h_dev  # only the padded u16 copies stay live

    with trace.stage("prove.msm_stream"):
        g1_sums, g2_sums = _stream_all(
            jits, spk.g1_sections, spk.g2_section, scalars_dev,
            chunk, window_bits, n,
        )
        g1_sums = jax.tree_util.tree_map(np.asarray, g1_sums)
        g2_sums = jax.tree_util.tree_map(np.asarray, g2_sums)
        _sample_live_bytes()

    with trace.stage("prove.assemble"):
        return gj.assemble_proof(spk, r, s, g1_sums, g2_sums, window_bits)
