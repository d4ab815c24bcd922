"""Pippenger multi-scalar multiplication on TPU.

Replaces the MSM inside ark-ec that the reference's Groth16 prover spends
its time in (reference: SURVEY §3.4 — "5 MSMs ... THE dominant cost").

The bucket-accumulation scatter (data-dependent in CPU Pippenger) is
reformulated TPU-style: per window, sort point indices by bucket digit,
then a segmented associative scan (O(N) complete projective adds, O(log N) depth)
yields all bucket sums; the classic sum_j j*S_j reduction becomes a
suffix-scan plus tree fold. Everything is static-shaped vector code.

The per-window loop runs under lax.map (sequential, bounds peak memory to
one window's gather). Round-3 ablation note: batching the per-window
coordinate gathers in groups of G windows (one G*N-row gather, u16 or
u32-packed) LOSES end-to-end at 2^20 w13 despite winning a standalone
gather microbench — per-window u16 910k pts/s vs grouped-u16 cap2/4/8 =
825k/779k/750k and grouped-u32 687k — so the grouped path was removed.
The final cross-window Horner fold (256 doublings) is tiny and runs on
host over exact ints, where the Jacobian->affine inversion has to happen
anyway.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS
from . import curve_jax as cj
from . import field_jax as fj
from . import segments

SCALAR_BITS = 254  # BN254 Fr

# Windows per batched gather+reduce group (0 = size-tuned auto). The
# per-window coordinate gathers are the dominant MSM cost (~17 ns/row for
# 32 B rows); gathering G windows' rows in ONE take amortizes the per-row
# overhead (~2x at G=4 in scripts/bench_gather2.py `take-4x`). The round-3
# grouped-gather attempt lost end-to-end because it split the gathered
# block back into per-window scans (relayout copies); here the G windows
# stay merged through ONE segmented reduce with global keys
# window*B + digit — concatenating per-window sorted digit runs with
# offset keys keeps the key sequence globally sorted, so no split happens.
MSM_WINDOW_GROUP = int(os.environ.get("CIRCOM_TPU_MSM_GROUP", "0"))


def num_windows(window_bits: int) -> int:
    return -(-SCALAR_BITS // window_bits)


def window_digits(scalars: jnp.ndarray, window_bits: int) -> jnp.ndarray:
    """(N, 16) plain canonical limbs -> (W, N) int32 digits."""
    n = scalars.shape[0]
    padded = jnp.concatenate(
        [scalars, jnp.zeros((n, 1), jnp.uint32)], axis=1
    )  # guard limb for cross-limb windows
    mask = np.uint32((1 << window_bits) - 1)
    out = []
    for w in range(num_windows(window_bits)):
        bit = w * window_bits
        limb, off = bit // LIMB_BITS, bit % LIMB_BITS
        lo = padded[:, limb] >> off
        hi_bits = LIMB_BITS - off
        d = lo
        if hi_bits < window_bits:  # window straddles two limbs
            d = d | (padded[:, limb + 1] << hi_bits)
        out.append((d & mask).astype(jnp.int32))
    return jnp.stack(out, axis=0)


def window_digits_signed(scalars: jnp.ndarray, window_bits: int) -> jnp.ndarray:
    """(N, 16) limbs -> (W, N) int32 SIGNED digits in [-2^(w-1), 2^(w-1)].

    Standard signed-window recoding: a digit >= 2^(w-1) becomes d - 2^w
    with a +1 carry into the next window, so buckets cover |d| in
    [1, 2^(w-1)] — half the bucket count of the unsigned form (negating a
    point is free: -(X, Y, Z) = (X, -Y, Z)). The TOP window stays unsigned
    to absorb the final carry (BN254 scalars are < 2^254, so the top digit
    plus carry still fits; a signed top window could drop a 2^255 carry).
    """
    d = window_digits(scalars, window_bits)  # (W, N) int32, unsigned
    half = 1 << (window_bits - 1)
    full = 1 << window_bits

    def body(carry, row):
        row = row + carry
        neg = row >= half
        out = jnp.where(neg, row - full, row)
        return neg.astype(jnp.int32), out

    carry, signed_rows = jax.lax.scan(
        body, jnp.zeros(d.shape[1], jnp.int32), d[:-1]
    )
    top = d[-1] + carry
    return jnp.concatenate([signed_rows, top[None]], axis=0)


def window_orders(
    scalars: jnp.ndarray, window_bits: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precomputed per-window sort for the unsigned bucket pipeline:
    (orders, keys), both (W, N) int32 with keys[w] = sorted digits and
    orders[w] the argsort permutation.

    The A, B1 and B2 MSMs of a Groth16 proof share one scalar vector
    (the full assignment — reference: the a_i in src/circom/qap.rs /
    ark-groth16's prover), so their per-window argsorts are identical;
    computing them once removes ~2 of the 5 MSMs' sort+digit cost."""
    digits = window_digits(scalars, window_bits)  # (W, N)

    def one(d_row):
        order = jnp.argsort(d_row)
        return order.astype(jnp.int32), d_row[order]

    return jax.lax.map(one, digits)


CHUNK_POINTS = 1 << 20  # live working set cap. With the XLA-composed
# combine this had to be 2^16 (intermediate tensors blew the working set);
# the Pallas fused combine keeps per-combine footprint tiny and the sweep
# measured unchunked 2^20 fastest (334k vs 311k pts/s chunked, w=16).


def pick_window_bits(n: int) -> int:
    """Minimize scan-Pippenger work W(w)*(n + 12*2^w), W = ceil(254/w).

    The bucket coefficient is calibrated on the measured 2^20 affine-gather
    sweep (unsigned: w13 899k ~ w14 893k > w15 887k > w12 853k > w16 724k
    pts/s), which also reproduces the small-size optima. Clamped to
    [8, 17]."""
    return min(
        range(8, 18),
        key=lambda w: -(-SCALAR_BITS // w) * (n + (12 << w)),
    )


def combine_for(F: cj.FieldAdapter, use_pallas: Optional[bool] = None):
    """The point-add combine for scans (RCB complete projective): Pallas-fused on TPU (one HBM
    round-trip per add instead of hundreds — ops/curve_pallas.py), plain
    XLA composition on the CPU test mesh (interpret-mode Pallas there is
    orders of magnitude slower; dedicated parity tests cover the kernel)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        from . import curve_pallas as cp

        return cp.g2_add_pallas if F.name == "fq2" else cp.g1_add_pallas
    return lambda a, b: cj.proj_add(F, a, b)


def leaf_combine_for(F: cj.FieldAdapter, use_pallas: Optional[bool] = None):
    """Mixed-coordinate combine for scan positions whose second operand is
    an original affine query point (Z in {0, one}): 8M+3S vs 11M+5S."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        from . import curve_pallas as cp

        return cp.g2_madd_pallas if F.name == "fq2" else cp.g1_madd_pallas
    return lambda a, b: cj.proj_madd(F, a, b)


def tile_scans_for(F: cj.FieldAdapter, use_pallas: Optional[bool] = None):
    """(tile_scan_leaf, tile_scan_general) fused Phase-A executors, or
    (None, None) on the XLA path (fori-loop Phase A)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    if not use_pallas:
        return None, None
    from . import curve_pallas as cp

    if F.name == "fq2":
        return cp.g2_tile_scan_madd, cp.g2_tile_scan
    return cp.g1_tile_scan_madd, cp.g1_tile_scan


def _bucket_reduce(combine, leaf, tscans, pts, keys, B, ident):
    """One window's (B, pt) bucket sums from digit-sorted points."""
    ts_leaf, ts_gen = tscans
    return segments.reduce_by_sorted_key(
        combine, pts, keys, B, ident,
        combine_leaf=leaf, tile_scan=ts_leaf, tile_scan_general=ts_gen,
    )


def _scan_buckets(combine, tscans, buckets, ident):
    """sum_{j=1}^{B-1} j*S_j as a reversed suffix scan + tree fold."""
    _, ts_gen = tscans
    rev = jax.tree_util.tree_map(lambda x: x[:0:-1], buckets)  # (B-1, ...)
    suffix = segments.inclusive_scan(combine, rev, ident, tile_scan=ts_gen)
    return segments.fold(combine, suffix, ident, tile_scan=ts_gen)


def _bucket_window_sum(combine, leaf, tscans, pts, keys, B, ident):
    """One window's Pippenger sum from digit-sorted points: bucket
    reductions, then sum_{j=1}^{B-1} j*S_j as a reversed suffix scan + fold."""
    buckets = _bucket_reduce(combine, leaf, tscans, pts, keys, B, ident)
    return _scan_buckets(combine, tscans, buckets, ident)


def _auto_window_group(F: cj.FieldAdapter) -> int:
    """Measured on-chip (round 4, 2^20 w13, bench.py): grouping LOSES
    end-to-end — G=1: 915k, G=2: 689k, G=4: 526k, G=5: 544k pts/s —
    despite the take-4x gather microbench predicting ~2x faster gathers,
    and even with the G windows merged through ONE segmented reduce (no
    post-gather split). Stage attribution: scripts/bench_group_stages.py.
    Default stays 1; the grouped path remains available via
    CIRCOM_TPU_MSM_GROUP / group= for re-evaluation on other hardware."""
    return 1


def _grouped_window_block(
    F, xs, ys, orders, keys, negm, window_bits, combine, leaf, tscans,
    ident, want_buckets,
):
    """G windows' Pippenger sums via ONE gather + ONE segmented reduce.

    orders/keys: (G, N) int32 — per-window argsort permutations and the
    correspondingly sorted digits. negm: optional (G, N) bool in UNSORTED
    point order (signed pipeline) — True where the gathered point must be
    negated. Returns (G, B, pt) bucket sums (want_buckets) or (G, pt)
    window sums."""
    B = 1 << window_bits if negm is None else (1 << (window_bits - 1)) + 1
    G, n = orders.shape
    flat_order = orders.reshape(G * n)
    gkeys = (
        keys + (jnp.arange(G, dtype=keys.dtype) * B)[:, None]
    ).reshape(G * n)
    xg = xs.at[flat_order].get(mode="promise_in_bounds").astype(jnp.uint32)
    yg = ys.at[flat_order].get(mode="promise_in_bounds").astype(jnp.uint32)
    pts = cj.affine_to_proj(F, xg, yg)
    if negm is not None:
        negs = jnp.take_along_axis(negm, orders, axis=-1).reshape(G * n)
        X, Y, Z = pts
        pts = (X, F.select(negs, F.neg(Y), Y), Z)
    buckets_flat = segments.reduce_by_sorted_key(
        combine, pts, gkeys, G * B, ident,
        combine_leaf=leaf, tile_scan=tscans[0], tile_scan_general=tscans[1],
    )
    buckets = jax.tree_util.tree_map(
        lambda x: x.reshape((G, B) + x.shape[1:]), buckets_flat
    )
    if want_buckets:
        return buckets
    return jax.lax.map(
        lambda b: _scan_buckets(combine, tscans, b, ident), buckets
    )


def _grouped_window_sums(
    F, xs, ys, orders, keys, negm, window_bits, combine, leaf, tscans,
    ident, want_buckets, group,
):
    """All W windows through _grouped_window_block in groups of `group`
    (remainder group instantiated separately); results concatenated back
    to leading dim W."""
    W = orders.shape[0]
    g = max(1, min(group, W))
    n_full, rem = divmod(W, g)

    def run(o, k, m):
        return _grouped_window_block(
            F, xs, ys, o, k, m, window_bits, combine, leaf, tscans,
            ident, want_buckets,
        )

    parts = []
    if n_full:
        head = slice(0, n_full * g)
        grp = lambda x: x[head].reshape(n_full, g, -1)
        if negm is None:
            mapped = jax.lax.map(
                lambda a: run(a[0], a[1], None), (grp(orders), grp(keys))
            )
        else:
            mapped = jax.lax.map(
                lambda a: run(*a), (grp(orders), grp(keys), grp(negm))
            )
        parts.append(jax.tree_util.tree_map(
            lambda x: x.reshape((n_full * g,) + x.shape[2:]), mapped
        ))
    if rem:
        tail = slice(n_full * g, W)
        parts.append(run(
            orders[tail], keys[tail],
            None if negm is None else negm[tail],
        ))
    if len(parts) == 1:
        return parts[0]
    return jax.tree_util.tree_map(
        lambda *xs_: jnp.concatenate(xs_, axis=0), *parts
    )


def _window_sums_one_chunk(
    F, points, scalars, window_bits, combine=None, leaf=None, tscans=None,
    signed=None, affine=False, precomp=None, want_buckets=False, group=None,
):
    """affine=True: `points` is an (xs, ys) pair of affine Montgomery limb
    arrays in their STORAGE dtype (uint16 zkey sections) — the per-window
    gather then moves 64 B/point instead of 192 B of widened projective
    coords, and the widen + projective encode runs on the gathered rows.
    The coordinate gathers are the dominant MSM cost on this hardware
    (ablation: 1.33 s of the 2.07 s 2^20 w16 MSM was sort+gather)."""

    if signed is None:
        # measured (affine-gather era): unsigned wins at every size — the
        # per-window negate+select of Y costs more than the halved bucket
        # tail saves (2^20: w13 unsigned 899k vs w13 signed 685k, w15
        # unsigned 887k vs signed 748k pts/s).
        signed = False
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(F))
    if combine is None:
        combine = combine_for(F)
    if leaf is None:
        leaf = leaf_combine_for(F)
    if tscans is None:
        tscans = tile_scans_for(F)

    if precomp is not None:
        # (orders, keys) from window_orders — unsigned pipeline only (the
        # signed recode's carries are scalar-set-specific anyway).
        assert not signed, "precomputed orders require the unsigned pipeline"
        B = 1 << window_bits
        mapped = precomp
    elif signed:
        digits = window_digits_signed(scalars, window_bits)  # (W, N) signed
        B = (1 << (window_bits - 1)) + 1  # buckets |d| in [0, 2^(w-1)]
        mapped = digits
    else:
        digits = window_digits(scalars, window_bits)  # (W, N)
        B = 1 << window_bits
        mapped = digits

    if group is None:
        group = MSM_WINDOW_GROUP or _auto_window_group(F)
    if affine and group > 1:
        # batched gather + merged segmented reduce over groups of windows
        xs, ys = points
        if precomp is not None:
            orders_all, keys_all = precomp
            negm_all = None
        elif signed:
            digits = mapped
            keys_raw = jnp.abs(digits)
            negm_all = digits < 0
            orders_all = jnp.argsort(keys_raw, axis=-1).astype(jnp.int32)
            keys_all = jnp.take_along_axis(keys_raw, orders_all, axis=-1)
        else:
            orders_all = jnp.argsort(mapped, axis=-1).astype(jnp.int32)
            keys_all = jnp.take_along_axis(mapped, orders_all, axis=-1)
            negm_all = None
        return _grouped_window_sums(
            F, xs, ys, orders_all, keys_all, negm_all, window_bits,
            combine, leaf, tscans, ident, want_buckets, group,
        )

    # xy-PACK wide coordinate rows once per chunk (round 5): XLA's take is
    # per-ROW issue-bound and jumps onto a fast path at >=128 B 2-D rows
    # (scripts/bench_gather2.py: 32 B rows 19.1 ms, 64 B 28.9 ms, 128 B
    # 14.8 ms per 2^20 rows), so G2's two 64 B coordinate gathers become
    # ONE 128 B take (~4x; measured 370k -> 395k pts/s at 2^20 w13). For
    # G1 the same pack lands on the SLOWER 64 B tier and the post-gather
    # split relayout turns the residual win into a measured 4% loss
    # (905k -> 878k) — so 32 B coords keep their two narrow takes.
    xy_pack = False
    if affine:
        xs_p, ys_p = points
        coord_shape = xs_p.shape[1:]
        xy_pack = int(np.prod(coord_shape)) >= 32
        if xy_pack:
            n_rows = xs_p.shape[0]
            xy_rows = jnp.concatenate(
                [xs_p.reshape(n_rows, -1), ys_p.reshape(n_rows, -1)],
                axis=-1,
            )
            coord_w = xy_rows.shape[-1] // 2

    def per_window(d_row):
        if precomp is not None:
            order, keys = d_row
        elif signed:
            keys_raw = jnp.abs(d_row)
            negm = d_row < 0
            order = jnp.argsort(keys_raw)
            keys = keys_raw[order]
        else:
            order = jnp.argsort(d_row)
            keys = d_row[order]
        if xy_pack:
            g = xy_rows.at[order].get(
                mode="promise_in_bounds", unique_indices=True
            ).astype(jnp.uint32)
            n_g = g.shape[0]
            xg = g[:, :coord_w].reshape((n_g,) + coord_shape)
            yg = g[:, coord_w:].reshape((n_g,) + coord_shape)
            pts = cj.affine_to_proj(F, xg, yg)
        elif affine:
            # two narrow u16 takes: fastest known form for 32 B coords
            xg = xs_p.at[order].get(
                mode="promise_in_bounds", unique_indices=True
            ).astype(jnp.uint32)
            yg = ys_p.at[order].get(
                mode="promise_in_bounds", unique_indices=True
            ).astype(jnp.uint32)
            pts = cj.affine_to_proj(F, xg, yg)
        else:
            pts = jax.tree_util.tree_map(lambda a: a[order], points)
        if signed:
            # negate the gathered points where the digit was negative:
            # -(X, Y, Z) = (X, -Y, Z); bucket 0 unaffected (digit 0 is
            # never negative).
            negs = negm[order]
            X, Y, Z = pts
            pts = (X, F.select(negs, F.neg(Y), Y), Z)
        if want_buckets:
            return _bucket_reduce(combine, leaf, tscans, pts, keys, B, ident)
        return _bucket_window_sum(combine, leaf, tscans, pts, keys, B, ident)

    return jax.lax.map(per_window, mapped)


def window_sums_impl(
    F: cj.FieldAdapter,
    points: cj.Point,  # RCB projective pytree, leading dim N
    scalars: jnp.ndarray,  # (N, 16) uint32, plain canonical
    window_bits: int = 8,
    chunk_points: int = CHUNK_POINTS,
    use_pallas: Optional[bool] = None,
    signed: Optional[bool] = None,
    affine: bool = False,
    precomp=None,
    group: Optional[int] = None,
) -> cj.Point:
    """Per-window Pippenger sums; returns point pytree with leading dim W.

    Inputs larger than `chunk_points` are processed in sequential chunks
    (window sums are additive across point subsets), keeping peak memory
    flat as N grows. Un-jitted body so parallel/msm_sharded.py can call it
    inside shard_map.

    precomp: optional (orders, keys) from window_orders — shares one sort
    across MSMs with identical scalars (single-chunk unsigned path only;
    chunking re-indexes within each chunk)."""
    combine = combine_for(F, use_pallas)
    leaf = leaf_combine_for(F, use_pallas)
    tscans = tile_scans_for(F, use_pallas)
    n = scalars.shape[0]
    if n <= chunk_points:
        return _window_sums_one_chunk(
            F, points, scalars, window_bits, combine, leaf, tscans, signed,
            affine, precomp, group=group,
        )
    assert precomp is None, "precomputed orders require a single chunk"

    pad = (-n) % chunk_points
    if pad:
        # zero scalars land in bucket 0 (ignored); pad points with infinity
        scalars = jnp.pad(scalars, ((0, pad), (0, 0)))
        if affine:
            # all-zero affine rows = infinity (zkey convention)
            points = tuple(
                jnp.concatenate(
                    [c, jnp.zeros((pad,) + c.shape[1:], c.dtype)], axis=0
                )
                for c in points
            )
        else:
            ident = cj.proj_identity_const(F)
            points = tuple(
                jnp.concatenate(
                    [c, jnp.broadcast_to(jnp.asarray(i), (pad,) + c.shape[1:]).astype(c.dtype)],
                    axis=0,
                )
                for c, i in zip(points, ident)
            )
    n_chunks = (n + pad) // chunk_points
    pts_c = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks, chunk_points) + x.shape[1:]), points
    )
    sc_c = scalars.reshape(n_chunks, chunk_points, 16)

    def one(args):
        pts, sc = args
        return _window_sums_one_chunk(
            F, pts, sc, window_bits, combine, leaf, tscans, signed, affine,
            group=group,
        )

    # C is small (N/chunk_points <= 32 up to 2^21): the fold's scan hits the
    # Hillis-Steele base case, so no tile_scan (whose kernel assumes bare
    # point coords, not the extra (W,) window dim these sums carry).
    chunk_sums = jax.lax.map(one, (pts_c, sc_c))  # (C, W, pt)
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(F))
    return segments.fold(combine, chunk_sums, ident)


msm_window_sums = jax.jit(
    window_sums_impl, static_argnums=(0, 3, 4, 5, 6, 7, 9)
)


def window_sums_affine_impl(
    F: cj.FieldAdapter,
    xs: jnp.ndarray,  # (N, ...) affine Montgomery x limbs, storage dtype
    ys: jnp.ndarray,
    scalars: jnp.ndarray,
    window_bits: int = 8,
    chunk_points: int = CHUNK_POINTS,
    use_pallas: Optional[bool] = None,
    signed: Optional[bool] = None,
    precomp=None,
    group: Optional[int] = None,
) -> cj.Point:
    """window_sums_impl over affine uint16 storage rows (the fast path —
    see _window_sums_one_chunk's affine note)."""
    return window_sums_impl(
        F, (xs, ys), scalars, window_bits, chunk_points, use_pallas, signed,
        affine=True, precomp=precomp, group=group,
    )


def bucket_sums_affine_impl(
    F: cj.FieldAdapter,
    xs: jnp.ndarray,  # (N, ...) affine Montgomery limbs, storage dtype
    ys: jnp.ndarray,
    scalars: Optional[jnp.ndarray],  # (N, 16) plain canonical; None w/ precomp
    window_bits: int,
    use_pallas: Optional[bool] = None,
    precomp=None,
    group: Optional[int] = None,
) -> cj.Point:
    """(W, B, point) Pippenger BUCKET sums, suffix scan deferred.

    Bucket sums are additive across point subsets, so a streamed prover
    (models/streamed.py) folds these per chunk and runs the O(B log B)
    suffix scan ONCE per MSM instead of once per chunk — per-chunk work
    then scales with the chunk size only. Unsigned pipeline (bucket 0 is
    kept in the output but dropped by the scan)."""
    return _window_sums_one_chunk(
        F, (xs, ys), scalars, window_bits,
        combine_for(F, use_pallas), leaf_combine_for(F, use_pallas),
        tile_scans_for(F, use_pallas), signed=False, affine=True,
        precomp=precomp, want_buckets=True, group=group,
    )


def windows_from_buckets_impl(
    F: cj.FieldAdapter, buckets: cj.Point, use_pallas: Optional[bool] = None
) -> cj.Point:
    """(W, B, pt) bucket sums -> (W, pt) window sums (the deferred scan)."""
    combine = combine_for(F, use_pallas)
    tscans = tile_scans_for(F, use_pallas)
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(F))

    def one(b):
        return _scan_buckets(combine, tscans, b, ident)

    return jax.lax.map(one, buckets)


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------


def _fold_windows_host(window_pts: List, curve_ops, window_bits: int):
    """Horner over decoded window sums, MSB window first (host, exact)."""
    acc = None
    for w in reversed(range(len(window_pts))):
        if acc is not None:
            for _ in range(window_bits):
                acc = curve_ops.double(acc)
        acc = curve_ops.add(acc, window_pts[w])
    return acc


def msm_g1(
    points_mont_xy: Tuple[jnp.ndarray, jnp.ndarray],  # (N,16),(N,16) Montgomery
    scalars: Sequence[int],
    window_bits: int = 8,
) -> Optional[Tuple[int, int]]:
    """Full G1 MSM: device window sums + host fold. Returns affine or None."""
    from ..refmath import curve as rc

    xs, ys = points_mont_xy
    n = xs.shape[0]
    if n == 0 or len(scalars) == 0:
        return None
    sc = jnp.asarray(fj.encode_plain(list(scalars), fj.FR))[:n]
    # limbs are 16-bit values: narrow the gather rows losslessly
    xs16 = jnp.asarray(xs).astype(jnp.uint16)
    ys16 = jnp.asarray(ys).astype(jnp.uint16)
    sums = jax.jit(window_sums_affine_impl, static_argnums=(0, 4))(
        cj.FQ_ADAPTER, xs16, ys16, sc, window_bits
    )
    decoded = cj.decode_g1_proj(sums)
    return _fold_windows_host(decoded, rc.G1, window_bits)


def msm_g2(
    points_mont_xy: Tuple[jnp.ndarray, jnp.ndarray],  # (N,2,16) x2 Montgomery
    scalars: Sequence[int],
    window_bits: int = 8,
):
    from ..refmath import curve as rc

    xs, ys = points_mont_xy
    n = xs.shape[0]
    if n == 0 or len(scalars) == 0:
        return None
    sc = jnp.asarray(fj.encode_plain(list(scalars), fj.FR))[:n]
    xs16 = jnp.asarray(xs).astype(jnp.uint16)
    ys16 = jnp.asarray(ys).astype(jnp.uint16)
    sums = jax.jit(window_sums_affine_impl, static_argnums=(0, 4))(
        cj.FQ2_ADAPTER, xs16, ys16, sc, window_bits
    )
    decoded = cj.decode_g2_proj(sums)
    return _fold_windows_host(decoded, rc.G2, window_bits)
