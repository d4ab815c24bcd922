"""Generic segmented reduction on TPU, compile-friendly.

The reference's Rayon loops (reference: src/circom/qap.rs:37-44) and the
sequential bucket insertion inside ark-ec's Pippenger MSM are both
"reduce values by key" problems. On TPU the data-dependent scatter is
reformulated as: sort by key (caller side), then a segmented inclusive
scan, then a gather of each segment's last element.

The scan is Hillis-Steele inside ONE lax.fori_loop with dynamic-offset
shifts: the combine body is instantiated exactly once in the XLA graph
regardless of N. (jax.lax.associative_scan is work-efficient but inlines
O(log N) copies of the combine — with a ~16-field-mul Jacobian addition as
the combine that made XLA compiles pathological.) Runtime work is
O(N log N) vectorized combines; the Pallas bucket kernel will bring this
to O(N) later.

Works for any associative combine over a pytree of arrays (modular add for
field rows, Jacobian point addition for MSM buckets).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

tree_map = jax.tree_util.tree_map


def segment_flags(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """True where a new segment starts (keys must be sorted)."""
    prev = jnp.concatenate([sorted_keys[:1] - 1, sorted_keys[:-1]])
    return sorted_keys != prev


def _broadcast_ident(identity: Any, values: Any) -> Any:
    return tree_map(
        lambda i, v: jnp.broadcast_to(i, v.shape).astype(v.dtype), identity, values
    )


def _hillis_steele_segmented(
    combine: Callable[[Any, Any], Any],
    values: Any,
    flags: jnp.ndarray,
    identity: Any,
) -> Any:
    """Inclusive segmented scan, Hillis-Steele in ONE fori_loop.

    O(n log n) combine work but a single combine instantiation in the graph
    — used for short axes (tile carries, bucket suffix sums)."""
    n = flags.shape[0]
    if n == 0:
        return values
    steps = max(n - 1, 1).bit_length()  # ceil(log2(n))
    ident_block = _broadcast_ident(identity, values)
    false_block = jnp.zeros_like(flags)

    def body(k, carry):
        v, f = carry
        offset = jnp.left_shift(jnp.int32(1), k)
        start = jnp.int32(n) - offset

        def shift(leaf, ident_leaf):
            padded = jnp.concatenate([ident_leaf, leaf], axis=0)
            return jax.lax.dynamic_slice_in_dim(padded, start, n, axis=0)

        pv = tree_map(shift, v, ident_block)
        pf = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([false_block, f], axis=0), start, n, axis=0
        )
        merged = combine(pv, v)
        keep = tree_map(
            lambda m, y: jnp.where(
                f.reshape(f.shape + (1,) * (y.ndim - f.ndim)), y, m
            ),
            merged,
            v,
        )
        return keep, f | pf

    (scanned, _), = (jax.lax.fori_loop(0, steps, body, (values, flags)),)
    return scanned


def segmented_scan(
    combine: Callable[[Any, Any], Any],
    values: Any,
    flags: jnp.ndarray,
    identity: Any,
    tile: int = 16,
    _depth: int = 0,
    combine_leaf: Callable[[Any, Any], Any] | None = None,
    tile_scan: Callable[[Any, jnp.ndarray], Any] | None = None,
    tile_scan_general: Callable[[Any, jnp.ndarray], Any] | None = None,
) -> Any:
    """Inclusive scan of `values` restarting at every True flag.

    Two-level work-efficient form: a sequential within-tile scan (fori over
    `tile` steps, full width), a tile-level segmented scan of the carries
    (recursed once, then Hillis-Steele), and one carry-apply combine —
    ~2.16n combines total vs n*log2(n) for flat Hillis-Steele, with a
    bounded number of combine instantiations in the graph.

    identity: pytree of arrays broadcastable to each leaf's element shape,
    satisfying combine(id, x) == x.

    combine_leaf: optional cheaper combine used ONLY where the second
    operand is an ORIGINAL element of `values` (the within-tile Phase A
    steps) — for MSM scans that operand is an affine query point, so the
    mixed-coordinate group law applies (ops/curve_jax.madd).

    tile_scan: optional fused executor for Phase A — (vt (T, K)+elem,
    ft (T, K) bool) -> (out, tile_carry); replaces the K-step fori loop
    (and subsumes combine_leaf there). See curve_pallas.make_tile_scan.
    tile_scan_general: the variant safe for NON-leaf operands (general
    combine), used for the Phase-B recursion over tile carries; defaults
    to tile_scan when combine_leaf is not in play.
    """
    n = flags.shape[0]
    if n <= tile * 2:
        return _hillis_steele_segmented(combine, values, flags, identity)
    out, carry_in, no_flag_yet, T, K = _two_level_parts(
        combine, values, flags, identity, tile, _depth,
        combine_leaf, tile_scan, tile_scan_general,
    )

    # Phase C: apply carry to positions before each tile's first flag.
    carry_b = tree_map(
        lambda c, o: jnp.broadcast_to(c[:, None], o.shape).astype(o.dtype),
        carry_in,
        out,
    )
    merged = combine(carry_b, out)
    out = tree_map(
        lambda m, o: jnp.where(
            no_flag_yet.reshape(no_flag_yet.shape + (1,) * (o.ndim - 2)), m, o
        ),
        merged,
        out,
    )

    return tree_map(lambda x: x.reshape((T * K,) + x.shape[2:])[:n], out)


def _two_level_parts(
    combine,
    values,
    flags,
    identity,
    tile,
    _depth=0,
    combine_leaf=None,
    tile_scan=None,
    tile_scan_general=None,
):
    """Phases A+B of the two-level segmented scan.

    Returns (out, carry_in, no_flag_yet, T, K): the within-tile scanned
    values (T, K)+elem, the exclusive per-tile incoming carry (T,)+elem,
    and the (T, K) mask of positions that still need that carry. Callers
    that only consume a few positions (reduce_by_sorted_key, fold) apply
    the carry at those positions only, skipping the O(n) Phase C.
    """
    n = flags.shape[0]
    if combine_leaf is None:
        combine_leaf = combine

    K = tile
    T = -(-n // K)
    pad = T * K - n

    def pad_leaf(leaf, ident_leaf):
        if pad == 0:
            return leaf
        block = jnp.broadcast_to(
            ident_leaf, (pad,) + leaf.shape[1:]
        ).astype(leaf.dtype)
        return jnp.concatenate([leaf, block], axis=0)

    ident_block = _broadcast_ident(identity, values)
    v = tree_map(
        lambda leaf, ib: pad_leaf(leaf, ib[:1]), values, ident_block
    )
    f = jnp.concatenate([flags, jnp.ones((pad,), flags.dtype)]) if pad else flags

    vt = tree_map(lambda x: x.reshape((T, K) + x.shape[1:]), v)
    ft = f.reshape(T, K)

    # Phase A: within-tile sequential inclusive segmented scan.
    ident_tile = tree_map(
        lambda i, x: jnp.broadcast_to(jnp.asarray(i), x[:, 0].shape).astype(x.dtype),
        identity,
        vt,
    )

    if tile_scan is not None:
        out, tile_carry = tile_scan(vt, ft)
    else:
        def body_a(k, carry):
            out, acc = carry
            vk = tree_map(lambda x: jax.lax.dynamic_index_in_dim(x, k, 1, False), vt)
            fk = jax.lax.dynamic_index_in_dim(ft, k, 1, False)  # (T,)
            merged = combine_leaf(acc, vk)
            acc = tree_map(
                lambda m, y: jnp.where(
                    fk.reshape(fk.shape + (1,) * (y.ndim - fk.ndim)), y, m
                ),
                merged,
                vk,
            )
            out = tree_map(
                lambda o, a: jax.lax.dynamic_update_index_in_dim(o, a, k, 1), out, acc
            )
            return out, acc

        out0 = tree_map(jnp.zeros_like, vt)
        (out, tile_carry) = jax.lax.fori_loop(0, K, body_a, (out0, ident_tile))

    # Phase B: segmented scan of tile carries; exclusive carry into each tile.
    # With the XLA-composed combine, depth is capped at 1: each level
    # instantiates more combine copies in the graph (compile time), and one
    # level already brings the scan to ~2.16n combines. With a fused
    # tile_scan the recursion is one pallas_call per level, so it runs to
    # the Hillis-Steele base case (n <= 2*tile) — the capped form ended in
    # a ~log2(n/256)-deep Hillis-Steele whose per-step kernel launches
    # dominated the MSM's bucket tail (measured: suffix+fold over 2^15
    # buckets was ~88 ms/window, ~70% of the whole 2^20 MSM).
    tile_has_flag = ft.any(axis=1)
    if tile_scan_general is None and combine_leaf is combine:
        tile_scan_general = tile_scan
    if _depth < 1 or tile_scan_general is not None:
        carries_scanned = segmented_scan(
            combine, tile_carry, tile_has_flag, identity, tile, _depth + 1,
            tile_scan=tile_scan_general, tile_scan_general=tile_scan_general,
        )
    else:
        carries_scanned = _hillis_steele_segmented(
            combine, tile_carry, tile_has_flag, identity
        )
    carry_in = tree_map(
        lambda c, il: jnp.concatenate(
            [jnp.broadcast_to(il, (1,) + c.shape[1:]).astype(c.dtype), c[:-1]],
            axis=0,
        ),
        carries_scanned,
        _broadcast_ident(identity, tree_map(lambda x: x[:1], tile_carry)),
    )

    no_flag_yet = jnp.cumsum(ft.astype(jnp.int32), axis=1) == 0  # (T, K)
    return out, carry_in, no_flag_yet, T, K


def inclusive_scan(
    combine: Callable, values: Any, identity: Any, tile_scan=None
) -> Any:
    """Plain (unsegmented) inclusive scan, same single-combine graph."""
    leaves = jax.tree_util.tree_leaves(values)
    n = leaves[0].shape[0]
    flags = jnp.zeros((n,), bool).at[0].set(True)
    return segmented_scan(
        combine, values, flags, identity,
        tile_scan=tile_scan, tile_scan_general=tile_scan,
    )


def fold(
    combine: Callable, values: Any, identity: Any, tile_scan=None, tile: int = 16
) -> Any:
    """Reduce leading axis to one element.

    Carry-only recursion: each level runs Phase A (per-tile totals, no
    restarts) and recurses on the n/tile carries — ~1.07n combines and no
    O(n) Phase C, vs ~3.2n for scan-then-take-last."""
    leaves = jax.tree_util.tree_leaves(values)
    n = leaves[0].shape[0]
    if n <= tile * 2:
        flags = jnp.zeros((n,), bool).at[0].set(True)
        scanned = _hillis_steele_segmented(combine, values, flags, identity)
        return tree_map(lambda x: x[-1], scanned)

    K = tile
    T = -(-n // K)
    pad = T * K - n
    ident_block = _broadcast_ident(identity, values)

    def pad_leaf(leaf, ib):
        if pad == 0:
            return leaf
        block = jnp.broadcast_to(ib[:1], (pad,) + leaf.shape[1:]).astype(leaf.dtype)
        return jnp.concatenate([leaf, block], axis=0)

    v = tree_map(pad_leaf, values, ident_block)
    vt = tree_map(lambda x: x.reshape((T, K) + x.shape[1:]), v)

    if tile_scan is not None:
        _, carry = tile_scan(vt, jnp.zeros((T, K), bool))
    else:
        ident_tile = tree_map(
            lambda i, x: jnp.broadcast_to(jnp.asarray(i), x[:, 0].shape).astype(x.dtype),
            identity,
            vt,
        )

        def body(k, acc):
            vk = tree_map(lambda x: jax.lax.dynamic_index_in_dim(x, k, 1, False), vt)
            return combine(acc, vk)

        carry = jax.lax.fori_loop(0, K, body, ident_tile)
    return fold(combine, carry, identity, tile_scan, tile)


def reduce_by_sorted_key(
    combine: Callable[[Any, Any], Any],
    values: Any,
    sorted_keys: jnp.ndarray,
    num_segments: int,
    identity: Any,
    combine_leaf: Callable[[Any, Any], Any] | None = None,
    tile_scan=None,
    tile_scan_general=None,
    tile: int = 16,
) -> Any:
    """Per-key reductions for presorted int keys in [0, num_segments).

    Returns a pytree with leading dim num_segments; keys with no elements
    get `identity`. combine_leaf / tile_scan*: see segmented_scan.

    Only each segment's LAST scanned position is ever read, so the O(n)
    carry-application Phase C of the full scan is skipped: the per-tile
    carry is combined in at the num_segments picked positions only
    (n combines -> num_segments combines for that phase).
    """
    n = sorted_keys.shape[0]
    flags = segment_flags(sorted_keys)

    seg_ids = jnp.arange(num_segments, dtype=sorted_keys.dtype)
    right = jnp.searchsorted(sorted_keys, seg_ids, side="right")
    left = jnp.searchsorted(sorted_keys, seg_ids, side="left")
    nonempty = right > left
    last_idx = jnp.clip(right - 1, 0, n - 1)

    def mask_ident(picked_tree):
        def pick(arr, ident):
            ident_b = jnp.broadcast_to(ident, arr.shape[1:]).astype(arr.dtype)
            mask = nonempty.reshape((num_segments,) + (1,) * (arr.ndim - 1))
            return jnp.where(mask, arr, ident_b)

        return tree_map(pick, picked_tree, identity)

    if n <= tile * 2:
        scanned = _hillis_steele_segmented(combine, values, flags, identity)
        return mask_ident(tree_map(lambda a: a[last_idx], scanned))

    out, carry_in, no_flag_yet, T, K = _two_level_parts(
        combine, values, flags, identity, tile, 0,
        combine_leaf, tile_scan, tile_scan_general,
    )
    out_flat = tree_map(lambda x: x.reshape((T * K,) + x.shape[2:]), out)
    picked = tree_map(lambda x: x[last_idx], out_flat)
    tile_idx = last_idx // K
    picked_carry = tree_map(lambda c: c[tile_idx], carry_in)
    need = no_flag_yet.reshape(T * K)[last_idx]
    merged = combine(picked_carry, picked)
    picked = tree_map(
        lambda m, p: jnp.where(
            need.reshape((num_segments,) + (1,) * (p.ndim - 1)), m, p
        ),
        merged,
        picked,
    )
    return mask_ident(picked)


def tree_fold(combine: Callable[[Any, Any], Any], values: Any, length: int) -> Any:
    """Reduce `values` (leading dim == length, a power of two) by halving
    rounds: log2(length) combine instantiations — fine for small lengths
    (device-count folds); use `fold` for long axes."""
    assert length & (length - 1) == 0 and length > 0
    while length > 1:
        half = length // 2
        lo = tree_map(lambda x: x[:half], values)
        hi = tree_map(lambda x: x[half:length], values)
        values = combine(lo, hi)
        length = half
    return tree_map(lambda x: x[0], values)
