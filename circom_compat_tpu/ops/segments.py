"""Generic segmented reduction on TPU via work-efficient associative scan.

The reference's Rayon loops (reference: src/circom/qap.rs:37-44) and the
sequential bucket insertion inside ark-ec's Pippenger MSM are both
"reduce values by key" problems. On TPU the data-dependent scatter is
reformulated as: sort by key (done by the caller), then a segmented
inclusive scan with jax.lax.associative_scan — O(N) combines, O(log N)
depth — and a gather of each segment's last element.

Works for any associative combine over a pytree of arrays (modular add for
field rows, Jacobian point addition for MSM buckets).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def segment_flags(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """True where a new segment starts (keys must be sorted)."""
    prev = jnp.concatenate([sorted_keys[:1] - 1, sorted_keys[:-1]])
    return sorted_keys != prev


def segmented_scan(
    combine: Callable[[Any, Any], Any],
    values: Any,
    flags: jnp.ndarray,
) -> Any:
    """Inclusive scan of `values` restarting at every True flag.

    The lifted operator on (value, flag) pairs is associative for any
    associative `combine`, so lax.associative_scan applies.
    """

    def lifted(a, b):
        va, fa = a
        vb, fb = b
        merged = combine(va, vb)
        keep_b = jax.tree_util.tree_map(
            lambda m, y: jnp.where(
                fb.reshape(fb.shape + (1,) * (y.ndim - fb.ndim)), y, m
            ),
            merged,
            vb,
        )
        return keep_b, fa | fb

    scanned, _ = jax.lax.associative_scan(lifted, (values, flags))
    return scanned


def reduce_by_sorted_key(
    combine: Callable[[Any, Any], Any],
    values: Any,
    sorted_keys: jnp.ndarray,
    num_segments: int,
    identity: Any,
) -> Any:
    """Per-key reductions for presorted int keys in [0, num_segments).

    Returns a pytree with leading dim num_segments; keys with no elements
    get `identity` (a pytree of per-element arrays, broadcastable).
    """
    flags = segment_flags(sorted_keys)
    scanned = segmented_scan(combine, values, flags)

    seg_ids = jnp.arange(num_segments, dtype=sorted_keys.dtype)
    right = jnp.searchsorted(sorted_keys, seg_ids, side="right")
    left = jnp.searchsorted(sorted_keys, seg_ids, side="left")
    nonempty = right > left
    last_idx = jnp.clip(right - 1, 0, sorted_keys.shape[0] - 1)

    def pick(arr, ident):
        picked = arr[last_idx]
        ident_b = jnp.broadcast_to(ident, picked.shape[1:])
        mask = nonempty.reshape((num_segments,) + (1,) * (picked.ndim - 1))
        return jnp.where(mask, picked, ident_b)

    return jax.tree_util.tree_map(pick, scanned, identity)


def tree_fold(combine: Callable[[Any, Any], Any], values: Any, length: int) -> Any:
    """Reduce `values` (leading dim == length, a power of two) to a single
    element by log2(length) halving rounds of vectorized combines."""
    assert length & (length - 1) == 0 and length > 0
    while length > 1:
        half = length // 2
        lo = jax.tree_util.tree_map(lambda x: x[:half], values)
        hi = jax.tree_util.tree_map(lambda x: x[half:length], values)
        values = combine(lo, hi)
        length = half
    return jax.tree_util.tree_map(lambda x: x[0], values)
