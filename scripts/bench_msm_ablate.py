"""Ablation timing of the full window_sums jit: each variant disables ONE
component inside the SAME overall graph, so variant deltas attribute cost
without standalone-jit dispatch noise (which is ~35-400 ms/call via axon).

python -u scripts/bench_msm_ablate.py [--log-n 20 --w 16]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.ops import msm as msm_ops
from circom_compat_tpu.ops import segments


def log(m):
    print(m, flush=True)


def time_steady(fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda c: np.asarray(c).ravel()[:1], out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda c: np.asarray(c).ravel()[:1], out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def window_sums_variant(
    F, points, scalars, window_bits,
    do_sort=True, do_gather=True, do_neg=True, do_bucket=True, do_tail=True,
):
    signed = True
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(F))
    combine = msm_ops.combine_for(F)
    leaf = msm_ops.leaf_combine_for(F)
    ts_leaf, ts_gen = msm_ops.tile_scans_for(F)
    digits = msm_ops.window_digits_signed(scalars, window_bits)
    B = (1 << (window_bits - 1)) + 1

    def per_window(d_row):
        keys_raw = jnp.abs(d_row)
        if do_sort:
            order = jnp.argsort(keys_raw)
        else:
            order = jnp.arange(keys_raw.shape[0], dtype=jnp.int32)
        keys = keys_raw[order]
        if do_gather:
            pts = jax.tree_util.tree_map(lambda a: a[order], points)
        else:
            pts = points
        if do_neg:
            negs = (d_row < 0)[order]
            X, Y, Z = pts
            pts = (X, F.select(negs, F.neg(Y), Y), Z)
        if do_bucket:
            buckets = segments.reduce_by_sorted_key(
                combine, pts, keys, B, ident,
                combine_leaf=leaf, tile_scan=ts_leaf, tile_scan_general=ts_gen,
            )
        else:
            buckets = jax.tree_util.tree_map(lambda a: a[:B], pts)
        if do_tail:
            rev = jax.tree_util.tree_map(lambda x: x[:0:-1], buckets)
            suffix = segments.inclusive_scan(
                combine, rev, ident, tile_scan=ts_gen
            )
            return segments.fold(combine, suffix, ident, tile_scan=ts_gen)
        return jax.tree_util.tree_map(lambda a: a[0], buckets)

    return jax.lax.map(per_window, digits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--w", type=int, default=16)
    args = ap.parse_args()
    n, w = 1 << args.log_n, args.w
    F = cj.FQ_ADAPTER

    rng = np.random.default_rng(5)
    pts = tuple(
        jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
        for _ in range(3)
    )
    sc = jnp.asarray(
        fj.encode_plain([int(x) for x in rng.integers(0, 1 << 62, n)], fj.FR)
    )

    variants = [
        ("full", {}),
        ("no_tail", dict(do_tail=False)),
        ("no_bucket_no_tail", dict(do_bucket=False, do_tail=False)),
        ("no_neg", dict(do_neg=False)),
        ("no_sort", dict(do_sort=False)),
        ("gather_only", dict(do_neg=False, do_bucket=False, do_tail=False)),
    ]
    for name, kw in variants:
        fn = jax.jit(
            lambda p, s, kw=kw: window_sums_variant(F, p, s, w, **kw)
        )
        t = time_steady(fn, pts, sc)
        log(f"RESULT {name}: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
