"""Time the real MSM sub-stages at full width on the TPU.

Stages (all jitted separately, steady-state timed):
  tileA     — fused Phase-A tile scan over presorted (T, K) data
  bucket    — reduce_by_sorted_key (Phase A + B + picked carries)
  suffix    — suffix scan + fold over B-1 buckets
  window    — one complete per-window body (sort + gather + bucket + suffix)
  all16     — lax.map over all W windows (the production shape)

python -u scripts/bench_msm_stages.py [--log-n 20 --w 16]
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


def force(tree):
    return [np.asarray(c).ravel()[:1] for c in jax.tree_util.tree_leaves(tree)]


def time_steady(fn, *args, reps=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--w", type=int, default=16)
    args = ap.parse_args()
    n, w = 1 << args.log_n, args.w
    F = cj.FQ_ADAPTER
    B = (1 << (w - 1)) + 1
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(F))
    combine = msm_ops.combine_for(F)
    leaf = msm_ops.leaf_combine_for(F)
    ts_leaf, ts_gen = msm_ops.tile_scans_for(F)

    rng = np.random.default_rng(5)
    coords = [
        jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
        for _ in range(3)
    ]
    pts = tuple(coords)
    sc = jnp.asarray(
        fj.encode_plain([int(x) for x in rng.integers(0, 1 << 62, n)], fj.FR)
    )
    keys_np = np.sort(rng.integers(0, B, n).astype(np.int32))
    keys = jnp.asarray(keys_np)

    # --- tileA: Phase A fused tile scan over (T, K) ---
    K = 16
    T = n // K
    vt = jax.tree_util.tree_map(lambda c: c.reshape(T, K, 16), pts)
    ft = jnp.asarray(segments.segment_flags(keys)).reshape(T, K)

    tileA = jax.jit(lambda v, f: ts_leaf(v, f))
    t = time_steady(tileA, vt, ft)
    log(f"RESULT tileA_phaseA_2^{args.log_n}: {t*1e3:.1f} ms")

    # --- bucket: full reduce_by_sorted_key ---
    bucket = jax.jit(
        lambda p, k: segments.reduce_by_sorted_key(
            combine, p, k, B, ident, combine_leaf=leaf,
            tile_scan=ts_leaf, tile_scan_general=ts_gen,
        )
    )
    t = time_steady(bucket, pts, keys)
    log(f"RESULT bucket_reduce_2^{args.log_n}_B{B}: {t*1e3:.1f} ms")

    # --- suffix + fold over buckets ---
    bpts = tuple(c[:B] for c in coords)

    def suffix_fold(bp):
        rev = jax.tree_util.tree_map(lambda x: x[:0:-1], bp)
        suf = segments.inclusive_scan(combine, rev, ident, tile_scan=ts_gen)
        return segments.fold(combine, suf, ident, tile_scan=ts_gen)

    sf = jax.jit(suffix_fold)
    t = time_steady(sf, bpts)
    log(f"RESULT suffix_fold_B{B}: {t*1e3:.1f} ms")

    # --- one full window ---
    digits = msm_ops.window_digits_signed(sc, w)

    def one_window(d_row, p):
        keys_raw = jnp.abs(d_row)
        order = jnp.argsort(keys_raw)
        kk = keys_raw[order]
        g = jax.tree_util.tree_map(lambda a: a[order], p)
        negs = (d_row < 0)[order]
        X, Y, Z = g
        g = (X, F.select(negs, F.neg(Y), Y), Z)
        b = segments.reduce_by_sorted_key(
            combine, g, kk, B, ident, combine_leaf=leaf,
            tile_scan=ts_leaf, tile_scan_general=ts_gen,
        )
        return suffix_fold(b)

    ow = jax.jit(one_window)
    t = time_steady(ow, digits[3], pts)
    log(f"RESULT one_window_total: {t*1e3:.1f} ms")

    t = time_steady(
        jax.jit(
            lambda p, s: msm_ops.window_sums_impl(F, p, s, w)
        ),
        pts, sc,
    )
    log(f"RESULT all_windows: {t*1e3:.1f} ms ({n / t / 1e3:.1f} k pts/s)")


if __name__ == "__main__":
    main()
