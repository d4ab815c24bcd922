"""Attribute MSM wall-clock: glue (digits+sort+gather) vs combines.

Times three jitted functions at MSM shapes:
  1. digits+argsort+point-gather for all W windows (the per-window glue)
  2. full window_sums (the real thing)
  3. tile-scan Phase A alone over presorted data (the combine-heavy core)
Run on TPU:  python -u scripts/bench_msm_parts.py [--log-n 20 --w 16]
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


def log(m):
    print(m, flush=True)


def force(tree):
    return [np.asarray(c[..., :1, :1]) for c in jax.tree_util.tree_leaves(tree)]


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

    rng = np.random.default_rng(5)
    # random limb data is fine: sort/gather cost is data-independent and the
    # combine datapath is branch-free
    xs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    ys = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    sc = fj.encode_plain([int(x) for x in rng.integers(0, 1 << 62, n)], fj.FR)
    pts = cj.affine_to_proj(cj.FQ_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))
    sc = jnp.asarray(sc)

    @jax.jit
    def digits_only(pts, sc):
        digits = msm_ops.window_digits_signed(sc, w)
        return digits[:, :1]

    @jax.jit
    def sort_only(pts, sc):
        digits = msm_ops.window_digits_signed(sc, w)

        def per_window(d_row):
            order = jnp.argsort(jnp.abs(d_row))
            return order[:1]

        return jax.lax.map(per_window, digits)

    @jax.jit
    def sort_gather1(pts, sc):
        digits = msm_ops.window_digits_signed(sc, w)

        def per_window(d_row):
            order = jnp.argsort(jnp.abs(d_row))
            return pts[0][order][:1]

        return jax.lax.map(per_window, digits)

    t = time_steady(digits_only, pts, sc)
    log(f"RESULT digits_only: {t:.3f} s")
    t = time_steady(sort_only, pts, sc)
    log(f"RESULT digits_sort: {t:.3f} s")
    t = time_steady(sort_gather1, pts, sc)
    log(f"RESULT digits_sort_gather1coord: {t:.3f} s")

    @jax.jit
    def glue_only(pts, sc):
        digits = msm_ops.window_digits_signed(sc, w)

        def per_window(d_row):
            keys_raw = jnp.abs(d_row)
            order = jnp.argsort(keys_raw)
            keys = keys_raw[order]
            p = jax.tree_util.tree_map(lambda a: a[order], pts)
            negs = (d_row < 0)[order]
            X, Y, Z = p
            p = (X, cj.FQ_ADAPTER.select(negs, cj.FQ_ADAPTER.neg(Y), Y), Z)
            # checksum the gathered data so nothing is elided
            return (keys[:1], *(c[:1] for c in p))

        return jax.lax.map(per_window, digits)

    t = time_steady(glue_only, pts, sc)
    log(f"RESULT glue_digits_sort_gather_2^{args.log_n}_w{w}: {t:.3f} s")

    def full(pts, sc):
        return msm_ops.window_sums_impl(cj.FQ_ADAPTER, pts, sc, w)

    fullj = jax.jit(full)
    t_full = time_steady(fullj, pts, sc)
    log(f"RESULT full_window_sums_2^{args.log_n}_w{w}: {t_full:.3f} s "
        f"({n / t_full / 1e3:.1f} k pts/s)")


if __name__ == "__main__":
    main()
