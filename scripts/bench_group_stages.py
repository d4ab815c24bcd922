"""Stage ablation for the grouped-window MSM regression (round 4).

bench.py measured grouped window sums SLOWER on chip (G=1: 915k, G=2:
689k, G=4: 526k pts/s at 2^20 w13) despite the take-4x gather microbench
predicting ~2x faster gathers. Attribute the regression by cumulative
ablation INSIDE one full-size jit (the repo's measurement rule — BASELINE
r1 3rd-pass notes): sort -> +gather -> +encode -> full reduce, per G.

  python scripts/bench_group_stages.py --log-n 20 --window-bits 13
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import msm as msm_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--window-bits", type=int, default=13)
    ap.add_argument("--groups", default="1,2,4")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    n = 1 << args.log_n
    wb = args.window_bits
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.integers(0, 1 << 16, (n, 16), dtype=np.uint16))
    ys = jnp.asarray(rng.integers(0, 1 << 16, (n, 16), dtype=np.uint16))
    sc = jnp.asarray(rng.integers(0, 1 << 16, (n, 16), dtype=np.uint32))

    W = msm_ops.num_windows(wb)
    B = 1 << wb

    def sort_stage(sc):
        digits = msm_ops.window_digits(sc, wb)
        orders = jnp.argsort(digits, axis=-1).astype(jnp.int32)
        keys = jnp.take_along_axis(digits, orders, axis=-1)
        return orders, keys

    def make_gather(g):
        def run(xs, ys, sc):
            orders, keys = sort_stage(sc)

            def one(a):
                o, k = a
                flat = o.reshape(-1)
                xg = xs.at[flat].get(mode="promise_in_bounds").astype(jnp.uint32)
                yg = ys.at[flat].get(mode="promise_in_bounds").astype(jnp.uint32)
                return xg.sum(dtype=jnp.uint32) + yg.sum(dtype=jnp.uint32) + k.sum().astype(jnp.uint32)

            parts = jax.lax.map(
                one, (orders.reshape(W // g, g, n), keys.reshape(W // g, g, n))
            )
            return parts.sum()
        return run

    def make_encode(g):
        def run(xs, ys, sc):
            orders, keys = sort_stage(sc)

            def one(a):
                o, k = a
                flat = o.reshape(-1)
                xg = xs.at[flat].get(mode="promise_in_bounds").astype(jnp.uint32)
                yg = ys.at[flat].get(mode="promise_in_bounds").astype(jnp.uint32)
                X, Y, Z = cj.affine_to_proj(cj.FQ_ADAPTER, xg, yg)
                return (X.sum(dtype=jnp.uint32) + Y.sum(dtype=jnp.uint32)
                        + Z.sum(dtype=jnp.uint32) + k.sum().astype(jnp.uint32))

            parts = jax.lax.map(
                one, (orders.reshape(W // g, g, n), keys.reshape(W // g, g, n))
            )
            return parts.sum()
        return run

    def make_full(g):
        def run(xs, ys, sc):
            sums = msm_ops.window_sums_affine_impl(
                cj.FQ_ADAPTER, xs, ys, sc, wb, group=g
            )
            return sums[0].sum(dtype=jnp.uint32)
        return run

    def sortonly(xs, ys, sc):
        orders, keys = sort_stage(sc)
        return orders.sum(dtype=jnp.int32) + keys.sum()

    def measure(name, fn):
        f = jax.jit(fn)
        out = f(xs, ys, sc)
        jax.block_until_ready(out)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = f(xs, ys, sc)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(f"{name:24s} {min(ts)*1000:9.1f} ms", flush=True)
        return min(ts)

    print(f"n=2^{args.log_n} wb={wb} W={W} backend={jax.default_backend()}")
    measure("sort-only", sortonly)
    for g in [int(x) for x in args.groups.split(",")]:
        if W % g:
            continue
        measure(f"g={g} sort+gather", make_gather(g))
        measure(f"g={g} +encode", make_encode(g))
        measure(f"g={g} FULL", make_full(g))


if __name__ == "__main__":
    main()
