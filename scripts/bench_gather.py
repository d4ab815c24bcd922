#!/usr/bin/env python
"""Measure the Pallas DMA row gather vs XLA's native gather on TPU.

The MSM's per-window coordinate gather is the round-1 bottleneck
(BASELINE 3rd-pass ablation). Decision gate for wiring
ops/gather_pallas.py into ops/msm.py (CIRCOM_TPU_GATHER=pallas).

Measurement rules (memory: axon tunnel): one big jit per variant,
repetitions INSIDE the jit via lax.fori, reduced output (checksum) so
D2H is tiny, np.asarray to force.

  python -u scripts/bench_gather.py --log-n 20 --reps 8
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--cols", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8, help="gathers per jit")
    ap.add_argument("--rows-per-block", type=int, default=1024)
    ap.add_argument("--ring", type=int, default=16)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from circom_compat_tpu.ops import gather_pallas as gp

    n = 1 << args.log_n
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.integers(0, 1 << 16, (n, args.cols), dtype=np.uint16))
    idx = jnp.asarray(rng.permutation(n).astype(np.int32))
    bytes_per = n * args.cols * 2

    def bench(name, fn):
        @jax.jit
        def run(src, idx):
            def body(i, acc):
                g = fn(src, jnp.roll(idx, i))  # defeat CSE across reps
                return acc + jnp.sum(g.astype(jnp.uint32))

            return jax.lax.fori_loop(0, args.reps, body, jnp.uint32(0))

        out = np.asarray(run(src, idx))  # compile + run
        t0 = time.perf_counter()
        out = np.asarray(run(src, idx))
        dt = time.perf_counter() - t0
        per = dt / args.reps
        print(f"{name:14s} {per*1e3:8.2f} ms/gather  "
              f"{bytes_per/per/1e9:7.2f} GB/s effective  (checksum {out})")
        return per

    t_xla = bench("xla take", lambda s, i: jnp.take(s, i, axis=0))
    t_pal = bench(
        f"pallas dma r{args.ring}",
        lambda s, i: gp.gather_rows(
            s, i, rows_per_block=args.rows_per_block, ring=args.ring
        ),
    )
    print(f"speedup: {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
