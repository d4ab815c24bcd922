#!/usr/bin/env python
"""Extended gather microbench: find the fastest way to move (N, C) coord
rows in a random permutation order on this TPU.

Round-2 ablation: XLA `jnp.take` measures 1.72 GB/s effective on the MSM's
per-window (2^20, 16)-u16 affine gathers — the dominant MSM cost. This
script measures every plausible alternative in one process so the winner
can be wired into ops/msm.py (reference hot path: the 5 MSMs of
ark-groth16's prover, SURVEY §3.4).

Variants:
  take            jnp.take (the current path)
  take-hints      jnp.take with unique_indices + promise_in_bounds
  take-u32        same rows viewed as (N, 8) u32 (half the elements)
  take-u32-hints  u32 view + hints
  take-pack32     x||y packed into one (N, 32) u16 row (one gather not two)
  take-sorted     iota indices (locality ceiling for take)

The pallas-dma variants were removed 2026-08-20 after the decision run
(.cache/round4_gather2.log): the DMA-ring kernel fails Mosaic
remote-compile on the axon backend (tpu_compile_helper exit 1, HTTP 500),
and take-u32-hints won at 17.08 ms / 1.96 GB/s (1.15x vs plain take).
ops/gather_pallas.py is deleted; see BASELINE.md round-4 table.

Measurement rules (axon tunnel): reps INSIDE one jit via fori_loop,
checksum output so D2H is tiny, np.asarray to force.

  python -u scripts/bench_gather2.py --log-n 20 --reps 8
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from circom_compat_tpu.utils import paths

paths.enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--cols", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    n = 1 << args.log_n
    rng = np.random.default_rng(3)
    src16 = rng.integers(0, 1 << 16, (n, args.cols), dtype=np.uint16)
    src32 = src16.view(np.uint32)  # (n, cols//2)
    pack16 = np.concatenate([src16, src16], axis=1)  # stand-in for x||y
    idx_np = rng.permutation(n).astype(np.int32)

    d_src16 = jnp.asarray(src16)
    d_src32 = jnp.asarray(src32)
    d_pack16 = jnp.asarray(pack16)
    d_iota = jnp.arange(n, dtype=jnp.int32)
    d_idx = jnp.asarray(idx_np)

    results = {}

    def bench(name, fn, src, idx, bytes_per):
        @jax.jit
        def run(src, idx):
            def body(i, acc):
                g = fn(src, jnp.roll(idx, i))  # defeat CSE across reps
                return acc + jnp.sum(g.astype(jnp.uint32))

            return jax.lax.fori_loop(0, args.reps, body, jnp.uint32(0))

        try:
            out = np.asarray(run(src, idx))  # compile + run
            t0 = time.perf_counter()
            out = np.asarray(run(src, idx))
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — survey must survive one variant failing
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:300]}")
            return
        per = dt / args.reps
        results[name] = per
        print(f"{name:16s} {per*1e3:8.2f} ms/gather  "
              f"{bytes_per/per/1e9:7.2f} GB/s effective  (checksum {out})")

    row_bytes = args.cols * 2
    take = lambda s, i: jnp.take(s, i, axis=0)
    take_h = lambda s, i: s.at[i].get(
        mode="promise_in_bounds", unique_indices=True
    )

    bench("take", take, d_src16, d_idx, n * row_bytes)
    bench("take-hints", take_h, d_src16, d_idx, n * row_bytes)
    bench("take-u32", take, d_src32, d_idx, n * row_bytes)
    bench("take-u32-hints", take_h, d_src32, d_idx, n * row_bytes)
    bench("take-pack32", take, d_pack16, d_idx, n * row_bytes * 2)
    bench("take-sorted", take, d_src16, d_iota, n * row_bytes)

    # 4 windows' worth of indices in ONE gather: if take is launch/overhead
    # bound this is <4x the single-gather time and batching windows wins.
    idx4 = jnp.concatenate([jnp.roll(d_idx, k) for k in range(4)])
    bench("take-4x", lambda s, i: jnp.take(s, i, axis=0),
          d_src16, idx4, 4 * n * row_bytes)

    # Row-WIDTH scaling (round 5): the A/B1/B2 MSMs share one window
    # permutation (same assignment scalars), so their per-window gathers
    # could be ONE take over xy-interleaved rows — A.x|A.y|B1.x|B1.y = 128 B,
    # + B2's four Fq limbs rows = 256 B. If per-row cost is issue-bound
    # (flat-ish in width), a 256 B row replaces 4x32 B + 2x64 B gathers at
    # ~2x one row's cost. The -split variants add the downstream cost of
    # slicing the packed block back into per-coordinate arrays.
    for k in (2, 4, 8):
        wide = np.concatenate([src16] * k, axis=1)  # (n, 16k)
        d_wide = jnp.asarray(wide)
        bench(f"take-w{16*k*2}B-hints", take_h, d_wide, d_idx,
              n * row_bytes * k)

        def split_sum(s, i, k=k):
            g = s.at[i].get(mode="promise_in_bounds", unique_indices=True)
            parts = [
                g[:, j * 16 : (j + 1) * 16].astype(jnp.uint32)
                for j in range(k)
            ]
            acc = parts[0]
            for p in parts[1:]:
                acc = acc + p
            return acc

        bench(f"take-w{16*k*2}B-split", split_sum, d_wide, d_idx,
              n * row_bytes * k)

        # in-context shape probes: 3-D operand (N, k, 16) as the packed
        # core stores it, and the post-gather u32 widen — either may knock
        # XLA off the wide-row fast path the 2-D benches hit
        d_wide3 = jnp.asarray(wide.reshape(n, k, 16))
        bench(f"take-3d-w{16*k*2}B", take_h, d_wide3, d_idx,
              n * row_bytes * k)

        def gather_widen(s, i):
            g = s.at[i].get(mode="promise_in_bounds", unique_indices=True)
            return g.astype(jnp.uint32)

        bench(f"take-w{16*k*2}B-widen", gather_widen, d_wide, d_idx,
              n * row_bytes * k)

    if results:
        best = min(results, key=results.get)
        base = results.get("take")
        extra = f"  ({base/results[best]:.2f}x vs take)" if base else ""
        print(f"\nbest: {best} {results[best]*1e3:.2f} ms{extra}")


if __name__ == "__main__":
    main()
