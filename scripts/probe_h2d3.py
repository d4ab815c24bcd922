"""H2D-under-compute probe (round 5).

The streamed prover's ablation says staging+H2D adds ~5 s serialized time
at 2^20 for only 0.4 GB of key rows — effective ~80 MB/s vs 1.48 GB/s
idle (utils/xfer.put_chunked trains). Hypotheses:

  (a) the axon tunnel serializes H2D acks behind in-flight computations
      (no overlap possible -> deeper prefetch is useless; the fix is to
      minimize serialized bytes or prestage during device-idle windows);
  (b) per-put round-trip latency dominates when the worker is busy
      (concurrent puts from several threads would recover throughput);
  (c) the device-side reassembly concat queues behind the long kernel
      (raw piece puts would still be fast; only the concat waits).

This probe measures put trains (128 MB of (N,16)-u16 rows) in four
regimes: idle, under a ~3 s compute, 1/2/4 issuing threads, and with the
reassembly concat included vs deferred. One number per line.

  python -u scripts/probe_h2d3.py
"""

import argparse
import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from circom_compat_tpu.utils import paths

paths.enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=128)
    ap.add_argument("--piece-mb", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    total = args.mb << 20
    rows = total // 32
    src = np.random.default_rng(0).integers(
        0, 1 << 16, (rows, 16), dtype=np.uint16
    )
    piece_rows = (args.piece_mb << 20) // 32

    # ~3 s busy kernel: chained mont-muls over 2^21 lanes
    from circom_compat_tpu.ops import field_jax as fj

    lanes = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 16, (1 << 21, 16), np.uint32)
    )

    @jax.jit
    def busy(x, k):
        def body(_, acc):
            return fj.mont_mul_impl(fj.FR, acc, acc)

        return jax.lax.fori_loop(0, k, body, x)

    # calibrate k for ~3 s
    k = 64
    while True:
        t0 = time.perf_counter()
        np.asarray(busy(lanes, k))
        dt = time.perf_counter() - t0
        if dt > 2.5 or k > 65536:
            break
        k *= 2
    print(f"busy kernel: k={k} -> {dt:.2f} s", flush=True)

    concat = jax.jit(lambda *ps: jnp.concatenate(ps, axis=0))

    def put_train(arr, threads=1, do_concat=True):
        pieces_idx = list(range(0, arr.shape[0], piece_rows))
        if threads == 1:
            pieces = [
                jax.device_put(arr[i : i + piece_rows]) for i in pieces_idx
            ]
        else:
            with ThreadPoolExecutor(max_workers=threads) as pool:
                pieces = list(
                    pool.map(
                        lambda i: jax.device_put(arr[i : i + piece_rows]),
                        pieces_idx,
                    )
                )
        if do_concat:
            out = concat(*pieces)
            out.block_until_ready()
            return out
        for p in pieces:
            p.block_until_ready()
        return pieces

    def measure(name, threads, under_compute, do_concat=True):
        ts = []
        for _ in range(args.reps):
            fut = None
            if under_compute:
                fut = busy(lanes, k)  # async dispatch; device busy ~3 s
            t0 = time.perf_counter()
            out = put_train(src, threads=threads, do_concat=do_concat)
            dt = time.perf_counter() - t0
            ts.append(dt)
            if fut is not None:
                np.asarray(fut)  # drain
            del out
        best = min(ts)
        print(
            f"{name:34s} {best:7.2f} s  {total/best/1e9:6.2f} GB/s"
            f"  (all: {', '.join(f'{t:.2f}' for t in ts)})",
            flush=True,
        )

    # warm the concat shape
    put_train(src)

    measure("idle t1 concat", 1, False)
    measure("idle t1 pieces-only", 1, False, do_concat=False)
    measure("idle t4 concat", 4, False)
    measure("busy t1 concat", 1, True)
    measure("busy t1 pieces-only", 1, True, do_concat=False)
    measure("busy t2 concat", 2, True)
    measure("busy t4 concat", 4, True)
    measure("busy t4 pieces-only", 4, True, do_concat=False)


if __name__ == "__main__":
    main()
