"""Measure the same-machine CPU G1 MSM baseline and cache it for bench.py.

Replaces the hardcoded 1e6 pts/s arkworks ballpark (VERDICT r1 item 9) with
a real number: the multithreaded native Pippenger in native/field_ops.cpp
(4x64 Montgomery, Jacobian mixed adds, one thread per window — the same
shape as ark-ec's `parallel` MSM, reference: Cargo.toml:26). The best
window size is scanned, correctness is asserted against the exact-int
refmath MSM first, and the result lands in .cache/cpu_msm_baseline.json,
which bench.py picks up for its vs_baseline ratio.

Run: python scripts/bench_cpu_baseline.py [--log-n 20] [--repeats 3]
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--windows", type=int, nargs="*", default=[12, 13, 14, 15, 16])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.ops import curve_jax as cj
    from circom_compat_tpu.ops import limbs as lc
    from circom_compat_tpu.ops import native_field as nf
    from circom_compat_tpu.refmath import curve as rc
    from circom_compat_tpu.utils import paths

    if not nf.available():
        print(json.dumps({"error": "native library unavailable"}))
        return 1

    rng = random.Random(1)
    base = rc.g1_generator()
    pts = [rc.G1.mul(base, rng.randrange(1, 1 << 64)) for _ in range(256)]
    xs0, ys0 = cj.encode_g1_affine(pts)

    # correctness gate at n=2048 against the exact-int reference
    n_chk = 2048
    xs = np.tile(xs0, (n_chk // 256, 1)).astype(np.uint16)
    ys = np.tile(ys0, (n_chk // 256, 1)).astype(np.uint16)
    sc = [rng.randrange(R_SCALAR) for _ in range(n_chk)]
    got = nf.msm_g1_native((xs, ys), sc, window_bits=13)
    want = None
    for i, s in enumerate(sc):
        want = rc.G1.add(want, rc.G1.mul(pts[i % 256], s))
    assert got == want, "native MSM disagrees with refmath"

    n = 1 << args.log_n
    xs = np.tile(xs0, (n // 256, 1)).astype(np.uint16)
    ys = np.tile(ys0, (n // 256, 1)).astype(np.uint16)
    sc16 = lc.ints_to_limbs(
        [rng.randrange(R_SCALAR) for _ in range(n)], dtype=np.uint16
    )

    best = (0.0, None)
    per_window = {}
    for wb in args.windows:
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            nf.msm_g1_window_sums_native(xs, ys, sc16, wb)
            times.append(time.perf_counter() - t0)
        pps = n / min(times)
        per_window[wb] = round(pps, 1)
        if pps > best[0]:
            best = (pps, wb)

    record = {
        "metric": "cpu_native_g1_msm_points_per_sec",
        "points_per_sec": round(best[0], 1),
        "window_bits": best[1],
        "log_n": args.log_n,
        "threads": os.cpu_count(),
        "per_window": per_window,
        "note": "multithreaded native Pippenger (native/field_ops.cpp), "
                "measured on this machine; bench.py vs_baseline denominator",
    }
    out = paths.cache_dir() / "cpu_msm_baseline.json"
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
