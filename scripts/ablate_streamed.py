"""End-to-end ablation of the streamed prover (round 4).

Per-stage forcing through the axon tunnel is unusable (block_until_ready
returns early; forced stage lines inflated a real 23 s run to a 104 s
SUM). Attribute instead by timing the REAL async pipeline with one stage
removed per variant:

  full        : prove_streamed as shipped (device-resident scalars)
  no-witness  : h/scalars prepped outside the timed region
  no-h2d      : all row chunks pre-staged on device; loop runs fused+scans
  no-scans    : deferred suffix scans skipped (accumulators fetched)

Recorded r4 datapoints (pre-device-scalar rework, 2^20 chunk 2^19):
full 22.64 s / no-witness 18.36 s / no-h2d 8.02 s — staging+H2D was
~10.3 s and the witness D2H+restage ~4.3 s, which motivated keeping h and
all scalars device-resident.

  python scripts/ablate_streamed.py --log-domain 20 --chunk 524288
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-domain", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=1 << 19)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from e2e_large import get_key, witness_for

    from circom_compat_tpu.models import groth16_jax as gj
    from circom_compat_tpu.models import streamed as sm
    from circom_compat_tpu.ops import curve_jax as cj

    pk, matrices, n_b = get_key(args.log_domain)
    assignment = witness_for(n_b, a=3)
    spk = sm.StreamedProvingKey.build(
        pk, matrices, matrices.num_constraints, chunk_points=args.chunk
    )
    wb = gj.default_window_bits(max(spk.n_vars, spk.domain_size))
    chunk = args.chunk
    jits = sm._chunk_jits(spk, wb)

    asg_plain_np = np.asarray(gj._encode_assignment(assignment))
    if "witness" not in spk._cache:
        spk._cache["witness"] = sm._witness_jit(spk)
    wj_arrays = sm._witness_arrays(spk)

    n = max(max(s[0].shape[0] for s in spk.g1_sections),
            spk.g2_section[0].shape[0], spk.n_vars, spk.domain_size)
    P = -(-n // chunk) * chunk

    def witness_prep():
        asg_dev = sm._put_chunked(asg_plain_np)
        h_dev = spk._cache["witness"](wj_arrays, asg_dev)
        return jits["prep"](asg_dev, h_dev, P)

    scalars_pre = jax.block_until_ready(witness_prep())

    def stage_host(lo):
        return sm._stage_packed_host(
            spk.g1_sections, spk.g2_section, lo, chunk
        )

    def stage(lo):
        return [sm._put_chunked(b) for b in stage_host(lo)]

    def fresh_accs():
        return (
            sm._init_buckets(cj.FQ_ADAPTER, wb, lead=(4,)),
            sm._init_buckets(cj.FQ2_ADAPTER, wb),
        )

    def msm_loop(scalars_dev, prestaged=None, do_scans=True):
        accs = fresh_accs()
        sa, sl_, sh = scalars_dev
        from concurrent.futures import ThreadPoolExecutor

        lows = list(range(0, n, chunk))
        if prestaged is None:
            # mirrors _stream_all's overlapped schedule: host memcpy AND
            # the put train both ride the prefetch thread
            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(stage, 0)
                for i, lo in enumerate(lows):
                    cur = fut.result()
                    if i + 1 < len(lows):
                        fut = pool.submit(stage, lows[i + 1])
                    accs = jits["fused"](*cur, sa, sl_, sh, np.int32(lo), *accs)
        else:
            for lo, cur in zip(lows, prestaged):
                accs = jits["fused"](*cur, sa, sl_, sh, np.int32(lo), *accs)
        if not do_scans:
            # force with a TINY fetch: np.asarray of the full (W, B, pt)
            # accumulators moved ~31 MB through the slow D2H direction and
            # made this variant read HIGHER than full (r4 first run)
            return np.asarray(accs[0][0][0, 0, 0])
        sums = jits["scans"](*accs)
        return jax.tree_util.tree_map(np.asarray, sums)

    def run_full():
        return msm_loop(witness_prep())

    def run_no_witness():
        return msm_loop(scalars_pre)

    prestaged = [stage(lo) for lo in range(0, n, chunk)]
    jax.block_until_ready(prestaged)

    def run_no_h2d():
        return msm_loop(scalars_pre, prestaged=prestaged)

    def run_no_scans():
        return msm_loop(scalars_pre, do_scans=False)

    variants = [
        ("full", run_full),
        ("no-witness", run_no_witness),
        ("no-h2d (prestaged)", run_no_h2d),
        ("no-scans", run_no_scans),
    ]
    print(f"domain 2^{args.log_domain} chunk {chunk} wb {wb}", flush=True)
    for name, fn in variants:
        fn()  # warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:22s} {min(ts):8.2f} s", flush=True)


if __name__ == "__main__":
    main()
