"""Forced-sync stage profile of the streamed prover (round 4).

The fused rework (one dispatch per chunk + chunked H2D) did NOT move the
2^20 streamed time (23.7 -> 23.1 s vs 8.34 s resident), so the 15 s of
overhead lives elsewhere. This script runs the streamed pipeline manually
with a block_until_ready after every phase — overlap is destroyed, so the
SUM exceeds the real run, but each line is honestly attributed.

  python scripts/profile_streamed.py --log-domain 20 --chunk 524288
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-domain", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=1 << 19)
    args = ap.parse_args()

    from e2e_large import CACHE, get_key, witness_for  # noqa: E402

    from circom_compat_tpu.models import groth16_jax as gj
    from circom_compat_tpu.models import streamed as sm

    pk, matrices, n_b = get_key(args.log_domain)
    assignment = witness_for(n_b, a=3)

    spk = sm.StreamedProvingKey.build(
        pk, matrices, matrices.num_constraints, chunk_points=args.chunk
    )
    window_bits = gj.default_window_bits(max(spk.n_vars, spk.domain_size))
    chunk = args.chunk

    def force(x):
        jax.block_until_ready(x)
        return x

    asg_plain_np = np.asarray(gj._encode_assignment(assignment))

    # --- witness map ---
    wj = sm._witness_jit(spk)
    arrays = sm._witness_arrays(spk)
    asg_dev = force(sm._put_chunked(asg_plain_np))
    out = force(wj(arrays, asg_dev))  # compile
    t0 = time.perf_counter()
    out = force(wj(arrays, asg_dev))
    t_wit = time.perf_counter() - t0
    t0 = time.perf_counter()
    h_plain = np.asarray(out)
    t_wit_d2h = time.perf_counter() - t0

    jits = sm._chunk_jits(spk, window_bits)
    sc_asg = asg_plain_np[: spk.n_vars]
    sc_l = asg_plain_np[spk.num_inputs : spk.num_inputs + spk.aux_len]
    sc_h = h_plain
    sec_a, sec_b1, sec_l, sec_h = spk.g1_sections
    n = max(spk.n_vars, spk.domain_size)

    def stage(lo):
        flat = []
        for xs, ys in (sec_a, sec_b1, sec_l, sec_h, spk.g2_section):
            flat.extend(sm._stage_rows(xs, ys, lo, chunk))
        flat.append(sm._stage_scalars(sc_asg, lo, chunk))
        flat.append(sm._stage_scalars(sc_l, lo, chunk))
        flat.append(sm._stage_scalars(sc_h, lo, chunk))
        return flat

    from circom_compat_tpu.ops import curve_jax as cj

    # compile the fused/scans jits once (cold)
    accs = tuple(sm._init_buckets(cj.FQ_ADAPTER, window_bits) for _ in range(4)
                 ) + (sm._init_buckets(cj.FQ2_ADAPTER, window_bits),)
    cur = force(stage(0))
    t0 = time.perf_counter()
    accs = force(jits["fused"](*cur, *accs))
    print(f"[compile] fused first call {time.perf_counter()-t0:.1f}s",
          flush=True)

    # --- timed pass (fresh accumulators) ---
    accs = tuple(sm._init_buckets(cj.FQ_ADAPTER, window_bits) for _ in range(4)
                 ) + (sm._init_buckets(cj.FQ2_ADAPTER, window_bits),)
    force(accs)
    t_stage_all, t_fused_all = 0.0, 0.0
    n_chunks = 0
    for lo in range(0, n, chunk):
        t0 = time.perf_counter()
        cur = force(stage(lo))
        t_stage_all += time.perf_counter() - t0
        t0 = time.perf_counter()
        accs = force(jits["fused"](*cur, *accs))
        t_fused_all += time.perf_counter() - t0
        n_chunks += 1
    t0 = time.perf_counter()
    sums = force(jits["scans"](*accs))
    t_scans = time.perf_counter() - t0

    print(f"domain 2^{args.log_domain} chunk {chunk} wb {window_bits} "
          f"chunks {n_chunks}")
    print(f"witness map (device)      {t_wit*1e3:9.1f} ms")
    print(f"witness D2H (h_plain)     {t_wit_d2h*1e3:9.1f} ms")
    print(f"staging (host+H2D) total  {t_stage_all*1e3:9.1f} ms "
          f"({t_stage_all/n_chunks*1e3:.1f} ms/chunk)")
    print(f"fused bucket updates      {t_fused_all*1e3:9.1f} ms "
          f"({t_fused_all/n_chunks*1e3:.1f} ms/chunk)")
    print(f"deferred scans            {t_scans*1e3:9.1f} ms")
    total = t_wit + t_wit_d2h + t_stage_all + t_fused_all + t_scans
    print(f"SUM (no overlap)          {total*1e3:9.1f} ms")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/scripts")
    main()
