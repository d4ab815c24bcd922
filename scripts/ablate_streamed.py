"""End-to-end ablation of the streamed prover (round 4).

Per-stage forcing through the axon tunnel is unusable (block_until_ready
returns early; forced stage lines inflate 4x — see profile_streamed.py's
104 s SUM vs the real 23 s run). Attribute instead by timing the REAL
async pipeline with one stage removed per variant:

  full        : prove_streamed as shipped
  no-witness  : h_plain precomputed outside the timed region
  no-h2d      : all chunks pre-staged on device; loop runs fused+scans only
  no-scans    : deferred suffix scans skipped (result discarded)

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
    wj_arrays = sm._witness_arrays(spk)
    if "witness" not in spk._cache:
        spk._cache["witness"] = sm._witness_jit(spk)

    def witness_h():
        return np.asarray(
            spk._cache["witness"](wj_arrays, sm._put_chunked(asg_plain_np))
        )

    h_pre = witness_h()  # compiles; also the precomputed h for no-witness
    sc_asg = asg_plain_np[: spk.n_vars]
    sc_l = asg_plain_np[spk.num_inputs : spk.num_inputs + spk.aux_len]
    sec_a, sec_b1, sec_l, sec_h = spk.g1_sections
    n = max(spk.n_vars, spk.domain_size)

    def stage(lo, sc_h):
        flat = []
        for xs, ys in (sec_a, sec_b1, sec_l, sec_h, spk.g2_section):
            flat.extend(sm._stage_rows(xs, ys, lo, chunk))
        flat.append(sm._stage_scalars(sc_asg, lo, chunk))
        flat.append(sm._stage_scalars(sc_l, lo, chunk))
        flat.append(sm._stage_scalars(sc_h, lo, chunk))
        return flat

    def fresh_accs():
        return tuple(
            sm._init_buckets(cj.FQ_ADAPTER, wb) for _ in range(4)
        ) + (sm._init_buckets(cj.FQ2_ADAPTER, wb),)

    def msm_loop(sc_h, prestaged=None, do_scans=True):
        accs = fresh_accs()
        from concurrent.futures import ThreadPoolExecutor

        if prestaged is None:
            with ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(stage, 0, sc_h)
                for lo in range(0, n, chunk):
                    cur = fut.result()
                    if lo + chunk < n:
                        fut = pool.submit(stage, lo + chunk, sc_h)
                    accs = jits["fused"](*cur, *accs)
        else:
            for cur in prestaged:
                accs = jits["fused"](*cur, *accs)
        if not do_scans:
            jax.block_until_ready(accs)
            return jax.tree_util.tree_map(np.asarray, accs[0])
        sums = jits["scans"](*accs)
        return jax.tree_util.tree_map(np.asarray, sums)

    def run_full():
        h = witness_h()
        return msm_loop(h)

    def run_no_witness():
        return msm_loop(h_pre)

    prestaged = [stage(lo, h_pre) for lo in range(0, n, chunk)]
    jax.block_until_ready(prestaged)

    def run_no_h2d():
        return msm_loop(h_pre, prestaged=prestaged)

    def run_no_scans():
        return msm_loop(h_pre, do_scans=False)

    variants = [
        ("full", run_full),
        ("no-witness", run_no_witness),
        ("no-h2d (prestaged)", run_no_h2d),
        ("no-scans", run_no_scans),
    ]
    print(f"domain 2^{args.log_domain} chunk {chunk} wb {wb}", flush=True)
    for name, fn in variants:
        fn()  # warm (compile already done via shipped jits)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name:22s} {min(ts):8.2f} s", flush=True)


if __name__ == "__main__":
    main()
