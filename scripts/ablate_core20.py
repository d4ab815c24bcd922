"""In-jit ablation of the 2^20 prove core (round 5, VERDICT r4 task 3).

The only attribution method that survives the axon tunnel (BASELINE r1
notes: standalone sub-jits carry 35-400 ms dispatch cost and D2H fetches
poison forced timings) is compiling the FULL core with one stage removed
and differencing steady-state times:

  full        : production core (witness map + packed-gather MSM pipeline)
  no-witmap   : h replaced by a slice of the assignment (NTTs DCE'd out)
  witmap-only : return h_plain, all five MSMs DCE'd out (D2H-contaminated
                by the 64 MB h fetch — use the no-witmap delta instead)
  no-g2       : B2 bucket pipeline + tail dropped (gathers kept)
  no-gather   : the three per-window takes replaced by contiguous slices
                (same downstream shapes/work) — in-core gather cost
  g2-signed   : B2 MSM on signed digits via the legacy unpacked path
                (r5 datapoint: LOSES, 8.63 s vs 8.33 s on the r4 core)

Round-5 measured history (all steady, w13, reps 3):
  r4 core:   full 8.33 / no-witmap 7.32 / no-g2 5.24 / g2-signed 8.63
  packed v1: 9.11 e2e (3-D gather operand fell off XLA's wide-row path)
  packed v2: 7.47 e2e (2-D rows; see DeviceProvingKey.abq_pack)

  python scripts/ablate_core20.py --log-domain 20 --reps 3
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build_variant(dpk, window_bits, mode):
    """The production core with one stage removed (gj._packed_window_sums
    carries the in-jit _ablate hook so this harness measures the real
    body, not a drifting copy)."""
    from circom_compat_tpu.models import groth16_jax as gj
    from circom_compat_tpu.ops import field_jax as fj
    from circom_compat_tpu.ops import msm as msm_ops
    from circom_compat_tpu.ops import ntt

    num_constraints = dpk.num_constraints
    num_inputs = dpk.num_inputs
    domain_size = dpk.domain_size
    g1_lengths = dpk.g1_lengths
    aux_len = dpk.aux_len

    def core(arrays, asg_plain):
        plan_t = gj._TracedNTTPlan(domain_size, arrays["ntt"])
        from circom_compat_tpu.ops import field_pallas as fp

        if mode == "no-witmap":
            h_plain = jnp.pad(
                asg_plain[:domain_size],
                ((0, max(0, domain_size - asg_plain.shape[0])), (0, 0)),
            )
        else:
            if fp.use_pallas():
                asg_mont = fp.fr_to_mont(asg_plain)
            else:
                asg_mont = fj.to_mont_impl(fj.FR, asg_plain)
            h_mont = ntt.witness_map_impl(
                plan_t,
                arrays["a_rows"], arrays["a_cols"], arrays["a_vals"],
                arrays["b_rows"], arrays["b_cols"], arrays["b_vals"],
                asg_mont, num_constraints, num_inputs,
            )
            if fp.use_pallas():
                h_plain = fp.fr_from_mont(h_mont)
            else:
                h_plain = fj.from_mont_impl(fj.FR, h_mont)
        if mode == "witmap-only":
            return h_plain

        n_max = arrays["abq"].shape[0]

        def fit(sc, true_len):
            sc = sc[:true_len]
            return jnp.pad(sc, ((0, n_max - sc.shape[0]), (0, 0)))

        la, lb1, ll, lh = g1_lengths
        sc_a = fit(asg_plain, la)
        sc_l = fit(asg_plain[num_inputs : num_inputs + aux_len], ll)
        sc_h = fit(h_plain, lh)
        oa, ka = msm_ops.window_orders(sc_a, window_bits)
        ol, kl = msm_ops.window_orders(sc_l, window_bits)
        oh, kh = msm_ops.window_orders(sc_h, window_bits)
        sorts = (oa, ka, ol, kl, oh, kh)

        if mode == "g2-signed":
            from circom_compat_tpu.ops import curve_jax as cj

            g1_sums, _ = gj._packed_window_sums(
                arrays["abq"], arrays["lpk"], arrays["hpk"],
                sorts, window_bits, _ablate="no-g2",
            )
            n = arrays["abq"].shape[0]
            g2_sums = msm_ops.window_sums_affine_impl(
                cj.FQ2_ADAPTER,
                arrays["abq"][:, 64:96].reshape(n, 2, 16),
                arrays["abq"][:, 96:128].reshape(n, 2, 16),
                sc_a, window_bits, signed=True,
            )
            return g1_sums, g2_sums

        ablate = mode if mode in ("no-g2", "no-gather") else None
        return gj._packed_window_sums(
            arrays["abq"], arrays["lpk"], arrays["hpk"],
            sorts, window_bits, _ablate=ablate,
        )

    return core


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-domain", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--modes", default="full,no-witmap,no-g2,no-gather"
    )
    args = ap.parse_args()

    from e2e_large import get_key, witness_for

    from circom_compat_tpu.models import groth16_jax as gj

    pk, matrices, n_b = get_key(args.log_domain)
    dpk = gj.DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    wb = gj.default_window_bits(max(dpk.n_vars, dpk.domain_size))
    arrays = gj._device_arrays(dpk)
    assignment = witness_for(n_b, a=3)
    from circom_compat_tpu.utils.xfer import put_chunked

    asg = put_chunked(gj._encode_assignment(assignment))
    print(f"domain 2^{args.log_domain} wb {wb} "
          f"backend {jax.default_backend()}", flush=True)

    results = {}
    for mode in args.modes.split(","):
        fn = jax.jit(build_variant(dpk, wb, mode))
        t0 = time.time()
        out = fn(arrays, asg)
        _ = [np.asarray(c) for c in jax.tree_util.tree_leaves(out)]
        print(f"{mode:12s} first call {time.time()-t0:7.1f} s", flush=True)
        ts = []
        for _i in range(args.reps):
            t0 = time.perf_counter()
            out = fn(arrays, asg)
            _ = [np.asarray(c) for c in jax.tree_util.tree_leaves(out)]
            ts.append(time.perf_counter() - t0)
        results[mode] = min(ts)
        print(f"{mode:12s} steady {min(ts):7.2f} s  (all: "
              + ", ".join(f"{t:.2f}" for t in ts) + ")", flush=True)

    if "full" in results:
        full = results["full"]
        print("\n--- attribution (deltas vs full) ---", flush=True)
        for mode, t in results.items():
            if mode != "full":
                print(f"{mode:12s} {t:7.2f} s  delta {full - t:+6.2f} s",
                      flush=True)


if __name__ == "__main__":
    main()
