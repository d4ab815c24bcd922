"""Stage breakdown of the resident 2^20 prove (VERDICT r2 item 6): where
do the ~8.3 s go — witness map (6 NTTs + sparse eval), sorts, the four G1
MSMs, the G2 MSM?

Each stage is jitted separately with the SAME key arrays as arguments, so
the sum of stages ~= the one-jit prove core (modulo XLA fusing across
stage boundaries in the real core).

  python -u scripts/profile_prove20.py [--log-domain 20]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from e2e_large import get_key, witness_for  # noqa: E402  (same dir)


def log(m):
    print(m, flush=True)


def force(tree):
    # block_until_ready, NOT np.asarray: a full D2H over the axon tunnel
    # costs seconds for GB-sized intermediates and poisons stage timings
    # (first run of this script: "sorts 34.6 s" was ~640 MB of orders+keys
    # being fetched to host, not compute).
    for c in jax.tree_util.tree_leaves(tree):
        if hasattr(c, "block_until_ready"):
            c.block_until_ready()


def steady(fn, *args, reps=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        force(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-domain", type=int, default=20)
    ap.add_argument("--window-bits", type=int, default=None)
    args = ap.parse_args()

    from circom_compat_tpu.models import groth16_jax as gj
    from circom_compat_tpu.ops import curve_jax as cj
    from circom_compat_tpu.ops import field_jax as fj
    from circom_compat_tpu.ops import msm as msm_ops
    from circom_compat_tpu.ops import ntt

    log(f"backend={jax.default_backend()}")
    pk, matrices, n_b = get_key(args.log_domain)
    assignment = witness_for(n_b, a=3)

    t0 = time.time()
    dpk = gj.DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    arrays = gj._device_arrays(dpk)
    log(f"[stage] device staging {time.time()-t0:.1f}s")
    w = args.window_bits or gj.default_window_bits(
        max(dpk.n_vars, dpk.domain_size)
    )
    log(f"[stage] window_bits {w}")

    asg_plain = jnp.asarray(gj._encode_assignment(assignment))
    num_constraints = dpk.num_constraints
    num_inputs = dpk.num_inputs
    domain_size = dpk.domain_size
    la, lb1, ll, lh = dpk.g1_lengths
    aux_len, g2_len = dpk.aux_len, dpk.g2_len
    n_max = int(arrays["g1_x"].shape[1])

    @jax.jit
    def witness(arrays, asg_plain):
        from circom_compat_tpu.ops import field_pallas as fp

        plan_t = gj._TracedNTTPlan(domain_size, arrays["ntt"])
        asg_mont = (fp.fr_to_mont(asg_plain) if fp.use_pallas()
                    else fj.to_mont_impl(fj.FR, asg_plain))
        h_mont = ntt.witness_map_impl(
            plan_t,
            arrays["a_rows"], arrays["a_cols"], arrays["a_vals"],
            arrays["b_rows"], arrays["b_cols"], arrays["b_vals"],
            asg_mont, num_constraints, num_inputs,
        )
        return (fp.fr_from_mont(h_mont) if fp.use_pallas()
                else fj.from_mont_impl(fj.FR, h_mont))

    def fit(sc, true_len):
        sc = sc[:true_len]
        return jnp.pad(sc, ((0, n_max - sc.shape[0]), (0, 0)))

    @jax.jit
    def scalars(asg_plain, h_plain):
        sc_a = fit(asg_plain, la)
        sc_b1 = sc_a if lb1 == la else fit(asg_plain, lb1)
        sc_l = fit(asg_plain[num_inputs : num_inputs + aux_len], ll)
        sc_h = fit(h_plain, lh)
        return jnp.stack([sc_a, sc_b1, sc_l, sc_h])

    @jax.jit
    def sorts(sc):
        outs = [msm_ops.window_orders(sc[i], w) for i in range(4)]
        return (jnp.stack([o for o, _ in outs]),
                jnp.stack([k for _, k in outs]))

    def g1_one_msm(i):
        @jax.jit
        def one(arrays, sc, orders, keys):
            return msm_ops.window_sums_affine_impl(
                cj.FQ_ADAPTER, arrays["g1_x"][i], arrays["g1_y"][i],
                sc[i], w, precomp=(orders[i], keys[i]),
            )
        return one

    @jax.jit
    def g2_msm(arrays, sc, orders, keys):
        return msm_ops.window_sums_affine_impl(
            cj.FQ2_ADAPTER, arrays["g2_x"], arrays["g2_y"],
            sc[0], w, precomp=(orders[0], keys[0]),
        )

    t, h_plain = steady(witness, arrays, asg_plain)
    log(f"[stage] witness_map (6 NTTs + sparse eval): {t*1e3:8.1f} ms")
    t, sc = steady(scalars, asg_plain, h_plain)
    log(f"[stage] scalar staging:                     {t*1e3:8.1f} ms")
    t, (orders, keys) = steady(sorts, sc)
    log(f"[stage] 4x window sorts (W per-window):     {t*1e3:8.1f} ms")
    total_msm = 0.0
    for i, name in enumerate(("A", "B1", "L", "H")):
        t, _ = steady(g1_one_msm(i), arrays, sc, orders, keys)
        total_msm += t
        log(f"[stage] G1 MSM {name}:                          {t*1e3:8.1f} ms")
    t, _ = steady(g2_msm, arrays, sc, orders, keys)
    total_msm += t
    log(f"[stage] G2 MSM B2:                          {t*1e3:8.1f} ms")

    core = gj.get_prove_core(dpk, w)
    t, _ = steady(core, asg_plain)
    log(f"[whole] one-jit prove core:                 {t*1e3:8.1f} ms "
        f"(sum of MSM stages {total_msm*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
