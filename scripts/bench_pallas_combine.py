"""Measure the limb-major Pallas fused point-add vs the XLA-composed group
law, then MSM throughput with the Pallas combine — on the real TPU.

Ordered so cheap-to-compile results print first (axon remote compiles are
minutes each); every result prints immediately with flush. Run from the
repo root:  python -u scripts/bench_pallas_combine.py [--stages adds,msm16,msm20,g2]

Measurement discipline (see BASELINE.md): np.asarray on a small reduced
output forces execution through the tunnel; the D2H payload must stay tiny
or the 0.8 GB/s tunnel dominates the timing.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import curve_pallas as cp
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.ops import msm as msm_ops

CHAIN = 16  # sequential dependent adds per timed call


def log(msg):
    print(msg, flush=True)


def rand_limbs(rng, shape):
    # Random sub-2^16 limbs: not canonical field elements, but the add/mul
    # datapath is data-independent so timing is representative.
    return jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))


def checksum(tree):
    return sum(int(np.asarray(c.sum(dtype=jnp.uint32))) for c in jax.tree_util.tree_leaves(tree))


def time_steady(fn, *args, reps=3):
    out = fn(*args)
    _ = checksum(out)  # force; also warms
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = checksum(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def make_chain(combine, n_coords):
    @jax.jit
    def chain(p, q):
        def body(acc, _):
            return combine(acc, q), None

        out, _ = jax.lax.scan(body, p, None, length=CHAIN)
        return tuple(c.sum(dtype=jnp.uint32) for c in out)

    return chain


def stage_adds(n):
    rng = np.random.default_rng(7)
    p = tuple(rand_limbs(rng, (n, 16)) for _ in range(3))
    q = tuple(rand_limbs(rng, (n, 16)) for _ in range(3))

    log(f"[adds] compiling XLA G1 add chain (N={n}, chain={CHAIN}) ...")
    xla_chain = make_chain(lambda a, b: cj.proj_add_impl(cj.FQ_ADAPTER, a, b), 3)
    t = time_steady(xla_chain, p, q)
    log(f"RESULT g1_add_xla: {n * CHAIN / t / 1e6:.3f} M adds/s  ({t*1e3:.1f} ms/call)")

    log("[adds] compiling Pallas limb-major G1 add chain ...")
    pl_chain = make_chain(cp.g1_add_pallas, 3)
    t = time_steady(pl_chain, p, q)
    log(f"RESULT g1_add_pallas_lm: {n * CHAIN / t / 1e6:.3f} M adds/s  ({t*1e3:.1f} ms/call)")


def stage_adds_g2(n):
    rng = np.random.default_rng(11)
    p = tuple(rand_limbs(rng, (n, 2, 16)) for _ in range(3))
    q = tuple(rand_limbs(rng, (n, 2, 16)) for _ in range(3))
    log(f"[g2] compiling Pallas limb-major G2 add chain (N={n}) ...")
    pl_chain = make_chain(cp.g2_add_pallas, 3)
    t = time_steady(pl_chain, p, q)
    log(f"RESULT g2_add_pallas_lm: {n * CHAIN / t / 1e6:.3f} M adds/s  ({t*1e3:.1f} ms/call)")


def stage_g2msm(n=10240, window_bits=10):
    """G2 window sums at B2-query scale (the 10^4 prove's 1.25 s stage
    before the fused combine)."""
    import random

    from circom_compat_tpu.refmath import curve as rc

    rng = random.Random(9)
    seed = [rc.G2.mul(rc.g2_generator(), rng.randrange(1, 1 << 64)) for _ in range(64)]
    pts = (seed * (n // 64 + 1))[:n]
    xs, ys = cj.encode_g2_affine(pts)
    sc = jnp.asarray(fj.encode_plain(
        [rng.randrange(1, fj.FR.modulus) for _ in range(n)], fj.FR))
    xs16 = jnp.asarray(np.asarray(xs).astype(np.uint16))
    ys16 = jnp.asarray(np.asarray(ys).astype(np.uint16))
    log(f"[g2msm] compiling G2 MSM n={n} w={window_bits} ...")

    def run():
        return jax.jit(
            msm_ops.window_sums_affine_impl, static_argnums=(0, 4)
        )(cj.FQ2_ADAPTER, xs16, ys16, sc, window_bits)

    t = time_steady(run)
    log(f"RESULT g2_msm_pallas_n{n}_w{window_bits}: {n / t / 1e3:.2f} k points/s  ({t:.3f} s)")


def msm_points(n, rng_seed=1):
    import random

    from circom_compat_tpu.refmath import curve as rc

    rng = random.Random(rng_seed)
    base = rc.g1_generator()
    seed_pts = [rc.G1.mul(base, rng.randrange(1, 1 << 64)) for _ in range(256)]
    xs0, ys0 = cj.encode_g1_affine(seed_pts)
    reps = -(-n // 256)
    xs = np.tile(xs0, (reps, 1))[:n]
    ys = np.tile(ys0, (reps, 1))[:n]
    sc = fj.encode_plain([rng.randrange(R_SCALAR) for _ in range(n)])
    return (jnp.asarray(xs.astype(np.uint16)), jnp.asarray(ys.astype(np.uint16))), jnp.asarray(sc)


def stage_msm(log_n, window_bits=13, log_chunk=16):
    n = 1 << log_n
    jac, sc = msm_points(n)
    log(
        f"[msm] compiling G1 MSM 2^{log_n} w={window_bits} chunk=2^{log_chunk} "
        "with Pallas combine ..."
    )

    xs16, ys16 = jac

    def run():
        return jax.jit(
            msm_ops.window_sums_affine_impl, static_argnums=(0, 4, 5, 6)
        )(cj.FQ_ADAPTER, xs16, ys16, sc, window_bits, 1 << log_chunk, True)

    t0 = time.perf_counter()
    t = time_steady(run)
    log(f"  (first-call incl. compile: {time.perf_counter() - t0 - 3 * t:.0f} s)")
    log(
        f"RESULT g1_msm_pallas_2^{log_n}_w{window_bits}_c{log_chunk}: "
        f"{n / t / 1e3:.1f} k points/s  ({t:.3f} s)"
    )


def stage_check(n=2048, window_bits=13):
    """Full-size integration correctness on real TPU: device window sums +
    host fold vs a naive refmath MSM (exact Python ints)."""
    import random

    from circom_compat_tpu.refmath import curve as rc

    rng = random.Random(42)
    pts = [rc.G1.mul(rc.g1_generator(), rng.randrange(1, rc.R_SCALAR)) for _ in range(64)]
    pts = pts * (n // 64)
    scalars = [rng.randrange(0, rc.R_SCALAR) for _ in range(n)]
    xs, ys = cj.encode_g1_affine(pts)
    got = msm_ops.msm_g1((np.asarray(xs), np.asarray(ys)), scalars, window_bits)
    want = None
    for p, k in zip(pts, scalars):
        want = rc.G1.add(want, rc.G1.mul(p, k))
    assert got == want, f"MSM mismatch: {got} != {want}"
    log(f"RESULT msm_check_n{n}_w{window_bits}: OK (device == refmath)")


def stage_wmap(log_n=20):
    """Witness-map transforms (6 NTTs + pointwise) at 2^log_n, limb-major
    Pallas pipeline, with on-chip parity against the XLA path at 2^14."""
    import random

    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.ops import limbs as lc
    from circom_compat_tpu.ops import ntt

    RNG = random.Random(5)

    def enc(vals):
        import numpy as _np

        return jnp.asarray(
            _np.stack([lc.int_to_limbs((v << 256) % R_SCALAR) for v in vals])
        )

    n = 1 << 14
    plan = ntt.get_plan(n)
    a = enc([RNG.randrange(R_SCALAR) for _ in range(n)])
    b = enc([RNG.randrange(R_SCALAR) for _ in range(n)])
    got = np.asarray(jax.jit(lambda x, y: ntt._witness_map_transforms_lm(plan, x, y))(a, b))
    c = fj.mont_mul(fj.FR, a, b)
    ax = ntt.fft_impl(plan, ntt.coset_shift_impl(plan, ntt.ifft_impl(plan, a)))
    bx = ntt.fft_impl(plan, ntt.coset_shift_impl(plan, ntt.ifft_impl(plan, b)))
    cx = ntt.fft_impl(plan, ntt.coset_shift_impl(plan, ntt.ifft_impl(plan, c)))
    want = np.asarray(fj.sub(fj.FR, fj.mont_mul(fj.FR, ax, bx), cx))
    gi = [lc.limbs_to_int(r) % R_SCALAR for r in got]
    wi = [lc.limbs_to_int(r) % R_SCALAR for r in want]
    assert gi == wi, "witness-map transforms parity FAILED on chip"
    log("RESULT wmap_parity_2^14: OK")

    n = 1 << log_n
    plan = ntt.get_plan(n)
    seed = enc([RNG.randrange(R_SCALAR) for _ in range(4096)])
    big_a = jnp.tile(seed, (n // 4096, 1))
    big_b = jnp.tile(seed[::-1], (n // 4096, 1))
    f = jax.jit(lambda x, y: ntt._witness_map_transforms_lm(plan, x, y))
    t = time_steady(f, big_a, big_b)
    log(f"RESULT wmap_transforms_2^{log_n}: {t:.3f} s")


def stage_e2e():
    """Steady-state prove core on the cached complex-circuit zkey."""
    import pathlib

    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.models import groth16_jax as gj

    zkey = pathlib.Path("/root/repo/.cache/complex-circuit-10000-10000.zkey")
    if not zkey.exists():
        log("[e2e] no cached zkey; skipping")
        return
    pk, matrices = read_zkey(zkey)
    dpk = gj.DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    core = gj.get_prove_core(dpk)
    import jax.numpy as jnp

    from circom_compat_tpu.ops import field_jax as fj

    asg = jnp.asarray(fj.encode_plain(list(range(1, dpk.n_vars + 1)), fj.FR))
    log("[e2e] compiling prove core ...")
    t = time_steady(lambda: core(asg))
    log(f"RESULT e2e_prove_core_10000: {t:.3f} s steady-state")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="adds,msm16,msm20,g2")
    ap.add_argument("--n", type=int, default=1 << 16)
    args = ap.parse_args()
    stages = args.stages.split(",")

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    dispatch = {
        "adds": lambda: stage_adds(args.n),
        "msm16": lambda: stage_msm(16, 13, 16),
        "msm20": lambda: stage_msm(20),
        "msm20w16": lambda: stage_msm(20, 16, 20),
        "msm20w17": lambda: stage_msm(20, 17, 20),
        "g2": lambda: stage_adds_g2(args.n // 4),
        # chunk/window sweep at 2^20: bigger chunks amortize windows now
        # that the combine's working set is tiny.
        "sweep": lambda: (stage_msm(20, 14, 17), stage_msm(20, 15, 18),
                          stage_msm(20, 16, 20)),
        "check": stage_check,
        "e2e": stage_e2e,
        "g2msm": stage_g2msm,
        "wmap": stage_wmap,
    }
    for s in stages:
        dispatch[s]()
    log("DONE")


if __name__ == "__main__":
    main()
