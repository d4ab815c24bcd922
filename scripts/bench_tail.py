"""Pin down the fixed cost in the MSM bucket tail.

Times, at bucket-tail widths: a no-op jit (dispatch), one Pallas add call,
one fused tile_scan call, a full inclusive_scan, and a full fold.
python -u scripts/bench_tail.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import msm as msm_ops
from circom_compat_tpu.ops import segments


def log(m):
    print(m, flush=True)


def time_steady(fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda c: np.asarray(c).ravel()[:1], out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda c: np.asarray(c).ravel()[:1], out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    F = cj.FQ_ADAPTER
    ident = tuple(jnp.asarray(c) for c in cj.proj_identity_const(F))
    combine = msm_ops.combine_for(F)
    _, ts_gen = msm_ops.tile_scans_for(F)
    rng = np.random.default_rng(9)

    t = time_steady(jax.jit(lambda x: x + 1), jnp.zeros((8,), jnp.uint32))
    log(f"RESULT dispatch_noop: {t*1e3:.2f} ms")

    for n in (128, 2048, 32768):
        p = tuple(
            jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
            for _ in range(3)
        )
        q = tuple(
            jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
            for _ in range(3)
        )
        t = time_steady(jax.jit(lambda a, b: combine(a, b)), p, q)
        log(f"RESULT pallas_add_n{n}: {t*1e3:.2f} ms")

    for n in (2048, 32768):
        K = 16
        T = n // K
        vt = tuple(
            jnp.asarray(
                rng.integers(0, 1 << 16, size=(T, K, 16), dtype=np.uint32)
            )
            for _ in range(3)
        )
        ft = jnp.zeros((T, K), bool)
        t = time_steady(jax.jit(lambda v, f: ts_gen(v, f)), vt, ft)
        log(f"RESULT tile_scan_T{T}: {t*1e3:.2f} ms")

    for n in (32768,):
        p = tuple(
            jnp.asarray(rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32))
            for _ in range(3)
        )
        t = time_steady(
            jax.jit(
                lambda v: segments.inclusive_scan(
                    combine, v, ident, tile_scan=ts_gen
                )
            ),
            p,
        )
        log(f"RESULT inclusive_scan_n{n}: {t*1e3:.2f} ms")
        t = time_steady(
            jax.jit(
                lambda v: segments.fold(combine, v, ident, tile_scan=ts_gen)
            ),
            p,
        )
        log(f"RESULT fold_n{n}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
