"""Micro-profile of individual limb-major field ops inside Pallas kernels.

Times a K-step dependent chain of ONE op per kernel call to get the true
per-op cost on the VPU — decides where the RCB combine's time actually
goes (mont_mul vs the reduced adds vs normalize), since the composite
kernel's op mix is hard to attribute. Run on the real TPU from the repo
root:  python -u scripts/bench_field_ops.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from circom_compat_tpu.ops import curve_pallas as cp
from circom_compat_tpu.ops import field_jax as fj
from circom_compat_tpu.ops import field_lm as flm

LANES = int(__import__("os").environ.get("LANES", 512))
K = int(__import__("os").environ.get("KSTEPS", 64))  # dependent steps per kernel call


def log(m):
    print(m, flush=True)


def make_op_kernel(op_name):
    def kernel(consts, a, b, o):
        lanes = a.shape[-1]
        col = lambda j: jnp.broadcast_to(consts[:, j : j + 1], (16, lanes))
        p_col, pc_col = col(0), col(1)
        p2_col, p2c_col = col(6), col(7)
        nprime = fj.FQ.nprime

        ops = {
            "mont_mul": lambda x, y: flm.mont_mul(p_col, pc_col, nprime, x, y),
            "mont_mul_lazy": lambda x, y: flm.mont_mul_lazy(p_col, nprime, x, y),
            "add": lambda x, y: flm.add(p_col, pc_col, x, y),
            "add_lazy": lambda x, y: flm.add_lazy(p2c_col, x, y),
            "sub_lazy": lambda x, y: flm.sub_lazy(p2_col, p2c_col, x, y),
            "normalize": lambda x, y: flm.normalize_u(x + y, pre_passes=1),
            "mul9": None,
        }
        if op_name == "mul9":
            add1 = lambda x, y: flm.add_lazy(p2c_col, x, y)

            def mul9(x, y):
                x2 = add1(x, x)
                x4 = add1(x2, x2)
                x8 = add1(x4, x4)
                return add1(x8, y)

            f = mul9
        else:
            f = ops[op_name]

        def step(k, acc):
            return f(acc, b[:])

        o[:] = jax.lax.fori_loop(0, K, step, a[:])

    return kernel


@partial(jax.jit, static_argnums=(0,))
def run_op(op_name, a, b):
    bs = pl.BlockSpec((16, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_c = pl.BlockSpec((16, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_op_kernel(op_name),
        grid=(a.shape[-1] // LANES,),
        in_specs=[bs_c, bs, bs],
        out_specs=bs,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(cp.FQ_CONSTS_LM), a, b)


def main():
    import os as _os
    n = 1 << int(_os.environ.get("LOGN", 16))  # lanes total
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    log(f"backend={jax.default_backend()} n_lanes={n} K={K}")
    import os
    for op in os.environ.get("OPS", "mont_mul,add_lazy,normalize").split(","):
        t0 = time.perf_counter()
        out = run_op(op, a, b)
        _ = np.asarray(out[0, :8])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_op(op, a, b)
            _ = np.asarray(out[0, :8])
            times.append(time.perf_counter() - t0)
        t = min(times)
        log(
            f"RESULT {op}: {n * K / t / 1e9:.3f} G ops/s "
            f"({t*1e3:.2f} ms/call, compile {compile_s:.0f}s)"
        )


if __name__ == "__main__":
    main()
