"""Probe: does the persistent XLA compile cache serve the axon TPU backend?

Round-3/4 cold-start problem: first prove call at 2^20 costs ~246 s of
remote compile EVERY process, and .jax_cache stays empty on the axon
backend. This probe (a) jits a deliberately expensive limb-arithmetic
graph, (b) reports whether a cache entry appears, (c) when run twice,
shows whether the second process is served. Enables full debug logging of
the cache layer so the *reason* for a miss lands in stderr.

  python scripts/probe_compile_cache.py          # first run (cold)
  python scripts/probe_compile_cache.py          # second run (cached?)
"""

import logging
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE = pathlib.Path("/root/repo/.jax_cache_probe")

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax

jax.config.update("jax_compilation_cache_dir", str(CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from circom_compat_tpu.ops import field_jax as fj


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    before = sorted(p.name for p in CACHE.glob("*")) if CACHE.exists() else []
    print(f"cache entries before: {len(before)}", flush=True)

    @jax.jit
    def heavy(a, b):
        # a chain of Montgomery muls — the CIOS fori-loop graphs that
        # dominate real prove-core compiles
        for _ in range(8):
            a = fj.mont_mul(fj.FQ, a, b)
            b = fj.add(fj.FQ, a, b)
        return a, b

    x = jnp.ones((1 << 14, 16), jnp.uint32)
    t0 = time.time()
    out = heavy(x, x)
    jax.block_until_ready(out)
    print(f"first call: {time.time()-t0:.2f}s", flush=True)

    after = sorted(p.name for p in CACHE.glob("*")) if CACHE.exists() else []
    print(f"cache entries after: {len(after)} (new: {len(after)-len(before)})",
          flush=True)
    for name in after:
        if name not in before:
            print(f"  new entry: {name} "
                  f"({(CACHE/name).stat().st_size} bytes)", flush=True)


if __name__ == "__main__":
    main()
