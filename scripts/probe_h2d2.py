"""Does piecewise device_put dodge the large-transfer cliff?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
total_mb = 128
x = np.random.randint(0, 1 << 16, (total_mb * 1024 * 1024 // 2,), dtype=np.uint16)
for piece_mb in (1, 2, 4, 8, 16):
    k = total_mb // piece_mb
    pieces = np.split(x, k)
    d = [jax.device_put(p) for p in pieces]; jax.block_until_ready(d)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = [jax.device_put(p) for p in pieces]
        jax.block_until_ready(d)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"pieces of {piece_mb:3d} MB: {t*1e3:8.1f} ms ({total_mb/t:8.1f} MB/s)", flush=True)
# and device-side concat cost
pieces = np.split(x, 32)
d = [jax.device_put(p) for p in pieces]; jax.block_until_ready(d)
cat = jax.jit(lambda ps: jnp.concatenate(ps))
o = cat(d); o.block_until_ready()
t0 = time.perf_counter(); o = cat(d); o.block_until_ready()
print(f"device concat of 32x4MB: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
