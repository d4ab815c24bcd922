"""Measure H2D (device_put) + D2H throughput through the axon tunnel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np

print("backend:", jax.default_backend(), flush=True)
for mb in (4, 32, 128):
    x = np.random.randint(0, 1 << 16, (mb * 1024 * 1024 // 2,), dtype=np.uint16)
    # warm
    d = jax.device_put(x); d.block_until_ready()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(x); d.block_until_ready()
        ts.append(time.perf_counter() - t0)
    t_h2d = min(ts)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(d)
        ts.append(time.perf_counter() - t0)
    t_d2h = min(ts)
    print(f"{mb:4d} MB: H2D {t_h2d*1e3:8.1f} ms ({mb/t_h2d:8.1f} MB/s)   "
          f"D2H {t_d2h*1e3:8.1f} ms ({mb/t_d2h:8.1f} MB/s)", flush=True)
