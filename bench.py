"""Benchmark driver: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric (per BASELINE.json): G1 MSM points/sec/chip at 2^20.

Robustness contract (VERDICT round 1, item 1): this script ALWAYS emits
exactly one parseable JSON line on stdout and exits 0, no matter what the
backend does. The axon TPU tunnel's failure mode is an indefinite HANG
(not an exception), so the measurement runs in a child process under a
hard timeout; the parent re-emits the child's JSON line, or a JSON record
with an "error" field if the child crashed, hung, or printed garbage.

Reference analogue: the criterion harness that always produces a number
(reference: benches/groth16.rs:52-84).

vs_baseline: ratio against the arkworks-machine ballpark recorded in
BASELINE.md (see --help for the per-metric definition).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))


# ---------------------------------------------------------------------------
# child: the actual measurement (may hang/crash; parent guards it)
# ---------------------------------------------------------------------------

def _enable_cache(force_cpu=False):
    import jax

    if force_cpu:
        # env JAX_PLATFORMS is overridden by the axon sitecustomize; the
        # config knob is the only reliable switch (tests/conftest.py does the
        # same).
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def child_msm(args):
    import random

    import jax

    _enable_cache(force_cpu=args.cpu)
    import jax.numpy as jnp
    import numpy as np

    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.ops import curve_jax as cj
    from circom_compat_tpu.ops import field_jax as fj
    from circom_compat_tpu.ops import msm as msm_ops
    from circom_compat_tpu.refmath import curve as rc

    backend = jax.default_backend()
    n = 1 << args.log_n
    window_bits = args.window_bits or (
        msm_ops.pick_window_bits(n) if backend != "cpu" else 8
    )
    rng = random.Random(1)

    # Bases: random multiples of the generator (bases only need to be valid
    # curve points); tiled host-side to size n.
    g2 = args.curve == "g2"
    if g2:
        base = rc.g2_generator()
        seed_pts = [rc.G2.mul(base, rng.randrange(1, 1 << 64)) for _ in range(256)]
        xs0, ys0 = cj.encode_g2_affine(seed_pts)
        adapter = cj.FQ2_ADAPTER
    else:
        base = rc.g1_generator()
        seed_pts = [rc.G1.mul(base, rng.randrange(1, 1 << 64)) for _ in range(256)]
        xs0, ys0 = cj.encode_g1_affine(seed_pts)
        adapter = cj.FQ_ADAPTER
    reps = n // 256
    xs = np.tile(xs0, (reps,) + (1,) * (xs0.ndim - 1)).astype(np.uint16)
    ys = np.tile(ys0, (reps,) + (1,) * (ys0.ndim - 1)).astype(np.uint16)
    scalars = fj.encode_plain([rng.randrange(R_SCALAR) for _ in range(n)])

    xs16, ys16, sc = jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(scalars)
    run = jax.jit(
        msm_ops.window_sums_affine_impl, static_argnums=(0, 4, 5, 6, 7)
    )
    signed = bool(getattr(args, "signed", False)) or None

    # Compile once; np.asarray forces full materialization (block_until_ready
    # proved unreliable through the remote-TPU tunnel).
    sums = run(adapter, xs16, ys16, sc, window_bits,
               msm_ops.CHUNK_POINTS, None, signed)
    _ = [np.asarray(c) for c in sums]

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        sums = run(adapter, xs16, ys16, sc, window_bits,
                   msm_ops.CHUNK_POINTS, None, signed)
        _ = [np.asarray(c) for c in sums]
        times.append(time.perf_counter() - t0)
    # Headline value is the MEDIAN rep (VERDICT r4 weak #5: single reps
    # through the axon tunnel wobble +-15%, and a min-of-N headline makes
    # cross-round deltas invisible under that noise); min/max/repeats ride
    # along so every BENCH_rNN carries its own error bars.
    med = sorted(times)[len(times) // 2]
    pts_per_sec = n / med

    # Baseline: the STRONGER of the measured same-machine native Pippenger
    # (scripts/bench_cpu_baseline.py cache) and the arkworks asm+rayon
    # machine-class ballpark of 1e6 points/s (BASELINE.md) — this box's
    # 4 threads undersell the reference machine class (VERDICT r2 weak#8),
    # so vs_baseline never flatters the chip against a weak local CPU.
    native = _cpu_baseline_pts_per_sec()
    cpu_pts_per_sec = max(native, 1e6)
    rec = {
        "metric": f"{args.curve}_msm_points_per_sec_per_chip_2^{args.log_n}",
        "value": round(pts_per_sec, 2),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / cpu_pts_per_sec, 4),
        "vs_native_cpu_this_box": round(pts_per_sec / native, 4),
        "min": round(n / max(times), 2),
        "max": round(n / min(times), 2),
        "repeats": len(times),
        "backend": backend,
        "window_bits": window_bits,
    }
    if signed:
        rec["signed"] = True
    if g2:
        # no measured G2 CPU baseline exists (native Pippenger is G1-only);
        # don't fabricate a ratio.
        rec["vs_baseline"] = None
        rec.pop("vs_native_cpu_this_box")
    print(json.dumps(rec))


def _cpu_baseline_pts_per_sec() -> float:
    """Measured same-machine CPU Pippenger baseline if cached, else the
    arkworks ballpark from BASELINE.md."""
    cache = os.path.join(REPO, ".cache", "cpu_msm_baseline.json")
    try:
        with open(cache) as f:
            rec = json.load(f)
        v = float(rec["points_per_sec"])
        if v > 0:
            return v
    except Exception:
        pass
    return 1e6


def child_e2e(args):
    import pathlib

    import jax

    _enable_cache(force_cpu=args.cpu)
    import jax.numpy as jnp
    import numpy as np

    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.models import groth16_jax as gj
    from circom_compat_tpu.ops import field_jax as fj

    zkey = pathlib.Path(REPO) / ".cache" / "complex-circuit-10000-10000.zkey"
    if not zkey.exists():
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "e2e_complex.py"),
             "--backend", "host", "--cpu"],
            check=False, capture_output=True, timeout=540,
        )
    pk, matrices = read_zkey(zkey)
    dpk = gj.DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    core = gj.get_prove_core(dpk)
    asg = jnp.asarray(fj.encode_plain(list(range(1, dpk.n_vars + 1)), fj.FR))
    out = core(asg)
    _ = [np.asarray(c) for c in jax.tree_util.tree_leaves(out)]
    times = []
    for _i in range(args.repeats):
        t0 = time.perf_counter()
        out = core(asg)
        _ = [np.asarray(c) for c in jax.tree_util.tree_leaves(out)]
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    # arkworks-CPU ballpark for 10^4x10^4: ~2 s on a fast desktop core.
    print(json.dumps({
        "metric": "e2e_prove_core_complex_10000_steady_state",
        "value": round(med, 3),
        "unit": "s",
        "vs_baseline": round(2.0 / med, 4),
        "min": round(min(times), 3),
        "max": round(max(times), 3),
        "repeats": len(times),
        "backend": jax.default_backend(),
    }))


# ---------------------------------------------------------------------------
# parent: guard + guaranteed JSON
# ---------------------------------------------------------------------------

def run_guarded(args, argv):
    metric = (
        "e2e_prove_core_complex_10000_steady_state"
        if args.e2e
        else f"{args.curve}_msm_points_per_sec_per_chip_2^{args.log_n}"
    )
    unit = "s" if args.e2e else "points/s"

    def emit_error(msg, stderr_tail=""):
        rec = {
            "metric": metric,
            "value": None,
            "unit": unit,
            "vs_baseline": None,
            "error": (msg + ((" | stderr: " + stderr_tail) if stderr_tail else ""))[:2000],
        }
        print(json.dumps(rec))

    # Fast backend probe: the axon tunnel's failure mode is an indefinite
    # in-process hang at backend init, so probe it in a short-lived child
    # before committing to the long measurement timeout. If the TPU is
    # unreachable, fall back to a smaller CPU-backend measurement (clearly
    # labeled) so the driver still records a real number instead of null.
    tpu_outage = None
    if not args.cpu:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=args.probe_timeout,
                cwd=REPO,
            )
            if probe.returncode != 0:
                tail = (probe.stderr or "").strip().splitlines()[-4:]
                tpu_outage = ("accelerator backend failed to initialize: "
                              + " / ".join(t.strip() for t in tail))
        except subprocess.TimeoutExpired:
            tpu_outage = (
                f"jax.devices() did not respond within {args.probe_timeout}s "
                "(axon tunnel down)")
        if tpu_outage is not None and not args.e2e:
            # CPU fallback: same kernel path on the jax CPU backend at a
            # size that fits the timeout (jax-CPU is ~1k pts/s).
            argv = ["--cpu", "--log-n", "16", "--repeats", "1"]
        elif tpu_outage is not None:
            emit_error("accelerator backend unavailable: " + tpu_outage)
            return

    cmd = [sys.executable, "-u", os.path.abspath(__file__), "--child"] + argv
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=args.timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        emit_error(f"measurement timed out after {args.timeout}s "
                   "(axon TPU tunnel hang is the known failure mode)")
        return
    except Exception as e:  # noqa: BLE001 — contract: always emit JSON
        emit_error(f"failed to launch measurement child: {e!r}")
        return

    line = None
    for cand in reversed((proc.stdout or "").strip().splitlines()):
        cand = cand.strip()
        if cand.startswith("{") and cand.endswith("}"):
            try:
                json.loads(cand)
                line = cand
                break
            except ValueError:
                continue
    if line is not None:
        if tpu_outage is not None:
            rec = json.loads(line)
            rec["note"] = ("TPU unavailable (" + tpu_outage[:300] + "); "
                           "CPU-backend fallback measurement at 2^16")
            line = json.dumps(rec)
        print(line)
        return
    tail = (proc.stderr or "").strip().splitlines()[-8:]
    emit_error(
        f"child exited rc={proc.returncode} without a JSON line",
        " / ".join(t.strip() for t in tail),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--curve", choices=["g1", "g2"], default="g1")
    ap.add_argument("--window-bits", type=int, default=0,
                    help="0 = auto (ops/msm.pick_window_bits)")
    ap.add_argument("--signed", action="store_true",
                    help="signed-digit window recoding (halved bucket tail; "
                         "measured ablation knob — unsigned is production)")
    # min over 5: single-rep timings through the axon tunnel vary +-15%
    # (round-4 measurement discipline, BASELINE.md) — 3 reps under-read
    # the same code by up to 13% vs 5
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--e2e", action="store_true",
                    help="measure steady-state end-to-end prove of the cached "
                         "complex-circuit dev zkey instead of the raw MSM")
    ap.add_argument("--timeout", type=float, default=900.0,
                    help="hard wall-clock cap on the measurement child")
    ap.add_argument("--probe-timeout", type=float, default=150.0,
                    help="cap on the jax.devices() liveness probe")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (local testing)")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args, _ = ap.parse_known_args()

    if args.child:
        # inside the guarded child: run the real measurement
        if args.e2e:
            child_e2e(args)
        else:
            child_msm(args)
        return

    argv = [a for a in sys.argv[1:] if a != "--child"]
    run_guarded(args, argv)


def _emit_last_resort(reason: str) -> None:
    print(json.dumps({
        "metric": "g1_msm_points_per_sec_per_chip",
        "value": None,
        "unit": "points/s",
        "vs_baseline": None,
        "error": ("bench.py internal error: " + reason)[:1500],
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()  # child reports failures via rc/stderr; the parent guards it
    else:
        # parent contract: exactly one JSON line on stdout, rc=0, always
        try:
            main()
        except SystemExit as e:
            if e.code not in (0, None):
                _emit_last_resort(f"SystemExit({e.code}) before measurement")
        except BaseException:
            import traceback

            _emit_last_resort(
                traceback.format_exc(limit=3).replace("\n", " | "))
        sys.exit(0)
