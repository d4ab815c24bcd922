#!/usr/bin/env python
"""One-shot on-TPU measurement of everything round 2 changed.

Run this THE MOMENT the axon tunnel is back (check: `timeout 45 python -c
"import jax; print(jax.devices())"`). Ordered so the most decision-relevant
numbers land first if the tunnel dies again mid-run. Appends one JSON line
per result to .cache/round2_measurements.jsonl and prints them.

  python -u scripts/round2_measure.py            # full sweep
  python -u scripts/round2_measure.py --quick    # skip the 2^20 e2e
"""

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / ".cache" / "round2_measurements.jsonl"


def record(rec):
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    OUT.parent.mkdir(exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("RESULT", json.dumps(rec), flush=True)


def run(cmd, timeout):
    print(f"\n=== {' '.join(cmd)}", flush=True)
    p = subprocess.run(
        [sys.executable, "-u"] + cmd, cwd=REPO, timeout=timeout,
        capture_output=True, text=True,
    )
    print(p.stdout[-3000:])
    if p.returncode:
        print(p.stderr[-2000:])
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    # 0. liveness (hangs -> the whole script dies fast, nothing wasted)
    p = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.devices())"],
        timeout=90, capture_output=True, text=True,
    )
    record({"step": "liveness", "devices": p.stdout.strip(), "rc": p.returncode})
    if p.returncode:
        sys.exit("tunnel still down")

    # 1. DMA gather vs XLA gather — decides ops/gather_pallas.py integration
    p = run(["scripts/bench_gather.py", "--log-n", "20", "--reps", "8"], 3600)
    record({"step": "bench_gather", "rc": p.returncode,
            "tail": p.stdout.strip().splitlines()[-3:]})

    # 2. headline MSM (also exercises shared-sort code path indirectly? no —
    #    bench.py measures raw window sums; still the driver headline)
    p = run(["bench.py", "--log-n", "20"], 2400)
    record({"step": "bench_msm_2^20", "rc": p.returncode,
            "json": p.stdout.strip().splitlines()[-1:]})

    # 3. e2e 2^20: witness-map fusion + shared sorts together
    if not args.quick:
        p = run(["scripts/e2e_large.py", "--log-domain", "20",
                 "--repeats", "3"], 5400)
        record({"step": "e2e_2^20", "rc": p.returncode,
                "tail": [ln for ln in p.stdout.splitlines()
                         if "RESULT" in ln or ln.startswith("{")]})

        # 4. streamed prover at 2^20 (chunk 2^18: 4-chunk streaming)
        p = run(["scripts/e2e_large.py", "--log-domain", "20",
                 "--streamed", str(1 << 18), "--repeats", "2"], 5400)
        record({"step": "e2e_2^20_streamed", "rc": p.returncode,
                "tail": [ln for ln in p.stdout.splitlines()
                         if "RESULT" in ln or ln.startswith("{")]})

    print("\nDone. Update BASELINE.md 'round 2' section with these numbers.")


if __name__ == "__main__":
    main()
