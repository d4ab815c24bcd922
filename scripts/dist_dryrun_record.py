"""Produce the multi-HOST dryrun artifact: DIST_DRYRUN.json.

VERDICT r2 item 8: the single-process 8-device dryrun (`__graft_entry__.
dryrun_multichip`) is driver-certified, but the multi-process path —
`jax.distributed.initialize` + gloo collectives across N localhost workers,
the thing that actually models a TPU pod's DCN×ICI topology (reference
analogue: rayon/MPI parity harnesses) — only lived in slow-tier tests.

This script runs `parallel.multihost.dist_dryrun` (2 processes x 2 virtual
devices, two-level DCN x ICI mesh), which cross-checks that every worker's
proof is bit-identical AND equal to the pure-host backend proof, then writes
a consensus record to DIST_DRYRUN.json at the repo root for the driver/judge.

  python scripts/dist_dryrun_record.py [--processes 2] [--devices 2]
"""

import argparse
import hashlib
import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--chain-k", type=int, default=62)
    ap.add_argument(
        "--out", default=str(pathlib.Path(__file__).resolve().parent.parent
                             / "DIST_DRYRUN.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from circom_compat_tpu.parallel.multihost import dist_dryrun

    t0 = time.time()
    rec = dist_dryrun(
        num_processes=args.processes,
        local_devices=args.devices,
        chain_k=args.chain_k,
        two_level=True,
    )
    wall = time.time() - t0
    proof_blob = json.dumps(rec["proof"], sort_keys=True).encode()
    out = {
        "ok": True,
        "wall_s": round(wall, 1),
        "processes": rec["processes"],
        "devices_total": rec["devices"],
        "mesh": rec["mesh"],
        "chain_k": args.chain_k,
        "consensus": "all worker proofs bit-identical AND == pure-host proof",
        "proof_sha256": hashlib.sha256(proof_blob).hexdigest(),
        "proof": rec["proof"],
        "recorded_unix": int(time.time()),
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(f"DIST_DRYRUN ok: {rec['processes']} procs x "
          f"{rec['devices'] // rec['processes']} devices, mesh {rec['mesh']}, "
          f"{wall:.1f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
