#!/usr/bin/env python
"""Bisect the 2^K on-TPU proof_verified=False failure.

Loads the cached synth zkey, proves with the HOST backend (exact ints) and
the DEVICE backend with the same fixed r,s, verifies both, and diffs the
proof points. Localizes the fault to setup/verifier (host proof fails) vs
device prover (host ok, device differs).

  python -u scripts/debug_verify.py --log-domain 12
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from circom_compat_tpu.utils import paths

paths.enable_compile_cache()

from scripts.e2e_large import witness_for  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-domain", type=int, default=12)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.models import Groth16
    from circom_compat_tpu.models import groth16_jax as gj

    zkey_path = pathlib.Path(__file__).resolve().parents[1] / ".cache" / (
        f"synth-2^{args.log_domain}.zkey"
    )
    pk, matrices = read_zkey(zkey_path)
    n_constraints = (1 << args.log_domain) - 2
    n_b = n_constraints - 2
    assignment = witness_for(n_b, a=3)
    public = assignment[1 : matrices.num_instance_variables]
    r, s = 0x1234, 0x5678

    t0 = time.time()
    host_proof = Groth16.create_proof_with_reduction_and_matrices(
        pk, r, s, matrices, matrices.num_instance_variables,
        matrices.num_constraints, assignment, backend="host",
    )
    print(f"[host] proved in {time.time()-t0:.1f}s")
    pvk = Groth16.process_vk(pk.vk)
    ok_host = Groth16.verify_with_processed_vk(pvk, public, host_proof)
    print(f"RESULT host_proof_verified: {ok_host}")

    t0 = time.time()
    dpk = gj.DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    dev_proof = gj.prove_prepared(dpk, r, s, assignment)
    print(f"[device] proved in {time.time()-t0:.1f}s "
          f"(backend={jax.default_backend()})")
    ok_dev = Groth16.verify_with_processed_vk(pvk, public, dev_proof)
    print(f"RESULT device_proof_verified: {ok_dev}")
    print(f"RESULT proofs_equal: {dev_proof == host_proof}")
    if dev_proof != host_proof:
        for name in ("a", "b", "c"):
            hp, dp = getattr(host_proof, name), getattr(dev_proof, name)
            print(f"  {name}: equal={hp == dp}")


if __name__ == "__main__":
    main()
