"""Does an XLA:CPU flag cut the dryrun's jit_step compile time? (round 5)

The dryrun's floor is one sharded-prove XLA:CPU compile (~120-150 s clean
on this 4-core box; task 6 targets < 90 s). The limb-CIOS graphs are
structurally large; candidate levers are LLVM-side:

  baseline                          (no extra flags)
  --xla_llvm_disable_expensive_passes=true
  --xla_backend_optimization_level=1

Each variant runs in a SUBPROCESS (XLA_FLAGS is read at backend init) and
compiles ONLY the sharded step at the dryrun shape, dist_ntt=True.

  python scripts/probe_dryrun_flags.py
"""

import subprocess
import sys
import time

CHILD = r"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
from circom_compat_tpu.models import generate_parameters
from circom_compat_tpu.models.groth16_jax import DeviceProvingKey
from circom_compat_tpu.parallel.mesh import make_mesh
from circom_compat_tpu.parallel.prove_sharded import build_sharded_prover
from circom_compat_tpu.utils.chain import chain_circuit
from circom_compat_tpu.ops import field_jax as fj

circuit = chain_circuit(k=1022, a=3)
pk = generate_parameters(circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1)
ma, mb, _ = circuit.to_matrices()
dpk = DeviceProvingKey.from_matrix_rows(pk, ma, mb, circuit.r1cs.num_inputs, len(ma))
full = circuit.full_assignment()
mesh = make_mesh(8)
asg = jax.numpy.asarray(fj.encode_plain([int(a) for a in full]))
t0 = time.time()
prover = build_sharded_prover(dpk, mesh, window_bits=8, dist_ntt=True)
out = prover.step(asg)
jax.block_until_ready(out)
print(f"STEP_COMPILE_FIRST {time.time()-t0:.1f}")
"""


def main():
    variants = [
        ("baseline", ""),
        ("no-expensive-llvm", "--xla_llvm_disable_expensive_passes=true"),
        ("opt-level-1", "--xla_backend_optimization_level=1"),
    ]
    for name, flag in variants:
        env = dict(
            __import__("os").environ,
            XLA_FLAGS=("--xla_force_host_platform_device_count=8 " + flag).strip(),
        )
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, timeout=2400,
        )
        line = [l for l in (proc.stdout or "").splitlines()
                if l.startswith("STEP_COMPILE_FIRST")]
        wall = time.time() - t0
        if line:
            print(f"{name:20s} step {line[0].split()[1]:>7s} s  "
                  f"(proc wall {wall:.0f}s)", flush=True)
        else:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print(f"{name:20s} FAILED rc={proc.returncode}: "
                  + " / ".join(tail), flush=True)


if __name__ == "__main__":
    main()
