"""Where does the dryrun's XLA:CPU compile time go? (round 5, task 6)

Times each graph the driver's dryrun_multichip(8) path compiles, on the
same 8-device virtual CPU mesh and toy chain shape, separately:

  step[dist]  : full sharded prove step, distributed four-step NTT
  step[repl]  : same with the replicated witness map
  ss-fused    : streamed-sharded per-chunk jit (packed body)
  ss-scans    : streamed-sharded deferred scans + fold

Run with the same env as tests/conftest.py:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/probe_dryrun_compile.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np


def main():
    from circom_compat_tpu.models import generate_parameters
    from circom_compat_tpu.models.groth16_jax import DeviceProvingKey
    from circom_compat_tpu.parallel.mesh import make_mesh
    from circom_compat_tpu.parallel.prove_sharded import build_sharded_prover
    from circom_compat_tpu.utils.chain import chain_circuit

    t0 = time.time()
    circuit = chain_circuit(k=1022, a=3)
    pk = generate_parameters(
        circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
    )
    ma, mb, _ = circuit.to_matrices()
    dpk = DeviceProvingKey.from_matrix_rows(
        pk, ma, mb, circuit.r1cs.num_inputs, len(ma)
    )
    full = circuit.full_assignment()
    mesh = make_mesh(8)
    print(f"setup (host params + staging): {time.time()-t0:.1f}s",
          flush=True)

    from circom_compat_tpu.ops import field_jax as fj

    asg = jax.numpy.asarray(
        fj.encode_plain([int(a) for a in full])
    )

    for dist in (True, False):
        t0 = time.time()
        prover = build_sharded_prover(
            dpk, mesh, window_bits=8, dist_ntt=dist
        )
        out = prover.step(asg)
        jax.block_until_ready(out)
        name = "dist" if dist else "repl"
        print(f"step[{name}] compile+first: {time.time()-t0:.1f}s",
              flush=True)

    # streamed-sharded jits at the same toy shape
    from circom_compat_tpu.models.streamed import StreamedProvingKey
    from circom_compat_tpu.parallel import streamed_sharded as ss

    class _Shim:
        num_instance_variables = circuit.r1cs.num_inputs
        a_rows = np.asarray(dpk.a_rows)
        a_cols = np.asarray(dpk.a_cols)
        a_values_mont = np.asarray(dpk.a_vals)
        b_rows = np.asarray(dpk.b_rows)
        b_cols = np.asarray(dpk.b_cols)
        b_values_mont = np.asarray(dpk.b_vals)

    spk = StreamedProvingKey.build(
        pk, _Shim, len(ma), circuit.r1cs.num_inputs, chunk_points=256
    )
    t0 = time.time()
    proof = ss.prove_streamed_sharded(spk, mesh, 77, 88, full,
                                      window_bits=8)
    print(f"streamed-sharded full prove (compile+run): "
          f"{time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
