"""Profile the dryrun-shaped sharded prove under the pytest environment:
stage timings + periodic stack dumps to find where warm-cache time goes."""

import faulthandler
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from circom_compat_tpu.utils import paths

paths.enable_compile_cache()

faulthandler.dump_traceback_later(45, repeat=True, file=sys.stderr)


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


T0 = time.time()

from circom_compat_tpu.models import Groth16, generate_parameters
from circom_compat_tpu.models.groth16_jax import DeviceProvingKey
from circom_compat_tpu.parallel.mesh import make_mesh
from circom_compat_tpu.parallel.prove_sharded import (
    build_sharded_prover,
    prove_sharded,
)
from circom_compat_tpu.utils.chain import chain_circuit

log("imports done")
circuit = chain_circuit(k=1022, a=3)
log("circuit built")
pk = generate_parameters(
    circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
)
log("generate_parameters done")
ma, mb, _ = circuit.to_matrices()
dpk = DeviceProvingKey.from_matrix_rows(
    pk, ma, mb, circuit.r1cs.num_inputs, len(ma)
)
full = circuit.full_assignment()
log("dpk built")
mesh = make_mesh(8)
prover = build_sharded_prover(dpk, mesh, window_bits=8, dist_ntt=True)
log("build_sharded_prover done")
proof = prove_sharded(dpk, prover, 77, 88, full)
log("prove_sharded done")
host_proof = Groth16.create_proof_with_reduction_and_matrices(
    pk, 77, 88,
    type("R", (), {"a": ma, "b": mb,
                   "num_instance_variables": circuit.r1cs.num_inputs})(),
    circuit.r1cs.num_inputs, len(ma), full, backend="host",
)
log("host proof done")
assert proof == host_proof
ok = Groth16.verify_proof(pk.vk, proof, circuit.get_public_inputs())
log(f"verified: {ok}")
faulthandler.cancel_dump_traceback_later()
