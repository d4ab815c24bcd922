"""End-to-end device prover: bit-exact parity with the host backend on real
snarkjs fixtures (reference: src/zkey.rs:875-919 drives the same flow)."""

import pytest

from circom_compat_tpu import read_zkey
from circom_compat_tpu.models import Groth16
from circom_compat_tpu.witness import WitnessCalculator


@pytest.fixture(scope="module")
def zkey(test_vectors):
    return read_zkey(test_vectors / "test.zkey")


@pytest.fixture(scope="module")
def witness(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    return wc.calculate_witness({"a": 3, "b": 11})


@pytest.mark.slow
def test_jax_prove_bit_exact_vs_host(zkey, witness):
    pk, matrices = zkey
    args = (
        pk, 0xDEAD, 0xBEEF, matrices,
        matrices.num_instance_variables, matrices.num_constraints, witness,
    )
    host_proof = Groth16.create_proof_with_reduction_and_matrices(*args, backend="host")
    jax_proof = Groth16.create_proof_with_reduction_and_matrices(*args, backend="jax")
    assert jax_proof == host_proof


@pytest.mark.slow
def test_jax_prove_verifies(zkey, witness):
    pk, matrices = zkey
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk, 7, 9, matrices,
        matrices.num_instance_variables, matrices.num_constraints, witness,
        backend="jax",
    )
    pvk = Groth16.process_vk(pk.vk)
    assert Groth16.verify_with_processed_vk(
        pvk, witness[1 : matrices.num_instance_variables], proof
    )
