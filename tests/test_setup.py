"""Dev-mode trusted setup: generate params from R1CS, prove, verify
(reference: tests/groth16.rs:11-40 uses generate_random_parameters_with_reduction)."""

import pytest

from circom_compat_tpu import CircomBuilder, CircomConfig
from circom_compat_tpu.models import Groth16, generate_parameters


@pytest.fixture(scope="module")
def circuit(test_vectors):
    cfg = CircomConfig(
        test_vectors / "mycircuit_js" / "mycircuit.wasm",
        test_vectors / "mycircuit.r1cs",
    )
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    builder.push_input("b", 11)
    return builder.build()


@pytest.fixture(scope="module")
def params(circuit):
    # Fixed toxic waste -> deterministic key, reproducible test.
    return generate_parameters(
        circuit, alpha=0xA1FA, beta=0xBE7A, gamma=0x6A44A, delta=0xDE17A, t=0x7A0
    )


def test_setup_prove_verify_host(circuit, params):
    proof = Groth16.prove(params, circuit)
    assert Groth16.verify_proof(params.vk, proof, circuit.get_public_inputs())


def test_setup_prove_verify_jax(circuit, params):
    proof = Groth16.prove(params, circuit, backend="jax")
    assert Groth16.verify_proof(params.vk, proof, circuit.get_public_inputs())


def test_setup_wrong_input_fails(circuit, params):
    proof = Groth16.prove(params, circuit)
    assert not Groth16.verify_proof(params.vk, proof, [35])


def test_setup_key_is_consistent_with_zkey_layout(params):
    # Sections expose the same container types the zkey parser yields.
    assert len(params.a_query) == params.n_vars
    assert len(params.h_query) == params.domain_size
    assert params.n_public + 1 == len(params.vk.gamma_abc_g1)
