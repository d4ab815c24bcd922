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


@pytest.mark.slow
def test_setup_prove_verify_jax(circuit, params):
    proof = Groth16.prove(params, circuit, backend="jax")
    assert Groth16.verify_proof(params.vk, proof, circuit.get_public_inputs())


def test_setup_wrong_input_fails(circuit, params):
    proof = Groth16.prove(params, circuit)
    assert not Groth16.verify_proof(params.vk, proof, [35])


def test_device_setup_matches_host_setup(circuit, params):
    """generate_parameters_from_matrices (device fixed-base + device H-query
    iFFT) must produce the bit-identical key for the same toxic waste."""
    import numpy as np

    from circom_compat_tpu.models.setup import generate_parameters_from_matrices

    ma, mb, mc = circuit.to_matrices()
    dev = generate_parameters_from_matrices(
        ma, mb, mc,
        circuit.r1cs.num_inputs, circuit.r1cs.num_variables,
        alpha=0xA1FA, beta=0xBE7A, gamma=0x6A44A, delta=0xDE17A, t=0x7A0,
    )
    for name in ("a_query", "b_g1_query", "b_g2_query", "l_query", "h_query"):
        assert np.array_equal(
            getattr(dev, name).limbs, getattr(params, name).limbs
        ), name
    assert dev.vk.gamma_abc_g1 == params.vk.gamma_abc_g1
    assert dev.vk.alpha_g1 == params.vk.alpha_g1
    assert dev.delta_g1 == params.delta_g1
    assert dev.domain_size == params.domain_size


def test_setup_key_is_consistent_with_zkey_layout(params):
    # Sections expose the same container types the zkey parser yields.
    assert len(params.a_query) == params.n_vars
    assert len(params.h_query) == params.domain_size
    assert params.n_public + 1 == len(params.vk.gamma_abc_g1)
