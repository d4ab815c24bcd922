"""Groth16 integration tests — mirrors the reference's tests/groth16.rs and
src/zkey.rs prove/verify tests (with/without r1cs paths, negative test)."""

import pytest

from circom_compat_tpu import CircomBuilder, CircomConfig, read_zkey
from circom_compat_tpu.models import Groth16


@pytest.fixture(scope="module")
def zkey(test_vectors):
    return read_zkey(test_vectors / "test.zkey")


@pytest.fixture(scope="module")
def mycircuit_cfg_paths(test_vectors):
    return (
        test_vectors / "mycircuit_js" / "mycircuit.wasm",
        test_vectors / "mycircuit.r1cs",
    )


def test_prove_verify_with_r1cs(zkey, mycircuit_cfg_paths):
    """reference: src/zkey.rs:846-873 (verify_proof_with_zkey_with_r1cs)"""
    pk, _ = zkey
    cfg = CircomConfig(*mycircuit_cfg_paths)
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    builder.push_input("b", 11)
    circom = builder.build()
    inputs = circom.get_public_inputs()
    proof = Groth16.prove(pk, circom)
    pvk = Groth16.process_vk(pk.vk)
    assert Groth16.verify_with_processed_vk(pvk, inputs, proof)


def test_prove_verify_without_r1cs(zkey, test_vectors):
    """reference: src/zkey.rs:875-919 — explicit r,s through
    create_proof_with_reduction_and_matrices."""
    from circom_compat_tpu.witness import WitnessCalculator

    pk, matrices = zkey
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    full = wc.calculate_witness({"a": 3, "b": 11})
    r, s = 1234567, 7654321
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk, r, s, matrices, matrices.num_instance_variables,
        matrices.num_constraints, full,
    )
    pvk = Groth16.process_vk(pk.vk)
    assert Groth16.verify_with_processed_vk(
        pvk, full[1 : matrices.num_instance_variables], proof
    )


def test_deterministic_with_fixed_rs(zkey, test_vectors):
    from circom_compat_tpu.witness import WitnessCalculator

    pk, matrices = zkey
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    full = wc.calculate_witness({"a": 3, "b": 11})
    args = (pk, 42, 43, matrices, matrices.num_instance_variables,
            matrices.num_constraints, full)
    p1 = Groth16.create_proof_with_reduction_and_matrices(*args)
    p2 = Groth16.create_proof_with_reduction_and_matrices(*args)
    assert p1 == p2


def test_wrong_public_input_fails(zkey, mycircuit_cfg_paths):
    """reference: tests/groth16.rs:42-73 (groth16_proof_wrong_input)"""
    pk, _ = zkey
    cfg = CircomConfig(*mycircuit_cfg_paths)
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    builder.push_input("b", 11)
    circom = builder.build()
    proof = Groth16.prove(pk, circom)
    pvk = Groth16.process_vk(pk.vk)
    assert not Groth16.verify_with_processed_vk(pvk, [34], proof)


def test_ethereum_roundtrip(zkey, mycircuit_cfg_paths):
    """reference: src/ethereum.rs:191-280 round-trip tests"""
    from circom_compat_tpu import ethereum

    pk, _ = zkey
    cfg = CircomConfig(*mycircuit_cfg_paths)
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    builder.push_input("b", 11)
    circom = builder.build()
    proof = Groth16.prove(pk, circom)

    eth_proof = ethereum.Proof.from_ark(proof)
    assert eth_proof.to_ark() == proof
    # G2 tuple is c1-first
    x_tuple, y_tuple = eth_proof.b.as_tuple()
    assert x_tuple == (eth_proof.b.x[1], eth_proof.b.x[0])
    assert y_tuple == (eth_proof.b.y[1], eth_proof.b.y[0])

    eth_vk = ethereum.VerifyingKey.from_ark(pk.vk)
    back = eth_vk.to_ark()
    assert back.alpha_g1 == pk.vk.alpha_g1
    assert back.gamma_abc_g1 == pk.vk.gamma_abc_g1

    assert len(eth_proof.abi_encoded()) == 8 * 32
