"""On-chain Groth16 verification, end-to-end against the REAL compiled
TestVerifier contract — the reference does this by spawning Anvil and
calling over JSON-RPC (reference: tests/solidity.rs:17-58); here the same
deployedBytecode from tests/verifier_artifact.json runs on the in-process
MiniEVM (circom_compat_tpu/evm.py) with refmath-backed BN254 precompiles.
"""


import pytest

from circom_compat_tpu import CircomBuilder, CircomConfig, read_zkey
from circom_compat_tpu import ethereum as eth
from circom_compat_tpu.evm import (
    EVMError,
    MiniEVM,
    check_proof_onchain,
    keccak256,
    load_verifier,
)
from circom_compat_tpu.models import Groth16

from circom_compat_tpu.utils import paths

TV = paths.test_vectors()
ARTIFACT = str(paths.verifier_artifact())


def test_keccak256_vectors():
    assert (
        keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block (> 136-byte rate) input
    assert (
        keccak256(b"a" * 200).hex()
        == keccak256(bytes([97]) * 200).hex()
    )


def test_precompile_ecadd_ecmul_identities():
    from circom_compat_tpu.evm import _pre_ecadd, _pre_ecmul

    g = (1, 2)  # G1 generator
    # G + O = G
    ok, out = _pre_ecadd(
        b"".join(v.to_bytes(32, "big") for v in (*g, 0, 0))
    )
    assert ok and int.from_bytes(out[:32], "big") == 1
    # 2*G via mul == G+G via add
    ok1, dbl = _pre_ecadd(b"".join(v.to_bytes(32, "big") for v in (*g, *g)))
    ok2, mul = _pre_ecmul(b"".join(v.to_bytes(32, "big") for v in (*g, 2)))
    assert ok1 and ok2 and dbl == mul
    # off-curve point is a precompile failure
    ok3, _ = _pre_ecadd(b"".join(v.to_bytes(32, "big") for v in (1, 3, 0, 0)))
    assert not ok3


@pytest.fixture(scope="module")
def proof_fixture():
    cfg = CircomConfig(TV / "mycircuit_js/mycircuit.wasm", TV / "mycircuit.r1cs")
    b = CircomBuilder(cfg)
    b.push_input("a", 3)
    b.push_input("b", 11)
    circuit = b.build()
    pk, _ = read_zkey(TV / "test.zkey")
    proof = Groth16.prove(pk, circuit)
    pub = circuit.get_public_inputs()
    assert Groth16.verify_proof(pk.vk, proof, pub)
    return pk, proof, pub


@pytest.fixture(scope="module")
def verifier() -> MiniEVM:
    return load_verifier(ARTIFACT)


def test_verify_onchain(proof_fixture, verifier):
    """Mirrors reference tests/solidity.rs:45-56 (check_proof == true)."""
    pk, proof, pub = proof_fixture
    ok = check_proof_onchain(
        verifier,
        eth.Inputs.from_fr(pub),
        eth.Proof.from_ark(proof),
        eth.VerifyingKey.from_ark(pk.vk),
    )
    assert ok


def test_tampered_input_rejected_onchain(proof_fixture, verifier):
    pk, proof, pub = proof_fixture
    bad = eth.Inputs(elements=[eth.Inputs.from_fr(pub).elements[0] + 1])
    assert not check_proof_onchain(
        verifier, bad, eth.Proof.from_ark(proof), eth.VerifyingKey.from_ark(pk.vk)
    )


def test_tampered_proof_rejected_onchain(proof_fixture, verifier):
    pk, proof, pub = proof_fixture
    ep = eth.Proof.from_ark(proof)
    # negate A: still on-curve, pairing must fail
    ep.a = eth.G1(x=ep.a.x, y=(eth.Q - ep.a.y) % eth.Q)
    assert not check_proof_onchain(
        verifier, eth.Inputs.from_fr(pub), ep, eth.VerifyingKey.from_ark(pk.vk)
    )


def test_bad_input_length_reverts(proof_fixture, verifier):
    """Solidity require(input.length + 1 == vk.IC.length) surfaces its
    revert string (reference: tests/verifier.sol require message)."""
    pk, proof, _ = proof_fixture
    with pytest.raises(EVMError, match="verifier-bad-input"):
        check_proof_onchain(
            verifier,
            eth.Inputs(elements=[]),
            eth.Proof.from_ark(proof),
            eth.VerifyingKey.from_ark(pk.vk),
        )


def test_out_of_field_input_reverts(proof_fixture, verifier):
    pk, proof, _ = proof_fixture
    with pytest.raises(EVMError, match="gte-snark-scalar-field"):
        check_proof_onchain(
            verifier,
            eth.Inputs(elements=[eth.R_SCALAR]),
            eth.Proof.from_ark(proof),
            eth.VerifyingKey.from_ark(pk.vk),
        )
