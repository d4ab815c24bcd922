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


# ------------------------------------------------------ malformed-point tests
# The reference inherits these rejections from ark-serialize's checked
# deserialization (reference: Cargo.toml:32); here validation lives on the
# verify entry points (models/groth16.validate_proof / validate_vk).


def _valid_proof(zkey, mycircuit_cfg_paths):
    pk, _ = zkey
    cfg = CircomConfig(*mycircuit_cfg_paths)
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    builder.push_input("b", 11)
    circom = builder.build()
    return pk, circom.get_public_inputs(), Groth16.prove(pk, circom)


def _g2_on_curve_wrong_subgroup():
    """Find an on-curve twist point NOT in the order-r subgroup (the twist's
    cofactor is huge, so any 'random' curve point almost surely qualifies).
    Fq2 = Fq[u]/(u^2+1); sqrt via the norm trick (q = 3 mod 4)."""
    from circom_compat_tpu.constants import Q, R_SCALAR
    from circom_compat_tpu.refmath import curve as rc

    def fq_sqrt(a):
        r = pow(a, (Q + 1) // 4, Q)
        return r if r * r % Q == a % Q else None

    def fq2_sqrt(a0, a1):
        if a1 == 0:
            r = fq_sqrt(a0)
            if r is not None:
                return (r, 0)
            r = fq_sqrt(-a0 % Q)
            return None if r is None else (0, r)
        n = fq_sqrt((a0 * a0 + a1 * a1) % Q)  # norm = a0^2 + a1^2
        if n is None:
            return None
        for s in (n, (-n) % Q):
            half = (a0 + s) * pow(2, -1, Q) % Q
            x0 = fq_sqrt(half)
            if x0 is not None and x0 != 0:
                x1 = a1 * pow(2 * x0, -1, Q) % Q
                if ((x0 * x0 - x1 * x1) % Q, 2 * x0 * x1 % Q) == (a0 % Q, a1 % Q):
                    return (x0, x1)
        return None

    b = rc.G2.b
    for i in range(1, 100):
        x = (i, 1)
        x3 = rc.G2.fmul(rc.G2.fsq(x), x)
        rhs = rc.G2.fadd(x3, b)
        y = fq2_sqrt(*rhs)
        if y is None:
            continue
        p = (x, y)
        assert rc.G2.is_on_curve(p)
        if rc.G2.mul(p, R_SCALAR) is not None:  # not killed by r => wrong subgroup
            return p
    raise AssertionError("no non-subgroup point found (should be immediate)")


def test_off_curve_proof_rejected(zkey, mycircuit_cfg_paths):
    pk, inputs, proof = _valid_proof(zkey, mycircuit_cfg_paths)
    pvk = Groth16.process_vk(pk.vk)
    from circom_compat_tpu.models.groth16 import Proof

    bad_a = Proof(a=(proof.a[0], (proof.a[1] + 1)), b=proof.b, c=proof.c)
    assert not Groth16.verify_with_processed_vk(pvk, inputs, bad_a)
    # non-canonical coordinate (x + q aliases the same residue)
    from circom_compat_tpu.constants import Q

    alias_a = Proof(a=(proof.a[0] + Q, proof.a[1]), b=proof.b, c=proof.c)
    assert not Groth16.verify_with_processed_vk(pvk, inputs, alias_a)


def test_wrong_subgroup_g2_rejected(zkey, mycircuit_cfg_paths):
    pk, inputs, proof = _valid_proof(zkey, mycircuit_cfg_paths)
    pvk = Groth16.process_vk(pk.vk)
    from circom_compat_tpu.models.groth16 import Proof, validate_g2

    rogue = _g2_on_curve_wrong_subgroup()
    assert not validate_g2(rogue)
    bad = Proof(a=proof.a, b=rogue, c=proof.c)
    assert not Groth16.verify_with_processed_vk(pvk, inputs, bad)


def test_malformed_vk_rejected(zkey):
    import dataclasses

    pk, _ = zkey
    vk = pk.vk
    bad_vk = dataclasses.replace(
        vk, alpha_g1=(vk.alpha_g1[0], (vk.alpha_g1[1] + 1))
    )
    with pytest.raises(ValueError, match="alpha_g1"):
        Groth16.process_vk(bad_vk)


def test_cli_rejects_non_affine_z():
    from circom_compat_tpu.cli import _parse_g1, _parse_g2

    with pytest.raises(ValueError, match="non-affine"):
        _parse_g1(["1", "2", "3"])
    with pytest.raises(ValueError, match="non-affine"):
        _parse_g2([["1", "0"], ["2", "0"], ["2", "0"]])
    assert _parse_g1(["0", "1", "0"]) is None
    assert _parse_g2([["0", "0"], ["1", "0"], ["0", "0"]]) is None
