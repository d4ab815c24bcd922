"""Ceremony (zkey section 10) support: parse, contribute, verify, roundtrip.

The reference skips section 10 entirely; these tests cover our extension:
MPC params parsing validated against the snarkjs-generated test.zkey, a
phase-2 contribution (device-rescaled L/H queries) that keeps proofs
verifying, the pairing-based chain check, and writer round-trip.
"""

import io

import pytest

from circom_compat_tpu import read_zkey
from circom_compat_tpu.circom.contribute import contribute
from circom_compat_tpu.circom.zkey import BinFile, verify_mpc_chain
from circom_compat_tpu.circom.zkey_writer import write_zkey
from circom_compat_tpu.models import Groth16
from circom_compat_tpu.witness import WitnessCalculator


@pytest.fixture(scope="module")
def zkey(test_vectors):
    return read_zkey(test_vectors / "test.zkey")


@pytest.fixture(scope="module")
def witness(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    return wc.calculate_witness({"a": 3, "b": 11})


def test_mpc_params_parse_snarkjs_golden(test_vectors):
    with open(test_vectors / "test.zkey", "rb") as fh:
        bf = BinFile(io.BytesIO(fh.read()))
    mpc = bf.mpc_params()
    assert mpc is not None
    # fresh `snarkjs zkey new` output: 64-byte csHash, no contributions
    assert len(mpc.cs_hash) == 64 and mpc.cs_hash != b"\0" * 64
    assert mpc.contributions == []


def test_contribution_chain_and_proofs_still_verify(zkey, witness):
    pk, matrices = zkey
    pk2 = contribute(pk, entropy=b"round-1 deterministic entropy", name="test")
    assert pk2.delta_g1 != pk.delta_g1
    assert len(pk2.mpc.contributions) == 1
    assert verify_mpc_chain(pk2)

    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk2, 7, 9, matrices,
        matrices.num_instance_variables, matrices.num_constraints, witness,
        backend="host",
    )
    pvk = Groth16.process_vk(pk2.vk)
    assert Groth16.verify_with_processed_vk(
        pvk, witness[1 : matrices.num_instance_variables], proof
    )
    # old vk must now reject: delta changed
    old_pvk = Groth16.process_vk(pk.vk)
    assert not Groth16.verify_with_processed_vk(
        old_pvk, witness[1 : matrices.num_instance_variables], proof
    )


def test_tampered_chain_detected(zkey):
    pk, _ = zkey
    pk2 = contribute(pk, entropy=b"abc")
    c = pk2.mpc.contributions[-1]
    c.g1_sx = pk2.delta_g1  # no longer g1_s * s
    assert not verify_mpc_chain(pk2)


def test_unlinked_delta_detected(zkey):
    """A contribution whose key is internally consistent but whose secret
    did NOT produce delta_after must fail (ADVICE r1: the delta linkage
    e(deltaAfter_i, g2) == e(deltaAfter_{i-1}, g2_spx_i))."""
    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.refmath import curve as rc

    pk, _ = zkey
    pk2 = contribute(pk, entropy=b"victim")
    c = pk2.mpc.contributions[-1]
    # forge a fresh, self-consistent key with a DIFFERENT secret
    s_forge = 0xF00D % R_SCALAR
    c.g1_s = rc.G1.mul(rc.g1_generator(), 7)
    c.g1_sx = rc.G1.mul(c.g1_s, s_forge)
    c.g2_spx = rc.G2.mul(rc.g2_generator(), s_forge)
    # delta_after still equals pk2.delta_g1 (final-delta check passes) and
    # the key's internal pairing passes — only the linkage catches it
    assert not verify_mpc_chain(pk2)


def test_writer_roundtrip_with_contributions(zkey):
    pk, matrices = zkey
    pk2 = contribute(pk, entropy=b"roundtrip", name="alice")
    buf = io.BytesIO()
    write_zkey(buf, pk2, matrices.a, matrices.b, matrices.num_constraints)
    buf.seek(0)
    pk3, _ = read_zkey(buf)
    assert pk3.mpc.cs_hash == pk2.mpc.cs_hash
    got, want = pk3.mpc.contributions[0], pk2.mpc.contributions[0]
    assert got.delta_after == want.delta_after
    assert got.g1_s == want.g1_s and got.g1_sx == want.g1_sx
    assert got.g2_spx == want.g2_spx
    assert got.transcript == want.transcript
    assert got.name == "alice"
    assert verify_mpc_chain(pk3)
