"""R1CS parser tests — mirrors the reference's byte-level sample test
(reference: src/circom/r1cs_reader.rs:251-339) plus real fixtures."""

import io

import pytest

from circom_compat_tpu.circom.r1cs import (
    R1CS,
    R1CSParseError,
    parse_r1cs_file,
    read_r1cs,
)

# Hand-written 3-constraint r1cs hex dump (same test vector the reference
# parser is validated against).
SAMPLE_HEX = (
    "72316373"
    "01000000"
    "03000000"
    "01000000 40000000 00000000"
    "20000000"
    "010000f0 93f5e143 9170b979 48e83328 5d588181 b64550b8 29a031e1 724e6430"
    "07000000"
    "01000000"
    "02000000"
    "03000000"
    "e8030000 00000000"
    "03000000"
    "02000000 88020000 00000000"
    "02000000"
    "05000000 03000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "06000000 08000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "03000000"
    "00000000 02000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "02000000 14000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "03000000 0C000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "02000000"
    "00000000 05000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "02000000 07000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "03000000"
    "01000000 04000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "04000000 08000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "05000000 03000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "02000000"
    "03000000 2C000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "06000000 06000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "00000000"
    "01000000"
    "06000000 04000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "03000000"
    "00000000 06000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "02000000 0B000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "03000000 05000000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "01000000"
    "06000000 58020000 00000000 00000000 00000000 00000000 00000000 00000000 00000000"
    "03000000 38000000 00000000"
    "00000000 00000000"
    "03000000 00000000"
    "0a000000 00000000"
    "0b000000 00000000"
    "0c000000 00000000"
    "0f000000 00000000"
    "44010000 00000000"
).replace(" ", "")

SAMPLE = bytes.fromhex(SAMPLE_HEX)


def test_sample_bytes():
    f = parse_r1cs_file(io.BytesIO(SAMPLE))
    assert f.version == 1
    assert f.header.field_size == 32
    assert f.header.n_wires == 7
    assert f.header.n_pub_out == 1
    assert f.header.n_pub_in == 2
    assert f.header.n_prv_in == 3
    assert f.header.n_labels == 0x03E8
    assert f.header.n_constraints == 3

    assert len(f.constraints) == 3
    assert len(f.constraints[0][0]) == 2
    assert f.constraints[0][0][0] == (5, 3)
    assert f.constraints[2][1][0] == (0, 6)
    assert len(f.constraints[1][2]) == 0

    assert len(f.wire_mapping) == 7
    assert f.wire_mapping[1] == 3

    r1cs = R1CS.from_file(f)
    assert r1cs.num_inputs == 1 + 2 + 1
    assert r1cs.num_variables == 7
    assert r1cs.num_aux == 3


def test_bad_magic():
    with pytest.raises(R1CSParseError, match="magic"):
        parse_r1cs_file(io.BytesIO(b"nope" + SAMPLE[4:]))


def test_bad_version():
    data = SAMPLE[:4] + (2).to_bytes(4, "little") + SAMPLE[8:]
    with pytest.raises(R1CSParseError, match="version"):
        parse_r1cs_file(io.BytesIO(data))


def test_mycircuit_fixture(test_vectors):
    r1cs = read_r1cs(test_vectors / "mycircuit.r1cs")
    assert r1cs.num_variables == 4
    assert r1cs.num_inputs == 2  # [1, c]
    assert r1cs.num_aux == 2  # [a, b]
    assert len(r1cs.constraints) == 1


def test_circuit2_fixture(test_vectors):
    r1cs = read_r1cs(test_vectors / "circuit2.r1cs")
    assert r1cs.num_variables > 4
    assert r1cs.wire_mapping[0] == 0
