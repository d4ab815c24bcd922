"""ZKey parser tests — header values, Montgomery decode, golden-byte point
checks, and VK parity vs verification_key.json
(reference test strategy: src/zkey.rs:465-779)."""

import json

import pytest

from circom_compat_tpu.circom.zkey import read_zkey
from circom_compat_tpu.constants import Q, MONT_R_INV_Q
from circom_compat_tpu.refmath import curve


@pytest.fixture(scope="module")
def zkey(test_vectors):
    return read_zkey(test_vectors / "test.zkey")


def test_mmap_load_parity(test_vectors):
    """Memory-mapped (zero-copy) load must match the buffered path."""
    import numpy as np

    from circom_compat_tpu import read_zkey

    pk1, m1 = read_zkey(test_vectors / "test.zkey")  # mmap default
    pk2, m2 = read_zkey(test_vectors / "test.zkey", use_mmap=False)
    assert np.array_equal(pk1.a_query.limbs, pk2.a_query.limbs)
    assert np.array_equal(pk1.b_g2_query.limbs, pk2.b_g2_query.limbs)
    assert np.array_equal(m1.a_values_mont, m2.a_values_mont)
    assert m1.a == m2.a and m1.b == m2.b
    assert pk1.vk.gamma_abc_g1 == pk2.vk.gamma_abc_g1


def test_header(zkey):
    pk, _ = zkey
    assert pk.n_vars == 4
    assert pk.n_public == 1
    assert pk.domain_size == 4


def _mont_decode_g1(buf: bytes):
    x = int.from_bytes(buf[:32], "little")
    y = int.from_bytes(buf[32:64], "little")
    if x == 0 and y == 0:
        return None
    return ((x * MONT_R_INV_Q) % Q, (y * MONT_R_INV_Q) % Q)


# Golden bytes captured from snarkjs (same vectors the reference asserts
# against, src/zkey.rs:398-432): curve.G1.F.one in LEM form.
FQ_ONE_LEM = bytes(
    [157, 13, 143, 197, 141, 67, 93, 211, 61, 11, 199, 245, 40, 235, 120, 10,
     44, 70, 121, 120, 111, 163, 110, 102, 47, 223, 7, 154, 193, 119, 10, 14]
)


def test_mont_fq_decode():
    assert (int.from_bytes(FQ_ONE_LEM, "little") * MONT_R_INV_Q) % Q == 1


def test_g1_one_decode():
    g1_lem = FQ_ONE_LEM + bytes(
        [58, 27, 30, 139, 27, 135, 186, 166, 123, 22, 142, 235, 81, 214, 241, 20,
         88, 140, 242, 240, 222, 70, 221, 204, 94, 190, 15, 52, 131, 239, 20, 28]
    )
    assert _mont_decode_g1(g1_lem) == (1, 2)  # the BN254 G1 generator


def test_all_query_points_on_curve(zkey):
    pk, _ = zkey
    for section in (pk.a_query, pk.b_g1_query, pk.l_query, pk.h_query):
        for p in section.points:
            assert curve.G1.is_on_curve(p)
    for p in pk.b_g2_query.points:
        assert curve.G2.is_on_curve(p)
    assert curve.G1.is_on_curve(pk.vk.alpha_g1)
    assert curve.G2.is_on_curve(pk.vk.beta_g2)


def test_infinity_encoding(zkey):
    pk, _ = zkey
    # mycircuit zkey: A query has one infinity entry, B1 has three
    # (reference golden bytes show all-zero rows, src/zkey.rs:603-649)
    assert pk.a_query.points[3] is None
    assert pk.b_g1_query.points[0] is None
    assert pk.b_g1_query.points[1] is None
    assert pk.b_g1_query.points[2] is None
    assert pk.b_g1_query.points[3] is not None


def test_vk_matches_verification_key_json(zkey, test_vectors):
    pk, _ = zkey
    vk_json = json.loads((test_vectors / "verification_key.json").read_text())

    def g1_from_json(key):
        x, y, z = (int(v) for v in vk_json[key])
        assert z == 1
        return (x, y)

    def g2_from_json(key):
        (x0, x1), (y0, y1), (z0, z1) = (
            (int(a), int(b)) for a, b in vk_json[key]
        )
        assert (z0, z1) == (1, 0)
        return ((x0, x1), (y0, y1))

    assert pk.vk.alpha_g1 == g1_from_json("vk_alpha_1")
    assert pk.vk.beta_g2 == g2_from_json("vk_beta_2")
    assert pk.vk.gamma_g2 == g2_from_json("vk_gamma_2")
    assert pk.vk.delta_g2 == g2_from_json("vk_delta_2")
    ic = [tuple(int(v) for v in p[:2]) for p in vk_json["IC"]]
    assert pk.vk.gamma_abc_g1 == ic


def test_matrices(zkey):
    pk, matrices = zkey
    assert matrices.num_constraints == 1
    assert matrices.num_instance_variables == 2
    assert matrices.num_witness_variables == 3
    # mycircuit: c = a*b encoded as (-a) * b = -c  =>  A=[(r-1, 2)], B=[(1, 3)]
    from circom_compat_tpu.constants import R_SCALAR

    assert matrices.a == [[(R_SCALAR - 1, 2)]]
    assert matrices.b == [[(1, 3)]]
    assert matrices.c == []


def test_witness_satisfies_zkey_matrices(zkey, test_vectors):
    """End-to-end coefficient decode check: A.w * B.w must hold."""
    from circom_compat_tpu.witness import WitnessCalculator
    from circom_compat_tpu.constants import R_SCALAR

    pk, matrices = zkey
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    w = wc.calculate_witness({"a": 3, "b": 11})
    for row_a, row_b in zip(matrices.a, matrices.b):
        lhs = sum(v * w[s] for v, s in row_a) % R_SCALAR
        rhs = sum(v * w[s] for v, s in row_b) % R_SCALAR
        # snarkjs convention: A*w * B*w + C*w = 0 with C empty is not the
        # invariant; the witness map consumes A,B directly. Check the known
        # mycircuit identity: (-a)*(b) == -c
        assert (lhs * rhs) % R_SCALAR == (R_SCALAR - w[1] * 1) % R_SCALAR
