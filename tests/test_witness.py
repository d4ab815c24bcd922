"""Witness calculator tests — the reference's table-driven cases
(reference: src/witness/witness_calculator.rs:242-361) plus wtns goldens."""

import json

import pytest

from circom_compat_tpu.circom.wtns import read_wtns, write_wtns
from circom_compat_tpu.witness import WitnessCalculator, WitnessCalcError

PRIME_HEX = "30644e72e131a029b85045b68181585d2833e84879b9709143e1f593f0000001"


@pytest.fixture(scope="module")
def mycircuit(test_vectors):
    return WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")


def _load_inputs(path):
    raw = json.loads(path.read_text())
    return raw


def test_prime_and_n64(mycircuit):
    assert hex(mycircuit.prime)[2:] == PRIME_HEX
    assert mycircuit.n64 == 4
    assert mycircuit.n32 == 8


def test_multiplier_1(mycircuit, test_vectors):
    inputs = _load_inputs(test_vectors / "mycircuit-input1.json")
    w = mycircuit.calculate_witness(inputs)
    assert w == [1, 33, 3, 11]
    golden = [int(x) for x in json.loads((test_vectors / "mycircuit-witness.json").read_text())]
    assert w == golden


def test_multiplier_2(mycircuit, test_vectors):
    inputs = _load_inputs(test_vectors / "mycircuit-input2.json")
    w = mycircuit.calculate_witness(inputs)
    assert w == [
        1,
        21888242871839275222246405745257275088548364400416034343698204186575672693159,
        21888242871839275222246405745257275088548364400416034343698204186575796149939,
        11,
    ]


def test_multiplier_3(mycircuit, test_vectors):
    inputs = _load_inputs(test_vectors / "mycircuit-input3.json")
    w = mycircuit.calculate_witness(inputs)
    assert w == [
        1,
        21888242871839275222246405745257275088548364400416034343698204186575808493616,
        10944121435919637611123202872628637544274182200208017171849102093287904246808,
        2,
    ]


def test_safe_multiplier(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "circuit2_js" / "circuit2.wasm")
    inputs = _load_inputs(test_vectors / "mycircuit-input1.json")
    w = wc.calculate_witness(inputs)
    golden = [int(x) for x in json.loads((test_vectors / "safe-circuit-witness.json").read_text())]
    assert w[: len(golden)] == golden


def test_wtns_golden(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "circuit2_js" / "circuit2.wasm")
    inputs = _load_inputs(test_vectors / "mycircuit-input1.json")
    w = wc.calculate_witness(inputs)
    assert w == read_wtns(test_vectors / "circuit2_js" / "witness.wtns")


def test_wtns_roundtrip(tmp_path):
    values = [1, 33, 3, 11]
    path = tmp_path / "out.wtns"
    write_wtns(values, path)
    assert read_wtns(path) == values


def test_unknown_signal_rejected(mycircuit):
    with pytest.raises(WitnessCalcError, match="Signal not found"):
        mycircuit.calculate_witness({"bogus": 1, "b": 2})


def test_value_near_2_32(mycircuit):
    """Reference: witness-gen-only with value near 2^32
    (tests/groth16.rs:106-119)."""
    a = 2**32 - 50
    w = mycircuit.calculate_witness({"a": a, "b": 11})
    assert w[1] == a * 11


def test_fnv():
    from circom_compat_tpu.witness.fnv import fnv, fnv1a_64

    # FNV-1a 64 known vector
    assert fnv1a_64("") == 0xCBF29CE484222325
    msb, lsb = fnv("a")
    h = fnv1a_64("a")
    assert (msb << 32) | lsb == h


def test_wasm_facade(test_vectors):
    """Typed export facade parity (reference: src/witness/circom.rs:4-71)."""
    from circom_compat_tpu import Wasm
    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.witness import WitnessCalculator
    from circom_compat_tpu.witness.wasm.interp import WasmTrap

    wc = WitnessCalculator.from_file(
        test_vectors / "mycircuit_js" / "mycircuit.wasm"
    )
    w = Wasm(wc.instance)
    assert w.get_field_num_len32() == 8
    w.get_raw_prime()
    limbs = [w.read_shared_rw_memory(i) for i in range(8)]
    assert sum(l << (32 * i) for i, l in enumerate(limbs)) == R_SCALAR
    assert w.get_witness_size() == 4
    import pytest

    with pytest.raises(WasmTrap):  # missing export panics (reference :67-71)
        w.get_fr_len()


def test_calculate_witness_limbs_matches_ints(test_vectors):
    """(n, 16)-limb witness fast path == the Python-int path, on both the
    circom-2 fixtures, across whatever engine is active."""
    import numpy as np

    from circom_compat_tpu.ops import limbs as limb_codec

    for wasm in ("mycircuit_js/mycircuit.wasm", "circuit2_js/circuit2.wasm"):
        wc = WitnessCalculator.from_file(test_vectors / wasm)
        inputs = {"a": 3, "b": 11}
        ints = wc.calculate_witness(inputs)
        arr = wc.calculate_witness_limbs(inputs)
        assert arr.shape == (len(ints), 16) and arr.dtype == np.uint32
        np.testing.assert_array_equal(
            arr, limb_codec.ints_to_limbs(ints, dtype=np.uint32)
        )


def test_read_wtns_limbs_matches_ints(test_vectors):
    import numpy as np

    from circom_compat_tpu.circom.wtns import read_wtns, read_wtns_limbs
    from circom_compat_tpu.ops import limbs as limb_codec

    path = test_vectors / "circuit2_js" / "witness.wtns"
    ints = read_wtns(path)
    arr = read_wtns_limbs(path)
    np.testing.assert_array_equal(
        arr, limb_codec.ints_to_limbs(ints, dtype=np.uint32)
    )


def test_jax_prover_accepts_limb_array_assignment(test_vectors):
    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.models import Groth16

    pk, matrices = read_zkey(test_vectors / "test.zkey")
    wc = WitnessCalculator.from_file(
        test_vectors / "mycircuit_js" / "mycircuit.wasm"
    )
    ints = wc.calculate_witness({"a": 3, "b": 11})
    arr = wc.calculate_witness_limbs({"a": 3, "b": 11})
    kwargs = dict(backend="jax")
    p_list = Groth16.create_proof_with_reduction_and_matrices(
        pk, 7, 9, matrices, matrices.num_instance_variables,
        matrices.num_constraints, ints, **kwargs,
    )
    p_arr = Groth16.create_proof_with_reduction_and_matrices(
        pk, 7, 9, matrices, matrices.num_instance_variables,
        matrices.num_constraints, arr, **kwargs,
    )
    assert p_list == p_arr
