"""AOT-compiled (WASM -> C -> .so) witness engine vs goldens and the VMs.

Covers both circom ABIs: the circom-2 shared-RW protocol (mycircuit,
circuit2) and the circom-1 legacy SafeMemory protocol (complex-circuit),
including the batched native readback fast paths and the host-error
trap path (reference parity: src/witness/witness_calculator.rs tests +
tests/groth16.rs:42-73).
"""

import json

import pytest

from circom_compat_tpu.witness import WitnessCalculator
from circom_compat_tpu.witness.calculator import WitnessCalcError
from circom_compat_tpu.witness.wasm import aot


pytestmark = pytest.mark.skipif(
    not aot.aot_available(), reason="AOT toolchain unavailable"
)

from circom_compat_tpu.utils import paths

COMPLEX = str(paths.test_vectors() / "complex-circuit")


def test_aot_engine_selected(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    assert type(wc.instance).__name__ == "AotInstance"
    assert wc.calculate_witness({"a": 3, "b": 11}) == [1, 33, 3, 11]


def test_aot_circuit2_matches_snarkjs_golden(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "circuit2_js" / "circuit2.wasm")
    assert type(wc.instance).__name__ == "AotInstance"
    inp = json.load(open(test_vectors / "mycircuit-input1.json"))
    w = wc.calculate_witness(inp)
    golden = [int(x) for x in json.load(open(test_vectors / "safe-circuit-witness.json"))]
    assert w == golden


def test_aot_legacy_circuit_parity_vs_native_vm():
    """circom-1 ABI (SafeMemory Fr structs + getPWitness batched readback)."""
    import os

    wasm = f"{COMPLEX}/complex-circuit-10000-10000.wasm"
    w_aot = WitnessCalculator.from_file(wasm).calculate_witness({"a": 3})
    os.environ["CIRCOM_TPU_AOT"] = "0"
    try:
        w_vm = WitnessCalculator.from_file(wasm).calculate_witness({"a": 3})
    finally:
        os.environ.pop("CIRCOM_TPU_AOT", None)
    assert len(w_aot) == 10002
    assert w_aot == w_vm


def test_aot_negative_values(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    w = wc.calculate_witness({"a": -3, "b": 11})
    assert w[1] == wc.prime - 33


def test_aot_error_path(test_vectors):
    wc = WitnessCalculator.from_file(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    with pytest.raises(WitnessCalcError):
        wc.calculate_witness({"a": 3, "bogus": 1})
