"""Native C++ WASM VM vs pure-Python interpreter parity on real fixtures."""

import json

import pytest

from circom_compat_tpu.witness import WitnessCalculator
from circom_compat_tpu.witness.calculator import WitnessCalcError
from circom_compat_tpu.witness.wasm import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native VM unavailable"
)


def _calc(path, force_python=False):
    import os

    if force_python:
        os.environ["CIRCOM_TPU_NATIVE"] = "0"
    try:
        return WitnessCalculator.from_file(path)
    finally:
        os.environ.pop("CIRCOM_TPU_NATIVE", None)


def test_native_is_used(test_vectors):
    import os

    os.environ["CIRCOM_TPU_AOT"] = "0"  # force past the AOT preference
    try:
        wc = _calc(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    finally:
        os.environ.pop("CIRCOM_TPU_AOT", None)
    assert type(wc.instance).__name__ == "NativeInstance"


def test_native_witness_parity(test_vectors):
    path = test_vectors / "circuit2_js" / "circuit2.wasm"
    inp = json.load(open(test_vectors / "mycircuit-input1.json"))
    w_native = _calc(path).calculate_witness(inp)
    w_python = _calc(path, force_python=True).calculate_witness(inp)
    assert w_native == w_python
    golden = [int(x) for x in json.load(open(test_vectors / "safe-circuit-witness.json"))]
    assert w_native == golden


def test_native_negative_values(test_vectors):
    # negative inputs exercise the modulus - |w| normalization
    wc = _calc(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    w = wc.calculate_witness({"a": -3, "b": 11})
    assert w[1] == wc.prime - 33


def test_native_error_path(test_vectors):
    """Junk input name must raise through the host-callback trap path
    (reference: tests/groth16.rs:42-73 relies on this failing)."""
    wc = _calc(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    with pytest.raises(WitnessCalcError):
        wc.calculate_witness({"a": 3, "bogus": 1})


def test_native_prime_readback(test_vectors):
    wc = _calc(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    from circom_compat_tpu.constants import R_SCALAR

    assert wc.prime == R_SCALAR
