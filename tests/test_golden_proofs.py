"""Vendored golden proofs: cross-backend bit-exactness as a regression gate.

The goldens (tests/golden/*.json, generated once by
scripts/gen_golden_proofs.py from the host exact-int backend) pin the
EXACT proof bytes for fixed r,s + fixed witness. Host, device (jax) and
streamed provers must each reproduce them; the sharded prover is pinned
via the same circuit/r,s in tests/test_prove_sharded.py. This catches any
single backend drifting alone — self-determinism and pairwise checks
cannot (VERDICT r3 task 5). Reference analogue: the golden-artifact
discipline of src/zkey.rs:465-543.
"""

import json
import pathlib

import pytest

from circom_compat_tpu import read_zkey
from circom_compat_tpu.models import Groth16
from circom_compat_tpu.witness import WitnessCalculator

GOLDEN = pathlib.Path(__file__).parent / "golden"


def load_golden(name):
    rec = json.loads((GOLDEN / name).read_text())
    p = rec["proof"]

    def g1(v):
        return None if v is None else (int(v[0], 16), int(v[1], 16))

    def g2(v):
        return None if v is None else (
            (int(v[0][0], 16), int(v[0][1], 16)),
            (int(v[1][0], 16), int(v[1][1], 16)),
        )

    from circom_compat_tpu.models.groth16 import Proof

    return rec, Proof(a=g1(p["a"]), b=g2(p["b"]), c=g1(p["c"]))


@pytest.fixture(scope="module")
def mycircuit_setup(test_vectors):
    pk, matrices = read_zkey(test_vectors / "test.zkey")
    wc = WitnessCalculator.from_file(
        test_vectors / "mycircuit_js" / "mycircuit.wasm"
    )
    witness = wc.calculate_witness({"a": 3, "b": 11})
    return pk, matrices, witness


@pytest.mark.parametrize("backend", ["host", "jax"])
def test_mycircuit_matches_golden(mycircuit_setup, backend):
    pk, matrices, witness = mycircuit_setup
    rec, golden = load_golden("mycircuit_proof.json")
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk, rec["r"], rec["s"], matrices, matrices.num_instance_variables,
        matrices.num_constraints, witness, backend=backend,
    )
    assert proof == golden


def test_mycircuit_streamed_matches_golden(mycircuit_setup):
    from circom_compat_tpu.models.streamed import (
        StreamedProvingKey,
        prove_streamed,
    )

    pk, matrices, witness = mycircuit_setup
    rec, golden = load_golden("mycircuit_proof.json")
    spk = StreamedProvingKey.build(
        pk, matrices, matrices.num_constraints, chunk_points=2
    )
    proof = prove_streamed(spk, rec["r"], rec["s"], witness)
    assert proof == golden


@pytest.mark.parametrize(
    "backend",
    ["host",
     # the jax-backend compile of the 2^8-domain core costs ~107 s on the
     # CPU mesh; the device backend is already golden-pinned in smoke via
     # mycircuit above, so the chain variant rides the slow tier
     pytest.param("jax", marks=pytest.mark.slow)],
)
def test_chain254_matches_golden(backend):
    from circom_compat_tpu.models import generate_parameters
    from circom_compat_tpu.utils.chain import chain_circuit

    rec, golden = load_golden("chain254_proof.json")
    circuit = chain_circuit(k=254, a=3)
    pk = generate_parameters(
        circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
    )
    ma, mb, _ = circuit.to_matrices()

    class _Rows:
        a = ma
        b = mb
        num_instance_variables = circuit.r1cs.num_inputs

    full = circuit.full_assignment()
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk, rec["r"], rec["s"], _Rows, circuit.r1cs.num_inputs, len(ma),
        full, backend=backend,
    )
    assert proof == golden
    assert Groth16.verify_proof(pk.vk, proof, circuit.get_public_inputs())
