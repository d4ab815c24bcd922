"""Generate the vendored golden-proof fixtures (tests/golden/*.json).

Golden proofs pin cross-backend bit-exactness as a REGRESSION GATE
(VERDICT r3 task 5): fixed r,s + fixed witness through the host exact-int
backend, committed as bytes. Every prover backend (host / jax device /
streamed / sharded) must reproduce them exactly — a drift in any one
backend fails the smoke tier even when the backends still agree with each
other. Mirrors the reference's golden-artifact discipline around its
embedded test vectors (reference: src/zkey.rs:465-543).

Run from the repo root when the proof SEMANTICS legitimately change
(never for perf work — proofs are a pure function of key + witness + r,s):

  python scripts/gen_golden_proofs.py
"""

import json
import pathlib
import sys

sys.path.insert(0, "/root/repo")
REPO = pathlib.Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"


def proof_to_json(proof):
    def g1(p):
        return None if p is None else [hex(p[0]), hex(p[1])]

    def g2(p):
        return None if p is None else [
            [hex(p[0][0]), hex(p[0][1])], [hex(p[1][0]), hex(p[1][1])]
        ]

    return {"a": g1(proof.a), "b": g2(proof.b), "c": g1(proof.c)}


def main():
    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.models import Groth16, generate_parameters
    from circom_compat_tpu.utils.chain import chain_circuit
    from circom_compat_tpu.utils.paths import test_vectors
    from circom_compat_tpu.witness import WitnessCalculator

    GOLDEN.mkdir(exist_ok=True)

    # --- mycircuit against the snarkjs-produced test.zkey (r=7, s=9) ---
    pk, matrices = read_zkey(test_vectors() / "test.zkey")
    wc = WitnessCalculator.from_file(
        test_vectors() / "mycircuit_js" / "mycircuit.wasm"
    )
    witness = wc.calculate_witness({"a": 3, "b": 11})
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk, 7, 9, matrices, matrices.num_instance_variables,
        matrices.num_constraints, witness, backend="host",
    )
    assert Groth16.verify_proof(
        pk.vk, proof, witness[1 : matrices.num_instance_variables]
    )
    rec = {
        "circuit": "mycircuit (test-vectors/test.zkey)",
        "inputs": {"a": 3, "b": 11},
        "r": 7,
        "s": 9,
        "proof": proof_to_json(proof),
    }
    (GOLDEN / "mycircuit_proof.json").write_text(json.dumps(rec, indent=1))
    print("wrote mycircuit_proof.json")

    # --- chain circuit, domain 2^8, first-party dev setup (r=77, s=88) ---
    # Same circuit + r,s as tests/test_prove_sharded.py's smoke test, so the
    # sharded prover is transitively pinned to this golden as well.
    circuit = chain_circuit(k=254, a=3)
    pk2 = generate_parameters(
        circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
    )
    ma, mb, _ = circuit.to_matrices()

    class _Rows:
        a = ma
        b = mb
        num_instance_variables = circuit.r1cs.num_inputs

    full = circuit.full_assignment()
    proof2 = Groth16.create_proof_with_reduction_and_matrices(
        pk2, 77, 88, _Rows, circuit.r1cs.num_inputs, len(ma), full,
        backend="host",
    )
    assert Groth16.verify_proof(pk2.vk, proof2, circuit.get_public_inputs())
    rec2 = {
        "circuit": "chain_circuit(k=254, a=3), dev setup "
                   "alpha=0xA beta=0xB gamma=0xC delta=0xD t=0xE1",
        "r": 77,
        "s": 88,
        "proof": proof_to_json(proof2),
    }
    (GOLDEN / "chain254_proof.json").write_text(json.dumps(rec2, indent=1))
    print("wrote chain254_proof.json")


if __name__ == "__main__":
    main()
