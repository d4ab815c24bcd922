"""Batch proving (models/batch.py): pipelined witness + device prove.

Parity gate: every batch proof with pinned (r, s) must be byte-identical
to the single-shot host-backend proof for the same inputs (the same
determinism rule the reference exercises via explicit r,s in
src/zkey.rs:875-919).
"""

import pytest

from circom_compat_tpu import read_zkey
from circom_compat_tpu.models import Groth16
from circom_compat_tpu.models.batch import BatchProver
from circom_compat_tpu.models.groth16_jax import DeviceProvingKey

from circom_compat_tpu.utils import paths

TV = paths.test_vectors()


@pytest.mark.slow
def test_batch_matches_single_shot_and_verifies():
    pk, matrices = read_zkey(TV / "test.zkey")
    dpk = DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    bp = BatchProver(
        dpk, TV / "mycircuit_js/mycircuit.wasm", workers=2, keep_witness=True
    )

    cases = [{"a": 3, "b": 11}, {"a": 5, "b": 7}, {"a": 1, "b": 1}, {"a": 1000, "b": 999}]
    rs = [(0x11 + i, 0x22 + i) for i in range(len(cases))]
    results = bp.prove_many(cases, rs=rs, inflight=2)

    pvk = Groth16.process_vk(pk.vk)
    for case, (r, s), res in zip(cases, rs, results):
        assert res.public_inputs == [case["a"] * case["b"]]
        assert Groth16.verify_with_processed_vk(pvk, res.public_inputs, res.proof)
        host = Groth16.create_proof_with_reduction_and_matrices(
            pk, r, s, matrices, matrices.num_instance_variables,
            matrices.num_constraints, res.witness, backend="host",
        )
        assert res.proof == host


@pytest.mark.slow
def test_batch_random_rs_unique():
    pk, matrices = read_zkey(TV / "test.zkey")
    dpk = DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    bp = BatchProver(dpk, TV / "mycircuit_js/mycircuit.wasm", workers=2)
    results = bp.prove_many([{"a": 2, "b": 3}] * 2)
    # fresh randomizers per proof: same inputs, different proofs
    assert results[0].proof != results[1].proof
    pvk = Groth16.process_vk(pk.vk)
    for res in results:
        assert Groth16.verify_with_processed_vk(pvk, res.public_inputs, res.proof)
