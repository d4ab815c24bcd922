"""Streamed prover (host-resident query sections, chunked H2D window sums)
must be bit-exact vs the host backend — incl. chunk sizes that force
multi-chunk accumulation and padding of the last chunk."""

import pytest

from circom_compat_tpu import read_zkey
from circom_compat_tpu.models import Groth16
from circom_compat_tpu.models.streamed import StreamedProvingKey, prove_streamed
from circom_compat_tpu.witness import WitnessCalculator


@pytest.fixture(scope="module")
def zkey(test_vectors):
    return read_zkey(test_vectors / "test.zkey")


@pytest.fixture(scope="module")
def witness(test_vectors):
    wc = WitnessCalculator.from_file(
        test_vectors / "mycircuit_js" / "mycircuit.wasm"
    )
    return wc.calculate_witness({"a": 3, "b": 11})


@pytest.mark.parametrize(
    "chunk",
    [
        2,  # multi-chunk accumulation (smoke tier)
        pytest.param(3, marks=pytest.mark.slow),  # padded tail
        pytest.param(64, marks=pytest.mark.slow),  # single chunk
    ],
    ids=["chunk2", "chunk3-pad", "one-chunk"],
)
def test_streamed_prove_bit_exact(zkey, witness, chunk):
    pk, matrices = zkey
    spk = StreamedProvingKey.build(
        pk, matrices, matrices.num_constraints, chunk_points=chunk
    )
    proof = prove_streamed(spk, 7, 9, witness)
    host = Groth16.create_proof_with_reduction_and_matrices(
        pk, 7, 9, matrices,
        matrices.num_instance_variables, matrices.num_constraints, witness,
        backend="host",
    )
    assert proof == host
    assert Groth16.verify_proof(
        pk.vk, proof, witness[1 : matrices.num_instance_variables]
    )


@pytest.mark.slow
def test_streamed_prove_chain_circuit_multichunk():
    """62-constraint chain with chunk=16: every section streams in several
    chunks with a padded tail."""
    from circom_compat_tpu.models import generate_parameters
    from circom_compat_tpu.utils.chain import chain_circuit

    circuit = chain_circuit(k=62, a=3)
    pk = generate_parameters(
        circuit, alpha=0xA, beta=0xB, gamma=0xC, delta=0xD, t=0xE1
    )
    ma, mb, _ = circuit.to_matrices()

    import numpy as np

    from circom_compat_tpu.constants import R_SCALAR
    from circom_compat_tpu.ops import limbs as limb_codec

    def coo(rows_list):
        rows, cols, vals = [], [], []
        for ri, entries in enumerate(rows_list):
            for v, sig in entries:
                rows.append(ri)
                cols.append(sig)
                vals.append((v << 256) % R_SCALAR)
        vals16 = (
            limb_codec.ints_to_limbs(vals, dtype=np.uint16)
            if vals else np.zeros((0, 16), np.uint16)
        )
        return np.array(rows, np.int32), np.array(cols, np.int32), vals16

    ar, ac, av = coo(ma)
    br, bc, bv = coo(mb)

    class _Shim:
        num_instance_variables = circuit.r1cs.num_inputs
        a_rows, a_cols, a_values_mont = ar, ac, av
        b_rows, b_cols, b_values_mont = br, bc, bv
        a, b = ma, mb
        num_constraints = len(ma)

    full = circuit.full_assignment()
    spk = StreamedProvingKey.build(
        pk, _Shim, len(ma), circuit.r1cs.num_inputs, chunk_points=16
    )
    proof = prove_streamed(spk, 77, 88, full)
    host = Groth16.create_proof_with_reduction_and_matrices(
        pk, 77, 88, _Shim, circuit.r1cs.num_inputs, len(ma), full,
        backend="host",
    )
    assert proof == host
