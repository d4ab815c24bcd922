"""Synthetic squaring-chain circuit: the shape of the reference's
complex-circuit template (reference:
test-vectors/complex-circuit/complex-circuit.circom.template) at any size.

Used by tests/test_prove_sharded.py and the driver's multichip dryrun to
exercise the distributed witness map on real (>= 2^10) domains without a
circom toolchain in the image.
"""

from __future__ import annotations

from ..circom.circuit import CircomCircuit
from ..circom.r1cs import R1CS
from ..constants import R_SCALAR


def chain_circuit(k: int = 62, a: int = 3) -> CircomCircuit:
    """Squaring chain: wires [1, out, a, b1..b_{k-1}]; k constraints;
    domain k + 2 (pick k = 2^m - 2 for a power-of-two domain)."""
    constraints = []
    # a*a = b1
    constraints.append(([(2, 1)], [(2, 1)], [(3, 1)]))
    for i in range(1, k - 1):
        w = 2 + i
        constraints.append(([(w, 1)], [(w, 1)], [(w + 1, 1)]))
    last = 2 + k - 1
    constraints.append(([(last, 1)], [(last, 1)], [(1, 1)]))

    witness = [1, 0, a] + [0] * (k - 1)
    v = a
    for i in range(k - 1):
        v = v * v % R_SCALAR
        witness[3 + i] = v
    witness[1] = v * v % R_SCALAR

    r1cs = R1CS(
        num_inputs=2, num_aux=k, num_variables=k + 2,
        constraints=constraints, wire_mapping=None,
    )
    circuit = CircomCircuit(r1cs=r1cs, witness=witness)
    assert circuit.is_satisfied()
    return circuit
