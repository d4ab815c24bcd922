"""Groth16 prover/verifier orchestration.

Replaces ark-groth16 (reference: Cargo.toml:29; call sites src/zkey.rs:866,
:903-912, tests/groth16.rs:31). The prover is: CircomReduction witness map,
then five MSMs over the zkey query sections — A(G1), B1(G1), B2(G2),
L(G1, aux only), H(G1) — combined with randomizers r,s into (A, B, C).
Verification is one pairing product against the (processed) verifying key.

Three prover backends:
  - host:     pure-Python reference (tiny circuits, parity tests)
  - jax:      device witness map (ops/ntt.py) + device MSMs (ops/msm.py),
              host-side only for the final tiny group algebra
  - streamed: jax with HOST-resident query sections chunked to the device
              (keys larger than HBM, models/streamed.py); bit-exact
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

from ..circom import qap
from ..circom.zkey import ConstraintMatrices, ProvingKey, VerifyingKey
from ..constants import Q, R_SCALAR
from ..refmath import curve, pairing
from ..refmath.field import FQ12


# ------------------------------------------------------------- point checks
#
# The reference gets these for free from ark-serialize's checked
# deserialization (reference: Cargo.toml:32; infinity conventions
# src/zkey.rs:340-360). Proof/VK points arriving from JSON or foreign
# zkeys must be range-checked, on-curve and (for G2) in the r-torsion
# subgroup: a non-subgroup B point is the classic proof-malleability
# footgun, and out-of-range coordinates would alias another point once
# reduced mod q.


def _fq_ok(v) -> bool:
    return isinstance(v, int) and 0 <= v < Q


def validate_g1(p) -> bool:
    """None (infinity) or an affine on-curve BN254 G1 point with canonical
    coordinates. G1's cofactor is 1, so on-curve implies correct subgroup."""
    if p is None:
        return True
    if not (isinstance(p, (tuple, list)) and len(p) == 2):
        return False
    x, y = p
    return _fq_ok(x) and _fq_ok(y) and curve.G1.is_on_curve((x, y))


def validate_g2(p) -> bool:
    """None (infinity) or an affine G2 point with canonical Fq2 coordinates,
    on-curve AND in the order-r subgroup (G2's cofactor is large)."""
    if p is None:
        return True
    try:
        (x0, x1), (y0, y1) = p
    except (TypeError, ValueError):
        return False
    if not all(_fq_ok(v) for v in (x0, x1, y0, y1)):
        return False
    return curve.g2_in_correct_subgroup(((x0, x1), (y0, y1)))


def validate_proof(proof: "Proof") -> bool:
    return (
        validate_g1(proof.a) and validate_g2(proof.b) and validate_g1(proof.c)
    )


def validate_vk(vk: VerifyingKey) -> None:
    """Raise ValueError on any malformed verifying-key point."""
    if not validate_g1(vk.alpha_g1):
        raise ValueError("vk.alpha_g1 is not a valid G1 point")
    for name in ("beta_g2", "gamma_g2", "delta_g2"):
        if not validate_g2(getattr(vk, name)):
            raise ValueError(f"vk.{name} is not a valid G2 point")
    for i, p in enumerate(vk.gamma_abc_g1):
        if not validate_g1(p):
            raise ValueError(f"vk.gamma_abc_g1[{i}] is not a valid G1 point")


@dataclass
class Proof:
    a: Optional[Tuple[int, int]]  # G1
    b: object  # G2
    c: Optional[Tuple[int, int]]  # G1


@dataclass
class PreparedVerifyingKey:
    vk: VerifyingKey
    alpha_beta: FQ12  # e(alpha, beta), precomputed
    gamma_neg: object  # -gamma_g2
    delta_neg: object  # -delta_g2


def random_scalar() -> int:
    return int.from_bytes(os.urandom(48), "little") % R_SCALAR


class Groth16:
    # ------------------------------------------------------------------ prove

    @staticmethod
    def create_proof_with_reduction_and_matrices(
        pk: ProvingKey,
        r: int,
        s: int,
        matrices: ConstraintMatrices,
        num_inputs: int,
        num_constraints: int,
        full_assignment: Sequence[int],
        backend: str = "host",
    ) -> Proof:
        """Deterministic prove with explicit randomizers — mirrors
        ark_groth16::create_proof_with_reduction_and_matrices
        (reference call site: src/zkey.rs:903-912)."""
        if backend == "jax":
            from . import groth16_jax

            return groth16_jax.prove(
                pk, r, s, matrices, num_inputs, num_constraints, full_assignment
            )
        if backend == "streamed":
            # host-resident query sections streamed to the device in
            # bounded chunks — for keys larger than device HBM
            # (models/streamed.py; bit-exact vs this host backend)
            from .streamed import StreamedProvingKey, prove_streamed

            spk = StreamedProvingKey.build(
                pk, matrices, num_constraints, num_inputs
            )
            return prove_streamed(spk, r, s, full_assignment)
        from ..utils import trace

        with trace.stage("prove.witness_map"):
            h = qap.witness_map_from_matrices(
                matrices.a, matrices.b, num_inputs, num_constraints,
                full_assignment,
            )
        with trace.stage("prove.msm+assemble"):
            return _assemble_proof_host(
                pk, r, s, full_assignment, h, num_inputs
            )

    @staticmethod
    def prove(pk: ProvingKey, circuit, rng=None, backend: str = "host") -> Proof:
        """Randomized prove over a witness-attached CircomCircuit
        (reference: Groth16::prove at src/zkey.rs:866)."""
        r = random_scalar()
        s = random_scalar()
        full_assignment = circuit.full_assignment()
        a_rows, b_rows, _ = circuit.to_matrices()
        # Swap rows to [(value, signal)] ordering used by the witness map.
        matrices_a = a_rows
        matrices_b = b_rows
        num_inputs = circuit.r1cs.num_inputs
        num_constraints = len(circuit.r1cs.constraints)
        if backend == "jax":
            from . import groth16_jax

            class _M:
                a = matrices_a
                b = matrices_b

            return groth16_jax.prove(
                pk, r, s, _M, num_inputs, num_constraints, full_assignment
            )
        h = qap.witness_map_from_matrices(
            matrices_a, matrices_b, num_inputs, num_constraints, full_assignment
        )
        return _assemble_proof_host(pk, r, s, full_assignment, h, num_inputs)

    # ----------------------------------------------------------------- verify

    @staticmethod
    def process_vk(vk: VerifyingKey) -> PreparedVerifyingKey:
        validate_vk(vk)
        alpha_beta = pairing.pairing(vk.beta_g2, vk.alpha_g1)
        return PreparedVerifyingKey(
            vk=vk,
            alpha_beta=alpha_beta,
            gamma_neg=curve.G2.neg(vk.gamma_g2),
            delta_neg=curve.G2.neg(vk.delta_g2),
        )

    @staticmethod
    def verify_with_processed_vk(
        pvk: PreparedVerifyingKey, public_inputs: Sequence[int], proof: Proof
    ) -> bool:
        """e(A,B) =? e(alpha,beta) * e(L_pub, gamma) * e(C, delta).

        Malformed proof points (off-curve, wrong subgroup, non-canonical
        coordinates) are rejected up front — garbage must produce a clean
        False, not an undefined pairing value."""
        from ..utils import trace

        with trace.stage("verify"):
            if not validate_proof(proof):
                return False
            ic = pvk.vk.gamma_abc_g1
            if len(public_inputs) + 1 != len(ic):
                raise ValueError("public input length mismatch")
            with trace.stage("ic_msm"):
                acc = ic[0]
                for x, base in zip(public_inputs, ic[1:]):
                    acc = curve.G1.add(acc, curve.G1.mul(base, x % R_SCALAR))
            # Single product of Miller loops with one final exponentiation:
            # e(A,B) * e(acc, -gamma) * e(C, -delta) * e(alpha,beta)^-1 == 1
            with trace.stage("pairing"):
                f = pairing.multi_pairing(
                    [
                        (proof.a, proof.b),
                        (acc, pvk.gamma_neg),
                        (proof.c, pvk.delta_neg),
                    ]
                )
            return f == pvk.alpha_beta

    @staticmethod
    def verify_proof(
        vk: VerifyingKey, proof: Proof, public_inputs: Sequence[int]
    ) -> bool:
        return Groth16.verify_with_processed_vk(
            Groth16.process_vk(vk), public_inputs, proof
        )


def _assemble_proof_host(
    pk: ProvingKey,
    r: int,
    s: int,
    assignment: Sequence[int],
    h: Sequence[int],
    num_inputs: int,
) -> Proof:
    """The five MSMs + randomizer algebra producing (A, B, C)."""
    g1 = curve.G1
    g2 = curve.G2
    assignment = [a % R_SCALAR for a in assignment]

    a_query = pk.a_query.points
    b1_query = pk.b_g1_query.points
    b2_query = pk.b_g2_query.points
    l_query = pk.l_query.points
    h_query = pk.h_query.points

    # A = alpha + sum a_i A_i + r delta
    g_a = g1.msm(a_query, assignment)
    g_a = g1.add(g_a, pk.vk.alpha_g1)
    g_a = g1.add(g_a, g1.mul(pk.delta_g1, r))

    # B(G1) = beta1 + sum a_i B1_i + s delta1
    g_b1 = g1.msm(b1_query, assignment)
    g_b1 = g1.add(g_b1, pk.beta_g1)
    g_b1 = g1.add(g_b1, g1.mul(pk.delta_g1, s))

    # B(G2) = beta2 + sum a_i B2_i + s delta2
    g_b2 = g2.msm(b2_query, assignment)
    g_b2 = g2.add(g_b2, pk.vk.beta_g2)
    g_b2 = g2.add(g_b2, g2.mul(pk.vk.delta_g2, s))

    # C = sum_aux a_i L_i + sum h_j H_j + s A + r B1 - rs delta1
    aux = assignment[num_inputs : num_inputs + len(l_query)]
    g_c = g1.msm(l_query, aux)
    g_c = g1.add(g_c, g1.msm(h_query, [x % R_SCALAR for x in h]))
    g_c = g1.add(g_c, g1.mul(g_a, s))
    g_c = g1.add(g_c, g1.mul(g_b1, r))
    g_c = g1.add(g_c, g1.mul(pk.delta_g1, (-r * s) % R_SCALAR))

    return Proof(a=g_a, b=g_b2, c=g_c)
