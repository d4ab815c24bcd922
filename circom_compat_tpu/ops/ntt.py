"""Radix-2 NTT over Fr and the snarkjs witness map, on device.

Replaces ark-poly's Radix2EvaluationDomain as driven by the reference
witness map (reference: src/circom/qap.rs:60-81): ifft/fft in natural
order, coset shift by powers of the 2n-th root of unity, pointwise
products — all over Montgomery-form (n, 16) uint32 limb tensors.

An NTTPlan precomputes (once per domain size, device-resident) the
bit-reversal permutation, twiddle tables and coset power tables, so
repeated proofs pay zero host recompute. Stages are unrolled Python loops
over log2(n) — static shapes, pure vector code for XLA.

Ground truth: refmath/poly.py + circom/qap.py; tests in tests/test_ntt.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_SCALAR, fr_root_of_unity
from . import field_jax as fj
from . import limbs as limb_codec
from . import segments

FR = fj.FR


def _mont(v: int) -> np.ndarray:
    return limb_codec.int_to_limbs((v << 256) % R_SCALAR)


def _power_table(w: int, n: int) -> np.ndarray:
    """[w^0, ..., w^(n-1)] Montgomery, as a (n, 16) uint32 host array.

    Pure-host build (Python bigint chain + one frombuffer) — issuing no
    device ops keeps plan construction compile-free; the tables embed as
    constants in the jitted NTT graphs.
    """
    r = (1 << 256) % R_SCALAR
    acc = r  # 1 in Montgomery form
    w = w % R_SCALAR
    chunks = bytearray()
    for _ in range(n):
        chunks += acc.to_bytes(32, "little")
        acc = acc * w % R_SCALAR
    return (
        np.frombuffer(bytes(chunks), dtype="<u2").reshape(n, 16).astype(np.uint32)
    )


@lru_cache(maxsize=8)
def get_plan(domain_size: int) -> "NTTPlan":
    return NTTPlan(domain_size)


class NTTPlan:
    def __init__(self, n: int):
        if n & (n - 1):
            raise ValueError("domain size must be a power of two")
        self.n = n
        self.log_n = n.bit_length() - 1

        # Bit-reversal permutation.
        idx = np.arange(n, dtype=np.int64)
        rev = np.zeros(n, dtype=np.int64)
        for b in range(self.log_n):
            rev |= ((idx >> b) & 1) << (self.log_n - 1 - b)
        self.bitrev = rev.astype(np.int32)  # numpy: plans are built
        # lazily (possibly inside a jit trace) and lru_cached — caching jnp
        # arrays created during tracing would leak tracers.

        root = fr_root_of_unity(n) if n > 1 else 1
        root_inv = pow(root, -1, R_SCALAR)
        self.tw_fwd = _power_table(root, max(n // 2, 1))
        self.tw_inv = _power_table(root_inv, max(n // 2, 1))
        self.n_inv = _mont(pow(n, -1, R_SCALAR))

        # Coset shift table: powers of the 2n-th root of unity
        # (reference: src/circom/qap.rs:63-70).
        root_2n = fr_root_of_unity(2 * n)
        self.coset = _power_table(root_2n, n)


def ntt_core_batched(
    x: jnp.ndarray, table, bitrev, n: int, log_n: int
) -> jnp.ndarray:
    """Iterative radix-2 butterflies along axis -2 of (..., n, 16) input.

    `table` is the (n/2, 16) twiddle table for the chosen direction;
    `bitrev` the (n,) permutation. Shared by the single-chip NTT and the
    local stages of the four-step distributed NTT (parallel/ntt_sharded.py).
    """
    x = jnp.take(x, jnp.asarray(bitrev), axis=-2)
    batch = x.shape[:-2]
    for s in range(log_n):
        half = 1 << s
        length = half * 2
        stride = n // length
        tw = jnp.asarray(table[::stride][:half])  # (half, 16)
        xm = x.reshape(batch + (n // length, length, 16))
        u = xm[..., :half, :]
        v = fj.mont_mul(FR, xm[..., half:, :], tw)
        x = jnp.concatenate(
            [fj.add(FR, u, v), fj.sub(FR, u, v)], axis=-2
        ).reshape(batch + (n, 16))
    return x


def _ntt_core(plan: NTTPlan, x: jnp.ndarray, table) -> jnp.ndarray:
    return ntt_core_batched(x, table, plan.bitrev, plan.n, plan.log_n)


def fft(plan: NTTPlan, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations [p(w^0), p(w^1), ...] (Montgomery in/out)."""
    return _ntt_core(plan, coeffs, plan.tw_fwd)


def ifft(plan: NTTPlan, evals: jnp.ndarray) -> jnp.ndarray:
    out = _ntt_core(plan, evals, plan.tw_inv)
    return fj.mont_mul(FR, out, plan.n_inv)


def coset_shift(plan: NTTPlan, coeffs: jnp.ndarray) -> jnp.ndarray:
    """coeffs[i] *= g^i with g the 2n-th root of unity — arkworks'
    distribute_powers (reference: src/circom/qap.rs:69-70)."""
    return fj.mont_mul(FR, coeffs, plan.coset)


# ---------------------------------------------------------------------------
# Sparse constraint evaluation + CircomReduction witness map
# ---------------------------------------------------------------------------


def sparse_eval(
    rows_sorted: jnp.ndarray,  # (nnz,) int32, ascending
    cols: jnp.ndarray,  # (nnz,) int32
    values_mont: jnp.ndarray,  # (nnz, 16) uint32 Montgomery
    assignment_mont: jnp.ndarray,  # (n_vars, 16) uint32 Montgomery
    num_rows: int,
) -> jnp.ndarray:
    """Per-row sparse dot products sum(coeff * w[col]) mod r — the hot loop
    the reference runs under Rayon (reference: src/circom/qap.rs:37-44)."""
    # values may arrive as uint16 (compact zkey-width staging) — widen here.
    values_mont = values_mont.astype(jnp.uint32)
    prods = fj.mont_mul(FR, values_mont, assignment_mont[cols])
    zero = jnp.zeros(16, jnp.uint32)
    return segments.reduce_by_sorted_key(
        lambda a, b: fj.add(FR, a, b), prods, rows_sorted, num_rows, zero
    )


def witness_map(
    plan: NTTPlan,
    a_rows: jnp.ndarray,
    a_cols: jnp.ndarray,
    a_vals: jnp.ndarray,
    b_rows: jnp.ndarray,
    b_cols: jnp.ndarray,
    b_vals: jnp.ndarray,
    assignment_mont: jnp.ndarray,
    num_constraints: int,
    num_inputs: int,
) -> jnp.ndarray:
    """CircomReduction::witness_map_from_matrices on device
    (reference: src/circom/qap.rs:23-88). Returns HZ evaluations, Montgomery.
    """
    n = plan.n
    a = sparse_eval(a_rows, a_cols, a_vals, assignment_mont, n)
    b = sparse_eval(b_rows, b_cols, b_vals, assignment_mont, n)

    # Public inputs into a[num_constraints..] (reference: qap.rs:46-50).
    a = a.at[num_constraints : num_constraints + num_inputs].set(
        assignment_mont[:num_inputs]
    )

    c = fj.mont_mul(FR, a, b)

    # Call the un-jitted impls: `plan` may be a _TracedNTTPlan whose tables
    # are tracers (groth16_jax passes key arrays as jit arguments), which
    # must not hit the jitted wrappers' static plan argument.
    a = coset_shift_impl(plan, ifft_impl(plan, a))
    b = coset_shift_impl(plan, ifft_impl(plan, b))
    a = fft_impl(plan, a)
    b = fft_impl(plan, b)
    ab = fj.mont_mul(FR, a, b)

    c = fft_impl(plan, coset_shift_impl(plan, ifft_impl(plan, c)))

    return fj.sub(FR, ab, c)


# jit public entry points (plan/sizes static; eager callers get cached kernels)
fft_impl, ifft_impl, coset_shift_impl = fft, ifft, coset_shift
sparse_eval_impl, witness_map_impl = sparse_eval, witness_map
fft = jax.jit(fft_impl, static_argnums=0)
ifft = jax.jit(ifft_impl, static_argnums=0)
coset_shift = jax.jit(coset_shift_impl, static_argnums=0)
sparse_eval = jax.jit(sparse_eval_impl, static_argnums=(4,))
witness_map = jax.jit(witness_map_impl, static_argnums=(0, 8, 9))
