"""Distributed radix-2 NTT over Fr: four-step decomposition with
all_to_all transposes over the mesh.

This is SURVEY §2.1 axis (b) / §5's "long-context analogue": once the
evaluation domain exceeds one chip, the NTT splits N = N1*N2 into local
FFTs over the unsharded axis plus two (fft) / three (ifft) all_to_all
matrix transposes over ICI — the structural cousin of Ulysses-style
sequence sharding (local attention + all_to_all of heads).

Derivation (k = k1 + N1*k2, n = n1*N2 + n2, w = the N-th root):
  X[k1 + N1 k2] = FFT_N2( w^(n2 k1) * FFT_N1(x[n1, n2] over n1) over n2 )

Layouts (both sharded over the leading axis):
  NAT: M[n1, n2] = x[n1*N2 + n2]   (natural/coefficient order)
  TD:  M[k1, k2] = X[k1 + N1*k2]   (transposed-digit evaluation order)

fft_dist : NAT coeffs -> TD evals  (2 all_to_all)
ifft_dist: TD evals  -> NAT coeffs (3 all_to_all)

Permutations between natural vectors and these layouts are static and are
folded into neighboring gathers/scatters (see td_perm/nat_from_td) so no
standalone shuffle pass ever runs on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_SCALAR, fr_root_of_unity
from ..ops import field_jax as fj
from ..ops import ntt as ntt_ops
from .mesh import SHARD_AXIS, shmap

FR = fj.FR


def _bitrev(n: int) -> np.ndarray:
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


def _pow_table_np(w: int, n: int) -> np.ndarray:
    return ntt_ops._power_table(w, n)


@dataclass(frozen=True, eq=False)
class DistNTTPlan:
    """Static data for one (domain_size, n_devices) pair."""

    n: int
    n1: int
    n2: int
    n_devices: int
    # local sub-FFT tables (Montgomery (m/2, 16) uint32) + bitrev perms
    tw1_fwd: np.ndarray
    tw1_inv: np.ndarray
    tw2_fwd: np.ndarray
    tw2_inv: np.ndarray
    bitrev1: np.ndarray
    bitrev2: np.ndarray
    # inter-step twiddles, NAT-transposed layout (N2, N1, 16)
    twiddle_fwd: np.ndarray
    twiddle_inv: np.ndarray
    n_inv: np.ndarray  # Montgomery 1/N
    # permutations between natural flat order and layouts
    td_perm: np.ndarray  # natural index j -> TD flat position
    coset_nat: np.ndarray  # coset table g^j in NAT flat order (n, 16)

    @property
    def log_n1(self):
        return self.n1.bit_length() - 1

    @property
    def log_n2(self):
        return self.n2.bit_length() - 1


@lru_cache(maxsize=4)
def get_dist_plan(n: int, n_devices: int) -> DistNTTPlan:
    if n & (n - 1):
        raise ValueError("domain size must be a power of two")
    log_n = n.bit_length() - 1
    # Split so both factors are multiples of n_devices (alltoall tiling).
    log_d = n_devices.bit_length() - 1
    if (1 << log_d) != n_devices:
        raise ValueError("n_devices must be a power of two")
    log_n1 = max(log_d, log_n // 2)
    log_n2 = log_n - log_n1
    if log_n2 < log_d:
        raise ValueError(
            f"domain 2^{log_n} too small to shard over {n_devices} devices"
        )
    n1, n2 = 1 << log_n1, 1 << log_n2

    w = fr_root_of_unity(n)
    w1 = pow(w, n2, R_SCALAR)  # N1-th root
    w2 = pow(w, n1, R_SCALAR)  # N2-th root
    w_inv = pow(w, -1, R_SCALAR)

    # Inter-step twiddle in [n2, n1] layout (the layout step 3 runs in).
    tw = np.zeros((n2 * n1, 16), np.uint32)
    r_mont = (1 << 256) % R_SCALAR
    row_base = 1
    idx = 0
    for n2i in range(n2):
        acc = r_mont  # w^(n2i*0) in Montgomery
        step = row_base  # w^{n2i}
        for _ in range(n1):
            tw[idx] = np.frombuffer(acc.to_bytes(32, "little"), "<u2").astype(np.uint32)
            acc = acc * step % R_SCALAR
            idx += 1
        row_base = row_base * w % R_SCALAR
    twiddle_fwd = tw.reshape(n2, n1, 16)

    twi = np.zeros((n2 * n1, 16), np.uint32)
    row_base = 1
    idx = 0
    for n2i in range(n2):
        acc = r_mont
        step = row_base
        for _ in range(n1):
            twi[idx] = np.frombuffer(acc.to_bytes(32, "little"), "<u2").astype(np.uint32)
            acc = acc * step % R_SCALAR
            idx += 1
        row_base = row_base * w_inv % R_SCALAR
    twiddle_inv = twi.reshape(n2, n1, 16)

    # natural j = k1 + n1*k2  ->  TD flat position k1*n2 + k2
    j = np.arange(n, dtype=np.int64)
    k1 = j % n1
    k2 = j // n1
    td_perm = (k1 * n2 + k2).astype(np.int32)

    coset_nat = _pow_table_np(fr_root_of_unity(2 * n), n)

    n_inv_mont = np.frombuffer(
        ((pow(n, -1, R_SCALAR) << 256) % R_SCALAR).to_bytes(32, "little"), "<u2"
    ).astype(np.uint32)

    return DistNTTPlan(
        n=n, n1=n1, n2=n2, n_devices=n_devices,
        tw1_fwd=_pow_table_np(w1, max(n1 // 2, 1)),
        tw1_inv=_pow_table_np(pow(w1, -1, R_SCALAR), max(n1 // 2, 1)),
        tw2_fwd=_pow_table_np(w2, max(n2 // 2, 1)),
        tw2_inv=_pow_table_np(pow(w2, -1, R_SCALAR), max(n2 // 2, 1)),
        bitrev1=_bitrev(n1),
        bitrev2=_bitrev(n2),
        twiddle_fwd=twiddle_fwd,
        twiddle_inv=twiddle_inv,
        n_inv=n_inv_mont,
        td_perm=td_perm,
        coset_nat=coset_nat,
    )


# ---------------------------------------------------------------------------
# shard_map-local bodies: blocks are (rows/D, cols, 16)
# ---------------------------------------------------------------------------


def _transpose_a2a(x_local: jnp.ndarray) -> jnp.ndarray:
    """(R/D, C, 16) row-shard -> (C/D, R, 16) row-shard of the transpose."""
    # split columns across devices, gather rows: -> (R, C/D, 16)
    y = jax.lax.all_to_all(
        x_local, SHARD_AXIS, split_axis=1, concat_axis=0, tiled=True
    )
    return jnp.swapaxes(y, 0, 1)


# NOTE: ntt_core_batched transforms axis -2. Local blocks are
# (rows, m, 16), so the transform runs along the full unsharded axis,
# independently per row — exactly what the batched core provides.


def fft_local_body(plan: DistNTTPlan, x_local, tw_local):
    """NAT block (n1/D, n2, 16) -> TD block, inside a shard_map context."""
    xt = _transpose_a2a(x_local)  # (n2/D, n1, 16) rows=n2
    a = ntt_ops.ntt_core_batched(
        xt, plan.tw1_fwd, plan.bitrev1, plan.n1, plan.log_n1
    )  # FFT over n1 (axis -2)
    b = fj.mont_mul(FR, a, tw_local)  # w^(n2*k1), block (n2/D, n1, 16)
    bt = _transpose_a2a(b)  # (n1/D, n2, 16) rows=k1
    return ntt_ops.ntt_core_batched(
        bt, plan.tw2_fwd, plan.bitrev2, plan.n2, plan.log_n2
    )  # FFT over n2 -> TD block


def ifft_local_body(plan: DistNTTPlan, y_local, twi_local):
    """TD block (n1/D, n2, 16) -> NAT block, inside a shard_map context."""
    a = ntt_ops.ntt_core_batched(
        y_local, plan.tw2_inv, plan.bitrev2, plan.n2, plan.log_n2
    )
    at = _transpose_a2a(a)  # (n2/D, n1, 16) rows=n2
    b = fj.mont_mul(FR, at, twi_local)
    c = ntt_ops.ntt_core_batched(
        b, plan.tw1_inv, plan.bitrev1, plan.n1, plan.log_n1
    )
    ct = _transpose_a2a(c)  # (n1/D, n2, 16) rows=n1, NAT
    return fj.mont_mul(FR, ct, jnp.asarray(plan.n_inv))


def make_dist_ntt(plan: DistNTTPlan, mesh):
    """Build jit-ready fft/ifft closures over global (n1, n2, 16) arrays."""
    from jax.sharding import PartitionSpec as P

    sp = P(SHARD_AXIS)

    def fft_body(x_local, tw_local):
        return fft_local_body(plan, x_local, tw_local)

    def ifft_body(y_local, twi_local):
        return ifft_local_body(plan, y_local, twi_local)

    fft_sm = shmap(fft_body, mesh=mesh, in_specs=(sp, sp), out_specs=sp)
    ifft_sm = shmap(ifft_body, mesh=mesh, in_specs=(sp, sp), out_specs=sp)

    tw_f = jnp.asarray(plan.twiddle_fwd)
    tw_i = jnp.asarray(plan.twiddle_inv)

    def fft_dist(x_nat):  # (n1, n2, 16) -> (n1, n2, 16) TD
        return fft_sm(x_nat, tw_f)

    def ifft_dist(y_td):
        return ifft_sm(y_td, tw_i)

    return fft_dist, ifft_dist


def witness_map_dist(
    plan: DistNTTPlan,
    mesh,
    a_rows_td, a_cols, a_vals,
    b_rows_td, b_cols, b_vals,
    assignment_mont,
    num_constraints: int,
    num_inputs: int,
    pub_positions_td,  # (num_inputs,) int32: TD flat slots for public inputs
):
    """CircomReduction witness map with distributed NTTs.

    Row ids must be pre-mapped to TD flat positions and re-sorted
    (host-side, once per key): the sparse evaluation then lands directly in
    the TD evaluation layout the distributed iFFT consumes. Output: HZ
    evaluations in TD flat order (pair with TD-permuted h_query points).
    """
    n, n1, n2 = plan.n, plan.n1, plan.n2

    a = ntt_ops.sparse_eval_impl(a_rows_td, a_cols, a_vals, assignment_mont, n)
    b = ntt_ops.sparse_eval_impl(b_rows_td, b_cols, b_vals, assignment_mont, n)
    a = a.at[pub_positions_td].set(assignment_mont[:num_inputs])
    c = fj.mont_mul(FR, a, b)

    fft_d, ifft_d = make_dist_ntt(plan, mesh)
    coset = jnp.asarray(plan.coset_nat).reshape(n1, n2, 16)

    def transform(v_td_flat):
        v = v_td_flat.reshape(n1, n2, 16)
        coeff_nat = ifft_d(v)
        shifted = fj.mont_mul(FR, coeff_nat, coset)
        return fft_d(shifted).reshape(n, 16)

    a2 = transform(a)
    b2 = transform(b)
    ab = fj.mont_mul(FR, a2, b2)
    c2 = transform(c)
    return fj.sub(FR, ab, c2)


# ---------------------------------------------------------------------------
# Fully-sharded witness map: per-device sparse eval + distributed NTTs in
# ONE shard_map body (no replicated stage left).
# ---------------------------------------------------------------------------


def partition_coo_td(
    plan: DistNTTPlan,
    rows_td: np.ndarray,  # sorted TD flat rows
    cols: np.ndarray,
    vals_mont: np.ndarray,  # (nnz, 16) uint32
    n_devices: int,
):
    """Split sorted TD COO into per-device blocks with LOCAL row indices.

    Device d owns TD flat rows [d*n/D, (d+1)*n/D) — contiguous because the
    TD matrix is row-sharded on k1. Entries are padded per device with
    zero-value entries (contribute nothing). Returns (D, nnz_max) int32
    rows/cols and (D, nnz_max, 16) uint32 values.
    """
    n = plan.n
    rows_per_dev = n // n_devices
    rows_td = np.asarray(rows_td)
    cols = np.asarray(cols)
    vals_mont = np.asarray(vals_mont)
    bounds = np.searchsorted(rows_td, np.arange(n_devices + 1) * rows_per_dev)
    counts = np.diff(bounds)
    nnz_max = max(int(counts.max()), 1)
    # Padding entries must keep the per-device row keys SORTED (the segment
    # reduction requires it): pad at the top row with zero values.
    r_out = np.full((n_devices, nnz_max), rows_per_dev - 1, np.int32)
    c_out = np.zeros((n_devices, nnz_max), np.int32)
    v_out = np.zeros((n_devices, nnz_max, 16), np.uint32)
    for d in range(n_devices):
        lo, hi = bounds[d], bounds[d + 1]
        k = hi - lo
        r_out[d, :k] = rows_td[lo:hi] - d * rows_per_dev
        c_out[d, :k] = cols[lo:hi]
        v_out[d, :k] = vals_mont[lo:hi]
    return jnp.asarray(r_out), jnp.asarray(c_out), jnp.asarray(v_out)


def make_sharded_witness_map(plan: DistNTTPlan, mesh, a_coo, b_coo):
    """Returns witness_map(assignment_mont) -> TD-flat (n, 16) HZ evals.

    a_coo/b_coo: partition_coo_td outputs. The public-input rows must have
    been folded into a_coo as (row=td(nc+i), col=i, value=1) entries —
    those rows have no matrix coefficients, so add == set.
    """
    from jax.sharding import PartitionSpec as P

    n, n1, n2 = plan.n, plan.n1, plan.n2
    D = int(mesh.shape[SHARD_AXIS])
    rows_local = n // D

    coset_sh = jnp.asarray(plan.coset_nat).reshape(n1, n2, 16)
    tw_f = jnp.asarray(plan.twiddle_fwd)
    tw_i = jnp.asarray(plan.twiddle_inv)

    def body(ar, ac, av, br, bc, bv, tw_fl, tw_il, coset_l, asg):
        # leading device axis of size 1 from the (D, ...) sharding
        ar, ac, av = ar[0], ac[0], av[0]
        br, bc, bv = br[0], bc[0], bv[0]
        a = ntt_ops.sparse_eval_impl(ar, ac, av, asg, rows_local)
        b = ntt_ops.sparse_eval_impl(br, bc, bv, asg, rows_local)
        a = a.reshape(n1 // D, n2, 16)
        b = b.reshape(n1 // D, n2, 16)
        c = fj.mont_mul(FR, a, b)

        def transform(v_td):
            coeff_nat = ifft_local_body(plan, v_td, tw_il)
            shifted = fj.mont_mul(FR, coeff_nat, coset_l)
            return fft_local_body(plan, shifted, tw_fl)

        a2 = transform(a)
        b2 = transform(b)
        ab = fj.mont_mul(FR, a2, b2)
        c2 = transform(c)
        return fj.sub(FR, ab, c2)

    sp = P(SHARD_AXIS)
    sp_coo = P(SHARD_AXIS)  # (D, nnz_max[, 16]) split on the device axis
    fn = shmap(
        body,
        mesh=mesh,
        in_specs=(sp_coo, sp_coo, sp_coo, sp_coo, sp_coo, sp_coo, sp, sp, sp, P()),
        out_specs=sp,
    )

    def witness_map(assignment_mont):
        out = fn(*a_coo, *b_coo, tw_f, tw_i, coset_sh, assignment_mont)
        return out.reshape(n, 16)

    return witness_map
