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


def _power_table(w: int, n: int, scale: int = 1) -> np.ndarray:
    """[scale*w^0, ..., scale*w^(n-1)] Montgomery, as (n, 16) uint32.

    Pure-host build (Python bigint chain + one frombuffer) — issuing no
    device ops keeps plan construction compile-free; the tables embed as
    constants in the jitted NTT graphs.
    """
    r = (1 << 256) % R_SCALAR
    acc = r * scale % R_SCALAR  # scale in Montgomery form
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

    # Limb-major variants for the Pallas witness-map pipeline, where the
    # coset multiply happens on bit-reversed-order coefficients (DIF
    # output): position p holds coeff rev(p), so it takes coset[rev(p)].
    @property
    def tw_fwd_lm(self):
        return np.ascontiguousarray(self.tw_fwd.T)

    @property
    def tw_inv_lm(self):
        return np.ascontiguousarray(self.tw_inv.T)

    @property
    def coset_bitrev_lm(self):
        return np.ascontiguousarray(self.coset[self.bitrev].T)

    @property
    def coset_inv_bitrev_lm(self):
        """Bitrev-permuted coset table with the iFFT's 1/n scale folded in.
        The flat witness-map path multiplies this into DIF output (which is
        bit-reversed and still lacks the n_inv factor) inside the adjacent
        fused DIT kernel — no standalone n_inv/coset passes."""
        root_2n = fr_root_of_unity(2 * self.n)
        tbl = _power_table(root_2n, self.n, scale=pow(self.n, -1, R_SCALAR))
        return np.ascontiguousarray(tbl[self.bitrev].T)

    # ---- single-chip four-step tables (limb-major) -----------------------
    # n = n1*n2; the iFFT runs F = [T; DIF rows n1; TW; T; DIF rows n2]
    # (natural in, pi out with pi(a, b) -> coeff rev1(a) + n1*rev2(b)); the
    # FFT runs F^T = [DIT rows n2; T; TW; DIT rows n1; T] (pi in, natural
    # out) — valid because a DIT stage matrix is the transpose of the DIF
    # stage matrix with the same twiddles and the DFT matrix is symmetric.
    @property
    def n1(self):
        return 1 << (self.log_n // 2)

    @property
    def n2(self):
        return self.n // self.n1

    def _rev(self, m):
        log_m = m.bit_length() - 1
        idx = np.arange(m, dtype=np.int64)
        rev = np.zeros(m, dtype=np.int64)
        for b in range(log_m):
            rev |= ((idx >> b) & 1) << (log_m - 1 - b)
        return rev

    def _t3(self, inverse: bool) -> np.ndarray:
        """(16, n) flat twiddle for the middle step, (j2, rev-k1) layout.

        The inverse table carries the 1/n scale folded in (scaling commutes
        with the second linear row transform), so the iFFT needs no
        separate n_inv pass."""
        n1, n2 = self.n1, self.n2
        root = fr_root_of_unity(self.n)
        w = pow(root, -1, R_SCALAR) if inverse else root
        scale = pow(self.n, -1, R_SCALAR) if inverse else 1
        rev1 = self._rev(n1)
        tbl = _power_table(w, self.n, scale)  # scale * w^t
        j2 = np.arange(n2)[:, None]
        k1 = rev1[None, :]
        idx = (j2 * k1) % self.n  # (n2, n1)
        return np.ascontiguousarray(tbl[idx.reshape(-1)].T)

    @property
    def t3_fwd_lm(self):
        return self._t3(False)

    @property
    def t3_inv_lm(self):
        return self._t3(True)

    @property
    def coset4_lm(self):
        """coset table permuted to the four-step pi order: position
        p = a*n2 + b holds coset[rev1(a) + n1*rev2(b)]."""
        n1, n2 = self.n1, self.n2
        rev1, rev2 = self._rev(n1), self._rev(n2)
        a = np.arange(n1)[:, None]
        b = np.arange(n2)[None, :]
        idx = rev1[a] + n1 * rev2[b]  # (n1, n2)
        return np.ascontiguousarray(self.coset[idx.reshape(-1)].T)

    def _row_table(self, m: int, inverse: bool) -> np.ndarray:
        root = fr_root_of_unity(self.n)
        w = pow(root, self.n // m, R_SCALAR)  # m-th root
        if inverse:
            w = pow(w, -1, R_SCALAR)
        return np.ascontiguousarray(_power_table(w, max(m // 2, 1)).T)

    @property
    def tw1_fwd_lm(self):
        return self._row_table(self.n1, False)

    @property
    def tw1_inv_lm(self):
        return self._row_table(self.n1, True)

    @property
    def tw2_fwd_lm(self):
        return self._row_table(self.n2, False)

    @property
    def tw2_inv_lm(self):
        return self._row_table(self.n2, True)


def ntt_core_batched(
    x: jnp.ndarray, table, bitrev, n: int, log_n: int
) -> jnp.ndarray:
    """Iterative radix-2 butterflies along axis -2 of (..., n, 16) input.

    `table` is the (n/2, 16) twiddle table for the chosen direction;
    `bitrev` the (n,) permutation. Shared by the single-chip NTT and the
    local stages of the four-step distributed NTT (parallel/ntt_sharded.py).

    (This row-major form is the CPU/ground-truth path; the TPU witness map
    runs the limb-major Pallas pipeline below — per-stage Pallas calls in
    THIS layout measured slower than XLA because of the (N,16)<->(16,N)
    relayouts around every kernel.)
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
        v = xm[..., half:, :]
        t = fj.mont_mul(FR, v, tw)
        x = jnp.concatenate(
            [fj.add(FR, u, t), fj.sub(FR, u, t)], axis=-2
        ).reshape(batch + (n, 16))
    return x


# ---------------------------------------------------------------------------
# Limb-major Pallas NTT pipeline (TPU witness-map path)
#
# Arrays are (16, n) end-to-end: no per-stage relayouts. The iFFTs run
# decimation-in-frequency (natural in, bit-reversed out) and the FFTs
# decimation-in-time (bit-reversed in, natural out), so the bit-reversal
# permutations between them CANCEL; the coset table is pre-permuted by
# bitrev on the host instead (NTTPlan.coset_bitrev). Values ride the lazy
# [0, 2p) representation (ops/field_pallas.py).
# ---------------------------------------------------------------------------


def _stage_slices(x_lm, n, half):
    length = half * 2
    xm = x_lm.reshape(16, n // length, length)
    u = xm[..., :half].reshape(16, n // 2)
    v = xm[..., half:].reshape(16, n // 2)
    return u, v


def _stage_merge(o1, o2, n, half):
    length = half * 2
    a = o1.reshape(16, n // length, half)
    b = o2.reshape(16, n // length, half)
    return jnp.concatenate([a, b], axis=-1).reshape(16, n)


def _stage_tw(table_lm, n, half):
    """(16, half) stage twiddles broadcast to (16, n/2) flat lanes."""
    stride = n // (half * 2)
    tw = table_lm[:, ::stride][:, :half]  # (16, half)
    return jnp.broadcast_to(
        tw[:, None, :], (16, n // (half * 2), half)
    ).reshape(16, n // 2)


LOW_BLOCK = 512  # lanes per fused low-stage kernel block

# Mosaic requires lane-block sizes of >= 128 (or the full array), so the
# four-step row kernels need both factors >= 128: n >= 128*128.
FOUR_STEP_MIN = 1 << 14


def _low_tw_stack(table_lm, n: int, n_low: int, block: int) -> jnp.ndarray:
    """(n_low, 16, block) per-lane twiddles for the fused low-stage kernel:
    stage s, lane l -> table[(l % 2^s) * (n / 2^(s+1))]."""
    lanes = np.arange(block)
    rows = []
    for s in range(n_low):
        half = 1 << s
        stride = n // (half * 2)
        idx = (lanes % half) * stride
        rows.append(table_lm[:, jnp.asarray(idx)])
    return jnp.stack(rows, axis=0)


def ntt_lm_dit(
    x_lm: jnp.ndarray, table_lm, n: int, log_n: int, pre_lm=None
) -> jnp.ndarray:
    """(16, n) limb-major DIT butterflies: bit-reversed input -> natural.

    Stages with length <= LOW_BLOCK run fused in ONE kernel (lane-roll
    pairing in VMEM, field_pallas.ntt_low_stages_lm); the remaining high
    stages are one butterfly kernel each over sliced halves. pre_lm: an
    optional (16, n) elementwise Montgomery multiplier fused into the
    first kernel (the witness map's coset table rides here)."""
    from . import field_pallas as fp

    block = min(LOW_BLOCK, n)
    n_low = min(log_n, block.bit_length() - 1)
    tw_stack = _low_tw_stack(table_lm, n, n_low, block)
    x_lm = fp.ntt_low_stages_lm(x_lm, tw_stack, n_low, False, block,
                                pre_lm=pre_lm)
    for s in range(n_low, log_n):
        half = 1 << s
        u, v = _stage_slices(x_lm, n, half)
        tw = _stage_tw(table_lm, n, half)
        o1, o2 = fp.fr_butterfly_lm(u, v, tw, dif=False)
        x_lm = _stage_merge(o1, o2, n, half)
    return x_lm


def ntt_lm_dif(x_lm: jnp.ndarray, table_lm, n: int, log_n: int) -> jnp.ndarray:
    """(16, n) limb-major DIF butterflies: natural input -> bit-reversed."""
    from . import field_pallas as fp

    block = min(LOW_BLOCK, n)
    n_low = min(log_n, block.bit_length() - 1)
    for s in range(log_n - 1, n_low - 1, -1):
        half = 1 << s
        u, v = _stage_slices(x_lm, n, half)
        tw = _stage_tw(table_lm, n, half)
        o1, o2 = fp.fr_butterfly_lm(u, v, tw, dif=True)
        x_lm = _stage_merge(o1, o2, n, half)
    tw_stack = _low_tw_stack(table_lm, n, n_low, block)
    return fp.ntt_low_stages_lm(x_lm, tw_stack, n_low, True, block)


def _ntt_core(plan: NTTPlan, x: jnp.ndarray, table) -> jnp.ndarray:
    return ntt_core_batched(x, table, plan.bitrev, plan.n, plan.log_n)


def fft(plan: NTTPlan, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations [p(w^0), p(w^1), ...] (Montgomery in/out)."""
    return _ntt_core(plan, coeffs, plan.tw_fwd)


def ifft(plan: NTTPlan, evals: jnp.ndarray) -> jnp.ndarray:
    out = _ntt_core(plan, evals, plan.tw_inv)
    return fj.mont_mul(FR, out, jnp.asarray(plan.n_inv))


def coset_shift(plan: NTTPlan, coeffs: jnp.ndarray) -> jnp.ndarray:
    """coeffs[i] *= g^i with g the 2n-th root of unity — arkworks'
    distribute_powers (reference: src/circom/qap.rs:69-70)."""
    return fj.mont_mul(FR, coeffs, jnp.asarray(plan.coset))


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
    from . import field_pallas as fp

    # values may arrive as uint16 (compact zkey-width staging) — widen here.
    values_mont = values_mont.astype(jnp.uint32)
    zero = jnp.zeros(16, jnp.uint32)
    if fp.use_pallas():
        prods = fp.fr_mul(values_mont, assignment_mont[cols])
        return segments.reduce_by_sorted_key(
            fp.fr_add, prods, rows_sorted, num_rows, zero,
            tile_scan=fp.fr_tile_scan, tile_scan_general=fp.fr_tile_scan,
        )
    prods = fj.mont_mul(FR, values_mont, assignment_mont[cols])
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

    return witness_map_from_ab(plan, a, b)


def witness_map_from_ab(plan, a, b):
    """The 6-transform tail of the witness map given the A/B evaluation
    vectors (Montgomery). Split out so >HBM provers can run the sparse
    eval and the transforms as SEPARATE donated jits — one fused 2^24
    witness graph wants 16.37 GB of HBM (round-5 streamed-2^24 OOM)."""
    from . import field_pallas as fp

    n = plan.n
    if fp.use_pallas() and n >= 1024:
        return _witness_map_transforms_lm(plan, a, b)

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


def _witness_map_transforms_lm(plan, a, b):
    """The 6-transform + pointwise tail of the witness map, limb-major on
    Pallas. Domains >= FOUR_STEP_MIN use the four-step factorization with
    every pointwise pass fused into an adjacent row kernel:

      - c = a∘b rides the first iNTT kernel of the c chain (pre-multiply),
      - t3_inv (with 1/n folded) rides the n1 iNTT kernel (post-multiply),
      - the tail n2 iNTT stages + coset multiply + head n2 NTT stages
        share ONE kernel (they sit in the same pi-order layout),
      - t3_fwd rides the final n1 NTT kernel (pre-multiply),
      - ab = a∘b rides the b chain's final kernel (post-multiply), and
        ab - c rides the c chain's final kernel (post-subtract),

    so each transform is 3 row kernels + 3 lane transposes and the whole
    map issues ONE final transpose — no standalone pointwise passes.
    Smaller domains use the flat DIF/DIT chain with the n_inv-folded coset
    table fused into the first DIT kernel. Output is lazy [0, 2p)."""
    from . import field_pallas as fp

    n, log_n = plan.n, plan.log_n
    a_lm = a.T
    b_lm = b.T

    if n >= FOUR_STEP_MIN:
        n1, n2 = plan.n1, plan.n2
        log1, log2 = n1.bit_length() - 1, n2.bit_length() - 1
        tw1i = _low_tw_stack(jnp.asarray(plan.tw1_inv_lm), n1, log1, n1)
        tw2i = _low_tw_stack(jnp.asarray(plan.tw2_inv_lm), n2, log2, n2)
        tw1f = _low_tw_stack(jnp.asarray(plan.tw1_fwd_lm), n1, log1, n1)
        tw2f = _low_tw_stack(jnp.asarray(plan.tw2_fwd_lm), n2, log2, n2)
        t3i = jnp.asarray(plan.t3_inv_lm)
        t3f = jnp.asarray(plan.t3_fwd_lm)
        coset4 = jnp.asarray(plan.coset4_lm)

        def t_n1major(x):  # natural -> n1-fastest (iFFT entry / FFT mid)
            return jnp.swapaxes(x.reshape(16, n1, n2), 1, 2).reshape(16, n)

        def t_n2major(x):  # n1-fastest -> n2-fastest (iFFT mid / FFT exit)
            return jnp.swapaxes(x.reshape(16, n2, n1), 1, 2).reshape(16, n)

        aT = t_n1major(a_lm)
        bT = t_n1major(b_lm)

        def half_chain(xT, pre0=None):
            # iFFT rows(n1) [+ c-formation pre, + t3_inv post] -> transpose
            # -> [iFFT rows(n2) + coset + FFT rows(n2)] -> transpose;
            # result awaits the final rows(n1) FFT kernel.
            x = fp.ntt_low_stages_lm(xT, tw1i, log1, True, n1,
                                     pre_lm=pre0, post_lm=t3i)
            x = t_n2major(x)
            x = fp.ntt_mid_stages_lm(x, tw2i, tw2f, coset4, log2, log2, n2)
            return t_n1major(x)

        a5 = half_chain(aT)
        b5 = half_chain(bT)
        c5 = half_chain(bT, pre0=aT)  # transpose(c) = transpose(a)∘transpose(b)

        a6 = fp.ntt_low_stages_lm(a5, tw1f, log1, False, n1, pre_lm=t3f)
        ab6 = fp.ntt_low_stages_lm(b5, tw1f, log1, False, n1,
                                   pre_lm=t3f, post_lm=a6)
        res = fp.ntt_low_stages_lm(c5, tw1f, log1, False, n1,
                                   pre_lm=t3f, post_lm=ab6, post_op="sub")
        # lazy [0, 2p); consumers canonicalize (fr_from_mont)
        return t_n2major(res).T

    tw_inv_lm = jnp.asarray(plan.tw_inv_lm)
    tw_fwd_lm = jnp.asarray(plan.tw_fwd_lm)
    coset_inv_lm = jnp.asarray(plan.coset_inv_bitrev_lm)

    def ifft_coset_fft(x_lm):
        x_lm = ntt_lm_dif(x_lm, tw_inv_lm, n, log_n)  # bitrev coeffs
        # n_inv + coset (bitrev order) fused into the first DIT kernel
        return ntt_lm_dit(x_lm, tw_fwd_lm, n, log_n, pre_lm=coset_inv_lm)

    c_lm = fp.fr_mul_lm(a_lm, b_lm)
    a_lm = ifft_coset_fft(a_lm)
    b_lm = ifft_coset_fft(b_lm)
    ab_lm = fp.fr_mul_lm(a_lm, b_lm)
    c_lm = ifft_coset_fft(c_lm)

    # lazy [0, 2p); consumers canonicalize (fr_from_mont)
    return fp.fr_sub_lm(ab_lm, c_lm).T


# jit public entry points (plan/sizes static; eager callers get cached kernels)
fft_impl, ifft_impl, coset_shift_impl = fft, ifft, coset_shift
sparse_eval_impl, witness_map_impl = sparse_eval, witness_map
fft = jax.jit(fft_impl, static_argnums=0)
ifft = jax.jit(ifft_impl, static_argnums=0)
coset_shift = jax.jit(coset_shift_impl, static_argnums=0)
sparse_eval = jax.jit(sparse_eval_impl, static_argnums=(4,))
witness_map = jax.jit(witness_map_impl, static_argnums=(0, 8, 9))
