"""Pallas-fused batched Fr field ops: the witness-map compute path.

The witness map (sparse eval + 6 NTTs + pointwise products, ops/ntt.py —
reference: src/circom/qap.rs:23-88) was built on the XLA-composed
field_jax ops, whose fori-loop CIOS keeps every multiply's loop state in
HBM. At the 2^20 domain that made the witness map a multi-second term
next to sub-1.5s MSMs. These kernels run the same limb-major lazy field
ops as the MSM combines (ops/field_lm.py) inside single pallas_calls:

  fr_mul(a, b)            — elementwise Montgomery product, lazy [0, 2p)
  fr_mul_col(c16, x)      — broadcast single-element constant multiply
  fr_butterfly(u, v, tw)  — (u + tw*v, u - tw*v), ONE kernel per NTT stage
  fr_add / fr_sub         — elementwise add/sub mod* 2p
  fr_tile_scan            — fused Phase-A executor for field segment sums
                            (segments.segmented_scan / reduce_by_sorted_key)

All values flow in the lazy [0, 2p) representation; canonicalize with
fr_canon (a fully-reduced Montgomery multiply by the Montgomery one —
value-preserving, restores < p) or fr_from_mont before any consumer that
inspects limbs (digit extraction, serialization).

Fr satisfies r < 2^254 = R/4, so the lazy-CIOS closure argument of
field_lm.mont_mul_lazy applies unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import R_SCALAR
from . import field_jax as fj
from . import field_lm as flm
from . import limbs as limb_codec

# (16, 5) Fr constant table: p, 2^256 - p, 2p, 2^256 - 2p, R mod p (one).
FR_CONSTS_LM = np.stack(
    [
        fj.FR.p_limbs,
        fj.FR.pc_limbs,
        limb_codec.int_to_limbs(2 * R_SCALAR),
        limb_codec.int_to_limbs((1 << 256) - 2 * R_SCALAR),
        fj.FR.one_mont,
    ],
    axis=1,
)

LANE_BLOCK = 512
_NPRIME = fj.FR.nprime


def _cols(consts, lanes):
    col = lambda j: jnp.broadcast_to(consts[:, j : j + 1], (16, lanes))
    return col(0), col(1), col(2), col(3)


def _bin_kernel(op: str):
    def kernel(consts, a, b, o):
        p, pc, p2, p2c = _cols(consts, a.shape[-1])
        if op == "mul":
            o[:] = flm.mont_mul_lazy(p, _NPRIME, a[:], b[:])
        elif op == "mul_canon":
            o[:] = flm.mont_mul(p, pc, _NPRIME, a[:], b[:])
        elif op == "add":
            o[:] = flm.add_lazy(p2c, a[:], b[:])
        elif op == "sub":
            o[:] = flm.sub_lazy(p2, p2c, a[:], b[:])
        else:  # pragma: no cover
            raise ValueError(op)

    return kernel


@partial(jax.jit, static_argnums=(0, 3))
def _bin_blocked(op, a_lm, b_lm, block):
    m = a_lm.shape[-1]
    bs = pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_c = pl.BlockSpec((16, 5), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bin_kernel(op),
        grid=(m // block,),
        in_specs=[bs_c, bs, bs],
        out_specs=bs,
        out_shape=jax.ShapeDtypeStruct((16, m), jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FR_CONSTS_LM), a_lm, b_lm)


def _to_lm(x, block):
    """(..., 16) -> (16, M_padded); returns (lm, lead_shape, m)."""
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x = jnp.broadcast_to(x, lead + (16,)).reshape(m, 16)
    pad = (-m) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 16), jnp.uint32)], axis=0)
    return x.T, lead, m


def _from_lm(o, lead, m):
    return o.T[:m].reshape(lead + (16,))


def _binary(op, a, b, block=LANE_BLOCK):
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a.astype(jnp.uint32), shape)
    b = jnp.broadcast_to(b.astype(jnp.uint32), shape)
    a_lm, lead, m = _to_lm(a, block)
    b_lm, _, _ = _to_lm(b, block)
    o = _bin_blocked(op, a_lm, b_lm, min(block, a_lm.shape[-1]))
    return _from_lm(o, lead, m)


def fr_mul(a, b):
    """Elementwise Montgomery product over (..., 16) limbs, lazy output."""
    return _binary("mul", a, b)


def fr_mul_canon(a, b):
    """Montgomery product with full reduction: output < p (canonical)."""
    return _binary("mul_canon", a, b)


def fr_add(a, b):
    return _binary("add", a, b)


def fr_sub(a, b):
    return _binary("sub", a, b)


def fr_canon(x):
    """Canonicalize lazy limbs to [0, p): multiply by one (Montgomery) with
    the fully-reduced kernel — value-preserving ((x·R)·R^-1 = x)."""
    one = jnp.broadcast_to(jnp.asarray(fj.FR.one_mont, jnp.uint32), x.shape)
    return _binary("mul_canon", x, one)


# ---------------------------------------------------------------------------
# NTT butterfly: (u, v, tw) -> (u + tw*v, u - tw*v) in one kernel
# ---------------------------------------------------------------------------


def _butterfly_kernel(consts, u, v, tw, o1, o2):
    p, pc, p2, p2c = _cols(consts, u.shape[-1])
    t = flm.mont_mul_lazy(p, _NPRIME, tw[:], v[:])
    o1[:] = flm.add_lazy(p2c, u[:], t)
    o2[:] = flm.sub_lazy(p2, p2c, u[:], t)


def _butterfly_dif_kernel(consts, u, v, tw, o1, o2):
    """Gentleman-Sande: (u, v) -> (u + v, (u - v) * tw)."""
    p, pc, p2, p2c = _cols(consts, u.shape[-1])
    o1[:] = flm.add_lazy(p2c, u[:], v[:])
    d = flm.sub_lazy(p2, p2c, u[:], v[:])
    o2[:] = flm.mont_mul_lazy(p, _NPRIME, tw[:], d)


@partial(jax.jit, static_argnums=(3,))
def _butterfly_blocked(u_lm, v_lm, tw_lm, block):
    m = u_lm.shape[-1]
    bs = pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_c = pl.BlockSpec((16, 5), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _butterfly_kernel,
        grid=(m // block,),
        in_specs=[bs_c, bs, bs, bs],
        out_specs=(bs, bs),
        out_shape=(
            jax.ShapeDtypeStruct((16, m), jnp.uint32),
            jax.ShapeDtypeStruct((16, m), jnp.uint32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FR_CONSTS_LM), u_lm, v_lm, tw_lm)


def fr_butterfly(u, v, tw, block=LANE_BLOCK):
    """Radix-2 butterfly over (..., 16) arrays (tw broadcastable to u)."""
    shape = jnp.broadcast_shapes(u.shape, v.shape, tw.shape)
    u = jnp.broadcast_to(u.astype(jnp.uint32), shape)
    v = jnp.broadcast_to(v.astype(jnp.uint32), shape)
    tw = jnp.broadcast_to(tw.astype(jnp.uint32), shape)
    u_lm, lead, m = _to_lm(u, block)
    v_lm, _, _ = _to_lm(v, block)
    tw_lm, _, _ = _to_lm(tw, block)
    o1, o2 = _butterfly_blocked(u_lm, v_lm, tw_lm, min(block, u_lm.shape[-1]))
    return _from_lm(o1, lead, m), _from_lm(o2, lead, m)


# ---------------------------------------------------------------------------
# Fused within-tile segmented scan for field ADD (sparse_eval segment sums)
# ---------------------------------------------------------------------------


def _tile_scan_kernel(K: int):
    def kernel(consts, v, flags, o, c):
        lanes = v.shape[-1]
        _, _, _, p2c = _cols(consts, lanes)
        acc0 = jnp.zeros((16, lanes), jnp.uint32)

        def step(k, acc):
            vk = v[k]
            fmask = flags[k] != 0  # (1, lanes)
            merged = flm.add_lazy(p2c, acc, vk)
            acc = jnp.where(fmask, vk, merged)
            o[k] = acc
            return acc

        c[:] = jax.lax.fori_loop(0, K, step, acc0)

    return kernel


@partial(jax.jit, static_argnums=(2, 3))
def _tile_scan_blocked(v_flat, flags, t, block):
    K = v_flat.shape[0]
    bs_v = pl.BlockSpec(
        (K, 16, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    bs_f = pl.BlockSpec((K, 1, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    bs_carry = pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_c = pl.BlockSpec((16, 5), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _tile_scan_kernel(K),
        grid=(t // block,),
        in_specs=[bs_c, bs_v, bs_f],
        out_specs=(bs_v, bs_carry),
        out_shape=(
            jax.ShapeDtypeStruct((K, 16, t), jnp.uint32),
            jax.ShapeDtypeStruct((16, t), jnp.uint32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FR_CONSTS_LM), v_flat, flags)


def fr_tile_scan(vt, ft, block=LANE_BLOCK):
    """segments.segmented_scan Phase-A executor for (T, K, 16) field rows.

    Drop-in for the tile_scan/tile_scan_general hooks with the field-add
    combine (sparse constraint evaluation, ops/ntt.sparse_eval)."""
    T, K = ft.shape
    pad = (-T) % block
    tp = T + pad
    v = vt.astype(jnp.uint32)
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, K, 16), jnp.uint32)], axis=0)
    v_flat = jnp.transpose(v, (1, 2, 0))  # (K, 16, T)
    f = ft.astype(jnp.int32)
    if pad:
        f = jnp.concatenate([f, jnp.ones((pad, K), jnp.int32)], axis=0)
    f = jnp.transpose(f, (1, 0))[:, None, :]  # (K, 1, T)
    out_km, carry_km = _tile_scan_blocked(v_flat, f, tp, min(block, tp))
    out = jnp.transpose(out_km, (2, 0, 1))[:T]  # (T, K, 16)
    carry = jnp.moveaxis(carry_km, -1, 0)[:T]
    return out, carry


# ---------------------------------------------------------------------------
# Limb-major entry points (NO per-call transposes): arrays are (16, M).
# The witness-map NTT pipeline stays in this layout end-to-end — the
# (N, 16) <-> (16, N) relayouts around each small kernel were the dominant
# per-stage cost of the row-major path.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(3, 4))
def _butterfly_lm_blocked(u_lm, v_lm, tw_lm, dif, block):
    m = u_lm.shape[-1]
    bs = pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_c = pl.BlockSpec((16, 5), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _butterfly_dif_kernel if dif else _butterfly_kernel,
        grid=(m // block,),
        in_specs=[bs_c, bs, bs, bs],
        out_specs=(bs, bs),
        out_shape=(
            jax.ShapeDtypeStruct((16, m), jnp.uint32),
            jax.ShapeDtypeStruct((16, m), jnp.uint32),
        ),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FR_CONSTS_LM), u_lm, v_lm, tw_lm)


def fr_butterfly_lm(u_lm, v_lm, tw_lm, dif=False, block=LANE_BLOCK):
    """(16, M) limb-major butterfly; M a power-of-two multiple of block or
    smaller than it."""
    m = u_lm.shape[-1]
    return _butterfly_lm_blocked(u_lm, v_lm, tw_lm, dif, min(block, m))


def fr_mul_lm(a_lm, b_lm, block=LANE_BLOCK, canon=False):
    m = a_lm.shape[-1]
    return _bin_blocked("mul_canon" if canon else "mul", a_lm, b_lm, min(block, m))


def fr_sub_lm(a_lm, b_lm, block=LANE_BLOCK):
    m = a_lm.shape[-1]
    return _bin_blocked("sub", a_lm, b_lm, min(block, m))


def _stage_loop(x, tw_ref, n_stages, dif, lane, p, p2, p2c):
    """All NTT stages with length <= block over one VMEM-resident block.

    Butterfly partners sit within the same lane block, so each stage is a
    pair of lane-rolls + selects + one multiply — entirely in VMEM. The
    per-stage, per-lane twiddle vectors are precomputed (16, block) inputs
    (same for every block: twiddles depend only on lane % half).
    DIT runs stages ascending (half = 1, 2, ..), DIF descending.
    """
    order = range(n_stages) if not dif else range(n_stages - 1, -1, -1)
    for s_i in order:
        half = 1 << s_i
        tw = tw_ref[s_i]
        bit = (lane & np.uint32(half)) != 0
        r1 = jnp.roll(x, half, axis=1)   # r1[l] = x[l - half]
        r2 = jnp.roll(x, -half, axis=1)  # r2[l] = x[l + half]
        if dif:
            # u: x + r2 ; v: (r1 - x) * tw
            t = flm.mont_mul_lazy(p, _NPRIME, tw, flm.sub_lazy(p2, p2c, r1, x))
            x = jnp.where(bit, t, flm.add_lazy(p2c, x, r2))
        else:
            # u: x + tw*r2 ; v: r1 - tw*x
            m_in = jnp.where(bit, x, r2)
            t = flm.mont_mul_lazy(p, _NPRIME, tw, m_in)
            x = jnp.where(
                bit, flm.sub_lazy(p2, p2c, r1, t), flm.add_lazy(p2c, x, t)
            )
    return x


def _ntt_low_kernel(n_stages: int, dif: bool, block: int,
                    has_pre: bool = False, post_op: str | None = None):
    """Fused low-stage NTT kernel with optional elementwise pre-multiply
    and post-multiply/subtract riding the same VMEM residency (the
    standalone coset/t3/ab/sub passes each cost a full HBM read+write)."""

    def kernel(consts, x_ref, tw_ref, *rest):
        p, pc, p2, p2c = _cols(consts, block)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (16, block), 1)
        x = x_ref[:]
        i = 0
        if has_pre:
            x = flm.mont_mul_lazy(p, _NPRIME, rest[i][:], x)
            i += 1
        x = _stage_loop(x, tw_ref, n_stages, dif, lane, p, p2, p2c)
        if post_op == "mul":
            x = flm.mont_mul_lazy(p, _NPRIME, rest[i][:], x)
            i += 1
        elif post_op == "sub":
            # post - x (the witness map's final ab - c)
            x = flm.sub_lazy(p2, p2c, rest[i][:], x)
            i += 1
        rest[i][:] = x

    return kernel


@partial(jax.jit, static_argnames=("n_stages", "dif", "block", "post_op"))
def ntt_low_stages_lm(x_lm, tw_stack, n_stages, dif, block=LANE_BLOCK,
                      pre_lm=None, post_lm=None, post_op="mul"):
    """x_lm (16, M); tw_stack (n_stages, 16, block) per-stage lane twiddles.

    pre_lm: optional (16, M) elementwise Montgomery multiplier applied to
    the input before stage 0; post_lm: applied to the output after the
    last stage (post_op="mul"), or subtracted FROM (post_op="sub":
    out = post - x)."""
    m = x_lm.shape[-1]
    block = min(block, m)
    bs = pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_tw = pl.BlockSpec(
        (n_stages, 16, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bs_c = pl.BlockSpec((16, 5), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [bs_c, bs, bs_tw]
    operands = [jnp.asarray(FR_CONSTS_LM), x_lm, tw_stack]
    if pre_lm is not None:
        in_specs.append(bs)
        operands.append(pre_lm)
    if post_lm is not None:
        in_specs.append(bs)
        operands.append(post_lm)
    return pl.pallas_call(
        _ntt_low_kernel(n_stages, dif, block, pre_lm is not None,
                        post_op if post_lm is not None else None),
        grid=(m // block,),
        in_specs=in_specs,
        out_specs=bs,
        out_shape=jax.ShapeDtypeStruct((16, m), jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(*operands)


def _ntt_mid_kernel(n_inv_stages: int, n_fwd_stages: int, block: int):
    """Four-step middle kernel: the tail iNTT stages, the coset multiply,
    and the head forward-NTT stages of the witness map's iFFT->coset->FFT
    composition share one VMEM residency (they operate in the same
    pi-order layout with no transpose between them)."""

    def kernel(consts, x_ref, twi_ref, twf_ref, mid_ref, o_ref):
        p, pc, p2, p2c = _cols(consts, block)
        lane = jax.lax.broadcasted_iota(jnp.uint32, (16, block), 1)
        x = x_ref[:]
        x = _stage_loop(x, twi_ref, n_inv_stages, True, lane, p, p2, p2c)
        x = flm.mont_mul_lazy(p, _NPRIME, mid_ref[:], x)
        x = _stage_loop(x, twf_ref, n_fwd_stages, False, lane, p, p2, p2c)
        o_ref[:] = x

    return kernel


@partial(jax.jit, static_argnames=("n_inv_stages", "n_fwd_stages", "block"))
def ntt_mid_stages_lm(x_lm, twi_stack, twf_stack, mid_lm,
                      n_inv_stages, n_fwd_stages, block):
    """Inverse low stages -> elementwise multiply by mid_lm -> forward low
    stages, all in one kernel. x_lm (16, M); stacks (n_stages, 16, block);
    mid_lm (16, M)."""
    m = x_lm.shape[-1]
    block = min(block, m)
    bs = pl.BlockSpec((16, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bs_twi = pl.BlockSpec(
        (n_inv_stages, 16, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bs_twf = pl.BlockSpec(
        (n_fwd_stages, 16, block), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bs_c = pl.BlockSpec((16, 5), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ntt_mid_kernel(n_inv_stages, n_fwd_stages, block),
        grid=(m // block,),
        in_specs=[bs_c, bs, bs_twi, bs_twf, bs],
        out_specs=bs,
        out_shape=jax.ShapeDtypeStruct((16, m), jnp.uint32),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FR_CONSTS_LM), x_lm, twi_stack, twf_stack, mid_lm)


def fr_mul_const_lm(c16, x_lm, block=LANE_BLOCK):
    """Multiply every lane by one constant element c16 ((16,) limbs).

    The constant must be the FIRST kernel operand: mont_mul slices 1-limb
    rows from the second, and slicing a broadcast column folds to a
    sublane+lane double broadcast Mosaic cannot lower."""
    c = jnp.broadcast_to(
        jnp.asarray(c16, jnp.uint32).reshape(16, 1), x_lm.shape
    )
    m = x_lm.shape[-1]
    return _bin_blocked("mul", c, x_lm, min(block, m))


def fr_to_mont(x):
    """Plain canonical limbs -> Montgomery (lazy output is fine: consumers
    are multiplies)."""
    r2 = jnp.broadcast_to(jnp.asarray(fj.FR.r2_limbs, jnp.uint32), x.shape)
    return _binary("mul", x, r2)


def fr_from_mont(x):
    """Montgomery (possibly lazy) -> plain CANONICAL limbs < p — safe for
    digit extraction / serialization."""
    one = jnp.zeros(x.shape[:-1] + (16,), jnp.uint32).at[..., 0].set(1)
    return _binary("mul_canon", x, one)


def use_pallas() -> bool:
    return jax.default_backend() != "cpu"
