"""Pallas-fused complete point addition for BN254 G1/G2 (limb-major).

The XLA-composed group law (ops/curve_jax.py) spends its time shuttling
~hundreds of intermediate (N, 16) limb tensors through HBM: every field op
around a fori_loop is a fusion barrier. This kernel runs the COMPLETE
Renes-Costello-Batina projective addition (curve_jax.proj_add_impl /
proj_madd_impl) inside one pallas_call — inputs are read from HBM once,
all intermediate limb ops live in VMEM/registers, outputs are written
once. This is the combine used by the MSM segmented scans, so it bounds
MSM throughput (reference hot path: the 5 MSMs of ark-groth16's prover,
SURVEY §3.4).

The RCB formulas replaced the earlier branch-free Jacobian add here: one
straight-line formula with NO doubling branch and NO equality masks costs
12M+2·mul_b3 (add) / 11M+2·mul_b3 (madd) against the fused Jacobian
add+double's ~23 muls — a ~1.8x cut in kernel arithmetic, which is what
the MSM scan is bound by (BASELINE.md). Points on this path are
homogeneous projective, identity (0, 1, 0).

Layout: the caller-facing combine accepts the pipeline's limb-minor point
pytrees ((..., 16) Fq / (..., 2, 16) Fq2 coords) and transposes to
limb-major (16, L) / (2, 16, L) blocks in XLA before the kernel — inside,
the batch axis sits in the 128 vector lanes (full VPU width) and limb-axis
shifts are cheap sublane moves. The earlier limb-minor kernel filled only
16/128 lanes and measured SLOWER than XLA (0.51 vs 0.85 M adds/s,
BASELINE.md); the transposes cost two extra HBM round-trips per operand,
negligible against the ~27k int32 multiplies each fused add performs.

Pallas forbids captured array constants, so the Fq modulus limbs and the
G2 twist constant enter as a (16, 8) kernel input (see FQ_CONSTS_LM).

The kernels run the same group-law code path as curve_jax over the
limb-major field ops in ops/field_lm.py, but with LAZY REDUCTION: field
values inside (and between) kernels live in [0, 2p) and only the host
decode canonicalizes. Parity tests in tests/test_curve_pallas.py compare
decoded points, which is the only observable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import curve_jax as cj
from . import field_jax as fj
from . import field_lm as flm

# (16, 8) kernel constant table (Pallas forbids captured array constants):
#   col 0 = p limbs, col 1 = (2^256 - p), col 2 = R mod p (Montgomery one),
#   col 3/4 = 3b' for the G2 twist (c0, c1, Montgomery), col 5 = c0 + c1
#   (precomputed Karatsuba sum for the constant Fq2 multiply in mul_b3),
#   col 6 = 2p, col 7 = 2^256 - 2p (lazy-reduction additions, field_lm).
def _extra_consts():
    from ..constants import Q as _Q
    from . import limbs as _lc

    c0 = cj.B3_G2_MONT[0]
    c1 = cj.B3_G2_MONT[1]
    s_int = (_lc.limbs_to_int(c0) + _lc.limbs_to_int(c1)) % _Q
    return (
        c0, c1, _lc.int_to_limbs(s_int),
        _lc.int_to_limbs(2 * _Q),
        _lc.int_to_limbs((1 << 256) - 2 * _Q),
    )


_B3C0, _B3C1, _B3SUM, _P2, _P2C = _extra_consts()
FQ_CONSTS_LM = np.stack(
    [fj.FQ.p_limbs, fj.FQ.pc_limbs, fj.FQ.one_mont, _B3C0, _B3C1, _B3SUM,
     _P2, _P2C],
    axis=1,
)

LANE_BLOCK = 512  # lanes per kernel invocation (4 full VPU lane groups)


def _lm_adapter(
    p_col, pc_col, is_fq2: bool, b3=None, p2=None
) -> cj.FieldAdapter:
    """FieldAdapter over limb-major blocks bound to traced modulus columns.

    b3: for Fq2, the (c0, c1, c0+c1) columns of the G2 twist constant 3b'
    (the RCB formulas' mul_b3). For Fq, 3b = 9 so mul_b3 is an add chain.

    p2: the (2p, 2^256 - 2p) columns. When given, the whole adapter runs
    LAZY REDUCTION: every value stays in [0, 2p) — mont_mul drops its final
    conditional subtraction (p < R/4 keeps CIOS closed over [0, 2p)), adds
    reduce mod 2p. Valid because the RCB projective formulas never compare
    computed field values; host decode canonicalizes (field_lm docs).
    """
    nprime = fj.FQ.nprime
    if p2 is not None:
        p2_col, p2c_col = p2
        add1 = lambda a, b: flm.add_lazy(p2c_col, a, b)
        sub1 = lambda a, b: flm.sub_lazy(p2_col, p2c_col, a, b)
        mul1 = lambda a, b: flm.mont_mul_lazy(p_col, nprime, a, b)
    else:
        add1 = lambda a, b: flm.add(p_col, pc_col, a, b)
        sub1 = lambda a, b: flm.sub(p_col, pc_col, a, b)
        mul1 = lambda a, b: flm.mont_mul(p_col, pc_col, nprime, a, b)

    if not is_fq2:

        def mul9(a):
            x2 = add1(a, a)
            x4 = add1(x2, x2)
            x8 = add1(x4, x4)
            return add1(x8, a)

        return cj.FieldAdapter(
            name="fq_lm",
            add=add1,
            sub=sub1,
            mul=mul1,
            sqr=lambda a: mul1(a, a),
            neg=lambda a: flm.neg(p_col, pc_col, a),
            # keepdims: Mosaic wants >=2D vectors, so masks stay (..., 1, L)
            is_zero=lambda a: ~jnp.any(a != 0, axis=-2, keepdims=True),
            eq=lambda a, b: jnp.all(a == b, axis=-2, keepdims=True),
            select=lambda m, a, b: jnp.where(m, a, b),
            one=None,
            zero=None,
            double=lambda a: add1(a, a),
            mul_b3=mul9,
        )

    def fq2_bin(op):
        def f(a, b):
            return jnp.concatenate(
                [op(a[..., 0:1, :, :], b[..., 0:1, :, :]),
                 op(a[..., 1:2, :, :], b[..., 1:2, :, :])],
                axis=-3,
            )

        return f

    def fq2_mul(a, b):
        # Karatsuba over Fq[u]/(u^2+1): 3 base muls.
        a0, a1 = a[..., 0:1, :, :], a[..., 1:2, :, :]
        b0, b1 = b[..., 0:1, :, :], b[..., 1:2, :, :]
        v0, v1 = mul1(a0, b0), mul1(a1, b1)
        s = mul1(add1(a0, a1), add1(b0, b1))
        return jnp.concatenate(
            [sub1(v0, v1), sub1(sub1(s, v0), v1)], axis=-3
        )

    def fq2_sqr(a):
        a0, a1 = a[..., 0:1, :, :], a[..., 1:2, :, :]
        c0 = mul1(add1(a0, a1), sub1(a0, a1))
        t = mul1(a0, a1)
        return jnp.concatenate([c0, add1(t, t)], axis=-3)

    def fq2_mul_b3(a):
        # constant Karatsuba vs 3b' = (c0, c1): v0=a0*c0, v1=a1*c1,
        # s=(a0+a1)*(c0+c1) — the c0+c1 column is precomputed in consts.
        # The constant must be the FIRST operand: mont_mul slices 1-limb
        # rows from the second, and slicing a broadcast constant column
        # folds to a sublane+lane double broadcast Mosaic cannot lower.
        b3c0, b3c1, b3sum = b3
        a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
        v0, v1 = mul1(b3c0, a0), mul1(b3c1, a1)
        s = mul1(b3sum, add1(a0, a1))
        return jnp.concatenate(
            [sub1(v0, v1)[..., None, :, :],
             sub1(sub1(s, v0), v1)[..., None, :, :]],
            axis=-3,
        )

    return cj.FieldAdapter(
        name="fq2_lm",
        add=fq2_bin(add1),
        sub=fq2_bin(sub1),
        mul=fq2_mul,
        sqr=fq2_sqr,
        neg=lambda a: jnp.concatenate(
            [flm.neg(p_col, pc_col, a[..., 0:1, :, :]),
             flm.neg(p_col, pc_col, a[..., 1:2, :, :])],
            axis=-3,
        ),
        is_zero=lambda a: ~jnp.any(a != 0, axis=(-3, -2), keepdims=True),
        eq=lambda a, b: jnp.all(a == b, axis=(-3, -2), keepdims=True),
        select=lambda m, a, b: jnp.where(m, a, b),
        one=None,
        zero=None,
        double=lambda a: fq2_bin(add1)(a, a),
        mul_b3=fq2_mul_b3,
    )


def _bind_adapter(consts, lanes: int, is_fq2: bool) -> cj.FieldAdapter:
    # Broadcast the constant columns to full lane width up front: Mosaic
    # cannot concatenate lane-width-1 vectors (offset mismatch on the
    # non-concat dim), and cond_sub_p/sub pad them along the limb axis.
    col = lambda j: jnp.broadcast_to(consts[:, j : j + 1], (16, lanes))
    b3 = (col(3), col(4), col(5)) if is_fq2 else None
    return _lm_adapter(col(0), col(1), is_fq2, b3, p2=(col(6), col(7)))


def _add_kernel(is_fq2: bool, mixed: bool = False):
    body = cj.proj_madd_impl if mixed else cj.proj_add_impl

    def kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        F = _bind_adapter(consts, x1.shape[-1], is_fq2)
        r = body(F, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
        ox[:] = r[0]
        oy[:] = r[1]
        oz[:] = r[2]

    return kernel


@partial(jax.jit, static_argnums=(0, 3, 4))
def _add_blocked_lm(is_fq2, p_flat, q_flat, block, mixed=False):
    """p/q: tuples of limb-major coords — (16, M) Fq / (2, 16, M) Fq2,
    with M % block == 0."""
    coord = p_flat[0].shape[:-1]  # (16,) or (2, 16)
    m = p_flat[0].shape[-1]
    grid = (m // block,)
    bs = pl.BlockSpec(
        coord + (block,),
        lambda i: (0,) * len(coord) + (i,),
        memory_space=pltpu.VMEM,
    )
    bs_const = pl.BlockSpec((16, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct(coord + (m,), jnp.uint32) for _ in range(3)
    )
    return pl.pallas_call(
        _add_kernel(is_fq2, mixed),
        grid=grid,
        in_specs=[bs_const] + [bs] * 6,
        out_specs=(bs, bs, bs),
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FQ_CONSTS_LM), *p_flat, *q_flat)


def make_pallas_add(is_fq2: bool, block: int = LANE_BLOCK, mixed: bool = False):
    """Returns combine(p, q) on (..., *coord) point pytrees, Pallas-fused.

    Drop-in for `lambda p, q: curve_jax.add(F, p, q)` as the combine of the
    MSM segmented scans (ops/msm.py, ops/segments.py): accepts/returns the
    pipeline's limb-minor layout, transposing at the kernel boundary.
    With mixed=True the kernel assumes q is affine-encoded (Z == one or
    infinity) and runs the cheaper madd formulas (curve_jax.madd_impl) —
    valid for the scans' leaf combine only.
    """
    coord = (2, 16) if is_fq2 else (16,)
    cdim = len(coord)
    to_lm = flm.fq2_to_lm if is_fq2 else flm.fq_to_lm
    from_lm = flm.fq2_from_lm if is_fq2 else flm.fq_from_lm

    def combine(p, q):
        lead = p[0].shape[: p[0].ndim - cdim]
        m = int(np.prod(lead)) if lead else 1
        pad = (-m) % block

        def flat(c):
            c = jnp.broadcast_to(c, lead + coord).reshape((m,) + coord)
            if pad:
                c = jnp.concatenate(
                    [c, jnp.zeros((pad,) + coord, jnp.uint32)], axis=0
                )
            return to_lm(c)

        pf = tuple(flat(c) for c in p)
        qf = tuple(flat(c) for c in q)
        out = _add_blocked_lm(is_fq2, pf, qf, block, mixed)
        return tuple(from_lm(o)[:m].reshape(lead + coord) for o in out)

    return combine


g1_add_pallas = make_pallas_add(False)
g2_add_pallas = make_pallas_add(True)
g1_madd_pallas = make_pallas_add(False, mixed=True)
g2_madd_pallas = make_pallas_add(True, mixed=True)


# ---------------------------------------------------------------------------
# Fused within-tile segmented scan (Phase A of ops/segments.segmented_scan)
# ---------------------------------------------------------------------------


def _tile_scan_kernel(is_fq2: bool, K: int, mixed: bool):
    body = cj.proj_madd_impl if mixed else cj.proj_add_impl

    def kernel(consts, vx, vy, vz, flags, ox, oy, oz, cx, cy, cz):
        lanes = vx.shape[-1]
        one_col = jnp.broadcast_to(consts[:, 2:3], (16, lanes))
        F = _bind_adapter(consts, lanes, is_fq2)

        # RCB projective identity (0, 1, 0)
        if is_fq2:
            one2 = jnp.concatenate(
                [one_col[None], jnp.zeros_like(one_col)[None]], axis=0
            )
            acc0 = (jnp.zeros_like(one2), one2, jnp.zeros_like(one2))
        else:
            acc0 = (jnp.zeros_like(one_col), one_col, jnp.zeros_like(one_col))

        # K sequential segmented-scan steps, all intermediates in VMEM:
        # acc = flags[k] ? v[k] : combine(acc, v[k]); out[k] = acc.
        # fori_loop (not a Python unroll): one combine instance in the
        # kernel graph — the unrolled form is K times the size and sends
        # both Mosaic and interpret-mode compiles over the edge.
        def step(k, acc):
            vk = (vx[k], vy[k], vz[k])
            fmask = flags[k] != 0  # (1, lanes)
            merged = body(F, acc, vk)
            if is_fq2:
                sel = lambda a, b: jnp.where(fmask[None], a, b)
            else:
                sel = lambda a, b: jnp.where(fmask, a, b)
            acc = tuple(sel(v, m) for v, m in zip(vk, merged))
            ox[k] = acc[0]
            oy[k] = acc[1]
            oz[k] = acc[2]
            return acc

        acc = jax.lax.fori_loop(0, K, step, acc0)
        cx[:] = acc[0]
        cy[:] = acc[1]
        cz[:] = acc[2]

    return kernel


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _tile_scan_blocked(is_fq2, v_flat, flags, t, block, mixed):
    """v_flat: coords shaped (K, 16, T) Fq / (K, 2, 16, T) Fq2 (limb-major,
    tile-step-major); flags: (K, 1, T) int32. T % block == 0."""
    K = v_flat[0].shape[0]
    coord = v_flat[0].shape[1:-1]  # (16,) or (2, 16)
    grid = (t // block,)
    zeros = (0,) * len(coord)
    bs_v = pl.BlockSpec(
        (K,) + coord + (block,), lambda i: (0,) + zeros + (i,),
        memory_space=pltpu.VMEM,
    )
    bs_f = pl.BlockSpec((K, 1, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    bs_c = pl.BlockSpec(coord + (block,), lambda i: zeros + (i,), memory_space=pltpu.VMEM)
    bs_const = pl.BlockSpec((16, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((K,) + coord + (t,), jnp.uint32) for _ in range(3)
    ) + tuple(jax.ShapeDtypeStruct(coord + (t,), jnp.uint32) for _ in range(3))
    outs = pl.pallas_call(
        _tile_scan_kernel(is_fq2, K, mixed),
        grid=grid,
        in_specs=[bs_const, bs_v, bs_v, bs_v, bs_f],
        out_specs=(bs_v, bs_v, bs_v, bs_c, bs_c, bs_c),
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FQ_CONSTS_LM), *v_flat, flags)
    return outs[:3], outs[3:]


def make_tile_scan(is_fq2: bool, block: int = LANE_BLOCK, mixed: bool = False):
    """Returns tile_scan(vt, ft) for segments.segmented_scan Phase A.

    vt: point pytree with leading dims (T, K) + coord (limb-minor);
    ft: (T, K) bool. Returns (out, carry): the within-tile inclusive
    segmented scan (restarting at flags) and each tile's final value.
    One pallas_call replaces K per-step combine launches plus their XLA
    merge glue — the per-step overhead that capped the MSM at ~220 k
    points/s with the per-combine kernel.
    """
    coord = (2, 16) if is_fq2 else (16,)
    cdim = len(coord)

    def to_km(x, T, K):  # (T, K) + coord -> (K,) + coord + (T,)
        perm = (1,) + tuple(range(2, 2 + cdim)) + (0,)
        return jnp.transpose(x, perm)

    def from_km(x, T, K):  # inverse
        perm = (1 + cdim,) + (0,) + tuple(range(1, 1 + cdim))
        return jnp.transpose(x, perm)

    def tile_scan(vt, ft):
        T, K = ft.shape
        pad = (-T) % block
        tp = T + pad

        def prep(c):
            if pad:
                c = jnp.concatenate(
                    [c, jnp.zeros((pad, K) + coord, jnp.uint32)], axis=0
                )
            return to_km(c, tp, K)

        v_flat = tuple(prep(c) for c in vt)
        f = ft.astype(jnp.int32)
        if pad:
            f = jnp.concatenate([f, jnp.ones((pad, K), jnp.int32)], axis=0)
        f = jnp.transpose(f, (1, 0))[:, None, :]  # (K, 1, T)
        out_km, carry_km = _tile_scan_blocked(is_fq2, v_flat, f, tp, min(block, tp), mixed)
        out = tuple(from_km(o, tp, K)[:T] for o in out_km)
        carry = tuple(jnp.moveaxis(c, -1, 0)[:T] for c in carry_km)
        return out, carry

    return tile_scan


g1_tile_scan_madd = make_tile_scan(False, mixed=True)
g1_tile_scan = make_tile_scan(False)
g2_tile_scan_madd = make_tile_scan(True, mixed=True)
g2_tile_scan = make_tile_scan(True)
