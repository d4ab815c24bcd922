"""Pallas-fused Jacobian point addition for BN254 G1/G2.

The XLA-composed group law (ops/curve_jax.py) spends its time shuttling
~hundreds of intermediate (N, 16) limb tensors through HBM: every field op
around a fori_loop is a fusion barrier. This kernel runs the COMPLETE
branch-free Jacobian addition (same formulas/selects as curve_jax.add_impl,
reusing the exact field_jax limb arithmetic) inside one pallas_call —
inputs are read from HBM once, all intermediate limb ops live in
VMEM/registers, outputs are written once. This is the combine used by the
MSM segmented scans, so it bounds MSM throughput.

Pallas forbids captured array constants, so the Fq modulus limbs enter as
a (2, 16) kernel input and the field spec is shimmed per-trace.

Numerics are identical to curve_jax (same code path); parity tests in
tests/test_curve_pallas.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import curve_jax as cj
from . import field_jax as fj

FQ_CONSTS = np.stack([fj.FQ.p_limbs, fj.FQ.pc_limbs])  # (2, 16) uint32


def _raw_adapter(shim, is_fq2: bool) -> cj.FieldAdapter:
    """FieldAdapter over *_impl bodies bound to a (possibly traced) FieldSpec.

    Uses un-jitted bodies: a pjit primitive is not lowerable inside Pallas.
    """
    if not is_fq2:
        return dataclasses.replace(
            cj.FQ_ADAPTER,
            add=lambda a, b: fj.add_impl(shim, a, b),
            sub=lambda a, b: fj.sub_impl(shim, a, b),
            mul=lambda a, b: fj.mont_mul_impl(shim, a, b),
            sqr=lambda a: fj.mont_mul_impl(shim, a, a),
            neg=lambda a: fj.neg_impl(shim, a),
            double=lambda a: fj.add_impl(shim, a, a),
        )

    def fq2_bin(op):
        def f(a, b):
            return jnp.stack(
                [op(a[..., 0, :], b[..., 0, :]), op(a[..., 1, :], b[..., 1, :])],
                axis=-2,
            )

        return f

    add1 = lambda a, b: fj.add_impl(shim, a, b)
    sub1 = lambda a, b: fj.sub_impl(shim, a, b)
    mul1 = lambda a, b: fj.mont_mul_impl(shim, a, b)

    def fq2_mul(a, b):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        v0, v1 = mul1(a0, b0), mul1(a1, b1)
        s = mul1(add1(a0, a1), add1(b0, b1))
        return jnp.stack([sub1(v0, v1), sub1(sub1(s, v0), v1)], axis=-2)

    def fq2_sqr(a):
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0 = mul1(add1(a0, a1), sub1(a0, a1))
        t = mul1(a0, a1)
        return jnp.stack([c0, add1(t, t)], axis=-2)

    return dataclasses.replace(
        cj.FQ2_ADAPTER,
        add=fq2_bin(add1),
        sub=fq2_bin(sub1),
        mul=fq2_mul,
        sqr=fq2_sqr,
        neg=lambda a: jnp.stack(
            [fj.neg_impl(shim, a[..., 0, :]), fj.neg_impl(shim, a[..., 1, :])],
            axis=-2,
        ),
        double=lambda a: fq2_bin(add1)(a, a),
    )


def _add_kernel(is_fq2: bool):
    def kernel(consts, x1, y1, z1, x2, y2, z2, ox, oy, oz):
        shim = dataclasses.replace(
            fj.FQ, p_limbs=consts[0], pc_limbs=consts[1]
        )
        F = _raw_adapter(shim, is_fq2)
        with fj.PALLAS_MODE:
            r = cj.add_impl(F, (x1[:], y1[:], z1[:]), (x2[:], y2[:], z2[:]))
        ox[:] = r[0]
        oy[:] = r[1]
        oz[:] = r[2]

    return kernel


@partial(jax.jit, static_argnums=(0, 3))
def _add_blocked(is_fq2, p_flat, q_flat, block):
    """p/q: tuples of (M, *coord) arrays, M % block == 0."""
    coord = p_flat[0].shape[1:]
    m = p_flat[0].shape[0]
    grid = (m // block,)
    bs = pl.BlockSpec(
        (block,) + coord, lambda i: (i,) + (0,) * len(coord),
        memory_space=pltpu.VMEM,
    )
    bs_const = pl.BlockSpec((2, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((m,) + coord, jnp.uint32) for _ in range(3)
    )
    return pl.pallas_call(
        _add_kernel(is_fq2),
        grid=grid,
        in_specs=[bs_const] + [bs] * 6,
        out_specs=(bs, bs, bs),
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(FQ_CONSTS), *p_flat, *q_flat)


def make_pallas_add(is_fq2: bool, block: int = 512):
    """Returns combine(p, q) on (..., *coord) point pytrees, Pallas-fused."""
    coord = (2, 16) if is_fq2 else (16,)
    cdim = len(coord)

    def combine(p, q):
        lead = p[0].shape[: p[0].ndim - cdim]
        m = int(np.prod(lead)) if lead else 1
        blk = min(block, max(m, 8))
        pad = (-m) % blk

        def flat(c):
            c = c.reshape((m,) + coord)
            if pad:
                c = jnp.concatenate(
                    [c, jnp.zeros((pad,) + coord, jnp.uint32)], axis=0
                )
            return c

        pf = tuple(flat(c) for c in p)
        qf = tuple(flat(c) for c in q)
        out = _add_blocked(is_fq2, pf, qf, blk)
        return tuple(o[:m].reshape(lead + coord) for o in out)

    return combine


g1_add_pallas = make_pallas_add(False)
g2_add_pallas = make_pallas_add(True)
