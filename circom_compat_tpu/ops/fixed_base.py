"""Device-accelerated fixed-base multi-scalar point generation + batch
projective->affine normalization.

Trusted setup computes ~5*n_vars generator multiplications (G1*s_i, G2*s_i
for per-variable QAP evaluations — reference: ark_groth16 parameter
generation, called from tests/groth16.rs:25). The host ladder costs
~100us/mul in Python: ~10 minutes at 2^20 scale. Here the windowed
fixed-base method runs on device instead:

  host:   table T[w][d] = G * (d << (8w))  (W x 256 points, ~1 s)
  device: out_i = sum_w T[w][digit_w(s_i)] — a gather + Pallas mixed-add
          (RCB complete projective) fold over the W windows, vectorized
          over all N scalars.

The projective outputs are normalized to affine with Montgomery batch
inversion (two product scans + ONE field inversion for the whole batch),
because the zkey format stores affine Montgomery coordinates.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import Q, R_SCALAR
from . import curve_jax as cj
from . import field_jax as fj
from . import msm as msm_ops
from . import segments

WINDOW = 8


def _host_table(group, base, n_windows: int):
    """T[w][d] = base * (d << (WINDOW*w)), affine host points."""
    table = []
    row_base = base
    for _w in range(n_windows):
        row = [None]
        acc = None
        for _d in range(1, 1 << WINDOW):
            acc = group.add(acc, row_base)
            row.append(acc)
        table.append(row)
        for _ in range(WINDOW):
            row_base = group.double(row_base)
    return table


def _fold_windows_device(F, table_xy, digits, combine_madd):
    """sum_w T[w][digits[w]] for every scalar, via a scan over windows."""
    tx, ty = table_xy  # (W, 256) + coord

    def body(acc, wd):
        t_x, t_y, d_row = wd
        gx = t_x[d_row]
        gy = t_y[d_row]
        q = cj.affine_to_proj(F, gx, gy)
        return combine_madd(acc, q), None

    n = digits.shape[1]
    init = cj.proj_infinity(F, (n,))
    out, _ = jax.lax.scan(body, init, (tx, ty, digits))
    return out


def _batch_inv_fq(vals: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) Montgomery Fq batch inversion; rows that are zero map to 0.

    Montgomery's trick: prefix products P, suffix products S, one host
    inversion of the total, then inv_i = P_{i-1} * S_{i+1} * total_inv.
    """
    n = vals.shape[0]
    one = jnp.broadcast_to(jnp.asarray(fj.FQ.one_mont), vals.shape).astype(jnp.uint32)
    zmask = fj.is_zero(vals)
    v = fj.select(zmask, one, vals)

    combine = lambda a, b: fj.mont_mul_impl(fj.FQ, a, b)
    ident = np.asarray(fj.FQ.one_mont, np.uint32)
    prefix = segments.inclusive_scan(combine, v, ident)
    suffix = segments.inclusive_scan(combine, v[::-1], ident)[::-1]

    total = prefix[-1]
    total_int = fj.decode(total[None], fj.FQ)[0]
    tinv = pow(total_int, -1, Q)
    tinv_mont = jnp.asarray(fj.encode_mont([tinv], fj.FQ)[0])

    p_shift = jnp.concatenate([jnp.asarray(ident)[None], prefix[:-1]], axis=0)
    s_shift = jnp.concatenate([suffix[1:], jnp.asarray(ident)[None]], axis=0)
    inv = fj.mont_mul_impl(fj.FQ, fj.mont_mul_impl(fj.FQ, p_shift, s_shift), tinv_mont)
    return fj.select(zmask, jnp.zeros_like(inv), inv)


def _canon(v: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize a LAZY field value (in [0, 2p), 16-bit limbs) to < p.

    The Pallas combines run lazy reduction (ops/curve_pallas.py): their
    outputs live in [0, 2p). The XLA field ops here (`fj.add/sub/neg`,
    the Fq2 adapter's Karatsuba sums, `fj.is_zero`) assume canonical
    inputs — feeding them lazy values silently corrupts the result (e.g.
    neg(z1) underflows for z1 in (p, 2p), which broke every G2 setup
    section on real TPUs; round-2 regression). One conditional subtract
    at this kernel->XLA boundary restores the invariant."""
    return fj.cond_sub_p(fj.FQ, v)


def g1_proj_to_affine(points: cj.Point) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (N,) RCB-projective G1 -> affine Montgomery (N,16) x/y;
    infinity rows come out all-zero (the zkey encoding). Accepts lazy
    [0, 2p) coordinates (Pallas combine outputs)."""
    X, Y, Z = (_canon(c) for c in points)
    zinv = _batch_inv_fq(Z)
    x = fj.mont_mul_impl(fj.FQ, X, zinv)
    y = fj.mont_mul_impl(fj.FQ, Y, zinv)
    inf = fj.is_zero(Z)
    zero = jnp.zeros_like(x)
    return fj.select(inf, zero, x), fj.select(inf, zero, y)


def g2_proj_to_affine(points: cj.Point) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (N,) RCB-projective G2 -> affine Montgomery (N,2,16) x/y.

    Fq2 inversion via the norm: (a0 + a1 u)^-1 = (a0 - a1 u) / (a0^2+a1^2),
    with the Fq norms batch-inverted in one pass. Accepts lazy [0, 2p)
    coordinates (Pallas combine outputs) — see _canon."""
    X, Y, Z = (_canon(c) for c in points)
    z0, z1 = Z[..., 0, :], Z[..., 1, :]
    norm = fj.add_impl(
        fj.FQ,
        fj.mont_mul_impl(fj.FQ, z0, z0),
        fj.mont_mul_impl(fj.FQ, z1, z1),
    )
    ninv = _batch_inv_fq(norm)
    zinv = jnp.stack(
        [
            fj.mont_mul_impl(fj.FQ, z0, ninv),
            fj.mont_mul_impl(fj.FQ, fj.neg_impl(fj.FQ, z1), ninv),
        ],
        axis=-2,
    )
    F = cj.FQ2_ADAPTER
    x = F.mul(X, zinv)
    y = F.mul(Y, zinv)
    inf = F.is_zero(Z)
    zero = jnp.zeros_like(x)
    return F.select(inf, zero, x), F.select(inf, zero, y)


def _encode_table(table, is_g2: bool):
    if is_g2:
        rows = [cj.encode_g2_affine(row) for row in table]
    else:
        rows = [cj.encode_g1_affine(row) for row in table]
    tx = np.stack([r[0] for r in rows])
    ty = np.stack([r[1] for r in rows])
    return jnp.asarray(tx), jnp.asarray(ty)


_TABLE_CACHE: dict = {}


def _ensure_table(g2: bool) -> None:
    from ..refmath import curve as rc

    key = ("g2" if g2 else "g1", WINDOW)
    if key not in _TABLE_CACHE:
        n_windows = -(-254 // WINDOW)
        group = rc.G2 if g2 else rc.G1
        base = rc.g2_generator() if g2 else rc.g1_generator()
        _TABLE_CACHE[key] = _encode_table(_host_table(group, base, n_windows), g2)


def fixed_base_points(
    scalars: List[int],
    g2: bool = False,
    chunk: int = 1 << 19,
    use_pallas: Optional[bool] = None,
):
    """[G * s for s in scalars] as affine Montgomery limb arrays
    ((N,16) x/y for G1, (N,2,16) for G2), computed on device."""
    _ensure_table(g2)
    table_xy = _TABLE_CACHE[("g2" if g2 else "g1", WINDOW)]
    F = cj.FQ2_ADAPTER if g2 else cj.FQ_ADAPTER
    madd = msm_ops.leaf_combine_for(F, use_pallas)
    to_affine = g2_proj_to_affine if g2 else g1_proj_to_affine

    limbs = fj.encode_plain([s % R_SCALAR for s in scalars], fj.FR)
    return _points_from_limbs(limbs, table_xy, F, madd, to_affine, g2, chunk)


def fixed_base_points_from_limbs(
    sc_plain: np.ndarray,
    g2: bool = False,
    chunk: int = 1 << 19,
    use_pallas: Optional[bool] = None,
):
    """Same as fixed_base_points but from (N, 16) plain canonical limb
    arrays — avoids the Python-int round trip for device-produced scalars
    (e.g. the H query's iFFT output in the setup)."""
    _ensure_table(g2)
    F = cj.FQ2_ADAPTER if g2 else cj.FQ_ADAPTER
    madd = msm_ops.leaf_combine_for(F, use_pallas)
    to_affine = g2_proj_to_affine if g2 else g1_proj_to_affine
    table_xy = _TABLE_CACHE[("g2" if g2 else "g1", WINDOW)]
    return _points_from_limbs(
        np.asarray(sc_plain, np.uint32), table_xy, F, madd, to_affine, g2, chunk
    )


def _points_from_limbs(limbs, table_xy, F, madd, to_affine, g2, chunk):
    n = limbs.shape[0]
    if n == 0:
        shape = (0, 2, 16) if g2 else (0, 16)
        return np.zeros(shape, np.uint32), np.zeros(shape, np.uint32)
    xs_out, ys_out = [], []
    for start in range(0, n, chunk):
        sc = jnp.asarray(limbs[start : start + chunk])
        digits = msm_ops.window_digits(sc, WINDOW)  # (W, m)
        jac = _fold_windows_device(F, table_xy, digits, madd)
        x, y = to_affine(jac)
        xs_out.append(np.asarray(x))
        ys_out.append(np.asarray(y))
    return np.concatenate(xs_out), np.concatenate(ys_out)
