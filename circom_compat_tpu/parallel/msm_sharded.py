"""Mesh-sharded Pippenger MSM.

Data-parallel decomposition: Sum_i s_i P_i splits into one independent MSM
per device over its point/scalar shard; the per-window partial sums (a few
hundred points, not the N bases) are all-gathered over ICI and tree-folded
with complete projective adds on every device, so the jitted function returns final,
replicated window sums. This is SURVEY §2.1's axis (a): "data-parallel
sharding of MSM ... bucket sums reduced across the mesh".
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from ..ops import curve_jax as cj
from ..ops import field_jax as fj
from ..ops import msm as msm_ops
from ..ops import segments
from .mesh import SHARD_AXIS, shmap


def _pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return arr
    pad = np.zeros((n - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def pad_shard_inputs(
    xs: np.ndarray, ys: np.ndarray, scalars_limbs: np.ndarray, n_devices: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad bases/scalars to a multiple of n_devices. Padding is all-zero
    affine rows (= infinity, the zkey convention) with zero scalars, which
    contribute nothing to any bucket."""
    n = xs.shape[0]
    target = -(-n // n_devices) * n_devices
    return _pad_to(xs, target), _pad_to(ys, target), _pad_to(scalars_limbs, target)


def sharded_window_sums(
    F: cj.FieldAdapter,
    mesh: Mesh,
    xs: jnp.ndarray,  # (N, ...) affine Montgomery x limbs, N % D == 0
    ys: jnp.ndarray,
    scalars: jnp.ndarray,  # (N, 16) plain
    window_bits: int = 8,
):
    """Replicated (W, point) window sums, computed with points/scalars
    sharded over the mesh. jit-compiled per (shapes, mesh)."""
    n_dev = mesh.shape[SHARD_AXIS]
    combine = lambda a, b: cj.proj_add(F, a, b)

    def local(xs_l, ys_l, sc_l):
        sums = msm_ops.window_sums_affine_impl(
            F, xs_l, ys_l, sc_l, window_bits
        )  # (W, pt)
        gathered = jax.lax.all_gather(sums, SHARD_AXIS)  # (D, W, pt)
        return segments.tree_fold(combine, gathered, n_dev)

    spec_pt = P(SHARD_AXIS)
    fn = shmap(
        local, mesh=mesh, in_specs=(spec_pt, spec_pt, spec_pt), out_specs=P()
    )
    return jax.jit(fn)(xs, ys, scalars)


def msm_g1_sharded(points_mont_xy, scalars, mesh: Mesh, window_bits: int = 8):
    """Host-facing sharded G1 MSM (device window sums + host Horner fold)."""
    from ..refmath import curve as rc

    # limb values are 16-bit: narrow the storage rows so the device gathers
    # move half the bytes (matches ops/msm.msm_g1's staging)
    xs, ys = [np.asarray(a).astype(np.uint16) for a in points_mont_xy]
    if xs.shape[0] == 0:
        return None
    sc = fj.encode_plain([int(s) for s in scalars], fj.FR)
    n_dev = mesh.shape[SHARD_AXIS]
    xs, ys, sc = pad_shard_inputs(xs, ys, sc, n_dev)
    sums = sharded_window_sums(
        cj.FQ_ADAPTER, mesh, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(sc),
        window_bits,
    )
    return msm_ops._fold_windows_host(cj.decode_g1_proj(sums), rc.G1, window_bits)
