"""Device mesh helpers.

The reference's only parallelism is Rayon work-stealing on one CPU
(reference: Cargo.toml:25-30 `parallel` features, src/circom/qap.rs:37).
The TPU-native replacement is SPMD over a jax.sharding.Mesh: points and
scalars sharded along a single "shards" axis, collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n & (n - 1):
        # keep a power-of-two count so tree folds stay balanced
        n = 1 << (n.bit_length() - 1)
        devices = devices[:n]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def shmap(f, mesh, in_specs, out_specs):
    """shard_map across jax versions (check_rep -> check_vma rename)."""
    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except TypeError:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
