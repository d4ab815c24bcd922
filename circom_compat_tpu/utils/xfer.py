"""Host->device transfer helper for the axon tunnel's H2D size cliff.

Measured (round 4, scripts/probe_h2d.py / probe_h2d2.py, 1x v5e via
axon): single device_put throughput is 838 MB/s at 4 MB but collapses to
36 MB/s at 32 MB and 26 MB/s at 128 MB, while a train of ~4 MB pieces
sustains 1.48 GB/s and a device-side concat of the pieces is ~free
(0.3 ms for 128 MB). Every multi-MB H2D in the prove paths (streamed key
chunks, per-proof assignments) must ride this helper or pay ~40x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

PUT_PIECE_BYTES = 4 << 20  # measured knee of the tunnel H2D curve

_concat0 = jax.jit(lambda *ps: jnp.concatenate(ps, axis=0))


def put_chunked(arr: np.ndarray):
    """device_put `arr` in ~4 MB slices along axis 0, reassembled by one
    device-side concat. Falls through to a plain device_put for small
    arrays (and for non-cliff backends the chunking is harmless)."""
    arr = np.ascontiguousarray(arr)
    n = arr.shape[0]
    row = arr.nbytes // max(n, 1)
    rows_per = max(1, PUT_PIECE_BYTES // max(row, 1))
    if n <= rows_per:
        return jax.device_put(arr)
    pieces = [
        jax.device_put(arr[i : i + rows_per]) for i in range(0, n, rows_per)
    ]
    return _concat0(*pieces)
