"""DMA row-gather kernel == jnp.take on the row axis (interpret mode)."""

import numpy as np
import pytest

from circom_compat_tpu.ops import gather_pallas as gp


@pytest.mark.parametrize("n,m,c", [(256, 128, 16), (512, 512, 32)])
def test_gather_rows_matches_take(n, m, c):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 1 << 16, size=(n, c), dtype=np.uint16)
    idx = rng.integers(0, n, size=(m,), dtype=np.int32)
    got = np.asarray(
        gp.gather_rows(src, idx, rows_per_block=64, ring=4, interpret=True)
    )
    np.testing.assert_array_equal(got, src[idx])


def test_gather_rows_repeated_and_boundary_indices():
    src = np.arange(64 * 16, dtype=np.uint16).reshape(64, 16)
    idx = np.array([0, 63, 0, 63] * 16, dtype=np.int32)  # 64 rows
    got = np.asarray(
        gp.gather_rows(src, idx, rows_per_block=32, ring=8, interpret=True)
    )
    np.testing.assert_array_equal(got, src[idx])
