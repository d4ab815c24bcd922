"""utils/xfer.put_chunked: piecewise H2D must reassemble exactly
(the axon tunnel's H2D cliff fix rides under every GB-scale staging
path — streamed chunks, resident key staging, per-proof assignments)."""

import numpy as np

from circom_compat_tpu.utils import xfer


def test_put_chunked_reassembles_exactly():
    rng = np.random.default_rng(5)
    for shape in [(3, 16), (1000, 16), (4097,), (513, 2, 16)]:
        arr = rng.integers(0, 1 << 16, shape).astype(np.uint16)
        out = np.asarray(xfer.put_chunked(arr))
        assert out.shape == arr.shape and (out == arr).all(), shape


def test_put_chunked_splits_large_arrays(monkeypatch):
    monkeypatch.setattr(xfer, "PUT_PIECE_BYTES", 1024)
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 1 << 16, (300, 16)).astype(np.uint16)  # 9.6 KB
    out = np.asarray(xfer.put_chunked(arr))
    assert (out == arr).all()
    # non-contiguous input (strided view, like the zkey g2 section slices)
    base = rng.integers(0, 1 << 16, (100, 4, 16)).astype(np.uint16)
    view = base[:, 0:2]
    out = np.asarray(xfer.put_chunked(view))
    assert (out == view).all()
