"""MSM parity tests: device Pippenger vs refmath naive MSM."""

import pytest
import random

from circom_compat_tpu.constants import R_SCALAR
from circom_compat_tpu.ops import curve_jax as cj
from circom_compat_tpu.ops import msm as msm_ops
from circom_compat_tpu.refmath import curve as rc

RNG = random.Random(0x4D534D)


def _rand_g1(n):
    pts = [rc.G1.mul(rc.g1_generator(), RNG.randrange(1, 1 << 62)) for _ in range(n)]
    return pts


def test_msm_g1_matches_reference():
    n = 37  # odd size, hits empty buckets + duplicate digits
    pts = _rand_g1(n)
    pts[5] = None  # infinity in the base set (zkey all-zero rows)
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = R_SCALAR - 1

    got = msm_ops.msm_g1(cj.encode_g1_affine(pts), scalars)
    want = rc.G1.msm(pts, scalars)
    assert got == want


def test_msm_g1_window_bits_invariance():
    n = 16
    pts = _rand_g1(n)
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    enc = cj.encode_g1_affine(pts)
    # 6-bit windows straddle 16-bit limb boundaries; 8-bit never do.
    assert msm_ops.msm_g1(enc, scalars, window_bits=8) == msm_ops.msm_g1(
        enc, scalars, window_bits=6
    )


@pytest.mark.slow
def test_msm_g1_signed_digits_match_unsigned():
    """Signed-window recoding (negated points, halved buckets, unsigned top
    window) must agree with the plain form — incl. digits that force carries
    all the way up (scalar = r - 1 has high digits everywhere)."""
    import jax.numpy as jnp

    from circom_compat_tpu.ops import field_jax as fj

    n = 24
    pts = _rand_g1(n)
    pts[7] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = R_SCALAR - 1
    scalars[1] = (1 << 254) - 1  # max carry propagation
    xs, ys = cj.encode_g1_affine(pts)
    pts_dev = cj.affine_to_proj(cj.FQ_ADAPTER, jnp.asarray(xs), jnp.asarray(ys))
    sc = jnp.asarray(fj.encode_plain(scalars, fj.FR))
    for w in (8, 13):
        a = msm_ops.window_sums_impl(cj.FQ_ADAPTER, pts_dev, sc, w, signed=True)
        b = msm_ops.window_sums_impl(cj.FQ_ADAPTER, pts_dev, sc, w, signed=False)
        # fold both to the final point and compare
        from circom_compat_tpu.ops.msm import _fold_windows_host

        fa = _fold_windows_host(cj.decode_g1_proj(a), rc.G1, w)
        fb = _fold_windows_host(cj.decode_g1_proj(b), rc.G1, w)
        assert fa == fb == rc.G1.msm(pts, scalars)


@pytest.mark.slow
def test_msm_g2_matches_reference():
    n = 9
    pts = [rc.G2.mul(rc.g2_generator(), RNG.randrange(1, 1 << 62)) for _ in range(n)]
    pts[3] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    got = msm_ops.msm_g2(cj.encode_g2_affine(pts), scalars)
    want = rc.G2.msm(pts, scalars)
    assert got == want


@pytest.mark.slow
def test_msm_chunked_path_matches_unchunked():
    """window_sums_impl with chunk_points < n (the 2^21+ memory-bounding
    path: per-chunk sums + cross-chunk fold) must agree with one chunk."""
    import jax
    import jax.numpy as jnp

    from circom_compat_tpu.ops import field_jax as fj

    n = 48
    pts = _rand_g1(n)
    pts[3] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    xs, ys = cj.encode_g1_affine(pts)
    xs16 = jnp.asarray(xs).astype(jnp.uint16)
    ys16 = jnp.asarray(ys).astype(jnp.uint16)
    sc = jnp.asarray(fj.encode_plain(scalars, fj.FR))
    w = 8

    run = jax.jit(
        msm_ops.window_sums_affine_impl, static_argnums=(0, 4, 5)
    )
    one = run(cj.FQ_ADAPTER, xs16, ys16, sc, w, msm_ops.CHUNK_POINTS)
    # 16-point chunks: 3 chunks + padding of the last
    chunked = run(cj.FQ_ADAPTER, xs16, ys16, sc, w, 16)
    fa = _fold_windows_host_list(one, w)
    fb = _fold_windows_host_list(chunked, w)
    assert fa == fb == rc.G1.msm(pts, scalars)


def _fold_windows_host_list(sums, w):
    from circom_compat_tpu.ops.msm import _fold_windows_host

    return _fold_windows_host(cj.decode_g1_proj(sums), rc.G1, w)


def test_msm_precomputed_orders_match_inline():
    """window_orders precomp (sort shared across same-scalar MSMs) must be
    bit-identical to the inline per-MSM sort path."""
    import numpy as np

    import jax.numpy as jnp

    from circom_compat_tpu.ops import field_jax as fj

    n, w = 64, 8
    pts = _rand_g1(n)
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    xs, ys = cj.encode_g1_affine(pts)
    xs16 = jnp.asarray(xs).astype(jnp.uint16)
    ys16 = jnp.asarray(ys).astype(jnp.uint16)
    sc = jnp.asarray(fj.encode_plain(scalars, fj.FR))

    plain = msm_ops.window_sums_affine_impl(cj.FQ_ADAPTER, xs16, ys16, sc, w)
    pre = msm_ops.window_orders(sc, w)
    shared = msm_ops.window_sums_affine_impl(
        cj.FQ_ADAPTER, xs16, ys16, sc, w, precomp=pre
    )
    for a, b in zip(plain, shared):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert _fold_windows_host_list(shared, w) == rc.G1.msm(pts, scalars)


def test_msm_deferred_scan_buckets_match_window_sums():
    """bucket_sums_affine_impl + windows_from_buckets_impl (the streamed
    prover's per-chunk accumulation with ONE deferred suffix scan,
    models/streamed.py) must reproduce window_sums_affine_impl exactly —
    including bucket additivity across point subsets."""
    import numpy as np

    import jax.numpy as jnp

    from circom_compat_tpu.ops import field_jax as fj

    n, w = 48, 8
    pts = _rand_g1(n)
    pts[2] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = 0
    xs, ys = cj.encode_g1_affine(pts)
    xs16 = jnp.asarray(xs).astype(jnp.uint16)
    ys16 = jnp.asarray(ys).astype(jnp.uint16)
    sc = jnp.asarray(fj.encode_plain(scalars, fj.FR))

    want = msm_ops.window_sums_affine_impl(cj.FQ_ADAPTER, xs16, ys16, sc, w)

    # whole-set buckets -> deferred scan
    bkt = msm_ops.bucket_sums_affine_impl(cj.FQ_ADAPTER, xs16, ys16, sc, w)
    got = msm_ops.windows_from_buckets_impl(cj.FQ_ADAPTER, bkt)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # two-subset accumulation (chunked streaming): buckets add pointwise.
    # h = n/2 so both subsets share ONE compiled shape.
    combine = msm_ops.combine_for(cj.FQ_ADAPTER)
    h = n // 2
    b0 = msm_ops.bucket_sums_affine_impl(
        cj.FQ_ADAPTER, xs16[:h], ys16[:h], sc[:h], w
    )
    b1 = msm_ops.bucket_sums_affine_impl(
        cj.FQ_ADAPTER, xs16[h:], ys16[h:], sc[h:], w
    )
    acc = combine(b0, b1)
    got2 = msm_ops.windows_from_buckets_impl(cj.FQ_ADAPTER, acc)
    fa = _fold_windows_host_list(got2, w)
    assert fa == rc.G1.msm(pts, scalars)


def test_msm_grouped_windows_match_ungrouped():
    """Grouped path (G windows -> ONE gather + ONE segmented reduce with
    global keys w*B + digit, ops/msm._grouped_window_sums) must be
    bit-identical to the per-window path — incl. a remainder group (W=32
    at w=8, group=5 -> 6 full groups + rem 2) and infinity rows."""
    import jax.numpy as jnp
    import numpy as np

    from circom_compat_tpu.ops import field_jax as fj

    n = 41
    pts = _rand_g1(n)
    pts[3] = None
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = 0
    xs, ys = cj.encode_g1_affine(pts)
    xs16 = jnp.asarray(np.asarray(xs).astype(np.uint16))
    ys16 = jnp.asarray(np.asarray(ys).astype(np.uint16))
    sc = jnp.asarray(fj.encode_plain(scalars))

    def decoded(sums):
        # grouped tiling changes the projective Z-scaling of intermediate
        # sums (same points, different representatives) — compare the
        # DECODED per-window affine points, which is what the host fold
        # consumes (proof bytes are identical downstream).
        return cj.decode_g1_proj(sums)

    base = decoded(msm_ops.window_sums_affine_impl(
        cj.FQ_ADAPTER, xs16, ys16, sc, 8, group=1
    ))
    for g in (2, 5):
        got = decoded(msm_ops.window_sums_affine_impl(
            cj.FQ_ADAPTER, xs16, ys16, sc, 8, group=g
        ))
        assert got == base, f"group={g} diverged"
    # grouped + precomputed orders (the prove-core configuration)
    orders = msm_ops.window_orders(sc, 8)
    got = decoded(msm_ops.window_sums_affine_impl(
        cj.FQ_ADAPTER, xs16, ys16, sc, 8, precomp=orders, group=4
    ))
    assert got == base
    # grouped + deferred buckets (the streamed-prover configuration)
    buckets = msm_ops.bucket_sums_affine_impl(
        cj.FQ_ADAPTER, xs16, ys16, sc, 8, group=3
    )
    sums = msm_ops.windows_from_buckets_impl(cj.FQ_ADAPTER, buckets)
    assert decoded(sums) == base


def test_msm_grouped_signed_matches_unsigned():
    import jax.numpy as jnp
    import numpy as np

    from circom_compat_tpu.ops import field_jax as fj

    n = 19
    pts = _rand_g1(n)
    scalars = [RNG.randrange(R_SCALAR) for _ in range(n)]
    scalars[0] = R_SCALAR - 1
    xs, ys = cj.encode_g1_affine(pts)
    xs16 = jnp.asarray(np.asarray(xs).astype(np.uint16))
    ys16 = jnp.asarray(np.asarray(ys).astype(np.uint16))
    sc = jnp.asarray(fj.encode_plain(scalars))
    want = msm_ops.msm_g1((jnp.asarray(xs), jnp.asarray(ys)), scalars, 9)
    sums = msm_ops.window_sums_affine_impl(
        cj.FQ_ADAPTER, xs16, ys16, sc, 9, signed=True, group=3
    )
    got = msm_ops._fold_windows_host(cj.decode_g1_proj(sums), rc.G1, 9)
    assert got == want
