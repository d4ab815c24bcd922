"""Dev-mode trusted setup: generate params from R1CS, prove, verify
(reference: tests/groth16.rs:11-40 uses generate_random_parameters_with_reduction)."""

import pytest

from circom_compat_tpu import CircomBuilder, CircomConfig
from circom_compat_tpu.models import Groth16, generate_parameters


@pytest.fixture(scope="module")
def circuit(test_vectors):
    cfg = CircomConfig(
        test_vectors / "mycircuit_js" / "mycircuit.wasm",
        test_vectors / "mycircuit.r1cs",
    )
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    builder.push_input("b", 11)
    return builder.build()


@pytest.fixture(scope="module")
def params(circuit):
    # Fixed toxic waste -> deterministic key, reproducible test.
    return generate_parameters(
        circuit, alpha=0xA1FA, beta=0xBE7A, gamma=0x6A44A, delta=0xDE17A, t=0x7A0
    )


def test_setup_prove_verify_host(circuit, params):
    proof = Groth16.prove(params, circuit)
    assert Groth16.verify_proof(params.vk, proof, circuit.get_public_inputs())


@pytest.mark.slow
def test_setup_prove_verify_jax(circuit, params):
    proof = Groth16.prove(params, circuit, backend="jax")
    assert Groth16.verify_proof(params.vk, proof, circuit.get_public_inputs())


def test_setup_wrong_input_fails(circuit, params):
    proof = Groth16.prove(params, circuit)
    assert not Groth16.verify_proof(params.vk, proof, [35])


def test_device_setup_matches_host_setup(circuit, params):
    """generate_parameters_from_matrices (device fixed-base + device H-query
    iFFT) must produce the bit-identical key for the same toxic waste."""
    import numpy as np

    from circom_compat_tpu.models.setup import generate_parameters_from_matrices

    ma, mb, mc = circuit.to_matrices()
    dev = generate_parameters_from_matrices(
        ma, mb, mc,
        circuit.r1cs.num_inputs, circuit.r1cs.num_variables,
        alpha=0xA1FA, beta=0xBE7A, gamma=0x6A44A, delta=0xDE17A, t=0x7A0,
    )
    for name in ("a_query", "b_g1_query", "b_g2_query", "l_query", "h_query"):
        assert np.array_equal(
            getattr(dev, name).limbs, getattr(params, name).limbs
        ), name
    assert dev.vk.gamma_abc_g1 == params.vk.gamma_abc_g1
    assert dev.vk.alpha_g1 == params.vk.alpha_g1
    assert dev.delta_g1 == params.delta_g1
    assert dev.domain_size == params.domain_size


def test_setup_key_is_consistent_with_zkey_layout(params):
    # Sections expose the same container types the zkey parser yields.
    assert len(params.a_query) == params.n_vars
    assert len(params.h_query) == params.domain_size
    assert params.n_public + 1 == len(params.vk.gamma_abc_g1)


def test_proj_to_affine_accepts_lazy_coordinates():
    """The Pallas combines emit LAZY [0, 2p) limb values; the batch
    projective->affine normalizers must canonicalize at that boundary.
    Round-2 on-TPU regression: neg(z1) underflowed for lazy z1 in (p, 2p),
    corrupting every G2 section of device-generated setup keys (the CPU
    test mesh uses the XLA combine, which is canonical — so only a lazy
    input reproduces it off-chip)."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from circom_compat_tpu.constants import Q
    from circom_compat_tpu.ops import fixed_base as fb
    from circom_compat_tpu.ops import limbs as lc
    from circom_compat_tpu.refmath import curve as rc

    rng = random.Random(11)
    rinv = pow(1 << 256, -1, Q)
    n = 8

    def lazify(int_val, lazy):
        # re-encode value (already Montgomery) with +p when lazy
        return lc.int_to_limbs(int_val + (Q if lazy else 0))

    def fq2_mul(a, b):
        # BN254 Fq2 = Fq[u]/(u^2 + 1)
        return ((a[0] * b[0] - a[1] * b[1]) % Q, (a[0] * b[1] + a[1] * b[0]) % Q)

    for g2 in (False, True):
        gen = rc.g2_generator() if g2 else rc.g1_generator()
        ops = rc.G2 if g2 else rc.G1
        pts = [ops.mul(gen, rng.randrange(1, 1 << 64)) for _ in range(n)]
        # random projective scale: full Fq2 (NONZERO c1 — the round-2 bug
        # was neg() underflowing on a lazy z1) for G2, Fq for G1
        zs2 = [(rng.randrange(1, Q), rng.randrange(1, Q)) for _ in range(n)]
        zs = [rng.randrange(1, Q) for _ in range(n)]

        def mont(v):
            return v * (1 << 256) % Q

        def enc_coord(aff_c, z, i):
            # projective X = x*z, Y = y*z (both coords scale by the same z)
            val = mont(aff_c * z % Q)
            return lazify(val, lazy=(i % 2 == 1))

        def enc2(val2, i, lazy_both=False):
            # every c1 lazy (odd rows get c0 lazy too)
            return np.stack([
                lazify(mont(val2[0]), lazy=(i % 2 == 1) or lazy_both),
                lazify(mont(val2[1]), lazy=True),
            ])

        if g2:
            X = np.stack([
                enc2(fq2_mul(p[0], z), i)
                for i, (p, z) in enumerate(zip(pts, zs2))
            ])
            Y = np.stack([
                enc2(fq2_mul(p[1], z), i)
                for i, (p, z) in enumerate(zip(pts, zs2))
            ])
            Z = np.stack([
                enc2(z, i) for i, z in enumerate(zs2)
            ])
            ax, ay = fb.g2_proj_to_affine(
                (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
            )
            ax, ay = np.asarray(ax), np.asarray(ay)
            for i, p in enumerate(pts):
                got = (
                    (lc.limbs_to_int(ax[i, 0]) * rinv % Q,
                     lc.limbs_to_int(ax[i, 1]) * rinv % Q),
                    (lc.limbs_to_int(ay[i, 0]) * rinv % Q,
                     lc.limbs_to_int(ay[i, 1]) * rinv % Q),
                )
                assert got == p, f"g2 row {i}"
        else:
            X = np.stack([
                enc_coord(p[0], z, i)
                for i, (p, z) in enumerate(zip(pts, zs))
            ])
            Y = np.stack([
                enc_coord(p[1], z, i)
                for i, (p, z) in enumerate(zip(pts, zs))
            ])
            Z = np.stack([
                lazify(mont(z), i % 2 == 1) for i, z in enumerate(zs)
            ])
            ax, ay = fb.g1_proj_to_affine(
                (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
            )
            ax, ay = np.asarray(ax), np.asarray(ay)
            for i, p in enumerate(pts):
                got = (
                    lc.limbs_to_int(ax[i]) * rinv % Q,
                    lc.limbs_to_int(ay[i]) * rinv % Q,
                )
                assert got == p, f"g1 row {i}"


def test_setup_selfcheck_catches_corrupt_section():
    """A corrupted device-generated section must raise at setup time, not
    surface as an opaque proof-verification failure (VERDICT r2)."""
    import numpy as np
    import pytest

    from circom_compat_tpu.circom.zkey import G1Section
    from circom_compat_tpu.models.setup import (
        SetupSelfCheckError,
        _selfcheck_section,
    )
    from circom_compat_tpu.ops import curve_jax as cj
    from circom_compat_tpu.refmath import curve as rc

    scalars = [3, 7, 11, 19]
    pts = [rc.G1.mul(rc.g1_generator(), s) for s in scalars]
    xs, ys = cj.encode_g1_affine(pts)
    sec = G1Section(np.stack([xs, ys], axis=1).astype(np.uint16))
    _selfcheck_section("ok", sec, scalars)  # honest section passes

    bad = sec.limbs.copy()
    bad[2, 0, 0] ^= 1  # flip one limb bit of row 2's x
    with pytest.raises(SetupSelfCheckError):
        _selfcheck_section("bad", G1Section(bad), scalars, samples=32)

    # unknown-scalar mode (H query): off-curve row must be caught too
    with pytest.raises(SetupSelfCheckError):
        _selfcheck_section("bad_h", G1Section(bad), None, samples=32)


def test_h_scalars_closed_form_matches_ifft():
    """The round-5 closed-form H-query scalars (geometric-sum identity,
    batch inversion) must be bit-exact vs the 2x-domain iFFT oracle the
    reference formulates (src/circom/qap.rs:90-105) at several domain
    sizes and toxic-waste draws."""
    import numpy as np

    from circom_compat_tpu.models.setup import (
        _h_scalar_limbs_device,
        _h_scalar_limbs_device_ifft,
    )

    for n, t, d in [(4, 0x7A57E, 0xDE17A), (64, 0xBEEF, 0x1234),
                    (256, 3, 5)]:
        a = _h_scalar_limbs_device(n, t, d)
        b = _h_scalar_limbs_device_ifft(n, t, d)
        assert a.shape == b.shape == (n, 16)
        assert np.array_equal(a, b), f"mismatch at n={n}"


def test_h_scalars_rejects_degenerate_t():
    import pytest as _pytest

    from circom_compat_tpu.constants import fr_root_of_unity
    from circom_compat_tpu.models.setup import _h_scalar_limbs_device

    # t = an 8th root of unity makes the 2n-domain (n=4) degenerate
    with _pytest.raises(ValueError):
        _h_scalar_limbs_device(4, fr_root_of_unity(8), 0xD)
