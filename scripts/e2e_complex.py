"""End-to-end prove of the complex-circuit benchmark fixture.

The reference benches this circuit with criterion (reference:
benches/groth16.rs:102-107) using a snarkjs zkey that is stripped from the
mirror; here the dev-mode trusted setup regenerates an equivalent key
(cached as a real .zkey via our writer), the native WASM VM computes the
witness, and both prover backends run and must agree bit-exactly.

Usage: python scripts/e2e_complex.py [--size 10000] [--backend jax|host|both]
"""

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TV = pathlib.Path("/root/reference/test-vectors/complex-circuit")
# honor CIRCOM_TPU_CACHE so callers that resolve fixtures via
# paths.cache_dir() (e.g. __graft_entry__.entry_production) find the zkey
# this script writes (ADVICE r4)
CACHE = pathlib.Path(
    os.environ.get(
        "CIRCOM_TPU_CACHE",
        pathlib.Path(__file__).resolve().parents[1] / ".cache",
    )
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=10000)
    ap.add_argument("--backend", default="both", choices=["jax", "host", "both"])
    ap.add_argument("--cpu", action="store_true", help="force JAX CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.circom.builder import CircomConfig, CircomBuilder
    from circom_compat_tpu.circom.zkey_writer import write_zkey
    from circom_compat_tpu.models import Groth16, generate_parameters

    name = f"complex-circuit-{args.size}-{args.size}"
    wasm = TV / f"{name}.wasm"
    r1cs = TV / f"{name}.r1cs"
    CACHE.mkdir(exist_ok=True)
    zkey_path = CACHE / f"{name}.zkey"

    t0 = time.time()
    cfg = CircomConfig(wasm, r1cs)
    print(f"[{time.time()-t0:6.2f}s] artifacts loaded")

    if not zkey_path.exists():
        builder = CircomBuilder(cfg)
        circuit = builder.setup()
        t1 = time.time()
        pk = generate_parameters(
            circuit, alpha=0xA11CE, beta=0xB0B, gamma=0x6A3, delta=0xD17A, t=0x7A57E
        )
        print(f"[{time.time()-t0:6.2f}s] dev setup done ({time.time()-t1:.2f}s)")
        ma, mb, _ = circuit.to_matrices()
        write_zkey(zkey_path, pk, ma, mb, len(ma))
        print(f"[{time.time()-t0:6.2f}s] zkey written: {zkey_path}")

    t1 = time.time()
    pk, matrices = read_zkey(zkey_path)
    print(f"[{time.time()-t0:6.2f}s] zkey loaded ({time.time()-t1:.2f}s): "
          f"{pk.n_vars} vars, domain {pk.domain_size}")

    t1 = time.time()
    builder = CircomBuilder(cfg)
    builder.push_input("a", 3)
    circuit = builder.build()
    witness = circuit.full_assignment()
    print(f"[{time.time()-t0:6.2f}s] witness computed ({time.time()-t1:.2f}s), "
          f"{len(witness)} values "
          f"[{type(builder.cfg.wtns.instance).__name__}]")

    r, s = 0x1234, 0x5678
    proofs = {}
    for backend in (["host", "jax"] if args.backend == "both" else [args.backend]):
        t1 = time.time()
        proofs[backend] = Groth16.create_proof_with_reduction_and_matrices(
            pk, r, s, matrices,
            matrices.num_instance_variables, matrices.num_constraints,
            witness, backend=backend,
        )
        print(f"[{time.time()-t0:6.2f}s] prove[{backend}]: {time.time()-t1:.2f}s")

    if len(proofs) == 2:
        assert proofs["host"] == proofs["jax"], "backend proofs differ!"
        print("host/jax proofs BIT-IDENTICAL")

    proof = next(iter(proofs.values()))
    public = witness[1 : matrices.num_instance_variables]
    t1 = time.time()
    ok = Groth16.verify_proof(pk.vk, proof, public)
    print(f"[{time.time()-t0:6.2f}s] verify: {ok} ({time.time()-t1:.2f}s)")
    assert ok
    print(json.dumps({
        "metric": f"e2e_prove_complex_{args.size}",
        "witness_s": None, "total_s": round(time.time() - t0, 2),
    }))


if __name__ == "__main__":
    main()
