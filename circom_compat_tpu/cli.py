"""Command-line interface: snarkjs-compatible witness/prove/verify flows.

The reference lists a CLI as an unchecked roadmap item (reference:
README.md:67 "CLI for common operations"); this provides one with
snarkjs-interchangeable file formats:

  python -m circom_compat_tpu witness <circuit.wasm> <input.json> <out.wtns>
  python -m circom_compat_tpu prove   <circuit.zkey> <witness.wtns> \
                                      <proof.json> <public.json> [--backend jax]
  python -m circom_compat_tpu verify  <verification_key.json> <public.json> \
                                      <proof.json>
  python -m circom_compat_tpu export-vkey <circuit.zkey> <verification_key.json>
  python -m circom_compat_tpu setup   <circuit.r1cs> <out.zkey> [vk.json]
  python -m circom_compat_tpu contribute <in.zkey> <out.zkey> [--name N] [--entropy E]
  python -m circom_compat_tpu verify-chain <circuit.zkey>

proof.json / public.json / verification_key.json match snarkjs's JSON
schema (decimal strings, G2 as [[c0,c1],...] with the JSON convention).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List

from .utils import paths


def _fmt_g1(p) -> List[str]:
    if p is None:
        return ["0", "1", "0"]
    return [str(p[0]), str(p[1]), "1"]


def _fmt_g2(p) -> List[List[str]]:
    if p is None:
        return [["0", "0"], ["1", "0"], ["0", "0"]]
    (x0, x1), (y0, y1) = p
    return [[str(x0), str(x1)], [str(y0), str(y1)], ["1", "0"]]


def _parse_g1(v):
    x, y, z = (int(c) for c in v)
    if z == 0:
        return None
    if z != 1:
        # snarkjs emits affine points (z == 1); any other z would silently
        # alias a different point if read as affine
        raise ValueError(f"G1 point has non-affine z = {z}")
    return (x, y)


def _parse_g2(v):
    (x0, x1), (y0, y1), (z0, z1) = ((int(a), int(b)) for a, b in v)
    if z0 == 0 and z1 == 0:
        return None
    if (z0, z1) != (1, 0):
        raise ValueError(f"G2 point has non-affine z = ({z0}, {z1})")
    return ((x0, x1), (y0, y1))


def _proof_to_json(proof) -> dict:
    return {
        "pi_a": _fmt_g1(proof.a),
        "pi_b": _fmt_g2(proof.b),
        "pi_c": _fmt_g1(proof.c),
        "protocol": "groth16",
        "curve": "bn128",
    }


def _proof_from_json(d):
    from .models.groth16 import Proof

    return Proof(
        a=_parse_g1(d["pi_a"]), b=_parse_g2(d["pi_b"]), c=_parse_g1(d["pi_c"])
    )


def _vk_to_json(vk) -> dict:
    return {
        "protocol": "groth16",
        "curve": "bn128",
        "nPublic": len(vk.gamma_abc_g1) - 1,
        "vk_alpha_1": _fmt_g1(vk.alpha_g1),
        "vk_beta_2": _fmt_g2(vk.beta_g2),
        "vk_gamma_2": _fmt_g2(vk.gamma_g2),
        "vk_delta_2": _fmt_g2(vk.delta_g2),
        "IC": [_fmt_g1(p) for p in vk.gamma_abc_g1],
    }


def _vk_from_json(d):
    from .circom.zkey import VerifyingKey

    return VerifyingKey(
        alpha_g1=_parse_g1(d["vk_alpha_1"]),
        beta_g2=_parse_g2(d["vk_beta_2"]),
        gamma_g2=_parse_g2(d["vk_gamma_2"]),
        delta_g2=_parse_g2(d["vk_delta_2"]),
        gamma_abc_g1=[_parse_g1(p) for p in d["IC"]],
    )


def cmd_witness(args) -> int:
    from .circom.wtns import write_wtns
    from .witness import WitnessCalculator

    wc = WitnessCalculator.from_file(args.wasm)
    inputs = json.load(open(args.inputs))
    witness = wc.calculate_witness(inputs, sanity_check=args.sanity_check)
    write_wtns(witness, args.out)
    print(f"wrote {len(witness)} witness values to {args.out}")
    return 0


def cmd_prove(args) -> int:
    from .circom.wtns import read_wtns
    from .circom.zkey import read_zkey
    from .models import Groth16

    pk, matrices = read_zkey(args.zkey)
    witness = read_wtns(args.witness)
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk,
        Groth16_random(), Groth16_random(),
        matrices,
        matrices.num_instance_variables,
        matrices.num_constraints,
        witness,
        backend=args.backend,
    )
    public = witness[1 : matrices.num_instance_variables]
    json.dump(_proof_to_json(proof), open(args.proof, "w"), indent=1)
    json.dump([str(v) for v in public], open(args.public, "w"), indent=1)
    print(f"wrote {args.proof}, {args.public}")
    return 0


def Groth16_random():
    from .models.groth16 import random_scalar

    return random_scalar()


def cmd_fullprove(args) -> int:
    """snarkjs `groth16 fullprove` analogue: wasm + inputs + zkey ->
    proof.json + public.json in one step."""
    from .circom.zkey import read_zkey
    from .models import Groth16
    from .witness import WitnessCalculator

    wc = WitnessCalculator.from_file(args.wasm)
    inputs = json.load(open(args.inputs))
    witness = wc.calculate_witness(inputs, sanity_check=args.sanity_check)
    pk, matrices = read_zkey(args.zkey)
    proof = Groth16.create_proof_with_reduction_and_matrices(
        pk,
        Groth16_random(), Groth16_random(),
        matrices,
        matrices.num_instance_variables,
        matrices.num_constraints,
        witness,
        backend=args.backend,
    )
    public = witness[1 : matrices.num_instance_variables]
    json.dump(_proof_to_json(proof), open(args.proof, "w"), indent=1)
    json.dump([str(v) for v in public], open(args.public, "w"), indent=1)
    print(f"wrote {args.proof}, {args.public}")
    return 0


def cmd_export_calldata(args) -> int:
    """snarkjs `groth16 exportsoliditycalldata` analogue: proof + public
    inputs as the Verifier.verifyProof argument list (G2 limbs c1-first,
    ethereum.py's Solidity convention)."""
    from . import ethereum as eth

    proof = _proof_from_json(json.load(open(args.proof)))
    public = [int(v) for v in json.load(open(args.public))]
    ep = eth.Proof.from_ark(proof)
    # as_tuple already emits G2 limbs c1-first (the Solidity convention)
    (ax, ay), ((bxc1, bxc0), (byc1, byc0)), (cx, cy) = ep.as_tuple()

    def hx(v):
        return f'"0x{v:064x}"'

    parts = [
        f"[{hx(ax)},{hx(ay)}]",
        f"[[{hx(bxc1)},{hx(bxc0)}],[{hx(byc1)},{hx(byc0)}]]",
        f"[{hx(cx)},{hx(cy)}]",
        "[" + ",".join(hx(v % (1 << 256)) for v in public) + "]",
    ]
    print(",".join(parts))
    return 0


def cmd_r1cs_info(args) -> int:
    """snarkjs `r1cs info` analogue."""
    from .circom.r1cs import read_r1cs

    r1cs = read_r1cs(args.r1cs)
    print(f"# wires:        {r1cs.num_variables}")
    print(f"# constraints:  {len(r1cs.constraints)}")
    print(f"# public (incl. wire one): {r1cs.num_inputs}")
    print(f"# private (aux): {r1cs.num_aux}")
    return 0


def cmd_verify(args) -> int:
    from .models import Groth16

    d = json.load(open(args.vkey))
    if "IC" in d:
        vk = _vk_from_json(d)
    else:
        from .circom.zkey import read_zkey

        vk = read_zkey(args.vkey)[0].vk
    public = [int(v) for v in json.load(open(args.public))]
    proof = _proof_from_json(json.load(open(args.proof)))
    ok = Groth16.verify_proof(vk, proof, public)
    print("OK!" if ok else "INVALID proof")
    return 0 if ok else 1


def cmd_export_vkey(args) -> int:
    from .circom.zkey import read_zkey

    pk, _ = read_zkey(args.zkey)
    json.dump(_vk_to_json(pk.vk), open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")
    return 0


def cmd_setup(args) -> int:
    from .circom.circuit import CircomCircuit
    from .circom.r1cs import read_r1cs
    from .circom.zkey_writer import write_zkey
    from .models import generate_random_parameters

    circuit = CircomCircuit(r1cs=read_r1cs(args.r1cs))
    pk = generate_random_parameters(circuit)
    ma, mb, _ = circuit.to_matrices()
    write_zkey(args.zkey_out, pk, ma, mb, len(ma))
    if args.vkey_out:
        json.dump(_vk_to_json(pk.vk), open(args.vkey_out, "w"), indent=1)
    print(
        f"dev-mode setup: {pk.n_vars} vars, domain {pk.domain_size}; "
        f"wrote {args.zkey_out}" + (f", {args.vkey_out}" if args.vkey_out else "")
    )
    return 0


def cmd_contribute(args) -> int:
    """snarkjs `zkey contribute` equivalent (circom/contribute.py)."""
    from .circom.contribute import contribute
    from .circom.zkey import read_zkey
    from .circom.zkey_writer import write_zkey

    pk, matrices = read_zkey(args.zkey_in)
    entropy = args.entropy.encode() if args.entropy else None
    pk2 = contribute(pk, entropy=entropy, name=args.name)
    write_zkey(args.zkey_out, pk2, matrices.a, matrices.b, matrices.num_constraints)
    n = len(pk2.mpc.contributions)
    print(f"contribution #{n} applied; wrote {args.zkey_out}")
    print(
        "note: contributor keys use the generator-based binding "
        "(g2_spx = G2*s); `verify-chain` fully validates them, but snarkjs' "
        "own `zkey verify` binds g2_spx to a hash-to-G2 of its transcript "
        "and will reject this chain (see circom/contribute.py)."
    )
    return 0


def cmd_verify_chain(args) -> int:
    """Sanity-check the ceremony contribution chain in a zkey."""
    from .circom.zkey import read_zkey, verify_mpc_chain

    pk, _ = read_zkey(args.zkey)
    n = len(pk.mpc.contributions) if pk.mpc else 0
    ok = verify_mpc_chain(pk)
    print(
        f"{n} contribution(s): " + ("chain OK" if ok else "chain INVALID")
    )
    if ok and n:
        print(
            "note: checked contributor-key consistency + per-link delta "
            "pairings from the G1 generator; ptau/transcript validation "
            "(snarkjs `zkey verify` vs the ceremony's powers-of-tau) is "
            "out of scope without the original ptau file."
        )
    return 0 if ok else 1


def cmd_dist_dryrun(args) -> int:
    """Multi-process SPMD prove over a jax.distributed coordination service
    (the Rayon-replacement's missing half, SURVEY §7 step 8)."""
    import json

    from .parallel.multihost import dist_dryrun

    rec = dist_dryrun(
        num_processes=args.processes,
        local_devices=args.local_devices,
        chain_k=args.chain_k,
        two_level=args.two_level,
        timeout=args.timeout,
    )
    print(json.dumps({
        "ok": True,
        "processes": rec["processes"],
        "devices": rec["devices"],
        "mesh": rec["mesh"],
        "proof_matches_host": True,
    }))
    return 0


def cmd_serve(args) -> int:
    """Resident prove server: stage + compile ONCE, serve proofs at
    steady-state latency over a unix socket (server.py). The TPU answer to
    the one-time remote-compile cost dominating cold usage (VERDICT r3
    task 4; the reference's per-process read_zkey+prove has no compile
    cost to amortize, src/zkey.rs:53-60)."""
    import time

    from .server import ProveServer

    t_all = time.time()
    print(f"[serve] loading {args.zkey} ...", flush=True)
    server = ProveServer(args.zkey, args.wasm)
    print(f"[serve] zkey load {server.load_s:.1f}s, device staging "
          f"{server.stage_s:.1f}s; compiling prove core "
          f"(window_bits={server.window_bits}) ...", flush=True)
    server.warmup()
    print(f"[serve] compile+warmup {server.compile_s:.1f}s; "
          f"cold-to-ready total {time.time()-t_all:.1f}s", flush=True)

    def ready():
        print(f"[serve] ready on {args.socket}", flush=True)

    server.serve(args.socket, ready_cb=ready)
    print(f"[serve] shut down after {server.n_proofs} proofs", flush=True)
    return 0


def cmd_prove_client(args) -> int:
    """Send one prove request to a running `serve` instance."""
    from .server import request

    req = {}
    if args.inputs:
        req["inputs"] = json.load(open(args.inputs))
    elif args.witness:
        req["witness_file"] = args.witness
    else:
        req["cmd"] = "ping"
    resp = request(args.socket, req, timeout=args.timeout)
    if not resp.get("ok"):
        print(json.dumps(resp), file=sys.stderr)
        return 1
    if "proof" in resp:
        json.dump(resp["proof"], open(args.proof, "w"), indent=1)
        json.dump(resp["public"], open(args.public, "w"), indent=1)
        print(f"wrote {args.proof}, {args.public} "
              f"(prove {resp['prove_s']}s)")
    else:
        print(json.dumps(resp))
    return 0


def cmd_verify_onchain(args) -> int:
    """Run the compiled Solidity Groth16 verifier on the in-process EVM
    (evm.py) against a proof — the reference's tests/solidity.rs flow
    without an external node."""
    from . import ethereum as eth
    from .evm import EVMError, check_proof_onchain, load_verifier

    d = json.load(open(args.vkey))
    if "IC" in d:
        vk = _vk_from_json(d)
    else:
        from .circom.zkey import read_zkey

        vk = read_zkey(args.vkey)[0].vk
    public = [int(v) for v in json.load(open(args.public))]
    proof = _proof_from_json(json.load(open(args.proof)))
    vm = load_verifier(args.artifact)
    try:
        ok = check_proof_onchain(
            vm,
            eth.Inputs.from_fr(public),
            eth.Proof.from_ark(proof),
            eth.VerifyingKey.from_ark(vk),
        )
    except EVMError as exc:
        print(f"EVM {exc}")
        return 1
    print("OK! (on-chain)" if ok else "INVALID proof (on-chain)")
    return 0 if ok else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="circom_compat_tpu")
    ap.add_argument(
        "--timings", action="store_true",
        help="print a per-stage wall-clock table to stderr when the "
             "command finishes (utils/trace.py)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("witness", help="run the WASM witness generator")
    w.add_argument("wasm")
    w.add_argument("inputs")
    w.add_argument("out")
    w.add_argument("--sanity-check", action="store_true")
    w.set_defaults(fn=cmd_witness)

    p = sub.add_parser("prove", help="Groth16 prove from zkey + wtns")
    p.add_argument("zkey")
    p.add_argument("witness")
    p.add_argument("proof")
    p.add_argument("public")
    p.add_argument("--backend", default="host", choices=["host", "jax", "streamed"])
    p.set_defaults(fn=cmd_prove)

    fp = sub.add_parser(
        "fullprove", help="witness + prove in one step (snarkjs fullprove)"
    )
    fp.add_argument("inputs")
    fp.add_argument("wasm")
    fp.add_argument("zkey")
    fp.add_argument("proof")
    fp.add_argument("public")
    fp.add_argument("--backend", default="host", choices=["host", "jax", "streamed"])
    fp.add_argument("--sanity-check", action="store_true")
    fp.set_defaults(fn=cmd_fullprove)

    ec = sub.add_parser(
        "export-calldata",
        help="proof + public -> Solidity verifyProof calldata "
             "(snarkjs exportsoliditycalldata)",
    )
    ec.add_argument("public")
    ec.add_argument("proof")
    ec.set_defaults(fn=cmd_export_calldata)

    ri = sub.add_parser("r1cs-info", help="print r1cs header summary")
    ri.add_argument("r1cs")
    ri.set_defaults(fn=cmd_r1cs_info)

    v = sub.add_parser("verify", help="verify a proof")
    v.add_argument("vkey")
    v.add_argument("public")
    v.add_argument("proof")
    v.set_defaults(fn=cmd_verify)

    e = sub.add_parser("export-vkey", help="zkey -> verification_key.json")
    e.add_argument("zkey")
    e.add_argument("out")
    e.set_defaults(fn=cmd_export_vkey)

    s = sub.add_parser("setup", help="dev-mode trusted setup from r1cs")
    s.add_argument("r1cs")
    s.add_argument("zkey_out")
    s.add_argument("vkey_out", nargs="?", default=None)
    s.set_defaults(fn=cmd_setup)

    c = sub.add_parser("contribute", help="apply a phase-2 ceremony contribution")
    c.add_argument("zkey_in")
    c.add_argument("zkey_out")
    c.add_argument("--name", default="")
    c.add_argument("--entropy", default=None, help="deterministic entropy (else urandom)")
    c.set_defaults(fn=cmd_contribute)

    vc = sub.add_parser("verify-chain", help="check the zkey contribution chain")
    vc.add_argument("zkey")
    vc.set_defaults(fn=cmd_verify_chain)

    vo = sub.add_parser(
        "verify-onchain", help="verify via the Solidity contract on the built-in EVM"
    )
    vo.add_argument("vkey", help="verification_key.json or .zkey")
    vo.add_argument("public")
    vo.add_argument("proof")
    vo.add_argument(
        "--artifact",
        default=str(paths.verifier_artifact()),
        help="solc/hardhat artifact with deployedBytecode",
    )
    vo.set_defaults(fn=cmd_verify_onchain)

    dd = sub.add_parser(
        "dist-dryrun",
        help="multi-process (multi-host analogue) prove on localhost CPU "
             "processes, cross-checked bit-exact vs the host prover",
    )
    dd.add_argument("--processes", type=int, default=2)
    dd.add_argument("--local-devices", type=int, default=2)
    dd.add_argument("--chain-k", type=int, default=62,
                    help="squaring-chain constraints (domain = k + 2)")
    dd.add_argument("--two-level", action="store_true",
                    help="use the (dcn, shards) two-level mesh")
    dd.add_argument("--timeout", type=float, default=900.0)
    dd.set_defaults(fn=cmd_dist_dryrun)

    sv = sub.add_parser(
        "serve",
        help="resident prove server: stage + compile once, then serve "
             "proofs at steady-state latency over a unix socket",
    )
    sv.add_argument("zkey")
    sv.add_argument("--wasm", default=None,
                    help="witness wasm so requests can send raw inputs")
    sv.add_argument("--socket", default="/tmp/circom_tpu_prove.sock")
    sv.set_defaults(fn=cmd_serve)

    pc = sub.add_parser(
        "prove-client",
        help="send one prove request (or ping) to a running `serve`",
    )
    pc.add_argument("--socket", default="/tmp/circom_tpu_prove.sock")
    pc.add_argument("--inputs", default=None, help="inputs json (needs --wasm serve)")
    pc.add_argument("--witness", default=None, help=".wtns file path")
    pc.add_argument("--proof", default="proof.json")
    pc.add_argument("--public", default="public.json")
    pc.add_argument("--timeout", type=float, default=600.0)
    pc.set_defaults(fn=cmd_prove_client)

    args = ap.parse_args(argv)
    if args.timings:
        from .utils import trace

        with trace.collect() as tr:
            rc = args.fn(args)
        print("--- stage timings ---", file=sys.stderr)
        print(tr.table(), file=sys.stderr)
        return rc
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
