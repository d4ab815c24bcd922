"""CLI flows + zkey writer round-trip against the snarkjs golden fixtures."""

import io
import json

import pytest

from circom_compat_tpu import CircomBuilder, CircomConfig, read_zkey
from circom_compat_tpu.circom.zkey_writer import write_zkey
from circom_compat_tpu.cli import main
from circom_compat_tpu.models import Groth16, generate_parameters


@pytest.fixture(scope="module")
def circuit(test_vectors):
    cfg = CircomConfig(
        test_vectors / "mycircuit_js" / "mycircuit.wasm",
        test_vectors / "mycircuit.r1cs",
    )
    b = CircomBuilder(cfg)
    b.push_input("a", 3)
    b.push_input("b", 11)
    return b.build()


def test_cli_full_flow(tmp_path, test_vectors):
    inp = tmp_path / "in.json"
    json.dump({"a": 3, "b": 11}, open(inp, "w"))
    wasm = str(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    zkey = str(test_vectors / "test.zkey")
    assert main(["witness", wasm, str(inp), str(tmp_path / "w.wtns")]) == 0
    assert main(["export-vkey", zkey, str(tmp_path / "vk.json")]) == 0
    assert main([
        "prove", zkey, str(tmp_path / "w.wtns"),
        str(tmp_path / "proof.json"), str(tmp_path / "public.json"),
    ]) == 0
    assert main([
        "verify", str(tmp_path / "vk.json"),
        str(tmp_path / "public.json"), str(tmp_path / "proof.json"),
    ]) == 0
    # tampered public input must fail
    json.dump(["34"], open(tmp_path / "public.json", "w"))
    assert main([
        "verify", str(tmp_path / "vk.json"),
        str(tmp_path / "public.json"), str(tmp_path / "proof.json"),
    ]) == 1


def test_cli_contribute_and_verify_chain(tmp_path, test_vectors):
    zkey = str(test_vectors / "test.zkey")
    out1 = str(tmp_path / "c1.zkey")
    out2 = str(tmp_path / "c2.zkey")
    assert main(["verify-chain", zkey]) == 0  # empty chain is valid
    assert main(["contribute", zkey, out1, "--name", "alice",
                 "--entropy", "deterministic-a"]) == 0
    assert main(["contribute", out1, out2, "--name", "bob",
                 "--entropy", "deterministic-b"]) == 0
    assert main(["verify-chain", out2]) == 0
    pk, _ = read_zkey(out2)
    assert [c.name for c in pk.mpc.contributions] == ["alice", "bob"]
    # proofs against the contributed key still verify (prove+verify CLI)
    inp = tmp_path / "in.json"
    json.dump({"a": 3, "b": 11}, open(inp, "w"))
    wasm = str(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    assert main(["witness", wasm, str(inp), str(tmp_path / "w.wtns")]) == 0
    assert main(["export-vkey", out2, str(tmp_path / "vk2.json")]) == 0
    assert main(["prove", out2, str(tmp_path / "w.wtns"),
                 str(tmp_path / "p.json"), str(tmp_path / "pub.json")]) == 0
    assert main(["verify", str(tmp_path / "vk2.json"),
                 str(tmp_path / "pub.json"), str(tmp_path / "p.json")]) == 0


def test_cli_export_vkey_matches_snarkjs_golden(tmp_path, test_vectors):
    out = tmp_path / "vk.json"
    assert main(["export-vkey", str(test_vectors / "test.zkey"), str(out)]) == 0
    golden = json.load(open(test_vectors / "verification_key.json"))
    ours = json.load(open(out))
    for key in ("vk_alpha_1", "vk_beta_2", "vk_gamma_2", "vk_delta_2", "IC"):
        assert ours[key] == golden[key], key


def test_zkey_writer_roundtrip(circuit):
    pk = generate_parameters(circuit, alpha=11, beta=22, gamma=33, delta=44, t=55)
    ma, mb, _ = circuit.to_matrices()
    buf = io.BytesIO()
    write_zkey(buf, pk, ma, mb, len(ma))
    buf.seek(0)
    pk2, matrices2 = read_zkey(buf)

    assert pk2.n_vars == pk.n_vars
    assert pk2.n_public == pk.n_public
    assert pk2.domain_size == pk.domain_size
    assert matrices2.num_constraints == len(ma)
    assert pk2.vk.gamma_abc_g1 == pk.vk.gamma_abc_g1
    assert pk2.a_query.points == pk.a_query.points
    assert pk2.b_g2_query.points == pk.b_g2_query.points

    full = circuit.full_assignment()
    args = (pk2, 5, 7, matrices2, matrices2.num_instance_variables,
            matrices2.num_constraints, full)
    proof = Groth16.create_proof_with_reduction_and_matrices(*args)
    assert Groth16.verify_proof(pk2.vk, proof, circuit.get_public_inputs())


def test_cli_fullprove_calldata_r1cs_info(tmp_path, test_vectors, capsys):
    """fullprove -> verify -> export-calldata round-trips against the EVM
    verifier argument layout (G2 limbs c1-first); r1cs-info prints the
    header counts."""
    wasm = str(test_vectors / "mycircuit_js" / "mycircuit.wasm")
    zkey = str(test_vectors / "test.zkey")
    inputs = str(test_vectors / "mycircuit-input1.json")
    proof_p = str(tmp_path / "proof.json")
    public_p = str(tmp_path / "public.json")

    assert main(["fullprove", inputs, wasm, zkey, proof_p, public_p]) == 0
    assert main([
        "verify", str(test_vectors / "verification_key.json"),
        public_p, proof_p,
    ]) == 0
    capsys.readouterr()

    assert main(["export-calldata", public_p, proof_p]) == 0
    calldata = capsys.readouterr().out.strip()
    words = [int(w, 16) for w in calldata.replace('"', " ").replace("[", " ")
             .replace("]", " ").replace(",", " ").split()]
    proof = json.load(open(proof_p))
    public = [int(v) for v in json.load(open(public_p))]
    # a.x, a.y, b.x.c1, b.x.c0, b.y.c1, b.y.c0, c.x, c.y, publics...
    assert words[0] == int(proof["pi_a"][0])
    assert words[2] == int(proof["pi_b"][0][1])  # c1 first
    assert words[3] == int(proof["pi_b"][0][0])
    assert words[6] == int(proof["pi_c"][0])
    assert words[8:] == public

    assert main(["r1cs-info", str(test_vectors / "mycircuit.r1cs")]) == 0
    info = capsys.readouterr().out
    assert "# wires:        4" in info and "# constraints:  1" in info
