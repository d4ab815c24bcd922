"""Prove server (server.py): compile-once-serve-many over a unix socket.

Covers: warmup + repeated proofs, raw-inputs path (wasm), fixed-r,s
determinism against the vendored golden proof, error responses, ping
stats, shutdown."""

import json
import threading

import pytest

from circom_compat_tpu.server import ProveServer, request


@pytest.fixture(scope="module")
def server(test_vectors, tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("srv") / "prove.sock")
    srv = ProveServer(
        str(test_vectors / "test.zkey"),
        str(test_vectors / "mycircuit_js" / "mycircuit.wasm"),
    )
    srv.warmup()
    ready = threading.Event()
    t = threading.Thread(
        target=srv.serve, args=(sock,), kwargs={"ready_cb": ready.set},
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    yield sock, srv
    try:
        request(sock, {"cmd": "shutdown"}, timeout=10)
    except Exception:
        pass
    t.join(timeout=10)


def test_ping_reports_compile(server):
    sock, srv = server
    resp = request(sock, {"cmd": "ping"})
    assert resp["ok"] and resp["compile_s"] is not None
    assert resp["n_vars"] == srv.dpk.n_vars


def test_prove_from_inputs_verifies(server, test_vectors, tmp_path):
    sock, _ = server
    resp = request(sock, {"inputs": {"a": 3, "b": 11}})
    assert resp["ok"], resp
    assert resp["public"] == ["33"]
    # verify against the real snarkjs verification key
    from circom_compat_tpu.cli import main as cli_main

    proof_path = str(tmp_path / "proof.json")
    public_path = str(tmp_path / "public.json")
    json.dump(resp["proof"], open(proof_path, "w"))
    json.dump(resp["public"], open(public_path, "w"))
    rc = cli_main([
        "verify", str(test_vectors / "verification_key.json"),
        public_path, proof_path,
    ])
    assert rc == 0


def test_fixed_rs_matches_golden(server):
    sock, _ = server
    from test_golden_proofs import load_golden

    rec, golden = load_golden("mycircuit_proof.json")
    resp = request(sock, {
        "witness": ["1", "33", "3", "11"], "r": rec["r"], "s": rec["s"],
    })
    assert resp["ok"], resp
    assert int(resp["proof"]["pi_a"][0]) == golden.a[0]
    assert int(resp["proof"]["pi_b"][0][0]) == golden.b[0][0]
    assert int(resp["proof"]["pi_c"][1]) == golden.c[1]


def test_bad_request_keeps_serving(server):
    sock, _ = server
    resp = request(sock, {"nonsense": 1})
    assert not resp["ok"] and "error" in resp
    assert request(sock, {"cmd": "ping"})["ok"]
