"""Prove server: compile-once, serve-many Groth16 proving.

The dominant real-usage cost on the TPU backend is ONE-TIME: the remote
XLA compile of the prove core (222 s at 2^20, BASELINE.md) plus key
staging. The reference amortizes nothing — every `cargo run` reloads the
zkey (reference: src/zkey.rs:53-60 read_zkey + prove are per-process) —
but its CPU compile cost is zero, so cold == warm there. Here the TPU
analogue of "seconds-cold proving" is a resident server process: stage the
DeviceProvingKey and compile the core ONCE, then serve proofs at
steady-state latency (8.3 s at 2^20) over a unix socket.

Protocol: newline-delimited JSON over SOCK_STREAM.

  request:  {"inputs": {...}}            (needs --wasm at server start)
            {"witness": ["1", "33", ...]}  (decimal strings or ints)
            {"witness_file": "path.wtns"}
            optional "r"/"s" decimal strings (omitted -> fresh randoms)
            {"cmd": "ping"} | {"cmd": "shutdown"}
  response: {"ok": true, "proof": {...}, "public": [...], "prove_s": ...}
            {"ok": false, "error": "..."}

One connection may carry many requests; requests are served sequentially
(one accelerator). See cli.py `serve` / tests/test_server.py.
"""

from __future__ import annotations

import json
import os
import socket
import time
from typing import Optional


# One proof-JSON encoder for the whole project: cli's handles the
# point-at-infinity encodings (['0','1','0'] G1 / zero-z G2) that a local
# re-implementation here once dropped (ADVICE r4).
from .cli import _proof_to_json


class ProveServer:
    """Resident prover: device-staged key + compiled core, fed requests."""

    def __init__(self, zkey_path: str, wasm_path: Optional[str] = None):
        from .circom.zkey import read_zkey
        from .models import groth16_jax as gj

        t0 = time.time()
        self.pk, self.matrices = read_zkey(zkey_path)
        self.load_s = time.time() - t0

        t0 = time.time()
        self.dpk = gj.DeviceProvingKey.build(
            self.pk, self.matrices, self.matrices.num_constraints
        )
        self.stage_s = time.time() - t0

        self.wc = None
        if wasm_path:
            from .witness import WitnessCalculator

            self.wc = WitnessCalculator.from_file(wasm_path)

        self._gj = gj
        self.window_bits = gj.default_window_bits(
            max(self.dpk.n_vars, self.dpk.domain_size)
        )
        self.compile_s = None
        self.n_proofs = 0

    def warmup(self):
        """Compile + first execution against a zero assignment (shape-only;
        the result is discarded). After this, every prove runs at
        steady-state latency."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        t0 = time.time()
        core = self._gj.get_prove_core(self.dpk, self.window_bits)
        dummy = jnp.asarray(np.zeros((self.dpk.n_vars, 16), np.uint32))
        out = core(dummy)
        jax.tree_util.tree_map(np.asarray, out)
        self.compile_s = time.time() - t0
        return self.compile_s

    def prove(self, witness, r: Optional[int] = None, s: Optional[int] = None):
        from .models.groth16 import random_scalar

        r = random_scalar() if r is None else r
        s = random_scalar() if s is None else s
        t0 = time.time()
        proof = self._gj.prove_prepared(
            self.dpk, r, s, witness, self.window_bits
        )
        return proof, time.time() - t0

    def handle(self, req: dict) -> dict:
        if req.get("cmd") == "ping":
            return {
                "ok": True,
                "n_vars": self.dpk.n_vars,
                "domain_size": self.dpk.domain_size,
                "window_bits": self.window_bits,
                "load_s": round(self.load_s, 2),
                "stage_s": round(self.stage_s, 2),
                "compile_s": (
                    None if self.compile_s is None else round(self.compile_s, 2)
                ),
                "n_proofs": self.n_proofs,
            }
        if "inputs" in req:
            if self.wc is None:
                return {"ok": False,
                        "error": "server started without --wasm; "
                                 "send 'witness' instead"}
            witness = self.wc.calculate_witness(req["inputs"])
        elif "witness" in req:
            witness = [int(v) for v in req["witness"]]
        elif "witness_file" in req:
            from .circom.wtns import read_wtns

            witness = read_wtns(req["witness_file"])
        else:
            return {"ok": False, "error": "no inputs/witness in request"}

        r = int(req["r"]) if "r" in req else None
        s = int(req["s"]) if "s" in req else None
        proof, dt = self.prove(witness, r, s)
        self.n_proofs += 1
        public = witness[1 : self.matrices.num_instance_variables]
        return {
            "ok": True,
            "proof": _proof_to_json(proof),
            "public": [str(v) for v in public],
            "prove_s": round(dt, 3),
        }

    # ------------------------------------------------------------- transport

    def serve(self, sock_path: str, ready_cb=None) -> None:
        """Blocking accept loop on a unix socket (one request at a time —
        there is one accelerator). {"cmd": "shutdown"} stops the loop."""
        if os.path.exists(sock_path):
            os.unlink(sock_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(sock_path)
        srv.listen(8)
        if ready_cb:
            ready_cb()
        try:
            running = True
            while running:
                conn, _ = srv.accept()
                with conn, conn.makefile("rwb") as fh:
                    for line in fh:
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            req = json.loads(line)
                        except ValueError as e:
                            resp = {"ok": False, "error": f"bad json: {e}"}
                            fh.write(json.dumps(resp).encode() + b"\n")
                            fh.flush()
                            continue
                        if req.get("cmd") == "shutdown":
                            fh.write(b'{"ok": true, "bye": true}\n')
                            fh.flush()
                            running = False
                            break
                        try:
                            resp = self.handle(req)
                        except Exception as e:  # noqa: BLE001 — report, keep serving
                            resp = {"ok": False, "error": repr(e)[:2000]}
                        fh.write(json.dumps(resp).encode() + b"\n")
                        fh.flush()
        finally:
            srv.close()
            if os.path.exists(sock_path):
                os.unlink(sock_path)


def request(sock_path: str, req: dict, timeout: float = 600.0) -> dict:
    """One-shot client: send a request, read one JSON response line."""
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.settimeout(timeout)
    c.connect(sock_path)
    with c, c.makefile("rwb") as fh:
        fh.write(json.dumps(req).encode() + b"\n")
        fh.flush()
        line = fh.readline()
    if not line:
        raise RuntimeError("prove server closed the connection")
    return json.loads(line)
