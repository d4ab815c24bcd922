"""Batch proving: pipelined witness generation + device proving.

The reference proves one circuit per call (reference: tests/groth16.rs:31,
src/zkey.rs:866) and its only concurrency is Rayon inside one proof. For
production serving, many proofs against ONE proving key is the common
shape; this module keeps the DeviceProvingKey resident and pipelines:

  host witness engines (thread pool, one WitnessCalculator per worker)
      -> device prove core (async XLA dispatch, in flight while the next
         witness is computed)
      -> host proof assembly (r,s algebra over the tiny window sums)

so the TPU never waits on witness generation and the host never waits on
the device. Throughput-oriented; per-proof latency equals the single-shot
path.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from ..constants import R_SCALAR


@dataclass
class BatchResult:
    proof: object
    public_inputs: List[int]
    witness: Optional[List[int]] = None


class BatchProver:
    """Prove many input sets against one device-resident key.

    wasm_source: path or bytes of the circuit's witness program; one
    WitnessCalculator is built per worker thread (the engines are
    stateful, so they must not be shared across threads).
    """

    def __init__(
        self,
        dpk,
        wasm_source,
        workers: int = 2,
        window_bits: Optional[int] = None,
        sanity_check: bool = False,
        keep_witness: bool = False,
    ):
        from .groth16_jax import default_window_bits, get_prove_core

        self.dpk = dpk
        self.sanity_check = sanity_check
        self.keep_witness = keep_witness
        self.workers = max(1, workers)
        if window_bits is None:
            window_bits = default_window_bits(max(dpk.n_vars, dpk.domain_size))
        self.window_bits = window_bits
        self.core = get_prove_core(dpk, window_bits)

        if isinstance(wasm_source, (str, bytes)) or hasattr(wasm_source, "__fspath__"):
            self._wasm_bytes = (
                wasm_source
                if isinstance(wasm_source, bytes)
                else open(wasm_source, "rb").read()
            )
        else:
            raise TypeError("wasm_source must be a path or bytes")
        self._local = threading.local()

    def _calculator(self):
        from ..witness import WitnessCalculator

        wc = getattr(self._local, "wc", None)
        if wc is None:
            wc = WitnessCalculator(self._wasm_bytes)
            self._local.wc = wc
        return wc

    def _witness(self, inputs) -> List[int]:
        return self._calculator().calculate_witness(
            inputs, sanity_check=self.sanity_check
        )

    def prove_many(
        self,
        inputs_list: Sequence[dict],
        rs: Optional[Sequence[Tuple[int, int]]] = None,
        inflight: int = 2,
    ) -> List[BatchResult]:
        """Prove every input dict; returns results in input order.

        rs: optional per-proof (r, s) randomizers for deterministic output
        (tests, reproducible batches); defaults to fresh randomness.
        """
        import concurrent.futures as cf

        import jax.numpy as jnp

        from ..ops import field_jax as fj
        from .groth16 import random_scalar
        from .groth16_jax import assemble_proof

        n = len(inputs_list)
        if rs is None:
            rs = [(random_scalar(), random_scalar()) for _ in range(n)]
        if len(rs) != n:
            raise ValueError("rs length must match inputs")

        results: List[Optional[BatchResult]] = [None] * n
        num_inputs = self.dpk.num_inputs

        with cf.ThreadPoolExecutor(max_workers=self.workers) as pool:
            wit_futs = [pool.submit(self._witness, inp) for inp in inputs_list]

            # Bounded in-flight device dispatches: (index, witness, device out)
            pending: "queue.Queue" = queue.Queue()

            def drain_one():
                i, w, out = pending.get()
                r, s = rs[i]
                proof = assemble_proof(self.dpk, r, s, *out, self.window_bits)
                results[i] = BatchResult(
                    proof=proof,
                    public_inputs=[v % R_SCALAR for v in w[1:num_inputs]],
                    witness=list(w) if self.keep_witness else None,
                )

            for i, fut in enumerate(wit_futs):
                w = fut.result()  # in order: keeps results aligned + bounded
                asg = jnp.asarray(
                    fj.encode_plain([int(v) % R_SCALAR for v in w])
                )
                out = self.core(asg)  # async dispatch; device crunches
                pending.put((i, w, out))
                if pending.qsize() >= inflight:
                    drain_one()
            while not pending.empty():
                drain_one()

        return results  # type: ignore[return-value]


def prove_batch(
    zkey_path,
    wasm_path,
    inputs_list: Sequence[dict],
    rs: Optional[Sequence[Tuple[int, int]]] = None,
    workers: int = 2,
    window_bits: Optional[int] = None,
) -> List[BatchResult]:
    """One-call convenience: load key, build device residency, prove all."""
    from ..circom.zkey import read_zkey
    from .groth16_jax import DeviceProvingKey

    pk, matrices = read_zkey(zkey_path)
    dpk = DeviceProvingKey.build(pk, matrices, matrices.num_constraints)
    bp = BatchProver(dpk, wasm_path, workers=workers, window_bits=window_bits)
    return bp.prove_many(inputs_list, rs=rs)
