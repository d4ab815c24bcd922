"""Per-stage observability (utils/trace.py): collection, nesting paths,
env-gated logging, and the prove/verify pipeline actually emitting stages."""

import logging
import time

from circom_compat_tpu.utils import trace


def test_collect_records_stages_and_nesting():
    with trace.collect() as tr:
        with trace.stage("outer"):
            time.sleep(0.01)
            with trace.stage("inner"):
                time.sleep(0.01)
    d = tr.as_dict()
    assert set(d) == {"outer", "outer/inner"}
    assert d["outer"] >= d["outer/inner"] >= 0.01
    assert "inner" in tr.table()


def test_stage_is_noop_without_collector():
    # no collector, env unset -> must not record or raise
    with trace.stage("nothing"):
        pass


def test_nested_collectors_both_record():
    with trace.collect() as outer:
        with trace.stage("a"):
            with trace.collect() as inner:
                with trace.stage("b"):
                    pass
    assert [n for n, _ in outer.stages] == ["a/b", "a"]
    assert [n for n, _ in inner.stages] == ["a/b"]


def test_env_logging(monkeypatch, caplog):
    monkeypatch.setenv("CIRCOM_TPU_TIMINGS", "1")
    with caplog.at_level(logging.INFO, logger="circom_compat_tpu.trace"):
        with trace.stage("logged-stage"):
            pass
    assert any("logged-stage" in rec.getMessage() for rec in caplog.records)


def test_prove_and_verify_emit_stages(test_vectors):
    from circom_compat_tpu import read_zkey
    from circom_compat_tpu.models import Groth16
    from circom_compat_tpu.witness import WitnessCalculator

    with trace.collect() as tr:
        pk, matrices = read_zkey(test_vectors / "test.zkey")
        wc = WitnessCalculator.from_file(
            test_vectors / "mycircuit_js" / "mycircuit.wasm"
        )
        wit = wc.calculate_witness({"a": 3, "b": 11})
        proof = Groth16.create_proof_with_reduction_and_matrices(
            pk, 7, 9, matrices, matrices.num_instance_variables,
            matrices.num_constraints, wit, backend="host",
        )
        assert Groth16.verify_proof(
            pk.vk, proof, wit[1 : matrices.num_instance_variables]
        )
    names = {n for n, _ in tr.stages}
    assert {
        "zkey.load",
        "witness.calculate",
        "prove.witness_map",
        "prove.msm+assemble",
        "verify",
        "verify/pairing",
        "verify/ic_msm",
    } <= names


def test_device_profile_writes_trace(tmp_path):
    import os

    import jax
    import jax.numpy as jnp

    with trace.device_profile(str(tmp_path)):
        jnp.arange(8).sum().block_until_ready()
    found = []
    for root, _dirs, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "jax.profiler produced no trace files"


def test_device_profile_disabled_is_noop(tmp_path):
    import os

    with trace.device_profile(str(tmp_path), enabled=False):
        pass
    assert not any(files for _r, _d, files in os.walk(tmp_path))
