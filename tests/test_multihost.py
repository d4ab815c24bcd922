"""Multi-PROCESS (multi-host analogue) prover: jax.distributed bootstrap on
localhost CPU workers, sharded MSMs over the global mesh, proofs bit-exact
vs the host backend.

This is the missing half of the reference's Rayon replacement (reference:
Cargo.toml:25-30 `parallel`; SURVEY §7 step 8): the coordination-service
bootstrap, the cross-process gloo collectives, and the (dcn, shards)
two-level mesh are all exercised for real — each worker is a separate OS
process with its own XLA runtime.
"""

import pytest

from circom_compat_tpu.parallel.multihost import dist_dryrun


@pytest.mark.slow
def test_dist_dryrun_two_processes():
    rec = dist_dryrun(num_processes=2, local_devices=2, chain_k=62)
    assert rec["processes"] == 2
    assert rec["devices"] == 4
    assert rec["mesh"] == {"shards": 4}


@pytest.mark.slow
def test_dist_dryrun_two_level_mesh():
    rec = dist_dryrun(
        num_processes=2, local_devices=2, chain_k=62, two_level=True
    )
    assert rec["mesh"] == {"dcn": 2, "shards": 2}
