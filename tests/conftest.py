"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on simulated devices per SURVEY.md section 4
("multi-host behavior tested on a single host via XLA's simulated
multi-device"). Real-TPU benchmarks run through bench.py instead.

NOTE: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS pointing at the remote TPU tunnel, so env-var edits here are
too late — jax.config.update is the only reliable override. XLA_FLAGS is
still honored because the CPU backend initializes lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

from circom_compat_tpu.utils import paths

# Persistent compile cache: the limb-arithmetic graphs are large and
# recompiling them every pytest run dominates wall-clock.
paths.enable_compile_cache()

REPO_ROOT = paths.repo_root()
TEST_VECTORS = paths.test_vectors()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full tier; default is the <5 min smoke tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r1 item 8): the default run skips @slow tests
    and finishes in minutes; `--runslow` (or RUN_SLOW=1) runs everything.
    Every subsystem keeps at least one fast test in the smoke tier."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def test_vectors() -> pathlib.Path:
    return TEST_VECTORS


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    return jax.devices()
