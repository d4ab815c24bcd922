"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax imports.

Multi-chip sharding is validated on simulated devices per SURVEY.md section 4
("multi-host behavior tested on a single host via XLA's simulated
multi-device"). Real-TPU benchmarks run through bench.py instead.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
TEST_VECTORS = pathlib.Path("/root/reference/test-vectors")


@pytest.fixture(scope="session")
def test_vectors() -> pathlib.Path:
    return TEST_VECTORS
