"""Repo/reference path resolution.

Everything is derived from this file's location or overridable via env
vars, so checkouts outside the build container keep working (ADVICE r1):

- CIRCOM_TPU_REFERENCE: root of the upstream reference checkout
  (test-vectors, verifier artifact); default /root/reference.
- CIRCOM_TPU_CACHE: scratch dir for zkey fixtures / AOT output; default
  <repo>/.cache.
"""

from __future__ import annotations

import os
import pathlib

_PKG = pathlib.Path(__file__).resolve().parent.parent  # circom_compat_tpu/


def repo_root() -> pathlib.Path:
    return _PKG.parent


def reference_root() -> pathlib.Path:
    return pathlib.Path(os.environ.get("CIRCOM_TPU_REFERENCE", "/root/reference"))


def test_vectors() -> pathlib.Path:
    return reference_root() / "test-vectors"


def verifier_artifact() -> pathlib.Path:
    return reference_root() / "tests" / "verifier_artifact.json"


def cache_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get("CIRCOM_TPU_CACHE", repo_root() / ".cache"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def jax_cache_dir() -> str:
    return str(repo_root() / ".jax_cache")


def enable_compile_cache(min_compile_secs: float = 0.5) -> None:
    """Persistent XLA compile cache — the limb-arithmetic graphs are large
    and recompiling them every process dominates wall-clock.

    CIRCOM_TPU_NO_COMPILE_CACHE=1 disables it: on XLA:CPU,
    deserialize_executable re-does codegen, so cache READS of the largest
    entries can cost more than a cold compile (measured ~150 s deserialize
    vs ~110 s compile for the sharded prove step)."""
    import os

    import jax

    if os.environ.get("CIRCOM_TPU_NO_COMPILE_CACHE"):
        return
    try:
        jax.config.update("jax_compilation_cache_dir", jax_cache_dir())
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
