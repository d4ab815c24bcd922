"""Protocol layer: Groth16 prove/verify orchestration and dev-mode setup."""

from .groth16 import Groth16, Proof  # noqa: F401
