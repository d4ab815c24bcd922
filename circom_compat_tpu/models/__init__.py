"""Protocol layer: Groth16 prove/verify orchestration and dev-mode setup."""

from .groth16 import Groth16, Proof  # noqa: F401
from .setup import generate_parameters, generate_random_parameters  # noqa: F401
