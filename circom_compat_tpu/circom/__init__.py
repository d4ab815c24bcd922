"""Artifact ingestion + circuit layer (reference: src/circom/)."""

from .r1cs import R1CS, R1CSFile, read_r1cs  # noqa: F401
from .circuit import CircomCircuit  # noqa: F401
from .builder import CircomBuilder, CircomConfig  # noqa: F401
from .zkey import read_zkey  # noqa: F401
from . import qap, wtns  # noqa: F401
