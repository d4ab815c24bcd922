"""Witness generation layer: first-party WASM runtime + circom ABI drivers
(reference: src/witness/)."""

from .calculator import WitnessCalculator, WitnessCalcError  # noqa: F401
from .fnv import fnv  # noqa: F401
from .memory import SafeMemory  # noqa: F401
from .circom_abi import Wasm  # noqa: F401
