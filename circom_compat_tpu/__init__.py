"""circom_compat_tpu: a TPU-native Groth16 proving stack for Circom artifacts.

Re-exports the public API surface matching the reference crate root
(reference: src/lib.rs:4-14): builder/config, witness calculator, zkey
reader, plus the Groth16 prover/verifier that the reference delegates to
arkworks.
"""

__version__ = "0.1.0"

from .circom.r1cs import R1CS, R1CSFile, read_r1cs  # noqa: F401
from .circom.builder import CircomBuilder, CircomConfig  # noqa: F401
from .circom.circuit import CircomCircuit  # noqa: F401
from .circom.zkey import read_zkey, ProvingKey, VerifyingKey, ConstraintMatrices  # noqa: F401
from .witness.calculator import WitnessCalculator  # noqa: F401
from .witness.circom_abi import Wasm  # noqa: F401
