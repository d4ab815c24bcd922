"""Pure-Python BN254 ground truth: field towers, curve group law, pairing.

Used for (a) host-side verification and final proof assembly, (b) parity
tests of every TPU kernel, mirroring the role ark-ff/ark-ec/ark-bn254 play
for the reference (SURVEY.md section 2.2).
"""

from . import field, curve, pairing  # noqa: F401
