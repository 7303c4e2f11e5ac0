"""Convenience gate namespace (reference ``quimb/gates.py``): constant
gates as module-level device arrays."""

from .gen.operators import (
    CNOT,
    S_gate,
    T_gate,
    Wsqrt,
    Xsqrt,
    Ysqrt,
    Zsqrt,
    cX,
    cY,
    cZ,
    ccX,
    fredkin,
    hadamard,
    iswap,
    pauli,
    swap,
    toffoli,
)

I = pauli("I")
X = pauli("X")
Y = pauli("Y")
Z = pauli("Z")
H = hadamard()
S = S_gate()
T = T_gate()
W = (X + Y) / 2**0.5
SWAP = swap()
ISWAP = iswap()
CX = cX()
CY = cY()
CZ = cZ()
CCX = ccX()
CCNOT = CCX
CSWAP = fredkin()

__all__ = [
    "I", "X", "Y", "Z", "H", "S", "T", "W", "SWAP", "ISWAP", "CX", "CY",
    "CZ", "CCX", "CCNOT", "CSWAP", "CNOT", "hadamard", "pauli", "swap",
    "iswap", "toffoli", "fredkin", "Xsqrt", "Ysqrt", "Zsqrt", "Wsqrt",
]
