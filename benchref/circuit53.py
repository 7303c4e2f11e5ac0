"""Deterministic 53-qubit depth-12 random circuit (BASELINE.json
"Circuit sim" config), emitted as OpenQASM 2 so the exact same gate
sequence runs through both the reference (jcmgray/quimb) and this
build's front-ends.

Structure: brickwork on a 53-site chain — each of the 12 layers is a
row of seeded-random u3 rotations on every qubit followed by cz gates
on alternating nearest-neighbour pairs (even pairs on even layers,
odd pairs on odd layers). This mirrors the reference's
``circ_ansatz_1D_brickwork`` geometry (reference
quimb/tensor/circuit_gen.py) with fixed numpy-seeded parameters.
"""

import numpy as np


def qasm_circuit(n=53, depth=12, seed=7):
    rng = np.random.default_rng(seed)
    lines = [
        "OPENQASM 2.0;",
        'include "qelib1.inc";',
        f"qreg q[{n}];",
    ]
    for layer in range(depth):
        for i in range(n):
            th, ph, lam = rng.uniform(0, 2 * np.pi, size=3)
            lines.append(f"u3({th:.12f},{ph:.12f},{lam:.12f}) q[{i}];")
        start = layer % 2
        for i in range(start, n - 1, 2):
            lines.append(f"cz q[{i}],q[{i + 1}];")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    print(qasm_circuit())
