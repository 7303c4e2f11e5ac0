"""Measure the REAL reference implementation (jcmgray/quimb at
/root/reference) on the exact-core config (BASELINE.json: 20-qubit
sparse Heisenberg Hamiltonian — Lanczos groundstate + Krylov expm
evolution), on CPU via the vendor stubs (scipy ARPACK / expm_multiply
is the reference's own engine here).

Prints one JSON line with groundstate seconds + energy, and
seconds-per-expm-update + <Z_0>(t) checkpoints so the TPU build can be
compared point-by-point by benchref/measure_tpu_exact20.py.

Usage:  python benchref/measure_reference_exact20.py [N] [T] [NT]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "_vendor"))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    T = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    NT = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import quimb as qu

    H = qu.ham_heis(N, sparse=True)

    t0 = time.perf_counter()
    e0 = float(qu.groundenergy(H))
    t_gs = time.perf_counter() - t0
    print(f"# groundenergy: {e0:.12f} ({t_gs:.1f}s)",
          file=sys.stderr, flush=True)

    # Neel start, Krylov expm evolution, record <Z_0> along the way
    p0 = qu.computational_state("01" * (N // 2)).astype(complex)
    Z0 = qu.ikron(qu.pauli("Z"), [2] * N, 0, sparse=True)
    evo = qu.Evolution(p0, H, method="expm")
    zs = []
    t0 = time.perf_counter()
    for k in range(1, NT + 1):
        evo.update_to(T * k / NT)
        zs.append(float(qu.expec(Z0, evo.pt).real))
        print(f"# t={evo.t:.3f}: <Z0>={zs[-1]:.9f} "
              f"({time.perf_counter() - t0:.1f}s cum)",
              file=sys.stderr, flush=True)
    t_step = (time.perf_counter() - t0) / NT

    print(json.dumps({
        "what": "reference jcmgray/quimb 20q exact core (vendor-stub run)",
        "n": N,
        "groundstate_seconds": round(t_gs, 3),
        "groundenergy": e0,
        "expm_seconds_per_update": round(t_step, 3),
        "z0_checkpoints": zs,
        "t_final": T,
        "device": "cpu",
    }))


if __name__ == "__main__":
    main()
