"""Measure the REAL reference implementation (jcmgray/quimb at
/root/reference) on the TEBD real-time-quench config (BASELINE.json:
L=64 MPS, Heisenberg, Neel start), on CPU via the vendor stubs.

Prints one JSON line with seconds-per-Trotter-step and the half-chain
entropy growth curve so the TPU build can be compared point-by-point.

Usage:  python benchref/measure_reference_tebd.py [L] [CHI] [STEPS] [DT]
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
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    CHI = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    DT = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05

    import quimb as qu
    import quimb.tensor as qtn

    binary = "01" * (L // 2)
    psi0 = qtn.MPS_computational_state(binary)
    H = qtn.ham_1d_heis(L)
    tebd = qtn.TEBD(psi0, H)
    tebd.split_opts["max_bond"] = CHI
    tebd.split_opts["cutoff"] = 1e-10

    entropies = []
    t0 = time.perf_counter()
    for k in range(1, STEPS + 1):
        tebd.update_to(k * DT, dt=DT, progbar=False)
        entropies.append(float(tebd.pt.entropy(L // 2)))
        print(
            f"# step {k}: S(L/2)={entropies[-1]:.8f} "
            f"({time.perf_counter() - t0:.1f}s cum)",
            file=sys.stderr, flush=True,
        )
    dt_step = (time.perf_counter() - t0) / STEPS

    print(json.dumps({
        "what": "reference jcmgray/quimb TEBD quench (vendor-stub run)",
        "L": L, "chi": CHI, "steps": STEPS, "dt": DT,
        "seconds_per_step": round(dt_step, 3),
        "entropies": entropies,
        "err": float(np.sum(tebd.err)) if hasattr(tebd, "err") else None,
        "dtype": "complex128", "device": "cpu",
    }))


if __name__ == "__main__":
    main()
