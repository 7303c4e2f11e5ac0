"""Measure the REAL reference (jcmgray/quimb at /root/reference) on
the driver's 16x16 PEPS Heisenberg stretch config, on CPU, with the
benchref/_vendor stubs (numba/autoray/cotengra).

Protocol: PEPS.rand(Lx, Ly, D) -> SimpleUpdate imaginary-time
evolution (n_its iterations at tau in [0.3, 0.1, 0.03]) -> per-site
energy from compute_local_expectation with boundary-MPS max_bond=chi.
Prints one JSON line; record under "peps16" in REFBASE.json.

Usage: python benchref/measure_reference_peps16.py [L] [D] [chi] [nits]
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
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    nits = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    import quimb.tensor as qtn

    np.random.seed(42)
    psi0 = qtn.PEPS.rand(L, L, bond_dim=D, seed=42)
    ham = qtn.ham_2d_heis(L, L)

    su = qtn.SimpleUpdate(psi0, ham, D=D, compute_energy_every=None,
                          keep_best=False)
    t0 = time.perf_counter()
    nsteps = 0
    for tau in (0.3, 0.1, 0.03):
        su.evolve(nits, tau=tau)
        nsteps += nits
    t_su = time.perf_counter() - t0

    psi = su.get_state()
    t0 = time.perf_counter()
    e = psi.compute_local_expectation(
        ham.terms, max_bond=chi, normalized=True,
        contract_optimize="greedy",
    )
    t_en = time.perf_counter() - t0

    print(json.dumps({
        "what": ("reference jcmgray/quimb 16x16 PEPS Heisenberg "
                 "SimpleUpdate (vendor-stub run)"),
        "L": L, "D": D, "chi": chi,
        "su_seconds_per_step": round(t_su / nsteps, 4),
        "energy_seconds": round(t_en, 3),
        "energy_per_site": float(e) / (L * L),
    }))


if __name__ == "__main__":
    main()
