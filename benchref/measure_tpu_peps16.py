"""Measure THIS build (quimb_tpu) on the 16x16 PEPS Heisenberg
stretch config — same protocol as measure_reference_peps16.py:
PEPS.rand -> SimpleUpdate (same tau schedule) -> boundary-MPS
per-site energy at max_bond=chi. Runs on jax's default device
(TPU under the driver; JAX_PLATFORMS=cpu to force CPU).

Usage: python benchref/measure_tpu_peps16.py [L] [D] [chi] [nits]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    nits = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    import jax
    import quimb_tpu.tensor as qtn

    psi0 = qtn.PEPS.rand(L, L, bond_dim=D, seed=42)
    ham = qtn.ham_2d_heis(L, L)

    su = qtn.SimpleUpdate(psi0, ham, D=D, compute_energy_every=None)
    # warm the compiled step programs before timing
    su.evolve(2, tau=0.3)
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
    )
    t_en = time.perf_counter() - t0

    print(json.dumps({
        "what": "quimb_tpu 16x16 PEPS Heisenberg SimpleUpdate",
        "L": L, "D": D, "chi": chi,
        "device": str(jax.devices()[0]),
        "su_seconds_per_step": round(t_su / nsteps, 4),
        "energy_seconds": round(t_en, 3),
        "energy_per_site": float(e) / (L * L),
    }))


if __name__ == "__main__":
    main()
