"""Measure THIS build (quimb_tpu) on the 16x16 PEPS Heisenberg
stretch config — same protocol as measure_reference_peps16.py:
PEPS.rand -> SimpleUpdate (same tau schedule) -> boundary-MPS
per-site energy at max_bond=chi. Runs on jax's default device
(TPU under the driver; JAX_PLATFORMS=cpu to force CPU).

Writes its result incrementally to benchref/tpu_peps16.json so a
timeout still leaves the stages that completed on disk.

Usage: python benchref/measure_tpu_peps16.py [L] [D] [chi] [nits]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

_OUT = os.path.join(_HERE, "tpu_peps16.json")


def _write(result):
    tmp = _OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, _OUT)
    print(json.dumps(result), flush=True)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    nits = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    import jax
    import quimb_tpu.tensor as qtn

    result = {
        "what": "quimb_tpu 16x16 PEPS Heisenberg SimpleUpdate",
        "L": L, "D": D, "chi": chi,
        "device": str(jax.devices()[0]),
    }

    psi0 = qtn.PEPS.rand(L, L, bond_dim=D, seed=42)
    ham = qtn.ham_2d_heis(L, L)

    su = qtn.SimpleUpdate(psi0, ham, D=D, compute_energy_every=None,
                          compute_energy_final=False)
    # warm the compiled step programs before timing
    t0 = time.perf_counter()
    su.evolve(2, tau=0.3)
    result["su_warmup_seconds"] = round(time.perf_counter() - t0, 3)
    _write(result)

    t0 = time.perf_counter()
    nsteps = 0
    for tau in (0.3, 0.1, 0.03):
        su.evolve(nits, tau=tau)
        nsteps += nits
        print(f"[peps16] tau={tau} done "
              f"t={time.perf_counter() - t0:.1f}s", flush=True)
    t_su = time.perf_counter() - t0
    result["su_seconds_per_step"] = round(t_su / nsteps, 4)
    _write(result)

    psi = su.get_state()
    t0 = time.perf_counter()
    e = psi.compute_local_expectation(
        ham.terms, max_bond=chi, normalized=True,
    )
    t_en = time.perf_counter() - t0
    result["energy_seconds"] = round(t_en, 3)
    result["energy_per_site"] = float(e) / (L * L)
    _write(result)


if __name__ == "__main__":
    main()
