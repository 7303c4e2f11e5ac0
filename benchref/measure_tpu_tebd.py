"""Measure quimb_tpu on the TEBD real-time-quench config (BASELINE.json:
L=64 MPS, Heisenberg, Neel start) — the exact counterpart of
``measure_reference_tebd.py`` so the two can be compared point-by-point
(seconds per Trotter step + half-chain entropy growth curve).

Runs on whatever jax's default device is: the real TPU under the
driver/axon, CPU with ``JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=``.

Usage:  python benchref/measure_tpu_tebd.py [L] [CHI] [STEPS] [DT]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    CHI = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    DT = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05

    import jax

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        os.environ.setdefault("QUIMB_TPU_X64", "1")

    import quimb_tpu.tensor as qtn

    binary = "01" * (L // 2)
    psi0 = qtn.MPS_computational_state(binary)
    H = qtn.ham_1d_heis(L)
    tebd = qtn.TEBD(psi0, H)
    tebd.split_opts["max_bond"] = CHI
    tebd.split_opts["cutoff"] = 1e-10

    # warmup: compile the fused sweep programs on a throwaway copy so
    # the timed loop measures steady-state execution, mirroring how the
    # reference's numba/LAPACK paths are warm in its measurement
    warm = qtn.TEBD(psi0.copy(), H)
    warm.split_opts["max_bond"] = CHI
    warm.split_opts["cutoff"] = 1e-10
    warm.update_to(2 * DT, dt=DT, progbar=False)
    jax.block_until_ready(warm.pt[0].data)

    entropies = []
    t0 = time.perf_counter()
    for k in range(1, STEPS + 1):
        tebd.update_to(k * DT, dt=DT, progbar=False)
        # O(chi) from the fused Vidal bond weights — no state
        # materialization / device round-trip inside the timed loop
        entropies.append(float(tebd.entropy(L // 2)))
        print(
            f"# step {k}: S(L/2)={entropies[-1]:.8f} "
            f"({time.perf_counter() - t0:.1f}s cum)",
            file=sys.stderr, flush=True,
        )
    dt_step = (time.perf_counter() - t0) / STEPS

    print(json.dumps({
        "what": "quimb_tpu TEBD quench",
        "L": L, "chi": CHI, "steps": STEPS, "dt": DT,
        "seconds_per_step": round(dt_step, 3),
        "entropies": entropies,
        "err": float(tebd.err),
        "dtype": str(tebd.pt[0].data.dtype),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
