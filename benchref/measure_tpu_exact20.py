"""Measure quimb_tpu on the exact-core config (BASELINE.json: 20-qubit
sparse Heisenberg Hamiltonian — device Lanczos groundstate + restarted
Krylov expm evolution) — the exact counterpart of
``measure_reference_exact20.py`` so the two can be compared
point-by-point (groundstate energy/seconds + <Z_0>(t) checkpoints).

Runs on whatever jax's default device is: the real TPU under the
driver/axon, CPU with ``JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=``.

Usage:  python benchref/measure_tpu_exact20.py [N] [T] [NT]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    T = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    NT = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax

    on_tpu = jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    if not on_tpu:
        os.environ.setdefault("QUIMB_TPU_X64", "1")

    import quimb_tpu as qu

    H = qu.ham_heis(N, sparse=True)

    # first call compiles the Lanczos program; time the steady state
    t0 = time.perf_counter()
    e0 = float(qu.groundenergy(H))
    t_gs_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    e0 = float(qu.groundenergy(H))
    t_gs = time.perf_counter() - t0
    print(f"# groundenergy: {e0:.12f} ({t_gs:.2f}s warm, "
          f"{t_gs_cold:.1f}s cold)", file=sys.stderr, flush=True)

    p0 = qu.computational_state("01" * (N // 2), dtype="complex64"
                                if on_tpu else "complex128")
    if on_tpu:
        # complex host->device transfers are UNIMPLEMENTED through
        # the tunnel: route explicitly
        from quimb_tpu.ops.backend import to_device

        p0 = to_device(p0)
    # <Z_0> is diagonal in the computational basis: evaluate it as a
    # jitted |psi|^2-weighted sum (eager complex matmuls are
    # UNIMPLEMENTED on the TPU backend; this stays fully compiled)
    import numpy as np
    import jax.numpy as jnp

    zdiag = jnp.asarray(
        1.0 - 2.0 * ((np.arange(2**N) >> (N - 1)) & 1), dtype="float32"
    )

    @jax.jit
    def z0_expec(psi):
        p = jnp.abs(jnp.reshape(psi, (-1,))) ** 2
        return jnp.sum(p * zdiag) / jnp.sum(p)

    evo = qu.Evolution(p0, H, method="expm")
    # warm the expm program with one step, then restart for timing
    evo.update_to(T / NT)
    evo = qu.Evolution(p0, H, method="expm")
    zs = []
    t0 = time.perf_counter()
    for k in range(1, NT + 1):
        evo.update_to(T * k / NT)
        zs.append(float(z0_expec(evo.pt)))
        print(f"# t={float(evo.t):.3f}: <Z0>={zs[-1]:.9f} "
              f"({time.perf_counter() - t0:.2f}s cum)",
              file=sys.stderr, flush=True)
    t_step = (time.perf_counter() - t0) / NT

    print(json.dumps({
        "what": "quimb_tpu 20q exact core",
        "n": N,
        "groundstate_seconds": round(t_gs, 3),
        "groundstate_seconds_cold": round(t_gs_cold, 3),
        "groundenergy": e0,
        "expm_seconds_per_update": round(t_step, 3),
        "z0_checkpoints": zs,
        "t_final": T,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
