"""Measure the REAL reference implementation (jcmgray/quimb at
/root/reference) on the driver's north-star DMRG config, on CPU.

Uses the vendor stubs in benchref/_vendor (numba -> no-op jit,
autoray -> numpy-only dispatch, cotengra -> opt_einsum) so the
reference's own algorithms and numpy/BLAS/ARPACK execution engine run
unmodified. Prints one JSON line with seconds/sweep and the energy so
bench.py's ``vs_baseline`` can compare against jcmgray/quimb itself
(BASELINE.md: baselines "must be measured by running the reference").

Usage:  python benchref/measure_reference.py [L] [CHI] [NSWEEP]
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
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    CHI = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    NSWEEP = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import quimb.tensor as qtn

    np.random.seed(42)
    H = qtn.MPO_ham_heis(L)
    p0 = qtn.MPS_rand_state(L, CHI)
    dmrg = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0, p0=p0)

    # warmup sweep grows bonds to chi (same protocol as bench.py)
    t0 = time.perf_counter()
    dmrg.sweep("R")
    warm = time.perf_counter() - t0
    print(f"# warmup sweep: {warm:.1f}s", file=sys.stderr, flush=True)

    energies = []
    sweep_times = []
    for _ in range(NSWEEP):
        t0 = time.perf_counter()
        energies.append(dmrg.sweep("R"))
        sweep_times.append(time.perf_counter() - t0)
        print(
            f"# sweep {len(energies)}: E={energies[-1]:.12f} "
            f"({sweep_times[-1]:.1f}s)",
            file=sys.stderr,
            flush=True,
        )

    st = sorted(sweep_times)
    median = st[len(st) // 2] if len(st) % 2 else (
        0.5 * (st[len(st) // 2 - 1] + st[len(st) // 2])
    )
    print(json.dumps({
        "what": "reference jcmgray/quimb DMRG2 sweep (vendor-stub run)",
        "L": L,
        "chi": CHI,
        "nsweep": NSWEEP,
        "sweep_seconds": round(median, 3),
        "sweep_seconds_each": [round(t, 1) for t in sweep_times],
        "warmup_seconds": round(warm, 1),
        "energy": energies[-1],
        "dtype": "float64",
        "device": "cpu",
        "environment": {
            "nproc": os.cpu_count(),
            "blas_threads": {
                k: os.environ.get(k)
                for k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                          "MKL_NUM_THREADS")
            },
            "numpy": np.__version__,
            "blas": (np.show_config(mode="dicts")
                     .get("Build Dependencies", {})
                     .get("blas", {}).get("name")),
            "note": ("vendor stubs: numba->noop jit, autoray->numpy, "
                     "cotengra->opt_einsum; single-core host"),
        },
    }))


if __name__ == "__main__":
    main()
