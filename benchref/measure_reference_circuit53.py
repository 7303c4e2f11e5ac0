"""Measure the REAL reference (jcmgray/quimb at /root/reference) on
the driver's 53-qubit depth-12 random-circuit config, on CPU, using
the vendor stubs in benchref/_vendor (numba/autoray/cotengra).

Times (a) one cold amplitude contraction <00...0|C|00...0>, (b) the
mean of 4 further amplitudes of random bitstrings (paths warm), and
(c) 20 samples drawn with group-marginal caching. Prints one JSON
line; record it in benchref/REFBASE.json under "circuit53".

Usage: python benchref/measure_reference_circuit53.py [n] [depth]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "_vendor"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, _HERE)

import numpy as np  # noqa: E402

from circuit53 import qasm_circuit  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 53
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import quimb.tensor as qtn

    qasm = qasm_circuit(n, depth)
    circ = qtn.Circuit.from_openqasm2_str(qasm)

    b0 = "0" * n
    t0 = time.perf_counter()
    a0 = complex(circ.amplitude(b0, optimize="greedy"))
    t_cold = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    ts = []
    amps = {}
    for _ in range(4):
        b = "".join(rng.choice(["0", "1"], size=n))
        t0 = time.perf_counter()
        amps[b] = complex(circ.amplitude(b, optimize="greedy"))
        ts.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    samples = list(circ.sample(20, seed=42, optimize="greedy"))
    t_sample = time.perf_counter() - t0

    print(json.dumps({
        "what": ("reference jcmgray/quimb 53q depth-12 random circuit "
                 "(vendor-stub run)"),
        "n": n,
        "depth": depth,
        "amp0": [a0.real, a0.imag],
        "amps": {b: [a.real, a.imag] for b, a in amps.items()},
        "amplitude_seconds_cold": round(t_cold, 3),
        "amplitude_seconds_warm": round(float(np.mean(ts)), 3),
        "sample20_seconds": round(t_sample, 3),
        "n_samples": len(samples),
    }))


if __name__ == "__main__":
    main()
