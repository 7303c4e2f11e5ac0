"""Measure THIS build (quimb_tpu) on the same 53-qubit depth-12
random circuit as benchref/measure_reference_circuit53.py — identical
QASM gate sequence — on whatever jax's default device is (TPU under
the driver; force CPU with JAX_PLATFORMS=cpu).

Prints one JSON line with the same fields so amplitudes can be
checked against the reference values in REFBASE.json and the timings
compared directly.

Usage: python benchref/measure_tpu_circuit53.py [n] [depth]
Set FORCE_CPU=1 to pin jax to host CPU (the axon TPU plugin ignores
JAX_PLATFORMS, so the pin happens via jax.config before backend init).
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

if os.environ.get("FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)

import numpy as np  # noqa: E402

from circuit53 import qasm_circuit  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 53
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import jax
    import quimb_tpu.tensor as qtn

    qasm = qasm_circuit(n, depth)
    circ = qtn.Circuit.from_openqasm2_str(qasm)

    b0 = "0" * n
    t0 = time.perf_counter()
    a0 = complex(circ.amplitude(b0))
    t_cold = time.perf_counter() - t0

    rng = np.random.default_rng(0)
    ts = []
    amps = {}
    for _ in range(4):
        b = "".join(rng.choice(["0", "1"], size=n))
        t0 = time.perf_counter()
        amps[b] = complex(circ.amplitude(b))
        ts.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    samples = list(circ.sample(20, seed=42))
    t_sample = time.perf_counter() - t0

    print(json.dumps({
        "what": "quimb_tpu 53q depth-12 random circuit",
        "n": n,
        "depth": depth,
        "device": str(jax.devices()[0]),
        "amp0": [a0.real, a0.imag],
        "amps": {b: [a.real, a.imag] for b, a in amps.items()},
        "amplitude_seconds_cold": round(t_cold, 3),
        "amplitude_seconds_warm": round(float(np.mean(ts)), 3),
        "sample20_seconds": round(t_sample, 3),
        "n_samples": len(samples),
    }))


if __name__ == "__main__":
    main()
