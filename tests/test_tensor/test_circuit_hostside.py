"""The lazy exact-TN circuit keeps its whole network host-side.

Regression tests for the TPU-tunnel poisoning class of bugs: on the
axon backend complex host<->device transfers and eager complex ops are
UNIMPLEMENTED, and the failures surface *asynchronously* at a later
fetch. The invariant that prevents them: the lazy ``Circuit``'s network
(psi0 + gate tensors) is built and surgically rewritten (isel,
simplify, splits) entirely on host numpy; only the final optimized
contraction may run on device (reference layering: exact.py lightcone
+ full_simplify are host graph work, the contraction is the compute).
"""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn


def _small_circ(n=6, depth=3, seed=0):
    rng = np.random.default_rng(seed)
    circ = qtn.Circuit(n)
    for d in range(depth):
        for q in range(n):
            circ.rx(rng.uniform(0, 2 * np.pi), q)
            circ.rz(rng.uniform(0, 2 * np.pi), q)
        for q in range(d % 2, n - 1, 2):
            circ.cz(q, q + 1)
    return circ


class TestCircuitStaysHost:
    def test_psi0_and_gate_tensors_are_host_numpy(self):
        circ = _small_circ()
        for t in circ._psi:
            assert isinstance(t.data, np.ndarray), (
                f"device-resident tensor {t.tags}"
            )

    def test_network_stays_host_after_quantities(self):
        circ = _small_circ()
        circ.amplitude("0" * 6)
        circ.local_expectation(np.asarray(qtn.Tensor(
            np.array([[1.0, 0], [0, -1.0]]), inds=("a", "b")).data), 0)
        for t in circ._psi:
            assert isinstance(t.data, np.ndarray)

    def test_sampling_keeps_host_network(self):
        circ = _small_circ(n=5, depth=2, seed=2)
        list(circ.sample(8, seed=3))
        for t in circ._psi:
            assert isinstance(t.data, np.ndarray)

    def test_amplitude_matches_dense_with_host_network(self):
        circ = _small_circ(n=5, depth=2, seed=4)
        psi = np.asarray(circ.to_dense()).reshape(-1)
        for b in ("00000", "01011", "11111"):
            amp = complex(circ.amplitude(b))
            assert amp == pytest.approx(complex(psi[int(b, 2)]),
                                        abs=1e-8)

    def test_user_supplied_device_psi0_is_hostified(self):
        import jax.numpy as jnp

        psi0 = qtn.MPS_computational_state("000", dtype="complex128")
        psi0.apply_to_arrays(jnp.asarray)
        circ = qtn.Circuit(psi0=psi0)
        for t in circ._psi:
            assert isinstance(t.data, np.ndarray)
        circ.h(0)
        circ.cx(0, 1)
        circ.cx(1, 2)
        # GHZ amplitudes
        assert abs(complex(circ.amplitude("000"))) == pytest.approx(
            2**-0.5, abs=1e-9
        )
        assert abs(complex(circ.amplitude("111"))) == pytest.approx(
            2**-0.5, abs=1e-9
        )
        assert abs(complex(circ.amplitude("101"))) == pytest.approx(
            0.0, abs=1e-9
        )
