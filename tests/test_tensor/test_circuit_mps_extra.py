"""CircuitMPS / CircuitPermMPS / CircuitMPSLazy behavior tests
(reference tests/test_tensor/test_circuit/test_mps.py strategy):
permutation bookkeeping, deferred-gate flushing, truncation and
fidelity estimates, marginals and seeded sampling."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.circuit import (
    Circuit,
    CircuitMPS,
    CircuitMPSLazy,
    CircuitPermMPS,
)


def build_circ(cls, N=5, depth=2, seed=42):
    """A deterministic brickwork-with-long-range circuit."""
    rng = np.random.default_rng(seed)
    circ = cls(N)
    for q in range(N):
        circ.h(q)
    for d in range(depth):
        for q in range(N):
            circ.rz(float(rng.uniform(0, 2 * np.pi)), q)
        pairs = [(q, q + 1) for q in range(d % 2, N - 1, 2)]
        for a, b in pairs:
            circ.cnot(a, b)
        # one long-range gate per layer
        circ.cz(0, N - 1)
    return circ


def dense_of(circ):
    return np.asarray(circ.to_dense()).reshape(-1)


class TestCircuitMPS:
    def test_matches_exact(self):
        ce = build_circ(Circuit)
        cm = build_circ(CircuitMPS)
        assert np.allclose(dense_of(cm), dense_of(ce), atol=1e-5)

    def test_max_bond_truncates(self):
        cm = build_circ(CircuitMPS, N=8, depth=3)
        assert cm.psi.max_bond() <= 2**4
        ct = CircuitMPS(8, max_bond=2)
        rng = np.random.default_rng(0)
        for q in range(8):
            ct.h(q)
        for d in range(3):
            for a in range(d % 2, 7, 2):
                ct.cnot(a, a + 1)
            for q in range(8):
                ct.rx(float(rng.uniform(0, 1)), q)
        assert ct.psi.max_bond() <= 2

    def test_fidelity_estimate_bounds(self):
        ct = CircuitMPS(8, max_bond=2)
        rng = np.random.default_rng(1)
        for q in range(8):
            ct.h(q)
        for d in range(4):
            for a in range(d % 2, 7, 2):
                ct.cnot(a, a + 1)
            for q in range(8):
                ct.ry(float(rng.uniform(0, 2)), q)
        f = ct.fidelity_estimate()
        assert 0 <= f <= 1.0 + 1e-9
        # untruncated circuit reports ~1
        cu = build_circ(CircuitMPS)
        assert cu.fidelity_estimate() == pytest.approx(1.0, abs=1e-6)

    def test_sample_seed_reproducible(self):
        cm = build_circ(CircuitMPS)
        s1 = list(cm.sample(8, seed=3))
        s2 = list(cm.sample(8, seed=3))
        s3 = list(cm.sample(8, seed=4))
        assert s1 == s2
        assert s1 != s3

    def test_compute_marginal_matches_exact(self):
        cm = build_circ(CircuitMPS)
        ce = build_circ(Circuit)
        pm = np.asarray(cm.compute_marginal((1, 3)))
        pe = np.asarray(ce.compute_marginal((1, 3)))
        assert np.allclose(
            pm.reshape(-1), pe.reshape(-1), atol=1e-6
        )

    def test_local_expectation_matches_exact(self):
        import quimb_tpu as qu

        cm = build_circ(CircuitMPS)
        ce = build_circ(Circuit)
        G = np.asarray(qu.pauli("Z"))
        em = complex(np.asarray(cm.local_expectation(G, 2)))
        ee = complex(np.asarray(ce.local_expectation(G, 2)))
        assert em.real == pytest.approx(ee.real, abs=1e-5)


class TestCircuitPermMPS:
    def test_matches_exact_with_long_range(self):
        ce = build_circ(Circuit)
        cp = build_circ(CircuitPermMPS)
        assert np.allclose(dense_of(cp), dense_of(ce), atol=1e-5)

    def test_qubit_ordering_tracks_permutation(self):
        cp = CircuitPermMPS(4)
        cp.h(0)
        # long-range gates cause swaps; the circuit tracks where each
        # logical qubit now lives
        cp.cnot(0, 3)
        cp.cnot(1, 2)
        perm = list(cp.qubits) if hasattr(cp, "qubits") else None
        psi_raw = cp.get_psi_unpermuted()
        assert psi_raw.num_tensors == 4
        # the public amplitude/dense APIs undo the permutation
        ce = Circuit(4)
        ce.h(0)
        ce.cnot(0, 3)
        ce.cnot(1, 2)
        assert np.allclose(dense_of(cp), dense_of(ce), atol=1e-6)

    def test_amplitudes_correct_under_permutation(self):
        ce = build_circ(Circuit)
        cp = build_circ(CircuitPermMPS)
        for b in ("00000", "10101", "11111", "01010"):
            ae = complex(np.asarray(ce.amplitude(b)))
            ap = complex(np.asarray(cp.amplitude(b)))
            assert ap == pytest.approx(ae, abs=1e-5)

    def test_sampling_statistics_under_permutation(self):
        ce = build_circ(Circuit)
        cp = build_circ(CircuitPermMPS)
        pe = np.abs(dense_of(ce)) ** 2
        n = 2000
        samples = list(cp.sample(n, seed=11))
        counts = np.zeros(2**5)
        for s in samples:
            counts[int(s, 2)] += 1
        # loose chi2-style bound
        chi2 = ((counts - n * pe) ** 2 / np.maximum(n * pe, 1e-9))
        assert chi2.sum() < 4 * 2**5

    def test_copy_preserves_permutation(self):
        cp = build_circ(CircuitPermMPS)
        cp2 = cp.copy()
        assert np.allclose(dense_of(cp2), dense_of(cp), atol=1e-10)


class TestCircuitMPSLazy:
    def test_single_qubit_gates_stay_eager(self):
        cl = CircuitMPSLazy(4)
        cl.h(0)
        cl.rz(0.3, 1)
        # |psi[0]| = 1/sqrt(2): H on qubit 0, phase-only elsewhere
        assert np.allclose(
            np.abs(dense_of(cl))[0], 2**-0.5, atol=1e-6
        )

    def test_matches_exact_after_flush(self):
        ce = build_circ(Circuit)
        cl = build_circ(CircuitMPSLazy)
        assert np.allclose(dense_of(cl), dense_of(ce), atol=1e-5)

    def test_amplitude_flushes_pending(self):
        ce = build_circ(Circuit)
        cl = build_circ(CircuitMPSLazy)
        b = "10101"
        ae = complex(np.asarray(ce.amplitude(b)))
        al = complex(np.asarray(cl.amplitude(b)))
        assert al == pytest.approx(ae, abs=1e-5)

    def test_sampling_seed_reproducible(self):
        cl = build_circ(CircuitMPSLazy)
        s1 = list(cl.sample(6, seed=2))
        s2 = list(cl.sample(6, seed=2))
        assert s1 == s2

    def test_local_expectation_matches_exact(self):
        import quimb_tpu as qu

        ce = build_circ(Circuit)
        cl = build_circ(CircuitMPSLazy)
        G = np.asarray(qu.pauli("X"))
        ee = complex(np.asarray(ce.local_expectation(G, 1)))
        el = complex(np.asarray(cl.local_expectation(G, 1)))
        assert el.real == pytest.approx(ee.real, abs=1e-5)

    def test_flush_every_bounds_pending(self):
        cl = CircuitMPSLazy(6, flush_every=2)
        rng = np.random.default_rng(5)
        for d in range(3):
            for a in range(d % 2, 5, 2):
                cl.cnot(a, a + 1)
        # pending queue never exceeds flush_every
        assert len(getattr(cl, "_pending", ())) <= 2
