"""Circuit simulator tests — cross-backend equivalence (the reference's
test_circuit/test_cross_backend.py:13-23 pattern) + validation against
dense simulation."""

import collections

import numpy as np
import pytest

from quimb_tpu.tensor.circuit import (
    Circuit,
    CircuitDense,
    CircuitMPS,
    CircuitPermMPS,
    Gate,
)
from quimb_tpu.tensor.circuit_gen import (
    circ_qaoa,
    circ_rand_supremacy_like,
)


def build_test_circuit(circ):
    """A deterministic circuit touching many gate types."""
    circ.h(0)
    circ.cx(0, 1)
    circ.rx(0.3, 2)
    circ.fsim(0.2, 0.1, 1, 2)
    circ.t(0)
    circ.cz(2, 3)
    circ.u3(0.1, 0.2, 0.3, 3)
    circ.cx(3, 0)
    circ.swap(1, 3)
    circ.rzz(0.4, 0, 2)
    circ.y_1_2(1)
    circ.ccx(0, 1, 2)
    circ.iswap(2, 3)
    return circ


SIMS = [Circuit, CircuitDense, CircuitMPS, CircuitPermMPS]


class TestCrossBackend:
    @pytest.mark.parametrize("cls", SIMS)
    def test_to_dense_equivalence(self, cls):
        ref = np.asarray(
            build_test_circuit(CircuitDense(4)).to_dense()
        ).reshape(-1)
        got = np.asarray(
            build_test_circuit(cls(4)).to_dense()
        ).reshape(-1)
        assert np.allclose(got, ref, atol=1e-10)

    @pytest.mark.parametrize("cls", SIMS)
    @pytest.mark.parametrize("b", ["0000", "0110", "1111"])
    def test_amplitudes(self, cls, b):
        ref = complex(build_test_circuit(CircuitDense(4)).amplitude(b))
        got = complex(build_test_circuit(cls(4)).amplitude(b))
        assert abs(got - ref) < 1e-10

    @pytest.mark.parametrize("cls", [Circuit, CircuitDense, CircuitMPS])
    def test_local_expectation(self, cls):
        from quimb_tpu.gen.operators import pauli

        Z = np.asarray(pauli("Z"))
        ref = complex(
            build_test_circuit(CircuitDense(4)).local_expectation(Z, 2)
        )
        got = complex(
            build_test_circuit(cls(4)).local_expectation(Z, 2)
        )
        assert abs(got - ref) < 1e-9

    def test_partial_trace(self):
        cd = build_test_circuit(CircuitDense(4))
        ct = build_test_circuit(Circuit(4))
        assert np.allclose(
            np.asarray(ct.partial_trace((1, 2))),
            np.asarray(cd.partial_trace((1, 2))), atol=1e-10,
        )


class TestCircuitSampling:
    def test_sample_distribution(self):
        ct = build_test_circuit(Circuit(4))
        cd = build_test_circuit(CircuitDense(4))
        pdense = np.abs(np.asarray(cd.to_dense()).reshape(-1)) ** 2
        samples = list(ct.sample(400, seed=42))
        cnt = collections.Counter(samples)
        emp = np.array(
            [cnt.get(np.binary_repr(i, 4), 0) / 400 for i in range(16)]
        )
        tv = 0.5 * np.abs(emp - pdense).sum()
        assert tv < 0.15

    def test_sample_group_sizes(self):
        ct = build_test_circuit(Circuit(4))
        for gs in (1, 2, 4):
            s = next(iter(ct.sample(1, seed=1, group_size=gs)))
            assert len(s) == 4
            assert set(s) <= {"0", "1"}

    def test_mps_sampling(self):
        cm = build_test_circuit(CircuitMPS(4))
        cd = build_test_circuit(CircuitDense(4))
        pdense = np.abs(np.asarray(cd.to_dense()).reshape(-1)) ** 2
        samples = list(cm.sample(400, seed=0))
        cnt = collections.Counter(samples)
        emp = np.array(
            [cnt.get(np.binary_repr(i, 4), 0) / 400 for i in range(16)]
        )
        assert 0.5 * np.abs(emp - pdense).sum() < 0.15


class TestCircuitFeatures:
    def test_gate_round_tags(self):
        circ = Circuit(2)
        circ.h(0, gate_round=0)
        circ.cx(0, 1, gate_round=1)
        psi = circ.psi
        assert "ROUND_0" in psi.tag_map
        assert "GATE_0" in psi.tag_map

    def test_apply_gate_raw(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
        Q, _ = np.linalg.qr(A)
        c1 = Circuit(3).apply_gate_raw(Q, (0, 2))
        c2 = CircuitDense(3).apply_gate_raw(Q, (0, 2))
        assert np.allclose(
            np.asarray(c1.to_dense()), np.asarray(c2.to_dense()),
            atol=1e-10,
        )

    def test_controls(self):
        c1 = Circuit(3)
        c1.apply_gate(Gate("X", (), (2,), controls=(0,)))
        c1b = Circuit(3)
        c1b.cx(0, 2)
        # |000> -> both give |000>
        assert abs(
            complex(c1.amplitude("000")) -
            complex(c1b.amplitude("000"))
        ) < 1e-12

    def test_lightcone_smaller_than_full(self):
        circ = Circuit(8)
        for q in range(8):
            circ.h(q)
        for q in range(0, 7):
            circ.cx(q, q + 1)
        # qubit 0's reverse lightcone excludes most later gates
        tags, cone = circ.get_reverse_lightcone_tags((0,))
        assert len(cone) < 8 or len(tags) < circ.num_gates

    def test_xeb_ex_porter_thomas(self):
        # deep random circuit approaches XEB = 1
        circ = circ_rand_supremacy_like(8, 20, seed=0)
        assert abs(circ.xeb_ex() - 1.0) < 0.5

    def test_fidelity_estimate_mps(self):
        circ = CircuitMPS(6, max_bond=2)
        rng = np.random.default_rng(1)
        for d in range(4):
            for q in range(6):
                circ.u3(*rng.uniform(0, np.pi, 3), q)
            for q in range(d % 2, 5, 2):
                circ.cx(q, q + 1)
        f = circ.fidelity_estimate()
        assert 0 < f <= 1.0 + 1e-9


class TestQASM:
    def test_openqasm2_roundtrip(self):
        qasm = """
        OPENQASM 2.0;
        include "qelib1.inc";
        qreg q[3];
        creg c[3];
        h q[0];
        cx q[0],q[1];
        rz(pi/4) q[2];
        u3(0.1,0.2,0.3) q[1];
        ccx q[0],q[1],q[2];
        """
        circ = Circuit.from_openqasm2_str(qasm)
        assert circ.N == 3
        assert circ.num_gates == 5
        # same circuit by hand
        ref = CircuitDense(3)
        ref.h(0)
        ref.cx(0, 1)
        ref.rz(np.pi / 4, 2)
        ref.u3(0.1, 0.2, 0.3, 1)
        ref.ccx(0, 1, 2)
        assert np.allclose(
            np.asarray(circ.to_dense()), np.asarray(ref.to_dense()),
            atol=1e-10,
        )

    def test_qsim(self):
        qsim = """4
        0 h 0
        0 h 1
        1 cz 0 1
        1 rx 2 0.25
        2 fs 2 3 0.4 0.1
        """
        circ = Circuit.from_qsim_str(qsim)
        assert circ.N == 4
        assert circ.num_gates == 5
        ref = CircuitDense(4)
        ref.h(0)
        ref.h(1)
        ref.cz(0, 1)
        ref.rx(0.25, 2)
        ref.fsim(0.4, 0.1, 2, 3)
        assert np.allclose(
            np.asarray(circ.to_dense()), np.asarray(ref.to_dense()),
            atol=1e-10,
        )


class TestCircuitGen:
    def test_qaoa(self):
        terms = {(0, 1): 1.0, (1, 2): 1.0, (0, 2): 1.0}
        circ = circ_qaoa(terms, 2, [0.1, 0.2], [0.3, 0.4])
        assert circ.N == 3
        psi = np.asarray(circ.to_dense())
        assert abs(np.linalg.norm(psi) - 1) < 1e-10

    def test_supremacy_like_agrees_with_dense(self):
        circ = circ_rand_supremacy_like(10, 8, seed=3)
        cd = CircuitDense(10).apply_gates(circ.gates)
        b = "0" * 10
        assert abs(
            complex(circ.amplitude(b)) - complex(cd.amplitude(b))
        ) < 1e-10


class TestSampleGateByGate:
    def test_ghz(self):
        circ = Circuit(N=4)
        circ.apply_gate("H", 0)
        for q in range(3):
            circ.apply_gate("CNOT", q, q + 1)
        samples = list(
            circ.sample_gate_by_gate(20, group_size=2, seed=0)
        )
        assert all(s in ("0000", "1111") for s in samples)

    def test_statistics_match_exact(self):
        from quimb_tpu.tensor.circuit_gen import circ_ansatz_1D_rand

        circ = circ_ansatz_1D_rand(4, 3, seed=2)
        psi = np.asarray(circ.to_dense()).ravel()
        p_exact = np.abs(psi) ** 2
        from collections import Counter

        cnt = Counter(
            circ.sample_gate_by_gate(300, group_size=3, seed=1)
        )
        p_emp = np.zeros(16)
        for b, c in cnt.items():
            p_emp[int(b, 2)] = c / 300
        assert 0.5 * np.abs(p_emp - p_exact).sum() < 0.2


class TestCircuitPEPSAndPEPO:
    """Behavior parity of the 2D Schrodinger (CircuitPEPS) and
    Heisenberg (CircuitPEPOSimpleUpdate) simulators against the dense
    simulator on a 2x2 grid (reference circuit/peps.py, pepo.py)."""

    GATES = [
        ("ry", 0.7, 0), ("ry", -0.4, 1), ("ry", 1.1, 2),
        ("ry", 0.2, 3), ("cz", 0, 1), ("cz", 2, 3), ("cx", 0, 2),
        ("rx", 0.3, 1), ("rz", 0.5, 3), ("cx", 1, 3), ("ry", 0.9, 3),
    ]

    def _dense(self):
        from quimb_tpu.tensor.circuit import CircuitDense

        cd = CircuitDense(4)
        for g in self.GATES:
            cd.apply_gate(*g)
        return cd

    def test_circuit_peps_expectations_and_amplitudes(self):
        import quimb_tpu as qu
        from quimb_tpu.tensor.circuit import CircuitPEPS

        cd = self._dense()
        cp = CircuitPEPS(2, 2, max_bond=8)
        for g in self.GATES:
            cp.apply_gate(*g)
        Z = np.asarray(qu.pauli("Z"))
        for q in range(4):
            ed = complex(cd.local_expectation(Z, q)).real
            ep = complex(cp.local_expectation(Z, q)).real
            assert abs(ed - ep) < 1e-10
        for b in ("0000", "0101", "1111"):
            assert abs(
                complex(cd.amplitude(b)) - complex(cp.amplitude(b))
            ) < 1e-10

    def test_circuit_pepo_heisenberg_picture(self):
        import quimb_tpu as qu
        from quimb_tpu.tensor.circuit import CircuitPEPOSimpleUpdate

        cd = self._dense()
        co = CircuitPEPOSimpleUpdate(
            N=4, edges=[(0, 1), (2, 3), (0, 2), (1, 3)], max_bond=8,
        )
        for g in self.GATES:
            co.apply_gate(*g)
        Z = np.asarray(qu.pauli("Z"))
        X = np.asarray(qu.pauli("X"))
        for q in range(4):
            for op in (Z, X):
                ed = complex(cd.local_expectation(op, q)).real
                eo = complex(co.local_expectation(op, q)).real
                assert abs(ed - eo) < 1e-10

    def test_circuit_peps_equilibrate_preserves_state(self):
        from quimb_tpu.tensor.circuit import CircuitPEPS

        cp = CircuitPEPS(2, 2, max_bond=8)
        for g in self.GATES:
            cp.apply_gate(*g)
        a0 = complex(cp.amplitude("0101"))
        cp.equilibrate()
        assert abs(complex(cp.amplitude("0101")) - a0) < 1e-10


class TestGateRegistryParity:
    def test_xxplusyy_alias_matches_dense(self):
        """Reference-named XXPLUSYY/XXMINUSYY aliases (reference
        gates.py:570,601) agree with the canonical registrations and
        with direct dense application."""
        import quimb_tpu as qu
        from quimb_tpu.tensor.circuit import Circuit
        from quimb_tpu.tensor.circuit.gates import (
            PARAM_GATES, GATE_SIZE,
        )

        for name in ("XXPLUSYY", "XXMINUSYY"):
            assert name in PARAM_GATES
            assert GATE_SIZE[name] == 2

        theta, beta = 0.7, 0.3
        U = np.asarray(PARAM_GATES["XXPLUSYY"](theta, beta))
        Ucanon = np.asarray(PARAM_GATES["XX_PLUS_YY"](theta, beta))
        assert np.allclose(U, Ucanon)
        # unitary
        assert np.allclose(U.conj().T @ U, np.eye(4), atol=1e-12)

        c = Circuit(2)
        c.h(0)
        c.h(1)
        c.apply_gate("XXPLUSYY", theta, beta, 0, 1)
        psi = np.asarray(c.to_dense()).reshape(-1)
        plus = np.full(4, 0.5, dtype=complex)
        want = U @ plus
        assert np.allclose(psi, want, atol=1e-6)

        Um = np.asarray(PARAM_GATES["XXMINUSYY"](theta, beta))
        assert np.allclose(
            Um, np.asarray(PARAM_GATES["XX_MINUS_YY"](theta, beta))
        )
        assert np.allclose(Um.conj().T @ Um, np.eye(4), atol=1e-12)
