"""Behavior tests for the Evolution class (reference
``tests/test_matrix/test_evo.py`` patterns: closed-form physics,
method cross-agreement, Lindblad decay, callbacks, int_stop)."""

import numpy as np
import pytest

import quimb_tpu as qu


def p1(psi):
    """Probability of |1> for a qubit ket."""
    return float(abs(np.asarray(psi).reshape(-1)[1]) ** 2)


class TestClosedForm:
    @pytest.mark.parametrize("method", ["integrate", "solve", "expm"])
    def test_rabi_oscillation(self, method):
        """H = sigma_x on |0>: P(1)(t) = sin^2(t) exactly."""
        H = np.asarray(qu.pauli("X"), dtype=complex)
        psi0 = qu.basis_vec(0, 2)
        evo = qu.Evolution(psi0, H, method=method)
        for t in (0.3, 0.7, 1.9):
            evo.update_to(t)
            assert p1(evo.pt) == pytest.approx(np.sin(t) ** 2,
                                               abs=1e-6)

    @pytest.mark.parametrize("method", ["integrate", "solve", "expm"])
    def test_norm_and_energy_conserved(self, method):
        H = np.asarray(qu.rand_herm(8, seed=7))
        psi0 = np.asarray(qu.rand_ket(8, seed=8))
        e0 = complex(qu.expec(H, psi0)).real
        evo = qu.Evolution(psi0, H, method=method)
        evo.update_to(2.5)
        pt = np.asarray(evo.pt)
        assert np.linalg.norm(pt) == pytest.approx(1.0, abs=1e-6)
        assert complex(qu.expec(H, pt)).real == pytest.approx(
            e0, abs=1e-5
        )


class TestMethodAgreement:
    def test_ket_three_methods_agree(self):
        H = np.asarray(qu.ham_heis(3, sparse=False))
        psi0 = np.asarray(qu.rand_ket(8, seed=1))
        t = 1.3
        states = {}
        for method in ("integrate", "solve", "expm"):
            evo = qu.Evolution(psi0, H, method=method)
            evo.update_to(t)
            states[method] = np.asarray(evo.pt).reshape(-1)
        for m in ("solve", "expm"):
            ov = abs(np.vdot(states["integrate"], states[m]))
            assert ov == pytest.approx(1.0, abs=1e-6)

    def test_dop_solve_vs_integrate(self):
        H = np.asarray(qu.rand_herm(4, seed=3))
        rho0 = np.asarray(qu.rand_rho(4, seed=4))
        r1 = qu.Evolution(rho0, H, method="solve")
        r1.update_to(0.9)
        r2 = qu.Evolution(rho0, H, method="integrate")
        r2.update_to(0.9)
        assert np.allclose(np.asarray(r1.pt), np.asarray(r2.pt),
                           atol=1e-6)

    def test_sparse_ham_matches_dense(self):
        Hs = qu.ham_heis(4, sparse=True)
        Hd = np.asarray(qu.ham_heis(4, sparse=False))
        psi0 = np.asarray(qu.rand_ket(16, seed=5))
        e1 = qu.Evolution(psi0, Hs, method="expm")
        e1.update_to(0.8)
        e2 = qu.Evolution(psi0, Hd, method="solve")
        e2.update_to(0.8)
        ov = abs(np.vdot(np.asarray(e1.pt).reshape(-1),
                         np.asarray(e2.pt).reshape(-1)))
        assert ov == pytest.approx(1.0, abs=1e-6)


class TestLindblad:
    def test_amplitude_damping_decay(self):
        """Pure sigma_- damping with H=0: rho_11(t) = e^{-g t}."""
        H = np.zeros((2, 2), dtype=complex)
        sm = np.array([[0, 1], [0, 0]], dtype=complex)  # lowers |1>
        g = 0.7
        rho0 = np.array([[0, 0], [0, 1.0]], dtype=complex)
        evo = qu.Evolution(rho0, (H, [sm], g), method="integrate")
        for t in (0.5, 1.2):
            evo.update_to(t)
            rho = np.asarray(evo.pt)
            assert np.trace(rho).real == pytest.approx(1.0, abs=1e-6)
            assert rho[1, 1].real == pytest.approx(
                np.exp(-g * t), abs=1e-5
            )

    def test_dephasing_kills_coherence(self):
        H = np.zeros((2, 2), dtype=complex)
        sz = np.asarray(qu.pauli("Z"), dtype=complex)
        plus = np.asarray(qu.plus()).reshape(-1)
        rho0 = np.outer(plus, plus.conj())
        g = 0.5
        evo = qu.Evolution(rho0, (H, [sz], g), method="integrate")
        evo.update_to(2.0)
        rho = np.asarray(evo.pt)
        # populations untouched; coherence decays at exactly 2g
        assert rho[0, 0].real == pytest.approx(0.5, abs=1e-6)
        assert abs(rho[0, 1]) == pytest.approx(
            0.5 * np.exp(-2 * g * 2.0), abs=1e-5
        )


class TestTimeDependent:
    def test_adiabatic_ground_state_following(self):
        """Slow sweep H(t) = (1-s) Z + s X keeps the ground state."""
        Z = np.asarray(qu.pauli("Z"), dtype=complex)
        X = np.asarray(qu.pauli("X"), dtype=complex)
        T = 30.0

        def ham(t):
            s = min(t / T, 1.0)
            return (1 - s) * Z + s * X

        psi0 = qu.basis_vec(1, 2)  # ground state of Z
        evo = qu.Evolution(psi0, ham, method="integrate")
        evo.update_to(T)
        gs = np.array([1, -1]) / np.sqrt(2)  # ground state of X
        ov = abs(np.vdot(gs, np.asarray(evo.pt).reshape(-1))) ** 2
        assert ov > 0.99


class TestCallbacksAndStop:
    def test_single_compute(self):
        H = np.asarray(qu.pauli("X"), dtype=complex)
        psi0 = qu.basis_vec(0, 2)
        evo = qu.Evolution(
            psi0, H, method="solve",
            compute=lambda t, p: p1(p),
        )
        for t in (0.5, 1.0, 1.5):
            evo.update_to(t)
        assert len(evo.results) == 3
        assert evo.results[1] == pytest.approx(np.sin(1.0) ** 2,
                                               abs=1e-8)

    def test_multi_compute_dict(self):
        H = np.asarray(qu.rand_herm(4, seed=11))
        psi0 = np.asarray(qu.rand_ket(4, seed=12))
        evo = qu.Evolution(
            psi0, H, method="solve",
            compute={
                "t": lambda t, p: t,
                "energy": lambda t, p: complex(qu.expec(H, p)).real,
            },
        )
        ts = [0.2, 0.4, 0.6]
        for t in ts:
            evo.update_to(t)
        assert evo.results["t"] == pytest.approx(ts)
        assert np.ptp(evo.results["energy"]) < 1e-6

    def test_int_stop_halts_early(self):
        H = np.asarray(qu.pauli("X"), dtype=complex)
        psi0 = qu.basis_vec(0, 2)
        evo = qu.Evolution(
            psi0, H, method="integrate",
            int_stop=lambda t, p: int(p1(p.reshape(-1, 1)) > 0.5),
        )
        evo.update_to(3.0)
        # P(1) crosses 0.5 at t = pi/4 — well before t=3
        assert evo.t < 1.5

    def test_at_times_generator(self):
        H = np.asarray(qu.pauli("X"), dtype=complex)
        psi0 = qu.basis_vec(0, 2)
        evo = qu.Evolution(psi0, H, method="solve")
        ts = np.linspace(0.1, 1.0, 5)
        states = list(evo.at_times(ts))
        assert len(states) == 5
        for t, s in zip(ts, states):
            assert p1(s) == pytest.approx(np.sin(t) ** 2, abs=1e-8)
