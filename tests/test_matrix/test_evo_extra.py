"""Evolution extras (reference tests/test_matrix/test_evo.py
behaviors not yet covered): the standalone derivative functions
(schrodinger_eq_ket/dop, lindblad_eq) against closed forms, int_stop
early-exit semantics, at_times generation, time-dependent
Hamiltonians, and Lindblad steady states."""

import numpy as np
import pytest

import quimb_tpu as qu
from quimb_tpu.evo import (
    Evolution,
    lindblad_eq,
    schrodinger_eq_dop,
    schrodinger_eq_ket,
)


def A(x):
    return np.asarray(x)


class TestDerivativeFunctions:
    def test_schrodinger_ket_closed_form(self):
        H = A(qu.pauli("Z")).astype(complex)
        psi = A(qu.qu([1.0, 1.0], qtype="ket", normalized=True))
        f = schrodinger_eq_ket(qu.qu(H))
        dpsi = A(f(psi.reshape(-1)))
        expect = -1j * H @ psi.reshape(-1)
        assert np.allclose(dpsi, expect, atol=1e-12)

    def test_schrodinger_dop_closed_form(self):
        H = A(qu.rand_herm(4, seed=1))
        rho = A(qu.rand_rho(4, seed=2))
        f = schrodinger_eq_dop(qu.qu(H))
        drho = A(f(rho))
        expect = -1j * (H @ rho - rho @ H)
        assert np.allclose(drho, expect, atol=1e-10)

    def test_lindblad_closed_form(self):
        H = A(qu.rand_herm(2, seed=3))
        L = A(qu.qu(np.array([[0.0, 1.0], [0.0, 0.0]])))
        gamma = 0.7
        rho = A(qu.rand_rho(2, seed=4))
        f = lindblad_eq(qu.qu(H), [qu.qu(L)], gamma)
        drho = A(f(rho))
        expect = -1j * (H @ rho - rho @ H) + gamma * (
            L @ rho @ L.conj().T
            - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L)
        )
        assert np.allclose(drho, expect, atol=1e-10)


class TestEvolutionControl:
    def test_int_stop_halts_early(self):
        H = qu.ham_heis(2, sparse=False)
        p0 = qu.computational_state("01")

        def int_stop(t, pt):
            return 1 if t > 0.5 else 0

        evo = Evolution(p0, H, int_stop=int_stop, method="integrate")
        evo.update_to(10.0)
        # stopped well before the requested time
        assert 0.5 <= evo.t < 10.0

    def test_int_stop_never_fires(self):
        H = qu.ham_heis(2, sparse=False)
        p0 = qu.computational_state("01")
        evo = Evolution(p0, H, int_stop=lambda t, p: 0,
                        method="integrate")
        evo.update_to(1.0)
        assert evo.t == pytest.approx(1.0)

    @pytest.mark.parametrize("method", ["integrate", "solve", "expm"])
    def test_at_times_yields_states(self, method):
        H = qu.ham_heis(2, sparse=(method == "expm"))
        p0 = qu.computational_state("01")
        evo = Evolution(p0, H, method=method)
        ts = [0.2, 0.4, 0.8]
        states = []
        for pt in evo.at_times(ts):
            states.append(A(pt))
        assert len(states) == 3
        assert evo.t == pytest.approx(0.8)
        # all normalized
        for s in states:
            assert np.linalg.norm(s) == pytest.approx(1.0, abs=1e-6)

    def test_compute_callback_records_each_time(self):
        H = qu.ham_heis(2, sparse=False)
        p0 = qu.computational_state("01")
        Z0 = qu.ikron(qu.pauli("Z"), [2, 2], 0)

        def zexp(t, pt):
            return float(np.real(A(qu.expectation(Z0, pt))))

        evo = Evolution(p0, H, compute=zexp, method="solve")
        for _ in evo.at_times([0.1, 0.2, 0.3]):
            pass
        assert len(evo.results) == 3
        # <Z0> starts at +1 and oscillates downward initially
        assert evo.results[0] < 1.0

    def test_multi_compute_keys(self):
        H = qu.ham_heis(2, sparse=False)
        p0 = qu.computational_state("01")
        evo = Evolution(
            p0, H,
            compute={
                "t": lambda t, p: t,
                "norm": lambda t, p: float(np.linalg.norm(A(p))),
            },
            method="solve",
        )
        for _ in evo.at_times([0.5, 1.0]):
            pass
        assert evo.results["t"] == pytest.approx([0.5, 1.0])
        assert np.allclose(evo.results["norm"], 1.0, atol=1e-8)


class TestTimedepAndLindblad:
    def test_timedep_matches_piecewise_constant(self):
        # slowly-varying H(t): integrate vs many small expm steps
        H0 = A(qu.ham_heis(2, sparse=False))
        H1 = A(qu.ikron(qu.pauli("X"), [2, 2], 0))

        def ham_t(t):
            return qu.qu(H0 + 0.3 * np.sin(t) * H1)

        p0 = qu.computational_state("01")
        evo = Evolution(p0, ham_t, method="integrate")
        evo.update_to(0.6)
        got = A(evo.pt).reshape(-1)

        # piecewise-constant reference with tiny steps
        psi = A(p0).reshape(-1).astype(complex)
        nst = 600
        dt = 0.6 / nst
        for i in range(nst):
            t_mid = (i + 0.5) * dt
            Ht = H0 + 0.3 * np.sin(t_mid) * H1
            el, ev = np.linalg.eigh(Ht)
            psi = (ev * np.exp(-1j * el * dt)) @ (ev.conj().T @ psi)
        fid = abs(np.vdot(psi, got))
        assert fid == pytest.approx(1.0, abs=1e-5)

    def test_lindblad_decay_to_ground(self):
        # amplitude damping: |1> decays to |0>
        H = qu.qu(np.zeros((2, 2)))
        L = qu.qu(np.array([[0.0, 1.0], [0.0, 0.0]]))
        rho0 = qu.dop(qu.computational_state("1"))
        evo = Evolution(rho0, (H, [L], 1.0), method="integrate")
        evo.update_to(8.0)
        rho = A(evo.pt)
        assert rho[0, 0].real == pytest.approx(1.0, abs=1e-3)
        assert rho[1, 1].real == pytest.approx(0.0, abs=1e-3)

    def test_lindblad_preserves_trace(self):
        H = qu.rand_herm(4, seed=5)
        Ls = [qu.qu(np.diag([1.0, -1.0, 1.0, -1.0]).astype(complex))]
        rho0 = qu.rand_rho(4, seed=6)
        evo = Evolution(rho0, (H, Ls, 0.4), method="integrate")
        for pt in evo.at_times([0.3, 0.9]):
            tr = complex(np.trace(A(pt)))
            assert tr.real == pytest.approx(1.0, abs=1e-6)
            assert abs(tr.imag) < 1e-8

    def test_dephasing_reaches_diagonal_steady_state(self):
        H = qu.qu(np.zeros((2, 2)))
        Lz = qu.pauli("Z")
        plus = qu.plus() if hasattr(qu, "plus") else qu.qu(
            np.array([1.0, 1.0]) / np.sqrt(2), qtype="ket")
        rho0 = qu.dop(plus)
        evo = Evolution(rho0, (H, [Lz], 1.0), method="integrate")
        evo.update_to(5.0)
        rho = A(evo.pt)
        assert abs(rho[0, 1]) < 1e-3
        assert rho[0, 0].real == pytest.approx(0.5, abs=1e-6)
