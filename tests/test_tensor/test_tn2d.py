"""2D stack tests: PEPS, boundary contraction, environments,
SimpleUpdate — against exact contraction / ED."""

import numpy as np
import pytest

import quimb_tpu.tensor.tn2d as t2
from quimb_tpu.gen.operators import ham_heis_2D


class TestPEPS:
    def test_rand_structure(self):
        psi = t2.PEPS_rand(3, 4, 3, seed=0)
        assert psi.Lx == 3 and psi.Ly == 4
        assert psi.num_tensors == 12
        assert psi.max_bond() == 3
        corner = psi[psi.site_tag(0, 0)]
        assert corner.ndim == 3  # u, r, p
        center = psi[psi.site_tag(1, 1)]
        assert center.ndim == 5

    def test_computational_state(self):
        psi = t2.PEPS_computational_state("0110", Lx=2, Ly=2)
        d = np.asarray(psi.to_dense()).reshape(-1)
        assert abs(d[0b0110] - 1.0) < 1e-12

    def test_norm2_boundary_vs_exact(self):
        psi = t2.PEPS_rand(3, 3, 2, seed=0, dtype="float64")
        exact = float(np.linalg.norm(np.asarray(psi.to_dense())) ** 2)
        bdry = float(np.real(psi.norm2(max_bond=16)))
        assert abs(exact - bdry) / exact < 1e-10

    def test_contract_boundary_direction_sequences(self):
        psi = t2.PEPS_rand(3, 3, 2, seed=1, dtype="float64")
        norm = psi.make_norm()
        exact = float(np.linalg.norm(np.asarray(psi.to_dense())) ** 2)
        for seq in (("xmin",), ("xmax",), ("ymin",), ("ymax",),
                    ("xmin", "xmax"), ("ymin", "ymax")):
            val = float(np.real(norm.contract_boundary(
                max_bond=16, sequence=seq
            )))
            assert abs(val - exact) / exact < 1e-9, seq

    def test_gate_dense_match(self):
        from quimb_tpu.gen.operators import pauli, CNOT

        psi = t2.PEPS_rand(2, 3, 2, seed=2, dtype="complex128")
        X = np.asarray(pauli("X"))
        psi2 = psi.gate(X, (0, 1), contract=True)
        from quimb_tpu.core import ikron

        # site ordering: row-major (i * Ly + j)
        expected = ikron(X, (2,) * 6, 1) @ psi.to_dense()
        assert np.allclose(
            np.asarray(psi2.to_dense()), np.asarray(expected),
            atol=1e-10,
        )
        # 2-site gate split
        G = np.asarray(CNOT())
        psi3 = psi.gate(G, ((0, 1), (1, 1)), contract="reduce-split",
                        max_bond=8)
        expected = (
            np.asarray(
                __import__("quimb_tpu").core.pkron(G, (2,) * 6, (1, 4))
            ) @ np.asarray(psi.to_dense())
        )
        assert np.allclose(
            np.asarray(psi3.to_dense()), expected, atol=1e-8
        )

    def test_local_expectation_vs_dense(self):
        psi = t2.PEPS_rand(3, 3, 2, seed=3, dtype="float64")
        ham = t2.ham_2d_heis(3, 3)
        ev = float(np.real(psi.compute_local_expectation(
            ham.terms, max_bond=24
        )))
        Hd = np.asarray(ham_heis_2D(3, 3))
        v = np.asarray(psi.to_dense()).reshape(-1)
        ed = float(np.real(v.conj() @ Hd @ v / (v.conj() @ v)))
        assert abs(ev - ed) < 1e-8


class TestSimpleUpdate:
    @pytest.mark.slow
    def test_heis_3x3_groundstate(self):
        ham = t2.ham_2d_heis(3, 3)
        psi0 = t2.PEPS_rand(3, 3, 2, seed=2, dtype="float64")
        su = t2.SimpleUpdate(psi0, ham, D=3,
                             compute_energy_final=False)
        for tau in (0.3, 0.1, 0.05):
            su.evolve(20, tau=tau)
        E = su.compute_energy()
        w0 = np.linalg.eigvalsh(np.asarray(ham_heis_2D(3, 3)))[0]
        assert abs(E - w0) / abs(w0) < 0.08

    def test_energy_decreases(self):
        ham = t2.ham_2d_ising(3, 3, j=-1.0, bx=0.5)
        psi0 = t2.PEPS_rand(3, 3, 2, seed=4, dtype="float64")
        su = t2.SimpleUpdate(psi0, ham, D=2, compute_energy_every=10,
                             compute_energy_final=True)
        su.evolve(14, tau=0.1)
        assert su.energies[-1] < su.energies[0] + 1e-6


class TestFullUpdate:
    @pytest.mark.slow
    def test_heis_3x3_beats_simple_update_bound(self):
        ham = t2.ham_2d_heis(3, 3)
        psi0 = t2.PEPS_rand(3, 3, 2, seed=2, dtype="float64")
        fu = t2.FullUpdate(psi0, ham, D=3, compute_energy_final=False)
        for tau in (0.3, 0.1):
            fu.evolve(6, tau=tau)
        E = fu.compute_energy()
        w0 = np.linalg.eigvalsh(np.asarray(ham_heis_2D(3, 3)))[0]
        # environment-fitted updates should get much closer than the
        # 8% SimpleUpdate bound
        assert abs(E - w0) / abs(w0) < 0.03


class TestFullUpdateStrategies:
    """Autodiff-fidelity gate fitting and the env recompute policy
    (reference gate_full_update_autodiff_fidelity tn2d/tebd.py:851 and
    compute_envs_every :1164)."""

    def _anneal(self, fu):
        fu.evolve(10, tau=0.3)
        fu.evolve(12, tau=0.1)
        fu.evolve(12, tau=0.01)
        return float(fu.compute_energy())

    def test_autodiff_matches_als_2x2(self):
        ham = t2.ham_2d_heis(2, 2)
        es = {}
        for strat in ("als", "autodiff"):
            psi0 = t2.PEPS_rand(2, 2, 2, seed=7, dtype="float64")
            fu = t2.FullUpdate(psi0, ham, D=2, chi=16,
                               fit_strategy=strat,
                               compute_energy_final=False)
            es[strat] = self._anneal(fu)
        # both reach the same D=2 variational optimum
        assert es["autodiff"] == pytest.approx(es["als"], abs=2e-3)

    def test_compute_envs_every_close_to_fresh(self):
        ham = t2.ham_2d_heis(2, 2)
        psi0 = t2.PEPS_rand(2, 2, 2, seed=7, dtype="float64")
        fu = t2.FullUpdate(psi0, ham, D=2, chi=16,
                           fit_strategy="als", compute_envs_every=4,
                           compute_energy_final=False)
        e = self._anneal(fu)
        psi1 = t2.PEPS_rand(2, 2, 2, seed=7, dtype="float64")
        fu1 = t2.FullUpdate(psi1, ham, D=2, chi=16,
                            fit_strategy="als",
                            compute_energy_final=False)
        e1 = self._anneal(fu1)
        assert e == pytest.approx(e1, abs=5e-3)

    def test_invalid_strategy_raises(self):
        ham = t2.ham_2d_heis(2, 2)
        psi0 = t2.PEPS_rand(2, 2, 2, seed=0, dtype="float64")
        with pytest.raises(ValueError):
            t2.FullUpdate(psi0, ham, D=2, fit_strategy="bogus")


class TestPEPO:
    def test_identity(self):
        I = t2.PEPO_identity(2, 2)
        t = I.contract(
            ..., output_inds=[
                I.upper_ind(i, j) for i in range(2) for j in range(2)
            ] + [
                I.lower_ind(i, j) for i in range(2) for j in range(2)
            ], preserve_tensor=True,
        )
        mat = np.asarray(t.data).reshape(16, 16)
        assert np.allclose(mat, np.eye(16), atol=1e-12)


class TestBoundaryModes:
    """Every boundary-contraction mode agrees with exact contraction
    (reference mode variants tensor_2d.py:1273,1486,1659 and
    tensor_2d_compress.py)."""

    def test_all_modes_4x4_norm_vs_exact(self):
        psi = t2.PEPS_rand(4, 4, 2, seed=2, dtype="float64")
        exact = float(np.linalg.norm(np.asarray(psi.to_dense())) ** 2)
        for mode in ("mps", "projector2d", "full-bond"):
            norm = psi.make_norm()
            val = float(np.real(norm.contract_boundary(
                max_bond=32, mode=mode,
            )))
            assert abs(val - exact) / exact < 1e-8, mode

    def test_1d_method_fallthrough_modes_norm(self):
        # boundary compression via the structure-preserving 1D methods
        # (reference's mode='mps' with compress method options,
        # tensor_2d.py:1273 'via-1d' class)
        psi = t2.PEPS_rand(3, 3, 2, seed=4, dtype="float64")
        exact = float(np.linalg.norm(np.asarray(psi.to_dense())) ** 2)
        for mode in ("dm", "zipup", "projector"):
            norm = psi.make_norm()
            val = float(np.real(norm.contract_boundary(
                max_bond=32, mode=mode,
            )))
            assert abs(val - exact) / exact < 1e-6, mode

    def test_tensor_network_2d_compress_dispatch(self):
        from quimb_tpu.tensor.tn2d.compress import (
            tensor_network_2d_compress,
        )

        psi = t2.PEPS_rand(3, 3, 3, seed=5, dtype="float64")
        for method in ("local-early", "local-late"):
            tnc = tensor_network_2d_compress(
                psi, max_bond=3, method=method)
            assert tnc.max_bond() <= 3
            # non-truncating compression: fidelity must be ~1
            # (scale-invariant — the AG methods strip overall scale)
            v1 = np.asarray(psi.to_dense()).reshape(-1)
            v2 = np.asarray(tnc.to_dense()).reshape(-1)
            f = abs(v1.conj() @ v2) / (
                np.linalg.norm(v1) * np.linalg.norm(v2))
            assert f == pytest.approx(1.0, abs=1e-6), method
        # truncating compression reduces the bond as requested
        tnc2 = tensor_network_2d_compress(
            psi, max_bond=2, method="local-early")
        assert tnc2.max_bond() <= 2
