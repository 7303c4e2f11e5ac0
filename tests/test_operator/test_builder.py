"""SparseOperatorBuilder / HilbertSpace tests — validated against the
exact dense layer."""

import numpy as np
import pytest

import quimb_tpu as qu
from quimb_tpu.operator import (
    HilbertSpace,
    SparseOperatorBuilder,
    fermi_hubbard_from_edges,
    heisenberg_from_edges,
)


class TestHilbertSpace:
    def test_sizes(self):
        assert HilbertSpace(5).size == 32
        assert HilbertSpace(5, "Z2", 0).size == 16
        assert HilbertSpace(6, "U1", 3).size == 20
        assert HilbertSpace(6, "U1U1", (1, 2)).size == 3 * 3

    def test_rank_unrank_roundtrip(self):
        hs = HilbertSpace(8, "U1", 4)
        cs = hs.get_configs()
        assert (hs.rank(cs) == np.arange(cs.size)).all()
        assert (hs.unrank(np.arange(cs.size)) == cs).all()

    def test_bits(self):
        hs = HilbertSpace(4)
        bits = hs.config_to_bits([0b1010])
        assert (bits[0] == [0, 1, 0, 1]).all()
        assert hs.bits_to_config(bits)[0] == 0b1010


class TestBuilder:
    def test_heisenberg_matches_dense(self):
        edges = [(i, i + 1) for i in range(5)]
        H = heisenberg_from_edges(edges)
        Hm = H.build_sparse_matrix()
        Hd = np.asarray(qu.ham_heis(6)).real
        assert np.allclose(Hm.toarray(), Hd, atol=1e-12)

    def test_u1_sector_spectrum_subset(self):
        edges = [(i, i + 1) for i in range(5)]
        hs = HilbertSpace(6, "U1", 3)
        H = heisenberg_from_edges(edges, hilbert_space=hs)
        w_sector = np.linalg.eigvalsh(H.build_sparse_matrix().toarray())
        w_full = np.linalg.eigvalsh(np.asarray(qu.ham_heis(6)).real)
        # sector spectrum is a subset of the full spectrum (incl. E0
        # for the S_z=0 heisenberg ground state)
        for w in w_sector:
            assert np.min(np.abs(w_full - w)) < 1e-10
        assert abs(w_sector[0] - w_full[0]) < 1e-10

    def test_device_matvec(self):
        edges = [(i, i + 1) for i in range(6)]
        H = heisenberg_from_edges(edges)
        Hs = H.build_sparse_ham()
        v = np.random.default_rng(0).standard_normal(2**7)
        y = np.asarray(Hs @ v)
        expected = H.build_sparse_matrix() @ v
        assert np.allclose(y, expected, atol=1e-12)

    def test_fermi_hubbard_jw(self):
        # 2-site Hubbard: exact spectrum known
        # H = -t sum_s (c0s† c1s + h.c.) + U (n0u n0d + n1u n1d)
        t, U = 1.0, 4.0
        H = fermi_hubbard_from_edges([(0, 1)], t=t, U=U)
        Hm = H.build_sparse_matrix().toarray()
        assert np.allclose(Hm, Hm.conj().T, atol=1e-12)
        w = np.linalg.eigvalsh(Hm)
        # half-filling singlet ground energy: U/2 - sqrt((U/2)^2 + 4t^2)
        e0 = U / 2 - np.sqrt((U / 2) ** 2 + 4 * t**2)
        assert np.min(np.abs(w - e0)) < 1e-10

    def test_fermionic_anticommutation(self):
        # {c_i, c_j†} = delta_ij via JW-built matrices
        H1 = SparseOperatorBuilder(hilbert_space=HilbertSpace(3))
        H1 += 1.0, ("c", 0)
        c0 = H1.build_sparse_matrix().toarray()
        H2 = SparseOperatorBuilder(hilbert_space=HilbertSpace(3))
        H2 += 1.0, ("cdag", 2)
        cd2 = H2.build_sparse_matrix().toarray()
        anti = c0 @ cd2 + cd2 @ c0
        assert np.allclose(anti, 0, atol=1e-12)
        H3 = SparseOperatorBuilder(hilbert_space=HilbertSpace(3))
        H3 += 1.0, ("cdag", 0)
        cd0 = H3.build_sparse_matrix().toarray()
        anti2 = c0 @ cd0 + cd0 @ c0
        assert np.allclose(anti2, np.eye(8), atol=1e-12)

    def test_build_mpo_matches_dense(self):
        edges = [(i, i + 1) for i in range(4)]
        H = heisenberg_from_edges(edges)
        mpo = H.build_mpo()
        Hd = np.asarray(qu.ham_heis(5)).real
        assert np.allclose(
            np.asarray(mpo.to_dense()).real, Hd, atol=1e-10
        )

    def test_build_local_ham(self):
        edges = [(i, i + 1) for i in range(4)]
        H = heisenberg_from_edges(edges)
        lham = H.build_local_ham()
        from quimb_tpu.gen.operators import _spin_op_np

        S = {s: np.asarray(_spin_op_np(s, 0.5)) for s in "xyz"}
        h2 = sum(np.kron(S[s], S[s]) for s in "xyz")
        assert np.allclose(
            np.asarray(lham.get_term((1, 2))), h2, atol=1e-12
        )

    def test_groundstate_with_device_lanczos(self):
        edges = [(i, i + 1) for i in range(9)]
        hs = HilbertSpace(10, "U1", 5)
        H = heisenberg_from_edges(edges, hilbert_space=hs)
        from quimb_tpu.core import SparseHam
        from quimb_tpu.linalg import eigh_lanczos
        import jax.numpy as jnp

        Hs = SparseHam(H.build_sparse_matrix())
        v0 = jnp.asarray(
            np.random.default_rng(0).standard_normal(hs.size)
        )
        lam, v = eigh_lanczos(Hs.matvec, v0, ncv=30, restarts=10)
        w0 = np.linalg.eigvalsh(np.asarray(qu.ham_heis(10)).real)[0]
        assert abs(float(lam) - w0) < 1e-9


class TestPEPOBuilder:
    def _pepo_to_dense(self, P, Lx, Ly):
        inds = [P.upper_ind(i, j) for i in range(Lx)
                for j in range(Ly)] + \
               [P.lower_ind(i, j) for i in range(Lx) for j in range(Ly)]
        t = P.contract(..., output_inds=tuple(inds),
                       preserve_tensor=True)
        d = 2 ** (Lx * Ly)
        return np.asarray(t.data).reshape(d, d)

    def test_tfim_exact(self):
        from quimb_tpu.gen.operators import pauli
        from quimb_tpu.operator import PEPO_nearest_neighbor
        from quimb_tpu.core import ham_from_terms

        X = np.asarray(pauli("X")).real
        Z = np.asarray(pauli("Z")).real
        Lx, Ly = 2, 3
        P = PEPO_nearest_neighbor(-1.0 * Z, Z, -0.5 * X, Lx, Ly)
        assert P.max_bond() == 3
        terms = []
        for i in range(Lx):
            for j in range(Ly):
                s = i * Ly + j
                terms.append((-0.5, (X,), (s,)))
                if i + 1 < Lx:
                    terms.append((-1.0, (Z, Z), (s, (i + 1) * Ly + j)))
                if j + 1 < Ly:
                    terms.append((-1.0, (Z, Z), (s, s + 1)))
        He = np.asarray(ham_from_terms(terms, (2,) * (Lx * Ly))).real
        assert np.abs(
            self._pepo_to_dense(P, Lx, Ly) - He
        ).max() < 1e-10

    def test_heisenberg_multi_pair_exact(self):
        from quimb_tpu.gen.operators import ham_heis_2D, spin_operator
        from quimb_tpu.operator import pepo_nearest_neighbor

        Sx = np.asarray(spin_operator("X"))
        Sy = np.asarray(spin_operator("Y"))
        Sz = np.asarray(spin_operator("Z"))
        P = pepo_nearest_neighbor(
            3, 3, [(Sx, Sx), (Sy, Sy), (Sz, Sz)]
        )
        assert P.max_bond() == 5
        He = np.asarray(ham_heis_2D(3, 3))
        assert np.abs(self._pepo_to_dense(P, 3, 3) - He).max() < 1e-10


class TestBuilderExtras:
    def test_fsm_mpo_optimal_bonds(self):
        edges = [(i, i + 1) for i in range(5)]
        H = heisenberg_from_edges(edges)
        mpo = H.build_mpo()
        # greedy state machine reaches the optimal bond dimension 5
        assert max(mpo.bond_size(i, i + 1) for i in range(5)) == 5
        Hd = np.asarray(qu.ham_heis(6)).real
        assert np.allclose(
            np.asarray(mpo.to_dense()).real, Hd, atol=1e-10
        )

    def test_fsm_mpo_random_couplings(self):
        rng = np.random.default_rng(0)
        B = SparseOperatorBuilder(hilbert_space=HilbertSpace(5))
        for _ in range(12):
            k = int(rng.integers(1, 4))
            sites = sorted(rng.choice(5, size=k, replace=False))
            ops = tuple(
                (str(rng.choice(["x", "z", "n"])), int(s))
                for s in sites
            )
            B += (float(rng.normal()),) + ops
        Hm = B.build_sparse_matrix().toarray().real
        M = np.asarray(B.build_mpo().to_dense()).real
        P = np.zeros((32, 32))
        for i in range(32):
            P[int(format(i, "05b")[::-1], 2), i] = 1
        assert np.abs(P @ Hm @ P.T - M).max() < 1e-8

    def test_toggles_and_raw_terms(self):
        B = SparseOperatorBuilder()
        B += 0.5, ("+", 0), ("-", 1)
        B += 0.5, ("+", 1), ("-", 0)
        assert len(B.terms_raw) == 2
        m0 = B.build_sparse_matrix().toarray()
        B.jordan_wigner_transform()
        B.jordan_wigner_transform(False)
        assert np.allclose(B.build_sparse_matrix().toarray(), m0)
        B.pauli_decompose(True)
        assert np.allclose(
            B.build_sparse_matrix().toarray(), m0, atol=1e-12
        )
        B.pauli_decompose(False)

    def test_coupling_and_exact_eval(self):
        B = SparseOperatorBuilder()
        B += 0.5, ("+", 0), ("-", 1)
        B += 0.5, ("+", 1), ("-", 0)
        cfgs, coeffs = B.flatconfig_coupling(
            np.array([1, 0], dtype=np.uint8)
        )
        assert cfgs.tolist() == [[0, 1]]
        assert coeffs[0] == pytest.approx(0.5)

        def amp(fc):
            return 1 / np.sqrt(2) if fc.sum() == 1 else 0.0

        assert B.evaluate_exact_flatconfigs(amp) == pytest.approx(0.5)

    def test_local_terms_and_ikron(self):
        edges = [(i, i + 1) for i in range(3)]
        H = heisenberg_from_edges(edges)
        lt = H.build_local_terms()
        assert all(v.shape == (4, 4) for v in lt.values())
        Hd = np.asarray(qu.ham_heis(4)).real
        assert np.allclose(
            np.asarray(H.build_matrix_ikron()).real, Hd, atol=1e-10
        )

    def test_show_and_state_machine(self, capsys):
        edges = [(0, 1)]
        H = heisenberg_from_edges(edges)
        H.show()
        out = capsys.readouterr().out
        assert "SparseOperatorBuilder" in out
        transitions, nstates = H.build_state_machine_greedy()
        assert nstates[0] == 2 and nstates[-1] == 2


class TestHilbertSpaceExtras:
    def test_flatconfig_roundtrips(self):
        hs = HilbertSpace(6, "U1", 3)
        for r in (0, 7, hs.size - 1):
            fc = hs.rank_to_flatconfig(r)
            assert fc.sum() == 3
            assert hs.flatconfig_to_rank(fc) == r
            cfg = hs.rank_to_config(r)
            assert hs.config_to_rank(cfg) == r

    def test_site_registry(self):
        hs = HilbertSpace(["a", "b", "c"])
        assert hs.site_to_reg("b") == 1
        assert hs.reg_to_site(2) == "c"
        assert hs.has_site("a") and not hs.has_site("z")
        assert hs.sizes == (2, 2, 2)
        assert hs.strides == (1, 2, 4)
        hs.set_ordering(("c", "a", "b"))
        assert hs.site_to_reg("c") == 0

    def test_from_edges_and_sector_predicate(self):
        hs = HilbertSpace.from_edges([(0, 1), (1, 2)])
        assert hs.nsites == 3
        hs2 = HilbertSpace(6, "U1", 3)
        pred = hs2.get_sector_numba()
        assert pred(hs2.get_configs()).all()
        assert hs2.get_size(sector=2) == 15
        cfg = hs2.rand_config(seed=0)
        assert sum(cfg.values()) == 3
