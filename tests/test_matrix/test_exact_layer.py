"""Exact ('matrix') layer tests: core, gen, linalg, calc, evo —
validated against closed forms and scipy (reference test strategy,
tests/test_matrix/)."""

import numpy as np
import pytest
import scipy.linalg as sla

import quimb_tpu as qu
from quimb_tpu.core import SparseHam


class TestCore:
    def test_quimbify_forms(self):
        k = qu.qu([1, 2j], qtype="ket")
        assert k.shape == (2, 1)
        b = qu.qu([1, 2j], qtype="bra")
        assert b.shape == (1, 2)
        assert np.allclose(np.asarray(b), [[1, -2j]])
        r = qu.qu([1, 0], qtype="dop")
        assert r.shape == (2, 2)

    def test_kron_ikron(self):
        X = np.asarray(qu.pauli("X"))
        Z = np.asarray(qu.pauli("Z"))
        full = np.asarray(qu.ikron(qu.pauli("X"), (2, 2, 2), 1))
        expected = np.kron(np.kron(np.eye(2), X), np.eye(2))
        assert np.allclose(full, expected)
        both = np.asarray(
            qu.ikron([qu.pauli("X"), qu.pauli("Z")], (2, 2, 2), (0, 2))
        )
        assert np.allclose(both, np.kron(np.kron(X, np.eye(2)), Z))

    def test_pkron(self):
        CNOT = np.asarray(qu.controlled("x"))
        # acting on qubits (2, 0) of 3 — reversed order
        out = np.asarray(qu.pkron(qu.controlled("x"), (2, 2, 2), (2, 0)))
        # check against manual construction on basis states
        for i in range(8):
            v = np.zeros(8)
            v[i] = 1
            b = [(i >> 2) & 1, (i >> 1) & 1, i & 1]
            # control qubit 2 (last), target qubit 0 (first)
            if b[2]:
                b[0] ^= 1
            j = (b[0] << 2) | (b[1] << 1) | b[2]
            got = out @ v
            assert abs(got[j] - 1) < 1e-12

    def test_partial_trace_pure(self):
        bell = qu.bell_state("phi+")
        rho = np.asarray(qu.partial_trace(bell, (2, 2), 0))
        assert np.allclose(rho, np.eye(2) / 2)

    def test_partial_trace_dop_keep_multiple(self):
        psi = qu.rand_ket(2**4, seed=1)
        rho_full = np.asarray(psi @ np.conj(psi.T))
        r1 = np.asarray(qu.partial_trace(psi, (2,) * 4, (0, 2)))
        r2 = np.asarray(
            qu.partial_trace(qu.qu(rho_full, "dop"), (2,) * 4, (0, 2))
        )
        assert np.allclose(r1, r2, atol=1e-12)
        assert abs(np.trace(r1) - 1) < 1e-12

    def test_permute(self):
        psi = qu.rand_ket(8, seed=2)
        out = np.asarray(qu.permute(psi, (2, 2, 2), (2, 0, 1)))
        t = np.asarray(psi).reshape(2, 2, 2)
        expected = np.transpose(t, (2, 0, 1)).reshape(8, 1)
        assert np.allclose(out, expected)

    def test_sparse_ham_matvec(self):
        Hs = qu.ham_heis(8, sparse=True)
        H = SparseHam(Hs)
        v = np.random.default_rng(0).standard_normal(256)
        got = np.asarray(H @ v)
        expected = Hs @ v
        assert np.allclose(got, expected, atol=1e-12)

    def test_expec(self):
        k = qu.up()
        Z = qu.pauli("Z")
        assert abs(float(np.real(qu.expec(Z, k))) - 1.0) < 1e-12


class TestGen:
    def test_states_normalized(self):
        for psi in (qu.up(), qu.ghz_state(4), qu.w_state(5),
                    qu.neel_state(4), qu.rand_ket(16, seed=0)):
            assert abs(np.linalg.norm(np.asarray(psi)) - 1) < 1e-10

    def test_paulis(self):
        X, Y, Z = (np.asarray(qu.pauli(s)) for s in "XYZ")
        assert np.allclose(X @ Y - Y @ X, 2j * Z)
        assert np.allclose(X @ X, np.eye(2))

    def test_spin_operator_commutation(self):
        for S in (0.5, 1, 1.5):
            Sx = np.asarray(qu.spin_operator("x", S))
            Sy = np.asarray(qu.spin_operator("y", S))
            Sz = np.asarray(qu.spin_operator("z", S))
            assert np.allclose(Sx @ Sy - Sy @ Sx, 1j * Sz, atol=1e-12)

    def test_rand_uni(self):
        U = np.asarray(qu.rand_uni(8, seed=3))
        assert np.allclose(U @ U.conj().T, np.eye(8), atol=1e-10)

    def test_rand_rho(self):
        rho = np.asarray(qu.rand_rho(8, seed=4))
        assert abs(np.trace(rho) - 1) < 1e-10
        assert (np.linalg.eigvalsh(rho) > -1e-12).all()

    def test_ham_heis_2d_matches_manual(self):
        H = np.asarray(qu.ham_heis_2D(2, 2))
        # 2x2 lattice with 4 bonds
        from quimb_tpu.gen.operators import _spin_op_np

        S = {s: _spin_op_np(s, 0.5) for s in "xyz"}
        manual = np.zeros((16, 16), dtype=complex)
        for (a, b) in [(0, 1), (2, 3), (0, 2), (1, 3)]:
            for s in "xyz":
                manual += np.asarray(
                    qu.ikron([S[s], S[s]], (2,) * 4, (a, b))
                )
        assert np.allclose(H, manual, atol=1e-12)


class TestLinalg:
    def test_eigh_dense(self):
        A = qu.rand_herm(32, seed=0)
        el, ev = qu.eigh(A)
        An = np.asarray(A)
        w = np.linalg.eigvalsh(An)
        assert np.allclose(np.asarray(el), w, atol=1e-10)
        assert np.allclose(
            np.asarray(ev) @ np.diag(np.asarray(el)) @
            np.asarray(ev).conj().T, An, atol=1e-10,
        )

    def test_groundstate_sparse_lanczos(self):
        Hs = qu.ham_heis(10, sparse=True)
        w0 = np.linalg.eigvalsh(Hs.toarray())[0]
        lam = float(qu.groundenergy(SparseHam(Hs), backend="lanczos"))
        assert abs(lam - w0) < 1e-9
        gs = qu.groundstate(SparseHam(Hs), backend="lanczos")
        v = np.asarray(gs).reshape(-1)
        assert abs(abs(v.conj() @ (Hs @ v)) - abs(w0)) < 1e-8

    def test_eigensystem_partial_k2(self):
        A = qu.rand_herm(64, seed=1)
        w = np.linalg.eigvalsh(np.asarray(A))
        lams, vecs = qu.eigensystem_partial(
            np.asarray(A), k=2, backend="lanczos"
        )
        assert np.allclose(np.asarray(lams), w[:2], atol=1e-7)

    def test_eigh_window(self):
        A = qu.rand_herm(64, seed=2)
        w = np.linalg.eigvalsh(np.asarray(A))
        lams = qu.eigvalsh_window(np.asarray(A), 0.5, 3)
        mid = w[np.argsort(np.abs(w - (w[0] + 0.5 * (w[-1] - w[0]))))][:3]
        assert np.allclose(np.sort(np.asarray(lams)), np.sort(mid),
                           atol=1e-8)

    def test_expm_multiply(self):
        A = qu.rand_herm(48, seed=3)
        v = qu.rand_ket(48, seed=4)
        out = np.asarray(qu.expm_multiply(-1j * np.asarray(A), v))
        expected = sla.expm(-1j * np.asarray(A)) @ np.asarray(v)
        assert np.allclose(out, expected, atol=1e-9)

    def test_expm_herm(self):
        A = qu.rand_herm(16, seed=5)
        got = np.asarray(qu.expm(A, herm=True))
        expected = sla.expm(np.asarray(A))
        assert np.allclose(got, expected, atol=1e-9)

    def test_sqrtm(self):
        A = qu.rand_pos(16, seed=6)
        S = np.asarray(qu.sqrtm(A, herm=True))
        assert np.allclose(S @ S, np.asarray(A), atol=1e-9)

    def test_norms(self):
        A = qu.rand_herm(16, seed=7)
        An = np.asarray(A)
        assert abs(float(qu.norm(A, "fro")) -
                   np.linalg.norm(An)) < 1e-10
        assert abs(float(qu.norm(A, 2)) -
                   np.linalg.norm(An, 2)) < 1e-10
        assert abs(float(qu.norm(A, "tr")) -
                   np.abs(np.linalg.eigvalsh(An)).sum()) < 1e-8

    def test_svds(self):
        A = np.random.default_rng(8).standard_normal((32, 20))
        U, s, VH = qu.svds(A, k=5)
        sv = np.linalg.svd(A, compute_uv=False)
        assert np.allclose(np.asarray(s), sv[:5], atol=1e-10)


class TestCalc:
    def test_entropy(self):
        assert abs(qu.entropy(np.array([0.5, 0.5]))) - 1.0 < 1e-12
        rho = qu.partial_trace(qu.ghz_state(4), (2,) * 4, (0, 1))
        assert abs(qu.entropy(rho) - 1.0) < 1e-10

    def test_mutinf(self):
        assert abs(qu.mutinf(qu.bell_state("psi-")) - 2.0) < 1e-10
        prod_state = qu.kron(qu.up(), qu.down())
        assert abs(qu.mutinf(prod_state)) < 1e-10

    def test_logneg_negativity(self):
        b = qu.bell_state("phi+")
        assert abs(qu.logneg(b) - 1.0) < 1e-10
        assert abs(qu.negativity(b) - 0.5) < 1e-10
        sep = qu.dop(qu.kron(qu.up(), qu.up()))
        assert qu.logneg(sep) < 1e-10

    def test_concurrence(self):
        assert abs(qu.concurrence(qu.bell_state("psi+")) - 1) < 1e-10

    def test_fidelity(self):
        psi = qu.rand_ket(8, seed=0)
        phi = qu.rand_ket(8, seed=1)
        assert abs(float(qu.fidelity(psi, psi)) - 1) < 1e-10
        f = float(qu.fidelity(psi, phi))
        assert 0 <= f <= 1
        # mixed state fidelity
        rho = qu.rand_rho(8, seed=2)
        assert abs(float(qu.fidelity(rho, rho)) - 1) < 1e-8

    def test_trace_distance(self):
        p = qu.rand_ket(8, seed=3)
        assert qu.trace_distance(p, p) < 1e-8
        up, dn = qu.up(), qu.down()
        assert abs(qu.trace_distance(up, dn) - 1) < 1e-10

    def test_measure_collapse(self):
        psi = qu.plus()
        Z = qu.pauli("Z")
        lam, psi_after = qu.measure(psi, Z, seed=42)
        assert lam in (1.0, -1.0)
        # collapsed state is an eigenstate
        assert qu.is_eigenvector(psi_after, Z, tol=1e-10)

    def test_simulate_counts(self):
        psi = qu.ghz_state(3)
        counts = qu.simulate_counts(psi, 512, seed=0)
        assert set(counts) <= {"000", "111"}
        assert sum(counts.values()) == 512

    def test_purify(self):
        rho = qu.rand_rho(4, seed=4)
        psi = qu.purify(rho)
        back = np.asarray(qu.partial_trace(psi, (4, 4), 0))
        assert np.allclose(back, np.asarray(rho), atol=1e-10)

    def test_pauli_decomp(self):
        X = qu.pauli("X")
        comps = qu.pauli_decomp(np.asarray(X), mode="c")
        assert abs(comps["X"] - 1.0) < 1e-10
        assert abs(comps["Z"]) < 1e-10

    def test_is_degenerate(self):
        assert qu.is_degenerate(np.diag([1.0, 2.0, 3.0])) == 0
        assert qu.is_degenerate(np.diag([1.0, 1.0, 3.0])) == 1

    def test_heisenberg_energy_vs_exact(self):
        # scaling formula should be close to ED for moderate L
        w0 = np.linalg.eigvalsh(np.asarray(qu.ham_heis(12)))[0]
        # the formula is for PBC thermodynamics; just check right scale
        assert abs(qu.heisenberg_energy(12) - w0) / abs(w0) < 0.05

    def test_entropy_subsys_approx(self):
        psi = qu.rand_ket(2**10, seed=5)
        S_ex = qu.entropy(qu.partial_trace(psi, (2,) * 10, range(5)))
        S_ap = qu.entropy_subsys(psi, (2,) * 10, range(5),
                                 approx_thresh=1, tol=0.05, seed=7)
        assert abs(S_ap - S_ex) / S_ex < 0.1


class TestEvolution:
    def test_all_methods_match_exact(self):
        H = qu.ham_heis(6)
        psi0 = qu.neel_state(6)
        expected = sla.expm(-0.7j * np.asarray(H)) @ np.asarray(psi0)
        for method in ("integrate", "solve", "expm"):
            ham = SparseHam(qu.ham_heis(6, sparse=True)) \
                if method == "expm" else H
            evo = qu.Evolution(psi0, ham, method=method)
            evo.update_to(0.7)
            assert np.allclose(
                np.asarray(evo.pt), expected, atol=1e-7
            ), method

    def test_dop_evolution(self):
        H = qu.ham_heis(4)
        rho0 = qu.dop(qu.neel_state(4))
        evo = qu.Evolution(rho0, H, method="solve")
        evo.update_to(0.5)
        U = sla.expm(-0.5j * np.asarray(H))
        expected = U @ np.asarray(rho0) @ U.conj().T
        assert np.allclose(np.asarray(evo.pt), expected, atol=1e-10)

    def test_lindblad(self):
        # single qubit decay towards |0>
        H = 0.0 * np.asarray(qu.pauli("Z"))
        L = np.array([[0, 1], [0, 0]])  # sigma_minus
        rho0 = np.asarray(qu.dop(qu.down()))
        evo = qu.Evolution(rho0, (H, [L], 1.0), method="integrate")
        evo.update_to(3.0)
        rho_t = np.asarray(evo.pt)
        # mostly decayed to |0><0|
        assert rho_t[0, 0].real > 0.94
        assert abs(np.trace(rho_t) - 1) < 1e-6

    def test_at_times_and_compute(self):
        H = qu.ham_heis(4)
        psi0 = qu.neel_state(4)
        Z0 = qu.ikron(qu.pauli("Z"), (2,) * 4, 0)

        def mag(t, pt):
            return float(np.real(qu.expec(Z0, pt)))

        evo = qu.Evolution(psi0, H, method="solve", compute=mag)
        mags = []
        for pt in evo.at_times(np.linspace(0.1, 1.0, 5)):
            pass
        assert len(evo.results) == 5
        assert all(abs(m) <= 1.0 + 1e-9 for m in evo.results)

    def test_int_stop(self):
        H = qu.ham_heis(4)
        psi0 = qu.neel_state(4)
        evo = qu.Evolution(
            psi0, H, method="integrate",
            int_stop=lambda t, p: t > 0.3,
        )
        evo.update_to(10.0)
        assert evo.t < 1.0


class TestAutoblock:
    def test_compute_blocks_hubbard(self):
        import quimb_tpu as qu
        from quimb_tpu.linalg.autoblock import compute_blocks

        H = qu.ham_hubbard_hardcore(4, sparse=True)
        ix, jx = H.nonzero()
        sectors = compute_blocks(ix, jx, H.shape[0])
        # the reference's documented sectors (autoblock.py:36)
        assert sectors == [
            [0], [1, 2, 4, 8], [3, 5, 6, 9, 10, 12],
            [7, 11, 13, 14], [15],
        ]

    def test_eigh_autoblock_matches_dense(self):
        import quimb_tpu as qu

        H = qu.ham_hubbard_hardcore(4, sparse=True)
        el_b, ev_b = qu.eigh(H, autoblock=True)
        el, _ = qu.eigh(np.asarray(H.toarray()))
        assert np.allclose(np.asarray(el_b), np.asarray(el),
                           atol=1e-10)
        Hd = np.asarray(H.toarray())
        V = np.asarray(ev_b)
        rec = V @ np.diag(np.asarray(el_b)) @ V.conj().T
        assert np.allclose(rec, Hd, atol=1e-10)
