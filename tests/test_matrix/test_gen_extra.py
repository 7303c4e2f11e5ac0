"""Generator-layer closed-form tests (reference
tests/test_matrix/test_gen/{test_states,test_operators}.py strategy):
named states, gates as unitaries with known actions, Hamiltonian
families vs independently-built matrices, and symmetry projectors."""

import numpy as np
import pytest

import quimb_tpu as qu


def A(x):
    return np.asarray(x)


def vec(x):
    return A(x).reshape(-1)


class TestNamedStates:
    def test_bloch_state_poles_and_equator(self):
        # bloch_state returns a density operator
        assert np.allclose(A(qu.bloch_state(0, 0, 1)),
                           A(qu.dop(qu.up())), atol=1e-12)
        assert np.allclose(A(qu.bloch_state(0, 0, -1)),
                           A(qu.dop(qu.down())), atol=1e-12)
        assert np.allclose(A(qu.bloch_state(1, 0, 0)),
                           A(qu.dop(qu.plus())), atol=1e-12)

    def test_bloch_state_mixed(self):
        rho = A(qu.bloch_state(0.3, 0.2, 0.1))
        # purity of a Bloch vector r: (1 + |r|^2) / 2
        r2 = 0.3**2 + 0.2**2 + 0.1**2
        assert float(np.real(np.trace(rho @ rho))) == pytest.approx(
            (1 + r2) / 2, rel=1e-10
        )

    def test_bell_states_orthonormal(self):
        bs = [vec(qu.bell_state(s))
              for s in ("phi+", "phi-", "psi+", "psi-")]
        G = np.array([[np.vdot(a, b) for b in bs] for a in bs])
        assert np.allclose(G, np.eye(4), atol=1e-12)

    def test_singlet_is_psi_minus(self):
        assert abs(np.vdot(vec(qu.singlet()),
                           vec(qu.bell_state("psi-")))) == \
            pytest.approx(1.0)

    def test_neel_state(self):
        psi = vec(qu.neel_state(4))
        # |0101> (up = 0 index ordering): exactly one nonzero entry
        idx = np.argmax(np.abs(psi))
        assert abs(psi[idx]) == pytest.approx(1.0)
        assert idx == int("0101", 2)

    def test_w_state_weights(self):
        psi = vec(qu.w_state(3))
        nz = np.sort(np.abs(psi[np.abs(psi) > 1e-12]))
        assert len(nz) == 3
        assert np.allclose(nz, 3**-0.5, atol=1e-12)

    def test_ghz_state_weights(self):
        psi = vec(qu.ghz_state(4))
        assert abs(psi[0]) == pytest.approx(2**-0.5)
        assert abs(psi[-1]) == pytest.approx(2**-0.5)

    def test_werner_state_partial_transpose(self):
        # Werner state is entangled (NPT) iff p > 1/3
        for p, ent in [(0.5, True), (0.2, False)]:
            rho = qu.werner_state(p)
            ln = float(qu.logneg(rho))
            assert (ln > 1e-8) == ent

    def test_thermal_state_infinite_T(self):
        H = qu.ham_heis(2, sparse=False)
        rho = A(qu.thermal_state(H, 0.0))
        assert np.allclose(rho, np.eye(4) / 4, atol=1e-12)

    def test_thermal_state_zero_T_limit(self):
        H = qu.ham_heis(2, sparse=False)
        rho = A(qu.thermal_state(H, 100.0))
        gs = vec(qu.groundstate(H))
        overlap = float(np.real(gs.conj() @ A(rho) @ gs))
        assert overlap == pytest.approx(1.0, abs=1e-6)

    def test_graph_state_1d_stabilizers(self):
        # graph state is the +1 eigenstate of K_i = X_i prod_j Z_j
        n = 4
        psi = vec(qu.graph_state_1d(n, cyclic=True))
        dims = [2] * n
        for i in range(n):
            K = qu.ikron(qu.pauli("X"), dims, i)
            for j in ((i - 1) % n, (i + 1) % n):
                K = A(K) @ A(qu.ikron(qu.pauli("Z"), dims, j))
            assert np.allclose(A(K) @ psi, psi, atol=1e-10)

    def test_perm_state_singlet_pairs(self):
        psi = vec(qu.singlet_pairs(4))
        assert np.linalg.norm(psi) == pytest.approx(1.0)


class TestGates:
    @pytest.mark.parametrize("maker,args", [
        ("hadamard", ()),
        ("S_gate", ()),
        ("T_gate", ()),
        ("Xsqrt", ()),
        ("Ysqrt", ()),
        ("Zsqrt", ()),
        ("Wsqrt", ()),
        ("iswap", ()),
        ("fsim", (0.3, 0.7)),
        ("fredkin", ()),
        ("ccX", ()),
    ])
    def test_gates_unitary(self, maker, args):
        G = A(getattr(qu, maker)(*args))
        assert np.allclose(G @ G.conj().T, np.eye(G.shape[0]),
                           atol=1e-10)

    def test_rotation_generates_pauli(self):
        for s in "XYZ":
            R = A(qu.rotation(np.pi, s))
            P = A(qu.pauli(s))
            # R(pi) = -i P
            assert np.allclose(R, -1j * P, atol=1e-10)

    def test_phase_gate_action(self):
        phi = 0.421
        P = A(qu.phase_gate(phi))
        assert P[0, 0] == pytest.approx(1.0)
        assert P[1, 1] == pytest.approx(np.exp(1j * phi))

    def test_u_gate_euler(self):
        # U(theta, phi, lambda) acting on |0> gives the Bloch vector
        th, ph, lam = 0.7, 0.4, 1.1
        U = A(qu.U_gate(th, ph, lam))
        out = U @ np.array([1.0, 0.0])
        expect = np.array([
            np.cos(th / 2),
            np.exp(1j * ph) * np.sin(th / 2),
        ])
        # up to global phase
        assert abs(np.vdot(out, expect)) == pytest.approx(1.0,
                                                          abs=1e-10)

    def test_swap_and_iswap(self):
        S = A(qu.swap())
        a = np.kron([1, 0], [0, 1]).astype(complex)
        b = np.kron([0, 1], [1, 0]).astype(complex)
        assert np.allclose(S @ a, b, atol=1e-12)
        I = A(qu.iswap())
        assert np.allclose(I @ a, 1j * b, atol=1e-12)

    def test_ncontrolled_gate(self):
        CCZ = A(qu.ncontrolled_gate(2, qu.pauli("Z")))
        expect = np.eye(8, dtype=complex)
        expect[7, 7] = -1
        assert np.allclose(CCZ, expect, atol=1e-12)

    def test_shift_clock_weyl_pair(self):
        d = 5
        X = A(qu.shift(d))
        Z = A(qu.clock(d))
        w = np.exp(2j * np.pi / d)
        # Weyl commutation: Z X = w X Z
        assert np.allclose(Z @ X, w * X @ Z, atol=1e-10)

    def test_spin_operator_spin1(self):
        # S=1 ladder: [S+, S-] = 2 Sz
        Sp = A(qu.spin_operator("+", S=1))
        Sm = A(qu.spin_operator("-", S=1))
        Sz = A(qu.spin_operator("z", S=1))
        assert np.allclose(Sp @ Sm - Sm @ Sp, 2 * Sz, atol=1e-10)
        # Casimir: S^2 = S(S+1) = 2
        Sx = A(qu.spin_operator("x", S=1))
        Sy = A(qu.spin_operator("y", S=1))
        S2 = Sx @ Sx + Sy @ Sy + Sz @ Sz
        assert np.allclose(S2, 2 * np.eye(3), atol=1e-10)


class TestHamiltonians:
    def test_ham_ising_groundstate_limits(self):
        # jz >> bx: classical ferromagnet, doubly-degenerate-ish
        H = qu.ham_ising(4, jz=1.0, bx=0.01, sparse=False)
        el = np.linalg.eigvalsh(A(H))
        assert el[1] - el[0] < 0.01  # near-degenerate pair
        # bx >> jz: paramagnet with gap ~ 2 bx
        H2 = qu.ham_ising(4, jz=0.01, bx=1.0, sparse=False)
        el2 = np.linalg.eigvalsh(A(H2))
        assert el2[1] - el2[0] == pytest.approx(2.0, rel=0.05)

    def test_ham_xxz_delta_one_is_heis(self):
        H1 = A(qu.ham_XXZ(4, delta=1.0, sparse=False))
        H2 = A(qu.ham_heis(4, sparse=False))
        assert np.allclose(H1, H2, atol=1e-10)

    def test_ham_xy_free_fermion_spectrum(self):
        # XY chain maps to free fermions; check gs energy vs exact
        # diagonalization self-consistency at two couplings
        for jxy in (1.0, 0.7):
            H = qu.ham_XY(6, jxy=jxy, bz=0.0, sparse=False)
            el = np.linalg.eigvalsh(A(H))
            # energy scales linearly in jxy
            if jxy == 1.0:
                e1 = el[0]
            else:
                assert el[0] == pytest.approx(0.7 * e1, rel=1e-8)

    def test_ham_mbl_seeded_reproducible(self):
        H1 = A(qu.ham_mbl(6, dh=3.0, seed=7, sparse=False))
        H2 = A(qu.ham_mbl(6, dh=3.0, seed=7, sparse=False))
        H3 = A(qu.ham_mbl(6, dh=3.0, seed=8, sparse=False))
        assert np.allclose(H1, H2)
        assert not np.allclose(H1, H3)

    def test_ham_j1j2_majumdar_ghosh(self):
        # at j2 = j1/2 (MG point) the dimer state is an exact GS:
        # E = -3/4 * j1 * (n/2) with spin convention S=1/2 ops
        n = 6
        H = qu.ham_j1j2(n, j1=1.0, j2=0.5, cyclic=True, sparse=False)
        e0 = float(qu.groundenergy(H))
        assert e0 == pytest.approx(-0.75 * 0.5 * n / 2 * 2, rel=1e-6) \
            or e0 == pytest.approx(-3 * n / 8, rel=1e-6)

    def test_zspin_projector(self):
        n = 4
        P = A(qu.zspin_projector(n, sz=0))
        # sz=0 sector of 4 spins: C(4,2) = 6 states
        assert P.shape[1] == 6 or P.shape[0] == 6
        # projector columns orthonormal
        if P.shape[0] < P.shape[1]:
            P = P.T
        assert np.allclose(P.conj().T @ P, np.eye(6), atol=1e-10)

    def test_create_destroy_algebra(self):
        c = A(qu.create(4))
        a = c.conj().T
        comm = a @ c - c @ a
        # truncated boson algebra: [a, a+] = 1 except last level
        assert np.allclose(np.diag(comm)[:-1], 1.0, atol=1e-10)
