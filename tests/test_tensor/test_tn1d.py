"""1D stack tests: MPS/MPO, DMRG, TEBD — validated against exact
diagonalization / dense evolution (the reference's test strategy,
SURVEY §4)."""

import numpy as np
import pytest
import scipy.linalg as sla

import quimb_tpu.tensor as qtn
from quimb_tpu.gen.operators import ham_heis


class TestMPS:
    def test_rand_state_norm_and_bond(self):
        psi = qtn.MPS_rand_state(10, 7, seed=42)
        assert abs(float(psi.norm()) - 1.0) < 1e-12
        assert psi.max_bond() == 7
        assert psi.L == 10
        assert psi.phys_dim() == 2

    def test_to_dense_from_dense_roundtrip(self):
        psi = qtn.MPS_rand_state(6, 8, seed=0)
        d = psi.to_dense()
        assert d.shape == (64, 1)
        psi2 = qtn.MatrixProductState.from_dense(d, dims=2)
        d2 = psi2.to_dense()
        assert np.allclose(np.asarray(d), np.asarray(d2), atol=1e-10)

    def test_computational_and_amplitude(self):
        psi = qtn.MPS_computational_state("0110")
        d = np.asarray(psi.to_dense()).reshape(-1)
        assert abs(d[0b0110] - 1.0) < 1e-12
        assert abs(complex(psi.amplitude((0, 1, 1, 0))) - 1.0) < 1e-12
        assert abs(complex(psi.amplitude((0, 0, 0, 0)))) < 1e-12

    def test_canonize_preserves_state(self):
        psi = qtn.MPS_rand_state(8, 6, seed=1)
        d0 = np.asarray(psi.to_dense())
        psi.canonize(4)
        assert np.allclose(d0, np.asarray(psi.to_dense()), atol=1e-10)
        assert psi._site_is_left_canonical(2)
        assert psi._site_is_right_canonical(6)

    def test_entropy_bell_pairs(self):
        # GHZ state: entropy across any cut = 1 bit
        psi = qtn.MPS_ghz_state(6)
        assert abs(psi.entropy(3) - 1.0) < 1e-10

    def test_w_state(self):
        psi = qtn.MPS_w_state(5)
        d = np.asarray(psi.to_dense()).reshape(-1)
        expected = np.zeros(32)
        for i in range(5):
            expected[2 ** (4 - i)] = 1 / np.sqrt(5)
        # indices: site 0 is most significant
        assert np.allclose(np.sort(np.abs(d)), np.sort(expected))
        assert abs(np.linalg.norm(d) - 1) < 1e-12

    def test_gate_contract_dense_match(self):
        from quimb_tpu.gen.operators import pauli

        psi = qtn.MPS_rand_state(5, 4, seed=2, dtype="complex128")
        X = pauli("X")
        psi2 = psi.gate(X, 2, contract=True)
        from quimb_tpu.core import ikron

        expected = ikron(X, (2,) * 5, 2) @ psi.to_dense()
        assert np.allclose(
            np.asarray(psi2.to_dense()), np.asarray(expected), atol=1e-10
        )

    def test_gate_with_auto_swap(self):
        from quimb_tpu.gen.operators import CNOT

        psi = qtn.MPS_rand_state(5, 8, seed=3, dtype="complex128")
        G = CNOT()
        psi2 = psi.gate_with_auto_swap(G, (1, 3))
        from quimb_tpu.core import pkron

        expected = pkron(np.asarray(G), (2,) * 5, (1, 3)) @ psi.to_dense()
        assert np.allclose(
            np.asarray(psi2.to_dense()), np.asarray(expected), atol=1e-8
        )

    def test_sampling_matches_probabilities(self):
        psi = qtn.MPS_rand_state(4, 4, seed=4)
        d = np.asarray(psi.to_dense()).reshape(-1)
        probs = np.abs(d) ** 2
        for config, omega in psi.sample(10, seed=7):
            i = int("".join(map(str, config)), 2)
            assert abs(probs[i] - omega) < 1e-10

    def test_measure(self):
        psi = qtn.MPS_computational_state("0101")
        outcome, psi_after = psi.measure(1)
        assert outcome == 1
        outcome, _ = psi.measure(0)
        assert outcome == 0

    def test_expand_bond_dimension(self):
        psi = qtn.MPS_rand_state(6, 4, seed=5)
        d0 = np.asarray(psi.to_dense())
        psi.expand_bond_dimension(9)
        assert psi.max_bond() == 9
        assert np.allclose(d0, np.asarray(psi.to_dense()), atol=1e-10)

    def test_schmidt_values_sum_to_one(self):
        psi = qtn.MPS_rand_state(8, 8, seed=6)
        s2 = np.asarray(psi.schmidt_values(4))
        assert abs(s2.sum() - 1.0) < 1e-10


class TestMPO:
    def test_identity(self):
        I = qtn.MPO_identity(5)
        assert np.allclose(
            np.asarray(I.to_dense()), np.eye(32), atol=1e-12
        )

    def test_ham_heis_matches_dense(self):
        H = qtn.MPO_ham_heis(7)
        Hd = ham_heis(7)
        assert np.allclose(
            np.asarray(H.to_dense()), np.asarray(Hd), atol=1e-10
        )

    def test_ham_ising_matches_dense(self):
        from quimb_tpu.gen.operators import ham_ising

        H = qtn.MPO_ham_ising(6, j=4.0, bx=2.0)
        Hd = ham_ising(6, jz=1.0, bx=1.0)
        assert np.allclose(
            np.asarray(H.to_dense()), np.asarray(Hd), atol=1e-10
        )

    def test_apply_mps_matches_dense(self):
        H = qtn.MPO_ham_heis(6)
        psi = qtn.MPS_rand_state(6, 8, seed=1)
        Hpsi = H.apply(psi)
        expected = np.asarray(H.to_dense()) @ np.asarray(psi.to_dense())
        assert np.allclose(
            np.asarray(Hpsi.to_dense()), expected, atol=1e-10
        )

    def test_apply_mpo(self):
        A = qtn.MPO_rand(5, 4, seed=1)
        B = qtn.MPO_rand(5, 3, seed=2)
        AB = A.apply(B)
        assert np.allclose(
            np.asarray(AB.to_dense()),
            np.asarray(A.to_dense()) @ np.asarray(B.to_dense()),
            atol=1e-10,
        )

    def test_expec(self):
        H = qtn.MPO_ham_heis(6)
        psi = qtn.MPS_rand_state(6, 8, seed=1)
        e = complex(qtn.expec_TN_1D(psi.H, H.apply(psi))).real
        v = np.asarray(psi.to_dense())
        expected = (v.conj().T @ np.asarray(H.to_dense()) @ v)[0, 0].real
        assert abs(e - expected) < 1e-10

    def test_trace(self):
        H = qtn.MPO_ham_heis(5)
        assert abs(complex(H.trace())) < 1e-10  # traceless

    def test_spin_ham_1d_var_terms(self):
        builder = qtn.SpinHam1D(S=1 / 2)
        builder += 1.0, "Z", "Z"
        builder[2] += 0.7, "X"
        H = builder.build_mpo(5)
        from quimb_tpu.core import ham_from_terms
        from quimb_tpu.gen.operators import spin_operator

        Z = np.asarray(spin_operator("Z"))
        X = np.asarray(spin_operator("X"))
        terms = [(1.0, (Z, Z), (i, i + 1)) for i in range(4)]
        terms.append((0.7, (X,), (2,)))
        Hd = ham_from_terms(terms, (2,) * 5)
        assert np.allclose(
            np.asarray(H.to_dense()), np.asarray(Hd), atol=1e-10
        )


class TestDMRG:
    def test_dmrg2_exact_groundstate(self):
        L = 10
        H = qtn.MPO_ham_heis(L)
        w0 = np.linalg.eigvalsh(np.asarray(ham_heis(L)))[0]
        dmrg = qtn.DMRG2(H, bond_dims=[8, 16, 32, 32], cutoffs=1e-11)
        assert dmrg.solve(tol=1e-9, max_sweeps=10)
        assert abs(dmrg.energy - w0) < 1e-8
        psi = dmrg.state
        assert abs(float(psi.norm()) - 1.0) < 1e-8

    def test_energies_monotone_decrease(self):
        L = 12
        H = qtn.MPO_ham_heis(L)
        dmrg = qtn.DMRG2(H, bond_dims=16, cutoffs=1e-10)
        dmrg.solve(tol=1e-13, max_sweeps=4)
        ens = dmrg.energies
        for e1, e2 in zip(ens, ens[1:]):
            assert e2 < e1 + 1e-9

    def test_dmrg1(self):
        L = 8
        H = qtn.MPO_ham_heis(L)
        w0 = np.linalg.eigvalsh(np.asarray(ham_heis(L)))[0]
        # start from a DMRG2-warmed state (1-site can't grow bonds);
        # seeded so convergence is order-independent
        warm = qtn.DMRG2(
            H, bond_dims=16, cutoffs=1e-10,
            p0=qtn.MPS_rand_state(L, 8, seed=7, dtype="float64"),
        )
        warm.solve(tol=1e-8, max_sweeps=4)
        dmrg1 = qtn.DMRG1(H, bond_dims=16, p0=warm.state)
        dmrg1.solve(tol=1e-10, max_sweeps=6)
        assert abs(dmrg1.energy - w0) < 1e-6

    def test_dmrg_state_energy_consistency(self):
        L = 8
        H = qtn.MPO_ham_heis(L)
        dmrg = qtn.DMRG2(H, bond_dims=24, cutoffs=1e-11)
        dmrg.solve(tol=1e-9, max_sweeps=6)
        psi = dmrg.state
        v = np.asarray(psi.to_dense())
        Hd = np.asarray(ham_heis(L))
        e_dense = float(
            np.real(v.conj().T @ Hd @ v / (v.conj().T @ v))
        )
        assert abs(e_dense - dmrg.energy) < 1e-8

    def test_dmrgx_mbl_eigenstate(self):
        # DMRG-X should find an interior eigenstate with high overlap
        L = 8
        H = qtn.MPO_ham_mbl(L, dh=8.0, seed=42)
        p0 = qtn.MPS_computational_state("01101001")
        dmrgx = qtn.DMRGX(H, p0, bond_dims=16)
        dmrgx.solve(tol=1e-9, max_sweeps=4)
        # energy variance should be small-ish for an eigenstate
        en = dmrgx.energy
        Hd = np.asarray(H.to_dense())
        w = np.linalg.eigvalsh(Hd)
        assert np.min(np.abs(w - en)) < 1e-3


class TestTEBD:
    def test_tebd_vs_exact_evolution(self):
        L = 8
        psi0 = qtn.MPS_neel_state(L)
        tebd = qtn.TEBD(psi0, qtn.ham_1d_heis(L), progbar=False)
        tebd.update_to(1.0, dt=0.05)
        Hd = np.asarray(ham_heis(L))
        v = sla.expm(-1j * Hd) @ np.asarray(psi0.to_dense()).reshape(-1)
        vt = np.asarray(tebd.pt.to_dense()).reshape(-1)
        fid = abs(np.vdot(v, vt))
        assert abs(1 - fid) < 1e-4

    def test_tebd_entropy_growth(self):
        L = 8
        psi0 = qtn.MPS_neel_state(L)
        tebd = qtn.TEBD(psi0, qtn.ham_1d_heis(L), progbar=False)
        S = [psi0.entropy(L // 2)]
        for psi_t in tebd.at_times([0.4, 0.8], dt=0.04):
            S.append(psi_t.entropy(L // 2))
        assert S[0] < 1e-12
        assert S[1] > 0.1
        assert S[2] > S[1]

    def test_tebd_vidal_entropy_matches_state(self):
        """TEBD.entropy/schmidt_values read the fused Vidal bond
        weights in O(chi); they must agree with canonize+SVD of the
        materialized state."""
        L = 8
        psi0 = qtn.MPS_neel_state(L)
        tebd = qtn.TEBD(psi0, qtn.ham_1d_heis(L), progbar=False)
        tebd.split_opts["max_bond"] = 16
        tebd.update_to(0.6, dt=0.05)
        assert tebd._vidal is not None
        # read the O(chi) values for every bond *before* touching .pt
        # (materializing drops the fused Vidal form)
        fast_sv = {i: tebd.schmidt_values(i) for i in (2, L // 2, L - 2)}
        fast_S = {i: tebd.entropy(i) for i in (2, L // 2, L - 2)}
        # half-chain entropy grows from the Neel state
        assert fast_S[L // 2] > 0.05
        psi = tebd.pt
        for i in (2, L // 2, L - 2):
            np.testing.assert_allclose(np.sum(fast_sv[i]), 1.0,
                                       atol=1e-8)
            sv_state = np.sort(np.asarray(psi.schmidt_values(i)))[::-1]
            np.testing.assert_allclose(
                fast_sv[i], sv_state[: len(fast_sv[i])], atol=1e-7
            )
            assert abs(fast_S[i] - float(psi.entropy(i))) < 1e-6

    def test_tebd_err_f32_not_noise_dominated(self):
        """The truncation-error tracker sums the *dropped* singular
        values directly — at float32 a cutoff-free chi-ample evolution
        must report (near-)zero err, not norm-cancellation noise."""
        L = 8
        psi0 = qtn.MPS_neel_state(L).astype("complex64")
        tebd = qtn.TEBD(psi0, qtn.ham_1d_heis(L), progbar=False)
        tebd.split_opts["max_bond"] = 16  # = 2^(L/2), no truncation
        tebd.split_opts["cutoff"] = 0.0
        tebd.update_to(0.5, dt=0.05)
        # direct summation of dropped values: ~1e-7 f32 residue. The
        # cancellation formula it replaces read ~1e-2 on this config.
        assert float(tebd.trunc_err) < 1e-5

    def test_tebd_err_is_reference_trotter_estimate(self):
        """``TEBD.err`` follows the reference convention (reference
        tn1d/tebd.py:458): sum over steps of |H|_mean * dt**(order+1),
        independent of truncation."""
        L = 8
        psi0 = qtn.MPS_neel_state(L).astype("complex64")
        H = qtn.ham_1d_heis(L)
        tebd = qtn.TEBD(psi0, H, progbar=False,
                        split_opts={"max_bond": 16, "cutoff": 0.0})
        nsteps, dt, order = 6, 0.05, 4
        for k in range(nsteps):
            tebd.update_to((k + 1) * dt, dt=dt, order=order)
        want = nsteps * H.mean_norm() * dt ** (order + 1)
        assert float(tebd.err) == pytest.approx(want, rel=1e-6)

    def test_tebd_err_estimate_accumulates(self):
        L = 6
        psi0 = qtn.MPS_rand_state(L, 4, seed=1, dtype="complex128")
        tebd = qtn.TEBD(
            psi0, qtn.ham_1d_heis(L), progbar=False,
            split_opts={"cutoff": 1e-6, "max_bond": 4},
        )
        tebd.update_to(2.0, dt=0.1)
        assert tebd.err > 0

    def test_tebd_ising_quench_magnetization(self):
        from quimb_tpu.gen.operators import ham_ising

        L = 6
        psi0 = qtn.MPS_computational_state("0" * L)
        tebd = qtn.TEBD(psi0, qtn.ham_1d_ising(L, j=4.0, bx=2.0),
                        progbar=False)
        tebd.update_to(0.5, dt=0.05)
        Hd = np.asarray(ham_ising(L, jz=1.0, bx=1.0))
        v = sla.expm(-0.5j * Hd) @ np.asarray(
            psi0.to_dense()
        ).reshape(-1)
        vt = np.asarray(tebd.pt.to_dense()).reshape(-1)
        assert abs(1 - abs(np.vdot(v, vt))) < 1e-4


class TestTEBDFused:
    def test_fused_matches_exact_and_sequential(self):
        import scipy.linalg as sla

        import quimb_tpu as qu

        L = 8
        psi0 = qtn.MPS_neel_state(L)
        H = qtn.ham_1d_heis(L)
        Hd = np.asarray(qu.ham_heis(L))
        v0 = np.asarray(psi0.to_dense()).ravel().astype(complex)
        T = 1.0
        v_exact = sla.expm(-1j * T * Hd) @ v0

        def fid(a, b):
            return abs(np.vdot(a, b)) / (
                np.linalg.norm(a) * np.linalg.norm(b)
            )

        vs = {}
        for fused in (True, False):
            tebd = qtn.TEBD(
                psi0.astype("complex128"), H,
                split_opts={"max_bond": 32, "cutoff": 1e-12},
                fused=fused, progbar=False,
            )
            tebd.update_to(T, dt=0.02, order=4, progbar=False)
            v = np.asarray(tebd.pt.to_dense()).ravel()
            vs[fused] = v
            assert fid(v, v_exact) > 1 - 1e-7
        assert fid(vs[True], vs[False]) > 1 - 1e-7

    def test_fused_entropy_growth_matches(self):
        """Half-chain entropy growth curves agree between the fused
        (batched Vidal) and sequential sweeps."""
        L = 10
        psi0 = qtn.MPS_neel_state(L)
        H = qtn.ham_1d_heis(L)
        ents = {}
        for fused in (True, False):
            tebd = qtn.TEBD(
                psi0.astype("complex128"), H,
                split_opts={"max_bond": 32, "cutoff": 1e-12},
                fused=fused, progbar=False,
            )
            es = []
            for _ in range(5):
                tebd.update_to(tebd.t + 0.2, dt=0.05, order=2,
                               progbar=False)
                es.append(float(tebd.pt.entropy(L // 2)))
            ents[fused] = es
        assert np.allclose(ents[True], ents[False], atol=1e-5)

    def test_fused_bform_right_canonical(self):
        """After fused parity sweeps the internal stack must stay
        right-canonical: sum_{p,r} B[l,p,r] conj(B[l',p,r]) is the
        identity on the active left block. The Hastings inverse-free
        update guarantees this without ever dividing by a Schmidt
        weight."""
        L = 10
        psi0 = qtn.MPS_neel_state(L).astype("complex128")
        tebd = qtn.TEBD(
            psi0, qtn.ham_1d_heis(L),
            split_opts={"max_bond": 16, "cutoff": 1e-12},
            fused=True, progbar=False,
        )
        tebd.update_to(0.6, dt=0.05, order=2, progbar=False)
        assert tebd._vidal is not None, "fused path not exercised"
        Bs, ls = tebd._vidal
        Bs = np.asarray(Bs)
        for i in range(1, L):
            B = Bs[i]
            G = np.einsum("lpr,mpr->lm", B, B.conj())
            # active left-dims have unit diagonal, padded ones zero
            d = np.real(np.diag(G)).copy()
            active = d > 0.5
            assert active.any()
            want = np.diag(active.astype(float))
            # drift is O(accumulated truncation error) for Hastings
            # updates — observed ~4e-6 here; the failure mode guarded
            # against (Gamma-lambda inversion blow-up) is O(1e-2+)
            assert np.max(np.abs(G - want)) < 1e-4

    def test_fused_bform_schmidt_weights_match_dense(self):
        """The stored bond weights are the true Schmidt coefficients
        of the evolved state (checked against the dense SVD)."""
        L = 8
        psi0 = qtn.MPS_neel_state(L).astype("complex128")
        tebd = qtn.TEBD(
            psi0, qtn.ham_1d_heis(L),
            split_opts={"max_bond": 16, "cutoff": 1e-12},
            fused=True, progbar=False,
        )
        tebd.update_to(0.5, dt=0.05, order=2, progbar=False)
        Bs, ls = tebd._vidal
        lam = np.sort(np.asarray(ls)[L // 2])[::-1]
        v = np.asarray(tebd.pt.to_dense()).reshape(2 ** (L // 2), -1)
        s = np.linalg.svd(v, compute_uv=False)
        s = s / np.linalg.norm(s)
        k = min(len(s), np.count_nonzero(lam > 1e-12))
        assert np.allclose(lam[:k], s[:k], atol=1e-7)

    def test_fused_norm_preserved_under_truncation(self):
        """Truncating fused evolution renormalizes: |psi| stays 1."""
        L = 12
        psi0 = qtn.MPS_neel_state(L).astype("complex128")
        tebd = qtn.TEBD(
            psi0, qtn.ham_1d_heis(L),
            split_opts={"max_bond": 6, "cutoff": 1e-10},
            fused=True, progbar=False,
        )
        tebd.update_to(1.5, dt=0.05, order=2, progbar=False)
        assert tebd.trunc_err > 1e-8  # truncation really happened
        nrm = float(abs(tebd.pt.norm()))
        assert abs(nrm - 1.0) < 1e-8

    def test_fused_strong_truncation_tracks_sequential(self):
        """At binding max_bond the fused B-form path loses no more
        fidelity than the sequential orthogonality-center path (the
        old Gamma-lambda form amplified SVD roundoff ~1e3x/sweep)."""
        import scipy.linalg as sla

        import quimb_tpu as qu

        L = 10
        T = 1.2
        psi0 = qtn.MPS_neel_state(L).astype("complex128")
        H = qtn.ham_1d_heis(L)
        Hd = np.asarray(qu.ham_heis(L))
        v_exact = sla.expm(-1j * T * Hd) @ np.asarray(
            psi0.to_dense()
        ).ravel()

        fids = {}
        for fused in (True, False):
            tebd = qtn.TEBD(
                psi0, H, split_opts={"max_bond": 8, "cutoff": 1e-12},
                fused=fused, progbar=False,
            )
            tebd.update_to(T, dt=0.05, order=2, progbar=False)
            v = np.asarray(tebd.pt.to_dense()).ravel()
            fids[fused] = abs(np.vdot(v, v_exact)) / np.linalg.norm(v)
        # both truncate hard; fused must not be meaningfully worse
        assert fids[True] > fids[False] - 1e-4
