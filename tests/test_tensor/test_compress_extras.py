"""Tests for the 1D compression family, circuit extras, BP extras,
networking, MERA, 3D, and the Trotterized propagator builders."""

import numpy as np
import pytest
import scipy.linalg as sla

import quimb_tpu.tensor as qtn
import quimb_tpu.tensor.tn2d as t2
import quimb_tpu.tensor.tn3d as t3
from quimb_tpu.gen.operators import ham_heis, ham_heis_2D
from quimb_tpu.tensor.tn1d import compress as C


class TestCompress1D:
    @pytest.mark.parametrize(
        "method", ["direct", "dm", "zipup", "zipup-oversample", "fit",
                   "src", "src-oversample"]
    )
    def test_mpo_mps_apply(self, method):
        mps = qtn.MPS_rand_state(8, 8, seed=0, dtype="float64")
        mpo = qtn.MPO_ham_heis(8)
        exact = np.asarray(mpo.apply(mps).to_dense()).reshape(-1)
        out = C.mps_gate_with_mpo(
            mps, mpo, max_bond=16, cutoff=1e-12, method=method
        )
        got = np.asarray(out.to_dense()).reshape(-1)
        ph = np.vdot(got, exact)
        ph = ph / abs(ph)
        err = np.linalg.norm(got * ph - exact) / np.linalg.norm(exact)
        tol = 0.2 if method in ("zipup", "src") else 0.02
        assert err < tol
        assert out.max_bond() <= 16

    def test_src_exact_at_full_rank(self):
        """SRC with batch >= true rank reproduces the MPO x MPS
        application exactly (single randomized pass, no fat SVDs)."""
        mps = qtn.MPS_rand_state(8, 6, seed=1, dtype="float64")
        mpo = qtn.MPO_ham_heis(8)
        exact = np.asarray(mpo.apply(mps).to_dense()).reshape(-1)
        out = C.mps_gate_with_mpo(
            mps, mpo, max_bond=30, cutoff=0.0, method="src"
        )
        got = np.asarray(out.to_dense()).reshape(-1)
        err = np.linalg.norm(got - exact) / np.linalg.norm(exact)
        assert err < 1e-10

    def test_optimal_methods_match_svd(self):
        mps = qtn.MPS_rand_state(8, 8, seed=1, dtype="float64")
        mpo = qtn.MPO_ham_heis(8)
        exact_mps = mpo.apply(mps)
        exact = np.asarray(exact_mps.to_dense()).reshape(-1)
        best = exact_mps.copy()
        best.compress(max_bond=12, cutoff=0.0)
        d_best = np.linalg.norm(
            np.asarray(best.to_dense()).reshape(-1) - exact
        )
        for method in ("direct", "dm"):
            out = C.mps_gate_with_mpo(
                mps, mpo, max_bond=12, cutoff=0.0, method=method
            )
            d = np.linalg.norm(
                np.asarray(out.to_dense()).reshape(-1) - exact
            )
            assert d < d_best * 1.02 + 1e-12


class TestPropagators:
    def test_mpo_propagator(self):
        L, dt = 6, 0.01
        ham = qtn.ham_1d_heis(L)
        P = ham.build_mpo_propagator_trotterized(-dt)
        Pd = np.asarray(P.to_dense())
        exact = sla.expm(-dt * np.asarray(ham_heis(L)).real)
        assert np.abs(Pd - exact).max() < 5 * dt**2

    def test_pepo_propagator(self):
        dt = 0.01
        h2 = t2.ham_2d_heis(2, 3)
        P2 = h2.build_pepo_propagator(-dt, max_bond=8)
        inds = [P2.upper_ind(i, j) for i in range(2)
                for j in range(3)] + \
               [P2.lower_ind(i, j) for i in range(2) for j in range(3)]
        t = P2.contract(..., output_inds=tuple(inds),
                        preserve_tensor=True)
        P2d = np.asarray(t.data).reshape(64, 64)
        exact2 = sla.expm(-dt * np.asarray(ham_heis_2D(2, 3)).real)
        assert np.abs(P2d - exact2).max() < 5 * dt**2


class TestCircuitExtras:
    def test_circuit_mps_lazy(self):
        from quimb_tpu.tensor.circuit import CircuitDense, CircuitMPSLazy

        c1 = CircuitMPSLazy(4)
        c2 = CircuitDense(4)
        for c in (c1, c2):
            c.h(0)
            c.cx(0, 1)
            c.rx(0.3, 2)
            c.cz(2, 3)
            c.t(1)
            c.cx(1, 2)
        assert np.allclose(
            np.asarray(c1.to_dense()), np.asarray(c2.to_dense()),
            atol=1e-10,
        )

    def test_circuit_peps(self):
        from quimb_tpu.tensor.circuit import CircuitDense, CircuitPEPS

        cp = CircuitPEPS(2, 2, max_bond=4)
        cd = CircuitDense(4)
        for c in (cp, cd):
            c.h(0)
            c.cx(0, 1)
            c.cx(0, 2)
            c.cz(2, 3)
        assert abs(
            complex(cp.amplitude("0110")) - complex(cd.amplitude("0110"))
        ) < 1e-10

    def test_openqasm3(self):
        from quimb_tpu.tensor.circuit import Circuit

        c = Circuit.from_openqasm3_str(
            "OPENQASM 3; qubit[2] q; h q[0]; cx q[0],q[1];"
        )
        assert abs(abs(complex(c.amplitude("11"))) ** 2 - 0.5) < 1e-10


class TestBPExtras:
    def test_l2bp_runs(self):
        import quimb_tpu.tensor.belief_propagation as bp

        psi = t2.PEPS_rand(3, 3, 2, seed=0, dtype="float64")
        exact = float(np.linalg.norm(np.asarray(psi.to_dense())) ** 2)
        val = float(np.real(bp.contract_l2bp(psi, tol=1e-8)))
        assert abs(val - exact) / exact < 0.3

    def test_diis_accelerates(self):
        import jax.numpy as jnp

        from quimb_tpu.tensor.belief_propagation import DIIS

        diis = DIIS()
        x = jnp.zeros(5)
        c = jnp.arange(5.0)
        for _ in range(5):
            x = diis.update(0.5 * x + c)
        assert float(jnp.abs(x - 2 * c).max()) < 1e-8

    def test_region_graph(self):
        from quimb_tpu.tensor.belief_propagation import RegionGraph

        rg = RegionGraph([{1, 2}, {2, 3}, {3, 4}])
        # CVM: total count of any contained element's regions == 1
        for site in (1, 2, 3, 4):
            tot = sum(
                c for r, c in rg.counts.items() if site in r
            )
            assert tot == 1


class TestNetworkingExtras:
    def test_hotrg_and_ctmrg(self):
        psi = t2.PEPS_rand(4, 4, 2, seed=0, dtype="float64")
        norm = psi.make_norm()
        exact = float(np.linalg.norm(np.asarray(psi.to_dense())) ** 2)
        v1 = float(np.real(norm.copy().contract_hotrg(max_bond=32)))
        v2 = float(np.real(norm.copy().contract_ctmrg(max_bond=32)))
        assert abs(v1 - exact) / exact < 1e-6
        assert abs(v2 - exact) / exact < 1e-4

    def test_mera(self):
        from quimb_tpu.tensor.tn1d.mera import MERA

        m = MERA.rand(8, seed=0).isometrize()
        assert abs(float(m.norm()) - 1.0) < 1e-10

    def test_peps3d(self):
        p3 = t3.PEPS3D.rand(2, 2, 2, 2, seed=1, dtype="float64")
        exact = float(np.linalg.norm(np.asarray(p3.to_dense())) ** 2)
        bdry = float(np.real(p3.norm2(max_bond=16)))
        assert abs(exact - bdry) / exact < 1e-10

    def test_su3d_runs(self):
        ham = t3.ham_3d_heis(2, 2, 2)
        psi0 = t3.PEPS3D.rand(2, 2, 2, 2, seed=0, dtype="float64")
        su = t3.SimpleUpdate3D(psi0, ham, D=2)
        su.evolve(4, tau=0.1)
        psi = su.get_state()
        assert np.isfinite(
            float(np.linalg.norm(np.asarray(psi.to_dense())))
        )


class TestVMC:
    def test_vmc_improves(self):
        from quimb_tpu.experimental.tnvmc import ExchangeSampler, TNVMC
        from quimb_tpu.operator import heisenberg_from_edges

        L = 6
        edges = [(i, i + 1) for i in range(L - 1)]
        ham = heisenberg_from_edges(edges)
        psi0 = qtn.MPS_rand_state(L, 4, seed=3, dtype="float64")
        vmc = TNVMC(
            psi0, ham,
            sampler=ExchangeSampler(L, nchains=128, seed=1),
            learning_rate=0.05, nchains=128, seed=2, burn_in=16,
        )
        vmc.run(25, progbar=False)
        w0 = np.linalg.eigvalsh(np.asarray(ham_heis(L)).real)[0]
        # should be clearly below zero and descending toward w0
        assert vmc.energies[-1] < 0.5 * w0


class TestSLQTensor:
    def test_mps_subsystem_entropy(self):
        from quimb_tpu.tensor.tensor_approx_spectral import (
            tensor_network_approx_spectral_function,
        )

        psi = qtn.MPS_rand_state(10, 8, seed=0, dtype="float64")
        rho_op = psi.partial_trace_linop(range(5))
        S_ap = -tensor_network_approx_spectral_function(
            rho_op,
            lambda x: np.where(
                x > 0, x * np.log2(np.clip(x, 1e-300, None)), 0.0
            ),
            tol=0.05, pos=True, seed=3,
        )
        rho = np.asarray(psi.partial_trace(range(5)))
        w = np.linalg.eigvalsh(rho)
        w = w[w > 1e-16]
        S_ex = float(-(w * np.log2(w)).sum())
        assert abs(S_ap - S_ex) / S_ex < 0.15


class TestCyclic:
    def test_cyclic_mps_norm(self):
        import quimb_tpu.tensor as qtn

        psi = qtn.MPS_rand_state(6, 4, seed=0, cyclic=True,
                                 dtype="float64")
        assert psi.cyclic
        d = np.asarray(psi.to_dense()).reshape(-1)
        n2 = complex(psi.H @ psi)
        assert abs(np.vdot(d, d).real - n2.real) < 1e-8

    def test_add_mps_obc_and_cyclic(self):
        import quimb_tpu.tensor as qtn

        a = qtn.MPS_rand_state(5, 3, seed=1, dtype="float64")
        b = qtn.MPS_rand_state(5, 4, seed=2, dtype="float64")
        s = a.add_MPS(b)
        assert np.allclose(
            np.asarray(s.to_dense()),
            np.asarray(a.to_dense()) + np.asarray(b.to_dense()),
            atol=1e-10,
        )
        ac = qtn.MPS_rand_state(5, 3, seed=1, cyclic=True,
                                dtype="float64")
        bc = qtn.MPS_rand_state(5, 2, seed=2, cyclic=True,
                                dtype="float64")
        sc = ac.add_MPS(bc)
        assert np.allclose(
            np.asarray(sc.to_dense()),
            np.asarray(ac.to_dense()) + np.asarray(bc.to_dense()),
            atol=1e-10,
        )

    def test_cyclic_heis_mpo_exact(self):
        import quimb_tpu.tensor as qtn
        from quimb_tpu.gen.operators import ham_heis

        L = 6
        mpo = qtn.MPO_ham_heis(L, cyclic=True)
        He = np.asarray(ham_heis(L, cyclic=True)).real
        assert np.abs(np.asarray(mpo.to_dense()) - He).max() < 1e-10
        # apply to MPS and to itself
        psi = qtn.MPS_rand_state(L, 3, seed=0, cyclic=True,
                                 dtype="float64")
        got = np.asarray(mpo.apply(psi).to_dense()).reshape(-1)
        want = He @ np.asarray(psi.to_dense()).reshape(-1)
        assert np.abs(got - want).max() < 1e-8
        got2 = np.asarray(mpo.apply(mpo).to_dense())
        assert np.abs(got2 - He @ He).max() < 1e-8

    def test_cyclic_tebd_vs_expm(self):
        import quimb_tpu.tensor as qtn
        from quimb_tpu.gen.operators import ham_heis

        L = 6
        He = np.asarray(ham_heis(L, cyclic=True)).real
        ham = qtn.ham_1d_heis(L, cyclic=True)
        psi0 = qtn.MPS_computational_state(
            "010101", cyclic=True, dtype="complex128"
        )
        tebd = qtn.TEBD(psi0, ham, dt=0.05)
        tebd.update_to(0.2, progbar=False)
        got = np.asarray(tebd.pt.to_dense()).reshape(-1)
        v0 = np.zeros(2**L)
        v0[0b010101] = 1.0
        want = sla.expm(-1j * 0.2 * He) @ v0
        fid = abs(np.vdot(want, got)) ** 2 / np.vdot(got, got).real
        assert fid > 1 - 1e-4

    def test_cyclic_dmrg(self):
        import quimb_tpu.tensor as qtn
        from quimb_tpu.gen.operators import ham_heis

        L = 10
        H = qtn.MPO_ham_heis(L, cyclic=True)
        w0 = np.linalg.eigvalsh(
            np.asarray(ham_heis(L, cyclic=True)).real
        )[0]
        # exact OBC form of the ring MPO
        obc = H.to_obc()
        assert not obc.cyclic
        assert np.abs(
            np.asarray(obc.to_dense())
            - np.asarray(ham_heis(L, cyclic=True)).real
        ).max() < 1e-10
        dmrg = qtn.DMRG2(H, bond_dims=[16, 32], cutoffs=1e-11)
        dmrg.solve(tol=1e-9, max_sweeps=8)
        assert abs(dmrg.energy - w0) < 1e-6

    def test_gate_with_submpo(self):
        import quimb_tpu.tensor as qtn
        from quimb_tpu.core import ikron

        L = 8
        psi = qtn.MPS_rand_state(L, 6, seed=0, dtype="float64")
        sub = qtn.MPO_ham_heis(3)
        out = psi.gate_with_submpo(sub, where=(2, 3, 4), max_bond=24)
        Hd = np.asarray(sub.to_dense())
        want = np.asarray(ikron(Hd, (2,) * L, (2, 3, 4))) @ \
            np.asarray(psi.to_dense()).reshape(-1)
        got = np.asarray(out.to_dense()).reshape(-1)
        assert np.abs(got - want).max() < 1e-8


class TestNetworkingPathsPatches:
    def test_paths_and_queries(self):
        import quimb_tpu.tensor.networking as nw

        tn = qtn.TN2D_rand(3, 4, 2, seed=0)

        def tid_at(i, j):
            return next(iter(tn.tag_map[f"I{i},{j}"]))

        t00, t01, t23 = tid_at(0, 0), tid_at(0, 1), tid_at(2, 3)
        p = nw.get_path_between_tids(tn, t00, t23)
        # shortest = manhattan distance on the grid
        assert len(p) == 5
        for (a, b), ix in zip(zip(p.tids, p.tids[1:]), p.inds):
            assert set(tn.ind_map[ix]) == {a, b}
        assert nw.tids_are_connected(tn, [t00, t01])
        assert not nw.tids_are_connected(tn, [t00, t23])
        d = nw.compute_shortest_distances(tn, [t00, t01, t23])
        assert d[tuple(sorted((t00, t01)))] == 1
        assert d[tuple(sorted((t00, t23)))] == 5
        assert len(nw.get_local_patch(tn, [t00], max_distance=1)) == 3
        lu = nw.get_loop_union(tn, [t00], max_size=4, grow_from="any")
        assert t00 in lu and len(lu) >= 4

    def test_bipartitions_and_hierarchy(self):
        import quimb_tpu.tensor.networking as nw

        bips = list(
            nw.connected_bipartitions(qtn.MPS_rand_state(4, 2))
        )
        assert len(bips) == 3  # chain of 4 has 3 connected cuts

        tn = qtn.TN2D_rand(3, 4, 2, seed=0)
        g = nw.compute_hierarchical_grouping(tn, max_group_size=4)
        assert sum(len(x) for x in g) == 12
        sp = nw.compute_hierarchical_ssa_path(tn)
        assert len(sp) == tn.num_tensors - 1
        pats = list(nw.gen_inds_connected(tn, 2))
        assert pats and all(len(s) == 2 for s in pats)
