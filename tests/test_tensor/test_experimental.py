"""Experimental extras: cluster update, CP decomposition, TN
marginals."""

import itertools

import numpy as np
import pytest

import quimb_tpu.tensor.tnag as tg
from quimb_tpu.core import ham_from_terms
from quimb_tpu.gen.operators import spin_operator


def _heis_2x3():
    edges = [((i, j), (i, j + 1)) for i in range(2) for j in range(2)]
    edges += [((0, j), (1, j)) for j in range(3)]
    ham = tg.ham_gen_heis(edges)
    S = {k: np.asarray(spin_operator(k)) for k in "XYZ"}
    sites = sorted({s for e in edges for s in e})
    idx = {s: i for i, s in enumerate(sites)}
    terms = [
        (1.0, (S[k], S[k]), (idx[a], idx[b]))
        for a, b in edges for k in "XYZ"
    ]
    Hd = np.asarray(ham_from_terms(terms, (2,) * 6)).real
    return edges, ham, Hd


class TestClusterUpdate:
    def test_bondenv_fit_minimizes(self):
        from quimb_tpu.experimental import fit_bondenv_projectors

        rng = np.random.default_rng(1)
        D, m = 8, 4
        F = rng.standard_normal((20, D * D))
        E = (F.T @ F).reshape(D, D, D, D)

        def dist2(x):
            d = (x - np.eye(D)).reshape(-1)
            return float(d @ E.reshape(D * D, D * D) @ d)

        Pl, s, Pr = fit_bondenv_projectors(E, m, max_iterations=100)
        Pl0, _, Pr0 = fit_bondenv_projectors(E, m, max_iterations=0)
        assert dist2(np.asarray(Pl @ Pr)) < 1e-6 * max(
            dist2(np.asarray(Pl0 @ Pr0)), 1.0
        )

    def test_beats_simple_update(self):
        from quimb_tpu.experimental import ClusterUpdateGen
        from quimb_tpu.tensor.tnag.tebd import SimpleUpdateGen

        edges, ham, Hd = _heis_2x3()
        w0 = np.linalg.eigvalsh(Hd)[0]
        psi0 = tg.TN_from_edges_rand(
            edges, D=2, phys_dim=2, seed=1, dtype="float64"
        )

        def dense_energy(obj):
            psi = obj.get_state()
            v = np.array(
                np.asarray(psi.to_dense()).reshape(-1).real, copy=True
            )
            v = v / np.linalg.norm(v)
            return float(v @ Hd @ v)

        res = {}
        for name, cls, kw in (
            ("su", SimpleUpdateGen, {}),
            ("cu", ClusterUpdateGen, dict(cluster_distance=1)),
        ):
            obj = cls(psi0, ham, D=3, compute_energy_final=False, **kw)
            for tau in (0.3, 0.1, 0.05):
                obj.evolve(15, tau=tau)
            res[name] = dense_energy(obj)
            if name == "cu":
                # gauged cluster estimator with matching distance
                est = obj.compute_energy()
                assert abs(est - res["cu"]) < 0.05 * abs(w0)
        assert abs(res["cu"] - w0) < abs(res["su"] - w0) + 1e-9


class TestCPDecomp:
    def test_exact_rank(self):
        import jax.numpy as jnp

        from quimb_tpu.experimental import cp_decompose
        from quimb_tpu.tensor.core import Tensor

        rng = np.random.default_rng(0)
        A, B, C = (rng.standard_normal((4, 2)) for _ in range(3))
        X = np.einsum("ar,br,cr->abc", A, B, C)
        t = Tensor(jnp.asarray(X), inds=("a", "b", "c"))
        tcp = cp_decompose(t, 2, steps=300, seed=1)
        R = np.asarray(
            tcp.contract(
                ..., output_inds=("a", "b", "c"), preserve_tensor=True
            ).data
        )
        assert np.abs(R - X).max() < 1e-8

    def test_cp_simplify_copy_tensor(self):
        import jax.numpy as jnp

        from quimb_tpu.experimental import cp_simplify
        from quimb_tpu.tensor.core import Tensor, TensorNetwork

        rng = np.random.default_rng(0)
        d = 3
        D = np.zeros((d, d, d))
        for i in range(d):
            D[i, i, i] = 1.0
        tn = TensorNetwork([
            Tensor(jnp.asarray(D), inds=("x", "y", "z")),
            Tensor(jnp.asarray(rng.standard_normal((d, d))),
                   inds=("z", "w")),
        ])
        tn2 = cp_simplify(tn, atol=1e-8, steps=500, seed=3)
        assert tn2.num_tensors == 4
        v1 = np.asarray(tn.contract(
            ..., output_inds=("x", "y", "w"), preserve_tensor=True
        ).data)
        v2 = np.asarray(tn2.contract(
            ..., output_inds=("x", "y", "w"), preserve_tensor=True
        ).data)
        assert np.abs(v1 - v2).max() < 1e-7


class TestTNMarginals:
    def test_vs_bruteforce(self):
        from quimb_tpu.experimental import (
            compute_all_marginals_via_autodiff,
            compute_all_marginals_via_slicing,
        )
        from quimb_tpu.tensor.tnag.builders import (
            HTN_classical_partition_function_from_edges,
        )

        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
        beta, h = 0.35, 0.4
        tn = HTN_classical_partition_function_from_edges(
            edges, beta=beta, h=h
        )
        inds = [f"s{i}" for i in range(4)]

        Z = 0.0
        marg = {ix: np.zeros(2) for ix in inds}
        for cfg in itertools.product([0, 1], repeat=4):
            s = [1 if c == 0 else -1 for c in cfg]
            E = -sum(s[a] * s[b] for a, b in edges) - h * sum(s)
            w = np.exp(-beta * E)
            Z += w
            for i, c in enumerate(cfg):
                marg[f"s{i}"][c] += w
        we = {k: v / Z for k, v in marg.items()}

        ws = compute_all_marginals_via_slicing(tn, inds)
        wa = compute_all_marginals_via_autodiff(tn, inds)
        for ix in inds:
            assert np.allclose(ws[ix], we[ix], atol=1e-10)
            assert np.allclose(wa[ix], we[ix], atol=1e-8)


class TestMeraBuilder:
    def test_ttn_randtree_norm(self):
        from quimb_tpu.experimental.merabuilder import TTN_randtree_rand

        ttn = TTN_randtree_rand(range(7), max_bond=4, seed=0)
        v = np.asarray(ttn.to_dense()).reshape(-1)
        assert v.shape == (128,)
        assert abs(np.linalg.norm(v) - 1) < 1e-10

    def test_layered_mera_like(self):
        from quimb_tpu.experimental.merabuilder import (
            TensorNetworkGenIso,
        )
        from quimb_tpu.gen.operators import pauli

        tn = TensorNetworkGenIso.empty(range(4), phys_dim=2)
        tn.layer_unitary_rand((1, 2), seed=1)
        tn.next_layer()
        tn.layer_isometry_rand((0, 1), dim=4, seed=2)
        tn.layer_isometry_rand((2, 3), dim=4, seed=3)
        tn.next_layer()
        tn.layer_cap_rand(seed=4)
        tn.isometrize_()
        v = np.asarray(tn.to_dense()).reshape(-1)
        assert abs(np.linalg.norm(v) - 1) < 1e-10
        # expectation matches dense
        Z = np.asarray(pauli("Z")).real
        ez = complex(tn.local_expectation_exact(Z, 1)).real
        rho = v.reshape(2, 2, 2, 2)
        ez_dense = np.einsum(
            "abcd,be,aecd->", rho.conj(), Z, rho
        ).real
        assert abs(ez - ez_dense) < 1e-10


class TestVMCExtras:
    def test_minsr_and_hamiltonian_sampler(self):
        import numpy as np

        import quimb_tpu.tensor as qtn
        from quimb_tpu.experimental.tnvmc import (
            HamiltonianSampler,
            TNVMC,
        )
        from quimb_tpu.operator import heisenberg_from_edges

        L = 6
        H = heisenberg_from_edges([(i, i + 1) for i in range(L - 1)])
        psi = qtn.MPS_rand_state(L, 4, seed=0, dtype="float64")
        sam = HamiltonianSampler.from_ham(H, L, nchains=128, seed=1)
        vmc = TNVMC(psi, H, sampler=sam, conditioner="minsr",
                    learning_rate=0.05, seed=0)
        vmc.run(25, progbar=False)
        # energy must decrease substantially under MinSR updates
        assert vmc.energies[-1] < vmc.energies[0] - 0.5


class TestVMCDirectSamplers:
    """Cluster / BP direct samplers + AmplitudeFactory (reference
    tnvmc/tnvmc.py:364,468,841)."""

    def _heis_mps_setup(self, L=6, chi=8):
        import quimb_tpu as qu
        import quimb_tpu.tensor as qtn
        from quimb_tpu.operator import heisenberg_from_edges

        H = heisenberg_from_edges([(i, i + 1) for i in range(L - 1)])
        # converge to the ground state so local energies have low
        # variance (zero-variance principle) -> sharp statistical test
        Hm = qtn.MPO_ham_heis(L)
        Hm.astype_("float64")
        dmrg = qtn.DMRG2(Hm, bond_dims=chi, cutoffs=1e-10)
        dmrg.solve(max_sweeps=8, tol=1e-8, verbosity=0)
        psi = dmrg.state
        psi.astype_("float64")
        Hd = H.build_sparse_matrix().toarray()
        v = np.asarray(psi.to_dense()).reshape(-1)
        e_exact = float(v.conj() @ (Hd @ v) / (v.conj() @ v))
        return H, psi, e_exact

    def _direct_energy(self, sampler, H, psi, e_exact, nchains=64,
                       tol=0.02):
        from quimb_tpu.experimental.tnvmc import TNVMC

        vmc = TNVMC(psi, H, sampler=sampler, nchains=nchains)
        import jax.numpy as jnp

        configs, w = vmc._sample_direct(vmc.params)
        e_loc = vmc._local_energies(vmc.params, configs)
        e = float(jnp.mean(w * jnp.real(e_loc)))
        assert abs(e - e_exact) < tol * abs(e_exact)

    def test_cluster_sampler_mps_energy(self):
        from quimb_tpu.experimental.tnvmc import ClusterSampler

        H, psi, e_exact = self._heis_mps_setup()
        sam = ClusterSampler(psi, max_distance=1, seed=0)
        self._direct_energy(sam, H, psi, e_exact)

    def test_bp_sampler_mps_energy(self):
        from quimb_tpu.experimental.tnvmc import BPSampler

        H, psi, e_exact = self._heis_mps_setup()
        sam = BPSampler(psi, seed=0)
        self._direct_energy(sam, H, psi, e_exact)

    def test_cluster_sampler_peps(self):
        """2x3 Heisenberg PEPS: the cluster-sampled, reweighted energy
        estimate agrees with the exact Rayleigh quotient."""
        import quimb_tpu.tensor as qtn
        from quimb_tpu.experimental.tnvmc import (
            ClusterSampler,
            TNVMC,
        )
        from quimb_tpu.operator import heisenberg_from_edges
        import jax.numpy as jnp

        lx, ly = 2, 3
        psi = qtn.PEPS_rand(lx, ly, bond_dim=2, seed=3,
                            dtype="float64")
        edges = []
        sid = {}
        for i in range(lx):
            for j in range(ly):
                sid[i, j] = len(sid)
        for i in range(lx):
            for j in range(ly):
                if i + 1 < lx:
                    edges.append((sid[i, j], sid[i + 1, j]))
                if j + 1 < ly:
                    edges.append((sid[i, j], sid[i, j + 1]))
        H = heisenberg_from_edges(edges)
        Hd = H.build_sparse_matrix().toarray()
        v = np.asarray(psi.to_dense()).reshape(-1)
        e_exact = float(v.conj() @ (Hd @ v) / (v.conj() @ v))

        sam = ClusterSampler(psi, max_distance=1, seed=0)
        vmc = TNVMC(psi, H, sampler=sam, nchains=192)
        configs, w = vmc._sample_direct(vmc.params)
        e_loc = vmc._local_energies(vmc.params, configs)
        e = float(jnp.mean(w * jnp.real(e_loc)))
        err = float(jnp.std(jnp.real(e_loc))) / np.sqrt(192)
        assert abs(e - e_exact) < max(6 * err, 0.15)

    def test_amplitude_factory(self):
        import quimb_tpu.tensor as qtn
        from quimb_tpu.experimental.tnvmc import AmplitudeFactory

        L = 5
        psi = qtn.MPS_rand_state(L, 4, seed=0, dtype="float64")
        af = AmplitudeFactory(psi, maxsize=64)
        rng = np.random.default_rng(0)
        configs = rng.integers(0, 2, (10, L))
        amps = af.amplitudes(configs)
        # against direct dense indexing
        v = np.asarray(psi.to_dense()).reshape([2] * L)
        for c, a in zip(configs, amps):
            assert abs(a - v[tuple(c)]) < 1e-10
        # cache: same configs hit, no recompute (monkeypatch _vfn)
        n0 = len(af._cache)
        af._vfn = None  # would raise if called again
        amps2 = af.amplitudes(configs)
        assert np.allclose(amps2, amps)
        assert len(af._cache) == n0
        # update invalidates
        af.update(params=af.params)
        assert len(af._cache) == 0
