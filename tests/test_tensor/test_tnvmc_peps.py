"""TNVMC on a 3x3 Heisenberg PEPS: every sampler's reweighted energy
estimate must agree with the exact Rayleigh quotient of the same state
(VERDICT round-1 item 10 done-criterion; reference samplers
tnvmc/tnvmc.py:96-596)."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn


def _edges_3x3():
    sid = {}
    for i in range(3):
        for j in range(3):
            sid[i, j] = len(sid)
    edges = []
    for i in range(3):
        for j in range(3):
            if i + 1 < 3:
                edges.append((sid[i, j], sid[i + 1, j]))
            if j + 1 < 3:
                edges.append((sid[i, j], sid[i, j + 1]))
    return edges


@pytest.fixture(scope="module")
def converged_peps():
    """A physically meaningful 3x3 PEPS: SimpleUpdate-converged
    towards the Heisenberg groundstate at D=2 (low-variance local
    energies make the statistical tests sharp)."""
    from quimb_tpu.operator import heisenberg_from_edges
    from quimb_tpu.tensor.tn2d.tebd import SimpleUpdate, ham_2d_heis

    ham = ham_2d_heis(3, 3)
    psi0 = qtn.PEPS_rand(3, 3, 2, seed=5, dtype="float64")
    su = SimpleUpdate(psi0, ham, tau=0.3, D=2, chi=16,
                      compute_energy_final=False)
    su.evolve(20)
    su.tau = 0.1
    su.evolve(20)
    psi = su.get_state()
    psi.astype_("float64")

    H = heisenberg_from_edges(_edges_3x3())
    Hd = H.build_sparse_matrix().toarray()
    v = np.asarray(psi.to_dense()).reshape(-1)
    e_state = float(np.real(v.conj() @ (Hd @ v) / (v.conj() @ v)))
    # exact groundstate for context: the SU state should be close
    e_gs = float(np.linalg.eigvalsh(Hd)[0])
    assert abs(e_state - e_gs) / abs(e_gs) < 0.06
    return H, psi, e_state


def _mc_energy(vmc, w=None):
    import jax.numpy as jnp

    params = vmc.params
    if vmc.direct:
        configs, w = vmc._sample_direct(params)
    else:
        configs = vmc._sample_batch(params, vmc.sweeps_per_sample)
        w = jnp.ones(configs.shape[0])
    e_loc = vmc._local_energies(params, configs)
    e = float(jnp.mean(w * jnp.real(e_loc)))
    se = float(jnp.std(jnp.real(e_loc))) / np.sqrt(configs.shape[0])
    return e, se


class TestSamplersOn3x3PEPS:
    def _check(self, sampler, converged_peps, nchains=256,
               burn=True, tol=0.03):
        from quimb_tpu.experimental.tnvmc import TNVMC

        H, psi, e_state = converged_peps
        vmc = TNVMC(psi, H, sampler=sampler, nchains=nchains, seed=2)
        if burn and not vmc.direct:
            vmc._sample_batch(vmc.params, 3 * 9)
        e, se = _mc_energy(vmc)
        assert abs(e - e_state) < max(5 * se, tol * abs(e_state)), (
            e, e_state, se,
        )

    def test_metropolis(self, converged_peps):
        from quimb_tpu.experimental.tnvmc import (
            MetropolisHastingsSampler,
        )

        self._check(MetropolisHastingsSampler(9, nchains=256, seed=0),
                    converged_peps)

    def test_exchange(self, converged_peps):
        """Exchange moves conserve magnetization: the estimate
        matches the sector-projected Rayleigh quotient."""
        from quimb_tpu.experimental.tnvmc import ExchangeSampler

        H, psi, _ = converged_peps
        # Sz=+1/2-sector start (9 sites, 5 up): compute the
        # sector-restricted reference instead
        import jax.numpy as jnp

        from quimb_tpu.experimental.tnvmc import TNVMC

        sam = ExchangeSampler(9, nchains=256, n_up=4, seed=0)
        vmc = TNVMC(psi, H, sampler=sam, nchains=256, seed=2)
        vmc._sample_batch(vmc.params, 3 * 9)
        e, se = _mc_energy(vmc)
        # sector-projected Rayleigh quotient of psi
        Hd = H.build_sparse_matrix().toarray()
        v = np.asarray(psi.to_dense()).reshape(-1)
        mask = np.array([bin(c).count("1") == 4 for c in range(512)])
        vp = np.where(mask, v, 0.0)
        e_sector = float(vp.conj() @ (Hd @ vp) / (vp.conj() @ vp))
        assert abs(e - e_sector) < max(5 * se, 0.05 * abs(e_sector))

    def test_hamiltonian(self, converged_peps):
        from quimb_tpu.experimental.tnvmc import HamiltonianSampler

        H, _, _ = converged_peps
        self._check(HamiltonianSampler.from_ham(H, 9, nchains=256,
                                                seed=0),
                    converged_peps)

    def test_dense(self, converged_peps):
        from quimb_tpu.experimental.tnvmc import DenseSampler

        H, psi, _ = converged_peps
        self._check(DenseSampler(psi, nchains=256, seed=0),
                    converged_peps)

    def test_cluster(self, converged_peps):
        from quimb_tpu.experimental.tnvmc import ClusterSampler

        H, psi, _ = converged_peps
        # per-draw cost is a sequential patch sweep: keep chains low
        self._check(ClusterSampler(psi, max_distance=1, seed=0),
                    converged_peps, nchains=96, tol=0.05)

    def test_bp(self, converged_peps):
        from quimb_tpu.experimental.tnvmc import BPSampler

        H, psi, _ = converged_peps
        # each draw runs sequential per-site BP re-convergence: keep
        # the chain count minimal and rely on the 5-sigma bound
        self._check(BPSampler(psi, seed=0, max_iterations=40),
                    converged_peps, nchains=40, tol=0.08)


class TestVMCOptimization3x3:
    def test_sr_improves_toward_groundstate(self, converged_peps):
        """Stochastic-reconfiguration VMC from a *random* PEPS makes
        substantial progress toward the 3x3 groundstate energy."""
        from quimb_tpu.experimental.tnvmc import TNVMC

        H, _, _ = converged_peps
        Hd = H.build_sparse_matrix().toarray()
        e_gs = float(np.linalg.eigvalsh(Hd)[0])
        psi0 = qtn.PEPS_rand(3, 3, 2, seed=11, dtype="float64")
        vmc = TNVMC(psi0, H, learning_rate=0.05, conditioner="sr",
                    nchains=256, seed=4)
        vmc.run(40, progbar=False)
        e0, e1 = vmc.energies[0], vmc.energies[-1]
        assert e1 < e0 - 0.5
        # within 10% of the groundstate after only 40 noisy steps
        assert abs(e1 - e_gs) / abs(e_gs) < 0.10
