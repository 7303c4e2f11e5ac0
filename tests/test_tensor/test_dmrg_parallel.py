"""Batched steady-state DMRG engines: segment-parallel (production)
and whitened brickwork-Jacobi (experimental). Reference counterpart:
the serial sweeps of tensor_dmrg.py:1026; the parallel decomposition
follows real-space parallel DMRG (Stoudenmire & White,
arXiv:1301.3494)."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import quimb_tpu as q
import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.tn1d.dmrg_jacobi import (
    JacobiDMRG,
    mpo_to_padded_stack,
    mps_to_stack,
    stack_to_mps,
)
from quimb_tpu.tensor.tn1d.dmrg_parallel import ParallelDMRG


def _exact_e(L):
    return spla.eigsh(
        q.ham_heis(L, sparse=True), k=1, which="SA"
    )[0][0]


def _true_energy(psi, H):
    pb = psi.H
    pb.reindex_({
        psi.site_ind(i): H.lower_ind(i) for i in range(psi.L)
    })
    num = complex((pb | H | psi).contract(...)).real
    den = complex((psi.H | psi).contract(...)).real
    return num / den


def _converged(L, chi):
    H = qtn.MPO_ham_heis(L)
    dmrg = qtn.DMRG2(H, bond_dims=[8, 16, chi], cutoffs=1e-10)
    dmrg.solve(tol=1e-9, verbosity=0)
    return H, dmrg


class TestStacks:
    def test_roundtrip(self):
        H, dmrg = _converged(10, 16)
        psi = dmrg.state
        psi2 = stack_to_mps(mps_to_stack(psi, 16), psi)
        ov = complex((psi.H | psi2).contract(...))
        n1 = complex((psi.H | psi).contract(...))
        n2 = complex((psi2.H | psi2).contract(...))
        assert abs(ov) / np.sqrt(abs(n1) * abs(n2)) == pytest.approx(
            1.0, abs=1e-10
        )

    def test_mpo_padding_shape(self):
        H = qtn.MPO_ham_heis(8)
        Ws = mpo_to_padded_stack(H)
        assert Ws.shape[0] == 8
        assert Ws.shape[1] == Ws.shape[2]


class TestParallelDMRG:
    def test_whole_chain_segment_matches_sequential(self):
        """S=1 reduces exactly to a standard fixed-boundary sweep."""
        L = 8
        H, dmrg = _converged(L, 12)
        pd = ParallelDMRG(dmrg.state, H, max_bond=12, n_segments=1)
        pd._phase = 0
        en = pd.sweep()
        assert en == pytest.approx(_exact_e(L), abs=1e-5)

    def test_fixed_point_stability(self):
        """30 sweeps at the converged state keep the variational
        energy (the failure mode of naive parallel updates is
        divergence within a few sweeps)."""
        L = 16
        H, dmrg = _converged(L, 24)
        e0 = float(dmrg.energy)
        pd = ParallelDMRG(dmrg.state, H, max_bond=24, n_segments=2)
        for _ in range(30):
            en = pd.sweep()
        te = _true_energy(pd.get_state(), H)
        assert te == pytest.approx(e0, abs=1e-6)

    def test_converges_from_rough_seed(self):
        """A single low-bond seed sweep converges to the chi-limited
        optimum under parallel sweeps alone."""
        L = 16
        H = qtn.MPO_ham_heis(L)
        dmrg = qtn.DMRG2(H, bond_dims=[8], cutoffs=1e-10)
        dmrg.sweep("R", max_bond=8, cutoff=1e-10)
        pd = ParallelDMRG(dmrg.state, H, max_bond=24, n_segments=2)
        for _ in range(25):
            pd.sweep()
        te = _true_energy(pd.get_state(), H)
        assert te == pytest.approx(_exact_e(L), abs=1e-6)

    def test_inner_passes(self):
        L = 16
        H, dmrg = _converged(L, 24)
        pd = ParallelDMRG(
            dmrg.state, H, max_bond=24, n_segments=2, inner_passes=2
        )
        for _ in range(4):
            en = pd.sweep()
        assert en == pytest.approx(float(dmrg.energy), abs=1e-6)


class TestJacobiDMRG:
    def test_fixed_point_holds_with_damped_solves(self):
        """The brickwork engine is stable at the fixed point with
        ncv=2 (single damped Lanczos step per bond)."""
        L = 16
        H, dmrg = _converged(L, 24)
        jd = JacobiDMRG(dmrg.state, H, max_bond=24, ncv=2)
        for _ in range(15):
            en = jd.sweep()
        te = _true_energy(jd.get_state(), H)
        assert te == pytest.approx(float(dmrg.energy), abs=1e-6)


def test_sandwich_matvec_matches_einsum_pair():
    """The Pallas fused-sandwich Heff matvec (the TPU hot path inside
    _batched_solve_2site) computes exactly the same contraction as the
    einsum pair, validated in interpret mode on CPU."""
    from quimb_tpu.tensor.tn1d.dmrg_parallel import (
        _batched_matvec,
        _matvec_via_sandwich,
        _sandwich_stacks,
    )

    rng = np.random.default_rng(7)
    n, chi, d, w = 2, 8, 2, 5
    LW1 = np.asarray(
        rng.normal(size=(n, chi, w, d, d, chi)), dtype=np.float32
    )
    W2R = np.asarray(
        rng.normal(size=(n, w, d, d, chi, chi)), dtype=np.float32
    )
    th = np.asarray(
        rng.normal(size=(n, chi, d, d, chi)), dtype=np.float32
    )
    ref = np.asarray(_batched_matvec(LW1, W2R, th))
    A, B = _sandwich_stacks(LW1, W2R)
    got = np.asarray(_matvec_via_sandwich(
        A, B, th.reshape(n, chi * d, d * chi), interpret=True
    )).reshape(ref.shape)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_parallel_sweep_pallas_path_matches_einsum_path(monkeypatch):
    """Full ParallelDMRG outer sweeps with the Pallas matvec forced in
    interpret mode produce the same state as the einsum path.

    Starts from a CONVERGED state: from a random start the two
    implementations' f32 rounding differences get amplified into
    different (equally valid) Lanczos trajectories; at the fixed point
    the updates are tiny and the trajectories coincide."""
    L, chi = 16, 8
    H, dmrg = _converged(L, chi)
    H32 = H.copy()
    H32.astype_("float32")
    psi = dmrg.state
    psi.astype_("float32")

    def run(env):
        monkeypatch.setenv("QUIMB_TPU_PAR_PALLAS", env)
        pd = ParallelDMRG(psi, H32, max_bond=chi, n_segments=2, ncv=6,
                          inner_passes=1)
        for _ in range(2):
            en = pd.sweep()
        return en, np.asarray(pd.Ms)

    en_e, Ms_e = run("0")
    en_p, Ms_p = run("interpret")
    assert en_p == pytest.approx(en_e, abs=1e-5)
    # element-wise stack comparison is not gauge-meaningful (the
    # truncated split's basis within degenerate Schmidt multiplets is
    # arbitrary); compare the physical states via their f64 overlap
    def _ov(A, B):
        env = np.zeros((chi, chi)); env[0, 0] = 1.0
        for j in range(L):
            env = np.einsum(
                "ab,adx,bdy->xy",
                env, A[j].astype(np.float64), B[j].astype(np.float64),
            )
        return env[0, 0] if env.shape else float(env)

    ov = abs(_ov(Ms_e, Ms_p)) / np.sqrt(
        abs(_ov(Ms_e, Ms_e)) * abs(_ov(Ms_p, Ms_p))
    )
    assert ov == pytest.approx(1.0, abs=1e-5)
