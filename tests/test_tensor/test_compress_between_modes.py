"""Environment-aware bond compression modes (reference
``_compress_between_tids`` mode='virtual-tree'/'full-bond',
tensor_core.py:6550): the env-aware modes must recover near-optimal
truncation on states left in a random (non-canonical) gauge, where
plain pair-local compression is suboptimal."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn


def overlap_fidelity(a, b):
    """|<a|b>| / (|a| |b|) for two MPS-like TNs."""
    ab = abs(complex(a @ b.H))
    na = abs(complex(a @ a.H)) ** 0.5
    nb = abs(complex(b @ b.H)) ** 0.5
    return ab / (na * nb)


@pytest.fixture
def noncanonical_mps():
    """An MPS in a scrambled gauge: random invertible matrices on
    every bond, so no site is canonical."""
    rng = np.random.default_rng(42)
    psi = qtn.MPS_rand_state(8, 12, seed=0, dtype="float64")
    for i in range(7):
        (ix,) = qtn.bonds(psi[i], psi[i + 1])
        d = psi.ind_size(ix)
        G = np.eye(d) + 0.8 * rng.standard_normal((d, d))
        Ginv = np.linalg.inv(G)
        psi[i].gate_(G.T, ix)
        psi[i + 1].gate_(Ginv, ix)
    return psi


def optimal_fidelity(psi, site, max_bond):
    """Best possible fidelity truncating the (site, site+1) bond,
    from the exact dense Schmidt spectrum."""
    d = np.asarray(psi.to_dense()).reshape(-1)
    d = d / np.linalg.norm(d)
    n = psi.nsites
    m = d.reshape(2 ** (site + 1), 2 ** (n - site - 1))
    s = np.linalg.svd(m, compute_uv=False)
    return float(np.sqrt(np.sum(s[:max_bond] ** 2)))


class TestVirtualTree:
    def test_beats_basic_on_noncanonical(self, noncanonical_mps):
        mb = 4
        site = 3
        f_opt = optimal_fidelity(noncanonical_mps, site, mb)

        basic = noncanonical_mps.copy()
        basic.compress_between(f"I{site}", f"I{site+1}",
                               max_bond=mb, cutoff=0.0)
        f_basic = overlap_fidelity(noncanonical_mps, basic)

        vt = noncanonical_mps.copy()
        vt.compress_between(f"I{site}", f"I{site+1}",
                            max_bond=mb, cutoff=0.0,
                            mode="virtual-tree", r=8)
        f_vt = overlap_fidelity(noncanonical_mps, vt)

        # with the tree covering the whole chain the virtual gauge is
        # exact: fidelity must essentially match the optimal one
        assert f_vt == pytest.approx(f_opt, abs=1e-6)
        # and beat the ungauged pair-local compression
        assert f_vt > f_basic + 1e-4

    def test_small_radius_still_helps(self, noncanonical_mps):
        mb = 4
        basic = noncanonical_mps.copy()
        basic.compress_between("I3", "I4", max_bond=mb, cutoff=0.0)
        f_basic = overlap_fidelity(noncanonical_mps, basic)

        vt = noncanonical_mps.copy()
        vt.compress_between("I3", "I4", max_bond=mb, cutoff=0.0,
                            mode="virtual-tree", r=2)
        f_vt = overlap_fidelity(noncanonical_mps, vt)
        assert f_vt > f_basic - 1e-8

    def test_bond_size_reduced_others_untouched(self, noncanonical_mps):
        vt = noncanonical_mps.copy()
        before = {
            i: np.asarray(vt[i].data).copy() for i in (0, 1, 6, 7)
        }
        vt.compress_between("I3", "I4", max_bond=3, cutoff=0.0,
                            mode="virtual-tree", r=8)
        (ix,) = qtn.bonds(vt[3], vt[4])
        assert vt.ind_size(ix) == 3
        # virtual gauging must not have modified any other tensor
        for i, dat in before.items():
            assert np.array_equal(np.asarray(vt[i].data), dat)


class TestFullBond:
    def test_matches_optimal_on_mps(self, noncanonical_mps):
        mb = 4
        site = 3
        f_opt = optimal_fidelity(noncanonical_mps, site, mb)
        fb = noncanonical_mps.copy()
        fb.compress_between(f"I{site}", f"I{site+1}",
                            max_bond=mb, cutoff=0.0,
                            mode="full-bond")
        f_fb = overlap_fidelity(noncanonical_mps, fb)
        # gram projectors are optimal on a tree; the ALS refinement
        # may move within ~1e-3 of it (distance vs normalized
        # fidelity objective)
        assert f_fb == pytest.approx(f_opt, abs=1e-3)
        basic = noncanonical_mps.copy()
        basic.compress_between(f"I{site}", f"I{site+1}",
                               max_bond=mb, cutoff=0.0)
        assert f_fb > overlap_fidelity(noncanonical_mps, basic)

    def test_closed_tn_loop_operator(self):
        """On a closed network (partition function) full-bond uses
        the single-layer loop operator + similarity transform; the
        contracted value must be nearly preserved."""
        tn = qtn.TN2D_classical_ising_partition_function(
            4, 4, beta=0.3,
        )
        z0 = complex(tn.contract(...))
        fb = tn.copy()
        fb.compress_between((1, 1), (1, 2), max_bond=1, cutoff=0.0,
                            mode="full-bond")
        z1 = complex(fb.contract(...))
        # off-critical 2D Ising: the loop operator is strongly
        # dominated by its leading eigenvector, so even rank-1
        # insertion preserves Z well
        assert abs(z1 - z0) / abs(z0) < 0.05

    def test_loopy_network(self):
        """full-bond works on a loopy graph where no canonical form
        exists at all."""
        tn = qtn.TN_from_edges_rand(
            [(0, 1), (1, 2), (2, 3), (3, 0)], D=6, phys_dim=2,
            seed=3, dtype="float64",
        )
        fb = tn.copy()
        fb.compress_between("I0", "I1", max_bond=3, cutoff=0.0,
                            mode="full-bond")
        f = overlap_fidelity(tn, fb)
        basic = tn.copy()
        basic.compress_between("I0", "I1", max_bond=3, cutoff=0.0)
        f_basic = overlap_fidelity(tn, basic)
        # the env-weighted fit can compensate the truncation through
        # the loop: near-perfect global fidelity, far beyond the
        # pair-local compression
        assert f > 0.999
        assert f > f_basic


class TestLocalFit:
    def test_beats_plain_basic(self, noncanonical_mps):
        mb = 4
        basic = noncanonical_mps.copy()
        basic.compress_between("I3", "I4", max_bond=mb, cutoff=0.0)
        f_basic = overlap_fidelity(noncanonical_mps, basic)

        lf = noncanonical_mps.copy()
        lf.compress_between("I3", "I4", max_bond=mb, cutoff=0.0,
                            mode="local-fit",
                            select_local_distance=2, steps=30)
        f_lf = overlap_fidelity(noncanonical_mps, lf)
        # refitting the local patch recovers fidelity lost to the
        # ungauged pair-local truncation
        assert f_lf > f_basic
        (ix,) = qtn.bonds(lf[3], lf[4])
        assert lf.ind_size(ix) == mb


class TestModeDispatch:
    def test_callable_mode(self, noncanonical_mps):
        called = []

        def mymode(tn, tid1, tid2, **opts):
            called.append((tid1, tid2, opts.get("max_bond")))

        noncanonical_mps.compress_between(
            "I3", "I4", max_bond=5, mode=mymode,
        )
        assert called and called[0][2] == 5

    def test_unknown_mode_raises(self, noncanonical_mps):
        with pytest.raises(ValueError, match="unknown compress mode"):
            noncanonical_mps.compress_between(
                "I3", "I4", max_bond=5, mode="nope",
            )

    def test_canonize_distance_runs(self, noncanonical_mps):
        tn = noncanonical_mps.copy()
        tn.compress_between("I3", "I4", max_bond=4, cutoff=0.0,
                            canonize_distance=2)
        f = overlap_fidelity(noncanonical_mps, tn)
        basic = noncanonical_mps.copy()
        basic.compress_between("I3", "I4", max_bond=4, cutoff=0.0)
        f_basic = overlap_fidelity(noncanonical_mps, basic)
        # gauging around the pair first cannot hurt
        assert f > f_basic - 1e-8

    def test_callback_invoked(self, noncanonical_mps):
        seen = []
        noncanonical_mps.compress_between(
            "I3", "I4", max_bond=4, cutoff=0.0,
            callback=lambda tn, tids: seen.append(tids),
        )
        assert len(seen) == 1
