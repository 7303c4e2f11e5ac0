"""Segmented cyclic (PBC) DMRG: transfer-matrix-compressed ring
closures (reference tn1d/dmrg.py:105-465 MovingEnvironment periodic
machinery; test model test_dmrg.py:283 test_cyclic_solve_big_with_
segmenting)."""

import jax.numpy as jnp
import numpy as np
import pytest

import quimb_tpu as q
import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.tn1d.dmrg import get_default_opts
from quimb_tpu.tensor.tn1d.dmrg_cyclic import (
    CyclicSweeper,
    _env_step_right_b,
    _nenv_step_right,
    cyclic_arrays_to_mps,
    cyclic_mpo_arrays,
    cyclic_mps_arrays,
)


def _ring_setup(L=8, chi=4, seed=42):
    H = qtn.MPO_ham_heis(L, cyclic=True, dtype="float64")
    psi = qtn.MPS_rand_state(L, chi, cyclic=True, seed=seed,
                             dtype="float64")
    return H, psi


def _exact_ring_expec(H, psi):
    pH = psi.H
    pH.reindex_({psi.site_ind(i): H.lower_ind(i)
                 for i in range(psi.L)})
    e = complex((pH | H | psi).contract(...)).real
    n = complex((psi.H | psi).contract(...)).real
    return e, n


def _closure_ring_values(eng, s0, s1, comp):
    lenv0, renv0, nlenv0, nrenv0 = eng._compress_closures(comp)
    lenv, nlenv = lenv0, nlenv0
    for i in range(s0, s1 + 1):
        Ak = eng._A[i % eng.L]
        lenv = _env_step_right_b(lenv, jnp.conj(Ak),
                                 eng._W[i % eng.L], Ak)
        nlenv = _nenv_step_right(nlenv, jnp.conj(Ak), Ak)
    e = float(jnp.real(jnp.einsum("sbwk,sbwk->", lenv, renv0)))
    n = float(jnp.real(jnp.einsum("sbk,sbk->", nlenv, nrenv0)))
    return e, n


class TestClosureInvariants:
    def test_roundtrip_arrays(self):
        H, psi = _ring_setup()
        As = cyclic_mps_arrays(psi)
        psi2 = cyclic_arrays_to_mps(As, psi)
        _, n = _exact_ring_expec(H, psi)
        _, n2 = _exact_ring_expec(H, psi2)
        assert n2 == pytest.approx(n, rel=1e-10)

    def test_compressed_closure_matches_exact_ring(self):
        """At full sketch rank the randomized transfer SVD is exact, so
        the closed-ring <H> and <1> must equal the dense TN values."""
        H, psi = _ring_setup()
        e, n = _exact_ring_expec(H, psi)
        eng = CyclicSweeper(cyclic_mpo_arrays(H),
                            cyclic_mps_arrays(psi),
                            get_default_opts(cyclic=True), seed=1)
        e2, n2 = _closure_ring_values(eng, 0, 4, [5, 6, 7])
        assert e2 == pytest.approx(e, abs=1e-6)
        assert n2 == pytest.approx(n, abs=1e-6)

    def test_pseudo_canonize_preserves_state(self):
        """The edge gauges inserted by pseudo-canonization are exact
        (x . x^-1): the ring Rayleigh quotient must not move."""
        H, psi = _ring_setup()
        e, n = _exact_ring_expec(H, psi)
        eng = CyclicSweeper(cyclic_mpo_arrays(H),
                            cyclic_mps_arrays(psi),
                            get_default_opts(cyclic=True), seed=1)
        eng._pseudo_canonize(0, 4, [5, 6, 7])
        e2, n2 = _closure_ring_values(eng, 0, 4, [5, 6, 7])
        assert e2 / n2 == pytest.approx(e / n, abs=1e-8)


class TestCyclicDMRG:
    def test_small_ring_routes_to_obc(self):
        dmrg = qtn.DMRG2(qtn.MPO_ham_heis(10, cyclic=True),
                         bond_dims=8)
        assert dmrg._cyc is None
        assert not dmrg.ham.cyclic

    def test_long_ring_uses_segmented_engine(self):
        dmrg = qtn.DMRG2(qtn.MPO_ham_heis(60, cyclic=True),
                         bond_dims=8)
        assert dmrg._cyc is not None
        assert dmrg.state.cyclic

    @pytest.mark.slow
    def test_sweeps_converge_L30(self):
        """Energy decreases monotonically-ish and the state stays
        normalized under segmented sweeps (generalized Rayleigh-Ritz
        local solves)."""
        ham = qtn.MPO_ham_heis(30, cyclic=True, dtype="float64")
        dmrg = qtn.DMRG2(ham, bond_dims=[8, 8, 12],
                         cyclic_mode="segmented")
        dmrg.opts["periodic_segment_size"] = 1 / 3
        ens = [dmrg.sweep("R", max_bond=chi, cutoff=1e-10)
               for chi in (8, 8, 12)]
        assert ens[-1] < ens[0] + 1e-6
        # within a few percent of the Bethe value already
        want = q.heisenberg_energy(30)
        assert abs(ens[-1] - want) / abs(want) < 3e-2
        psi = dmrg.state
        n = complex((psi.H | psi).contract(...)).real
        assert n == pytest.approx(1.0, abs=1e-2)

    @pytest.mark.slow
    def test_cyclic_L150_segmented(self):
        """The reference's own at-scale PBC target
        (test_dmrg.py:283): L=150 ring vs the analytic Bethe energy to
        rel 1e-3, WITHOUT OBC conversion — env moves O(1), closure
        ranks stay small (measured 13-38 at chi<=28)."""
        L = 150
        ham = qtn.MPO_ham_heis(L, cyclic=True, dtype="float64")
        dmrg = qtn.DMRG2(ham, bond_dims=list(range(10, 18, 2)) + [16])
        assert dmrg._cyc is not None  # no OBC conversion
        dmrg.opts["periodic_segment_size"] = 1 / 3
        en = None
        for chi in list(range(10, 18, 2)) + [16]:
            en = dmrg.sweep("R", max_bond=chi, cutoff=1e-10)
        want = q.heisenberg_energy(L)
        assert en == pytest.approx(want, rel=1e-3)
        # the ring ansatz is genuinely cyclic
        psi = dmrg.state
        assert psi.cyclic
        assert max(eng_r for eng_r in dmrg._cyc.bond_sizes) <= 128
