"""Randomized linear algebra behavior (reference
tests for rand_linalg: rsvd fixed/adaptive rank, estimate_rank)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quimb_tpu.linalg.rand_linalg import (
    count_svdvals_needed,
    estimate_rank,
    isvd,
    rsvd,
    rsvd_iterate,
)


def low_rank(m, n, r, seed=0, decay=1.0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, r)))
    v, _ = np.linalg.qr(rng.standard_normal((n, r)))
    s = np.exp(-decay * np.arange(r))
    return (u * s) @ v.T, s


class TestRSVD:
    def test_fixed_rank_exact_on_low_rank(self):
        A, s = low_rank(60, 40, 10)
        U, sv, VH = rsvd(A, 10, q=3, p=8)
        got = np.asarray(U * sv) @ np.asarray(VH)
        assert np.linalg.norm(got - A) < 1e-8
        assert np.allclose(np.asarray(sv), s, atol=1e-8)

    def test_adaptive_eps_discovers_rank(self):
        A, s = low_rank(80, 60, 14, decay=1.2)
        U, sv, VH = rsvd(A, 1e-7, q=3, k_start=4)
        # the found rank is within the randomized method's resolution
        # and the reconstruction reaches the cutoff level
        want = int(np.sum(s >= 1e-7 * s[0]))
        assert sv.shape[-1] >= want - 3
        got = np.asarray(U * sv) @ np.asarray(VH)
        assert np.linalg.norm(got - A) < 1e-4

    def test_compute_uv_false(self):
        A, s = low_rank(50, 50, 8)
        sv = rsvd(A, 8, compute_uv=False, q=3, p=6)
        assert np.allclose(np.asarray(sv), s[:8], atol=1e-6)

    def test_isvd_alias(self):
        A, s = low_rank(40, 30, 6)
        U, sv, VH = isvd(A, 6, q=3, p=6)
        got = np.asarray(U * sv) @ np.asarray(VH)
        assert np.linalg.norm(got - A) < 1e-7


class TestRSVDIterate:
    def test_qb_growth_captures_spectrum(self):
        A, s = low_rank(70, 50, 20, decay=0.7)
        U, sv, VH = rsvd_iterate(jnp.asarray(A), 1e-5, q=2,
                                 k_start=4, k_incr=1.5)
        # basis grew beyond the initial block
        assert sv.shape[-1] > 4
        Un = np.asarray(U)
        k = Un.shape[-1]
        assert np.allclose(Un.T @ Un, np.eye(k), atol=1e-8)

    def test_k_max_cap(self):
        A, s = low_rank(60, 60, 30, decay=0.1)
        U, sv, VH = rsvd_iterate(jnp.asarray(A), 1e-12, q=1,
                                 k_start=4, k_max=12)
        assert sv.shape[-1] <= 12


class TestEstimateRank:
    def test_exact_low_rank(self):
        A, s = low_rank(64, 48, 12)
        assert 11 <= estimate_rank(jnp.asarray(A), eps=1e-8) <= 13

    def test_count_svdvals(self):
        s = jnp.asarray(np.exp(-np.arange(10.0)))
        assert count_svdvals_needed(s, np.exp(-4.5)) == 5
