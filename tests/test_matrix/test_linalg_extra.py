"""base_linalg / approx_spectral behavior tests (reference
tests/test_matrix/test_linalg/{test_base_linalg,test_approx_spectral}
.py strategy): windows, partial eigensystems across backends, Lazy
operators, matrix functions, and stochastic Lanczos quadrature
against exact traces."""

import numpy as np
import pytest

import quimb_tpu as qu
from quimb_tpu.linalg import base_linalg as bl
from quimb_tpu.linalg.approx_spectral import (
    approx_spectral_function,
    tr_exp_approx,
    tr_sqrt_approx,
)


def A(x):
    return np.asarray(x)


class TestPartialEigensystems:
    def test_eigensystem_partial_which_variants(self):
        H = qu.rand_herm(32, seed=1)
        el = np.linalg.eigvalsh(A(H))
        lo, vlo = bl.eigh(H, k=2, which="SA")
        assert np.allclose(np.sort(A(lo)), el[:2], atol=1e-6)
        hi, vhi = bl.eigh(H, k=2, which="LA")
        assert np.allclose(np.sort(A(hi)), el[-2:], atol=1e-6)

    def test_eigvalsh_k_only(self):
        H = qu.rand_herm(16, seed=2)
        el = np.linalg.eigvalsh(A(H))
        got = np.sort(A(bl.eigvalsh(H, k=3)))
        assert np.allclose(got, el[:3], atol=1e-6)

    def test_groundstate_eigenequation(self):
        H = qu.ham_heis(8, sparse=True)
        e0 = float(qu.groundenergy(H))
        v0 = A(qu.groundstate(H)).reshape(-1)
        Hd = A(qu.ham_heis(8, sparse=False))
        resid = np.linalg.norm(Hd @ v0 - e0 * v0)
        assert resid < 1e-5

    def test_bound_spectrum_contains_all(self):
        H = qu.rand_herm(24, seed=3)
        lmin, lmax = bl.bound_spectrum(H)
        el = np.linalg.eigvalsh(A(H))
        assert float(lmin) <= el[0] + 1e-6
        assert float(lmax) >= el[-1] - 1e-6

    def test_eigh_window_interior(self):
        H = qu.rand_herm(32, seed=4)
        el = np.linalg.eigvalsh(A(H))
        # window centered mid-spectrum
        w, v = bl.eigh_window(H, 0.5, 3)
        w = np.sort(A(w))
        # the returned eigenvalues are true eigenvalues
        for x in w:
            assert np.min(np.abs(el - x)) < 1e-6

    def test_eigvalsh_window_values_only(self):
        H = qu.rand_herm(32, seed=5)
        w = bl.eigvalsh_window(H, 0.5, 3)
        assert len(A(w)) == 3


class TestLazyAndSvds:
    def test_lazy_defers_construction(self):
        calls = []

        def make(n):
            calls.append(n)
            return qu.rand_herm(n, seed=6)

        L = bl.Lazy(make, 8, shape=(8, 8))
        assert not calls
        out = L()
        assert calls == [8]
        assert A(out).shape == (8, 8)

    def test_svds_topk(self):
        X = A(qu.rand_matrix(20, seed=7)) if hasattr(qu, "rand_matrix") \
            else np.random.default_rng(7).standard_normal((20, 20))
        sv = np.linalg.svd(X, compute_uv=False)
        got = np.sort(A(bl.svds(qu.qu(X), k=3, return_vecs=False)))
        assert np.allclose(got, np.sort(sv[:3]), atol=1e-6)

    def test_expm_multiply_matches_dense(self):
        H = qu.ham_heis(6, sparse=True)
        p = qu.rand_ket(64, seed=8)
        out = A(bl.expm_multiply(-0.3j * H if False else H, p))
        # matches dense expm @ p (real Hermitian exponent here)
        Hd = A(qu.ham_heis(6, sparse=False))
        import scipy.linalg as sla

        want = sla.expm(Hd) @ A(p).reshape(-1)
        assert np.allclose(out.reshape(-1), want, atol=1e-6)

    def test_sqrtm_squares_back(self):
        rho = qu.rand_rho(8, seed=9)
        r = A(bl.sqrtm(rho))
        assert np.allclose(r @ r, A(rho), atol=1e-8)

    def test_norm_2_is_spectral(self):
        X = np.random.default_rng(10).standard_normal((12, 12))
        assert float(bl.norm_2(qu.qu(X))) == pytest.approx(
            np.linalg.norm(X, 2), rel=1e-6
        )


class TestSLQ:
    def test_tr_exp_approx_vs_exact(self):
        rho = qu.rand_rho(2**8, seed=11)
        exact = float(np.sum(np.exp(np.linalg.eigvalsh(A(rho)))))
        approx = float(tr_exp_approx(rho, R=40, tol=5e-2))
        assert approx == pytest.approx(exact, rel=0.1)

    def test_tr_sqrt_approx_vs_exact(self):
        rho = qu.rand_rho(2**8, seed=12)
        ev = np.linalg.eigvalsh(A(rho))
        exact = float(np.sqrt(ev[ev > 0]).sum())
        approx = float(tr_sqrt_approx(rho, R=40, tol=5e-2))
        assert approx == pytest.approx(exact, rel=0.15)

    def test_approx_spectral_function_linear_is_trace(self):
        # f(x) = x: SLQ estimates tr(A) which is exact per probe in
        # expectation; use generous tolerance
        H = qu.rand_herm(2**7, seed=13)
        exact = float(np.real(np.trace(A(H))))
        approx = float(approx_spectral_function(
            H, lambda x: x, R=60, tol=5e-2
        ))
        assert approx == pytest.approx(exact, abs=2.0)
