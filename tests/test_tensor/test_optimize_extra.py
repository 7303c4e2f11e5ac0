"""TNOptimizer extras: basin-hopping driver, hessian-vector products,
Newton-CG via hessp, and the raw vectorized interfaces (behavior
modeled on reference tests/test_tensor/test_optimizers.py and
optimize.py:1400-1620)."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.optimize import TNOptimizer, Vectorizer


def _setup(L=6, bond=6):
    H = qtn.MPO_ham_heis(L)
    w0 = np.linalg.eigvalsh(np.asarray(H.to_dense()))[0]
    psi0 = qtn.MPS_rand_state(L, bond, seed=1, dtype="float64")

    def loss(psi, H):
        b = psi.H
        return qtn.expec_TN_1D(b, H.apply(psi)) / \
            qtn.expec_TN_1D(b, psi)

    return H, w0, psi0, loss


class TestVectorizedInterfaces:
    def test_vectorized_value_matches_value_and_grad(self):
        H, w0, psi0, loss = _setup()
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt._vectorizer = Vectorizer(opt.params)
        x0 = opt._vectorizer.pack(opt.params)
        opt._pbar = None
        v1, g = opt.vectorized_value_and_grad(x0)
        v2 = opt.vectorized_value(x0)
        assert v1 == pytest.approx(v2, rel=1e-12)
        assert g.shape == x0.shape

    def test_nevals_counts(self):
        H, w0, psi0, loss = _setup()
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt._vectorizer = Vectorizer(opt.params)
        x0 = opt._vectorizer.pack(opt.params)
        opt._pbar = None
        assert opt.nevals == 0
        opt.vectorized_value_and_grad(x0)
        opt.vectorized_value(x0)
        assert opt.nevals == 2

    def test_d_property(self):
        H, w0, psi0, loss = _setup(L=4, bond=3)
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        # total real degrees of freedom == packed vector length
        v = Vectorizer(opt.params)
        assert opt.d == v.pack(opt.params).size

    def test_hessp_matches_finite_difference(self):
        H, w0, psi0, loss = _setup(L=4, bond=3)
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt._vectorizer = Vectorizer(opt.params)
        opt._pbar = None
        x0 = opt._vectorizer.pack(opt.params)
        rng = np.random.default_rng(7)
        p = rng.standard_normal(x0.size)
        p /= np.linalg.norm(p)

        hvp = opt.vectorized_hessp(x0, p)
        assert hvp.shape == x0.shape

        # finite-difference of the gradient along p
        eps = 1e-5
        _, gp = opt.vectorized_value_and_grad(x0 + eps * p)
        _, gm = opt.vectorized_value_and_grad(x0 - eps * p)
        fd = (gp - gm) / (2 * eps)
        # normalize comparison scale
        denom = max(np.linalg.norm(fd), 1e-12)
        assert np.linalg.norm(hvp - fd) / denom < 1e-4


class TestDrivers:
    def test_basinhopping_groundstate(self):
        H, w0, psi0, loss = _setup()
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt.optimize_basinhopping(n=50, nhop=3)
        assert opt.loss == pytest.approx(w0, abs=1e-2)
        # basinhopping should not do worse than the starting energy
        assert opt.losses[-1] <= opt.losses[0]

    def test_newton_cg_with_hessp(self):
        from scipy.optimize import minimize

        H, w0, psi0, loss = _setup(L=4, bond=4)
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt._vectorizer = Vectorizer(opt.params)
        opt._pbar = None
        x0 = opt._vectorizer.pack(opt.params)
        res = minimize(
            opt.vectorized_value_and_grad, x0, jac=True,
            hessp=opt.vectorized_hessp, method="Newton-CG",
            options={"maxiter": 100},
        )
        w_exact = np.linalg.eigvalsh(
            np.asarray(qtn.MPO_ham_heis(4).to_dense())
        )[0]
        assert res.fun == pytest.approx(w_exact, abs=1e-4)

    def test_optional_backends_are_gated(self):
        H, w0, psi0, loss = _setup(L=4, bond=3)
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        for name in ("optimize_ipopt", "optimize_nlopt",
                     "optimize_nevergrad"):
            with pytest.raises((ImportError, NotImplementedError)):
                getattr(opt, name)(10)
