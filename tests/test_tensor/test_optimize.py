"""TNOptimizer / fitting / interface tests."""

import jax
import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.fitting import (
    tensor_network_distance,
    tensor_network_fit_als,
)
from quimb_tpu.tensor.optimize import TNOptimizer, Vectorizer
from quimb_tpu.tensor.interface import pack, unpack


class TestInterface:
    def test_pack_unpack(self):
        psi = qtn.MPS_rand_state(5, 4, seed=0)
        params, skeleton = pack(psi)
        psi2 = unpack(params, skeleton)
        assert isinstance(psi2, qtn.MatrixProductState)
        assert np.allclose(
            np.asarray(psi.to_dense()), np.asarray(psi2.to_dense())
        )

    def test_pytree_through_jit(self):
        psi = qtn.MPS_rand_state(5, 4, seed=0, dtype="float64")

        @jax.jit
        def norm2(psi):
            return qtn.expec_TN_1D(psi.H, psi)

        v = float(norm2(psi))
        assert abs(v - 1.0) < 1e-10

    def test_grad_through_tn(self):
        psi = qtn.MPS_rand_state(4, 3, seed=1, dtype="float64")

        def loss(psi):
            return jax.numpy.real(qtn.expec_TN_1D(psi.H, psi))

        g = jax.grad(loss)(psi)
        assert isinstance(g, qtn.MatrixProductState)
        # finite-difference directional derivative check
        rng = np.random.default_rng(0)
        d = [
            jax.numpy.asarray(rng.standard_normal(t.shape))
            for t in psi
        ]
        eps = 1e-6
        psi_p = psi.copy()
        psi_m = psi.copy()
        for t, dt in zip(psi_p, d):
            t.modify(data=t.data + eps * dt)
        for t, dt in zip(psi_m, d):
            t.modify(data=t.data - eps * dt)
        fd = (loss(psi_p) - loss(psi_m)) / (2 * eps)
        dot = sum(
            float(jax.numpy.sum(tg.data * dt))
            for tg, dt in zip(g, d)
        )
        assert abs(float(fd) - dot) < 1e-4 * max(1.0, abs(dot))


class TestVectorizer:
    def test_roundtrip_complex(self):
        tree = {
            "a": jax.numpy.asarray(
                np.random.default_rng(0).standard_normal((3, 4))
                + 1j * np.random.default_rng(1).standard_normal((3, 4))
            ),
            "b": jax.numpy.asarray(
                np.random.default_rng(2).standard_normal(5)
            ),
        }
        v = Vectorizer(tree)
        x = v.pack(tree)
        assert x.dtype == np.float64
        tree2 = v.unpack(x)
        assert np.allclose(np.asarray(tree2["a"]), np.asarray(tree["a"]))
        assert np.allclose(np.asarray(tree2["b"]), np.asarray(tree["b"]))


class TestTNOptimizer:
    def _setup(self, L=6):
        H = qtn.MPO_ham_heis(L)
        w0 = np.linalg.eigvalsh(np.asarray(H.to_dense()))[0]
        psi0 = qtn.MPS_rand_state(L, 6, seed=1, dtype="float64")

        def loss(psi, H):
            b = psi.H
            return qtn.expec_TN_1D(b, H.apply(psi)) / \
                qtn.expec_TN_1D(b, psi)

        return H, w0, psi0, loss

    def test_lbfgs_groundstate(self):
        H, w0, psi0, loss = self._setup()
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt.optimize(200)
        assert abs(opt.loss - w0) < 1e-3

    def test_adam_groundstate(self):
        H, w0, psi0, loss = self._setup()
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False, optimizer="adam",
                          learning_rate=0.05)
        opt.optimize(200)
        assert abs(opt.loss - w0) < 5e-2

    def test_constant_tags(self):
        H, w0, psi0, loss = self._setup()
        opt = TNOptimizer(
            psi0, loss, loss_constants={"H": H}, progbar=False,
            constant_tags=[psi0.site_tag(0)],
        )
        frozen_before = np.asarray(psi0[psi0.site_tag(0)].data)
        out = opt.optimize(20)
        frozen_after = np.asarray(out[out.site_tag(0)].data)
        assert np.allclose(frozen_before, frozen_after)

    def test_losses_monotonic_ish(self):
        H, w0, psi0, loss = self._setup()
        opt = TNOptimizer(psi0, loss, loss_constants={"H": H},
                          progbar=False)
        opt.optimize(50)
        assert opt.losses[-1] < opt.losses[0]


class TestFitting:
    def test_distance_zero_self(self):
        psi = qtn.MPS_rand_state(5, 4, seed=0)
        assert tensor_network_distance(psi, psi.copy()) < 1e-7

    def test_als_matches_svd_compression(self):
        target = qtn.MPS_rand_state(6, 8, seed=2, dtype="float64")
        guess = qtn.MPS_rand_state(6, 4, seed=3, dtype="float64")
        fitted = tensor_network_fit_als(guess, target, steps=12)
        d = tensor_network_distance(fitted, target, normalized=True)
        best = target.copy()
        best.compress(max_bond=4)
        d_best = tensor_network_distance(best, target, normalized=True)
        assert d < d_best * 1.05 + 1e-9

    def test_tn_fit_method(self):
        target = qtn.MPS_rand_state(5, 6, seed=4, dtype="float64")
        guess = qtn.MPS_rand_state(5, 3, seed=5, dtype="float64")
        fitted = guess.fit(target, steps=20)
        assert tensor_network_distance(fitted, target) < \
            tensor_network_distance(guess, target)

    def test_conjugate_gradient_solve(self):
        import jax.numpy as jnp
        from quimb_tpu.tensor.fitting import conjugate_gradient

        rng = np.random.default_rng(0)
        A = rng.normal(size=(12, 12))
        A = A @ A.T + 0.5 * np.eye(12)
        b = rng.normal(size=(12, 3))
        x = conjugate_gradient(jnp.asarray(A), jnp.asarray(b),
                               maxiter=200)
        assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-4

    @pytest.mark.parametrize("solver", ["cg", "lstsq", "eigh"])
    def test_als_solvers(self, solver):
        target = qtn.MPS_rand_state(6, 6, seed=1, dtype="float64")
        guess = qtn.MPS_rand_state(6, 6, seed=2, dtype="float64")
        fitted = tensor_network_fit_als(
            guess, target, steps=30, solver=solver, solver_maxiter=20,
        )
        # cg is an approximate iterative solve (plateaus on the
        # rank-deficient normal matrices of an exactly-representable
        # target); direct solvers reach machine-level fits
        tol = 0.05 if solver == "cg" else 1e-3
        assert tensor_network_distance(
            fitted, target, normalized=True) < tol

    def test_fit_tree_mps(self):
        # an MPS is a tree: tree-gauge fit should reach ALS quality
        # with no normal-matrix solves (ref fitting.py:608)
        from quimb_tpu.tensor.fitting import tensor_network_fit_tree

        target = qtn.MPS_rand_state(7, 6, seed=1, dtype="float64")
        guess = qtn.MPS_rand_state(7, 6, seed=2, dtype="float64")
        fitted = tensor_network_fit_tree(guess, target, steps=30)
        assert tensor_network_distance(
            fitted, target, normalized=True) < 1e-5

    def test_fit_method_dispatch(self):
        target = qtn.MPS_rand_state(5, 4, seed=3, dtype="float64")
        guess = qtn.MPS_rand_state(5, 4, seed=6, dtype="float64")
        f_tree = guess.copy().fit(target, method="tree", steps=20)
        f_ad = guess.copy().fit(target, method="autodiff", steps=60)
        for f in (f_tree, f_ad):
            assert tensor_network_distance(f, target) < \
                tensor_network_distance(guess, target)
