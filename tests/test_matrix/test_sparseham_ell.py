"""Behavior tests for the ELL-format SparseHam matvec engine.

The TPU-native sparse Hamiltonian stores padded rows so its matvec is
a gather + dense row-reduce with no scatter (XLA serializes
scatter-adds on TPU). These tests pin down: ELL vs COO fallback
selection, numerical equality with scipy on skewed/structured
matrices, the jit-operand pytree round trip, and that the solvers
(Lanczos groundstate, Krylov expm) agree with dense linear algebra
through the new storage (reference behavior: par_dot_csr_matvec
core.py:779 and tests/test_core.py sparse matvec cases).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import quimb_tpu as qu
from quimb_tpu.core import SparseHam


def _rand_coo(n, density, seed):
    rng = np.random.default_rng(seed)
    m = sp.random(n, n, density=density, random_state=seed,
                  format="coo")
    return (m + m.T).tocoo()


class TestELLSelection:
    def test_uniform_rows_use_ell(self):
        H = qu.ham_heis(8, sparse=True)
        h = SparseHam(H)
        assert h._ell
        assert h.rows is None
        assert h.cols.ndim == 2

    def test_skewed_rows_fall_back_to_coo(self):
        # one dense row, everything else diagonal: ELL padding would
        # cost n*k = n^2 >> 4*nnz
        n = 256
        rows = np.concatenate([np.zeros(n, np.int64), np.arange(n)])
        cols = np.concatenate([np.arange(n), np.arange(n)])
        vals = np.ones(2 * n)
        A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
        h = SparseHam(A, dtype="float64")
        assert not h._ell
        assert h.rows is not None
        x = np.linspace(0, 1, n)
        np.testing.assert_allclose(
            np.asarray(h.matvec(jnp.asarray(x))), A @ x, atol=1e-12
        )

    def test_empty_matrix(self):
        A = sp.coo_matrix((4, 4))
        h = SparseHam(A, dtype="float64")
        x = np.ones(4)
        np.testing.assert_allclose(
            np.asarray(h.matvec(jnp.asarray(x))), np.zeros(4)
        )


class TestELLNumerics:
    @pytest.mark.parametrize("density", [0.002, 0.05, 0.3])
    def test_matvec_matches_scipy(self, density):
        A = _rand_coo(300, density, seed=7)
        h = SparseHam(A, dtype="float64")
        x = np.random.default_rng(1).normal(size=300)
        np.testing.assert_allclose(
            np.asarray(h.matvec(jnp.asarray(x))), A @ x,
            rtol=1e-12, atol=1e-12,
        )

    def test_matmat_via_vmap(self):
        A = _rand_coo(64, 0.1, seed=3)
        h = SparseHam(A, dtype="float64")
        X = np.random.default_rng(2).normal(size=(64, 5))
        np.testing.assert_allclose(
            np.asarray(h @ jnp.asarray(X)), A @ X, rtol=1e-11,
            atol=1e-12,
        )

    def test_to_dense_round_trip(self):
        A = _rand_coo(40, 0.15, seed=9)
        h = SparseHam(A, dtype="float64")
        np.testing.assert_allclose(
            np.asarray(h.to_dense()), A.toarray(), atol=1e-12
        )

    def test_complex_matrix_kept_complex(self):
        rng = np.random.default_rng(5)
        d = rng.normal(size=30) + 1j * rng.normal(size=30)
        A = sp.coo_matrix(
            (d, (rng.integers(0, 16, 30), rng.integers(0, 16, 30))),
            shape=(16, 16),
        )
        h = SparseHam(A, dtype="complex128")
        x = rng.normal(size=16) + 1j * rng.normal(size=16)
        np.testing.assert_allclose(
            np.asarray(h.matvec(jnp.asarray(x))), A @ x, atol=1e-12
        )

    def test_real_downcast_of_hermitian_complex(self):
        # complex-typed but numerically real data halves to the real
        # default dtype
        A = qu.ham_heis(6, sparse=True).astype(np.complex128)
        h = SparseHam(A)
        assert not np.issubdtype(h.dtype, np.complexfloating)


class TestELLAsJitOperand:
    def test_pytree_round_trip_inside_jit(self):
        H = qu.ham_heis(6, sparse=True)
        h = SparseHam(H, dtype="float64")

        @jax.jit
        def apply(op, x):
            return op.matvec(x)

        x = np.random.default_rng(0).normal(size=2**6)
        want = np.asarray(h.matvec(jnp.asarray(x)))
        got = np.asarray(apply(h, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_solvers_through_ell(self):
        # groundstate + Krylov expm agree with dense linalg
        L = 8
        Hs = qu.ham_heis(L, sparse=True)
        Hd = np.asarray(qu.ham_heis(L, sparse=False))
        e0 = float(qu.groundenergy(Hs))
        want = np.linalg.eigvalsh(Hd)[0]
        assert e0 == pytest.approx(want, abs=1e-6)

        from quimb_tpu.linalg.lanczos import expm_multiply_krylov

        v = np.random.default_rng(3).normal(size=2**L)
        v = v / np.linalg.norm(v)
        got = np.asarray(expm_multiply_krylov(
            SparseHam(Hs, dtype="float64"), jnp.asarray(v), t=-0.37,
        ))
        import scipy.linalg

        want_v = scipy.linalg.expm(-0.37 * Hd) @ v
        np.testing.assert_allclose(got, want_v, rtol=1e-6, atol=1e-8)
