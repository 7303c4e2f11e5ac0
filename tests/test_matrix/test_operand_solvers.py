"""Operator-as-jit-operand solver behavior.

The iterative solvers (Lanczos groundstate, Krylov expm) accept the
operator as a *pytree operand* (SparseHam is registered as a pytree) so
the compiled program is cached per operator shape, not per matvec
closure — repeat calls must not re-trace (reference counterpart:
ARPACK/SLEPc solvers are stateless across calls, base_linalg.py:80).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quimb_tpu as qu
from quimb_tpu.core import SparseHam
from quimb_tpu.linalg.lanczos import (
    as_pytree_operator,
    eigh_lanczos,
    expm_multiply_krylov,
)


class TestSparseHamPytree:
    def test_flatten_roundtrip(self):
        H = SparseHam(qu.ham_heis(6, sparse=True))
        leaves, treedef = jax.tree_util.tree_flatten(H)
        # ELL layout drops the explicit row ids (2 leaves); the
        # skewed-row COO fallback keeps them (3 leaves)
        assert len(leaves) == (2 if H._ell else 3)
        H2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert H2.shape == H.shape and H2.dtype == H.dtype
        v = np.random.default_rng(0).normal(size=H.shape[0])
        np.testing.assert_allclose(
            np.asarray(H @ jnp.asarray(v)),
            np.asarray(H2 @ jnp.asarray(v)),
        )

    def test_matvec_under_jit_as_operand(self):
        H = SparseHam(qu.ham_heis(6, sparse=True))

        @jax.jit
        def quad(h, x):
            return jnp.vdot(x, h @ x).real

        v = jnp.asarray(
            np.random.default_rng(1).normal(size=H.shape[0])
        ).astype(H.dtype.name)
        got = float(quad(H, v))
        Hd = np.asarray(H.to_dense())
        want = float(np.asarray(v) @ Hd @ np.asarray(v))
        assert got == pytest.approx(want, rel=1e-10)

    def test_as_pytree_operator_classification(self):
        H = SparseHam(qu.ham_heis(4, sparse=True))
        assert as_pytree_operator(H) is H
        A = jnp.eye(4)
        assert isinstance(as_pytree_operator(A), jax.Array)
        # bare matvec callables are not operands
        assert as_pytree_operator(lambda x: x) is None

        # unregistered operator objects are not operands either
        class Op:
            def __matmul__(self, x):
                return x

        assert as_pytree_operator(Op()) is None


class TestOperandCaching:
    def test_groundenergy_repeat_call_hits_cache(self):
        H = qu.ham_heis(8, sparse=True)
        e1 = float(qu.groundenergy(H))
        from quimb_tpu.linalg.lanczos import _eigh_lanczos_op

        misses0 = _eigh_lanczos_op._cache_size()
        e2 = float(qu.groundenergy(H))
        assert _eigh_lanczos_op._cache_size() == misses0
        assert e1 == pytest.approx(e2, abs=1e-9)
        want = float(np.linalg.eigvalsh(np.asarray(qu.ham_heis(8)))[0])
        assert e1 == pytest.approx(want, abs=1e-6)

    def test_expm_operand_hermitian_complex_time(self):
        H = SparseHam(qu.ham_heis(6, sparse=True))
        rng = np.random.default_rng(3)
        v = rng.normal(size=H.shape[0]) + 1j * rng.normal(size=H.shape[0])
        v = jnp.asarray(v / np.linalg.norm(v))
        out = expm_multiply_krylov(H, v, t=-0.37j, ncv=24, hermitian=True)
        Hd = np.asarray(H.to_dense())
        el, ev = np.linalg.eigh(Hd)
        want = ev @ (np.exp(-0.37j * el) * (ev.conj().T @ np.asarray(v)))
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-8)

    def test_eigh_lanczos_dense_operand(self):
        rng = np.random.default_rng(4)
        A = rng.normal(size=(40, 40))
        A = jnp.asarray((A + A.T) / 2)
        v0 = jnp.asarray(rng.normal(size=40))
        lam, vec = eigh_lanczos(A, v0, ncv=20, restarts=8)
        want = np.linalg.eigvalsh(np.asarray(A))[0]
        assert float(lam) == pytest.approx(want, abs=1e-8)
        # vec is the matching eigenvector
        res = np.asarray(A @ vec) - float(lam) * np.asarray(vec)
        assert np.linalg.norm(res) < 1e-6


class TestEvolutionExpmOperand:
    def test_expm_matches_solve_sparse(self):
        H = qu.ham_heis(8, sparse=True)
        p0 = qu.rand_ket(2**8, seed=7)
        e1 = qu.Evolution(p0, H, method="expm")
        e2 = qu.Evolution(p0, H, method="solve")
        for t in (0.3, 0.9, 1.7):
            e1.update_to(t)
            e2.update_to(t)
            f = qu.fidelity(e1.pt, e2.pt)
            assert float(f) == pytest.approx(1.0, abs=1e-8)

    def test_expm_stable_closure_path_nonhermitian(self):
        # bare-callable rhs still works (Arnoldi path)
        H = np.asarray(qu.ham_heis(4))
        Hj = jnp.asarray(H)

        def rhs(x):
            return -1j * (Hj @ x)

        v = jnp.asarray(qu.computational_state("0101")).reshape(-1)
        v = v.astype("complex128")
        out = expm_multiply_krylov(rhs, v, t=0.51, ncv=16,
                                   hermitian=False)
        el, ev = np.linalg.eigh(H)
        want = ev @ (np.exp(-0.51j * el) * (ev.conj().T @ np.asarray(v)))
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-8)
