"""TNLinearOperator — a tensor network acting lazily as a matrix.

Re-design of reference ``TNLinearOperator`` (tensor_core.py:11989, cached
einsum expressions per matvec :12085-12092). The matvec is exposed as a
**pure jax function over the TN's arrays** (``matvec_fn``), so iterative
solvers (Lanczos/LOBPCG/Krylov expm in :mod:`quimb_tpu.linalg`) can jit a
whole solve with the operator's tensors as traced constants — this is
where >90% of DMRG flops execute (SURVEY §3.1).
"""

import functools

import jax.numpy as jnp
import numpy as np

from ..ops.contraction import array_contract_expression
from .core import Tensor, asinds


class TNLinearOperator:
    """View a tensor network as a linear operator mapping
    ``right_inds``-vectors to ``left_inds``-vectors."""

    def __init__(self, tn, left_inds, right_inds, ldims=None, rdims=None,
                 optimize=None, backend=None):
        from .core import TensorNetwork

        if isinstance(tn, (list, tuple)):
            tn = TensorNetwork(tn, virtual=True, check_collisions=False)
        elif isinstance(tn, Tensor):
            tn = TensorNetwork((tn,), virtual=True, check_collisions=False)
        self.tn = tn
        self.left_inds = asinds(left_inds)
        self.right_inds = asinds(right_inds)
        self.ldims = tuple(
            ldims if ldims is not None
            else (tn.ind_size(ix) for ix in self.left_inds)
        )
        self.rdims = tuple(
            rdims if rdims is not None
            else (tn.ind_size(ix) for ix in self.right_inds)
        )
        self.optimize = optimize
        self.dl = int(np.prod(self.ldims)) if self.ldims else 1
        self.dr = int(np.prod(self.rdims)) if self.rdims else 1
        self.shape = (self.dl, self.dr)
        self.dtype = np.dtype(str(tn.dtype))
        self._exprs = {}

    @property
    def arrays(self):
        return tuple(t.data for t in self.tn.tensor_map.values())

    def _get_expr(self, key, inputs, output, shapes):
        expr = self._exprs.get(key)
        if expr is None:
            expr = array_contract_expression(
                inputs, output, shapes=shapes, optimize=self.optimize,
            )
            self._exprs[key] = expr
        return expr

    def matvec_fn(self):
        """Return ``(fn, arrays)``: a pure function
        ``fn(arrays, v_tensor) -> w_tensor`` over raw tensor-shaped
        vectors (shape ``rdims`` -> shape ``ldims``), suitable for jit."""
        tensors = tuple(self.tn.tensor_map.values())
        inputs = [t.inds for t in tensors] + [self.right_inds]
        output = self.left_inds
        shapes = [t.shape for t in tensors] + [self.rdims]
        expr = self._get_expr("mv", tuple(map(tuple, inputs)),
                              tuple(output), shapes)

        def fn(arrays, v):
            return expr(*arrays, v)

        return fn, self.arrays

    def _matvec(self, v):
        fn, arrays = self.matvec_fn()
        vt = jnp.reshape(jnp.asarray(v), self.rdims)
        out = fn(arrays, vt.astype(self.dtype.name))
        return np.asarray(jnp.reshape(out, (self.dl,)))

    def matvec(self, v):
        return self._matvec(v)

    def _rmatvec(self, v):
        # (A† v) = conj(A^T conj(v))
        tensors = tuple(self.tn.tensor_map.values())
        inputs = [t.inds for t in tensors] + [self.left_inds]
        output = self.right_inds
        shapes = [t.shape for t in tensors] + [self.ldims]
        expr = self._get_expr("rmv", tuple(map(tuple, inputs)),
                              tuple(output), shapes)
        vt = jnp.conj(jnp.reshape(jnp.asarray(v), self.ldims))
        out = jnp.conj(expr(*(jnp.conj(a) for a in self.arrays),
                            vt.astype(self.dtype.name)))
        return np.asarray(jnp.reshape(out, (self.dr,)))

    rmatvec = _rmatvec

    def _matmat(self, X):
        k = X.shape[1]
        tensors = tuple(self.tn.tensor_map.values())
        batch_ind = "__batch__"
        inputs = [t.inds for t in tensors] + [
            (*self.right_inds, batch_ind)
        ]
        output = (*self.left_inds, batch_ind)
        shapes = [t.shape for t in tensors] + [(*self.rdims, k)]
        expr = self._get_expr(("mm", k), tuple(map(tuple, inputs)),
                              tuple(output), shapes)
        Xt = jnp.reshape(jnp.asarray(X), (*self.rdims, k))
        out = expr(*self.arrays, Xt.astype(self.dtype.name))
        return np.asarray(jnp.reshape(out, (self.dl, k)))

    matmat = _matmat

    def to_dense(self, optimize=None):
        """Contract to an explicit matrix."""
        return self.tn.to_dense(
            self.left_inds, self.right_inds,
            optimize=optimize or self.optimize,
        )

    toarray = to_dense

    @property
    def A(self):
        """Dense matrix form (scipy LinearOperator convention)."""
        return self.to_dense()

    def conj(self):
        """The complex conjugate operator (same index structure)."""
        return TNLinearOperator(
            self.tn.conj(), self.left_inds, self.right_inds,
            ldims=self.ldims, rdims=self.rdims,
            optimize=self.optimize,
        )

    def copy(self):
        return TNLinearOperator(
            self.tn.copy(), self.left_inds, self.right_inds,
            ldims=self.ldims, rdims=self.rdims,
            optimize=self.optimize,
        )

    def aslinearoperator(self):
        """As a scipy LinearOperator (host interop)."""
        import scipy.sparse.linalg as spla

        return spla.LinearOperator(
            shape=self.shape, dtype=self.dtype,
            matvec=self._matvec, rmatvec=self._rmatvec,
            matmat=self._matmat,
        )

    @property
    def H(self):
        return TNLinearOperator(
            self.tn.conj(), self.right_inds, self.left_inds,
            self.rdims, self.ldims, optimize=self.optimize,
        )

    def copy(self, conj=False, transpose=False):
        tn = self.tn.conj() if conj else self.tn.copy()
        if transpose:
            return TNLinearOperator(
                tn, self.right_inds, self.left_inds, self.rdims,
                self.ldims, optimize=self.optimize,
            )
        return TNLinearOperator(
            tn, self.left_inds, self.right_inds, self.ldims, self.rdims,
            optimize=self.optimize,
        )
