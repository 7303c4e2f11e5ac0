"""CANDECOMP/PARAFAC decomposition of tensors and a TN simplification
pass based on it (reference ``quimb/experimental/misc/cp_decomp.py``).

A CP decomposition expresses ``T[i1..in] = sum_r A1[i1,r]...An[in,r]``
— in TN form, ``n`` factor matrices sharing one hyper bond index.
Implemented as classic CP-ALS (per-mode least squares against the
Khatri-Rao product of the other factors), fully in jnp so it runs
jitted on device.
"""

import jax.numpy as jnp
import numpy as np

from ..tensor.core import Tensor, TensorNetwork, rand_uuid

__all__ = ["cp_decompose", "cp_simplify"]


def _cp_als_arrays(X, rank, steps, tol, seed):
    """ALS on the dense array ``X``; returns factor matrices."""
    ndim = X.ndim
    rng = np.random.default_rng(seed)
    factors = [
        jnp.asarray(
            rng.standard_normal((X.shape[k], rank)).astype(
                np.dtype(str(X.dtype))
                if not np.issubdtype(np.dtype(str(X.dtype)), np.complexfloating)
                else np.float64
            )
        ).astype(X.dtype)
        for k in range(ndim)
    ]
    letters = "abcdefghijklmnop"
    prev_err = None
    nrmX = jnp.linalg.norm(jnp.reshape(X, (-1,)))
    for _ in range(steps):
        for k in range(ndim):
            # gram: hadamard product of A_j^H A_j over j != k
            V = None
            for j in range(ndim):
                if j == k:
                    continue
                G = jnp.conj(factors[j].T) @ factors[j]
                V = G if V is None else V * G
            # rhs: contract X with all other factors -> (d_k, R)
            eq_in = letters[:ndim]
            operands = [X]
            for j in range(ndim):
                if j == k:
                    continue
                eq_in += f",{letters[j]}z"
                operands.append(jnp.conj(factors[j]))
            eq = f"{eq_in}->{letters[k]}z"
            M = jnp.einsum(eq, *operands)
            factors[k] = jnp.linalg.solve(
                V.T + 1e-12 * jnp.eye(rank, dtype=V.dtype), M.T
            ).T
        # convergence check on reconstruction error
        eq = ",".join(f"{letters[j]}z" for j in range(ndim))
        R = jnp.einsum(f"{eq}->{letters[:ndim]}", *factors)
        err = float(
            jnp.linalg.norm(jnp.reshape(R - X, (-1,))) / (nrmX + 1e-300)
        )
        if prev_err is not None and abs(prev_err - err) < tol:
            break
        prev_err = err
    return factors, err


def cp_decompose(t, rank, bond_ind=None, steps=100, tol=1e-12, seed=0):
    """CP-decompose Tensor ``t`` into a TN of ``t.ndim`` factor
    matrices sharing the hyper index ``bond_ind``.

    Returns
    -------
    TensorNetwork
    """
    if bond_ind is None:
        bond_ind = rand_uuid()
    factors, err = _cp_als_arrays(t.data, rank, steps, tol, seed)
    return TensorNetwork(
        [
            Tensor(A, inds=(ix, bond_ind), tags=t.tags)
            for A, ix in zip(factors, t.inds)
        ],
        virtual=True, check_collisions=False,
    )


def cp_simplify(tn, atol=1e-12, inplace=False, **cp_opts):
    """Replace any tensor whose dimensions are all equal by its CP
    decomposition at that rank, whenever exact to ``atol`` — turning
    dense cores into hyper-index stars (cheaper downstream
    contraction)."""
    new = tn if inplace else tn.copy()
    for tid in tuple(new.tensor_map):
        t = new.tensor_map[tid]
        if t.ndim < 3:
            continue
        dims = set(t.shape)
        if len(dims) != 1:
            continue
        (rank,) = dims
        tcp = cp_decompose(t, rank, **cp_opts)
        # exactness check
        recon = tcp.contract(..., output_inds=t.inds,
                             preserve_tensor=True)
        err = float(jnp.max(jnp.abs(recon.data - t.data)))
        if err > atol:
            continue
        new._pop_tensor(tid)
        for ft in tcp:
            new.add_tensor(ft.copy())
    return new
