"""Symmetry-block auto-detection for dense eigendecomposition
(reference ``quimb/linalg/autoblock.py``: ``compute_blocks`` :16,
``eigensystem_autoblocked`` :225).

Many physical operators conserve charges, making them permutation-
similar to a block-diagonal matrix. Detecting the blocks (connected
components of the nonzero structure) is a host-side, setup-time graph
problem (plain numpy with a union-find — the reference uses numba);
the per-block eigendecompositions are then the device work. The
TPU-idiomatic twist: blocks of equal size are **stacked and solved with
one vmapped ``eigh``**, turning many small factorizations into a
single batched XLA op.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def compute_blocks(ix, jx, d):
    """Charge sectors (matrix blocks) from the nonzero coordinates
    ``(ix, jx)`` of a ``d x d`` operator: the connected components of
    the sparsity graph (reference ``compute_blocks``
    autoblock.py:16)."""
    parent = np.arange(d)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for i, j in zip(np.asarray(ix), np.asarray(jx)):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[rj] = ri

    groups = collections.defaultdict(list)
    for i in range(d):
        groups[find(i)].append(i)
    return sorted(groups.values())


def _find_nonzeros(A, atol=1e-13):
    if sp.issparse(A):
        ix, jx = A.nonzero()
        return np.asarray(ix), np.asarray(jx), A.shape[0]
    A = np.asarray(A)
    ix, jx = np.nonzero(np.abs(A) > atol)
    return ix, jx, A.shape[0]


def eigensystem_autoblocked(A, sort=True, isherm=True,
                            return_vecs=True, atol=1e-13):
    """Eigendecomposition exploiting the block structure of ``A``
    (reference ``eigensystem_autoblocked`` autoblock.py:225): find the
    charge sectors, eigh each sector, scatter back. Equal-size sectors
    are batched through a single vmapped device ``eigh``.
    """
    if not isherm:
        raise ValueError(
            "autoblocking currently supports hermitian operators"
        )
    ix, jx, d = _find_nonzeros(A, atol=atol)
    sectors = compute_blocks(ix, jx, d)

    Ad = np.asarray(A.toarray() if sp.issparse(A) else A)
    el = np.zeros(d, dtype=float)
    ev = np.zeros((d, d), dtype=Ad.dtype) if return_vecs else None

    # group sectors by size for batched eigh
    by_size = collections.defaultdict(list)
    for sec in sectors:
        by_size[len(sec)].append(sec)

    for size, secs in by_size.items():
        if size == 1:
            for (i,) in secs:
                el[i] = Ad[i, i].real
                if return_vecs:
                    ev[i, i] = 1.0
            continue
        blocks = np.stack([Ad[np.ix_(s, s)] for s in secs])
        if len(secs) > 1:
            bl, bv = jax.vmap(jnp.linalg.eigh)(jnp.asarray(blocks))
        else:
            bl, bv = jnp.linalg.eigh(jnp.asarray(blocks[0]))
            bl, bv = bl[None], bv[None]
        bl = np.asarray(bl)
        bv = np.asarray(bv)
        for s, lk, vk in zip(secs, bl, bv):
            s = np.asarray(s)
            el[s] = lk
            if return_vecs:
                ev[np.ix_(s, s)] = vk

    if sort:
        order = np.argsort(el)
        el = el[order]
        if return_vecs:
            ev = ev[:, order]
    if return_vecs:
        return jnp.asarray(el), jnp.asarray(ev)
    return jnp.asarray(el)


__all__ = ["compute_blocks", "eigensystem_autoblocked"]
