"""Randomized linear algebra (reference ``quimb/linalg/rand_linalg.py``:
``rsvd`` :398, ``estimate_rank`` :302).

The core sketching kernels live in :mod:`quimb_tpu.ops.decomp` (they are
also registered as the ``svd:rand`` split driver); this module exposes
the reference's public API shape on top of them.
"""

import jax.numpy as jnp

from ..ops.decomp import estimate_rank  # noqa: F401  (re-export)
from ..ops.decomp import _rand_range_finder, _next_key, _svd_kernel, dag


def rsvd(A, eps_or_k, compute_uv=True, q=2, p=0, k_max=None, **kwargs):
    """Randomized SVD (reference ``rsvd`` rand_linalg.py:398).

    Parameters
    ----------
    A : array
        Matrix to decompose.
    eps_or_k : float or int
        If integer, the target rank; if float < 1, a relative
        singular-value cutoff — the rank is first estimated with
        :func:`estimate_rank`.
    compute_uv : bool, optional
        Return ``(U, s, VH)`` (default) or just ``s``.
    q : int, optional
        Number of power iterations for the range sketch.
    p : int, optional
        Oversampling.
    """
    m, n = A.shape[-2:]
    full = min(m, n)
    if isinstance(eps_or_k, float) and eps_or_k < 1:
        k = estimate_rank(A, eps=eps_or_k, k_max=k_max)
    else:
        k = int(eps_or_k)
    k = max(1, min(k + p, full))

    Q = _rand_range_finder(A, _next_key(), k, q)
    B = dag(Q) @ A
    U, s, VH = _svd_kernel(B)
    U = Q @ U
    k_out = min(k, full) if p == 0 else min(int(eps_or_k)
                                            if not isinstance(eps_or_k, float)
                                            else k, full)
    U, s, VH = U[..., :, :k_out], s[..., :k_out], VH[..., :k_out, :]
    if compute_uv:
        return U, s, VH
    return s


__all__ = ["rsvd", "estimate_rank"]
