"""Randomized linear algebra (reference ``quimb/linalg/rand_linalg.py``:
``rsvd`` :398, ``rsvd_iterate`` adaptive QB growth, ``estimate_rank``
:302, ``isvd`` interpolative-style sketch).

The core sketching kernels live in :mod:`quimb_tpu.ops.decomp` (they
are also registered as the ``svd:rand`` / ``rsvd`` / ``isvd`` split
drivers); this module provides the reference's public API including
the *adaptive* rank discovery path: the sketch basis is grown block
by block, each new block orthogonalized against the accumulated basis
(a QB iteration), until the captured spectrum crosses the requested
relative cutoff — so the cost is O(m n k_found) even when the rank is
not known in advance.
"""

import math

import jax.numpy as jnp
import numpy as np

from ..ops.decomp import estimate_rank  # noqa: F401  (re-export)
from ..ops.decomp import (
    _next_key,
    _rand_range_finder,
    _svd_kernel,
    dag,
    safe_qr,
)


def _power_iterate(A, AH, G, q):
    """q passes of (A AH) applied to the block G with stabilizing QR
    (reference power iterations in ``rsvd_core``)."""
    Y = A @ G
    for _ in range(q):
        Q, _ = safe_qr(Y)
        Y = A @ (AH @ Q[..., :, : G.shape[-1]])
    return Y


def rsvd_iterate(
    A,
    eps,
    q=2,
    k_start=16,
    k_incr=1.5,
    k_max=None,
    AH=None,
):
    """Adaptively grow an orthonormal range basis ``Q`` block-by-block
    until the captured singular spectrum drops below ``eps`` relative
    to the largest value (reference ``rsvd_iterate``
    rand_linalg.py:173 — the QB adaptive growth path).

    Returns ``(U, s, VH)`` of the captured (possibly overshot) range.
    """
    m, n = A.shape[-2:]
    full = min(m, n)
    if k_max is None:
        k_max = full
    k_max = min(k_max, full)
    if AH is None:
        AH = dag(A)

    Q = None
    k_step = max(int(k_start), 1)
    while True:
        G = jnp.asarray(
            np.random.default_rng(
                int(_next_key()[1]) % (2**31)
            ).standard_normal((n, k_step)),
            dtype=jnp.real(A).dtype,
        ).astype(A.dtype)
        Y = _power_iterate(A, AH, G, q)
        if Q is not None:
            # project out the already-captured range (QB growth).
            # power iteration concentrates Y on the top directions —
            # which are exactly the captured ones — so the residual is
            # tiny and needs the classic "twice is enough" double
            # re-orthogonalization to stay numerically orthogonal
            Y = Y - Q @ (dag(Q) @ Y)
            Y = Y - Q @ (dag(Q) @ Y)
        Qnew, _ = safe_qr(Y)
        Qnew = Qnew[..., :, :k_step]
        if Q is not None:
            Qnew = Qnew - Q @ (dag(Q) @ Qnew)
            Qnew, _ = safe_qr(Qnew)
            Qnew = Qnew[..., :, :k_step]
        Q = Qnew if Q is None else jnp.concatenate([Q, Qnew], axis=-1)
        k = Q.shape[-1]

        B = dag(Q) @ A
        s = _svd_kernel(B)[1]
        s0 = s[..., 0]
        if bool(jnp.any(s < eps * s0)) or k >= k_max:
            U, s, VH = _svd_kernel(B)
            return Q @ U, s, VH
        k_step = min(
            max(int(math.ceil(k_step * k_incr)), 1), k_max - k
        )


def count_svdvals_needed(s, eps):
    """Number of singular values above ``eps`` relative cutoff
    (reference ``count_svdvals_needed``)."""
    s = jnp.asarray(s)
    s0 = s[..., 0]
    return int(jnp.sum(s >= eps * s0))


def rsvd(A, eps_or_k, compute_uv=True, q=2, p=0, k_max=None,
         k_start=16, k_incr=1.5, **kwargs):
    """Randomized SVD (reference ``rsvd`` rand_linalg.py:398).

    Parameters
    ----------
    A : array
        Matrix to decompose.
    eps_or_k : float or int
        If integer, the target rank (single fixed-size sketch); if a
        float < 1, a relative singular-value cutoff — the rank is
        discovered adaptively by block-grown QB iteration
        (:func:`rsvd_iterate`).
    compute_uv : bool, optional
        Return ``(U, s, VH)`` (default) or just ``s``.
    q : int, optional
        Number of power iterations for the range sketch.
    p : int, optional
        Oversampling (fixed-rank path).
    """
    A = jnp.asarray(A)
    m, n = A.shape[-2:]
    full = min(m, n)

    if isinstance(eps_or_k, float) and eps_or_k < 1:
        U, s, VH = rsvd_iterate(
            A, eps_or_k, q=q, k_start=k_start, k_incr=k_incr,
            k_max=k_max,
        )
        k_out = min(count_svdvals_needed(s, eps_or_k), full)
    else:
        k = max(1, min(int(eps_or_k) + p, full))
        Q = _rand_range_finder(A, _next_key(), k, q)
        B = dag(Q) @ A
        U, s, VH = _svd_kernel(B)
        U = Q @ U
        k_out = min(int(eps_or_k), full)

    U, s, VH = (
        U[..., :, :k_out], s[..., :k_out], VH[..., :k_out, :]
    )
    if compute_uv:
        return U, s, VH
    return s


def isvd(A, eps_or_k=1e-6, **kwargs):
    """Interpolative-flavoured randomized SVD: same sketching engine,
    named for parity with the reference's ``isvd`` (which routes
    through scipy.linalg.interpolative; the sketch-QB path here has
    the same cost/accuracy class on TPU)."""
    return rsvd(A, eps_or_k, **kwargs)


__all__ = [
    "count_svdvals_needed",
    "estimate_rank",
    "isvd",
    "rsvd",
    "rsvd_iterate",
]
