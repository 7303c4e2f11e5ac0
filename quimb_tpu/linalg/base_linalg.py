"""Unified dense/iterative eigensolving, matrix functions and norms.

Re-design of reference ``quimb/linalg/base_linalg.py`` (``eigensystem``
/ ``eigensystem_partial`` :80, backend chooser ``choose_backend`` :47,
``eigh_window`` :282, ``expm``/``expm_multiply`` :512,546, ``Lazy``
:632) + ``numpy_linalg.py``/``scipy_linalg.py`` drivers.

Backend map (TPU-native replacements for LAPACK/ARPACK/SLEPc):

- ``'numpy'`` / ``'dense'``: ``jnp.linalg`` on device.
- ``'lanczos'``: restarted device Lanczos (:mod:`quimb_tpu.linalg.lanczos`)
  — replaces ARPACK ``eigs_scipy`` for extremal eigenpairs.
- ``'lobpcg'``: blocked device LOBPCG.
- ``'scipy'``: host ARPACK interop (works on any LinearOperator-like).
- ``'slepc'`` / ``'slepc-nompi'``: aliased to the device-mesh sharded
  solver in :mod:`quimb_tpu.parallel` (the MPI+PETSc replacement).
- ``'auto'``: dense below AUTO_DENSE_CUTOFF, else lanczos/lobpcg.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..core import LocalTermsHam, SparseHam, dag, device_operator, isdense, prod, qu
from .lanczos import eigh_lanczos, expm_multiply_krylov, lobpcg_block

AUTO_DENSE_CUTOFF = 2**13


class Lazy:
    """Lazily-constructed operator: ``Lazy(fn, *args, shape=...)``
    (reference ``Lazy`` base_linalg.py:632)."""

    def __init__(self, fn, *args, shape=None, factor=None, **kwargs):
        if shape is None:
            raise TypeError("`shape` must be specified.")
        self.fn = fn
        self.args = args
        self.kwargs = kwargs
        self.shape = shape
        self.factor = factor
        self.dtype = None

    def __call__(self, **kwargs):
        A = self.fn(*self.args, **self.kwargs, **kwargs)
        if self.factor is not None:
            A = self.factor * A
        return A

    def __repr__(self):
        return f"<Lazy({self.fn.__name__}, shape={self.shape})>"


def _as_operator(A):
    """Normalize input: returns (matvec, n, dtype, dense_or_none)."""
    if isinstance(A, Lazy):
        A = A()
    if isinstance(A, (SparseHam, LocalTermsHam)):
        return A.matvec, A.shape[0], A.dtype, None
    if sp.issparse(A):
        Ah = device_operator(A)
        return Ah.matvec, Ah.shape[0], Ah.dtype, None
    if hasattr(A, "matvec_fn"):  # TNLinearOperator
        fn, arrays = A.matvec_fn()
        n = A.shape[0]

        def mv(x):
            return jnp.reshape(fn(arrays, jnp.reshape(x, A.rdims)), (-1,))

        return mv, n, A.dtype, None
    if callable(A) and not hasattr(A, "shape"):
        raise ValueError("bare callables need a wrapper with .shape")
    if (
        not isinstance(A, (np.ndarray, jnp.ndarray))
        and hasattr(A, "__matmul__")
        and hasattr(A, "shape")
        and hasattr(A, "dtype")
    ):
        from .lanczos import as_pytree_operator

        if as_pytree_operator(A) is not None:
            # generic pytree operator (e.g. CoupledHam — the
            # on-the-fly sector matvec): jit-operand capable
            return (lambda x: A @ x), A.shape[0], A.dtype, None
    Aa = jnp.asarray(A)
    return (lambda x: Aa @ x), Aa.shape[0], Aa.dtype, Aa


def choose_backend(A, k, int_eps=False, B=None):
    """Pick a backend for a given operator and number of eigenpairs
    (reference ``choose_backend`` base_linalg.py:47)."""
    if isdense(A) and prod(np.shape(A)) < AUTO_DENSE_CUTOFF:
        return "numpy"
    if int_eps:
        return "numpy"
    return "lanczos"


def eigensystem_partial(A, k, isherm=True, B=None, which=None, return_vecs=True,
                        sigma=None, ncv=None, tol=1e-10, v0=None,
                        sort=True, backend=None, fallback_to_scipy=True,
                        **backend_opts):
    """Iteratively solve for ``k`` extremal eigenpairs
    (reference ``eigensystem_partial`` base_linalg.py:80)."""
    if not isherm:
        raise NotImplementedError(
            "partial non-hermitian eigensolve: use eig(..., k) dense"
        )
    if which is None:
        which = "SA" if sigma is None else "TR"
    backend = backend or "auto"
    if backend == "auto":
        backend = choose_backend(A, k, int_eps=sigma is not None)

    if backend in ("numpy", "dense"):
        mv, n, dtype, Aa = _as_operator(A)
        if Aa is None:
            if isinstance(A, (SparseHam, LocalTermsHam)):
                Aa = A.to_dense()
            elif sp.issparse(A):
                Aa = jnp.asarray(A.toarray())
            elif hasattr(A, "to_dense"):
                Aa = jnp.asarray(A.to_dense())
        return _eigs_dense_partial(Aa, k, which, return_vecs, sigma, sort)

    if backend in ("scipy", "arpack"):
        import scipy.sparse.linalg as spla

        Ah = A
        if isinstance(A, (SparseHam, LocalTermsHam)):
            mv, n, dtype, _ = _as_operator(A)
            Ah = spla.LinearOperator(
                shape=A.shape, dtype=np.dtype(str(dtype)),
                matvec=lambda x: np.asarray(mv(jnp.asarray(x))),
            )
        elif hasattr(A, "aslinearoperator"):
            Ah = A.aslinearoperator()
        lk, vk = spla.eigsh(
            Ah, k=k, which={"SA": "SA", "LA": "LA", "SM": "SM",
                            "LM": "LM", "TR": "LM"}.get(which, "SA"),
            sigma=sigma, ncv=ncv, tol=tol,
            v0=None if v0 is None else np.asarray(v0).reshape(-1),
        )
        if return_vecs:
            return jnp.asarray(lk), qu(vk, "ket") if k == 1 \
                else jnp.asarray(vk)
        return jnp.asarray(lk)

    if sp.issparse(A):
        # device-resident operator: also makes A a jit-operand pytree
        # so the Lanczos program compiles once per shape
        A = device_operator(A)
    mv, n, dtype, _ = _as_operator(A)

    if sigma is not None:
        # folded spectrum: smallest eigenpair of (A - sigma)^2
        def mv2(x):
            y = mv(x) - sigma * x
            return mv(y) - sigma * y

        if v0 is None:
            v0 = jnp.asarray(
                np.random.default_rng(42).standard_normal(n),
                dtype=np.dtype(str(dtype)),
            )
        else:
            v0 = jnp.reshape(jnp.asarray(v0), (-1,))
        _, vecs = eigsh_device(mv2, v0, k, which="SA", ncv=ncv,
                               tol=tol, **backend_opts)
        # Rayleigh quotients on original A
        lams = jnp.stack([
            jnp.real(jnp.vdot(v, mv(v))) for v in vecs
        ])
        order = jnp.argsort(lams)
        lams, vecs = lams[order], vecs[order]
        if return_vecs:
            return lams, _vecs_as_cols(vecs)
        return lams

    if v0 is None:
        v0 = jnp.asarray(
            np.random.default_rng(42).standard_normal(n),
            dtype=np.dtype(str(dtype)),
        )
    else:
        v0 = jnp.reshape(jnp.asarray(v0), (-1,)).astype(
            np.dtype(str(dtype)).name
        )

    if backend == "lobpcg":
        X0 = jnp.stack([v0] + [
            jnp.asarray(np.random.default_rng(i).standard_normal(n),
                        dtype=v0.dtype) for i in range(1, k)
        ], axis=1)
        lams, X = lobpcg_block(
            mv, X0, maxiter=backend_opts.get("maxiter", 60),
            largest=which in ("LA", "LM", "LR"),
        )
        if return_vecs:
            return lams, X
        return lams

    lams, vecs = eigsh_device(mv, v0, k, which=which, ncv=ncv, tol=tol,
                              A=A, **backend_opts)
    if return_vecs:
        return lams, _vecs_as_cols(vecs)
    return lams


def _vecs_as_cols(vecs):
    """(k, n) stack -> (n, k) columns (ket for k=1)."""
    out = jnp.transpose(jnp.atleast_2d(vecs))
    return out


def eigsh_device(mv, v0, k=1, which="SA", ncv=None, tol=1e-10,
                 restarts=None, A=None, **_):
    """Device Lanczos for k extremal eigenpairs with deflation.

    When the original operator ``A`` is supplied and is a pytree
    (SparseHam / dense array), the k=1 solve passes it as a jit
    operand — one compile per operator shape instead of one per call.
    """
    from .lanczos import as_pytree_operator, eigh_lanczos

    if ncv is None:
        ncv = max(20, 2 * k + 10)
    if restarts is None:
        restarts = 60
    which_l = "SA" if which in ("SA", "SR", "SM") else "LA"
    Aop = None if A is None else as_pytree_operator(A)
    lams, vecs = [], []
    v = v0
    for j in range(k):
        if j == 0:
            # lam is already the Ritz value of the unshifted operator
            lam, vj = eigh_lanczos(
                mv if Aop is None else Aop, v, ncv=ncv,
                restarts=restarts, tol=tol, which=which_l,
            )
            lams.append(lam)
            vecs.append(vj)
            if k > 1:
                key = jax.random.PRNGKey(0)
                v = jax.random.normal(
                    key, v0.shape, dtype=v0.real.dtype
                ).astype(v0.dtype)
            continue

        def mv_defl(x, vecs=tuple(vecs)):
            y = mv(x)
            for lam_i, v_i in zip(lams, vecs):
                # project out found eigenvectors (shift them away)
                shift = 1e3 * (1 + abs(float(lam_i)))
                y = y + (shift if which_l == "SA" else -shift) * v_i * \
                    jnp.vdot(v_i, x)
            return y

        lam, vj = eigh_lanczos(mv_defl, v, ncv=ncv, restarts=restarts,
                               tol=tol, which=which_l)
        # refine eigenvalue on the original operator
        lam = jnp.real(jnp.vdot(vj, mv(vj)))
        lams.append(lam)
        vecs.append(vj)
        if j + 1 < k:
            key = jax.random.PRNGKey(j)
            v = jax.random.normal(key, v0.shape, dtype=v0.real.dtype
                                  ).astype(v0.dtype)
    lams = jnp.stack(lams)
    vecs = jnp.stack(vecs)
    order = jnp.argsort(lams if which_l == "SA" else -lams)
    return lams[order], vecs[order]


def _eigs_dense_partial(Aa, k, which, return_vecs, sigma, sort):
    el, ev = jnp.linalg.eigh(Aa)
    if sigma is not None:
        idx = jnp.argsort(jnp.abs(el - sigma))[:k]
        idx = idx[jnp.argsort(el[idx])]
    elif which in ("SA", "SR", "SM"):
        idx = jnp.arange(k)
    elif which in ("LA", "LM", "LR"):
        idx = jnp.arange(Aa.shape[0] - 1, Aa.shape[0] - k - 1, -1)[::-1]
    else:
        idx = jnp.arange(k)
    if return_vecs:
        return el[idx], ev[:, idx]
    return el[idx]


# ---------------------------------------------------------------------------
# public API (quimb names)
# ---------------------------------------------------------------------------


def eigensystem(A, isherm=True, k=-1, sort=True, return_vecs=True,
                autoblock=False, **kwargs):
    """Find all or some eigenpairs (reference ``eigensystem``)."""
    if autoblock:
        from .autoblock import eigensystem_autoblocked

        return eigensystem_autoblocked(
            A, sort=sort, isherm=isherm, return_vecs=return_vecs
        )
    if k == -1 or (isinstance(k, int) and k >= np.shape(A)[0]):
        A = jnp.asarray(A.toarray()) if sp.issparse(A) else jnp.asarray(A)
        if isherm:
            el, ev = jnp.linalg.eigh(A)
        else:
            el, ev = _eig_host(A)
        if sort:
            order = jnp.argsort(el.real)
            el, ev = el[order], ev[:, order]
        if return_vecs:
            return el, ev
        return el
    return eigensystem_partial(A, k, isherm=isherm,
                               return_vecs=return_vecs, **kwargs)


def _eig_host(A):
    """General (non-hermitian) eig — runs on host (XLA TPU lacks
    geev; dense non-symmetric eig is a host-class operation)."""
    el, ev = np.linalg.eig(np.asarray(A))
    return jnp.asarray(el), jnp.asarray(ev)


def eig(A, k=-1, **kwargs):
    return eigensystem(A, isherm=False, k=k, **kwargs)


def eigh(A, k=-1, **kwargs):
    return eigensystem(A, isherm=True, k=k, **kwargs)


def eigvals(A, k=-1, **kwargs):
    return eigensystem(A, isherm=False, k=k, return_vecs=False, **kwargs)


def eigvalsh(A, k=-1, **kwargs):
    return eigensystem(A, isherm=True, k=k, return_vecs=False, **kwargs)


def eigenvectors(A, isherm=True, k=-1, **kwargs):
    _, v = eigensystem(A, isherm=isherm, k=k, return_vecs=True, **kwargs)
    return v


eigvecs = eigenvectors


def eigvecsh(A, k=-1, **kwargs):
    return eigenvectors(A, isherm=True, k=k, **kwargs)


def groundstate(ham, **kwargs):
    """The ground state ket of ``ham``."""
    _, v = eigensystem_partial(ham, k=1, which="SA", return_vecs=True,
                               **kwargs)
    return jnp.reshape(v, (-1, 1))


def groundenergy(ham, **kwargs):
    (lam,) = eigensystem_partial(ham, k=1, which="SA",
                                 return_vecs=False, **kwargs)
    return lam


def bound_spectrum(A, backend="auto", **kwargs):
    """(lmin, lmax) of hermitian ``A``."""
    lmin = eigensystem_partial(A, k=1, which="SA", return_vecs=False,
                               backend=backend, **kwargs)[0]
    lmax = eigensystem_partial(A, k=1, which="LA", return_vecs=False,
                               backend=backend, **kwargs)[0]
    return lmin, lmax


def _rel_window_to_abs(w0, wsz, lmin, lmax):
    w0 = lmin + w0 * (lmax - lmin)
    wsz = wsz * (lmax - lmin)
    return w0 - wsz / 2, w0 + wsz / 2


def eigh_window(A, w_0, k, w_sz=None, backend="AUTO", return_vecs=True,
                offset_const=1 / 104, **kwargs):
    """Eigenpairs in a relative window ``w_0`` in [0, 1] of the spectrum
    (reference ``eigh_window`` base_linalg.py:282)."""
    n = np.shape(A)[0]
    if isdense(A) or (sp.issparse(A) and n <= AUTO_DENSE_CUTOFF) or \
            backend.lower() == "numpy":
        Aa = jnp.asarray(A.toarray()) if sp.issparse(A) else jnp.asarray(A)
        el, ev = jnp.linalg.eigh(Aa)
        lmin, lmax = el[0], el[-1]
        wa = lmin + w_0 * (lmax - lmin)
        idx = jnp.argsort(jnp.abs(el - wa))[:k]
        idx = idx[jnp.argsort(el[idx])]
        if return_vecs:
            return el[idx], ev[:, idx]
        return el[idx]
    lmin, lmax = bound_spectrum(A, **kwargs)
    sigma = float(lmin + w_0 * (lmax - lmin))
    return eigensystem_partial(A, k, sigma=sigma,
                               return_vecs=return_vecs, **kwargs)


def eigvalsh_window(*args, **kwargs):
    return eigh_window(*args, return_vecs=False, **kwargs)


def eigvecsh_window(*args, **kwargs):
    _, v = eigh_window(*args, return_vecs=True, **kwargs)
    return v


# ---------------------------------------------------------------------------
# SVD
# ---------------------------------------------------------------------------


def svd(A, return_vecs=True):
    """Full SVD."""
    from ..ops.decomp import safe_svd

    if return_vecs:
        return safe_svd(jnp.asarray(A))
    return jnp.linalg.svd(jnp.asarray(A), compute_uv=False)


def svds(A, k, ncv=None, return_vecs=True, backend="auto", **kwargs):
    """Top-``k`` singular triples (reference ``svds``)."""
    if sp.issparse(A):
        A = jnp.asarray(A.toarray())
    from ..ops.decomp import svd_truncated

    U, s, VH = svd_truncated(
        jnp.asarray(A), max_bond=k, cutoff=-1.0, absorb=None
    )
    if return_vecs:
        return U, s, VH
    return s


def norm_fro(A):
    return jnp.linalg.norm(jnp.reshape(jnp.asarray(A), (-1,)))


def norm_trace(A, isherm=True):
    if isherm:
        el = jnp.linalg.eigvalsh(jnp.asarray(A))
        return jnp.sum(jnp.abs(el))
    s = jnp.linalg.svd(jnp.asarray(A), compute_uv=False)
    return jnp.sum(s)


def norm_2(A):
    s = jnp.linalg.svd(jnp.asarray(A), compute_uv=False)
    return s[0]


def norm(A, ntype=2, **kwargs):
    """Operator norms: 2 (spectral), 'fro', 'tr'/'nuc'
    (reference ``norm``)."""
    types = {
        "2": "2", 2: "2", "spectral": "2",
        "f": "fro", "fro": "fro",
        "t": "tr", "trace": "tr", "tr": "tr", "nuc": "tr",
    }
    nt = types[ntype]
    if nt == "2":
        return norm_2(A)
    if nt == "fro":
        return norm_fro(A)
    return norm_trace(A, **kwargs)


# ---------------------------------------------------------------------------
# matrix functions
# ---------------------------------------------------------------------------


def expm(A, herm=False):
    """Matrix exponential (reference ``expm`` base_linalg.py:512)."""
    A = jnp.asarray(A.toarray()) if sp.issparse(A) else jnp.asarray(A)
    if herm:
        el, ev = jnp.linalg.eigh(A)
        phases = jnp.exp(el)
        dt = jnp.result_type(ev.dtype, phases.dtype)
        return (ev.astype(dt) * phases.astype(dt)) @ dag(ev).astype(dt)
    return jax.scipy.linalg.expm(A)


def expm_multiply(mat, vec, backend="AUTO", ncv=None, **kwargs):
    """y = expm(mat) @ vec without forming expm(mat)
    (reference ``expm_multiply`` base_linalg.py:546). Hermitian-Krylov
    on device; works for SparseHam/TNLinearOperator/dense."""
    mv, n, dtype, Aa = _as_operator(mat)
    v = jnp.reshape(jnp.asarray(vec), (-1,))
    # the operator may be anti-hermitian (e.g. -i H): detect hermitian-
    # ness cheaply is hard; reference assumes herm=True usage. We use
    # Arnoldi when dtype is complex (handles -iH exactly), Lanczos else.
    iscomplex = "complex" in str(dtype) or jnp.iscomplexobj(v)
    if ncv is None:
        ncv = min(40, n)
    if iscomplex:
        v = v.astype("complex128" if jax.config.jax_enable_x64
                     else "complex64")
        out = expm_multiply_krylov(mv, v, t=1.0, ncv=ncv,
                                   hermitian=False)
    else:
        out = expm_multiply_krylov(mv, v, t=1.0, ncv=ncv, hermitian=True)
    return jnp.reshape(out, np.shape(vec))


def sqrtm(A, herm=True):
    """Matrix square root (reference ``sqrtm``)."""
    A = jnp.asarray(A.toarray()) if sp.issparse(A) else jnp.asarray(A)
    if herm:
        el, ev = jnp.linalg.eigh(A)
        sq = jnp.sqrt(jnp.clip(el.real, 0.0, None).astype(complex)
                      if jnp.iscomplexobj(A) else
                      jnp.clip(el.real, 0.0, None))
        dt = jnp.result_type(ev.dtype, sq.dtype)
        return (ev.astype(dt) * sq.astype(dt)) @ dag(ev).astype(dt)
    import scipy.linalg as sla

    return jnp.asarray(sla.sqrtm(np.asarray(A)))


class IdentityLinearOperator:
    """Identity as a lazy operator (reference
    ``IdentityLinearOperator``)."""

    def __init__(self, size, factor=1):
        self.shape = (size, size)
        self.factor = factor

    def matvec(self, x):
        return self.factor * x

    def __matmul__(self, x):
        return self.factor * x


__all__ = [
    "Lazy", "choose_backend", "eigensystem", "eigensystem_partial",
    "eig", "eigh", "eigvals", "eigvalsh", "eigenvectors", "eigvecs",
    "eigvecsh", "groundstate", "groundenergy", "bound_spectrum",
    "eigh_window", "eigvalsh_window", "eigvecsh_window", "svd", "svds",
    "norm", "norm_2", "norm_fro", "norm_trace", "expm", "expm_multiply",
    "sqrtm", "IdentityLinearOperator", "AUTO_DENSE_CUTOFF",
    "eigensystem_autoblocked", "compute_blocks",
]

from .autoblock import (  # noqa: E402
    compute_blocks,
    eigensystem_autoblocked,
)
