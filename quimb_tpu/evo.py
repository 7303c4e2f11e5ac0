"""Time evolution of quantum states: Schrödinger and Lindblad dynamics.

Re-design of reference ``quimb/evo.py`` (``Evolution`` :293, rhs
generators :41-243, integrate via scipy ``complex_ode`` dop853 :542,
solve via full diag :519, expm via Krylov/SLEPc :583, ``at_times`` :657).

TPU-native choices:

- ``method='integrate'``: an adaptive Dormand–Prince RK45 whose *steps*
  are jitted device programs (matvecs on MXU / sparse gather kernels);
  the host only adapts dt from the device-computed error norm — replacing
  scipy's Fortran dop853 loop.
- ``method='solve'``: one device eigh, then each ``update_to`` is a
  phase rotation (two matmuls).
- ``method='expm'``: restarted Krylov ``expm_multiply`` on device
  (replacing both scipy's expm_multiply and the SLEPc MFN path).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .core import LocalTermsHam, SparseHam, dag, device_operator, isop, qu
from .linalg.lanczos import expm_multiply_krylov
from .utils import continuous_progbar


# ---------------------------------------------------------------------------
# rhs constructors (reference evo.py:41-243)
# ---------------------------------------------------------------------------


def schrodinger_eq_ket(ham):
    """rhs for d|psi>/dt = -i H |psi>."""
    mv = _matvec_of(ham)

    def rhs(psi, t=None):
        return -1j * mv(psi)

    return rhs


def schrodinger_eq_dop(ham):
    """rhs for drho/dt = -i [H, rho]."""
    Ha = _as_dense(ham)

    def rhs(rho, t=None):
        return -1j * (Ha @ rho - rho @ Ha)

    return rhs


def lindblad_eq(ham, ls, gamma):
    """rhs for the Lindblad master equation (reference
    ``lindblad_eq``)."""
    Ha = _as_dense(ham)
    ls = [jnp.asarray(L) for L in ls]
    lds = [dag(L) for L in ls]
    ldls = [LD @ L for L, LD in zip(ls, lds)]

    def rhs(rho, t=None):
        out = -1j * (Ha @ rho - rho @ Ha)
        for L, LD, LDL in zip(ls, lds, ldls):
            out = out + gamma * (
                L @ rho @ LD - 0.5 * (LDL @ rho + rho @ LDL)
            )
        return out

    return rhs


def _as_dense(ham):
    if isinstance(ham, (SparseHam, LocalTermsHam)):
        return ham.to_dense()
    if sp.issparse(ham):
        return jnp.asarray(ham.toarray())
    return jnp.asarray(ham)


def _matvec_of(ham):
    if isinstance(ham, (SparseHam, LocalTermsHam)):
        H = ham

        def mv(x):
            return H @ x

        return mv
    if sp.issparse(ham):
        H = device_operator(ham)

        def mv(x):
            return H @ x

        return mv
    if hasattr(ham, "matvec_fn"):
        fn, arrays = ham.matvec_fn()
        rdims = ham.rdims

        def mv(x):
            return jnp.reshape(
                fn(arrays, jnp.reshape(x, rdims)), np.shape(x)
            )

        return mv
    Ha = jnp.asarray(ham)
    return lambda x: Ha @ x


# ---------------------------------------------------------------------------
# device RK45 (Dormand-Prince) with host dt adaptation
# ---------------------------------------------------------------------------

_DP_A = np.array([
    [0, 0, 0, 0, 0, 0],
    [1 / 5, 0, 0, 0, 0, 0],
    [3 / 40, 9 / 40, 0, 0, 0, 0],
    [44 / 45, -56 / 15, 32 / 9, 0, 0, 0],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0],
])
_DP_B5 = np.array(
    [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0]
)
_DP_B4 = np.array([
    5179 / 57600, 0, 7571 / 16695, 393 / 640, -92097 / 339200,
    187 / 2100, 1 / 40,
])


def _rk45_step_factory(rhs):
    """A jitted one-step RK45: (y, dt) -> (y5, err_norm)."""

    @jax.jit
    def step(y, dt):
        k = []
        k.append(rhs(y))
        for i in range(1, 6):
            yi = y
            for j in range(i):
                if _DP_A[i, j]:
                    yi = yi + dt * _DP_A[i, j] * k[j]
            k.append(rhs(yi))
        y5 = y
        for j in range(6):
            if _DP_B5[j]:
                y5 = y5 + dt * _DP_B5[j] * k[j]
        k.append(rhs(y5))
        y4 = y
        for j in range(7):
            if _DP_B4[j]:
                y4 = y4 + dt * _DP_B4[j] * k[j]
        err = jnp.linalg.norm(jnp.reshape(y5 - y4, (-1,)))
        return y5, err

    return step


class Evolution:
    """Evolve a state in time (reference ``Evolution`` evo.py:293).

    Parameters
    ----------
    p0 : ket or density operator
    ham : operator, SparseHam, tuple ``(ham, ls, gamma)`` for Lindblad
    method : {'integrate', 'solve', 'expm'}
    t0 : float
    compute : callable or dict of callables ``f(t, pt)`` accumulated
        into ``.results``
    int_stop : callable, returns nonzero to stop integration early
    """

    def __init__(self, p0, ham, t0=0, compute=None, int_stop=None,
                 method="integrate", int_small_step=False,
                 expm_backend="AUTO", expm_opts=None, progbar=False):
        self._p0 = qu(p0)
        self._t = self.t0 = t0
        self._method = method
        self._int_stop = int_stop
        self._progbar = progbar
        self._timedep = callable(ham) and not hasattr(ham, "shape") \
            and not isinstance(ham, SparseHam) \
            and not hasattr(ham, "matvec_fn")
        self._isdop = isop(self._p0)
        self._d = self._p0.shape[0]
        self._expm_opts = dict(expm_opts or {})

        self._setup_callbacks(compute)

        self._ham = ham
        if method == "solve" or isinstance(ham, (tuple, list)) and \
                method == "solve":
            self._setup_solved_ham()
        elif method == "integrate":
            self._setup_integrator()
        elif method == "expm":
            if self._timedep:
                raise TypeError(
                    "expm method doesn't support time-dependent H"
                )
            self._mv = _matvec_of(ham)
            # a pytree operator (SparseHam / dense array) can be a jit
            # OPERAND: exp(-i dt H) v runs via the hermitian-Lanczos
            # program compiled once per shape. Otherwise keep ONE
            # stable rhs closure for the whole Evolution so the
            # Arnoldi program also compiles exactly once.
            from .linalg.lanczos import as_pytree_operator

            self._ham_op = ham if isinstance(
                ham, (SparseHam, LocalTermsHam)) else (
                device_operator(ham) if sp.issparse(ham)
                else as_pytree_operator(ham)
            )
            if self._ham_op is None:
                mv = self._mv
                self._expm_rhs = lambda x: -1j * mv(x)
            self._update_method = self._update_to_expm_ket
        else:
            raise ValueError(f"unknown method {method}")

        self._pt = jnp.asarray(self._p0)

    # -- setup ------------------------------------------------------------

    #: results of the ``compute`` callback(s), if any (reference
    #: ``Evolution.results`` evo.py:701)
    results = None

    def _setup_callbacks(self, compute):
        if compute is None:
            self._computes = None
        elif callable(compute):
            self._computes = compute
            self.results = []
        else:
            self._computes = dict(compute)
            self.results = {k: [] for k in self._computes}

    def _do_compute(self):
        if self._computes is None:
            return
        if callable(self._computes):
            self.results.append(self._computes(self._t, self._pt))
        else:
            for k, f in self._computes.items():
                self.results[k].append(f(self._t, self._pt))

    def _setup_solved_ham(self):
        ham = self._ham
        Ha = _as_dense(ham)
        el, ev = jnp.linalg.eigh(Ha)
        self._evals, self._evecs = el, ev
        # transform initial state into energy basis
        if self._isdop:
            self._p0_ab = dag(ev) @ jnp.asarray(self._p0) @ ev
        else:
            self._p0_ab = dag(ev) @ jnp.asarray(self._p0)
        self._update_method = self._update_to_solved

    def _setup_integrator(self):
        ham = self._ham
        if isinstance(ham, (tuple, list)):
            H, ls, gamma = ham
            rhs = lindblad_eq(H, ls, gamma)
            self._isdop = True
        elif self._timedep:
            base_rhs = None

            def rhs_t(y, t):
                Ht = _as_dense(self._ham(t))
                if self._isdop:
                    return -1j * (Ht @ y - y @ Ht)
                return -1j * (Ht @ y)

            self._rhs_t = rhs_t
            self._update_method = self._update_to_integrate_timedep
            return
        elif self._isdop:
            rhs = schrodinger_eq_dop(ham)
        else:
            mv = _matvec_of(ham)

            def rhs(y):
                return -1j * jnp.reshape(mv(jnp.reshape(y, (-1,))),
                                         y.shape)

        self._step = _rk45_step_factory(rhs)
        self._update_method = self._update_to_integrate

    # -- update methods ------------------------------------------------------

    def _update_to_solved(self, t):
        dt = t - self.t0
        phases = jnp.exp(-1j * dt * self._evals)
        ev = self._evecs
        dtp = jnp.result_type(ev.dtype, phases.dtype)
        if self._isdop:
            mid = (phases[:, None] * self._p0_ab.astype(dtp)
                   * jnp.conj(phases)[None, :])
            self._pt = ev.astype(dtp) @ mid @ dag(ev).astype(dtp)
        else:
            self._pt = ev.astype(dtp) @ (
                phases[:, None] * self._p0_ab.astype(dtp)
            )
        self._t = t

    def _update_to_expm_ket(self, t):
        dt = t - self._t
        ncv = self._expm_opts.get("ncv", 32)
        v = jnp.reshape(self._pt, (-1,)).astype(
            "complex128" if jax.config.jax_enable_x64 else "complex64"
        )
        if self._ham_op is not None:
            # hermitian H as a jit operand: Lanczos projection with
            # complex time — exp((-i dt) H) v — compiled once
            out = expm_multiply_krylov(
                self._ham_op, v, t=-1j * dt, ncv=ncv, hermitian=True,
            )
        else:
            out = expm_multiply_krylov(
                self._expm_rhs, v, t=dt, ncv=ncv, hermitian=False,
            )
        self._pt = jnp.reshape(out, self._pt.shape)
        self._t = t

    def _update_to_integrate(self, t, rtol=1e-8, atol=1e-10):
        y = jnp.asarray(self._pt).astype(
            "complex128" if jax.config.jax_enable_x64 else "complex64"
        )
        tcur = self._t
        direction = 1.0 if t >= tcur else -1.0
        dt = direction * max(abs(t - tcur) / 100, 1e-8)
        nrm = float(jnp.linalg.norm(jnp.reshape(y, (-1,))))
        while direction * (t - tcur) > 1e-13:
            if direction * (tcur + dt) > direction * t:
                dt = t - tcur
            ynew, err = self._step(y, jnp.asarray(dt, y.dtype))
            err = float(jnp.real(err))
            tol = atol + rtol * nrm
            if err <= tol or abs(dt) < 1e-12:
                y = ynew
                tcur += float(np.real(dt))
                if self._int_stop is not None:
                    self._pt = y
                    self._t = tcur
                    if self._int_stop(tcur, y):
                        break
            # PI step size control
            if err > 0:
                factor = 0.9 * (tol / err) ** 0.2
                dt = dt * min(max(factor, 0.2), 5.0)
            else:
                dt = dt * 5.0
        self._pt = y
        self._t = t if self._int_stop is None else tcur

    def _update_to_integrate_timedep(self, t, rtol=1e-8, atol=1e-10):
        # simple fixed-substep RK4 for time-dependent H
        y = jnp.asarray(self._pt).astype(
            "complex128" if jax.config.jax_enable_x64 else "complex64"
        )
        tcur = self._t
        n_steps = max(100, int(abs(t - tcur) * 100))
        dt = (t - tcur) / n_steps
        for i in range(n_steps):
            ti = tcur + i * dt
            k1 = self._rhs_t(y, ti)
            k2 = self._rhs_t(y + dt / 2 * k1, ti + dt / 2)
            k3 = self._rhs_t(y + dt / 2 * k2, ti + dt / 2)
            k4 = self._rhs_t(y + dt * k3, ti + dt)
            y = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        self._pt = y
        self._t = t

    # -- public API ---------------------------------------------------------

    def update_to(self, t):
        """Update the state to time ``t``."""
        if self._progbar:
            pbar = continuous_progbar(self._t, t)
            self._update_method(t)
            pbar.cupdate(self._t)
            pbar.close()
        else:
            self._update_method(t)
        self._do_compute()

    def at_times(self, ts):
        """Generator yielding the state at each time in ``ts``."""
        for t in ts:
            self.update_to(t)
            yield self._pt

    @property
    def t(self):
        return self._t

    @property
    def pt(self):
        return self._pt


__all__ = [
    "Evolution", "schrodinger_eq_ket", "schrodinger_eq_dop",
    "lindblad_eq",
]
