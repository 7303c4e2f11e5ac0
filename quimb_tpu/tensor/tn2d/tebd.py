"""2D imaginary/real time evolution: LocalHam2D, TEBD2D, SimpleUpdate,
FullUpdate.

Re-design of reference ``quimb/tensor/tn2d/tebd.py`` (``LocalHam2D``
:29, ``TEBD2D`` :383 with boundary energy :332, ``SimpleUpdate`` :544
with gauge dict + conditioner :534, ``FullUpdate`` :968).

SimpleUpdate is the 16x16 PEPS driver config: each gate application is
(gauge-absorb → reduce-split gate → gauge-extract), all S0 kernels; the
gauges are simple per-bond singular-value vectors (Vidal form)."""

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import check_opt, oset
from ..core import (
    Tensor,
    TensorNetwork,
    bonds,
    rand_uuid,
    tensor_contract,
)
from .core import PEPS, gen_2d_bonds


@jax.jit
def _expm_herm(H, factor):
    w, V = jnp.linalg.eigh(H)
    phases = jnp.exp(factor * w)
    dt = jnp.result_type(V.dtype, phases.dtype)
    return (V.astype(dt) * phases.astype(dt)) @ jnp.conj(V.T).astype(dt)


class LocalHam2D:
    """Sum of local 2-site (and 1-site) terms on a 2D lattice
    (reference ``LocalHam2D`` tn2d/tebd.py:29)."""

    def __init__(self, Lx, Ly, H2, H1=None):
        self.Lx = Lx
        self.Ly = Ly
        if hasattr(H2, "shape"):
            H2 = {None: H2}
        H2 = dict(H2 or {})
        default2 = H2.get(None)
        self.terms = {}
        for pair in gen_2d_bonds(Lx, Ly):
            h = H2.get(pair, H2.get((pair[1], pair[0]), default2))
            if h is not None:
                self.terms[pair] = jnp.asarray(h)

        # absorb single-site terms into neighbouring bonds
        if H1 is not None:
            if hasattr(H1, "shape"):
                H1 = {None: H1}
            H1 = dict(H1)
            default1 = H1.get(None)
            # count bonds per site
            nbonds = {}
            for (a, b) in self.terms:
                nbonds[a] = nbonds.get(a, 0) + 1
                nbonds[b] = nbonds.get(b, 0) + 1
            for coo in itertools.product(range(Lx), range(Ly)):
                h1 = H1.get(coo, default1)
                if h1 is None:
                    continue
                h1 = np.asarray(h1)
                d = h1.shape[0]
                I = np.eye(d)
                share = 1.0 / nbonds.get(coo, 1)
                for (a, b) in self.terms:
                    if a == coo:
                        self.terms[(a, b)] = self.terms[(a, b)] + \
                            share * jnp.asarray(np.kron(h1, I))
                    elif b == coo:
                        self.terms[(a, b)] = self.terms[(a, b)] + \
                            share * jnp.asarray(np.kron(I, h1))
        self._gate_cache = {}

    def get_term(self, where):
        try:
            return self.terms[tuple(where)]
        except KeyError:
            return self.terms[(where[1], where[0])]

    def get_gate_expm(self, where, x):
        key = (tuple(where), complex(x))
        try:
            return self._gate_cache[key]
        except KeyError:
            # keep a real factor real: expm(x H) of a real-symmetric H
            # with real x is real, and keeping the whole imaginary-time
            # pipeline in f32 avoids complex SVDs (UNIMPLEMENTED on the
            # TPU tunnel) and halves gate bandwidth
            xc = complex(x)
            factor = jnp.asarray(xc.real if xc.imag == 0 else xc)
            U = _expm_herm(self.get_term(where), factor)
            self._gate_cache[key] = U
            return U

    def build_pepo_propagator(self, x, max_bond=None, cutoff=1e-12,
                              **pepo_opts):
        """First-order Trotterized propagator ``prod_b exp(x H_b)`` as
        a PEPO (reference ``LocalHam2D`` PEPO propagator
        tn2d/tebd.py:97): bond gates applied to an identity PEPO with
        reduce-split compression."""
        from ..gating import tensor_network_gate_inds
        from .builders import PEPO_identity

        pepo = PEPO_identity(self.Lx, self.Ly, **pepo_opts)
        for where in sorted(self.terms):
            U = self.get_gate_expm(where, x)
            a, b = where
            tensor_network_gate_inds(
                pepo, U,
                (pepo.upper_ind(*a), pepo.upper_ind(*b)),
                contract="reduce-split", inplace=True,
                max_bond=max_bond, cutoff=cutoff,
            )
        return pepo

    def __repr__(self):
        return f"<LocalHam2D(Lx={self.Lx}, Ly={self.Ly})>"


def ham_2d_heis(Lx, Ly, j=1.0, bz=0.0, **kwargs):
    """2D Heisenberg LocalHam2D (spin operators)."""
    from ...gen.operators import _spin_op_np

    try:
        jx, jy, jz = j
    except TypeError:
        jx = jy = jz = j
    S = {s: _spin_op_np(s, 0.5) for s in "xyz"}
    H2 = sum(
        jj * np.kron(S[s], S[s])
        for s, jj in zip("xyz", (jx, jy, jz)) if jj
    )
    H1 = (-bz) * S["z"] if bz else None
    return LocalHam2D(Lx, Ly, jnp.asarray(H2.real if
                                          np.allclose(H2.imag, 0)
                                          else H2),
                      None if H1 is None else jnp.asarray(H1))


def ham_2d_ising(Lx, Ly, j=1.0, bx=0.0, **kwargs):
    from ...gen.operators import _spin_op_np

    S = {s: _spin_op_np(s, 0.5) for s in "xz"}
    H2 = 4 * j * np.kron(S["z"], S["z"]).real
    H1 = (-2 * bx) * S["x"].real if bx else None
    return LocalHam2D(Lx, Ly, jnp.asarray(H2),
                      None if H1 is None else jnp.asarray(H1))


def ham_2d_j1j2(Lx, Ly, j1=1.0, j2=0.5, bz=0.0, **kwargs):
    from ...gen.operators import _spin_op_np

    S = {s: _spin_op_np(s, 0.5) for s in "xyz"}
    h = sum(np.kron(S[s], S[s]) for s in "xyz").real
    H2 = {}
    for pair in gen_2d_bonds(Lx, Ly):
        H2[pair] = j1 * h
    diag_steppers = [
        lambda i, j: (i + 1, j + 1), lambda i, j: (i + 1, j - 1),
    ]
    for pair in gen_2d_bonds(Lx, Ly, steppers=diag_steppers):
        H2[pair] = j2 * h
    ham = LocalHam2D.__new__(LocalHam2D)
    ham.Lx, ham.Ly = Lx, Ly
    ham.terms = {k: jnp.asarray(v) for k, v in H2.items()}
    ham._gate_cache = {}
    return ham


class TEBD2D:
    """Gate-based 2D evolution base (reference ``TEBD2D``
    tn2d/tebd.py:383)."""

    def __init__(self, psi0, ham, tau=0.01, D=None, chi=None,
                 gate_opts=None, ordering=None, compute_energy_every=None,
                 compute_energy_final=True, callback=None, progbar=False,
                 **kwargs):
        self.state = psi0.copy()
        self.ham = ham
        self.tau = tau
        self._D = D if D is not None else (psi0.max_bond() or 2)
        self._chi = chi if chi is not None else max(8, 2 * self._D**2)
        self.gate_opts = dict(gate_opts or {})
        self.gate_opts.setdefault("cutoff", 1e-10)
        self.gate_opts.setdefault("max_bond", self._D)
        self.ordering = ordering
        self.compute_energy_every = compute_energy_every
        self.compute_energy_final = compute_energy_final
        self.callback = callback
        self.progbar = progbar
        self.n = 0
        self.its = []
        self.taus = []
        self.energies = []

    @property
    def D(self):
        return self._D

    @property
    def chi(self):
        return self._chi

    def get_ordering(self):
        if self.ordering is not None:
            return self.ordering
        return sorted(self.ham.terms)

    def gate(self, U, where):
        """Apply a 2-site gate (overridden by SimpleUpdate)."""
        self.state.gate_(
            U, where, contract="reduce-split", **self.gate_opts
        )

    def sweep(self, tau):
        for where in self.get_ordering():
            U = self.ham.get_gate_expm(where, -tau)
            self.gate(U, where)

    def compute_energy(self):
        return float(np.real(self.state.compute_local_expectation(
            self.ham.terms, max_bond=self._chi, normalized=True,
        )))

    @property
    def energy(self):
        if not self.energies:
            self.energies.append(self.compute_energy())
        return self.energies[-1]

    def evolve(self, steps, tau=None, progbar=None):
        if tau is not None:
            self.tau = tau
        it = range(steps)
        if progbar if progbar is not None else self.progbar:
            from ...utils import progbar as _pb

            it = _pb(it)
        for _ in it:
            self.sweep(self.tau)
            self.n += 1
            self.its.append(self.n)
            self.taus.append(self.tau)
            if self.compute_energy_every and \
                    self.n % self.compute_energy_every == 0:
                self.energies.append(self.compute_energy())
                if self.callback is not None:
                    self.callback(self)
        if self.compute_energy_final:
            self.energies.append(self.compute_energy())
        return self


class SimpleUpdate(TEBD2D):
    """Simple update with Vidal-style bond gauges (reference
    ``SimpleUpdate`` tn2d/tebd.py:544)."""

    def __init__(self, psi0, ham, tau=0.01, D=None, chi=None,
                 gate_opts=None, gauge_smudge=1e-6, condition_tensors=True,
                 **kwargs):
        self._fstacks = None
        super().__init__(psi0, ham, tau=tau, D=D, chi=chi,
                         gate_opts=gate_opts, **kwargs)
        self.gauge_smudge = gauge_smudge
        self.condition_tensors = condition_tensors
        # gauges: bond pair -> singular value vector
        self.gauges = {}

    # -- lazy fused-stack residency ----------------------------------------
    # the fused engine keeps the whole lattice as device stacks across
    # ``evolve`` calls; materializing a PEPS does ~2 eager device ops
    # per site (512+ tunnel round-trips at 16x16 — measured ~4 s/call
    # on TPU vs ~21 ms for the actual sweep kernel), so it only
    # happens when ``state``/``gauges`` are actually read.

    def _materialize(self):
        if self._fstacks is not None:
            from .su_fused import stacks_to_peps

            S, GH, GV = self._fstacks
            self._fstacks = None
            self._state, self._gauges = stacks_to_peps(
                S, GH, GV, self._state
            )

    @property
    def state(self):
        self._materialize()
        return self._state

    @state.setter
    def state(self, value):
        self._fstacks = None
        self._state = value

    @property
    def gauges(self):
        self._materialize()
        return self._gauges

    @gauges.setter
    def gauges(self, value):
        self._fstacks = None
        self._gauges = value

    def _maybe_bond(self, a, b):
        ta = self.state[self.state.site_tag(*a)]
        tb = self.state[self.state.site_tag(*b)]
        bs = list(bonds(ta, tb))
        return bs[0] if bs else None

    def _can_fuse(self):
        """Whether the batched colour-class sweep kernel applies: a
        rectangular PEPS, nearest-neighbour-only terms, fixed-D
        truncation. See ``su_fused`` for the design."""
        from ...config import fused_su_enabled
        from .core import PEPS

        if not fused_su_enabled():
            return False
        # geometry checks only — do NOT touch ``self.state`` (that
        # would materialize the resident stacks every evolve call)
        psi = self._state
        if not isinstance(psi, PEPS) or psi.Lx < 2 or psi.Ly < 2:
            return False
        if self.gate_opts.get("max_bond") != self._D:
            return False
        # every term must be a NN bond of the lattice
        nn = set()
        for i in range(psi.Lx):
            for j in range(psi.Ly):
                if j + 1 < psi.Ly:
                    nn.add(((i, j), (i, j + 1)))
                if i + 1 < psi.Lx:
                    nn.add(((i, j), (i + 1, j)))
        for w in self.ham.terms:
            a, b = w
            if (tuple(a), tuple(b)) not in nn and \
                    (tuple(b), tuple(a)) not in nn:
                return False
        return True

    def _evolve_fused(self, steps):
        """Run ``steps`` full sweeps as one compiled scan program
        (one device dispatch per call). The lattice stacks stay
        device-resident between calls (see ``_materialize``)."""
        from .su_fused import (
            _axis_masks, _su_evolve, class_gate_stacks, peps_to_stacks,
        )
        from ...ops.backend import to_device

        psi = self._state
        Lx, Ly, D = psi.Lx, psi.Ly, self._D
        if self._fstacks is not None:
            S, GH, GV = self._fstacks
        else:
            S, GH, GV = peps_to_stacks(psi, self._gauges, D)
        p = psi.phys_dim()
        rdt = np.zeros(1, dtype=np.dtype(str(S.dtype))).real.dtype
        gates = class_gate_stacks(
            self.ham, Lx, Ly, -self.tau, p, rdt
        )
        masks_h = tuple(
            to_device(m) for m in _axis_masks(Lx, Ly, D, rdt)
        )
        # the vertical pass runs on the transposed lattice
        mv = _axis_masks(Ly, Lx, D, rdt)
        masks_v = tuple(to_device(m) for m in mv)
        S, GH, GV = _su_evolve(
            S, GH, GV, *gates, masks_h, masks_v,
            nsteps=int(steps), smudge=float(self.gauge_smudge),
        )
        self._fstacks = (S, GH, GV)

    def evolve(self, steps, tau=None, progbar=None, fused=None):
        """Evolve ``steps`` sweeps. Uses the fused batched kernel when
        eligible (``fused=None`` -> auto), else the per-bond path."""
        if tau is not None:
            self.tau = tau
        use_fused = self._can_fuse() if fused is None else fused
        if not use_fused:
            return super().evolve(steps, progbar=progbar)
        self._evolve_fused(steps)
        for _ in range(int(steps)):
            self.n += 1
            self.its.append(self.n)
            self.taus.append(self.tau)
        if self.compute_energy_every and steps:
            self.energies.append(self.compute_energy())
            if self.callback is not None:
                self.callback(self)
        if self.compute_energy_final:
            self.energies.append(self.compute_energy())
        return self

    def gate(self, U, where):
        psi = self.state
        a, b = where
        ta = psi[psi.site_tag(*a)]
        tb = psi[psi.site_tag(*b)]

        # 1. absorb environment gauges on all OTHER bonds of ta, tb
        absorbed = []
        for (t, coo) in ((ta, a), (tb, b)):
            for (pair, s) in self.gauges.items():
                if coo in pair:
                    other = pair[0] if pair[1] == coo else pair[1]
                    if other == (a if coo == b else b):
                        continue
                    bix = self._maybe_bond(coo, other)
                    if bix is not None and bix in t.inds:
                        t.multiply_index_diagonal_(
                            bix, s + self.gauge_smudge
                        )
                        absorbed.append((coo, bix, s))

        # 2. absorb the central bond gauge symmetrically & gate
        key = tuple(sorted((a, b)))
        sc = self.gauges.get(key)
        bix = self._maybe_bond(a, b)
        if sc is not None and bix is not None:
            ta.multiply_index_diagonal_(bix, jnp.sqrt(sc))
            tb.multiply_index_diagonal_(bix, jnp.sqrt(sc))

        psi.gate_(
            U, where, contract="reduce-split", **self.gate_opts
        )

        # 3. extract the new central gauge: canonical split of the bond
        # we use the singular values of the new bond via a local SVD
        ta = psi[psi.site_tag(*a)]
        tb = psi[psi.site_tag(*b)]
        bix = self._maybe_bond(a, b)
        if bix is not None:
            # compute new bond gauge from the two-site reduced pair
            from ..core import tensor_compress_bond

            out = tensor_compress_bond(
                ta, tb, absorb=None, max_bond=self.gate_opts.get(
                    "max_bond"), cutoff=0.0,
            )
            if len(out) == 3:
                _, s, _ = out
                s = s / jnp.linalg.norm(s)
                self.gauges[key] = s

        # 4. remove the absorbed environment gauges (re-fetching the
        # site tensors: gating replaced the tensor objects)
        for (coo, bix2, s) in absorbed:
            t = psi[psi.site_tag(*coo)]
            if bix2 in t.inds:
                t.multiply_index_diagonal_(
                    bix2, 1 / (s + self.gauge_smudge)
                )

        if self.condition_tensors:
            for t in (psi[psi.site_tag(*a)], psi[psi.site_tag(*b)]):
                nrm = float(t.norm())
                if nrm > 0:
                    t.modify(apply=lambda d, nrm=nrm: d / nrm)

    def get_state(self, absorb_gauges=True):
        """The PEPS with gauges absorbed symmetrically (reference
        SimpleUpdate.get_state)."""
        psi = self.state.copy()
        if absorb_gauges:
            for (a, b), s in self.gauges.items():
                ta = psi[psi.site_tag(*a)]
                tb = psi[psi.site_tag(*b)]
                bs = list(bonds(ta, tb))
                if bs:
                    ta.multiply_index_diagonal_(bs[0], jnp.sqrt(s))
                    tb.multiply_index_diagonal_(bs[0], jnp.sqrt(s))
        # gauge absorption leaves site tensors with tiny norms (the
        # Vidal gauges are sub-unit); 256 sites at ~1e-3 each underflow
        # any f32 global contraction — re-balance to unit norm per site
        # (pure gauge freedom, expectation values unchanged)
        psi.equalize_norms_(1.0)
        return psi

    def compute_energy(self, method="boundary"):
        """Energy of the current state: ``'boundary'`` (accurate
        boundary-MPS environments) or ``'simple'`` (gauge-capped local
        clusters — the standard cheap simple-update estimator)."""
        if method == "simple":
            return self.compute_energy_simple()
        psi = self.get_state()
        return float(np.real(psi.compute_local_expectation(
            self.ham.terms, max_bond=self._chi, normalized=True,
        )))

    def compute_energy_simple(self):
        """Per-term 2-site cluster energies with the environment bonds
        capped by the simple-update gauges."""
        psi = self.state
        total = 0.0
        for where, h in self.ham.terms.items():
            a, b = where
            ta = psi[psi.site_tag(*a)].copy()
            tb = psi[psi.site_tag(*b)].copy()
            central = list(bonds(ta, tb))
            cix = central[0] if central else None
            key = tuple(sorted((a, b)))
            # absorb env gauges, locating each via the other site of
            # its bond
            for (t, coo) in ((ta, a), (tb, b)):
                for pair, s in self.gauges.items():
                    if coo in pair and pair != key:
                        other = pair[0] if pair[1] == coo else pair[1]
                        ot = psi[psi.site_tag(*other)]
                        bs = [ix for ix in t.inds if ix in ot.inds]
                        if bs:
                            t.multiply_index_diagonal_(bs[0], s)
            if cix is not None and key in self.gauges:
                sq = jnp.sqrt(self.gauges[key])
                ta.multiply_index_diagonal_(cix, sq)
                tb.multiply_index_diagonal_(cix, sq)
            theta = tensor_contract(
                ta, tb, output_inds=(
                    psi.site_ind(*a), psi.site_ind(*b),
                    *[ix for ix in ta.inds
                      if ix != cix and ix not in
                      (psi.site_ind(*a),)],
                    *[ix for ix in tb.inds
                      if ix != cix and ix not in
                      (psi.site_ind(*b),)],
                ), preserve_tensor=True,
            )
            ia, ib = psi.site_ind(*a), psi.site_ind(*b)
            env_inds = [ix for ix in theta.inds if ix not in (ia, ib)]
            tt = theta.transpose(ia, ib, *env_inds)
            d = psi.phys_dim(*a)
            mat = jnp.reshape(tt.data, (d * d, -1))
            rho = mat @ jnp.conj(mat.T)
            hloc = jnp.asarray(h, dtype=rho.dtype)
            num = jnp.trace(hloc @ rho)
            den = jnp.trace(rho)
            total += float(np.real(complex(num) / complex(den)))
        return total


@functools.lru_cache(maxsize=64)
def _autodiff_plaquette_fitter(ax_a, ax_b, perm, m, p, nsteps):
    """Compiled fidelity fitter for :meth:`FullUpdate._fit_autodiff`:
    maximizes |<f|E|t>|^2 / <f|E|f> over the two site arrays with
    ``nsteps`` L-BFGS iterations inside one ``lax.scan``. Cached per
    static contraction spec so every gate with the same shapes reuses
    one XLA program."""
    import optax

    def plaquette(xa, xb):
        t = jnp.tensordot(xa, xb, axes=([ax_a], [ax_b]))
        t = jnp.transpose(t, perm)
        return jnp.reshape(t, (m, p))

    @jax.jit
    def fit(xa0, xb0, E, ET):
        def loss(params):
            f = plaquette(*params)
            tf = jnp.trace(jnp.conj(f.T) @ ET)
            ff = jnp.real(jnp.trace(jnp.conj(f.T) @ (E @ f)))
            return -(jnp.abs(tf) ** 2) / ff

        opt = optax.lbfgs()
        params0 = (xa0, xb0)

        def body(carry, _):
            params, state, best_val, best_params = carry
            val, grads = jax.value_and_grad(loss)(params)
            updates, state = opt.update(
                tuple(jnp.conj(g) for g in grads), state, params,
                value=val, grad=grads, value_fn=loss,
            )
            new_params = optax.apply_updates(params, updates)
            better = val < best_val
            best_val = jnp.where(better, val, best_val)
            best_params = jax.tree.map(
                lambda a, b: jnp.where(better, a, b),
                params, best_params,
            )
            return (new_params, state, best_val, best_params), None

        init = (params0, opt.init(params0),
                jnp.asarray(jnp.inf, jnp.real(xa0).dtype), params0)
        (params, _, best_val, best_params), _ = jax.lax.scan(
            body, init, None, length=nsteps,
        )
        final_better = loss(params) < best_val
        return jax.tree.map(
            lambda a, b: jnp.where(final_better, a, b),
            params, best_params,
        )

    return fit


class FullUpdate(TEBD2D):
    """Full update: each gate application is fitted to the current
    tensors against the full boundary-contracted environment via
    alternating least squares (reference ``FullUpdate``
    tn2d/tebd.py:968 / ``gate_full_update_als`` :724).

    Per gate, the environment of the two sites is formed from fresh
    row-boundary environments of ``<psi|psi>``; the gated plaquette is
    then fitted at fixed bond dimension by solving per-site normal
    equations ``N x = b`` (the environment never touches the physical
    index, so ``N`` acts on bond space only and the physical dimension
    rides along as solve columns).

    Parameters
    ----------
    fit_steps : int
        Max ALS sweeps per gate.
    fit_tol : float
        Relative cost-change convergence threshold.
    pos_smudge : float
        Hermitian-projection + diagonal regularisation strength for N.
    fit_strategy : {'als', 'autodiff'}
        Gate-fitting method.
    compute_envs_every : int
        Recompute the row-boundary environments only every this many
        gates (reference policy tn2d/tebd.py:1164).
    """

    # class-level default (overridden per instance in __init__)
    compute_envs_every = 1

    def __init__(self, psi0, ham, *, fit_steps=12, fit_tol=1e-10,
                 pos_smudge=1e-8, fit_strategy="als",
                 compute_envs_every=1, **kwargs):
        kwargs.setdefault("gate_opts", {}).setdefault("cutoff", 0.0)
        super().__init__(psi0, ham, **kwargs)
        self.fit_steps = fit_steps
        self.fit_tol = fit_tol
        self.pos_smudge = pos_smudge
        self.fit_strategy = fit_strategy
        self.compute_envs_every = compute_envs_every
        self._env_counter = 0
        self._x_envs_cache = None

    @property
    def fit_strategy(self):
        """Gate-fitting method: ``'als'`` (normal-equation alternating
        least squares, reference ``gate_full_update_als``
        tn2d/tebd.py:724) or ``'autodiff'`` (direct gradient ascent on
        the environment-weighted fidelity, reference
        ``gate_full_update_autodiff_fidelity`` tn2d/tebd.py:851)."""
        return self._fit_strategy

    @fit_strategy.setter
    def fit_strategy(self, v):
        if v not in ("als", "autodiff"):
            raise ValueError(
                f"fit_strategy must be 'als' or 'autodiff', got {v!r}"
            )
        self._fit_strategy = v

    def _get_x_envs(self, norm):
        """Row-boundary environments, recomputed only every
        ``compute_envs_every`` gates (reference env recompute policy
        ``compute_envs_every`` tn2d/tebd.py:1164) — between recomputes
        the slightly stale boundary envs are reused, which is the
        standard accuracy/speed trade for deep Trotter sweeps."""
        # stale envs are only reusable while the state's bond profile
        # is unchanged (early gates can still be growing bonds)
        sig = tuple(sorted(
            (ix, self.state.ind_size(ix))
            for ix in self.state.ind_map
        ))
        if (
            self.compute_envs_every <= 1
            or self._x_envs_cache is None
            or self._env_counter % self.compute_envs_every == 0
            or getattr(self, "_env_sig", None) != sig
        ):
            self._x_envs_cache = norm.compute_x_environments(
                max_bond=self._chi
            )
            self._env_sig = sig
        self._env_counter += 1
        return self._x_envs_cache

    def _plaquette_env(self, norm, a, b):
        """Environment TN of sites ``a, b``: row-boundary envs above and
        below their row-span plus the in-span rows, minus the four
        plaquette tensors themselves."""
        psi = self.state
        x_envs = self._get_x_envs(norm)
        x0, x1 = min(a[0], b[0]), max(a[0], b[0])
        strip = TensorNetwork(())
        bot = x_envs.get(("xmin", x0))
        if bot is not None and bot.num_tensors:
            strip.add_tensor_network(
                bot.copy(), virtual=True, check_collisions=False
            )
        for x in range(x0, x1 + 1):
            strip.add_tensor_network(
                norm.select(norm.x_tag(x), which="any").copy(),
                virtual=True, check_collisions=False,
            )
        top = x_envs.get(("xmax", x1))
        if top is not None and top.num_tensors:
            strip.add_tensor_network(
                top.copy(), virtual=True, check_collisions=False
            )
        ta, tb = psi.site_tag(*a), psi.site_tag(*b)
        return strip.select((ta, tb), which="!any")

    @staticmethod
    def _make_bra(ket_t, phys_ind):
        """Conjugate site tensor living in the mangled bra layer."""
        inds = tuple(
            ix if ix == phys_ind else ix + "*" for ix in ket_t.inds
        )
        return Tensor(jnp.conj(ket_t.data), inds=inds)

    def _fit_autodiff(self, env, target, fit_a, fit_b, pa, pb):
        """Fit the gated plaquette by direct gradient ascent on the
        environment-weighted fidelity (reference
        ``gate_full_update_autodiff_fidelity`` tn2d/tebd.py:851,
        which routes through a TNOptimizer). TPU-native form: the
        environment is materialized ONCE as a dense matrix over the
        plaquette's external bonds (the same ``to_dense`` the ALS
        normal equations use), ``E @ target`` is precomputed, and the
        whole L-BFGS optimization runs as a single compiled
        ``lax.scan`` — one cached XLA program per shape signature
        across all gates and sweeps."""
        inds_a = fit_a.inds
        inds_b = fit_b.inds
        (new_bond,) = bonds(fit_a, fit_b)
        ext_a = tuple(ix for ix in inds_a
                      if ix not in (new_bond, pa))
        ext_b = tuple(ix for ix in inds_b
                      if ix not in (new_bond, pb))
        ext = ext_a + ext_b
        ext_star = tuple(ix + "*" for ix in ext)

        # dense environment over (bra ext | ket ext)
        E = env.to_dense(ext_star, ext)
        E = (E + jnp.conj(E.T)) / 2
        # dense gated target over (ket ext | phys)
        T = target.to_dense(ext, (pa, pb))
        ET = E @ T.astype(E.dtype)

        # static contraction spec: tensordot over the shared bond then
        # permute remaining axes to (ext..., pa, pb)
        ax_a = inds_a.index(new_bond)
        ax_b = inds_b.index(new_bond)
        rem = ([ix for ix in inds_a if ix != new_bond]
               + [ix for ix in inds_b if ix != new_bond])
        perm = tuple(rem.index(ix) for ix in ext + (pa, pb))
        fitter = _autodiff_plaquette_fitter(
            ax_a, ax_b, perm, E.shape[0], T.shape[1],
            max(self.fit_steps, 1) * 4,
        )
        xa, xb = fitter(fit_a.data, fit_b.data, E, ET)
        fit_a.modify(data=xa)
        fit_b.modify(data=xb)

    def gate(self, U, where):
        from ..gating import tensor_network_gate_inds

        psi = self.state
        a, b = where
        ta, tb = psi.site_tag(*a), psi.site_tag(*b)
        pa, pb = psi.site_ind(*a), psi.site_ind(*b)

        norm = psi.make_norm()
        env = self._plaquette_env(norm, a, b)

        ket_a0 = psi[ta].copy()
        ket_b0 = psi[tb].copy()
        na0 = float(ket_a0.norm())
        nb0 = float(ket_b0.norm())

        # fixed fitting target: original plaquette with the gate applied
        # lazily (reference gate_full_update_als :750)
        target = tensor_network_gate_inds(
            TensorNetwork((ket_a0.copy(), ket_b0.copy())),
            U, (pa, pb), contract=False,
        )

        # initial guess: standard reduce-split application
        guess = tensor_network_gate_inds(
            TensorNetwork((ket_a0.copy(), ket_b0.copy())),
            U, (pa, pb), contract="reduce-split",
            max_bond=self.gate_opts.get("max_bond", self._D),
            cutoff=0.0,
        )
        fit_a = guess[ta]
        fit_b = guess[tb]

        if self._fit_strategy == "autodiff":
            self._fit_autodiff(env, target, fit_a, fit_b, pa, pb)
            fitted = True
        else:
            fitted = False

        prev_cost = None
        cost = None
        for _ in range(0 if fitted else self.fit_steps):
            for site in ("a", "b"):
                if site == "a":
                    fit_s, fit_o, ps = fit_a, fit_b, pa
                else:
                    fit_s, fit_o, ps = fit_b, fit_a, pb
                bond_ixs = tuple(
                    ix for ix in fit_s.inds if ix != ps
                )
                lix = tuple(ix + "*" for ix in bond_ixs)
                bra_o = self._make_bra(fit_o, pb if site == "a" else pa)

                # normal matrix over the site's bond space
                N_tn = TensorNetwork(
                    (env, bra_o, fit_o.copy()), virtual=False,
                    check_collisions=False,
                )
                N = N_tn.to_dense(lix, bond_ixs)
                N = (N + jnp.conj(N.T)) / 2
                dN = N.shape[0]
                N = N + (
                    self.pos_smudge
                    * (jnp.abs(jnp.trace(N)) / dN + 1.0)
                ) * jnp.eye(dN, dtype=N.dtype)

                # rhs: environment-weighted overlap with the target
                b_tn = TensorNetwork(
                    (env, bra_o, target), virtual=False,
                    check_collisions=False,
                )
                bvec = b_tn.to_dense(lix, (ps,))

                x = jnp.linalg.solve(N, bvec.astype(N.dtype))
                shape = tuple(fit_s.ind_size(ix) for ix in bond_ixs) + (
                    fit_s.ind_size(ps),
                )
                fit_s.modify(
                    data=jnp.reshape(x, shape),
                    inds=bond_ixs + (ps,),
                )

            cost = float(
                -2.0 * jnp.real(jnp.trace(jnp.conj(x.T) @ bvec))
                + jnp.abs(jnp.trace(jnp.conj(x.T) @ (N @ x)))
            )
            if prev_cost is not None and abs(cost - prev_cost) <= (
                self.fit_tol * max(abs(cost), 1e-30)
            ):
                break
            prev_cost = cost

        # condition: balance the new internal bond and restore the
        # original tensor norms (reference condition_maintain_norms)
        from ..core import tensor_balance_bond

        if bonds(fit_a, fit_b):
            tensor_balance_bond(fit_a, fit_b)
        cna = float(fit_a.norm())
        cnb = float(fit_b.norm())
        if cna > 0 and na0 > 0:
            fit_a.modify(apply=lambda d: d * (na0 / cna))
        if cnb > 0 and nb0 > 0:
            fit_b.modify(apply=lambda d: d * (nb0 / cnb))

        # write back into the live state, restoring the original bond
        # name between a and b
        (old_bond,) = bonds(psi[ta], psi[tb])
        (new_bond,) = bonds(fit_a, fit_b)
        if new_bond != old_bond:
            fit_a.reindex_({new_bond: old_bond})
            fit_b.reindex_({new_bond: old_bond})
        for live, fit in ((psi[ta], fit_a), (psi[tb], fit_b)):
            fit_t = fit.transpose(*live.inds)
            live.modify(data=fit_t.data)


# ---------------------------------------------------------------------------
# parity extras (reference tn2d/tebd.py:93-1260)
# ---------------------------------------------------------------------------

def _lh2d_nsites(self):
    return self.Lx * self.Ly


def _lh2d_build_pepo_propagator_trotterized(self, x, ordering="sort",
                                            contract_sites=True,
                                            **split_opts):
    """PEPO of ``expm(H x)`` via first-order trotterization (reference
    ``build_pepo_propagator_trotterized`` tn2d/tebd.py:97 — delegates
    to the compressed propagator builder)."""
    return self.build_pepo_propagator(x, **split_opts)


def _lh2d_draw(self, **kwargs):
    """Print (or plot, if matplotlib is available) the interaction
    graph of this Hamiltonian (reference ``draw`` tn2d/tebd.py:213)."""
    try:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for (a, b) in self.terms:
            (xa, ya), (xb, yb) = a, b
            ax.plot([ya, yb], [-xa, -xb], "-o", color="tab:blue")
        ax.set_title(repr(self))
        return fig, ax
    except Exception:
        for where in self.terms:
            print(f"  {where[0]} -- {where[1]}")
        return None


LocalHam2D.nsites = property(_lh2d_nsites)
LocalHam2D.build_pepo_propagator_trotterized = \
    _lh2d_build_pepo_propagator_trotterized
LocalHam2D.draw = _lh2d_draw
LocalHam2D.graph = _lh2d_draw


def _fu_set_state(self, psi):
    """Replace the evolving state (reference ``set_state``
    tn2d/tebd.py:1153)."""
    self.state = psi.copy()
    return self


def _fu_presweep(self, i=None):
    """Hook run before each sweep (reference ``presweep``
    tn2d/tebd.py:1243). Our implementation recomputes plaquette
    environments inside each gate so there is no cached state to
    prepare."""
    return self


FullUpdate.set_state = _fu_set_state
FullUpdate.presweep = _fu_presweep
