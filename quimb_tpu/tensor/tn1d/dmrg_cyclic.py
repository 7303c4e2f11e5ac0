"""Cyclic (PBC) DMRG: segmented moving environments with
transfer-matrix compression.

Re-design of the reference's periodic ``MovingEnvironment`` machinery
(``quimb/tensor/tn1d/dmrg.py`` ``init_segment``:281,
``init_non_segment``:324, ``get_cyclic_canonizer``:446 and the
'long way round' replace-with-SVD diagrams at :105).

TPU-native choices
------------------

- A ring is perfectly *uniform*: every MPS site is ``(chi, d, chi)``
  and every (padded) MPO site ``(w, w, d, d)``, so the whole
  complement transfer operator is ONE ``lax.scan`` over a stacked
  array — no per-site dispatch, no ragged shapes.
- The 'long way round' is never materialized: it is compressed with a
  randomized range sketch (batched scan matvecs + one small SVD on
  device), the direct analogue of the reference's lazy ``isvd``.
- Within a segment the environments simply carry an extra leading
  *closure-rank* axis ``s``; the standard environment/effective-H
  kernels from :mod:`.dmrg` are ``vmap``-ed over it. For long segments
  the rank is tiny (often 1), so per-site cost matches open boundaries
  and each environment move is O(1) in ``L``.
- Pseudo-orthogonalization (reference ``canonize_cyclic``,
  tn1d/core.py:996): the complement *norm* transfer is compressed to
  rank 1, symmetrized, and split by eigh into gauges inserted at both
  segment edges — after which the segment is approximately canonical
  and a standard (non-generalized) Lanczos local solve applies. The
  reported energy is always the honest Rayleigh quotient
  ``<psi|H|psi>/<psi|psi>`` through the compressed closures.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dmrg import (
    _env_step_left,
    _env_step_right,
    _split_2site,
)

# batched (closure-rank axis) environment steps
_env_step_right_b = jax.jit(
    jax.vmap(_env_step_right, in_axes=(0, None, None, None))
)
_env_step_left_b = jax.jit(
    jax.vmap(_env_step_left, in_axes=(0, None, None, None))
)


@jax.jit
def _nenv_step_right(N, Ab, Ak):
    """Norm-network left-environment step: N (s,b,k), Ab (b,p,b2)
    already-conjugated bra, Ak (k,p,k2) -> (s,b2,k2)."""
    T = jnp.einsum("sbk,kdx->sbdx", N, Ak)
    return jnp.einsum("sbdx,bda->sax", T, Ab)


@jax.jit
def _nenv_step_left(N, Ab, Ak):
    """Norm-network right-environment step: N (s,b,k), Ab (a,p,b),
    Ak (x,p,k) -> (s,a,x)."""
    T = jnp.einsum("sbk,xdk->sbxd", N, Ak)
    return jnp.einsum("sbxd,adb->sax", T, Ab)


@jax.jit
def _transfer_apply_right(X, Abs, Ws, Aks):
    """Apply the stacked-complement H-transfer to a batch of boundary
    triples X (S,b,w,k), absorbing sites left-to-right."""
    def body(x, site):
        Ab, W, Ak = site
        return _env_step_right_b(x, Ab, W, Ak), None

    X, _ = jax.lax.scan(body, X, (Abs, Ws, Aks))
    return X


@jax.jit
def _transfer_apply_left(X, Abs, Ws, Aks):
    """Transpose application: absorb sites right-to-left."""
    def body(x, site):
        Ab, W, Ak = site
        return _env_step_left_b(x, Ab, W, Ak), None

    X, _ = jax.lax.scan(body, X, (Abs, Ws, Aks), reverse=True)
    return X


@jax.jit
def _ntransfer_apply_right(X, Abs, Aks):
    def body(x, site):
        Ab, Ak = site
        return _nenv_step_right(x, Ab, Ak), None

    X, _ = jax.lax.scan(body, X, (Abs, Aks))
    return X


@jax.jit
def _ntransfer_apply_left(X, Abs, Aks):
    def body(x, site):
        Ab, Ak = site
        return _nenv_step_left(x, Ab, Ak), None

    X, _ = jax.lax.scan(body, X, (Abs, Aks), reverse=True)
    return X


def _rsvd_transfer(apply_T, apply_Tt, shape_in, shape_out, k_sketch,
                   key, dtype, q=1):
    """Randomized SVD of a linear transfer map given only its (batched)
    action and transpose-action (reference lazy 'isvd';
    the classic Halko-Martinsson-Tropp range sketch). ``apply_T`` must
    be the *column* map ``x -> T x`` (for a ring complement that is
    the right-to-left environment scan) and ``apply_Tt`` the plain
    transpose ``u -> T^t u`` (the left-to-right scan). Returns
    (U, s, VH) with U (Dout, k) and VH (k, Din); rank selection is the
    caller's job."""
    Din = int(np.prod(shape_in))
    Dout = int(np.prod(shape_out))
    ks = min(k_sketch, Din, Dout)

    Om = jax.random.normal(key, (ks, *shape_in), dtype=jnp.float32)
    Om = Om.astype(dtype)
    Y = apply_T(Om)                                   # (ks, *shape_out)
    for _ in range(q):
        Z = jnp.conj(apply_Tt(jnp.conj(Y)))           # T^H Y
        Y = apply_T(Z)
    # orthonormal range basis
    Q, _ = jnp.linalg.qr(jnp.reshape(Y, (ks, Dout)).T)      # (Dout, ks)
    # B = Q^H T = (T^H Q)^H ; T^H u = conj(T^t conj(u))
    Zt = jnp.conj(
        apply_Tt(jnp.conj(jnp.reshape(Q.T, (ks, *shape_out))))
    )                                                  # (ks, *shape_in)
    B = jnp.conj(jnp.reshape(Zt, (ks, Din)))           # = Q^H T
    Ub, s, VH = jnp.linalg.svd(B, full_matrices=False)
    U = Q @ Ub                                         # (Dout, ks)
    return U, s, VH


@functools.partial(jax.jit, static_argnames=("ncv", "restarts"))
def _local_solve_2site_cyc(L, W1, W2, R, NL, NR, theta0, ncv,
                           restarts, fudge=1e-12):
    """Ground state of the cyclic 2-site effective *pencil*
    (Heff, Neff): environments carry a leading closure-rank axis that
    is contracted between the two ends of the ring, and the effective
    norm is NOT the identity (the ring cannot be fully canonicalized —
    reference solves the generalized problem via LOBPCG,
    dmrg.py:626). Here: build a Krylov basis with Heff, project BOTH
    operators, and solve the small generalized Rayleigh-Ritz problem —
    inverse-free, jit-static, a handful of extra tiny matvecs. The
    returned theta is normalized in the Neff metric, so the global
    state stays normalized; the returned energy is the honest
    Rayleigh quotient."""
    from ...linalg.lanczos import _lanczos_basis

    LW1 = jnp.einsum("sawk,wxup->saxupk", L, W1)
    W2R = jnp.einsum("xyvq,sbyr->sxvqbr", W2, R)

    def matvec(th):
        T = jnp.einsum("kpqr,saxupk->sauxqr", th, LW1)
        return jnp.einsum("sauxqr,sxvqbr->auvb", T, W2R)

    def nmatvec(th):
        T = jnp.einsum("tbk,kpqr->tbpqr", NL, th)
        return jnp.einsum("tbpqr,tcr->bpqc", T, NR)

    shape = theta0.shape
    v = theta0 / jnp.linalg.norm(jnp.reshape(theta0, (-1,)))
    lam = None
    for _ in range(restarts):
        V, alpha, beta = _lanczos_basis(matvec, v, ncv)  # V (ncv, n)
        # project the pencil onto the Krylov basis
        HV = jax.vmap(
            lambda col: jnp.reshape(matvec(jnp.reshape(col, shape)),
                                    (-1,))
        )(V)
        NV = jax.vmap(
            lambda col: jnp.reshape(nmatvec(jnp.reshape(col, shape)),
                                    (-1,))
        )(V)
        Hm = jnp.conj(V) @ HV.T
        Nm = jnp.conj(V) @ NV.T
        Hm = (Hm + jnp.conj(Hm.T)) / 2
        Nm = (Nm + jnp.conj(Nm.T)) / 2
        # fold: Nm^{-1/2} Hm Nm^{-1/2} (nullspace-fudged)
        wn, Un = jnp.linalg.eigh(Nm)
        wn = jnp.clip(jnp.real(wn), fudge, None)
        F = Un * (wn ** -0.5)[None, :]
        Hf = jnp.conj(F.T) @ Hm @ F
        Hf = (Hf + jnp.conj(Hf.T)) / 2
        wh, Uh = jnp.linalg.eigh(Hf)
        lam = wh[0]
        c = (F @ Uh[:, 0]).astype(V.dtype)
        vflat = c @ V
        v = jnp.reshape(vflat, shape)
        # normalize in the Neff metric
        den = jnp.real(jnp.vdot(v, nmatvec(v)))
        v = v / jnp.sqrt(jnp.where(den > 0, den, 1.0))

    hv = matvec(v)
    num = jnp.real(jnp.vdot(v, hv))
    den = jnp.real(jnp.vdot(v, nmatvec(v)))
    return num / den, v


@jax.jit
def _ring_quotient(lenv, renv0, nlenv, nrenv0):
    """Full-ring <H> given segment-absorbed left envs and the closure
    right seeds: scalar = sum_s lenv[s].renv0[s] (elementwise over the
    boundary triple)."""
    e = jnp.real(jnp.einsum("sbwk,sbwk->", lenv, renv0))
    n = jnp.real(jnp.einsum("sbk,sbk->", nlenv, nrenv0))
    return e / n


@jax.jit
def _gauge_from_edge_density(E, inv_tol):
    """Split a (symmetrized) edge density matrix E (D,D) into x with
    x^H x = E and its clipped inverse (reference canonize_cyclic
    eigh-split, tn1d/core.py:1045). The overall phase of E is fixed
    first (SVD factors carry an arbitrary phase; a negated PSD matrix
    would be annihilated by the eigenvalue clip)."""
    tr = jnp.trace(E)
    ph = tr / jnp.where(jnp.abs(tr) > 0, jnp.abs(tr), 1.0)
    E = E * jnp.conj(ph)
    E = (E + jnp.conj(E.T)) / 2
    lam, V = jnp.linalg.eigh(E)
    lam = jnp.clip(jnp.real(lam), 0.0, None)
    sq = jnp.sqrt(lam)
    x = sq[:, None] * jnp.conj(V.T)
    inv = jnp.where(sq > inv_tol, 1.0 / jnp.where(sq > 0, sq, 1.0), 0.0)
    xinv = V * inv[None, :]
    return x.astype(E.dtype), xinv.astype(E.dtype)


@jax.jit
def _apply_gauge_left_bond(x, A):
    """A (l,p,r) -> gauge on the left bond: x @ A."""
    return jnp.einsum("ij,jpk->ipk", x, A)


@jax.jit
def _apply_gauge_right_bond(A, x):
    """A (l,p,r) -> gauge on the right bond: A @ x."""
    return jnp.einsum("ipj,jk->ipk", A, x)


@jax.jit
def _theta_2site(A1, A2):
    return jnp.einsum("kpc,cqr->kpqr", A1, A2)


def cyclic_mps_arrays(psi, chi=None):
    """Extract (l, p, r) site arrays from a cyclic MPS, zero-padded to
    a uniform bond dimension (the ring has no boundary taper, so
    uniformity is natural — one stacked scan covers every site)."""
    L = psi.L
    if L < 3:
        raise ValueError("cyclic array form needs L >= 3")
    out = []
    for i in range(L):
        t = psi[psi.site_tag(i)]
        p = psi.site_ind(i)
        tl = psi[psi.site_tag((i - 1) % L)]
        tr = psi[psi.site_tag((i + 1) % L)]
        lix = [ix for ix in t.inds if ix != p and ix in tl.inds]
        rix = [ix for ix in t.inds if ix != p and ix in tr.inds]
        out.append(t.transpose(*lix, p, *rix).data)
    if chi is None:
        chi = max(max(a.shape[0], a.shape[2]) for a in out)
    padded = []
    for a in out:
        b = jnp.zeros((chi, a.shape[1], chi), dtype=a.dtype)
        padded.append(b.at[: a.shape[0], :, : a.shape[2]].set(a))
    return padded


def cyclic_mpo_arrays(ham):
    """Extract (wl, wr, u, d) site arrays from a cyclic MPO, padded to
    a uniform MPO bond (zero-padding an MPO bond is exact)."""
    L = ham.L
    out = []
    for i in range(L):
        t = ham[ham.site_tag(i)]
        u, d = ham.upper_ind(i), ham.lower_ind(i)
        tl = ham[ham.site_tag((i - 1) % L)]
        tr = ham[ham.site_tag((i + 1) % L)]
        lix = [ix for ix in t.inds if ix not in (u, d) and
               ix in tl.inds]
        rix = [ix for ix in t.inds if ix not in (u, d) and
               ix in tr.inds]
        out.append(t.transpose(*lix, *rix, u, d).data)
    w = max(max(a.shape[0], a.shape[1]) for a in out)
    padded = []
    for a in out:
        b = jnp.zeros((w, w, *a.shape[2:]), dtype=a.dtype)
        padded.append(b.at[: a.shape[0], : a.shape[1]].set(a))
    return padded


def cyclic_arrays_to_mps(arrays, like):
    """Write uniform (l, p, r) arrays back into a cyclic MPS shaped
    like ``like``."""
    from .core import MatrixProductState

    site_arrays = [jnp.transpose(a, (0, 2, 1)) for a in arrays]
    return MatrixProductState(
        site_arrays, shape="lrp", cyclic=True,
        site_ind_id=like._site_ind_id, site_tag_id=like._site_tag_id,
    )


class CyclicSweeper:
    """Array-level cyclic 2-site DMRG sweeps (the engine behind
    ``DMRG`` when the Hamiltonian is periodic and OBC conversion is
    disabled). Site arrays are kept uniform ``(chi, d, chi)`` so every
    transfer/environment pass is one compiled scan.

    Parameters
    ----------
    Ws : list of (w, w, d, d) arrays
        The cyclic MPO site tensors, zero-padded to a uniform MPO bond.
    As : list of (chi, d, chi) arrays
        The cyclic MPS site tensors (uniform bond).
    opts : dict
        The DMRG option set (:func:`get_default_opts`); the
        ``periodic_*`` entries drive the closure compressions.
    """

    def __init__(self, Ws, As, opts, seed=0):
        self.L = len(As)
        self._W = [jnp.asarray(w) for w in Ws]
        self._A = [jnp.asarray(a) for a in As]
        self.opts = opts
        self._key = jax.random.PRNGKey(seed)
        self.bond_sizes = []

    # -- helpers ----------------------------------------------------------

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    @property
    def chi(self):
        return self._A[0].shape[0]

    def _grow_bond(self, chi_new):
        """Pad all site arrays to a larger uniform bond, with a little
        noise so gauges stay invertible (reference
        ``bond_expand_rand_strength``)."""
        chi = self.chi
        if chi_new <= chi:
            return
        eps = self.opts.get("bond_expand_rand_strength", 1e-6)
        key = self._next_key()
        for i, A in enumerate(self._A):
            pad = jax.random.normal(
                jax.random.fold_in(key, i),
                (chi_new, A.shape[1], chi_new), dtype=jnp.float32,
            ).astype(A.dtype) * eps
            self._A[i] = pad.at[:chi, :, :chi].add(A)

    def _stack(self, sites, arrs):
        return jnp.stack([arrs[j % self.L] for j in sites])

    def _complement_stacks(self, comp):
        Aks = self._stack(comp, self._A)
        Abs = jnp.conj(Aks)
        Ws = self._stack(comp, self._W)
        return Abs, Ws, Aks

    # -- segment machinery --------------------------------------------------

    def _pseudo_canonize(self, s0, s1, comp):
        """Gauge the two wrap edges so the complement norm transfer is
        approximately the identity (reference ``canonize_cyclic``)."""
        L = self.L
        chi = self.chi
        Aks = self._stack(comp, self._A)
        Abs = jnp.conj(Aks)
        U, s, VH = _rsvd_transfer(
            lambda X: _ntransfer_apply_left(X, Abs, Aks),
            lambda X: _ntransfer_apply_right(X, Abs, Aks),
            (chi, chi), (chi, chi),
            k_sketch=min(8, chi * chi), key=self._next_key(),
            dtype=self._A[0].dtype, q=1,
        )
        inv_tol = self.opts.get("periodic_canonize_inv_tol", 1e-10)
        # dominant rank-1 edge densities (bra, ket): the V side lives
        # at the segment's left edge (left-environment row space), the
        # U side at its right edge
        EL = jnp.reshape(VH[0, :] * s[0], (chi, chi))
        ER = jnp.reshape(U[:, 0], (chi, chi))
        x, xinv = _gauge_from_edge_density(EL, inv_tol)
        # left edge: bond (s0-1 | s0)
        self._A[s0 % L] = _apply_gauge_left_bond(x, self._A[s0 % L])
        self._A[(s0 - 1) % L] = _apply_gauge_right_bond(
            self._A[(s0 - 1) % L], xinv
        )
        y, yinv = _gauge_from_edge_density(ER, inv_tol)
        # right edge: bond (s1 | s1+1); complement in-edge density
        # transforms as conj(G) ER G^T with A[s1+1] <- G A[s1+1],
        # so G = y^{-T} makes it the identity
        G = yinv.T
        Ginv = y.T
        self._A[(s1 + 1) % L] = _apply_gauge_left_bond(
            G, self._A[(s1 + 1) % L]
        )
        self._A[s1 % L] = _apply_gauge_right_bond(self._A[s1 % L], Ginv)

    def _canonize_segment(self, sites, toward="left"):
        """Make the segment interior canonical toward the sweep start
        with LQ/QR passes (host loop of jitted splits)."""
        L = self.L
        if toward == "left":
            # right-canonize: sites[-1] .. sites[1]
            for j in reversed(range(1, len(sites))):
                i = sites[j] % L
                ip = sites[j - 1] % L
                A = self._A[i]
                chi, d, chir = A.shape
                lq = jnp.reshape(A, (chi, d * chir))
                # LQ via QR of the transpose
                Q, R = jnp.linalg.qr(lq.T)
                self._A[i] = jnp.reshape(Q.T, (chi, d, chir))
                self._A[ip] = _apply_gauge_right_bond(self._A[ip], R.T)
            return
        for j in range(len(sites) - 1):
            i = sites[j] % L
            inx = sites[j + 1] % L
            A = self._A[i]
            chi, d, chir = A.shape
            Q, R = jnp.linalg.qr(jnp.reshape(A, (chi * d, chir)))
            self._A[i] = jnp.reshape(Q, (chi, d, chir))
            self._A[inx] = _apply_gauge_left_bond(R, self._A[inx])

    def _compress_closures(self, comp):
        """Compress the complement H- and norm- transfer operators into
        low-rank boundary seeds (lenv0, renv0, nlenv0, nrenv0)."""
        chi = self.chi
        w = self._W[0].shape[0]
        Abs, Ws, Aks = self._complement_stacks(comp)
        eps_h = self.opts.get("periodic_compress_tol", 1e-6)
        eps_n = self.opts.get("periodic_compress_norm_eps", 1e-6)
        mb = self.opts.get("periodic_compress_max_bond", -1)
        D = chi * w * chi
        kmax = min(D, mb if (mb and mb > 0) else 128)

        # column map of the complement = right-to-left scan; the V side
        # of Comp = U S V^H seeds the segment's LEFT environments
        # (lenv0 = sqrt(s) V^H rows), the U side its RIGHT environments.
        # The sketch grows adaptively until the spectral tail is below
        # the compression tolerance (or the cap is hit).
        kh = min(16, kmax)
        while True:
            U, s, VH = _rsvd_transfer(
                lambda X: _transfer_apply_left(X, Abs, Ws, Aks),
                lambda X: _transfer_apply_right(X, Abs, Ws, Aks),
                (chi, w, chi), (chi, w, chi),
                k_sketch=kh, key=self._next_key(),
                dtype=self._A[0].dtype, q=1,
            )
            s_h = np.asarray(jax.device_get(s))
            tail_ok = s_h[-1] <= eps_h * max(s_h[0], 1e-300)
            if tail_ok or kh >= kmax:
                break
            kh = min(2 * kh, kmax)
        r = max(1, int(np.sum(s_h > eps_h * max(s_h[0], 1e-300))))
        if mb and mb > 0:
            r = min(r, mb)
        self.bond_sizes.append(r)
        # bucket the closure rank to the next power of two (zero-padded
        # ranks are exact) so downstream jit programs see a handful of
        # static shapes instead of one per segment
        rp = min(1 << (r - 1).bit_length(), kh)
        sq = jnp.sqrt(
            jnp.where(jnp.arange(rp) < r, s[:rp], 0.0)
        ).astype(U.dtype)
        lenv0 = jnp.reshape(sq[:, None] * VH[:rp], (rp, chi, w, chi))
        renv0 = jnp.reshape((U[:, :rp] * sq[None, :]).T,
                            (rp, chi, w, chi))

        knmax = min(chi * chi, 64)
        kn = min(8, knmax)
        while True:
            Un, sn, VHn = _rsvd_transfer(
                lambda X: _ntransfer_apply_left(X, Abs, Aks),
                lambda X: _ntransfer_apply_right(X, Abs, Aks),
                (chi, chi), (chi, chi),
                k_sketch=kn, key=self._next_key(),
                dtype=self._A[0].dtype, q=1,
            )
            sn_h = np.asarray(jax.device_get(sn))
            if sn_h[-1] <= eps_n * max(sn_h[0], 1e-300) or kn >= knmax:
                break
            kn = min(2 * kn, knmax)
        rn = max(1, int(np.sum(sn_h > eps_n * max(sn_h[0], 1e-300))))
        rnp = min(1 << (rn - 1).bit_length(), kn)
        sqn = jnp.sqrt(
            jnp.where(jnp.arange(rnp) < rn, sn[:rnp], 0.0)
        ).astype(Un.dtype)
        nlenv0 = jnp.reshape(sqn[:, None] * VHn[:rnp], (rnp, chi, chi))
        nrenv0 = jnp.reshape((Un[:, :rnp] * sqn[None, :]).T,
                             (rnp, chi, chi))
        return lenv0, renv0, nlenv0, nrenv0

    # -- sweeping -----------------------------------------------------------

    def _segments(self, direction):
        """Segment (s0, s1) pairs: explicit sites s0..s1 inclusive
        (s1's tensor is the wrap partner of the last block), positions
        s0..s1-1. Mirrors reference ``init_segment`` with
        ``ssz=periodic_segment_size``; the complement (compressed
        'long way round') always keeps at least one site."""
        L = self.L
        frac = self.opts.get("periodic_segment_size", 0.5)
        m = int(L * frac) if isinstance(frac, float) else int(frac)
        m = max(2, min(m, L - 2))
        segs = []
        s0 = 0
        while s0 < L:
            s1 = s0 + m
            if L - s1 < 2:  # absorb a short tail
                s1 = L
            segs.append((s0, s1))
            s0 = s1
        if direction == "L":
            segs = [seg for seg in reversed(segs)]
        return segs

    def sweep(self, direction="R", max_bond=None, cutoff=0.0, ncv=8,
              restarts=1, method="svd"):
        """One full cyclic sweep. Returns the final Rayleigh-quotient
        energy (global, through the compressed closures)."""
        if max_bond is not None:
            self._grow_bond(max_bond)
        L = self.L
        chi = self.chi
        energy = None

        for (s0, s1) in self._segments(direction):
            comp = [(s1 + 1 + j) % L for j in range((s0 + L - s1 - 1) % L)]
            sites = [j % L for j in range(s0, s1 + 1)]
            if not comp:
                # segment covers everything: treat the wrap bond pair
                # explicitly by shrinking the segment by two sites
                comp = [(s1 - 1) % L, s1 % L]
                sites = [j % L for j in range(s0, s1 - 1)]
                s1 = s1 - 2
            self._pseudo_canonize(s0, s1, comp)
            if direction == "R":
                self._canonize_segment(sites, toward="left")
            else:
                self._canonize_segment(sites, toward="right")
            lenv0, renv0, nlenv0, nrenv0 = self._compress_closures(comp)

            if direction == "R":
                # precompute right envs at each position
                renvs = {s1: renv0}
                nrenvs = {s1: nrenv0}
                for j in reversed(range(s0 + 1, s1)):
                    i1 = (j + 1) % L
                    renvs[j] = _env_step_left_b(
                        renvs[j + 1], jnp.conj(self._A[i1]),
                        self._W[i1], self._A[i1],
                    )
                    nrenvs[j] = _nenv_step_left(
                        nrenvs[j + 1], jnp.conj(self._A[i1]),
                        self._A[i1],
                    )
                lenv, nlenv = lenv0, nlenv0
                for p in range(s0, s1):
                    i, i1 = p % L, (p + 1) % L
                    theta0 = _theta_2site(self._A[i], self._A[i1])
                    en, v = _local_solve_2site_cyc(
                        lenv, self._W[i], self._W[i1], renvs[p + 1],
                        nlenv, nrenvs[p + 1], theta0, ncv=ncv,
                        restarts=restarts,
                    )
                    A1, A2, _ = _split_2site(
                        v, max_bond=chi, cutoff=cutoff, absorb="right",
                        method=method,
                    )
                    self._A[i], self._A[i1] = A1, A2
                    lenv = _env_step_right_b(
                        lenv, jnp.conj(A1), self._W[i], A1)
                    nlenv = _nenv_step_right(nlenv, jnp.conj(A1), A1)
                    energy = en
            else:
                lenvs = {s0: lenv0}
                nlenvs = {s0: nlenv0}
                for j in range(s0 + 1, s1):
                    i0 = (j - 1) % L
                    lenvs[j] = _env_step_right_b(
                        lenvs[j - 1], jnp.conj(self._A[i0]),
                        self._W[i0], self._A[i0],
                    )
                    nlenvs[j] = _nenv_step_right(
                        nlenvs[j - 1], jnp.conj(self._A[i0]),
                        self._A[i0],
                    )
                renv, nrenv = renv0, nrenv0
                for p in reversed(range(s0, s1)):
                    i, i1 = p % L, (p + 1) % L
                    theta0 = _theta_2site(self._A[i], self._A[i1])
                    en, v = _local_solve_2site_cyc(
                        lenvs[p], self._W[i], self._W[i1], renv,
                        nlenvs[p], nrenv, theta0, ncv=ncv,
                        restarts=restarts,
                    )
                    A1, A2, _ = _split_2site(
                        v, max_bond=chi, cutoff=cutoff, absorb="left",
                        method=method,
                    )
                    self._A[i], self._A[i1] = A1, A2
                    renv = _env_step_left_b(
                        renv, jnp.conj(A2), self._W[i1], A2)
                    nrenv = _nenv_step_left(nrenv, jnp.conj(A2), A2)
                    energy = en

        return float(jax.device_get(energy))
