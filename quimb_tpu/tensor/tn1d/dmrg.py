"""DMRG: density-matrix renormalization group ground-state search.

Re-design of reference ``quimb/tensor/tn1d/dmrg.py`` (``MovingEnvironment``
:105, ``DMRG`` :501, ``DMRG1`` :1147, ``DMRG2`` :1166, ``DMRGX`` :1190).

TPU-first architecture: instead of generic TN bookkeeping in the hot loop,
the sweep runs on a **uniform array representation** — site tensors
``(l, p, r)``, MPO tensors ``(wl, wr, u, d)`` (boundaries padded with
size-1 bonds), environments ``(b, w, k)`` — with every step a jitted XLA
program:

- ``_env_step_left/right``: one environment absorption = three dot_generals
  on the MXU (the reference's MovingEnvironment O(1) update, dmrg.py:427).
- ``_local_solve_2site``: matrix-free restarted-Lanczos on the effective
  Hamiltonian (the reference calls ARPACK through
  ``TNLinearOperator._matvec`` tensor_core.py:12085 — here the matvec is
  a closed jitted einsum chain over L/W/W/R).
- ``_split_2site``: truncated SVD of the updated theta with static
  ``max_bond`` (S0 kernel).

Per-(shape-signature) jit caching means the first sweep compiles a handful
of edge shapes plus the bulk shape; later sweeps are pure cached execution
(SURVEY §7 'shapes stabilize after sweep 1').
"""

import functools
import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ...ops import decomp
from ...utils import progbar as Progbar
from ..core import TensorNetwork
from .core import MatrixProductOperator, MatrixProductState


def get_default_opts(cyclic=False):
    """Advanced options for DMRG, with defaults mirroring the
    reference's 19 documented knobs (dmrg.py:19)."""
    from ...config import on_tpu

    return {
        "default_sweep_sequence": "R",
        # Jacobi SVD is the slowest XLA op on TPU; the gram-eigh split
        # ('svd:eig') avoids it but its full-size eigh is still the
        # most expensive kernel in a sweep (7.6 ms at 512 on v5e).
        # 'svd:sub' truncates via randomized subspace iteration +
        # max_bond-sized Rayleigh-Ritz (matmuls + tall QR only) —
        # 3.5x faster, same cutoff/absorb semantics; sweeps with
        # cutoff=0 automatically drop to the even cheaper pure
        # subspace split ('svd:sub0').
        "bond_compress_method": "svd:sub" if on_tpu() else "svd",
        "bond_compress_cutoff_mode": "rel",
        "bond_expand_rand_strength": 1e-6,
        "local_eig_tol": 1e-3,
        "local_eig_ncv": 4,
        # ncv used by a sweep is max(2*local_eig_ncv, local_eig_ncv_floor):
        # the floor keeps early (far-from-converged) sweeps robust;
        # steady-state loops may lower it to shrink the serial Lanczos
        # chain, the dominant cost of a converged f32 sweep
        "local_eig_ncv_floor": 8,
        "local_eig_backend": None,
        "local_eig_maxiter": None,
        # with per-sweep warm starts a single ncv~8 Lanczos pass
        # converges DMRG identically to larger budgets (measured:
        # same 3e-10 final error in the same number of sweeps) at a
        # third of the matvec cost
        "local_eig_restarts": 1,
        "local_eig_ham_dense": None,
        "local_eig_EPSType": None,
        "periodic_segment_size": 1 / 2,
        "periodic_compress_method": "isvd",
        "periodic_compress_norm_eps": 1e-6,
        "periodic_compress_tol": 1e-6,
        "periodic_compress_max_bond": -1,
        "periodic_nullspace_fudge_factor": 1e-12,
        "periodic_canonize_inv_tol": 1e-10,
        "periodic_orthog_tol": 1e-6,
    }


class DMRGError(Exception):
    pass


class _EndlessSeq:
    """A picklable 'last value repeats forever' sequence (the
    reference stores bond-dim/cutoff schedules as itertools chains,
    dmrg.py:596 — a plain class keeps DMRG objects checkpointable)."""

    def __init__(self, values):
        self.values = list(values)
        self.i = 0

    def __next__(self):
        v = self.values[min(self.i, len(self.values) - 1)]
        self.i += 1
        return v

    def __iter__(self):
        return self


# ---------------------------------------------------------------------------
# jitted kernels (uniform array layout)
# ---------------------------------------------------------------------------


@jax.jit
def _env_step_right(L, Ab, W, Ak):
    """Absorb one site into a left environment:
    L (b,w,k), Ab=conj ket (b,p,b2) bra side, W (w,w2,u,d), Ak (k,d,k2)
    -> (b2,w2,k2)."""
    # L·Ak -> (b, w, d, k2)
    T = jnp.einsum("bwk,kdx->bwdx", L, Ak)
    # ·W -> (b, w2, u, k2)
    T = jnp.einsum("bwdx,wyud->byux", T, W)
    # ·conj(bra) -> (b2, w2, k2)
    return jnp.einsum("byux,bua->ayx", T, Ab)


@jax.jit
def _env_step_left(R, Ab, W, Ak):
    """Absorb one site into a right environment:
    R (b,w,k), Ab (b2,p,b), W (w2,w,u,d), Ak (k2,d,k) -> (b2,w2,k2)."""
    T = jnp.einsum("bwk,xdk->bwxd", R, Ak)
    T = jnp.einsum("bwxd,ywud->byxu", T, W)
    return jnp.einsum("byxu,aub->ayx", T, Ab)


def _heff_matvec_2site(LW1, W2R, theta):
    """theta (k,d1,d2,r) -> (b_out, u1, u2, b2_out) with hermitian
    layout: inputs contract the MPO 'd' legs, outputs are 'u' legs.

    Takes the environment-MPO fusions ``LW1[a,x,u,p,k]`` and
    ``W2R[x,v,q,b,r]`` (built once per solve by :func:`_fuse_lw` /
    :func:`_fuse_wr` — loop-invariant across all Lanczos matvecs, so
    XLA hoists them out of the fori_loop). This ordering makes *both*
    big contractions deep-K matmuls (K = chi*d and K = w*d*chi), which
    the MXU tiles at high utilization — the naive order's middle
    contraction has K = w*d^2 (~20), i.e. <3% systolic-array
    occupancy, and dominated the sweep wall-time."""
    T = jnp.einsum("kpqr,axupk->auxqr", theta, LW1)
    return jnp.einsum("auxqr,xvqbr->auvb", T, W2R)


def _fuse_lw(L, W1):
    """Fuse the left environment (a,w,k) with the first MPO tensor
    (w,x,u,p) into LW1 (a,x,u,p,k) — O(chi^2 w^2 d^2) once per solve,
    negligible next to the ncv matvecs it accelerates."""
    return jnp.einsum("awk,wxup->axupk", L, W1)


def _fuse_wr(W2, R):
    """Fuse the second MPO tensor (x,y,v,q) with the right environment
    (b,y,r) into W2R (x,v,q,b,r)."""
    return jnp.einsum("xyvq,byr->xvqbr", W2, R)


def _heff_matvec_1site(LW, R, theta):
    """theta (k,p,r) -> (a,u,b) via LW (a,x,u,p,k) and R (b,x,r)."""
    T = jnp.einsum("kpr,axupk->auxr", theta, LW)
    return jnp.einsum("auxr,bxr->aub", T, R)


def _overlap_norm_2site(L, R, v):
    """Exact ⟨ψ|ψ⟩ of the full MPS with 2-site tensor ``v`` (k,p,q,r),
    read off the environments' MPO *identity channels*: for a
    Schur-form MPO (W[0,0] = I upper-left, W[-1,-1] = I lower-right —
    the form every FSM/SpinHam builder here emits), the left
    H-environment's channel 0 is exactly the pure-identity string,
    i.e. the norm environment, and the right environment's last
    channel likewise. Zero extra environment bookkeeping."""
    nL = L[:, 0, :]    # (bra_bond a, ket_bond k)
    nR = R[:, -1, :]   # (bra_bond b, ket_bond r)
    t = jnp.einsum("ak,kpqr->apqr", nL, v)
    t = jnp.einsum("apqr,br->apqb", t, nR)
    return jnp.real(jnp.einsum("apqb,apqb->", jnp.conj(v), t))


def _overlap_norm_1site(L, R, v):
    """1-site variant of :func:`_overlap_norm_2site`; v is (k,p,r)."""
    nL = L[:, 0, :]
    nR = R[:, -1, :]
    t = jnp.einsum("ak,kpr->apr", nL, v)
    t = jnp.einsum("apr,br->apb", t, nR)
    return jnp.real(jnp.einsum("apb,apb->", jnp.conj(v), t))


@functools.partial(jax.jit, static_argnames=("ncv", "restarts",
                                             "norm_energy"))
def _local_solve_2site(L, W1, W2, R, theta0, ncv, restarts,
                       norm_energy=True):
    """Restarted-Lanczos ground state of the 2-site effective
    Hamiltonian. Returns (energy, theta).

    With ``norm_energy`` (default) the returned energy is the exact
    variational Rayleigh quotient ⟨ψ|H|ψ⟩/⟨ψ|ψ⟩ of the full updated
    MPS: the Lanczos Ritz value equals ⟨θ|Heff|θ⟩ = ⟨ψ|H|ψ⟩ for the
    normalized Ritz vector θ, and ⟨ψ|ψ⟩ is read off the environments'
    identity channels (:func:`_overlap_norm_2site`). Without it, the
    raw Ritz value silently assumes orthonormal environments, which
    canonize-free f32 sweep alternation violates — the reported
    energies then break the variational bound (can dip *below* E0)."""
    from ...linalg.lanczos import _lanczos_basis, _tridiag_eigh
    from ...ops import pallas_kernels as pk

    cl, w, d = L.shape[0], W1.shape[1], W1.shape[2]
    cr = R.shape[0]
    M = K1 = cl * d
    K2 = N = d * cr
    if pk.use_sandwich_kernel(theta0.dtype, w, M, K1, K2, N):
        # fused-sandwich path: sum_x A[x] @ theta @ B[x] in one Pallas
        # kernel — no HBM intermediate, one launch per Lanczos step
        A = jnp.reshape(
            jnp.einsum("awk,wxup->xaukp", L, W1), (w, M, K1)
        )
        B = jnp.reshape(
            jnp.einsum("xyvq,byr->xqrvb", W2, R), (w, K2, N)
        )

        def matvec(th):
            out = pk.sandwich_matvec(A, jnp.reshape(th, (K1, K2)), B)
            return jnp.reshape(out, theta0.shape)

    else:
        # fuse environments with the MPO tensors once — loop-invariant
        # across all Lanczos matvecs (XLA hoists them out of the
        # fori_loop)
        LW1 = _fuse_lw(L, W1)
        W2R = _fuse_wr(W2, R)

        def matvec(th):
            return _heff_matvec_2site(LW1, W2R, th)

    v = theta0 / jnp.linalg.norm(jnp.reshape(theta0, (-1,)))
    lam = None
    for _ in range(restarts):
        V, alpha, beta = _lanczos_basis(matvec, v, ncv)
        w, S = _tridiag_eigh(alpha, beta)
        lam = w[0]
        coeff = S[:, 0].astype(V.dtype)
        vflat = coeff @ V
        vflat = vflat / jnp.linalg.norm(vflat)
        v = jnp.reshape(vflat, theta0.shape)
    if norm_energy:
        lam = lam / _overlap_norm_2site(L, R, v)
    return lam, v


@functools.partial(jax.jit, static_argnames=("ncv", "restarts",
                                             "norm_energy"))
def _local_solve_1site(L, W, R, theta0, ncv, restarts,
                       norm_energy=True):
    from ...linalg.lanczos import _lanczos_basis, _tridiag_eigh
    from ...ops import pallas_kernels as pk

    cl, w, d = L.shape[0], W.shape[1], W.shape[2]
    cr = R.shape[0]
    M = K1 = cl * d
    K2 = N = cr
    if pk.use_sandwich_kernel(theta0.dtype, w, M, K1, K2, N):
        A = jnp.reshape(
            jnp.einsum("awk,wxup->xaukp", L, W), (w, M, K1)
        )
        B = jnp.transpose(R, (1, 2, 0))  # (b,x,r) -> (x,r,b)

        def matvec(th):
            out = pk.sandwich_matvec(A, jnp.reshape(th, (K1, K2)), B)
            return jnp.reshape(out, theta0.shape)

    else:
        LW = _fuse_lw(L, W)

        def matvec(th):
            return _heff_matvec_1site(LW, R, th)

    v = theta0 / jnp.linalg.norm(jnp.reshape(theta0, (-1,)))
    lam = None
    for _ in range(restarts):
        V, alpha, beta = _lanczos_basis(matvec, v, ncv)
        w, S = _tridiag_eigh(alpha, beta)
        lam = w[0]
        coeff = S[:, 0].astype(V.dtype)
        vflat = coeff @ V
        vflat = vflat / jnp.linalg.norm(vflat)
        v = jnp.reshape(vflat, theta0.shape)
    if norm_energy:
        lam = lam / _overlap_norm_1site(L, R, v)
    return lam, v


@functools.partial(jax.jit,
                   static_argnames=("max_bond", "absorb", "method"))
def _split_2site(theta, max_bond, cutoff, absorb, method="svd"):
    """Split updated theta (k,d1,d2,r) -> A1 (k,d1,c), A2 (c,d2,r) with
    static max_bond (masked dynamic cutoff). ``method='svd:eig'``
    routes through a gram-matrix eigh — much faster than Jacobi SVD on
    TPU (the reference's ``qr:cholesky``-class trick,
    docs/changelog.md:126)."""
    k, d1, d2, r = theta.shape
    mat = jnp.reshape(theta, (k * d1, d2 * r))
    if method == "svd:sub0":
        # pure subspace split: cheapest rank-max_bond truncation —
        # cutoff is IGNORED (callers select this only with cutoff=0).
        # oversample=0 skips the (k+p)-sized Rayleigh-Ritz eigh inside
        # — measured 2.5 ms vs 5.8 ms per split at chi=256 on v5e at
        # a ~5% higher truncation residual (scripts/_cutprof.py);
        # QUIMB_TPU_SUB0_OVERSAMPLE restores the padded variant.
        U, s, VH, rank = decomp.split_truncated_subspace(
            mat, max_bond=max_bond, absorb=absorb,
            oversample=int(os.environ.get(
                "QUIMB_TPU_SUB0_OVERSAMPLE", "0")),
        )
    else:
        split_fn = {
            "svd:eig": decomp.svd_truncated_masked_eig,
            "svd:sub": decomp.svd_truncated_masked_subspace,
        }.get(method, decomp.svd_truncated_masked)
        U, s, VH, rank = split_fn(
            mat, max_bond=max_bond, cutoff=cutoff, cutoff_mode=4,
            absorb=absorb,
        )
    chi = U.shape[-1]
    A1 = jnp.reshape(U, (k, d1, chi))
    A2 = jnp.reshape(VH, (chi, d2, r))
    return A1, A2, rank




# ---------------------------------------------------------------------------
# fused bulk sweeps: at uniform bulk shapes the whole sweep segment is ONE
# compiled XLA program (lax.scan), eliminating per-site dispatch latency —
# the difference between ~760 and ~10 kernel launches per sweep on TPU.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ncv", "restarts",
                                             "max_bond", "method",
                                             "norm_energy"))
def _bulk_sweep_right(lenv0, A0, Anexts, W1s, W2s, renvs, cutoff, ncv,
                      restarts, max_bond, method="svd",
                      norm_energy=True):
    """Scan the 2-site update over a uniform-shape site range, moving
    right. Returns (lenv, A_carry, stacked new left tensors,
    energies)."""

    def body(carry, x):
        lenv, Acur = carry
        W1, W2, Anext, renv = x
        theta0 = jnp.einsum("kpc,cqr->kpqr", Acur, Anext)
        en, theta = _local_solve_2site(
            lenv, W1, W2, renv, theta0, ncv=ncv, restarts=restarts,
            norm_energy=norm_energy,
        )
        N1, N2, _ = _split_2site(
            theta, max_bond=max_bond, cutoff=cutoff, absorb="right",
            method=method,
        )
        lenv = _env_step_right(lenv, jnp.conj(N1), W1, N1)
        return (lenv, N2), (N1, en)

    (lenv, Alast), (N1s, ens) = jax.lax.scan(
        body, (lenv0, A0), (W1s, W2s, Anexts, renvs)
    )
    return lenv, Alast, N1s, ens


@functools.partial(jax.jit, static_argnames=("ncv", "restarts",
                                             "max_bond", "method",
                                             "norm_energy"))
def _bulk_sweep_left(renv0, A0, Aprevs, W1s, W2s, lenvs, cutoff, ncv,
                     restarts, max_bond, method="svd",
                     norm_energy=True):
    """Scan the 2-site update over a uniform range, moving left."""

    def body(carry, x):
        renv, Acur = carry
        W1, W2, Aprev, lenv = x
        theta0 = jnp.einsum("kpc,cqr->kpqr", Aprev, Acur)
        en, theta = _local_solve_2site(
            lenv, W1, W2, renv, theta0, ncv=ncv, restarts=restarts,
            norm_energy=norm_energy,
        )
        N1, N2, _ = _split_2site(
            theta, max_bond=max_bond, cutoff=cutoff, absorb="left",
            method=method,
        )
        renv = _env_step_left(renv, jnp.conj(N2), W2, N2)
        return (renv, N1), (N2, en)

    (renv, Afirst), (N2s, ens) = jax.lax.scan(
        body, (renv0, A0), (W1s, W2s, Aprevs, lenvs)
    )
    return renv, Afirst, N2s, ens


@jax.jit
def _bulk_env_right(lenv0, As, Ws):
    def body(lenv, x):
        A, W = x
        return _env_step_right(lenv, jnp.conj(A), W, A), None

    lenv, _ = jax.lax.scan(body, lenv0, (As, Ws))
    return lenv


@jax.jit
def _bulk_env_right_stack(lenv0, As, Ws):
    """Batched left-environment construction over a uniform range
    (scanned from the left end); returns all intermediate envs:
    stack[k] = environment including sites up to and incl. offset k."""

    def body(lenv, x):
        A, W = x
        new = _env_step_right(lenv, jnp.conj(A), W, A)
        return new, new

    lenv, stack = jax.lax.scan(body, lenv0, (As, Ws))
    return lenv, stack


@jax.jit
def _bulk_env_left(renv0, As, Ws):
    """Batched right-environment construction over a uniform range
    (scanned from the right end); returns all intermediate envs."""

    def body(renv, x):
        A, W = x
        new = _env_step_left(renv, jnp.conj(A), W, A)
        return new, new

    renv, stack = jax.lax.scan(body, renv0, (As, Ws), reverse=True)
    return renv, stack


@jax.jit
def _bulk_canonize_right(Afirst, As):
    """Right-canonize (LQ) a uniform range via scan, right to left.
    carry = the tensor currently being absorbed into."""

    def body(carry, A_left):
        # LQ the carried tensor, absorbing its L factor into the left
        # neighbour A_left; emit the canonized tensor, carry the
        # updated neighbour.
        newAnext, newA = _right_canonize_step(A_left, carry)
        return newAnext, newA

    # scan from right to left: As ordered left..right, reverse=True
    carry, newAs = jax.lax.scan(body, Afirst, As, reverse=True)
    return carry, newAs


# ---------------------------------------------------------------------------
# MovingEnvironment — TN-level API parity (used by tests & other algos)
# ---------------------------------------------------------------------------


class MovingEnvironment:
    """Maintain the environments of a contiguous block of ``bsz`` sites
    in a 1D-structured TN, with O(1) moves (reference
    ``MovingEnvironment`` dmrg.py:105). Open boundary conditions."""

    def __init__(self, tn, begin, bsz, ssz=0.5, **kwargs):
        # Cyclic networks never reach here: ring Hamiltonians are
        # converted to exact OBC form up front (``MPO.to_obc``, used by
        # ``DMRG.__init__``), so the reference's periodic segment
        # machinery (dmrg.py:149-465) has no analogue to dispatch to.
        self.tn = tn
        self.begin = begin
        self.bsz = bsz
        self.L = tn._L
        self.site_tag = tn.site_tag
        self._envs = {}
        self.init_environments()

    def init_environments(self):
        L, bsz = self.L, self.bsz
        tn = self.tn
        if self.begin == "left":
            # build right environments R[j]: contraction of columns >= j
            env = None
            self._renvs = {L: None}
            for j in range(L - 1, bsz - 1, -1):
                col = tn.select(self.site_tag(j), which="any")
                new = col.copy(virtual=False)
                if env is not None:
                    new.add_tensor_network(env, virtual=True,
                                           check_collisions=False)
                envt = new.contract(
                    ..., preserve_tensor=True,
                    output_inds=self._boundary_inds(j),
                )
                env = TensorNetwork((envt,), virtual=True,
                                    check_collisions=False)
                self._renvs[j] = env
            self._lenvs = {0: None}
            self.pos = 0
        else:
            env = None
            self._lenvs = {-1: None}
            for j in range(0, L - bsz):
                col = tn.select(self.site_tag(j), which="any")
                new = col.copy(virtual=False)
                if env is not None:
                    new.add_tensor_network(env, virtual=True,
                                           check_collisions=False)
                envt = new.contract(
                    ..., preserve_tensor=True,
                    output_inds=self._boundary_inds(j, side="right"),
                )
                env = TensorNetwork((envt,), virtual=True,
                                    check_collisions=False)
                self._lenvs[j] = env
            self._renvs = {L: None}
            self.pos = L - bsz

    def _boundary_inds(self, j, side="left"):
        """Indices crossing the boundary between column j and j-1 (side=
        'left': inds shared between columns >= j and columns < j)."""
        tn = self.tn
        block = tn.select_any(
            tuple(self.site_tag(i) for i in (
                range(j, self.L) if side == "left" else range(0, j + 1)
            ))
        )
        rest_tags = tuple(self.site_tag(i) for i in (
            range(0, j) if side == "left" else range(j + 1, self.L)
        ))
        if not rest_tags:
            return block.outer_inds()
        rest = tn.select_any(rest_tags)
        rest_inds = set(rest.ind_map)
        return tuple(
            ix for ix in block.ind_map if ix in rest_inds
        ) + tuple(
            ix for ix in block.outer_inds() if ix not in rest_inds
        )

    def move_right(self):
        i = self.pos
        tn = self.tn
        col = tn.select(self.site_tag(i), which="any")
        new = col.copy(virtual=False)
        prev = self._lenvs.get(i - 1)
        if prev is not None:
            new.add_tensor_network(prev, virtual=True,
                                   check_collisions=False)
        envt = new.contract(..., preserve_tensor=True)
        self._lenvs[i] = TensorNetwork((envt,), virtual=True,
                                       check_collisions=False)
        self.pos += 1

    def move_left(self):
        i = self.pos + self.bsz - 1
        tn = self.tn
        col = tn.select(self.site_tag(i), which="any")
        new = col.copy(virtual=False)
        prev = self._renvs.get(i + 1)
        if prev is not None:
            new.add_tensor_network(prev, virtual=True,
                                   check_collisions=False)
        envt = new.contract(..., preserve_tensor=True)
        self._renvs[i] = TensorNetwork((envt,), virtual=True,
                                       check_collisions=False)
        self.pos -= 1

    def move_to(self, i):
        while self.pos < i:
            self.move_right()
        while self.pos > i:
            self.move_left()

    def __call__(self):
        """The current environment TN: left env + block sites + right
        env (block tensors are virtual views)."""
        i = self.pos
        parts = []
        le = self._lenvs.get(i - 1)
        if le is not None:
            parts.append(le)
        block = self.tn.select_any(
            tuple(self.site_tag(j) for j in range(i, i + self.bsz))
        )
        parts.append(block)
        re = self._renvs.get(i + self.bsz)
        if re is not None:
            parts.append(re)
        out = TensorNetwork((), virtual=True)
        for p in parts:
            out.add_tensor_network(p, virtual=True,
                                   check_collisions=False)
        return out


# ---------------------------------------------------------------------------
# DMRG driver
# ---------------------------------------------------------------------------


def _mpo_uniform_arrays(ham):
    """MPO site arrays as uniform (wl, wr, u, d), boundaries padded."""
    L = ham.L
    out = []
    for i in range(L):
        t = ham[ham.site_tag(i)]
        u, d = ham.upper_ind(i), ham.lower_ind(i)
        lshared = [ix for ix in t.inds if i > 0 and
                   ix in ham[ham.site_tag(i - 1)].inds]
        rshared = [ix for ix in t.inds if i < L - 1 and
                   ix in ham[ham.site_tag(i + 1)].inds]
        order = lshared + rshared + [u, d]
        arr = t.transpose(*order).data
        if not lshared:
            arr = arr[None, ...]
        if not rshared:
            arr = arr[:, None, ...]
        out.append(arr)
    return out


def _mps_uniform_arrays(psi):
    """MPS site arrays as uniform (l, p, r), boundaries padded."""
    L = psi.L
    out = []
    for i in range(L):
        t = psi[psi.site_tag(i)]
        p = psi.site_ind(i)
        lshared = [ix for ix in t.inds if i > 0 and
                   ix in psi[psi.site_tag(i - 1)].inds]
        rshared = [ix for ix in t.inds if i < L - 1 and
                   ix in psi[psi.site_tag(i + 1)].inds]
        arr = t.transpose(*(lshared + [p] + rshared)).data
        if not lshared:
            arr = arr[None, ...]
        if not rshared:
            arr = arr[..., None]
        out.append(arr)
    return out


def _arrays_to_mps(arrays, like):
    """Write uniform (l,p,r) arrays back into an MPS like ``like``."""
    L = like.L
    site_arrays = []
    for i, a in enumerate(arrays):
        if i == 0:
            a = a[0]  # (p, r)
            a = jnp.transpose(a, (1, 0))  # (r, p)
        elif i == L - 1:
            a = a[..., 0]  # (l, p)
        else:
            a = jnp.transpose(a, (0, 2, 1))  # (l, r, p)
        site_arrays.append(a)
    return MatrixProductState(
        site_arrays, shape="lrp",
        site_ind_id=like._site_ind_id, site_tag_id=like._site_tag_id,
    )


@jax.jit
def _right_canonize_step(A_next, A):
    """Make A (l,p,r) right-isometric by LQ, absorbing L into A_next.
    The absorbed factor is renormalized each step so arbitrarily long
    chains never overflow f32 (overall scale is irrelevant to the
    eigenproblem)."""
    l, p, r = A.shape
    mat = jnp.reshape(A, (l, p * r))
    Lf, _, Q = decomp.lq_stabilized(mat)
    chi = Q.shape[0]
    newA = jnp.reshape(Q, (chi, p, r))
    newAnext = jnp.einsum("apk,kc->apc", A_next, Lf)
    nrm = jnp.linalg.norm(jnp.reshape(newAnext, (-1,)))
    newAnext = newAnext / jnp.where(nrm > 0, nrm, 1.0)
    return newAnext, newA


def _mpo_has_identity_channels(Ws, tol=1e-10):
    """True when every MPO tensor has Schur (triangular FSM) form —
    first column ``[I, 0, ..]``ᵀ and last row ``[.., 0, I]`` — so that
    left environments' channel 0 and right environments' channel -1
    are exactly the pure-identity (norm) environments. Every builder
    here (SpinHam1D, the FSM ``operator.builder``) emits this form.

    The first-column condition is only needed on sites feeding a left
    environment (all but the last); the last-row condition on sites
    feeding a right environment (all but the first) — the boundary
    row/column vectors hold the accumulated terms in the other slot.
    """
    n = len(Ws)
    for i, W in enumerate(Ws):
        Wn = np.asarray(W)
        d = Wn.shape[2]
        eye = np.eye(d, dtype=Wn.dtype)
        if i < n - 1:
            col0 = Wn[:, 0]
            if not np.allclose(col0[0], eye, atol=tol):
                return False
            if col0.shape[0] > 1 and np.abs(col0[1:]).max() > tol:
                return False
        if i > 0:
            rowl = Wn[-1, :]
            if not np.allclose(rowl[-1], eye, atol=tol):
                return False
            if rowl.shape[0] > 1 and np.abs(rowl[:-1]).max() > tol:
                return False
    return True


class DMRG:
    """Flexible DMRG solver (reference ``DMRG`` dmrg.py:501).

    Parameters mirror the reference: ``ham`` an MPO, ``bond_dims`` an int
    or schedule, ``cutoffs`` float or schedule, ``bsz`` 1 or 2, ``p0``
    optional initial MPS.
    """

    def __init__(self, ham, bond_dims, cutoffs=1e-9, bsz=2, which="SA",
                 p0=None, cyclic_mode="auto"):
        self.L = ham.L
        self.phys_dim = ham.phys_dim()
        self.bsz = bsz
        self.which = which
        self._set_bond_dim_seq(bond_dims)
        self._set_cutoff_seq(cutoffs)

        # periodic Hamiltonians: two native routes (reference only has
        # the segmented one, tn1d/dmrg.py:281-465):
        # - 'segmented': true ring ansatz + transfer-matrix-compressed
        #   closures, O(1) env moves — right at scale (long rings, low
        #   closure rank)
        # - 'obc': exact open-boundary MPO form (wrap bond carried
        #   through + recompressed, L-independent bond growth) + the
        #   standard fused sweeps — *more* accurate than the
        #   reference's pseudo-orthogonalized small-ring path
        # - 'auto': segmented for long rings, obc for short ones
        if cyclic_mode == "auto":
            cyclic_mode = "segmented" if ham.L >= 40 else "obc"
        # the segmented engine's local solve targets the smallest
        # eigenpair only, so non-'SA' requests fall back to the exact
        # OBC conversion route
        self.cyclic = (bool(getattr(ham, "cyclic", False))
                       and bsz == 2 and cyclic_mode == "segmented"
                       and which == "SA")
        self.opts = get_default_opts(self.cyclic)

        if getattr(ham, "cyclic", False) and not self.cyclic:
            # exact open-boundary form (wrap bond carried through the
            # chain + recompressed) so the standard moving-environment
            # sweeps apply unchanged
            ham = ham.to_obc()
        self.ham = ham

        if self.cyclic:
            # segmented PBC engine: transfer-matrix-compressed ring
            # closures, O(1) moves (reference tn1d/dmrg.py:281-465);
            # see dmrg_cyclic.CyclicSweeper
            from .dmrg_cyclic import (
                CyclicSweeper, cyclic_mpo_arrays, cyclic_mps_arrays,
            )

            if p0 is not None:
                self._k = p0.copy()
            else:
                self._k = ham.rand_state(self._bond_dim0, cyclic=True)
            Ws = cyclic_mpo_arrays(ham)
            As = cyclic_mps_arrays(self._k)
            dtype = jnp.result_type(*(a.dtype for a in Ws),
                                    *(a.dtype for a in As))
            self._cyc = CyclicSweeper(
                [a.astype(dtype) for a in Ws],
                [a.astype(dtype) for a in As], self.opts,
            )
            self.energies = []
            self.local_energies = []
            self.total_energies = []
            return
        self._cyc = None

        if p0 is not None:
            self._k = p0.copy()
        else:
            self._k = ham.rand_state(self._bond_dim0)
        self._k.add_tag("_KET")

        self.energies = []
        self.local_energies = []
        self.total_energies = []
        self.fused = True
        self._mesh = None
        self._mesh_axes = None
        self._Abulk = None
        self._Wbulk = None
        self._stack_key = None
        self._Wbulk_key = None
        self._stale_list_range = None
        # uniform array representations
        self._W = [jnp.asarray(a) for a in _mpo_uniform_arrays(ham)]
        dtype = jnp.result_type(*(a.dtype for a in self._W),
                                *(t.dtype for t in self._k))
        self._W = [a.astype(dtype) for a in self._W]
        self._A = [a.astype(dtype)
                   for a in _mps_uniform_arrays(self._k)]
        # Schur/FSM MPO structure check (host-side, once): with it the
        # environments' identity channels give ⟨ψ|ψ⟩ for free and the
        # reported sweep energies are exact variational Rayleigh
        # quotients; without it fall back to the raw Ritz values.
        self._norm_energy = _mpo_has_identity_channels(self._W)

    def _set_bond_dim_seq(self, bond_dims):
        if isinstance(bond_dims, int):
            bond_dims = [bond_dims]
        self._bond_dims = _EndlessSeq(bond_dims)
        self._bond_dim0 = self._bond_dims.values[0]

    def _set_cutoff_seq(self, cutoffs):
        if isinstance(cutoffs, float):
            cutoffs = [cutoffs]
        self._cutoffs = _EndlessSeq(cutoffs)

    @property
    def state(self):
        if self._cyc is not None:
            from .dmrg_cyclic import cyclic_arrays_to_mps

            return cyclic_arrays_to_mps(self._cyc._A, self._k)
        psi = _arrays_to_mps(self._A, self._k)
        psi.drop_tags("_KET")
        return psi

    @property
    def energy(self):
        return self.energies[-1] if self.energies else None

    # -- device-mesh sharding --------------------------------------------------

    def shard_onto(self, mesh, axes=None):
        """Distribute the sweep over a :class:`jax.sharding.Mesh`: the
        two MPS virtual (chi) axes of every site tensor, environment and
        bulk stack are sharded over the (first two) named mesh axes;
        physical and MPO-bond axes are replicated. XLA's SPMD
        partitioner then turns each einsum of the fused sweeps into
        local matmuls plus ICI collectives (psum / all-gather) — no
        explicit communication code, the scaling-book recipe. This is
        the TPU-native scale-out the reference reaches for SLEPc/MPI
        row slabs for (slepc_linalg.py:105): here it lifts the chi
        ceiling above one chip's HBM.

        Axes whose size does not divide the mesh-axis size (the chain
        edges, small warmup bonds) are transparently replicated.
        """
        self._mesh = mesh
        if axes is None:
            axes = tuple(mesh.axis_names[:2])
        if len(axes) == 1:
            axes = (axes[0], None)
        self._mesh_axes = axes
        # invalidate cached stacks so they are re-put with shardings
        self._stack_key = None
        self._Wbulk_key = None
        self._A = [self._put_site(a) for a in self._A]
        return self

    def _put(self, x, spec):
        if self._mesh is None:
            return x
        from ...parallel.mesh import mesh_put

        return mesh_put(x, self._mesh, spec)

    def _put_site(self, a):
        """Site tensor (chi_l, d, chi_r) or stacked (n, chi, d, chi)."""
        if self._mesh is None:
            return a
        al, ar = self._mesh_axes
        if a.ndim == 3:
            return self._put(a, P(al, None, ar))
        return self._put(a, P(None, al, None, ar))

    def _put_env(self, e):
        """Environment (chi, w, chi) or stacked (n, chi, w, chi)."""
        if self._mesh is None:
            return e
        al, ar = self._mesh_axes
        if e.ndim == 3:
            return self._put(e, P(al, None, ar))
        return self._put(e, P(None, al, None, ar))

    # -- array-level machinery ------------------------------------------------

    def _uniform_bulk_range(self):
        """The maximal [a, b) site range where site and MPO tensors all
        share the bulk shapes (eligible for fused scans)."""
        L, d = self.L, self.phys_dim
        shapes = [a.shape for a in self._A]
        wshape = self._W[L // 2].shape
        from collections import Counter

        cnt = Counter(s for s in shapes if s[0] == s[2])
        if not cnt:
            return 0, 0
        bulk = cnt.most_common(1)[0][0]
        a = 0
        while a < L and shapes[a] != bulk:
            a += 1
        b = a
        while b < L and shapes[b] == bulk and \
                self._W[b].shape == wshape:
            b += 1
        return a, b

    def _get_bulk_stacks(self, a, b):
        """Cached stacked bulk arrays: (Abulk [n,c,d,c], Wbulk).
        Wbulk never changes; Abulk persists across fused phases so the
        per-sweep cost is one stack + one unstack at most."""
        key = (a, b, self._A[a].shape)
        if getattr(self, "_stack_key", None) != key or \
                self._Abulk is None:
            self._Abulk = self._put_site(jnp.stack(self._A[a:b]))
            self._stack_key = key
        if getattr(self, "_Wbulk_key", None) != (a, b):
            self._Wbulk = jnp.stack(self._W[a:b])
            if self._mesh is not None:
                # replicate the MPO stack across the mesh
                self._Wbulk = self._put(self._Wbulk, P())
            self._Wbulk_key = (a, b)
        return self._Abulk, self._Wbulk

    def _set_bulk_stack(self, a, b, Abulk):
        """Update the persistent stacked bulk; the list form is marked
        stale and only materialized on demand."""
        self._Abulk = Abulk
        self._stale_list_range = (a, b)

    def _materialize_list(self):
        """Write the stacked bulk back into the per-site list."""
        rng = getattr(self, "_stale_list_range", None)
        if rng is not None and self._Abulk is not None:
            a, b = rng
            for k in range(b - a):
                self._A[a + k] = self._Abulk[k]
            self._stale_list_range = None

    def _right_canonize_all(self):
        """Bring all sites into right-canonical form (B-form); the
        uniform bulk is one fused scan."""
        a, b = self._uniform_bulk_range()
        use_fused = self.fused and (b - a) >= 10
        i = self.L - 1
        if use_fused:
            self._materialize_list()
            # per-site from the right edge down to the last bulk site
            while i >= b:
                self._A[i - 1], self._A[i] = _right_canonize_step(
                    self._A[i - 1], self._A[i]
                )
                i -= 1
            # fused over the bulk: canonizes sites a+1..b-1, carry
            # becomes the updated site-a tensor
            Abulk, _ = self._get_bulk_stacks(a, b)
            carry, newAs = _bulk_canonize_right(
                Abulk[-1], Abulk[:-1]
            )
            Abulk = jnp.concatenate(
                [carry[None], newAs], axis=0
            )
            self._set_bulk_stack(a, b, Abulk)
            self._materialize_list()
            i = a
        while i > 0:
            self._A[i - 1], self._A[i] = _right_canonize_step(
                self._A[i - 1], self._A[i]
            )
            i -= 1
        a0 = self._A[0]
        self._A[0] = a0 / jnp.linalg.norm(jnp.reshape(a0, (-1,)))
        if use_fused:
            # refresh the stacked form from the (possibly edge-updated)
            # list
            self._stack_key = None

    def _build_right_envs(self, return_bulk_stack=False):
        """All right environments: renv[j] = contraction of sites >= j.
        The uniform bulk segment is one fused scan; optionally the bulk
        segment is returned stacked (for the fused sweep)."""
        dtype = self._A[0].dtype
        L = self.L
        renv = [None] * (L + 1)
        renv[L] = jnp.ones((1, 1, 1), dtype=dtype)
        a, b = self._uniform_bulk_range()
        use_fused = self.fused and (b - a) >= 10
        renv_bulk = None
        j = L - 1
        while j >= 0:
            if use_fused and j == b - 1:
                Abulk, Wbulk = self._get_bulk_stacks(a, b)
                _, renv_bulk = _bulk_env_left(
                    renv[j + 1], Abulk, Wbulk
                )
                renv_bulk = self._put_env(renv_bulk)
                if not return_bulk_stack:
                    for k in range(a, j + 1):
                        renv[k] = renv_bulk[k - a]
                else:
                    # the head's per-site steps reach into the first
                    # couple of bulk environments
                    renv[a] = renv_bulk[0]
                    if b - a > 1:
                        renv[a + 1] = renv_bulk[1]
                    if b - a > 2:
                        renv[a + 2] = renv_bulk[2]
                j = a - 1
            else:
                A = self._A[j]
                renv[j] = _env_step_left(
                    renv[j + 1], jnp.conj(A), self._W[j], A
                )
                j -= 1
        if return_bulk_stack:
            return renv, renv_bulk, (a, b)
        return renv

    def _build_left_envs(self, return_bulk_stack=False):
        """All left environments: lenv[j] = contraction of sites < j.
        Mirror of :meth:`_build_right_envs` for the fused left
        sweep."""
        dtype = self._A[0].dtype
        L = self.L
        lenv = [None] * (L + 1)
        lenv[0] = jnp.ones((1, 1, 1), dtype=dtype)
        a, b = self._uniform_bulk_range()
        use_fused = self.fused and (b - a) >= 10
        lenv_bulk = None
        j = 0
        while j < L:
            if use_fused and j == a:
                Abulk, Wbulk = self._get_bulk_stacks(a, b)
                _, lenv_bulk = _bulk_env_right_stack(
                    lenv[a], Abulk, Wbulk
                )
                lenv_bulk = self._put_env(lenv_bulk)
                if not return_bulk_stack:
                    for k in range(a + 1, b + 1):
                        lenv[k] = lenv_bulk[k - a - 1]
                else:
                    # the tail's per-site steps reach into the last
                    # couple of bulk environments
                    lenv[b] = lenv_bulk[b - a - 1]
                    if b - a > 1:
                        lenv[b - 1] = lenv_bulk[b - a - 2]
                    if b - a > 2:
                        lenv[b - 2] = lenv_bulk[b - a - 3]
                j = b
            else:
                A = self._A[j]
                lenv[j + 1] = _env_step_right(
                    lenv[j], jnp.conj(A), self._W[j], A
                )
                j += 1
        if return_bulk_stack:
            return lenv, lenv_bulk, (a, b)
        return lenv

    def _sweep_right(self, max_bond, cutoff, verbosity=0):
        split_method = self.opts["bond_compress_method"]
        if split_method == "svd:sub" and not (
            cutoff and float(cutoff) > 0.0
        ):
            # no cutoff masking requested: the pure subspace split
            # (no Rayleigh-Ritz rotation) is sufficient and cheapest
            split_method = "svd:sub0"
        ncv = max(self.opts["local_eig_ncv"] * 2,
                  self.opts.get("local_eig_ncv_floor", 8))
        restarts = self.opts["local_eig_restarts"]
        dtype = self._A[0].dtype
        mbd = max_bond if max_bond is not None else -1
        a, b = self._uniform_bulk_range()
        bulk_shape = self._A[a].shape if a < b else None
        use_fused = (
            self.fused and self.bsz == 2 and (b - a) >= 12
            and bulk_shape is not None and bulk_shape[0] == mbd
        )
        if use_fused:
            renv, renv_bulk, (a, b) = self._build_right_envs(
                return_bulk_stack=True
            )
        else:
            renv = self._build_right_envs()
            renv_bulk = None
        self._materialize_list()

        lenv = jnp.ones((1, 1, 1), dtype=dtype)
        energies = []
        i = 0
        while i <= self.L - self.bsz:
            if (
                use_fused and a <= i and i + 1 < b
                and self._A[i].shape == bulk_shape
            ):
                # the fused run covers sites i .. b-2 provided the
                # needed renvs (which live at i+2 .. b) are bulk-shaped:
                # stop two short of the bulk end
                n = (b - 1) - i - 1
                if n >= 8:
                    Abulk, Wbulk = self._get_bulk_stacks(a, b)
                    o = i - a
                    W1s = Wbulk[o:o + n]
                    W2s = Wbulk[o + 1:o + n + 1]
                    Anexts = Abulk[o + 1:o + n + 1]
                    renvs = renv_bulk[o + 2:o + n + 2]
                    rdtype = jnp.zeros((), dtype).real.dtype
                    lenv, Alast, N1s, ens = _bulk_sweep_right(
                        lenv, self._A[i], Anexts, W1s, W2s, renvs,
                        jnp.asarray(cutoff, dtype=rdtype),
                        ncv=ncv, restarts=restarts, max_bond=mbd,
                        method=split_method,
                        norm_energy=self._norm_energy,
                    )
                    # keep the new bulk stacked; only the two tensors
                    # at the seam need list form
                    Abulk = Abulk.at[o:o + n].set(N1s)
                    Abulk = Abulk.at[o + n].set(Alast)
                    self._set_bulk_stack(a, b, Abulk)
                    self._A[i + n] = Alast
                    self._last_bulk_ens = ens
                    energies.append(ens[-1])
                    i += n
                    self._materialize_list()
                    continue
            if self.bsz == 2:
                A1, A2 = self._A[i], self._A[i + 1]
                theta0 = jnp.einsum("kpc,cqr->kpqr", A1, A2)
                en, theta = _local_solve_2site(
                    lenv, self._W[i], self._W[i + 1], renv[i + 2],
                    theta0, ncv=ncv, restarts=restarts,
                    norm_energy=self._norm_energy,
                )
                N1, N2, rank = _split_2site(
                    theta, max_bond=max_bond, cutoff=cutoff,
                    absorb="right", method=split_method,
                )
                self._A[i], self._A[i + 1] = N1, N2
                lenv = _env_step_right(
                    lenv, jnp.conj(N1), self._W[i], N1
                )
                if self._Abulk is not None and a <= i < b:
                    self._stack_key = None
                    self._Abulk = None
            else:
                A1 = self._A[i]
                en, theta = _local_solve_1site(
                    lenv, self._W[i], renv[i + 1], A1,
                    ncv=ncv, restarts=restarts,
                    norm_energy=self._norm_energy,
                )
                if i < self.L - 1:
                    l, p, r = theta.shape
                    Q, _, Rf = decomp.qr_stabilized(
                        jnp.reshape(theta, (l * p, r))
                    )
                    self._A[i] = jnp.reshape(Q, (l, p, Q.shape[-1]))
                    self._A[i + 1] = jnp.einsum(
                        "ck,kpr->cpr", Rf, self._A[i + 1]
                    )
                else:
                    self._A[i] = theta
                lenv = _env_step_right(
                    lenv, jnp.conj(self._A[i]), self._W[i], self._A[i]
                )
            energies.append(en)
            i += 1
        self.local_energies.append(energies)
        return float(np.real(energies[-1]))

    def _sweep_left(self, max_bond, cutoff, verbosity=0):
        split_method = self.opts["bond_compress_method"]
        if split_method == "svd:sub" and not (
            cutoff and float(cutoff) > 0.0
        ):
            # no cutoff masking requested: the pure subspace split
            # (no Rayleigh-Ritz rotation) is sufficient and cheapest
            split_method = "svd:sub0"
        ncv = max(self.opts["local_eig_ncv"] * 2,
                  self.opts.get("local_eig_ncv_floor", 8))
        restarts = self.opts["local_eig_restarts"]
        dtype = self._A[0].dtype
        mbd = max_bond if max_bond is not None else -1
        a, b = self._uniform_bulk_range()
        bulk_shape = self._A[a].shape if a < b else None
        use_fused = (
            self.fused and self.bsz == 2 and (b - a) >= 12
            and bulk_shape is not None and bulk_shape[2] == mbd
        )
        if use_fused:
            lenvs, lenv_bulk, (a, b) = self._build_left_envs(
                return_bulk_stack=True
            )
        else:
            lenvs = self._build_left_envs()
            lenv_bulk = None
        self._materialize_list()

        renv = jnp.ones((1, 1, 1), dtype=dtype)
        energies = []
        i = self.L - self.bsz
        while i >= 0:
            if (
                use_fused and a + 1 <= i and i + 1 < b
                and self._A[i + 1].shape == bulk_shape
            ):
                # fused run covers updates at positions i down to a+1
                # (each needs lenv[j] with j >= a+1, which live in the
                # bulk stack)
                n = i - a
                if n >= 8:
                    Abulk, Wbulk = self._get_bulk_stacks(a, b)
                    o = i - a
                    # scan order: position i first, a+1 last
                    W1s = jnp.flip(Wbulk[1:o + 1], axis=0)
                    W2s = jnp.flip(Wbulk[2:o + 2], axis=0)
                    Aprevs = jnp.flip(Abulk[1:o + 1], axis=0)
                    lenvs_in = jnp.flip(lenv_bulk[0:o], axis=0)
                    rdtype = jnp.zeros((), dtype).real.dtype
                    renv, Afirst, N2s, ens = _bulk_sweep_left(
                        renv, self._A[i + 1], Aprevs, W1s, W2s,
                        lenvs_in, jnp.asarray(cutoff, dtype=rdtype),
                        ncv=ncv, restarts=restarts, max_bond=mbd,
                        method=split_method,
                        norm_energy=self._norm_energy,
                    )
                    # emitted right tensors sit at positions i+1 down
                    # to a+2; the carried tensor at a+1
                    Abulk = Abulk.at[2:o + 2].set(
                        jnp.flip(N2s, axis=0)
                    )
                    Abulk = Abulk.at[1].set(Afirst)
                    self._set_bulk_stack(a, b, Abulk)
                    self._A[a + 1] = Afirst
                    self._last_bulk_ens = ens
                    energies.append(ens[-1])
                    i = a
                    self._materialize_list()
                    continue
            if self.bsz == 2:
                A1, A2 = self._A[i], self._A[i + 1]
                theta0 = jnp.einsum("kpc,cqr->kpqr", A1, A2)
                en, theta = _local_solve_2site(
                    lenvs[i], self._W[i], self._W[i + 1], renv,
                    theta0, ncv=ncv, restarts=restarts,
                    norm_energy=self._norm_energy,
                )
                N1, N2, rank = _split_2site(
                    theta, max_bond=max_bond, cutoff=cutoff,
                    absorb="left", method=split_method,
                )
                self._A[i], self._A[i + 1] = N1, N2
                renv = _env_step_left(
                    renv, jnp.conj(N2), self._W[i + 1], N2
                )
                if self._Abulk is not None and a <= i < b:
                    self._stack_key = None
                    self._Abulk = None
            else:
                A1 = self._A[i]
                en, theta = _local_solve_1site(
                    lenvs[i], self._W[i], renv, A1,
                    ncv=ncv, restarts=restarts,
                    norm_energy=self._norm_energy,
                )
                if i > 0:
                    l, p, r = theta.shape
                    Lf, _, Q = decomp.lq_stabilized(
                        jnp.reshape(theta, (l, p * r))
                    )
                    self._A[i] = jnp.reshape(Q, (Q.shape[0], p, r))
                    self._A[i - 1] = jnp.einsum(
                        "kpr,rc->kpc", self._A[i - 1], Lf
                    )
                else:
                    self._A[i] = theta
                renv = _env_step_left(
                    renv, jnp.conj(self._A[i]), self._W[i], self._A[i]
                )
            energies.append(en)
            i -= 1
        self.local_energies.append(energies)
        return float(np.real(energies[-1]))

    def sweep(self, direction, max_bond=None, cutoff=1e-9, canonize=True,
              verbosity=0):
        """One full sweep (reference ``DMRG.sweep`` dmrg.py:885)."""
        if self._cyc is not None:
            ncv = max(2 * self.opts["local_eig_ncv"],
                      self.opts["local_eig_ncv_floor"])
            return self._cyc.sweep(
                direction, max_bond=max_bond, cutoff=cutoff, ncv=ncv,
                restarts=max(self.opts["local_eig_restarts"], 2),
                method=self.opts["bond_compress_method"],
            )
        if canonize and direction == "R":
            self._right_canonize_all()
        if direction == "R":
            return self._sweep_right(max_bond, cutoff, verbosity)
        elif direction == "L":
            return self._sweep_left(max_bond, cutoff, verbosity)
        raise ValueError(f"bad direction {direction}")

    def solve(
        self, tol=1e-4, bond_dims=None, cutoffs=None, sweep_sequence=None,
        max_sweeps=10, verbosity=0, suppress_warnings=True,
    ):
        """Sweep to convergence (reference ``DMRG.solve`` dmrg.py:1033).
        Returns whether converged."""
        if bond_dims is not None:
            self._set_bond_dim_seq(bond_dims)
        if cutoffs is not None:
            self._set_cutoff_seq(cutoffs)
        if sweep_sequence is None:
            sweep_sequence = self.opts["default_sweep_sequence"]

        RLs = itertools.cycle(sweep_sequence)
        previous_LR = "0"

        for s in range(max_sweeps):
            LR = next(RLs)
            max_bond = next(self._bond_dims)
            cutoff = next(self._cutoffs)
            # canonize if starting a fresh right sweep after right sweep
            canonize = not (LR + previous_LR in {"RL", "LR"})
            en = self.sweep(
                LR, max_bond=max_bond, cutoff=cutoff, canonize=canonize,
                verbosity=verbosity,
            )
            self.energies.append(en)
            if verbosity:
                print(
                    f"sweep {s + 1} ({LR}): max_bond={max_bond}, "
                    f"energy={en}"
                )
            previous_LR = LR
            if len(self.energies) > 1:
                if abs(self.energies[-2] - self.energies[-1]) < tol:
                    return True
        return False


class DMRG1(DMRG):
    """Single-site DMRG (reference dmrg.py:1147)."""

    def __init__(self, ham, which="SA", bond_dims=None, cutoffs=1e-8,
                 p0=None, **kwargs):
        super().__init__(
            ham, bond_dims=bond_dims if bond_dims is not None else 8,
            cutoffs=cutoffs, bsz=1, which=which, p0=p0, **kwargs,
        )


class DMRG2(DMRG):
    """Two-site DMRG (reference dmrg.py:1166)."""

    def __init__(self, ham, which="SA", bond_dims=None, cutoffs=1e-8,
                 p0=None, **kwargs):
        super().__init__(
            ham, bond_dims=bond_dims if bond_dims is not None else 8,
            cutoffs=cutoffs, bsz=2, which=which, p0=p0, **kwargs,
        )


class DMRGX(DMRG):
    """DMRG-X: target the eigenstate with maximum overlap with the
    initial (product) state — for MBL interior eigenstates
    (reference ``DMRGX`` dmrg.py:1190). Uses dense local eigensolves +
    overlap tracking."""

    def __init__(self, ham, p0, bond_dims, cutoffs=1e-8, bsz=2):
        super().__init__(ham, bond_dims=bond_dims, cutoffs=cutoffs,
                         bsz=bsz, p0=p0)

    def _local_solve_dense_overlap(self, lenv, Ws, renv, theta0):
        """Dense local eigensolve; pick eigenvector with max overlap
        with current theta (the DMRG-X selection rule)."""
        shape = theta0.shape
        if len(Ws) == 2:
            LW1 = _fuse_lw(lenv, Ws[0])
            W2R = _fuse_wr(Ws[1], renv)
            mv = lambda th: _heff_matvec_2site(LW1, W2R, th)
        else:
            LW = _fuse_lw(lenv, Ws[0])
            mv = lambda th: _heff_matvec_1site(LW, renv, th)
        n = int(np.prod(shape))
        # build dense matrix column by column (small local dims only)
        eye = jnp.eye(n, dtype=theta0.dtype)
        cols = jax.vmap(
            lambda e: jnp.reshape(mv(jnp.reshape(e, shape)), (n,))
        )(eye)
        H = jnp.transpose(cols)
        w, V = jnp.linalg.eigh(H)
        overlaps = jnp.abs(
            jnp.conj(V.T) @ jnp.reshape(theta0, (n,))
        ) ** 2
        best = jnp.argmax(overlaps)
        return w[best], jnp.reshape(V[:, best], shape)

    def _sweep_right(self, max_bond, cutoff, verbosity=0):
        renv = self._build_right_envs()
        dtype = self._A[0].dtype
        lenv = jnp.ones((1, 1, 1), dtype=dtype)
        energies = []
        for i in range(self.L - self.bsz + 1):
            if self.bsz == 2:
                A1, A2 = self._A[i], self._A[i + 1]
                theta0 = jnp.einsum("kpc,cqr->kpqr", A1, A2)
                en, theta = self._local_solve_dense_overlap(
                    lenv, (self._W[i], self._W[i + 1]), renv[i + 2],
                    theta0,
                )
                N1, N2, _ = _split_2site(
                    theta, max_bond=max_bond, cutoff=cutoff,
                    absorb="right",
                )
                self._A[i], self._A[i + 1] = N1, N2
                lenv = _env_step_right(lenv, jnp.conj(N1), self._W[i], N1)
            else:
                A1 = self._A[i]
                en, theta = self._local_solve_dense_overlap(
                    lenv, (self._W[i],), renv[i + 1], A1
                )
                if i < self.L - 1:
                    l, p, r = theta.shape
                    Q, _, Rf = decomp.qr_stabilized(
                        jnp.reshape(theta, (l * p, r))
                    )
                    self._A[i] = jnp.reshape(Q, (l, p, Q.shape[-1]))
                    self._A[i + 1] = jnp.einsum(
                        "ck,kpr->cpr", Rf, self._A[i + 1]
                    )
                else:
                    self._A[i] = theta
                lenv = _env_step_right(
                    lenv, jnp.conj(self._A[i]), self._W[i], self._A[i]
                )
            energies.append(en)
            i += 1
        self.local_energies.append(energies)
        return float(np.real(energies[-1]))

    def _sweep_left(self, max_bond, cutoff, verbosity=0):
        # simple strategy: right-canonize then sweep right again
        self._right_canonize_all()
        return self._sweep_right(max_bond, cutoff, verbosity)


# ---------------------------------------------------------------------------
# DMRG / MovingEnvironment parity extras (reference dmrg.py:278-991)
# ---------------------------------------------------------------------------

def _me_site_tag(self, i):
    return self.tn.site_tag(i % self.L)


def _me_init_segment(self, begin, start, stop):
    """(Re)initialize the environments so sweeping can start from the
    ``begin`` side of ``range(start, stop)`` (reference
    ``init_segment`` dmrg.py:281 — open boundaries only here, so the
    full set of environments is rebuilt)."""
    self.begin = begin
    self.init_environments()
    return self


def _me_init_non_segment(self, start, stop):
    """Prepare the environment outside ``range(start, stop)``
    (reference ``init_non_segment`` dmrg.py:324). With open boundaries
    there is nothing to compress — dummy end pieces are implicit."""
    return self


MovingEnvironment.site_tag = _me_site_tag
MovingEnvironment.init_segment = _me_init_segment
MovingEnvironment.init_non_segment = _me_init_non_segment


def _dmrg_sweep_right(self, canonize=True, verbosity=0, **update_opts):
    """One left-to-right sweep (reference ``sweep_right``
    dmrg.py:983)."""
    return self.sweep(
        "R", max_bond=next(self._bond_dims),
        cutoff=next(self._cutoffs), canonize=canonize,
        verbosity=verbosity,
    )


def _dmrg_sweep_left(self, canonize=True, verbosity=0, **update_opts):
    """One right-to-left sweep (reference ``sweep_left``
    dmrg.py:991)."""
    return self.sweep(
        "L", max_bond=next(self._bond_dims),
        cutoff=next(self._cutoffs), canonize=canonize,
        verbosity=verbosity,
    )


def _dmrg_form_local_ops(self, i):
    """The dense effective Hamiltonian of the ``bsz``-site block at
    ``i`` (reference ``form_local_ops`` dmrg.py:681) — a diagnostic
    built from the current uniform arrays with the same jitted
    environment kernels the sweeps use."""
    L = self.L
    lenv = jnp.ones((1, 1, 1), dtype=self._A[0].dtype)
    for j in range(i):
        lenv = _env_step_right(lenv, jnp.conj(self._A[j]),
                               self._W[j], self._A[j])
    renv = jnp.ones((1, 1, 1), dtype=self._A[0].dtype)
    for j in range(L - 1, i + self.bsz - 1, -1):
        renv = _env_step_left(renv, jnp.conj(self._A[j]),
                              self._W[j], self._A[j])
    if self.bsz == 2:
        LW1 = _fuse_lw(lenv, self._W[i])
        W2R = _fuse_wr(self._W[i + 1], renv)
        dl = self._A[i].shape[0]
        dr = self._A[i + 1].shape[2]
        d = self.phys_dim
        dim = dl * d * d * dr

        def mv(x):
            th = jnp.reshape(x, (dl, d, d, dr))
            return jnp.reshape(
                _heff_matvec_2site(LW1, W2R, th), (dim,)
            )
    else:
        dl = self._A[i].shape[0]
        dr = self._A[i].shape[2]
        d = self.phys_dim
        dim = dl * d * dr

        LW = _fuse_lw(lenv, self._W[i])

        def mv(x):
            th = jnp.reshape(x, (dl, d, dr))
            return jnp.reshape(
                _heff_matvec_1site(LW, renv, th), (dim,)
            )
    Heff = jax.vmap(mv, in_axes=1, out_axes=1)(
        jnp.eye(dim, dtype=self._A[0].dtype)
    )
    return Heff


def _dmrg_print_energy_info(self, Heff=None, loc_gs=None):
    """Print diagnostic energies (reference ``print_energy_info``
    dmrg.py:647)."""
    sweep_num = len(self.energies) + 1
    psi = self.state
    full_en = complex(
        (psi.H @ (self.ham.apply(psi))) / (psi.H @ psi)
    ).real
    if Heff is not None and loc_gs is not None:
        v = jnp.reshape(jnp.asarray(loc_gs), (-1,))
        site_en = complex(jnp.vdot(v, Heff @ v)).real
    else:
        site_en = "N/A"
    print(f"Sweep {sweep_num} -- fullE={full_en} siteE={site_en}")


def _dmrg_print_norm_info(self, i=None):
    """Print diagnostic norms (reference ``print_norm_info``
    dmrg.py:662)."""
    sweep_num = len(self.energies) + 1
    psi = self.state
    full_n = complex(psi.H @ psi).real
    if i is None:
        site_norm = [
            float(jnp.real(jnp.vdot(a, a))) for a in self._A
        ]
    else:
        site_norm = float(jnp.real(jnp.vdot(self._A[i], self._A[i])))
    print(f"Sweep {sweep_num} -- fullN={full_n} siteN={site_norm}")


def _dmrg_post_check(self, i, Neff, loc_gs, loc_en, loc_gs_old):
    """Sanity checks after a local solve (reference ``post_check``
    dmrg.py:734). Open-boundary sweeps keep exact orthogonality, so
    only the cyclic pseudo-orthogonal corrections of the reference are
    relevant — and cyclic Hamiltonians are converted to exact OBC form
    up front here, making this a pass-through."""
    return loc_en, loc_gs


DMRG.sweep_right = _dmrg_sweep_right
DMRG.sweep_left = _dmrg_sweep_left
DMRG.form_local_ops = _dmrg_form_local_ops
DMRG.print_energy_info = _dmrg_print_energy_info
DMRG.print_norm_info = _dmrg_print_norm_info
DMRG.post_check = _dmrg_post_check
