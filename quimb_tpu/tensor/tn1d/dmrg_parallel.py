"""Segment-parallel DMRG sweeps (real-space parallel DMRG, batched).

The standard 2-site sweep is a serial chain of ~L small solves; at the
north-star config (L=128, chi=256) each ~8 ms serial step does only
~1.3 GFLOP, capping the sweep near 10% of the chip's matmul ceiling
(docs/performance.md). This module implements the real-space parallel
decomposition of Stoudenmire & White (arXiv:1301.3494) re-designed for
one TPU chip: the chain is split into S segments which are swept
*simultaneously* as one batched XLA program — every Lanczos matvec,
split and environment absorption becomes an S-fold batched deep-K
matmul, amortizing the per-step dispatch/serial latency across
segments.

One outer sweep:

1. a reverse ``lax.scan``: LQ-canonize the whole stack (right-
   canonical B-form) while building every right H-environment;
2. a forward ``lax.scan``: QR-canonize (A-form) while building every
   left H-environment — together these give, for EVERY segment
   boundary, environments in an exactly mixed-canonical gauge of one
   consistent global state (no whitening, no norm inverses anywhere —
   a brickwork-Jacobi variant in whitened gauge was built first and
   diverges: its ``N^(-1/2)`` factors amplify noise by 1/lambda_min);
3. ``inner_passes`` batched right+left sweeps within all segments at
   once, boundary environments FROZEN (each segment solves a
   well-posed fixed-boundary variational problem — the parallel phase
   cannot feed back within itself, which is what made naive Jacobi
   brickwork diverge);
4. write-back. Segment offsets alternate by half a segment every
   outer sweep so boundary bonds are interior on alternating sweeps.

Used as the steady-state production loop once ordinary ``DMRG2``
sweeps have converged the state; each outer sweep applies
``inner_passes`` full updates of every interior bond.

Reference counterpart: the serial engine (tensor_dmrg.py:1026); the
reference has no parallel-sweep machinery — this is TPU-native design
following the published real-space-parallel algorithm.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import decomp
from ...ops.backend import to_device
from .dmrg import _env_step_left, _env_step_right
from .dmrg_jacobi import (
    _batched_matvec,
    _batched_tridiag_eigvec,
    mpo_to_padded_stack,
    mps_to_stack,
    stack_to_mps,
)


# ---------------------------------------------------------------------------
# outer-phase scans: canonize + environment stacks
# ---------------------------------------------------------------------------


@jax.jit
def _canonize_right_and_renvs(Ms, Ws):
    """Reverse scan: right-canonize (LQ) every site while absorbing it
    into the right H-environment. Returns (Bstack, renvs) where
    ``renvs[j]`` is the environment of sites > j-1 i.e. including j
    (so the env *right of* bond (j-1, j)); and the leftover left
    gauge (absorbed norm) is dropped (state normalized)."""
    L, chi, d, _ = Ms.shape
    w = Ws.shape[1]
    renv0 = jnp.zeros((chi, w, chi), Ms.dtype).at[0, 0, 0].set(1.0)

    def body(carry, x):
        R, renv = carry
        Mj, Wj = x
        # absorb pending right gauge
        Mj = jnp.einsum("kdc,cr->kdr", Mj, R)
        # LQ: Mj = Lf @ Q with Q (k', d*chi) row-orthonormal
        mat = jnp.reshape(Mj, (chi, d * chi))
        Lf, _, Q = decomp.lq_stabilized(mat)
        Bj = jnp.reshape(Q, (chi, d, chi))
        renv = _env_step_left(renv, jnp.conj(Bj), Wj, Bj)
        return (Lf, renv), (Bj, renv)

    eyeR = jnp.eye(chi, dtype=Ms.dtype)
    (_, _), (Bstack, renvs) = jax.lax.scan(
        body, (eyeR, renv0), (Ms, Ws), reverse=True
    )
    return Bstack, renvs


@jax.jit
def _lenvs_and_norms(Bstack, Ws):
    """Forward scan over the B-stack: left H-environments and left
    *norm* environments of every prefix (no factorizations — the
    left-of-segment parts are whitened at the seams instead of
    canonized, so this scan is pure matmul work)."""
    L, chi, d, _ = Bstack.shape
    w = Ws.shape[1]
    lenv0 = jnp.zeros((chi, w, chi), Bstack.dtype).at[0, 0, 0].set(1.0)
    nl0 = jnp.zeros((chi, chi), Bstack.dtype).at[0, 0].set(1.0)

    def body(carry, x):
        lenv, NL = carry
        Bj, Wj = x
        lenv = _env_step_right(lenv, jnp.conj(Bj), Wj, Bj)
        T = jnp.einsum("ak,kdx->adx", NL, Bj)
        NL = jnp.einsum("adx,ady->yx", T, jnp.conj(Bj))
        return (lenv, NL), (lenv, NL)

    (_, _), (lenvs, NLs) = jax.lax.scan(
        body, (lenv0, nl0), (Bstack, Ws)
    )
    return lenvs, NLs


# ---------------------------------------------------------------------------
# batched (over segments) inner sweeps with frozen boundary envs
# ---------------------------------------------------------------------------


def _batched_solve_2site(Lb, W1, W2, Rb, th0, ncv):
    """Batched restarted-Lanczos smallest eigenpair of the 2-site
    effective Hamiltonian. th0 (S, chi, d, d, chi)."""
    S_, chi, d, _, _ = th0.shape
    rdt = th0.real.dtype
    LW1 = jnp.einsum("nawk,nwxup->naxupk", Lb, W1)
    W2R = jnp.einsum("nxyvq,nbyr->nxvqbr", W2, Rb)
    n = chi * d * d * chi
    v = jnp.reshape(th0, (S_, n))
    v = v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
    )
    V = jnp.zeros((S_, ncv, n), v.dtype).at[:, 0].set(v)
    alpha = jnp.zeros((S_, ncv), rdt)
    beta = jnp.zeros((S_, ncv), rdt)

    def body(j, carry):
        V, alpha, beta = carry
        vj = V[:, j]
        hv = _batched_matvec(
            LW1, W2R, jnp.reshape(vj, (S_, chi, d, d, chi))
        )
        hv = jnp.reshape(hv, (S_, n))
        a = jnp.real(jnp.sum(jnp.conj(vj) * hv, axis=-1))
        alpha = alpha.at[:, j].set(a)
        for _ in range(2):
            proj = jnp.einsum("nkx,nx->nk", jnp.conj(V), hv)
            hv = hv - jnp.einsum("nkx,nk->nx", V, proj)
        b = jnp.linalg.norm(hv, axis=-1)
        beta = beta.at[:, j].set(b.astype(rdt))
        wnext = jnp.where((b > 1e-30)[:, None], hv / b[:, None], hv)
        V = jax.lax.cond(
            j + 1 < ncv,
            lambda V: V.at[:, j + 1].set(wnext),
            lambda V: V,
            V,
        )
        return V, alpha, beta

    V, alpha, beta = jax.lax.fori_loop(0, ncv, body, (V, alpha, beta))
    ens, coeff = _batched_tridiag_eigvec(alpha, beta)
    th = jnp.einsum("nk,nkx->nx", coeff.astype(V.dtype), V)
    th = th / jnp.maximum(
        jnp.linalg.norm(th, axis=-1, keepdims=True), 1e-30
    )
    return ens, jnp.reshape(th, th0.shape)


def _batched_split_2site(th, max_bond, absorb, oversample=8,
                         power_iters=2):
    """Batched rank-``max_bond`` orthogonal split of th
    (S, chi, d, d, chi) -> (A1 (S,chi,d,k), A2 (S,k,d,chi)). The
    discarded-side factor carries the rest (absorb 'right': A1
    isometric)."""
    S_, chi, d, _, _ = th.shape
    rdt = th.real.dtype
    mat = jnp.reshape(th, (S_, chi * d, d * chi))
    if absorb == "right":
        G = jnp.einsum("nij,nkj->nik", mat, jnp.conj(mat))
    else:
        G = jnp.einsum("nji,njk->nik", jnp.conj(mat), mat)
    kp = min(max_bond + oversample, chi * d)
    key = jax.random.PRNGKey(23)
    Om = jnp.tile(
        jax.random.normal(key, (chi * d, kp), rdt).astype(mat.dtype),
        (S_, 1, 1),
    )
    Q = Om
    for _ in range(max(power_iters, 1)):
        Y = jnp.einsum("nik,nkj->nij", G, Q)
        Q, _ = decomp.safe_qr(Y)
    if kp > max_bond:
        # small Rayleigh-Ritz rotation to order the directions
        if absorb == "right":
            B = jnp.einsum("nki,nkj->nij", jnp.conj(Q), mat)
            M = jnp.einsum("nij,nkj->nik", B, jnp.conj(B))
        else:
            B = jnp.einsum("nij,njk->nik", mat, Q)      # (S, chid, k)
            M = jnp.einsum("nji,njk->nik", jnp.conj(B), B)
        _, Rot = decomp.safe_eigh(M)
        Q = jnp.einsum(
            "nik,nkj->nij", Q, Rot[..., :, ::-1][..., :, :max_bond]
        )
    U = Q
    if absorb == "right":
        # A1 = U (isometric), A2 = U† mat
        P = jnp.einsum("nki,nkj->nij", jnp.conj(U), mat)
        A1 = jnp.reshape(U, (S_, chi, d, max_bond))
        A2 = jnp.reshape(P, (S_, max_bond, d, chi))
    else:
        # A2 = U† (row-isometric), A1 = mat U
        P = jnp.einsum("nij,njk->nik", mat, U)
        A1 = jnp.reshape(P, (S_, chi, d, max_bond))
        A2 = jnp.reshape(
            jnp.conj(jnp.swapaxes(U, -2, -1)), (S_, max_bond, d, chi)
        )
    return A1, A2


@functools.partial(
    jax.jit,
    static_argnames=("m", "ncv", "max_bond", "inner_passes"),
)
def _segment_inner(seg_M0, seg_Ms, seg_W, lenv_b, renv_b, m, ncv,
                   max_bond, inner_passes):
    """Batched fixed-boundary DMRG on S segments of length ``m``.

    seg_M0: (S, chi, d, chi) the first site tensor (carries the
    center gauge); seg_Ms: (S, m-1, chi, d, chi) remaining site
    tensors (right-canonical); seg_W: (S, m, w, w, d, d);
    lenv_b/renv_b: frozen boundary envs (S, chi, w, chi).

    Runs ``inner_passes`` right+left sweeps; returns updated
    (seg_M0, seg_Ms, last bond energies)."""

    venv_right = jax.vmap(_env_step_right)
    venv_left = jax.vmap(_env_step_left)

    def right_sweep(M0, Mrest):
        # right-envs inside the segment from current (right-canonical)
        # tensors
        def renv_body(renv, x):
            Mj, Wj = x
            return venv_left(renv, jnp.conj(Mj), Wj, Mj), renv

        # scan over sites m-1..1 (reverse): stacked renvs aligned with
        # bonds: renv_at[j] = env right of site j
        _, renv_stack = jax.lax.scan(
            renv_body, renv_b,
            (jnp.swapaxes(Mrest, 0, 1), jnp.swapaxes(seg_W[:, 1:], 0, 1)),
            reverse=True,
        )

        def body(carry, x):
            lenv, Mcur = carry
            Mnext, W1, W2, renv = x
            th0 = jnp.einsum("nkpc,ncqr->nkpqr", Mcur, Mnext)
            en, th = _batched_solve_2site(lenv, W1, W2, renv, th0, ncv)
            A1, A2 = _batched_split_2site(
                th, max_bond=max_bond, absorb="right"
            )
            lenv = venv_right(lenv, jnp.conj(A1), W1, A1)
            return (lenv, A2), (A1, en)

        (lenv, Mlast), (A1s, ens) = jax.lax.scan(
            body, (lenv_b, M0),
            (
                jnp.swapaxes(Mrest, 0, 1),
                jnp.swapaxes(seg_W[:, :-1], 0, 1),
                jnp.swapaxes(seg_W[:, 1:], 0, 1),
                renv_stack,
            ),
        )
        return jnp.swapaxes(A1s, 0, 1), Mlast, ens

    def left_sweep(Arest, Mlast):
        # left-envs inside the segment from current (left-canonical)
        def lenv_body(lenv, x):
            Aj, Wj = x
            return venv_right(lenv, jnp.conj(Aj), Wj, Aj), lenv

        _, lenv_stack = jax.lax.scan(
            lenv_body, lenv_b,
            (jnp.swapaxes(Arest, 0, 1),
             jnp.swapaxes(seg_W[:, :-1], 0, 1)),
        )

        def body(carry, x):
            renv, Mcur = carry
            Aprev, W1, W2, lenv = x
            th0 = jnp.einsum("nkpc,ncqr->nkpqr", Aprev, Mcur)
            en, th = _batched_solve_2site(lenv, W1, W2, renv, th0, ncv)
            A1, A2 = _batched_split_2site(
                th, max_bond=max_bond, absorb="left"
            )
            renv = venv_left(renv, jnp.conj(A2), W2, A2)
            return (renv, A1), (A2, en)

        (renv, Mfirst), (A2s, ens) = jax.lax.scan(
            body, (renv_b, Mlast),
            (
                jnp.swapaxes(Arest, 0, 1)[::-1],
                jnp.swapaxes(seg_W[:, :-1], 0, 1)[::-1],
                jnp.swapaxes(seg_W[:, 1:], 0, 1)[::-1],
                lenv_stack[::-1],
            ),
        )
        return Mfirst, jnp.swapaxes(A2s, 0, 1)[:, ::-1], ens

    M0, Mrest = seg_M0, seg_Ms
    ens = None
    for _ in range(inner_passes):
        Arest, Mlast, _ = right_sweep(M0, Mrest)
        M0, Brest, ens = left_sweep(Arest, Mlast)
        Mrest = Brest
    return M0, Mrest, ens


@functools.partial(
    jax.jit,
    static_argnames=("starts", "m", "ncv", "max_bond", "inner_passes"),
)
def _parallel_outer_sweep(Ms, Ws, starts, m, ncv, max_bond,
                          inner_passes):
    """One full outer sweep as one compiled program: canonize/env
    scans, seam whitening, batched inner passes, un-whitening and
    write-back. Returns (new stack, bond energies)."""
    from .dmrg_jacobi import _chol_and_inv

    L, chi, d, _ = Ms.shape
    w = Ws.shape[1]
    Bstack, renvs = _canonize_right_and_renvs(Ms, Ws)
    lenvs, NLs = _lenvs_and_norms(Bstack, Ws)

    a = jnp.asarray(np.asarray(starts))
    idx = a[:, None] + jnp.arange(m)[None, :]
    segB = Bstack[idx]                          # (S', m, chi, d, chi)
    segW = Ws[idx]

    lenv0 = jnp.zeros((chi, w, chi), Ms.dtype).at[0, 0, 0].set(1.0)
    nl0 = jnp.zeros((chi, chi), Ms.dtype).at[0, 0].set(1.0)
    at_left = a == 0
    Lb = jnp.where(
        at_left[:, None, None, None], lenv0[None],
        lenvs[jnp.maximum(a - 1, 0)],
    )
    NLb = jnp.where(
        at_left[:, None, None], nl0[None],
        NLs[jnp.maximum(a - 1, 0)],
    )
    renvN = jnp.zeros_like(lenv0).at[0, 0, 0].set(1.0)
    Rb = jnp.where(
        (a + m == L)[:, None, None, None], renvN[None],
        renvs[jnp.minimum(a + m, L - 1)],
    )

    # whiten the left seam: NL = C C†; the frame is FROZEN for the
    # whole inner phase, so whitening noise enters once per sweep and
    # only perturbs the (variationally second-order) boundary basis
    CL, CLi = _chol_and_inv(NLb)
    Lt = jnp.einsum("nab,nbwk->nawk", CLi, Lb)
    Lt = jnp.einsum("nawk,nck->nawc", Lt, jnp.conj(CLi))
    M0 = jnp.einsum("nka,nkdr->nadr", jnp.conj(CL), segB[:, 0])

    M0, Mrest, ens = _segment_inner(
        M0, segB[:, 1:], segW, Lt, Rb, m=m, ncv=ncv,
        max_bond=max_bond, inner_passes=inner_passes,
    )
    # un-whiten the first tensor: B_a = C⁻† T̃
    M0 = jnp.einsum(
        "nab,nbdr->nadr", jnp.conj(jnp.swapaxes(CLi, -2, -1)), M0
    )
    seg_new = jnp.concatenate([M0[:, None], Mrest], axis=1)
    return Bstack.at[idx].set(seg_new), ens


class ParallelDMRG:
    """Steady-state segment-parallel sweep driver.

    Parameters
    ----------
    psi, ham : MPS / MPO pair (OBC).
    max_bond : uniform bond dimension (the state is padded to it).
    n_segments : how many segments to sweep in parallel; L must be
        divisible by ``2 * n_segments`` (offsets alternate by half a
        segment).
    ncv : Lanczos basis size per local solve.
    inner_passes : full right+left passes per outer sweep.
    """

    def __init__(self, psi, ham, max_bond, n_segments=8, ncv=8,
                 inner_passes=1):
        self.like = psi.copy()
        self.chi = int(max_bond)
        self.S = int(n_segments)
        self.ncv = int(ncv)
        self.inner_passes = int(inner_passes)
        self.Ms = mps_to_stack(psi, self.chi)
        self.L = int(self.Ms.shape[0])
        if self.L % (2 * self.S):
            raise ValueError(
                f"L={self.L} must divide into 2*{self.S} half-segments"
            )
        self.m = self.L // self.S
        self.Ws = to_device(mpo_to_padded_stack(ham))
        self.energies = []
        self._phase = 0

    def sweep(self):
        """One outer sweep: canonize + env scans, seam whitening,
        batched inner passes, write-back."""
        L, m = self.L, self.m
        off = (m // 2) * (self._phase % 2)
        self._phase += 1
        starts = tuple(int(x) for x in np.arange(off, L - m + 1, m))
        self.Ms, ens = _parallel_outer_sweep(
            self.Ms, self.Ws, starts, m=m, ncv=self.ncv,
            max_bond=self.chi, inner_passes=self.inner_passes,
        )
        en = float(jnp.mean(ens))
        self.energies.append(en)
        return en

    def get_state(self):
        return stack_to_mps(self.Ms, self.like)
