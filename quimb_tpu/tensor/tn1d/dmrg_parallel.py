"""Segment-parallel DMRG sweeps (real-space parallel DMRG, batched).

The standard 2-site sweep is a serial chain of ~L small solves; at the
north-star config (L=128, chi=256) each ~8 ms serial step does only
~1.3 GFLOP, capping the sweep near 15% of the chip's matmul ceiling
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
2. a forward ``lax.scan`` over the B-stack: QR-canonize to A-form
   while building every left H-environment, also emitting the
   *entering center gauge* ``R[j]`` at every bond (the triangular
   factor carried by the scan **before** absorbing site ``j``).
   Together the two scans give, for EVERY segment boundary, exact
   environments in an exactly mixed-canonical gauge of one consistent
   global state: segment ``i``'s boundary conditions are
   ``lenvs[a-1]`` (from orthonormal A-tensors), ``renvs[a+m]`` (from
   orthonormal B-tensors) and first tensor ``R[a-1] @ B[a]`` — all
   orthogonal transforms and plain multiplications. (Earlier designs
   whitened the left seam with a Cholesky *inverse* of the prefix
   norm matrix; its conditioning is the squared Schmidt spectrum of
   the cut, ~1e-10 at chi=256, which in f32 injected O(1e-2) energy
   errors. No inverse of any kind appears here.)
3. ``2*inner_passes + 1`` batched directional half-sweeps within all
   segments at once (right, then ``inner_passes`` x (left, right)),
   boundary environments FROZEN — each segment solves a well-posed
   fixed-boundary variational problem. Ending on a right half-sweep
   leaves every segment left-canonical (A-form) with its center
   gauge on the last site tensor.
4. write-back: interior segments QR-factor their last tensor and
   DROP the triangular gauge — the next segment's first tensor
   already absorbed the (previous) center gauge at that seam, so at
   convergence the drop is exact (gauge transport is transitive:
   QR-sweeping sites ``a..b`` from gauge ``R[a-1]`` reproduces
   ``R[b]``); away from convergence it is the O(update)
   block-Jacobi consistency error inherent to any parallel DMRG.
   The final segment keeps its gauge (its right neighbour — chain
   end or untouched B-tail — absorbed nothing). Segment offsets
   alternate by half a segment every outer sweep so seam bonds are
   interior on alternating sweeps; on offset sweeps the prefix sites
   ``[0, off)`` are stored as their A-form tensors (the basis the
   first segment's left environment is expressed in).

Used as the steady-state production loop once ordinary ``DMRG2``
sweeps have converged the state; each outer sweep applies
``2*inner_passes + 1`` half-sweep updates of every interior bond.

Reference counterpart: the serial engine (tn1d/dmrg.py:1026); the
reference has no parallel-sweep machinery — this is TPU-native design
following the published real-space-parallel algorithm.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import decomp
from ...ops import pallas_kernels as pk
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


def bond_rank_masks(L, chi, d=2, dtype=np.float32):
    """(L+1, chi) 0/1 masks of the true (untruncated) bond ranks of an
    OBC chain: ``masks[j]`` masks the bond *left of* site ``j``
    (``min(d**j, d**(L-j), chi)`` live columns). Padded-stack QR/LQ of
    rank-deficient edge matrices otherwise fills the dead directions
    with arbitrary orthonormal vectors, poisoning the environments
    with couplings to states that are not orthonormal extensions of
    the physical space."""
    m = np.zeros((L + 1, chi), dtype=dtype)
    for j in range(L + 1):
        r = min(d ** min(j, 63), d ** min(L - j, 63), chi)
        m[j, :r] = 1.0
    return m


@jax.jit
def _canonize_right_and_renvs(Ms, Ws, masks):
    """Reverse scan: right-canonize (LQ) every site while absorbing it
    into the right H-environment. Returns (Bstack, renvs) where
    ``renvs[j]`` is the environment of sites >= j (the env *right of*
    bond (j-1, j)); the leftover left gauge (absorbed norm) is
    dropped (state normalized). ``masks`` = :func:`bond_rank_masks` —
    dead left-bond directions of each B are zeroed exactly."""
    L, chi, d, _ = Ms.shape
    w = Ws.shape[1]
    renv0 = jnp.zeros((chi, w, chi), Ms.dtype).at[0, 0, 0].set(1.0)

    def body(carry, x):
        R, renv = carry
        Mj, Wj, mk = x
        # absorb pending right gauge
        Mj = jnp.einsum("kdc,cr->kdr", Mj, R)
        # LQ: Mj = Lf @ Q with Q (k', d*chi) row-orthonormal
        mat = jnp.reshape(Mj, (chi, d * chi))
        Lf, _, Q = decomp.lq_stabilized(mat)
        Q = Q * mk[:, None]
        Lf = Lf * mk[None, :]
        Bj = jnp.reshape(Q, (chi, d, chi))
        renv = _env_step_left(renv, jnp.conj(Bj), Wj, Bj)
        return (Lf, renv), (Bj, renv)

    eyeR = jnp.eye(chi, dtype=Ms.dtype)
    (_, _), (Bstack, renvs) = jax.lax.scan(
        body, (eyeR, renv0), (Ms, Ws, masks[:-1].astype(Ms.dtype)),
        reverse=True,
    )
    return Bstack, renvs


@jax.jit
def _canonize_left_and_lenvs(Bstack, Ws, masks):
    """Forward scan over the right-canonical stack: QR-canonize to
    A-form while building every left H-environment, and emit the
    entering center gauge at every site.

    Returns ``(Astack, lenvs, Rpre)``: ``lenvs[j]`` = H-environment
    of sites <= j built from the orthonormal A-tensors; ``Rpre[j]`` =
    the (chi, chi) gauge carried into site ``j``, i.e. the exact
    center matrix of the mixed-canonical form
    ``A[0..j-1] @ Rpre[j] @ B[j..]``. Dead right-bond directions of
    each A (and the matching gauge rows) are zeroed via ``masks``."""
    L, chi, d, _ = Bstack.shape
    w = Ws.shape[1]
    lenv0 = jnp.zeros((chi, w, chi), Bstack.dtype).at[0, 0, 0].set(1.0)
    # the entering gauge at site 0 is the boundary projector, not the
    # identity: only left-bond direction 0 is physical
    R0 = jnp.zeros((chi, chi), Bstack.dtype).at[0, 0].set(1.0)

    def body(carry, x):
        R, lenv = carry
        Bj, Wj, mk = x
        Mj = jnp.einsum("ak,kdr->adr", R, Bj)
        mat = jnp.reshape(Mj, (chi * d, chi))
        Q, _, Rn = decomp.qr_stabilized(mat)
        Q = Q * mk[None, :]
        Rn = Rn * mk[:, None]
        # keep the carried gauge normalized: its norm is the state
        # norm (1 after the reverse scan) but f32 drift compounds
        # over 128 sites
        Rn = Rn / jnp.maximum(
            jnp.linalg.norm(Rn), jnp.finfo(Rn.real.dtype).tiny
        )
        Aj = jnp.reshape(Q, (chi, d, chi))
        lenv2 = _env_step_right(lenv, jnp.conj(Aj), Wj, Aj)
        return (Rn, lenv2), (Aj, lenv2, R)

    (_, _), (Astack, lenvs, Rpre) = jax.lax.scan(
        body, (R0, lenv0), (Bstack, Ws, masks[1:].astype(Bstack.dtype))
    )
    return Astack, lenvs, Rpre


# ---------------------------------------------------------------------------
# batched (over segments) inner sweeps with frozen boundary envs
# ---------------------------------------------------------------------------


def _sandwich_stacks(LW1, W2R):
    """Pre-transpose the fused environment tensors into the Pallas
    sandwich layout (`ops.pallas_kernels.sandwich_matvec`):
    ``A (n, w, a*u, k*p)``, ``B (n, w, q*r, v*b)`` so the Heff matvec
    is ``out[n] = sum_x A[n, x] @ th[n] @ B[n, x]`` with
    ``th (n, k*p, q*r)`` — one transpose per bond, amortized over the
    whole Lanczos basis build. Both are cast to the promoted dtype so
    the kernel output matches what the einsum pair would produce."""
    n_, a, x, u, p, k = LW1.shape
    A = jnp.reshape(
        jnp.transpose(LW1, (0, 2, 1, 3, 5, 4)), (n_, x, a * u, k * p)
    )
    _, _, v, q, b, r = W2R.shape
    B = jnp.reshape(
        jnp.transpose(W2R, (0, 1, 3, 5, 2, 4)), (n_, x, q * r, v * b)
    )
    return A, B


def _matvec_via_sandwich(A, B, thm, interpret=False):
    """S-stacked fused-sandwich Heff matvec: per-segment Pallas calls
    (S is a static python int, so the loop unrolls inside the jitted
    sweep program). Returns (n, a*u, v*b) matching
    ``_batched_matvec``'s output reshaped."""
    dt = jnp.result_type(A.dtype, thm.dtype)
    A, B, thm = A.astype(dt), B.astype(dt), thm.astype(dt)
    return jnp.stack([
        pk.sandwich_matvec(A[i], thm[i], B[i], interpret=interpret)
        for i in range(A.shape[0])
    ])


def _batched_solve_2site(Lb, W1, W2, Rb, th0, ncv, damp=1.0,
                         pallas_mode="0"):
    """Batched restarted-Lanczos smallest eigenpair of the 2-site
    effective Hamiltonian. th0 (S, chi, d, d, chi). ``damp`` < 1
    blends the Ritz vector with the warm start (trust-region for the
    block-Jacobi outer iteration: frozen-boundary segment optima
    overshoot when neighbouring segments move simultaneously).

    ``pallas_mode`` selects the Heff matvec implementation and MUST be
    threaded through the jitted caller's static args (it changes the
    traced program): "0" = einsum pair, "1" = fused Pallas sandwich on
    real TPU when the block shapes qualify (the matvec dominates the
    sweep, ncv applications per bond ~90% of counted flops; the serial
    engine's A/B measured the fused kernel ~5x the einsum sandwich,
    docs/performance.md), "interpret" = force the kernel in
    interpreter mode at any shape on any backend (CPU end-to-end
    equivalence tests)."""
    S_, chi, d, _, _ = th0.shape
    rdt = th0.real.dtype
    LW1 = jnp.einsum("nawk,nwxup->naxupk", Lb, W1)
    W2R = jnp.einsum("nxyvq,nbyr->nxvqbr", W2, Rb)
    n = chi * d * d * chi
    pk_interpret = pallas_mode == "interpret"
    use_pk = pk_interpret or (
        pallas_mode != "0"
        and pk.use_sandwich_kernel(
            th0.dtype, LW1.shape[2],
            chi * d, chi * d, d * chi, d * chi,
        )
    )
    if use_pk:
        Asw, Bsw = _sandwich_stacks(LW1, W2R)
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
        if use_pk:
            hv = _matvec_via_sandwich(
                Asw, Bsw, jnp.reshape(vj, (S_, chi * d, d * chi)),
                interpret=pk_interpret,
            )
        else:
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
    if damp != 1.0:
        # phase-align with the warm start before blending (the Ritz
        # vector's global sign is arbitrary)
        ov = jnp.sum(jnp.conj(V[:, 0]) * th, axis=-1, keepdims=True)
        sign = jnp.where(jnp.real(ov) < 0, -1.0, 1.0).astype(th.dtype)
        th = sign * th
        th = V[:, 0] + damp * (th - V[:, 0])
        th = th / jnp.maximum(
            jnp.linalg.norm(th, axis=-1, keepdims=True), 1e-30
        )
    return ens, jnp.reshape(th, th0.shape)


def _batched_split_2site(th, max_bond, absorb, oversample=0,
                         power_iters=2):
    """Batched rank-``max_bond`` orthogonal split of th
    (S, chi, d, d, chi) -> (A1 (S,chi,d,k), A2 (S,k,d,chi)). The
    discarded-side factor carries the rest (absorb 'right': A1
    isometric). ``oversample=0`` skips the Rayleigh-Ritz rotation
    entirely (the bond basis is pure gauge — svd:sub0, the serial
    engine's production split)."""
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
    static_argnames=("m", "ncv", "max_bond", "inner_passes",
                     "oversample", "damp", "pallas_mode"),
)
def _segment_inner(seg_M0, seg_Ms, seg_W, lenv_b, renv_b, seg_bm,
                   m, ncv, max_bond, inner_passes, oversample=0,
                   damp=1.0, pallas_mode="0"):
    """Batched fixed-boundary DMRG on S segments of length ``m``.

    seg_M0: (S, chi, d, chi) the first site tensor (carries the
    center gauge); seg_Ms: (S, m-1, chi, d, chi) remaining site
    tensors (right-canonical); seg_W: (S, m, w, w, d, d);
    lenv_b/renv_b: frozen boundary envs (S, chi, w, chi);
    seg_bm: (m-1, S, chi) true-rank masks of the segment-interior
    bonds (scan-step aligned) — splits at unsaturated edge bonds
    would otherwise fill dead directions with junk.

    Runs a right half-sweep, then ``inner_passes`` x (left + right)
    half-sweeps — ending left-canonical with the center gauge on the
    last site tensor. Returns (Arest (S, m-1, ...), Mlast, bond
    energies of the final right half-sweep)."""

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
            Mnext, W1, W2, renv, bm = x
            th0 = jnp.einsum("nkpc,ncqr->nkpqr", Mcur, Mnext)
            en, th = _batched_solve_2site(
                lenv, W1, W2, renv, th0, ncv, damp=damp,
                pallas_mode=pallas_mode)
            A1, A2 = _batched_split_2site(
                th, max_bond=max_bond, absorb="right",
                oversample=oversample,
            )
            A1 = A1 * bm[:, None, None, :]
            A2 = A2 * bm[:, :, None, None]
            lenv = venv_right(lenv, jnp.conj(A1), W1, A1)
            return (lenv, A2), (A1, en)

        (lenv, Mlast), (A1s, ens) = jax.lax.scan(
            body, (lenv_b, M0),
            (
                jnp.swapaxes(Mrest, 0, 1),
                jnp.swapaxes(seg_W[:, :-1], 0, 1),
                jnp.swapaxes(seg_W[:, 1:], 0, 1),
                renv_stack,
                seg_bm,
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
            Aprev, W1, W2, lenv, bm = x
            th0 = jnp.einsum("nkpc,ncqr->nkpqr", Aprev, Mcur)
            en, th = _batched_solve_2site(
                lenv, W1, W2, renv, th0, ncv, damp=damp,
                pallas_mode=pallas_mode)
            A1, A2 = _batched_split_2site(
                th, max_bond=max_bond, absorb="left",
                oversample=oversample,
            )
            A1 = A1 * bm[:, None, None, :]
            A2 = A2 * bm[:, :, None, None]
            renv = venv_left(renv, jnp.conj(A2), W2, A2)
            return (renv, A1), (A2, en)

        (renv, Mfirst), (A2s, ens) = jax.lax.scan(
            body, (renv_b, Mlast),
            (
                jnp.swapaxes(Arest, 0, 1)[::-1],
                jnp.swapaxes(seg_W[:, :-1], 0, 1)[::-1],
                jnp.swapaxes(seg_W[:, 1:], 0, 1)[::-1],
                lenv_stack[::-1],
                seg_bm[::-1],
            ),
        )
        return Mfirst, jnp.swapaxes(A2s, 0, 1)[:, ::-1], ens

    Arest, Mlast, ens = right_sweep(seg_M0, seg_Ms)
    for _ in range(inner_passes):
        M0, Brest, _ = left_sweep(Arest, Mlast)
        Arest, Mlast, ens = right_sweep(M0, Brest)
    return Arest, Mlast, ens


@functools.partial(
    jax.jit,
    static_argnames=("starts", "m", "ncv", "max_bond", "inner_passes",
                     "oversample", "off", "damp", "pallas_mode"),
)
def _parallel_outer_sweep(Ms, Ws, masks, starts, m, ncv, max_bond,
                          inner_passes, oversample=0, off=0,
                          damp=1.0, pallas_mode="0"):
    """One full outer sweep as one compiled program: canonize/env
    scans, exact-gauge segment extraction, batched inner passes,
    gauge-dropping write-back. Returns (new stack, bond energies)."""
    L, chi, d, _ = Ms.shape
    w = Ws.shape[1]
    Bstack, renvs = _canonize_right_and_renvs(Ms, Ws, masks)
    Astack, lenvs, Rpre = _canonize_left_and_lenvs(Bstack, Ws, masks)

    a = jnp.asarray(np.asarray(starts))
    idx = a[:, None] + jnp.arange(m)[None, :]
    segB = Bstack[idx]                          # (S', m, chi, d, chi)
    segW = Ws[idx]
    # segment-interior bond masks, scan-step aligned: (m-1, S, chi)
    bidx = a[:, None] + jnp.arange(1, m)[None, :]
    seg_bm = jnp.swapaxes(
        masks.astype(Ms.dtype)[bidx], 0, 1
    )

    lenv0 = jnp.zeros((chi, w, chi), Ms.dtype).at[0, 0, 0].set(1.0)
    at_left = a == 0
    Lb = jnp.where(
        at_left[:, None, None, None], lenv0[None],
        lenvs[jnp.maximum(a - 1, 0)],
    )
    renvN = jnp.zeros_like(lenv0).at[0, 0, 0].set(1.0)
    Rb = jnp.where(
        (a + m == L)[:, None, None, None], renvN[None],
        renvs[jnp.minimum(a + m, L - 1)],
    )

    # exact center gauge at each left seam: M0 = R[a-1..] @ B[a]
    # (Rpre[a] IS that gauge — the carry before absorbing site a)
    M0 = jnp.einsum("nab,nbdr->nadr", Rpre[a], segB[:, 0])

    Arest, Mlast, ens = _segment_inner(
        M0, segB[:, 1:], segW, Lb, Rb, seg_bm, m=m, ncv=ncv,
        max_bond=max_bond, inner_passes=inner_passes,
        oversample=oversample, damp=damp, pallas_mode=pallas_mode,
    )

    # write-back: interior segments QR their gauge-carrying last
    # tensor and drop the triangular factor (transitively absorbed by
    # the next segment's M0); the final segment keeps it
    matl = jnp.reshape(Mlast, (-1, chi * d, chi))
    # MUST be the sign-stabilized QR: the dropped R's column-sign
    # convention has to match Rpre's (positive diagonal, from
    # qr_stabilized in the forward scan) or a ±1 diagonal is left
    # interleaved at every seam
    Qs, _, _ = decomp.qr_stabilized(matl)
    # seam bond masks (interior seams are saturated at chi in
    # production configs; dead directions still get zeroed exactly)
    seammask = masks.astype(Ms.dtype)[a + m]
    Qs = Qs * seammask[:, None, :]
    Alast = jnp.reshape(Qs, Mlast.shape)
    nrm = jnp.linalg.norm(
        jnp.reshape(Mlast, (Mlast.shape[0], -1)), axis=-1
    )
    Mlast_n = Mlast / jnp.maximum(
        nrm, jnp.finfo(nrm.dtype).tiny
    )[:, None, None, None]
    is_final = (a == a[-1])
    last_site = jnp.where(
        is_final[:, None, None, None], Mlast_n, Alast
    )
    seg_new = jnp.concatenate(
        [Arest, last_site[:, None]], axis=1
    )
    new = Bstack.at[idx].set(seg_new)
    if off:
        # offset sweeps: the first segment's left environment is in
        # the A-basis, so the untouched prefix must be stored A-form
        new = new.at[:off].set(Astack[:off])
    return new, ens


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
    inner_passes : (left + right) half-sweep pairs per outer sweep on
        top of the leading right half-sweep.
    oversample : extra subspace columns + Rayleigh-Ritz rotation in
        the truncated split (0 = pure subspace iteration, the serial
        engine's production setting).
    """

    def __init__(self, psi, ham, max_bond, n_segments=8, ncv=8,
                 inner_passes=1, oversample=0, damp=1.0):
        self.like = psi.copy()
        self.chi = int(max_bond)
        self.S = int(n_segments)
        self.ncv = int(ncv)
        self.inner_passes = int(inner_passes)
        self.oversample = int(oversample)
        self.damp = float(damp)
        # matvec implementation, resolved once (thread through the
        # jitted sweep's static args — a trace-time env read would not
        # participate in the jit cache key)
        self.pallas_mode = os.environ.get("QUIMB_TPU_PAR_PALLAS", "0")
        self.Ms = mps_to_stack(psi, self.chi)
        self.L = int(self.Ms.shape[0])
        if self.L % (2 * self.S):
            raise ValueError(
                f"L={self.L} must divide into 2*{self.S} half-segments"
            )
        self.m = self.L // self.S
        self.Ws = to_device(mpo_to_padded_stack(ham))
        d = int(self.Ms.shape[2])
        self.masks = to_device(bond_rank_masks(self.L, self.chi, d))
        self.energies = []
        self._phase = 0

    def sweep(self):
        """One outer sweep: canonize + env scans, exact-gauge segment
        extraction, batched inner passes, write-back."""
        L, m = self.L, self.m
        off = (m // 2) * (self._phase % 2)
        self._phase += 1
        starts = tuple(int(x) for x in np.arange(off, L - m + 1, m))
        self.Ms, ens = _parallel_outer_sweep(
            self.Ms, self.Ws, self.masks, starts, m=m, ncv=self.ncv,
            max_bond=self.chi, inner_passes=self.inner_passes,
            oversample=self.oversample, off=off, damp=self.damp,
            pallas_mode=self.pallas_mode,
        )
        en = float(jnp.mean(ens[-1]))
        self.energies.append(en)
        return en

    def get_state(self):
        return stack_to_mps(self.Ms, self.like)
