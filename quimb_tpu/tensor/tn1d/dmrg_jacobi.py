"""Batched Jacobi DMRG sweeps: all same-parity bonds solved at once.

The standard 2-site sweep is a *serial* chain of ~L small solves — at
the north-star config (L=128, chi=256) each site's restarted Lanczos +
split + env-absorb is ~1.3 GFLOP against an ~8 ms serial latency chain,
capping the sweep at <10% of the chip's matmul ceiling (measured,
docs/performance.md). Site-to-site data dependence forbids batching a
Gauss-Seidel sweep; this module implements the *Jacobi* (parallel
block-coordinate) variant:

- the state is a plain uniform tensor stack ``M`` in whatever gauge it
  happens to be in. Instead of chasing a canonical form, each
  half-sweep also scans the *norm* environments ``N_L``/``N_R`` and
  cholesky-whitens every bond's local problem:
  ``H̃ = C⁻¹ H_eff C⁻†`` with ``N_eff = C C†`` — an exactly standard
  hermitian eigenproblem regardless of gauge drift. (A first design
  held the state in Vidal ``(Γ, λ)`` form — identity norms by
  construction — but its ``λ⁻¹`` reassembly amplifies each update by
  1/λ_min and the *minimizer* then actively exploits the gauge error:
  it diverges within sweeps. Whitening has no small-singular-value
  inverses anywhere: the cholesky factors stay O(1)-conditioned.)
- one half-sweep solves ALL even (then all odd) bonds as one compiled
  program: two ``lax.scan`` passes build every H and norm environment,
  then a width-``nb`` batched Lanczos (each step one batched deep-K
  matmul pair over whitened environments), a batched subspace
  truncation *in the whitened metric* (= the globally optimal
  rank-chi truncation), and direct reassembly ``M_i = C_L⁻ᵀŨ√s``,
  ``M_{i+1} = √sṼC_R⁻¹`` — 2 device dispatches per full sweep;
- updates within a half-sweep use environments of the current state
  (Jacobi). Near convergence this has the same fixed point as the
  sequential sweep and is used as the steady-state production loop
  after ordinary ``DMRG2`` sweeps have converged the state.

Uniform shapes come from zero-padding edge bonds / MPO boundary
indices; dead (padded) directions get unit diagonal in ``N`` before
the cholesky and carry exactly zero state weight throughout.

Reference counterparts: sequential engine ``DMRG2``
(tensor_dmrg.py:1026); the parallel-update whitened formulation is
TPU-native design (the reference is strictly serial here).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import decomp
from ...ops.backend import to_device, to_host
from .dmrg import _env_step_left, _env_step_right


# ---------------------------------------------------------------------------
# host-side conversion: MPS/MPO -> uniform padded stacks
# ---------------------------------------------------------------------------


def mps_to_stack(psi, chi):
    """Uniform (L, chi, d, chi) tensor stack from an OBC MPS,
    zero-padded. Host-side, one-time setup."""
    psi = psi.copy()
    L = psi.L
    d = psi.phys_dim()
    Ms = np.zeros((L, chi, d, chi), dtype=np.dtype(str(psi.dtype)))
    for j in range(L):
        t = psi[psi.site_tag(j)]
        inds = []
        if j > 0:
            inds.append(psi.bond(j - 1, j))
        inds.append(psi.site_ind(j))
        if j < L - 1:
            inds.append(psi.bond(j, j + 1))
        arr = np.asarray(to_host(t.transpose(*inds).data))
        if j == 0:
            arr = arr.reshape((1, *arr.shape))
        if j == L - 1:
            arr = arr.reshape((*arr.shape, 1))
        kl, _, kr = arr.shape
        if kl > chi or kr > chi:
            raise ValueError(
                f"bond dimension {max(kl, kr)} exceeds stack chi={chi}"
            )
        Ms[j, :kl, :, :kr] = arr
    return jnp.asarray(Ms)


def stack_to_mps(Ms, like, tol=0.0):
    """Rebuild an MPS (shaped like ``like``) from the padded stack,
    trimming bond columns that are exactly zero-padded. Host-side."""
    Mh = np.asarray(to_host(Ms))
    L = like.L
    psi = like.copy()
    # alive bond ranks: columns with any weight on either side
    ranks = [1]
    for j in range(1, L):
        wr = np.abs(Mh[j - 1]).max(axis=(0, 1))
        wl = np.abs(Mh[j]).max(axis=(1, 2))
        r = int(max(((wr > tol) | (wl > tol)).sum(), 1))
        ranks.append(r)
    ranks.append(1)
    for j in range(L):
        kl, kr = ranks[j], ranks[j + 1]
        A = Mh[j][:kl, :, :kr]
        t = psi[psi.site_tag(j)]
        inds = []
        if j > 0:
            inds.append(psi.bond(j - 1, j))
        inds.append(psi.site_ind(j))
        if j < L - 1:
            inds.append(psi.bond(j, j + 1))
        if j == 0:
            data = A[0] if L > 1 else A[0, :, 0]
        elif j == L - 1:
            data = A[..., 0]
        else:
            data = A
        t.modify(data=data, inds=tuple(inds))
    return psi


def mpo_to_padded_stack(ham, w=None):
    """Uniform (L, w, w, d, d) MPO stack with edge boundary indices
    zero-padded at channel 0; pair with one-hot channel-0 boundary
    environments. Host-side, one-time."""
    L = ham.L
    arrs = []
    for j in range(L):
        t = ham[ham.site_tag(j)]
        inds = []
        if j > 0:
            inds.append(ham.bond(j - 1, j))
        if j < L - 1:
            inds.append(ham.bond(j, j + 1))
        inds.append(ham.upper_ind(j))
        inds.append(ham.lower_ind(j))
        arr = np.asarray(to_host(t.transpose(*inds).data))
        if j == 0:
            arr = arr.reshape((1, *arr.shape))
        if j == L - 1:
            arr = arr.reshape((arr.shape[0], 1, *arr.shape[1:]))
        arrs.append(arr)
    if w is None:
        w = max(max(a.shape[0], a.shape[1]) for a in arrs)
    d = arrs[0].shape[-1]
    Ws = np.zeros((L, w, w, d, d), dtype=arrs[0].dtype)
    for j, a in enumerate(arrs):
        Ws[j, : a.shape[0], : a.shape[1]] = a
    return Ws


# ---------------------------------------------------------------------------
# the fused half-sweep program
# ---------------------------------------------------------------------------


def _nenv_step_right(NL, M):
    """NL (a, k) -> (a2, k2) absorbing M (k, d, k2) / conj on bra."""
    T = jnp.einsum("ak,kdx->adx", NL, M)
    return jnp.einsum("adx,ady->yx", T, jnp.conj(M))


def _nenv_step_left(NR, M):
    T = jnp.einsum("bk,xdk->bxd", NR, M)
    return jnp.einsum("bxd,ydb->xy", T, jnp.conj(M))


def _chol_and_inv(N):
    """Batched cholesky N = C C† (dead padded directions given unit
    diagonal) and lower-triangular inverse C⁻¹."""
    diag = jnp.real(jnp.diagonal(N, axis1=-2, axis2=-1))
    tr = jnp.sum(diag, axis=-1, keepdims=True)
    dead = diag <= 1e-12 * jnp.maximum(tr, 1e-30)
    fix = jnp.where(dead, 1.0, 0.0).astype(N.dtype)
    Nf = N + fix[..., :, None] * jnp.eye(
        N.shape[-1], dtype=N.dtype
    )
    # small Tikhonov for f32 robustness
    eps = jnp.finfo(jnp.real(N).dtype).eps
    Nf = Nf + (8 * eps * jnp.maximum(tr, 1.0))[..., None] * jnp.eye(
        N.shape[-1], dtype=N.dtype
    )
    C = jnp.linalg.cholesky(Nf)
    eye = jnp.broadcast_to(
        jnp.eye(N.shape[-1], dtype=N.dtype), Nf.shape
    )
    Ci = jax.scipy.linalg.solve_triangular(C, eye, lower=True)
    return C, Ci


def _batched_matvec(LW1, W2R, th):
    """Batched 2-site Heff matvec: th (nb, k, d, d, r)."""
    t = jnp.einsum("nkpqr,naxupk->nauxqr", th, LW1)
    return jnp.einsum("nauxqr,nxvqbr->nauvb", t, W2R)


def _batched_tridiag_eigvec(alpha, beta):
    """Smallest-eigenpair coefficients of batched (ncv) tridiagonals."""
    ncv = alpha.shape[-1]
    T = (
        jnp.zeros((*alpha.shape, ncv), alpha.dtype)
        + alpha[..., :, None] * jnp.eye(ncv, dtype=alpha.dtype)
    )
    off = beta[..., : ncv - 1]
    idx = jnp.arange(ncv - 1)
    T = T.at[..., idx, idx + 1].set(off)
    T = T.at[..., idx + 1, idx].set(off)
    wv, S = decomp.safe_eigh(T)
    return wv[..., 0], S[..., :, 0]


@functools.partial(
    jax.jit,
    static_argnames=("parity", "ncv", "max_bond", "stride",
                     "oversample", "power_iters"),
)
def _jacobi_halfsweep(Ms, Ws, parity, ncv, max_bond, stride=2,
                      oversample=16, power_iters=3):
    """One batched parity half-sweep over the whitened local problems.
    ``stride`` spaces the simultaneously-updated bonds (stride=2 =
    dense brickwork; larger strides weaken the Jacobi coupling).
    Returns (Ms, energies)."""
    L, chi, d, _ = Ms.shape
    w = Ws.shape[1]
    rdt = Ms.real.dtype

    # H environments (stacked prefixes/suffixes)
    lenv0 = jnp.zeros((chi, w, chi), Ms.dtype).at[0, 0, 0].set(1.0)

    def lbody(lenv, x):
        Mj, Wj = x
        new = _env_step_right(lenv, jnp.conj(Mj), Wj, Mj)
        return new, new

    _, lstack = jax.lax.scan(lbody, lenv0, (Ms, Ws))

    renv0 = jnp.zeros((chi, w, chi), Ms.dtype).at[0, 0, 0].set(1.0)

    def rbody(renv, x):
        Mj, Wj = x
        new = _env_step_left(renv, jnp.conj(Mj), Wj, Mj)
        return new, new

    _, rstack = jax.lax.scan(rbody, renv0, (Ms, Ws), reverse=True)

    # norm environments
    nl0 = jnp.zeros((chi, chi), Ms.dtype).at[0, 0].set(1.0)

    def nlbody(NL, Mj):
        new = _nenv_step_right(NL, Mj)
        return new, new

    _, nlstack = jax.lax.scan(nlbody, nl0, Ms)

    nr0 = jnp.zeros((chi, chi), Ms.dtype).at[0, 0].set(1.0)

    def nrbody(NR, Mj):
        new = _nenv_step_left(NR, Mj)
        return new, new

    _, nrstack = jax.lax.scan(nrbody, nr0, Ms, reverse=True)

    # parity bonds (i, i+1)
    bond_is = np.arange(parity, L - 1, stride)
    nb = len(bond_is)
    iL = jnp.asarray(bond_is)
    iR = iL + 1

    at_left = (iL == 0)
    at_right = (iR == L - 1)
    Lb = jnp.where(
        at_left[:, None, None, None], lenv0[None],
        lstack[jnp.maximum(iL - 1, 0)],
    )
    Rb = jnp.where(
        at_right[:, None, None, None], renv0[None],
        rstack[jnp.minimum(iR + 1, L - 1)],
    )
    NLb = jnp.where(
        at_left[:, None, None], nl0[None],
        nlstack[jnp.maximum(iL - 1, 0)],
    )
    NRb = jnp.where(
        at_right[:, None, None], nr0[None],
        nrstack[jnp.minimum(iR + 1, L - 1)],
    )
    W1 = Ws[iL]
    W2 = Ws[iR]

    # whitening factors. Convention: the ket-side left bond index k of
    # theta transforms with CL† (theta~ = CL† theta CR*), chosen so
    # <theta|N_eff|theta> = |theta~|²:
    #   N_eff[(a,b),(k,r)] = NL[a,k] NR[b,r],  NL = CL CL†
    CL, CLi = _chol_and_inv(NLb)
    CR, CRi = _chol_and_inv(NRb)

    # whitened environments: Lt = CL⁻¹ L CL⁻† over (bra a, ket k)
    Lt = jnp.einsum("nab,nbwk->nawk", CLi, Lb)
    Lt = jnp.einsum("nawk,nck->nawc", Lt, jnp.conj(CLi))
    Rt = jnp.einsum("nab,nbwk->nawk", CRi, Rb)
    Rt = jnp.einsum("nawk,nck->nawc", Rt, jnp.conj(CRi))

    # warm-start theta in the whitened metric: th~ = CL† th conj(CR)
    th0 = jnp.einsum("nkpc,ncqr->nkpqr", Ms[iL], Ms[iR])
    th0 = jnp.einsum("nka,nkpqr->napqr", jnp.conj(CL), th0)
    th0 = jnp.einsum("nkpqr,nre->nkpqe", th0, jnp.conj(CR))

    # loop-invariant env-MPO fusions
    LW1 = jnp.einsum("nawk,nwxup->naxupk", Lt, W1)
    W2R = jnp.einsum("nxyvq,nbyr->nxvqbr", W2, Rt)

    # batched Lanczos, full reorthogonalization, fixed ncv
    n = chi * d * d * chi
    v = jnp.reshape(th0, (nb, n))
    v = v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
    )
    V = jnp.zeros((nb, ncv, n), v.dtype).at[:, 0].set(v)
    alpha = jnp.zeros((nb, ncv), rdt)
    beta = jnp.zeros((nb, ncv), rdt)

    def body(j, carry):
        V, alpha, beta = carry
        vj = V[:, j]
        hv = _batched_matvec(
            LW1, W2R, jnp.reshape(vj, (nb, chi, d, d, chi))
        )
        hv = jnp.reshape(hv, (nb, n))
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

    # rank-chi truncation in the whitened metric (globally optimal):
    # oversampled randomized subspace + one small batched eigh for
    # spectrum and rotation. Quality matters here beyond the usual
    # truncation-error argument: the Jacobi iteration feeds each
    # bond's truncation jitter back through every neighbour, so a
    # sloppy (unoversampled) subspace destabilizes the fixed point.
    mat = jnp.reshape(th, (nb, chi * d, d * chi))
    G = jnp.einsum("nij,nkj->nik", mat, jnp.conj(mat))
    kp = min(max_bond + oversample, chi * d)
    key = jax.random.PRNGKey(17 + parity)
    Om = jnp.tile(
        jax.random.normal(key, (chi * d, kp), rdt).astype(mat.dtype),
        (nb, 1, 1),
    )
    Q = Om
    for _ in range(max(power_iters, 1)):
        Y = jnp.einsum("nik,nkj->nij", G, Q)
        Q, _ = decomp.safe_qr(Y)
    Bs = jnp.einsum("nki,nkj->nij", jnp.conj(Q), mat)
    Mm = jnp.einsum("nij,nkj->nik", Bs, jnp.conj(Bs))
    wv, Rot = decomp.safe_eigh(Mm)
    wv = wv[..., ::-1]
    Rot = Rot[..., :, ::-1]
    s = jnp.sqrt(jnp.clip(wv, 0.0, None))[..., :max_bond]
    U = jnp.einsum(
        "nik,nkj->nij", Q, Rot[..., :, :max_bond]
    )                                              # (nb, chi*d, k)
    # VH rows via projection (no 1/s): P = U† mat  has rows s_i v_i†
    P = jnp.einsum("nki,nkj->nij", jnp.conj(U), mat)   # (nb, k, dchi)

    # un-whiten and absorb √s on both sides:
    #   theta' = CL⁻† U diag(s) V CR⁻ᵀ*;  with P = diag(s) V:
    #   M_i    = CL⁻† U diag(1/√s̄)… — equivalently use U√ and P/√
    sq = jnp.sqrt(jnp.maximum(s, 1e-30))
    Uw = U * sq[..., None, :].astype(U.dtype)          # U diag(√s)
    Pw = P / sq[..., :, None].astype(P.dtype)          # diag(√s)⁻¹ P
    # zero fully-dead directions (s == 0): Pw would be noise/0-div
    alive = (s > 0)[..., :, None].astype(P.real.dtype)
    Pw = Pw * alive.astype(P.dtype)

    Mi = jnp.einsum(
        "nab,nbk->nak", jnp.conj(CLi).transpose((0, 2, 1)),
        jnp.reshape(Uw, (nb, chi, d * max_bond)),
    )
    Mi = jnp.reshape(Mi, (nb, chi, d, max_bond))
    Mip = jnp.einsum(
        "nkb,nbr->nkr",
        jnp.reshape(Pw, (nb, max_bond * d, chi)),
        jnp.conj(CRi),
    )
    Mip = jnp.reshape(Mip, (nb, max_bond, d, chi))

    Ms = Ms.at[iL].set(Mi.astype(Ms.dtype))
    Ms = Ms.at[iR].set(Mip.astype(Ms.dtype))
    return Ms, ens


@jax.jit
def _renormalize_stack(Ms):
    """Balance per-tensor magnitudes to 1 and scale the stack so the
    global state norm is 1 (factor spread evenly over sites).

    The whitened reassembly leaves neighbouring tensors with
    reciprocal magnitudes (huge x tiny); left unchecked the norm-env
    conditioning explodes within a few sweeps. The norm scan runs with
    per-step trace normalization and a log accumulator so it cannot
    overflow even at L=128."""
    L = Ms.shape[0]
    tiny = jnp.finfo(Ms.real.dtype).tiny
    fro = jnp.sqrt(jnp.sum(
        jnp.abs(Ms) ** 2, axis=(1, 2, 3), keepdims=True
    ))
    Ms = Ms / jnp.maximum(fro, tiny).astype(Ms.real.dtype)

    nl0 = jnp.zeros(
        (Ms.shape[1], Ms.shape[1]), Ms.dtype
    ).at[0, 0].set(1.0)

    def body(carry, Mj):
        NL, logn = carry
        NL = _nenv_step_right(NL, Mj)
        tr = jnp.maximum(
            jnp.real(jnp.trace(NL)), tiny
        )
        return (NL / tr.astype(Ms.real.dtype), logn + jnp.log(tr)), None

    (NL, logn), _ = jax.lax.scan(body, (nl0, jnp.asarray(0.0, Ms.real.dtype)), Ms)
    logn = logn + jnp.log(jnp.maximum(jnp.real(NL[0, 0]), tiny))
    return Ms * jnp.exp(-logn / (2.0 * L)).astype(Ms.real.dtype)


class JacobiDMRG:
    """Steady-state batched-sweep driver over a uniform tensor stack.

    Built from a (partially converged) MPS/MPO pair; ``sweep()`` runs
    an even + odd batched half-sweep pair (two compiled dispatches)
    and returns the mean bond Ritz energy (= the exact generalized
    Rayleigh quotient of each local solve). ``get_state()`` reads the
    MPS back out.
    """

    def __init__(self, psi, ham, max_bond, ncv=8, stride=2,
                 oversample=16, power_iters=3):
        self.like = psi.copy()
        self.chi = int(max_bond)
        self.ncv = int(ncv)
        self.stride = int(stride)
        self.oversample = int(oversample)
        self.power_iters = int(power_iters)
        self.Ms = mps_to_stack(psi, self.chi)
        self.Ws = to_device(mpo_to_padded_stack(ham))
        self.energies = []

    def sweep(self):
        ens_all = []
        for off in range(self.stride):
            self.Ms, ens = _jacobi_halfsweep(
                self.Ms, self.Ws, parity=int(off),
                ncv=self.ncv, max_bond=self.chi, stride=self.stride,
                oversample=self.oversample,
                power_iters=self.power_iters,
            )
            # balance + global renormalization every half-sweep:
            # whitened reassembly leaves reciprocal neighbour
            # magnitudes whose compounding blows up the norm-env
            # conditioning within a few sweeps otherwise
            self.Ms = _renormalize_stack(self.Ms)
            ens_all.append(ens)
        en = float(jnp.mean(jnp.concatenate(ens_all)))
        self.energies.append(en)
        return en

    def get_state(self):
        return stack_to_mps(self.Ms, self.like)
