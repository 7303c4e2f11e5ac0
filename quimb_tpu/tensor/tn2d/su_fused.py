"""Fused (batched) 2D SimpleUpdate sweeps.

The reference applies simple-update gates bond-by-bond
(reference tn2d/tebd.py:544 ``SimpleUpdate._gate``): each bond does an
eager contract + QR + SVD + several gauge multiplies and a blocking
``float(t.norm())``.  On CPU that is microseconds of dispatch per op;
through the remote-TPU tunnel every eager op is a round trip and a
16x16 lattice (480 bonds/sweep) becomes minutes per step.

TPU-native redesign: represent the whole lattice as ONE zero-padded
site stack ``S (Lx, Ly, p, D, D, D, D)`` (axis order p,u,r,d,l, with
u = bond towards (i+1, j), r = towards (i, j+1) — the repo's 'urdlp'
PEPS convention) plus Vidal bond-gauge stacks ``GH (Lx, Ly-1, D)`` /
``GV (Lx-1, Ly, D)``.  Simple-update bonds split into four
vertex-disjoint colour classes (horizontal even/odd, vertical
even/odd); each class updates ALL its bonds at once as a batched
gather -> gauge-absorb -> QR-reduce -> gate -> SVD-truncate ->
un-reduce -> gauge-remove -> scatter program, and a whole
``evolve(steps, tau)`` runs as a single ``lax.scan`` dispatch.

Boundary sites carry size-``D`` *virtual* axes with only index 0
populated; a per-axis mask re-zeros any garbage that rank-deficient
QR/SVD completions could place in the virtual rows after each class
update, keeping the padding exact.

Vertical classes reuse the horizontal kernel by transposing the
lattice (i <-> j swaps u <-> r and d <-> l).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.backend import to_device, to_host
from ...ops.decomp import safe_qr, safe_svd

# --------------------------------------------------------------------------
# compiled kernels
# --------------------------------------------------------------------------


def _use_sub_split():
    """Whether the bond truncation uses the matmul-only subspace split
    instead of the XLA SVD. On TPU the batched tiny SVD lowers to a
    long Jacobi iteration that dominated the whole fused sweep
    (~2.4 s of the 2.9 s/step at 16x16); the subspace split is pure
    MXU/VPU work. Override with QUIMB_TPU_SU_SPLIT={sub,svd}."""
    import os

    v = os.environ.get("QUIMB_TPU_SU_SPLIT", "")
    if v == "sub":
        return True
    if v == "svd":
        return False
    from ...config import on_tpu

    return on_tpu()


def _mgs_cols(Y):
    """Orthonormalize the (few) trailing columns of ``Y`` by unrolled
    modified Gram-Schmidt — no QR, pure vector ops (the column count
    is the PEPS bond dimension, e.g. 3)."""
    cols = []
    for c in range(Y.shape[-1]):
        v = Y[..., :, c]
        for u in cols:
            v = v - u * jnp.sum(
                jnp.conj(u) * v, axis=-1, keepdims=True
            )
        v = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
        )
        cols.append(v)
    return jnp.stack(cols, axis=-1)


def _topd_split(M, D, iters=10):
    """Top-``D`` truncated split of batched small matrices ``M``
    (..., m, n) -> (U (..., m, D), s (..., D), V (..., D, n)) using
    Gram subspace iteration with MGS orthonormalization and a
    Newton-Schulz row cleanup — matmul-only (TPU-fast; XLA's batched
    SVD is a slow Jacobi loop)."""
    G = jnp.einsum("...ij,...kj->...ik", M, jnp.conj(M))
    Q = G[..., :, :D]
    for _ in range(iters):
        Q = _mgs_cols(jnp.einsum("...ik,...kj->...ij", G, Q))
    B = jnp.einsum("...ki,...kj->...ij", jnp.conj(Q), M)  # (D, n)
    s = jnp.linalg.norm(B, axis=-1)
    V = B / jnp.maximum(s[..., None], 1e-30)
    # Newton-Schulz orthonormalization of V's rows (two steps of
    # V <- (3I - V V†)/2 V); also rotates U consistently through s
    for _ in range(2):
        C = jnp.einsum("...ik,...jk->...ij", V, jnp.conj(V))
        V = jnp.einsum(
            "...ij,...jk->...ik",
            1.5 * jnp.eye(D, dtype=V.dtype) - 0.5 * C, V,
        )
    return Q, s, V


def _axis_masks(Lx, Ly, D, dtype):
    """Per-axis virtual-bond masks: mask[i/j, a] = 1 iff the bond
    exists there or a == 0 (the padded slot carrying the true
    tensor)."""
    mu = np.ones((Lx, D), dtype=dtype)
    mu[Lx - 1, 1:] = 0.0  # u bond (i, j)-(i+1, j) absent at i = Lx-1
    md = np.ones((Lx, D), dtype=dtype)
    md[0, 1:] = 0.0
    mr = np.ones((Ly, D), dtype=dtype)
    mr[Ly - 1, 1:] = 0.0
    ml = np.ones((Ly, D), dtype=dtype)
    ml[0, 1:] = 0.0
    return mu, mr, md, ml


def _apply_masks(S, masks):
    mu, mr, md, ml = masks
    S = S * mu[:, None, None, :, None, None, None]
    S = S * mr[None, :, None, None, :, None, None]
    S = S * md[:, None, None, None, None, :, None]
    S = S * ml[None, :, None, None, None, None, :]
    return S


def _h_class_update(S, GH, GV, U, o, smudge):
    """Update every horizontal bond (i, j)-(i, j+1) with j % 2 == o,
    batched over (Lx, n_bonds).

    S : (Lx, Ly, p, D, D, D, D) site stack, axes (p, u, r, d, l)
    GH: (Lx, Ly-1, D) gauges on bonds (i, j)-(i, j+1)
    GV: (Lx-1, Ly, D) gauges on bonds (i, j)-(i+1, j)
    U : (Lx, nj, p, p, p, p) gates, axes (p_out_a, p_out_b, p_a, p_b)
    """
    Lx, Ly, p, D = S.shape[0], S.shape[1], S.shape[2], S.shape[3]
    dt = S.dtype

    ones_h = jnp.ones((Lx, 1, D), dt)
    GHp = jnp.concatenate([ones_h, GH, ones_h], axis=1)  # (Lx, Ly+1, D)
    ones_v = jnp.ones((1, Ly, D), dt)
    GVp = jnp.concatenate([ones_v, GV, ones_v], axis=0)  # (Lx+1, Ly, D)

    csA = slice(o, Ly - 1, 2)        # A-site columns j
    csB = slice(o + 1, Ly, 2)        # B-site columns j+1
    A = S[:, csA]
    B = S[:, csB]
    nj = A.shape[1]

    # environment gauges: u gauge of (i,j) = GVp[i+1, j], d = GVp[i, j],
    # r = GHp[i, j+1], l = GHp[i, j]
    uA = GVp[1:, csA] + smudge
    dA = GVp[:Lx, csA] + smudge
    lA = GHp[:, csA] + smudge
    uB = GVp[1:, csB] + smudge
    dB = GVp[:Lx, csB] + smudge
    rB = GHp[:, slice(o + 2, Ly + 1, 2)] + smudge
    sc = GH[:, csA]                  # central bond gauges (Lx, nj, D)

    # absorb environment gauges + sqrt of the central gauge
    A = A * uA[:, :, None, :, None, None, None]
    A = A * dA[:, :, None, None, None, :, None]
    A = A * lA[:, :, None, None, None, None, :]
    B = B * uB[:, :, None, :, None, None, None]
    B = B * dB[:, :, None, None, None, :, None]
    B = B * rB[:, :, None, None, :, None, None]
    sq = jnp.sqrt(sc)
    A = A * sq[:, :, None, None, :, None, None]   # A's r axis (central)
    B = B * sq[:, :, None, None, None, None, :]   # B's l axis (central)

    # QR-reduce both sides over their environment axes
    # A: env (u, d, l), keep (p, r=central)
    At = jnp.transpose(A, (0, 1, 3, 5, 6, 2, 4))   # (x, y, u, d, l, p, r)
    Am = At.reshape(Lx, nj, D * D * D, p * D)
    Qa, Ra = safe_qr(Am)
    kA = Ra.shape[-2]
    Ra = Ra.reshape(Lx, nj, kA, p, D)
    # B: env (u, d, r), keep (p, l=central)
    Bt = jnp.transpose(B, (0, 1, 3, 5, 4, 2, 6))   # (x, y, u, d, r, p, l)
    Bm = Bt.reshape(Lx, nj, D * D * D, p * D)
    Qb, Rb = safe_qr(Bm)
    kB = Rb.shape[-2]
    Rb = Rb.reshape(Lx, nj, kB, p, D)

    # gate the two-site core
    theta = jnp.einsum("xyipc,xyjqc->xyipqj", Ra, Rb)
    theta = jnp.einsum("xyipqj,xyPQpq->xyiPQj", theta, U)
    M = theta.reshape(Lx, nj, kA * p, p * kB)

    # truncate back to D
    if _use_sub_split():
        Um, s, Vm = _topd_split(M, D)
    else:
        Um, s, Vm = safe_svd(M)
        Um = Um[..., :, :D]
        s = s[..., :D]
        Vm = Vm[..., :D, :]
    s = s / jnp.maximum(
        jnp.linalg.norm(s, axis=-1, keepdims=True), 1e-30
    )

    a_red = Um.reshape(Lx, nj, kA, p, D)
    b_red = jnp.transpose(
        Vm.reshape(Lx, nj, D, p, kB), (0, 1, 4, 3, 2)
    )  # (x, y, kB, p, D_new)

    # un-reduce
    Anew = jnp.einsum("xyek,xykpc->xyepc", Qa, a_red)
    Anew = Anew.reshape(Lx, nj, D, D, D, p, D)     # (u, d, l, p, c)
    Anew = jnp.transpose(Anew, (0, 1, 5, 2, 6, 3, 4))
    Bnew = jnp.einsum("xyek,xykpc->xyepc", Qb, b_red)
    Bnew = Bnew.reshape(Lx, nj, D, D, D, p, D)     # (u, d, r, p, c=l)
    Bnew = jnp.transpose(Bnew, (0, 1, 5, 2, 4, 3, 6))

    # remove the environment gauges
    Anew = Anew / uA[:, :, None, :, None, None, None]
    Anew = Anew / dA[:, :, None, None, None, :, None]
    Anew = Anew / lA[:, :, None, None, None, None, :]
    Bnew = Bnew / uB[:, :, None, :, None, None, None]
    Bnew = Bnew / dB[:, :, None, None, None, :, None]
    Bnew = Bnew / rB[:, :, None, None, :, None, None]

    # condition: unit-norm site tensors (reference condition_tensors)
    na = jnp.sqrt(jnp.sum(
        jnp.abs(Anew) ** 2, axis=(2, 3, 4, 5, 6), keepdims=True
    ))
    Anew = Anew / jnp.maximum(na, 1e-30)
    nb = jnp.sqrt(jnp.sum(
        jnp.abs(Bnew) ** 2, axis=(2, 3, 4, 5, 6), keepdims=True
    ))
    Bnew = Bnew / jnp.maximum(nb, 1e-30)

    S = S.at[:, csA].set(Anew)
    S = S.at[:, csB].set(Bnew)
    GH = GH.at[:, csA].set(s.astype(GH.dtype))
    return S, GH, GV


def _transpose_lattice(S, GH, GV):
    """Swap the lattice axes: (i, j) -> (j, i), u <-> r, d <-> l."""
    St = jnp.transpose(S, (1, 0, 2, 4, 3, 6, 5))
    return St, jnp.transpose(GV, (1, 0, 2)), jnp.transpose(GH, (1, 0, 2))


def _su_sweep(S, GH, GV, UHe, UHo, UVe, UVo, masks_h, masks_v, smudge):
    """One full simple-update sweep: H-even, H-odd, V-even, V-odd."""
    Ly = S.shape[1]
    S, GH, GV = _h_class_update(S, GH, GV, UHe, 0, smudge)
    if Ly > 2:
        S, GH, GV = _h_class_update(S, GH, GV, UHo, 1, smudge)
    S = _apply_masks(S, masks_h)

    S, GH, GV = _transpose_lattice(S, GH, GV)
    Lx_t = S.shape[1]  # transposed Ly = original Lx
    S, GH, GV = _h_class_update(S, GH, GV, UVe, 0, smudge)
    if Lx_t > 2:
        S, GH, GV = _h_class_update(S, GH, GV, UVo, 1, smudge)
    S = _apply_masks(S, masks_v)
    S, GH, GV = _transpose_lattice(S, GH, GV)
    return S, GH, GV


@functools.partial(jax.jit, static_argnames=("nsteps", "smudge"))
def _su_evolve(S, GH, GV, UHe, UHo, UVe, UVo, masks_h, masks_v,
               nsteps, smudge):
    """``nsteps`` fused sweeps as one compiled ``lax.scan`` program —
    a whole ``evolve()`` call is a single device dispatch."""

    def step(carry, _):
        S, GH, GV = carry
        S, GH, GV = _su_sweep(
            S, GH, GV, UHe, UHo, UVe, UVo, masks_h, masks_v, smudge
        )
        return (S, GH, GV), None

    (S, GH, GV), _ = jax.lax.scan(
        step, (S, GH, GV), None, length=nsteps
    )
    return S, GH, GV


# --------------------------------------------------------------------------
# host-side conversion
# --------------------------------------------------------------------------


def _site_axes(psi, i, j):
    """Map each index of psi[i, j] to one of 'purdl'."""
    t = psi[psi.site_tag(i, j)]
    pix = psi.site_ind(i, j)
    amap = {}
    for ax, ix in enumerate(t.inds):
        if ix == pix:
            amap["p"] = ax
            continue
        for role, coo in (("u", (i + 1, j)), ("r", (i, j + 1)),
                          ("d", (i - 1, j)), ("l", (i, j - 1))):
            if 0 <= coo[0] < psi.Lx and 0 <= coo[1] < psi.Ly:
                other = psi[psi.site_tag(*coo)]
                if ix in other.inds and role not in amap:
                    amap[role] = ax
                    break
    return t, amap


def peps_to_stacks(psi, gauges, D):
    """Extract the (S, GH, GV) stacks from a PEPS + gauge dict,
    zero-padding every bond to width ``D``."""
    Lx, Ly = psi.Lx, psi.Ly
    p = psi.phys_dim()
    S = None
    for i in range(Lx):
        for j in range(Ly):
            t, amap = _site_axes(psi, i, j)
            a = np.asarray(to_host(t.data))
            if S is None:
                S = np.zeros((Lx, Ly, p, D, D, D, D), dtype=a.dtype)
            # permute present axes into (p, u, r, d, l) order, then
            # insert size-1 axes for the missing (virtual) ones
            order = [amap[c] for c in "purdl" if c in amap]
            a = np.transpose(a, order)
            sh = list(a.shape)
            full = []
            k = 0
            for c in "purdl":
                if c in amap:
                    full.append(sh[k])
                    k += 1
                else:
                    full.append(1)
            a = a.reshape(full)
            S[i, j, :full[0], :full[1], :full[2], :full[3], :full[4]] \
                = a

    rdt = S.real.dtype if np.iscomplexobj(S) else S.dtype
    GH = np.zeros((Lx, max(Ly - 1, 0), D), dtype=rdt)
    GV = np.zeros((max(Lx - 1, 0), Ly, D), dtype=rdt)
    for i in range(Lx):
        for j in range(Ly - 1):
            key = tuple(sorted(((i, j), (i, j + 1))))
            s = gauges.get(key)
            if s is None:
                # fresh bond: implicit identity gauge on the existing
                # bond width (get_state() then reproduces the input)
                b = min(
                    _bond_size(psi, (i, j), (i, j + 1)) or 1, D
                )
                GH[i, j, :b] = 1.0
            else:
                s = np.asarray(to_host(s))
                GH[i, j, :min(len(s), D)] = s[:D]
    for i in range(Lx - 1):
        for j in range(Ly):
            key = tuple(sorted(((i, j), (i + 1, j))))
            s = gauges.get(key)
            if s is None:
                b = min(
                    _bond_size(psi, (i, j), (i + 1, j)) or 1, D
                )
                GV[i, j, :b] = 1.0
            else:
                s = np.asarray(to_host(s))
                GV[i, j, :min(len(s), D)] = s[:D]
    return to_device(S), to_device(GH), to_device(GV)


def _bond_size(psi, a, b):
    ta = psi[psi.site_tag(*a)]
    tb = psi[psi.site_tag(*b)]
    for ix in ta.inds:
        if ix in tb.inds:
            return ta.ind_size(ix)
    return None


def stacks_to_peps(S, GH, GV, template):
    """Rebuild a PEPS (+ gauge dict) from the stacks, slicing away the
    virtual boundary axes."""
    from .core import PEPS

    Lx, Ly = template.Lx, template.Ly
    Sh = np.asarray(to_host(S))
    GHh = np.asarray(to_host(GH))
    GVh = np.asarray(to_host(GV))

    arrays = []
    for i in range(Lx):
        row = []
        for j in range(Ly):
            a = Sh[i, j]                      # (p, u, r, d, l)
            a = np.transpose(a, (1, 2, 3, 4, 0))  # urdlp
            # slice away virtual axes
            sel = [
                slice(None) if i < Lx - 1 else 0,
                slice(None) if j < Ly - 1 else 0,
                slice(None) if i > 0 else 0,
                slice(None) if j > 0 else 0,
                slice(None),
            ]
            row.append(a[tuple(sel)])
        arrays.append(row)

    psi = PEPS(
        arrays, shape="urdlp",
        site_ind_id=template.site_ind_id,
        site_tag_id=template.site_tag_id,
        x_tag_id=template._x_tag_id,
        y_tag_id=template._y_tag_id,
    )
    gauges = {}
    for i in range(Lx):
        for j in range(Ly - 1):
            key = tuple(sorted(((i, j), (i, j + 1))))
            gauges[key] = to_device(GHh[i, j])
    for i in range(Lx - 1):
        for j in range(Ly):
            key = tuple(sorted(((i, j), (i + 1, j))))
            gauges[key] = to_device(GVh[i, j])
    return psi, gauges


def host_gate_stack(ham, wheres, x, p, dtype):
    """Stack of ``expm(x * H_w)`` gates for a class of bonds, built on
    host (tiny matrices; one transfer for the whole stack). ``x`` must
    be real (imaginary-time simple update)."""
    mats = []
    for w in wheres:
        H = np.asarray(to_host(ham.get_term(w)), dtype=np.float64)
        wv, V = np.linalg.eigh(H)
        U = (V * np.exp(float(x) * wv)) @ V.conj().T
        mats.append(U.reshape(p, p, p, p))
    out = np.stack(mats).astype(dtype)
    return out


def class_gate_stacks(ham, Lx, Ly, x, p, dtype):
    """The four per-class gate stacks (UHe, UHo, UVe, UVo), each with
    batch shape matching the class's (rows, n_bonds) layout."""

    def h_stack(o):
        js = range(o, Ly - 1, 2)
        ws = [((i, j), (i, j + 1)) for i in range(Lx) for j in js]
        nj = len(list(js))
        if nj == 0:
            return np.zeros((Lx, 0, p, p, p, p), dtype=dtype)
        return host_gate_stack(ham, ws, x, p, dtype).reshape(
            Lx, nj, p, p, p, p
        )

    def v_stack(o):
        # transposed lattice: rows = original columns j, bonds over i
        i_s = range(o, Lx - 1, 2)
        ws = [((i, j), (i + 1, j)) for j in range(Ly) for i in i_s]
        ni = len(list(i_s))
        if ni == 0:
            return np.zeros((Ly, 0, p, p, p, p), dtype=dtype)
        return host_gate_stack(ham, ws, x, p, dtype).reshape(
            Ly, ni, p, p, p, p
        )

    return (
        to_device(h_stack(0)), to_device(h_stack(1)),
        to_device(v_stack(0)), to_device(v_stack(1)),
    )
