"""TN-to-TN distance and fitting (ALS / CG / tree-gauge / autodiff).

Re-design of reference ``quimb/tensor/fitting.py``
(``tensor_network_distance`` :9, autodiff fit :156, ALS fit with
optional CG solve :297,:451, ``conjugate_gradient`` :257,
``tensor_network_fit_tree`` :608)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .core import Tensor, TensorNetwork, bonds
from .networking import (
    compute_hierarchical_ordering,
    get_path_between_tids,
)


@functools.partial(jax.jit, static_argnames=("maxiter",))
def conjugate_gradient(A, b, x0=None, tol=1e-5, maxiter=1000):
    """CG solve of ``A x = b`` for a hermitian (complex-ok) matrix,
    with matrix right-hand sides treated column-batched (reference
    ``conjugate_gradient`` fitting.py:257). One compiled fixed-bound
    loop with a convergence mask — once converged, further iterations
    are frozen no-ops, so the program stays shape-static on TPU."""
    if x0 is None:
        x0 = jnp.zeros_like(b)

    def vdot_b(u, v):
        # per-column inner products, broadcast over trailing dims
        return jnp.sum(jnp.conj(u) * v, axis=0, keepdims=True)

    def body(state):
        x, r, p, rsold, k = state
        Ap = A @ p
        denom = vdot_b(p, Ap)
        alpha = rsold / jnp.where(denom == 0, 1, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        rsnew = vdot_b(r, r)
        beta = rsnew / jnp.where(rsold == 0, 1, rsold)
        p = r + beta * p
        return x, r, p, rsnew, k + 1

    def cond(state):
        _, _, _, rs, k = state
        return (k < maxiter) & (
            jnp.max(jnp.sqrt(jnp.abs(rs))) >= tol
        )

    r0 = b - A @ x0
    state = (x0, r0, r0, vdot_b(r0, r0), jnp.asarray(0))
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


def _as_tn(x):
    if isinstance(x, Tensor):
        return TensorNetwork((x,), virtual=True, check_collisions=False)
    return x


def tensor_network_distance(
    tnA, tnB, xAA=None, xAB=None, xBB=None, method="auto",
    normalized=False, **contract_opts,
):
    """Frobenius distance |A - B| between two TNs viewed as vectors
    over their outer indices (reference ``tensor_network_distance``
    fitting.py:9): sqrt(<A|A> - 2Re<A|B> + <B|B>)."""
    tnA = _as_tn(tnA)
    tnB = _as_tn(tnB)
    oix = set(tnA.outer_inds())
    if oix != set(tnB.outer_inds()):
        raise ValueError(
            "can only compute distance between networks with matching "
            "outer indices"
        )
    if xAA is None:
        xAA = (tnA | tnA.conj(mangle_inner=True)).contract(
            ..., **contract_opts)
    if xAB is None:
        xAB = (tnA | tnB.conj(mangle_inner=True)).contract(
            ..., **contract_opts)
    if xBB is None:
        xBB = (tnB | tnB.conj(mangle_inner=True)).contract(
            ..., **contract_opts)
    d2 = abs(complex(xAA) - 2 * complex(xAB).real + complex(xBB))
    d = d2**0.5
    if normalized:
        denom = (abs(complex(xAA)) ** 0.5 + abs(complex(xBB)) ** 0.5) / 2
        d = d / denom
    return d


def tensor_network_fit_als(
    tn, tn_target, tags=None, steps=100, tol=1e-9, solver="solve",
    solver_maxiter=4, enforce_pos=False, pos_smudge=1e-15,
    inplace=False, progbar=False, **contract_opts,
):
    """Fit ``tn`` to ``tn_target`` by alternating least squares on each
    tensor (reference ``tensor_network_fit_als`` fitting.py:297,
    solver options :375-423).

    For each tensor t the normal equations ``N t = b`` are formed from
    its environment in <A|A> and <A|B> (outer indices of t act as
    identity/batch dimensions) and solved as one small device solve
    with multiple right-hand sides. ``solver`` options:

    - ``'solve'``: direct dense solve (with a tiny trace-scaled ridge).
    - ``'cg'``: :func:`conjugate_gradient` warm-started from the
      current tensor — ``solver_maxiter`` compiled iterations.
    - ``'lstsq'``: least squares (robust to singular N).
    - ``'eigh'``: eigendecompose N and clip (same as ``enforce_pos``).
    """
    tn_fit = tn if inplace else tn.copy()
    tn_target = _as_tn(tn_target)
    outer = set(tn_fit.outer_inds())

    if tags is None:
        tids = tuple(tn_fit.tensor_map)
    else:
        tids = tuple(tn_fit._get_tids_from_tags(tags, "any"))

    xBB = complex((
        tn_target | tn_target.conj(mangle_inner=True)
    ).contract(..., **contract_opts))

    old_d = None
    for step in range(steps):
        for tid in tids:
            t = tn_fit.tensor_map[tid]
            solve_inds = [ix for ix in t.inds if ix not in outer]
            batch_inds = [ix for ix in t.inds if ix in outer]
            star = {ix: ix + "__star__" for ix in solve_inds}

            # --- N: env of (t, t†) in <A|A>
            ket = tn_fit.copy()
            ket._pop_tensor(tid)
            bra = tn_fit.conj()
            bra._pop_tensor(tid)
            bra.reindex_({
                ix: star[ix] for ix in solve_inds if ix in bra.ind_map
            })
            bra.mangle_inner_(which=[
                ix for ix in bra.inner_inds()
                if ix not in outer and ix not in star.values()
            ])
            envN = ket & bra
            N_out = [star[ix] for ix in solve_inds] + solve_inds
            tN = envN.contract(
                ..., output_inds=tuple(N_out), preserve_tensor=True,
                **contract_opts,
            )
            dl = int(np.prod([t.ind_size(ix) for ix in solve_inds]))
            Nmat = jnp.reshape(tN.data, (dl, dl))

            # --- b: env of t† in <A†|B>
            braB = tn_fit.conj()
            braB._pop_tensor(tid)
            braB.reindex_({
                ix: star[ix] for ix in solve_inds
                if ix in braB.ind_map
            })
            braB.mangle_inner_(which=[
                ix for ix in braB.inner_inds()
                if ix not in outer and ix not in star.values()
            ])
            envB = braB & tn_target.copy()
            b_out = [star[ix] for ix in solve_inds] + batch_inds
            tb = envB.contract(
                ..., output_inds=tuple(b_out), preserve_tensor=True,
                **contract_opts,
            )
            db = int(np.prod(
                [t.ind_size(ix) for ix in batch_inds]
            )) if batch_inds else 1
            bmat = jnp.reshape(tb.data, (dl, db))

            if enforce_pos or solver == "eigh":
                w, V = jnp.linalg.eigh(Nmat)
                w = jnp.clip(w.real, pos_smudge, None)
                x = V @ (
                    (jnp.conj(V.T) @ bmat) / w[:, None].astype(bmat.dtype)
                )
            elif solver == "cg":
                x0 = jnp.reshape(
                    t.transpose(*solve_inds, *batch_inds).data, (dl, db)
                ).astype(bmat.dtype)
                x = conjugate_gradient(
                    Nmat, bmat, x0=x0, maxiter=solver_maxiter
                )
            elif solver == "lstsq":
                x = jnp.linalg.lstsq(Nmat, bmat)[0]
            else:
                eps = pos_smudge * abs(complex(jnp.trace(Nmat))) \
                    / max(dl, 1)
                x = jnp.linalg.solve(
                    Nmat + eps * jnp.eye(dl, dtype=Nmat.dtype), bmat
                )
            new = jnp.reshape(
                x, [t.ind_size(ix) for ix in solve_inds] +
                [t.ind_size(ix) for ix in batch_inds],
            )
            t.modify(data=new, inds=(*solve_inds, *batch_inds))

        d = tensor_network_distance(
            tn_fit, tn_target, xBB=xBB, **contract_opts
        )
        if progbar:
            print(f"als step {step}: distance {d}")
        if old_d is not None and abs(old_d - d) < tol:
            break
        old_d = d
    return tn_fit


def tensor_network_fit_tree(
    tn, tn_target, tags=None, steps=100, tol=1e-9, ordering=None,
    xBB=None, istree=True, inplace=False, progbar=False,
    **contract_opts,
):
    """Fit ``tn`` — assumed to have tree structure (a single path
    between any two tensors) — to ``tn_target`` (reference
    ``tensor_network_fit_tree`` fitting.py:608).

    The tree gauge makes the local least-squares problem trivial: with
    the canonical center at tensor ``t``, the environment of ``t`` in
    <A|A> is the identity, so the optimal update is just the
    contraction of <A|B>'s hole — no normal-matrix solve at all. The
    canonical center is moved between consecutive tensors along the
    tree path, so each sweep is O(n) canonizations + hole
    contractions, each a single device program.

    ``istree=False`` falls back to pseudo-canonicalization around each
    tensor (gauging as-tree within a distance), which is approximate
    for loopy ``tn`` but often effective."""
    tn_target = _as_tn(tn_target)
    if xBB is None:
        xBB = abs(complex((
            tn_target | tn_target.conj(mangle_inner=True)
        ).contract(..., **contract_opts)))

    # work on the conjugate so holes in <A|B> directly give updates
    tn_fit = tn.conj(inplace=inplace)
    tnAB = tn_fit & tn_target.copy()  # virtual: sees tn_fit updates

    if ordering is None:
        if tags is not None:
            tids = tuple(tn_fit._get_tids_from_tags(tags, "any"))
            ordering = tuple(
                tid for tid in compute_hierarchical_ordering(tn_fit)
                if tid in set(tids)
            )
        else:
            ordering = compute_hierarchical_ordering(tn_fit)

    # precompute hole networks + canonization moves between successive
    # centers (virtual holes share tensors with tn_fit, so later
    # canonizations are automatically reflected)
    env_contractions = []
    for i, tid in enumerate(ordering):
        tn_hole = tnAB.copy(virtual=True)
        ti = tn_hole._pop_tensor(tid)
        tid_prev = ordering[(i - 1) % len(ordering)]
        if tid_prev == tid:
            canon_pairs = []
        else:
            path = get_path_between_tids(tn_fit, tid_prev, tid)
            ptids = path.tids
            canon_pairs = [
                (ptids[j], ptids[j + 1]) for j in range(len(ptids) - 1)
            ]
        env_contractions.append((tid, tn_hole, ti, canon_pairs))

    tn_fit._canonize_around_tids([ordering[0]])

    old_d = None
    for step in range(steps):
        for tid, tn_hole, ti, canon_pairs in env_contractions:
            if istree:
                for tidi, tidj in canon_pairs:
                    tn_fit._canonize_between_tids(tidi, tidj)
            else:
                tn_fit._canonize_around_tids([tid])
            ti_new = tn_hole.contract(
                ..., output_inds=ti.inds, preserve_tensor=True,
                **contract_opts,
            )
            ti.modify(data=jnp.conj(ti_new.data))

        # canonical form: <A|A> = |t|^2 = <A|B>, so the normalized
        # distance needs only the center norm and xBB
        xAA = float(ti.norm()) ** 2
        d = 2 * abs(xBB - xAA) ** 0.5 / (xBB**0.5 + xAA**0.5)
        if progbar:
            print(f"tree fit step {step}: distance {d}")
        if old_d is not None and abs(old_d - d) < tol:
            break
        old_d = d

    return tn_fit.conj_()


def tensor_network_fit_autodiff(
    tn, tn_target, steps=1000, tol=1e-9, init="current",
    autodiff_backend="jax", inplace=False, progbar=False, **kwargs,
):
    """Fit by gradient descent on |A-B|^2 (reference
    ``tensor_network_fit_autodiff`` fitting.py:156)."""
    from .optimize import TNOptimizer

    tn_fit = tn if inplace else tn.copy()
    tn_target = _as_tn(tn_target)
    xBB = complex((
        tn_target | tn_target.conj(mangle_inner=True)
    ).contract(...))

    def loss(tn_v, tn_target=tn_target):
        tnc = tn_v.conj(mangle_inner=True)
        xAA = (tn_v | tnc).contract(...)
        xAB = (tn_v.conj(mangle_inner=True) | tn_target).contract(...)
        return jnp.real(xAA) - 2 * jnp.real(xAB) + abs(xBB)

    opt = TNOptimizer(
        tn_fit, loss, progbar=progbar, **kwargs
    )
    out = opt.optimize(steps, tol=tol)
    if inplace:
        tn.set_params(out.get_params())
        return tn
    return out
