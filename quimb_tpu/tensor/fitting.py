"""TN-to-TN distance and fitting (ALS / autodiff).

Re-design of reference ``quimb/tensor/fitting.py``
(``tensor_network_distance`` :9, autodiff fit :156, ALS fit with
optional CG :297,:451)."""

import jax.numpy as jnp
import numpy as np

from .core import Tensor, TensorNetwork, bonds


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
    enforce_pos=False, pos_smudge=1e-15, inplace=False, progbar=False,
    **contract_opts,
):
    """Fit ``tn`` to ``tn_target`` by alternating least squares on each
    tensor (reference ``tensor_network_fit_als`` fitting.py:297).

    For each tensor t the normal equations ``N t = b`` are formed from
    its environment in <A|A> and <A|B> (outer indices of t act as
    identity/batch dimensions) and solved as one small device solve
    with multiple right-hand sides."""
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

            if enforce_pos:
                w, V = jnp.linalg.eigh(Nmat)
                w = jnp.clip(w.real, pos_smudge, None)
                x = V @ (
                    (jnp.conj(V.T) @ bmat) / w[:, None].astype(bmat.dtype)
                )
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
