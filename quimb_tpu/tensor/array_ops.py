"""Backend array operations for tensors: fuse/unfuse, norms, and
structure finders (diagonals, anti-diagonals, trivial columns).

Re-design of reference ``quimb/tensor/array_ops.py`` (fuse :96,
find_diag_axes :285, find_antidiag_axes :382, find_columns :484) for jax:
the fuse/unfuse permutation+reshape compiles into the surrounding XLA
program; the structure finders are *host-side, setup-time* utilities used
by the simplification pipeline (SURVEY §2 C16 notes these are not hot).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def asarray(x):
    from ..ops.backend import to_device

    if x.__class__.__name__ == "PArray":
        # lazy parametrized array — keep unmaterialized
        return x
    if isinstance(x, jax.Array):
        return x
    if isinstance(x, np.generic):
        # numpy scalar (e.g. einsum 0-d output): same treatment as a
        # host ndarray, just coerced to one
        x = np.asarray(x)
    if isinstance(x, np.ndarray) and x.dtype != object:
        # under the numpy contract-backend context (host-side
        # setup-time graph rewrites: simplification, small circuit
        # marginals) tensors keep their host arrays — no device
        # round-trip per rewrite
        from ..ops.contraction import get_contract_backend

        if get_contract_backend() == "numpy":
            return x
    return to_device(x)


def ndim(x):
    if x.__class__.__name__ == "PArray":
        return x.ndim
    return len(jnp.shape(x))


def do_conj(x):
    # host numpy in -> host numpy out: eagerly jnp-ing a host array
    # implicitly device_puts it, which for complex/f64 data is
    # UNIMPLEMENTED through the TPU tunnel (and a pointless round trip
    # during setup-time graph surgery regardless)
    if isinstance(x, np.ndarray):
        return np.conj(x)
    return jnp.conj(x)


def norm_fro(x):
    """Frobenius norm."""
    if isinstance(x, np.ndarray):
        return np.linalg.norm(x.reshape(-1))
    return jnp.linalg.norm(jnp.reshape(x, (-1,)))


def sensibly_scale(x):
    """Scale an array to have frobenius norm equal to its number of
    elements**0.5 (useful to avoid under/overflow)."""
    return x / (norm_fro(x) / x.size**0.5)


@functools.lru_cache(2**10)
def calc_fuse_perm_and_shape(shape, axes_groups):
    """Compute the permutation and final shape to fuse ``axes_groups``
    of an array with ``shape`` (cached host-side, mirroring the
    reference's cached perm/shape calc array_ops.py:96)."""
    ndim = len(shape)
    grouped = [ax for grp in axes_groups for ax in grp]
    rest = [ax for ax in range(ndim) if ax not in grouped]
    # groups are inserted at the position of their first axis
    pos = {id(grp): min(grp) for grp in map(tuple, axes_groups)}
    # order: all axes, with each group contiguous at position of first axis
    order = []
    new_shape = []
    gidx = 0
    groups = [tuple(g) for g in axes_groups]
    placed = set()
    for ax in range(ndim):
        if ax in placed:
            continue
        ingroup = None
        for grp in groups:
            if ax == grp[0]:
                ingroup = grp
                break
        if ingroup is not None:
            order.extend(ingroup)
            placed.update(ingroup)
            new_shape.append(int(np.prod([shape[a] for a in ingroup])))
        elif ax not in grouped:
            order.append(ax)
            placed.add(ax)
            new_shape.append(shape[ax])
        # axes that are in a group but not first: skipped (placed later)
    return tuple(order), tuple(new_shape)


def fuse(x, *axes_groups):
    """Fuse multiple groups of axes into single axes, each group placed
    at the position of its first member."""
    perm, new_shape = calc_fuse_perm_and_shape(
        tuple(jnp.shape(x)), tuple(map(tuple, axes_groups))
    )
    if isinstance(x, np.ndarray):
        return np.transpose(x, perm).reshape(new_shape)
    return jnp.reshape(jnp.transpose(x, perm), new_shape)


def reshape(x, shape):
    if isinstance(x, np.ndarray):
        return x.reshape(shape)
    return jnp.reshape(x, shape)


def multiply_diagonal(x, v, axis):
    """Multiply ``x`` by a vector ``v`` broadcast along ``axis`` — i.e.
    contract a diagonal matrix diag(v) into that axis."""
    shape = [1] * ndim(x)
    shape[axis] = -1
    if isinstance(x, np.ndarray) and isinstance(v, np.ndarray):
        return x * v.astype(x.dtype).reshape(shape)
    return x * jnp.reshape(v.astype(x.dtype), shape)


def align_axes(*arrays, axes):
    """No-op placeholder for block-sparse alignment (dense arrays are
    always aligned)."""
    return arrays


def isblocksparse(x):
    return False


def isfermionic(x):
    return False


# ---------------------------------------------------------------------------
# host-side structure finders (simplification pipeline helpers)
# ---------------------------------------------------------------------------


def to_host(x):
    from ..ops.backend import to_host as _th

    return _th(x)


def _host(x):
    return to_host(x)


def find_diag_axes(x, atol=1e-12):
    """Find a pair of axes along which ``x`` is diagonal (zero whenever
    the two indices differ), if any (reference array_ops.py:285)."""
    xh = _host(x)
    nd = xh.ndim
    for i in range(nd):
        for j in range(i + 1, nd):
            if xh.shape[i] != xh.shape[j]:
                continue
            d = xh.shape[i]
            # move axes to front
            y = np.moveaxis(xh, (i, j), (0, 1)).reshape(d, d, -1)
            offdiag = y.copy()
            offdiag[np.arange(d), np.arange(d)] = 0
            if np.abs(offdiag).max(initial=0) <= atol:
                return (i, j)
    return None


def find_antidiag_axes(x, atol=1e-12):
    """Find axes along which ``x`` is anti-diagonal (reference
    array_ops.py:382)."""
    xh = _host(x)
    nd = xh.ndim
    for i in range(nd):
        for j in range(i + 1, nd):
            if xh.shape[i] != xh.shape[j]:
                continue
            d = xh.shape[i]
            y = np.moveaxis(xh, (i, j), (0, 1)).reshape(d, d, -1)
            offanti = y.copy()
            offanti[np.arange(d), d - 1 - np.arange(d)] = 0
            if np.abs(offanti).max(initial=0) <= atol:
                return (i, j)
    return None


def find_columns(x, atol=1e-12):
    """Find an axis with only a single nonzero slice — i.e. the tensor
    is a 'column' along it — returning (axis, col_index)
    (reference array_ops.py:484)."""
    xh = _host(x)
    nd = xh.ndim
    for i in range(nd):
        y = np.moveaxis(xh, i, 0).reshape(xh.shape[i], -1)
        nonzero = np.abs(y).max(axis=1) > atol
        if nonzero.sum() == 1:
            return (i, int(np.argmax(nonzero)))
    return None
