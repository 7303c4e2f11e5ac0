"""PEPS/PEPO builders (2D slice of reference tensor_builder.py)."""

import itertools

import jax.numpy as jnp
import numpy as np

from ...config import get_default_dtype, get_default_real_dtype
from ...gen.rand import randn
from .core import PEPO, PEPS


def PEPS_rand(Lx, Ly, bond_dim, phys_dim=2, normalize=False, dtype=None,
              seed=None, **peps_opts):
    """Random PEPS of shape (Lx, Ly) with given bond dimension."""
    dtype = dtype or get_default_real_dtype()
    rng_seed = seed
    arrays = []
    s = 0
    for i in range(Lx):
        row = []
        for j in range(Ly):
            shape = []
            if i < Lx - 1:
                shape.append(bond_dim)  # u
            if j < Ly - 1:
                shape.append(bond_dim)  # r
            if i > 0:
                shape.append(bond_dim)  # d
            if j > 0:
                shape.append(bond_dim)  # l
            shape.append(phys_dim)
            row.append(randn(
                tuple(shape), dtype=dtype,
                seed=None if seed is None else seed + s,
            ))
            s += 1
        arrays.append(row)
    psi = PEPS(arrays, shape="urdlp", **peps_opts)
    if normalize:
        psi.normalize()
    return psi


def PEPS_product_state(site_map, Lx=None, Ly=None, **peps_opts):
    """PEPS from a map of (i, j) -> single-site vector, or a 2D
    nested sequence of vectors (reference ``PEPS.product_state``
    tn2d/core.py:4980 accepts both)."""
    if not isinstance(site_map, dict):
        rows = list(site_map)
        site_map = {
            (i, j): v
            for i, row in enumerate(rows)
            for j, v in enumerate(row)
        }
    if Lx is None:
        Lx = max(c[0] for c in site_map) + 1
    if Ly is None:
        Ly = max(c[1] for c in site_map) + 1
    arrays = []
    for i in range(Lx):
        row = []
        for j in range(Ly):
            v = jnp.reshape(jnp.asarray(site_map[(i, j)]), (-1,))
            shape = [1] * sum((
                i < Lx - 1, j < Ly - 1, i > 0, j > 0
            )) + [v.size]
            row.append(jnp.reshape(v, shape))
        arrays.append(row)
    return PEPS(arrays, shape="urdlp", **peps_opts)


def PEPS_computational_state(binary, Lx=None, Ly=None, dtype=None,
                             **peps_opts):
    """PEPS for a computational product state. ``binary`` may be a
    string (row-major) or 2D array of 0/1."""
    dtype = dtype or get_default_real_dtype()
    if isinstance(binary, str):
        if Lx is None or Ly is None:
            raise ValueError("need Lx, Ly for a flat string")
        arr = np.array([int(b) for b in binary]).reshape(Lx, Ly)
    else:
        arr = np.asarray(binary)
        Lx, Ly = arr.shape
    site_map = {}
    for i, j in itertools.product(range(Lx), range(Ly)):
        v = np.zeros(2)
        v[arr[i, j]] = 1.0
        site_map[(i, j)] = jnp.asarray(v, dtype=dtype)
    return PEPS_product_state(site_map, Lx, Ly, **peps_opts)


def PEPS_zeros(Lx, Ly, bond_dim, phys_dim=2, dtype=None, **peps_opts):
    dtype = dtype or get_default_real_dtype()
    arrays = []
    for i in range(Lx):
        row = []
        for j in range(Ly):
            shape = []
            if i < Lx - 1:
                shape.append(bond_dim)
            if j < Ly - 1:
                shape.append(bond_dim)
            if i > 0:
                shape.append(bond_dim)
            if j > 0:
                shape.append(bond_dim)
            shape.append(phys_dim)
            row.append(jnp.zeros(shape, dtype=dtype))
        arrays.append(row)
    return PEPS(arrays, shape="urdlp", **peps_opts)


def PEPO_identity(Lx, Ly, phys_dim=2, dtype=None, **pepo_opts):
    """Identity PEPO."""
    dtype = dtype or get_default_real_dtype()
    II = jnp.eye(phys_dim, dtype=dtype)
    arrays = []
    for i in range(Lx):
        row = []
        for j in range(Ly):
            nb = sum((i < Lx - 1, j < Ly - 1, i > 0, j > 0))
            row.append(jnp.reshape(
                II, (1,) * nb + (phys_dim, phys_dim)
            ))
        arrays.append(row)
    return PEPO(arrays, shape="urdlbk", **pepo_opts)


def PEPO_rand(Lx, Ly, bond_dim, phys_dim=2, herm=False, dtype=None,
              seed=None, **pepo_opts):
    dtype = dtype or get_default_real_dtype()
    arrays = []
    s = 0
    for i in range(Lx):
        row = []
        for j in range(Ly):
            shape = []
            if i < Lx - 1:
                shape.append(bond_dim)
            if j < Ly - 1:
                shape.append(bond_dim)
            if i > 0:
                shape.append(bond_dim)
            if j > 0:
                shape.append(bond_dim)
            shape.extend((phys_dim, phys_dim))
            a = randn(tuple(shape), dtype=dtype,
                      seed=None if seed is None else seed + s)
            if herm:
                a = a + jnp.conj(jnp.swapaxes(a, -2, -1))
            row.append(a)
            s += 1
        arrays.append(row)
    return PEPO(arrays, shape="urdlbk", **pepo_opts)


def PEPO_product_operator(arrays, **pepo_opts):
    """Bond-dimension-1 PEPO of a tensor product of one-site operators
    ``arrays[i][j]`` (reference ``PEPO_product_operator``
    tensor_builder.py:4655)."""
    import jax.numpy as jnp

    arrays = tuple(tuple(x for x in xs) for xs in arrays)
    Lx, Ly = len(arrays), len(arrays[0])
    reshaped = []
    for i in range(Lx):
        row = []
        for j in range(Ly):
            arr = jnp.asarray(arrays[i][j])
            shape = []
            if i < Lx - 1:
                shape.append(1)
            if j < Ly - 1:
                shape.append(1)
            if i > 0:
                shape.append(1)
            if j > 0:
                shape.append(1)
            shape.extend(arr.shape)
            row.append(jnp.reshape(arr, tuple(shape)))
        reshaped.append(row)
    return PEPO(reshaped, shape="urdlbk", **pepo_opts)
