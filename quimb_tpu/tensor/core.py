"""Tensor and TensorNetwork — the graph-of-arrays core.

TPU-native re-design of the heart of the reference
(``quimb/tensor/tensor_core.py``: ``Tensor`` :1917, ``TensorNetwork``
:4047, ``tensor_contract`` :224, ``tensor_split`` :392,
``tensor_canonize_bond`` :671, ``tensor_compress_bond`` :546, tid/tag/ind
maps :4262-4311).

Architectural split (SURVEY §7): TN objects are **host-side bookkeeping**
— dicts of index names, tags and tensor ids, cheap to mutate — while the
leaves are immutable ``jax.Array``s. Every numerical operation funnels into
the jitted kernels of :mod:`quimb_tpu.ops` (contraction expressions cached
by geometry, truncated splits). Algorithms (DMRG/TEBD/…) jit *functions of
the leaves* and use these objects only to organize them.

Mutability semantics match the reference: tensors know their owning
networks (weakrefs) and propagate index renames; selecting with
``virtual=True`` returns views sharing the same Tensor objects, which is
what makes e.g. the DMRG energy-TN track the evolving state for free.
"""

import collections
import copy as _copy
import functools
import itertools
import math
import operator
import string
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import decomp
from ..ops.contraction import (
    array_contract,
    array_contract_expression,
    find_output_inds,
    get_contract_strategy,
    inds_to_eq,
)
from ..utils import check_opt, oset, valmap
from . import array_ops as ar

# ---------------------------------------------------------------------------
# index/tag helpers
# ---------------------------------------------------------------------------

_UUID_COUNTER = itertools.count()
_RAND_PREFIX = "".join(
    np.random.default_rng().choice(list(string.ascii_lowercase), 4)
)


def rand_uuid(base=""):
    """Return a fresh unique index/tag name like ``base_a4f3k``."""
    return f"{base}_{_RAND_PREFIX}{next(_UUID_COUNTER)}"


def tags_to_oset(tags):
    """Parse a ``tags`` argument into an oset of strings."""
    if tags is None:
        return oset()
    if isinstance(tags, (str, int)):
        return oset((tags,))
    if isinstance(tags, oset):
        return tags.copy()
    return oset(tags)


def asinds(inds):
    if inds is None:
        return ()
    if isinstance(inds, str):
        return (inds,)
    return tuple(inds)


def bonds(t1, t2):
    """The indices shared between tensors (or networks) ``t1``/``t2``."""
    i1 = t1.inds if isinstance(t1, Tensor) else t1.all_inds()
    i2 = set(t2.inds if isinstance(t2, Tensor) else t2.all_inds())
    return oset(ix for ix in i1 if ix in i2)


def bonds_size(t1, t2):
    """Total size of the bond(s) between two tensors."""
    p = 1
    for ix in bonds(t1, t2):
        p *= t1.ind_size(ix)
    return p


def group_inds(t1, t2):
    """Group indices into (left-only, shared, right-only)."""
    shared = bonds(t1, t2)
    left = [ix for ix in t1.inds if ix not in shared]
    right = [ix for ix in t2.inds if ix not in shared]
    return left, list(shared), right


# ---------------------------------------------------------------------------
# module-level tensor functions
# ---------------------------------------------------------------------------


def tensor_contract(
    *tensors,
    output_inds=None,
    optimize=None,
    get=None,
    backend=None,
    preserve_tensor=False,
    drop_tags=False,
    **kwargs,
):
    """Contract a collection of tensors into one
    (reference ``tensor_contract`` tensor_core.py:224).

    Returns a scalar if no output indices remain (unless
    ``preserve_tensor``), else a new :class:`Tensor`.
    """
    inputs = [t.inds for t in tensors]
    if output_inds is None:
        output_inds = find_output_inds(inputs)
    else:
        output_inds = tuple(output_inds)

    if get == "expression":
        return array_contract_expression(
            inputs, output_inds,
            shapes=[t.shape for t in tensors], optimize=optimize,
        )

    data = array_contract(
        [t.data for t in tensors], inputs, output_inds,
        optimize=optimize, backend=backend,
    )

    if not output_inds and not preserve_tensor:
        return data

    tags = oset()
    if not drop_tags:
        for t in tensors:
            tags.update(t.tags)
    return Tensor(data=data, inds=output_inds, tags=tags)


def tensor_split(
    T,
    left_inds,
    method="svd",
    get=None,
    absorb="both",
    max_bond=None,
    cutoff=1e-10,
    cutoff_mode="rsum2",
    renorm=None,
    ltags=None,
    rtags=None,
    stags=None,
    bond_ind=None,
    right_inds=None,
    info=None,
    **split_opts,
):
    """Decompose tensor ``T`` into two (or three) tensors
    (reference ``tensor_split`` tensor_core.py:392).

    Fuses ``left_inds``/``right_inds`` into a matrix, runs the S0 split
    engine, and unfuses. ``get`` may be None (a TensorNetwork), 'tensors',
    'arrays', or 'values'.
    """
    if left_inds is None:
        left_inds = oset(T.inds) - oset(asinds(right_inds))
    left_inds = asinds(left_inds)
    if right_inds is None:
        right_inds = tuple(ix for ix in T.inds if ix not in left_inds)
    else:
        right_inds = asinds(right_inds)

    TT = T.transpose(*left_inds, *right_inds)
    left_dims = TT.shape[: len(left_inds)]
    right_dims = TT.shape[len(left_inds):]
    ml = int(np.prod(left_dims)) if left_dims else 1
    mr = int(np.prod(right_dims)) if right_dims else 1
    array = jnp.reshape(TT.data, (ml, mr))

    left, s, right = decomp.array_split(
        array,
        method=method,
        absorb=absorb,
        max_bond=max_bond,
        cutoff=cutoff,
        cutoff_mode=cutoff_mode,
        renorm=renorm,
        info=info,
        **split_opts,
    )

    if get == "values":
        return s

    if get == "arrays":
        out = []
        if left is not None:
            out.append(jnp.reshape(left, (*left_dims, -1)))
        if s is not None:
            out.append(s)
        if right is not None:
            out.append(jnp.reshape(right, (-1, *right_dims)))
        return tuple(out)

    bond_ind = bond_ind or rand_uuid()
    ltags = T.tags | tags_to_oset(ltags)
    rtags = T.tags | tags_to_oset(rtags)

    tensors = []
    if left is not None:
        Tl = Tensor(
            data=jnp.reshape(left, (*left_dims, -1)),
            inds=(*left_inds, bond_ind), tags=ltags,
        )
        tensors.append(Tl)
    if s is not None and absorb is None:
        stags_ = T.tags | tags_to_oset(stags)
        Ts = Tensor(data=s, inds=(bond_ind,), tags=stags_)
        tensors.append(Ts)
    if right is not None:
        Tr = Tensor(
            data=jnp.reshape(right, (-1, *right_dims)),
            inds=(bond_ind, *right_inds), tags=rtags,
        )
        tensors.append(Tr)

    if get == "tensors":
        return tensors if len(tensors) > 1 else tensors[0]

    return TensorNetwork(tensors, virtual=True)


@jax.jit
def _jmm(a, b):
    """Jitted matmul — eager ``@`` on complex arrays is UNIMPLEMENTED
    on the TPU backend, compiled matmuls are fine."""
    return a @ b


def tensor_canonize_bond(T1, T2, absorb="right", gauges=None, **split_opts):
    """Canonize the bond between two tensors: make ``T1`` isometric by
    QR-ing it and absorbing R into ``T2`` (reference
    ``tensor_canonize_bond`` tensor_core.py:671). In-place on both."""
    check_opt("absorb", absorb, ("left", "right", "both"))
    if absorb == "left":
        return tensor_canonize_bond(T2, T1, absorb="right", **split_opts)

    shared = list(bonds(T1, T2))
    if not shared:
        raise ValueError("tensors have no shared bond")
    left_inds = [ix for ix in T1.inds if ix not in shared]

    if absorb == "both":
        # symmetric gauge via truncation-free compression
        return tensor_compress_bond(
            T1, T2, absorb="both", cutoff=0.0, **split_opts
        )

    method = split_opts.pop("method", "qr")
    Q, _, R = decomp.array_split(
        jnp.reshape(
            T1.transpose(*left_inds, *shared).data,
            (int(np.prod([T1.ind_size(i) for i in left_inds]) or 1), -1),
        ),
        method=method, cutoff=-1.0,
    )
    # new bond may shrink to min(dims)
    new_bond_size = Q.shape[-1]
    if len(shared) > 1:
        # fuse multiple bonds into one
        bix = rand_uuid()
    else:
        bix = shared[0]

    left_dims = [T1.ind_size(i) for i in left_inds]
    T1.modify(
        data=jnp.reshape(Q, (*left_dims, new_bond_size)),
        inds=(*left_inds, bix),
        left_inds=None,
    )
    t2_other = [ix for ix in T2.inds if ix not in shared]
    T2t = T2.transpose(*shared, *t2_other)
    d_other = [T2.ind_size(i) for i in t2_other]
    new_t2 = _jmm(R, jnp.reshape(T2t.data, (R.shape[-1], -1)))
    T2.modify(
        data=jnp.reshape(new_t2, (new_bond_size, *d_other)),
        inds=(bix, *t2_other),
        left_inds=None,
    )
    return T1, T2


def tensor_compress_bond(
    T1,
    T2,
    reduced=True,
    absorb="both",
    max_bond=None,
    cutoff=1e-10,
    info=None,
    **compress_opts,
):
    """Truncate the bond between two tensors using reduced-SVD
    (reference ``tensor_compress_bond`` tensor_core.py:546): QR both
    sides, SVD the small core, absorb factors back. In-place."""
    shared = list(bonds(T1, T2))
    if not shared:
        raise ValueError("tensors have no shared bond")
    l1 = [ix for ix in T1.inds if ix not in shared]
    r2 = [ix for ix in T2.inds if ix not in shared]

    if reduced:
        # QR reductions: T1 = Q1 R1, T2 = R2 Q2
        Q1, _, R1 = decomp.array_split(
            jnp.reshape(
                T1.transpose(*l1, *shared).data,
                (int(np.prod([T1.ind_size(i) for i in l1]) or 1), -1),
            ),
            method="qr", cutoff=-1.0,
        )
        L2, _, Q2 = decomp.lq_stabilized(
            jnp.reshape(
                T2.transpose(*shared, *r2).data,
                (-1, int(np.prod([T2.ind_size(i) for i in r2]) or 1)),
            )
        )
        core = _jmm(R1, L2)
        U, s, VH = decomp.array_split(
            core, method="svd", absorb=absorb, max_bond=max_bond,
            cutoff=cutoff, info=info, **compress_opts,
        )
        new_l = _jmm(Q1, U)
        new_r = _jmm(VH, Q2)
    else:
        theta = jnp.reshape(
            tensor_contract(
                T1, T2, output_inds=(*l1, *r2), preserve_tensor=True
            ).data,
            (int(np.prod([T1.ind_size(i) for i in l1]) or 1), -1),
        )
        new_l, s, new_r = decomp.array_split(
            theta, method="svd", absorb=absorb, max_bond=max_bond,
            cutoff=cutoff, info=info, **compress_opts,
        )

    bix = shared[0] if len(shared) == 1 else rand_uuid()
    chi = new_l.shape[-1]
    d1 = [T1.ind_size(i) for i in l1]
    d2 = [T2.ind_size(i) for i in r2]
    T1.modify(
        data=jnp.reshape(new_l, (*d1, chi)), inds=(*l1, bix), left_inds=None
    )
    T2.modify(
        data=jnp.reshape(new_r, (chi, *d2)), inds=(bix, *r2), left_inds=None
    )
    if absorb is None and s is not None:
        return T1, s, T2
    return T1, T2


def tensor_balance_bond(t1, t2, smudge=1e-6):
    """Scale the shared bond of two tensors so each has equal norm along
    it (reference ``tensor_balance_bond`` tensor_core.py)."""
    (ix,) = bonds(t1, t2)
    x1 = t1.transpose(ix, *[i for i in t1.inds if i != ix]).data
    x2 = t2.transpose(ix, *[i for i in t2.inds if i != ix]).data
    n1 = jnp.linalg.norm(
        jnp.reshape(x1, (x1.shape[0], -1)), axis=1
    ) + smudge
    n2 = jnp.linalg.norm(
        jnp.reshape(x2, (x2.shape[0], -1)), axis=1
    ) + smudge
    s = jnp.sqrt(n2 / n1)
    t1.multiply_index_diagonal_(ix, s)
    t2.multiply_index_diagonal_(ix, 1 / s)


def new_bond(T1, T2, size=1, name=None, axis1=0, axis2=0):
    """Add a new (size-``size``, zero-padded if > 1) bond between two
    tensors (reference ``new_bond`` tensor_core.py)."""
    name = name or rand_uuid()
    T1.new_ind(name, size=size, axis=axis1)
    T2.new_ind(name, size=size, axis=axis2)


def tensor_direct_product(T1, T2, sum_inds=(), inplace=False):
    """Direct product (block-diagonal sum) of two tensors over all
    non-``sum_inds``."""
    sum_inds = asinds(sum_inds)
    if set(T1.inds) != set(T2.inds):
        raise ValueError("tensors must have the same indices")
    T2t = T2.transpose_like(T1)
    pads = [
        (0, 0) if ix in sum_inds else (0, T2t.ind_size(ix))
        for ix in T1.inds
    ]
    pads2 = [
        (0, 0) if ix in sum_inds else (T1.ind_size(ix), 0)
        for ix in T1.inds
    ]
    new_data = jnp.pad(T1.data, pads) + jnp.pad(T2t.data, pads2)
    if inplace:
        T1.modify(data=new_data)
        return T1
    return Tensor(new_data, inds=T1.inds, tags=T1.tags | T2.tags)


# ---------------------------------------------------------------------------
# Tensor
# ---------------------------------------------------------------------------


class Tensor:
    """A labelled, tagged multidimensional array.

    Parameters mirror the reference (tensor_core.py:1917): ``data`` any
    array-like (stored as ``jax.Array``), ``inds`` a sequence of index
    names matching ``data.ndim``, ``tags`` an optional set of string tags,
    ``left_inds`` an optional isometric grouping.
    """

    __slots__ = ("_data", "_inds", "_tags", "_left_inds", "_owners")

    def __init__(self, data=1.0, inds=(), tags=None, left_inds=None):
        if isinstance(data, Tensor):
            self._data = data.data
            self._inds = data.inds
            self._tags = data.tags.copy()
            self._left_inds = data.left_inds
            self._owners = {}
            return

        self._data = ar.asarray(data)
        # note: a plain string is iterated to single-char indices,
        # matching the reference constructor's ``tuple(inds)``
        self._inds = tuple(inds)
        self._tags = tags_to_oset(tags)
        self._left_inds = asinds(left_inds) if left_inds is not None else None
        self._owners = {}

        if len(self._inds) != ar.ndim(self._data):
            raise ValueError(
                f"Wrong number of inds {self._inds} supplied for array"
                f" of shape {jnp.shape(self._data)}."
            )

    # -- owner management (reference tensor_core.py:2118-2160) -----------

    def add_owner(self, tn, tid):
        self._owners[hash(tn)] = (weakref.ref(tn), tid)

    def remove_owner(self, tn):
        self._owners.pop(hash(tn), None)

    def check_owners(self):
        """Remove dead owners, return whether any remain."""
        dead = [k for k, (ref, _) in self._owners.items() if ref() is None]
        for k in dead:
            del self._owners[k]
        return len(self._owners) > 0

    @property
    def owners(self):
        return self._owners

    def modify(self, apply=None, data=None, inds=None, tags=None,
               left_inds=...):
        """Overwrite the data/inds/tags of this tensor in place, keeping
        owner networks' maps in sync."""
        if apply is not None:
            self._data = ar.asarray(apply(self._data))
        if data is not None:
            self._data = ar.asarray(data)
            if inds is None and ar.ndim(self._data) != len(self._inds):
                raise ValueError("New data shape incompatible with inds.")
        if inds is not None:
            inds = asinds(inds)
            if len(inds) != ar.ndim(self._data):
                raise ValueError("New inds incompatible with data.")
            old = self._inds
            self._inds = inds
            if old != inds and self.check_owners():
                for ref, tid in tuple(self._owners.values()):
                    tn = ref()
                    if tn is not None:
                        tn._modify_tensor_inds(old, inds, tid)
        if tags is not None:
            tags = tags_to_oset(tags)
            old_tags = self._tags
            self._tags = tags
            if old_tags != tags and self.check_owners():
                for ref, tid in tuple(self._owners.values()):
                    tn = ref()
                    if tn is not None:
                        tn._modify_tensor_tags(old_tags, tags, tid)
        if left_inds is not ...:
            self._left_inds = (
                asinds(left_inds) if left_inds is not None else None
            )

    # -- basic properties -------------------------------------------------

    @property
    def data(self):
        return self._data

    @property
    def inds(self):
        return self._inds

    @property
    def tags(self):
        return self._tags

    @property
    def left_inds(self):
        return self._left_inds

    @left_inds.setter
    def left_inds(self, left_inds):
        self._left_inds = asinds(left_inds) if left_inds is not None else None

    @property
    def shape(self):
        return tuple(jnp.shape(self._data))

    @property
    def ndim(self):
        return len(self._inds)

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def dtype(self):
        return self._data.dtype

    def ind_size(self, ind):
        return self.shape[self._inds.index(ind)]

    def shared_bond_size(self, other):
        return bonds_size(self, other)

    def inner_inds(self):
        freq = collections.Counter(self._inds)
        return tuple(ix for ix, c in freq.items() if c > 1)

    # -- copying -----------------------------------------------------------

    def copy(self, deep=False, virtual=False):
        if virtual:
            return self
        t = Tensor.__new__(Tensor)
        t._data = self._data
        t._inds = self._inds
        t._tags = self._tags.copy()
        t._left_inds = self._left_inds
        t._owners = {}
        return t

    __copy__ = copy

    def __getstate__(self):
        return (ar.to_host(self._data), self._inds, tuple(self._tags),
                self._left_inds)

    def __setstate__(self, state):
        data, inds, tags, left_inds = state
        self._data = ar.asarray(data)
        self._inds = inds
        self._tags = oset(tags)
        self._left_inds = left_inds
        self._owners = {}

    # -- tag/index manipulation --------------------------------------------

    def add_tag(self, tag):
        self.modify(tags=self._tags | tags_to_oset(tag))

    def drop_tags(self, tags=None):
        if tags is None:
            self.modify(tags=oset())
        else:
            self.modify(tags=self._tags - tags_to_oset(tags))

    def retag(self, retag_map, inplace=False):
        t = self if inplace else self.copy()
        t.modify(
            tags=oset(retag_map.get(tag, tag) for tag in t._tags)
        )
        return t

    retag_ = functools.partialmethod(retag, inplace=True)

    def reindex(self, index_map, inplace=False):
        t = self if inplace else self.copy()
        new_inds = tuple(index_map.get(ix, ix) for ix in t._inds)
        new_left = (
            tuple(index_map.get(ix, ix) for ix in t._left_inds)
            if t._left_inds is not None else None
        )
        t.modify(inds=new_inds, left_inds=new_left)
        return t

    reindex_ = functools.partialmethod(reindex, inplace=True)

    # -- data transforms ----------------------------------------------------

    def conj(self, inplace=False):
        t = self if inplace else self.copy()
        t.modify(apply=jnp.conj)
        return t

    conj_ = functools.partialmethod(conj, inplace=True)

    @property
    def H(self):
        """Conjugated copy."""
        return self.conj()

    def transpose(self, *output_inds, inplace=False):
        t = self if inplace else self.copy()
        output_inds = asinds(output_inds if len(output_inds) != 1
                             else output_inds[0])
        if set(output_inds) != set(t._inds):
            raise ValueError(
                f"'output_inds' must be a permutation of the tensor's "
                f"inds, got {output_inds} vs {t._inds}."
            )
        if output_inds == t._inds:
            return t
        perm = tuple(t._inds.index(ix) for ix in output_inds)
        t.modify(
            data=jnp.transpose(t._data, perm), inds=output_inds
        )
        return t

    transpose_ = functools.partialmethod(transpose, inplace=True)

    def transpose_like(self, other, inplace=False):
        t = self if inplace else self.copy()
        if set(t.inds) == set(other.inds):
            return t.transpose(*other.inds, inplace=True)
        # partial ordering: sort own inds by position in other
        order = {ix: i for i, ix in enumerate(other.inds)}
        new = sorted(t.inds, key=lambda ix: order.get(ix, math.inf))
        return t.transpose(*new, inplace=True)

    transpose_like_ = functools.partialmethod(transpose_like, inplace=True)

    def moveindex(self, ind, axis, inplace=False):
        t = self if inplace else self.copy()
        new = [ix for ix in t._inds if ix != ind]
        if axis < 0:
            axis += len(new) + 1
        new.insert(axis, ind)
        return t.transpose(*new, inplace=True)

    moveindex_ = functools.partialmethod(moveindex, inplace=True)

    def trace(self, left_inds, right_inds, preserve_tensor=False,
              inplace=False):
        """Trace over (sum the diagonal of) pairs of indices."""
        t = self if inplace else self.copy()
        if isinstance(left_inds, str):
            left_inds = (left_inds,)
        if isinstance(right_inds, str):
            right_inds = (right_inds,)
        remap = dict(zip(left_inds, right_inds))
        new_inds = tuple(
            remap.get(ix, ix) for ix in t._inds
        )
        out = tuple(ix for ix in dict.fromkeys(new_inds)
                    if new_inds.count(ix) == 1)
        label = {}
        for ix in new_inds:
            label.setdefault(ix, len(label))
        new_data = jnp.einsum(
            t._data, [label[ix] for ix in new_inds],
            [label[ix] for ix in out],
        )
        if not out and not preserve_tensor:
            return new_data
        t.modify(data=new_data, inds=out, left_inds=None)
        return t

    def sum_reduce(self, ind, inplace=False):
        t = self if inplace else self.copy()
        ax = t._inds.index(ind)
        t.modify(
            data=jnp.sum(t._data, axis=ax),
            inds=t._inds[:ax] + t._inds[ax + 1:], left_inds=None,
        )
        return t

    sum_reduce_ = functools.partialmethod(sum_reduce, inplace=True)

    def vector_reduce(self, ind, v, inplace=False):
        """Contract a vector with a single index."""
        t = self if inplace else self.copy()
        ax = t._inds.index(ind)
        t.modify(
            data=jnp.tensordot(t._data, jnp.asarray(v).astype(t.dtype),
                               axes=((ax,), (0,))),
            inds=t._inds[:ax] + t._inds[ax + 1:], left_inds=None,
        )
        return t

    vector_reduce_ = functools.partialmethod(vector_reduce, inplace=True)

    def collapse_repeated(self, inplace=False):
        """Take the diagonal of any repeated indices."""
        t = self if inplace else self.copy()
        if len(set(t._inds)) == len(t._inds):
            return t
        label = {}
        for ix in t._inds:
            label.setdefault(ix, len(label))
        out = tuple(dict.fromkeys(t._inds))
        t.modify(
            data=jnp.einsum(t._data, [label[ix] for ix in t._inds],
                            [label[ix] for ix in out]),
            inds=out, left_inds=None,
        )
        return t

    def multiply_index_diagonal(self, ind, x, inplace=False):
        """Multiply the axis ``ind`` by the diagonal matrix diag(x)."""
        t = self if inplace else self.copy()
        t.modify(
            data=ar.multiply_diagonal(
                t._data, jnp.asarray(x), t._inds.index(ind)
            )
        )
        return t

    multiply_index_diagonal_ = functools.partialmethod(
        multiply_index_diagonal, inplace=True
    )

    def isel(self, selectors, inplace=False):
        """Select specific values of some indices (dropping them)."""
        t = self if inplace else self.copy()
        slices = tuple(
            selectors.get(ix, slice(None)) for ix in t._inds
        )
        new_inds = tuple(ix for ix in t._inds if ix not in selectors)
        t.modify(data=t._data[slices], inds=new_inds, left_inds=None)
        return t

    isel_ = functools.partialmethod(isel, inplace=True)

    def expand_ind(self, ind, size, mode="zeros", rand_strength=None):
        """Expand the size of index ``ind`` to ``size``, zero-padding
        (or noise-padding) the new entries."""
        ax = self._inds.index(ind)
        d = self.shape[ax]
        if size <= d:
            return
        pads = [(0, 0)] * self.ndim
        pads[ax] = (0, size - d)
        new = jnp.pad(self._data, pads)
        if mode == "rand" or (rand_strength or 0) > 0:
            strength = rand_strength if rand_strength else 1e-6
            key = jax.random.PRNGKey(abs(hash((ind, size))) % (2**31))
            noise = strength * jax.random.normal(
                key, new.shape, dtype=new.real.dtype
            ).astype(new.dtype)
            mask = jnp.zeros(new.shape, bool).at[
                tuple(slice(None) if i != ax else slice(d, None)
                      for i in range(self.ndim))
            ].set(True)
            new = jnp.where(mask, noise, new)
        self.modify(data=new)

    def new_ind(self, name, size=1, axis=0, mode="zeros"):
        """Add a new index of size 1 (then optionally expand)."""
        new_inds = list(self._inds)
        if axis < 0:
            axis += len(new_inds) + 1
        new_inds.insert(axis, name)
        self.modify(
            data=jnp.expand_dims(self._data, axis), inds=tuple(new_inds)
        )
        if size > 1:
            self.expand_ind(name, size, mode=mode)

    new_ind_ = new_ind

    def fuse(self, fuse_map, inplace=False):
        """Fuse groups of indices into single indices.

        ``fuse_map`` is a dict ``{new_ind: (old_ind1, old_ind2, ...)}``
        or sequence of such pairs.
        """
        t = self if inplace else self.copy()
        items = (
            fuse_map.items() if isinstance(fuse_map, dict) else fuse_map
        )
        items = [(new, asinds(olds)) for new, olds in items]
        fused_set = {ix for _, olds in items for ix in olds}
        # new index order: each group at front, in order, then the rest
        new_inds = [new for new, _ in items] + [
            ix for ix in t._inds if ix not in fused_set
        ]
        order = []
        shape = []
        for new, olds in items:
            order.extend(t._inds.index(ix) for ix in olds)
            shape.append(
                int(np.prod([t.ind_size(ix) for ix in olds]))
            )
        for ix in t._inds:
            if ix not in fused_set:
                order.append(t._inds.index(ix))
                shape.append(t.ind_size(ix))
        t.modify(
            data=jnp.reshape(jnp.transpose(t._data, order), shape),
            inds=tuple(new_inds), left_inds=None,
        )
        return t

    fuse_ = functools.partialmethod(fuse, inplace=True)

    def unfuse(self, unfuse_map, shape_map, inplace=False):
        """Reverse of fuse: ``unfuse_map = {old: (new1, new2, ...)}``,
        ``shape_map = {old: (d1, d2, ...)}``."""
        t = self if inplace else self.copy()
        new_inds = []
        new_shape = []
        for ix in t._inds:
            if ix in unfuse_map:
                new_inds.extend(unfuse_map[ix])
                new_shape.extend(shape_map[ix])
            else:
                new_inds.append(ix)
                new_shape.append(t.ind_size(ix))
        t.modify(
            data=jnp.reshape(t._data, new_shape), inds=tuple(new_inds),
            left_inds=None,
        )
        return t

    unfuse_ = functools.partialmethod(unfuse, inplace=True)

    def to_dense(self, *inds_seq, to_qarray=False):
        """Fuse index groups and return the raw (matrix) array."""
        if not inds_seq:
            return self.data
        fuse_map = [(rand_uuid(), asinds(g)) for g in inds_seq]
        t = self.fuse(fuse_map)
        return t.data

    def squeeze(self, include=None, exclude=None, inplace=False):
        """Drop all size-1 indices."""
        t = self if inplace else self.copy()
        keep_inds = []
        for ix, d in zip(t._inds, t.shape):
            removable = d == 1
            if include is not None and ix not in include:
                removable = False
            if exclude is not None and ix in exclude:
                removable = False
            if not removable:
                keep_inds.append(ix)
        if len(keep_inds) != t.ndim:
            slices = tuple(
                slice(None) if ix in keep_inds else 0 for ix in t._inds
            )
            t.modify(
                data=t._data[slices], inds=tuple(keep_inds), left_inds=None
            )
        return t

    squeeze_ = functools.partialmethod(squeeze, inplace=True)

    def norm(self):
        """Frobenius norm."""
        return ar.norm_fro(self._data)

    def normalize(self, inplace=False):
        t = self if inplace else self.copy()
        t.modify(apply=lambda d: d / ar.norm_fro(d))
        return t

    normalize_ = functools.partialmethod(normalize, inplace=True)

    def symmetrize(self, ind1, ind2, inplace=False):
        t = self if inplace else self.copy()
        perm = list(range(t.ndim))
        a1, a2 = t._inds.index(ind1), t._inds.index(ind2)
        perm[a1], perm[a2] = perm[a2], perm[a1]
        t.modify(data=(t._data + jnp.transpose(t._data, perm)) / 2)
        return t

    def isometrize(self, left_inds=None, method="qr", inplace=False):
        """Project into isometric form w.r.t. ``left_inds``."""
        t = self if inplace else self.copy()
        left_inds = asinds(left_inds if left_inds is not None
                           else t.left_inds)
        right_inds = tuple(ix for ix in t._inds if ix not in left_inds)
        tt = t.transpose(*left_inds, *right_inds)
        dl = [t.ind_size(i) for i in left_inds]
        dr = [t.ind_size(i) for i in right_inds]
        mat = jnp.reshape(tt.data, (int(np.prod(dl)), int(np.prod(dr))))
        Q = decomp.isometrize(mat, method=method)
        t.modify(
            data=jnp.reshape(Q, (*dl, *dr)),
            inds=(*left_inds, *right_inds),
            left_inds=left_inds,
        )
        return t

    isometrize_ = functools.partialmethod(isometrize, inplace=True)
    unitize = isometrize
    unitize_ = isometrize_

    def randomize(self, dtype=None, seed=None, inplace=False):
        t = self if inplace else self.copy()
        from ..gen.rand import randn

        t.modify(data=randn(t.shape, dtype=dtype or t.dtype, seed=seed))
        return t

    randomize_ = functools.partialmethod(randomize, inplace=True)

    def flip(self, ind, inplace=False):
        """Reverse the order of values along index ``ind``."""
        t = self if inplace else self.copy()
        ax = t._inds.index(ind)
        t.modify(data=jnp.flip(t._data, ax))
        return t

    flip_ = functools.partialmethod(flip, inplace=True)

    def largest_element(self):
        return jnp.max(jnp.abs(self._data))

    # -- splitting / gating --------------------------------------------------

    split = tensor_split

    def distance(self, other, **contract_opts):
        from .fitting import tensor_network_distance

        return tensor_network_distance(self, other, **contract_opts)

    def gate(self, G, ind, preserve_inds=True, inplace=False):
        """Apply matrix ``G`` to index ``ind``, keeping index name."""
        t = self if inplace else self.copy()
        G = jnp.asarray(G).astype(t.dtype)
        ax = t._inds.index(ind)
        new = jnp.tensordot(G, t._data, axes=((1,), (ax,)))
        new = jnp.moveaxis(new, 0, ax)
        t.modify(data=new)
        return t

    gate_ = functools.partialmethod(gate, inplace=True)

    # -- arithmetic ----------------------------------------------------------

    def _binary_op(self, other, op):
        if isinstance(other, Tensor):
            if set(self.inds) != set(other.inds):
                raise ValueError(
                    "Can only do arithmetic on tensors with matching inds."
                )
            o = other.transpose_like(self)
            return Tensor(
                op(self._data, o._data), inds=self._inds,
                tags=self._tags | other.tags,
            )
        return Tensor(op(self._data, other), inds=self._inds,
                      tags=self._tags.copy())

    def __add__(self, other):
        return self._binary_op(other, operator.add)

    def __radd__(self, other):
        return self._binary_op(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._binary_op(other, operator.sub)

    def __rsub__(self, other):
        return self._binary_op(other, lambda a, b: b - a)

    def __mul__(self, other):
        if isinstance(other, (Tensor, TensorNetwork)):
            if isinstance(other, TensorNetwork):
                return NotImplemented
            return self._binary_op(other, operator.mul)
        return self._binary_op(other, operator.mul)

    def __rmul__(self, other):
        return self._binary_op(other, lambda a, b: b * a)

    def __truediv__(self, other):
        return self._binary_op(other, operator.truediv)

    def __neg__(self):
        return Tensor(-self._data, self._inds, self._tags.copy())

    def __matmul__(self, other):
        """Contract with another tensor."""
        return tensor_contract(self, other)

    def __and__(self, other):
        """Combine into a TensorNetwork (virtual)."""
        return TensorNetwork((self, other), virtual=True)

    def __or__(self, other):
        """Combine into a TensorNetwork (copies)."""
        return TensorNetwork((self, other))

    def almost_equals(self, other, **kwargs):
        if set(self.inds) != set(other.inds):
            return False
        o = other.transpose_like(self)
        return np.allclose(
            np.asarray(self.data), np.asarray(o.data), **kwargs
        )

    def max_dim(self):
        return max(self.shape) if self.shape else 1

    def __repr__(self):
        return (
            f"{self.__class__.__name__}("
            f"shape={tuple(self.shape)}, inds={self._inds}, "
            f"tags={tuple(self._tags)})"
        )

    def __str__(self):
        return self.__repr__()

    def draw(self, *args, **kwargs):
        from .drawing import draw_tn

        return draw_tn(TensorNetwork((self,), virtual=True), *args, **kwargs)

    graph = draw


# alias used heavily downstream
def COPY_tensor(d, inds, tags=None, dtype=None):
    """A COPY (hyper/delta) tensor: 1 where all indices equal
    (reference tensor_core.py:3853)."""
    from ..config import get_default_dtype

    dtype = dtype or get_default_dtype()
    ndim = len(inds)
    data = jnp.zeros((d,) * ndim, dtype=dtype)
    idx = (jnp.arange(d),) * ndim
    data = data.at[idx].set(1.0)
    return Tensor(data, inds=inds, tags=tags)


# ---------------------------------------------------------------------------
# TensorNetwork
# ---------------------------------------------------------------------------


class TensorNetwork:
    """A collection of tensors forming a (hyper)graph, with tag and index
    maps for O(1) lookup (reference ``TensorNetwork`` tensor_core.py:4047,
    maps :4262-4311).

    ``virtual=True`` shares the given Tensor objects (views), else they
    are copied in. Combine networks/tensors with ``&`` (virtual) or ``|``
    (copy). The ``exponent`` attribute tracks a stripped scalar exponent
    (base 10) for magnitude control on huge networks
    (reference ``strip_exponent`` tensor_core.py:10501).
    """

    _EXTRA_PROPS = ()
    _CONTRACT_STRUCTURED = False

    def __init__(self, ts=(), *, virtual=False, check_collisions=True):
        self.tensor_map = {}
        self.tag_map = {}
        self.ind_map = {}
        self._inner_inds = None
        self._outer_inds = None
        self.exponent = 0.0

        if isinstance(ts, TensorNetwork):
            self.add_tensor_network(
                ts, virtual=virtual, check_collisions=check_collisions
            )
            self.exponent = ts.exponent
            for ep in ts.__class__._EXTRA_PROPS:
                setattr(self, ep, getattr(ts, ep))
            return

        for t in ts:
            self.add(t, virtual=virtual, check_collisions=check_collisions)

    # -- adding / removing ---------------------------------------------------

    def add_tensor(self, tensor, tid=None, virtual=False):
        if tid is None or tid in self.tensor_map:
            tid = rand_uuid("_T")
        t = tensor if virtual else tensor.copy()
        t.add_owner(self, tid)
        self.tensor_map[tid] = t
        for tag in t.tags:
            self.tag_map.setdefault(tag, oset()).add(tid)
        for ix in t.inds:
            self.ind_map.setdefault(ix, oset()).add(tid)
        return tid

    def add_tensor_network(self, tn, virtual=False, check_collisions=True):
        if check_collisions:
            clash = oset(tn.inner_inds()) & oset(self.ind_map)
            if clash:
                tn = tn.reindex({ix: rand_uuid() for ix in clash})
                virtual = True  # already copied by reindex
        for tid, t in tn.tensor_map.items():
            self.add_tensor(t, tid=tid, virtual=virtual)
        self.exponent = self.exponent + tn.exponent

    def add(self, t, virtual=False, check_collisions=True):
        if isinstance(t, TensorNetwork):
            self.add_tensor_network(
                t, virtual=virtual, check_collisions=check_collisions
            )
        elif isinstance(t, Tensor):
            self.add_tensor(t, virtual=virtual)
        else:
            raise TypeError(f"cannot add object of type {type(t)}")

    def _pop_tensor(self, tid):
        t = self.tensor_map.pop(tid)
        t.remove_owner(self)
        for tag in t.tags:
            tids = self.tag_map[tag]
            tids.discard(tid)
            if not tids:
                del self.tag_map[tag]
        for ix in t.inds:
            tids = self.ind_map[ix]
            tids.discard(tid)
            if not tids:
                del self.ind_map[ix]
        return t

    pop_tensor = _pop_tensor

    def remove_all_tensors(self):
        for tid in tuple(self.tensor_map):
            self._pop_tensor(tid)

    def delete(self, tags, which="all"):
        """Remove all tensors matching ``tags``."""
        for tid in tuple(self._get_tids_from_tags(tags, which)):
            self._pop_tensor(tid)

    # -- owner callbacks -------------------------------------------------------

    def _modify_tensor_inds(self, old, new, tid):
        for ix in old:
            tids = self.ind_map.get(ix)
            if tids is not None:
                tids.discard(tid)
                if not tids:
                    del self.ind_map[ix]
        for ix in new:
            self.ind_map.setdefault(ix, oset()).add(tid)

    def _modify_tensor_tags(self, old, new, tid):
        for tag in old:
            tids = self.tag_map.get(tag)
            if tids is not None:
                tids.discard(tid)
                if not tids:
                    del self.tag_map[tag]
        for tag in new:
            self.tag_map.setdefault(tag, oset()).add(tid)

    def __hash__(self):
        return id(self)

    # -- copying ----------------------------------------------------------------

    def copy(self, virtual=False, deep=False):
        """Copy this network. ``virtual=True`` shares tensors."""
        if deep:
            return _copy.deepcopy(self)
        new = object.__new__(self.__class__)
        TensorNetwork.__init__(new, self, virtual=virtual,
                               check_collisions=False)
        return new

    __copy__ = copy

    def __getstate__(self):
        d = {
            "tensors": [
                (tid, t.__getstate__()) for tid, t in self.tensor_map.items()
            ],
            "exponent": self.exponent,
            "extra": {ep: getattr(self, ep) for ep in self._EXTRA_PROPS},
        }
        return d

    def __setstate__(self, d):
        self.tensor_map = {}
        self.tag_map = {}
        self.ind_map = {}
        self._inner_inds = None
        self._outer_inds = None
        self.exponent = d.get("exponent", 0.0)
        for ep, v in d.get("extra", {}).items():
            setattr(self, ep, v)
        for tid, tstate in d["tensors"]:
            t = Tensor.__new__(Tensor)
            t.__setstate__(tstate)
            self.add_tensor(t, tid=tid, virtual=True)

    # -- conversion to subclasses ---------------------------------------------

    def view_as(self, cls, inplace=False, **kwargs):
        """View this network as ``cls`` (a TensorNetwork subclass),
        setting its extra structural props from kwargs."""
        tn = self if inplace else self.copy(virtual=False)
        tn.__class__ = cls
        for ep in cls._EXTRA_PROPS:
            attr = ep.lstrip("_")
            if attr in kwargs:
                setattr(tn, ep, kwargs.pop(attr))
            elif not hasattr(tn, ep):
                raise ValueError(f"view_as missing structural prop {ep}")
        if kwargs:
            raise ValueError(f"unused kwargs {kwargs}")
        return tn

    view_as_ = functools.partialmethod(view_as, inplace=True)

    def view_like(self, like, inplace=False):
        props = {
            ep.lstrip("_"): getattr(like, ep)
            for ep in like._EXTRA_PROPS
        }
        return self.view_as(like.__class__, inplace=inplace, **props)

    view_like_ = functools.partialmethod(view_like, inplace=True)

    # -- basic queries -----------------------------------------------------------

    @property
    def tensors(self):
        return tuple(self.tensor_map.values())

    @property
    def arrays(self):
        return tuple(t.data for t in self.tensor_map.values())

    def get_params(self):
        """Pytree of all tensor data, keyed by tid (for optimization /
        jax transformations — reference interface.py pack/unpack)."""
        return {tid: t.data for tid, t in self.tensor_map.items()}

    def set_params(self, params):
        for tid, data in params.items():
            self.tensor_map[tid].modify(data=data)

    @property
    def num_tensors(self):
        return len(self.tensor_map)

    @property
    def num_indices(self):
        return len(self.ind_map)

    def __len__(self):
        return len(self.tensor_map)

    def __iter__(self):
        return iter(self.tensor_map.values())

    def outer_inds(self):
        """Indices appearing exactly once."""
        return tuple(
            ix for ix, tids in self.ind_map.items()
            if len(tids) == 1 and
            sum(self.tensor_map[t].inds.count(ix) for t in tids) == 1
        )

    def inner_inds(self):
        return tuple(
            ix for ix, tids in self.ind_map.items()
            if not (len(tids) == 1 and sum(
                self.tensor_map[t].inds.count(ix) for t in tids) == 1)
        )

    def all_inds(self):
        return tuple(self.ind_map)

    def ind_size(self, ind):
        tid = next(iter(self.ind_map[ind]))
        return self.tensor_map[tid].ind_size(ind)

    def ind_sizes(self):
        return {ix: self.ind_size(ix) for ix in self.ind_map}

    def inds_size(self, inds):
        p = 1
        for ix in inds:
            p *= self.ind_size(ix)
        return p

    @property
    def shape(self):
        return tuple(self.ind_size(ix) for ix in self.outer_inds())

    @property
    def dtype(self):
        return next(iter(self.tensor_map.values())).dtype

    def max_bond(self):
        bonds_ = self.inner_inds()
        return max((self.ind_size(ix) for ix in bonds_), default=None)

    def bond(self, tags1, tags2):
        """The name of the bond between tensors tagged tags1/tags2."""
        (b,) = bonds(self[tags1], self[tags2])
        return b

    def bond_size(self, tags1, tags2):
        return bonds_size(self[tags1], self[tags2])

    # -- tid lookup ---------------------------------------------------------------

    def _get_tids_from(self, xmap, xs, which):
        inverse = which[0] == "!"
        if inverse:
            which = which[1:]
        check_opt("which", which, ("all", "any"))
        sets = []
        for x in xs:
            try:
                sets.append(xmap[x])
            except KeyError:
                if which == "all" and not inverse:
                    return oset()
                sets.append(oset())
        if which == "all":
            found = oset.intersection(*sets) if sets else oset()
        else:
            found = oset.union(*sets) if sets else oset()
        if inverse:
            return oset(self.tensor_map) - found
        return found

    def _get_tids_from_tags(self, tags, which="all"):
        if tags in (None, ..., all):
            return oset(self.tensor_map)
        tags = tags_to_oset(tags)
        return self._get_tids_from(self.tag_map, tags, which)

    def _get_tids_from_inds(self, inds, which="all"):
        inds = tags_to_oset(inds)
        return self._get_tids_from(self.ind_map, inds, which)

    def select_tensors(self, tags, which="all"):
        return tuple(
            self.tensor_map[tid]
            for tid in self._get_tids_from_tags(tags, which)
        )

    def select(self, tags, which="all", virtual=True):
        """Subnetwork of tensors matching ``tags``. Virtual by default —
        the returned network *shares* tensors with this one."""
        tids = self._get_tids_from_tags(tags, which)
        ts = (self.tensor_map[tid] for tid in tids)
        tn = TensorNetwork(ts, virtual=virtual, check_collisions=False)
        return tn

    select_any = functools.partialmethod(select, which="any")
    select_all = functools.partialmethod(select, which="all")

    def select_neighbors(self, tags, which="any"):
        """Tensors sharing an index with the tagged region (but not in
        it)."""
        tids = self._get_tids_from_tags(tags, which)
        inds = oset()
        for tid in tids:
            inds.update(self.tensor_map[tid].inds)
        neighbors = self._get_tids_from_inds(inds, "any") - tids
        return tuple(self.tensor_map[tid] for tid in neighbors)

    def _ind_to_subgraph_tids(self, start_tid, exclude_inds=()):
        """Flood-fill connected component containing ``start_tid``."""
        seen = {start_tid}
        queue = [start_tid]
        while queue:
            tid = queue.pop()
            for ix in self.tensor_map[tid].inds:
                if ix in exclude_inds:
                    continue
                for otid in self.ind_map.get(ix, ()):
                    if otid not in seen:
                        seen.add(otid)
                        queue.append(otid)
        return seen

    def subgraphs(self, virtual=False):
        """Split into connected components."""
        remaining = set(self.tensor_map)
        out = []
        while remaining:
            tid = next(iter(remaining))
            comp = self._ind_to_subgraph_tids(tid)
            remaining -= comp
            out.append(TensorNetwork(
                (self.tensor_map[t] for t in comp), virtual=virtual,
                check_collisions=False,
            ))
        return out

    def __getitem__(self, tags):
        """Get the single tensor, or network of tensors, matching
        ``tags``."""
        if isinstance(tags, slice):
            return self.select_any(self.maybe_convert_coo(tags))
        tensors = self.select_tensors(tags, "all")
        if not tensors:
            raise KeyError(f"no tensors matching {tags!r}")
        if len(tensors) == 1:
            return tensors[0]
        return TensorNetwork(tensors, virtual=True, check_collisions=False)

    def __setitem__(self, tags, tensor):
        tids = self._get_tids_from_tags(tags, "all")
        if len(tids) != 1:
            raise KeyError(
                f"'TensorNetwork.__setitem__' is meant for a single "
                f"existing tensor only - found {len(tids)} with tag(s) "
                f"'{tags}'."
            )
        if not isinstance(tensor, Tensor):
            raise TypeError("Can only set value with a new 'Tensor'.")
        (tid,) = tids
        self._pop_tensor(tid)
        self.add_tensor(tensor, tid=tid, virtual=True)

    def __delitem__(self, tags):
        for tid in tuple(self._get_tids_from_tags(tags, "all")):
            self._pop_tensor(tid)

    def maybe_convert_coo(self, x):
        return x

    # -- renaming -------------------------------------------------------------------

    def reindex(self, index_map, inplace=False):
        tn = self if inplace else self.copy()
        index_map = {
            k: v for k, v in index_map.items() if k in tn.ind_map
        }
        tids = oset()
        for ix in index_map:
            tids.update(tn.ind_map.get(ix, ()))
        for tid in tids:
            tn.tensor_map[tid].reindex_(index_map)
        return tn

    reindex_ = functools.partialmethod(reindex, inplace=True)

    def retag(self, tag_map, inplace=False):
        tn = self if inplace else self.copy()
        tids = oset()
        for tag in tag_map:
            tids.update(tn.tag_map.get(tag, ()))
        for tid in tids:
            tn.tensor_map[tid].retag_(tag_map)
        return tn

    retag_ = functools.partialmethod(retag, inplace=True)

    def add_tag(self, tag, where=None, which="all"):
        for tid in self._get_tids_from_tags(where, which):
            self.tensor_map[tid].add_tag(tag)

    def drop_tags(self, tags=None):
        for t in self.tensor_map.values():
            t.drop_tags(tags)
        return self

    def mangle_inner_(self, append=None, which=None):
        """Rename all inner indices to fresh unique names (optionally
        only those in ``which``)."""
        index_map = {}
        for ix in self.inner_inds():
            if which is not None and ix not in which:
                continue
            index_map[ix] = rand_uuid() if append is None else ix + append
        return self.reindex_(index_map)

    # -- data transforms ----------------------------------------------------------

    def conj(self, mangle_inner=False, inplace=False):
        tn = self if inplace else self.copy()
        for t in tn.tensor_map.values():
            t.conj_()
        if mangle_inner:
            tn.mangle_inner_(
                append=None if mangle_inner is True else mangle_inner
            )
        return tn

    conj_ = functools.partialmethod(conj, inplace=True)

    @property
    def H(self):
        return self.conj()

    def apply_to_arrays(self, fn):
        """Apply ``fn`` to every tensor's data."""
        for t in self.tensor_map.values():
            t.modify(apply=fn)
        return self

    def astype(self, dtype, inplace=False):
        tn = self if inplace else self.copy()
        return tn.apply_to_arrays(lambda x: x.astype(dtype))

    astype_ = functools.partialmethod(astype, inplace=True)

    def largest_element(self):
        return max(
            (float(t.largest_element()) for t in self.tensor_map.values()),
            default=0.0,
        )

    def norm(self, **contract_opts):
        """Frobenius norm sqrt(<TN|TN>) treating outer inds as one
        vector (reference tensor_core.py:4808)."""
        norm2 = self.conj() | self
        return jnp.sqrt(jnp.abs(norm2.contract(**contract_opts)))

    def multiply(self, x, spread_over=8, inplace=False):
        """Multiply the whole network by scalar ``x``, spread over
        several tensors to avoid under/overflow."""
        tn = self if inplace else self.copy()
        n = min(spread_over, tn.num_tensors)
        xi = x ** (1 / n) if (np.isrealobj(np.asarray(x)) and x >= 0) \
            else complex(x) ** (1 / n)
        for t, _ in zip(tn.tensor_map.values(), range(n)):
            t.modify(apply=lambda d: d * xi)
        return tn

    multiply_ = functools.partialmethod(multiply, inplace=True)

    def multiply_each(self, x, inplace=False):
        tn = self if inplace else self.copy()
        return tn.apply_to_arrays(lambda d: d * x)

    multiply_each_ = functools.partialmethod(multiply_each, inplace=True)

    def negate(self, inplace=False):
        tn = self if inplace else self.copy()
        next(iter(tn.tensor_map.values())).modify(apply=jnp.negative)
        return tn

    negate_ = functools.partialmethod(negate, inplace=True)

    def __mul__(self, other):
        return self.multiply(other)

    def __rmul__(self, other):
        return self.multiply(other)

    def __imul__(self, other):
        return self.multiply_(other)

    def __truediv__(self, other):
        return self.multiply(1 / other)

    def __itruediv__(self, other):
        return self.multiply_(1 / other)

    def __neg__(self):
        return self.negate()

    def __and__(self, other):
        return TensorNetwork((self, other), virtual=True)

    def __or__(self, other):
        return TensorNetwork((self, other))

    def __matmul__(self, other):
        """``tn1 @ tn2``: combine and fully contract — the standard
        inner-product shorthand (reference tensor_core.py
        ``TensorNetwork.__matmul__``)."""
        return TensorNetwork((self, other), virtual=True).contract(...)

    def __xor__(self, tags):
        """Contract tagged tensors: ``tn ^ tags`` or ``tn ^ ...``."""
        return self.contract(tags)

    def __ixor__(self, tags):
        return self.contract_(tags)

    def __rshift__(self, tags_seq):
        """Cumulative contract: ``tn >> [tags1, tags2, ...]``."""
        return self.contract_cumulative(tags_seq)

    # -- norm / exponent management --------------------------------------------------

    def strip_exponent(self, tid_or_tensor, value=None):
        """Scale a tensor to unit norm, accumulating log10 of the factor
        in ``self.exponent`` (reference tensor_core.py:10501)."""
        if value is None:
            if isinstance(tid_or_tensor, Tensor):
                t = tid_or_tensor
            else:
                t = self.tensor_map[tid_or_tensor]
            norm = float(t.norm())
            if norm == 0.0:
                return
            t.modify(apply=lambda d: d / norm)
            self.exponent += math.log10(norm)
        else:
            self.exponent += math.log10(float(value))

    def distribute_exponent(self):
        """Fold the accumulated exponent back into the tensors."""
        if self.exponent != 0.0:
            self.multiply_each_(10 ** (self.exponent / self.num_tensors))
            self.exponent = 0.0
        return self

    def equalize_norms(self, value=None, inplace=False):
        """Scale all tensors to equal (frobenius) norm, stripping the
        overall factor into ``exponent`` unless ``value`` given
        (reference tensor_core.py:10553)."""
        tn = self if inplace else self.copy()
        for t in tn.tensor_map.values():
            norm = float(t.norm())
            if norm == 0.0:
                continue
            t.modify(apply=lambda d, norm=norm: d / norm)
            tn.exponent += math.log10(norm)
        if value is not None:
            lv = math.log10(value)
            for t in tn.tensor_map.values():
                t.modify(apply=lambda d: d * 10 ** (lv))
                tn.exponent -= lv
        return tn

    equalize_norms_ = functools.partialmethod(equalize_norms, inplace=True)

    # -- contraction ----------------------------------------------------------------

    def contraction_info(self, output_inds=None, optimize=None):
        inputs = [t.inds for t in self.tensor_map.values()]
        if output_inds is None:
            output_inds = self.outer_inds()
        return array_contract_expression(
            inputs, output_inds,
            shapes=[t.shape for t in self.tensor_map.values()],
            optimize=optimize,
        )

    def contraction_cost(self, optimize=None, **kwargs):
        return self.contraction_info(optimize=optimize, **kwargs).flops

    def contraction_width(self, optimize=None, **kwargs):
        return self.contraction_info(optimize=optimize, **kwargs).width

    def contraction_path(self, optimize=None, **kwargs):
        from ..ops.paths import ssa_to_linear

        info = self.contraction_info(optimize=optimize, **kwargs)
        return ssa_to_linear(info.path, len(info.inputs))

    contraction_tree = contraction_info

    def contract_tags(
        self, tags, which="any", output_inds=None, optimize=None,
        inplace=False, **contract_opts,
    ):
        """Contract just the tensors matching ``tags``, re-inserting the
        result (reference ``contract_tags`` tensor_core.py:9223)."""
        tn = self if inplace else self.copy()
        tids = tn._get_tids_from_tags(tags, which)
        if not tids:
            raise ValueError(f"No tensors matching {tags}")
        ts = [tn._pop_tensor(tid) for tid in tids]
        if output_inds is None:
            # keep indices still connected to the rest or dangling once
            all_other = oset(tn.ind_map)
            inputs = [t.inds for t in ts]
            freq = collections.Counter(itertools.chain(*inputs))
            output_inds = tuple(
                ix for ix, c in freq.items()
                if c == 1 or ix in all_other
            )
        result = tensor_contract(
            *ts, output_inds=output_inds, optimize=optimize,
            preserve_tensor=False, **contract_opts,
        )
        if isinstance(result, Tensor):
            if tn.num_tensors == 0:
                return result
            tn.add_tensor(result, virtual=True)
            return tn
        else:
            # scalar result
            if tn.num_tensors == 0:
                return result * 10 ** tn.exponent \
                    if tn.exponent else result
            tn.multiply_(result)
            return tn

    contract_tags_ = functools.partialmethod(contract_tags, inplace=True)

    def contract_cumulative(self, tags_seq, output_inds=None,
                            inplace=False, **opts):
        tn = self if inplace else self.copy()
        ctags = oset()
        for tags in tags_seq:
            ctags.update(tags_to_oset(tags))
            tn = tn.contract_tags_(ctags, which="any", **opts)
            if not isinstance(tn, TensorNetwork):
                return tn
        return tn

    def contract(
        self, tags=..., output_inds=None, optimize=None, get=None,
        backend=None, preserve_tensor=False, inplace=False, **opts,
    ):
        """Contract some or all of the network
        (reference ``TensorNetwork.contract`` tensor_core.py:9378).

        ``tags=...`` means full contraction. ``get`` may be None,
        'expression' (compiled callable), 'path-info'.
        """
        if tags is all:
            tags = ...
        if isinstance(tags, (int, slice)) or (
            tags is not ... and tags is not None and not isinstance(
                tags, (str, oset)) and not isinstance(tags, (list, tuple))
        ):
            tags = self.maybe_convert_coo(tags)

        # structured (1D) cumulative contraction hook
        if tags is not ... and self._CONTRACT_STRUCTURED:
            if isinstance(tags, slice) or tags is None:
                return self.contract_structured(
                    tags, output_inds=output_inds, inplace=inplace, **opts
                )

        if tags is not ...:
            return self.contract_tags(
                tags, output_inds=output_inds, optimize=optimize,
                inplace=inplace, **opts,
            )

        if get == "expression":
            return self.contraction_info(output_inds, optimize)
        if get == "path-info":
            return self.contraction_info(output_inds, optimize)

        result = tensor_contract(
            *self.tensor_map.values(), output_inds=output_inds,
            optimize=optimize, backend=backend,
            preserve_tensor=preserve_tensor, **opts,
        )
        if self.exponent:
            if isinstance(result, Tensor):
                result.modify(apply=lambda d: d * 10 ** self.exponent)
            else:
                result = result * 10 ** self.exponent
        return result

    contract_ = functools.partialmethod(contract, inplace=True)

    def to_dense(self, *inds_seq, optimize=None, **contract_opts):
        """Contract and fuse outer indices into a dense matrix/vector."""
        if not inds_seq:
            inds_seq = (self.outer_inds(),)
        t = self.contract(
            ..., output_inds=tuple(
                ix for g in inds_seq for ix in asinds(g)
            ),
            optimize=optimize, preserve_tensor=True, **contract_opts,
        )
        return t.to_dense(*inds_seq)

    def trace(self, left_inds, right_inds, **contract_opts):
        """Trace over matching outer index pairs."""
        tn = self.reindex(dict(zip(asinds(left_inds), asinds(right_inds))))
        return tn.contract(..., **contract_opts)

    # -- bond level ops -----------------------------------------------------------

    def _canonize_between_tids(self, tid1, tid2, **opts):
        tensor_canonize_bond(
            self.tensor_map[tid1], self.tensor_map[tid2], **opts
        )

    def canonize_between(self, tags1, tags2, **opts):
        """QR-canonize the bond between two tagged tensors
        (reference tensor_core.py:7509)."""
        (tid1,) = self._get_tids_from_tags(tags1, "all")
        (tid2,) = self._get_tids_from_tags(tags2, "all")
        self._canonize_between_tids(tid1, tid2, **opts)

    def _compress_between_tids(self, tid1, tid2, **opts):
        tensor_compress_bond(
            self.tensor_map[tid1], self.tensor_map[tid2], **opts
        )

    def compress_between(self, tags1, tags2, **opts):
        """Compress the bond between two tagged tensors."""
        (tid1,) = self._get_tids_from_tags(tags1, "all")
        (tid2,) = self._get_tids_from_tags(tags2, "all")
        self._compress_between_tids(tid1, tid2, **opts)

    def compress_all(self, inplace=False, **opts):
        """Compress every internal bond."""
        tn = self if inplace else self.copy()
        seen = set()
        for ix in tuple(tn.inner_inds()):
            tids = tuple(tn.ind_map.get(ix, ()))
            if len(tids) != 2:
                continue
            key = frozenset(tids)
            if key in seen:
                continue
            seen.add(key)
            tn._compress_between_tids(*tids, **opts)
        return tn

    compress_all_ = functools.partialmethod(compress_all, inplace=True)

    def split_tensor(self, tags, left_inds, **split_opts):
        """Split a single tagged tensor in place."""
        (tid,) = self._get_tids_from_tags(tags, "all")
        t = self._pop_tensor(tid)
        tl, tr = t.split(left_inds=left_inds, get="tensors", **split_opts)
        self.add_tensor(tl, virtual=True)
        self.add_tensor(tr, virtual=True)

    def replace_with_identity(self, where, which="any", inplace=False):
        """Replace tagged tensors with identity (they must form an
        identity-like region with 2 outer inds)."""
        tn = self if inplace else self.copy()
        tids = tn._get_tids_from_tags(where, which)
        ts = [tn._pop_tensor(tid) for tid in tids]
        sub = TensorNetwork(ts, virtual=True, check_collisions=False)
        outer = sub.outer_inds()
        if len(outer) != 2:
            raise ValueError("region must have exactly 2 outer inds")
        d = sub.ind_size(outer[0])
        tn.reindex_({outer[1]: outer[0]})
        return tn

    # -- selection/partition ---------------------------------------------------------

    def partition_tensors(self, tags, which="any", inplace=False):
        """Split into (rest-network, tagged-tensors)."""
        tids = self._get_tids_from_tags(tags, which)
        tn = self if inplace else self.copy()
        ts = tuple(tn._pop_tensor(tid) for tid in tids)
        return tn, ts

    def partition(self, tags, which="any", inplace=False):
        """Split into two networks: untagged and tagged."""
        tids = self._get_tids_from_tags(tags, which)
        tn = self if inplace else self.copy()
        ts = tuple(tn._pop_tensor(tid) for tid in tids)
        tagged = TensorNetwork(ts, virtual=True, check_collisions=False)
        return tn, tagged

    # -- isel / slicing ---------------------------------------------------------------

    def isel(self, selectors, inplace=False):
        """Select values of some indices across the network."""
        tn = self if inplace else self.copy()
        tids = tn._get_tids_from_inds(tuple(selectors), "any")
        for tid in tids:
            t = tn.tensor_map[tid]
            sel = {ix: v for ix, v in selectors.items() if ix in t.inds}
            if sel:
                t.isel_(sel)
        return tn

    isel_ = functools.partialmethod(isel, inplace=True)

    def cut_iter(self, *inds):
        """Iterate over all value-combinations of ``inds``, yielding the
        sliced network each time (reference ``cut_iter``
        tensor_core.py:9088) — the sliced-contraction primitive."""
        ranges = [range(self.ind_size(ix)) for ix in inds]
        for vals in itertools.product(*ranges):
            yield self.isel(dict(zip(inds, vals)))

    # -- structure hashing --------------------------------------------------------------

    def geometry_hash(self, strict_index_order=False):
        """Hash of the network geometry (inds/shapes/connectivity),
        for caching compiled expressions (reference tensor_core.py:5148)."""
        import hashlib

        parts = []
        canon = {}

        def c(ix):
            if ix not in canon:
                canon[ix] = str(len(canon))
            return canon[ix]

        for t in self.tensor_map.values():
            term = t.inds if strict_index_order else tuple(sorted(t.inds))
            parts.append(",".join(c(ix) for ix in term))
            parts.append(str(t.shape))
        return hashlib.sha1("|".join(parts).encode()).hexdigest()

    # -- misc -----------------------------------------------------------------------------

    def squeeze(self, fuse=False, include=None, exclude=None, inplace=False):
        tn = self if inplace else self.copy()
        for t in tn.tensor_map.values():
            t.squeeze_(include=include, exclude=exclude)
        return tn

    squeeze_ = functools.partialmethod(squeeze, inplace=True)

    def fuse_multibonds(self, inplace=False):
        """Fuse any multi-bonds (multiple indices shared by the same
        pair of tensors) into single indices (reference
        ``TensorNetwork.fuse_multibonds`` tensor_core.py)."""
        tn = self if inplace else self.copy()
        pair_bonds = {}
        for ix, tids in tn.ind_map.items():
            if len(tids) != 2:
                continue
            pair_bonds.setdefault(frozenset(tids), []).append(ix)
        for tids, ixs in pair_bonds.items():
            if len(ixs) > 1:
                new_ix = rand_uuid()
                for tid in tids:
                    tn.tensor_map[tid].fuse_({new_ix: ixs})
        return tn

    fuse_multibonds_ = functools.partialmethod(
        fuse_multibonds, inplace=True
    )

    def gauge_all_random(self, iterations=1, unitary=False, seed=None,
                         inplace=False):
        """Insert random invertible (or unitary) gauge pairs
        ``G @ G^-1`` on every bond — the contracted value is unchanged
        but local tensors are scrambled (reference
        ``gauge_all_random`` tensor_core.py)."""
        tn = self if inplace else self.copy()
        rng = np.random.default_rng(seed)
        for _ in range(iterations):
            for ix, tids in tuple(tn.ind_map.items()):
                if len(tids) != 2:
                    continue
                tida, tidb = tuple(tids)
                ta = tn.tensor_map[tida]
                tb = tn.tensor_map[tidb]
                d = ta.ind_size(ix)
                G = rng.normal(size=(d, d))
                if unitary:
                    G = np.linalg.qr(G)[0]
                    Ginv = G.conj().T
                else:
                    G = G + d * np.eye(d)
                    Ginv = np.linalg.inv(G)
                if "complex" in str(ta.dtype):
                    G = G.astype(str(ta.dtype))
                    Ginv = Ginv.astype(str(ta.dtype))
                for t, M in ((ta, G), (tb, Ginv.T)):
                    ax = t.inds.index(ix)
                    data = jnp.tensordot(
                        t.data, jnp.asarray(M, dtype=t.dtype),
                        axes=(ax, 0),
                    )
                    data = jnp.moveaxis(data, -1, ax)
                    t.modify(data=data)
        return tn

    gauge_all_random_ = functools.partialmethod(
        gauge_all_random, inplace=True
    )

    def rank_simplify(self, inplace=False, **kwargs):
        from .simplify import rank_simplify as _rs

        return _rs(self, inplace=inplace, **kwargs)

    def full_simplify(self, seq="ADCR", inplace=False, **kwargs):
        from .simplify import full_simplify as _fs

        return _fs(self, seq=seq, inplace=inplace, **kwargs)

    full_simplify_ = functools.partialmethod(full_simplify, inplace=True)
    rank_simplify_ = functools.partialmethod(rank_simplify, inplace=True)

    def fit(self, tn_target, **kwargs):
        from .fitting import tensor_network_fit_als

        return tensor_network_fit_als(self, tn_target, **kwargs)

    def distance(self, other, **kwargs):
        from .fitting import tensor_network_distance

        return tensor_network_distance(self, other, **kwargs)

    def distance_normalized(self, other, **kwargs):
        from .fitting import tensor_network_distance

        return tensor_network_distance(
            self, other, normalized=True, **kwargs
        )

    def gate_inds(self, G, inds, contract=False, **kwargs):
        from .gating import tensor_network_gate_inds

        return tensor_network_gate_inds(
            self, G, inds, contract=contract, **kwargs
        )

    gate_inds_ = functools.partialmethod(gate_inds, inplace=True)

    def draw(self, *args, **kwargs):
        from .drawing import draw_tn

        return draw_tn(self, *args, **kwargs)

    graph = draw

    def aslinearoperator(self, left_inds, right_inds, **kwargs):
        from .linop import TNLinearOperator

        return TNLinearOperator(self, left_inds, right_inds, **kwargs)

    def __repr__(self):
        return (
            f"{self.__class__.__name__}("
            f"tensors={self.num_tensors}, indices={self.num_indices})"
        )

    def __str__(self):
        return (
            f"{self.__class__.__name__}([\n" + "\n".join(
                f"    {t!r}," for t in self.tensor_map.values()
            ) + "\n])"
        )


# ---------------------------------------------------------------------------
# module-level TN combinators (reference tensor_core.py:1239-1760)
# ---------------------------------------------------------------------------

def tensor_make_single_bond(t1, t2, gauges=None, bond_ind=None):
    """Fuse any multiple bonds between ``t1`` and ``t2`` into a single
    bond, creating one of size 1 if none exists (reference
    ``tensor_make_single_bond``). Returns ``(created, bond_ind, size)``."""
    shared = list(bonds(t1, t2))
    if not shared:
        if bond_ind is None:
            bond_ind = rand_uuid()
        new_bond(t1, t2, size=1, name=bond_ind)
        return True, bond_ind, 1
    if len(shared) == 1:
        return False, shared[0], t1.ind_size(shared[0])
    if bond_ind is None:
        bond_ind = shared[0]
    if gauges is not None:
        for ix in shared:
            if ix in gauges:
                g = gauges.pop(ix)
                t1.multiply_index_diagonal_(ix, jnp.sqrt(g))
                t2.multiply_index_diagonal_(ix, jnp.sqrt(g))
    t1.fuse_({bond_ind: shared})
    t2.fuse_({bond_ind: shared})
    return False, bond_ind, t1.ind_size(bond_ind)


def tensor_fuse_squeeze(t1, t2, squeeze=True, gauges=None,
                        bond_ind=None):
    """Fuse any multibond between ``t1``/``t2`` into one index and
    squeeze it away if its size is 1 (reference ``tensor_fuse_squeeze``
    tensor_core.py:1239). Inplace."""
    _, bond_ind, _ = tensor_make_single_bond(
        t1, t2, gauges=gauges, bond_ind=bond_ind
    )
    if squeeze and t1.ind_size(bond_ind) == 1:
        t1.squeeze_(include=(bond_ind,))
        t2.squeeze_(include=(bond_ind,))
        if gauges is not None and bond_ind in gauges:
            s0_1_2 = float(jnp.reshape(gauges.pop(bond_ind), ())) ** 0.5
            t1.modify(apply=lambda x: x * s0_1_2)
            t2.modify(apply=lambda x: x * s0_1_2)


def connect(t1, t2, ax1, ax2):
    """Connect two tensors by renaming the given axes to a shared new
    index (reference ``connect`` tensor_core.py:1760). Inplace — any
    viewing TNs see the change."""
    d1, d2 = t1.shape[ax1], t2.shape[ax2]
    if d1 != d2:
        raise ValueError(f"dimensions {d1} and {d2} do not match")
    new_ix = rand_uuid()
    inds1 = list(t1.inds)
    inds1[ax1] = new_ix
    t1.modify(inds=inds1)
    inds2 = list(t2.inds)
    inds2[ax2] = new_ix
    t2.modify(inds=inds2)


def tensor_network_sum(tnA, tnB, inplace=False):
    """Direct sum of two structurally identical TNs: indices must match
    exactly; bond dimensions add (reference ``tensor_network_sum``
    tensor_core.py:1628)."""
    tnAB = tnA if inplace else tnA.copy()
    oix = tnAB.outer_inds()
    tidsA = list(tnAB.tensor_map)
    # match tensors by identical index sets
    b_by_inds = {frozenset(t.inds): t for t in tnB.tensor_map.values()}
    for tid in tidsA:
        t = tnAB.tensor_map[tid]
        tb = b_by_inds.get(frozenset(t.inds))
        if tb is None:
            raise ValueError(
                "can only sum TNs with exactly matching indices — see "
                "tensor_network_ag_sum for matching site structure only"
            )
        sum_inds = [ix for ix in t.inds if ix in oix]
        tab = tensor_direct_product(t, tb, sum_inds)
        t.modify(data=tab.data)
    return tnAB


# ---------------------------------------------------------------------------
# parametrized / isometric tensors (reference tensor_core.py:12261,12398)
# ---------------------------------------------------------------------------

class PArray:
    """A lazy ``fn(params) -> array`` pair behaving like its resulting
    array (reference ``PArray`` tensor/array_ops.py:578). On TPU the
    materialization happens inside jit when traced."""

    __slots__ = ("_fn", "_params", "_data")

    def __init__(self, fn, params):
        self._fn = fn
        self._params = params
        self._data = None

    def copy(self):
        return PArray(self._fn, self._params)

    @property
    def fn(self):
        return self._fn

    @fn.setter
    def fn(self, fn):
        self._fn = fn
        self._data = None

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, params):
        self._params = params
        self._data = None

    @property
    def data(self):
        if self._data is None:
            self._data = ar.asarray(self._fn(self._params))
        return self._data

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return int(np.prod(self.shape))

    @property
    def dtype(self):
        return self.data.dtype

    def add_function(self, g):
        """Chain a new function ``g`` on top of the current one."""
        f = self._fn
        self._fn = lambda p: g(f(p))
        self._data = None

    def __array__(self, dtype=None):
        out = np.asarray(self.data)
        return out.astype(dtype) if dtype is not None else out


class PTensor(Tensor):
    """A tensor whose data is lazily generated from ``fn(params)``
    (reference ``PTensor`` tensor_core.py:12261). Used by TNOptimizer to
    keep e.g. unitary-constrained parametrizations."""

    def __init__(self, fn, params, inds=(), tags=None, left_inds=None):
        super().__init__(
            PArray(fn, params), inds=inds, tags=tags, left_inds=left_inds
        )

    @classmethod
    def from_parray(cls, parray, inds=(), tags=None, left_inds=None):
        obj = cls.__new__(cls)
        Tensor.__init__(obj, parray, inds=inds, tags=tags,
                        left_inds=left_inds)
        return obj

    def copy(self):
        return PTensor.from_parray(
            self._data.copy(), inds=self.inds, tags=self.tags,
            left_inds=self.left_inds,
        )

    @property
    def data(self):
        return self._data.data

    @property
    def fn(self):
        return self._data.fn

    @fn.setter
    def fn(self, x):
        self._data.fn = x

    def get_params(self):
        return self._data.params

    def set_params(self, params):
        self._data.params = params

    @property
    def params(self):
        return self.get_params()

    @params.setter
    def params(self, x):
        self.set_params(x)

    @property
    def shape(self):
        return self._data.shape

    @property
    def ndim(self):
        return self._data.ndim

    def modify(self, apply=None, data=None, inds=None, tags=None,
               left_inds=...):
        if apply is not None:
            self._data.add_function(apply)
            apply = None
        if data is not None:
            if isinstance(data, PArray):
                self._data = data
                data = None
            else:
                raise TypeError(
                    "can only set PTensor data to a PArray — use "
                    ".unparametrize() for a plain Tensor"
                )
        super().modify(apply=apply, data=data, inds=inds, tags=tags,
                       left_inds=left_inds)

    def unparametrize(self):
        """Turn into a normal (materialized) :class:`Tensor`."""
        return Tensor(self.data, inds=self.inds, tags=self.tags,
                      left_inds=self.left_inds)


class IsoTensor(Tensor):
    """A :class:`Tensor` which keeps its ``left_inds`` through
    ``modify`` (reference ``IsoTensor`` tensor_core.py:12398) — the
    marker class for isometric networks (MERA, TTN)."""

    def modify(self, **kwargs):
        kwargs.setdefault("left_inds", self.left_inds)
        super().modify(**kwargs)

    def fuse(self, *args, inplace=False, **kwargs):
        t = self if inplace else self.copy()
        t._left_inds = None
        return Tensor.fuse(t, *args, inplace=True, **kwargs)


def tensor_gauge_simple_bond(ta, tb, gauges, smudge=1e-12, power=1.0,
                             damping=0.0, max_bond=None, cutoff=0.0,
                             renorm=False, info=None):
    """One simple-update-style gauging step for two tensors sharing a
    bond (reference ``tensor_gauge_simple_bond``
    tensor_core.py:1295): absorb the surrounding gauges, split/compress
    the shared bond keeping the singular values as the new gauge,
    then unabsorb. ``gauges`` is updated in place."""
    _, bond_ix, _ = tensor_make_single_bond(ta, tb, gauges=gauges)

    absorbed = []
    for t in (ta, tb):
        for ix in t.inds:
            if ix != bond_ix and ix in gauges:
                g = (gauges[ix] + smudge) ** power
                t.multiply_index_diagonal_(ix, g)
                absorbed.append((t, ix, g))
    if bond_ix in gauges:
        s_old = gauges[bond_ix]
        sq = jnp.sqrt(s_old + smudge)
        ta.multiply_index_diagonal_(bond_ix, sq)
        tb.multiply_index_diagonal_(bond_ix, sq)
    else:
        s_old = None

    out = tensor_compress_bond(
        ta, tb, absorb=None, max_bond=max_bond, cutoff=cutoff,
    )
    max_sdiff = None
    if len(out) == 3:
        _, s, _ = out
        nrm = jnp.linalg.norm(s)
        if renorm:
            s = s / nrm
            if info is not None and "exponent" in info:
                info["exponent"] += float(jnp.log10(nrm))
        if damping > 0.0 and s_old is not None and \
                s_old.shape == s.shape:
            s = damping * s_old + (1 - damping) * s
        if info is not None and "max_sdiff" in info and \
                s_old is not None and s_old.shape == s.shape:
            max_sdiff = float(jnp.linalg.norm(s - s_old))
            info["max_sdiff"] = max(info["max_sdiff"], max_sdiff)
        gauges[bond_ix] = s

    for t, ix, g in absorbed:
        if ix in t.inds:
            t.multiply_index_diagonal_(ix, 1 / g)
    return bond_ix


# ---------------------------------------------------------------------------
# compressed contraction (reference ``contract_compressed``
# tensor_core.py:8637 / ``_contract_compressed_tid_sequence`` :8226)
# ---------------------------------------------------------------------------

def _pair_output_inds(tn, tid1, tid2):
    """Indices the contraction of ``tid1, tid2`` must keep: anything
    also held by other tensors or dangling on the full network."""
    t1 = tn.tensor_map[tid1]
    t2 = tn.tensor_map[tid2]
    keep = []
    for ix in dict.fromkeys((*t1.inds, *t2.inds)):
        holders = tn.ind_map.get(ix, ())
        n_outside = sum(1 for tid in holders if tid not in (tid1, tid2))
        n_inside = (ix in t1.inds) + (ix in t2.inds)
        total = len(holders)
        # dangling on the network, held elsewhere, or a hyper index
        # not fully consumed by this pair
        if n_outside or total < 2 or (total - n_inside) > 0:
            keep.append(ix)
        elif n_inside == 1:
            keep.append(ix)
    return keep


def tensor_network_contract_compressed(
    tn, max_bond, cutoff=1e-10, output_inds=None, canonize=True,
    final_contract=True, inplace=False, progbar=False, **kwargs,
):
    """Contract a TN while keeping every intermediate bond at most
    ``max_bond`` via on-the-fly pairwise compression (reference
    ``contract_compressed`` tensor_core.py:8637). The contraction
    order is a leaves-first spanning-tree merge toward the most
    central tensor of each connected component (reference uses the
    same span machinery); after each merge the grown tensor's fat
    bonds are compressed against their neighbours.

    Returns the contracted value (scalar / tensor with
    ``output_inds``) if ``final_contract``, else the partially
    contracted network."""
    from .networking import get_tree_span, subgraphs

    tn = tn if inplace else tn.copy()
    if output_inds is None:
        output_inds = tn.outer_inds()

    for comp in subgraphs(tn):
        comp_tids = set(comp)
        merges = [
            (a, b) for (a, b, _) in get_tree_span(
                _component_view(tn, comp_tids)
            )
        ]
        for tid_out, tid_in in merges:
            if tid_out not in tn.tensor_map or \
                    tid_in not in tn.tensor_map:
                continue
            keep = _pair_output_inds(tn, tid_out, tid_in)
            t1 = tn._pop_tensor(tid_out)
            t2 = tn.tensor_map[tid_in]
            new = tensor_contract(
                t1, t2, output_inds=tuple(keep),
                preserve_tensor=True,
            )
            t2.modify(data=new.data, inds=new.inds,
                      tags=t2.tags | t1.tags)
            # compress any fat bonds against neighbours
            for ix in tuple(t2.inds):
                holders = tuple(tn.ind_map.get(ix, ()))
                if len(holders) == 2 and \
                        t2.ind_size(ix) > max_bond:
                    other = next(h for h in holders if h != tid_in)
                    try:
                        tensor_compress_bond(
                            tn.tensor_map[other], t2,
                            max_bond=max_bond, cutoff=cutoff,
                        )
                    except Exception:
                        pass
    if final_contract:
        return tn.contract(
            ..., output_inds=tuple(output_inds), **kwargs
        )
    return tn


def _component_view(tn, comp_tids):
    """A lightweight object exposing tensor_map/ind_map restricted to
    one connected component (enough for the span computation)."""

    class _View:
        pass

    v = _View()
    v.tensor_map = {
        tid: t for tid, t in tn.tensor_map.items() if tid in comp_tids
    }
    v.ind_map = {
        ix: oset(t for t in tids if t in comp_tids)
        for ix, tids in tn.ind_map.items()
        if any(t in comp_tids for t in tids)
    }
    return v


TensorNetwork.contract_compressed = tensor_network_contract_compressed
TensorNetwork.contract_compressed_ = functools.partialmethod(
    tensor_network_contract_compressed, inplace=True
)
