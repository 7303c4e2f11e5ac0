"""jax interop: pack/unpack TNs to parameter pytrees and register
Tensor/TensorNetwork (and subclasses) as jax pytrees.

Re-design of reference ``quimb/tensor/interface.py`` (``pack``/
``unpack`` :34-88, pytree registration :93-123). The skeleton carries
all host-side bookkeeping; only the arrays are traced — the pattern the
whole framework's jit strategy generalizes (SURVEY §3.6)."""

import functools

import jax

from .core import Tensor, TensorNetwork


def pack(obj):
    """Split ``obj`` (Tensor or TensorNetwork) into (params, skeleton):
    params is a dict of arrays, skeleton the object with data removed."""
    if isinstance(obj, Tensor):
        return {0: obj.data}, _TensorSkeleton(obj)
    params = {}
    for i, (tid, t) in enumerate(obj.tensor_map.items()):
        params[i] = t.data
    return params, _TNSkeleton(obj)


class _TensorSkeleton:
    def __init__(self, t):
        self.inds = t.inds
        self.tags = tuple(t.tags)
        self.left_inds = t.left_inds

    def unpack(self, params):
        return Tensor((params[0]), inds=self.inds, tags=self.tags,
                      left_inds=self.left_inds)

    def __eq__(self, other):
        return (
            isinstance(other, _TensorSkeleton)
            and self.inds == other.inds and self.tags == other.tags
        )

    def __hash__(self):
        return hash((self.inds, self.tags))


class _TNSkeleton:
    def __init__(self, tn):
        self.cls = tn.__class__
        self.tids = tuple(tn.tensor_map)
        self.tensor_meta = tuple(
            (t.inds, tuple(t.tags), t.left_inds)
            for t in tn.tensor_map.values()
        )
        self.extra = tuple(
            (ep, _freeze(getattr(tn, ep, None)))
            for ep in tn._EXTRA_PROPS
        )
        self.exponent = tn.exponent

    def unpack(self, params):
        ts = []
        for i, (inds, tags, left_inds) in enumerate(self.tensor_meta):
            ts.append(Tensor(params[i], inds=inds, tags=tags,
                             left_inds=left_inds))
        tn = TensorNetwork(())
        for tid, t in zip(self.tids, ts):
            tn.add_tensor(t, tid=tid, virtual=True)
        tn.exponent = self.exponent
        if self.cls is not TensorNetwork:
            tn.__class__ = self.cls
            for ep, v in self.extra:
                setattr(tn, ep, _unfreeze(v))
        return tn

    def __eq__(self, other):
        return (
            isinstance(other, _TNSkeleton)
            and self.cls is other.cls
            and self.tensor_meta == other.tensor_meta
            and self.extra == other.extra
        )

    def __hash__(self):
        return hash((self.cls, self.tensor_meta, self.extra))


def _freeze(v):
    if isinstance(v, (list,)):
        return tuple(map(_freeze, v))
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    return v


def _unfreeze(v):
    return v


def unpack(params, skeleton):
    """Rebuild the object from (params, skeleton)."""
    return skeleton.unpack(params)


# ---------------------------------------------------------------------------
# pytree registration: TNs can be passed straight through jit/grad/vmap
# ---------------------------------------------------------------------------


def _tn_flatten(tn):
    params, skeleton = pack(tn)
    leaves = [params[i] for i in range(len(params))]
    return leaves, skeleton


def _tn_unflatten(skeleton, leaves):
    return skeleton.unpack(dict(enumerate(leaves)))


def _tensor_flatten(t):
    return [t.data], _TensorSkeleton(t)


def _tensor_unflatten(skeleton, leaves):
    return skeleton.unpack({0: leaves[0]})


_REGISTERED = set()


def register_pytree_class(cls):
    """Register a Tensor/TensorNetwork subclass with jax's pytree
    system."""
    if cls in _REGISTERED:
        return
    _REGISTERED.add(cls)
    if issubclass(cls, Tensor):
        jax.tree_util.register_pytree_node(
            cls, _tensor_flatten, _tensor_unflatten
        )
    else:
        jax.tree_util.register_pytree_node(
            cls, _tn_flatten, _tn_unflatten
        )


def register_all():
    """Register the standard classes (reference interface.py:93-123)."""
    from .core import TensorNetwork
    from .tn1d.core import (
        Dense1D,
        MatrixProductOperator,
        MatrixProductState,
    )
    from .tn2d.core import PEPO, PEPS, TensorNetwork2D
    from .tnag.core import (
        TensorNetworkGen,
        TensorNetworkGenOperator,
        TensorNetworkGenVector,
    )

    for cls in (
        Tensor, TensorNetwork, MatrixProductState,
        MatrixProductOperator, Dense1D, PEPS, PEPO, TensorNetwork2D,
        TensorNetworkGen, TensorNetworkGenVector,
        TensorNetworkGenOperator,
    ):
        register_pytree_class(cls)


register_all()


def jax_register_pytree():
    """Reference-compatible alias: (re-)register all Tensor/TN classes
    as jax pytrees (reference ``jax_register_pytree``
    interface.py:93). Registration already happens at import; calling
    this is a safe no-op re-registration check."""
    return None
