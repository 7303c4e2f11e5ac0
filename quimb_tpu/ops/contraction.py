"""Contraction execution: compile a path into a chain of pairwise XLA
contractions, with expression caching.

TPU-native re-design of the reference contraction bridge
(``quimb/tensor/contraction.py``: ``array_contract`` :272,
``array_contract_expression`` :300, ``inds_to_eq`` :104, thread-local
strategy/backend contexts :12-73). Instead of dispatching to
cotengra/autoray, the path (from :mod:`quimb_tpu.ops.paths`) is executed as
pairwise ``jnp.einsum`` calls in *interleaved integer-label* form — no
52-symbol limit, arbitrary hyper edges — which XLA lowers onto the MXU via
``dot_general`` and fuses.

Expressions (path + per-step integer label lists) are cached keyed by the
contraction geometry, mirroring the reference's expression caching
(``TNLinearOperator._contractors`` tensor_core.py:12092,
``geometry_hash`` :5148). Whole-expression ``jax.jit`` wrapping is exposed
via ``autojit=True`` for hot paths with stable shapes.
"""

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..config import on_tpu
from ..utils import LRU
from . import paths as _paths

# ---------------------------------------------------------------------------
# thread-local default strategy / backend contexts
# ---------------------------------------------------------------------------

_DEFAULT_STRATEGY = "auto"
_DEFAULT_BACKEND = None  # None -> jax
_thread = threading.local()


def _stack(name, default):
    stacks = getattr(_thread, "stacks", None)
    if stacks is None:
        _thread.stacks = stacks = {}
    return stacks.setdefault(name, [default])


def get_contract_strategy():
    return _stack("strategy", _DEFAULT_STRATEGY)[-1]


def set_contract_strategy(strategy):
    _stack("strategy", _DEFAULT_STRATEGY)[-1] = strategy


@contextlib.contextmanager
def contract_strategy(strategy):
    """Context manager setting the default contraction path strategy."""
    s = _stack("strategy", _DEFAULT_STRATEGY)
    s.append(strategy)
    try:
        yield
    finally:
        s.pop()


def get_contract_backend():
    return _stack("backend", _DEFAULT_BACKEND)[-1]


def set_contract_backend(backend):
    _stack("backend", _DEFAULT_BACKEND)[-1] = backend


@contextlib.contextmanager
def contract_backend(backend):
    """Context manager setting the array backend ('jax' or 'numpy')."""
    s = _stack("backend", _DEFAULT_BACKEND)
    s.append(backend)
    try:
        yield
    finally:
        s.pop()


def get_tensor_linop_backend():
    return _stack("linop_backend", _DEFAULT_BACKEND)[-1]


def set_tensor_linop_backend(backend):
    _stack("linop_backend", _DEFAULT_BACKEND)[-1] = backend


@contextlib.contextmanager
def tensor_linop_backend(backend):
    s = _stack("linop_backend", _DEFAULT_BACKEND)
    s.append(backend)
    try:
        yield
    finally:
        s.pop()


# ---------------------------------------------------------------------------
# eq utilities
# ---------------------------------------------------------------------------


@functools.lru_cache(2**12)
def get_symbol(i):
    """Letter symbol for index ``i`` (a-z, A-Z, then unicode)."""
    if i < 26:
        return chr(ord("a") + i)
    if i < 52:
        return chr(ord("A") + i - 26)
    return chr(192 + i - 52)


def inds_to_eq(inputs, output=None):
    """Turn index tuples into a string einsum equation (for display /
    interop; execution uses integer labels)."""
    symbol_map = {}

    def sym(ix):
        if ix not in symbol_map:
            symbol_map[ix] = get_symbol(len(symbol_map))
        return symbol_map[ix]

    lhs = ",".join("".join(sym(ix) for ix in term) for term in inputs)
    if output is None:
        output = find_output_inds(inputs)
    rhs = "".join(sym(ix) for ix in output)
    return f"{lhs}->{rhs}"


def find_output_inds(inputs):
    """Default output indices: those appearing exactly once over all
    inputs (hyper-aware, reference tensor_core.py:158)."""
    freq = {}
    for term in inputs:
        for ix in term:
            freq[ix] = freq.get(ix, 0) + 1
    return tuple(ix for ix, c in freq.items() if c == 1)


# ---------------------------------------------------------------------------
# expression building
# ---------------------------------------------------------------------------


class ContractExpression:
    """A compiled contraction: path + per-step integer einsum labels.

    Calling it with matching arrays executes the pairwise chain. The
    instance also carries cost/width metadata for introspection
    (reference ``contraction_info`` tensor_core.py:9598).
    """

    __slots__ = (
        "inputs", "output", "sizes", "path", "steps", "flops",
        "width", "_jit",
    )

    def __init__(self, inputs, output, sizes, path):
        self.inputs = inputs
        self.output = output
        self.sizes = sizes
        self.path = path
        self._jit = None

        # integer label per index name
        label = {}

        def get(ix):
            if ix not in label:
                label[ix] = len(label)
            return label[ix]

        # precompute per-step labels: (i, j, la, lb, lout)
        steps = []
        for (ia, ib, rout), step in zip(
            _paths.simulate_path(inputs, output, sizes, path), path
        ):
            la = [get(ix) for ix in ia]
            lb = None if ib is None else [get(ix) for ix in ib]
            lo = [get(ix) for ix in rout]
            steps.append((step, la, lb, lo))
        # final transpose to requested output order
        steps.append((None, [label[ix] for ix in output], None, None))
        self.steps = steps
        self.flops = _paths.path_cost(inputs, output, sizes, path)
        self.width = _paths.path_width(inputs, output, sizes, path)

    def __call__(self, *arrays, backend=None, renorm=False):
        """Execute. With ``renorm`` every intermediate is rescaled to
        unit max-magnitude (the scale is NOT tracked — callers use it
        for scale-free quantities like sampling marginals, where in
        f32 the true value under- or over-flows long before the
        normalized distribution does)."""
        xp = _einsum_module(arrays, backend)
        if xp is _np_mod:
            from .backend import to_host

            arrays = [to_host(a) for a in arrays]
        results = list(arrays)
        for (step, la, lb, lo) in self.steps[:-1]:
            if lb is None:
                (i,) = step
                a = results[i]
                r = xp.einsum(a, la, lo)
            else:
                i, j = step
                a, b = results[i], results[j]
                r = xp.einsum(a, la, b, lb, lo)
            if renorm:
                if xp is _np_mod:
                    mx = np.max(np.abs(r)) if r.size else 1.0
                    if mx > 0 and np.isfinite(mx):
                        r = r / mx
                else:
                    mx = jnp.max(jnp.abs(r))
                    r = jnp.where(
                        (mx > 0) & jnp.isfinite(mx), r / mx, r
                    )
            results.append(r)
        final_labels = self.steps[-1][1]
        r = results[-1]
        # final may need transposing to requested output order
        last_lo = self.steps[-2][3] if len(self.steps) > 1 else None
        if last_lo is not None and list(final_labels) != list(last_lo):
            perm = [last_lo.index(l) for l in final_labels]
            r = xp.transpose(r, perm)
        return r

    def jitted(self):
        if self._jit is None:
            self._jit = jax.jit(self.__call__)
        return self._jit

    def __repr__(self):
        return (
            f"<ContractExpression(n={len(self.inputs)}, "
            f"flops={self.flops:.3e}, width={self.width:.1f})>"
        )


_EXPR_CACHE = LRU(2**12)


def _np_einsum(*args):
    """np.einsum with per-call compaction of integer axis labels:
    numpy requires labels < 52, but our expression-wide labelings can
    exceed that on large networks (jnp relabels internally)."""
    remap = {}
    out = []
    for a in args:
        if isinstance(a, (list, tuple)):
            out.append([remap.setdefault(l, len(remap)) for l in a])
        else:
            out.append(a)
    # np.einsum returns a *numpy scalar* (not ndarray) for 0-d outputs;
    # keep it an ndarray so downstream type dispatch ("is this a host
    # array?") stays host-side — a scalar slipping through here used to
    # get device_put mid-simplify, poisoning the whole host pass.
    # optimize=True routes BLAS-able pairwise contractions through
    # tensordot/GEMM instead of the naive c_einsum loops — ~20x on the
    # PEPS boundary strips; the per-call path overhead is trivial since
    # our expressions are already pairwise.
    return np.asarray(np.einsum(*out, optimize=True))


class _np_mod:
    """numpy execution module for einsum chains (label-compacting)."""

    einsum = staticmethod(_np_einsum)
    transpose = staticmethod(np.transpose)


def _einsum_module(arrays, backend=None):
    """Pick the execution module for a chain of einsums: numpy when
    explicitly requested or when *every* operand is already a host
    array (setup-time graph rewrites — avoids one XLA compile per
    tiny op), jnp otherwise. numpy in -> numpy out keeps host-side
    simplification passes entirely off-device."""
    if backend is None:
        backend = get_contract_backend()
    if backend == "numpy":
        return _np_mod
    if backend in ("jax", "jit"):
        return jnp
    # backend 'auto'/None: dispatch on operand types
    if arrays and all(isinstance(a, np.ndarray) for a in arrays):
        return _np_mod
    return jnp


def _preprocess_single(array, term, xp=jnp):
    """Collapse repeated indices within one tensor via einsum diagonal."""
    if len(set(term)) == len(term):
        return array, tuple(term)
    label = {}
    for ix in term:
        if ix not in label:
            label[ix] = len(label)
    la = [label[ix] for ix in term]
    out_term = tuple(dict.fromkeys(term))
    lo = [label[ix] for ix in out_term]
    return xp.einsum(array, la, lo), out_term


def array_contract_expression(
    inputs, output=None, sizes=None, shapes=None, optimize=None, cache=True,
):
    """Build (or fetch from cache) a :class:`ContractExpression`.

    Index labels are canonicalized (first-occurrence integer ids) before
    both caching and path search, so *structurally* identical
    contractions share one cached path/expression even when their index
    names differ — e.g. circuit sampling re-simplifies per sample and
    mints fresh bond ids each time, but usually lands on the same
    geometry. Execution is purely positional, so callers are unaffected.
    """
    inputs = tuple(map(tuple, inputs))
    if output is None:
        output = find_output_inds(inputs)
    output = tuple(output)
    if sizes is None:
        sizes = {}
        for term, shape in zip(inputs, shapes):
            for ix, d in zip(term, shape):
                sizes[ix] = int(d)
    if optimize is None:
        optimize = get_contract_strategy()

    # canonicalize: same-structure networks -> same key, same expression
    remap = {}
    c_inputs = tuple(
        tuple(remap.setdefault(ix, len(remap)) for ix in term)
        for term in inputs
    )
    c_output = tuple(remap.setdefault(ix, len(remap)) for ix in output)
    c_sizes = {k: int(sizes[ix]) for ix, k in remap.items()}

    hashable_opt = optimize if isinstance(optimize, str) else str(optimize)
    key = (
        c_inputs, c_output,
        tuple(c_sizes[k] for k in range(len(remap))), hashable_opt,
    )
    if cache:
        expr = _EXPR_CACHE.get(key)
        if expr is not None:
            return expr
    path = _paths.optimize_path(c_inputs, c_output, c_sizes, optimize)
    expr = ContractExpression(c_inputs, c_output, c_sizes, path)
    if cache:
        _EXPR_CACHE[key] = expr
    return expr


def array_contract(
    arrays, inputs, output=None, optimize=None, backend=None,
    return_expression=False, renorm=False,
):
    """Contract ``arrays`` whose indices are given by ``inputs``
    (reference ``array_contract`` contraction.py:272)."""
    arrays = list(arrays)
    inputs = list(map(tuple, inputs))
    xp = _einsum_module(arrays, backend)
    if xp is _np_mod:
        from .backend import to_host

        arrays = [to_host(a) for a in arrays]
    else:
        # to_device rather than bare asarray: implicit device_put of
        # complex HOST arrays (e.g. expm'd gate matrices) is
        # UNIMPLEMENTED through the TPU tunnel — transfer as two real
        # planes and recombine compiled
        from .backend import to_device

        arrays = [to_device(a) for a in arrays]
    # single-tensor repeated-index preprocessing
    for i, (a, term) in enumerate(zip(arrays, inputs)):
        a2, t2 = _preprocess_single(a, term, xp=xp)
        arrays[i], inputs[i] = a2, t2

    if output is None:
        output = find_output_inds(inputs)

    if len(arrays) == 1:
        # direct single-term einsum (trace/transpose/sum)
        label = {}
        for ix in inputs[0]:
            label.setdefault(ix, len(label))
        for ix in output:
            label.setdefault(ix, len(label))
        r = xp.einsum(
            arrays[0], [label[ix] for ix in inputs[0]],
            [label[ix] for ix in output],
        )
        return r

    if len(arrays) == 2 and not renorm and not return_expression:
        # direct pairwise einsum: skips expression canonicalization +
        # cache round-trip (~0.7 ms/call of pure host bookkeeping —
        # the dominant cost of the pair-absorptions inside the
        # simplification passes, which funnel here thousands of times
        # per circuit amplitude/marginal)
        label = {}
        for term in (*inputs, output):
            for ix in term:
                label.setdefault(ix, len(label))
        if len(label) <= 48:
            return xp.einsum(
                arrays[0], [label[ix] for ix in inputs[0]],
                arrays[1], [label[ix] for ix in inputs[1]],
                [label[ix] for ix in output],
            )

    shapes = [a.shape for a in arrays]
    expr = array_contract_expression(
        inputs, output, shapes=shapes, optimize=optimize
    )
    # NOTE: whole-expression jit (expr.jitted()) is available but NOT the
    # default: every distinct TN geometry would trigger a fresh XLA
    # compile (~20-40s through the TPU tunnel), which dominates one-off
    # setup contractions. Eager pairwise einsum shares jit caches across
    # geometries via per-step (labels, shapes) keys.
    result = expr(*arrays, backend=backend, renorm=renorm)
    if return_expression:
        return result, expr
    return result


def array_contract_path(arrays=None, inputs=None, output=None, sizes=None,
                        shapes=None, optimize=None):
    """Just the (linear) contraction path."""
    inputs = tuple(map(tuple, inputs))
    if shapes is None and arrays is not None:
        shapes = [jnp.shape(a) for a in arrays]
    expr = array_contract_expression(
        inputs, output, sizes=sizes, shapes=shapes, optimize=optimize
    )
    return _paths.ssa_to_linear(expr.path, len(inputs))


def array_contract_tree(inputs, output=None, sizes=None, shapes=None,
                        optimize=None):
    """Return the ContractExpression (stands in for cotengra's tree —
    exposes .path/.flops/.width)."""
    return array_contract_expression(
        inputs, output, sizes=sizes, shapes=shapes, optimize=optimize
    )
