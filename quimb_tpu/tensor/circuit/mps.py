"""MPS-based circuit simulators.

Re-design of reference ``quimb/tensor/circuit/mps.py`` (``CircuitMPS``
:26, ``CircuitPermMPS`` :569). Gates are applied eagerly with
reduce-split truncation; sampling is the exact sequential MPS sampler.
"""

import numbers

import jax.numpy as jnp
from ...ops.backend import maybe_host_scalar, to_device
import numpy as np

from ..core import bonds
from ..tn1d.core import MatrixProductState
from .core import CircuitBase


class CircuitMPS(CircuitBase):
    """Simulate a circuit as an MPS with bounded bond dimension
    (reference ``CircuitMPS`` mps.py:26)."""

    def __init__(self, N=None, psi0=None, gate_opts=None, max_bond=None,
                 cutoff=1e-10, tags=None, dtype=None):
        gate_opts = dict(gate_opts or {})
        gate_opts.setdefault("max_bond", max_bond)
        gate_opts.setdefault("cutoff", cutoff)
        super().__init__(N=N, psi0=psi0, gate_opts=gate_opts, tags=tags,
                         dtype=dtype)

    def _init_state(self, psi0):
        return psi0 if isinstance(psi0, MatrixProductState) else \
            MatrixProductState(psi0)

    def _apply_array(self, U, where, tags=None, **opts):
        opts = {**self.gate_opts, **opts}
        opts.pop("contract", None)
        nq = len(where)
        if nq == 1:
            self._psi.gate_(U, where[0], contract=True)
        elif nq == 2:
            i, j = where
            if abs(i - j) == 1:
                if i > j:
                    # gate array assumes (q0, q1) ordering — swap via
                    # transposing the gate
                    U4 = jnp.reshape(to_device(U), (2, 2, 2, 2))
                    U = jnp.reshape(
                        jnp.transpose(U4, (1, 0, 3, 2)), (4, 4)
                    )
                    i, j = j, i
                self._psi.gate_split_(U, (i, j), **opts)
            else:
                if i > j:
                    U4 = jnp.reshape(to_device(U), (2, 2, 2, 2))
                    U = jnp.reshape(
                        jnp.transpose(U4, (1, 0, 3, 2)), (4, 4)
                    )
                    i, j = j, i
                self._psi.gate_with_auto_swap_(U, (i, j), **opts)
        else:
            self._apply_nq(U, where, **opts)

    def _apply_nq(self, U, where, **opts):
        """Apply an n-qubit (n >= 3) gate: swap the involved sites
        adjacent, contract the gate with the site blob, re-split by
        successive SVDs, swap back."""
        from ..core import Tensor, rand_uuid, tensor_contract
        from ..tn1d.core import _swap_gate

        psi = self._psi
        k = len(where)
        SWAP = _swap_gate(2, psi.dtype)
        swaps = []
        # site_of[q] = which site currently holds (original) qubit q
        site_of = list(range(self.N))

        def do_swap(a):
            psi.gate_split_(SWAP, (a, a + 1), **opts)
            qa = site_of.index(a)
            qb = site_of.index(a + 1)
            site_of[qa], site_of[qb] = a + 1, a
            swaps.append(a)

        # bubble the group together: repeatedly move the outermost
        # member inward until the occupied sites are contiguous
        def occupied():
            return sorted(site_of[q] for q in where)

        occ = occupied()
        while occ[-1] - occ[0] >= k:
            # find the largest gap and close it from the right end
            do_swap(occ[-1] - 1)
            occ = occupied()

        sites = occupied()
        # bind gate legs by qubit -> current site index names
        inds = [psi.site_ind(site_of[q]) for q in where]
        new_inds = {ix: rand_uuid() for ix in inds}
        ts = [psi[psi.site_tag(s)] for s in sites]
        for t in ts:
            t.reindex_({ix: new_inds[ix] for ix in inds
                        if ix in t.inds})
        TG = Tensor(
            jnp.reshape(to_device(U, dtype=psi.dtype),
                        (2,) * (2 * k)),
            inds=(*inds, *[new_inds[ix] for ix in inds]),
        )
        blob = tensor_contract(*ts, TG, preserve_tensor=True)
        # split back left to right over the contiguous sites
        split_opts = {k_: v for k_, v in opts.items()
                      if k_ in ("max_bond", "cutoff", "cutoff_mode")}
        left_bond = []
        if sites[0] > 0:
            left_bond = [
                ix for ix in psi[psi.site_tag(sites[0] - 1)].inds
                if ix in blob.inds
            ]
        rem = blob
        for s in sites[:-1]:
            lix = list(left_bond) + [psi.site_ind(s)]
            tl, tr = rem.split(
                left_inds=lix, get="tensors", absorb="right",
                **split_opts,
            )
            tl.modify(tags=psi[psi.site_tag(s)].tags)
            psi[psi.site_tag(s)] = tl
            left_bond = [ix for ix in tr.inds if ix in tl.inds]
            rem = tr
        rem.modify(tags=psi[psi.site_tag(sites[-1])].tags)
        psi[psi.site_tag(sites[-1])] = rem
        # swap back
        for a in reversed(swaps):
            psi.gate_split_(SWAP, (a, a + 1), **opts)

    @property
    def psi(self):
        return self._psi.copy()

    def amplitude(self, b, **kwargs):
        if isinstance(b, str):
            b = tuple(int(x) for x in b)
        return maybe_host_scalar(self._psi.amplitude(b))

    def to_dense(self, **kwargs):
        return self._psi.to_dense()

    def sample(self, C, seed=None, **kwargs):
        for config, _ in self._psi.sample(C, seed=seed):
            yield "".join(map(str, config))

    def local_expectation(self, G, where, **kwargs):
        if isinstance(where, numbers.Integral):
            where = (where,)
        psi = self._psi
        bra = psi.H
        ket = psi.gate(G, tuple(where), contract=True) \
            if len(where) == 1 else psi.gate(
                G, tuple(where), contract="split")
        from ..tn1d.core import expec_TN_1D

        return expec_TN_1D(bra, ket)

    def partial_trace(self, keep, **kwargs):
        if isinstance(keep, numbers.Integral):
            keep = (keep,)
        return self._psi.partial_trace(keep)

    def fidelity_estimate(self):
        """Product of per-gate truncation fidelities ~ |<psi_ideal|
        psi>|^2 estimate (reference mps.py:468)."""
        return float(jnp.real(self._psi.norm())) ** 2


class CircuitPermMPS(CircuitMPS):
    """MPS circuit simulator with lazy qubit permutation: long-range
    gates swap *logical* positions instead of swapping back
    (reference ``CircuitPermMPS`` mps.py:569)."""

    def __init__(self, N=None, psi0=None, **kwargs):
        super().__init__(N=N, psi0=psi0, **kwargs)
        self.qubit_perm = list(range(self.N))

    def _apply_array(self, U, where, tags=None, **opts):
        opts = {**self.gate_opts, **opts}
        opts.pop("contract", None)
        # map logical qubits to current physical sites
        phys = [self.qubit_perm.index(q) for q in where]
        if len(phys) == 1:
            self._psi.gate_(U, phys[0], contract=True)
            return
        if len(phys) > 2:
            # adjacent-blob application at physical positions (swaps
            # are restored so the permutation is unchanged)
            self._apply_nq(U, tuple(phys), **opts)
            return
        i, j = phys
        swapped = False
        if i > j:
            U4 = jnp.reshape(to_device(U), (2, 2, 2, 2))
            U = jnp.reshape(jnp.transpose(U4, (1, 0, 3, 2)), (4, 4))
            i, j = j, i
            swapped = True
        # swap j down next to i (logically permuting)
        from ..tn1d.core import _swap_gate

        SWAP = _swap_gate(2, self._psi.dtype)
        while j > i + 1:
            self._psi.gate_split_(SWAP, (j - 1, j), **opts)
            self.qubit_perm[j - 1], self.qubit_perm[j] = \
                self.qubit_perm[j], self.qubit_perm[j - 1]
            j -= 1
        self._psi.gate_split_(U, (i, j), **opts)

    def get_psi_unpermuted(self):
        """The state with physical sites relabelled back to logical
        order."""
        psi = self._psi.copy()
        # relabel site inds: physical site p holds logical qubit
        # qubit_perm[p]
        remap = {
            psi.site_ind(p): f"__logical{q}__"
            for p, q in enumerate(self.qubit_perm)
        }
        psi.reindex_(remap)
        psi.reindex_({
            f"__logical{q}__": psi._site_ind_id.format(q)
            for q in range(self.N)
        })
        return psi

    def amplitude(self, b, **kwargs):
        if isinstance(b, str):
            b = tuple(int(x) for x in b)
        # permute bits to physical order
        bp = tuple(b[self.qubit_perm[p]] for p in range(self.N))
        return maybe_host_scalar(self._psi.amplitude(bp))

    def to_dense(self, **kwargs):
        psi = self.get_psi_unpermuted()
        inds = [psi._site_ind_id.format(q) for q in range(self.N)]
        t = psi.contract(..., output_inds=tuple(inds),
                         preserve_tensor=True)
        return jnp.reshape(t.data, (-1, 1))

    def sample(self, C, seed=None, **kwargs):
        for config, _ in self._psi.sample(C, seed=seed):
            logical = [0] * self.N
            for p, v in enumerate(config):
                logical[self.qubit_perm[p]] = v
            yield "".join(map(str, logical))


class CircuitMPSLazy(CircuitMPS):
    """MPS circuit simulator with deferred gate application: gates
    accumulate lazily and are flushed in batches through the 1D
    compression machinery (reference ``CircuitMPSLazy`` mps.py:733 —
    periodic 'src' compression). Long-range gates flush the queue and
    apply via auto-swap."""

    def __init__(self, N=None, psi0=None, flush_every=8,
                 compress_method="zipup-oversample", **kwargs):
        super().__init__(N=N, psi0=psi0, **kwargs)
        self.flush_every = flush_every
        self.compress_method = compress_method
        self._queue = []

    def _apply_array(self, U, where, tags=None, **opts):
        nq = len(where)
        adjacent = nq == 1 or (
            nq == 2 and abs(where[0] - where[1]) == 1
        )
        if adjacent:
            self._queue.append((U, tuple(where)))
            if len(self._queue) >= self.flush_every:
                self.flush()
        else:
            self.flush()
            super()._apply_array(U, where, tags=tags, **opts)

    def flush(self):
        """Apply all queued gates lazily then compress back to MPS."""
        if not self._queue:
            return
        from ..core import TensorNetwork, Tensor, rand_uuid
        from ..tn1d.compress import tensor_network_1d_compress

        psi = self._psi
        tn = TensorNetwork(psi.copy(), virtual=True,
                           check_collisions=False)
        tn.view_like_(psi)
        from ..gating import gate_split_gate
        from ..core import Tensor as _T

        def lazy_1q(G, q):
            ix = psi.site_ind(q)
            new = rand_uuid()
            for tid in tuple(tn.ind_map[ix]):
                tn.tensor_map[tid].reindex_({ix: new})
            tn.add_tensor(_T(
                to_device(G, dtype=psi.dtype), (ix, new),
                tags=[psi.site_tag(q)],
            ), virtual=True)

        for (U, where) in self._queue:
            if len(where) == 1:
                lazy_1q(U, where[0])
                continue
            i, j = where
            if i > j:
                U4 = jnp.reshape(to_device(U), (2, 2, 2, 2))
                U = jnp.reshape(
                    jnp.transpose(U4, (1, 0, 3, 2)), (4, 4)
                )
                i, j = j, i
            # factor the gate spatially so each piece joins its own
            # site column
            Gl, Gr, kk = gate_split_gate(
                to_device(U, dtype=psi.dtype), 2, (2, 2)
            )
            bix = rand_uuid()
            for (q, G) in ((i, Gl), (j, Gr)):
                ix = psi.site_ind(q)
                new = rand_uuid()
                for tid in tuple(tn.ind_map[ix]):
                    tn.tensor_map[tid].reindex_({ix: new})
                tn.add_tensor(_T(
                    to_device(G, dtype=psi.dtype), (ix, new, bix),
                    tags=[psi.site_tag(q)],
                ), virtual=True)
        self._queue = []
        new = tensor_network_1d_compress(
            tn, max_bond=self.gate_opts.get("max_bond"),
            cutoff=self.gate_opts.get("cutoff", 1e-10),
            method=self.compress_method,
            site_tags=psi.site_tags, site_inds=psi.site_inds,
        )
        new.reindex_sites_(psi._site_ind_id)
        self._psi = new

    @property
    def psi(self):
        self.flush()
        return self._psi.copy()

    def amplitude(self, b, **kwargs):
        self.flush()
        return super().amplitude(b, **kwargs)

    def to_dense(self, **kwargs):
        self.flush()
        return super().to_dense(**kwargs)

    def sample(self, C, seed=None, **kwargs):
        self.flush()
        yield from super().sample(C, seed=seed, **kwargs)

    def local_expectation(self, G, where, **kwargs):
        self.flush()
        return super().local_expectation(G, where, **kwargs)


# ---------------------------------------------------------------------------
# parity extras (reference mps.py:243-880)
# ---------------------------------------------------------------------------

def _cmps_compute_marginal(self, where, fix=None, **kwargs):
    """Probability distribution p(where | fix) from the MPS state
    (reference ``compute_marginal`` mps.py:243)."""
    fix = dict(fix or {})
    psi = self._psi.copy()
    for q, v in fix.items():
        psi.isel_({psi.site_ind(q): int(v)})
    rho = psi.partial_trace(tuple(where))
    p = np.clip(np.asarray(jnp.real(jnp.diag(jnp.asarray(rho)))),
                0, None)
    return p


def _cmps_sample_chaotic(self, C, marginal_qubits, fix=None,
                         seed=None, **kwargs):
    """Sample only ``marginal_qubits`` exactly, the rest uniformly —
    valid deep in the chaotic regime (reference ``sample_chaotic``
    mps.py:323)."""
    rng = np.random.default_rng(seed)
    if isinstance(marginal_qubits, numbers.Integral):
        marginal_qubits = tuple(range(marginal_qubits))
    else:
        marginal_qubits = tuple(marginal_qubits)
    p = _cmps_compute_marginal(self, marginal_qubits, fix=fix)
    p = p / p.sum()
    rest = [q for q in range(self.N) if q not in marginal_qubits]
    for _ in range(C):
        out = ["0"] * self.N
        sub = rng.choice(p.size, p=p)
        bits = np.binary_repr(sub, len(marginal_qubits))
        for q, b in zip(marginal_qubits, bits):
            out[q] = b
        for q in rest:
            out[q] = str(rng.integers(2))
        yield "".join(out)


def _cmps_error_estimate(self):
    """``1 - fidelity_estimate()`` (reference ``error_estimate``
    mps.py:491)."""
    return 1 - self.fidelity_estimate()


def _cmps_uni(self):
    raise NotImplementedError(
        "CircuitMPS contracts the state as it goes — the unitary TN "
        "is not available"
    )


def _cmps_schrodinger_contract(self, *args, **kwargs):
    """The MPS state *is* the Schrödinger-contracted state: returns
    the dense vector."""
    return self.to_dense(**kwargs)


CircuitMPS.compute_marginal = _cmps_compute_marginal
CircuitMPS.sample_chaotic = _cmps_sample_chaotic
CircuitMPS.error_estimate = _cmps_error_estimate
CircuitMPS.uni = property(lambda self: _cmps_uni(self))
CircuitMPS.schrodinger_contract = _cmps_schrodinger_contract

# logical-order state: the reference name is ``get_psi_unordered``
CircuitPermMPS.get_psi_unordered = \
    lambda self: self._psi.copy()
CircuitPermMPS.get_psi = CircuitPermMPS.get_psi_unpermuted


def _cmpslazy_get_psi(self):
    """Flush pending gates then return the current MPS (reference
    ``CircuitMPSLazy.get_psi``)."""
    self.flush()
    return self._psi.copy()


CircuitMPSLazy.get_psi = _cmpslazy_get_psi
CircuitMPSLazy.max_bond = property(
    lambda self: self.gate_opts.get("max_bond"),
    lambda self, v: self.gate_opts.__setitem__("max_bond", v),
)
CircuitMPSLazy.cutoff = property(
    lambda self: self.gate_opts.get("cutoff", 1e-10),
    lambda self, v: self.gate_opts.__setitem__("cutoff", v),
)
CircuitMPSLazy.method = property(
    lambda self: self.compress_method,
    lambda self, v: setattr(self, "compress_method", v),
)
