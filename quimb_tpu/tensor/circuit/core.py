"""Quantum circuit simulation via tensor networks.

Re-design of reference ``quimb/tensor/circuit/`` (``CircuitBase``
core.py:49 with ~80 named gate methods; exact TN ``Circuit`` exact.py:38
with reverse-lightcone extraction :215,271, ``amplitude`` :417,
marginal-cached ``sample`` :1135, ``local_expectation`` :659,
``to_dense`` :1851, ``CircuitDense`` :2026).

TPU-native path: every amplitude/marginal is (lightcone-select →
full_simplify → path-optimize → jitted einsum chain). The contraction
expression cache means repeated amplitudes/samples with the same
geometry reuse one compiled XLA program; sliced contraction of hard
networks distributes across the device mesh via ``cut_iter`` +
``shard_map`` (see quimb_tpu.parallel).
"""

import functools
import math
import numbers

import jax.numpy as jnp
import numpy as np

from ...ops.backend import maybe_host_scalar, to_device
from ...config import get_default_dtype
from ...utils import LRU, oset
from ..core import Tensor, TensorNetwork, rand_uuid
from ..tn1d.builders import MPS_computational_state
from .gates import (
    ALL_GATES,
    CONSTANT_GATES,
    GATE_SIZE,
    PARAM_GATES,
    Gate,
)


def parse_to_gate(gate_id, *gate_args, params=None, qubits=None,
                  controls=None, gate_round=None, parametrize=False):
    """Normalize the many ``apply_gate`` call signatures into a Gate."""
    if isinstance(gate_id, Gate):
        return gate_id
    if hasattr(gate_id, "shape") and not isinstance(gate_id, str):
        # raw array
        return Gate.from_raw(gate_id, qubits or gate_args)
    label = gate_id.upper()
    nq = GATE_SIZE.get(label)
    if label in PARAM_GATES:
        import inspect

        nparams = len(
            inspect.signature(PARAM_GATES[label]).parameters
        )
        if PARAM_GATES[label].__name__ == "su4_gate":
            nparams = 15
    else:
        nparams = 0
    if qubits is not None:
        params = tuple(gate_args) if params is None else tuple(params)
        qubits = tuple(qubits)
    else:
        gate_args = tuple(gate_args)
        if nparams:
            params = gate_args[:nparams]
            qubits = gate_args[nparams:]
        else:
            params = ()
            qubits = gate_args
    return Gate(label, params, qubits, controls=controls,
                round=gate_round, parametrize=parametrize)


class CircuitBase:
    """Shared gate front-end (reference ``CircuitBase``
    circuit/core.py:49)."""

    def __init__(self, N=None, psi0=None, gate_opts=None, tags=None,
                 dtype=None):
        self.dtype = dtype or get_default_dtype()
        if psi0 is None:
            if N is None:
                raise ValueError("supply N or psi0")
            self.N = N
            psi0 = MPS_computational_state(
                "0" * N, dtype=self.dtype
            )
        else:
            self.N = psi0.L
            psi0 = psi0.copy().astype_(self.dtype)
        self._psi = self._init_state(psi0)
        self.gate_opts = dict(gate_opts or {})
        self.gates = []
        self._tags = tags

    def _init_state(self, psi0):
        return psi0

    # -- gate application -----------------------------------------------------

    def apply_gate(self, gate_id, *gate_args, gate_round=None, **opts):
        """Apply a gate: ``circ.apply_gate('H', 0)``,
        ``circ.apply_gate('RX', 0.4, 1)``, a Gate object, or a raw
        array with ``qubits=``."""
        gate = parse_to_gate(gate_id, *gate_args, gate_round=gate_round,
                             **{k: opts.pop(k) for k in
                                ("params", "qubits", "controls",
                                 "parametrize") if k in opts})
        self._apply_gate(gate, **opts)
        return self

    def _apply_gate(self, gate, **opts):
        tags = [f"GATE_{len(self.gates)}"]
        if gate.round is not None:
            tags.append(f"ROUND_{gate.round}")
        if isinstance(gate.label, str):
            tags.append(gate.label)
        self.gates.append(gate)
        U = to_device(gate.build_array(), dtype=self.dtype)
        where = (*gate.controls, *gate.qubits)
        self._apply_array(U, where, tags=tags, **opts)

    def _apply_array(self, U, where, tags=None, **opts):
        raise NotImplementedError

    def apply_gates(self, gates, **opts):
        for g in gates:
            if isinstance(g, Gate):
                self._apply_gate(g, **opts)
            else:
                self.apply_gate(*g, **opts)
        return self

    def apply_gate_raw(self, U, where, tags=None, **opts):
        gate = Gate.from_raw(U, where, tags=tags)
        self._apply_gate(gate, **opts)
        return self

    @property
    def num_gates(self):
        return len(self.gates)

    def copy(self):
        import copy as _c

        new = object.__new__(self.__class__)
        new.__dict__ = {
            k: (v.copy() if hasattr(v, "copy") else v)
            for k, v in self.__dict__.items()
        }
        new.gates = list(self.gates)
        return new

    # -- named gate methods ---------------------------------------------------

    def _make_gate_method(name):  # noqa: N805
        def meth(self, *args, gate_round=None, **opts):
            return self.apply_gate(name, *args, gate_round=gate_round,
                                   **opts)

        meth.__name__ = name.lower()
        return meth

    h = _make_gate_method("H")
    x = _make_gate_method("X")
    y = _make_gate_method("Y")
    z = _make_gate_method("Z")
    s = _make_gate_method("S")
    sdg = _make_gate_method("SDG")
    t = _make_gate_method("T")
    tdg = _make_gate_method("TDG")
    sx = _make_gate_method("SX")
    sxdg = _make_gate_method("SXDG")
    x_1_2 = _make_gate_method("X_1_2")
    y_1_2 = _make_gate_method("Y_1_2")
    w_1_2 = _make_gate_method("W_1_2")
    hz_1_2 = _make_gate_method("HZ_1_2")
    rx = _make_gate_method("RX")
    ry = _make_gate_method("RY")
    rz = _make_gate_method("RZ")
    u3 = _make_gate_method("U3")
    u2 = _make_gate_method("U2")
    u1 = _make_gate_method("U1")
    p = _make_gate_method("P")
    cnot = _make_gate_method("CNOT")
    cx = _make_gate_method("CX")
    cy = _make_gate_method("CY")
    cz = _make_gate_method("CZ")
    cu3 = _make_gate_method("CU3")
    cu2 = _make_gate_method("CU2")
    cu1 = _make_gate_method("CU1")
    cp = _make_gate_method("CP")
    crx = _make_gate_method("CRX")
    cry = _make_gate_method("CRY")
    crz = _make_gate_method("CRZ")
    swap = _make_gate_method("SWAP")
    iswap = _make_gate_method("ISWAP")
    fsim = _make_gate_method("FSIM")
    fsimg = _make_gate_method("FSIMG")
    givens = _make_gate_method("GIVENS")
    rxx = _make_gate_method("RXX")
    ryy = _make_gate_method("RYY")
    rzz = _make_gate_method("RZZ")
    xx_plus_yy = _make_gate_method("XX_PLUS_YY")
    ccx = _make_gate_method("CCX")
    ccy = _make_gate_method("CCY")
    ccz = _make_gate_method("CCZ")
    cswap = _make_gate_method("CSWAP")
    toffoli = _make_gate_method("TOFFOLI")
    fredkin = _make_gate_method("FREDKIN")
    su4 = _make_gate_method("SU4")

    del _make_gate_method

    # -- constructors from external formats ------------------------------------

    @classmethod
    def from_qsim_str(cls, contents, **circuit_opts):
        """Build from a qsim-format string (reference ``from_qsim_str``
        circuit/core.py:378)."""
        from .qasm import parse_qsim_str

        info = parse_qsim_str(contents)
        qc = cls(info["n"], **circuit_opts)
        qc.apply_gates(info["gates"])
        return qc

    @classmethod
    def from_qsim_file(cls, fname, **circuit_opts):
        with open(fname) as f:
            return cls.from_qsim_str(f.read(), **circuit_opts)

    @classmethod
    def from_openqasm2_str(cls, contents, **circuit_opts):
        from .qasm import parse_openqasm2_str

        info = parse_openqasm2_str(contents)
        qc = cls(info["n"], **circuit_opts)
        qc.apply_gates(info["gates"])
        return qc

    @classmethod
    def from_openqasm2_file(cls, fname, **circuit_opts):
        with open(fname) as f:
            return cls.from_openqasm2_str(f.read(), **circuit_opts)

    @classmethod
    def from_openqasm3_str(cls, contents, **circuit_opts):
        from .qasm import parse_openqasm3_str

        info = parse_openqasm3_str(contents)
        qc = cls(info["n"], **circuit_opts)
        qc.apply_gates(info["gates"])
        return qc

    @classmethod
    def from_openqasm3_file(cls, fname, **circuit_opts):
        with open(fname) as f:
            return cls.from_openqasm3_str(f.read(), **circuit_opts)


class Circuit(CircuitBase):
    """Exact lazy-TN circuit simulator (reference ``Circuit``
    exact.py:38). Gates are appended as tensors; quantities are
    computed by lightcone selection + simplification + optimized
    contraction."""

    def __init__(self, N=None, psi0=None, gate_opts=None, tags=None,
                 dtype=None, convert_eager=False):
        gate_opts = dict(gate_opts or {})
        gate_opts.setdefault("contract", "auto-split-gate")
        super().__init__(N=N, psi0=psi0, gate_opts=gate_opts, tags=tags,
                         dtype=dtype)
        # map qubit -> list of gate numbers that touched it
        self._qubit_gates = {q: [] for q in range(self.N)}
        self._sample_cache = LRU(2**16)
        self._marginal_cache = LRU(2**12)

    def _init_state(self, psi0):
        psi = TensorNetwork(psi0, virtual=False)
        psi.view_like_(psi0)
        for i in range(psi0.L):
            psi[psi0.site_tag(i)].add_tag("PSI0")
        return psi

    @property
    def psi(self):
        """The current state as a tensor network (copy)."""
        psi = self._psi.copy()
        return psi

    def get_uni(self, transposed=False):
        raise NotImplementedError

    def _apply_array(self, U, where, tags=None, contract=None, **opts):
        opts = {**self.gate_opts, **opts}
        if contract is not None:
            opts["contract"] = contract
        gnum = len(self.gates) - 1
        nq = len(where)
        if nq == 1:
            opts["contract"] = True
        from ..gating import tensor_network_gate_inds

        inds = tuple(self._psi.site_ind(q) for q in where)
        tensor_network_gate_inds(
            self._psi, U, inds, tags=tags, inplace=True, **opts
        )
        for q in where:
            self._qubit_gates[q].append(gnum)

    # -- lightcones ---------------------------------------------------------

    def get_reverse_lightcone_tags(self, where):
        """Tags of gates in the reverse lightcone of qubits ``where``
        (reference exact.py:215)."""
        if isinstance(where, numbers.Integral):
            where = (where,)
        cone_qubits = set(where)
        cone_gates = []
        for gnum in range(len(self.gates) - 1, -1, -1):
            g = self.gates[gnum]
            gq = set(g.qubits) | set(g.controls)
            if gq & cone_qubits:
                cone_gates.append(gnum)
                cone_qubits |= gq
        return tuple(f"GATE_{g}" for g in reversed(cone_gates)), \
            cone_qubits

    def get_psi_reverse_lightcone(self, where, keep_psi0=False):
        """The sub network of the state affecting qubits ``where``
        (reference exact.py:271)."""
        if isinstance(where, numbers.Integral):
            where = (where,)
        tags, cone_qubits = self.get_reverse_lightcone_tags(where)
        psi = self._psi
        keep = oset(tags)
        keep.update(
            psi.site_tag(q) if hasattr(psi, "site_tag") else f"I{q}"
            for q in cone_qubits
        )
        tn = psi.select(tuple(keep), which="any").copy()
        # non-cone initial-state tensors are norm-1 product tensors and
        # are excluded entirely (the reference's lightcone trick)
        tn.view_like_(psi)
        return tn

    # -- quantities -----------------------------------------------------------

    def amplitude(self, b, optimize="auto", simplify_sequence="ADCR",
                  simplify_atol=1e-12, rehearse=False, backend=None,
                  dtype=None):
        """The amplitude <b|psi> (reference ``amplitude``
        exact.py:417)."""
        if isinstance(b, str):
            b = tuple(int(x) for x in b)
        psi = self._psi.copy()
        for q in range(self.N):
            ind = psi.site_ind(q)
            psi.isel_({ind: int(b[q])})
        psi.full_simplify_(
            seq=simplify_sequence, atol=simplify_atol, output_inds=(),
        )
        if rehearse:
            return {
                "tn": psi,
                "tree": psi.contraction_info(optimize=optimize),
            }
        return maybe_host_scalar(psi.contract(..., optimize=optimize))

    def amplitude_rehearse(self, b=None, **kwargs):
        if b is None:
            b = "0" * self.N
        return self.amplitude(b, rehearse=True, **kwargs)

    def partial_trace(self, keep, optimize="auto",
                      simplify_sequence="ADCR", simplify_atol=1e-12,
                      rehearse=False, **contract_opts):
        """Dense reduced density matrix of qubits ``keep``
        (reference ``partial_trace`` exact.py:561)."""
        if isinstance(keep, numbers.Integral):
            keep = (keep,)
        psi = self.get_psi_reverse_lightcone(keep)
        bra = psi.H
        kix = [psi.site_ind(q) for q in keep]
        bix = [rand_uuid() for _ in keep]
        bra.reindex_(dict(zip(kix, bix)))
        bra.mangle_inner_()
        rho_tn = psi & bra
        rho_tn.full_simplify_(
            seq=simplify_sequence, atol=simplify_atol,
            output_inds=(*kix, *bix),
        )
        if rehearse:
            return {"tn": rho_tn}
        t = rho_tn.contract(
            ..., output_inds=(*kix, *bix), optimize=optimize,
            preserve_tensor=True, **contract_opts,
        )
        d = 2 ** len(keep)
        return jnp.reshape(t.data, (d, d))

    def local_expectation(self, G, where, optimize="auto",
                          simplify_sequence="ADCR", simplify_atol=1e-12,
                          rehearse=False, **contract_opts):
        """<psi|G|psi> for a local operator on qubits ``where``
        (reference ``local_expectation`` exact.py:659)."""
        if isinstance(where, numbers.Integral):
            where = (where,)
        rho = self.partial_trace(
            keep=where, optimize=optimize,
            simplify_sequence=simplify_sequence,
            simplify_atol=simplify_atol, **contract_opts,
        )
        G = to_device(G, dtype=rho.dtype)
        d = rho.shape[0]
        G = jnp.reshape(G, (d, d))
        return maybe_host_scalar(jnp.trace(G @ rho))

    def compute_marginal(self, where, fix=None, optimize="auto",
                         simplify_sequence="ADCR", simplify_atol=1e-12,
                         **contract_opts):
        """Probability distribution p(where | fix) as a dense array
        (reference ``compute_marginal`` exact.py:780)."""
        fix = dict(fix or {})
        key = (tuple(where), tuple(sorted(fix.items())))
        cached = self._marginal_cache.get(key)
        if cached is not None:
            return cached
        cone_qubits = tuple(where) + tuple(fix)
        psi = self.get_psi_reverse_lightcone(cone_qubits)
        bra = psi.H
        # fix the fixed qubits on both layers
        sel = {}
        for q, v in fix.items():
            if psi.site_ind(q) in psi.ind_map:
                sel[psi.site_ind(q)] = int(v)
        psi.isel_(sel)
        bra.isel_(sel)
        kix = [psi.site_ind(q) for q in where]
        bix = [rand_uuid() for _ in where]
        bra.reindex_(dict(zip(kix, bix)))
        bra.mangle_inner_()
        rho_tn = psi & bra
        rho_tn.full_simplify_(
            seq=simplify_sequence, atol=simplify_atol,
            output_inds=(*kix, *bix),
        )
        t = rho_tn.contract(
            ..., output_inds=(*kix, *bix), optimize=optimize,
            preserve_tensor=True, **contract_opts,
        )
        d = 2 ** len(where)
        rho = jnp.reshape(t.data, (d, d))
        p = np.clip(np.asarray(jnp.real(jnp.diag(rho))), 0, None)
        self._marginal_cache[key] = p
        return p

    def calc_qubit_ordering(self, qubits=None, method="greedy-lightcone"):
        """Order qubits by increasing reverse-lightcone size
        (reference exact.py:918)."""
        if qubits is None:
            qubits = range(self.N)
        sizes = {}
        for q in qubits:
            _, cone = self.get_reverse_lightcone_tags((q,))
            sizes[q] = len(cone)
        return tuple(sorted(sizes, key=sizes.get))

    def sample(self, C, qubits=None, order=None, group_size=1,
               seed=None, optimize="auto", simplify_sequence="ADCR",
               simplify_atol=1e-12, **contract_opts):
        """Generate ``C`` samples via chain-rule marginals with caching
        (reference ``sample`` exact.py:1135)."""
        rng = np.random.default_rng(seed)
        if qubits is None:
            qubits = tuple(range(self.N))
        if order is None:
            order = self.calc_qubit_ordering(qubits)
        groups = [
            order[i:i + group_size]
            for i in range(0, len(order), group_size)
        ]
        for _ in range(C):
            fix = {}
            for grp in groups:
                p = self.compute_marginal(
                    grp, fix=fix, optimize=optimize,
                    simplify_sequence=simplify_sequence,
                    simplify_atol=simplify_atol, **contract_opts,
                )
                p = p / p.sum()
                outcome = rng.choice(p.size, p=p)
                bits = [(outcome >> (len(grp) - 1 - i)) & 1
                        for i in range(len(grp))]
                for q, v in zip(grp, bits):
                    fix[q] = v
            yield "".join(str(fix[q]) for q in range(self.N)
                          if q in fix)

    def sample_chaotic(self, C, marginal_qubits, seed=None, **kwargs):
        """Sample assuming chaotic (near-uniform) marginals on all but
        ``marginal_qubits`` (reference ``sample_chaotic``
        exact.py:1374)."""
        rng = np.random.default_rng(seed)
        if isinstance(marginal_qubits, numbers.Integral):
            order = self.calc_qubit_ordering()
            marginal_qubits = order[:marginal_qubits]
        marginal_qubits = tuple(marginal_qubits)
        rest = [q for q in range(self.N) if q not in marginal_qubits]
        for _ in range(C):
            fix = {q: int(rng.integers(2)) for q in rest}
            p = self.compute_marginal(marginal_qubits, fix=fix, **kwargs)
            p = p / p.sum()
            outcome = rng.choice(p.size, p=p)
            bits = [(outcome >> (len(marginal_qubits) - 1 - i)) & 1
                    for i in range(len(marginal_qubits))]
            for q, v in zip(marginal_qubits, bits):
                fix[q] = v
            yield "".join(str(fix[q]) for q in range(self.N))

    def get_gate_by_gate_circuits(self, group_size=10):
        """Partition the gates into a growing sequence of prefix
        circuits, each acting on at most ``group_size`` new qubits
        compared to its predecessor (reference
        ``get_gate_by_gate_circuits`` exact.py:1589)."""
        circs = [self.__class__(self.N)]
        groups = []
        current_group = set()
        for gate in self.gates:
            qs = set(gate.qubits) | set(gate.controls)
            next_group = current_group | qs
            if len(next_group) > group_size and current_group:
                groups.append(tuple(sorted(current_group)))
                circs.append(circs[-1].copy())
                current_group = qs
            else:
                current_group = next_group
            circs[-1]._apply_gate(gate)
        groups.append(tuple(sorted(current_group)))
        return tuple(
            {"circuit": c, "where": g}
            for c, g in zip(circs, groups)
        )

    def sample_gate_by_gate(self, C, group_size=10, seed=None,
                            optimize="auto",
                            simplify_sequence="ADCR",
                            simplify_atol=1e-12, **contract_opts):
        """Sample via the gate-by-gate (Markov) method of Bravyi,
        Gosset & Liu arXiv:2112.08499: evolve a bitstring through a
        growing sequence of prefix circuits, resampling only the
        qubits each new gate group acts on (reference
        ``sample_gate_by_gate`` exact.py:1635). Total cost is
        comparable to one amplitude evaluation per gate group.

        Yields
        ------
        str
        """
        rng = np.random.default_rng(seed)
        key = ("gate_by_gate_circuits", group_size)
        if not hasattr(self, "_gbg_storage"):
            self._gbg_storage = {}
        circs_wheres = self._gbg_storage.get(key)
        if circs_wheres is None:
            circs_wheres = self.get_gate_by_gate_circuits(group_size)
            self._gbg_storage[key] = circs_wheres

        for _ in range(C):
            result = {q: 0 for q in range(self.N)}
            for cw in circs_wheres:
                circ_g = cw["circuit"]
                where = cw["where"]
                if not where:
                    continue
                fix = {q: v for q, v in result.items()
                       if q not in where}
                p = circ_g.compute_marginal(
                    where, fix=fix, optimize=optimize,
                    simplify_sequence=simplify_sequence,
                    simplify_atol=simplify_atol, **contract_opts,
                )
                p = p / p.sum()
                outcome = rng.choice(p.size, p=p)
                bits = [(outcome >> (len(where) - 1 - i)) & 1
                        for i in range(len(where))]
                for q, v in zip(where, bits):
                    result[q] = v
            yield "".join(str(result[q]) for q in range(self.N))

    def to_dense(self, optimize="auto", simplify_sequence="R",
                 simplify_atol=1e-12, **contract_opts):
        """Full dense statevector (reference ``to_dense``
        exact.py:1851)."""
        psi = self._psi.copy()
        output_inds = tuple(psi.site_ind(q) for q in range(self.N))
        psi.full_simplify_(
            seq=simplify_sequence, atol=simplify_atol,
            output_inds=output_inds,
        )
        t = psi.contract(
            ..., output_inds=output_inds, optimize=optimize,
            preserve_tensor=True, **contract_opts,
        )
        return jnp.reshape(t.data, (-1, 1))

    def simulate_counts(self, C, seed=None, **kwargs):
        """Sample C measurements into a counts dict."""
        counts = {}
        for b in self.sample(C, seed=seed, **kwargs):
            counts[b] = counts.get(b, 0) + 1
        return counts

    def xeb(self, samples, **kwargs):
        """Linear cross-entropy benchmark from bitstring samples."""
        d = 2**self.N
        total = 0.0
        n = 0
        for b in samples:
            p = abs(complex(self.amplitude(b, **kwargs))) ** 2
            total += p
            n += 1
        return d * total / n - 1

    def xeb_ex(self, optimize="auto", **kwargs):
        """Exact expected XEB = d * sum_b p(b)^2 - 1 (reference
        ``xeb_ex`` exact.py:1944) — here via dense computation for
        moderate N."""
        psi = np.asarray(self.to_dense(optimize=optimize, **kwargs))
        p = np.abs(psi.reshape(-1)) ** 2
        return float(2**self.N * np.sum(p**2) - 1)

    # -- introspection -----------------------------------------------------

    def amplitude_tn(self, b=None):
        if b is None:
            b = "0" * self.N
        return self.amplitude(b, rehearse=True)["tn"]

    def __repr__(self):
        return (
            f"<{self.__class__.__name__}(n={self.N}, "
            f"num_gates={self.num_gates})>"
        )


class CircuitDense(CircuitBase):
    """Dense statevector simulator (reference ``CircuitDense``
    exact.py:2026) — gates applied eagerly to a (2^N,) device array.
    The cross-check simulator for everything else."""

    def _init_state(self, psi0):
        return jnp.reshape(
            to_device(psi0.to_dense(), dtype=self.dtype), (-1,)
        )

    def _apply_array(self, U, where, tags=None, **opts):
        n = self.N
        nq = len(where)
        psi = jnp.reshape(self._psi, (2,) * n)
        Ut = jnp.reshape(to_device(U, dtype=self.dtype), (2,) * (2 * nq))
        axes = list(where)
        psi = jnp.tensordot(Ut, psi, axes=(list(range(nq, 2 * nq)), axes))
        # output axes of U are now leading; move them back
        psi = jnp.moveaxis(psi, list(range(nq)), axes)
        self._psi = jnp.reshape(psi, (-1,))

    @property
    def psi(self):
        return jnp.reshape(self._psi, (-1, 1))

    def to_dense(self, **kwargs):
        return jnp.reshape(self._psi, (-1, 1))

    def amplitude(self, b, **kwargs):
        if isinstance(b, str):
            b = tuple(int(x) for x in b)
        idx = 0
        for v in b:
            idx = 2 * idx + int(v)
        return maybe_host_scalar(self._psi[idx])

    def sample(self, C, seed=None, **kwargs):
        from ...calc import simulate_counts

        p = np.clip(np.abs(np.asarray(self._psi)) ** 2, 0, None)
        p /= p.sum()
        rng = np.random.default_rng(seed)
        for s in rng.choice(p.size, size=C, p=p):
            yield np.binary_repr(s, self.N)

    def partial_trace(self, keep, **kwargs):
        from ...core import partial_trace as ptr

        if isinstance(keep, numbers.Integral):
            keep = (keep,)
        return ptr(self.psi, (2,) * self.N, keep)

    def local_expectation(self, G, where, **kwargs):
        if isinstance(where, numbers.Integral):
            where = (where,)
        rho = self.partial_trace(where)
        G = to_device(G, dtype=rho.dtype)
        d = rho.shape[0]
        return jnp.trace(jnp.reshape(G, (d, d)) @ rho)
