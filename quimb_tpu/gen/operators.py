"""Operator generation: paulis, spin operators, gates, Hamiltonians.

Re-design of reference ``quimb/gen/operators.py`` (``pauli``,
``spin_operator``, ``ham_heis`` :893, ``ham_heis_2D`` :1277, ``ham_mbl``,
gate set). Dense operators are small host-built numpy constants promoted
to device arrays; large sparse Hamiltonians are built as index/coupling
lists consumed by the device matvec kernels (see quimb_tpu.core /
quimb_tpu.operator).
"""

import functools
import math

import jax.numpy as jnp
import numpy as np

from ..config import get_default_dtype


def _asdevice(x, dtype=None):
    from ..ops.backend import to_device

    dtype = dtype or get_default_dtype()
    return to_device(np.asarray(x), dtype=dtype)


@functools.lru_cache(maxsize=64)
def _pauli_np(xyz):
    return {
        "I": np.eye(2, dtype=complex),
        "X": np.array([[0, 1], [1, 0]], dtype=complex),
        "Y": np.array([[0, -1j], [1j, 0]], dtype=complex),
        "Z": np.array([[1, 0], [0, -1]], dtype=complex),
    }[xyz.upper()]


def pauli(xyz, dim=2, dtype=None):
    """Pauli operator (reference gen/operators.py pauli)."""
    if dim != 2:
        return spin_operator(xyz, S=(dim - 1) / 2, dtype=dtype) * 2.0
    return _asdevice(_pauli_np(str(xyz)), dtype)


@functools.lru_cache(maxsize=64)
def _spin_op_np(label, S):
    d = int(2 * S + 1)
    m = np.arange(S, -S - 1, -1)
    if label in ("z", "Z"):
        return np.diag(m).astype(complex)
    # ladder operators
    sp = np.zeros((d, d), dtype=complex)
    for i in range(d - 1):
        mm = m[i + 1]
        sp[i, i + 1] = math.sqrt(S * (S + 1) - mm * (mm + 1))
    if label in ("+", "p"):
        return sp
    if label in ("-", "m"):
        return sp.conj().T
    if label in ("x", "X"):
        return (sp + sp.conj().T) / 2
    if label in ("y", "Y"):
        return (sp - sp.conj().T) / 2j
    if label in ("i", "I"):
        return np.eye(d, dtype=complex)
    raise ValueError(f"unknown spin operator {label}")


def spin_operator(label, S=1 / 2, dtype=None):
    """Spin-S operator ('x','y','z','+','-','i')."""
    return _asdevice(_spin_op_np(str(label), float(S)), dtype)


def identity(d, dtype=None):
    return _asdevice(np.eye(d), dtype)


eye = identity


def hadamard(dtype=None, sparse=False):
    return _asdevice(np.array([[1, 1], [1, -1]]) / math.sqrt(2), dtype)


def phase_gate(phi, dtype=None, sparse=False):
    return _asdevice(np.diag([1, np.exp(1j * phi)]), dtype)


def S_gate(dtype=None, sparse=False):
    return phase_gate(math.pi / 2, dtype)


def T_gate(dtype=None, sparse=False):
    return phase_gate(math.pi / 4, dtype)


def rotation(phi, xyz="Z", dtype=None, sparse=False):
    """Rotation e^{-i phi/2 sigma_xyz}."""
    import scipy.linalg as sla

    P = np.asarray(_pauli_np(xyz))
    return _asdevice(sla.expm(-1j * phi / 2 * P), dtype)


Rx = functools.partial(rotation, xyz="X")
Ry = functools.partial(rotation, xyz="Y")
Rz = functools.partial(rotation, xyz="Z")


def U_gate(theta, phi, lamda, dtype=None):
    """General single-qubit U3 gate."""
    c, s = math.cos(theta / 2), math.sin(theta / 2)
    return _asdevice(
        np.array([
            [c, -np.exp(1j * lamda) * s],
            [np.exp(1j * phi) * s, np.exp(1j * (phi + lamda)) * c],
        ]),
        dtype,
    )


def Xsqrt(dtype=None, **kwargs):
    return _asdevice(
        0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]]), dtype
    )


def Ysqrt(dtype=None, **kwargs):
    return _asdevice(
        0.5 * np.array([[1 + 1j, -1 - 1j], [1 + 1j, 1 + 1j]]), dtype
    )


def Zsqrt(dtype=None, **kwargs):
    return _asdevice(np.diag([1, 1j]), dtype)


def Wsqrt(dtype=None, **kwargs):
    """sqrt(W) with W = (X+Y)/sqrt(2) (the Sycamore gate set)."""
    isq2 = 1 / math.sqrt(2)
    W = isq2 * (np.asarray(_pauli_np("X")) + np.asarray(_pauli_np("Y")))
    w, V = np.linalg.eigh(W)
    sqrtW = (V * np.sqrt(w.astype(complex))) @ V.conj().T
    return _asdevice(sqrtW, dtype)


def _swap_np(dim=2):
    d = dim
    M = np.zeros((d * d, d * d))
    for a in range(d):
        for b in range(d):
            M[a * d + b, b * d + a] = 1.0
    return M


def swap(dim=2, dtype=None, **kwargs):
    """SWAP gate for two qudits."""
    return _asdevice(_swap_np(dim), dtype)


def iswap(dtype=None, **kwargs):
    M = np.array([
        [1, 0, 0, 0],
        [0, 0, 1j, 0],
        [0, 1j, 0, 0],
        [0, 0, 0, 1],
    ])
    return _asdevice(M, dtype)


def fsim(theta, phi, dtype=None, **kwargs):
    """The fermionic-simulation gate."""
    c, s = math.cos(theta), math.sin(theta)
    M = np.array([
        [1, 0, 0, 0],
        [0, c, -1j * s, 0],
        [0, -1j * s, c, 0],
        [0, 0, 0, np.exp(-1j * phi)],
    ])
    return _asdevice(M, dtype)


def fsimg(theta, zeta, chi, gamma, phi, dtype=None, **kwargs):
    """General fsim gate (5 parameters)."""
    c, s = math.cos(theta), math.sin(theta)
    M = np.array([
        [1, 0, 0, 0],
        [0, np.exp(-1j * (gamma + zeta)) * c,
         -1j * np.exp(-1j * (gamma - chi)) * s, 0],
        [0, -1j * np.exp(-1j * (gamma + chi)) * s,
         np.exp(-1j * (gamma - zeta)) * c, 0],
        [0, 0, 0, np.exp(-1j * (2 * gamma + phi))],
    ])
    return _asdevice(M, dtype)


def ncontrolled_gate(ncontrol, gate, dtype=None, sparse=False):
    """Build an n-controlled gate."""
    gate = np.asarray(gate)
    d = 2**ncontrol * gate.shape[0]
    M = np.eye(d, dtype=complex)
    M[-gate.shape[0]:, -gate.shape[1]:] = gate
    return _asdevice(M, dtype)


def controlled(s, dtype=None, sparse=False):
    """Controlled version of a named pauli ('x','y','z','not')."""
    s = {"not": "x"}.get(s.lower(), s.lower())
    return ncontrolled_gate(1, np.asarray(_pauli_np(s)), dtype)


CNOT = functools.partial(controlled, "not")


def cX(dtype=None):
    return controlled("x", dtype)


def cY(dtype=None):
    return controlled("y", dtype)


def cZ(dtype=None):
    return controlled("z", dtype)


def ccX(dtype=None):
    return ncontrolled_gate(2, _pauli_np("X"), dtype)


toffoli = ccX


def ccY(dtype=None):
    """Double-controlled Y gate (reference ``ccY``
    gen/operators.py:779)."""
    return ncontrolled_gate(2, _pauli_np("Y"), dtype)


def ccZ(dtype=None):
    """Double-controlled Z gate (reference ``ccZ``
    gen/operators.py:803)."""
    return ncontrolled_gate(2, _pauli_np("Z"), dtype)


def fredkin(dtype=None):
    # build from the host-side matrix: np.asarray on a complex device
    # array is an eager transfer, which the TPU backend cannot do
    return ncontrolled_gate(1, _swap_np(2), dtype)


cswap = fredkin
controlled_swap = fredkin


def shift(dim, power=1, dtype=None):
    """Cyclic shift operator of dimension ``dim`` raised to ``power``
    (reference ``shift`` gen/operators.py:214)."""
    power = power % dim
    S = np.zeros((dim, dim), dtype=complex)
    for i in range(dim):
        S[(i + power) % dim, i] = 1.0
    return _asdevice(S, dtype)


def clock(dim, power=1, dtype=None):
    """Clock operator diag(w^0, w^p, w^2p, ...) with w the primitive
    dim-th root of unity (reference ``clock``
    gen/operators.py:256)."""
    omega = np.exp(power * 2j * np.pi / dim)
    C = np.diag(omega ** np.arange(dim))
    return _asdevice(C, dtype)


# ---------------------------------------------------------------------------
# dense Hamiltonians (exact layer); see quimb_tpu.core.kron based builders
# ---------------------------------------------------------------------------


def ham_heis(n, j=1.0, b=0.0, cyclic=False, sparse=False, dtype=None,
             **ikron_opts):
    """Heisenberg chain Hamiltonian, dense or BCOO sparse
    (reference gen/operators.py:893)."""
    from ..core import ham_from_terms

    try:
        jx, jy, jz = j
    except TypeError:
        jx = jy = jz = j
    try:
        bx, by, bz = b
    except TypeError:
        bx, by, bz = 0, 0, b

    dims = (2,) * n
    S = {s: np.asarray(_spin_op_np(s, 0.5)) for s in "xyz"}
    terms = []
    pairs = [(i, i + 1) for i in range(n - 1)]
    if cyclic and n > 2:
        pairs.append((n - 1, 0))
    for (i, k) in pairs:
        if jx:
            terms.append((jx, (S["x"], S["x"]), (i, k)))
        if jy:
            terms.append((jy, (S["y"], S["y"]), (i, k)))
        if jz:
            terms.append((jz, (S["z"], S["z"]), (i, k)))
    for i in range(n):
        if bx:
            terms.append((-bx, (S["x"],), (i,)))
        if by:
            terms.append((-by, (S["y"],), (i,)))
        if bz:
            terms.append((-bz, (S["z"],), (i,)))
    return ham_from_terms(terms, dims, sparse=sparse, dtype=dtype)


def ham_ising(n, jz=1.0, bx=1.0, cyclic=False, sparse=False, dtype=None,
              **opts):
    """Transverse-field Ising chain."""
    from ..core import ham_from_terms

    dims = (2,) * n
    S = {s: np.asarray(_spin_op_np(s, 0.5)) for s in "xz"}
    terms = []
    pairs = [(i, i + 1) for i in range(n - 1)]
    if cyclic and n > 2:
        pairs.append((n - 1, 0))
    for (i, k) in pairs:
        terms.append((4 * jz, (S["z"], S["z"]), (i, k)))
    for i in range(n):
        terms.append((-2 * bx, (S["x"],), (i,)))
    return ham_from_terms(terms, dims, sparse=sparse, dtype=dtype)


def ham_XY(n, jxy=1.0, bz=0.0, cyclic=False, sparse=False, dtype=None,
           **opts):
    return ham_heis(n, j=(jxy, jxy, 0.0), b=(0, 0, bz), cyclic=cyclic,
                    sparse=sparse, dtype=dtype)


def ham_XXZ(n, delta, jxy=1.0, cyclic=False, sparse=False, dtype=None):
    return ham_heis(n, j=(jxy, jxy, delta), cyclic=cyclic, sparse=sparse,
                    dtype=dtype)


def ham_mbl(n, dh, j=1.0, seed=None, cyclic=False, dh_dist="s", dh_dim=1,
            beta=None, sparse=False, dtype=None):
    """Many-body-localized spin hamiltonian: Heisenberg + random fields
    (reference gen/operators.py ham_mbl)."""
    from ..core import ham_from_terms

    rng = np.random.default_rng(seed)
    dims = (2,) * n
    S = {s: np.asarray(_spin_op_np(s, 0.5)) for s in "xyz"}
    try:
        jx, jy, jz = j
    except TypeError:
        jx = jy = jz = j
    terms = []
    pairs = [(i, i + 1) for i in range(n - 1)]
    if cyclic and n > 2:
        pairs.append((n - 1, 0))
    for (i, k) in pairs:
        for lbl, jj in zip("xyz", (jx, jy, jz)):
            if jj:
                terms.append((jj, (S[lbl], S[lbl]), (i, k)))
    # random fields
    if dh_dist in ("s", "flat", "uniform"):
        hz = rng.uniform(-dh, dh, n)
    elif dh_dist in ("g", "gauss", "normal"):
        hz = rng.normal(0, dh, n)
    else:
        raise ValueError(f"unknown dh_dist {dh_dist}")
    dims_flags = {1: "z", 2: "xy", 3: "xyz", "z": "z"}.get(dh_dim, "z")
    for i in range(n):
        for lbl in dims_flags:
            if lbl == "z":
                terms.append((hz[i], (S["z"],), (i,)))
            else:
                h2 = rng.uniform(-dh, dh)
                terms.append((h2, (S[lbl],), (i,)))
    return ham_from_terms(terms, dims, sparse=sparse, dtype=dtype)


def ham_j1j2(n, j1=1.0, j2=0.5, bz=0.0, cyclic=False, sparse=False,
             dtype=None):
    """J1-J2 frustrated Heisenberg chain."""
    from ..core import ham_from_terms

    dims = (2,) * n
    S = {s: np.asarray(_spin_op_np(s, 0.5)) for s in "xyz"}
    terms = []
    for dist, jj in ((1, j1), (2, j2)):
        for i in range(n - dist if not cyclic else n):
            k = (i + dist) % n
            for lbl in "xyz":
                terms.append((jj, (S[lbl], S[lbl]), (i, k)))
    for i in range(n):
        if bz:
            terms.append((-bz, (S["z"],), (i,)))
    return ham_from_terms(terms, dims, sparse=sparse, dtype=dtype)


def zspin_projector(n, sz=0, dtype=None):
    """Projector onto the given total-Sz sector(s) of n spin-1/2s:
    returns the (2^n, D) isometry spanning the sector."""
    if not isinstance(sz, (tuple, list)):
        sz = (sz,)
    target_ups = set()
    for s in sz:
        ups = s + n / 2
        if abs(ups - round(ups)) > 1e-12:
            raise ValueError(f"impossible sz {s} for n {n}")
        target_ups.add(int(round(ups)))
    cols = []
    for config in range(2**n):
        ups = bin(config).count("1")
        if ups in target_ups:
            cols.append(config)
    P = np.zeros((2**n, len(cols)))
    for k, c in enumerate(cols):
        P[c, k] = 1.0
    return _asdevice(P, dtype or "float64")


def create(n=2, dtype=None):
    """Bosonic creation operator truncated at n levels."""
    a = np.diag(np.sqrt(np.arange(1, n)), -1)
    return _asdevice(a, dtype)


def destroy(n=2, dtype=None):
    a = np.diag(np.sqrt(np.arange(1, n)), 1)
    return _asdevice(a, dtype)


def num(n=2, dtype=None):
    return _asdevice(np.diag(np.arange(n)), dtype)


def ham_hubbard_hardcore(n, t=0.5, V=1.0, mu=1.0, cyclic=False,
                         sparse=False, dtype=None):
    """Hard-core boson Hubbard chain."""
    from ..core import ham_from_terms

    dims = (2,) * n
    # host-side matrices (np.asarray on complex device arrays is an
    # eager transfer the TPU backend cannot do)
    b = np.diag(np.sqrt(np.arange(1, 2)), 1)
    bd = np.diag(np.sqrt(np.arange(1, 2)), -1)
    nop = bd @ b
    terms = []
    pairs = [(i, i + 1) for i in range(n - 1)]
    if cyclic:
        pairs.append((n - 1, 0))
    for (i, k) in pairs:
        terms.append((-t, (bd, b), (i, k)))
        terms.append((-t, (b, bd), (i, k)))
        terms.append((V, (nop, nop), (i, k)))
    for i in range(n):
        terms.append((-mu, (nop,), (i,)))
    return ham_from_terms(terms, dims, sparse=sparse, dtype=dtype)


def ham_heis_2D(n, m, j=1.0, bz=0.0, cyclic=False, sparse=False,
                dtype=None):
    """2D lattice Heisenberg Hamiltonian (reference
    gen/operators.py:1277)."""
    from ..core import ham_from_terms

    N = n * m
    dims = (2,) * N
    S = {s: np.asarray(_spin_op_np(s, 0.5)) for s in "xyz"}
    try:
        jx, jy, jz = j
    except TypeError:
        jx = jy = jz = j

    def site(i, k):
        return i * m + k

    pairs = []
    for i in range(n):
        for k in range(m):
            if k + 1 < m or cyclic:
                pairs.append((site(i, k), site(i, (k + 1) % m)))
            if i + 1 < n or cyclic:
                pairs.append((site(i, k), site((i + 1) % n, k)))
    terms = []
    for (a, b_) in pairs:
        for lbl, jj in zip("xyz", (jx, jy, jz)):
            if jj:
                terms.append((jj, (S[lbl], S[lbl]), (a, b_)))
    for i in range(N):
        if bz:
            terms.append((-bz, (S["z"],), (i,)))
    return ham_from_terms(terms, dims, sparse=sparse, dtype=dtype)


__all__ = [
    "pauli", "spin_operator", "identity", "eye", "hadamard", "phase_gate",
    "S_gate", "T_gate", "rotation", "Rx", "Ry", "Rz", "U_gate", "Xsqrt",
    "Ysqrt", "Zsqrt", "Wsqrt", "swap", "iswap", "fsim", "fsimg",
    "ncontrolled_gate", "controlled", "CNOT", "cX", "cY", "cZ", "ccX",
    "ccY", "ccZ", "toffoli", "fredkin", "cswap", "controlled_swap",
    "shift", "clock", "ham_heis", "ham_ising", "ham_XY",
    "ham_XXZ", "ham_mbl", "ham_j1j2", "ham_heis_2D",
    "ham_hubbard_hardcore", "zspin_projector", "create", "destroy", "num",
]
