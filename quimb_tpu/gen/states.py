"""State generation (reference ``quimb/gen/states.py``): basis vectors,
spin states, bell/GHZ/W states, graph states."""

import functools
import math

import jax.numpy as jnp
import numpy as np

from ..config import get_default_dtype
from ..core import kron, qu


def basis_vec(i, dim, ownership=None, dtype=None, qtype="ket", sparse=False):
    """The ``i``-th computational basis ket of dimension ``dim``."""
    x = np.zeros(dim)
    x[i] = 1.0
    return qu(x, qtype=qtype, dtype=dtype or get_default_dtype())


def up(qtype="ket", dtype=None, **kwargs):
    return qu([1.0, 0.0], qtype=qtype, dtype=dtype)


zplus = up


def down(qtype="ket", dtype=None, **kwargs):
    return qu([0.0, 1.0], qtype=qtype, dtype=dtype)


zminus = down


def plus(qtype="ket", dtype=None, **kwargs):
    s = 1 / math.sqrt(2)
    return qu([s, s], qtype=qtype, dtype=dtype)


xplus = plus


def minus(qtype="ket", dtype=None, **kwargs):
    s = 1 / math.sqrt(2)
    return qu([s, -s], qtype=qtype, dtype=dtype)


xminus = minus


def yplus(qtype="ket", dtype=None, **kwargs):
    s = 1 / math.sqrt(2)
    return qu([s, 1j * s], qtype=qtype, dtype=dtype)


def yminus(qtype="ket", dtype=None, **kwargs):
    s = 1 / math.sqrt(2)
    return qu([s, -1j * s], qtype=qtype, dtype=dtype)


def bloch_state(ax, ay, az, purified=False, dtype=None, sparse=False):
    """State on the bloch sphere with given coordinates."""
    if purified:
        norm = math.sqrt(ax**2 + ay**2 + az**2)
        ax, ay, az = ax / norm, ay / norm, az / norm
    rho = 0.5 * np.array(
        [[1 + az, ax - 1j * ay], [ax + 1j * ay, 1 - az]]
    )
    return qu(rho, qtype="dop", dtype=dtype)


def bell_state(s, qtype="ket", dtype=None, **kwargs):
    """One of the four bell states: 'phi+', 'phi-', 'psi+', 'psi-'
    (or 0..3)."""
    keymap = {
        "psi-": "psi-", 0: "psi-", "psi+": "psi+", 1: "psi+",
        "phi-": "phi-", 2: "phi-", "phi+": "phi+", 3: "phi+",
    }
    s = keymap[s]
    isq2 = 1 / math.sqrt(2)
    vec = {
        "phi+": [isq2, 0, 0, isq2],
        "phi-": [isq2, 0, 0, -isq2],
        "psi+": [0, isq2, isq2, 0],
        "psi-": [0, isq2, -isq2, 0],
    }[s]
    return qu(vec, qtype=qtype, dtype=dtype)


def singlet(qtype="ket", dtype=None):
    return bell_state("psi-", qtype=qtype, dtype=dtype)


def thermal_state(ham, beta, precomp_func=False):
    """Thermal density matrix exp(-beta H)/Z."""
    import jax.numpy as jnp

    w, V = jnp.linalg.eigh(jnp.asarray(ham))

    def gen(b):
        p = jnp.exp(-b * (w - jnp.min(w)))
        p = p / jnp.sum(p)
        return (V * p) @ jnp.conj(V.T)

    if precomp_func:
        return gen
    return gen(beta)


def computational_state(binary, qtype="ket", dtype=None, sparse=False):
    """Ket from a binary string, e.g. '0101'."""
    if isinstance(binary, (tuple, list)):
        binary = "".join(map(str, binary))
    i = int(binary, 2)
    return basis_vec(i, 2 ** len(binary), qtype=qtype, dtype=dtype)


def neel_state(n, down_first=False, dtype=None, **kwargs):
    """Alternating up/down product state."""
    s = "01" if not down_first else "10"
    binary = (s * n)[:n]
    return computational_state(binary, dtype=dtype, **kwargs)


def singlet_pairs(n, dtype=None, **kwargs):
    """Product of singlets on neighboring pairs."""
    return kron(*(singlet(dtype=dtype) for _ in range(n // 2)))


def werner_state(p, dtype=None):
    """Werner state: p |psi-><psi-| + (1-p) I/4."""
    s = singlet(dtype=dtype or "complex128")
    rho = p * (s @ jnp.conj(s.T)) + (1 - p) * jnp.eye(
        4, dtype=s.dtype
    ) / 4
    return rho


def ghz_state(n, qtype="ket", dtype=None, **kwargs):
    isq2 = 1 / math.sqrt(2)
    x = np.zeros(2**n)
    x[0] = isq2
    x[-1] = isq2
    return qu(x, qtype=qtype, dtype=dtype)


def w_state(n, qtype="ket", dtype=None, **kwargs):
    x = np.zeros(2**n)
    for i in range(n):
        x[2**i] = 1 / math.sqrt(n)
    return qu(x, qtype=qtype, dtype=dtype)


def levi_civita(perm):
    """Parity sign of a permutation."""
    n = len(perm)
    sign = 1
    seen = [False] * n
    for i in range(n):
        if seen[i]:
            continue
        j = i
        clen = 0
        while not seen[j]:
            seen[j] = True
            j = perm[j]
            clen += 1
        if clen % 2 == 0:
            sign = -sign
    return sign


def perm_state(ps):
    """Totally antisymmetrized state of states ``ps``."""
    import itertools

    n = len(ps)
    out = None
    for perm in itertools.permutations(range(n)):
        sign = levi_civita(perm)
        term = kron(*(ps[i] for i in perm)) * sign
        out = term if out is None else out + term
    return out / jnp.linalg.norm(out)


def graph_state_1d(n, cyclic=True, sparse=False, dtype=None):
    """1D graph state: plusses entangled by CZ gates."""
    from ..gen.operators import cZ
    from ..core import ikron, pkron

    psi = kron(*(plus(dtype=dtype or "complex128") for _ in range(n)))
    CZ = cZ(dtype=dtype or "complex128")
    for i in range(n - 1):
        psi = ikron(CZ, (2,) * n, (i, i + 1)) @ psi
    if cyclic and n > 2:
        psi = pkron(CZ, (2,) * n, (n - 1, 0)) @ psi
    return psi


__all__ = [
    "basis_vec", "up", "zplus", "down", "zminus", "plus", "xplus",
    "minus", "xminus", "yplus", "yminus", "bloch_state", "bell_state",
    "singlet", "thermal_state", "computational_state", "neel_state",
    "singlet_pairs", "werner_state", "ghz_state", "w_state",
    "levi_civita", "perm_state", "graph_state_1d",
]
