"""Random array/state/operator generation with controllable seeding.

Re-design of reference ``quimb/gen/rand.py`` (threaded ``randn`` :143,
``seed_rand`` :125, ``set_rand_bitgen`` :117) on jax PRNG keys: a module
global key is split per call (so sequential semantics match numpy-style
statefulness), ``seed_rand`` resets it. On-device generation means no
host→device transfer for large random tensors, and threading is
irrelevant (XLA parallelizes).
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_default_dtype

_KEY_LOCK = threading.Lock()
_GLOBAL_KEY = [jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**63))]


def seed_rand(seed):
    """Seed all future random generation."""
    with _KEY_LOCK:
        _GLOBAL_KEY[0] = jax.random.PRNGKey(seed)


def set_rand_bitgen(bitgen):
    """Accepted for API parity; jax uses threefry — a no-op here."""


def _next_key(seed=None):
    if seed is not None:
        return jax.random.PRNGKey(seed)
    with _KEY_LOCK:
        _GLOBAL_KEY[0], sub = jax.random.split(_GLOBAL_KEY[0])
    return sub


def _real_dtype(dtype):
    return {
        "complex128": "float64", "complex64": "float32",
    }.get(str(np.dtype(dtype) if not isinstance(dtype, str) else dtype),
          str(dtype))


def randn(shape=(), dtype=None, scale=1.0, loc=0.0, seed=None, dist="normal",
          key=None):
    """Random array of ``shape`` — gaussian by default, complex dtypes get
    independent real/imag parts (matching reference semantics)."""
    if isinstance(shape, int):
        shape = (shape,)
    dtype = dtype or get_default_dtype()
    dtype_str = str(np.dtype(dtype)) if not isinstance(dtype, str) else dtype
    if key is None:
        key = _next_key(seed)
    iscomplex = "complex" in dtype_str
    rdt = _real_dtype(dtype_str)

    def gen(k):
        if dist == "normal":
            return jax.random.normal(k, shape, dtype=rdt)
        elif dist == "uniform":
            return jax.random.uniform(k, shape, dtype=rdt) - 0.5
        elif dist == "rademacher":
            return jax.random.rademacher(k, shape, dtype=rdt)
        elif dist == "exp":
            return jax.random.exponential(k, shape, dtype=rdt)
        else:
            raise ValueError(f"unknown distribution {dist}")

    if iscomplex:
        k1, k2 = jax.random.split(key)
        out = gen(k1) + 1j * gen(k2)
    else:
        out = gen(key)
    if scale != 1.0:
        out = out * scale
    if loc != 0.0:
        out = out + loc
    return out.astype(dtype_str)


def get_rand_fill_fn(dist="normal", loc=0.0, scale=1.0, seed=None,
                     dtype=None):
    """Get a stateful ``fill_fn(shape) -> array`` closure with the given
    distribution/parameters (reference ``get_rand_fill_fn``
    gen/rand.py:322). Successive calls draw fresh (split) PRNG keys so
    repeated fills differ even with a fixed ``seed``."""
    dtype = dtype or get_default_dtype()
    state = [jax.random.PRNGKey(seed) if seed is not None
             else _next_key()]

    def fill_fn(shape=()):
        state[0], sub = jax.random.split(state[0])
        return randn(tuple(shape), dtype=dtype, scale=scale, loc=loc,
                     dist=dist, key=sub)

    return fill_fn


def rand_rademacher(shape, dtype=None, seed=None):
    dtype = dtype or "float64"
    return randn(shape, dtype=dtype, seed=seed, dist="rademacher")


def rand_phase(shape, dtype=None, seed=None):
    """Random pure phases e^{i theta}."""
    dtype = dtype or get_default_dtype()
    if "complex" not in str(dtype):
        raise ValueError("rand_phase needs a complex dtype")
    key = _next_key(seed)
    theta = jax.random.uniform(
        key, shape if not isinstance(shape, int) else (shape,),
        dtype=_real_dtype(str(dtype)), maxval=2 * np.pi,
    )
    return jnp.exp(1j * theta).astype(dtype)


def rand_matrix(d, scaled=True, dtype=None, seed=None):
    """Random complex gaussian matrix (GinUE), scaled to unit spectral
    density (reference gen/rand.py rand_matrix)."""
    dtype = dtype or get_default_dtype()
    m = randn((d, d), dtype=dtype, seed=seed)
    if scaled:
        m = m / (2 * np.sqrt(d))
    return m


def rand_herm(d, sparse=False, density=0.01, dtype=None, seed=None):
    """Random hermitian matrix (GUE-like); ``sparse=True`` returns a
    host scipy CSR with the given density."""
    if sparse:
        import scipy.sparse as sp

        rng = np.random.default_rng(seed)
        nnz = max(1, int(density * d * d / 2))
        rows = rng.integers(0, d, nnz)
        cols = rng.integers(0, d, nnz)
        vals = rng.standard_normal(nnz) + 1j * rng.standard_normal(nnz)
        m = sp.coo_matrix((vals, (rows, cols)), shape=(d, d)).tocsr()
        m = (m + m.getH()) / 2
        return m.astype(np.dtype(str(dtype or get_default_dtype())))
    m = rand_matrix(d, dtype=dtype, seed=seed)
    return (m + m.conj().T) / 2


def rand_pos(d, dtype=None, seed=None):
    """Random positive-semidefinite matrix."""
    m = rand_matrix(d, scaled=False, dtype=dtype, seed=seed)
    return (m @ m.conj().T) / (4 * d)


def rand_rho(d, dtype=None, seed=None):
    """Random density matrix (trace 1)."""
    rho = rand_pos(d, dtype=dtype, seed=seed)
    return rho / jnp.trace(rho)


def rand_uni(d, dtype=None, seed=None):
    """Haar-random unitary matrix (QR of a gaussian with phase fix)."""
    from ..ops.decomp import isometrize_qr

    m = rand_matrix(d, scaled=False, dtype=dtype, seed=seed)
    return isometrize_qr(m)


def rand_ket(d, dtype=None, seed=None):
    """Random normalized ket (column vector)."""
    psi = randn((d, 1), dtype=dtype, seed=seed)
    return psi / jnp.linalg.norm(psi)


def rand_haar_state(d, dtype=None, seed=None):
    return rand_ket(d, dtype=dtype, seed=seed)


def gen_rand_haar_states(d, reps, dtype=None):
    for _ in range(reps):
        yield rand_haar_state(d, dtype=dtype)


def rand_mix(d, tr_d_min=None, tr_d_max=None, mode="rand", dtype=None,
             seed=None):
    """Random mixed state by tracing out an environment."""
    if tr_d_min is None:
        tr_d_min = d
    if tr_d_max is None:
        tr_d_max = d
    rng = np.random.default_rng(seed)
    tr_d = int(rng.integers(tr_d_min, tr_d_max + 1))
    psi = rand_ket(d * tr_d, dtype=dtype, seed=seed)
    psi = jnp.reshape(psi, (d, tr_d))
    return psi @ psi.conj().T


def rand_product_state(n, qtype=None, dtype=None, seed=None):
    """Random product state of ``n`` qubits (kron of single-qubit kets)."""
    dtype = dtype or get_default_dtype()
    rng = np.random.default_rng(seed)
    vec = np.array([1.0])
    for _ in range(n):
        phi = rng.uniform(0, 2 * np.pi)
        theta = np.arccos(rng.uniform(-1, 1))
        q = np.array(
            [np.cos(theta / 2), np.exp(1j * phi) * np.sin(theta / 2)]
        )
        vec = np.kron(vec, q)
    return jnp.asarray(vec.reshape(-1, 1), dtype=dtype)


def rand_matrix_product_state(n, bond_dim, phys_dim=2, dtype=None,
                              seed=None, normalize=True):
    """Random MPS as a dense ket."""
    from ..tensor.tn1d.builders import MPS_rand_state

    psi = MPS_rand_state(n, bond_dim, phys_dim=phys_dim, dtype=dtype,
                         seed=seed, normalize=normalize)
    return jnp.reshape(psi.to_dense(), (-1, 1))


rand_mps = rand_matrix_product_state


def rand_seperable(dims, num_mix=10, dtype=None, seed=None):
    """Random separable mixed state on subsystems of sizes ``dims``."""
    rng = np.random.default_rng(seed)
    total = None
    for _ in range(num_mix):
        p = rng.random()
        term = None
        for d in dims:
            rho = np.asarray(rand_rho(d, dtype=dtype, seed=int(rng.integers(2**31))))
            term = rho if term is None else np.kron(term, rho)
        total = p * term if total is None else total + p * term
    total = total / np.trace(total)
    return jnp.asarray(total)


def rand_iso(m, n, dtype=None, seed=None):
    """Random isometry of shape (m, n)."""
    from ..ops.decomp import isometrize_qr

    x = randn((m, n), dtype=dtype or get_default_dtype(), seed=seed)
    return isometrize_qr(x)


def rand_mera(n, *args, **kwargs):
    from ..tensor.tn1d.mera import MERA

    return MERA.rand(n, *args, **kwargs)


def rand(*args, **kwargs):
    """Uniform random array (reference gen/rand.py:250)."""
    kwargs.setdefault("dist", "uniform")
    return randn(*args, **kwargs)


__all__ = [
    "seed_rand", "set_rand_bitgen", "randn", "rand", "get_rand_fill_fn",
    "rand_rademacher",
    "rand_phase", "rand_matrix", "rand_herm", "rand_pos", "rand_rho",
    "rand_uni", "rand_ket", "rand_haar_state", "gen_rand_haar_states",
    "rand_mix", "rand_product_state", "rand_matrix_product_state",
    "rand_mps", "rand_seperable", "rand_iso", "rand_mera",
]
