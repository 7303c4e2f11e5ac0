"""SparseOperatorBuilder: second-quantized terms → sparse matrix /
device matvec / MPO / LocalHam.

Re-design of reference ``quimb/operator/builder.py``
(``SparseOperatorBuilder`` :520, Jordan-Wigner :71, Pauli decompose
:269, coupling maps → CSR :~1173, MPO via FSM :1377,1632) and the
``configcore.py`` numba matvec kernels (:288-:737).

TPU-native choices:

- every term is canonicalized to a product of single-site 2x2
  operators; acting on a basis configuration each term maps it to at
  most ONE other configuration with an amplitude — the *coupling map*.
- coupling maps are built **vectorized over all sector configurations**
  with numpy bit arithmetic (host, setup time; replaces the numba
  loops), then either assembled into scipy CSR / device
  ``SparseHam``, or kept as (flip_mask, amp-tables) for the
  **on-the-fly device matvec** (no matrix materialization — gather +
  segment-sum over configurations, the configcore replacement).
"""

import collections
import functools
import itertools
import math

import numpy as np

from .hilbertspace import HilbertSpace

# single-site operators as 2x2 matrices, basis (|0>=down, |1>=up)
_OP2 = {
    "i": np.eye(2, dtype=complex),
    "x": np.array([[0, 0.5], [0.5, 0]], dtype=complex),
    "y": np.array([[0, -0.5j], [0.5j, 0]]),
    "z": np.array([[-0.5, 0], [0, 0.5]], dtype=complex),
    "sx": np.array([[0, 0.5], [0.5, 0]], dtype=complex),
    "sy": np.array([[0, -0.5j], [0.5j, 0]]),
    "sz": np.array([[-0.5, 0], [0, 0.5]], dtype=complex),
    "X": np.array([[0, 1], [1, 0]], dtype=complex),
    "Y": np.array([[0, -1j], [1j, 0]]),
    "Z": np.array([[-1, 0], [0, 1]], dtype=complex),
    "+": np.array([[0, 0], [1, 0]], dtype=complex),   # raise |0>->|1>
    "-": np.array([[0, 1], [0, 0]], dtype=complex),
    "n": np.array([[0, 0], [0, 1]], dtype=complex),
    "sn": np.array([[0, 0], [0, 1]], dtype=complex),
    "h": np.array([[1, 0], [0, 0]], dtype=complex),   # hole
}
# NOTE: convention matches the reference: |1> is the up/occupied state
# and pauli 'Z' has +1 on |1>. '+' raises |0> to |1>.

_FERMI_OPS = {"c", "cdag"}


class SparseOperatorBuilder:
    """Build an operator as a sum of products of local operators
    (reference ``SparseOperatorBuilder`` builder.py:520).

    Terms are added as ``builder += coeff, (op, site), (op, site)...``
    where op is a string key ('+', '-', 'n', 'sz', 'x', ..., or
    fermionic 'c'/'cdag' which are Jordan-Wigner transformed)."""

    def __init__(self, terms=(), hilbert_space=None):
        self._terms = {}
        self.hilbert_space = hilbert_space
        for term in terms:
            self.add_term(*term)

    @property
    def terms(self):
        return self._terms

    @property
    def nsites(self):
        if self.hilbert_space is not None:
            return self.hilbert_space.nsites
        return 1 + max(
            (site for ops in self._terms for (_, site) in ops),
            default=-1,
        )

    @property
    def nterms(self):
        return len(self._terms)

    @property
    def locality(self):
        return max(
            (len(ops) for ops in self._terms), default=0
        )

    def sites_used(self):
        return sorted(set(
            site for ops in self._terms for (_, site) in ops
        ))

    def add_term(self, *args):
        """``add_term(coeff, (op, site), ...)`` or
        ``add_term((op, site), ...)`` with coeff 1."""
        if isinstance(args[0], (int, float, complex)):
            coeff, ops = args[0], args[1:]
        else:
            coeff, ops = 1.0, args
        ops = tuple((str(op), int(site)) for (op, site) in ops)
        if any(op in _FERMI_OPS for op, _ in ops):
            # Jordan-Wigner: c_i = (prod_{j<i} Z_j) s-_i etc.
            # (reference jordan_wigner_transform builder.py:71)
            for jw_coeff, jw_ops in _jordan_wigner(ops):
                self._accumulate(coeff * jw_coeff, jw_ops)
        else:
            self._accumulate(coeff, ops)
        return self

    def _accumulate(self, coeff, ops):
        # merge multiple ops on the same site by matrix product,
        # order sites ascending
        by_site = {}
        order = []
        for (op, site) in ops:
            if site in by_site:
                by_site[site] = by_site[site] @ _op_matrix(op)
            else:
                by_site[site] = _op_matrix(op)
                order.append(site)
        key = tuple(
            (_op_key(by_site[s]), s) for s in sorted(by_site)
        )
        self._terms[key] = self._terms.get(key, 0.0) + coeff
        if self._terms[key] == 0:
            del self._terms[key]

    def __iadd__(self, term):
        self.add_term(*term)
        return self

    def __isub__(self, term):
        if isinstance(term[0], (int, float, complex)):
            self.add_term(-term[0], *term[1:])
        else:
            self.add_term(-1.0, *term)
        return self

    # -- coupling maps ------------------------------------------------------

    def _get_hs(self):
        if self.hilbert_space is None:
            self.hilbert_space = HilbertSpace(self.nsites)
        return self.hilbert_space

    def build_coupling_map(self):
        """For every term: (sites, flip_mask, amp 2x2 tables).

        Acting on a bit configuration, each term maps it to exactly one
        configuration (or annihilates it):
        ``new_bits = bits XOR flip``; the amplitude is the product over
        the term's sites of ``M[new_bit, old_bit]``."""
        out = []
        for ops, coeff in self._terms.items():
            sites = []
            mats = []
            flip = 0
            for (opk, site) in ops:
                M = _MAT_FROM_KEY[opk]
                sites.append(site)
                mats.append(M)
                # a 2x2 op participates in a single-output map iff each
                # column has at most one nonzero; flip if offdiagonal
                offdiag = (abs(M[0, 1]) > 0 or abs(M[1, 0]) > 0)
                diag = (abs(M[0, 0]) > 0 or abs(M[1, 1]) > 0)
                if offdiag and diag:
                    raise ValueError(
                        f"operator {opk} mixes diagonal and "
                        "off-diagonal action; decompose it first"
                    )
                if offdiag:
                    flip |= 1 << site
            out.append((coeff, tuple(sites), flip, tuple(mats)))
        return out

    def build_coo_data(self):
        """Vectorized COO construction over all sector configs
        (replaces the numba ``configcore`` builders)."""
        hs = self._get_hs()
        configs = hs.get_configs()
        bits = hs.config_to_bits(configs)  # (D, nsites)
        rows_all, cols_all, vals_all = [], [], []
        for coeff, sites, flip, mats in self.build_coupling_map():
            new_configs = configs ^ flip
            amp = np.full(configs.shape, complex(coeff))
            for site, M in zip(sites, mats):
                old_b = bits[:, site]
                new_b = old_b ^ ((flip >> site) & 1)
                amp = amp * np.asarray(M)[new_b, old_b]
            nz = amp != 0
            new_idx = hs.rank(new_configs[nz])
            valid = new_idx >= 0
            rows_all.append(new_idx[valid])
            cols_all.append(np.arange(configs.size)[nz][valid])
            vals_all.append(amp[nz][valid])
        if rows_all:
            rows = np.concatenate(rows_all)
            cols = np.concatenate(cols_all)
            vals = np.concatenate(vals_all)
        else:
            rows = cols = np.zeros(0, dtype=np.int64)
            vals = np.zeros(0, dtype=complex)
        return rows, cols, vals, hs.size

    def build_sparse_matrix(self, stype="csr"):
        """Host scipy sparse matrix (reference
        ``build_sparse_matrix``)."""
        import scipy.sparse as sp

        rows, cols, vals, D = self.build_coo_data()
        if np.allclose(vals.imag, 0):
            vals = vals.real
        return sp.coo_matrix(
            (vals, (rows, cols)), shape=(D, D)
        ).asformat(stype)

    def build_dense(self):
        import jax.numpy as jnp

        return jnp.asarray(self.build_sparse_matrix().toarray())

    def build_sparse_ham(self):
        """Device gather/segment-sum operator (see
        quimb_tpu.core.SparseHam)."""
        from ..core import SparseHam

        return SparseHam(self.build_sparse_matrix())

    def matvec(self, x):
        """Multiply a sector-vector by the operator on device."""
        return self.build_sparse_ham() @ x

    def aslinearoperator(self):
        import scipy.sparse.linalg as spla

        H = self.build_sparse_matrix()
        return spla.aslinearoperator(H)

    # -- MPO ------------------------------------------------------------------

    def build_mpo(self, L=None, dtype=None, **mpo_opts):
        """Build an MPO (reference greedy-FSM ``build_mpo``
        builder.py:1377 — here: sum of product-MPOs with interleaved
        compression, which reaches the same optimal bond dimensions for
        the standard local-interaction forms)."""
        from ..tensor.tn1d.builders import MPO_product_operator
        from ..config import get_default_dtype

        L = L or self.nsites
        dtype = dtype or get_default_dtype()
        mpo = None
        batch = []
        for ops, coeff in self._terms.items():
            site_ops = [np.eye(2, dtype=complex)] * L
            for (opk, site) in ops:
                site_ops[site] = _MAT_FROM_KEY[opk]
            site_ops[0] = site_ops[0] * coeff
            term_mpo = MPO_product_operator(
                [a.astype(np.dtype(dtype)) if not np.allclose(
                    a.imag, 0) else a.real for a in site_ops],
                **mpo_opts,
            )
            if mpo is None:
                mpo = term_mpo
            else:
                mpo = add_mpo(mpo, term_mpo)
            # periodically compress to keep bond dims down
            if mpo.max_bond() and mpo.max_bond() > 4 * self.locality + 8:
                mpo.compress(cutoff=1e-12)
        if mpo is not None:
            mpo.compress(cutoff=1e-12)
        return mpo

    def build_local_ham(self, L=None, **kwargs):
        """Two-site LocalHam1D (nearest-neighbour terms only)."""
        from ..tensor.tn1d.tebd import LocalHam1D

        L = L or self.nsites
        H2 = {}
        H1 = {}
        for ops, coeff in self._terms.items():
            sites = sorted(set(s for _, s in ops))
            if len(sites) == 1:
                (s,) = sites
                M = coeff * functools.reduce(
                    lambda a, b: a @ b,
                    [_MAT_FROM_KEY[o] for o, _ in ops],
                )
                H1[s] = H1.get(s, 0) + M
            elif len(sites) == 2 and sites[1] - sites[0] == 1:
                a, b = sites
                Ma = np.eye(2, dtype=complex)
                Mb = np.eye(2, dtype=complex)
                for (opk, s) in ops:
                    if s == a:
                        Ma = Ma @ _MAT_FROM_KEY[opk]
                    else:
                        Mb = Mb @ _MAT_FROM_KEY[opk]
                key = (a, b)
                H2[key] = H2.get(key, 0) + coeff * np.kron(Ma, Mb)
            else:
                raise ValueError(
                    "local ham needs nearest-neighbour terms only"
                )
        return LocalHam1D(L, H2, H1 if H1 else None, **kwargs)

    def __repr__(self):
        return (
            f"<SparseOperatorBuilder(nsites={self.nsites}, "
            f"nterms={self.nterms}, locality={self.locality})>"
        )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_KEY_FROM_MAT = {}
_MAT_FROM_KEY = {}


def get_mat(op, dtype=None):
    """The dense 2x2 matrix of a named single-site operator (reference
    ``get_mat`` operator/builder.py:50)."""
    M = _op_matrix(op)
    if dtype is not None:
        M = M.astype(dtype)
    elif not np.iscomplexobj(M) or np.allclose(M.imag, 0):
        M = M.real.astype(np.float64) if np.allclose(M.imag, 0) \
            else M
    return M


def _op_matrix(op):
    if isinstance(op, str):
        if op not in _OP2:
            raise ValueError(f"unknown operator {op!r}")
        return _OP2[op]
    return np.asarray(op, dtype=complex)


def _op_key(M):
    """Canonical hashable key for a 2x2 matrix."""
    key = tuple(np.round(np.asarray(M, dtype=complex).ravel(), 14))
    _MAT_FROM_KEY.setdefault(key, np.asarray(M, dtype=complex))
    return key


# make string keys also resolvable
for _name, _M in _OP2.items():
    _MAT_FROM_KEY[_op_key(_M)] = _M


def _jordan_wigner(ops):
    """Transform a product containing fermionic 'c'/'cdag' into spin
    terms: c_i = (prod_{j<i} Z_j) sigma^-_i (reference builder.py:71).
    Yields (coeff, spin_ops) pairs (a single pair — JW of a product is
    a product)."""
    spin_ops = []
    for (op, site) in ops:
        if op in _FERMI_OPS:
            for j in range(site):
                spin_ops.append(("Z", j))
            spin_ops.append(("+" if op == "cdag" else "-", site))
        else:
            spin_ops.append((op, site))
    # collapse repeated Z's on the same site (Z^2 = I)
    counts = collections.Counter()
    order = []
    others = []
    for (op, site) in spin_ops:
        if op == "Z":
            counts[site] += 1
        else:
            others.append((op, site))
    final = []
    for (op, site) in spin_ops:
        if op == "Z":
            if counts[site] % 2 == 1 and site not in order:
                final.append(("Z", site))
                order.append(site)
        else:
            final.append((op, site))
    yield 1.0, tuple(final)


def add_mpo(A, B):
    """Direct-sum addition of two MPOs (bond dims add)."""
    import jax.numpy as jnp

    from ..tensor.tn1d.core import MatrixProductOperator

    L = A.L
    arrays = []
    for i in range(L):
        ta = A[A.site_tag(i)]
        tb = B[B.site_tag(i)]
        # uniform layout (wl, wr, u, d)
        aa = _mpo_site_uniform(A, i)
        ab = _mpo_site_uniform(B, i)
        if i == 0:
            new = jnp.concatenate([aa, ab], axis=1)
        elif i == L - 1:
            new = jnp.concatenate([aa, ab], axis=0)
        else:
            wl = aa.shape[0] + ab.shape[0]
            wr = aa.shape[1] + ab.shape[1]
            d = aa.shape[2]
            new = jnp.zeros((wl, wr, d, d), dtype=jnp.result_type(
                aa.dtype, ab.dtype))
            new = new.at[: aa.shape[0], : aa.shape[1]].set(aa)
            new = new.at[aa.shape[0]:, aa.shape[1]:].set(ab)
        arrays.append(new)
    # strip padded boundary dims
    site_arrays = []
    for i, a in enumerate(arrays):
        if i == 0:
            site_arrays.append(a[0])
        elif i == L - 1:
            site_arrays.append(a[:, 0])
        else:
            site_arrays.append(a)
    # boundary layouts: first (wr, u, d), last (wl, u, d)
    return MatrixProductOperator(
        site_arrays, shape="lrud",
        upper_ind_id=A.upper_ind_id, lower_ind_id=A.lower_ind_id,
        site_tag_id=A.site_tag_id,
    )


def _mpo_site_uniform(mpo, i):
    """MPO site array as (wl, wr, u, d) with padded boundaries."""
    import jax.numpy as jnp

    t = mpo[mpo.site_tag(i)]
    u, d = mpo.upper_ind(i), mpo.lower_ind(i)
    L = mpo.L
    lshared = [
        ix for ix in t.inds
        if i > 0 and ix in mpo[mpo.site_tag(i - 1)].inds
    ]
    rshared = [
        ix for ix in t.inds
        if i < L - 1 and ix in mpo[mpo.site_tag(i + 1)].inds
    ]
    arr = t.transpose(*(lshared + rshared + [u, d])).data
    if not lshared:
        arr = arr[None, ...]
    if not rshared:
        arr = arr[:, None, ...]
    return arr
