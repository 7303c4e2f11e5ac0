"""Builders for MPS/MPO states and 1D Hamiltonians.

Re-design of the 1D slice of reference ``quimb/tensor/tensor_builder.py``
(``MPS_rand_state``, ``MPO_ham_heis`` :5498, ``SpinHam1D`` :4967 with the
standard first-order MPO finite-state construction, ``ham_1d_*``
LocalHam1D builders :5538+).
"""

import functools
import math
from numbers import Integral

import jax.numpy as jnp
import numpy as np

from ...config import get_default_dtype, get_default_real_dtype
from ...gen.operators import spin_operator
from ...gen.rand import randn
from ...ops.backend import to_device
from ..core import Tensor, bonds, rand_uuid
from .core import MatrixProductOperator, MatrixProductState


# ---------------------------------------------------------------------------
# MPS builders
# ---------------------------------------------------------------------------


def MPS_rand_state(
    L, bond_dim, phys_dim=2, normalize=True, cyclic=False, dtype=None,
    seed=None, trans_invar=False, **mps_opts
):
    """Random MPS with bond dimension ``bond_dim``."""
    dtype = dtype or get_default_real_dtype()

    arrays = []
    for i in range(L):
        if cyclic:
            chil = chir = bond_dim
        else:
            chil = min(bond_dim, phys_dim**i, phys_dim ** (L - i))
            chir = min(
                bond_dim, phys_dim ** (i + 1), phys_dim ** (L - i - 1)
            )
        shape = []
        if i > 0 or cyclic:
            shape.append(chil)
        if i < L - 1 or cyclic:
            shape.append(chir)
        shape.append(phys_dim)
        arrays.append(
            randn(tuple(shape), dtype=dtype, seed=None if seed is None
                  else seed + i)
        )
    psi = MatrixProductState(arrays, shape="lrp", cyclic=cyclic,
                             **mps_opts)
    if normalize:
        psi.normalize()
    return psi


def MPS_product_state(arrays, cyclic=False, **mps_opts):
    """Product state MPS from single-site vectors."""
    mps_arrays = []
    L = len(arrays)
    for i, a in enumerate(arrays):
        a = jnp.reshape(jnp.asarray(a), (-1,))
        shape = []
        if i > 0 or cyclic:
            shape.append(1)
        if i < L - 1 or cyclic:
            shape.append(1)
        shape.append(a.size)
        mps_arrays.append(jnp.reshape(a, shape))
    return MatrixProductState(mps_arrays, shape="lrp", cyclic=cyclic,
                              **mps_opts)


def MPS_computational_state(binary, dtype=None, **mps_opts):
    """MPS for a computational basis state like '01101'."""
    dtype = dtype or get_default_real_dtype()
    if isinstance(binary, (tuple, list)):
        binary = "".join(map(str, binary))
    vecs = []
    for b in binary:
        v = np.zeros(2)
        v[int(b)] = 1.0
        vecs.append(to_device(v, dtype=dtype))
    return MPS_product_state(vecs, **mps_opts)


def MPS_zero_state(L, bond_dim=1, phys_dim=2, dtype=None, **mps_opts):
    """All-zeros-amplitude MPS (for building into)."""
    dtype = dtype or get_default_real_dtype()
    arrays = []
    for i in range(L):
        shape = []
        if i > 0:
            shape.append(bond_dim)
        if i < L - 1:
            shape.append(bond_dim)
        shape.append(phys_dim)
        arrays.append(jnp.zeros(shape, dtype=dtype))
    return MatrixProductState(arrays, shape="lrp", **mps_opts)


def MPS_neel_state(L, down_first=False, dtype=None, **mps_opts):
    binary = ("01" * L)[:L] if not down_first else ("10" * L)[:L]
    return MPS_computational_state(binary, dtype=dtype, **mps_opts)


def MPS_rand_computational_state(L, dtype=None, seed=None, **mps_opts):
    rng = np.random.default_rng(seed)
    binary = "".join(rng.choice(["0", "1"]) for _ in range(L))
    return MPS_computational_state(binary, dtype=dtype, **mps_opts)


def MPS_ghz_state(L, dtype=None, **mps_opts):
    """GHZ state as a bond-dimension 2 MPS."""
    dtype = dtype or get_default_real_dtype()
    isq2 = 1 / math.sqrt(2)
    arrays = []
    for i in range(L):
        if i == 0:
            a = np.zeros((2, 2))
            a[0, 0] = isq2 ** (1 / 1)
            a[1, 1] = isq2
            a = np.zeros((2, 2))
            a[0, 0], a[1, 1] = 2**-0.5, 2**-0.5
            arrays.append(a)  # (r, p)
        elif i == L - 1:
            a = np.zeros((2, 2))
            a[0, 0], a[1, 1] = 1.0, 1.0
            arrays.append(a)  # (l, p)
        else:
            a = np.zeros((2, 2, 2))
            a[0, 0, 0], a[1, 1, 1] = 1.0, 1.0
            arrays.append(a)  # (l, r, p)
    # convert to lrp: first site is (r, p) ok; middle (l, r, p) ok
    return MatrixProductState(
        [to_device(a, dtype=dtype) for a in arrays], shape="lrp",
        **mps_opts,
    )


def MPS_w_state(L, dtype=None, **mps_opts):
    """W state as a bond-dimension 2 MPS."""
    dtype = dtype or get_default_real_dtype()
    sq = 1 / math.sqrt(L)
    arrays = []
    for i in range(L):
        if i == 0:
            a = np.zeros((2, 2))
            # (r, p): r=0 no excitation yet, r=1 excitation placed
            a[0, 0] = 1.0
            a[1, 1] = sq
            arrays.append(a)
        elif i == L - 1:
            a = np.zeros((2, 2))
            a[0, 1] = sq  # place excitation here
            a[1, 0] = 1.0  # excitation already placed
            arrays.append(a)
        else:
            a = np.zeros((2, 2, 2))
            a[0, 0, 0] = 1.0
            a[0, 1, 1] = sq
            a[1, 1, 0] = 1.0
            arrays.append(a)
    return MatrixProductState(
        [to_device(a, dtype=dtype) for a in arrays], shape="lrp",
        **mps_opts,
    )


def MPS_sampler(L, dtype=None, seed=None, **mps_opts):
    """A random computational state sampler MPS."""
    return MPS_rand_computational_state(L, dtype=dtype, seed=seed,
                                        **mps_opts)


# ---------------------------------------------------------------------------
# MPO builders
# ---------------------------------------------------------------------------


def MPO_identity(L, phys_dim=2, dtype=None, sites=None, cyclic=False,
                 **mpo_opts):
    """Identity MPO."""
    dtype = dtype or get_default_real_dtype()
    II = jnp.eye(phys_dim, dtype=dtype)
    arrays = []
    for i in range(L):
        if not cyclic and (i == 0 or i == L - 1):
            arrays.append(jnp.reshape(II, (1, phys_dim, phys_dim)))
        else:
            arrays.append(jnp.reshape(II, (1, 1, phys_dim, phys_dim)))
    return MatrixProductOperator(arrays, shape="lrud", cyclic=cyclic,
                                 **mpo_opts)


def MPO_identity_like(mpo, **mpo_opts):
    return MPO_identity(
        mpo.L, phys_dim=mpo.phys_dim(), dtype=str(mpo.dtype),
        upper_ind_id=mpo.upper_ind_id, lower_ind_id=mpo.lower_ind_id,
        site_tag_id=mpo.site_tag_id, **mpo_opts,
    )


def MPO_zeros(L, phys_dim=2, dtype=None, **mpo_opts):
    dtype = dtype or get_default_real_dtype()
    Z = jnp.zeros((phys_dim, phys_dim), dtype=dtype)
    arrays = []
    for i in range(L):
        if i == 0 or i == L - 1:
            arrays.append(jnp.reshape(Z, (1, phys_dim, phys_dim)))
        else:
            arrays.append(jnp.reshape(Z, (1, 1, phys_dim, phys_dim)))
    return MatrixProductOperator(arrays, shape="lrud", **mpo_opts)


def MPO_zeros_like(mpo, **mpo_opts):
    return MPO_zeros(
        mpo.L, phys_dim=mpo.phys_dim(), dtype=str(mpo.dtype),
        upper_ind_id=mpo.upper_ind_id, lower_ind_id=mpo.lower_ind_id,
        site_tag_id=mpo.site_tag_id, **mpo_opts,
    )


def MPO_product_operator(arrays, cyclic=False, **mpo_opts):
    """Product (bond dimension 1) MPO from single-site operators."""
    mpo_arrays = []
    L = len(arrays)
    for i, a in enumerate(arrays):
        a = jnp.asarray(a)
        d = a.shape[0]
        if not cyclic and (i == 0 or i == L - 1):
            mpo_arrays.append(jnp.reshape(a, (1, d, d)))
        else:
            mpo_arrays.append(jnp.reshape(a, (1, 1, d, d)))
    return MatrixProductOperator(mpo_arrays, shape="lrud", cyclic=cyclic,
                                 **mpo_opts)


def MPO_rand(L, bond_dim, phys_dim=2, normalize=True, herm=False,
             dtype=None, seed=None, **mpo_opts):
    """Random MPO."""
    dtype = dtype or get_default_real_dtype()
    arrays = []
    for i in range(L):
        shape = []
        if i > 0:
            shape.append(bond_dim)
        if i < L - 1:
            shape.append(bond_dim)
        shape.extend((phys_dim, phys_dim))
        a = randn(tuple(shape), dtype=dtype,
                  seed=None if seed is None else seed + i)
        if herm:
            a = a + jnp.conj(jnp.swapaxes(a, -2, -1))
        arrays.append(a)
    mpo = MatrixProductOperator(arrays, shape="lrud", **mpo_opts)
    if normalize:
        nf = float(
            jnp.sqrt(jnp.abs((mpo.H.copy() & mpo.copy()).contract(...)))
        )
        mpo.multiply_(1 / nf)
    return mpo


def MPO_rand_herm(L, bond_dim, phys_dim=2, normalize=True, dtype=None,
                  seed=None, **mpo_opts):
    return MPO_rand(L, bond_dim, phys_dim=phys_dim, normalize=normalize,
                    herm=True, dtype=dtype, seed=seed, **mpo_opts)


# ---------------------------------------------------------------------------
# SpinHam1D — the custom spin-chain Hamiltonian builder
# ---------------------------------------------------------------------------


class _TermAdder:
    """Helper so ``builder[i, j] += (f, 'Z', 'Z')`` works."""

    def __init__(self, terms, nsite):
        self.terms = list(terms) if terms is not None else []
        self.nsite = nsite

    def __iadd__(self, term):
        if len(term) - 1 != self.nsite:
            raise ValueError("wrong number of operators for site spec")
        self.terms.append(term)
        return self

    def __isub__(self, term):
        self.terms.append((-term[0], *term[1:]))
        return self


class SpinHam1D:
    """Nearest-neighbour spin-chain Hamiltonian builder → MPO /
    LocalHam1D / sparse matrix (reference ``SpinHam1D``
    tensor_builder.py:4967). Operator strings go through
    :func:`quimb_tpu.gen.operators.spin_operator`."""

    def __init__(self, S=1 / 2, cyclic=False):
        self.S = S
        self.cyclic = cyclic
        self.one_site_terms = []
        self.two_site_terms = []
        self.var_one_site_terms = {}
        self.var_two_site_terms = {}

    def add_term(self, factor, *operators):
        if factor == 0.0:
            return
        if len(operators) == 1:
            self.one_site_terms.append((factor, *operators))
        elif len(operators) == 2:
            self.two_site_terms.append((factor, *operators))
        else:
            raise NotImplementedError("3-body+ terms not supported")

    def sub_term(self, factor, *operators):
        self.add_term(-factor, *operators)

    def __iadd__(self, term):
        self.add_term(*term)
        return self

    def __isub__(self, term):
        self.sub_term(*term)
        return self

    def __getitem__(self, sites):
        if isinstance(sites, Integral):
            return _TermAdder(self.var_one_site_terms.get(sites), 1)
        i, j = sorted(sites)
        if j - i != 1:
            raise NotImplementedError("only nearest-neighbour terms")
        return _TermAdder(self.var_two_site_terms.get((i, j)), 2)

    def __setitem__(self, sites, value):
        terms = value.terms if isinstance(value, _TermAdder) else value
        if isinstance(sites, Integral):
            self.var_one_site_terms[sites] = terms
        else:
            i, j = sorted(sites)
            if j - i != 1:
                raise ValueError("only nearest-neighbour terms")
            self.var_two_site_terms[(i, j)] = terms

    # -- operator helpers ------------------------------------------------

    def _op(self, s):
        from ...gen.operators import _spin_op_np
        from ...ops.backend import to_host

        if isinstance(s, str):
            return np.asarray(_spin_op_np(s, float(self.S)))
        return to_host(s)

    def _sum_one_site(self, terms):
        d = int(2 * self.S + 1)
        H = np.zeros((d, d), dtype=complex)
        for factor, s in terms:
            H = H + factor * self._op(s)
        return H

    # -- MPO construction ---------------------------------------------------

    def _mpo_tensor(self, one_terms, two_terms, left_two_terms=None):
        """The bulk MPO tensor W[D, D, d, d] via the standard
        finite-state-machine construction."""
        if left_two_terms is None:
            left_two_terms = two_terms
        d = int(2 * self.S + 1)
        n2 = len(two_terms)
        nL = len(left_two_terms)
        D = max(n2, nL) + 2
        W = np.zeros((D, D, d, d), dtype=complex)
        I = np.eye(d, dtype=complex)
        W[0, 0] = I
        # outgoing: start -> intermediate k with factor*op1
        for k, (factor, s1, s2) in enumerate(two_terms):
            W[0, k + 1] = factor * self._op(s1)
        # incoming: intermediate k -> end with op2 (from left terms)
        for k, (factor, s1, s2) in enumerate(left_two_terms):
            W[k + 1, D - 1] = self._op(s2)
        if one_terms:
            W[0, D - 1] = self._sum_one_site(one_terms)
        W[D - 1, D - 1] = I
        return W

    def build_mpo(self, L, upper_ind_id="k{}", lower_ind_id="b{}",
                  site_tag_id="I{}", tags=None, dtype=None):
        """Build the MPO form (reference tensor_builder.py:5112).

        For ``cyclic=True``, the open-chain FSM MPO is promoted to a
        ring (trivial wrap bond) and the wrap interaction
        ``sum_k c_k X_(L-1) Y_0`` is added as bond-1 product MPOs via
        direct sum."""
        if self.cyclic:
            return self._build_mpo_cyclic(
                L, upper_ind_id=upper_ind_id, lower_ind_id=lower_ind_id,
                site_tag_id=site_tag_id, tags=tags, dtype=dtype,
            )
        dtype = dtype or get_default_dtype()
        arrays = []
        for i in range(L):
            t1s = self.var_one_site_terms.get(i, self.one_site_terms)
            t2s = self.var_two_site_terms.get(
                (i, i + 1), self.two_site_terms
            )
            t2s_L = self.var_two_site_terms.get(
                (i - 1, i), self.two_site_terms
            )
            W = self._mpo_tensor(t1s, t2s, left_two_terms=t2s_L)
            D = W.shape[0]
            if i == 0:
                arr = W[0, :]  # (D, d, d) -> r u d
            elif i == L - 1:
                arr = W[:, D - 1]  # (D, d, d) -> l u d
            else:
                arr = W
            if np.allclose(arr.imag, 0):
                arr = arr.real
                if "complex" in str(dtype):
                    rdtype = {"complex128": "float64",
                              "complex64": "float32"}[str(dtype)]
                    arrays.append(to_device(arr, dtype=rdtype))
                    continue
            arrays.append(to_device(arr, dtype=dtype))
        return MatrixProductOperator(
            arrays, shape="lrud", upper_ind_id=upper_ind_id,
            lower_ind_id=lower_ind_id, site_tag_id=site_tag_id, tags=tags,
        )

    def _build_mpo_cyclic(self, L, upper_ind_id="k{}",
                          lower_ind_id="b{}", site_tag_id="I{}",
                          tags=None, dtype=None):
        dtype = dtype or get_default_dtype()
        ids = dict(
            upper_ind_id=upper_ind_id, lower_ind_id=lower_ind_id,
            site_tag_id=site_tag_id,
        )

        # open-chain FSM part, promoted to a ring with a size-1 wrap bond
        obc = SpinHam1D(S=self.S, cyclic=False)
        obc.one_site_terms = list(self.one_site_terms)
        obc.two_site_terms = list(self.two_site_terms)
        obc.var_one_site_terms = dict(self.var_one_site_terms)
        obc.var_two_site_terms = dict(self.var_two_site_terms)
        mpo_obc = obc.build_mpo(L, tags=tags, dtype=dtype, **ids)
        arrays = []
        for i in range(L):
            t = mpo_obc[mpo_obc.site_tag(i)]
            u, lo = mpo_obc.upper_ind(i), mpo_obc.lower_ind(i)
            bix = tuple(ix for ix in t.inds if ix not in (u, lo))
            if i == 0:
                # (r, u, d) -> (1, r, u, d)
                a = t.transpose(*bix, u, lo).data[None, ...]
            elif i == L - 1:
                # (l, u, d) -> (l, 1, u, d)
                a = t.transpose(*bix, u, lo).data[:, None, ...]
            else:
                lb = next(iter(
                    bonds(mpo_obc[mpo_obc.site_tag(i - 1)], t)
                ))
                rb = next(iter(
                    bonds(t, mpo_obc[mpo_obc.site_tag(i + 1)])
                ))
                a = t.transpose(lb, rb, u, lo).data
            arrays.append(a)
        total = MatrixProductOperator(
            arrays, shape="lrud", cyclic=True, tags=tags, **ids
        )

        # wrap interaction terms as bond-1 cyclic product MPOs
        d = int(2 * self.S + 1)
        t2s = self.var_two_site_terms.get(
            (L - 1, 0), self.two_site_terms
        )
        for factor, s1, s2 in t2s:
            ops = [np.eye(d, dtype=complex) for _ in range(L)]
            ops[L - 1] = factor * self._op(s1)
            ops[0] = self._op(s2)
            term = MPO_product_operator(
                [to_device(o, dtype=dtype) for o in ops],
                cyclic=True, tags=tags, **ids
            )
            total = total.add_MPO(term)
        return total

    def build_sparse(self, L, **ikron_opts):
        """Sparse (host scipy) matrix form."""
        from ...core import ham_from_terms

        d = int(2 * self.S + 1)
        dims = (d,) * L
        terms = []
        for i in range(L):
            t1s = self.var_one_site_terms.get(i, self.one_site_terms)
            for factor, s in t1s:
                terms.append((factor, (self._op(s),), (i,)))
            if i + 1 == L and not self.cyclic:
                break
            t2s = self.var_two_site_terms.get(
                (i, i + 1), self.two_site_terms
            )
            j = (i + 1) % L
            for factor, s1, s2 in t2s:
                terms.append((factor, (self._op(s1), self._op(s2)),
                              (i, j)))
        return ham_from_terms(terms, dims, sparse=True)

    def build_dense(self, L):
        from ...core import ham_from_terms

        H = self.build_sparse(L)
        return jnp.asarray(H.toarray(), dtype=get_default_dtype())

    def build_local_ham(self, L=None, **local_ham_1d_opts):
        """Build the LocalHam1D (TEBD) form."""
        from .tebd import LocalHam1D

        H1s, H2s = {}, {}
        if self.two_site_terms:
            H2s[None] = self._sum_two_site(self.two_site_terms)
        for (i, j), terms in self.var_two_site_terms.items():
            H2s[(i, j)] = self._sum_two_site(terms)
        if self.one_site_terms:
            H1s[None] = self._sum_one_site(self.one_site_terms)
        for i, terms in self.var_one_site_terms.items():
            H1s[i] = self._sum_one_site(terms)
        return LocalHam1D(L=L, H2=H2s, H1=H1s if H1s else None,
                          cyclic=self.cyclic, **local_ham_1d_opts)

    def _sum_two_site(self, terms):
        d = int(2 * self.S + 1)
        H = np.zeros((d * d, d * d), dtype=complex)
        for factor, s1, s2 in terms:
            H = H + factor * np.kron(self._op(s1), self._op(s2))
        return H


# ---------------------------------------------------------------------------
# named Hamiltonians
# ---------------------------------------------------------------------------


def _ham_heis_builder(j=1.0, bz=0.0, S=1 / 2, cyclic=False):
    H = SpinHam1D(S=S, cyclic=cyclic)
    try:
        jx, jy, jz = j
    except (TypeError, ValueError):
        jx = jy = jz = j
    if jx == jy and jx != 0:
        H += jx / 2, "+", "-"
        H += jx / 2, "-", "+"
    else:
        if jx:
            H += jx, "X", "X"
        if jy:
            H += jy, "Y", "Y"
    if jz:
        H += jz, "Z", "Z"
    if bz:
        H -= bz, "Z"
    return H


def MPO_ham_heis(L, j=1.0, bz=0.0, S=1 / 2, cyclic=False, **mpo_opts):
    """Heisenberg MPO (reference tensor_builder.py:5498)."""
    return _ham_heis_builder(j, bz, S, cyclic).build_mpo(L, **mpo_opts)


def ham_1d_heis(L=None, j=1.0, bz=0.0, S=1 / 2, cyclic=False,
                **local_ham_1d_opts):
    return _ham_heis_builder(j, bz, S, cyclic).build_local_ham(
        L, **local_ham_1d_opts
    )


def MPO_ham_XY(L, j=1.0, bz=0.0, S=1 / 2, cyclic=False, **mpo_opts):
    try:
        jx, jy = j
    except (TypeError, ValueError):
        jx = jy = j
    return MPO_ham_heis(L, j=(jx, jy, 0.0), bz=bz, S=S, cyclic=cyclic,
                        **mpo_opts)


def ham_1d_XY(L=None, j=1.0, bz=0.0, S=1 / 2, cyclic=False, **opts):
    try:
        jx, jy = j
    except (TypeError, ValueError):
        jx = jy = j
    return ham_1d_heis(L, j=(jx, jy, 0.0), bz=bz, S=S, cyclic=cyclic,
                       **opts)


def _ham_ising_builder(j=1.0, bx=0.0, S=1 / 2, cyclic=False):
    H = SpinHam1D(S=S, cyclic=cyclic)
    H += 4 * j, "Z", "Z"
    H -= 2 * bx, "X"
    return H


def MPO_ham_ising(L, j=4.0, bx=2.0, S=1 / 2, cyclic=False, **mpo_opts):
    """Transverse-field Ising MPO (note the reference convention:
    H = j/4 sum Z Z - bx/2 sum X when given pauli-style j/bx)."""
    return _ham_ising_builder(j / 4, bx / 2, S, cyclic).build_mpo(
        L, **mpo_opts
    )


def ham_1d_ising(L=None, j=4.0, bx=2.0, S=1 / 2, cyclic=False, **opts):
    return _ham_ising_builder(j / 4, bx / 2, S, cyclic).build_local_ham(
        L, **opts
    )


def MPO_ham_mbl(L, dh, j=1.0, seed=None, S=1 / 2, cyclic=False,
                dh_dist="s", dh_dim=1, beta=None, **mpo_opts):
    """MBL Hamiltonian MPO: Heisenberg + random z-fields."""
    rng = np.random.default_rng(seed)
    H = _ham_heis_builder(j, 0.0, S, cyclic)
    if dh_dist in ("s", "flat", "uniform"):
        hs = rng.uniform(-dh, dh, L)
    else:
        hs = rng.normal(0, dh, L)
    for i in range(L):
        H[i] = [(-hs[i], "Z")]
    return H.build_mpo(L, **mpo_opts)


def ham_1d_mbl(L, dh, j=1.0, seed=None, S=1 / 2, cyclic=False,
               dh_dist="s", dh_dim=1, beta=None, **opts):
    rng = np.random.default_rng(seed)
    H = _ham_heis_builder(j, 0.0, S, cyclic)
    if dh_dist in ("s", "flat", "uniform"):
        hs = rng.uniform(-dh, dh, L)
    else:
        hs = rng.normal(0, dh, L)
    for i in range(L):
        H[i] = [(-hs[i], "Z")]
    return H.build_local_ham(L, **opts)


def MPO_ham_XXZ(L, delta, jxy=1.0, S=1 / 2, cyclic=False, **mpo_opts):
    """XXZ-model MPO: ``jxy (XX + YY) + delta ZZ`` (reference
    ``MPO_ham_XXZ`` tensor_builder.py:5584)."""
    try:
        jx, jy = jxy
    except (TypeError, ValueError):
        jx = jy = jxy
    return MPO_ham_heis(L, j=(jx, jy, delta), S=S, cyclic=cyclic,
                        **mpo_opts)


def ham_1d_XXZ(L=None, delta=None, jxy=1.0, S=1 / 2, cyclic=False,
               **opts):
    """XXZ-model LocalHam1D (reference ``ham_1d_XXZ``
    tensor_builder.py:5624)."""
    if delta is None:
        raise ValueError("must specify delta")
    try:
        jx, jy = jxy
    except (TypeError, ValueError):
        jx = jy = jxy
    return ham_1d_heis(L, j=(jx, jy, delta), S=S, cyclic=cyclic,
                       **opts)


def _ham_bilinear_biquadratic_builder(theta, S=1 / 2, cyclic=False):
    """Bilinear-biquadratic spin model:
    ``cos(theta) S.S + sin(theta) (S.S)^2`` (reference
    ``_ham_bilinear_biquadratic`` tensor_builder.py:5674)."""
    H = SpinHam1D(S=S, cyclic=cyclic)
    cost, sint = math.cos(theta), math.sin(theta)

    H += cost, "X", "X"
    H += cost, "Y", "Y"
    H += cost, "Z", "Z"

    # (S.S)^2 expanded into products of single-site operators
    from ...gen.operators import _spin_op_np

    for s1 in ("X", "Y", "Z"):
        for t1 in ("X", "Y", "Z"):
            op1 = np.asarray(_spin_op_np(s1, S)) @ np.asarray(
                _spin_op_np(t1, S)
            )
            op2 = np.asarray(_spin_op_np(s1, S)) @ np.asarray(
                _spin_op_np(t1, S)
            )
            H += sint, op1, op2
    return H


def MPO_ham_bilinear_biquadratic(L=None, theta=0, S=1 / 2,
                                 cyclic=False, compress=True,
                                 **mpo_opts):
    """Bilinear-biquadratic model MPO (reference
    ``MPO_ham_bilinear_biquadratic`` tensor_builder.py:5698)."""
    H = _ham_bilinear_biquadratic_builder(theta, S=S, cyclic=cyclic)
    mpo = H.build_mpo(L, **mpo_opts)
    if compress:
        mpo.compress(cutoff=1e-12)
    return mpo


def ham_1d_bilinear_biquadratic(L=None, theta=0, S=1 / 2,
                                cyclic=False, **opts):
    """Bilinear-biquadratic model LocalHam1D (reference
    ``ham_1d_bilinear_biquadratic`` tensor_builder.py:5732)."""
    H = _ham_bilinear_biquadratic_builder(theta, S=S, cyclic=cyclic)
    return H.build_local_ham(L, **opts)


def MPS_COPY(L, phys_dim=2, dtype="float64", **mps_opts):
    """MPS form of the L-leg COPY (delta) tensor (reference
    ``MPS_COPY`` tensor_builder.py:4315)."""
    def delta(shape):
        x = np.zeros(shape, dtype=dtype)
        idx = np.indices(shape)
        x[(idx[0] == idx).all(axis=0)] = 1
        return x

    arrays = []
    for i in range(L):
        shape = []
        if i > 0:
            shape.append(phys_dim)
        if i < L - 1:
            shape.append(phys_dim)
        shape.append(phys_dim)
        arrays.append(delta(tuple(shape)))
    return MatrixProductState(arrays, **mps_opts)
