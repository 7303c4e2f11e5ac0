"""On-the-fly symmetric sector matvec on device — no matrix.

TPU-native replacement for the reference's numba configuration kernels
(``quimb/operator/configcore.py``: ranking :112-:236 and the direct
symmetric ``matvec_nosymm/z2/u1/u1u1`` :288, :477, :530, :737). Those
kernels apply a second-quantized operator to a sector vector without
ever materializing the sparse matrix; here the same capability is one
compiled XLA program.

Design (gather-formulated, scatter-free):

- the sector's configurations (bit-packed ``int32``) live on device,
  rank-ordered — O(D) storage, the same order as the vector itself.
- the operator's coupling map (each term: sites, XOR flip mask, 2x2
  amplitude tables) is packed per term-arity into small device arrays
  and swept with ``lax.scan`` — program size independent of the number
  of terms.
- row ``r`` of H has nonzeros only at columns ``config[r] ^ flip_t``,
  so ``y[r] = sum_t amp_t(r) * x[rank(config[r] ^ flip_t)]`` is a pure
  gather + fused multiply-add — no scatter (XLA serializes TPU
  scatter-adds; see ``SparseHam``'s ELL design note, core.py:545).
- ``rank`` of the coupled configuration is computed *combinatorially*
  on device (cumulative-binomial gather for U1/U1U1, bit tricks for
  Z2/nosymm) — matching the reference's ``rank_into_flatconfig``
  family instead of a 2**nsites lookup table, so problems whose full
  space (or CSR) would not fit in memory stay reachable.

The whole object is a registered pytree, so it can be a jit *operand*:
``eigh_lanczos`` / ``expm_multiply_krylov`` compile once per problem
shape and every sweep after that is a single device dispatch.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CoupledHam"]


def _parity32(c):
    """Bit parity of an int32 array (popcount & 1), branch-free."""
    c = c ^ (c >> 16)
    c = c ^ (c >> 8)
    c = c ^ (c >> 4)
    c = c ^ (c >> 2)
    c = c ^ (c >> 1)
    return c & 1


def _word_bit(clo, chi, pos):
    """Bit ``pos`` of dual-word configs (31 bits per int32 word:
    nsites <= 62 without int64 — x64 programs are UNIMPLEMENTED on the
    TPU backend)."""
    hi = pos >= 31
    sh = jnp.where(hi, pos - 31, pos)
    w = jnp.where(hi, chi, clo)
    return (w >> sh) & 1


def _u1_rank_count(clo, chi, binom_flat, nbits, ncols, offset=0):
    """Combinatorial rank of dual-word configs among fixed-popcount
    integers, plus their popcount, scanning bits ``offset`` ..
    ``offset+nbits-1`` (reference ``configcore.rank_into_flatconfig``,
    vectorized over the whole batch on device).

    ``binom_flat[i*ncols + k] = C(i, k)`` with ``i`` the *local* bit
    position. Returns ``(rank, count)`` — for out-of-sector inputs the
    rank is garbage but the count exposes that, and the caller masks.
    """
    zeros = jnp.zeros(clo.shape, jnp.int32)

    def body(i, carry):
        cnt, r = carry
        b = _word_bit(clo, chi, offset + i).astype(jnp.int32)
        cnt = cnt + b
        r = r + b * jnp.take(binom_flat, i * ncols + cnt)
        return cnt, r

    cnt, r = jax.lax.fori_loop(0, nbits, body, (zeros, zeros))
    return r, cnt


class CoupledHam:
    """A symmetry-sector operator held as device-resident coupling
    tables, applied by gather (see module docstring).

    Build via :meth:`SparseOperatorBuilder.build_coupled_ham`; behaves
    like ``SparseHam`` (``@``, ``.shape``, ``.dtype``, ``to_dense``)
    but the matrix never exists.
    """

    def __init__(self, coupling_map, hilbert_space, dtype="float32"):
        hs = hilbert_space
        n = hs.nsites
        if n > 62:
            raise NotImplementedError(
                "configs are packed as 2x int32 words: nsites <= 62"
            )
        if n > 31 and hs.symmetry not in ("U1", "U1U1"):
            raise NotImplementedError(
                "nsites > 31 needs a rankable sector (U1/U1U1): the "
                "nosymm/Z2 spaces are 2**nsites-sized and cannot be "
                "stored anyway"
            )
        self.nsites = n
        self.symmetry = hs.symmetry
        self.sector = hs.sector
        D = hs.size
        self.shape = (D, D)
        self.dtype = np.dtype(dtype)
        iscomplex = np.issubdtype(self.dtype, np.complexfloating)

        # sector configurations, rank-ordered (O(D) device storage),
        # packed as two 31-bit int32 words
        cfg = hs.get_configs().astype(np.int64)
        self.configs = jnp.asarray(np.stack(
            [(cfg & 0x7FFFFFFF).astype(np.int32),
             (cfg >> 31).astype(np.int32)], axis=1,
        ))

        # cumulative binomial tables for device ranking
        if self.symmetry == "U1":
            from .hilbertspace import _binom_table

            B = _binom_table(n)
            self._ncols = n + 1
            self.binom = jnp.asarray(
                np.minimum(B, 2**31 - 1).astype(np.int32).ravel()
            )
            self._na = None
        elif self.symmetry == "U1U1":
            from .hilbertspace import _binom_table

            na = n // 2
            nb = n - na
            m = max(na, nb)
            B = _binom_table(m)
            self._ncols = m + 1
            self.binom = jnp.asarray(
                np.minimum(B, 2**31 - 1).astype(np.int32).ravel()
            )
            self._na = na
            self._size_a = int(math.comb(na, self.sector[0]))
        else:
            self.binom = jnp.zeros(1, jnp.int32)
            self._ncols = 1
            self._na = None

        # pack terms by arity; drop terms that can never connect two
        # sector configurations (their in-sector matrix block is 0)
        groups = {}
        self.const_shift = 0.0
        for coeff, sites, flip, mats in coupling_map:
            k = len(sites)
            if k == 0:
                self.const_shift += complex(coeff).real \
                    if not iscomplex else complex(coeff)
                continue
            if self._never_in_sector(sites, mats):
                continue
            g = groups.setdefault(k, {"coeff": [], "sites": [],
                                      "flip": [], "mats": []})
            g["coeff"].append(complex(coeff))
            g["sites"].append(list(sites))
            g["flip"].append([int(flip) & 0x7FFFFFFF,
                              (int(flip) >> 31) & 0x7FFFFFFF])
            g["mats"].append(
                [np.asarray(M, complex).reshape(4) for M in mats]
            )

        from ..ops.backend import to_device

        rdtype = {"complex64": np.float32,
                  "complex128": np.float64}.get(
            self.dtype.name, self.dtype
        )
        packed = []
        for k in sorted(groups):
            g = groups[k]
            coeffs = np.asarray(g["coeff"])   # complex128 host
            mats = np.asarray(g["mats"])      # (T, k, 4) complex128
            # store real tables when the data is real (the common
            # spin-model case — halves bandwidth and lets a real-x
            # matvec stay entirely real); individual imaginary factors
            # (e.g. y⊗y with a real product) keep complex tables and
            # the matvec takes the real part after the term product
            if np.allclose(coeffs.imag, 0) and np.allclose(mats.imag, 0):
                coeffs = coeffs.real.astype(rdtype)
                mats = mats.real.astype(rdtype)
            else:
                cdtype = (self.dtype.name if iscomplex else
                          {"float32": "complex64",
                           "float64": "complex128"}[np.dtype(rdtype).name])
                coeffs = coeffs.astype(cdtype)
                mats = mats.astype(cdtype)
            packed.append((
                to_device(coeffs),
                jnp.asarray(np.asarray(g["sites"], np.int32)),
                jnp.asarray(np.asarray(g["flip"], np.int32)),
                to_device(mats),
                k,
            ))
        # store as (coeffs, sites, flips, mats) tuples; arity in aux
        self.groups = tuple(p[:4] for p in packed)
        self._arities = tuple(p[4] for p in packed)

    # -- sector reachability (host, setup time) ------------------------------

    def _never_in_sector(self, sites, mats):
        """True if no assignment of per-site raise/lower directions
        yields a sector-preserving move (then the in-sector block of
        this term is exactly zero and it can be dropped up front)."""
        sym = self.symmetry
        if sym is None:
            return False
        deltas_tot = [0]
        if sym == "U1U1":
            deltas_a = [0]
        for s, M in zip(sites, mats):
            M = np.asarray(M)
            opts = set()
            if abs(M[0, 0]) > 0 or abs(M[1, 1]) > 0:
                opts.add(0)
            if abs(M[1, 0]) > 0:   # |0> -> |1>: dst pop one higher
                opts.add(+1)
            if abs(M[0, 1]) > 0:
                opts.add(-1)
            deltas_tot = [d + o for d in deltas_tot for o in opts]
            if sym == "U1U1":
                if s < self._na:
                    deltas_a = [d + o for d in deltas_a for o in opts]
                else:
                    deltas_a = deltas_a * max(len(opts), 1)
        if sym == "Z2":
            return all(d % 2 for d in deltas_tot)
        if sym == "U1":
            return 0 not in deltas_tot
        if sym == "U1U1":
            # need both halves conserved; conservative: total and
            # a-half each must be able to hit zero
            return (0 not in deltas_tot) or (0 not in deltas_a)
        return False

    # -- device ranking -------------------------------------------------------

    def _rank_valid(self, clo, chi):
        """(rank, in-sector mask) of coupled dual-word configs, on
        device."""
        sym = self.symmetry
        if sym is None:
            return clo, jnp.ones(clo.shape, bool)
        if sym == "Z2":
            want = {"even": 0, "odd": 1}.get(self.sector,
                                             self.sector)
            par = _parity32(clo) ^ _parity32(chi)
            return clo >> 1, par == (int(want) % 2)
        if sym == "U1":
            r, cnt = _u1_rank_count(
                clo, chi, self.binom, self.nsites, self._ncols
            )
            return r, cnt == int(self.sector)
        if sym == "U1U1":
            na = self._na
            nb = self.nsites - na
            ka, kb = (int(v) for v in self.sector)
            ra, ca = _u1_rank_count(
                clo, chi, self.binom, na, self._ncols
            )
            rb, cb = _u1_rank_count(
                clo, chi, self.binom, nb, self._ncols, offset=na
            )
            return rb * self._size_a + ra, (ca == ka) & (cb == kb)
        raise ValueError(sym)

    # -- matvec ---------------------------------------------------------------

    def matvec(self, x):
        clo = self.configs[:, 0]
        chi = self.configs[:, 1]
        D = self.shape[0]
        out_dtype = jnp.result_type(self.dtype, x.dtype)
        y = (self.const_shift * x).astype(out_dtype) \
            if self.const_shift else jnp.zeros(D, out_dtype)

        for (coeffs, sites, flips, mats), k in zip(
            self.groups, self._arities
        ):
            def body(y, term, k=k):
                coeff, ss, fl, M = term
                slo = clo ^ fl[0]
                shi = chi ^ fl[1]
                amp = None
                for a in range(k):
                    nb = _word_bit(clo, chi, ss[a]).astype(jnp.int32)
                    ob = _word_bit(slo, shi, ss[a]).astype(jnp.int32)
                    g = jnp.take(M[a], nb * 2 + ob)
                    amp = g if amp is None else amp * g
                # real-dtype operators have real term products even
                # when single factors are imaginary (e.g. y⊗y)
                amp = coeff * amp
                if not jnp.issubdtype(out_dtype, jnp.complexfloating):
                    amp = jnp.real(amp)
                j, valid = self._rank_valid(slo, shi)
                j = jnp.clip(j, 0, D - 1)
                xv = jnp.take(x, j)
                contrib = jnp.where(
                    valid, (amp.astype(out_dtype) * xv), 0
                )
                return y + contrib, None

            y, _ = jax.lax.scan(body, y, (coeffs, sites, flips, mats))
        return y

    def __matmul__(self, x):
        x = jnp.asarray(x)
        if x.ndim == 2 and x.shape[1] == 1:
            return jnp.reshape(self.matvec(x[:, 0]), (-1, 1))
        if x.ndim == 1:
            return self.matvec(x)
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(x)

    def to_dense(self):
        """Dense sector matrix (small problems / testing only)."""
        D = self.shape[0]
        eye = jnp.eye(D, dtype=self.dtype.name)
        return jax.jit(
            jax.vmap(self.matvec, in_axes=1, out_axes=1)
        )(eye)

    def __repr__(self):
        return (
            f"CoupledHam(D={self.shape[0]}, nsites={self.nsites}, "
            f"symmetry={self.symmetry}, sector={self.sector}, "
            f"nterms={sum(int(g[0].shape[0]) for g in self.groups)}, "
            f"dtype={self.dtype.name})"
        )


def _coupledham_flatten(h):
    leaves = (h.configs, h.binom, h.groups)
    aux = (h.shape, h.dtype, h.nsites, h.symmetry, h.sector,
           h._ncols, h._na, getattr(h, "_size_a", None),
           h._arities, h.const_shift)
    return leaves, aux


def _coupledham_unflatten(aux, leaves):
    h = CoupledHam.__new__(CoupledHam)
    h.configs, h.binom, h.groups = leaves
    (h.shape, h.dtype, h.nsites, h.symmetry, h.sector, h._ncols,
     h._na, h._size_a, h._arities, h.const_shift) = aux
    return h


jax.tree_util.register_pytree_node(
    CoupledHam, _coupledham_flatten, _coupledham_unflatten
)
