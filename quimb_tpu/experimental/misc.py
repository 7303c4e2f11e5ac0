"""Miscellaneous experimental sketches (reference
``quimb/experimental/misc/``): the PEPS-DMRG virtual operators
(peps_dmrg.py:4,46,109,146), a translationally-invariant CTMRG
partition-function contractor (renormalization.py:10), and product
expectation helpers.

All array work is jnp (device); the CTMRG growth step is expressed as
plain einsums so XLA fuses each step into a couple of MXU
contractions.
"""

import jax.numpy as jnp
import numpy as np

from ..tensor.core import Tensor, TensorNetwork, rand_uuid


# --------------------------------------------------------------------------
# PEPS-DMRG style virtual operators (reference peps_dmrg.py)
# --------------------------------------------------------------------------


def virtual_bond_operator(tn, ind, operators=None, **contract_opts):
    """The environment operator of bond ``ind``: cut the bond open in
    both ket and bra layers and contract everything else, giving the
    matrix mapping the cut ket bond to the cut bra bond (reference
    ``virtual_bond_operator`` peps_dmrg.py:4). With ``operators``
    given ({site: G}), they are applied to the ket layer first — so
    eigenvectors of the result give DMRG-style optimal bond updates.
    """
    operators = {} if operators is None else dict(operators)

    ket = tn.copy()
    ixkl, ixkr, ixbl, ixbr = (rand_uuid() for _ in range(4))
    ket.cut_bond(ind, ixkl, ixkr)
    bra = ket.H
    bra.reindex_({ixkl: ixbl, ixkr: ixbr})
    bra.mangle_inner_()

    for where, G in operators.items():
        ket.gate_(G, where)

    overlap = ket | bra
    out = overlap.contract(
        ..., output_inds=(ixbl, ixbr, ixkl, ixkr),
        preserve_tensor=True, **contract_opts,
    )
    return out.to_dense((ixbl, ixbr), (ixkl, ixkr))


def virtual_site_operator(tn, site, operators=None, **contract_opts):
    """The environment operator of site ``site``: remove the site
    tensor from ket and bra and contract the rest, giving the matrix
    on the site's virtual bonds (reference ``virtual_site_operator``
    peps_dmrg.py:46); the physical leg contributes an identity (or
    the operator assigned to this site) as a kron factor."""
    operators = {} if operators is None else dict(operators)

    ket = tn.copy()
    (tid,) = ket._get_tids_from_tags(ket.site_tag(site), "all")
    t = ket.pop_tensor(tid)

    phys_ind = tn.site_ind(site)
    k_ix = tuple(ix for ix in t.inds if ix != phys_ind)
    reindex = {ix: rand_uuid() for ix in k_ix}
    b_ix = tuple(reindex[ix] for ix in k_ix)
    bra = ket.conj()
    bra.reindex_(reindex)
    bra.mangle_inner_()

    if phys_ind not in t.inds:
        dangling = None
    elif site in operators:
        dangling = jnp.asarray(operators.pop(site))
    else:
        d = t.ind_size(phys_ind)
        dangling = jnp.eye(d, dtype=t.data.dtype)

    for where, G in operators.items():
        ket.gate_(G, where)

    overlap = ket | bra
    X = overlap.contract(
        ..., output_inds=(*b_ix, *k_ix), preserve_tensor=True,
        **contract_opts,
    ).to_dense(b_ix, k_ix)

    if dangling is not None:
        X = jnp.kron(X, dangling)
    return X


def _apply_gates_at_inds(k, Gs, inds):
    """Contract each single-site gate ``G`` into the tensor holding
    its physical index."""
    from ..tensor.gating import tensor_network_gate_inds

    for G, ind in zip(Gs, inds):
        tensor_network_gate_inds(
            k, jnp.asarray(G), (ind,), contract=True, inplace=True,
        )
    return k


def product_expectation_exact(tn, Gs, where, normalized=True,
                              site_inds=None, **contract_opts):
    """<psi| prod_i G_i |psi> with each single-site ``G_i`` applied at
    ``where[i]`` — by full contraction (reference
    ``product_expectation_exact`` peps_dmrg.py:109). ``site_inds``
    overrides the physical-index lookup (used by the cluster variant,
    whose patch is a plain TensorNetwork)."""
    if site_inds is None:
        site_inds = [tn.site_ind(s) for s in where]
    k = tn.copy()
    b = k.H
    b.mangle_inner_()
    _apply_gates_at_inds(k, Gs, site_inds)
    expec = (b | k).contract(..., output_inds=(), **contract_opts)
    if normalized:
        k = tn.copy()
        nfact = (b | k).contract(..., output_inds=(), **contract_opts)
        expec = expec / nfact
    return expec


def product_expectation_cluster(tn, Gs, where, normalized=True,
                                max_distance=0, gauges=None,
                                **contract_opts):
    """Cluster approximation of :func:`product_expectation_exact`:
    contract only a local neighbourhood of the acted sites, with the
    cut environment approximated by simple-update gauges (reference
    ``product_expectation_cluster`` peps_dmrg.py:146)."""
    site_inds = [tn.site_ind(s) for s in where]
    tags = tuple(tn.site_tag(s) for s in where)
    k = tn.select_local(tags, which="any",
                        max_distance=max_distance, virtual=False)
    if gauges is not None:
        k.gauge_simple_insert(gauges)
    return product_expectation_exact(
        k, Gs, where, normalized=normalized, site_inds=site_inds,
        **contract_opts,
    )


# --------------------------------------------------------------------------
# translationally invariant CTMRG (reference renormalization.py:10)
# --------------------------------------------------------------------------


def ctmrg_partition_function(T, A, C, L, max_bond,
                             strip_exponent=False):
    """Contract the L x L translationally-invariant network with bulk
    tensor ``T`` (d,d,d,d), edge tensor ``A`` (d,d,chi_t) and corner
    ``C`` (d,d) by corner-transfer-matrix growth (reference ``CTMRG``
    renormalization.py:10, symmetric case).

    Each growth step is three einsums + one eigh of the (chi*d)²
    corner — the isometry keeping the ``max_bond`` largest-magnitude
    eigenvalues renormalizes both the corner and the edge.

    Returns ``Z`` (and the log10 ``exponent`` if
    ``strip_exponent=True``, such that the true value is
    ``Z * 10**exponent``).
    """
    if (L < 4) or (L % 2 != 0):
        raise ValueError("L must be an even integer >= 4.")
    T = jnp.asarray(T)
    A = jnp.asarray(A)
    C = jnp.asarray(C)
    d = T.shape[0]
    # cumulative log10 scale factors of the working (normalized) A and
    # C relative to their true values: A_true = A * 10**la etc. The
    # corner rebuild C' = eigvals(corner_block(C, A)) is linear in C
    # and quadratic in A, so lc <- lc + 2 la at each step; the side
    # growth is linear in A, leaving la unchanged. (The reference
    # leaves this accounting as a TODO, renormalization.py:170.)
    la = lc = 0.0

    def corner_block(C, A):
        # M[ad, td, br, tr] = C[ca,cb] A[ca,ad,at] A[cb,br,bt]
        #                     T[at,td,tr,bt]
        X = jnp.einsum("ab,ade->bde", C, A)          # b, ad, at
        X = jnp.einsum("bde,bfg->defg", X, A)        # ad, at, br, bt
        X = jnp.einsum("defg,ehig->dhfi", X, T)      # ad, td, br, tr
        return X

    for _ in range(2, L - 2, 2):
        chi = A.shape[0]
        X = corner_block(C, A)                       # (chi,d,chi,d)
        CTM = jnp.reshape(X, (chi * d, chi * d))
        CTM = (CTM + jnp.conj(CTM.T)) / 2
        s, U = jnp.linalg.eigh(CTM)
        order = jnp.argsort(-jnp.abs(s))
        k = min(max_bond, s.shape[0])
        keep = order[:k]
        s = s[keep]
        U = U[:, keep]                               # (chi*d, k)
        C = jnp.diag(s)
        lc = lc + 2 * la
        U3 = jnp.reshape(U, (chi, d, k))
        # side growth: A'[u, dn, r] =
        #   A[au, ad, at] T[at, td, r, tu] U[au, tu, u] U*[ad, td, dn]
        Y = jnp.einsum("ade,ethu->adthu", A, T)      # au,ad,td,r,tu
        Y = jnp.einsum("adthu,auv->dthv", Y, U3)     # ad,td,r,u
        A = jnp.einsum("dthv,dtw->vwh", Y, jnp.conj(U3))
        if strip_exponent:
            an = float(jnp.linalg.norm(A))
            cn = float(jnp.linalg.norm(C))
            if an > 0:
                A = A / an
                la += np.log10(an)
            if cn > 0:
                C = C / cn
                lc += np.log10(cn)

    chi = A.shape[0]
    X = corner_block(C, A)
    CTM = jnp.reshape(X, (chi * d, chi * d))
    Z = jnp.trace(CTM @ CTM @ CTM @ CTM)
    if strip_exponent:
        # Z uses 4 corner blocks, each with one C and two A's
        return Z, 4 * lc + 8 * la
    return Z


def classical_ising_T_A_C(beta, j=1.0, h=0.0):
    """Bulk/edge/corner tensors of the square-lattice classical Ising
    partition function at inverse temperature ``beta`` (to feed
    :func:`ctmrg_partition_function`; reference builds these via
    ``TN2D_classical_ising_partition_function`` arrays)."""
    import math

    q = jnp.asarray([
        [math.exp(beta * j), math.exp(-beta * j)],
        [math.exp(-beta * j), math.exp(beta * j)],
    ])
    # symmetric square root of the bond weight
    s, u = jnp.linalg.eigh(q)
    hq = (u * jnp.sqrt(jnp.clip(s, 0.0, None))) @ u.T
    site = jnp.asarray([math.exp(beta * h), math.exp(-beta * h)])
    T = jnp.einsum("s,si,sj,sk,sl->ijkl", site, hq, hq, hq, hq)
    A = jnp.einsum("s,si,sj,sk->ijk", site, hq, hq, hq)
    C = jnp.einsum("s,si,sj->ij", site, hq, hq)
    return T, A, C


__all__ = [
    "classical_ising_T_A_C",
    "ctmrg_partition_function",
    "product_expectation_cluster",
    "product_expectation_exact",
    "virtual_bond_operator",
    "virtual_site_operator",
]
