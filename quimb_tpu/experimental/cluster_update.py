"""Cluster update: gate + bond compression against a local *cluster*
environment rather than just the Vidal gauges (reference
``quimb/experimental/cluster_update/cxu.py``).

The bond environment ``E[kl, kr, bl, br]`` of the expanded bond is
computed from the norm network of a distance-``r`` cluster around the
gated pair (boundary bonds weighted by the simple gauges), then
low-rank projectors ``Pl @ Pr`` are fitted to it by alternating least
squares (reference ``compute_bondenv_projectors`` decomp.py:3202) and
inserted on the bond.
"""

import jax.numpy as jnp
import numpy as np

from ..ops import decomp
from ..tensor.core import Tensor, TensorNetwork, bonds
from ..tensor.tnag.tebd import SimpleUpdateGen

__all__ = ["fit_bondenv_projectors", "ClusterUpdateGen"]


def fit_bondenv_projectors(
    E, max_bond, cutoff=0.0, max_iterations=60, tol=1e-10,
    enforce_pos=True, pos_smudge=1e-10, Pl0=None, Pr0=None,
):
    """Fit ``Pl (D, m)``, ``Pr (m, D)`` minimizing the environment-
    weighted distance ``(x - I)^H E (x - I)`` with ``x = Pl @ Pr``.

    ``E`` has axes (ket-left, ket-right, bra-left, bra-right).
    Returns ``(Pl, s, Pr)`` with ``sqrt(s)`` absorbed both ways.
    ``Pl0``/``Pr0`` seed the alternation (e.g. with gram-based oblique
    projectors) — the ALS objective has local optima and a good seed
    matters.
    """
    D = E.shape[0]
    m = min(max_bond, D)

    # hermitize / clip to PSD over the (ket, bra) pairing
    Em = jnp.reshape(E, (D * D, D * D))
    Em = (Em + jnp.conj(Em.T)) / 2
    if enforce_pos:
        w, V = jnp.linalg.eigh(Em)
        w = jnp.clip(w, pos_smudge * jnp.max(jnp.abs(w)), None)
        Em = (V * w) @ jnp.conj(V.T)
    E = jnp.reshape(Em, (D, D, D, D))

    if Pl0 is not None and Pr0 is not None and Pl0.shape[1] == m:
        Pl, Pr = Pl0, Pr0
    else:
        # init from the bra-traced environment
        M = jnp.einsum("abcc->ab", E)
        U, s0, VH = decomp.svd_truncated(
            M, max_bond=m, cutoff=0.0, absorb=None
        )
        sq = jnp.sqrt(jnp.clip(s0, 1e-12, None))
        Pl = U * sq
        Pr = sq[:, None] * VH

    x0 = jnp.eye(D, dtype=E.dtype)
    eyem = jnp.eye(m, dtype=E.dtype)

    def cost(Pl, Pr):
        x = Pl @ Pr
        xEx = jnp.einsum(
            "abcd,cd,ab->", E, jnp.conj(x), x
        )
        xEx0 = jnp.einsum("abcd,cd,ab->", E, jnp.conj(x), x0)
        return float(jnp.real(xEx - 2 * jnp.real(xEx0)))

    prev = None
    for _ in range(max_iterations):
        # solve for Pl: N[(c,m),(a,m')] vec(Pl) = b[(c,m)]
        N = jnp.einsum("abcd,nd,mb->cnam", E, jnp.conj(Pr), Pr)
        bv = jnp.einsum("abcd,nd,ab->cn", E, jnp.conj(Pr), x0)
        Nm = jnp.reshape(N, (D * m, D * m))
        Nm = Nm + 1e-12 * jnp.trace(Nm).real / (D * m) * jnp.eye(
            D * m, dtype=Nm.dtype
        )
        Pl = jnp.reshape(
            jnp.linalg.solve(Nm, jnp.reshape(bv, (D * m,))), (D, m)
        )
        # solve for Pr: N[(m,d),(m',b)] vec(Pr) = b[(m,d)]
        N = jnp.einsum("abcd,cn,am->ndmb", E, jnp.conj(Pl), Pl)
        bv = jnp.einsum("abcd,cn,ab->nd", E, jnp.conj(Pl), x0)
        Nm = jnp.reshape(N, (m * D, m * D))
        Nm = Nm + 1e-12 * jnp.trace(Nm).real / (m * D) * jnp.eye(
            m * D, dtype=Nm.dtype
        )
        Pr = jnp.reshape(
            jnp.linalg.solve(Nm, jnp.reshape(bv, (m * D,))), (m, D)
        )
        c = cost(Pl, Pr)
        if prev is not None and abs(c - prev) < tol * max(abs(c), 1e-30):
            break
        prev = c

    # re-split to distribute weight evenly (and apply any cutoff)
    U, s, VH = decomp.svd_truncated(
        Pl @ Pr, max_bond=m, cutoff=cutoff, absorb=None
    )
    sq = jnp.sqrt(s)
    Pl = U * sq
    Pr = sq[:, None] * VH
    return Pl, s, Pr


class ClusterUpdateGen(SimpleUpdateGen):
    """Simple update whose bond truncation after each gate is fitted
    against the distance-``cluster_distance`` cluster environment
    (reference ``ClusterUpdateGen`` cxu.py:494)."""

    def __init__(self, psi0, ham, *, cluster_distance=1,
                 fit_iterations=30, fit_tol=1e-10, **kwargs):
        super().__init__(psi0, ham, **kwargs)
        self.cluster_distance = cluster_distance
        self.fit_iterations = fit_iterations
        self.fit_tol = fit_tol
        # cluster-updated states exploit loop correlations the simple
        # gauges can't see: the energy estimator must look at least as
        # far as the update did
        self.compute_energy_opts.setdefault(
            "max_distance", cluster_distance + 1
        )

    def _cluster_sites(self, a, b):
        """Sites within graph distance ``cluster_distance`` of the
        pair."""
        psi = self.state
        frontier = {a, b}
        seen = {a, b}
        for _ in range(self.cluster_distance):
            nxt = set()
            for site in frontier:
                t = self._site_tensor(site)
                for other in psi._sites:
                    if other in seen:
                        continue
                    if bonds(t, self._site_tensor(other)):
                        nxt.add(other)
            seen |= nxt
            frontier = nxt
        return seen

    def gate(self, U, where):
        psi = self.state
        a, b = where
        ta, tb = self._site_tensor(a), self._site_tensor(b)
        central = list(bonds(ta, tb))
        central_ix = central[0] if central else None

        # absorb environment gauges into the gated pair
        absorbed = []
        for (t, coo) in ((ta, a), (tb, b)):
            for ix in t.inds:
                if ix != central_ix and ix in self.gauges:
                    t.multiply_index_diagonal_(
                        ix, self.gauges[ix] + self.gauge_smudge
                    )
                    absorbed.append((coo, ix))
        if central_ix is not None and central_ix in self.gauges:
            s = self.gauges[central_ix]
            ta.multiply_index_diagonal_(central_ix, jnp.sqrt(s))
            tb.multiply_index_diagonal_(central_ix, jnp.sqrt(s))

        # expand the bond fully, no truncation yet
        gate_opts = dict(self.gate_opts)
        max_bond = gate_opts.pop("max_bond", self._D)
        gate_opts["cutoff"] = 0.0
        gate_opts["max_bond"] = None
        psi.gate_(U, where, contract="reduce-split", **gate_opts)

        ta, tb = self._site_tensor(a), self._site_tensor(b)
        central = list(bonds(ta, tb))
        if central and ta.ind_size(central[0]) > max_bond:
            self._cluster_compress(a, b, central[0], max_bond)
        if central:
            # re-canonicalize the pair in the local gauged metric: no
            # further truncation (bond already <= max_bond), but yields
            # well-conditioned Vidal tensors + the bond gauge
            from ..tensor.core import tensor_compress_bond

            ta, tb = self._site_tensor(a), self._site_tensor(b)
            out = tensor_compress_bond(
                ta, tb, absorb=None, max_bond=max_bond, cutoff=0.0,
            )
            if out is not None and len(out) == 3:
                _, s, _ = out
                self.gauges[central[0]] = s / jnp.linalg.norm(s)

        # unabsorb environment gauges
        for (coo, ix) in absorbed:
            t = self._site_tensor(coo)
            if ix in t.inds and ix in self.gauges:
                t.multiply_index_diagonal_(
                    ix, 1 / (self.gauges[ix] + self.gauge_smudge)
                )
        for coo in (a, b):
            t = self._site_tensor(coo)
            nrm = float(t.norm())
            if nrm > 0:
                t.modify(apply=lambda d, nrm=nrm: d / nrm)

    def _cluster_compress(self, a, b, bix, max_bond):
        """Fit and insert bond projectors from the cluster environment."""
        psi = self.state
        sites = self._cluster_sites(a, b)
        ta, tb = self._site_tensor(a), self._site_tensor(b)

        # build the weighted ket cluster
        kts = {}
        for site in sites:
            t = self._site_tensor(site).copy()
            if site not in (a, b):
                for ix in t.inds:
                    if ix not in self.gauges:
                        continue
                    holders = psi.ind_map.get(ix, ())
                    sites_holding = {
                        s2 for s2 in sites
                        if any(
                            tid in holders
                            for tid in psi._get_tids_from_tags(
                                psi.site_tag(s2), "any"
                            )
                        )
                    }
                    if a in sites_holding or b in sites_holding:
                        continue  # already absorbed on the pair side
                    g = self.gauges[ix] + self.gauge_smudge
                    if len(sites_holding) > 1:
                        t.multiply_index_diagonal_(ix, jnp.sqrt(g))
                    else:
                        t.multiply_index_diagonal_(ix, g)
            kts[site] = t

        # dangling gauges of the pair tensors were absorbed pre-gate;
        # cluster-external bonds of a/b already carry the full gauge.
        kts[a] = kts[a].reindex({bix: "__kl__"})
        kts[b] = kts[b].reindex({bix: "__kr__"})

        ket = TensorNetwork(
            [kts[s] for s in sites], virtual=True,
            check_collisions=False,
        )
        bra = ket.conj()
        bra.reindex_({"__kl__": "__bl__", "__kr__": "__br__"})
        bra.mangle_inner_("*")
        # NOTE: phys + dangling bonds stay shared -> traced with weight

        E_t = TensorNetwork(
            (ket, bra), virtual=True, check_collisions=False,
        ).contract(
            ...,
            output_inds=("__kl__", "__kr__", "__bl__", "__br__"),
            preserve_tensor=True,
        )
        Pl, s, Pr = fit_bondenv_projectors(
            E_t.data, max_bond,
            max_iterations=self.fit_iterations, tol=self.fit_tol,
        )

        # insert the projectors on the real bond
        from ..tensor.core import tensor_contract

        ta.reindex_({bix: "__kl__"})
        tb.reindex_({bix: "__kr__"})
        new_ta = tensor_contract(
            ta, Tensor(Pl, inds=("__kl__", bix)), preserve_tensor=True
        )
        new_tb = tensor_contract(
            Tensor(Pr, inds=(bix, "__kr__")), tb, preserve_tensor=True
        )
        ta.modify(
            data=new_ta.transpose(
                *(ix if ix != "__kl__" else bix for ix in ta.inds)
            ).data,
            inds=tuple(ix if ix != "__kl__" else bix for ix in ta.inds),
        )
        tb.modify(
            data=new_tb.transpose(
                *(ix if ix != "__kr__" else bix for ix in tb.inds)
            ).data,
            inds=tuple(ix if ix != "__kr__" else bix for ix in tb.inds),
        )
        # NOTE: the inserted weight stays in the tensors here; the
        # caller re-canonicalizes the pair (tensor_compress_bond) to
        # extract well-conditioned Vidal gauges
