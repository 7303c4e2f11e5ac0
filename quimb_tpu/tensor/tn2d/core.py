"""2D tensor networks: PEPS, PEPO, boundary contraction, environments.

Re-design of reference ``quimb/tensor/tn2d/core.py``
(``TensorNetwork2D`` :355, boundary contraction core :1355 /
``contract_boundary`` :2502, environments ``compute_environments``
:2716, ``compute_local_expectation`` :4223, ``PEPS`` :4613,
``PEPO`` :5068).

The boundary-MPS sweeps — the 2D workhorse (BASELINE 16x16 PEPS config)
— lower entirely to the S0 kernels: each absorb step is a batch of
pairwise tensor contractions, each compression a QR-reduced truncated
SVD. Sequential row sweeps with device-parallel per-column work is the
TPU-idiomatic schedule (SURVEY §5 'long-context analogue').
"""

import functools
import itertools
import random

import jax.numpy as jnp
import numpy as np

from ...utils import check_opt, oset, pairwise
from ..core import (
    Tensor,
    TensorNetwork,
    bonds,
    rand_uuid,
    tags_to_oset,
    tensor_contract,
)


def gen_2d_bonds(Lx, Ly, steppers=None, coo_filter=None, cyclic=False):
    """Generate 2D lattice bond pairs (reference ``gen_2d_bonds``)."""
    if steppers is None:
        steppers = [lambda i, j: (i, j + 1), lambda i, j: (i + 1, j)]
    if callable(steppers):
        steppers = (steppers,)
    try:
        cyclic_x, cyclic_y = cyclic
    except TypeError:
        cyclic_x = cyclic_y = cyclic
    for i, j in itertools.product(range(Lx), range(Ly)):
        if coo_filter is None or coo_filter(i, j):
            for stepper in steppers:
                i2, j2 = stepper(i, j)
                if (0 <= i2 < Lx or cyclic_x) and \
                        (0 <= j2 < Ly or cyclic_y):
                    yield (i, j), (i2 % Lx, j2 % Ly)


class TensorNetwork2D(TensorNetwork):
    """A 2D-structured TN: tensors tagged ``I{i},{j}``, row tags
    ``X{i}``, column tags ``Y{j}``."""

    _EXTRA_PROPS = ("_site_tag_id", "_x_tag_id", "_y_tag_id", "_Lx",
                    "_Ly")

    @property
    def Lx(self):
        return self._Lx

    @property
    def Ly(self):
        return self._Ly

    @property
    def nsites(self):
        return self._Lx * self._Ly

    @property
    def site_tag_id(self):
        return self._site_tag_id

    def site_tag(self, i, j=None):
        if j is None:
            i, j = i
        return self._site_tag_id.format(i % self._Lx, j % self._Ly)

    @property
    def x_tag_id(self):
        return self._x_tag_id

    def x_tag(self, i):
        return self._x_tag_id.format(i % self._Lx)

    @property
    def y_tag_id(self):
        return self._y_tag_id

    def y_tag(self, j):
        return self._y_tag_id.format(j % self._Ly)

    row_tag = x_tag
    col_tag = y_tag

    @property
    def site_tags(self):
        return tuple(
            self.site_tag(i, j) for i, j in self.gen_site_coos()
        )

    def gen_site_coos(self):
        return itertools.product(range(self._Lx), range(self._Ly))

    def gen_bond_coos(self):
        return gen_2d_bonds(self._Lx, self._Ly)

    def maybe_convert_coo(self, x):
        if isinstance(x, tuple) and len(x) == 2 and all(
            isinstance(v, (int, np.integer)) for v in x
        ):
            return self.site_tag(*x)
        return x

    def _repr_info(self):
        return f"Lx={self._Lx}, Ly={self._Ly}"

    # -- boundary contraction ------------------------------------------------

    def _contract_boundary_single(
        self, xrange, yrange, from_which, max_bond=None, cutoff=1e-10,
        canonize=True, compress_sweep=None, layer_tags=None,
        equalize_norms=False,
    ):
        """Absorb one row (or column) into the boundary then compress
        along it (reference ``_contract_boundary_core``
        tn2d/core.py:1355, single-layer case)."""
        if from_which in ("xmin", "xmax"):
            # combining rows x0, x1 into x1 position... absorb xi into
            # the boundary already at position
            if from_which == "xmin":
                x0, x1 = xrange[0], xrange[0] + 1
            else:
                x0, x1 = xrange[1], xrange[1] - 1
            js = range(yrange[0], yrange[1] + 1)
            # contract column by column
            for j in js:
                tag0, tag1 = self.site_tag(x0, j), self.site_tag(x1, j)
                if tag0 in self.tag_map and tag1 in self.tag_map:
                    self.contract_tags_(
                        (tag0, tag1), which="any",
                    )
                elif tag0 in self.tag_map:
                    # retag lone boundary tensor into the new row
                    for tid in self.tag_map[tag0]:
                        self.tensor_map[tid].add_tag(tag1)
            # drop old row tags, ensure new tags
            for j in js:
                tag0, tag1 = self.site_tag(x0, j), self.site_tag(x1, j)
                if tag0 in self.tag_map:
                    for tid in tuple(self.tag_map[tag0]):
                        t = self.tensor_map[tid]
                        t.drop_tags((tag0, self.x_tag(x0)))
                        t.add_tag((tag1, self.x_tag(x1),
                                   self.y_tag(j)))
            # compress along the new boundary row
            if max_bond is not None or cutoff:
                jlist = list(js)
                if canonize:
                    for ja, jb in pairwise(reversed(jlist)):
                        try:
                            self.canonize_between(
                                self.site_tag(x1, jb),
                                self.site_tag(x1, ja),
                                absorb="right",
                            )
                        except (KeyError, ValueError):
                            pass
                for ja, jb in pairwise(jlist):
                    try:
                        self.compress_between(
                            self.site_tag(x1, ja),
                            self.site_tag(x1, jb),
                            max_bond=max_bond, cutoff=cutoff,
                            absorb="right",
                        )
                    except (KeyError, ValueError):
                        pass
        else:
            if from_which == "ymin":
                y0, y1 = yrange[0], yrange[0] + 1
            else:
                y0, y1 = yrange[1], yrange[1] - 1
            is_ = range(xrange[0], xrange[1] + 1)
            for i in is_:
                tag0, tag1 = self.site_tag(i, y0), self.site_tag(i, y1)
                if tag0 in self.tag_map and tag1 in self.tag_map:
                    self.contract_tags_((tag0, tag1), which="any")
                elif tag0 in self.tag_map:
                    for tid in self.tag_map[tag0]:
                        self.tensor_map[tid].add_tag(tag1)
            for i in is_:
                tag0, tag1 = self.site_tag(i, y0), self.site_tag(i, y1)
                if tag0 in self.tag_map:
                    for tid in tuple(self.tag_map[tag0]):
                        t = self.tensor_map[tid]
                        t.drop_tags((tag0, self.y_tag(y0)))
                        t.add_tag((tag1, self.y_tag(y1),
                                   self.x_tag(i)))
            if max_bond is not None or cutoff:
                ilist = list(is_)
                if canonize:
                    for ia, ib in pairwise(reversed(ilist)):
                        try:
                            self.canonize_between(
                                self.site_tag(ib, y1),
                                self.site_tag(ia, y1),
                                absorb="right",
                            )
                        except (KeyError, ValueError):
                            pass
                for ia, ib in pairwise(ilist):
                    try:
                        self.compress_between(
                            self.site_tag(ia, y1),
                            self.site_tag(ib, y1),
                            max_bond=max_bond, cutoff=cutoff,
                            absorb="right",
                        )
                    except (KeyError, ValueError):
                        pass
        if equalize_norms:
            self.equalize_norms_()
        return self

    def contract_boundary_from(
        self, from_which, max_bond=None, cutoff=1e-10, sequence=None,
        xrange=None, yrange=None, max_separation=1, canonize=True,
        inplace=False, **opts,
    ):
        tn = self if inplace else self.copy()
        if xrange is None:
            xrange = (0, tn._Lx - 1)
        if yrange is None:
            yrange = (0, tn._Ly - 1)
        xrange, yrange = list(xrange), list(yrange)
        while (from_which in ("xmin", "xmax") and
               xrange[1] - xrange[0] >= 1) or \
              (from_which in ("ymin", "ymax") and
               yrange[1] - yrange[0] >= 1):
            tn._contract_boundary_single(
                tuple(xrange), tuple(yrange), from_which,
                max_bond=max_bond, cutoff=cutoff, canonize=canonize,
                **opts,
            )
            if from_which == "xmin":
                xrange[0] += 1
            elif from_which == "xmax":
                xrange[1] -= 1
            elif from_which == "ymin":
                yrange[0] += 1
            else:
                yrange[1] -= 1
        return tn

    contract_boundary_from_xmin = functools.partialmethod(
        contract_boundary_from, "xmin")
    contract_boundary_from_xmax = functools.partialmethod(
        contract_boundary_from, "xmax")
    contract_boundary_from_ymin = functools.partialmethod(
        contract_boundary_from, "ymin")
    contract_boundary_from_ymax = functools.partialmethod(
        contract_boundary_from, "ymax")

    def contract_boundary(
        self, max_bond=None, cutoff=1e-10, sequence=("xmin", "xmax"),
        max_separation=1, inplace=False, **opts,
    ):
        """Contract the whole network via alternating boundary sweeps
        (reference ``contract_boundary`` tn2d/core.py:2502)."""
        tn = self if inplace else self.copy()
        xrange = [0, tn._Lx - 1]
        yrange = [0, tn._Ly - 1]
        seq = itertools.cycle(sequence)
        has_x = any(d in ("xmin", "xmax") for d in sequence)
        has_y = any(d in ("ymin", "ymax") for d in sequence)
        while (has_x and xrange[1] - xrange[0] > max_separation) or \
              (has_y and yrange[1] - yrange[0] > max_separation):
            d = next(seq)
            if d in ("xmin", "xmax") and \
                    xrange[1] - xrange[0] <= max_separation:
                continue
            if d in ("ymin", "ymax") and \
                    yrange[1] - yrange[0] <= max_separation:
                continue
            tn._contract_boundary_single(
                tuple(xrange), tuple(yrange), d, max_bond=max_bond,
                cutoff=cutoff, **opts,
            )
            if d == "xmin":
                xrange[0] += 1
            elif d == "xmax":
                xrange[1] -= 1
            elif d == "ymin":
                yrange[0] += 1
            else:
                yrange[1] -= 1
        return tn.contract(...)

    # -- environments -----------------------------------------------------------

    def compute_x_environments(self, max_bond=None, cutoff=1e-10,
                               **opts):
        """Boundary environments for every row: ``envs['xmin', i]`` =
        boundary of rows < i, ``envs['xmax', i]`` = rows > i
        (reference ``compute_environments`` tn2d/core.py:2716)."""
        envs = {}
        envs["xmin", 0] = TensorNetwork(())
        # incremental bottom-up:
        boundary = None
        for i in range(self._Lx - 1):
            if boundary is None:
                boundary = self.select(self.x_tag(0), which="any").copy()
                boundary.view_like_(self)
            else:
                # add row i and contract into it
                row = self.select(self.x_tag(i), which="any").copy()
                boundary.add_tensor_network(row, virtual=True,
                                            check_collisions=False)
                boundary.view_like_(self)
                boundary._contract_boundary_single(
                    (i - 1, i), (0, self._Ly - 1), "xmin",
                    max_bond=max_bond, cutoff=cutoff, **opts,
                )
            env = boundary.copy()
            envs["xmin", i + 1] = env
            if i == 0:
                # compress the first row too
                pass
        # top-down
        envs["xmax", self._Lx - 1] = TensorNetwork(())
        boundary = None
        for i in range(self._Lx - 1, 0, -1):
            if boundary is None:
                boundary = self.select(
                    self.x_tag(self._Lx - 1), which="any"
                ).copy()
                boundary.view_like_(self)
            else:
                row = self.select(self.x_tag(i), which="any").copy()
                boundary.add_tensor_network(row, virtual=True,
                                            check_collisions=False)
                boundary.view_like_(self)
                boundary._contract_boundary_single(
                    (i, i + 1), (0, self._Ly - 1), "xmax",
                    max_bond=max_bond, cutoff=cutoff, **opts,
                )
            envs["xmax", i - 1] = boundary.copy()
        return envs

    def compute_y_environments(self, max_bond=None, cutoff=1e-10,
                               **opts):
        envs = {}
        boundary = None
        for j in range(self._Ly - 1):
            if boundary is None:
                boundary = self.select(self.y_tag(0), which="any").copy()
                boundary.view_like_(self)
            else:
                col = self.select(self.y_tag(j), which="any").copy()
                boundary.add_tensor_network(col, virtual=True,
                                            check_collisions=False)
                boundary.view_like_(self)
                boundary._contract_boundary_single(
                    (0, self._Lx - 1), (j - 1, j), "ymin",
                    max_bond=max_bond, cutoff=cutoff, **opts,
                )
            envs["ymin", j + 1] = boundary.copy()
        envs["ymin", 0] = TensorNetwork(())
        boundary = None
        for j in range(self._Ly - 1, 0, -1):
            if boundary is None:
                boundary = self.select(
                    self.y_tag(self._Ly - 1), which="any"
                ).copy()
                boundary.view_like_(self)
            else:
                col = self.select(self.y_tag(j), which="any").copy()
                boundary.add_tensor_network(col, virtual=True,
                                            check_collisions=False)
                boundary.view_like_(self)
                boundary._contract_boundary_single(
                    (0, self._Lx - 1), (j, j + 1), "ymax",
                    max_bond=max_bond, cutoff=cutoff, **opts,
                )
            envs["ymax", j - 1] = boundary.copy()
        envs["ymax", self._Ly - 1] = TensorNetwork(())
        return envs


class TensorNetwork2DVector(TensorNetwork2D):
    """2D TN with one physical index per site."""

    _EXTRA_PROPS = (
        "_site_tag_id", "_x_tag_id", "_y_tag_id", "_Lx", "_Ly",
        "_site_ind_id",
    )

    @property
    def site_ind_id(self):
        return self._site_ind_id

    def site_ind(self, i, j=None):
        if j is None:
            i, j = i
        return self._site_ind_id.format(i % self._Lx, j % self._Ly)

    @property
    def site_inds(self):
        return tuple(
            self.site_ind(i, j) for i, j in self.gen_site_coos()
        )

    def phys_dim(self, i=0, j=0):
        return self.ind_size(self.site_ind(i, j))

    def to_dense(self, *inds_seq, **contract_opts):
        if not inds_seq:
            inds_seq = (self.site_inds,)
        t = self.contract(
            ..., output_inds=tuple(
                ix for g in inds_seq for ix in g
            ), preserve_tensor=True, **contract_opts,
        )
        return jnp.reshape(t.data, (-1, 1))

    def make_norm(self, layer_tags=("KET", "BRA")):
        """<psi|psi> as a 2D TN (bra and ket layered)."""
        ket = self.copy()
        ket.add_tag(layer_tags[0])
        bra = ket.H
        bra.retag_({layer_tags[0]: layer_tags[1]})
        bra.mangle_inner_("*")
        norm = ket & bra
        norm.view_like_(self)
        return norm

    def norm2(self, max_bond=None, cutoff=1e-10, **opts):
        """<psi|psi> via boundary contraction."""
        norm = self.make_norm()
        if max_bond is None:
            max_bond = max(8, 2 * (self.max_bond() or 2) ** 2)
        return norm.contract_boundary(
            max_bond=max_bond, cutoff=cutoff, **opts
        )

    def gate(self, G, where, contract=False, tags=None, inplace=False,
             **opts):
        """Apply a gate to site(s) ``where`` (reference 2D vector
        gate)."""
        from ..gating import tensor_network_gate_inds

        if isinstance(where[0], (int, np.integer)):
            where = (where,)
        inds = tuple(self.site_ind(*coo) for coo in where)
        psi = self if inplace else self.copy()
        if len(inds) == 1:
            contract = True
        tensor_network_gate_inds(
            psi, G, inds, contract=contract, tags=tags, inplace=True,
            **opts,
        )
        return psi

    gate_ = functools.partialmethod(gate, inplace=True)

    def compute_local_expectation(
        self, terms, max_bond=None, cutoff=1e-10, normalized=True,
        autogroup=True, return_all=False, **boundary_opts,
    ):
        """Expectation of a dict of local terms ``{(coo1, coo2): G}``
        via boundary environments (reference
        ``compute_local_expectation`` tn2d/core.py:4223)."""
        norm = self.make_norm()
        if max_bond is None:
            max_bond = max(8, 2 * (self.max_bond() or 2) ** 2)
        x_envs = norm.compute_x_environments(
            max_bond=max_bond, cutoff=cutoff, **boundary_opts
        )

        # group terms by the rows they act on
        results = {}
        for where, G in terms.items():
            if isinstance(where[0], (int, np.integer)):
                where = (where,)
            xs = sorted(set(coo[0] for coo in where))
            x0, x1 = xs[0], xs[-1]
            # build the strip TN: bottom env + rows x0..x1 + top env
            strip = TensorNetwork(())
            bot = x_envs.get(("xmin", x0))
            if bot is not None and bot.num_tensors:
                strip.add_tensor_network(bot.copy(), virtual=True,
                                         check_collisions=False)
            for x in range(x0, x1 + 1):
                strip.add_tensor_network(
                    norm.select(norm.x_tag(x), which="any").copy(),
                    virtual=True, check_collisions=False,
                )
            top = x_envs.get(("xmax", x1))
            if top is not None and top.num_tensors:
                strip.add_tensor_network(top.copy(), virtual=True,
                                         check_collisions=False)

            # norm of the strip
            nval = strip.contract(...)

            # gated strip: apply G to the ket layer
            gstrip = strip.copy()
            ket_inds = [self.site_ind(*coo) for coo in where]
            # ket layer phys inds were contracted bra-ket in `norm`;
            # we need to regate: instead build expectation via rdm
            ev = self._strip_expectation(
                gstrip, where, G
            )
            results[tuple(where)] = (ev, nval)

        if return_all:
            return {
                k: (complex(v), complex(n)) for k, (v, n) in
                results.items()
            }
        total = 0.0
        for (v, n) in results.values():
            total += complex(v) / (complex(n) if normalized else 1.0)
        return total.real if abs(total.imag) < 1e-10 else total

    def _strip_expectation(self, strip, where, G):
        """Insert operator G on the bra-ket bond of sites ``where``
        within a norm-strip TN and contract."""
        # in `make_norm` ket site inds got contracted directly with bra
        # ones. To insert G we cut those indices at the given sites.
        # Here instead we rebuild: the strip contains both layers; the
        # phys bond between them at site (i,j) is the (hyper) index
        # site_ind(i, j).
        ixs = [self.site_ind(*coo) for coo in where]
        cut_map = {}
        for ix in ixs:
            tids = strip.ind_map.get(ix)
            # split the hyperindex between KET and BRA layer
            ket_tids = [
                t for t in tids if "KET" in strip.tensor_map[t].tags
            ]
            new_ix = rand_uuid()
            for t in ket_tids:
                strip.tensor_map[t].reindex_({ix: new_ix})
            cut_map[ix] = new_ix
        d = int(np.prod([strip.ind_size(ix) for ix in ixs]))
        GT = Tensor(
            jnp.reshape(jnp.asarray(G, dtype=strip.dtype),
                        tuple(strip.ind_size(ix) for ix in ixs) * 2),
            inds=(*ixs, *[cut_map[ix] for ix in ixs]),
        )
        strip.add_tensor(GT, virtual=True)
        return strip.contract(...)


# ---------------------------------------------------------------------------
# PEPS / PEPO
# ---------------------------------------------------------------------------


class PEPS(TensorNetwork2DVector):
    """Projected entangled pair state (reference ``PEPS``
    tn2d/core.py:4613). Array order 'urdlp' with missing edge bonds
    dropped."""

    _EXTRA_PROPS = (
        "_site_tag_id", "_x_tag_id", "_y_tag_id", "_Lx", "_Ly",
        "_site_ind_id",
    )

    def __init__(self, arrays, *, shape="urdlp", tags=None,
                 site_ind_id="k{},{}", site_tag_id="I{},{}",
                 x_tag_id="X{}", y_tag_id="Y{}", **tn_opts):
        if isinstance(arrays, PEPS):
            super().__init__(arrays)
            return
        arrays = tuple(tuple(row) for row in arrays)
        self._Lx = len(arrays)
        self._Ly = len(arrays[0])
        self._site_ind_id = site_ind_id
        self._site_tag_id = site_tag_id
        self._x_tag_id = x_tag_id
        self._y_tag_id = y_tag_id
        tags = tags_to_oset(tags)

        # vertical bonds [i][j]: between (i, j) and (i+1, j)
        vbonds = [
            [rand_uuid() for _ in range(self._Ly)]
            for _ in range(self._Lx - 1)
        ]
        hbonds = [
            [rand_uuid() for _ in range(self._Ly - 1)]
            for _ in range(self._Lx)
        ]
        tensors = []
        for i, j in itertools.product(range(self._Lx), range(self._Ly)):
            arr = arrays[i][j]
            inds = []
            for c in shape:
                if c == "u" and i < self._Lx - 1:
                    inds.append(vbonds[i][j])
                elif c == "d" and i > 0:
                    inds.append(vbonds[i - 1][j])
                elif c == "r" and j < self._Ly - 1:
                    inds.append(hbonds[i][j])
                elif c == "l" and j > 0:
                    inds.append(hbonds[i][j - 1])
                elif c == "p":
                    inds.append(site_ind_id.format(i, j))
            tensors.append(Tensor(
                arr, inds=inds,
                tags=tags | oset((
                    site_tag_id.format(i, j), x_tag_id.format(i),
                    y_tag_id.format(j),
                )),
            ))
        TensorNetwork.__init__(self, tensors, virtual=True, **tn_opts)

    def normalize(self, max_bond=None, cutoff=1e-10, inplace=True,
                  **opts):
        n2 = self.norm2(max_bond=max_bond, cutoff=cutoff, **opts)
        self.multiply_(float(jnp.real(n2)) ** -0.5)
        return self


class PEPO(TensorNetwork2D):
    """Projected entangled pair operator (reference ``PEPO``
    tn2d/core.py:5068). Array order 'urdlbk' (up right down left
    bra ket)."""

    _EXTRA_PROPS = (
        "_site_tag_id", "_x_tag_id", "_y_tag_id", "_Lx", "_Ly",
        "_upper_ind_id", "_lower_ind_id",
    )

    def __init__(self, arrays, *, shape="urdlbk", tags=None,
                 upper_ind_id="k{},{}", lower_ind_id="b{},{}",
                 site_tag_id="I{},{}", x_tag_id="X{}", y_tag_id="Y{}",
                 **tn_opts):
        if isinstance(arrays, PEPO):
            super().__init__(arrays)
            return
        arrays = tuple(tuple(row) for row in arrays)
        self._Lx = len(arrays)
        self._Ly = len(arrays[0])
        self._upper_ind_id = upper_ind_id
        self._lower_ind_id = lower_ind_id
        self._site_tag_id = site_tag_id
        self._x_tag_id = x_tag_id
        self._y_tag_id = y_tag_id
        tags = tags_to_oset(tags)

        vbonds = [
            [rand_uuid() for _ in range(self._Ly)]
            for _ in range(self._Lx - 1)
        ]
        hbonds = [
            [rand_uuid() for _ in range(self._Ly - 1)]
            for _ in range(self._Lx)
        ]
        tensors = []
        for i, j in itertools.product(range(self._Lx), range(self._Ly)):
            arr = arrays[i][j]
            inds = []
            for c in shape:
                if c == "u" and i < self._Lx - 1:
                    inds.append(vbonds[i][j])
                elif c == "d" and i > 0:
                    inds.append(vbonds[i - 1][j])
                elif c == "r" and j < self._Ly - 1:
                    inds.append(hbonds[i][j])
                elif c == "l" and j > 0:
                    inds.append(hbonds[i][j - 1])
                elif c == "b":
                    inds.append(lower_ind_id.format(i, j))
                elif c == "k":
                    inds.append(upper_ind_id.format(i, j))
            tensors.append(Tensor(
                arr, inds=inds,
                tags=tags | oset((
                    site_tag_id.format(i, j), x_tag_id.format(i),
                    y_tag_id.format(j),
                )),
            ))
        TensorNetwork.__init__(self, tensors, virtual=True, **tn_opts)

    def upper_ind(self, i, j):
        return self._upper_ind_id.format(i, j)

    def lower_ind(self, i, j):
        return self._lower_ind_id.format(i, j)


# ---------------------------------------------------------------------------
# coarse-graining contraction schemes (reference ``contract_hotrg``
# tn2d/core.py:3611, ``contract_ctmrg`` :3801)
# ---------------------------------------------------------------------------


def _merge_rows_pairwise(tn, max_bond, cutoff):
    """One HOTRG-style coarse-graining step along x: row pairs
    (2i, 2i+1) merge into one row, then the doubled vertical bonds are
    truncated back to ``max_bond``."""
    Lx, Ly = tn._Lx, tn._Ly
    new_Lx = (Lx + 1) // 2
    for i in range(new_Lx):
        x0, x1 = 2 * i, 2 * i + 1
        for j in range(Ly):
            t0 = tn.site_tag(x0, j)
            if x1 < Lx:
                t1 = tn.site_tag(x1, j)
                if t0 in tn.tag_map and t1 in tn.tag_map:
                    tn.contract_tags_((t0, t1), which="any")
            # retag to the coarse row
            for tid in tuple(tn.tag_map.get(t0, ())):
                t = tn.tensor_map[tid]
                t.drop_tags((
                    t0, tn.site_tag(x1, j) if x1 < Lx else t0,
                    tn.x_tag(x0), tn.x_tag(x1) if x1 < Lx else
                    tn.x_tag(x0),
                ))
                t.add_tag((
                    tn.site_tag(i, j), tn.x_tag(i), tn.y_tag(j),
                ))
    tn._Lx = new_Lx
    # truncate doubled horizontal bonds within each coarse row
    for i in range(new_Lx):
        for j in range(Ly - 1):
            try:
                tn.compress_between(
                    tn.site_tag(i, j), tn.site_tag(i, j + 1),
                    max_bond=max_bond, cutoff=cutoff,
                )
            except (KeyError, ValueError):
                pass
    return tn


def contract_hotrg(
    tn, max_bond=None, cutoff=1e-10, inplace=False, equalize_norms=True,
    **kwargs,
):
    """Contract a 2D TN by alternating HOTRG-style pairwise
    coarse-graining of rows and columns with bond truncation
    (reference ``contract_hotrg`` tn2d/core.py:3611 — here the
    truncating projectors come from the pairwise bond compression
    rather than a full HOSVD environment)."""
    tn = tn if inplace else tn.copy()
    if max_bond is None:
        max_bond = max(8, (tn.max_bond() or 2) ** 2)
    while (tn._Lx > 1 or tn._Ly > 1) and tn.num_tensors > 4:
        if tn._Lx > 1:
            _merge_rows_pairwise(tn, max_bond, cutoff)
        if equalize_norms:
            tn.equalize_norms_()
        if tn._Ly > 1 and tn.num_tensors > 4:
            _merge_cols_pairwise(tn, max_bond, cutoff)
        if equalize_norms:
            tn.equalize_norms_()
    return tn.contract(...)


def _merge_cols_pairwise(tn, max_bond, cutoff):
    Lx, Ly = tn._Lx, tn._Ly
    new_Ly = (Ly + 1) // 2
    for j in range(new_Ly):
        y0, y1 = 2 * j, 2 * j + 1
        for i in range(Lx):
            t0 = tn.site_tag(i, y0)
            if y1 < Ly:
                t1 = tn.site_tag(i, y1)
                if t0 in tn.tag_map and t1 in tn.tag_map:
                    tn.contract_tags_((t0, t1), which="any")
            for tid in tuple(tn.tag_map.get(t0, ())):
                t = tn.tensor_map[tid]
                t.drop_tags((
                    t0, tn.site_tag(i, y1) if y1 < Ly else t0,
                    tn.y_tag(y0), tn.y_tag(y1) if y1 < Ly else
                    tn.y_tag(y0),
                ))
                t.add_tag((
                    tn.site_tag(i, j), tn.x_tag(i), tn.y_tag(j),
                ))
    tn._Ly = new_Ly
    for j in range(new_Ly):
        for i in range(Lx - 1):
            try:
                tn.compress_between(
                    tn.site_tag(i, j), tn.site_tag(i + 1, j),
                    max_bond=max_bond, cutoff=cutoff,
                )
            except (KeyError, ValueError):
                pass
    return tn


def contract_ctmrg(
    tn, max_bond=None, cutoff=1e-10, sequence=("xmin", "ymin", "xmax",
                                               "ymax"),
    inplace=False, **kwargs,
):
    """Contract a 2D TN with a CTMRG-style schedule: boundaries absorbed
    inward from all four directions in rotation, each absorption
    followed by boundary compression (reference ``contract_ctmrg``
    tn2d/core.py:3801; corner matrices arise as the boundary tensors at
    the lattice corners)."""
    tn = tn if inplace else tn.copy()
    if max_bond is None:
        max_bond = max(8, (tn.max_bond() or 2) ** 2)
    return tn.contract_boundary(
        max_bond=max_bond, cutoff=cutoff, sequence=sequence,
        inplace=True, **kwargs,
    )


# bind as methods
TensorNetwork2D.contract_hotrg = contract_hotrg
TensorNetwork2D.contract_ctmrg = contract_ctmrg
