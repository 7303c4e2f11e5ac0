"""3D tensor networks (reference ``quimb/tensor/tn3d/core.py``:
``TensorNetwork3D``, boundary contraction, ``PEPS3D`` :2760).

Boundary contraction proceeds plane by plane: each absorbed plane is a
2D boundary-PEPS which is itself compressed with the tn2d machinery —
the natural 3D generalization of the boundary-MPS schedule."""

import functools
import itertools

import jax.numpy as jnp
import numpy as np

from ...gen.rand import randn
from ...utils import oset, pairwise
from ..core import Tensor, TensorNetwork, rand_uuid, tags_to_oset


def gen_3d_bonds(Lx, Ly, Lz, steppers=None, coo_filter=None):
    if steppers is None:
        steppers = [
            lambda i, j, k: (i, j, k + 1),
            lambda i, j, k: (i, j + 1, k),
            lambda i, j, k: (i + 1, j, k),
        ]
    for i, j, k in itertools.product(range(Lx), range(Ly), range(Lz)):
        if coo_filter is None or coo_filter(i, j, k):
            for stepper in steppers:
                i2, j2, k2 = stepper(i, j, k)
                if 0 <= i2 < Lx and 0 <= j2 < Ly and 0 <= k2 < Lz:
                    yield (i, j, k), (i2, j2, k2)


class TensorNetwork3D(TensorNetwork):
    _EXTRA_PROPS = (
        "_site_tag_id", "_x_tag_id", "_y_tag_id", "_z_tag_id",
        "_Lx", "_Ly", "_Lz",
    )

    @property
    def Lx(self):
        return self._Lx

    @property
    def Ly(self):
        return self._Ly

    @property
    def Lz(self):
        return self._Lz

    @property
    def nsites(self):
        return self._Lx * self._Ly * self._Lz

    def site_tag(self, i, j=None, k=None):
        if j is None:
            i, j, k = i
        return self._site_tag_id.format(i, j, k)

    def x_tag(self, i):
        return self._x_tag_id.format(i)

    def y_tag(self, j):
        return self._y_tag_id.format(j)

    def z_tag(self, k):
        return self._z_tag_id.format(k)

    def gen_site_coos(self):
        return itertools.product(
            range(self._Lx), range(self._Ly), range(self._Lz)
        )

    def maybe_convert_coo(self, x):
        if isinstance(x, tuple) and len(x) == 3 and all(
            isinstance(v, (int, np.integer)) for v in x
        ):
            return self.site_tag(*x)
        return x

    def _contract_plane(self, x0, x1, max_bond, cutoff, canonize=True):
        """Absorb x-plane x0 into x1, then compress all bonds within
        the new boundary plane."""
        for j, k in itertools.product(range(self._Ly),
                                      range(self._Lz)):
            t0, t1 = self.site_tag(x0, j, k), self.site_tag(x1, j, k)
            if t0 in self.tag_map and t1 in self.tag_map:
                self.contract_tags_((t0, t1), which="any")
            elif t0 in self.tag_map:
                for tid in self.tag_map[t0]:
                    self.tensor_map[tid].add_tag(t1)
        for j, k in itertools.product(range(self._Ly),
                                      range(self._Lz)):
            t0, t1 = self.site_tag(x0, j, k), self.site_tag(x1, j, k)
            if t0 in self.tag_map:
                for tid in tuple(self.tag_map[t0]):
                    t = self.tensor_map[tid]
                    t.drop_tags((t0, self.x_tag(x0)))
                    t.add_tag((t1, self.x_tag(x1)))
        if max_bond is not None:
            # compress neighbouring bonds within the plane
            for j, k in itertools.product(range(self._Ly),
                                          range(self._Lz)):
                for (j2, k2) in ((j, k + 1), (j + 1, k)):
                    if j2 >= self._Ly or k2 >= self._Lz:
                        continue
                    ta = self.site_tag(x1, j, k)
                    tb = self.site_tag(x1, j2, k2)
                    try:
                        self.compress_between(
                            ta, tb, max_bond=max_bond, cutoff=cutoff
                        )
                    except (KeyError, ValueError):
                        pass

    def contract_boundary(self, max_bond=None, cutoff=1e-10,
                          inplace=False, **opts):
        """Contract the network plane by plane along x."""
        tn = self if inplace else self.copy()
        for x in range(tn._Lx - 1):
            tn._contract_plane(x, x + 1, max_bond, cutoff)
        return tn.contract(...)


class TensorNetwork3DVector(TensorNetwork3D):
    _EXTRA_PROPS = (
        "_site_tag_id", "_x_tag_id", "_y_tag_id", "_z_tag_id",
        "_Lx", "_Ly", "_Lz", "_site_ind_id",
    )

    def site_ind(self, i, j=None, k=None):
        if j is None:
            i, j, k = i
        return self._site_ind_id.format(i, j, k)

    @property
    def site_inds(self):
        return tuple(
            self.site_ind(*coo) for coo in self.gen_site_coos()
        )

    def phys_dim(self, i=0, j=0, k=0):
        return self.ind_size(self.site_ind(i, j, k))

    def to_dense(self, *inds_seq, **contract_opts):
        if not inds_seq:
            inds_seq = (self.site_inds,)
        t = self.contract(
            ..., output_inds=tuple(
                ix for g in inds_seq for ix in g
            ), preserve_tensor=True, **contract_opts,
        )
        return jnp.reshape(t.data, (-1, 1))

    def gate(self, G, where, contract="reduce-split", inplace=False,
             **opts):
        from ..gating import tensor_network_gate_inds

        if isinstance(where[0], (int, np.integer)):
            where = (where,)
        inds = tuple(self.site_ind(*coo) for coo in where)
        psi = self if inplace else self.copy()
        if len(inds) == 1:
            contract = True
        tensor_network_gate_inds(
            psi, G, inds, contract=contract, inplace=True, **opts
        )
        return psi

    gate_ = functools.partialmethod(gate, inplace=True)

    def make_norm(self):
        ket = self.copy()
        ket.add_tag("KET")
        bra = ket.H
        bra.retag_({"KET": "BRA"})
        bra.mangle_inner_("*")
        norm = ket & bra
        norm.view_like_(self)
        return norm

    def norm2(self, max_bond=None, cutoff=1e-10, **opts):
        norm = self.make_norm()
        if max_bond is None:
            max_bond = max(8, (self.max_bond() or 2) ** 2)
        return norm.contract_boundary(max_bond=max_bond,
                                      cutoff=cutoff, **opts)


class PEPS3D(TensorNetwork3DVector):
    """3D PEPS (reference ``PEPS3D`` tn3d/core.py:2760), array order
    'urfdlbp' — here simplified to one bond per +x/+y/+z direction."""

    _EXTRA_PROPS = (
        "_site_tag_id", "_x_tag_id", "_y_tag_id", "_z_tag_id",
        "_Lx", "_Ly", "_Lz", "_site_ind_id",
    )

    def __init__(self, arrays=None, *, Lx=None, Ly=None, Lz=None,
                 site_ind_id="k{},{},{}", site_tag_id="I{},{},{}",
                 x_tag_id="X{}", y_tag_id="Y{}", z_tag_id="Z{}",
                 **tn_opts):
        if hasattr(arrays, "tensor_map"):
            TensorNetwork.__init__(self, arrays)
            return
        arrays = [
            [[arrays[i][j][k] for k in range(len(arrays[0][0]))]
             for j in range(len(arrays[0]))]
            for i in range(len(arrays))
        ]
        self._Lx = len(arrays)
        self._Ly = len(arrays[0])
        self._Lz = len(arrays[0][0])
        self._site_ind_id = site_ind_id
        self._site_tag_id = site_tag_id
        self._x_tag_id = x_tag_id
        self._y_tag_id = y_tag_id
        self._z_tag_id = z_tag_id

        bonds_x = {}
        bonds_y = {}
        bonds_z = {}
        for i, j, k in itertools.product(
            range(self._Lx), range(self._Ly), range(self._Lz)
        ):
            if i + 1 < self._Lx:
                bonds_x[(i, j, k)] = rand_uuid()
            if j + 1 < self._Ly:
                bonds_y[(i, j, k)] = rand_uuid()
            if k + 1 < self._Lz:
                bonds_z[(i, j, k)] = rand_uuid()
        tensors = []
        for i, j, k in itertools.product(
            range(self._Lx), range(self._Ly), range(self._Lz)
        ):
            inds = []
            # order: +x, +y, +z, -x, -y, -z, p  (missing dropped)
            if i + 1 < self._Lx:
                inds.append(bonds_x[(i, j, k)])
            if j + 1 < self._Ly:
                inds.append(bonds_y[(i, j, k)])
            if k + 1 < self._Lz:
                inds.append(bonds_z[(i, j, k)])
            if i > 0:
                inds.append(bonds_x[(i - 1, j, k)])
            if j > 0:
                inds.append(bonds_y[(i, j - 1, k)])
            if k > 0:
                inds.append(bonds_z[(i, j, k - 1)])
            inds.append(site_ind_id.format(i, j, k))
            tensors.append(Tensor(
                arrays[i][j][k], inds=inds,
                tags=oset((
                    site_tag_id.format(i, j, k), x_tag_id.format(i),
                    y_tag_id.format(j), z_tag_id.format(k),
                )),
            ))
        TensorNetwork.__init__(self, tensors, virtual=True, **tn_opts)

    @classmethod
    def rand(cls, Lx, Ly, Lz, bond_dim, phys_dim=2, dtype=None,
             seed=None, **kwargs):
        from ...config import get_default_dtype

        dtype = dtype or get_default_dtype()
        arrays = []
        s = 0
        for i in range(Lx):
            pj = []
            for j in range(Ly):
                pk = []
                for k in range(Lz):
                    shape = []
                    for cond in (i + 1 < Lx, j + 1 < Ly, k + 1 < Lz,
                                 i > 0, j > 0, k > 0):
                        if cond:
                            shape.append(bond_dim)
                    shape.append(phys_dim)
                    pk.append(randn(
                        tuple(shape), dtype=dtype,
                        seed=None if seed is None else seed + s,
                    ))
                    s += 1
                pj.append(pk)
            arrays.append(pj)
        return cls(arrays, **kwargs)
