"""MERA: multi-scale entanglement renormalization ansatz.

Re-design of reference ``quimb/tensor/tn1d/mera.py`` (``MERA`` :18,
``rand`` :169, ``rand_invar`` :205): a power-of-two binary 1D MERA built
from isometries and disentanglers, with layer tags ``_LAYER{i}`` and
the standard causal-cone structure."""

import math

import jax.numpy as jnp
import numpy as np

from ...gen.rand import randn
from ...ops.decomp import isometrize_qr
from ...utils import oset
from ..core import Tensor, TensorNetwork, rand_uuid
from .core import TensorNetwork1DVector


class MERA(TensorNetwork1DVector):
    """Binary 1D MERA on ``L = 2**n`` sites (periodic): alternating
    layers of 2-site unitaries (disentanglers, tag 'UNI') and 2->1
    isometries (tag 'ISO')."""

    _EXTRA_PROPS = ("_site_tag_id", "_site_ind_id", "_L")

    def __init__(self, L, uni=None, iso=None, phys_dim=2, dangle=False,
                 site_ind_id="k{}", site_tag_id="I{}", **tn_opts):
        if hasattr(L, "tensor_map"):
            TensorNetwork.__init__(self, L)
            return
        nlayers = round(math.log2(L))
        if 2**nlayers != L:
            raise ValueError("MERA needs L a power of 2")
        self._L = L
        self._site_ind_id = site_ind_id
        self._site_tag_id = site_tag_id

        d = phys_dim
        tensors = []
        # current open indices, one per coarse site
        cur = [site_ind_id.format(i) for i in range(L)]
        nsite = L
        for layer in range(nlayers):
            ltag = f"_LAYER{layer}"
            if nsite == 1:
                break
            # disentanglers on pairs (2i+1, 2i+2) (periodic)
            new_u = list(cur)
            if nsite > 2:
                for i in range(nsite // 2):
                    a = (2 * i + 1) % nsite
                    b = (2 * i + 2) % nsite
                    ua, ub = rand_uuid(), rand_uuid()
                    data = (uni[layer][i] if uni is not None
                            else _rand_uni(d))
                    tensors.append(Tensor(
                        jnp.reshape(jnp.asarray(data), (d, d, d, d)),
                        inds=(ua, ub, cur[a], cur[b]),
                        tags=oset(("UNI", ltag,
                                   site_tag_id.format(a),
                                   site_tag_id.format(b))),
                    ))
                    new_u[a], new_u[b] = ua, ub
            # isometries on pairs (2i, 2i+1) -> coarse site i
            new_c = []
            for i in range(nsite // 2):
                a, b = 2 * i, 2 * i + 1
                out = rand_uuid()
                data = (iso[layer][i] if iso is not None
                        else _rand_iso(d))
                tensors.append(Tensor(
                    jnp.reshape(jnp.asarray(data), (d, d, d)),
                    inds=(new_u[a], new_u[b], out),
                    tags=oset(("ISO", ltag,
                               site_tag_id.format(a),
                               site_tag_id.format(b))),
                    left_inds=(new_u[a], new_u[b]),
                ))
                new_c.append(out)
            cur = new_c
            nsite //= 2
        # cap: top tensor
        tensors.append(Tensor(
            _rand_vec(d ** len(cur)).reshape(
                tuple(d for _ in cur)
            ),
            inds=tuple(cur), tags=oset(("TOP", "_LAYER_TOP")),
        ))
        TensorNetwork.__init__(self, tensors, virtual=True, **tn_opts)

    @classmethod
    def rand(cls, L, phys_dim=2, dtype="float64", seed=None, **kwargs):
        rng = np.random.default_rng(seed)
        global _RNG
        _RNG = rng
        return cls(L, phys_dim=phys_dim, **kwargs)

    @classmethod
    def rand_invar(cls, L, phys_dim=2, seed=None, **kwargs):
        """Scale-invariant MERA: same tensors within each layer."""
        rng = np.random.default_rng(seed)
        d = phys_dim
        nlayers = round(math.log2(L))
        u_layer = _rand_uni(d, rng)
        i_layer = _rand_iso(d, rng)
        uni = [[u_layer] * (L // 2) for _ in range(nlayers)]
        iso = [[i_layer] * (L // 2) for _ in range(nlayers)]
        return cls(L, uni=uni, iso=iso, phys_dim=phys_dim, **kwargs)

    def isometrize(self, method="qr", inplace=False):
        """Project all UNI/ISO tensors into exact isometric form."""
        mera = self if inplace else self.copy()
        for t in mera:
            if "TOP" in t.tags:
                t.normalize_()
            elif "ISO" in t.tags:
                t.isometrize_(left_inds=t.inds[:2], method=method)
            elif "UNI" in t.tags:
                t.isometrize_(left_inds=t.inds[:2], method=method)
        return mera


_RNG = np.random.default_rng()


def _rand_uni(d, rng=None):
    rng = rng or _RNG
    m = rng.standard_normal((d * d, d * d))
    q, r = np.linalg.qr(m)
    return q * np.sign(np.diag(r))


def _rand_iso(d, rng=None):
    rng = rng or _RNG
    m = rng.standard_normal((d * d, d))
    q, r = np.linalg.qr(m)
    return q * np.sign(np.diag(r))


def _rand_vec(n, rng=None):
    rng = rng or _RNG
    v = rng.standard_normal(n)
    return jnp.asarray(v / np.linalg.norm(v))


# ---------------------------------------------------------------------------
# parity extras (reference experimental/merabuilder/merabuilder.py:648,803)
# ---------------------------------------------------------------------------

def _mera_num_layers(self):
    """The number of coarse-graining layers: log2(L)."""
    return round(math.log2(self._L))


def _mera_from_fill_fn(cls, fill_fn, L, D=None, phys_dim=2,
                       block_size=2, cyclic=True, uni_fill_fn=None,
                       iso_fill_fn=None, cap_fill_fn=None, **kwargs):
    """Create a MERA with tensors generated by ``fill_fn(shape)``
    (reference ``MERA.from_fill_fn`` merabuilder.py:648; here bond
    dimension follows ``phys_dim``)."""
    d = phys_dim
    nlayers = round(math.log2(L))
    ufn = uni_fill_fn or fill_fn
    ifn = iso_fill_fn or fill_fn
    uni, iso = [], []
    n = L
    for _ in range(nlayers):
        uni.append([ufn((d * d, d * d)) for _ in range(n // 2)])
        iso.append([ifn((d * d, d)) for _ in range(n // 2)])
        n //= 2
    return cls(L, uni=uni, iso=iso, phys_dim=phys_dim, **kwargs)


MERA.num_layers = property(_mera_num_layers)
MERA.from_fill_fn = classmethod(_mera_from_fill_fn)
