"""Marginals of classical partition-function / SAT tensor networks
(reference ``quimb/experimental/tn_marginals.py``).

Two strategies:

- slicing: fix each output index value and contract, one contraction
  per (index, value) — embarrassingly parallel, exact.
- autodiff (TPU-native): attach a weight vector to every output index
  and take ``jax.grad`` of the partition function — ONE forward +
  backward pass yields ALL marginals simultaneously, since
  ``dZ/dv_ix[s] = Z(ix=s)``.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_all_marginals_via_slicing",
    "compute_all_marginals_via_autodiff",
]


def compute_all_marginals_via_slicing(
    tn, output_inds, optimize=None, normalized=True, **contract_opts
):
    """Marginal distribution of every index in ``output_inds``:
    ``w[ix][s] = Z(ix=s) (/ Z)``."""
    Z = None
    out = {}
    for ix in output_inds:
        d = tn.ind_size(ix)
        vals = []
        for s in range(d):
            tns = tn.isel({ix: s})
            vals.append(
                complex(tns.contract(..., optimize=optimize,
                                     **contract_opts)).real
            )
        w = np.array(vals)
        if Z is None:
            Z = w.sum()
        out[ix] = w / Z if normalized else w
    return out


def compute_all_marginals_via_autodiff(
    tn, output_inds, optimize=None, normalized=True
):
    """All marginals from one gradient of the weighted partition
    function: insert ``v_ix`` (ones) on each target index, then
    ``w[ix] = dZ(v)/dv_ix``."""
    from ..tensor.core import Tensor, TensorNetwork

    output_inds = tuple(output_inds)
    dtype = tn.dtype
    vs = [
        jnp.ones(tn.ind_size(ix), dtype=dtype) for ix in output_inds
    ]

    def Z_of(vs):
        tnw = TensorNetwork(
            [t.copy() for t in tn] + [
                Tensor(v, inds=(ix,))
                for v, ix in zip(vs, output_inds)
            ],
            virtual=True, check_collisions=False,
        )
        return jnp.real(tnw.contract(..., optimize=optimize))

    Z, grads = jax.value_and_grad(Z_of)(vs)
    Z = float(Z)
    out = {}
    for ix, g in zip(output_inds, grads):
        w = np.asarray(jax.device_get(g))
        out[ix] = w / Z if normalized else w
    return out
