"""Approximate spectral functions of TN linear operators (reference
``quimb/tensor/tensor_approx_spectral.py``): SLQ on e.g.
``TNLinearOperator1D`` for subsystem entropies of MPS."""

from ..linalg.approx_spectral import approx_spectral_function
from .linop import TNLinearOperator


def tensor_network_approx_spectral_function(tn, f, left_inds=None,
                                            right_inds=None, **kwargs):
    """Tr f(A) where A is the TN viewed as a linear operator."""
    if isinstance(tn, TNLinearOperator):
        A = tn
    else:
        A = TNLinearOperator(tn, left_inds, right_inds)

    fn, arrays = A.matvec_fn()
    import jax.numpy as jnp

    class _MV:
        shape = A.shape
        dtype = A.dtype

        @staticmethod
        def matvec(x):
            return jnp.reshape(
                fn(arrays, jnp.reshape(x, A.rdims)), (-1,)
            )

    return approx_spectral_function(_MV, f, **kwargs)


__all__ = ["tensor_network_approx_spectral_function"]
