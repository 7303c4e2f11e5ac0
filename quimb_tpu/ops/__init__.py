"""quimb_tpu.ops — array-level kernel layer (S0).

- :mod:`quimb_tpu.ops.decomp` — truncated SVD/QR/eigh/polar/LU split engine.
- :mod:`quimb_tpu.ops.array_ops` — fuse/unfuse/diagonal finders.
- :mod:`quimb_tpu.ops.paths` — contraction path optimization (host-side).
- :mod:`quimb_tpu.ops.contraction` — einsum execution + expression cache.
- :mod:`quimb_tpu.ops.lanczos` — matrix-free Lanczos/LOBPCG/Krylov-expm.
"""

from .decomp import (
    array_split,
    compute_oblique_projectors,
    isometrize,
    lq_stabilized,
    qr_stabilized,
    squared_op_to_reduced_factor,
    svd_truncated,
    svd_truncated_masked,
)

__all__ = [
    "array_split",
    "compute_oblique_projectors",
    "isometrize",
    "lq_stabilized",
    "qr_stabilized",
    "squared_op_to_reduced_factor",
    "svd_truncated",
    "svd_truncated_masked",
]
