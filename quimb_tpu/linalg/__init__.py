"""quimb_tpu.linalg — dense & matrix-free linear algebra on device."""

from .lanczos import (
    eigh_lanczos,
    eigsh,
    expm_multiply_krylov,
    lobpcg_block,
)

__all__ = [
    "eigh_lanczos",
    "eigsh",
    "expm_multiply_krylov",
    "lobpcg_block",
]
