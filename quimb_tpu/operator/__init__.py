"""quimb_tpu.operator — second-quantized sparse operator building
(reference ``quimb/operator/``)."""

from .hilbertspace import HilbertSpace
from .builder import SparseOperatorBuilder, get_mat
from .models import (
    fermi_hubbard_from_edges,
    fermi_hubbard_spinless_from_edges,
    heisenberg_from_edges,
    rand_operator,
)
from .pepobuilder import PEPO_nearest_neighbor, pepo_nearest_neighbor

__all__ = [
    "HilbertSpace",
    "SparseOperatorBuilder",
    "fermi_hubbard_from_edges",
    "fermi_hubbard_spinless_from_edges",
    "get_mat",
    "heisenberg_from_edges",
    "rand_operator",
    "PEPO_nearest_neighbor",
    "pepo_nearest_neighbor",
]
