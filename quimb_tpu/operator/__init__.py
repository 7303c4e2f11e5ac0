"""quimb_tpu.operator — second-quantized sparse operator building
(reference ``quimb/operator/``)."""

from .hilbertspace import HilbertSpace
from .builder import SparseOperatorBuilder
from .models import fermi_hubbard_from_edges, heisenberg_from_edges
from .pepobuilder import PEPO_nearest_neighbor, pepo_nearest_neighbor

__all__ = [
    "HilbertSpace",
    "SparseOperatorBuilder",
    "fermi_hubbard_from_edges",
    "heisenberg_from_edges",
    "PEPO_nearest_neighbor",
    "pepo_nearest_neighbor",
]
