"""Arbitrary-geometry tensor networks: TEBDGen / SimpleUpdateGen etc."""

from .core import (
    TensorNetworkGen,
    TensorNetworkGenOperator,
    TensorNetworkGenVector,
    edge_coloring,
)
from .builders import (
    HTN_classical_partition_function_from_edges,
    HTN_from_clauses,
    TN3D_classical_ising_partition_function,
    TN_classical_partition_function_from_edges,
    TN_dimer_covering_from_edges,
    TN_from_edges_and_fill_fn,
    TN_from_edges_empty,
    TN_from_edges_rand,
    TN_rand_reg,
    cnf_file_parse,
)
from .compress import (
    tensor_network_ag_compress,
    tensor_network_ag_compress_local_early,
    tensor_network_ag_compress_local_late,
    tensor_network_ag_compress_projector,
    tensor_network_ag_compress_superorthogonal,
)
from .tebd import LocalHamGen, SimpleUpdateGen, TEBDGen, ham_gen_heis

__all__ = [
    "TensorNetworkGen",
    "TensorNetworkGenOperator",
    "TensorNetworkGenVector",
    "edge_coloring",
    "HTN_classical_partition_function_from_edges",
    "TN_classical_partition_function_from_edges",
    "TN_from_edges_and_fill_fn",
    "TN_from_edges_empty",
    "TN_from_edges_rand",
    "TN_rand_reg",
    "LocalHamGen",
    "SimpleUpdateGen",
    "TEBDGen",
    "ham_gen_heis",
]
