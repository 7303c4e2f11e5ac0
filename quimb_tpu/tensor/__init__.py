"""quimb_tpu.tensor — the tensor network half of the library
(mirrors the public surface of reference ``quimb/tensor/__init__.py``)."""

from .core import (
    COPY_tensor,
    IsoTensor,
    PArray,
    PTensor,
    Tensor,
    TensorNetwork,
    bonds,
    bonds_size,
    connect,
    group_inds,
    new_bond,
    rand_uuid,
    tensor_balance_bond,
    tensor_canonize_bond,
    tensor_compress_bond,
    tensor_contract,
    tensor_direct_product,
    tensor_fuse_squeeze,
    tensor_make_single_bond,
    tensor_network_sum,
    tensor_split,
)
from ..ops.contraction import (
    array_contract,
    array_contract_expression,
    array_contract_path,
    array_contract_tree,
    contract_backend,
    contract_strategy,
    get_contract_backend,
    get_contract_strategy,
    get_symbol,
    get_tensor_linop_backend,
    inds_to_eq,
    set_contract_backend,
    set_contract_strategy,
    set_tensor_linop_backend,
    tensor_linop_backend,
)
from ..utils import oset
from .linop import TNLinearOperator
from .tn1d import *  # noqa: F401,F403
from .tn1d import __all__ as _tn1d_all

__all__ = [
    "COPY_tensor",
    "IsoTensor",
    "PArray",
    "PTensor",
    "Tensor",
    "TensorNetwork",
    "TNLinearOperator",
    "bonds",
    "bonds_size",
    "connect",
    "group_inds",
    "new_bond",
    "oset",
    "rand_uuid",
    "tensor_balance_bond",
    "tensor_canonize_bond",
    "tensor_compress_bond",
    "tensor_contract",
    "tensor_direct_product",
    "tensor_fuse_squeeze",
    "tensor_make_single_bond",
    "tensor_network_sum",
    "tensor_split",
    "array_contract",
    "array_contract_expression",
    "array_contract_path",
    "array_contract_tree",
    "contract_backend",
    "contract_strategy",
    "get_contract_backend",
    "get_contract_strategy",
    "get_symbol",
    "get_tensor_linop_backend",
    "inds_to_eq",
    "set_contract_backend",
    "set_contract_strategy",
    "set_tensor_linop_backend",
    "tensor_linop_backend",
    *_tn1d_all,
]

from .circuit import (
    Circuit,
    CircuitBase,
    CircuitDense,
    CircuitMPS,
    CircuitMPSLazy,
    CircuitPEPOSimpleUpdate,
    CircuitPEPS,
    CircuitPEPSSimpleUpdate,
    CircuitPermMPS,
    Gate,
)
from .gating import (
    tensor_network_gate_inds,
    tensor_network_gate_sandwich,
    tensor_network_gate_sandwich_inds,
)
from .core import tensor_gauge_simple_bond
from .circuit_gen import (
    circ_a2a_rand,
    circ_ansatz_1D_brickwork,
    circ_ansatz_1D_rand,
    circ_ansatz_1D_zigzag,
    circ_qaoa,
    circ_rand_supremacy_like,
)

__all__ += [
    "Circuit", "CircuitBase", "CircuitDense", "CircuitMPS",
    "CircuitMPSLazy", "CircuitPEPOSimpleUpdate", "CircuitPEPS",
    "CircuitPEPSSimpleUpdate", "CircuitPermMPS", "Gate",
    "tensor_network_gate_inds", "tensor_network_gate_sandwich",
    "tensor_network_gate_sandwich_inds", "tensor_gauge_simple_bond",
    "circ_a2a_rand", "circ_ansatz_1D_brickwork", "circ_ansatz_1D_rand",
    "circ_ansatz_1D_zigzag", "circ_qaoa", "circ_rand_supremacy_like",
]

from . import interface  # noqa: F401  (registers TN classes as pytrees)
from .fitting import (
    conjugate_gradient,
    tensor_network_distance,
    tensor_network_fit_als,
    tensor_network_fit_autodiff,
    tensor_network_fit_tree,
)
from .optimize import MultiLossHandler, TNOptimizer, Vectorizer
from .interface import pack, unpack
from .geometry import (
    edges_1d_chain,
    edges_2d_hexagonal,
    edges_2d_kagome,
    edges_2d_square,
    edges_2d_triangular,
    edges_2d_triangular_rectangular,
    edges_3d_cubic,
    edges_3d_diamond,
    edges_3d_diamond_cubic,
    edges_3d_pyrochlore,
    edges_rand_reg,
    edges_tree_rand,
)
from .tn2d import *  # noqa: F401,F403
from .tn2d import __all__ as _tn2d_all
from .tnag import *  # noqa: F401,F403
from .tnag import __all__ as _tnag_all
from . import belief_propagation  # noqa: F401

__all__ += [
    "tensor_network_distance", "tensor_network_fit_als",
    "tensor_network_fit_autodiff", "tensor_network_fit_tree",
    "conjugate_gradient", "MultiLossHandler", "TNOptimizer", "Vectorizer",
    "pack", "unpack",
    "edges_1d_chain", "edges_2d_hexagonal", "edges_2d_kagome",
    "edges_2d_square", "edges_2d_triangular",
    "edges_2d_triangular_rectangular", "edges_3d_cubic",
    "edges_3d_diamond", "edges_3d_diamond_cubic",
    "edges_3d_pyrochlore", "edges_rand_reg", "edges_tree_rand",
    *_tn2d_all, *_tnag_all,
]

from . import networking  # noqa: F401
from .tn3d import *  # noqa: F401,F403
from .tn3d import __all__ as _tn3d_all

__all__ += [*_tn3d_all]

# generic/random/combinatorial builders — imported last so e.g. the
# full TensorNetwork3D-returning TN3D_classical_ising_partition_function
# shadows the simpler tnag variant
from .tensor_builder import (  # noqa: E402
    HTN2D_classical_ising_partition_function,
    HTN3D_classical_ising_partition_function,
    HTN_CP_from_inds_and_fill_fn,
    HTN_CP_from_sites_and_fill_fn,
    HTN_CP_operator_from_products,
    HTN_dual_from_edges_and_fill_fn,
    HTN_from_cnf,
    HTN_rand,
    HTN_random_ksat,
    TN2D_classical_ising_partition_function,
    TN2D_corner_double_line,
    TN2D_embedded_classical_ising_partition_function,
    TN2D_empty,
    TN2D_from_fill_fn,
    TN2D_rand,
    TN2D_rand_hidden_loop,
    TN2D_rand_symmetric,
    TN2D_with_value,
    TN3D_classical_ising_partition_function,
    TN3D_corner_double_line,
    TN3D_empty,
    TN3D_from_fill_fn,
    TN3D_rand,
    TN3D_rand_hidden_loop,
    TN3D_with_value,
    TN_from_edges_with_value,
    TN_from_sites_computational_state,
    TN_from_sites_product_state,
    TN_from_strings,
    TN_matching,
    TN_rand_tree,
    classical_ising_sqrtS_matrix,
    classical_ising_T_matrix,
    compute_string_edge_frequencies,
    convert_to_2d,
    convert_to_3d,
    delta_array,
    gen_2d_plaquettes,
    gen_3d_plaquettes,
    gen_unique_edges,
    make_couplings_matrix_symmetric,
    parse_j_coupling_to_function,
    rand_phased,
    rand_symmetric_array,
    rand_tensor,
    rand_tensor_symmetric,
    random_ksat_instance,
)
from .interface import jax_register_pytree  # noqa: E402

__all__ += [
    "HTN2D_classical_ising_partition_function",
    "HTN3D_classical_ising_partition_function",
    "HTN_CP_from_inds_and_fill_fn",
    "HTN_CP_from_sites_and_fill_fn",
    "HTN_CP_operator_from_products",
    "HTN_dual_from_edges_and_fill_fn",
    "HTN_from_cnf",
    "HTN_rand",
    "HTN_random_ksat",
    "TN2D_classical_ising_partition_function",
    "TN2D_corner_double_line",
    "TN2D_embedded_classical_ising_partition_function",
    "TN2D_empty",
    "TN2D_from_fill_fn",
    "TN2D_rand",
    "TN2D_rand_hidden_loop",
    "TN2D_rand_symmetric",
    "TN2D_with_value",
    "TN3D_classical_ising_partition_function",
    "TN3D_corner_double_line",
    "TN3D_empty",
    "TN3D_from_fill_fn",
    "TN3D_rand",
    "TN3D_rand_hidden_loop",
    "TN3D_with_value",
    "TN_from_edges_with_value",
    "TN_from_sites_computational_state",
    "TN_from_sites_product_state",
    "TN_from_strings",
    "TN_matching",
    "TN_rand_tree",
    "classical_ising_sqrtS_matrix",
    "classical_ising_T_matrix",
    "compute_string_edge_frequencies",
    "convert_to_2d",
    "convert_to_3d",
    "delta_array",
    "gen_2d_plaquettes",
    "gen_3d_plaquettes",
    "gen_unique_edges",
    "make_couplings_matrix_symmetric",
    "parse_j_coupling_to_function",
    "rand_phased",
    "rand_symmetric_array",
    "rand_tensor",
    "rand_tensor_symmetric",
    "random_ksat_instance",
    "jax_register_pytree",
]
