"""quimb_tpu.tensor — the tensor network half of the library
(mirrors the public surface of reference ``quimb/tensor/__init__.py``)."""

from .core import (
    COPY_tensor,
    Tensor,
    TensorNetwork,
    bonds,
    bonds_size,
    group_inds,
    new_bond,
    rand_uuid,
    tensor_balance_bond,
    tensor_canonize_bond,
    tensor_compress_bond,
    tensor_contract,
    tensor_direct_product,
    tensor_split,
)
from ..ops.contraction import (
    contract_backend,
    contract_strategy,
    get_contract_backend,
    get_contract_strategy,
    inds_to_eq,
    set_contract_backend,
    set_contract_strategy,
    tensor_linop_backend,
)
from .linop import TNLinearOperator
from .tn1d import *  # noqa: F401,F403
from .tn1d import __all__ as _tn1d_all

__all__ = [
    "COPY_tensor",
    "Tensor",
    "TensorNetwork",
    "TNLinearOperator",
    "bonds",
    "bonds_size",
    "group_inds",
    "new_bond",
    "rand_uuid",
    "tensor_balance_bond",
    "tensor_canonize_bond",
    "tensor_compress_bond",
    "tensor_contract",
    "tensor_direct_product",
    "tensor_split",
    "contract_backend",
    "contract_strategy",
    "get_contract_backend",
    "get_contract_strategy",
    "inds_to_eq",
    "set_contract_backend",
    "set_contract_strategy",
    "tensor_linop_backend",
    *_tn1d_all,
]

from .circuit import (
    Circuit,
    CircuitDense,
    CircuitMPS,
    CircuitPermMPS,
    Gate,
)
from .circuit_gen import (
    circ_a2a_rand,
    circ_ansatz_1D_brickwork,
    circ_ansatz_1D_rand,
    circ_ansatz_1D_zigzag,
    circ_qaoa,
    circ_rand_supremacy_like,
)

__all__ += [
    "Circuit", "CircuitDense", "CircuitMPS", "CircuitPermMPS", "Gate",
    "circ_a2a_rand", "circ_ansatz_1D_brickwork", "circ_ansatz_1D_rand",
    "circ_ansatz_1D_zigzag", "circ_qaoa", "circ_rand_supremacy_like",
]

from . import interface  # noqa: F401  (registers TN classes as pytrees)
from .fitting import (
    tensor_network_distance,
    tensor_network_fit_als,
    tensor_network_fit_autodiff,
)
from .optimize import TNOptimizer, Vectorizer
from .interface import pack, unpack
from .geometry import (
    edges_1d_chain,
    edges_2d_hexagonal,
    edges_2d_kagome,
    edges_2d_square,
    edges_2d_triangular,
    edges_3d_cubic,
    edges_3d_diamond,
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
    "tensor_network_fit_autodiff", "TNOptimizer", "Vectorizer",
    "pack", "unpack",
    "edges_1d_chain", "edges_2d_hexagonal", "edges_2d_kagome",
    "edges_2d_square", "edges_2d_triangular", "edges_3d_cubic",
    "edges_3d_diamond", "edges_3d_pyrochlore", "edges_rand_reg",
    "edges_tree_rand",
    *_tn2d_all, *_tnag_all,
]

from . import networking  # noqa: F401
from .tn3d import *  # noqa: F401,F403
from .tn3d import __all__ as _tn3d_all

__all__ += [*_tn3d_all]
