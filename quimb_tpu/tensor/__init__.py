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
