"""Quantum circuit simulators (reference ``quimb/tensor/circuit/``)."""

from .core import Circuit, CircuitBase, CircuitDense
from .gates import (
    ALL_GATES,
    CONSTANT_GATES,
    GATE_SIZE,
    PARAM_GATES,
    Gate,
    register_constant_gate,
    register_param_gate,
    register_special_gate,
)
from .mps import CircuitMPS, CircuitMPSLazy, CircuitPermMPS
from .peps import CircuitPEPS, CircuitPEPSSimpleUpdate
from .pepo import CircuitPEPOSimpleUpdate
from .simple_update import CircuitSimpleUpdate

__all__ = [
    "Circuit",
    "CircuitBase",
    "CircuitDense",
    "CircuitMPS",
    "CircuitMPSLazy",
    "CircuitPermMPS",
    "CircuitPEPS",
    "CircuitPEPSSimpleUpdate",
    "CircuitPEPOSimpleUpdate",
    "CircuitSimpleUpdate",
    "Gate",
    "ALL_GATES",
    "CONSTANT_GATES",
    "GATE_SIZE",
    "PARAM_GATES",
    "register_constant_gate",
    "register_param_gate",
    "register_special_gate",
]
