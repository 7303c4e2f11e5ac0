"""quimb_tpu — a TPU-native quantum information & tensor-network framework.

A ground-up re-design of the capabilities of jcmgray/quimb for TPU hardware:
every hot path is a jitted, shape-stable XLA program; truncations use static
bond caps with masking inside jit; multi-chip scaling uses
``jax.sharding.Mesh`` + collectives instead of MPI.

Layout:

- :mod:`quimb_tpu.ops` — array kernels: decomp, contraction, paths, linalg.
- :mod:`quimb_tpu.tensor` — Tensor/TensorNetwork core + 1D/2D/3D/arbitrary
  geometry algorithm stacks, circuits, belief propagation, optimization.
- :mod:`quimb_tpu.linalg` — dense/iterative eigensolvers, Krylov expm, SLQ.
- :mod:`quimb_tpu.gen` — states, operators, random generation.
- :mod:`quimb_tpu.parallel` — device-mesh distribution utilities.
"""

from . import config  # noqa: F401  (must be first: enables x64)

__version__ = "0.1.0"

import importlib as _importlib

# lazily-importable submodules
_SUBMODULES = {
    "ops", "tensor", "linalg", "gen", "utils", "parallel", "models",
}

# names re-exported from the exact-layer ("matrix API") modules, mirroring
# reference quimb/__init__.py:272-503
_CORE_FUNCTIONS = {}


def _build_lazy_index():
    import quimb_tpu.core as _core
    import quimb_tpu.calc as _calc
    import quimb_tpu.evo as _evo
    import quimb_tpu.gen.states as _states
    import quimb_tpu.gen.operators as _operators
    import quimb_tpu.gen.rand as _rand
    import quimb_tpu.linalg.base_linalg as _bl
    import quimb_tpu.linalg.approx_spectral as _as
    import quimb_tpu.linalg.rand_linalg as _rl
    import quimb_tpu.gates as _gates
    import quimb_tpu.utils as _utils
    import quimb_tpu.utils_plot as _uplot
    import quimb_tpu.parallel.pools as _pools

    mods = [_core, _calc, _evo, _states, _operators, _rand, _bl, _as,
            _rl, _gates, _utils, _uplot, _pools]
    for mod in mods:
        for name in getattr(mod, "__all__", ()):
            _CORE_FUNCTIONS.setdefault(name, mod)
    return _CORE_FUNCTIONS


def __getattr__(name):
    if name in _SUBMODULES:
        return _importlib.import_module(f"quimb_tpu.{name}")
    if not _CORE_FUNCTIONS:
        try:
            _build_lazy_index()
        except ImportError:
            raise AttributeError(name)
    if name in _CORE_FUNCTIONS:
        return getattr(_CORE_FUNCTIONS[name], name)
    raise AttributeError(f"module 'quimb_tpu' has no attribute {name!r}")


def __dir__():
    if not _CORE_FUNCTIONS:
        try:
            _build_lazy_index()
        except ImportError:
            pass
    return sorted(set(globals()) | _SUBMODULES | set(_CORE_FUNCTIONS))
