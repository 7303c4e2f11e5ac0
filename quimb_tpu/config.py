"""Global configuration for quimb-tpu.

Centralizes:

- x64 enablement (reference quimb is float64/complex128 throughout; we enable
  jax x64 so CPU test runs match reference tolerances, while TPU hot paths
  can opt into float32/bfloat16 via the dtype context below).
- default dtypes for states/operators.
- environment variable knobs (mirrors reference ``quimb/core.py:29-43`` env
  var handling, adapted to JAX).

This module must be imported before any other quimb_tpu module touches jax
numpy, so that ``jax_enable_x64`` takes effect globally.
"""

import contextlib
import os
import threading

import jax

# -- x64 ---------------------------------------------------------------------
# The reference library operates in float64/complex128. We enable x64 by
# default so numerical semantics match on CPU (tests/CI). On an actual TPU
# backend x64 is left OFF: TPU v5e has no f64 hardware and the XLA:TPU
# backend raises UNIMPLEMENTED / stalls on s64/f64 programs — the TPU hot
# paths run float32/complex64 (+ bfloat16 inside Pallas kernels).
_X64_ENV = os.environ.get("QUIMB_TPU_X64", "auto")


def _default_backend_is_tpu():
    try:
        return jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
    except Exception:
        return False


if _X64_ENV == "1" or (_X64_ENV == "auto" and not _default_backend_is_tpu()):
    jax.config.update("jax_enable_x64", True)
    _DEFAULT_DTYPE = "complex128"
else:
    _DEFAULT_DTYPE = "complex64"

# -- matmul precision ----------------------------------------------------------
# TPU matmuls default to bfloat16 inputs (~3 decimal digits), which is far
# below what quantum-simulation value-exactness requires — e.g. an 8-qubit
# GHZ amplitude comes out 0.7019 instead of 0.70711. Default to full f32
# MXU passes; kernels that want bf16 speed opt in locally via
# ``jax.default_matmul_precision('bfloat16')``.
if os.environ.get("QUIMB_TPU_MATMUL_PRECISION", "") != "default":
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ.get("QUIMB_TPU_MATMUL_PRECISION", "highest"),
    )

# -- persistent compilation cache ---------------------------------------------
# DMRG/TEBD sweep programs at production sizes take minutes of XLA compile
# time on first trace; caching the compiled executables on disk makes every
# later process (benchmarks, tests, notebooks) start hot. Opt out with
# QUIMB_TPU_COMPILATION_CACHE=0 or point it at a different directory.
_CACHE_ENV = os.environ.get("QUIMB_TPU_COMPILATION_CACHE", "")
if _CACHE_ENV != "0":
    try:
        _cache_dir = _CACHE_ENV or os.path.join(
            os.path.expanduser("~"), ".cache", "quimb_tpu_jax"
        )
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags
        pass

_thread_local = threading.local()


def _get_stack(name, default):
    stacks = getattr(_thread_local, "stacks", None)
    if stacks is None:
        stacks = _thread_local.stacks = {}
    return stacks.setdefault(name, [default])


def get_default_dtype():
    """The current default complex dtype for states and operators."""
    return _get_stack(
        "dtype", os.environ.get("QUIMB_TPU_DTYPE", _DEFAULT_DTYPE)
    )[-1]


def get_default_real_dtype():
    dtype = get_default_dtype()
    return {
        "complex128": "float64",
        "complex64": "float32",
        "float64": "float64",
        "float32": "float32",
        "bfloat16": "bfloat16",
    }[str(dtype)]


def set_default_dtype(dtype):
    _get_stack("dtype", "complex128")[-1] = dtype


@contextlib.contextmanager
def default_dtype(dtype):
    """Context manager temporarily setting the default dtype."""
    stack = _get_stack("dtype", "complex128")
    stack.append(dtype)
    try:
        yield
    finally:
        stack.pop()


def on_tpu():
    """Whether the default jax backend is TPU-like."""
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat not in ("cpu", "gpu", "cuda", "rocm")


def fused_su_enabled():
    """Whether 2D SimpleUpdate uses the batched colour-class sweep
    kernel (one compiled program per ``evolve`` call) when eligible.
    Disable with QUIMB_TPU_FUSED_SU=0."""
    return os.environ.get("QUIMB_TPU_FUSED_SU", "1") != "0"


NUM_THREAD_WORKERS = int(
    os.environ.get(
        "QUIMB_TPU_NUM_THREAD_WORKERS",
        os.environ.get("QUIMB_NUM_THREAD_WORKERS", os.cpu_count() or 1),
    )
)
