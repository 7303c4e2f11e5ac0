"""Backend transfer shims.

The axon TPU backend cannot transfer complex arrays host<->device
(UNIMPLEMENTED); complex values are fine *on* device. These helpers
move complex data as two real planes and recombine, and are the single
choke-point every host<->device boundary in the framework goes
through."""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import on_tpu


def _needs_split():
    return on_tpu()


_RETRY_ATTEMPTS = int(os.environ.get("QUIMB_TPU_TRANSFER_RETRIES", 4))
_RETRY_DELAY = float(os.environ.get("QUIMB_TPU_TRANSFER_RETRY_DELAY", 0.5))
_retry_warned = False


def _retry_transient(fn, *args):
    """Run a raw host<->device transfer, retrying transient tunnel
    failures. The remote TPU transport sporadically returns
    UNIMPLEMENTED under sustained small-transfer load even though the
    identical call succeeds moments later; a genuine unsupported-op
    error keeps failing and is re-raised after the last attempt.

    A warning is emitted on the first retry so a *systematically*
    failing path (which pays the full backoff on every call) is
    visible rather than silently slow; tune via
    ``QUIMB_TPU_TRANSFER_RETRIES`` / ``QUIMB_TPU_TRANSFER_RETRY_DELAY``
    (set retries to 1 to fail fast)."""
    global _retry_warned
    delay = _RETRY_DELAY
    attempts = max(_RETRY_ATTEMPTS, 1)
    for attempt in range(attempts):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if "UNIMPLEMENTED" not in str(e) or attempt == attempts - 1:
                raise
            if not _retry_warned:
                _retry_warned = True
                import warnings

                warnings.warn(
                    "transient UNIMPLEMENTED on a host<->device "
                    "transfer; retrying with backoff (first "
                    "occurrence — repeated warnings suppressed; if "
                    "every call pays this, the path is genuinely "
                    "unsupported: set QUIMB_TPU_TRANSFER_RETRIES=1 "
                    "to fail fast while debugging)",
                    stacklevel=2,
                )
            time.sleep(delay)
            delay *= 2.0


def to_device(x, dtype=None):
    """Host array -> device array, splitting complex transfers on
    backends that need it."""
    if isinstance(x, jax.Array):
        return x if dtype is None else x.astype(dtype)
    xa = np.asarray(x)
    if dtype is not None:
        xa = xa.astype(np.dtype(str(dtype)))
    if _needs_split() and xa.ndim == 0:
        # 0-d host->device transfers are UNIMPLEMENTED on this
        # backend: ship as shape (1,) and squeeze compiled
        xa = xa.reshape(1)
        if np.iscomplexobj(xa):
            re = _retry_transient(jnp.asarray, np.ascontiguousarray(xa.real))
            im = _retry_transient(jnp.asarray, np.ascontiguousarray(xa.imag))
            return _combine_complex0(re, im, xa.dtype.name)
        return _squeeze0(_retry_transient(jnp.asarray, xa))
    if np.iscomplexobj(xa) and _needs_split():
        re = _retry_transient(jnp.asarray, np.ascontiguousarray(xa.real))
        im = _retry_transient(jnp.asarray, np.ascontiguousarray(xa.imag))
        # the combine must itself run compiled: eager lax.complex on
        # arrays is UNIMPLEMENTED on this TPU backend
        return _combine_complex(re, im, xa.dtype.name)
    if _needs_split():
        return _retry_transient(jnp.asarray, xa)
    return jnp.asarray(xa)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _combine_complex(re, im, dtype):
    return jax.lax.complex(re, im).astype(dtype)


@functools.partial(jax.jit, static_argnames=("dtype",))
def _combine_complex0(re, im, dtype):
    return jax.lax.complex(re, im).astype(dtype)[0]


@jax.jit
def _squeeze0(x):
    return x[0]


def to_host(x):
    """Device array -> numpy array, splitting complex transfers on
    backends that need it."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jnp.iscomplexobj(x) and _needs_split():
        # .real/.imag must be *computed* inside jit — eager complex
        # ops are UNIMPLEMENTED on this TPU backend; 0-d transfers are
        # too, so the split also lifts scalars to shape (1,)
        shape = x.shape
        re, im = _split_reim(x)
        out = (_retry_transient(np.asarray, re)
               + 1j * _retry_transient(np.asarray, im))
        return out.reshape(shape)
    if _needs_split():
        if x.ndim == 0:
            return _retry_transient(np.asarray, _unsqueeze0(x)).reshape(())
        return _retry_transient(np.asarray, x)
    return np.asarray(x)


@jax.jit
def _split_reim(x):
    x = jnp.reshape(x, (-1,)) if x.ndim == 0 else x
    return jnp.real(x), jnp.imag(x)


@jax.jit
def _unsqueeze0(x):
    return jnp.reshape(x, (1,))


@jax.jit
def _jit_conj(x):
    return jnp.conj(x)


def safe_conj(x):
    """Conjugate that never dispatches an *eager* complex op on a
    device array (UNIMPLEMENTED on the axon TPU backend): real arrays
    pass through, host arrays use numpy, device complex arrays go
    through one tiny compiled program (cached)."""
    if isinstance(x, jax.core.Tracer):
        return jnp.conj(x)
    if isinstance(x, jax.Array):
        if not jnp.iscomplexobj(x):
            return x
        return _jit_conj(x)
    return np.conj(x)


def maybe_host_scalar(x):
    """For terminal user-facing quantities: convert a *concrete* jax
    scalar to a host python/numpy scalar (TPU-safe for complex), but
    pass tracers through untouched so the function stays jittable."""
    if isinstance(x, jax.core.Tracer) or not isinstance(x, jax.Array):
        return x
    return to_host(x).item()
