"""Backend transfer shims.

The axon TPU backend cannot transfer complex arrays host<->device
(UNIMPLEMENTED); complex values are fine *on* device. These helpers
move complex data as two real planes and recombine, and are the single
choke-point every host<->device boundary in the framework goes
through."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import on_tpu


def _needs_split():
    return on_tpu()


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
            re = jnp.asarray(np.ascontiguousarray(xa.real))
            im = jnp.asarray(np.ascontiguousarray(xa.imag))
            return _combine_complex0(re, im, xa.dtype.name)
        return _squeeze0(jnp.asarray(xa))
    if np.iscomplexobj(xa) and _needs_split():
        re = jnp.asarray(np.ascontiguousarray(xa.real))
        im = jnp.asarray(np.ascontiguousarray(xa.imag))
        # the combine must itself run compiled: eager lax.complex on
        # arrays is UNIMPLEMENTED on this TPU backend
        return _combine_complex(re, im, xa.dtype.name)
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
        # ops are UNIMPLEMENTED on this TPU backend
        re, im = _split_reim(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)


@jax.jit
def _split_reim(x):
    return jnp.real(x), jnp.imag(x)


def maybe_host_scalar(x):
    """For terminal user-facing quantities: convert a *concrete* jax
    scalar to a host python/numpy scalar (TPU-safe for complex), but
    pass tracers through untouched so the function stays jittable."""
    if isinstance(x, jax.core.Tracer) or not isinstance(x, jax.Array):
        return x
    return to_host(x).item()
