"""Backend transfer shims.

The axon TPU backend cannot transfer complex arrays host<->device
(UNIMPLEMENTED); complex values are fine *on* device. These helpers
move complex data as two real planes and recombine, and are the single
choke-point every host<->device boundary in the framework goes
through."""

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
    if np.iscomplexobj(xa) and _needs_split():
        re = jnp.asarray(np.ascontiguousarray(xa.real))
        im = jnp.asarray(np.ascontiguousarray(xa.imag))
        return jax.lax.complex(re, im).astype(xa.dtype.name)
    return jnp.asarray(xa)


def to_host(x):
    """Device array -> numpy array, splitting complex transfers on
    backends that need it."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if jnp.iscomplexobj(x) and _needs_split():
        return np.asarray(x.real) + 1j * np.asarray(x.imag)
    return np.asarray(x)


def maybe_host_scalar(x):
    """For terminal user-facing quantities: convert a *concrete* jax
    scalar to a host python/numpy scalar (TPU-safe for complex), but
    pass tracers through untouched so the function stays jittable."""
    if isinstance(x, jax.core.Tracer) or not isinstance(x, jax.Array):
        return x
    return to_host(x).item()
