"""Shared belief-propagation machinery (reference
``BeliefPropagationCommon`` bp_common.py:16: damping, update schedules,
convergence via max message difference)."""

import jax.numpy as jnp
import numpy as np


def _distance(ma, mb):
    """Max-abs difference of two (normalized) messages."""
    return float(jnp.max(jnp.abs(ma - mb)))


def normalize_message(m):
    nrm = jnp.sum(jnp.abs(m))
    return jnp.where(nrm > 0, m / nrm, m)


def initialize_messages(tn, dtype=None):
    """Uniform initial messages: for every (tensor tid, index) pair a
    ones-vector over that index."""
    messages = {}
    for ix, tids in tn.ind_map.items():
        if len(tids) < 2:
            continue
        d = tn.ind_size(ix)
        for tid in tids:
            m = jnp.ones((d,), dtype=dtype or str(tn.dtype))
            messages[ix, tid] = m / d
    return messages


class BeliefPropagationCommon:
    """Base: run the iteration loop with damping and convergence
    checking."""

    def __init__(self, tn, damping=0.0, update="sequential",
                 tol=5e-6, max_iterations=1000):
        self.tn = tn
        self.damping = damping
        self.update = update
        self.tol = tol
        self.max_iterations = max_iterations
        self.n_iter = 0
        self.converged = False

    def iterate(self, tol=None):
        raise NotImplementedError

    def run(self, max_iterations=None, tol=None, progbar=False):
        max_iterations = max_iterations or self.max_iterations
        tol = tol or self.tol
        for _ in range(max_iterations):
            max_dm = self.iterate(tol=tol)
            self.n_iter += 1
            if max_dm < tol:
                self.converged = True
                break
        return self
