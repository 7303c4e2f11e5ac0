"""D1BP: dense 1-norm belief propagation on a closed tensor network
(reference ``d1bp.py``). Estimates contracted values (partition
functions / amplitudes) as products of local contractions."""

import jax.numpy as jnp
import numpy as np

from ...ops.contraction import array_contract
from .bp_common import (
    BeliefPropagationCommon,
    _distance,
    initialize_messages,
    normalize_message,
)


class D1BP(BeliefPropagationCommon):
    """Belief propagation with vector messages on each (index, tensor)
    pair of a closed TN (hyper indices supported)."""

    def __init__(self, tn, messages=None, damping=0.0, update="sequential",
                 tol=5e-6, max_iterations=1000, local_convergence=True):
        super().__init__(tn, damping=damping, update=update, tol=tol,
                         max_iterations=max_iterations)
        self.messages = messages if messages is not None else \
            initialize_messages(tn)
        self.exponent = 0.0

    def _compute_outgoing(self, tid, ix):
        """Message from tensor ``tid`` along index ``ix``: contract the
        tensor with all incoming messages on its other indices."""
        t = self.tn.tensor_map[tid]
        arrays = [t.data]
        inputs = [t.inds]
        for ox in t.inds:
            if ox == ix:
                continue
            # incoming messages on ox from all OTHER tensors holding ox
            for otid in self.tn.ind_map[ox]:
                if otid != tid:
                    arrays.append(self.messages[ox, otid])
                    inputs.append((ox,))
        out = array_contract(arrays, inputs, output=(ix,))
        return normalize_message(out)

    def iterate(self, tol=5e-6):
        max_dm = 0.0
        new = {}
        for (ix, tid) in self.messages:
            # message TO index slot (ix, received-by-other) is produced
            # by tid: key convention messages[ix, tid] = message sent
            # BY tid along ix
            m_new = self._compute_outgoing(tid, ix)
            if self.damping:
                m_new = (1 - self.damping) * m_new + \
                    self.damping * self.messages[ix, tid]
                m_new = normalize_message(m_new)
            if self.update == "sequential":
                max_dm = max(
                    max_dm, _distance(m_new, self.messages[ix, tid])
                )
                self.messages[ix, tid] = m_new
            else:
                new[ix, tid] = m_new
        if self.update != "sequential":
            for k, m in new.items():
                max_dm = max(max_dm, _distance(m, self.messages[k]))
            self.messages.update(new)
        return max_dm

    def local_tensor_contraction(self, tid):
        """Z_t: tensor contracted with all its incoming messages."""
        t = self.tn.tensor_map[tid]
        arrays = [t.data]
        inputs = [t.inds]
        for ox in t.inds:
            for otid in self.tn.ind_map[ox]:
                if otid != tid:
                    arrays.append(self.messages[ox, otid])
                    inputs.append((ox,))
        return array_contract(arrays, inputs, output=())

    def local_index_contraction(self, ix):
        """Z_ix: product of all messages meeting at index ix."""
        tids = tuple(self.tn.ind_map[ix])
        arrays = [self.messages[ix, tid] for tid in tids]
        inputs = [(ix,) for _ in tids]
        return array_contract(arrays, inputs, output=())

    def contract(self, strip_exponent=False):
        """BP estimate of the full contraction:
        Z = prod_t Z_t / prod_ix Z_ix (reference d1bp contract)."""
        mantissa = 1.0
        exponent = 0.0
        for tid in self.tn.tensor_map:
            zt = complex(self.local_tensor_contraction(tid))
            if zt != 0:
                exponent += np.log10(abs(zt))
                mantissa *= zt / abs(zt)
        for ix, tids in self.tn.ind_map.items():
            if len(tids) < 2:
                continue
            # Bethe free energy: index of degree d contributes
            # Z_ix^-(d-1)
            zix = complex(self.local_index_contraction(ix))
            if zix != 0:
                dm1 = len(tids) - 1
                exponent -= dm1 * np.log10(abs(zix))
                mantissa /= (zix / abs(zix)) ** dm1
        if strip_exponent:
            return mantissa, exponent
        return mantissa * 10**exponent


def contract_d1bp(tn, max_iterations=1000, tol=5e-6, damping=0.0,
                  strip_exponent=False, **kwargs):
    """Estimate a TN's contraction via D1BP."""
    bp = D1BP(tn, damping=damping, tol=tol,
              max_iterations=max_iterations, **kwargs)
    bp.run()
    return bp.contract(strip_exponent=strip_exponent)


def contract_hd1bp(tn, messages=None, max_iterations=1000, tol=5e-6,
                   damping=0.0, strip_exponent=False, **kwargs):
    """Hyper-index 1-norm BP contraction estimate (reference
    ``contract_hd1bp`` hd1bp.py:443 — the D1BP here is natively
    hyper-index aware)."""
    bp = D1BP(tn, messages=messages, damping=damping,
              max_iterations=max_iterations, tol=tol, **kwargs)
    bp.run()
    return bp.contract(strip_exponent=strip_exponent)


def _d1bp_marginal(bp, ix):
    """Unnormalized marginal over index ``ix``: product of the
    outgoing messages from every tensor holding it."""
    import jax.numpy as jnp

    tids = tuple(bp.tn.ind_map[ix])
    m = None
    for tid in tids:
        out = bp._compute_outgoing(tid, ix)
        m = out if m is None else m * out
    p = jnp.clip(jnp.real(m), 0.0, None)
    return p / jnp.sum(p)


def sample_hd1bp(tn, messages=None, output_inds=None, max_iterations=1000,
                 tol=1e-2, damping=0.0, seed=None, bias=None,
                 progbar=False, **kwargs):
    """Sample a configuration of ``output_inds`` using hyper 1-norm BP
    marginals, fixing the most decided index each round and re-running
    BP (reference ``sample_hd1bp`` hd1bp.py:604).

    Returns
    -------
    config : dict[str, int]
        The sampled value of each index.
    tn_config : TensorNetwork
        The network with the sampled indices fixed.
    omega : float
        The probability the sampler assigned to this configuration.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    tn = tn.copy()
    if output_inds is None:
        # default: sample every index (for a closed hyper TN each
        # index is one classical variable)
        output_inds = set(tn.ind_map)
    remaining = set(output_inds)
    config = {}
    omega = 1.0

    while remaining:
        bp = D1BP(tn, damping=damping, max_iterations=max_iterations,
                  tol=tol, **kwargs)
        bp.run()
        marginals = {ix: _d1bp_marginal(bp, ix) for ix in remaining}
        # fix the most decided index
        ix, p = max(
            marginals.items(), key=lambda kv: float(jnp_max(kv[1]))
        )
        p = np.asarray(p, dtype=float)
        if bias is not None:
            p = p**bias
            p = p / p.sum()
        v = int(rng.choice(p.size, p=p))
        config[ix] = v
        omega *= float(p[v])
        tn.isel_({ix: v})
        remaining.discard(ix)
    return config, tn, omega


def jnp_max(x):
    import jax.numpy as jnp

    return jnp.max(x)
