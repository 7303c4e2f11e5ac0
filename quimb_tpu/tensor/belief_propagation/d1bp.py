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
