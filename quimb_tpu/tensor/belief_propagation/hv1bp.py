"""HV1BP: hyper, vectorized 1-norm belief propagation
(reference ``hv1bp.py``, 1193 LoC — batches all same-shape message
updates into single array ops).

TPU-native: tensors are grouped by (rank, shape) signature; each group's
message updates run as ONE batched einsum via ``jax.vmap`` — the batch
dimension maps onto the VPU/MXU lanes. This is the BP engine for
networks of many small tensors (classical partition functions, random
regular graphs, #SAT counting HTNs).
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np

from .bp_common import BeliefPropagationCommon


class HV1BP(BeliefPropagationCommon):
    """Vectorized 1-norm BP with batched message updates."""

    def __init__(self, tn, messages=None, damping=0.0, smudge_factor=1e-12,
                 update="parallel", tol=5e-6, max_iterations=1000):
        super().__init__(tn, damping=damping, update=update, tol=tol,
                         max_iterations=max_iterations)
        self.smudge_factor = smudge_factor
        self._build_batches(messages)

    def _build_batches(self, messages):
        tn = self.tn
        # slot list: (tid, ix, leg-position)
        # message m[tid, ix] = message sent by tensor tid along ix.
        # incoming to (tid, ix) = product of m[otid, ix] over others.
        self.slots = []  # global list of (tid, ix)
        slot_id = {}
        for ix, tids in tn.ind_map.items():
            if len(tids) < 2:
                continue
            for tid in tids:
                slot_id[(tid, ix)] = len(self.slots)
                self.slots.append((tid, ix))
        self.slot_id = slot_id

        d_check = {tn.ind_size(ix) for (_, ix) in self.slots}
        if len(d_check) > 1:
            raise ValueError(
                "HV1BP requires uniform bond dimension; use D1BP"
            )
        self.d = d_check.pop() if d_check else 1
        n_slots = len(self.slots)

        # incoming product structure: for slot s=(tid, ix), the incoming
        # message = prod over other tids on ix. We precompute, for each
        # slot, the list of source slots.
        self.sources = [
            [slot_id[(otid, ix)] for otid in tn.ind_map[ix]
             if otid != tid]
            for (tid, ix) in self.slots
        ]
        max_src = max((len(s) for s in self.sources), default=1)
        src_idx = np.zeros((n_slots, max_src), dtype=np.int32)
        src_mask = np.zeros((n_slots, max_src), dtype=bool)
        for k, s in enumerate(self.sources):
            for m, v in enumerate(s):
                src_idx[k, m] = v
                src_mask[k, m] = True
        self.src_idx = jnp.asarray(src_idx)
        self.src_mask = jnp.asarray(src_mask)

        # group tensors by index signature for batched updates
        groups = collections.defaultdict(list)
        for tid, t in tn.tensor_map.items():
            key = t.shape
            groups[key].append(tid)
        self.groups = []
        for shape, tids in groups.items():
            stack = jnp.stack([tn.tensor_map[t].data for t in tids])
            # for each leg position, output slot ids and input slot ids
            r = len(shape)
            out_slots = np.full((len(tids), r), -1, dtype=np.int32)
            in_slots = np.full((len(tids), r), -1, dtype=np.int32)
            for bi, tid in enumerate(tids):
                t = tn.tensor_map[tid]
                for li, ix in enumerate(t.inds):
                    sid = slot_id.get((tid, ix))
                    if sid is not None:
                        out_slots[bi, li] = sid
                        in_slots[bi, li] = sid
            self.groups.append({
                "shape": shape,
                "tids": tids,
                "stack": stack,
                "slots": jnp.asarray(out_slots),
            })

        dtype = str(tn.dtype)
        if messages is None:
            M = jnp.ones((n_slots, self.d), dtype=dtype) / self.d
        else:
            M = jnp.stack([
                messages[ix, tid] for (tid, ix) in self.slots
            ])
        self.M = M

    def _incoming(self, M):
        """Incoming message for every slot: product over source slots
        (batched gather + masked product)."""
        src = M[self.src_idx]  # (n_slots, max_src, d)
        src = jnp.where(self.src_mask[..., None], src, 1.0)
        return jnp.prod(src, axis=1)

    def iterate(self, tol=5e-6):
        M = self.M
        inc = self._incoming(M)  # (n_slots, d)
        new_M = M
        for g in self.groups:
            stack = g["stack"]  # (B, *shape)
            slots = g["slots"]  # (B, r)
            r = len(g["shape"])
            if r == 0 or len(g["tids"]) == 0:
                # rank-0 tensors (e.g. fully-fixed clauses during
                # sampling) emit no messages
                continue
            # incoming messages per leg: (B, r, d)
            inc_g = inc[slots]

            def update_one(tdata, incs):
                outs = []
                for li in range(r):
                    # contract tensor with incoming on all legs != li
                    x = tdata
                    for lj in range(r):
                        if lj == li:
                            continue
                        shape_b = [1] * r
                        shape_b[lj] = -1
                        x = x * jnp.reshape(incs[lj], shape_b)
                    axes = tuple(k for k in range(r) if k != li)
                    out = jnp.sum(x, axis=axes)
                    nrm = jnp.sum(jnp.abs(out))
                    out = jnp.where(nrm > 0, out / nrm, out)
                    outs.append(out)
                return jnp.stack(outs)  # (r, d)

            outs = jax.vmap(update_one)(stack, inc_g)  # (B, r, d)
            flat_slots = jnp.reshape(slots, (-1,))
            flat_outs = jnp.reshape(outs, (-1, self.d))
            valid = flat_slots >= 0
            new_M = new_M.at[
                jnp.where(valid, flat_slots, 0)
            ].set(jnp.where(valid[:, None], flat_outs,
                            new_M[jnp.where(valid, flat_slots, 0)]))
        if self.damping:
            new_M = (1 - self.damping) * new_M + self.damping * M
            new_M = new_M / jnp.sum(jnp.abs(new_M), axis=1,
                                    keepdims=True)
        max_dm = float(jnp.max(jnp.abs(new_M - M)))
        self.M = new_M
        return max_dm

    def get_messages(self):
        return {
            (ix, tid): self.M[k]
            for k, (tid, ix) in enumerate(self.slots)
        }

    def contract(self, strip_exponent=False):
        """Bethe estimate (same formula as D1BP, computed batched)."""
        inc = self._incoming(self.M)
        mantissa, exponent = 1.0, 0.0
        for g in self.groups:
            stack = g["stack"]
            slots = g["slots"]
            r = len(g["shape"])
            inc_g = inc[slots]

            def local_z(tdata, incs):
                x = tdata
                for lj in range(r):
                    shape_b = [1] * r
                    shape_b[lj] = -1
                    x = x * jnp.reshape(incs[lj], shape_b)
                return jnp.sum(x)

            zs = jax.vmap(local_z)(stack, inc_g)
            zs_np = np.asarray(zs)
            for z in zs_np:
                z = complex(z)
                if z != 0:
                    exponent += np.log10(abs(z))
                    mantissa *= z / abs(z)
        # index corrections
        done = set()
        M_np = self.M
        for k, (tid, ix) in enumerate(self.slots):
            if ix in done:
                continue
            done.add(ix)
            tids = tuple(self.tn.ind_map[ix])
            prod = jnp.ones((self.d,), dtype=self.M.dtype)
            for otid in tids:
                prod = prod * self.M[self.slot_id[(otid, ix)]]
            zix = complex(jnp.sum(prod))
            if zix != 0:
                dm1 = len(tids) - 1
                exponent -= dm1 * np.log10(abs(zix))
                mantissa /= (zix / abs(zix)) ** dm1
        if strip_exponent:
            return mantissa, exponent
        return mantissa * 10**exponent


def contract_hv1bp(tn, max_iterations=1000, tol=5e-6, damping=0.0,
                   strip_exponent=False, **kwargs):
    """Estimate a TN contraction via vectorized BP."""
    bp = HV1BP(tn, damping=damping, tol=tol,
               max_iterations=max_iterations, **kwargs)
    bp.run()
    return bp.contract(strip_exponent=strip_exponent)


def sample_hv1bp(tn, messages=None, output_inds=None,
                 max_iterations=1000, tol=1e-2, damping=0.0, seed=None,
                 bias=None, progbar=False, **kwargs):
    """Sample a configuration using vectorized hyper 1-norm BP
    (reference ``sample_hv1bp`` hv1bp.py:1012): converge batched
    messages, fix the most decided variable index, repeat. Returns
    ``(config, tn_config, omega)``."""
    import numpy as np

    from .d1bp import D1BP, _d1bp_marginal

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
        from .bp_common import initialize_messages

        if initialize_messages(tn):
            bp = HV1BP(tn, messages=messages, damping=damping,
                       max_iterations=max_iterations, tol=tol,
                       **kwargs)
            bp.run()
            msgs = bp.get_messages()
        else:
            # nothing left to propagate: marginals are direct
            msgs = {}
        # unbatch the converged messages and reuse the (hyper-aware)
        # scalar-message marginal machinery
        flat = D1BP(tn, messages=msgs)
        marginals = {
            ix: _d1bp_marginal(flat, ix) for ix in remaining
        }
        ix, p = max(
            marginals.items(),
            key=lambda kv: float(jnp.max(kv[1])),
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
        messages = None  # shapes changed, re-initialize
    return config, tn, omega
