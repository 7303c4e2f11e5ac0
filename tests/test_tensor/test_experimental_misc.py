"""Experimental misc sketches: CTMRG partition function and PEPS-DMRG
virtual operators (reference quimb/experimental/misc/
renormalization.py:10 and peps_dmrg.py:4,46,109,146)."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.experimental.misc import (
    classical_ising_T_A_C,
    ctmrg_partition_function,
    product_expectation_cluster,
    product_expectation_exact,
    virtual_bond_operator,
    virtual_site_operator,
)


class TestCTMRG:
    @pytest.mark.parametrize("L", [4, 6])
    def test_exact_small(self, L):
        beta = 0.3
        T, A, C = classical_ising_T_A_C(beta)
        Z = float(ctmrg_partition_function(T, A, C, L, max_bond=16))
        tn = qtn.TN2D_classical_ising_partition_function(
            L, L, beta=beta,
        )
        Zex = float(tn.contract(...))
        assert Z == pytest.approx(Zex, rel=1e-10)

    def test_strip_exponent(self):
        beta = 0.3
        T, A, C = classical_ising_T_A_C(beta)
        Z, ex = ctmrg_partition_function(
            T, A, C, 8, max_bond=16, strip_exponent=True,
        )
        tn = qtn.TN2D_classical_ising_partition_function(
            8, 8, beta=beta,
        )
        Zex = float(tn.contract(...))
        assert float(Z) * 10.0**ex == pytest.approx(Zex, rel=1e-8)

    def test_truncated_large(self):
        import math

        T, A, C = classical_ising_T_A_C(0.4)
        Z, ex = ctmrg_partition_function(
            T, A, C, 12, max_bond=8, strip_exponent=True,
        )
        tn = qtn.TN2D_classical_ising_partition_function(
            12, 12, beta=0.4,
        )
        lnZex = math.log(float(tn.contract(...)))
        lnZ = math.log(float(Z)) + ex * math.log(10)
        assert lnZ == pytest.approx(lnZex, rel=1e-6)

    def test_bad_L_raises(self):
        T, A, C = classical_ising_T_A_C(0.3)
        with pytest.raises(ValueError):
            ctmrg_partition_function(T, A, C, 5, max_bond=8)


class TestPEPSVirtualOperators:
    @pytest.fixture()
    def peps(self):
        return qtn.PEPS_rand(2, 3, 2, seed=1, dtype="float64")

    def test_product_expectation_exact_vs_dense(self, peps):
        Z = np.asarray([[1.0, 0.0], [0.0, -1.0]])
        ew = product_expectation_exact(
            peps, [Z, Z], [(0, 0), (0, 1)],
        )
        v = np.asarray(peps.to_dense()).reshape(-1)
        mats = [np.eye(2)] * 6
        mats[0] = Z
        full = mats[0]
        for m in mats[1:]:
            full = np.kron(full, m)
        mats2 = [np.eye(2)] * 6
        mats2[1] = Z
        full2 = mats2[0]
        for m in mats2[1:]:
            full2 = np.kron(full2, m)
        H = full @ full2
        want = float(v.conj() @ (H @ v) / (v.conj() @ v))
        assert complex(ew).real == pytest.approx(want, abs=1e-10)

    def test_cluster_expectation_converges(self, peps):
        Z = np.asarray([[1.0, 0.0], [0.0, -1.0]])
        e_full = complex(product_expectation_exact(
            peps, [Z, Z], [(0, 0), (0, 1)],
        )).real
        # max_distance large enough covers the whole 2x3 lattice
        e_md3 = complex(product_expectation_cluster(
            peps, [Z, Z], [(0, 0), (0, 1)], max_distance=3,
        )).real
        assert e_md3 == pytest.approx(e_full, abs=1e-8)
        # md=0 is an approximation but finite and sane
        e_md0 = complex(product_expectation_cluster(
            peps, [Z, Z], [(0, 0), (0, 1)], max_distance=0,
        )).real
        assert np.isfinite(e_md0)
        assert abs(e_md0) <= 1.0

    def test_virtual_bond_operator_glue(self, peps):
        """Gluing the cut bond back with identities on both layers
        reproduces <psi|psi>."""
        v = np.asarray(peps.to_dense()).reshape(-1)
        n2 = float(np.linalg.norm(v) ** 2)
        bond = next(iter(
            i for i, t in peps.ind_map.items() if len(t) == 2
        ))
        d = peps.ind_size(bond)
        X = np.asarray(virtual_bond_operator(peps, bond))
        X = X.reshape(d, d, d, d)
        glue = np.einsum("aabb->", X)
        assert glue == pytest.approx(n2, rel=1e-10)

    def test_virtual_site_operator_quadratic_form(self, peps):
        """<t| X |t> with the site's own tensor gives <psi|psi>."""
        v = np.asarray(peps.to_dense()).reshape(-1)
        n2 = float(np.linalg.norm(v) ** 2)
        (tid,) = peps._get_tids_from_tags(
            peps.site_tag((0, 0)), "all",
        )
        t = peps.tensor_map[tid]
        pind = peps.site_ind((0, 0))
        k_ix = tuple(ix for ix in t.inds if ix != pind)
        tv = np.asarray(t.transpose(*k_ix, pind).data).reshape(-1)
        X = np.asarray(virtual_site_operator(peps, (0, 0)))
        got = float(tv.conj() @ (X @ tv))
        assert got == pytest.approx(n2, rel=1e-10)
