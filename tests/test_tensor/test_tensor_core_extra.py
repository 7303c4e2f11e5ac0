"""Further Tensor / TensorNetwork behavior tests, expanding coverage
toward the reference suite (tests/test_tensor/test_tensor_core.py):
index-surgery methods (new_ind_with_identity / new_ind_pair_* /
cut_bond / drape_bond_between), bond gauging and balancing
(insert_gauge, balance_bonds, canonize_around), operator insertion,
bond expansion, spectra (singular_values / entropy / idxmin / idxmax),
and direct products / network sums."""

import numpy as np
import pytest

import quimb_tpu as qu
import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.core import (
    Tensor,
    TensorNetwork,
    bonds,
    tensor_direct_product,
)


def rt(shape, inds, tags=None, seed=0):
    rng = np.random.default_rng(seed)
    return Tensor(rng.standard_normal(shape), inds=inds, tags=tags)


def norm2(tn):
    """<tn|tn> as a real scalar."""
    return complex(np.asarray((tn.H & tn).contract())).real


class TestTensorIndexSurgery:
    def test_new_ind_with_identity(self):
        t = rt((2, 2), ("a", "b"))
        t.new_ind_with_identity("z", ("a",), ("b",))
        assert t.shape == (2, 2, 2)
        assert t.inds == ("z", "a", "b")
        # slot 0 keeps the original data, slot 1 is the identity
        d = np.asarray(t.data)
        assert np.allclose(d[0], np.asarray(rt((2, 2), ("a", "b")).data))
        assert np.allclose(d[1], np.eye(2))

    def test_new_ind_with_identity_multi_ind(self):
        t = rt((2, 3, 2, 3), ("a", "b", "c", "d"), seed=7)
        t.new_ind_with_identity("z", ("a", "b"), ("c", "d"), axis=2)
        assert t.inds == ("a", "b", "z", "c", "d")
        d = np.asarray(t.data)
        ident = np.eye(6).reshape(2, 3, 2, 3)
        assert np.allclose(d[:, :, 1, :, :], ident)

    def test_new_ind_pair_with_identity(self):
        t = rt((2, 2), ("a", "b"), seed=1)
        t2 = t.new_ind_pair_with_identity("u", "v", 3)
        assert t2.inds == ("u", "v", "a", "b")
        d = np.asarray(t2.data)
        assert np.allclose(d[1, 1], np.asarray(t.data))
        assert np.allclose(d[0, 1], 0.0)
        # original untouched (not inplace)
        assert t.ndim == 2

    def test_new_ind_pair_diag(self):
        t = rt((2, 3, 4), "abc", seed=2)
        t2 = t.new_ind_pair_diag("b", "x", "y")
        # pair inserted at the position of the old index
        assert t2.inds == ("a", "x", "y", "c")
        d = np.asarray(t2.data)
        t0 = np.asarray(t.data)
        for i in range(3):
            assert np.allclose(d[:, i, i, :], t0[:, i, :])
        assert np.allclose(d[:, 0, 1, :], 0.0)

    def test_new_ind_pair_diag_contract_back(self):
        # tracing the new pair against a delta sums the diagonal,
        # i.e. sums the original tensor over the expanded index
        t = rt((2, 3), ("a", "b"), seed=3)
        t2 = t.new_ind_pair_diag("b", "x", "y")
        delta = Tensor(np.eye(3), inds=("x", "y"))
        back = (t2 & delta).contract(output_inds=("a",))
        assert np.allclose(
            np.asarray(back.data), np.asarray(t.data).sum(1)
        )


class TestTensorSpectra:
    def test_singular_values_bell(self):
        psi = np.zeros((2, 2))
        psi[0, 0] = psi[1, 1] = 2**-0.5
        t = Tensor(psi, inds=("a", "b"))
        s = np.sort(np.abs(np.asarray(t.singular_values(("a",)))))[::-1]
        assert np.allclose(s[:2], [2**-0.5, 2**-0.5], atol=1e-10)

    @pytest.mark.parametrize("method", ["svd", "eig"])
    def test_entropy_bell_is_one(self, method):
        psi = np.zeros((2, 2))
        psi[0, 0] = psi[1, 1] = 2**-0.5
        t = Tensor(psi, inds=("a", "b"))
        assert float(t.entropy(("a",), method=method)) == pytest.approx(
            1.0, abs=1e-8
        )

    def test_entropy_product_state_is_zero(self):
        psi = np.zeros((2, 2))
        psi[0, 0] = 1.0
        t = Tensor(psi, inds=("a", "b"))
        assert float(t.entropy(("a",))) == pytest.approx(0.0, abs=1e-8)

    def test_idxmin_idxmax(self):
        t = rt((3, 4), ("i", "j"), seed=3)
        d = np.asarray(t.data)
        mx = t.idxmax()
        assert d[mx["i"], mx["j"]] == d.max()
        mn = t.idxmin(f="abs")
        assert np.abs(d)[mn["i"], mn["j"]] == np.abs(d).min()

    def test_idxmax_callable(self):
        t = rt((3, 4), ("i", "j"), seed=4)
        d = np.asarray(t.data)
        mx = t.idxmax(f=lambda x: -x)
        assert d[mx["i"], mx["j"]] == d.min()


class TestDirectProduct:
    def test_direct_product_matches_sum_of_contractions(self):
        # (a1 @ b1) + (a2 @ b2) == (a1 (+) a2) @ (b1 (+) b2)
        a1 = rt((3, 4), ("x", "b"), seed=1)
        b1 = rt((4, 2), ("b", "y"), seed=2)
        a2 = rt((3, 4), ("x", "b"), seed=3)
        b2 = rt((4, 2), ("b", "y"), seed=4)
        lhs = np.asarray((a1 @ b1).data) + np.asarray((a2 @ b2).data)
        A = tensor_direct_product(a1, a2, sum_inds=("x",))
        B = tensor_direct_product(b1, b2, sum_inds=("y",))
        assert A.ind_size("b") == 8
        rhs = np.asarray((A @ B).data)
        assert np.allclose(lhs, rhs, atol=1e-10)

    def test_tensor_network_sum_requires_matching_inds(self):
        # random MPS pairs have different bond names — exact-ind sum
        # refuses them, pointing at the site-structure variant
        mpsa = qtn.MPS_rand_state(5, 3, seed=0)
        mpsb = qtn.MPS_rand_state(5, 4, seed=1)
        with pytest.raises(ValueError, match="matching"):
            qtn.tensor_network_sum(mpsa, mpsb)

    def test_mps_direct_sum_value(self):
        mpsa = qtn.MPS_rand_state(5, 3, seed=0)
        mpsb = qtn.MPS_rand_state(5, 4, seed=1)
        dense = np.asarray(mpsa.to_dense()) + np.asarray(
            mpsb.to_dense()
        )
        s = mpsa + mpsb
        assert np.allclose(np.asarray(s.to_dense()), dense, atol=1e-10)


class TestNetworkGauging:
    def test_balance_bonds_preserves_value(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        v0 = norm2(mps)
        tn = mps.copy()
        tn.balance_bonds_()
        assert norm2(tn) == pytest.approx(v0, rel=1e-9)

    def test_tensor_balance_bond_balances_column_norms(self):
        from quimb_tpu.tensor.core import tensor_balance_bond

        t1 = rt((4, 3), ("a", "b"), seed=1)
        t2 = rt((3, 5), ("b", "c"), seed=2)
        v = np.asarray((t1 @ t2).data)
        tensor_balance_bond(t1, t2)
        # value preserved
        assert np.allclose(np.asarray((t1 @ t2).data), v, atol=1e-10)
        # column norms along the single balanced bond agree
        d1 = np.asarray(t1.data)
        d2 = np.asarray(t2.data)
        n1 = np.sqrt((d1**2).sum(0))
        n2 = np.sqrt((d2**2).sum(1))
        assert np.allclose(n1, n2, rtol=1e-4)

    def test_canonize_around_value_and_isometry(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        v0 = norm2(mps)
        tn = mps.copy().canonize_around_("I3")
        assert norm2(tn) == pytest.approx(v0, rel=1e-9)
        # everything canonized toward site 3: its local norm holds it all
        assert float(tn["I3"].norm()) ** 2 == pytest.approx(
            v0, rel=1e-6
        )

    def test_canonize_around_max_distance(self):
        mps = qtn.MPS_rand_state(8, 4, seed=5)
        v0 = norm2(mps)
        tn = mps.copy().canonize_around_("I4", max_distance=2)
        assert norm2(tn) == pytest.approx(v0, rel=1e-9)

    def test_insert_gauge_preserves_value(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        v0 = norm2(mps)
        tn = mps.copy()
        U = (np.random.default_rng(5).standard_normal((5, 5))
             + 2 * np.eye(5))
        tn.insert_gauge(U, "I2", "I3")
        assert norm2(tn) == pytest.approx(v0, rel=1e-8)
        # and the tensors themselves did change
        assert not np.allclose(
            np.asarray(tn["I2"].data), np.asarray(mps["I2"].data)
        )

    def test_insert_gauge_with_explicit_inverse(self):
        mps = qtn.MPS_rand_state(4, 3, seed=7)
        v0 = norm2(mps)
        rng = np.random.default_rng(0)
        U = rng.standard_normal((3, 3)) + 3 * np.eye(3)
        Uinv = np.linalg.inv(U)
        tn = mps.copy()
        tn.insert_gauge(U, "I1", "I2", Uinv=Uinv)
        assert norm2(tn) == pytest.approx(v0, rel=1e-9)


class TestNetworkSurgery:
    def test_insert_operator(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        v0 = norm2(mps)
        tn = mps.copy()
        # the I2-I3 bond of MPS(6, chi=5) has full dimension 5
        tn.insert_operator_(np.eye(5), "I2", "I3", tags="OP")
        assert tn.num_tensors == 7
        assert "OP" in tn.tags
        assert norm2(tn) == pytest.approx(v0, rel=1e-9)

    def test_insert_operator_wrong_dim_raises(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        with pytest.raises(ValueError):
            mps.copy().insert_operator_(np.eye(3), "I2", "I3")

    def test_cut_bond(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        tn = mps.copy()
        (b,) = bonds(tn["I2"], tn["I3"])
        lix, rix = tn.cut_bond(b, "L", "R")
        assert (lix, rix) == ("L", "R")
        assert "L" in tn["I2"].inds
        assert "R" in tn["I3"].inds
        assert b not in tn.all_inds()
        # re-joining the cut ends with a delta restores the norm
        delta = Tensor(np.eye(5), inds=("L", "R"))
        tn2 = tn.copy()
        tn2 |= delta
        assert norm2(tn2) == pytest.approx(norm2(mps), rel=1e-9)

    def test_cut_bond_autonames(self):
        mps = qtn.MPS_rand_state(4, 3, seed=2)
        tn = mps.copy()
        (b,) = bonds(tn["I1"], tn["I2"])
        lix, rix = tn.cut_bond(b)
        assert lix != rix
        assert lix in tn["I1"].inds
        assert rix in tn["I2"].inds

    def test_drape_bond_between(self):
        tna = TensorNetwork([
            rt((2, 3), ("k", "ab"), tags="A", seed=1),
            rt((3, 2), ("ab", "q"), tags="B", seed=2),
            rt((4,), ("c",), tags="C", seed=3),
        ])
        v = np.asarray(
            tna.contract(output_inds=("k", "q", "c")).data
        )
        tnd = tna.drape_bond_between("A", "B", "C")
        # target picked up the two new inds
        assert tnd["C"].ndim == 3
        # A and B are no longer directly connected
        assert not bonds(tnd["A"], tnd["B"])
        v2 = np.asarray(
            tnd.contract(output_inds=("k", "q", "c")).data
        )
        assert np.allclose(v, v2, atol=1e-10)

    def test_drape_bond_same_inds_raises(self):
        tna = TensorNetwork([
            rt((2, 3), ("k", "ab"), tags="A", seed=1),
            rt((3, 2), ("ab", "q"), tags="B", seed=2),
            rt((4,), ("c",), tags="C", seed=3),
        ])
        with pytest.raises(ValueError):
            tna.drape_bond_between(
                "A", "B", "C", left_ind="x", right_ind="x"
            )

    def test_expand_bond_dimension_generic_tn(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1)
        v0 = norm2(mps)
        tn = mps.copy().expand_bond_dimension(8)
        assert max(map(tn.ind_size, tn.inner_inds())) == 8
        assert norm2(tn) == pytest.approx(v0, rel=1e-9)

    def test_expand_bond_dimension_rand_strength(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1, dtype="float64")
        tn = mps.copy().expand_bond_dimension(8, rand_strength=1e-9)
        assert max(map(tn.ind_size, tn.inner_inds())) == 8
        # noise is tiny: value preserved to ~rand_strength
        assert norm2(tn) == pytest.approx(norm2(mps), rel=1e-6)


class TestMiscTensorOps:
    def test_rand_reduce_value(self):
        t = rt((2, 3, 4), "abc", seed=9)
        t2 = t.copy()
        t2.rand_reduce_("b")
        assert t2.inds == ("a", "c")

    def test_vector_reduce_matches_manual(self):
        t = rt((2, 3), ("a", "b"), seed=10)
        v = np.arange(3.0)
        t2 = t.vector_reduce("b", v)
        assert t2.inds == ("a",)
        assert np.allclose(
            np.asarray(t2.data), np.asarray(t.data) @ v
        )

    def test_sum_reduce(self):
        t = rt((2, 3), ("a", "b"), seed=11)
        t2 = t.sum_reduce("a")
        assert t2.inds == ("b",)
        assert np.allclose(
            np.asarray(t2.data), np.asarray(t.data).sum(0)
        )

    def test_multiply_spread_preserves_value(self):
        mps = qtn.MPS_rand_state(5, 3, seed=0)
        v = mps.to_dense()
        tn = mps.copy().multiply(3.0, spread_over=4)
        assert np.allclose(
            np.asarray(tn.to_dense()), 3.0 * np.asarray(v), atol=1e-10
        )

    def test_multiply_negative_spread(self):
        mps = qtn.MPS_rand_state(5, 3, seed=0, dtype="float64")
        v = mps.to_dense()
        tn = mps.copy().multiply(-2.0, spread_over=3)
        assert np.allclose(
            np.asarray(tn.to_dense()), -2.0 * np.asarray(v), atol=1e-10
        )
