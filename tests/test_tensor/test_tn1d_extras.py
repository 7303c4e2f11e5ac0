"""Dense1D / SuperOperator1D / 1D helper behavior tests (reference
tests/test_tensor/test_tn1d/test_core.py TestDense1D and the
SuperOperator1D constructor semantics, tn1d/core.py:4467,4538)."""

import numpy as np
import pytest

import quimb_tpu as qu
import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.tn1d import Dense1D, SuperOperator1D


def ip(a, b):
    """<a|b> as complex for two TNs with matching outer inds."""
    return complex(np.asarray((a.H & b).contract()))


class TestDense1D:
    def test_simple(self):
        n = 6
        d_psi = qu.computational_state("0" * n)
        t_psi = Dense1D(d_psi)
        assert set(t_psi.outer_inds()) == {f"k{i}" for i in range(n)}
        assert set(t_psi.tags) == {f"I{i}" for i in range(n)}
        # |0...0> is a Z=+1 eigenstate on every site
        for i in range(n):
            assert ip(t_psi, t_psi.gate(qu.pauli("Z"), i)).real == \
                pytest.approx(1.0)
        # rotate every site to |+>
        for i in range(n):
            t_psi.gate_(qu.hadamard(), i)
        assert len(t_psi.tensors) == n + 1
        assert ip(t_psi, t_psi).real == pytest.approx(1.0)
        for i in range(n):
            assert ip(t_psi, t_psi.gate(qu.pauli("X"), i)).real == \
                pytest.approx(1.0)

    def test_rand(self):
        t_psi = Dense1D.rand(7, dtype="complex64")
        assert t_psi.shape == (2,) * 7
        assert "complex" in str(t_psi.dtype)
        assert ip(t_psi, t_psi).real == pytest.approx(1.0, abs=1e-5)

    def test_matches_mps_from_same_dense(self):
        rng = np.random.default_rng(0)
        v = rng.standard_normal(2**5)
        v /= np.linalg.norm(v)
        td = Dense1D(v)
        mps = qtn.MPS_from_dense(v) if hasattr(qtn, "MPS_from_dense") \
            else qtn.MatrixProductState.from_dense(v, dims=[2] * 5)
        ov = ip(td, mps)
        assert abs(ov) == pytest.approx(1.0, abs=1e-8)

    def test_gate_contract_modes(self):
        d_psi = qu.rand_ket(2**4)
        t_psi = Dense1D(np.asarray(d_psi).reshape(-1))
        # lazy gate leaves an extra tensor; contract=True merges it
        g = t_psi.gate(qu.pauli("Y"), 2)
        assert len(g.tensors) == 2
        gc = t_psi.gate(qu.pauli("Y"), 2, contract=True)
        assert len(gc.tensors) == 1
        assert ip(g, gc).real == pytest.approx(1.0, abs=1e-6)


class TestSuperOperator1D:
    def test_rand_structure(self):
        so = SuperOperator1D.rand(4, bond_dim=3, seed=0)
        assert so._L == 4
        # four physical inds per site: kn / k / b / bn
        for i in range(4):
            t = so[so.site_tag(i)]
            for pref in ("kn", "k", "b", "bn"):
                assert f"{pref}{i}" in t.inds
        # bulk sites also carry two bonds -> ndim 6
        assert so[so.site_tag(1)].ndim == 6
        assert so[so.site_tag(0)].ndim == 5

    def test_shape_string_layouts(self):
        # explicitly built arrays in the documented 'lrkudb' layout
        L = 3
        D = 2
        arrays = []
        rng = np.random.default_rng(1)
        for i in range(L):
            shp = []
            if i > 0:
                shp.append(D)
            if i < L - 1:
                shp.append(D)
            shp += [2, 2, 2, 2]
            arrays.append(rng.standard_normal(shp))
        so = SuperOperator1D(arrays)
        assert so._L == L
        assert set(so.outer_inds()) == {
            f"{p}{i}" for p in ("kn", "k", "b", "bn") for i in range(L)
        }

    def test_acts_as_superoperator_on_rho(self):
        # contract inner inds with a vectorized density matrix and
        # check the result is the matching dense linear action
        L = 2
        rng = np.random.default_rng(3)
        arrays = []
        for i in range(L):
            shp = ([2] if i > 0 else []) + ([2] if i < L - 1 else []) \
                + [2, 2, 2, 2]
            arrays.append(rng.standard_normal(shp))
        so = SuperOperator1D(arrays)

        rho = rng.standard_normal((2**L, 2**L))
        t_rho = qtn.Tensor(
            rho.reshape(2, 2, 2, 2),
            inds=("k0", "k1", "b0", "b1"),
        )
        out = (so & t_rho).contract(
            output_inds=("kn0", "kn1", "bn0", "bn1")
        )
        # dense superoperator: group (kn b n) etc.
        dense = so.to_dense(
            ("kn0", "kn1", "bn0", "bn1"), ("k0", "k1", "b0", "b1")
        )
        expect = np.asarray(dense) @ rho.reshape(-1)
        assert np.allclose(
            np.asarray(out.data).reshape(-1), expect, atol=1e-10
        )


class TestHelpers1D:
    def test_gate_TN_1D_multisite(self):
        mps = qtn.MPS_rand_state(5, 4, seed=0)
        G = np.asarray(qu.CNOT())
        g = qtn.gate_TN_1D(mps, G, (1, 2), contract="swap+split")
        dense0 = np.asarray(mps.to_dense()).reshape(-1)
        import quimb_tpu as _qu

        U = np.asarray(_qu.ikron(G, [2] * 5, (1, 2)))
        assert np.allclose(
            np.asarray(g.to_dense()).reshape(-1), U @ dense0,
            atol=1e-8,
        )

    def test_expec_TN_1D(self):
        mps = qtn.MPS_rand_state(5, 4, seed=1)
        H = qtn.MPO_ham_heis(5)
        e1 = complex(np.asarray(
            qtn.expec_TN_1D(mps.H, H.apply(mps))
        )).real
        psi = np.asarray(mps.to_dense()).reshape(-1)
        Hd = np.asarray(H.to_dense())
        e2 = (psi.conj() @ (Hd @ psi)).real
        assert e1 == pytest.approx(e2, rel=1e-8)
