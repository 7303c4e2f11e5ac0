"""Further 2D TN behavior tests (reference
tests/test_tensor/test_tn2d/test_core.py strategy): PEPS construction
variants, addition, flattening, gating with tag propagation,
environment computation, normalization, and HOTRG/CTMRG on the exact
2D Ising partition function."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn


def A(x):
    return np.asarray(x)


def peps_dense(p):
    """Dense vector of a small PEPS."""
    return A(p.to_dense()).reshape(-1)


class TestPEPSConstruction:
    @pytest.mark.parametrize("Lx,Ly", [(2, 2), (2, 3), (3, 3)])
    def test_rand_structure(self, Lx, Ly):
        p = qtn.PEPS.rand(Lx, Ly, bond_dim=2, seed=0)
        assert p.num_tensors == Lx * Ly
        assert p.Lx == Lx and p.Ly == Ly
        # interior tensors have 4 bonds + 1 phys
        if Lx > 2 and Ly > 2:
            t = p[p.site_tag(1, 1)]
            assert t.ndim == 5

    def test_zeros_and_product_state(self):
        z = qtn.PEPS.zeros(2, 2, bond_dim=2)
        assert float(np.linalg.norm(peps_dense(z))) == 0.0
        arrays = [[np.array([1.0, 0.0]) for _ in range(2)]
                  for _ in range(2)]
        ps = qtn.PEPS.product_state(arrays)
        v = peps_dense(ps)
        assert abs(v[0]) == pytest.approx(1.0)
        assert np.linalg.norm(v[1:]) == pytest.approx(0.0, abs=1e-12)

    def test_add_peps(self):
        a = qtn.PEPS.rand(2, 3, bond_dim=2, seed=1)
        b = qtn.PEPS.rand(2, 3, bond_dim=3, seed=2)
        s = a.add_PEPS(b) if hasattr(a, "add_PEPS") else a + b
        assert np.allclose(
            peps_dense(s), peps_dense(a) + peps_dense(b), atol=1e-10
        )

    def test_flatten_norm_network(self):
        p = qtn.PEPS.rand(2, 2, bond_dim=2, seed=3)
        norm = p.H & p
        flat = norm.flatten() if hasattr(norm, "flatten") else None
        if flat is not None:
            # flattening squares the bond dimension
            assert flat.max_bond() <= 4
            v1 = complex(np.asarray(norm.contract())).real
            v2 = complex(np.asarray(flat.contract())).real
            assert v2 == pytest.approx(v1, rel=1e-9)


class TestGating2D:
    @pytest.mark.parametrize("contract", [False, True, "split",
                                          "reduce-split"])
    def test_gate_two_site_value(self, contract):
        import quimb_tpu as qu

        p = qtn.PEPS.rand(2, 3, bond_dim=2, seed=4)
        where = ((0, 1), (1, 1))
        # explicit index order so the dense comparison is unambiguous
        order = [p.site_ind(i, j) for i in range(2) for j in range(3)]
        kpos = [order.index(p.site_ind(*w)) for w in where]
        G = A(qu.CNOT()).reshape(2, 2, 2, 2)
        g = p.gate(G, where, contract=contract)
        got = A(g.to_dense(*[(ix,) for ix in order])).reshape(-1)
        # non-adjacent sites: pkron (permuted placement), not ikron
        U = A(qu.pkron(qu.CNOT(), [2] * 6, kpos))
        want = U @ A(p.to_dense(*[(ix,) for ix in order])).reshape(-1)
        assert np.allclose(got, want, atol=1e-8)

    def test_gate_propagate_tags(self):
        p = qtn.PEPS.rand(2, 2, bond_dim=2, seed=5)
        G = np.eye(4).reshape(2, 2, 2, 2)
        g = p.gate(G, ((0, 0), (0, 1)), contract=False,
                   tags="GATE")
        assert "GATE" in g.tags


class TestEnvironmentsAndNorm:
    def test_normalize_makes_norm_one(self):
        p = qtn.PEPS.rand(3, 3, bond_dim=2, seed=6)
        p.normalize_(max_bond=16)
        norm = complex(np.asarray((p.H & p).contract())).real
        assert norm == pytest.approx(1.0, rel=1e-6)

    def test_x_and_y_envs_consistent_with_exact(self):
        p = qtn.PEPS.rand(3, 3, bond_dim=2, seed=7)
        norm = complex(np.asarray((p.H & p).contract())).real
        for fn in ("compute_x_environments",
                   "compute_y_environments"):
            envs = getattr(p.H & p, fn, None)
            if envs is None:
                continue
            # environments reproduce the full norm when sandwiched:
            # just check they build without error and are TNs
            out = envs(max_bond=16)
            assert out

    def test_local_expectation_normalized_matches_dense(self):
        import quimb_tpu as qu

        p = qtn.PEPS.rand(3, 3, bond_dim=2, seed=8)
        terms = {((1, 1), (1, 2)): A(qu.ham_heis(2, sparse=False))}
        e = p.compute_local_expectation(
            terms, max_bond=16, normalized=True
        )
        psi = peps_dense(p)
        psi = psi / np.linalg.norm(psi)
        # site order: row-major (i, j) -> i*Ly + j
        H = A(qu.ikron(qu.ham_heis(2, sparse=False), [2] * 9, [4, 5]))
        want = float(np.real(psi.conj() @ (H @ psi)))
        assert complex(np.asarray(e)).real == pytest.approx(
            want, rel=1e-6
        )


class TestClassical2D:
    def test_ising_partition_function_hotrg_vs_exact(self):
        # small 2D classical Ising TN: HOTRG matches exact contraction
        beta = 0.4
        tn = qtn.TN2D_classical_ising_partition_function(
            4, 4, beta=beta
        )
        exact = complex(np.asarray(tn.contract())).real
        zh = tn.contract_hotrg(max_bond=16)
        if hasattr(zh, "contract"):
            zh = zh.contract()
        assert complex(np.asarray(zh)).real == pytest.approx(
            exact, rel=1e-4
        )

    def test_ising_partition_function_ctmrg_vs_exact(self):
        beta = 0.35
        tn = qtn.TN2D_classical_ising_partition_function(
            4, 4, beta=beta
        )
        exact = complex(np.asarray(tn.contract())).real
        zc = tn.contract_ctmrg(max_bond=16)
        if hasattr(zc, "contract"):
            zc = zc.contract()
        assert complex(np.asarray(zc)).real == pytest.approx(
            exact, rel=1e-4
        )

    def test_boundary_contract_agrees_both_directions(self):
        p = qtn.PEPS.rand(3, 4, bond_dim=2, seed=9)
        vx = p.make_norm().contract_boundary(max_bond=32,
                                             sequence="xmin")
        vy = p.make_norm().contract_boundary(max_bond=32,
                                             sequence="ymin")
        vx = complex(np.asarray(vx)).real
        vy = complex(np.asarray(vy)).real
        assert vx == pytest.approx(vy, rel=1e-6)


class TestPEPO:
    def test_pepo_identity_application(self):
        p = qtn.PEPS.rand(2, 2, bond_dim=2, seed=10)
        ident = qtn.PEPO.identity(2, 2) if hasattr(
            qtn.PEPO, "identity") else None
        if ident is None:
            pytest.skip("PEPO.identity not present")
        q = ident.apply(p)
        assert np.allclose(
            peps_dense(q), peps_dense(p), atol=1e-10
        )

    def test_pepo_rand_herm(self):
        po = qtn.PEPO.rand(2, 2, bond_dim=2, seed=11)
        assert po.num_tensors == 4
        # dense form is a square matrix
        d = A(po.to_dense())
        assert d.shape == (16, 16)
