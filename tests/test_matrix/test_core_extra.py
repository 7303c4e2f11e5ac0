"""Exact-core behavior tests (reference
tests/test_matrix/test_core.py strategy): quimbify forms and
predicates, kron placement machinery (ikron per-ind placement, pkron
permuted placement, dim_map/dim_compress), small linear-algebra
helpers (ldmul/rdmul/outer/itrace/explt), and partial traces over
irregular subsystems."""

import numpy as np
import pytest

import quimb_tpu as qu


def A(x):
    return np.asarray(x)


class TestPredicatesAndForms:
    def test_is_predicates(self):
        k = qu.qu([1, 0], qtype="ket")
        b = qu.qu([1, 0], qtype="bra")
        o = qu.dop(k)
        assert qu.isket(k) and not qu.isbra(k) and not qu.isop(k)
        assert qu.isbra(b) and not qu.isket(b)
        assert qu.isop(o) and not qu.isvec(o)
        assert qu.isvec(k) and qu.isvec(b)

    def test_isherm_ispos(self):
        H = qu.rand_herm(4, seed=0)
        assert qu.isherm(H)
        rho = qu.rand_rho(4, seed=1)
        assert qu.ispos(rho)
        X = qu.qu(np.triu(np.ones((3, 3))))
        assert not qu.isherm(X)

    def test_normalize_and_chop(self):
        k = qu.qu([3.0, 4.0], qtype="ket", normalized=True)
        assert np.linalg.norm(A(k)) == pytest.approx(1.0)
        x = qu.qu(np.array([1.0, 1e-16, 0.5]))
        y = A(qu.chop(x, tol=1e-12))
        assert y[1] == 0.0 and y[0] == 1.0

    def test_infer_size(self):
        k = qu.rand_ket(2**5)
        assert qu.infer_size(k) == 5
        k3 = qu.rand_ket(3**3)
        assert qu.infer_size(k3, base=3) == 3

    def test_dag_involution(self):
        X = qu.qu(np.random.default_rng(2).standard_normal((3, 4))
                  + 1j * np.random.default_rng(3).standard_normal(
                      (3, 4)))
        assert np.allclose(A(qu.dag(qu.dag(X))), A(X))


class TestKronMachinery:
    def test_ikron_single_op_each_ind(self):
        # a 1-site op given once with several inds is placed at EACH
        Z = qu.pauli("Z")
        U = A(qu.ikron(Z, [2, 2, 2], [0, 2]))
        want = np.kron(np.kron(A(Z), np.eye(2)), A(Z))
        assert np.allclose(U, want, atol=1e-12)

    def test_ikron_multisite_contiguous(self):
        CN = qu.CNOT()
        U = A(qu.ikron(CN, [2, 2, 2], 1))
        want = np.kron(np.eye(2), A(CN))
        assert np.allclose(U, want, atol=1e-12)

    def test_pkron_nonadjacent_matches_manual(self):
        n = 4
        U = A(qu.pkron(qu.CNOT(), [2] * n, (0, 3)))
        M = np.zeros((16, 16))
        for bval in range(16):
            bits = [(bval >> (n - 1 - i)) & 1 for i in range(n)]
            out = bits.copy()
            if bits[0]:
                out[3] ^= 1
            M[sum(v << (n - 1 - i) for i, v in enumerate(out)),
              bval] = 1.0
        assert np.allclose(U, M, atol=1e-12)

    def test_pkron_reversed_inds_swaps_roles(self):
        n = 3
        U = A(qu.pkron(qu.CNOT(), [2] * n, (2, 0)))
        # control on qubit 2, target on qubit 0
        M = np.zeros((8, 8))
        for bval in range(8):
            bits = [(bval >> (n - 1 - i)) & 1 for i in range(n)]
            out = bits.copy()
            if bits[2]:
                out[0] ^= 1
            M[sum(v << (n - 1 - i) for i, v in enumerate(out)),
              bval] = 1.0
        assert np.allclose(U, M, atol=1e-12)

    def test_dim_map_2d(self):
        dims2d = [[2, 2], [2, 2]]
        flat, inds = qu.dim_map(dims2d, [(0, 0), (1, 1)])
        assert tuple(flat) == (2, 2, 2, 2)
        assert tuple(inds) == (0, 3)

    def test_dim_compress(self):
        dims = [2, 2, 2, 2, 2]
        cdims, cinds = qu.dim_compress(dims, [2])
        # groups: [0:2], [2], [3:5] -> dims (4, 2, 4), ind 1
        assert tuple(cdims) == (4, 2, 4)
        assert tuple(cinds) == (1,)

    def test_kron_associative_value(self):
        a = qu.rand_matrix(2, seed=4) if hasattr(qu, "rand_matrix") \
            else qu.qu(np.random.default_rng(4).standard_normal(
                (2, 2)))
        b = qu.qu(np.random.default_rng(5).standard_normal((3, 3)))
        c = qu.qu(np.random.default_rng(6).standard_normal((2, 2)))
        assert np.allclose(
            A(qu.kron(a, b, c)),
            np.kron(np.kron(A(a), A(b)), A(c)),
            atol=1e-12,
        )


class TestSmallHelpers:
    def test_ldmul_rdmul(self):
        d = np.array([1.0, 2.0, 3.0])
        X = np.random.default_rng(7).standard_normal((3, 3))
        assert np.allclose(A(qu.ldmul(qu.qu(d), qu.qu(X))),
                           np.diag(d) @ X, atol=1e-12)
        assert np.allclose(A(qu.rdmul(qu.qu(X), qu.qu(d))),
                           X @ np.diag(d), atol=1e-12)

    def test_outer_and_expec(self):
        a = qu.rand_ket(4, seed=8)
        o = A(qu.outer(a, a))
        assert np.allclose(o, A(a) @ A(a).conj().T, atol=1e-12)
        H = qu.rand_herm(4, seed=9)
        e1 = complex(np.asarray(qu.expec(H, a)))
        av = A(a).reshape(-1)
        e2 = av.conj() @ (A(H) @ av)
        assert e1.real == pytest.approx(e2.real, rel=1e-10)

    def test_itrace(self):
        X = np.random.default_rng(10).standard_normal((2, 3, 2, 3))
        got = A(qu.itrace(qu.qu(X), axes=((0, 1), (2, 3))))
        want = np.trace(X.reshape(6, 6))
        assert complex(got).real == pytest.approx(want, rel=1e-12)

    def test_explt(self):
        el = np.array([0.5, -1.0])
        t = 0.3
        got = A(qu.explt(qu.qu(el), t)).reshape(-1)
        assert np.allclose(got, np.exp(-1j * el * t), atol=1e-12)

    def test_mul_dot(self):
        X = qu.qu(np.random.default_rng(11).standard_normal((3, 3)))
        Y = qu.qu(np.random.default_rng(12).standard_normal((3, 3)))
        assert np.allclose(A(qu.mul(X, Y)), A(X) * A(Y), atol=1e-12)
        assert np.allclose(A(qu.dot(X, Y)), A(X) @ A(Y), atol=1e-12)


class TestPartialTraceVariants:
    def test_keep_irregular_subsystems(self):
        psi = qu.rand_ket(2 * 3 * 2, seed=13)
        rho = A(qu.partial_trace(psi, [2, 3, 2], [0, 2]))
        assert rho.shape == (4, 4)
        assert complex(np.trace(rho)).real == pytest.approx(1.0)

    def test_partial_trace_matches_manual(self):
        rho = qu.rand_rho(8, seed=14)
        ra = A(qu.partial_trace(rho, [2, 2, 2], 1))
        full = A(rho).reshape(2, 2, 2, 2, 2, 2)
        want = np.einsum("aibcid->bd", full.transpose(
            0, 1, 2, 3, 4, 5
        )) if False else np.einsum("abicbj->aibj" if False else
                                   "iajibj->ab", full) if False else \
            np.einsum("iakibk->ab", full.transpose(0, 1, 2, 3, 4, 5))
        want = np.einsum("aibajb->ij", full)
        assert np.allclose(ra, want, atol=1e-10)

    def test_permute_roundtrip(self):
        psi = qu.rand_ket(2 * 3 * 4, seed=15)
        p1 = qu.permute(psi, [2, 3, 4], [2, 0, 1])
        # permuting back with the inverse order restores
        p2 = qu.permute(p1, [4, 2, 3], [1, 2, 0])
        assert np.allclose(A(p2).reshape(-1), A(psi).reshape(-1),
                           atol=1e-12)
