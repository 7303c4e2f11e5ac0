"""On-the-fly sector matvec (CoupledHam) vs explicitly materialized
sector matrices — the configcore.py parity tests (reference
``matvec_nosymm/z2/u1/u1u1`` configcore.py:288-:737)."""

import numpy as np
import pytest

import quimb_tpu as qu
from quimb_tpu.operator import HilbertSpace, SparseOperatorBuilder


def heis_builder(n, hs=None, jz=1.0):
    b = SparseOperatorBuilder(hilbert_space=hs)
    for i in range(n - 1):
        b += 0.5, ("+", i), ("-", i + 1)
        b += 0.5, ("-", i), ("+", i + 1)
        b += jz, ("sz", i), ("sz", i + 1)
    return b


def tfim_builder(n, hs=None, hx=0.7):
    # transverse-field Ising: Z2-symmetric, X terms flip parity-pairs
    b = SparseOperatorBuilder(hilbert_space=hs)
    for i in range(n - 1):
        b += -1.0, ("Z", i), ("Z", i + 1)
    for i in range(n):
        b += -hx, ("X", i)
    return b


@pytest.mark.parametrize("symmetry,sector", [
    (None, None),
    ("Z2", 0),
    ("Z2", 1),
    ("U1", 3),
    ("U1U1", (2, 1)),
])
def test_coupled_matvec_matches_sector_matrix(symmetry, sector):
    n = 6
    hs = HilbertSpace(n, symmetry=symmetry, sector=sector)
    b = heis_builder(n, hs=hs)
    H = b.build_sparse_matrix()          # within-sector CSR
    op = b.build_coupled_ham()
    assert op.shape == H.shape
    rng = np.random.default_rng(42)
    x = rng.standard_normal(H.shape[0])
    y = np.asarray(op @ x)
    np.testing.assert_allclose(y, H @ x, rtol=1e-5, atol=1e-6)


def test_coupled_matvec_parity_changing_terms_masked():
    # TFIM: single-X terms connect Z2 sectors — within a sector their
    # block is zero and they must be dropped/masked, while the ZZ part
    # stays
    n = 6
    for sector in (0, 1):
        hs = HilbertSpace(n, symmetry="Z2", sector=sector)
        b = tfim_builder(n, hs=hs)
        H = b.build_sparse_matrix()
        op = b.build_coupled_ham()
        rng = np.random.default_rng(0)
        x = rng.standard_normal(H.shape[0])
        np.testing.assert_allclose(
            np.asarray(op @ x), H @ x, rtol=1e-5, atol=1e-6
        )


def test_coupled_matvec_xx_terms_in_u1():
    # XX+YY hopping written with raw X/Y paulis: each term has
    # sector-escaping (++/--) *and* sector-preserving (+-/-+)
    # components — the device mask must keep exactly the latter
    n = 6
    hs = HilbertSpace(n, symmetry="U1", sector=3)
    b = SparseOperatorBuilder(hilbert_space=hs)
    for i in range(n - 1):
        b += 0.25, ("X", i), ("X", i + 1)
        b += 0.25, ("Y", i), ("Y", i + 1)
    H = b.build_sparse_matrix()
    op = b.build_coupled_ham()
    rng = np.random.default_rng(1)
    x = rng.standard_normal(H.shape[0])
    np.testing.assert_allclose(
        np.asarray(op @ x), H @ x, rtol=1e-5, atol=1e-6
    )


def test_coupled_complex_vector():
    n = 6
    hs = HilbertSpace(n, symmetry="U1", sector=3)
    b = heis_builder(n, hs=hs)
    H = b.build_sparse_matrix()
    op = b.build_coupled_ham()
    rng = np.random.default_rng(3)
    x = rng.standard_normal(H.shape[0]) \
        + 1j * rng.standard_normal(H.shape[0])
    np.testing.assert_allclose(
        np.asarray(op @ x), H @ x, rtol=1e-5, atol=1e-6
    )


def test_builder_matvec_is_matrix_free():
    n = 8
    hs = HilbertSpace(n, symmetry="U1", sector=4)
    b = heis_builder(n, hs=hs)
    x = np.random.default_rng(7).standard_normal(hs.size)
    y = np.asarray(b.matvec(x))
    np.testing.assert_allclose(
        y, b.build_sparse_matrix() @ x, rtol=1e-5, atol=1e-6
    )
    # no CSR/dense/SparseHam may have been cached by the call
    assert all(
        not (isinstance(k, tuple) and "coupled" not in str(k[0]))
        for k in b._cache
    )


def test_groundstate_u1_sector_no_matrix():
    # U1-sector groundstate via device Lanczos with the CoupledHam as
    # jit operand — matches dense ED restricted to the k=n/2 sector
    n = 10
    hs = HilbertSpace(n, symmetry="U1", sector=n // 2)
    b = heis_builder(n, hs=hs)
    op = b.build_coupled_ham()
    lam = qu.eigensystem_partial(
        op, k=1, return_vecs=False, backend="lanczos",
    )
    Hd = b.build_sparse_matrix().toarray()
    e_exact = np.linalg.eigvalsh(Hd)[0]
    assert float(lam[0]) == pytest.approx(e_exact, abs=2e-6)
    # the global groundstate of Heisenberg lives in this sector
    e_glob = float(qu.groundenergy(qu.ham_heis(n, sparse=True)))
    assert float(lam[0]) == pytest.approx(e_glob, abs=2e-5)


def test_expm_multiply_coupled():
    import scipy.sparse.linalg as spla

    n = 8
    hs = HilbertSpace(n, symmetry="U1", sector=4)
    b = heis_builder(n, hs=hs)
    op = b.build_coupled_ham()
    H = b.build_sparse_matrix().tocsc()
    rng = np.random.default_rng(11)
    v = rng.standard_normal(hs.size).astype(complex)
    v /= np.linalg.norm(v)
    from quimb_tpu.linalg.lanczos import expm_multiply_krylov

    got = np.asarray(expm_multiply_krylov(op, v, t=-0.3j, ncv=24))
    want = spla.expm_multiply(-0.3j * H, v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_coupled_matvec_u1_40_sites_dual_word():
    """nsites > 31: configs pack as two 31-bit words (reference
    configcore ranks 64-bit configs, configcore.py:288,530,737).
    k=2 sector of a 40-site Heisenberg chain vs the within-sector
    CSR."""
    n, k = 40, 2
    hs = HilbertSpace(n, symmetry="U1", sector=k)
    assert hs.size == n * (n - 1) // 2
    b = heis_builder(n, hs=hs)
    H = b.build_sparse_matrix()
    op = b.build_coupled_ham()
    assert op.shape == H.shape
    rng = np.random.default_rng(7)
    x = rng.standard_normal(H.shape[0])
    np.testing.assert_allclose(
        np.asarray(op @ x), H @ x, rtol=1e-5, atol=1e-6
    )


def test_coupled_matvec_u1u1_36_sites_dual_word():
    n = 36
    hs = HilbertSpace(n, symmetry="U1U1", sector=(1, 2))
    b = heis_builder(n, hs=hs)
    H = b.build_sparse_matrix()
    op = b.build_coupled_ham()
    rng = np.random.default_rng(8)
    x = rng.standard_normal(H.shape[0])
    np.testing.assert_allclose(
        np.asarray(op @ x), H @ x, rtol=1e-5, atol=1e-6
    )
