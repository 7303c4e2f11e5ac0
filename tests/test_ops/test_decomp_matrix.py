"""Full behavior matrix for the split engine: every driver x absorb x
cutoff_mode validated against an independent numpy model (ported from
the reference's tests/test_tensor/test_decomp.py strategy — semantics
of reference decomp.py:654-741 truncation + :587-621 absorb modes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quimb_tpu.ops import decomp
from quimb_tpu.ops.decomp import array_split


def rand_mat(m, n, dtype="float64", seed=7, decay=1.0):
    """Random matrix with exponentially decaying singular values (the
    Schmidt-like spectra the split engine consumes in practice)."""
    rng = np.random.default_rng(seed)
    k = min(m, n)
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    s = np.exp(-decay * np.arange(k))
    x = (u * s) @ v.T
    if "complex" in dtype:
        ph = np.exp(1j * rng.uniform(0, 2 * np.pi, k))
        x = (u * (s * ph)) @ v.T
    return np.asarray(x, dtype=dtype)


def np_truncation_rank(s, cutoff, cutoff_mode, max_bond):
    """Independent numpy model of the kept-rank decision
    (reference decomp.py:684-722)."""
    if cutoff and cutoff > 0:
        if cutoff_mode == "abs":
            n = int(np.sum(s > cutoff))
        elif cutoff_mode == "rel":
            n = int(np.sum(s > cutoff * s[0]))
        else:
            sp = s**2 if cutoff_mode in ("sum2", "rsum2") else s
            csp = np.cumsum(sp)
            tot = csp[-1]
            if cutoff_mode in ("rsum2", "rsum1"):
                n = int(np.sum(csp < tot * (1 - cutoff))) + 1
            else:
                n = int(np.sum(csp < tot - cutoff)) + 1
        n = max(n, 1)
        if max_bond and max_bond > 0:
            n = min(n, max_bond)
        return n
    if max_bond and max_bond > 0:
        return min(max_bond, len(s))
    return len(s)


ALL_CUTOFF_MODES = ["abs", "rel", "sum2", "rsum2", "sum1", "rsum1"]
SVD_METHODS = ["svd", "svd:eig", "svd:rand"]


class TestTruncationRankMatrix:
    """The kept rank for each (method, cutoff_mode) matches the numpy
    model on a decaying spectrum."""

    @pytest.mark.parametrize("method", SVD_METHODS)
    @pytest.mark.parametrize("cutoff_mode", ALL_CUTOFF_MODES)
    def test_rank_decision(self, method, cutoff_mode):
        x = rand_mat(30, 24, decay=0.5)
        s_exact = np.linalg.svd(x, compute_uv=False)
        cutoff = {"abs": 1e-3, "rel": 1e-3, "sum2": 1e-3,
                  "rsum2": 1e-6, "sum1": 1e-3, "rsum1": 1e-6}[cutoff_mode]
        want = np_truncation_rank(s_exact, cutoff, cutoff_mode, None)
        U, s, VH = array_split(
            x, method=method, absorb=None, cutoff=cutoff,
            cutoff_mode=cutoff_mode,
        )
        assert s.shape[-1] == want, (method, cutoff_mode)
        # kept values match the exact spectrum
        assert np.allclose(np.asarray(s), s_exact[:want], atol=1e-8)

    @pytest.mark.parametrize("cutoff_mode", ALL_CUTOFF_MODES)
    def test_max_bond_caps_rank(self, cutoff_mode):
        x = rand_mat(30, 24, decay=0.1)
        U, s, VH = array_split(
            x, absorb=None, cutoff=1e-12, cutoff_mode=cutoff_mode,
            max_bond=5,
        )
        assert s.shape[-1] == 5

    @pytest.mark.parametrize("cutoff_mode", ["sum2", "rsum2", "sum1",
                                             "rsum1"])
    def test_renorm_preserves_norm(self, cutoff_mode):
        """renorm=True rescales kept values so the spectrum's p-norm
        (p=2 for sum2-class, p=1 for sum1-class) is preserved
        (reference decomp.py:739-741)."""
        x = rand_mat(24, 24, decay=0.3)
        s_exact = np.linalg.svd(x, compute_uv=False)
        p = 2 if cutoff_mode in ("sum2", "rsum2") else 1
        cutoff = 1e-3 if p == 2 else 1e-2
        U, s, VH = array_split(
            x, absorb=None, cutoff=cutoff, cutoff_mode=cutoff_mode,
            renorm=True,
        )
        s = np.asarray(s)
        assert len(s) < len(s_exact)
        assert np.sum(s**p) == pytest.approx(np.sum(s_exact**p),
                                             rel=1e-8)


class TestAbsorbMatrix:
    """Every absorb mode x driver returns the right factor layout
    (reference decomp.py:587-621)."""

    @pytest.mark.parametrize("method", SVD_METHODS)
    @pytest.mark.parametrize("dtype", ["float64", "complex128"])
    @pytest.mark.parametrize(
        "absorb", [None, "both", "left", "right"]
    )
    def test_reconstructing_modes(self, method, dtype, absorb):
        x = rand_mat(18, 14, dtype=dtype, decay=0.2)
        left, s, right = array_split(
            x, method=method, absorb=absorb, cutoff=0.0,
        )
        if absorb is None:
            got = (np.asarray(left) * np.asarray(s)) @ np.asarray(right)
        else:
            assert s is None
            got = np.asarray(left) @ np.asarray(right)
        assert np.allclose(got, x, atol=1e-8)
        if absorb == "left":
            r = np.asarray(right)
            assert np.allclose(r @ r.conj().T, np.eye(r.shape[0]),
                               atol=1e-8)
        if absorb == "right":
            l = np.asarray(left)
            assert np.allclose(l.conj().T @ l, np.eye(l.shape[1]),
                               atol=1e-8)

    @pytest.mark.parametrize("absorb,want", [
        ("lorthog", (True, False, False)),
        ("rorthog", (False, False, True)),
        ("lfactor", (True, False, False)),
        ("rfactor", (False, False, True)),
        ("lsqrt", (True, False, False)),
        ("rsqrt", (False, False, True)),
        ("s", (False, True, False)),
    ])
    def test_partial_modes_layout(self, absorb, want):
        x = rand_mat(12, 12)
        out = array_split(x, absorb=absorb, cutoff=0.0)
        got = tuple(o is not None for o in out)
        assert got == want, absorb

    def test_partial_modes_values(self):
        x = rand_mat(12, 12, decay=0.2)
        U0, s0, VH0 = array_split(x, absorb=None, cutoff=0.0)
        U0, s0, VH0 = map(np.asarray, (U0, s0, VH0))
        # lorthog / rorthog give the bare isometries
        (U, _, _) = array_split(x, absorb="lorthog", cutoff=0.0)
        assert np.allclose(np.abs(np.asarray(U)), np.abs(U0), atol=1e-8)
        (_, _, VH) = array_split(x, absorb="rorthog", cutoff=0.0)
        assert np.allclose(np.abs(np.asarray(VH)), np.abs(VH0),
                           atol=1e-8)
        # lfactor @ rorthog reconstructs, rfactor likewise
        (Us, _, _) = array_split(x, absorb="lfactor", cutoff=0.0)
        assert np.allclose(np.asarray(Us) @ np.asarray(VH), x,
                           atol=1e-8)
        (_, _, sVH) = array_split(x, absorb="rfactor", cutoff=0.0)
        assert np.allclose(np.asarray(U) @ np.asarray(sVH), x,
                           atol=1e-8)
        # lsqrt @ rsqrt reconstructs
        (Usq, _, _) = array_split(x, absorb="lsqrt", cutoff=0.0)
        (_, _, sqVH) = array_split(x, absorb="rsqrt", cutoff=0.0)
        assert np.allclose(np.asarray(Usq) @ np.asarray(sqVH), x,
                           atol=1e-8)
        # 's' returns just the singular values
        (_, s, _) = array_split(x, absorb="s", cutoff=0.0)
        assert np.allclose(np.asarray(s), s0, atol=1e-10)

    def test_absorb_aliases(self):
        x = rand_mat(10, 10)
        for alias, canonical in [("U,s,VH", None), ("Usq,sqVH", "both"),
                                 ("Us,VH", "left"), ("U,sVH", "right"),
                                 (0, "both"), (-1, "left"),
                                 (1, "right")]:
            a = array_split(x, absorb=alias, cutoff=0.0)
            b = array_split(x, absorb=canonical, cutoff=0.0)
            for xa, xb in zip(a, b):
                assert (xa is None) == (xb is None)
                if xa is not None:
                    assert np.allclose(np.asarray(xa), np.asarray(xb),
                                       atol=1e-10)


class TestOrthogonalDrivers:
    """QR-family and polar drivers: factor properties + reconstruction
    (reference qr_stabilized decomp.py:1985, qr:cholesky :2289,
    polar :2603/2633, cholesky :2199, lu :2545)."""

    @pytest.mark.parametrize("dtype", ["float64", "complex128"])
    def test_qr_stabilized_positive_diag(self, dtype):
        x = rand_mat(16, 12, dtype=dtype)
        Q, _, R = array_split(x, method="qr", absorb="right")
        Q, R = np.asarray(Q), np.asarray(R)
        assert np.allclose(Q @ R, x, atol=1e-10)
        # stabilized: R's diagonal is real and non-negative
        d = np.diag(R)
        assert np.allclose(np.imag(d), 0.0, atol=1e-10)
        assert np.all(np.real(d) >= -1e-12)

    def test_lq_matches_qr_of_transpose(self):
        x = rand_mat(12, 16)
        L, _, Q = array_split(x, method="lq", absorb="left")
        L, Q = np.asarray(L), np.asarray(Q)
        assert np.allclose(L @ Q, x, atol=1e-10)
        assert np.allclose(Q @ Q.conj().T, np.eye(Q.shape[0]),
                           atol=1e-10)
        d = np.diag(L)
        assert np.all(np.real(d) >= -1e-12)

    def test_qr_cholesky_matches_qr(self):
        x = rand_mat(64, 16, decay=0.05)
        Q1, _, R1 = array_split(x, method="qr")
        Q2, _, R2 = array_split(x, method="qr:cholesky")
        assert np.allclose(np.asarray(Q2) @ np.asarray(R2), x,
                           atol=1e-8)
        # both stabilized => same factors up to fp error
        assert np.allclose(np.asarray(Q1), np.asarray(Q2), atol=1e-6)

    @pytest.mark.parametrize("method,side", [("polar_right", "right"),
                                             ("polar_left", "left")])
    def test_polar(self, method, side):
        x = rand_mat(14, 14, dtype="complex128")
        l, _, r = array_split(x, method=method)
        l, r = np.asarray(l), np.asarray(r)
        assert np.allclose(l @ r, x, atol=1e-10)
        if side == "right":
            # unitary @ psd
            assert np.allclose(l.conj().T @ l, np.eye(14), atol=1e-10)
            assert np.allclose(r, r.conj().T, atol=1e-10)
            assert np.min(np.linalg.eigvalsh(r)) > -1e-10
        else:
            assert np.allclose(r.conj().T @ r, np.eye(14), atol=1e-10)
            assert np.allclose(l, l.conj().T, atol=1e-10)
            assert np.min(np.linalg.eigvalsh(l)) > -1e-10

    def test_cholesky_psd(self):
        a = rand_mat(12, 12)
        x = a @ a.T + 1e-6 * np.eye(12)
        l, _, r = array_split(x, method="cholesky")
        assert np.allclose(np.asarray(l) @ np.asarray(r), x, atol=1e-8)
        assert np.allclose(np.asarray(l),
                           np.asarray(r).conj().T, atol=1e-10)

    def test_lu_reconstructs(self):
        x = rand_mat(12, 12)
        l, _, r = array_split(x, method="lu", cutoff=0.0)
        assert np.allclose(np.asarray(l) @ np.asarray(r), x, atol=1e-8)

    def test_eigh_on_hermitian(self):
        a = rand_mat(12, 12, dtype="complex128")
        x = (a + a.conj().T) / 2
        l, s, r = array_split(x, method="eigh", absorb=None,
                              cutoff=0.0)
        got = (np.asarray(l) * np.asarray(s)) @ np.asarray(r)
        assert np.allclose(got, x, atol=1e-8)


class TestSubspaceDrivers:
    """Randomized-subspace truncation (svd_truncated_masked_subspace /
    split_truncated_subspace) vs exact rank-k SVD projection."""

    @pytest.mark.parametrize("absorb", ["left", "right", "both"])
    def test_subspace_near_optimal_projection(self, absorb):
        """Subspace iteration is a *near*-optimal rank-k projection:
        its residual must be within a few percent of the exact
        truncated-SVD residual (it converges geometrically in the
        spectrum gap, not exactly)."""
        xn = rand_mat(48, 40, decay=0.4)
        x = jnp.asarray(xn)
        k = 8
        U, s, VH, rank = decomp.svd_truncated_masked_subspace(
            x, max_bond=k, cutoff=0.0, absorb=absorb,
        )
        got = np.asarray(U) @ np.asarray(VH)
        sv = np.linalg.svd(xn, compute_uv=False)
        err_opt = np.sqrt(np.sum(sv[k:] ** 2))
        err_got = np.linalg.norm(got - xn)
        assert err_got <= err_opt * 1.05 + 1e-12

    def test_pure_subspace_split_projection(self):
        xn = rand_mat(48, 40, decay=0.4)
        x = jnp.asarray(xn)
        k = 8
        U, s, VH, rank = decomp.split_truncated_subspace(
            x, max_bond=k, absorb="right",
        )
        assert s is None and int(rank) == k
        got = np.asarray(U) @ np.asarray(VH)
        sv = np.linalg.svd(xn, compute_uv=False)
        err_opt = np.sqrt(np.sum(sv[k:] ** 2))
        err_got = np.linalg.norm(got - xn)
        assert err_got <= err_opt * 1.05 + 1e-12
        # isometric factor
        Un = np.asarray(U)
        assert np.allclose(Un.conj().T @ Un, np.eye(k), atol=1e-8)

    def test_subspace_cutoff_masking(self):
        """With a cutoff, the subspace driver masks exactly like the
        eig driver."""
        x = jnp.asarray(rand_mat(40, 40, decay=0.8))
        U1, s1, V1, r1 = decomp.svd_truncated_masked_subspace(
            x, max_bond=20, cutoff=1e-3, cutoff_mode=2, absorb=None,
        )
        U2, s2, V2, r2 = decomp.svd_truncated_masked_eig(
            x, max_bond=20, cutoff=1e-3, cutoff_mode=2, absorb=None,
        )
        assert int(r1) == int(r2)
        n = int(r1)
        assert np.allclose(np.asarray(s1)[:n], np.asarray(s2)[:n],
                           atol=1e-6)


class TestIsometrize:
    @pytest.mark.parametrize("method", ["qr", "svd", "exp", "cayley",
                                        "mgs", "householder"])
    @pytest.mark.parametrize("shape", [(12, 8), (8, 8)])
    def test_isometry_property(self, method, shape):
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal(shape))
        q = np.asarray(decomp.isometrize(x, method=method))
        assert q.shape == shape
        assert np.allclose(q.T @ q, np.eye(shape[1]), atol=1e-8)


class TestObliqueProjectors:
    def test_projectors_compress_bond(self):
        """Oblique projectors from a bond environment reproduce the
        optimal truncation of a simple two-tensor product (reference
        compute_oblique_projectors decomp.py:3202)."""
        rng = np.random.default_rng(3)
        A = jnp.asarray(rng.standard_normal((9, 20)))
        B = jnp.asarray(rng.standard_normal((20, 9)))
        Pl, Pr = decomp.compute_oblique_projectors(
            A, B, max_bond=9, cutoff=0.0,
        )
        got = np.asarray((A @ Pl) @ (Pr @ B))
        # rank of A@B is min(9, 20) = 9, so rank-9 is exact
        assert np.allclose(got, np.asarray(A @ B), atol=1e-8)

    def test_projectors_truncate(self):
        x = rand_mat(16, 16, decay=0.6)
        A = jnp.asarray(x[:, :])
        B = jnp.eye(16)
        k = 4
        Pl, Pr = decomp.compute_oblique_projectors(
            A, B, max_bond=k, cutoff=0.0,
        )
        got = np.asarray((A @ Pl) @ (Pr @ B))
        u, sv, vh = np.linalg.svd(x)
        want = (u[:, :k] * sv[:k]) @ vh[:k]
        err_got = np.linalg.norm(got - x)
        err_opt = np.linalg.norm(want - x)
        assert err_got <= err_opt * 1.5 + 1e-12


class TestInfoAndErrors:
    def test_info_error_reported(self):
        x = rand_mat(20, 20, decay=0.5)
        s_exact = np.linalg.svd(x, compute_uv=False)
        info = {"error": None}
        U, s, VH = array_split(
            x, absorb=None, max_bond=5, cutoff=1e-14, info=info,
        )
        want = np.sqrt(np.sum(s_exact[5:] ** 2))
        assert info["error"] == pytest.approx(want, rel=1e-6)

    def test_invalid_modes_raise(self):
        x = rand_mat(6, 6)
        with pytest.raises(ValueError):
            array_split(x, absorb="bogus")
        with pytest.raises(ValueError):
            array_split(x, cutoff_mode="bogus")
        with pytest.raises(KeyError):
            array_split(x, method="not-a-method")
