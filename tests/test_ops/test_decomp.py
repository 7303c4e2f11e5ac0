"""Tests for the S0 split engine — modelled on the reference's
tests/test_tensor/test_decomp.py strategy: validate every driver × absorb ×
truncation mode against exact numpy linear algebra."""

import jax.numpy as jnp
import numpy as np
import pytest

from quimb_tpu.ops import decomp


def rand_mat(m, n, dtype="complex128", seed=42):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, n))
    if "complex" in dtype:
        x = x + 1j * rng.standard_normal((m, n))
    return jnp.asarray(x.astype(dtype))


def rand_herm(n, dtype="complex128", seed=42):
    x = rand_mat(n, n, dtype, seed)
    return (x + x.conj().T) / 2


def recombine(left, s, right):
    if s is not None:
        if left is None and right is None:
            return s
        mid = jnp.diag(s.astype(left.dtype))
        return left @ mid @ right
    return left @ right


class TestSVDTruncated:
    @pytest.mark.parametrize("dtype", ["float64", "complex128"])
    @pytest.mark.parametrize("m,n", [(16, 16), (24, 12), (12, 24)])
    def test_full_reconstruction(self, dtype, m, n):
        x = rand_mat(m, n, dtype)
        U, s, VH = decomp.svd_truncated(x, cutoff=-1.0, absorb=None)
        assert np.allclose(recombine(U, s, VH), x, atol=1e-10)

    @pytest.mark.parametrize(
        "absorb", [None, "both", "left", "right"]
    )
    def test_absorb_modes(self, absorb):
        x = rand_mat(16, 16)
        left, s, right = decomp.svd_truncated(x, cutoff=-1.0, absorb=absorb)
        if absorb is None:
            assert s is not None
            got = recombine(left, s, right)
        else:
            assert s is None
            got = left @ right
        assert np.allclose(got, x, atol=1e-10)
        if absorb == "left":
            # right factor should be isometric (rows)
            assert np.allclose(right @ right.conj().T, np.eye(16), atol=1e-10)
        if absorb == "right":
            assert np.allclose(left.conj().T @ left, np.eye(16), atol=1e-10)

    def test_partial_absorb_modes(self):
        x = rand_mat(12, 8)
        U0, s0, VH0 = decomp.svd_truncated(x, cutoff=-1.0, absorb=None)
        for mode, expect in [
            ("lorthog", (True, False, False)),
            ("rorthog", (False, False, True)),
            ("lfactor", (True, False, False)),
            ("rfactor", (False, False, True)),
            ("s", (False, True, False)),
        ]:
            out = decomp.svd_truncated(x, cutoff=-1.0, absorb=mode)
            for got, exp in zip(out, expect):
                assert (got is not None) == exp
        (_, s, _) = decomp.svd_truncated(x, cutoff=-1.0, absorb="s")
        assert np.allclose(s, s0)

    def test_max_bond(self):
        x = rand_mat(32, 32)
        U, s, VH = decomp.svd_truncated(x, max_bond=7, cutoff=-1.0, absorb=None)
        assert U.shape == (32, 7)
        assert s.shape == (7,)
        assert VH.shape == (7, 32)
        # optimal rank-7 approximation
        u, sv, vh = np.linalg.svd(np.asarray(x))
        expected = (u[:, :7] * sv[:7]) @ vh[:7]
        assert np.allclose(recombine(U, s, VH), expected, atol=1e-10)

    @pytest.mark.parametrize("cutoff_mode", ["abs", "rel", "sum2", "rsum2", "sum1", "rsum1"])
    def test_cutoff_modes_match_reference_semantics(self, cutoff_mode):
        # construct known spectrum
        rng = np.random.default_rng(0)
        u, _ = np.linalg.qr(rng.standard_normal((20, 20)))
        v, _ = np.linalg.qr(rng.standard_normal((20, 20)))
        sv = np.array([2.0**-i for i in range(20)])
        x = jnp.asarray((u * sv) @ v.T)
        cutoff = 1e-3

        U, s, VH = decomp.svd_truncated(
            x, cutoff=cutoff, cutoff_mode=cutoff_mode, absorb=None
        )
        # independent reference computation of n_chi
        if cutoff_mode == "abs":
            n = np.sum(sv > cutoff)
        elif cutoff_mode == "rel":
            n = np.sum(sv > cutoff * sv[0])
        else:
            pw = 2 if "2" in cutoff_mode else 1
            csp = np.cumsum(sv**pw)
            tot = csp[-1]
            if cutoff_mode.startswith("r"):
                n = np.sum(csp < tot * (1 - cutoff)) + 1
            else:
                n = np.sum(csp < tot - cutoff) + 1
        assert s.shape[-1] == max(n, 1)

    def test_renorm(self):
        x = rand_mat(32, 32, "float64")
        _, s_full, _ = decomp.svd_truncated(x, cutoff=-1.0, absorb=None)
        U, s, VH = decomp.svd_truncated(
            x, max_bond=5, cutoff=1e-10, cutoff_mode="rsum2",
            renorm=True, absorb=None,
        )
        # frobenius norm preserved
        assert np.allclose(
            np.linalg.norm(np.asarray(s)), np.linalg.norm(np.asarray(s_full)),
            rtol=1e-10,
        )

    def test_info_error(self):
        x = rand_mat(32, 32)
        info = {"error": None}
        U, s, VH = decomp.svd_truncated(
            x, max_bond=10, cutoff=-1.0, absorb=None, info=info
        )
        sv = np.linalg.svd(np.asarray(x), compute_uv=False)
        assert np.allclose(info["error"], np.sqrt(np.sum(sv[10:] ** 2)))

    def test_batched(self):
        x = jnp.stack([rand_mat(12, 12, seed=i) for i in range(3)])
        U, s, VH = decomp.svd_truncated(x, max_bond=5, cutoff=-1.0, absorb=None)
        assert U.shape == (3, 12, 5)
        assert s.shape == (3, 5)


class TestOtherDrivers:
    @pytest.mark.parametrize(
        "method", ["svd", "svd:eig", "svd:rand", "qr", "qr:cholesky",
                   "lq", "lu", "polar_right", "polar_left"]
    )
    def test_array_split_reconstruction(self, method):
        x = rand_mat(24, 16)
        opts = {}
        if method in ("svd:rand",):
            opts["max_bond"] = 16
        left, s, right = decomp.array_split(x, method=method, cutoff=-1.0, **opts)
        got = recombine(left, s, right) if s is not None else left @ right
        tol = 1e-6 if method in ("svd:eig", "qr:cholesky", "svd:rand") else 1e-10
        assert np.allclose(got, x, atol=tol)

    def test_qr_isometric(self):
        x = rand_mat(24, 16)
        Q, _, R = decomp.qr_stabilized(x)
        assert np.allclose(Q.conj().T @ Q, np.eye(16), atol=1e-12)
        # R diagonal real positive
        d = np.diag(np.asarray(R))
        assert np.allclose(d.imag, 0, atol=1e-12)
        assert (d.real > 0).all()
        assert np.allclose(Q @ R, x, atol=1e-12)

    def test_lq(self):
        x = rand_mat(16, 24)
        L, _, Q = decomp.lq_stabilized(x)
        assert np.allclose(Q @ Q.conj().T, np.eye(16), atol=1e-12)
        d = np.diag(np.asarray(L))
        assert np.allclose(d.imag, 0, atol=1e-12)
        assert (d.real > 0).all()
        assert np.allclose(L @ Q, x, atol=1e-12)

    def test_eigh(self):
        x = rand_herm(16)
        U, s, VH = decomp.array_split(x, method="eigh", cutoff=-1.0, absorb=None)
        assert np.allclose(recombine(U, s, VH), x, atol=1e-10)
        # sorted by descending magnitude
        assert (np.diff(np.abs(np.asarray(s))) <= 1e-12).all()

    def test_eigh_truncated(self):
        x = rand_herm(32)
        U, s, VH = decomp.array_split(
            x, method="eigh", max_bond=6, cutoff=-1.0, absorb=None
        )
        w = np.linalg.eigvalsh(np.asarray(x))
        w = w[np.argsort(-np.abs(w))]
        assert np.allclose(np.abs(np.asarray(s)), np.abs(w[:6]), atol=1e-10)

    def test_cholesky(self):
        x = rand_mat(16, 16)
        pos = x @ x.conj().T + 1e-3 * jnp.eye(16)
        L, _, LH = decomp.array_split(pos, method="cholesky")
        assert np.allclose(L @ LH, pos, atol=1e-10)

    def test_polar(self):
        x = rand_mat(16, 16)
        W, _, P = decomp.array_split(x, method="polar_right")
        assert np.allclose(W.conj().T @ W, np.eye(16), atol=1e-10)
        # P positive hermitian
        assert np.allclose(P, P.conj().T, atol=1e-10)
        assert (np.linalg.eigvalsh(np.asarray(P)) > -1e-10).all()


class TestMaskedSVD:
    def test_matches_eager(self):
        x = rand_mat(24, 24)
        U, s, VH, rank = decomp.svd_truncated_masked(
            x, max_bond=10, cutoff=1e-2, cutoff_mode=4, absorb=None
        )
        Ue, se, VHe = decomp.svd_truncated(
            x, max_bond=10, cutoff=1e-2, cutoff_mode=4, absorb=None
        )
        r = int(rank)
        assert r == se.shape[-1]
        assert np.allclose(np.asarray(s)[:r], np.asarray(se), atol=1e-12)
        assert np.allclose(np.asarray(s)[r:], 0.0)

    def test_jittable(self):
        import jax

        @jax.jit
        def f(x):
            U, s, VH, rank = decomp.svd_truncated_masked(
                x, max_bond=8, cutoff=1e-10, absorb="both"
            )
            return U @ VH, rank

        x = rand_mat(16, 16)
        y, rank = f(x)
        assert y.shape == (16, 16)

    def test_rank_deficient_masking(self):
        # rank-3 matrix: mask should kill everything beyond rank 3
        rng = np.random.default_rng(1)
        a = rng.standard_normal((16, 3))
        b = rng.standard_normal((3, 16))
        x = jnp.asarray(a @ b)
        U, s, VH, rank = decomp.svd_truncated_masked(
            x, max_bond=8, cutoff=1e-9, cutoff_mode=1, absorb="both"
        )
        assert int(rank) == 3
        assert np.allclose(U @ VH, x, atol=1e-10)


class TestIsometrize:
    @pytest.mark.parametrize(
        "method", ["qr", "svd", "mgs", "exp", "cayley", "householder"]
    )
    @pytest.mark.parametrize("shape", [(16, 16), (24, 12)])
    def test_isometric(self, method, shape):
        x = rand_mat(*shape)
        Q = decomp.isometrize(x, method=method)
        assert Q.shape == shape
        assert np.allclose(
            Q.conj().T @ Q, np.eye(shape[1]), atol=1e-10
        )


class TestProjectors:
    def test_squared_op_to_reduced_factor(self):
        x = rand_mat(16, 16)
        x2 = x.conj().T @ x
        R = decomp.squared_op_to_reduced_factor(x2, right=True)
        assert np.allclose(R.conj().T @ R, x2, atol=1e-8)
        L = decomp.squared_op_to_reduced_factor(x2, right=False)
        assert np.allclose(L @ L.conj().T, x2, atol=1e-8)

    def test_oblique_projectors(self):
        Rl = rand_mat(20, 20, seed=3)
        Rr = rand_mat(20, 20, seed=4)
        Pl, Pr = decomp.compute_oblique_projectors(Rl, Rr, max_bond=20, cutoff=0.0)
        # exact at full rank: Rl @ Pl @ Pr @ Rr == Rl @ Rr
        assert np.allclose(Rl @ Pl @ Pr @ Rr, Rl @ Rr, atol=1e-8)
        Pl, Pr = compute = decomp.compute_oblique_projectors(
            Rl, Rr, max_bond=10, cutoff=0.0
        )
        assert Pl.shape == (20, 10)
        assert Pr.shape == (10, 20)


class TestSvdTruncatedMaskedEig:
    @pytest.mark.parametrize("shape", [(96, 128), (128, 96), (4, 64),
                                       (64, 4), (128, 128)])
    @pytest.mark.parametrize("absorb", ["left", "right", "both",
                                        "none"])
    def test_matches_svd_driver(self, shape, absorb):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=shape))
        U1, s1, VH1, r1 = decomp.svd_truncated_masked(
            x, max_bond=48, cutoff=1e-10, absorb=absorb
        )
        U2, s2, VH2, r2 = decomp.svd_truncated_masked_eig(
            x, max_bond=48, cutoff=1e-10, absorb=absorb
        )
        assert U1.shape == U2.shape
        assert VH1.shape == VH2.shape
        assert np.allclose(np.asarray(s1), np.asarray(s2), atol=1e-8)
        if absorb == "none":
            rec1 = np.asarray(U1 * s1 @ VH1)
            rec2 = np.asarray(U2 * s2 @ VH2)
        else:
            rec1 = np.asarray(U1 @ VH1)
            rec2 = np.asarray(U2 @ VH2)
        assert np.allclose(rec1, rec2, atol=1e-7)

    def test_isometric_side_exact(self):
        rng = np.random.default_rng(1)
        # nearly rank-deficient input: the isometric factor must stay
        # exactly orthogonal (this is what crashes/degrades plain
        # Jacobi SVD on TPU)
        a = rng.normal(size=(64, 3))
        x = jnp.asarray(a @ rng.normal(size=(3, 64)))
        U, s, VH, r = decomp.svd_truncated_masked_eig(
            x, max_bond=32, cutoff=0.0, absorb="right"
        )
        # columns past the surviving rank are zero-masked; the kept
        # ones must be exactly orthonormal
        k = int(r)
        Uk = np.asarray(U)[:, :k]
        assert np.allclose(Uk.T.conj() @ Uk, np.eye(k), atol=1e-10)


class TestRankDeficientQR:
    """TPU's QR kernel loses orthogonality catastrophically on
    (near-)rank-deficient inputs (observed max|Q^T Q - I| = 39 on a
    rank-38/256 DMRG site matrix); ``safe_qr`` therefore runs a
    reorthogonalization pass on TPU. These tests pin the contract on
    every backend: orthonormal Q and exact reconstruction even for
    exactly singular inputs (which masked truncation makes routine)."""

    @pytest.mark.parametrize("m,n,rank", [
        (64, 64, 9), (128, 64, 11), (64, 128, 7),
    ])
    def test_exactly_rank_deficient(self, m, n, rank):
        rng = np.random.default_rng(7)
        x = (rng.standard_normal((m, rank))
             @ rng.standard_normal((rank, n))).astype(np.float32)
        k = min(m, n)
        Q, R = decomp.safe_qr(jnp.asarray(x))
        assert np.abs(
            np.asarray(Q).T @ np.asarray(Q) - np.eye(k)
        ).max() < 1e-4
        assert np.abs(np.asarray(Q @ R) - x).max() < 1e-4

    def test_zero_padded_spectrum(self):
        # spectrum with an exactly-zero tail, like a masked-truncation
        # DMRG tensor
        rng = np.random.default_rng(3)
        U, _ = np.linalg.qr(rng.standard_normal((96, 96)))
        V, _ = np.linalg.qr(rng.standard_normal((96, 96)))
        s = np.concatenate([np.exp(-np.linspace(0, 10, 40)),
                            np.zeros(56)])
        x = ((U * s) @ V.T).astype(np.float32)
        Q, R = decomp.safe_qr(jnp.asarray(x))
        assert np.abs(
            np.asarray(Q).T @ np.asarray(Q) - np.eye(96)
        ).max() < 1e-4
        assert np.abs(np.asarray(Q @ R) - x).max() < 1e-4
