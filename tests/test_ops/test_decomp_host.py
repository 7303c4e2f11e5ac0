"""Host (numpy) split drivers must match the device drivers exactly.

The host path runs during setup-time graph surgery (circuit building,
simplification) under the ``numpy`` contract backend so that no tiny
split ever dispatches through the TPU tunnel (reference decomp drivers
``svd_truncated`` decomp.py:761, ``qr_stabilized`` :1985 — per-backend
registration is the reference's own pattern, decomp.py:444).
"""

import numpy as np
import pytest

from quimb_tpu.ops import decomp
from quimb_tpu.ops.contraction import contract_backend


def _rand(m, n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, n))
    if "complex" in dtype:
        x = x + 1j * rng.normal(size=(m, n))
    return x.astype(dtype)


class TestHostSplitMatchesDevice:
    @pytest.mark.parametrize("dtype", ["float64", "complex128"])
    @pytest.mark.parametrize("absorb", [None, "both", "left", "right"])
    def test_svd_absorb_modes(self, dtype, absorb):
        x = _rand(12, 8, dtype)
        with contract_backend("numpy"):
            host = decomp.array_split(x, method="svd", absorb=absorb)
        dev = decomp.array_split(np.asarray(x), method="svd",
                                 absorb=absorb)
        for h, d in zip(host, dev):
            if h is None:
                assert d is None
                continue
            assert isinstance(h, np.ndarray)
            # compare the gauge-invariant products
        # reconstruction must agree with x in all modes
        def recon(parts):
            L, s, R = parts
            if s is not None:
                return np.asarray(L) @ np.diag(np.asarray(s)) @ np.asarray(R)
            return np.asarray(L) @ np.asarray(R)

        if absorb is not None:
            np.testing.assert_allclose(recon(host), x, atol=1e-10)
            np.testing.assert_allclose(recon(dev), x, atol=1e-10)
        else:
            np.testing.assert_allclose(recon(host), x, atol=1e-10)

    @pytest.mark.parametrize("cutoff_mode", ["abs", "rel", "sum2",
                                             "rsum2", "sum1", "rsum1"])
    def test_svd_cutoff_modes_same_rank(self, cutoff_mode):
        # construct a spectrum with a clear gap
        rng = np.random.default_rng(1)
        U, _ = np.linalg.qr(rng.normal(size=(16, 16)))
        V, _ = np.linalg.qr(rng.normal(size=(16, 16)))
        s = np.array([2.0, 1.5, 1.0, 0.5] + [1e-8] * 12)
        x = (U * s) @ V.T
        cutoff = 1e-4
        with contract_backend("numpy"):
            hL, _, hR = decomp.array_split(
                x, method="svd", cutoff=cutoff, cutoff_mode=cutoff_mode,
            )
        dL, _, dR = decomp.array_split(
            np.asarray(x), method="svd", cutoff=cutoff,
            cutoff_mode=cutoff_mode,
        )
        assert hL.shape == tuple(dL.shape)
        assert hL.shape[1] == 4
        np.testing.assert_allclose(hL @ hR, np.asarray(dL) @ np.asarray(dR),
                                   atol=1e-8)

    def test_svd_max_bond_and_renorm(self):
        x = _rand(10, 10, "float64", seed=3)
        with contract_backend("numpy"):
            hL, _, hR = decomp.array_split(
                x, method="svd", max_bond=4, cutoff=1e-30, renorm=True,
            )
        dL, _, dR = decomp.array_split(
            np.asarray(x), method="svd", max_bond=4, cutoff=1e-30,
            renorm=True,
        )
        assert hL.shape == (10, 4)
        # renorm preserves the frobenius norm
        np.testing.assert_allclose(
            np.linalg.norm(hL @ hR), np.linalg.norm(x), rtol=1e-10
        )
        np.testing.assert_allclose(hL @ hR, np.asarray(dL) @ np.asarray(dR),
                                   atol=1e-8)

    def test_svd_info_error(self):
        x = _rand(9, 9, "float64", seed=4)
        info_h, info_d = {"error": None}, {"error": None}
        with contract_backend("numpy"):
            decomp.array_split(x, method="svd", max_bond=3,
                               cutoff=1e-30, info=info_h)
        decomp.array_split(np.asarray(x), method="svd", max_bond=3,
                           cutoff=1e-30, info=info_d)
        assert info_h["error"] == pytest.approx(info_d["error"], rel=1e-6)
        assert info_h["error"] > 0

    @pytest.mark.parametrize("dtype", ["float64", "complex128"])
    def test_qr_and_lq(self, dtype):
        x = _rand(8, 6, dtype, seed=5)
        with contract_backend("numpy"):
            Q, s, R = decomp.array_split(x, method="qr")
            L2, s2, Q2 = decomp.array_split(x, method="lq")
        assert s is None and s2 is None
        assert isinstance(Q, np.ndarray)
        np.testing.assert_allclose(Q @ R, x, atol=1e-10)
        np.testing.assert_allclose(L2 @ Q2, x, atol=1e-10)
        # Q column-isometric, R diag real-positive (stabilized gauge)
        np.testing.assert_allclose(Q.conj().T @ Q, np.eye(6), atol=1e-10)
        assert np.all(np.diagonal(R).real > -1e-12)
        assert np.allclose(np.diagonal(R).imag, 0, atol=1e-12)
        # matches the device driver's gauge exactly
        dQ, _, dR = decomp.array_split(np.asarray(x), method="qr")
        np.testing.assert_allclose(Q, np.asarray(dQ), atol=1e-8)
        np.testing.assert_allclose(R, np.asarray(dR), atol=1e-8)

    def test_device_backend_still_returns_device_arrays(self):
        import jax

        x = _rand(6, 6, "float64", seed=6)
        L, _, R = decomp.array_split(x, method="svd")
        assert isinstance(L, jax.Array)
