"""Fused sandwich-matvec Pallas kernel vs the einsum reference.

On this CPU test box the kernel runs in interpreter mode; on TPU the
same kernel compiles via Mosaic (selected automatically in
``_local_solve_2site``/``_local_solve_1site``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quimb_tpu.ops import pallas_kernels as pk


@pytest.mark.skipif(not pk.HAS_PALLAS, reason="pallas unavailable")
class TestSandwichMatvec:
    @pytest.mark.parametrize("w,M,K1,K2,N", [
        (5, 16, 16, 24, 24),
        (3, 8, 8, 8, 8),
        (1, 32, 16, 16, 8),
    ])
    def test_matches_einsum(self, w, M, K1, K2, N):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(w, M, K1)), dtype="float32")
        th = jnp.asarray(rng.normal(size=(K1, K2)), dtype="float32")
        b = jnp.asarray(rng.normal(size=(w, K2, N)), dtype="float32")
        got = pk.sandwich_matvec(a, th, b, interpret=True)
        want = pk.sandwich_matvec_reference(a, th, b)
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=1e-4, rtol=1e-4)

    def test_matches_heff_2site(self):
        """The stacked (A, B) layouts built in _local_solve_2site give
        the same matvec as the production deep-K einsum chain."""
        from quimb_tpu.tensor.tn1d.dmrg import (
            _fuse_lw, _fuse_wr, _heff_matvec_2site,
        )

        rng = np.random.default_rng(1)
        cl = cr = 6
        d, w = 2, 5
        L = jnp.asarray(rng.normal(size=(cl, w, cl)), dtype="float32")
        W1 = jnp.asarray(rng.normal(size=(w, w, d, d)), dtype="float32")
        W2 = jnp.asarray(rng.normal(size=(w, w, d, d)), dtype="float32")
        R = jnp.asarray(rng.normal(size=(cr, w, cr)), dtype="float32")
        theta = jnp.asarray(
            rng.normal(size=(cl, d, d, cr)), dtype="float32"
        )

        want = _heff_matvec_2site(
            _fuse_lw(L, W1), _fuse_wr(W2, R), theta
        )

        M = K1 = cl * d
        K2 = N = d * cr
        A = jnp.reshape(
            jnp.einsum("awk,wxup->xaukp", L, W1), (w, M, K1)
        )
        B = jnp.reshape(
            jnp.einsum("xyvq,byr->xqrvb", W2, R), (w, K2, N)
        )
        got = jnp.reshape(
            pk.sandwich_matvec(
                A, jnp.reshape(theta, (K1, K2)), B, interpret=True
            ),
            theta.shape,
        )
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=1e-4, rtol=1e-4)

    def test_matches_heff_1site(self):
        from quimb_tpu.tensor.tn1d.dmrg import (
            _fuse_lw, _heff_matvec_1site,
        )

        rng = np.random.default_rng(2)
        cl = cr = 5
        d, w = 2, 4
        L = jnp.asarray(rng.normal(size=(cl, w, cl)), dtype="float32")
        W = jnp.asarray(rng.normal(size=(w, w, d, d)), dtype="float32")
        R = jnp.asarray(rng.normal(size=(cr, w, cr)), dtype="float32")
        theta = jnp.asarray(rng.normal(size=(cl, d, cr)),
                            dtype="float32")

        want = _heff_matvec_1site(_fuse_lw(L, W), R, theta)

        M = K1 = cl * d
        A = jnp.reshape(
            jnp.einsum("awk,wxup->xaukp", L, W), (w, M, K1)
        )
        B = jnp.transpose(R, (1, 2, 0))
        got = jnp.reshape(
            pk.sandwich_matvec(
                A, jnp.reshape(theta, (K1, cr)), B, interpret=True
            ),
            theta.shape,
        )
        assert np.allclose(np.asarray(got), np.asarray(want),
                           atol=1e-4, rtol=1e-4)

    def test_vmem_gate(self):
        # bench config fits; an oversized config must not
        assert pk.sandwich_fits_vmem(5, 512, 512, 512, 512, 4)
        assert not pk.sandwich_fits_vmem(5, 4096, 4096, 4096, 4096, 4)

    def test_kernel_disabled_off_tpu(self):
        # on this CPU box the production gate must route to einsum
        assert not pk.use_sandwich_kernel("float32", 5, 512, 512,
                                          512, 512)
