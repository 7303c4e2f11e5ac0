"""Distributed (device-mesh) kernel tests — run on the virtual
8-device CPU mesh (the reference tests multi-process behavior by
re-running under an MPI launcher; here the mesh IS available in-process,
SURVEY §4 note)."""

import jax
import numpy as np
import pytest
import scipy.linalg as sla

import quimb_tpu as qu
from quimb_tpu.parallel import (
    ShardedSparseHam,
    approx_spectral_sharded,
    contract_sliced,
    eigh_lanczos_sharded,
    expm_multiply_sharded,
    get_mesh,
)


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(8, devices=jax.devices("cpu"))


class TestShardedSparseHam:
    def test_matvec_exact(self, mesh):
        H = qu.ham_heis(9, sparse=True)
        Hs = ShardedSparseHam(H, mesh=mesh)
        v = np.random.default_rng(0).standard_normal(2**9)
        y = Hs.to_host(Hs @ v)
        assert np.allclose(y, H @ v, atol=1e-12)

    def test_row_slabs_match_mesh(self, mesh):
        H = qu.ham_heis(8, sparse=True)
        Hs = ShardedSparseHam(H, mesh=mesh)
        assert Hs.n_pad % mesh.devices.size == 0
        # sharded placement
        assert len(Hs.V.sharding.device_set) == 8

    def test_non_power_of_two_dim(self, mesh):
        # dimension not divisible by the mesh: padding must be exact
        import scipy.sparse as sp

        rng = np.random.default_rng(1)
        n = 100
        A = sp.random(n, n, density=0.1, random_state=1)
        A = (A + A.T) / 2
        Hs = ShardedSparseHam(A.tocoo(), mesh=mesh)
        v = rng.standard_normal(n)
        assert np.allclose(Hs.to_host(Hs @ v), A @ v, atol=1e-12)


class TestShardedSolvers:
    def test_groundstate(self, mesh):
        H = qu.ham_heis(10, sparse=True)
        lam, gs = eigh_lanczos_sharded(H, mesh=mesh, ncv=30, restarts=8)
        w0 = np.linalg.eigvalsh(H.toarray())[0]
        assert abs(float(lam) - w0) < 1e-9

    def test_expm(self, mesh):
        H = qu.ham_heis(8, sparse=True)
        v = np.random.default_rng(0).standard_normal(2**8)
        y = expm_multiply_sharded(H, v, t=-0.4, mesh=mesh, ncv=40)
        yex = sla.expm(-0.4 * H.toarray()) @ v
        assert np.allclose(y, yex, atol=1e-10)

    def test_slq(self, mesh):
        rho = qu.partial_trace(
            qu.rand_ket(2**10, seed=1), (2,) * 10, range(5)
        )
        est, err = approx_spectral_sharded(
            np.asarray(rho), lambda x: np.clip(x, 0, None), R=64,
            mesh=mesh, pos=True, seed=7,
        )
        assert abs(est - 1.0) < 0.05


class TestContractSliced:
    def test_matches_direct(self, mesh):
        import quimb_tpu.tensor as qtn

        psi = qtn.MPS_rand_state(10, 8, seed=2, dtype="float64")
        norm = psi.H & psi
        full = complex(norm.contract(...))
        bond = psi.bond(4, 5)
        val = complex(contract_sliced(norm, [bond], mesh=mesh))
        assert abs(val - full) < 1e-10 * abs(full)

    def test_two_sliced_inds(self, mesh):
        import quimb_tpu.tensor as qtn

        psi = qtn.MPS_rand_state(8, 4, seed=3, dtype="float64")
        norm = psi.H & psi
        full = complex(norm.contract(...))
        cuts = [psi.bond(2, 3), psi.bond(5, 6)]
        val = complex(contract_sliced(norm, cuts, mesh=mesh))
        assert abs(val - full) < 1e-10 * abs(full)
