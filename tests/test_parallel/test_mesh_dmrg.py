"""Mesh-sharded DMRG: the chi axes of site tensors, environments and
bulk stacks are distributed over a 2D device mesh
(``DMRG.shard_onto``), XLA SPMD inserting the collectives. The
reference's only scale-out is SLEPc/MPI row slabs for *exact* linalg
(slepc_linalg.py:105); sharding the DMRG sweep itself is the TPU-native
analogue that lifts the chi ceiling above one chip's HBM.
"""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.parallel.mesh import get_mesh_2d, mesh_put


class TestMeshPut:
    def test_divisible_axes_sharded(self):
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        m = get_mesh_2d()
        x = mesh_put(jnp.ones((16, 3, 16)), m, P("dl", None, "dr"))
        spec = x.sharding.spec
        assert spec[0] == "dl" and spec[2] == "dr"

    def test_indivisible_axis_replicated(self):
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        m = get_mesh_2d()
        # first axis size 1 cannot shard over 4 devices -> replicated
        x = mesh_put(jnp.ones((1, 3, 16)), m, P("dl", None, "dr"))
        assert x.sharding.spec[0] is None


class TestShardedDMRG:
    def test_sharded_sweeps_match_single_device(self):
        L, CHI = 24, 8
        H = qtn.MPO_ham_heis(L)
        p0 = qtn.MPS_rand_state(L, CHI, seed=7, dtype="float64")

        ens = {}
        for shard in (False, True):
            dmrg = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0,
                             p0=p0.copy())
            if shard:
                dmrg.shard_onto(get_mesh_2d())
            es = [
                dmrg.sweep("R" if k % 2 == 0 else "L", max_bond=CHI,
                           cutoff=0.0, canonize=(k == 0))
                for k in range(3)
            ]
            ens[shard] = es
        assert np.allclose(ens[False], ens[True], atol=1e-9)

    def test_bulk_arrays_really_sharded(self):
        L, CHI = 24, 8
        H = qtn.MPO_ham_heis(L)
        dmrg = qtn.DMRG2(
            H, bond_dims=CHI, cutoffs=0.0,
            p0=qtn.MPS_rand_state(L, CHI, seed=3, dtype="float64"),
        )
        mesh = get_mesh_2d()
        dmrg.shard_onto(mesh)
        en_sweep = dmrg.sweep("R", max_bond=CHI, cutoff=0.0)
        a, b = dmrg._uniform_bulk_range()
        Abulk, _ = dmrg._get_bulk_stacks(a, b)
        spec = Abulk.sharding.spec
        assert spec[1] == "dl" and spec[3] == "dr"
        # and the state is still a valid MPS reproducing the energy
        psi = dmrg.state
        en = complex(qtn.expec_TN_1D(psi.H, H.apply(psi))).real
        nrm = complex(qtn.expec_TN_1D(psi.H, psi)).real
        assert abs(en / nrm - en_sweep) < 1e-8

    def test_sharded_solve_converges_to_exact(self):
        from quimb_tpu import groundenergy, ham_heis

        L, CHI = 16, 32
        H = qtn.MPO_ham_heis(L)
        dmrg = qtn.DMRG2(
            H, bond_dims=CHI, cutoffs=0.0,
            p0=qtn.MPS_rand_state(L, CHI, seed=11, dtype="float64"),
        )
        dmrg.shard_onto(get_mesh_2d())
        for k in range(8):
            en = dmrg.sweep("R" if k % 2 == 0 else "L",
                            max_bond=CHI, cutoff=0.0,
                            canonize=(k == 0))
        e_exact = float(groundenergy(ham_heis(L, sparse=True)))
        assert abs(en - e_exact) < 1e-6


class TestShardedTEBD:
    def test_sharded_fused_tebd_matches_single_device(self):
        from quimb_tpu.parallel.mesh import get_mesh

        L = 16
        ents = {}
        for shard in (False, True):
            psi0 = qtn.MPS_neel_state(L).astype("complex128")
            tebd = qtn.TEBD(
                psi0, qtn.ham_1d_heis(L),
                split_opts={"max_bond": 16, "cutoff": 1e-12},
                fused=True, progbar=False,
            )
            if shard:
                tebd.shard_onto(get_mesh())
                # the internal B-form stack really is distributed
                Bs, ls = tebd._ensure_vidal()
                assert Bs.sharding.spec[0] == "d"
            es = []
            for k in range(1, 4):
                tebd.update_to(k * 0.1, dt=0.05, order=2,
                               progbar=False)
                es.append(float(tebd.pt.entropy(L // 2)))
            ents[shard] = es
        assert np.allclose(ents[False], ents[True], atol=1e-12)
