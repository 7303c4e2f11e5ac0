"""Sliced circuit sampling across a device mesh (SURVEY §2
parallelism item 5; reference analogue: cotengra sliced contraction /
``cut_iter`` tensor_core.py:9088, distributed here via shard_map +
psum in ``quimb_tpu.parallel.contract_sliced``)."""

import numpy as np
import pytest

import quimb_tpu.tensor  # noqa: F401  (registers circuit module)
from quimb_tpu.tensor.circuit import Circuit


def build_circ(n=6):
    c = Circuit(n)
    for q in range(n):
        c.h(q)
    for q in range(n - 1):
        c.cx(q, q + 1)
    for q in range(n):
        c.rz(0.25 + 0.1 * q, q)
    for q in range(0, n - 1, 2):
        c.cz(q, q + 1)
    return c


class TestCircuitMesh:
    def test_marginal_matches_single_device(self, mesh8):
        p_mesh = np.asarray(
            build_circ().compute_marginal((0, 1), mesh=mesh8)
        ).reshape(-1)
        p_ser = np.asarray(
            build_circ().compute_marginal((0, 1))
        ).reshape(-1)
        assert p_mesh.shape == (4,)
        assert np.allclose(p_mesh, p_ser, rtol=2e-4, atol=2e-5)
        assert p_mesh.sum() == pytest.approx(1.0, abs=1e-6)

    def test_conditional_marginal_matches(self, mesh8):
        fix = {0: "1", 1: "0"}
        p_mesh = np.asarray(build_circ().compute_marginal(
            (2, 3), fix=fix, mesh=mesh8)).reshape(-1)
        p_ser = np.asarray(build_circ().compute_marginal(
            (2, 3), fix=fix)).reshape(-1)
        assert np.allclose(p_mesh, p_ser, rtol=2e-4, atol=2e-5)

    def test_sample_statistics_match(self, mesh8):
        n = 5
        cm = build_circ(n)
        cs = build_circ(n)
        s_mesh = list(cm.sample(40, seed=3, mesh=mesh8))
        s_ser = list(cs.sample(40, seed=3))
        assert all(len(s) == n for s in s_mesh)
        # identical seeds + identical marginals -> identical samples
        assert s_mesh == s_ser

    def test_contract_sliced_exactness(self, mesh8):
        """A sliced full contraction is an exact partition of the sum."""
        import quimb_tpu.tensor as qtn
        from quimb_tpu.parallel import contract_tn_mesh

        tn = qtn.TN_rand_reg(10, 3, D=3, seed=11, dtype="float32")
        z_ser = complex(tn.contract(...))
        z_mesh = complex(np.asarray(
            contract_tn_mesh(tn, mesh=mesh8, output_inds=())
        ))
        assert z_mesh == pytest.approx(z_ser, rel=1e-4)
