"""Host-side executor fan-out (SURVEY §2 parallelism items 2, 7, 9):
thread pools, parallel local-expectation evaluation, and multi-loss
handling in the optimizer."""

import numpy as np
import pytest

import quimb_tpu as qu
import quimb_tpu.tensor as qtn
from quimb_tpu.parallel import can_use_mpi_pool, get_mpi_pool, get_thread_pool


class TestPools:
    def test_thread_pool_submit(self):
        pool = get_thread_pool(2)
        futs = [pool.submit(lambda x: x * x, i) for i in range(8)]
        assert [f.result() for f in futs] == [i * i for i in range(8)]

    def test_mpi_pool_is_shim(self):
        # TPU build: no MPI spawn semantics — host pool stands in
        assert can_use_mpi_pool() is False
        pool = get_mpi_pool(2)
        assert pool.submit(sum, (1, 2, 3)).result() == 6

    def test_thread_pool_cached(self):
        assert get_thread_pool(3) is get_thread_pool(3)


class TestParallelLocalExpectation:
    @pytest.fixture(scope="class")
    def psi_terms(self):
        psi = qtn.TN_from_edges_rand(
            [(0, 1), (1, 2), (2, 3), (3, 0)], D=3, phys_dim=2, seed=7,
            dtype="float64",
        )
        H2 = np.asarray(qu.ham_heis(2, cyclic=False, sparse=False))
        terms = {
            (0, 1): H2, (1, 2): H2, (2, 3): H2, (3, 0): H2,
        }
        return psi, terms

    def test_executor_matches_serial(self, psi_terms):
        psi, terms = psi_terms
        e0 = psi.compute_local_expectation(terms, method="exact")
        pool = get_thread_pool(2)
        e1 = psi.compute_local_expectation(
            terms, method="exact", executor=pool,
        )
        assert complex(e1) == pytest.approx(complex(e0), rel=1e-10)

    def test_executor_cluster_matches_serial(self, psi_terms):
        psi, terms = psi_terms
        e0 = psi.compute_local_expectation(terms, method="cluster")
        e1 = psi.compute_local_expectation(
            terms, method="cluster", executor=get_thread_pool(2),
        )
        assert complex(e1) == pytest.approx(complex(e0), rel=1e-8)

    def test_executor_return_all(self, psi_terms):
        psi, terms = psi_terms
        r = psi.compute_local_expectation(
            terms, method="exact", return_all=True,
            executor=get_thread_pool(2),
        )
        assert set(r) == set(terms)


class TestMultiLossHandler:
    def test_eager_executor_sum(self):
        from quimb_tpu.tensor import MultiLossHandler

        mps = qtn.MPS_rand_state(6, 4, seed=1, dtype="float64")

        def l1(tn):
            return (tn @ tn.H).real

        def l2(tn):
            return 2.0 * (tn @ tn.H).real

        h = MultiLossHandler([l1, l2], executor=get_thread_pool(2))
        got = float(h(mps))
        want = float(l1(mps)) + float(l2(mps))
        assert got == pytest.approx(want, rel=1e-12)

    def test_optimizer_accepts_loss_list(self):
        # two terms: norm regularization + energy-like overlap; the
        # fused multi-loss graph must optimize identically to the
        # hand-summed loss
        target = qtn.MPS_rand_state(5, 3, seed=3, dtype="float64")
        psi0 = qtn.MPS_rand_state(5, 3, seed=4, dtype="float64")

        def loss_overlap(tn):
            return -((tn @ target.H).real ** 2)

        def loss_norm(tn):
            return ((tn @ tn.H).real - 1.0) ** 2

        opt_list = qtn.TNOptimizer(
            psi0.copy(), [loss_overlap, loss_norm],
            optimizer="adam", learning_rate=0.05, progbar=False,
        )
        opt_sum = qtn.TNOptimizer(
            psi0.copy(), lambda tn: loss_overlap(tn) + loss_norm(tn),
            optimizer="adam", learning_rate=0.05, progbar=False,
        )
        opt_list.optimize(10)
        opt_sum.optimize(10)
        assert opt_list.loss == pytest.approx(opt_sum.loss, rel=1e-8)
