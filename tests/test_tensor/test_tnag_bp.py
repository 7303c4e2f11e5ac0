"""Arbitrary-geometry TN + belief propagation tests."""

import numpy as np
import pytest

import quimb_tpu.tensor.belief_propagation as bp
import quimb_tpu.tensor.tnag as tg
from quimb_tpu.core import ham_from_terms
from quimb_tpu.gen.operators import _spin_op_np
from quimb_tpu.tensor.geometry import (
    edges_2d_hexagonal,
    edges_2d_square,
    edges_rand_reg,
    edges_tree_rand,
)


class TestGeometry:
    def test_square_edge_count(self):
        edges = edges_2d_square(3, 4)
        # 3*3 + 2*4 = 17 edges
        assert len(edges) == 3 * 3 + 2 * 4

    def test_hexagonal_degree(self):
        edges = edges_2d_hexagonal(3, 3, cyclic=True)
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        assert all(d == 3 for d in deg.values())

    def test_rand_reg(self):
        edges = edges_rand_reg(10, 3, seed=0)
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        assert all(d == 3 for d in deg.values())

    def test_edge_coloring(self):
        edges = edges_2d_square(3, 3)
        colors = tg.edge_coloring(edges)
        for color in colors:
            sites = [s for e in color for s in e]
            assert len(sites) == len(set(sites))
        assert sum(len(c) for c in colors) == len(edges)


class TestTNGen:
    def test_from_edges_rand(self):
        edges = edges_2d_square(2, 3)
        psi = tg.TN_from_edges_rand(edges, D=3, phys_dim=2, seed=0)
        assert psi.nsites == 6
        assert psi.max_bond() == 3
        assert set(psi.neighbors((0, 0))) == {(0, 1), (1, 0)}

    def test_local_expectation_exact_vs_dense(self):
        edges = [(i, i + 1) for i in range(4)]
        psi = tg.TN_from_edges_rand(edges, D=3, phys_dim=2, seed=0,
                                    dtype="float64")
        S = {s: _spin_op_np(s, 0.5) for s in "xyz"}
        h2 = sum(np.kron(S[s], S[s]) for s in "xyz").real
        ev = complex(
            psi.local_expectation_exact(h2, (1, 2))
        ).real
        terms = [(1.0, (S[s], S[s]), (1, 2)) for s in "xyz"]
        Hd = np.asarray(ham_from_terms(terms, (2,) * 5)).real
        v = np.asarray(psi.to_dense()).reshape(-1)
        expected = float(v @ Hd @ v / (v @ v))
        assert abs(ev - expected) < 1e-10

    def test_gauge_all_simple_preserves_state(self):
        edges = edges_2d_square(2, 2)
        psi = tg.TN_from_edges_rand(edges, D=2, phys_dim=2, seed=1,
                                    dtype="float64")
        d0 = np.asarray(psi.to_dense()).reshape(-1)
        gauges = {}
        tn = psi.gauge_all_simple(max_iterations=20, gauges=gauges)
        # re-absorbing gauges recovers the same state
        tn.gauge_simple_insert(gauges)
        d1 = np.asarray(tn.to_dense()).reshape(-1)
        assert np.allclose(
            d0 / np.linalg.norm(d0), d1 / np.linalg.norm(d1),
            atol=1e-8,
        ) or np.allclose(
            d0 / np.linalg.norm(d0), -d1 / np.linalg.norm(d1),
            atol=1e-8,
        )


class TestSimpleUpdateGen:
    def test_2x2_heis_groundstate(self):
        edges = edges_2d_square(2, 2)
        psi0 = tg.TN_from_edges_rand(edges, D=2, phys_dim=2, seed=1,
                                     dtype="float64")
        ham = tg.ham_gen_heis(edges)
        su = tg.SimpleUpdateGen(
            psi0, ham, D=3, compute_energy_final=False,
            compute_energy_opts={"method": "exact"},
        )
        for tau in (0.3, 0.1, 0.03):
            su.evolve(30, tau=tau)
        E = su.compute_energy()
        S = {s: _spin_op_np(s, 0.5) for s in "xyz"}
        sites = sorted(set(s for e in edges for s in e))
        smap = {s: k for k, s in enumerate(sites)}
        terms = [
            (1.0, (S[s], S[s]), (smap[a], smap[b]))
            for (a, b) in edges for s in "xyz"
        ]
        w0 = np.linalg.eigvalsh(
            np.asarray(ham_from_terms(terms, (2,) * 4)).real
        )[0]
        assert abs(E - w0) / abs(w0) < 0.05


class TestBP:
    def test_d1bp_exact_on_tree(self):
        edges = edges_tree_rand(12, seed=0)
        tn = tg.TN_classical_partition_function_from_edges(
            edges, beta=0.3
        )
        Z = float(tn.contract(...))
        Zbp = float(np.real(bp.contract_d1bp(tn.copy())))
        assert abs(Zbp - Z) / Z < 1e-10

    def test_hv1bp_matches_d1bp(self):
        edges = edges_2d_square(3, 3)
        tn = tg.TN_classical_partition_function_from_edges(
            edges, beta=0.25
        )
        Z1 = float(np.real(bp.contract_d1bp(tn.copy())))
        Z2 = float(np.real(bp.contract_hv1bp(tn.copy())))
        assert abs(Z1 - Z2) / abs(Z1) < 1e-4

    def test_d1bp_loopy_close(self):
        edges = edges_2d_square(4, 4)
        tn = tg.TN_classical_partition_function_from_edges(
            edges, beta=0.2
        )
        Z = float(tn.contract(...))
        Zbp = float(np.real(bp.contract_d1bp(tn.copy())))
        assert abs(Zbp - Z) / Z < 0.05

    def test_d2bp_peps_expectation(self):
        import quimb_tpu.tensor.tn2d as t2
        from quimb_tpu.core import ikron
        from quimb_tpu.gen.operators import pauli

        psi = t2.PEPS_rand(3, 3, 2, seed=0, dtype="float64")
        d2 = bp.D2BP(psi)
        d2.run()
        Z = np.asarray(pauli("Z")).real
        ev_bp = complex(d2.local_expectation(Z, ((1, 1),))).real
        v = np.asarray(psi.to_dense()).reshape(-1)
        O = np.asarray(ikron(Z, (2,) * 9, 4)).real
        ev_ex = float(v @ O @ v / (v @ v))
        assert abs(ev_bp - ev_ex) < 0.1

    def test_d2bp_gauges_compress(self):
        import quimb_tpu.tensor.tn2d as t2

        psi = t2.PEPS_rand(3, 3, 3, seed=1, dtype="float64")
        gauges = bp.gauge_d2bp(psi)
        assert all(float(s[0]) > 0 for s in gauges.values())
        # compression to smaller bond runs and reduces bonds
        psic = bp.compress_d2bp(psi, max_bond=2)
        assert psic.max_bond() == 2

    def test_hv1bp_hyper(self):
        # hyper-TN partition function (site inds shared by many edges)
        edges = edges_tree_rand(8, seed=1)
        htn = tg.HTN_classical_partition_function_from_edges(
            edges, beta=0.3, h=0.1
        )
        Z = float(htn.contract(...))
        Zbp = float(np.real(bp.contract_hv1bp(htn.copy())))
        assert abs(Zbp - Z) / Z < 1e-6


class TestHD1GBP:
    def test_tree_exact(self):
        import itertools

        from quimb_tpu.tensor.belief_propagation import HD1GBP
        from quimb_tpu.tensor.tnag.builders import (
            HTN_classical_partition_function_from_edges,
        )

        edges = [(0, 1), (1, 2), (1, 3), (3, 4)]
        beta = 0.4
        tn = HTN_classical_partition_function_from_edges(
            edges, beta=beta, site_ind_id="s{}"
        )
        Z = 0.0
        for cfg in itertools.product([1, -1], repeat=5):
            sv = dict(zip(range(5), cfg))
            Z += np.exp(beta * sum(sv[a] * sv[b] for a, b in edges))
        bp = HD1GBP(tn, [{tid} for tid in tn.tensor_map], damping=0.0)
        bp.run(max_iterations=100, tol=1e-12)
        zg = complex(bp.contract()).real
        assert abs(zg - Z) / Z < 1e-12

    def test_plaquettes_beat_plain_bp(self):
        import itertools

        from quimb_tpu.tensor.belief_propagation import (
            HD1GBP,
            contract_d1bp,
        )
        from quimb_tpu.tensor.tnag.builders import (
            HTN_classical_partition_function_from_edges,
        )

        L, beta = 3, 0.4
        edges = []
        for i in range(L):
            for j in range(L):
                if j + 1 < L:
                    edges.append(((i, j), (i, j + 1)))
                if i + 1 < L:
                    edges.append(((i, j), (i + 1, j)))
        tn = HTN_classical_partition_function_from_edges(
            edges, beta=beta, site_ind_id="s{}"
        )
        sites = sorted({s for e in edges for s in e})
        Z = 0.0
        for cfg in itertools.product([1, -1], repeat=9):
            sv = dict(zip(sites, cfg))
            Z += np.exp(beta * sum(sv[a] * sv[b] for a, b in edges))
        err_bp = abs(
            complex(contract_d1bp(tn.copy(), tol=1e-12)).real - Z
        ) / Z

        tidmap = {
            frozenset(t.inds): tid for tid, t in tn.tensor_map.items()
        }

        def sind(s):
            return f"s{s}"

        regions = []
        for i in range(2):
            for j in range(2):
                fe = [((i, j), (i, j + 1)),
                      ((i + 1, j), (i + 1, j + 1)),
                      ((i, j), (i + 1, j)),
                      ((i, j + 1), (i + 1, j + 1))]
                regions.append({
                    tidmap[frozenset((sind(a), sind(b)))] for a, b in fe
                })
        bp = HD1GBP(tn, regions, damping=0.2)
        bp.run(max_iterations=500, tol=1e-12)
        err_gbp = abs(complex(bp.contract()).real - Z) / Z
        assert err_gbp < 1e-3
        assert err_gbp < 0.05 * err_bp


class TestCombinatorialBuilders:
    def test_cnf_count(self):
        import itertools

        import quimb_tpu.tensor.tnag as tg

        clauses = [(1, 2), (-1, 3), (2, -3)]
        tn = tg.HTN_from_clauses(clauses)
        cnt = float(np.real(complex(tn.contract(...))))
        bf = 0
        for a in itertools.product([0, 1], repeat=3):
            x = {1: a[0], 2: a[1], 3: a[2]}
            bf += bool(
                (x[1] or x[2])
                and ((not x[1]) or x[3])
                and (x[2] or (not x[3]))
            )
        assert cnt == bf

    def test_dimer_coverings(self):
        import quimb_tpu.tensor.tnag as tg

        tn = tg.TN_dimer_covering_from_edges(
            [(0, 1), (1, 2), (2, 3), (3, 0)]
        )
        assert float(np.real(complex(tn.contract(...)))) == 2.0

    def test_ising_3d(self):
        import itertools as it

        import quimb_tpu.tensor.tnag as tg

        beta = 0.25
        tn = tg.TN3D_classical_ising_partition_function(2, 2, 2, beta)
        Z = float(np.real(complex(tn.contract(...))))
        edges = []
        for i, j, k in it.product(range(2), repeat=3):
            for d, nxt in enumerate(
                ((i + 1, j, k), (i, j + 1, k), (i, j, k + 1))
            ):
                if nxt[d] < 2:
                    edges.append(((i, j, k), nxt))
        sites = sorted({s for e in edges for s in e})
        Zb = 0.0
        for cfg in it.product([1, -1], repeat=8):
            sv = dict(zip(sites, cfg))
            Zb += np.exp(beta * sum(sv[a] * sv[b] for a, b in edges))
        assert abs(Z - Zb) / Zb < 1e-10

    def test_estimate_rank(self):
        import jax.numpy as jnp

        from quimb_tpu.ops.decomp import estimate_rank

        rng = np.random.default_rng(0)
        A = rng.standard_normal((120, 7)) @ rng.standard_normal((7, 90))
        assert estimate_rank(jnp.asarray(A), eps=1e-8) == 7


class TestLoopExpansions:
    def _su_state(self):
        import quimb_tpu.tensor.tnag as tg
        from quimb_tpu.tensor.tnag.tebd import SimpleUpdateGen

        edges = [((i, j), (i, j + 1)) for i in range(2)
                 for j in range(2)]
        edges += [((0, j), (1, j)) for j in range(3)]
        ham = tg.ham_gen_heis(edges)
        psi0 = tg.TN_from_edges_rand(
            edges, D=2, phys_dim=2, seed=1, dtype="float64"
        )
        su = SimpleUpdateGen(psi0, ham, D=3,
                             compute_energy_final=False)
        su.evolve(15, tau=0.3)
        su.evolve(15, tau=0.1)
        return su.get_state(), ham

    def test_expectation_gloop_expand_beats_cluster(self):
        psi, ham = self._su_state()
        E_exact = float(np.real(psi.compute_local_expectation(
            ham.terms, method="exact"
        )))
        E_clust = float(np.real(psi.compute_local_expectation(
            ham.terms, method="cluster"
        )))
        E_gloop = float(np.real(psi.compute_local_expectation(
            ham.terms, method="gloop-expand", max_size=6
        )))
        assert abs(E_gloop - E_exact) < 1e-8
        assert abs(E_gloop - E_exact) < abs(E_clust - E_exact)

    def test_norm_gloop_expand(self):
        import math

        psi, _ = self._su_state()
        ln_exact = math.log(
            float(np.linalg.norm(np.asarray(psi.to_dense())))
        )
        ln_bethe = psi.norm_gloop_expand(max_size=2)
        ln_gloop = psi.norm_gloop_expand(max_size=6)
        assert abs(ln_gloop - ln_exact) < 1e-8
        assert abs(ln_gloop - ln_exact) < abs(ln_bethe - ln_exact)


class TestAGCompress:
    @pytest.mark.parametrize(
        "method",
        ["superorthogonal", "local-early", "local-late", "projector"],
    )
    def test_pad_and_recompress(self, method):
        import jax.numpy as jnp

        import quimb_tpu.tensor.tnag as tg

        edges = [((i, j), (i, j + 1)) for i in range(2)
                 for j in range(2)]
        edges += [((0, j), (1, j)) for j in range(3)]
        psi2 = tg.TN_from_edges_rand(
            edges, D=2, phys_dim=2, seed=0, dtype="float64"
        )
        psi4 = psi2.copy()
        for ix in tuple(psi4.inner_inds()):
            tids = tuple(psi4.ind_map[ix])
            if len(tids) != 2:
                continue
            for tid in tids:
                t = psi4.tensor_map[tid]
                pads = [(0, 0)] * t.ndim
                pads[t.inds.index(ix)] = (0, 2)
                t.modify(data=jnp.pad(t.data, pads))
        out = tg.tensor_network_ag_compress(
            psi4, max_bond=2, method=method
        )
        assert out.max_bond() == 2
        v = np.asarray(out.to_dense()).reshape(-1)
        r = np.asarray(psi2.to_dense()).reshape(-1)
        fid = abs(
            np.vdot(v, r) / (np.linalg.norm(v) * np.linalg.norm(r))
        )
        assert fid > 1 - 1e-8


class TestMPS1BP:
    def test_peps_norm_matches_d2bp_fixed_point(self):
        import quimb_tpu.tensor as tg
        from quimb_tpu.tensor.belief_propagation import (
            D2BP, MPS1BP,
        )

        peps = tg.PEPS_rand(3, 3, 2, seed=0, dtype="float64")
        norm = peps.make_norm(layer_tags=("KET", "BRA"))
        z_exact = float(np.real(np.asarray(norm.contract())))

        bp = MPS1BP(norm, max_bond=8, layer_tags=("KET", "BRA"),
                    site_tags=norm.site_tags)
        bp.run(max_iterations=50, tol=1e-8)
        z_bp = complex(bp.contract()).real

        d2 = D2BP(peps)
        d2.run()
        z_d2 = float(np.real(np.asarray(d2.contract())))

        # with 2 layers the MPS-message fixed point coincides with
        # the D2BP fixed point; both approximate the exact value
        assert z_bp == pytest.approx(z_d2, rel=1e-6)
        assert z_bp == pytest.approx(z_exact, rel=0.2)

    def test_three_layer_sandwich(self):
        import quimb_tpu.tensor as tg
        from quimb_tpu.tensor.belief_propagation import MPS1BP

        # <psi|O|psi> with O a bond-1 product PEPO (a positive
        # diagonal operator keeps the sandwich BP-friendly):
        # 3-layer structure
        peps = tg.PEPS_rand(3, 3, 2, seed=1, dtype="float64")
        X = np.diag([1.0, 0.5])
        pepo = tg.PEPO_product_operator(
            [[X for _ in range(3)] for _ in range(3)]
        )
        ket = peps.copy()
        ket.add_tag("KET")
        op = pepo.copy()
        op.add_tag("OP")
        # align: ket k{i,j} -> op upper; op lower -> bra
        op.reindex_({op.lower_ind(i, j): f"m{i},{j}"
                     for i in range(3) for j in range(3)})
        bra = peps.conj()
        bra.add_tag("BRA")
        bra.reindex_({bra.site_ind(i, j): f"m{i},{j}"
                      for i in range(3) for j in range(3)})
        bra.mangle_inner_("*")
        tn = tg.TensorNetwork((ket, op, bra))
        z_exact = float(np.real(np.asarray(tn.contract())))

        site_tags = tuple(
            f"I{i},{j}" for i in range(3) for j in range(3)
        )
        bp = MPS1BP(tn, max_bond=8, layer_tags=("KET", "OP", "BRA"),
                    site_tags=site_tags)
        bp.run(max_iterations=60, tol=1e-8)
        z_bp = complex(bp.contract()).real
        assert z_bp == pytest.approx(z_exact, rel=0.25)


class TestBPSamplingCompression:
    CLAUSES = [(1, 2, -3), (-1, 3), (2, 3)]

    @staticmethod
    def _qtn():
        import quimb_tpu.tensor as qtn

        return qtn

    def _is_sat(self, config):
        vals = {int(k[1:]): v for k, v in config.items()}
        return all(
            any((vals[abs(v)] == 1) == (v > 0) for v in c)
            for c in self.CLAUSES
        )

    def test_sample_hd1bp_satisfies(self):
        from quimb_tpu.tensor.belief_propagation import sample_hd1bp

        htn = self._qtn().HTN_from_clauses(self.CLAUSES, mode="dense")
        for seed in range(3):
            config, _, omega = sample_hd1bp(
                htn, seed=seed, max_iterations=100, tol=1e-8
            )
            assert self._is_sat(config)
            assert 0 < omega <= 1

    def test_sample_hv1bp_satisfies(self):
        from quimb_tpu.tensor.belief_propagation import sample_hv1bp

        htn = self._qtn().HTN_from_clauses(self.CLAUSES, mode="dense")
        # BP marginals are approximate on loopy instances: a small
        # fraction of samples can be unsatisfying, so check a batch
        n_sat = 0
        for seed in range(6):
            config, _, _ = sample_hv1bp(
                htn, seed=seed, max_iterations=200, tol=1e-10
            )
            n_sat += self._is_sat(config)
        assert n_sat >= 3

    def test_sample_d2bp(self):
        from quimb_tpu.tensor.belief_propagation import sample_d2bp

        peps = self._qtn().PEPS_rand(2, 3, 2, seed=0, dtype="float64")
        cfg, tncfg, omega = sample_d2bp(
            peps, seed=1, max_iterations=60
        )
        assert len(cfg) == 6
        assert 0 < omega <= 1

    def test_compress_l2bp_matches_svd_on_mps(self):
        from quimb_tpu.tensor.belief_propagation import compress_l2bp

        psi = self._qtn().MPS_rand_state(8, 12, seed=3, dtype="float64")
        psi.normalize()
        out = compress_l2bp(psi, max_bond=8)
        assert out.max_bond() <= 8
        vout = np.asarray(out.to_dense()).ravel()
        f = abs(
            np.vdot(vout, np.asarray(psi.to_dense()).ravel())
        ) / np.linalg.norm(vout)
        ref = psi.copy()
        ref.compress(max_bond=8)
        vref = np.asarray(ref.to_dense()).ravel()
        fr = abs(
            np.vdot(vref, np.asarray(psi.to_dense()).ravel())
        ) / np.linalg.norm(vref)
        # BP environments are exact on a chain: same as optimal
        assert f == pytest.approx(fr, abs=1e-8)

    def test_region_counts_and_combine(self):
        from quimb_tpu.tensor.belief_propagation import (
            combine_local_contractions,
            gen_region_counts,
        )

        counts = gen_region_counts([(0, 1, 2), (1, 2, 3)])
        assert counts[frozenset((0, 1, 2))] == 1
        assert counts[frozenset((1, 2, 3))] == 1
        assert counts[frozenset((1, 2))] == -1
        m, e = combine_local_contractions(
            [(2.0, 1), (4.0, -1)], strip_exponent=True
        )
        assert m * 10**e == pytest.approx(0.5)
