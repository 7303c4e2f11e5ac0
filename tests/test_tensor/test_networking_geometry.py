"""Graph-layer behavior tests (reference
tests/test_tensor/test_networking.py strategy): loops / spanning trees
/ paths / patches / centralities on networks with known structure,
and the lattice edge generators' counts and degrees."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor import networking as nw
from quimb_tpu.tensor import geometry as geo


@pytest.fixture()
def ring6():
    # a 6-ring of tensors (single loop of length 6)
    return qtn.TN_from_edges_rand(
        geo.edges_1d_chain(6, cyclic=True), D=2, seed=0
    )


@pytest.fixture()
def tree7():
    return qtn.TN_from_edges_rand(
        geo.edges_tree_rand(7, seed=1), D=2, seed=1
    )


class TestGraphPredicates:
    def test_istree(self, ring6, tree7):
        assert not nw.istree(ring6)
        assert nw.istree(tree7)

    def test_isconnected_and_subgraphs(self, ring6):
        assert nw.isconnected(ring6)
        two = qtn.TN_from_edges_rand(
            [(0, 1), (2, 3)], D=2, seed=2
        )
        assert not nw.isconnected(two)
        assert len(nw.subgraphs(two)) == 2

    def test_shortest_distances_on_ring(self, ring6):
        tids = sorted(ring6.tensor_map)
        d = nw.compute_shortest_distances(ring6)
        # opposite sites on a 6-ring are 3 apart
        assert d[(tids[0], tids[3])] == 3 or \
            d.get((tids[3], tids[0])) == 3

    def test_path_between_tids(self, ring6):
        tids = sorted(ring6.tensor_map)
        path = nw.get_path_between_tids(ring6, tids[0], tids[3])
        # path object or list of tids spanning 3 steps
        seq = list(getattr(path, "tids", path))
        assert seq[0] == tids[0] and seq[-1] == tids[3]
        assert len(seq) == 4

    def test_tids_are_connected(self, ring6):
        tids = sorted(ring6.tensor_map)
        assert nw.tids_are_connected(ring6, tids[:2])
        # non-adjacent pair is not directly connected
        assert not nw.tids_are_connected(ring6, [tids[0], tids[2]])


class TestLoopsAndPatches:
    def test_gen_loops_ring(self, ring6):
        loops = list(nw.gen_loops(ring6))
        assert len(loops) == 1
        assert len(loops[0]) == 6

    def test_gen_loops_max_length_excludes(self, ring6):
        assert list(nw.gen_loops(ring6, max_loop_length=5)) == []

    def test_gen_loops_tree_empty(self, tree7):
        assert list(nw.gen_loops(tree7)) == []

    def test_gen_patches_cover_all(self, ring6):
        patches = list(nw.gen_patches(ring6, max_size=4))
        covered = set()
        for p in patches:
            covered.update(getattr(p, "tids", p))
        assert covered == set(ring6.tensor_map)

    def test_get_local_patch(self, ring6):
        tids = sorted(ring6.tensor_map)
        patch = nw.get_local_patch(ring6, [tids[0]], max_distance=1)
        # the site plus its two ring neighbors
        assert len(set(getattr(patch, "tids", patch))) == 3

    def test_gen_all_paths_between(self, ring6):
        tids = sorted(ring6.tensor_map)
        paths = list(nw.gen_all_paths_between_tids(
            ring6, tids[0], tids[3]
        ))
        # a ring has exactly two simple paths between opposite sites
        assert len(paths) == 2

    def test_connected_bipartitions_count_tree(self):
        # a path graph of n nodes has n-1 edge-cut bipartitions
        tn = qtn.TN_from_edges_rand(
            geo.edges_1d_chain(4), D=2, seed=3
        )
        bips = list(nw.connected_bipartitions(tn))
        assert len(bips) == 3


class TestSpanAndCentrality:
    def test_tree_span_reaches_all(self, tree7):
        tids = sorted(tree7.tensor_map)
        span = nw.get_tree_span(tree7, tids=[tids[0]])
        touched = {tids[0]}
        for a, b, _ in span:
            touched.add(a)
            touched.add(b)
        assert touched == set(tids)

    def test_centralities_positive_and_center(self):
        # star graph: the hub is the most central
        tn = qtn.TN_from_edges_rand(
            [(0, 1), (0, 2), (0, 3), (0, 4)], D=2, seed=4
        )
        cents = nw.compute_centralities(tn)
        assert all(v > 0 for v in cents.values())
        hub = nw.most_central_tid(tn)
        # the hub has degree 4 — identify by tensor rank
        assert tn.tensor_map[hub].ndim == 4

    def test_hierarchical_grouping_sizes(self, ring6):
        groups = nw.compute_hierarchical_grouping(
            ring6, max_group_size=3
        )
        seen = set()
        for g in groups:
            tids = list(getattr(g, "tids", g))
            assert len(tids) <= 3
            seen.update(tids)
        assert seen == set(ring6.tensor_map)


class TestGeometry:
    @pytest.mark.parametrize("fn,args,nodes,edges", [
        ("edges_1d_chain", (5,), 5, 4),
        ("edges_2d_square", (3, 3), 9, 12),
        ("edges_2d_hexagonal", (2, 2), None, None),
        ("edges_3d_cubic", (2, 2, 2), 8, 12),
    ])
    def test_edge_counts(self, fn, args, nodes, edges):
        es = getattr(geo, fn)(*args)
        vs = set()
        for a, b in es:
            vs.add(a)
            vs.add(b)
        if nodes is not None:
            assert len(vs) == nodes
        if edges is not None:
            assert len(es) == edges

    def test_cyclic_chain_adds_wrap(self):
        assert len(geo.edges_1d_chain(5, cyclic=True)) == 5

    def test_square_cyclic_degree(self):
        es = geo.edges_2d_square(3, 3, cyclic=True)
        from collections import Counter

        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        assert all(v == 4 for v in deg.values())

    def test_kagome_degree(self):
        es = geo.edges_2d_kagome(3, 3)
        from collections import Counter

        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        # interior kagome sites have degree 4
        assert max(deg.values()) == 4

    def test_tree_rand_is_tree(self):
        es = geo.edges_tree_rand(10, seed=5)
        assert len(es) == 9
        tn = qtn.TN_from_edges_rand(es, D=2, seed=5)
        assert nw.istree(tn)

    def test_rand_reg_degree(self):
        es = geo.edges_rand_reg(8, 3, seed=6)
        from collections import Counter

        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        assert all(v == 3 for v in deg.values())
