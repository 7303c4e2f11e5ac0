"""utils extras (reference tests/test_utils.py strategy): tree
utilities over nested containers, itertools-style helpers, disk
round-trips of full TN objects, Timer/Verbosify, and
format_number_with_error edge cases."""

import numpy as np
import pytest

from quimb_tpu.utils import (
    Timer,
    concat,
    ensure_dict,
    format_number_with_error,
    frequencies,
    int2tup,
    load_from_disk,
    pairwise,
    partition_all,
    save_to_disk,
    tree_apply,
    tree_flatten,
    tree_map,
    tree_unflatten,
    unique,
    valmap,
)


class TestTreeUtils:
    def test_tree_map_nested(self):
        tree = {"a": [1, 2, (3, 4)], "b": {"c": 5}}
        out = tree_map(lambda x: x * 10, tree)
        assert out == {"a": [10, 20, (30, 40)], "b": {"c": 50}}

    def test_tree_map_preserves_container_types(self):
        tree = (1, [2, 3], {"k": 4})
        out = tree_map(lambda x: -x, tree)
        assert isinstance(out, tuple)
        assert isinstance(out[1], list)
        assert isinstance(out[2], dict)

    def test_tree_flatten_unflatten_roundtrip(self):
        tree = {"x": [1, (2, 3)], "y": 4}
        leaves = list(tree_flatten(tree))
        assert leaves == [1, 2, 3, 4]
        back = tree_unflatten(iter(leaves), tree)
        assert back == tree

    def test_tree_unflatten_with_new_leaves(self):
        tree = [1, {"a": 2}, (3,)]
        back = tree_unflatten(iter([10, 20, 30]), tree)
        assert back == [10, {"a": 20}, (30,)]

    def test_tree_apply_visits_all(self):
        seen = []
        tree_apply(seen.append, {"a": [1, 2], "b": 3})
        assert sorted(seen) == [1, 2, 3]

    def test_custom_is_leaf(self):
        # treat tuples as leaves
        tree = [1, (2, 3), [4, (5, 6)]]
        leaves = list(tree_flatten(
            tree, is_leaf=lambda x: isinstance(x, (int, tuple))
        ))
        assert leaves == [1, (2, 3), 4, (5, 6)]


class TestIterHelpers:
    def test_pairwise(self):
        assert list(pairwise([1, 2, 3, 4])) == [(1, 2), (2, 3), (3, 4)]

    def test_unique_preserves_order(self):
        assert list(unique([3, 1, 3, 2, 1])) == [3, 1, 2]

    def test_concat(self):
        assert list(concat([[1, 2], (3,), [4]])) == [1, 2, 3, 4]

    def test_frequencies(self):
        assert frequencies("abcab") == {"a": 2, "b": 2, "c": 1}

    def test_partition_all(self):
        assert [list(c) for c in partition_all(2, range(5))] == \
            [[0, 1], [2, 3], [4]]

    def test_valmap(self):
        assert valmap(lambda v: v + 1, {"a": 1, "b": 2}) == \
            {"a": 2, "b": 3}

    def test_int2tup_and_ensure_dict(self):
        assert int2tup(3) == (3,)
        assert int2tup((1, 2)) == (1, 2)
        assert ensure_dict(None) == {}
        d = {"a": 1}
        assert ensure_dict(d) == d


class TestDiskRoundtrip:
    def test_tn_roundtrip(self, tmp_path):
        import quimb_tpu.tensor as qtn

        mps = qtn.MPS_rand_state(5, 4, seed=0)
        fname = str(tmp_path / "mps.dump")
        save_to_disk(mps, fname)
        back = load_from_disk(fname)
        assert type(back) is type(mps)
        v1 = np.asarray(mps.to_dense()).reshape(-1)
        v2 = np.asarray(back.to_dense()).reshape(-1)
        assert np.allclose(v1, v2, atol=1e-12)

    def test_dmrg_object_roundtrip(self, tmp_path):
        import quimb_tpu.tensor as qtn

        H = qtn.MPO_ham_heis(8)
        dm = qtn.DMRG2(H, bond_dims=8)
        dm.solve(tol=1e-6, max_sweeps=2, verbosity=0)
        fname = str(tmp_path / "dmrg.dump")
        save_to_disk(dm, fname)
        back = load_from_disk(fname)
        # resumable: continue solving from the restored object
        back.solve(tol=1e-8, max_sweeps=2, verbosity=0)
        assert float(back.energy) <= float(dm.energy) + 1e-10


class TestFormatting:
    @pytest.mark.parametrize("x,err,parts", [
        (1.23456, 0.012, ("1.23",)),
        (-0.0123, 0.001, ("-0.012",)),
        (1234.0, 120.0, ("12",)),
    ])
    def test_format_number_with_error_cases(self, x, err, parts):
        s = format_number_with_error(x, err)
        for p in parts:
            assert p in s

    def test_timer_context(self):
        with Timer() as tm:
            sum(range(1000))
        assert float(tm.t) >= 0.0
