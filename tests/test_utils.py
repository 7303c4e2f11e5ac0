"""Behavior tests for quimb_tpu.utils containers and helpers (role of
reference tests/test_utils.py)."""

import pickle

import pytest

from quimb_tpu.utils import (
    LRU,
    ExponentialGeometricRollingDiffMean,
    RollingDiffMean,
    format_number_with_error,
    oset,
    tree_flatten,
    tree_map,
    tree_unflatten,
)
from quimb_tpu.tensor.networking import NetworkPatch, NetworkPath


class TestOset:
    def test_order_and_dedup(self):
        s = oset("bacada")
        assert list(s) == ["b", "a", "c", "d"]
        assert len(s) == 4
        assert "c" in s and "z" not in s

    def test_set_algebra(self):
        a = oset([3, 1, 2])
        b = oset([2, 4])
        assert list(a | b) == [3, 1, 2, 4]
        assert list(a & b) == [2]
        assert list(a - b) == [3, 1]
        assert set(a ^ b) == {3, 1, 4}
        # variadic forms
        assert list(a.union(b, oset([5]))) == [3, 1, 2, 4, 5]
        assert list(a.intersection(b, [2, 3])) == [2]
        assert list(a.difference([1], [2])) == [3]

    def test_union_accepts_plain_iterables(self):
        a = oset("ab")
        assert list(a.union("bc", ["d"])) == ["a", "b", "c", "d"]

    def test_inplace_ops(self):
        a = oset([1, 2, 3])
        a |= oset([4])
        assert list(a) == [1, 2, 3, 4]
        a -= oset([1, 4])
        assert list(a) == [2, 3]
        a &= oset([3, 9])
        assert list(a) == [3]

    def test_update_and_mutate(self):
        a = oset()
        a.add(5)
        a.update([6, 5], (7,))
        assert list(a) == [5, 6, 7]
        a.discard(99)  # no error
        a.remove(6)
        assert list(a) == [5, 7]
        with pytest.raises(KeyError):
            a.remove(6)
        assert a.popleft() == 5
        assert a.popright() == 7
        assert len(a) == 0

    def test_eq_is_order_insensitive(self):
        assert oset([1, 2]) == oset([2, 1])
        assert oset([1, 2]) != oset([1, 3])
        assert oset([1, 2]) == {1, 2}

    def test_copy_is_independent(self):
        a = oset([1, 2])
        b = a.copy()
        b.add(3)
        assert list(a) == [1, 2]
        import copy

        c = copy.deepcopy(a)
        c.add(4)
        assert list(a) == [1, 2]

    def test_pickle_roundtrip(self):
        a = oset(["x", "y"])
        b = pickle.loads(pickle.dumps(a))
        assert list(b) == ["x", "y"]
        assert a == b


class TestLRU:
    def test_eviction_order(self):
        d = LRU(3)
        d["a"], d["b"], d["c"] = 1, 2, 3
        # touch 'a' so 'b' becomes the LRU entry
        assert d["a"] == 1
        d["d"] = 4
        assert "b" not in d
        assert set(d) == {"a", "c", "d"}

    def test_overwrite_refreshes(self):
        d = LRU(2)
        d["a"], d["b"] = 1, 2
        d["a"] = 10
        d["c"] = 3
        assert "b" not in d
        assert d["a"] == 10

    def test_mapping_protocol(self):
        d = LRU(4, {"x": 1})
        assert d.get("x") == 1
        assert d.get("nope", -1) == -1
        assert len(d) == 1
        del d["x"]
        assert len(d) == 0

    def test_never_exceeds_maxsize(self):
        d = LRU(5)
        for i in range(100):
            d[i] = i
            assert len(d) <= 5
        assert set(d) == {95, 96, 97, 98, 99}


class TestTreeUtils:
    def test_roundtrip(self):
        tree = {"a": [1, (2, 3)], "b": {"c": 4}}
        flat = tree_flatten(tree)
        assert flat == [1, 2, 3, 4]
        rebuilt = tree_unflatten((x * 10 for x in flat), tree)
        assert rebuilt == {"a": [10, (20, 30)], "b": {"c": 40}}

    def test_map(self):
        assert tree_map(lambda x: -x, (1, [2], {"k": 3})) == (
            -1,
            [-2],
            {"k": -3},
        )


class TestRollingStats:
    def test_rolling_diff_mean_converged_series(self):
        r = RollingDiffMean(size=4)
        for _ in range(10):
            r.update(7.0)
        assert r.absmeandiff() == 0.0

    def test_rolling_diff_mean_linear_series(self):
        r = RollingDiffMean(size=4)
        for i in range(10):
            r.update(2.0 * i)
        assert r.absmeandiff() == pytest.approx(2.0)

    def test_rolling_diff_mean_needs_window(self):
        r = RollingDiffMean(size=8)
        r.update(1.0)
        r.update(2.0)
        assert r.absmeandiff() == float("inf")

    def test_ignores_nonfinite(self):
        r = RollingDiffMean(size=2)
        for x in (1.0, float("nan"), 2.0, float("inf"), 3.0):
            r.update(x)
        assert r.absmeandiff() == pytest.approx(1.0)

    def test_exp_geometric(self):
        e = ExponentialGeometricRollingDiffMean(factor=0.5, initial=1.0)
        e.update(0.0)
        e.update(4.0)  # dy=4 -> value = 1^0.5 * 4^0.5 = 2
        assert e.value == pytest.approx(2.0)
        e.update(4.0)  # dy=0 -> value collapses toward 0
        assert e.value < 1e-70


class TestFormatNumberWithError:
    @pytest.mark.parametrize(
        "x,err,expect",
        [
            (1.23456, 0.0012, "1.235(1)"),
            (123.4, 12.0, "123(12)" if False else None),
            (0.5, 0.2, "0.5(2)"),
        ],
    )
    def test_cases(self, x, err, expect):
        s = format_number_with_error(x, err)
        if expect is not None:
            assert s == expect
        assert "(" in s


class TestNetworkPatch:
    def test_identity_set_semantics(self):
        p1 = NetworkPatch([1, 2], ["a"])
        p2 = NetworkPatch([2, 1], ["a"])
        assert p1 == p2
        assert hash(p1) == hash(p2)
        assert 1 in p1 and "a" in p1 and "z" not in p1

    def test_iteration_and_parts(self):
        p = NetworkPatch([3, 1, 3], ["x", "x", "y"])
        assert list(p.tids) == [3, 1]
        assert list(p.inds) == ["x", "y"]
        assert list(p) == [3, 1, "x", "y"]

    def test_merge(self):
        p = NetworkPatch([1], ["a"]).merge(NetworkPatch([2], ["a", "b"]))
        assert list(p.tids) == [1, 2]
        assert list(p.inds) == ["a", "b"]

    def test_from_sequence(self):
        p = NetworkPatch.from_sequence([1, "a", 2, "b"])
        assert list(p.tids) == [1, 2]
        assert list(p.inds) == ["a", "b"]


class TestNetworkPath:
    def test_structure(self):
        p = NetworkPath((10, 11, 12), ("a", "b"))
        assert len(p) == 2
        assert list(p) == [10, "a", 11, "b", 12]
        assert p.tids == (10, 11, 12)
        assert p.inds == ("a", "b")

    def test_validates_lengths(self):
        with pytest.raises(ValueError):
            NetworkPath((1, 2), ())

    def test_extend(self):
        p = NetworkPath((1,))
        q = p.extend("a", 2).extend("b", 3)
        assert q.tids == (1, 2, 3)
        assert q.inds == ("a", "b")
        assert "a" in q and 3 in q
        # original untouched
        assert p.tids == (1,)

    def test_hash_eq(self):
        p = NetworkPath((1, 2), ("a",))
        q = NetworkPath((2, 1), ("a",))
        assert p == q  # same element set
        assert hash(p) == hash(q)
