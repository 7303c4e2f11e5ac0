"""Path optimizer + contraction execution vs numpy einsum ground truth."""

import numpy as np
import pytest

from quimb_tpu.ops import contraction as ctr
from quimb_tpu.ops import paths


def rand_case(seed, n_tensors=6, n_inds=8, hyper=False):
    rng = np.random.default_rng(seed)
    names = [f"i{k}" for k in range(n_inds)]
    sizes = {ix: int(rng.integers(2, 5)) for ix in names}
    inputs = []
    for _ in range(n_tensors):
        k = rng.integers(1, 4)
        term = tuple(rng.choice(names, size=k, replace=False))
        inputs.append(term)
    # ensure every index appears at least once
    for ix in names:
        if not any(ix in t for t in inputs):
            inputs[rng.integers(0, n_tensors)] += (ix,)
    arrays = [
        rng.standard_normal([sizes[ix] for ix in t]) for t in inputs
    ]
    return inputs, sizes, arrays


def np_reference(inputs, arrays, output):
    eq = ctr.inds_to_eq(inputs, output)
    return np.einsum(eq, *arrays, optimize=True)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("optimize", ["greedy", "optimal", "random-greedy"])
def test_random_networks_match_numpy(seed, optimize):
    inputs, sizes, arrays = rand_case(seed)
    output = ctr.find_output_inds(inputs)
    expected = np_reference(inputs, arrays, output)
    got = ctr.array_contract(arrays, inputs, output, optimize=optimize)
    assert np.allclose(got, expected, atol=1e-10)


def test_explicit_output_order():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 5))
    got = ctr.array_contract([a, b], [("i", "j"), ("j", "k")], ("k", "i"))
    assert got.shape == (5, 3)
    assert np.allclose(got, (a @ b).T)


def test_hyper_index():
    # index shared by three tensors (COPY-tensor style)
    rng = np.random.default_rng(1)
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 5))
    c = rng.standard_normal((4,))
    # 'j' is a hyper index summed over all three
    got = ctr.array_contract(
        [a, b, c], [("i", "j"), ("j", "k"), ("j",)], ("i", "k")
    )
    expected = np.einsum("ij,jk,j->ik", a, b, c)
    assert np.allclose(got, expected)


def test_hyper_output_index():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((3, 4))
    b = rng.standard_normal((4, 5))
    # keep the shared index in the output (batch semantics)
    got = ctr.array_contract(
        [a, b], [("i", "j"), ("j", "k")], ("i", "j", "k")
    )
    expected = np.einsum("ij,jk->ijk", a, b)
    assert np.allclose(got, expected)


def test_repeated_index_single_tensor():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((4, 4, 3))
    b = rng.standard_normal((3, 2))
    # 'i' repeated within a — diagonal semantics
    got = ctr.array_contract([a, b], [("i", "i", "j"), ("j", "k")], ("i", "k"))
    expected = np.einsum("iij,jk->ik", a, b)
    assert np.allclose(got, expected)


def test_trace_to_scalar():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((5, 5))
    got = ctr.array_contract([a], [("i", "i")], ())
    assert np.allclose(got, np.trace(a))


def test_disconnected_outer_product():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 3))
    b = rng.standard_normal((4,))
    got = ctr.array_contract([a, b], [("i", "j"), ("k",)], ("i", "j", "k"))
    assert np.allclose(got, np.einsum("ij,k->ijk", a, b))


def test_scalar_output_chain():
    rng = np.random.default_rng(6)
    xs = [rng.standard_normal((3, 3)) for _ in range(5)]
    inputs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    got = ctr.array_contract(xs, inputs, ())
    expected = np.einsum("ab,bc,cd,de,ea->", *xs)
    assert np.allclose(got, expected)


class TestPaths:
    def test_optimal_beats_or_equals_greedy(self):
        for seed in range(5):
            inputs, sizes, arrays = rand_case(seed, n_tensors=7)
            output = ctr.find_output_inds(inputs)
            pg = paths.path_greedy(inputs, output, sizes)
            po = paths.path_optimal(inputs, output, sizes)
            cg = paths.path_cost(inputs, output, sizes, pg)
            co = paths.path_cost(inputs, output, sizes, po)
            assert co <= cg

    def test_mps_chain_is_linear_cost(self):
        # an MPS norm network: cost should stay polynomial (chain order)
        L, chi, d = 20, 8, 2
        inputs = []
        sizes = {}
        for i in range(L):
            kt = []
            if i > 0:
                kt.append(f"k{i - 1}")
            kt.append(f"p{i}")
            if i < L - 1:
                kt.append(f"k{i}")
            inputs.append(tuple(kt))
            bt = []
            if i > 0:
                bt.append(f"b{i - 1}")
            bt.append(f"p{i}")
            if i < L - 1:
                bt.append(f"b{i}")
            inputs.append(tuple(bt))
        for i in range(L - 1):
            sizes[f"k{i}"] = chi
            sizes[f"b{i}"] = chi
        for i in range(L):
            sizes[f"p{i}"] = d
        path = paths.optimize_path(inputs, (), sizes, "greedy")
        w = paths.path_width(inputs, (), sizes, path)
        # max intermediate should be ~chi^2*d, far below 2^L
        assert w <= np.log2(chi * chi * d * d) + 1

    def test_slicing_reduces_width(self):
        inputs, sizes, arrays = rand_case(3, n_tensors=8, n_inds=10)
        output = ()
        path = paths.optimize_path(inputs, output, sizes, "greedy")
        w0 = paths.path_width(inputs, output, sizes, path)
        sliced = paths.find_sliced_inds(
            inputs, output, sizes, path, target_size=2 ** max(w0 - 2, 1)
        )
        if sliced:
            s2 = dict(sizes)
            for ix in sliced:
                s2[ix] = 1
            w1 = paths.path_width(inputs, output, s2, path)
            assert w1 < w0


def test_expression_cache_and_jit():
    import jax

    rng = np.random.default_rng(7)
    a = rng.standard_normal((8, 8))
    b = rng.standard_normal((8, 8))
    expr = ctr.array_contract_expression(
        [("i", "j"), ("j", "k")], ("i", "k"), shapes=[(8, 8), (8, 8)]
    )
    expr2 = ctr.array_contract_expression(
        [("i", "j"), ("j", "k")], ("i", "k"), shapes=[(8, 8), (8, 8)]
    )
    assert expr is expr2  # cached
    f = expr.jitted()
    assert np.allclose(f(a, b), a @ b)
    assert expr.flops > 0 and expr.width > 0
