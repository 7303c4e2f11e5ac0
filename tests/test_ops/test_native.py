"""Native (C++) pathfinder: correctness vs the pure-python search."""

import numpy as np
import pytest

from quimb_tpu.ops import paths as P
from quimb_tpu.ops.native import native_available, path_rgreedy_native


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native pathfinder not built"
)


def _rand_tn_geometry(n, rng, hyper=False):
    """Random connected tensor-graph: inputs, output, sizes."""
    inputs = [[] for _ in range(n)]
    sizes = {}
    k = 0
    # spanning chain for connectivity + extra random edges
    edges = [(i, i + 1) for i in range(n - 1)]
    for _ in range(n):
        a, b = rng.integers(0, n, size=2)
        if a != b:
            edges.append((int(a), int(b)))
    for a, b in edges:
        ix = f"i{k}"
        k += 1
        inputs[a].append(ix)
        inputs[b].append(ix)
        sizes[ix] = int(rng.integers(2, 5))
    output = []
    # a few dangling (output) indices
    for _ in range(3):
        t = int(rng.integers(0, n))
        ix = f"o{k}"
        k += 1
        inputs[t].append(ix)
        sizes[ix] = int(rng.integers(2, 4))
        output.append(ix)
    if hyper:
        ix = "h0"
        for t in rng.choice(n, size=3, replace=False):
            inputs[int(t)].append(ix)
        sizes[ix] = 3
    return [tuple(t) for t in inputs], tuple(output), sizes


def _check_valid_ssa(path, n):
    used = set()
    avail = set(range(n))
    nxt = n
    for a, b in path:
        assert a in avail and b in avail and a != b
        avail.discard(a)
        avail.discard(b)
        used.update((a, b))
        avail.add(nxt)
        nxt += 1
    assert len(avail) == 1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("hyper", [False, True])
def test_native_path_valid_and_executable(seed, hyper):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 20))
    inputs, output, sizes = _rand_tn_geometry(n, rng, hyper=hyper)
    path = path_rgreedy_native(inputs, output, sizes, repeats=8, seed=seed)
    assert path is not None
    _check_valid_ssa(path, n)
    # simulate: final result inds must equal the requested output
    *_, last = P.simulate_path(inputs, output, sizes, path)
    assert set(last[2]) == set(output)


def test_native_beats_or_matches_plain_greedy():
    rng = np.random.default_rng(7)
    wins = 0
    for seed in range(6):
        inputs, output, sizes = _rand_tn_geometry(24, rng)
        npath = path_rgreedy_native(
            inputs, output, sizes, repeats=32, seed=seed
        )
        gpath = P.path_greedy(inputs, output, sizes)
        nc = P.path_cost(inputs, output, sizes, npath)
        gc = P.path_cost(inputs, output, sizes, gpath)
        if nc <= gc:
            wins += 1
    assert wins >= 4


def test_random_greedy_dispatch_correct_contraction():
    """End-to-end: random-greedy (native-backed) path gives the exact
    contraction value."""
    import quimb_tpu.tensor as qtn

    psi = qtn.MPS_rand_state(20, 6, seed=0, dtype="float64")
    exact = complex(psi.H @ psi)
    with qtn.contract_strategy("random-greedy"):
        val = complex((psi.H & psi).contract(...))
    assert abs(val - exact) < 1e-10 * abs(exact)


def test_disconnected_graph():
    inputs = [("a", "b"), ("b",), ("c", "d"), ("d",)]
    sizes = {"a": 3, "b": 4, "c": 5, "d": 2}
    path = path_rgreedy_native(inputs, ("a", "c"), sizes, repeats=4)
    _check_valid_ssa(path, 4)
    *_, last = P.simulate_path(inputs, ("a", "c"), sizes, path)
    assert set(last[2]) == {"a", "c"}
