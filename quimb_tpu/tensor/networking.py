"""Pure-graph algorithms on tensor networks: loops, spanning trees,
paths, patches, centralities, hierarchical grouping.

Re-design of reference ``quimb/tensor/networking.py`` (``gen_loops``
:1106, ``gen_sloops`` :726, ``gen_gloops`` :995, spanning trees :187,
patches :796, hierarchical grouping :1290-1456, centralities :1457).
Host-side, setup-time computations on the tid-graph."""

import collections
import itertools

import numpy as np

from ..utils import oset


def tn_adjacency(tn):
    """tid -> set of neighbouring tids (via shared indices)."""
    adj = {tid: set() for tid in tn.tensor_map}
    for ix, tids in tn.ind_map.items():
        tids = tuple(tids)
        for a, b in itertools.combinations(tids, 2):
            adj[a].add(b)
            adj[b].add(a)
    return adj


def get_tree_span(tn, tids=None, which="any", inwards=True):
    """A spanning tree of the tid graph as a list of (tid_outer,
    tid_inner, distance) merges, ordered leaves-first (reference
    ``get_tree_span`` networking.py:187) — the order used for
    tree-gauging and cluster contraction."""
    adj = tn_adjacency(tn)
    if tids is None:
        # start from an approximately central tid
        cents = compute_centralities(tn)
        tids = [max(cents, key=cents.get)]
    region = set(tids)
    span = []
    frontier = list(tids)
    dist = {t: 0 for t in tids}
    while True:
        candidates = []
        for t in frontier:
            for o in adj[t]:
                if o not in region:
                    candidates.append((o, t))
        if not candidates:
            break
        new_frontier = []
        for (o, t) in candidates:
            if o in region:
                continue
            region.add(o)
            dist[o] = dist[t] + 1
            span.append((o, t, dist[o]))
            new_frontier.append(o)
        frontier = new_frontier
    # leaves first = reversed BFS order
    return list(reversed(span))


def gen_all_paths_between_tids(tn, tida, tidb, max_length=None):
    """Yield all simple paths between two tids."""
    adj = tn_adjacency(tn)

    def dfs(path, seen):
        cur = path[-1]
        if cur == tidb:
            yield tuple(path)
            return
        if max_length is not None and len(path) > max_length:
            return
        for o in adj[cur]:
            if o not in seen:
                seen.add(o)
                path.append(o)
                yield from dfs(path, seen)
                path.pop()
                seen.discard(o)

    yield from dfs([tida], {tida})


def gen_loops(tn, max_loop_length=None):
    """Generate simple cycles of tids up to ``max_loop_length``
    (reference ``gen_loops`` networking.py:1106)."""
    adj = tn_adjacency(tn)
    tids = sorted(adj, key=str)
    seen = set()
    if max_loop_length is None:
        max_loop_length = min(len(tids), 8)

    def dfs(start, path):
        cur = path[-1]
        for o in adj[cur]:
            if o == start and len(path) >= 3:
                key = frozenset(path)
                if key not in seen and len(path) <= max_loop_length:
                    seen.add(key)
                    yield tuple(path)
            elif o not in path and len(path) < max_loop_length \
                    and str(o) > str(start):
                path.append(o)
                yield from dfs(start, path)
                path.pop()

    for t in tids:
        yield from dfs(t, [t])


def gen_sloops(tn, max_loop_length=None):
    """Generate 'simple loops': loops with no chords (reference
    ``gen_sloops`` networking.py:726)."""
    adj = tn_adjacency(tn)
    for loop in gen_loops(tn, max_loop_length):
        ok = True
        ls = set(loop)
        for t in loop:
            extra = adj[t] & ls
            # in a chordless cycle every member touches exactly 2
            if len(extra) != 2:
                ok = False
                break
        if ok:
            yield loop


def gen_gloops(tn, max_size=None):
    """Generate 'generalized loops' — connected subgraphs in which
    every tensor has at least two neighbours within the subgraph
    (reference ``gen_gloops`` networking.py:995)."""
    adj = tn_adjacency(tn)
    if max_size is None:
        max_size = min(len(adj), 6)
    seen = set()
    for loop in gen_loops(tn, max_size):
        key = frozenset(loop)
        if key not in seen:
            seen.add(key)
            yield tuple(sorted(loop, key=str))


def gen_patches(tn, max_size=8):
    """Partition tids into connected patches of bounded size
    (reference ``gen_patches`` networking.py:796)."""
    adj = tn_adjacency(tn)
    unassigned = set(adj)
    while unassigned:
        seed = next(iter(unassigned))
        patch = {seed}
        frontier = [seed]
        while frontier and len(patch) < max_size:
            t = frontier.pop(0)
            for o in adj[t]:
                if o in unassigned and o not in patch and \
                        len(patch) < max_size:
                    patch.add(o)
                    frontier.append(o)
        unassigned -= patch
        yield tuple(sorted(patch, key=str))


def compute_centralities(tn, p=0.85, iterations=50):
    """Approximate (eigenvector/pagerank-style) centrality of each tid
    (reference ``compute_centralities`` networking.py:1457)."""
    adj = tn_adjacency(tn)
    tids = list(adj)
    idx = {t: i for i, t in enumerate(tids)}
    n = len(tids)
    if n == 0:
        return {}
    x = np.ones(n) / n
    for _ in range(iterations):
        new = np.full(n, (1 - p) / n)
        for t in tids:
            deg = max(len(adj[t]), 1)
            share = p * x[idx[t]] / deg
            for o in adj[t]:
                new[idx[o]] += share
        x = new / new.sum()
    return {t: float(x[idx[t]]) for t in tids}


def compute_hierarchical_linkage(tn, method="weighted"):
    """Hierarchical clustering linkage of the tid graph by contraction
    affinity (reference networking.py:1290). Returns a scipy linkage
    matrix."""
    import scipy.cluster.hierarchy as sch
    import scipy.spatial.distance as ssd

    tids = list(tn.tensor_map)
    n = len(tids)
    idx = {t: i for i, t in enumerate(tids)}
    # distance = 1 / (1 + log2 shared bond size)
    D = np.full((n, n), 10.0)
    np.fill_diagonal(D, 0.0)
    for ix, holders in tn.ind_map.items():
        holders = tuple(holders)
        d = tn.ind_size(ix)
        for a, b in itertools.combinations(holders, 2):
            w = 1.0 / (1.0 + np.log2(max(d, 2)))
            i, j = idx[a], idx[b]
            D[i, j] = min(D[i, j], w)
            D[j, i] = D[i, j]
    return sch.linkage(ssd.squareform(D, checks=False), method=method)


def compute_hierarchical_ordering(tn, method="weighted"):
    """An ordering of tids from hierarchical clustering (reference
    networking.py:1398)."""
    import scipy.cluster.hierarchy as sch

    tids = list(tn.tensor_map)
    if len(tids) < 3:
        return tuple(tids)
    Z = compute_hierarchical_linkage(tn, method=method)
    order = sch.leaves_list(Z)
    return tuple(tids[i] for i in order)


def istree(tn):
    """Whether the tid graph is a tree (no loops)."""
    adj = tn_adjacency(tn)
    n_edges = sum(len(v) for v in adj.values()) // 2
    # connected components
    seen = set()
    ncomp = 0
    for t in adj:
        if t in seen:
            continue
        ncomp += 1
        stack = [t]
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            stack.extend(adj[u] - seen)
    return n_edges == len(adj) - ncomp


def isconnected(tn):
    adj = tn_adjacency(tn)
    if not adj:
        return True
    seen = set()
    stack = [next(iter(adj))]
    while stack:
        u = stack.pop()
        if u in seen:
            continue
        seen.add(u)
        stack.extend(adj[u] - seen)
    return len(seen) == len(adj)


def subgraphs(tn):
    """Lists of tids of each connected component."""
    adj = tn_adjacency(tn)
    seen = set()
    out = []
    for t in adj:
        if t in seen:
            continue
        comp = set()
        stack = [t]
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u] - comp)
        seen |= comp
        out.append(sorted(comp, key=str))
    return out


__all__ = [
    "tn_adjacency", "get_tree_span", "gen_all_paths_between_tids",
    "gen_loops", "gen_sloops", "gen_gloops", "gen_patches",
    "compute_centralities", "compute_hierarchical_linkage",
    "compute_hierarchical_ordering", "istree", "isconnected",
    "subgraphs",
]
