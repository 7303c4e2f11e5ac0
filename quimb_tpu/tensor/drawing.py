"""Tensor network visualization (reference ``quimb/tensor/drawing.py``:
spring/spectral/manual layouts, edge weights = bond dims, node colors
by tags)."""

import collections
import itertools
import math

import numpy as np


def _build_graph(tn):
    """Nodes = tids (+ pseudo-nodes for outer indices), edges with
    bond-size weights."""
    nodes = list(tn.tensor_map)
    edges = []
    for ix, tids in tn.ind_map.items():
        tids = tuple(tids)
        d = tn.ind_size(ix)
        if len(tids) == 1 and sum(
            tn.tensor_map[t].inds.count(ix) for t in tids
        ) == 1:
            # outer index: pseudo node
            edges.append((tids[0], f"__outer__{ix}", d, ix))
        else:
            for a, b in itertools.combinations(tids, 2):
                edges.append((a, b, d, ix))
    return nodes, edges


def layout_positions(tn, layout="spring", fix=None, seed=42,
                     iterations=100, k=None):
    """Compute 2D positions for each node."""
    nodes, edges = _build_graph(tn)
    all_nodes = list(dict.fromkeys(
        itertools.chain(nodes, (e[1] for e in edges
                                if str(e[1]).startswith("__outer__")))
    ))
    try:
        import networkx as nx

        G = nx.Graph()
        G.add_nodes_from(all_nodes)
        for (a, b, d, ix) in edges:
            G.add_edge(a, b, weight=math.log2(d) + 1)
        if layout == "spectral":
            pos = nx.spectral_layout(G)
        elif layout == "kamada_kawai":
            pos = nx.kamada_kawai_layout(G)
        else:
            pos = nx.spring_layout(
                G, seed=seed, iterations=iterations, k=k, pos=fix,
                fixed=list(fix) if fix else None,
            )
        return pos
    except ImportError:
        # simple force layout fallback
        rng = np.random.default_rng(seed)
        pos = {n: rng.standard_normal(2) for n in all_nodes}
        idx = {n: i for i, n in enumerate(all_nodes)}
        P = np.stack([pos[n] for n in all_nodes])
        E = [(idx[a], idx[b]) for (a, b, _, _) in edges]
        for _ in range(iterations):
            F = np.zeros_like(P)
            # repulsion
            diff = P[:, None, :] - P[None, :, :]
            dist2 = (diff**2).sum(-1) + 1e-6
            F += (diff / dist2[..., None]).sum(1) * 0.05
            # attraction along edges
            for (a, b) in E:
                d = P[a] - P[b]
                F[a] -= 0.1 * d
                F[b] += 0.1 * d
            P += 0.1 * F
        return {n: P[idx[n]] for n in all_nodes}


def draw_tn(
    tn, color=None, show_inds=None, show_tags=None, layout="spring",
    node_size=None, edge_scale=1.0, figsize=(6, 6), ax=None,
    return_fig=False, title=None, legend=True, **kwargs,
):
    """Draw a tensor network with matplotlib (reference ``draw``
    drawing.py). Node colors by the tags in ``color``; edge widths by
    log bond dimension; outer indices drawn as stubs."""
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D

    nodes, edges = _build_graph(tn)
    pos = layout_positions(tn, layout=layout,
                           seed=kwargs.get("seed", 42))

    created = ax is None
    if created:
        fig, ax = plt.subplots(figsize=figsize)
    else:
        fig = ax.figure
    ax.set_aspect("equal")
    ax.axis("off")

    # edges
    for (a, b, d, ix) in edges:
        xa, ya = pos[a]
        xb, yb = pos[b]
        lw = edge_scale * (0.8 + math.log2(d) / 2)
        ax.plot([xa, xb], [ya, yb], "-", color="0.5", lw=lw,
                zorder=1)
        if show_inds:
            ax.text((xa + xb) / 2, (ya + yb) / 2, ix, fontsize=6,
                    color="0.3")

    # node colors by tag
    if color is None:
        color = ()
    elif isinstance(color, str):
        color = (color,)
    cmap = plt.get_cmap("tab10")
    tag_colors = {tag: cmap(i % 10) for i, tag in enumerate(color)}

    xs, ys, cs = [], [], []
    for tid in nodes:
        t = tn.tensor_map[tid]
        c = "#999999"
        for tag in color:
            if tag in t.tags:
                c = tag_colors[tag]
                break
        xs.append(pos[tid][0])
        ys.append(pos[tid][1])
        cs.append(c)
    sizes = node_size or 300
    ax.scatter(xs, ys, c=cs, s=sizes, zorder=2, edgecolors="white")

    if show_tags:
        for tid in nodes:
            t = tn.tensor_map[tid]
            ax.text(pos[tid][0], pos[tid][1],
                    ",".join(map(str, list(t.tags)[:2])),
                    fontsize=6, ha="center", va="center", zorder=3)

    if legend and color:
        handles = [
            Line2D([0], [0], marker="o", linestyle="", label=str(tag),
                   markerfacecolor=tag_colors[tag], markersize=8)
            for tag in color
        ]
        ax.legend(handles=handles, loc="upper right", fontsize=8)
    if title:
        ax.set_title(title)
    if return_fig:
        return fig
    if created:
        plt.show()
    return ax


__all__ = ["draw_tn", "layout_positions"]
