"""Single-process reference implementations used as golden oracles.

``pagerank_ref`` reproduces the reference's matvec semantics exactly
(reference src/centrality.c:894-973: dangling mass fully teleports,
non-dangling contributes (1-d); mass-preserving) and iterates to
near machine precision — the distributed engine must be allclose to
it.  Components/triangles use networkx as an independent oracle.
"""

from __future__ import annotations

import numpy as np


def pagerank_ref(
    src, dst, n, damping=0.85, weights=None, tol=1e-14, max_iter=10_000
):
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.ones(len(src)) if weights is None else np.asarray(weights, float)
    keep = w > 0
    src, dst, w = src[keep], dst[keep], w[keep]
    denom = np.bincount(src, weights=w, minlength=n)
    p = np.full(n, 1.0 / n)
    d = damping
    for _ in range(max_iter):
        dang = denom == 0
        sumfrom = p[dang].sum() + (1 - d) * p[~dang].sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            tmp = np.where(dang, 0.0, p / denom)
        contrib = np.bincount(dst, weights=tmp[src] * w, minlength=n)
        new = d * contrib + sumfrom / n
        if np.abs(new - p).sum() < tol:
            p = new
            break
        p = new
    return p / p.sum()


def wcc_ref(src, dst, n):
    """Component id = rank of min vid per component (igraph numbering,
    reference src/components.c:119-149)."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src, dst))
    label = np.empty(n, dtype=np.int64)
    comps = sorted(nx.connected_components(g), key=min)
    for i, c in enumerate(comps):
        label[list(c)] = i
    return label


def scc_ref(src, dst, n):
    """Canonical numbering: components ordered by their min vid."""
    import networkx as nx

    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src, dst))
    label = np.empty(n, dtype=np.int64)
    comps = sorted(nx.strongly_connected_components(g), key=min)
    for i, c in enumerate(comps):
        label[list(c)] = i
    return label


def triangles_ref(src, dst, n):
    """Per-vertex triangle participation counts on the simplified
    undirected graph (loops and multi-edges removed — reference
    igraph_adjacent_triangles semantics, src/triangles.c:507-546)."""
    import networkx as nx

    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from((a, b) for a, b in zip(src, dst) if a != b)
    t = nx.triangles(g)
    return np.array([t[i] for i in range(n)], dtype=np.int64)


def gnm_edges(n, m, seed, directed=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return src.astype(np.int64), dst.astype(np.int64)
