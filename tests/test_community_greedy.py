"""Girvan-Newman and CNM fastgreedy small-graph kernels vs networkx
and structural fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph.community import (
    community_edge_betweenness,
    community_fastgreedy,
)


def _t(src, dst, w=None):
    cols = {"src": np.asarray(src, np.int64),
            "dst": np.asarray(dst, np.int64)}
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return pa.table(cols)


def _two_cliques(k=5):
    src, dst = [], []
    for base in (0, k):
        for i in range(k):
            for j in range(i + 1, k):
                src.append(base + i)
                dst.append(base + j)
    src.append(k - 1)
    dst.append(k)
    return src, dst


def _ring_of_cliques(nc=4, k=4):
    src, dst = [], []
    for c in range(nc):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                src.append(base + i)
                dst.append(base + j)
    for c in range(nc):
        src.append(c * k)
        dst.append(((c + 1) % nc) * k + 1)
    return src, dst, nc * k


def _same_partition(a, b):
    m = {}
    for x, y in zip(a, b):
        if x in m:
            if m[x] != y:
                return False
        else:
            m[x] = y
    return len(set(m.values())) == len(m)


def test_gn_dumbbell():
    src, dst = _two_cliques(5)
    mem, k, q = community_edge_betweenness(_t(src, dst), n=10)
    assert k == 2
    assert len(set(mem[:5].tolist())) == 1
    assert len(set(mem[5:].tolist())) == 1
    assert mem[0] == 0  # first-appearance numbering
    assert q > 0.3


def test_gn_vs_networkx_ring_of_cliques():
    import networkx as nx
    from networkx.algorithms import community as nxc

    src, dst, n = _ring_of_cliques(4, 4)
    g = nx.Graph(list(zip(src, dst)))
    best, best_q = None, -1.0
    for part in nxc.girvan_newman(g):
        q = nxc.modularity(g, part)
        if q > best_q:
            best_q, best = q, part
        if len(part) >= n:
            break
    want = np.empty(n, dtype=np.int64)
    for cid, grp in enumerate(best):
        for v in grp:
            want[v] = cid
    mem, k, q = community_edge_betweenness(_t(src, dst), n=n)
    assert k == len(best)
    assert _same_partition(mem.tolist(), want.tolist())
    assert abs(q - best_q) < 1e-9


def test_fastgreedy_ring_of_cliques():
    import networkx as nx
    from networkx.algorithms import community as nxc

    src, dst, n = _ring_of_cliques(4, 5)
    g = nx.Graph(list(zip(src, dst)))
    want = nxc.greedy_modularity_communities(g)
    mem, k, q = community_fastgreedy(_t(src, dst), n=n)
    assert k == len(want) == 4
    wmem = np.empty(n, dtype=np.int64)
    for cid, grp in enumerate(want):
        for v in grp:
            wmem[v] = cid
    assert _same_partition(mem.tolist(), wmem.tolist())
    assert abs(q - nxc.modularity(g, want)) < 1e-9


def test_fastgreedy_weighted_pull():
    # two triangles bridged; heavy bridge pulls the partition together
    src = [0, 0, 1, 3, 3, 4, 2]
    dst = [1, 2, 2, 4, 5, 5, 3]
    w_light = [3, 3, 3, 3, 3, 3, 0.1]
    mem, k, _ = community_fastgreedy(_t(src, dst, w_light), n=6)
    assert k == 2
    assert len(set(mem[:3].tolist())) == 1 and len(set(mem[3:].tolist())) == 1
    # all-equal weights on a single clique: no split
    csrc, cdst = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            csrc.append(i)
            cdst.append(j)
    mem2, k2, _ = community_fastgreedy(_t(csrc, cdst), n=5)
    assert k2 == 1


def test_gn_singletons_and_empty():
    # empty graph: everything is its own community, Q = 0
    mem, k, q = community_fastgreedy(_t([], []), n=4)
    assert k == 4 and q == 0.0
    mem, k, q = community_edge_betweenness(_t([0], [1]), n=3)
    assert k == 2  # {0,1} and {2}
