"""Graphlet decomposition vs an independent brute-force replay of the
reference semantics (src/glet.c): networkx maximal cliques + plain
Python recursion for the basis, direct-translation loops for the
projection."""

from __future__ import annotations

import numpy as np
import networkx as nx
import pyarrow as pa
import pytest
import ray.data as rd

from xdata_igraph_ray.graph.graphlets import (
    graphlets,
    graphlets_candidate_basis,
    graphlets_project,
)


def _ds(src, dst, w):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
                "weight": np.asarray(w, np.float64),
            }
        )
    )


def _naive_basis(edges: dict):
    """Brute-force igraph_i_graphlets + filter (independent code)."""
    out = []

    def recurse(ed):
        if not ed:
            return
        minw = min(ed.values())
        nxt = min((x for x in ed.values() if x > minw), default=None)
        members = sorted({v for e in ed for v in e})
        out.append((tuple(members), minw))
        if nxt is None:
            return
        keep = {e: x for e, x in ed.items() if x >= nxt}
        g = nx.Graph(list(keep))
        for cl in nx.find_cliques(g):
            if len(cl) < 2:
                continue
            cs = set(cl)
            sub = {e: x for e, x in keep.items()
                   if e[0] in cs and e[1] in cs}
            recurse(sub)

    g0 = nx.Graph(list(edges))
    for cl in nx.find_cliques(g0):
        if len(cl) < 2:
            continue
        cs = set(cl)
        recurse({e: x for e, x in edges.items()
                 if e[0] in cs and e[1] in cs})

    # filter: drop cliques with a superset at the same threshold
    keep = []
    for i, (mi, ti) in enumerate(out):
        si = set(mi)
        dominated = any(
            j != i and tj == ti and si <= set(mj)
            and (len(mj) > len(mi) or (mi == mj and j < i))
            for j, (mj, tj) in enumerate(out)
        )
        if not dominated:
            keep.append((mi, ti))
    return sorted(set(keep), key=lambda x: (x[1], len(x[0]), x[0]))


def _naive_project(edges: dict, cliques, niter):
    elist = sorted(edges)
    eidx = {e: i for i, e in enumerate(elist)}
    w = [edges[e] for e in elist]
    ecl = [[] for _ in elist]
    cel = [[] for _ in cliques]
    for c, members in enumerate(cliques):
        ms = set(members)
        for e in elist:
            if e[0] in ms and e[1] in ms:
                ecl[eidx[e]].append(c)
                cel[c].append(eidx[e])
    Mu = [1.0] * len(cliques)
    for _ in range(niter):
        neww = [1e-4 + sum(Mu[c] for c in cs) for cs in ecl]
        for c, members in enumerate(cliques):
            n = len(members)
            s = sum(w[e] / neww[e] for e in cel[c])
            Mu[c] *= s / (n * (n + 1) / 2)
    return np.array(Mu)


def _planted():
    """6-clique w=1 nesting a w=2 triangle nesting a w=3 pair, plus a
    separate w=1 pair — basis known by construction."""
    edges = {}
    for i in range(6):
        for j in range(i + 1, 6):
            edges[(i, j)] = 1.0
    for i in range(3):
        for j in range(i + 1, 3):
            edges[(i, j)] = 2.0
    edges[(0, 1)] = 3.0
    edges[(6, 7)] = 1.0
    return edges


def _to_arrays(edges):
    src = [e[0] for e in edges]
    dst = [e[1] for e in edges]
    w = [edges[e] for e in edges]
    return src, dst, w


def test_planted_basis():
    edges = _planted()
    cl, thr = graphlets_candidate_basis(_ds(*_to_arrays(edges)), P=2)
    got = sorted(
        (tuple(c.tolist()), float(t)) for c, t in zip(cl, thr)
    )
    assert got == [
        ((0, 1), 3.0),
        ((0, 1, 2), 2.0),
        ((0, 1, 2, 3, 4, 5), 1.0),
        ((6, 7), 1.0),
    ]


def test_planted_mu_vs_naive():
    edges = _planted()
    cl, _ = graphlets_candidate_basis(_ds(*_to_arrays(edges)), P=2)
    mu = graphlets_project(_ds(*_to_arrays(edges)), cl, niter=50, P=2)
    mu_ref = _naive_project(edges, [tuple(c.tolist()) for c in cl], 50)
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-12)


@pytest.mark.parametrize("seed", [1, 5, 11])
def test_random_weighted_vs_naive(seed):
    rng = np.random.default_rng(seed)
    n = 14
    edges = {}
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 0.4:
                edges[(i, j)] = float(rng.integers(1, 5))
    if not edges:
        return
    cl, thr = graphlets_candidate_basis(_ds(*_to_arrays(edges)), P=3)
    got = sorted(
        (tuple(c.tolist()), float(t)) for c, t in zip(cl, thr)
    )
    want = [(m, t) for m, t in _naive_basis(edges)]
    assert got == sorted(want)
    mu = graphlets_project(_ds(*_to_arrays(edges)), cl, niter=20, P=3)
    mu_ref = _naive_project(
        edges, [tuple(c.tolist()) for c in cl], 20
    )
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-9)


def test_graphlets_order_and_simple_check():
    edges = _planted()
    cl, mu = graphlets(_ds(*_to_arrays(edges)), niter=30, P=2)
    assert all(mu[i] >= mu[i + 1] for i in range(len(mu) - 1))
    # non-simple input raises
    with pytest.raises(Exception):
        graphlets_candidate_basis(
            _ds([0, 0, 1], [1, 1, 2], [1.0, 2.0, 1.0]), P=2
        )


def test_subclique_next_thresholds_and_subgraphs():
    """igraph_subclique_next: clique threshold = min in-clique weight,
    next threshold = next distinct weight, surviving subgraph keeps
    only edges >= next threshold with first-appearance relabeling."""
    import numpy as np
    import pyarrow as pa

    from xdata_igraph_ray.graph.graphlets import subclique_next

    # triangle 0-1-2 with weights 1,2,2 plus a pendant edge
    t = pa.table({
        "src": np.array([0, 0, 1, 2], np.int64),
        "dst": np.array([1, 2, 2, 3], np.int64),
        "weight": np.array([1.0, 2.0, 2.0, 9.0]),
    })
    res = subclique_next(t, [[0, 1, 2]])
    r = res[0]
    assert r["clique_thr"] == 1.0 and r["next_thr"] == 2.0
    assert len(r["edges"]) == 2          # the two weight-2 edges
    assert set(r["ids"].tolist()) == {0, 1, 2}
    assert r["edges"]["weight"].to_pylist() == [2.0, 2.0]
    # uniform-weight clique: next_thr inf, empty next level
    t2 = pa.table({
        "src": np.array([0, 0, 1], np.int64),
        "dst": np.array([1, 2, 2], np.int64),
        "weight": np.array([3.0, 3.0, 3.0]),
    })
    r2 = subclique_next(t2, [[0, 1, 2]])[0]
    assert r2["clique_thr"] == 3.0 and np.isinf(r2["next_thr"])
    assert len(r2["edges"]) == 0 and len(r2["ids"]) == 0
    # ids mapping passes through
    r3 = subclique_next(t, [[0, 1, 2]], ids=np.array([10, 11, 12, 13]))[0]
    assert set(r3["ids"].tolist()) <= {10, 11, 12}
