"""Walktrap (Pons-Latapy) small-graph kernel: structural fixtures +
a naive recompute-from-scratch reference implementation that checks
the Lance-Williams incremental updates on random graphs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph.community import (
    _collapse_undirected,
    _modularity_of,
    community_walktrap,
)


def _t(src, dst, w=None):
    cols = {"src": np.asarray(src, np.int64),
            "dst": np.asarray(dst, np.int64)}
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return pa.table(cols)


def _ring_of_cliques(nc=4, k=5):
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


def _naive_walktrap(table, n, steps=4):
    """O(n^3)-ish reference: every step recomputes dsigma for every
    adjacent community pair directly from the community probability
    vectors (no Lance-Williams, no heap)."""
    und_w = _collapse_undirected(table, n)
    two_m = 2.0 * sum(und_w.values())
    A = np.zeros((n, n))
    for (a, b), x in und_w.items():
        A[a, b] += x
        A[b, a] += x
    deg = A.sum(axis=1)
    A[deg == 0.0, deg == 0.0] = 1.0
    deg = A.sum(axis=1)
    Pt = np.linalg.matrix_power(A / deg[:, None], steps)
    inv_d = 1.0 / deg

    comm = {v: {v} for v in range(n)}
    vec = {v: Pt[v].copy() for v in range(n)}
    adj = {v: set() for v in range(n)}
    for (a, b) in und_w:
        adj[a].add(b)
        adj[b].add(a)

    def dsig(c1, c2):
        d2 = float(((vec[c1] - vec[c2]) ** 2 * inv_d).sum())
        s1, s2 = len(comm[c1]), len(comm[c2])
        return s1 * s2 / ((s1 + s2) * float(n)) * d2

    snaps = []
    while True:
        pairs = sorted(
            (c1, c2) for c1 in comm for c2 in adj[c1] if c1 < c2
        )
        if not pairs:
            break
        best = min(pairs, key=lambda p: (dsig(*p), p))
        c1, c2 = best
        s1, s2 = len(comm[c1]), len(comm[c2])
        vec[c1] = (s1 * vec[c1] + s2 * vec[c2]) / (s1 + s2)
        comm[c1] |= comm.pop(c2)
        for c in adj.pop(c2):
            if c == c1:
                continue
            adj[c].discard(c2)
            adj[c].add(c1)
            adj[c1].add(c)
        adj[c1].discard(c2)
        mem = np.empty(n, dtype=np.int64)
        for cid, vs in comm.items():
            for v in vs:
                mem[v] = cid
        snaps.append(
            (mem, _modularity_of(mem.tolist(), und_w, two_m))
        )
    best_mem = np.arange(n, dtype=np.int64)
    best_q = _modularity_of(best_mem.tolist(), und_w, two_m)
    for mem, q in snaps:
        if q > best_q + 1e-12:
            best_q, best_mem = q, mem
    return best_mem, best_q


def test_walktrap_ring_of_cliques():
    src, dst, n = _ring_of_cliques(4, 5)
    mem, k, q = community_walktrap(_t(src, dst), n=n)
    assert k == 4
    for c in range(4):
        assert len(set(mem[c * 5:(c + 1) * 5].tolist())) == 1
    assert mem[0] == 0  # first-appearance numbering
    assert q > 0.6


def test_walktrap_two_cliques_bridge():
    src, dst = [], []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                src.append(base + i)
                dst.append(base + j)
    src.append(4)
    dst.append(5)
    mem, k, q = community_walktrap(_t(src, dst), n=10)
    assert k == 2
    assert len(set(mem[:5].tolist())) == 1
    assert len(set(mem[5:].tolist())) == 1


def test_walktrap_matches_naive_on_random_graphs():
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(8, 24))
        p = 0.25
        mask = rng.random((n, n)) < p
        src, dst = [], []
        for i in range(n):
            for j in range(i + 1, n):
                if mask[i, j]:
                    src.append(i)
                    dst.append(j)
        w = rng.integers(1, 5, size=len(src)).astype(float)
        table = _t(src, dst, w)
        mem, k, q = community_walktrap(table, n=n)
        wmem, wq = _naive_walktrap(table, n)
        assert _same_partition(mem.tolist(), wmem.tolist()), trial
        assert abs(q - wq) < 1e-9


def test_walktrap_isolated_and_disconnected():
    # two disjoint triangles + 2 isolated vertices
    src = [0, 0, 1, 3, 3, 4]
    dst = [1, 2, 2, 4, 5, 5]
    mem, k, q = community_walktrap(_t(src, dst), n=8)
    assert k == 4  # two triangles + two singletons
    assert len(set(mem[:3].tolist())) == 1
    assert len(set(mem[3:6].tolist())) == 1
    assert mem[6] != mem[7]
    # empty graph
    mem, k, q = community_walktrap(_t([], []), n=3)
    assert k == 3 and q == 0.0


def test_walktrap_deterministic():
    src, dst, n = _ring_of_cliques(3, 4)
    a = community_walktrap(_t(src, dst), n=n)
    b = community_walktrap(_t(src, dst), n=n)
    assert np.array_equal(a[0], b[0]) and a[1] == b[1] and a[2] == b[2]


def test_walktrap_weighted_pull():
    # two triangles; a heavy bridge makes the walk mix across it
    src = [0, 0, 1, 3, 3, 4, 2]
    dst = [1, 2, 2, 4, 5, 5, 3]
    mem_l, k_l, _ = community_walktrap(_t(src, dst, [3, 3, 3, 3, 3, 3, 0.1]), n=6)
    assert k_l == 2
    assert len(set(mem_l[:3].tolist())) == 1
    assert len(set(mem_l[3:].tolist())) == 1
