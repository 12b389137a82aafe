"""Infomap (deterministic two-level map equation) kernel: structural
fixtures + an independent codelength evaluator cross-check."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph.community import community_infomap


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


def _codelength(src, dst, w, n, mem):
    """Independent two-level map-equation evaluator."""
    def plogp(x):
        return x * np.log2(x) if x > 0 else 0.0

    two_m = 2.0 * sum(w)
    s = np.zeros(n)
    for a, b, x in zip(src, dst, w):
        if a != b:
            s[a] += x
            s[b] += x
    p = s / two_m
    k = int(max(mem)) + 1
    mp = np.zeros(k)
    cut = np.zeros(k)
    for v in range(n):
        mp[mem[v]] += p[v]
    for a, b, x in zip(src, dst, w):
        if a != b and mem[a] != mem[b]:
            cut[mem[a]] += x
            cut[mem[b]] += x
    q = cut / two_m
    return (
        plogp(q.sum())
        - 2 * sum(plogp(x) for x in q)
        + sum(plogp(a + b) for a, b in zip(q, mp))
        - sum(plogp(x) for x in p)
    )


def test_infomap_ring_of_cliques():
    src, dst, n = _ring_of_cliques(4, 5)
    mem, k, L = community_infomap(_t(src, dst), n=n)
    assert k == 4
    for c in range(4):
        assert len(set(mem[c * 5:(c + 1) * 5].tolist())) == 1
    assert mem[0] == 0
    w = [1.0] * len(src)
    # reported codelength matches the independent evaluator
    assert abs(L - _codelength(src, dst, w, n, mem)) < 1e-9
    # and beats both trivial partitions
    assert L < _codelength(src, dst, w, n, [0] * n) - 1e-9
    assert L < _codelength(src, dst, w, n, list(range(n))) - 1e-9


def test_infomap_two_cliques_bridge():
    src, dst = [], []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                src.append(base + i)
                dst.append(base + j)
    src.append(4)
    dst.append(5)
    mem, k, L = community_infomap(_t(src, dst), n=10)
    assert k == 2
    assert len(set(mem[:5].tolist())) == 1
    assert len(set(mem[5:].tolist())) == 1


def test_infomap_disconnected_and_isolated():
    src = [0, 0, 1, 3, 3, 4]
    dst = [1, 2, 2, 4, 5, 5]
    mem, k, L = community_infomap(_t(src, dst), n=8)
    # two triangles; isolated 6,7 have zero flow -> stay singleton
    assert len(set(mem[:3].tolist())) == 1
    assert len(set(mem[3:6].tolist())) == 1
    assert mem[6] not in mem[:6] and mem[7] not in mem[:6]
    assert mem[6] != mem[7]
    mem, k, L = community_infomap(_t([], []), n=3)
    assert k == 3 and L == 0.0


def test_infomap_deterministic_and_sbm():
    rng = np.random.default_rng(11)
    sizes, n = [12, 12, 12], 36
    block = np.repeat([0, 1, 2], 12)
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            pr = 0.8 if block[i] == block[j] else 0.03
            if rng.random() < pr:
                src.append(i)
                dst.append(j)
    a = community_infomap(_t(src, dst), n=n)
    b = community_infomap(_t(src, dst), n=n)
    assert np.array_equal(a[0], b[0]) and a[2] == b[2]
    mem, k, L = a
    assert k == 3
    for g in range(3):
        assert len(set(mem[g * 12:(g + 1) * 12].tolist())) == 1
