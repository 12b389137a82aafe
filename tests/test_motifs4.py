"""Size-4 undirected motif census vs brute-force enumeration
(igraph_motifs_randesu size=4, src/motifs.c:121)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from xdata_igraph_ray.graph import generators
from xdata_igraph_ray.graph.motifs import motifs_4_undirected, _m4_copies


def _brute(edges_tbl, n):
    es = set()
    for a, b in zip(edges_tbl["src"].to_numpy(), edges_tbl["dst"].to_numpy()):
        if a != b:
            es.add((min(a, b), max(a, b)))
    adj = {v: set() for v in range(n)}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    counts = dict.fromkeys(("p4", "claw", "c4", "paw", "diamond", "k4"), 0)
    for quad in combinations(range(n), 4):
        sub = [
            (a, b) for a, b in combinations(quad, 2) if b in adj[a]
        ]
        m = len(sub)
        if m < 3:
            continue
        deg = {v: 0 for v in quad}
        for a, b in sub:
            deg[a] += 1
            deg[b] += 1
        dmin, dmax = min(deg.values()), max(deg.values())
        if dmin == 0:
            continue
        if m == 3:
            counts["claw" if dmax == 3 else "p4"] += 1
        elif m == 4:
            counts["paw" if dmax == 3 else "c4"] += 1
        elif m == 5:
            counts["diamond"] += 1
        else:
            counts["k4"] += 1
    return counts


def test_conversion_matrix_sanity():
    # diagonal ones; K4 contains 3 C4s, 6 diamonds-as-subgraphs? no:
    # diamond copies inside K4 = 6 ways to drop one edge = 6
    assert _m4_copies("c4", "k4") == 3
    assert _m4_copies("diamond", "k4") == 6
    assert _m4_copies("c4", "diamond") == 1
    assert _m4_copies("p4", "c4") == 4
    assert _m4_copies("claw", "claw") == 1
    assert _m4_copies("p4", "paw") == 2


@pytest.mark.parametrize("seed,n,m", [(0, 18, 40), (1, 22, 60), (2, 16, 50)])
def test_motifs4_vs_brute_force(seed, n, m):
    t = generators.erdos_renyi_gnm(n, m, directed=True, seed=seed)
    want = _brute(t, n)
    got = motifs_4_undirected(t, n=n, P=3)
    assert got == want


def test_motifs4_known_graphs():
    # K4 itself
    k4 = generators.full(4, directed=False)
    got = motifs_4_undirected(k4, n=4, P=2)
    assert got == {"p4": 0, "claw": 0, "c4": 0, "paw": 0,
                   "diamond": 0, "k4": 1}
    # 6-cycle: every window of 4 consecutive vertices is an induced P4
    ring = generators.ring(6)
    got = motifs_4_undirected(ring, n=6, P=2)
    assert got["p4"] == 6 and got["c4"] == 0 and got["k4"] == 0
    # star K1,5: C(5,3) claws, nothing else
    star = generators.star(6, mode="out")
    got = motifs_4_undirected(star, n=6, P=2)
    assert got == {"p4": 0, "claw": 10, "c4": 0, "paw": 0,
                   "diamond": 0, "k4": 0}
