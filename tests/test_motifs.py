"""Triad census vs networkx.triadic_census (independent oracle) and
lookup-table re-derivation."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph import motifs

from .oracles import gnm_edges


def _census_nx(src, dst, n):
    import networkx as nx

    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst) if a != b)
    return nx.triadic_census(g)


def _ds(src, dst):
    return rd.from_arrow(pa.table({"src": np.asarray(src, np.int64),
                                   "dst": np.asarray(dst, np.int64)}))


def test_lookup_table_matches_networkx():
    import networkx as nx

    for i, (c12, c13, c23) in enumerate(
        itertools.product(range(4), repeat=3)
    ):
        g = nx.DiGraph()
        g.add_nodes_from([0, 1, 2])
        for (p, q), c in [((0, 1), c12), ((0, 2), c13), ((1, 2), c23)]:
            if c & 1:
                g.add_edge(p, q)
            if c & 2:
                g.add_edge(q, p)
        cen = nx.triadic_census(g)
        name = next(k for k, v in cen.items() if v == 1)
        assert motifs._TRIAD_OF_CODE[i] == name, (c12, c13, c23)


def test_triad_census_gnm():
    n, m = 60, 300
    src, dst = gnm_edges(n, m, seed=9)
    want = _census_nx(src, dst, n)
    got = motifs.triad_census(_ds(src, dst), n=n, P=3)
    assert got == {k: int(v) for k, v in want.items()}
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_handcrafted():
    # mutual pair 0<->1, chain 2->3->4, triangle cycle 5->6->7->5
    src = [0, 1, 2, 3, 5, 6, 7]
    dst = [1, 0, 3, 4, 6, 7, 5]
    n = 8
    got = motifs.triad_census(_ds(src, dst), n=n, P=2)
    want = _census_nx(src, dst, n)
    assert got == {k: int(v) for k, v in want.items()}
    assert got["030C"] == 1  # the 3-cycle
    assert got["021C"] == 1  # the chain


def test_motifs3_undirected():
    # one triangle + one extra pendant edge => paths: 2 (0-2-3? ...)
    src = [0, 1, 2, 2]
    dst = [1, 2, 0, 3]
    got = motifs.motifs_3_undirected(_ds(src, dst), n=4, P=2)
    # triangle {0,1,2}; open wedges: {0,2,3}, {1,2,3}
    assert got == {"path": 2, "triangle": 1}


def test_esu_no_and_estimate(ray_session):
    import itertools

    import ray.data as rd

    from xdata_igraph_ray.graph.motifs import (
        motifs_3_undirected,
        motifs_4_undirected,
        motifs_randesu_estimate,
        motifs_randesu_no,
    )

    rng = np.random.default_rng(41)
    n = 14
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.3]
    arcs = pairs + [(b, a) for a, b in pairs]
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    ds = rd.from_arrow(t)
    eset = set(pairs)

    def brute(k):
        cnt = 0
        for sub in itertools.combinations(range(n), k):
            sg = [(a, b) for a, b in eset if a in sub and b in sub]
            # connectivity check
            seen = {sub[0]}
            frontier = [sub[0]]
            adj = {}
            for a, b in sg:
                adj.setdefault(a, []).append(b)
                adj.setdefault(b, []).append(a)
            while frontier:
                x = frontier.pop()
                for y in adj.get(x, []):
                    if y not in seen:
                        seen.add(y)
                        frontier.append(y)
            if len(seen) == k:
                cnt += 1
        return cnt

    for k in (3, 4):
        assert motifs_randesu_no(ds, n, size=k, P=2) == brute(k), k
    # consistency with the census totals
    m3 = motifs_3_undirected(ds, n, P=2)
    assert motifs_randesu_no(ds, n, size=3, P=2) == \
        m3["path"] + m3["triangle"]
    m4 = motifs_4_undirected(ds, n, P=2)
    assert motifs_randesu_no(ds, n, size=4, P=2) == \
        sum(m4.values())
    # full sample reproduces the exact count
    est_full = motifs_randesu_estimate(ds, n, size=3,
                                       sample=np.arange(n), P=2)
    assert est_full == brute(3)
    # half sample is within a loose band of the truth
    est = motifs_randesu_estimate(ds, n, size=3, sample_size=7,
                                  seed=5, P=2)
    assert 0.4 * brute(3) < est < 2.5 * brute(3)


def test_motifs3_mutual_pair_path_is_open():
    """Regression: a 201 triad (two mutual dyads, one null pair) is a
    support PATH, not a triangle (src/motifs.c classification by
    null-dyad count)."""
    from xdata_igraph_ray.graph.motifs import motifs_3_undirected
    # A<->B, B<->C: exactly one 201 triple, zero triangles
    edges = [[0, 1, 1, 2], [1, 0, 2, 1]]
    import pyarrow as pa
    import numpy as np
    import ray.data as rd
    t = rd.from_arrow(pa.table({"src": np.array(edges[0], np.int64),
                                "dst": np.array(edges[1], np.int64)}))
    m = motifs_3_undirected(t, 3, P=2)
    assert m == {"path": 1, "triangle": 0}


def test_triad_census_24(ray_session):
    # res2/res4 == the 012/102 rows of the full census (the helper the
    # reference's igraph_triad_census builds on, src/motifs.c:913)
    n, m = 40, 150
    src, dst = gnm_edges(n, m, seed=4)
    want = _census_nx(src, dst, n)
    r2, r4 = motifs.triad_census_24(_ds(src, dst), n=n, P=3)
    assert r2 == int(want["012"])
    assert r4 == int(want["102"])
    # handcrafted: single mutual pair in a 4-vertex graph -> two 102s
    r2, r4 = motifs.triad_census_24(_ds([0, 1], [1, 0]), n=4, P=2)
    assert (r2, r4) == (0, 2)
