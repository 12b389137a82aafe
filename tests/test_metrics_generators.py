"""Generators + graph metrics vs networkx / closed-form oracles."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph import generators as gen
from xdata_igraph_ray.graph import metrics


def nxg(tbl, directed=False):
    g = nx.DiGraph() if directed else nx.Graph()
    g.add_edges_from(zip(tbl["src"].to_numpy(), tbl["dst"].to_numpy()))
    return g


def test_generators_shapes_and_determinism():
    t1 = gen.erdos_renyi_gnm(100, 300, seed=1)
    t2 = gen.erdos_renyi_gnm(100, 300, seed=1)
    assert t1.equals(t2) and len(t1) == 300
    gp = gen.erdos_renyi_gnp(200, 0.05, seed=2)
    assert 100 < len(gp) < 3500
    ba = gen.barabasi(500, m=3, seed=3)
    g = nxg(ba)
    assert max(dict(g.degree).values()) > 20  # hub skew
    ws = gen.watts_strogatz(200, nei=3, p=0.1, seed=4)
    assert nx.transitivity(nxg(ws)) > 0.2
    blocks = gen.sbm([50, 50], 0.3, 0.01, seed=5)
    assert len(blocks) > 100
    assert len(gen.ring(10)) == 10
    assert len(gen.star(10)) == 9
    assert len(gen.full(10)) == 45
    assert len(gen.lattice(4, 5)) == 31
    assert len(gen.kary_tree(15, 2)) == 14


def test_strength_and_maxdegree():
    e = rd.from_arrow(pa.table({
        "src": [0, 0, 1], "dst": [1, 2, 2],
        "weight": [2.0, 3.0, 4.0],
    }))
    out = metrics.strength(e, n=4, P=2).to_pandas().sort_values("vid")
    assert list(out["out_strength"]) == [5.0, 4.0, 0.0, 0.0]
    assert list(out["in_strength"]) == [0.0, 2.0, 7.0, 0.0]
    assert metrics.maxdegree(rd.from_arrow(gen.star(10)), "out", P=2) == 9
    assert metrics.maxdegree(rd.from_arrow(gen.star(10)), "in", P=2) == 1


def test_is_mutual_and_dyad_census():
    e = rd.from_arrow(pa.table({"src": [0, 1, 1, 2], "dst": [1, 0, 2, 0]}))
    m = metrics.is_mutual(e, P=2).to_pandas()
    lut = {(r.src, r.dst): r.mutual for r in m.itertuples()}
    assert lut[(0, 1)] and lut[(1, 0)]
    assert not lut[(1, 2)] and not lut[(2, 0)]
    dc = metrics.dyad_census(e, n=3, P=2)
    assert dc == {"mut": 1, "asym": 2, "null": 0}


def test_modularity_vs_networkx():
    tbl = gen.sbm([40, 40, 40], 0.3, 0.02, seed=7)
    membership = np.repeat(np.arange(3), 40)
    got = metrics.modularity(rd.from_arrow(tbl), membership, P=2)
    g = nxg(tbl)
    want = nx.community.modularity(
        g, [set(range(40)), set(range(40, 80)), set(range(80, 120))]
    )
    assert abs(got - want) < 1e-9


def test_assortativity():
    tbl = gen.erdos_renyi_gnm(300, 2000, directed=True, seed=9)
    got = metrics.assortativity_degree(rd.from_arrow(tbl), P=2)
    src = tbl["src"].to_numpy()
    dst = tbl["dst"].to_numpy()
    n = 300
    od = np.bincount(src, minlength=n)
    idg = np.bincount(dst, minlength=n)
    x = od[src].astype(float)
    y = idg[dst].astype(float)
    want = np.corrcoef(x, y)[0, 1]
    assert abs(got - want) < 1e-9


def test_local_scan_1():
    # triangle 0-1-2 plus pendant 3 on 0
    e = rd.from_arrow(pa.table({"src": [0, 1, 2, 0], "dst": [1, 2, 0, 3]}))
    out = metrics.local_scan_1(e, n=4, P=2).to_pandas().sort_values("vid")
    # N[0]={0,1,2,3}: edges 01,12,02,03 -> 4; N[1]=N[2]: 3; N[3]={0,3}: 1
    assert list(out["scan1"]) == [4, 3, 3, 1]


def test_degree_sequence_game():
    from xdata_igraph_ray.graph import generators as G

    deg = [3, 2, 2, 1, 2, 2]
    t = G.degree_sequence(deg, seed=1)
    counts = np.zeros(6, np.int64)
    for col in ("src", "dst"):
        np.add.at(counts, t[col].to_numpy(), 1)
    assert list(counts) == deg
    # directed
    t2 = G.degree_sequence([2, 1, 0], [0, 1, 2], seed=2)
    out = np.bincount(t2["src"].to_numpy(), minlength=3)
    inn = np.bincount(t2["dst"].to_numpy(), minlength=3)
    assert list(out) == [2, 1, 0] and list(inn) == [0, 1, 2]


def test_static_power_law_and_fitness():
    from xdata_igraph_ray.graph import generators as G

    t = G.static_power_law(500, 2000, exponent_out=2.2, seed=3)
    assert len(t) == 2000
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    assert (s != d).all()
    deg = np.bincount(s, minlength=500) + np.bincount(d, minlength=500)
    # hub skew: top vertex far above the mean
    assert deg.max() > 4 * deg.mean()


def test_k_regular():
    from xdata_igraph_ray.graph import generators as G

    t = G.k_regular(20, 4, seed=5)
    deg = np.zeros(20, np.int64)
    for col in ("src", "dst"):
        np.add.at(deg, t[col].to_numpy(), 1)
    assert (deg == 4).all()
    s, d = t["src"].to_numpy(), t["dst"].to_numpy()
    assert (s != d).all()
    assert len({(a, b) for a, b in zip(s, d)}) == len(s)


def test_grg_radius_invariant():
    from xdata_igraph_ray.graph import generators as G

    t = G.grg(300, 0.12, seed=7)
    # re-derive the points and check every edge is within radius and
    # the edge count matches a brute-force scan
    rng = np.random.default_rng(7)
    x, y = rng.random(300), rng.random(300)
    iu, ju = np.triu_indices(300, k=1)
    d2 = (x[iu] - x[ju]) ** 2 + (y[iu] - y[ju]) ** 2
    want = int((d2 <= 0.12 * 0.12).sum())
    assert len(t) == want
    s, d = t["src"].to_numpy(), t["dst"].to_numpy()
    assert (((x[s] - x[d]) ** 2 + (y[s] - y[d]) ** 2) <= 0.12**2 + 1e-12).all()


def test_preference_and_islands():
    from xdata_igraph_ray.graph import generators as G

    t = G.preference([50, 50], [[0.5, 0.01], [0.01, 0.5]], seed=9)
    s, d = t["src"].to_numpy(), t["dst"].to_numpy()
    within = ((s < 50) == (d < 50)).sum()
    assert within > 0.8 * len(s)  # mostly within-block
    t2 = G.islands(3, 30, 0.6, 4, seed=11)
    s2, d2 = t2["src"].to_numpy(), t2["dst"].to_numpy()
    inter = ((s2 // 30) != (d2 // 30)).sum()
    assert inter == 3 * 4  # exactly n_inter bridges per island pair


def test_famous_graphs():
    from xdata_igraph_ray.graph import generators as G

    z = G.famous("zachary")
    assert len(z) == 78  # the canonical 78 edges
    p = G.famous("petersen")
    deg = np.zeros(10, np.int64)
    for c in ("src", "dst"):
        np.add.at(deg, p[c].to_numpy(), 1)
    assert (deg == 3).all()
    import pytest

    with pytest.raises(ValueError):
        G.famous("nope")


def test_atlas():
    import pytest as _pytest

    from xdata_igraph_ray.graph.generators import atlas

    # Read & Wilson ordering facts (independent of the data source):
    # 3 = K2, 7 = K3, 1252 = K7 (last graph, 21 undirected edges)
    assert atlas(3).num_rows == 2
    k3 = atlas(7)
    assert k3.num_rows == 6
    assert set(zip(k3["src"].to_numpy(), k3["dst"].to_numpy())) == {
        (0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)
    }
    assert atlas(1252).num_rows == 42
    assert atlas(2).num_rows == 0  # two isolated vertices
    with _pytest.raises(ValueError):
        atlas(1253)


def test_assortativity_nominal_vs_naive():
    """igraph_assortativity_nominal formula (src/mixing.c) vs a direct
    translation on random graphs, both modes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from xdata_igraph_ray.graph.metrics import assortativity_nominal

    rng = np.random.default_rng(13)
    for directed in (True, False):
        for trial in range(3):
            n, m = 40, 150
            src = rng.integers(0, n, m)
            dst = rng.integers(0, n, m)
            types = rng.integers(0, 4, n)
            ds = rd.from_arrow(pa.table({
                "src": src.astype(np.int64),
                "dst": dst.astype(np.int64),
            }))
            got = assortativity_nominal(ds, types, P=3,
                                        directed=directed)
            T = 4
            ai = np.zeros(T); bi = np.zeros(T); eii = np.zeros(T)
            for u, v in zip(src, dst):
                fu, tv = types[u], types[v]
                ai[fu] += 1; bi[tv] += 1
                if fu == tv:
                    eii[fu] += 1
                if not directed:
                    if fu == tv:
                        eii[fu] += 1
                    ai[tv] += 1; bi[fu] += 1
            sumaibi = float(((ai / m) * (bi / m)).sum())
            sumeii = float((eii / m).sum())
            if not directed:
                sumaibi /= 4.0
                sumeii /= 2.0
            want = (sumeii - sumaibi) / (1.0 - sumaibi)
            assert abs(got - want) < 1e-12, (directed, trial)


def test_degree_sequence_checks():
    """is_degree_sequence / is_graphical_degree_sequence vs
    brute-force realizability on tiny sequences."""
    from itertools import combinations

    import numpy as np

    from xdata_igraph_ray.graph.generators import (
        is_degree_sequence,
        is_graphical_degree_sequence,
    )

    assert is_degree_sequence([2, 2, 2])
    assert not is_degree_sequence([2, 1])  # odd sum
    assert is_degree_sequence([2, 1], [1, 2])
    assert not is_degree_sequence([2, 1], [1, 1])
    assert not is_degree_sequence([-1, 1])

    def brute_undirected(seq):
        n = len(seq)
        pairs = list(combinations(range(n), 2))
        for mask in range(1 << len(pairs)):
            deg = [0] * n
            for i, (a, b) in enumerate(pairs):
                if (mask >> i) & 1:
                    deg[a] += 1
                    deg[b] += 1
            if deg == list(seq):
                return True
        return False

    rng = np.random.default_rng(31)
    for _ in range(25):
        n = int(rng.integers(2, 6))
        seq = sorted(rng.integers(0, n, n).tolist(), reverse=True)
        got = is_graphical_degree_sequence(seq)
        want = brute_undirected(seq)
        assert got == want, seq

    def brute_directed(o, i_):
        n = len(o)
        arcs = [(a, b) for a in range(n) for b in range(n) if a != b]
        for mask in range(1 << len(arcs)):
            od = [0] * n
            idg = [0] * n
            for k, (a, b) in enumerate(arcs):
                if (mask >> k) & 1:
                    od[a] += 1
                    idg[b] += 1
            if od == list(o) and idg == list(i_):
                return True
        return False

    for _ in range(15):
        n = int(rng.integers(2, 4))
        o = rng.integers(0, n, n).tolist()
        i_ = rng.integers(0, n, n).tolist()
        if sum(o) != sum(i_):
            assert not is_graphical_degree_sequence(o, i_)
            continue
        assert is_graphical_degree_sequence(o, i_) == \
            brute_directed(o, i_), (o, i_)


def test_deterministic_constructors():
    import networkx as nx

    from xdata_igraph_ray.graph.generators import (
        adjacency,
        connect_neighborhood,
        de_bruijn,
        extended_chordal_ring,
        full_citation,
        kautz,
        lcf,
        weighted_adjacency,
    )

    # adjacency modes
    M = np.array([[1, 2, 0], [0, 0, 3], [1, 0, 0]])
    t = adjacency(M, mode="directed")
    assert sorted(zip(t["src"].to_numpy().tolist(),
                      t["dst"].to_numpy().tolist())) == \
        [(0, 0), (0, 1), (0, 1), (1, 2), (1, 2), (1, 2), (2, 0)]
    t_max = adjacency(M, mode="max")
    assert sorted(zip(t_max["src"].to_numpy().tolist(),
                      t_max["dst"].to_numpy().tolist())) == \
        [(0, 0), (0, 1), (0, 1), (0, 2), (1, 2), (1, 2), (1, 2)]
    t_min = adjacency(M, mode="min")
    assert len(t_min) == 1  # only the diagonal entry survives min
    t_up = adjacency(M, mode="upper")
    assert (t_up["src"].to_numpy() <= t_up["dst"].to_numpy()).all()
    # weighted: plus halves the diagonal
    W = np.array([[2.0, 1.0], [3.0, 0.0]])
    tw = weighted_adjacency(W, mode="plus")
    got = {(int(a), int(b)): w for a, b, w in
           zip(tw["src"].to_numpy(), tw["dst"].to_numpy(),
               tw["weight"].to_numpy())}
    assert got == {(0, 0): 2.0, (0, 1): 4.0}
    assert len(weighted_adjacency(W, mode="plus", loops=False)) == 1

    # full citation: i cites every j < i
    fc = full_citation(4)
    assert sorted(zip(fc["src"].to_numpy().tolist(),
                      fc["dst"].to_numpy().tolist())) == \
        [(1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2)]

    # extended chordal ring: ring + forward chords, no wraparound
    ecr = extended_chordal_ring(6, np.array([[2], [3]]))
    pairs = set(zip(ecr["src"].to_numpy().tolist(),
                    ecr["dst"].to_numpy().tolist()))
    assert (0, 1) in pairs and (0, 5) in pairs          # ring
    assert (0, 2) in pairs and (3, 5) in pairs          # +2 chords
    assert (5, 7) not in pairs                          # no wrap
    with pytest.raises(ValueError, match="divide"):
        extended_chordal_ring(7, np.array([[2, 3]]))

    # connect_neighborhood on a path: order 2 adds the two-hop pairs
    path = pa.table({"src": np.array([0, 1, 2], np.int64),
                     "dst": np.array([1, 2, 3], np.int64)})
    cn = connect_neighborhood(path, 4, order=2, mode="all")
    ps = set(zip(cn["src"].to_numpy().tolist(),
                 cn["dst"].to_numpy().tolist()))
    assert {(0, 2), (1, 3), (2, 0), (3, 1)} <= ps

    # de Bruijn B(2,3): 8 vertices, out-degree 2, arcs i -> 2i%8 + j
    db = de_bruijn(2, 3)
    assert len(db) == 16
    s, d = db["src"].to_numpy(), db["dst"].to_numpy()
    for i in range(8):
        outs = sorted(d[s == i].tolist())
        assert outs == [(2 * i) % 8, (2 * i) % 8 + 1]
    assert len(de_bruijn(2, 0)) == 2      # loops on single vertex
    assert len(de_bruijn(0, 3)) == 0

    # Kautz K(2,1): 6 vertices, out-degree 2, isomorphic to the
    # line digraph of K3 doubled; every arc's string overlap holds
    kz = kautz(2, 1)
    s, d = kz["src"].to_numpy(), kz["dst"].to_numpy()
    assert len(set(s.tolist()) | set(d.tolist())) == 6
    assert len(kz) == 12
    counts = np.bincount(s, minlength=6)
    assert (counts == 2).all()
    # no vertex links to itself (consecutive-symbol rule)
    assert (s != d).all()

    # LCF: Petersen graph = LCF [2, -2]^5 on the 5-prism? classic:
    # Desargues [5, -5, 9, -9]^5; use networkx.LCF_graph as oracle
    for n, sh, rep in ((10, [5], 10), (8, [3, -3], 4),
                       (14, [5, -5], 7)):
        ours = lcf(n, sh, rep)
        g = nx.LCF_graph(n, sh, rep)
        want = {(min(a, b), max(a, b)) for a, b in g.edges()}
        got = {(min(int(a), int(b)), max(int(a), int(b)))
               for a, b in zip(ours["src"].to_numpy(),
                               ours["dst"].to_numpy())}
        assert got == want, (n, sh, rep)
