"""Bipartite constructors/conversions (igraph_bipartite.h,
src/bipartite.c), matching predicates (src/matching.c),
subcomponent, and the igraph_nongraph.h utilities."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.bipartite import (
    bipartite_game_gnm,
    bipartite_game_gnp,
    full_bipartite,
    get_incidence,
    incidence,
    is_matching,
    is_maximal_matching,
)
from xdata_igraph_ray.graph.nongraph import (
    convex_hull,
    fisher_yates_shuffle,
    random_sample,
    running_mean,
)


def _pairs(t):
    return set(zip(t["src"].to_numpy().tolist(),
                   t["dst"].to_numpy().tolist()))


def test_full_bipartite():
    t = full_bipartite(2, 3)
    assert _pairs(t) == {(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4)}
    t_in = full_bipartite(2, 2, directed=True, mode="in")
    assert _pairs(t_in) == {(2, 0), (3, 0), (2, 1), (3, 1)}
    t_all = full_bipartite(2, 2, directed=True, mode="all")
    assert len(t_all) == 8


def test_bipartite_games():
    t = bipartite_game_gnp(40, 60, 0.15, seed=1)
    s, d = t["src"].to_numpy(), t["dst"].to_numpy()
    assert (s < 40).all() and (d >= 40).all() and (d < 100).all()
    assert abs(len(t) / (40 * 60) - 0.15) < 0.03
    assert len(_pairs(t)) == len(t)
    # gnp degenerate probabilities
    assert len(bipartite_game_gnp(5, 5, 0.0, seed=2)) == 0
    assert len(bipartite_game_gnp(5, 5, 1.0, seed=3)) == 25
    t2 = bipartite_game_gnm(10, 10, 37, seed=4)
    assert len(t2) == 37 and len(_pairs(t2)) == 37
    s2, d2 = t2["src"].to_numpy(), t2["dst"].to_numpy()
    assert (s2 < 10).all() and (d2 >= 10).all()
    with pytest.raises(ValueError, match="too many"):
        bipartite_game_gnm(3, 3, 10)


def test_incidence_roundtrip(ray_session):
    import ray.data as rd

    mat = np.array([[1, 0, 2], [0, 3, 0]])
    t = incidence(mat, multiple=True)
    # entry (0,2)=2 -> two parallel 0->4 edges; (1,1)=3 -> three 1->3
    src = t["src"].to_numpy().tolist()
    dst = t["dst"].to_numpy().tolist()
    assert sorted(zip(src, dst)) == [(0, 2), (0, 4), (0, 4),
                                     (1, 3), (1, 3), (1, 3)]
    t1 = incidence(mat, multiple=False)
    assert sorted(_pairs(t1)) == [(0, 2), (0, 4), (1, 3)]
    # fractional entries truncate toward zero (reference C long cast):
    # 2.7 -> 2 edges, 0.9 -> 0 edges (np.rint would give 3 and 1)
    tf = incidence(np.array([[2.7, 0.9]]), multiple=True)
    assert sorted(zip(tf["src"].to_numpy().tolist(),
                      tf["dst"].to_numpy().tolist())) == [(0, 1), (0, 1)]
    # sparse COO export reproduces the counts
    coo = get_incidence(rd.from_arrow(t), n1=2, P=2)
    got = {(int(r), int(c)): int(k) for r, c, k in
           zip(coo["row"].to_numpy(), coo["col"].to_numpy(),
               coo["count"].to_numpy())}
    assert got == {(0, 0): 1, (0, 2): 2, (1, 1): 3}
    with pytest.raises(ValueError, match="first-type"):
        get_incidence(rd.from_arrow(pa.table({
            "src": np.array([5], np.int64),
            "dst": np.array([0], np.int64)})), n1=2, P=2)


def test_projection_size(ray_session):
    import ray.data as rd

    from xdata_igraph_ray.graph.bipartite import bipartite_projection_size

    # two first-type sharing one dst; two second-type sharing a src
    t = pa.table({"src": np.array([0, 1, 0], np.int64),
                  "dst": np.array([10, 10, 11], np.int64)})
    sz = bipartite_projection_size(rd.from_arrow(t), P=2)
    assert sz["ecount1"] == 1          # (0,1) share dst 10
    assert sz["ecount2"] == 1          # (10,11) share src 0
    assert sz["vcount1"] == 2 and sz["vcount2"] == 2


def test_matching_predicates():
    e = pa.table({"src": np.array([0, 1, 2], np.int64),
                  "dst": np.array([3, 4, 3], np.int64)})
    types = np.array([0, 0, 0, 1, 1])
    good = np.array([3, 4, -1, 0, 1])
    assert is_matching(e, 5, good, types=types)
    assert is_maximal_matching(e, 5, good, types=types)
    # non-maximal: 2-3 edge available
    partial = np.array([-1, 4, -1, -1, 1])
    assert is_matching(e, 5, partial, types=types)
    assert not is_maximal_matching(e, 5, partial, types=types)
    # asymmetric
    assert not is_matching(e, 5, np.array([3, -1, -1, -1, -1]),
                           types=types)
    # pair is not an edge
    assert not is_matching(e, 5, np.array([4, -1, -1, -1, 0]),
                           types=types)
    # same-type partners rejected
    assert not is_matching(
        pa.table({"src": np.array([0], np.int64),
                  "dst": np.array([1], np.int64)}),
        2, np.array([1, 0]), types=np.array([0, 0]))


def test_subcomponent(ray_session):
    import ray

    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.paths import subcomponent

    # 0->1->2, 3->1, isolated 4
    t = pa.table({"src": np.array([0, 1, 3], np.int64),
                  "dst": np.array([1, 2, 1], np.int64)})
    eng = GraphEngine.from_edges(ray.data.from_arrow(t), n=5, P=2)
    try:
        assert subcomponent(eng, 0, "out").tolist() == [0, 1, 2]
        assert subcomponent(eng, 2, "in").tolist() == [0, 1, 2, 3]
        assert subcomponent(eng, 1, "all").tolist() == [0, 1, 2, 3]
        assert subcomponent(eng, 4, "all").tolist() == [4]
    finally:
        eng.shutdown()


def test_running_mean_and_sampling():
    assert running_mean([1, 2, 3, 4], 2).tolist() == [1.5, 2.5, 3.5]
    assert running_mean([5.0], 1).tolist() == [5.0]
    with pytest.raises(ValueError, match="longer"):
        running_mean([1.0], 2)
    s = random_sample(10, 30, 8, seed=5)
    assert len(s) == 8 and len(set(s.tolist())) == 8
    assert (s >= 10).all() and (s <= 30).all()
    assert (np.diff(s) > 0).all()
    with pytest.raises(ValueError, match="exceeds"):
        random_sample(0, 3, 10)
    arr = np.arange(50)
    sh = fisher_yates_shuffle(arr, seed=6)
    assert sorted(sh.tolist()) == arr.tolist()
    assert sh.tolist() != arr.tolist()


def test_convex_hull():
    # square + interior point
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1]])
    hull = convex_hull(pts)
    assert set(hull.tolist()) == {0, 1, 2, 3}
    # counterclockwise orientation: positive signed area
    hp = pts[hull]
    area = 0.0
    for i in range(len(hp)):
        x1, y1 = hp[i]
        x2, y2 = hp[(i + 1) % len(hp)]
        area += x1 * y2 - x2 * y1
    assert area > 0
    # random clouds: every point inside or on the hull polygon
    rng = np.random.default_rng(7)
    for _ in range(5):
        pts = rng.random((40, 2))
        hull = pts[convex_hull(pts)]
        k = len(hull)
        for q in pts:
            inside = all(
                (hull[(i + 1) % k][0] - hull[i][0])
                * (q[1] - hull[i][1])
                - (hull[(i + 1) % k][1] - hull[i][1])
                * (q[0] - hull[i][0]) >= -1e-9
                for i in range(k)
            )
            assert inside
    assert convex_hull(np.empty((0, 2))).tolist() == []
    assert len(convex_hull(np.array([[1.0, 2.0]]))) == 1


def test_projection_size_isolated_and_gnm_all(ray_session):
    import ray.data as rd

    from xdata_igraph_ray.graph.bipartite import (
        bipartite_game_gnm,
        bipartite_projection_size,
    )

    # no shared neighbors at all: vcounts still count the vertices
    t = pa.table({"src": np.array([0, 1], np.int64),
                  "dst": np.array([10, 11], np.int64)})
    sz = bipartite_projection_size(rd.from_arrow(t), P=2)
    assert sz == {"vcount1": 2, "ecount1": 0,
                  "vcount2": 2, "ecount2": 0}
    # directed mode='all' gnm samples both orientations
    t2 = bipartite_game_gnm(2, 2, 8, directed=True, mode="all", seed=9)
    s2, d2 = t2["src"].to_numpy(), t2["dst"].to_numpy()
    fwd = ((s2 < 2) & (d2 >= 2)).sum()
    rev = ((s2 >= 2) & (d2 < 2)).sum()
    assert fwd == 4 and rev == 4
    with pytest.raises(ValueError, match="too many"):
        bipartite_game_gnm(2, 2, 9, directed=True, mode="all")


def test_plfit_review_edges():
    from xdata_igraph_ray.graph.plfit import power_law_fit

    # discrete: 3 distinct values, smallest multiplicity 1 -> clear
    # error instead of a NoneType crash
    with pytest.raises(ValueError, match="no candidate"):
        power_law_fit(np.array([1.0, 2.0, 3.0]))
    # continuous fixed xmin = 0 -> clear validation error
    with pytest.raises(ValueError, match="greater than zero"):
        power_law_fit(np.array([0.5, 1.0, 2.0, 3.0]), xmin=0.0,
                      force_continuous=True)


def test_maximum_matching_blossom(ray_session):
    """General-graph maximum-cardinality matching — extension beyond
    the reference (igraph_maximum_matching raises UNIMPLEMENTED)."""
    import networkx as nx
    import pytest
    import ray

    from xdata_igraph_ray.graph.bipartite import (
        is_matching, is_maximal_matching, maximum_matching)

    def _tbl(pairs):
        return pa.table({
            "src": np.array([a for a, _ in pairs], np.int64),
            "dst": np.array([b for _, b in pairs], np.int64)})

    # odd cycle C5 -> 2; blossom contraction is exercised
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    r = maximum_matching([ray.put(_tbl(c5))], 5, P=2)
    assert r["matching_size"] == 2
    assert is_matching(_tbl(c5), 5, r["matching"])
    assert is_maximal_matching(_tbl(c5), 5, r["matching"])

    # Petersen graph has a perfect matching (size 5)
    pg = nx.petersen_graph()
    r = maximum_matching([ray.put(_tbl(list(pg.edges())))], 10, P=2)
    assert r["matching_size"] == 5

    # the classic blossom trap: two triangles joined by a path
    trap = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5),
            (5, 6), (6, 4)]
    r = maximum_matching([ray.put(_tbl(trap))], 7, P=2)
    g = nx.Graph(trap)
    want = len(nx.max_weight_matching(g, maxcardinality=True))
    assert r["matching_size"] == want == 3

    # random graphs: cardinality equals networkx blossom, output valid
    rng = np.random.default_rng(7)
    for trial in range(12):
        n = int(rng.integers(6, 24))
        m = int(rng.integers(n, 3 * n))
        s = rng.integers(0, n, size=m)
        d = rng.integers(0, n, size=m)
        keep = s != d
        pairs = list(zip(s[keep].tolist(), d[keep].tolist()))
        g = nx.Graph()
        g.add_nodes_from(range(n))
        g.add_edges_from(pairs)
        want = len(nx.max_weight_matching(g, maxcardinality=True))
        r = maximum_matching([ray.put(_tbl(pairs))], n, P=2)
        assert r["matching_size"] == want, (trial, n, pairs)
        assert is_matching(_tbl(pairs), n, r["matching"])
        assert is_maximal_matching(_tbl(pairs), n, r["matching"])
        # deterministic
        r2 = maximum_matching([ray.put(_tbl(pairs))], n, P=2)
        assert (r2["matching"] == r["matching"]).all()

    # weighted path mirrors the reference's UNIMPLEMENTED
    with pytest.raises(NotImplementedError):
        maximum_matching([ray.put(_tbl(c5))], 5, P=2,
                         weights=np.ones(5))
