"""Late-round-3 API completions: pagerank_old (deprecated power
method), subgraph-isomorphism enumeration, motif callback, clique
file sink."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph import generators
from xdata_igraph_ray.graph.cliques import (
    count_maximal_cliques, maximal_cliques_file,
)
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.isomorphism import (
    count_subisomorphisms, get_subisomorphisms, subisomorphic,
)
from xdata_igraph_ray.graph.motifs import (
    motifs_randesu_callback, motifs_randesu_no,
)
from xdata_igraph_ray.graph.pagerank import pagerank_old


def _tbl(src, dst):
    return pa.table({"src": np.asarray(src, dtype=np.int64),
                     "dst": np.asarray(dst, dtype=np.int64)})


def _pagerank_old_ref(src, dst, n, niter, eps, damping, old):
    """Literal replay of src/structural_properties.c:1364-1540."""
    outdeg = np.bincount(src, minlength=n).astype(float)
    loops = np.bincount(np.asarray(src)[np.asarray(src) == np.asarray(dst)],
                        minlength=n)
    outdeg -= loops
    outdeg[outdeg == 0] = 1.0
    p = np.full(n, 1.0 - damping)
    maxdiff = eps
    it = niter
    while it > 0 and maxdiff >= eps:
        it -= 1
        scaled = p / outdeg
        new = np.zeros(n)
        np.add.at(new, dst, scaled[src])
        new = damping * new + ((1 - damping) if old else (1 - damping) / n)
        if not old:
            new = new / new.sum()
        maxdiff = np.abs(new - p).max()
        p = new
    return p


@pytest.mark.parametrize("old", [False, True])
@pytest.mark.parametrize("seed", [0, 3])
def test_pagerank_old_matches_reference_replay(old, seed):
    rng = np.random.default_rng(seed)
    n, m = 40, 160
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    # include a self-loop and a dangling vertex (n-1 never cites)
    src, dst = np.append(src, 5), np.append(dst, 5)
    src = np.where(src == n - 1, 0, src)
    eng = GraphEngine.from_edges(_tbl(src, dst), n=n, P=3)
    info = pagerank_old(eng, niter=80, eps=1e-13, damping=0.85, old=old)
    got = eng.state_arrays("prold")
    want = _pagerank_old_ref(src, dst, n, 80, 1e-13, 0.85, old)
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert info["iterations"] <= 80


def test_pagerank_old_validation():
    eng = GraphEngine.from_edges(_tbl([0], [1]), n=2, P=1)
    with pytest.raises(ValueError):
        pagerank_old(eng, niter=0)
    with pytest.raises(ValueError):
        pagerank_old(eng, eps=0.0)
    with pytest.raises(ValueError):
        pagerank_old(eng, damping=1.0)


def test_count_subisomorphisms_vs_networkx():
    nx = pytest.importorskip("networkx")
    t = generators.erdos_renyi_gnm(10, 24, directed=True, seed=7)
    # pattern: directed path of length 2
    pat = _tbl([0, 1], [1, 2])
    got = count_subisomorphisms(pat, 3, t, 10, directed=True)
    G = nx.DiGraph(list(zip(t["src"].to_numpy().tolist(),
                            t["dst"].to_numpy().tolist())))
    G.add_nodes_from(range(10))
    P = nx.DiGraph([(0, 1), (1, 2)])
    gm = nx.algorithms.isomorphism.DiGraphMatcher(G, P)
    want = sum(1 for _ in gm.subgraph_monomorphisms_iter())
    assert got == want


def test_get_subisomorphisms_mappings_valid_and_induced():
    # K4 minus one edge as target; triangle pattern
    t = _tbl([0, 0, 0, 1, 1], [1, 2, 3, 2, 3])
    pat = _tbl([0, 1, 0], [1, 2, 2])
    maps = get_subisomorphisms(pat, 3, t, 4, directed=True)
    es = set(zip(t["src"].to_numpy().tolist(), t["dst"].to_numpy().tolist()))
    for m in maps:
        for a, b in [(0, 1), (1, 2), (0, 2)]:
            assert (m[a], m[b]) in es
    # consistency with the boolean probe
    assert (len(maps) > 0) == subisomorphic(pat, 3, t, 4, directed=True)
    # induced enumeration is a subset of monomorphic
    ind = get_subisomorphisms(pat, 3, t, 4, directed=True, induced=True)
    assert len(ind) <= len(maps)
    # limit caps enumeration
    assert len(get_subisomorphisms(pat, 3, t, 4, limit=1)) == 1


def test_motifs_randesu_callback_counts_and_stops():
    import ray.data as rd

    t = rd.from_arrow(generators.erdos_renyi_gnm(12, 26, directed=False,
                                                 seed=1))
    seen = []
    total = motifs_randesu_callback(t, 12, lambda vs: seen.append(vs),
                                    size=3)
    assert total == motifs_randesu_no(t, 12, size=3)
    assert len(seen) == total
    # every emitted subgraph has 3 distinct sorted vertices
    assert all(len(vs) == 3 and vs == sorted(vs) for vs in seen)
    # each subgraph appears exactly once
    assert len({tuple(vs) for vs in seen}) == total
    # early stop after the 5th subgraph
    hits = []
    motifs_randesu_callback(
        t, 12, lambda vs: (hits.append(vs), len(hits) >= 5)[1], size=3)
    assert len(hits) == 5


def test_maximal_cliques_file_roundtrip(tmp_path):
    import ray.data as rd

    t = rd.from_arrow(generators.erdos_renyi_gnm(15, 45, directed=False,
                                                 seed=2))
    path = str(tmp_path / "cliques.txt")
    cnt = maximal_cliques_file(t, path)
    assert cnt == count_maximal_cliques(t)
    lines = [sorted(map(int, ln.split()))
             for ln in open(path).read().splitlines()]
    assert len(lines) == cnt
    assert len({tuple(x) for x in lines}) == cnt


def test_list_triangles_matches_counts():
    import ray.data as rd

    from xdata_igraph_ray.graph.triangles import list_triangles, triangles

    t = rd.from_arrow(generators.erdos_renyi_gnm(30, 90, directed=False,
                                                 seed=3))
    total, _ = triangles(t, 30, per_vertex=False)
    tri = list_triangles(t).to_pandas()
    assert len(tri) == total
    assert (tri["a"] < tri["b"]).all() and (tri["b"] < tri["c"]).all()
    # all triples are genuine triangles
    es = set()
    for r in rd.from_arrow(generators.erdos_renyi_gnm(
            30, 90, directed=False, seed=3)).to_pandas().itertuples():
        es.add((min(r.src, r.dst), max(r.src, r.dst)))
    for r in tri.itertuples():
        assert (r.a, r.b) in es and (r.b, r.c) in es and (r.a, r.c) in es
    assert len(tri.drop_duplicates()) == total


def test_is_loop_is_multiple_has_multiple_get_edgelist():
    import ray.data as rd

    from xdata_igraph_ray.graph.ops import (
        get_edgelist, has_multiple, is_loop, is_multiple,
    )

    t = pa.table({"src": np.array([0, 1, 1, 2, 3], np.int64),
                  "dst": np.array([1, 1, 2, 1, 3], np.int64)})
    t = pa.concat_tables([t, t.slice(2, 1)])  # duplicate (1,2)
    ds = rd.from_arrow(t)
    fl = is_loop(ds).to_pandas()["is_loop"].tolist()
    assert fl == [False, True, False, False, True, False]
    im = is_multiple(ds).to_pandas()
    flagged = im[im["is_multiple"]]
    assert len(flagged) == 1
    assert flagged.iloc[0]["src"] == 1 and flagged.iloc[0]["dst"] == 2
    # the SECOND copy (higher eid) is the flagged one
    assert flagged.iloc[0]["eid"] == 5
    assert has_multiple(ds)
    assert not has_multiple(rd.from_arrow(
        pa.table({"src": np.array([0, 1], np.int64),
                  "dst": np.array([1, 2], np.int64)})))
    el = get_edgelist(ds).to_pandas()
    assert list(el.columns) == ["src", "dst"] and len(el) == 6


def test_is_connected_modes():
    from xdata_igraph_ray.graph.components import is_connected
    from xdata_igraph_ray.graph.engine import GraphEngine

    # directed ring: weakly and strongly connected
    ring = _tbl([0, 1, 2, 3], [1, 2, 3, 0])
    eng = GraphEngine.from_edges(ring, n=4, P=2)
    assert is_connected(eng, "weak")
    assert is_connected(eng, "strong")
    # directed path: weak yes, strong no
    path = _tbl([0, 1, 2], [1, 2, 3])
    eng2 = GraphEngine.from_edges(path, n=4, P=2)
    assert is_connected(eng2, "weak")
    assert not is_connected(eng2, "strong")
    # disconnected
    two = _tbl([0, 2], [1, 3])
    eng3 = GraphEngine.from_edges(two, n=4, P=2)
    assert not is_connected(eng3, "weak")
    with pytest.raises(ValueError):
        is_connected(eng3, "nope")


def test_hub_authority_flow_value_wrappers():
    from xdata_igraph_ray.graph.centrality import (
        authority_score, hub_score,
    )
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.flow import maxflow_value, st_mincut_value

    star = _tbl([0, 0, 0, 4], [1, 2, 3, 0])
    eng = GraphEngine.from_edges(star, n=5, P=2)
    hub = hub_score(eng).to_pandas().sort_values("vid")
    assert hub["hub"].iloc[0] == hub["hub"].max() == 1.0  # vertex 0
    auth = authority_score(eng).to_pandas().sort_values("vid")
    assert auth["auth"].iloc[0] < auth["auth"].max()
    # unit-capacity 2-path network
    net = _tbl([0, 0, 1, 2], [1, 2, 3, 3])
    enf = GraphEngine.from_edges(net, n=4, P=2)
    assert maxflow_value(enf, 0, 3) == 2.0
    enf2 = GraphEngine.from_edges(net, n=4, P=2)
    assert st_mincut_value(enf2, 0, 3) == 2.0


def test_modularity_matrix_rowsums_zero():
    import ray.data as rd

    from xdata_igraph_ray.graph.metrics import modularity_matrix

    t = rd.from_arrow(generators.erdos_renyi_gnm(12, 26, directed=False,
                                                 seed=5))
    B = modularity_matrix(t, 12)
    assert B.shape == (12, 12)
    np.testing.assert_allclose(B.sum(axis=1), 0.0, atol=1e-9)
    np.testing.assert_allclose(B, B.T, atol=0)
