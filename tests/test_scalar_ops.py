"""Round-2 scalar operators: diversity, knn, constraint, barrat,
path_length_hist, exact diameter, adjacency exports, centralization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from xdata_igraph_ray.graph import metrics, ops
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.paths import diameter, path_length_hist
from xdata_igraph_ray.graph.triangles import transitivity_barrat, transitivity_local

from .oracles import gnm_edges


def _ds(src, dst, w=None):
    cols = {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return rd.from_arrow(pa.table(cols))


def test_diversity_formula():
    # vertex 0 incident (ALL) to weights [2, 3]; vertex 1 to [2]; 2 to [3]
    out = (
        metrics.diversity(_ds([0, 0], [1, 2], [2.0, 3.0]), n=4, P=2)
        .to_pandas().set_index("vid")["diversity"]
    )
    s, ent, k = 5.0, 2 * np.log(2) + 3 * np.log(3), 2
    assert out[0] == pytest.approx((np.log(s) - ent / s) / np.log(k))
    # k=1: log(1)=0 denominator -> nan/inf per reference float semantics
    assert not np.isfinite(out[1]) or np.isnan(out[1])
    assert np.isnan(out[3])  # isolated


def test_knn_vs_manual():
    src, dst = [0, 0, 1, 2], [1, 2, 2, 3]
    knn, knnk = metrics.avg_nearest_neighbor_degree(_ds(src, dst), n=5, P=2)
    k = knn.to_pandas().set_index("vid")["knn"]
    # ALL degrees: d0=2 d1=2 d2=3 d3=1
    assert k[0] == pytest.approx((2 + 3) / 2)
    assert k[1] == pytest.approx((2 + 3) / 2)
    assert k[2] == pytest.approx((2 + 2 + 1) / 3)
    assert k[3] == pytest.approx(3.0)
    assert np.isnan(k[4])
    kk = knnk.to_pandas().set_index("deg")["knnk"]
    assert kk[1] == pytest.approx(3.0)
    assert kk[2] == pytest.approx(2.5)
    assert kk[3] == pytest.approx(5 / 3)


def test_constraint_vs_networkx():
    import networkx as nx

    n, m = 40, 120
    src, dst = gnm_edges(n, m, seed=12)
    # canonical undirected simple pairs (a->b and b->a are ONE edge of
    # weight 1, like the nx.Graph oracle)
    pairs = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(src, dst) if a != b
    }
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(pairs)
    want = nx.constraint(g)
    es = np.array([p[0] for p in pairs])
    ed = np.array([p[1] for p in pairs])
    got = (
        metrics.constraint(_ds(es, ed), n=n, P=2)
        .to_pandas().set_index("vid")["constraint"]
    )
    for v in range(n):
        if np.isnan(want[v]):
            assert np.isnan(got[v]), v
        else:
            assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_barrat_equals_unweighted_when_uniform():
    s0, d0 = gnm_edges(80, 300, seed=5)
    # distinct canonical pairs so the collapsed weights stay uniform
    pairs = {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(s0, d0) if a != b}
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    bar = (
        transitivity_barrat(_ds(src, dst), n=80, P=2)
        .to_pandas().set_index("vid")["barrat"]
    )
    loc = (
        transitivity_local(_ds(src, dst), n=80, P=2)
        .to_pandas().set_index("vid")["transitivity"]
    )
    for v in bar.index:
        if np.isnan(bar[v]):
            assert np.isnan(loc[v])
        else:
            assert bar[v] == pytest.approx(loc[v], abs=1e-9), v


def test_barrat_weighted_triangle():
    # triangle 0-1-2 with weights w01=1 w02=2 w12=3, plus pendant 0-3
    src = [0, 0, 1, 0]
    dst = [1, 2, 2, 3]
    w = [1.0, 2.0, 3.0, 4.0]
    out = (
        transitivity_barrat(_ds(src, dst, w), n=4, P=2)
        .to_pandas().set_index("vid")["barrat"]
    )
    # vertex 1: s=4, k=2, ordered pairs -> (1+3)/(4*1) = 1.0
    assert out[1] == pytest.approx(1.0)
    # vertex 0: s=7, k=3 -> (1+2)/(7*2)
    assert out[0] == pytest.approx(3 / 14)
    assert np.isnan(out[3])


def test_path_length_hist_and_diameter():
    import networkx as nx

    n, m = 60, 150
    src, dst = gnm_edges(n, m, seed=18)
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst) if a != b)
    want: dict[int, int] = {}
    reach_pairs = 0
    for s, dd in nx.all_pairs_shortest_path_length(g):
        for t, d in dd.items():
            if d > 0:
                want[d] = want.get(d, 0) + 1
                reach_pairs += 1
    t = pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)})
    eng = GraphEngine.from_edges(t, n=n, P=3)
    hist, unconn = path_length_hist(eng, wave=32)
    assert hist == want
    assert unconn == n * (n - 1) - reach_pairs
    assert diameter(eng) == max(want)
    assert diameter(eng, unconn=False) == (n if unconn else max(want))
    eng.shutdown()


def test_adjacency_and_stochastic():
    src, dst = [0, 0, 0, 1], [1, 1, 2, 2]
    m = ops.get_adjacency(_ds(src, dst), n=3)
    assert m[0, 1] == 2 and m[0, 2] == 1 and m[1, 2] == 1
    st = ops.get_stochastic(_ds(src, dst), P=2).to_pandas()
    st = st.set_index(["src", "dst"])["p"]
    assert st[(0, 1)] == pytest.approx(2 / 3)
    assert st[(0, 2)] == pytest.approx(1 / 3)
    assert st[(1, 2)] == pytest.approx(1.0)


def test_centralization_degree_star():
    # undirected star as mutual arcs: center 0, leaves 1..4 (n=5)
    leaves = [1, 2, 3, 4]
    src = [0] * 4 + leaves
    dst = leaves + [0] * 4
    c = metrics.centralization_degree(_ds(src, dst), n=5, P=2)
    assert c == pytest.approx(1.0)  # star maximizes degree centralization


def test_get_laplacian_modes():
    import pyarrow as pa
    import ray.data as rd

    from xdata_igraph_ray.graph.ops import get_laplacian

    rng = np.random.default_rng(8)
    n, m = 20, 120
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.uniform(0.5, 2.0, m)
    ds = rd.from_arrow(pa.table({
        "src": src.astype(np.int64), "dst": dst.astype(np.int64),
        "weight": w}))

    A = np.zeros((n, n))
    for s, d, ww in zip(src, dst, w):
        if s != d:
            A[s, d] += ww
    deg = A.sum(axis=1)

    def to_mat(df):
        M = np.zeros((n, n))
        M[df["src"].to_numpy(), df["dst"].to_numpy()] = (
            df["value"].to_numpy()
        )
        return M

    got = to_mat(get_laplacian(ds, weighted=True, P=3).to_pandas())
    exp = np.diag(deg) - A
    assert np.allclose(got, exp)

    got = to_mat(
        get_laplacian(ds, weighted=True, normalized="out", P=3).to_pandas()
    )
    exp = np.diag((deg > 0).astype(float)) - A / np.where(deg > 0, deg, 1)[:, None]
    assert np.allclose(got, exp)

    # sym rule on a symmetric table
    ssym = np.concatenate((src, dst))
    dsym = np.concatenate((dst, src))
    wsym = np.concatenate((w, w))
    ds2 = rd.from_arrow(pa.table({
        "src": ssym.astype(np.int64), "dst": dsym.astype(np.int64),
        "weight": wsym}))
    A2 = np.zeros((n, n))
    for s, d, ww in zip(ssym, dsym, wsym):
        if s != d:
            A2[s, d] += ww
    d2 = A2.sum(axis=1)
    got = to_mat(
        get_laplacian(ds2, weighted=True, normalized="sym", P=3).to_pandas()
    )
    sq = np.sqrt(np.where(d2 > 0, d2, 1))
    exp = np.diag((d2 > 0).astype(float)) - A2 / np.outer(sq, sq)
    assert np.allclose(got, exp)
