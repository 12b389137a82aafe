"""random_walks (igraph_random_walk, src/random_walk.c:55) invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph import generators
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.paths import random_walks


def _walks_df(edges_tbl, n, starts, steps, seed=42, weighted=False, P=3):
    w = "weight" in edges_tbl.column_names
    eng = GraphEngine.from_edges(edges_tbl, n=n, P=P, weighted=w)
    try:
        return random_walks(
            eng, starts, steps, seed=seed, weighted=weighted
        ).to_pandas()
    finally:
        eng.shutdown()


def test_walks_follow_edges_and_length():
    t = generators.erdos_renyi_gnm(100, 800, directed=True, seed=1)
    es = set(zip(t["src"].to_numpy().tolist(), t["dst"].to_numpy().tolist()))
    df = _walks_df(t, 100, starts=list(range(20)), steps=15)
    for wid, g in df.groupby("walk"):
        g = g.sort_values("step")
        assert list(g["step"]) == list(range(len(g)))
        assert g["vid"].iloc[0] == wid  # start vertex = walk id here
        path = g["vid"].tolist()
        for a, b in zip(path, path[1:]):
            assert (a, b) in es
        # gnm(100, 800): every vertex almost surely has out-degree > 0,
        # so full length expected
        assert len(g) == 16


def test_walks_stop_at_sink():
    # path graph 0->1->2: walk must stop after reaching 2
    t = pa.table({"src": np.array([0, 1], dtype=np.int64),
                  "dst": np.array([1, 2], dtype=np.int64)})
    df = _walks_df(t, 3, starts=[0], steps=10, P=2)
    assert df["vid"].tolist() == [0, 1, 2] or sorted(df["step"]) == [0, 1, 2]
    assert len(df) == 3


def test_walks_deterministic_across_shard_counts():
    t = generators.erdos_renyi_gnm(60, 500, directed=True, seed=2)
    a = _walks_df(t, 60, list(range(10)), 12, seed=9, P=1)
    b = _walks_df(t, 60, list(range(10)), 12, seed=9, P=4)
    ka = sorted(map(tuple, a[["walk", "step", "vid"]].to_numpy().tolist()))
    kb = sorted(map(tuple, b[["walk", "step", "vid"]].to_numpy().tolist()))
    assert ka == kb
    c = _walks_df(t, 60, list(range(10)), 12, seed=10, P=4)
    kc = sorted(map(tuple, c[["walk", "step", "vid"]].to_numpy().tolist()))
    assert ka != kc


def test_walks_weighted_bias():
    # 0 -> {1 (w=99), 2 (w=1)}; self-returning edges keep walks alive
    t = pa.table({
        "src": np.array([0, 0, 1, 2], dtype=np.int64),
        "dst": np.array([1, 2, 0, 0], dtype=np.int64),
        "weight": np.array([99.0, 1.0, 1.0, 1.0]),
    })
    df = _walks_df(t, 3, starts=[0] * 200, steps=1, weighted=True, P=2)
    picks = df[df["step"] == 1]["vid"].to_numpy()
    assert (picks == 1).mean() > 0.9
