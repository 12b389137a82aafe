"""decompose + neighborhood_size."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from xdata_igraph_ray.graph.components import wcc
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.paths import decompose, neighborhood_size


def test_decompose_partitions(tmp_path):
    # two components: triangle 0-1-2 and edge 3-4
    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 0, 4], dtype=np.int64)
    tbl = pa.table({"src": src, "dst": dst})
    eng = GraphEngine.from_edges(tbl, n=5, P=2)
    wcc(eng)
    membership = eng.state_dataset(["label"], rename={"label": "component"})
    out = str(tmp_path / "parts")
    decompose(rd.from_arrow(tbl), membership, out, P=2)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("component="))
    assert dirs == ["component=0", "component=1"]
    c0 = pq.read_table(os.path.join(out, "component=0")).to_pandas()
    assert len(c0) == 3
    eng.shutdown()


def test_neighborhood_size():
    # path 0-1-2-3-4 (undirected via mode=all)
    src = np.arange(4, dtype=np.int64)
    dst = np.arange(1, 5, dtype=np.int64)
    eng = GraphEngine.from_edges(pa.table({"src": src, "dst": dst}), n=5, P=2)
    assert list(neighborhood_size(eng, [0, 2], order=1)) == [2, 3]
    assert list(neighborhood_size(eng, [0, 2], order=2)) == [3, 5]
    eng.shutdown()
