"""Interchange-format round trips (GraphML / Pajek / GML / DL /
DIMACS / DOT / LEDA / LGL writer)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.sources import formats
from xdata_igraph_ray.sources.readers import read_lgl


def _edges(w=False):
    t = {
        "src": pa.array([0, 0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 2, 0], pa.int64()),
    }
    if w:
        t["weight"] = pa.array([1.5, 2.0, 0.5, 3.0], pa.float64())
    return pa.table(t)


def test_graphml_roundtrip(tmp_path):
    p = str(tmp_path / "g.graphml")
    verts = pa.table(
        {
            "vid": pa.array([0, 1, 2], pa.int64()),
            "name": pa.array(["a", "b", "c"], pa.string()),
            "score": pa.array([0.5, 1.25, -2.0], pa.float64()),
            "rank": pa.array([3, 1, 2], pa.int64()),
        }
    )
    edges = _edges(w=True)
    formats.write_graphml(p, edges, verts, directed=True)
    v2, e2, directed = formats.read_graphml(p)
    assert directed
    assert v2["name"].to_pylist() == ["a", "b", "c"]
    assert v2["score"].to_pylist() == [0.5, 1.25, -2.0]
    assert v2["rank"].to_pylist() == [3, 1, 2]
    assert e2["src"].to_pylist() == edges["src"].to_pylist()
    assert e2["dst"].to_pylist() == edges["dst"].to_pylist()
    assert e2["weight"].to_pylist() == [1.5, 2.0, 0.5, 3.0]


def test_graphml_reader_into_engine(tmp_path):
    from xdata_igraph_ray.graph.engine import GraphEngine

    p = str(tmp_path / "g2.graphml")
    formats.write_graphml(p, _edges(), directed=True)
    _, e, _ = formats.read_graphml(p)
    eng = GraphEngine.from_edges(e.select(["src", "dst"]), P=2)
    assert eng.edge_count == 4
    eng.shutdown()


def test_pajek_roundtrip(tmp_path):
    p = str(tmp_path / "g.net")
    formats.write_pajek(p, _edges(w=True), directed=True)
    v, e, directed = formats.read_pajek(p)
    assert directed
    assert len(v) == 3
    assert e["src"].to_pylist() == [0, 0, 1, 2]
    assert e["weight"].to_pylist() == [1.5, 2.0, 0.5, 3.0]


def test_gml_roundtrip(tmp_path):
    p = str(tmp_path / "g.gml")
    verts = pa.table(
        {
            "vid": pa.array([0, 1, 2], pa.int64()),
            "name": pa.array(["x", "y", "z"], pa.string()),
        }
    )
    formats.write_gml(p, _edges(w=True), verts, directed=True)
    v, e, directed = formats.read_gml(p)
    assert directed
    assert v["name"].to_pylist() == ["x", "y", "z"]
    assert e["dst"].to_pylist() == [1, 2, 2, 0]
    assert e["weight"].to_pylist() == [1.5, 2.0, 0.5, 3.0]


def test_dl_reader(tmp_path):
    p = tmp_path / "g.dl"
    p.write_text("dl n=4\nformat = edgelist1\ndata:\n1 2 2.5\n3 4\n")
    n, e = formats.read_dl(str(p))
    assert n == 4
    assert e["src"].to_pylist() == [0, 2]
    assert e["dst"].to_pylist() == [1, 3]
    assert e["weight"].to_pylist() == [2.5, 1.0]


def test_dl_roundtrip(tmp_path):
    p = str(tmp_path / "rt.dl")
    edges = pa.table(
        {
            "src": pa.array([0, 2, 1], pa.int64()),
            "dst": pa.array([1, 3, 0], pa.int64()),
            "weight": pa.array([2.5, 1.0, 7.0], pa.float64()),
        }
    )
    formats.write_dl(p, 5, edges, weights=True)
    n, e = formats.read_dl(p)
    assert n == 5
    assert e["src"].to_pylist() == [0, 2, 1]
    assert e["dst"].to_pylist() == [1, 3, 0]
    assert e["weight"].to_pylist() == [2.5, 1.0, 7.0]


def test_dimacs_roundtrip(tmp_path):
    p = str(tmp_path / "g.max")
    edges = pa.table(
        {
            "src": pa.array([0, 1], pa.int64()),
            "dst": pa.array([1, 2], pa.int64()),
            "capacity": pa.array([5.0, 3.0], pa.float64()),
        }
    )
    formats.write_dimacs(p, edges, n=3, source=0, target=2)
    n, s, t, e = formats.read_dimacs(p)
    assert (n, s, t) == (3, 0, 2)
    assert e["capacity"].to_pylist() == [5.0, 3.0]


def test_dot_and_leda_writers(tmp_path):
    pd_ = str(tmp_path / "g.dot")
    formats.write_dot(pd_, _edges())
    txt = open(pd_).read()
    assert "digraph" in txt and "0 -> 1;" in txt
    pl = str(tmp_path / "g.leda")
    formats.write_leda(pl, _edges())
    lines = open(pl).read().splitlines()
    assert lines[0] == "LEDA.GRAPH"
    assert lines[4] == "3"  # n
    assert "1 2 0 |{}|" in lines


def test_lgl_writer_roundtrip(tmp_path):
    p = str(tmp_path / "g.lgl")
    urls = pa.table(
        {
            "src_url": pa.array(["a", "a", "b"], pa.string()),
            "dst_url": pa.array(["b", "c", "c"], pa.string()),
            "weight": pa.array([1.0, 2.0, 0.25], pa.float64()),
        }
    )
    formats.write_lgl(p, urls, weights=True)
    back = read_lgl(p).to_pandas()
    assert list(back["src_url"]) == ["a", "a", "b"]
    assert list(back["dst_url"]) == ["b", "c", "c"]
    assert list(back["weight"]) == [1.0, 2.0, 0.25]


def test_graphdb_roundtrip(tmp_path):
    p = str(tmp_path / "g.gdb")
    edges = pa.table(
        {
            "src": pa.array([0, 0, 2, 3], pa.int64()),
            "dst": pa.array([1, 3, 0, 3], pa.int64()),
        }
    )
    formats.write_graphdb(p, 4, edges)
    n, e = formats.read_graphdb(p)
    assert n == 4
    assert sorted(zip(e["src"].to_pylist(), e["dst"].to_pylist())) == [
        (0, 1), (0, 3), (2, 0), (3, 3)
    ]
    # byte-level: header word is the node count
    raw = np.fromfile(p, dtype="<u2")
    assert raw[0] == 4 and raw[1] == 2  # node 0 has 2 out-edges


def test_graphdb_empty_and_bounds(tmp_path):
    p = str(tmp_path / "e.gdb")
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64())})
    formats.write_graphdb(p, 3, empty)
    n, e = formats.read_graphdb(p)
    assert n == 3 and len(e) == 0
    import pytest as _pt

    with _pt.raises(ValueError):
        formats.write_graphdb(p, 1 << 16, empty)
