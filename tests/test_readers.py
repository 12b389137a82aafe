"""Text graph-format readers/writers (reference src/foreign.c paths)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.sources import readers


def test_edgelist_roundtrip(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("0 1\n1 2\n2 0\n")
    ds = readers.read_edgelist(str(p))
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(map(tuple, df.values)) == [(0, 1), (1, 2), (2, 0)]
    out = tmp_path / "out"
    readers.write_edgelist(ds, str(out))
    back = readers.read_edgelist(str(out))
    df2 = back.to_pandas()
    # write_csv adds a header line per file; drop non-numeric rows
    df2 = df2[df2["src"].notna()]
    assert len(df2) >= 3


def test_ncol(tmp_path):
    p = tmp_path / "g.ncol"
    p.write_text("a b 2.0\nb c\nc a 0.5\n")
    df = readers.read_ncol(str(p)).to_pandas().sort_values("src_url")
    assert list(df["src_url"]) == ["a", "b", "c"]
    assert list(df["weight"]) == [2.0, 1.0, 0.5]
    # symbolic -> dense ids through the dictionary machinery
    from xdata_igraph_ray.graph.build import encode_edges, vertex_dict

    ds = readers.read_ncol(str(p), weights=False)
    vd = vertex_dict(ds, P=2)
    edges = encode_edges(ds, vd, P=2).to_pandas()
    assert len(edges) == 3
    assert set(edges["src"]) | set(edges["dst"]) == {0, 1, 2}


def test_lgl(tmp_path):
    p = tmp_path / "g.lgl"
    p.write_text("# a\nb\nc 3.5\n# b\nc\n")
    df = readers.read_lgl(str(p)).to_pandas()
    assert len(df) == 3
    assert list(df[df["src_url"] == "a"]["dst_url"]) == ["b", "c"]
    assert df[df["dst_url"] == "c"]["weight"].tolist() == [3.5, 1.0]
