"""Graph build: dictionary encoding, edge encoding, simplify, degrees."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from xdata_igraph_ray.graph.build import (
    build_graph_tables,
    degrees,
    simplify,
    sorted_ranks,
    vertex_dict,
)


def test_sorted_ranks():
    vals = ["pear", "apple", "fig", "banana", "kiwi"]
    ds = rd.from_arrow(pa.table({"url": vals}))
    out = sorted_ranks(ds, "url", rank_name="vid", P=3).to_pandas()
    out = out.sort_values("vid").reset_index(drop=True)
    assert list(out["url"]) == sorted(vals)
    assert list(out["vid"]) == [0, 1, 2, 3, 4]


def test_build_graph_tables_roundtrip(tiny_pages):
    pages = rd.read_parquet(tiny_pages["pages"])
    verts, edges = build_graph_tables(pages, P=4)
    vdf = verts.to_pandas().sort_values("vid").reset_index(drop=True)
    # vid = rank in sorted url order
    assert list(vdf["url"]) == sorted(vdf["url"])
    assert list(vdf["vid"]) == list(range(len(vdf)))
    # decoding edges through the dict reproduces the golden url edges
    edf = edges.to_pandas()
    lut = vdf.set_index("vid")["url"]
    golden = pq.read_table(tiny_pages["edges"]).to_pandas()
    got = set(zip(edf["src"].map(lut), edf["dst"].map(lut)))
    want = set(zip(golden["src_url"], golden["dst_url"]))
    assert got == want
    assert len(edf) == len(golden)  # multi-edges preserved


def test_simplify():
    edges = rd.from_arrow(
        pa.table(
            {
                "src": [0, 0, 0, 1, 2, 2],
                "dst": [1, 1, 0, 2, 2, 1],
            }
        )
    )
    out = simplify(edges, P=2).to_pandas().sort_values(["src", "dst"])
    assert list(map(tuple, out.values)) == [(0, 1), (1, 2), (2, 1)]
    keep_loops = simplify(edges, remove_loops=False, P=2).to_pandas()
    assert len(keep_loops) == 5
    keep_multi = simplify(edges, remove_multiple=False, P=2).to_pandas()
    assert len(keep_multi) == 4


def test_simplify_weighted():
    edges = rd.from_arrow(
        pa.table(
            {
                "src": [0, 0, 1],
                "dst": [1, 1, 2],
                "weight": [1.0, 2.5, 4.0],
            }
        )
    )
    out = (
        simplify(edges, weighted=True, P=2)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert list(out["weight"]) == [3.5, 4.0]


def test_degrees():
    edges = rd.from_arrow(
        pa.table({"src": [0, 0, 1, 3, 3, 3], "dst": [1, 2, 0, 3, 0, 1]})
    )
    out = degrees(edges, n=5, P=3).to_pandas().sort_values("vid").reset_index(drop=True)
    assert list(out["vid"]) == [0, 1, 2, 3, 4]
    assert list(out["out_deg"]) == [2, 1, 0, 3, 0]
    assert list(out["in_deg"]) == [2, 2, 1, 1, 0]


def test_from_edges_bundles_many_tiny_blocks(ray_session):
    # the driver-side coalesce path: len(refs) > 2P triggers bundling
    import numpy as np
    import pyarrow as pa
    import ray as _ray

    from xdata_igraph_ray.graph.engine import GraphEngine

    rng = np.random.default_rng(0)
    refs, total = [], 0
    for i in range(40):  # 40 blocks >> 2*P
        k = int(rng.integers(1, 50))
        refs.append(_ray.put(pa.table({
            "src": rng.integers(0, 100, k),
            "dst": rng.integers(0, 100, k),
        })))
        total += k
    eng = GraphEngine.from_edges(refs, n=100, P=4)
    assert eng.edge_count == total
    eng.shutdown()
