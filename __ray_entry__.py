"""Driver contract: entry() smoke pipeline, queries() per operator,
oracle_sql() DuckDB equivalents.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ray.init()/ray.shutdown().

Two input families:

* the TPC-H-ish tables under ``sf_dir`` (pre-registered as DuckDB
  views) — graph queries derive a 1000-vertex multigraph from lineitem
  (``src = l_orderkey % 1000, dst = l_partkey % 1000``), expressible
  identically in SQL; every vertex has out-edges at sf>=0.01, so the
  PageRank oracle needs no dangling term (asserted in tests);
* a deterministic synthetic ``pages`` fixture (BASELINE.json
  input_hint shape) generated under /tmp as a pure function of
  (scale, seed=42) with the golden embedded edge list written
  alongside — oracles read those parquet files directly.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from xdata_igraph_ray.sources.readers import read_parquet_clean as _read_pq

FIXTURE_ROOT = "/tmp/graft_fixtures"
NV = 1000  # lineitem-graph vertex-id space
PR_ITERS = 40
PR_DAMPING = 0.85


# ---------------------------------------------------------------------------
# fixtures


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"


def _pages_n(sf_dir: str) -> int:
    try:
        sf = float(_sf_name(sf_dir).replace("sf", ""))
    except ValueError:
        sf = 0.01
    return max(1000, min(100_000, int(round(sf * 1_000_000))))


def pages_fixture(sf_dir: str) -> dict[str, str]:
    from xdata_igraph_ray.sources.synth import generate_pages

    n = _pages_n(sf_dir)
    return generate_pages(os.path.join(FIXTURE_ROOT, f"pages_{n}"), n, seed=42)


# pre-generate the scales the driver touches so oracle SQL (which reads
# the parquet paths) never races the Ray side
for _sf in ("sf0.001", "sf0.01"):
    try:
        pages_fixture(f"/root/testdata/{_sf}")
    except Exception:
        pass
try:
    from xdata_igraph_ray.sources.synth import generate_embeddings as _gen_emb

    _gen_emb(os.path.join(FIXTURE_ROOT, "emb_planted"))
except Exception:
    pass


def _li_edges(sf_dir: str) -> rd.Dataset:
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    return ds.map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV,
                "dst": t["l_partkey"].to_numpy() % NV,
            }
        ),
        batch_format="pyarrow",
    )


_LI_E = f"(SELECT l_orderkey % {NV} AS src, l_partkey % {NV} AS dst FROM lineitem)"
_LI_V = f"(SELECT range AS vid FROM range(0, {NV}))"


def _lpa_sync_sql(iters: int) -> str:
    """Recursive-CTE replay of the synchronous LPA update rule for a
    fixed number of supersteps, first-appearance renumbered — shared
    by lpa_sync_li (8 iters) and lpa_li (16 iters)."""
    return f"""
            WITH RECURSIVE e AS {_LI_E},
            v AS {_LI_V},
            lab(v, l, iter) AS (
              SELECT vid, vid, 0 FROM v
              UNION ALL
              SELECT g.v,
                     CASE WHEN g.win_l <> g.cur_l AND g.cur_w < g.win_w
                          THEN g.win_l ELSE g.cur_l END,
                     g.iter + 1
              FROM (
                SELECT t.v,
                       min(t.iter) AS iter,
                       (max(t.c * 1000000 - t.l) + 999999) // 1000000
                         AS win_w,
                       ((max(t.c * 1000000 - t.l) + 999999) // 1000000)
                         * 1000000 - max(t.c * 1000000 - t.l) AS win_l,
                       max(CASE WHEN t.own = 1 THEN t.l END) AS cur_l,
                       max(CASE WHEN t.own = 1 THEN t.c ELSE 0 END)
                         AS cur_w
                FROM (
                  SELECT m.v, m.l, sum(m.inc) AS c, max(m.own) AS own,
                         min(m.iter) AS iter
                  FROM (
                    SELECT e.dst AS v, cur.l AS l, 1 AS inc, 0 AS own,
                           cur.iter AS iter
                    FROM lab cur JOIN e ON e.src = cur.v
                    UNION ALL
                    SELECT cur.v, cur.l, 0, 1, cur.iter FROM lab cur
                  ) m
                  GROUP BY m.v, m.l
                ) t
                GROUP BY t.v
                HAVING min(t.iter) < {iters}
              ) g
            )
            SELECT v AS vid,
                   dense_rank() OVER (ORDER BY fv) - 1 AS label
            FROM (
              SELECT v, min(v) OVER (PARTITION BY l) AS fv
              FROM lab WHERE iter = {iters}
            )
            """


def _planted_sql(nc: int, k: int) -> str:
    """Planted ring-of-cliques membership: comm = vid // k (matches
    first-appearance numbering since blocks are contiguous)."""
    return (
        f"SELECT range AS vid, range // {k} AS comm "
        f"FROM range(0, {nc * k})"
    )


_ENG_CACHE: dict[tuple, Any] = {}


def _cached_engine(key: tuple, build: Callable[[], Any]):
    """Shared GraphEngine per (graph variant, sf_dir).

    The driver runs queries() sequentially in one process; every
    algorithm (re)initialises its own state keys on the shards, so the
    actors are reusable across queries.  Without this, each query
    re-spun an 8-actor pool + CSR ingest (~2-4 s) — in round 2 that
    overhead meant the correctness gate only got through 50 of 99
    queries.  Cached engines are marked persistent so the per-query
    eng.shutdown() calls are no-ops; actors are reclaimed at
    ray.shutdown()."""
    eng = _ENG_CACHE.get(key)
    if eng is None or not eng.shards:
        eng = build()
        eng.persistent = True
        _ENG_CACHE[key] = eng
    return eng


def _engine(sf_dir: str, P: int = 8):
    from xdata_igraph_ray.graph.engine import GraphEngine

    return _cached_engine(
        ("li", sf_dir, P),
        lambda: GraphEngine.from_edges(_li_edges(sf_dir), n=NV, P=P),
    )


# ---------------------------------------------------------------------------
# query callables


def q_extract_text(sf_dir: str):
    from xdata_igraph_ray.stages.extract import extracted_text

    paths = pages_fixture(sf_dir)
    return extracted_text(_read_pq(paths["pages"]))


def q_extract_edges(sf_dir: str):
    from xdata_igraph_ray.stages.extract import extracted_edges

    paths = pages_fixture(sf_dir)
    return extracted_edges(_read_pq(paths["pages"]))


def q_vertices_pages(sf_dir: str):
    from xdata_igraph_ray.graph.build import vertex_dict
    from xdata_igraph_ray.stages.extract import extracted_edges

    paths = pages_fixture(sf_dir)
    return vertex_dict(extracted_edges(_read_pq(paths["pages"])), P=8)


def q_pagerank_pages(sf_dir: str):
    """Flagship: pages -> extract -> dictionary -> engine -> pagerank."""
    from xdata_igraph_ray.graph.build import build_graph_tables
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.pagerank import pagerank

    paths = pages_fixture(sf_dir)
    verts, edges = build_graph_tables(_read_pq(paths["pages"]), P=8)
    eng = GraphEngine.from_edges(edges, P=8)
    # fixed iterations + rounding so the DuckDB oracle (same recursion,
    # dangling mass redistributed per iteration) is hash-comparable
    pagerank(eng, tol=0.0, max_iter=PR_ITERS)
    out = (
        eng.state_dataset(["pr"], rename={"pr": "score"})
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    out["score"] = np.round(out["score"], 6)
    eng.shutdown()
    return out


def q_degrees(sf_dir: str):
    from xdata_igraph_ray.graph.build import degrees

    return degrees(_li_edges(sf_dir), n=NV, P=8)


def q_simplify(sf_dir: str):
    from xdata_igraph_ray.graph.build import simplify

    return simplify(_li_edges(sf_dir), P=8)


def q_count_multiple(sf_dir: str):
    from xdata_igraph_ray.graph.ops import count_multiple

    return count_multiple(_li_edges(sf_dir), P=8)


def q_top_out_degree(sf_dir: str):
    from xdata_igraph_ray.graph.build import degrees

    df = degrees(_li_edges(sf_dir), n=NV, P=8).to_pandas()
    df = df.sort_values(["out_deg", "vid"], ascending=[False, True]).head(20)
    return df[["vid", "out_deg"]].reset_index(drop=True)


def q_wcc(sf_dir: str):
    from xdata_igraph_ray.graph.components import wcc

    eng = _engine(sf_dir)
    wcc(eng)
    lab = eng.state_arrays("label")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "wcc": lab.astype(np.int64)})


def q_scc(sf_dir: str):
    from xdata_igraph_ray.graph.components import scc

    eng = _engine(sf_dir)
    scc(eng)
    lab = eng.state_arrays("scc")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "scc": lab.astype(np.int64)})


def q_pagerank_li(sf_dir: str):
    """Fixed-iteration PageRank on the lineitem graph.  The SQL oracle
    replays igraph's sumfrom teleport (dangling mass + (1-d) of the
    rest) over the full vertex universe, so it matches at every sf —
    sf0.001 has 7 dangling vertex ids.  Scores rounded to 6 dp for
    float-order robustness."""
    from xdata_igraph_ray.graph.pagerank import pagerank

    eng = _engine(sf_dir)
    pagerank(eng, tol=0.0, max_iter=PR_ITERS)
    scores = eng.state_arrays("pr")
    eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV), "score": np.round(scores, 6)}
    )


def q_triangles_total(sf_dir: str):
    from xdata_igraph_ray.graph.triangles import triangles

    total, _ = triangles(_li_edges(sf_dir), n=NV, P=8, per_vertex=False)
    return pd.DataFrame({"total": [total]})


def q_triangles_per_vertex(sf_dir: str):
    from xdata_igraph_ray.graph.triangles import triangles

    _, per_v = triangles(_li_edges(sf_dir), n=NV, P=8)
    return per_v


def q_lpa(sf_dir: str):
    """Synchronous LPA, 16 supersteps (mode=in, keep-if-tie, min-label
    tie-break, per-edge multiplicity votes), renumbered by first
    appearance — hash-exact vs a recursive-CTE replay of the identical
    update rule (the round-2 `no_oracle` gap; the engine's damped
    async-to-convergence variant stays pytest-verified and benched as
    lpa_web)."""
    from xdata_igraph_ray.graph.lpa import label_propagation

    eng = _engine(sf_dir)
    label_propagation(eng, mode="in", max_iter=16, sync_iters=99,
                      plateau_patience=None)
    lab = eng.state_arrays("label")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "label": _renumber(lab)})


def _renumber(lab: np.ndarray) -> np.ndarray:
    """First-appearance (min carrier vid) dense renumbering, the
    canonical community numbering used across the community family."""
    lab = np.asarray(lab)
    first = np.full(int(lab.max()) + 1, -1, np.int64)
    out = np.empty(len(lab), np.int64)
    nxt = 0
    for i, l in enumerate(lab.tolist()):
        if first[l] < 0:
            first[l] = nxt
            nxt += 1
        out[i] = first[l]
    return out


def _ring_cliques_ds(nc: int, k: int) -> rd.Dataset:
    """Deterministic ring-of-cliques edge table: nc contiguous cliques
    of k vertices, one bridge (c*k, ((c+1)%nc)*k) per clique — the
    planted partition (comm = vid // k) is the provable output of
    every community algorithm below at these sizes (probed exact),
    which is what makes a SQL oracle possible for greedy/spectral
    community detection: the oracle emits the planted membership and
    hash-equality certifies exact recovery."""
    src, dst = [], []
    for c in range(nc):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                src.append(base + i)
                dst.append(base + j)
    for c in range(nc):
        src.append(c * k)
        dst.append(((c + 1) % nc) * k)
    return rd.from_arrow(
        pa.table({"src": np.array(src, np.int64),
                  "dst": np.array(dst, np.int64)})
    )


def q_edge_ops(sf_dir: str):
    """union/intersection/difference cardinalities of two derived
    graphs — one row, three counts."""
    from xdata_igraph_ray.graph import ops

    e1 = _li_edges(sf_dir)
    ds2 = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {"src": t["l_partkey"].to_numpy() % NV,
             "dst": t["l_suppkey"].to_numpy() % NV}
        ),
        batch_format="pyarrow",
    )
    u = ops.edge_union(e1, ds2, P=8).count()
    i = ops.edge_intersection(e1, ds2, P=8).count()
    d = ops.edge_difference(e1, ds2, P=8).count()
    return pd.DataFrame({"u": [u], "i": [i], "d": [d]})


def q_reciprocity(sf_dir: str):
    from xdata_igraph_ray.graph.ops import reciprocity

    return pd.DataFrame(
        {"reciprocity": [round(reciprocity(_li_edges(sf_dir), P=8), 6)]}
    )


def q_sssp(sf_dir: str):
    """Hop distance from vertex 0 over the lineitem graph (-1 =
    unreachable)."""
    from xdata_igraph_ray.graph.paths import sssp

    eng = _engine(sf_dir)
    d = sssp(eng, [0], mode="out")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "dist": d.astype(np.int64)})


def q_sssp_weighted(sf_dir: str):
    """Weighted shortest distances from vertex 0 (weight = l_quantity,
    Bellman-Ford relaxation supersteps); unreachable -> -1."""
    from xdata_igraph_ray.graph.paths import sssp_weighted

    eng = _engine_li_w(sf_dir)
    d = sssp_weighted(eng, [0], mode="out")
    eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV),
         "dist": np.round(np.where(np.isinf(d), -1.0, d), 6)}
    )


NV2 = 200  # closeness/betweenness graph: all-pairs oracles are cubic


def _li_edges_200(sf_dir: str) -> rd.Dataset:
    return _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV2,
                "dst": t["l_partkey"].to_numpy() % NV2,
            }
        ),
        batch_format="pyarrow",
    )


def _engine_200(sf_dir: str):
    from xdata_igraph_ray.graph.engine import GraphEngine

    return _cached_engine(
        ("li200", sf_dir),
        lambda: GraphEngine.from_edges(_li_edges_200(sf_dir), n=NV2, P=4),
    )


def _engine_li_w(sf_dir: str):
    """Weighted (l_quantity) 1000-vertex lineitem engine, shared by the
    weighted pagerank / sssp queries."""
    from xdata_igraph_ray.graph.engine import GraphEngine

    def build():
        li = _read_pq(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_quantity"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "src": t["l_orderkey"].to_numpy() % NV,
                    "dst": t["l_partkey"].to_numpy() % NV,
                    "weight": t["l_quantity"],
                }
            ),
            batch_format="pyarrow",
        )
        return GraphEngine.from_edges(li, n=NV, P=8, weighted=True)

    return _cached_engine(("li_w", sf_dir), build)


def q_closeness(sf_dir: str):
    """igraph closeness (out mode, unnormalized): 1 / (sum of
    distances + n * unreached), on the 200-vertex derived graph."""
    from xdata_igraph_ray.graph.centrality import closeness
    from xdata_igraph_ray.graph.engine import GraphEngine

    eng = _engine_200(sf_dir)
    c = closeness(eng, wave=100)
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV2), "closeness": np.round(c, 6)})


def q_closeness_in(sf_dir: str):
    """closeness mode='in' (distances along reversed edges) — the
    round-2 partial, now first-class (src/centrality.c:2473 modes).
    Full doubles: 1/total of exact ints is bit-identical to the
    oracle's division."""
    from xdata_igraph_ray.graph.centrality import closeness

    eng = _engine_200(sf_dir)
    c = closeness(eng, wave=100, mode="in")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV2), "closeness": c})


def q_closeness_all(sf_dir: str):
    """closeness mode='all' (undirected view via the shards'
    union CSR)."""
    from xdata_igraph_ray.graph.centrality import closeness

    eng = _engine_200(sf_dir)
    c = closeness(eng, wave=100, mode="all")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV2), "closeness": c})


def q_harmonic(sf_dir: str):
    """Harmonic centrality (normalized) on the 200-vertex graph."""
    from xdata_igraph_ray.graph.centrality import harmonic_centrality
    from xdata_igraph_ray.graph.engine import GraphEngine

    eng = _engine_200(sf_dir)
    h = harmonic_centrality(eng, wave=100)
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV2), "harmonic": np.round(h, 6)})


def q_closeness_weighted(sf_dir: str):
    """Weighted closeness on the 60-vertex graph with small integer
    weights ((l_quantity % 3) + 1; parallel edges keep the MIN weight
    in both engines via the simplify-free multigraph: the engine
    relaxes every parallel arc, SQL takes min weight per pair)."""
    from xdata_igraph_ray.graph.centrality import closeness_weighted
    from xdata_igraph_ray.graph.engine import GraphEngine

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 60,
                "dst": t["l_partkey"].to_numpy() % 60,
                "weight": (t["l_quantity"].to_numpy() % 3) + 1.0,
            }
        ),
        batch_format="pyarrow",
    )
    eng = GraphEngine.from_edges(ds, n=60, P=4, weighted=True)
    try:
        c = closeness_weighted(eng, wave=60)
    finally:
        eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(60), "closeness": np.round(c, 6)}
    )


def _wli_edges_60_min(sf_dir: str):
    """60-vertex weighted derived graph, parallel arcs collapsed to
    the MIN weight per (src, dst) — sigma counting (betweenness) must
    see a simple weighted graph to match the SQL walk-count oracle."""
    from xdata_igraph_ray.exchange import groupby_agg

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 60,
                "dst": t["l_partkey"].to_numpy() % 60,
                "weight": (t["l_quantity"].to_numpy() % 3) + 1.0,
            }
        ),
        batch_format="pyarrow",
    )
    return groupby_agg(ds, ["src", "dst"], [("weight", "min", "weight")], P=4)


def q_betweenness_weighted(sf_dir: str):
    """Weighted Brandes betweenness (igraph_betweenness with weights)
    on the min-collapsed 60-vertex weighted graph; directed, endpoints
    excluded, exact (all sources)."""
    from xdata_igraph_ray.graph.centrality import betweenness_weighted
    from xdata_igraph_ray.graph.engine import GraphEngine

    eng = GraphEngine.from_edges(
        _wli_edges_60_min(sf_dir), n=60, P=4, weighted=True
    )
    try:
        bc = betweenness_weighted(eng, wave=60)
    finally:
        eng.shutdown()
    return pd.DataFrame({"vid": np.arange(60), "bc": np.round(bc, 6)})


def q_harmonic_weighted(sf_dir: str):
    """Weighted harmonic centrality (normalized) on the 60-vertex
    weighted multigraph (min-distance only — multigraph fine)."""
    from xdata_igraph_ray.graph.centrality import harmonic_weighted
    from xdata_igraph_ray.graph.engine import GraphEngine

    eng = GraphEngine.from_edges(
        _wli_edges_60_min(sf_dir), n=60, P=4, weighted=True
    )
    try:
        h = harmonic_weighted(eng, normalized=True, wave=60)
    finally:
        eng.shutdown()
    return pd.DataFrame({"vid": np.arange(60), "harmonic": np.round(h, 6)})


def q_betweenness(sf_dir: str):
    """Exact Brandes betweenness on the simplified 200-vertex derived
    graph (directed, endpoints excluded)."""
    from xdata_igraph_ray.graph.build import simplify
    from xdata_igraph_ray.graph.centrality import betweenness
    from xdata_igraph_ray.graph.engine import GraphEngine

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV2,
                "dst": t["l_partkey"].to_numpy() % NV2,
            }
        ),
        batch_format="pyarrow",
    )
    simple = simplify(ds, remove_loops=False, P=8)
    eng = GraphEngine.from_edges(simple, n=NV2, P=4)
    bc = betweenness(eng, wave=100)
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV2), "bc": np.round(bc, 6)})


def q_shortest_paths(sf_dir: str):
    """One deterministic shortest path (min-vid parents) from vertex 0
    to each target, rendered as 'a->b->c' strings ('' = unreachable)."""
    from xdata_igraph_ray.graph.paths import get_shortest_paths

    eng = _engine(sf_dir)
    targets = list(range(0, NV, 25))
    paths = get_shortest_paths(eng, 0, targets, mode="out")
    eng.shutdown()
    return pd.DataFrame(
        {
            "target": targets,
            "path": ["->".join(map(str, p)) for p in paths],
        }
    )


def q_scan0(sf_dir: str):
    from xdata_igraph_ray.graph.scan import local_scan_0

    return local_scan_0(_li_edges(sf_dir), n=NV, P=8).map_batches(
        lambda t: pa.table(
            {"vid": t["vid"],
             "scan0": pc.round(t["scan0"], ndigits=1)}
        ),
        batch_format="pyarrow",
    )


def q_scan2(sf_dir: str):
    """scan_2 (edges within 2-hop out-neighborhoods) on the 200-vertex
    derived graph."""
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.scan import local_scan_k_ecount

    eng = _engine_200(sf_dir)
    vals = local_scan_k_ecount(eng, k=2, wave=100)
    eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV2), "scan2": vals.astype(np.int64)}
    )


def q_scan1_them(sf_dir: str):
    """THEM (partkey->suppkey) edges inside US (orderkey->partkey)
    1-neighborhoods."""
    from xdata_igraph_ray.graph.scan import local_scan_1_ecount_them

    them = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {"src": t["l_partkey"].to_numpy() % NV,
             "dst": t["l_suppkey"].to_numpy() % NV}
        ),
        batch_format="pyarrow",
    )
    return local_scan_1_ecount_them(_li_edges(sf_dir), them, n=NV, P=8)


def q_scan2_them(sf_dir: str):
    """THEM (partkey->suppkey) arcs inside closed US (orderkey->
    partkey) 2-out-neighborhoods, on the 200-vertex id space —
    igraph_local_scan_k_ecount_them via co-partitioned twin engines."""
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.scan import local_scan_k_ecount_them

    us = _engine_200(sf_dir)
    them_edges = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {"src": t["l_partkey"].to_numpy() % NV2,
             "dst": t["l_suppkey"].to_numpy() % NV2}
        ),
        batch_format="pyarrow",
    )
    them = GraphEngine.from_edges(
        them_edges, n=NV2, P=us.P, bounds=us.bounds
    )
    vals = local_scan_k_ecount_them(us, them, k=2, wave=100)
    them.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV2), "scan2_them": vals.astype(np.int64)}
    )


def q_coreness(sf_dir: str):
    from xdata_igraph_ray.graph.cores import coreness

    eng = _engine(sf_dir)
    coreness(eng)
    core = eng.state_arrays("core")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "core": core.astype(np.int64)})


def q_ppr(sf_dir: str):
    """Personalized PageRank, reset mass 0.6/0.4 on vertices 0/1,
    fixed iterations, rounded — SQL-oracled."""
    from xdata_igraph_ray.graph.pagerank import pagerank

    reset = np.zeros(NV)
    reset[0], reset[1] = 0.6, 0.4
    eng = _engine(sf_dir)
    pagerank(eng, tol=0.0, max_iter=PR_ITERS, reset=reset)
    scores = eng.state_arrays("pr")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "score": np.round(scores, 6)})


def q_pseudo_diameter(sf_dir: str):
    from xdata_igraph_ray.graph.paths import pseudo_diameter

    eng = _engine(sf_dir)
    d = pseudo_diameter(eng, mode="all")
    eng.shutdown()
    return pd.DataFrame({"pseudo_diameter": [d]})


def q_eigenvector(sf_dir: str):
    from xdata_igraph_ray.graph.centrality import eigenvector_centrality

    eng = _engine(sf_dir)
    eigenvector_centrality(eng, tol=1e-12)
    ev = eng.state_arrays("ev")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "ev": np.round(ev, 6)})


def q_centralization_closeness(sf_dir: str):
    """igraph_centralization_closeness (src/centrality.c:3158):
    normalized closeness + star-max formula; quantized scalar."""
    from xdata_igraph_ray.graph.centrality import closeness
    from xdata_igraph_ray.graph.metrics import (
        centralization,
        centralization_closeness_tmax,
    )

    eng = _engine_200(sf_dir)
    c = closeness(eng, wave=100, normalized=True)
    eng.shutdown()
    val = centralization(c, centralization_closeness_tmax(NV2, "out"))
    return pd.DataFrame(
        {"rq": [np.int64(np.floor(val * 1e6 + 0.5))]}
    )


def q_centralization_betweenness(sf_dir: str):
    """igraph_centralization_betweenness (src/centrality.c:3031):
    exact directed betweenness + (n-1)^2(n-2) max; quantized."""
    from xdata_igraph_ray.graph.centrality import betweenness
    from xdata_igraph_ray.graph.metrics import (
        centralization,
        centralization_betweenness_tmax,
    )

    from xdata_igraph_ray.graph.build import simplify
    from xdata_igraph_ray.graph.engine import GraphEngine

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV2,
                "dst": t["l_partkey"].to_numpy() % NV2,
            }
        ),
        batch_format="pyarrow",
    )
    # SIMPLIFIED graph (multi-edges would multiply path counts, same
    # as q_betweenness); aggregate over 6dp-rounded scores — the
    # precision at which engine and SQL walk-count oracle agree
    simple = simplify(ds, remove_loops=False, P=8)
    eng = GraphEngine.from_edges(simple, n=NV2, P=4)
    bc = betweenness(eng, wave=100)
    eng.shutdown(force=True)
    val = centralization(
        np.round(bc, 6),
        centralization_betweenness_tmax(NV2, directed=True),
    )
    return pd.DataFrame(
        {"rq": [np.int64(np.floor(val * 1e6 + 0.5))]}
    )


def q_centralization_evcent(sf_dir: str):
    """igraph_centralization_eigenvector_centrality
    (src/centrality.c:3291): max-scaled eigenvector scores + directed
    n-1 max; quantized."""
    from xdata_igraph_ray.graph.centrality import eigenvector_centrality
    from xdata_igraph_ray.graph.metrics import (
        centralization,
        centralization_evcent_tmax,
    )

    eng = _engine(sf_dir)
    eigenvector_centrality(eng, tol=1e-12)
    ev = eng.state_arrays("ev")
    eng.shutdown()
    val = centralization(
        ev, centralization_evcent_tmax(NV, directed=True, scale=True)
    )
    return pd.DataFrame(
        {"rq": [np.int64(np.floor(val * 1e6 + 0.5))]}
    )


def q_hits(sf_dir: str):
    from xdata_igraph_ray.graph.centrality import hits

    eng = _engine(sf_dir)
    hits(eng, tol=1e-12)
    hub = eng.state_arrays("hub")
    auth = eng.state_arrays("auth")
    eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV), "hub": np.round(hub, 6),
         "auth": np.round(auth, 6)}
    )


def q_strength(sf_dir: str):
    """Weighted degrees with weight = l_quantity."""
    from xdata_igraph_ray.graph.metrics import strength

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV,
                "dst": t["l_partkey"].to_numpy() % NV,
                "weight": t["l_quantity"],
            }
        ),
        batch_format="pyarrow",
    )
    out = strength(li, n=NV, P=8)
    return out.map_batches(
        lambda t: pa.table(
            {
                "vid": t["vid"],
                "out_strength": pc.round(t["out_strength"], ndigits=4),
                "in_strength": pc.round(t["in_strength"], ndigits=4),
            }
        ),
        batch_format="pyarrow",
    )


def q_modularity(sf_dir: str):
    """Modularity of the deterministic partition vid % 4."""
    from xdata_igraph_ray.graph.metrics import modularity

    m = modularity(_li_edges(sf_dir), np.arange(NV) % 4, P=8)
    return pd.DataFrame({"modularity": [round(m, 6)]})


def q_dyad_census(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import dyad_census

    dc = dyad_census(_li_edges(sf_dir), n=NV, P=8)
    return pd.DataFrame([dc])


def _li_und_simple(sf_dir: str):
    """Distinct canonical (min,max) pairs as single arcs, loops
    dropped — the simple undirected support knn requires."""
    from xdata_igraph_ray.graph.ops import to_undirected

    und = to_undirected(_li_edges(sf_dir), P=8)
    return und.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["src"], t["dst"]))),
        batch_format="pyarrow",
    )


def q_knn_degree(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import avg_nearest_neighbor_degree

    knn, _ = avg_nearest_neighbor_degree(_li_und_simple(sf_dir), n=NV, P=8)
    df = knn.to_pandas().sort_values("vid").reset_index(drop=True)
    # full doubles, no rounding: sdeg/k of exact ints is bit-identical
    # to the oracle's division (np.round is banker's, DuckDB round is
    # half-away -> 6-dp ties hash differently; round-2 driver FAIL)
    return df[["vid", "knn"]]


def q_diversity(sf_dir: str):
    """Weighted diversity over the l_quantity multigraph."""
    from xdata_igraph_ray.graph.metrics import diversity

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV,
                "dst": t["l_partkey"].to_numpy() % NV,
                "weight": t["l_quantity"],
            }
        ),
        batch_format="pyarrow",
    )
    df = diversity(li, n=NV, P=8).to_pandas().sort_values("vid")
    df["diversity"] = np.round(df["diversity"], 6)
    return df.reset_index(drop=True)


def q_constraint(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import constraint

    df = (
        constraint(_li_edges(sf_dir), n=NV, P=8)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    df["constraint"] = np.round(df["constraint"], 6)
    return df


def q_barrat(sf_dir: str):
    """Weighted local transitivity; weights = edge multiplicities."""
    from xdata_igraph_ray.graph.triangles import transitivity_barrat

    df = (
        transitivity_barrat(_li_edges(sf_dir), n=NV, P=8)
        .to_pandas().sort_values("vid").reset_index(drop=True)
    )
    df["barrat"] = np.round(df["barrat"], 6)
    return df


def q_get_stochastic(sf_dir: str):
    from xdata_igraph_ray.graph.ops import get_stochastic

    out = get_stochastic(_li_edges(sf_dir), P=8).to_pandas()
    # round-half-AWAY to match SQL ROUND (np.round banker's-rounds:
    # p = 1/640 = 0.0015625 exactly ties at 6 decimals and diverged
    # at sf0.1); values differ from np.round only on exact ties
    out["p"] = np.floor(out["p"] * 1e6 + 0.5) / 1e6
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def q_path_length_hist(sf_dir: str):
    """(length, count) over directed pairs of the 200-vertex graph;
    length -1 row carries the unconnected pair count."""
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.paths import path_length_hist

    eng = _engine_200(sf_dir)
    hist, unconn = path_length_hist(eng, wave=100)
    eng.shutdown()
    rows = sorted(hist.items()) + [(-1, unconn)]
    return pd.DataFrame(rows, columns=["length", "count"])


def q_diameter(sf_dir: str):
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.paths import diameter

    eng = _engine_200(sf_dir)
    d = diameter(eng, unconn=True)
    eng.shutdown()
    return pd.DataFrame({"diameter": [d]})


def q_centralization_degree(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import centralization_degree

    c = centralization_degree(_li_edges(sf_dir), n=NV, P=8, mode="all")
    return pd.DataFrame({"centralization": [round(c, 6)]})


def q_triad_census(sf_dir: str):
    from xdata_igraph_ray.graph.motifs import triad_census

    c = triad_census(_li_edges(sf_dir), n=NV, P=8)
    return pd.DataFrame(
        {"triad": list(c.keys()), "n": [int(v) for v in c.values()]}
    )


NV4 = 60  # edge-betweenness graph: its SQL oracle joins are cubic


def q_edge_betweenness(sf_dir: str):
    """Brandes edge betweenness on the simplified 60-vertex derived
    graph."""
    from xdata_igraph_ray.graph.build import simplify
    from xdata_igraph_ray.graph.centrality import edge_betweenness
    from xdata_igraph_ray.graph.engine import GraphEngine

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV4,
                "dst": t["l_partkey"].to_numpy() % NV4,
            }
        ),
        batch_format="pyarrow",
    )
    simple = simplify(ds, remove_loops=False, P=4)
    eng = GraphEngine.from_edges(simple, n=NV4, P=4)
    out = edge_betweenness(eng, wave=60).to_pandas()
    eng.shutdown()
    out["eb"] = np.round(out["eb"], 6)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def q_eccentricity(sf_dir: str):
    """Out-mode eccentricity on the 200-vertex derived graph, plus the
    radius as a second column."""
    from xdata_igraph_ray.graph.centrality import eccentricity, radius
    from xdata_igraph_ray.graph.engine import GraphEngine

    eng = _engine_200(sf_dir)
    ecc = eccentricity(eng, wave=100)
    r = radius(eng)
    eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV2), "ecc": ecc, "radius": np.full(NV2, r)}
    )


def q_cliques(sf_dir: str):
    """Maximal-clique census of a sparse 5000-vertex derived graph:
    (size, count) histogram plus the clique number (rows-only — BK has
    no SQL equivalent)."""
    from xdata_igraph_ray.graph.cliques import maximal_cliques

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 5000,
                "dst": t["l_partkey"].to_numpy() % 5000,
            }
        ),
        batch_format="pyarrow",
    )
    cl = maximal_cliques(ds, P=8).to_pandas()
    sizes = cl["clique"].map(len)
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame(
        {"size": hist.index.to_numpy(), "count": hist.to_numpy()}
    )


def q_louvain(sf_dir: str):
    """Multilevel (Louvain) communities on a planted ring of 10
    cliques of 10 — exact recovery of the planted partition is the
    SQL-checkable invariant (membership hash vs comm = vid // 10)."""
    from xdata_igraph_ray.graph.community import louvain

    mem, k = louvain(_ring_cliques_ds(10, 10), n=100, P=4)
    df = mem.to_pandas().sort_values("vid").reset_index(drop=True)
    assert df["comm"].nunique() == k
    df["comm"] = df["comm"].astype(np.int64)
    return df[["vid", "comm"]]


def q_spinglass_single(sf_dir: str):
    """Community of one vertex (igraph_community_spinglass_single,
    deterministic greedy affinity growth) on a planted ring of 4
    cliques of 8, seeded at vertex 10 — exact clique recovery plus the
    reference's cohesion/adhesion/inner/outer scalars, all SQL-checkable
    from the regenerated fixture."""
    from xdata_igraph_ray.exchange import block_refs
    from xdata_igraph_ray.graph.community import spinglass_single

    r = spinglass_single(block_refs(_ring_cliques_ds(4, 8)), n=32,
                         vertex=10, P=4)
    vids = np.sort(r["community"])
    return pd.DataFrame({
        "vid": vids.astype(np.int64),
        "cohesion": np.full(len(vids), r["cohesion"], np.float64),
        "adhesion": np.full(len(vids), r["adhesion"], np.float64),
        "inner_links": np.full(len(vids), r["inner_links"], np.int64),
        "outer_links": np.full(len(vids), r["outer_links"], np.int64),
    })


def q_spinglass(sf_dir: str):
    """Spinglass communities (Reichardt-Bornholdt Potts annealing,
    seeded deterministic heat bath) on a planted ring of 4 cliques of
    8 — exact recovery is the SQL-checkable invariant."""
    from xdata_igraph_ray.exchange import block_refs
    from xdata_igraph_ray.graph.community import spinglass

    r = spinglass(block_refs(_ring_cliques_ds(4, 8)), n=32,
                  spins=10, seed=1, P=4)
    return pd.DataFrame({
        "vid": np.arange(32, dtype=np.int64),
        "comm": r["membership"].astype(np.int64),
    })


def q_spinglass_negative(sf_dir: str):
    """Negative-link spinglass (igraph_i_community_spinglass_negative,
    Traag-Bruggeman gamma_minus semantics) on a signed ring of 4
    cliques of 8: intra-clique edges +1, ring bridges -1.  Exact
    planted recovery plus the signed modularity 2Q/(m+ + m-), which
    the SQL oracle recomputes from a regenerated signed edge table
    (every intermediate is exactly float64-representable, so the
    scalar is bit-exact)."""
    from xdata_igraph_ray.graph.community import spinglass_negative

    ds = _ring_cliques_ds(4, 8)

    def _sign_bridges(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        # the fixture's bridges are exactly the inter-clique arcs
        w = np.where(s // 8 == d // 8, 1.0, -1.0)
        return t.append_column("weight", pa.array(w, pa.float64()))

    signed = ds.map_batches(_sign_bridges, batch_format="pyarrow")
    from xdata_igraph_ray.exchange import block_refs as _brefs

    r = spinglass_negative(_brefs(signed), n=32, spins=10, seed=1)
    return pd.DataFrame({
        "vid": np.arange(32, dtype=np.int64),
        "comm": r["membership"].astype(np.int64),
        "modularity": np.full(32, r["modularity"], np.float64),
    })


def q_leading_eigenvector(sf_dir: str):
    """Newman leading-eigenvector communities (spectral splits of the
    modularity matrix) on a planted ring of 4 cliques of 8 — exact
    recovery is the SQL-checkable invariant."""
    from xdata_igraph_ray.graph.community import leading_eigenvector

    mem, k = leading_eigenvector(
        _ring_cliques_ds(4, 8), n=32, P=4, steps=8, max_iter=200,
        tol=1e-8, min_gain=1e-5,
    )
    df = mem.to_pandas().sort_values("vid").reset_index(drop=True)
    assert df["comm"].nunique() == k
    df["comm"] = df["comm"].astype(np.int64)
    return df[["vid", "comm"]]


def q_fastgreedy(sf_dir: str):
    """CNM fastgreedy communities (driver-side small-graph kernel,
    like the reference's sequential heap) on a planted ring of 8
    cliques of 8 — exact recovery is the SQL-checkable invariant
    (sizes chosen under the CNM resolution limit)."""
    from xdata_igraph_ray.graph.community import community_fastgreedy

    mem, k, q = community_fastgreedy(_ring_cliques_ds(8, 8), n=64)
    assert len(set(mem.tolist())) == k
    return pd.DataFrame(
        {"vid": np.arange(64), "comm": np.asarray(mem, np.int64)}
    )


def q_girvan_newman(sf_dir: str):
    """Girvan-Newman (edge-betweenness community, driver-side
    small-graph kernel — O(VE^2) per the reference's own docs) on a
    planted ring of 5 cliques of 5 — exact recovery is the
    SQL-checkable invariant."""
    from xdata_igraph_ray.graph.community import (
        community_edge_betweenness,
    )

    mem, k, q = community_edge_betweenness(_ring_cliques_ds(5, 5), n=25)
    assert len(set(mem.tolist())) == k
    return pd.DataFrame(
        {"vid": np.arange(25), "comm": np.asarray(mem, np.int64)}
    )


def q_walktrap(sf_dir: str):
    """Walktrap communities (Pons-Latapy t-step random-walk Ward
    agglomeration, driver-side small-graph kernel like the
    reference's original C++) on a planted ring of 8 cliques of 8 —
    exact recovery is the SQL-checkable invariant."""
    from xdata_igraph_ray.graph.community import community_walktrap

    mem, k, q = community_walktrap(_ring_cliques_ds(8, 8), n=64)
    assert len(set(mem.tolist())) == k
    return pd.DataFrame(
        {"vid": np.arange(64), "comm": np.asarray(mem, np.int64)}
    )


def q_infomap(sf_dir: str):
    """Infomap communities (deterministic two-level map equation;
    the reference's nb_trials-RNG greedy is pinned to id-ordered
    sweeps) on a planted ring of 8 cliques of 8 — exact recovery is
    the SQL-checkable invariant."""
    from xdata_igraph_ray.graph.community import community_infomap

    mem, k, L = community_infomap(_ring_cliques_ds(8, 8), n=64)
    assert len(set(mem.tolist())) == k
    return pd.DataFrame(
        {"vid": np.arange(64), "comm": np.asarray(mem, np.int64)}
    )


NV_OPT = 7  # optimal-modularity graph: the SQL oracle enumerates 7^7 labelings


def q_optimal_modularity(sf_dir: str):
    """Exact maximum-modularity partition (subset-DP replacement for
    the reference's GLPK ILP) on a 7-vertex derived multigraph; the
    oracle enumerates all 7^7 label assignments in SQL."""
    from xdata_igraph_ray.graph.community import (
        community_optimal_modularity,
    )

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % NV_OPT,
                "dst": t["l_partkey"].to_numpy() % NV_OPT,
            }
        ),
        batch_format="pyarrow",
    )
    mem, k, q = community_optimal_modularity(ds, n=NV_OPT)
    return pd.DataFrame(
        {"vid": np.arange(NV_OPT), "comm": mem,
         "modularity": np.round(q, 6)}
    )


def q_ase(sf_dir: str):
    """Adjacency spectral embedding (xdata flagship) of 6 disjoint
    10-cliques: the Gram matrix X X^T of the d=6 embedding is
    rotation-invariant and equals the rank-6 spectral truncation of A
    — exactly 0.9 within a block and 0 across (top eigenvalue S-1=9,
    eigenvector constant per block), so the integer-rounded Gram
    (x10) plus the integer-rounded eigenvalues form a deterministic
    SQL-checkable table.  No eigensolver needed on the oracle side:
    closed-form spectrum of K_S.  Rows: (u, w, g) for u <= w pairs,
    plus (u=-1, w=rank, g=9) eigenvalue rows."""
    from xdata_igraph_ray.graph.embedding import (
        adjacency_spectral_embedding,
    )
    from xdata_igraph_ray.graph.engine import GraphEngine

    K, S = 6, 10
    src, dst = [], []
    for c in range(K):
        base = c * S
        for i in range(S):
            for j in range(S):
                if i != j:
                    src.append(base + i)
                    dst.append(base + j)
    sym = rd.from_arrow(
        pa.table({"src": np.array(src, np.int64),
                  "dst": np.array(dst, np.int64)})
    )
    eng = GraphEngine.from_edges(sym, n=K * S, P=4)
    emb, lam = adjacency_spectral_embedding(eng, d=K, iters=60, seed=42)
    eng.shutdown()
    df = emb.to_pandas().sort_values("vid").reset_index(drop=True)
    X = np.vstack(df["x"].to_numpy())
    G = X @ X.T
    iu, iw = np.triu_indices(K * S)
    rows = pd.DataFrame(
        {"u": iu.astype(np.int64), "w": iw.astype(np.int64),
         "g": np.rint(G[iu, iw] * 10).astype(np.int64)}
    )
    eig = pd.DataFrame(
        {"u": np.full(K, -1, np.int64), "w": np.arange(K),
         "g": np.rint(lam).astype(np.int64)}
    )
    return pd.concat([rows, eig], ignore_index=True)


def q_graphlets(sf_dir: str):
    """Graphlet candidate basis (igraph_graphlets_candidate_basis,
    src/glet.c:542) on the planted nested-weight fixture (6-clique
    w=1 nesting a w=2 triangle nesting a w=3 pair, plus a separate
    w=1 pair): rows (cid, vid, thr) with cid ordered by (thr, size,
    bitmask).  The oracle enumerates all 2^8 subsets per threshold in
    SQL; on this fixture the recursive basis provably equals
    {maximal cliques S of G>=t with min internal weight t}
    (tests/test_graphlets.py proves the recursion output)."""
    from xdata_igraph_ray.graph.graphlets import (
        graphlets_candidate_basis,
    )

    src, dst, w = [], [], []
    for i in range(6):
        for j in range(i + 1, 6):
            src.append(i)
            dst.append(j)
            if j < 3:
                w.append(3.0 if (i, j) == (0, 1) else 2.0)
            else:
                w.append(1.0)
    src.append(6)
    dst.append(7)
    w.append(1.0)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array(src, np.int64),
                "dst": np.array(dst, np.int64),
                "weight": np.array(w),
            }
        )
    )
    cliques, thr = graphlets_candidate_basis(ds, P=2)
    items = sorted(
        (
            (float(t), len(c), int(np.sum(1 << c.astype(np.int64)))),
            c,
        )
        for c, t in zip(cliques, thr)
    )
    rows = {"cid": [], "vid": [], "thr": []}
    for cid, ((t, _s, _m), c) in enumerate(items):
        for v in c.tolist():
            rows["cid"].append(cid)
            rows["vid"].append(v)
            rows["thr"].append(int(t))
    return pd.DataFrame(
        {
            "cid": np.array(rows["cid"], np.int64),
            "vid": np.array(rows["vid"], np.int64),
            "thr": np.array(rows["thr"], np.int64),
        }
    )


def q_min_separators(sf_dir: str):
    """All minimum-size vertex separators
    (igraph_minimum_size_separators, src/separators.c:643) of a
    12-vertex derived lineitem graph; rows (sid, vid), sid ordered by
    member bitmask.  The oracle brute-forces all 2^12 subsets with a
    recursive-CTE reachability check in SQL."""
    from xdata_igraph_ray.graph.separators import (
        collapse_support,
        minimum_size_separators,
    )

    nv = 12
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % nv,
                "dst": t["l_partkey"].to_numpy() % nv,
            }
        ).filter(
            pa.compute.equal(
                (t["l_orderkey"].to_numpy() * 131
                 + t["l_partkey"].to_numpy() * 17) % 487, 0
            )
        ),
        batch_format="pyarrow",
    )
    adj = collapse_support(ds, nv, P=4)
    seps = minimum_size_separators(adj)
    seps = sorted(seps, key=lambda s: sum(1 << v for v in s))
    rows = {"sid": [], "vid": []}
    for sid, s in enumerate(seps):
        for v in s:
            rows["sid"].append(sid)
            rows["vid"].append(v)
    return pd.DataFrame(
        {
            "sid": np.array(rows["sid"], np.int64),
            "vid": np.array(rows["vid"], np.int64),
        }
    )


def q_cohesive_blocks(sf_dir: str):
    """Moody-White cohesive blocking (igraph_cohesive_blocks,
    src/cohesive_blocks.c:202) on the paper's 23-vertex graph; the
    oracle is the reference's OWN published output
    (examples/simple/cohesive_blocks.out) as literal VALUES — a
    golden check that the full pipeline (distributed support collapse
    + separator enumeration + blocking) reproduces it.  Rows:
    (block, vid, cohesion, parent)."""
    from xdata_igraph_ray.graph.separators import cohesive_blocks

    mw = [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
        (1, 2), (1, 3), (1, 4), (1, 6),
        (2, 3), (2, 5), (2, 6),
        (3, 4), (3, 5), (3, 6),
        (4, 5), (4, 6), (4, 20),
        (5, 6),
        (6, 7), (6, 10), (6, 13), (6, 18),
        (7, 8), (7, 10), (7, 13),
        (8, 9),
        (9, 11), (9, 12),
        (10, 11), (10, 13),
        (11, 15),
        (12, 15),
        (13, 14),
        (14, 15),
        (16, 17), (16, 18), (16, 19),
        (17, 19), (17, 20),
        (18, 19), (18, 21), (18, 22),
        (19, 20),
        (20, 21), (20, 22),
        (21, 22),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": np.array([p[0] for p in mw], np.int64),
                "dst": np.array([p[1] for p in mw], np.int64),
            }
        )
    )
    blocks, coh, parents, _tree = cohesive_blocks(ds, n=23, P=3)
    rows = {"block": [], "vid": [], "cohesion": [], "parent": []}
    for b, members in enumerate(blocks):
        for v in sorted(members):
            rows["block"].append(b)
            rows["vid"].append(v)
            rows["cohesion"].append(coh[b])
            rows["parent"].append(parents[b])
    return pd.DataFrame(
        {k: np.array(v, np.int64) for k, v in rows.items()}
    )


def _scg_parts(sf_dir: str):
    """Shared by the two SCG queries: exact-level-set grouping on the
    integer degree vector of the simple undirected lineitem support
    (deterministic, SQL = dense_rank by degree), then the DISTRIBUTED
    coarse-matrix construction L A L^T via one tagged groupby-sum."""
    from xdata_igraph_ray.exchange import block_refs, groupby_agg
    from xdata_igraph_ray.graph.scg import (
        coarse_adjacency,
        scg_grouping,
    )

    und = _li_und_simple(sf_dir)
    refs = block_refs(und)

    def both(t: pa.Table) -> pa.Table:
        return pa.table({
            "vid": np.concatenate(
                (t["src"].to_numpy(), t["dst"].to_numpy())
            )
        })

    from xdata_igraph_ray.graph.scg import _apply as _scg_apply

    degt = groupby_agg(
        [_scg_apply.remote(both, r) for r in refs],
        ["vid"], [(None, "count", "d")], P=8,
    ).to_pandas()
    deg = np.zeros(NV, np.float64)
    deg[degt["vid"].to_numpy()] = degt["d"].to_numpy()
    groups = scg_grouping(deg, 0, algo="exact")
    coarse = coarse_adjacency(refs, groups, mtype="symmetric", P=8)
    return groups, coarse


def q_scg_groups(sf_dir: str):
    """SCG exact grouping (igraph_scg_grouping algo=EXACT,
    src/scg_exact_scg.c:36) on the degree vector: level sets labeled
    ascending — SQL dense_rank replay."""
    groups, _ = _scg_parts(sf_dir)
    return pd.DataFrame(
        {"vid": np.arange(NV), "g": groups.astype(np.int64)}
    )


def q_scg_coarse(sf_dir: str):
    """SCG coarse-grained adjacency L A L^T (igraph_scg_adjacency,
    src/scg.c) for the exact degree grouping, entries quantized with
    floor(x*1e6+0.5) (rounding-mode-independent on both sides)."""
    groups, coarse = _scg_parts(sf_dir)
    df = coarse.to_pandas()
    agg = df.groupby(["ga", "gb"], as_index=False)["w"].sum()
    return pd.DataFrame(
        {
            "ga": agg["ga"].to_numpy().astype(np.int64),
            "gb": agg["gb"].to_numpy().astype(np.int64),
            "wq": np.floor(
                agg["w"].to_numpy() * 1e6 + 0.5
            ).astype(np.int64),
        }
    )


def q_all_st_cuts(sf_dir: str):
    """All minimal (s,t) edge cuts (igraph_all_st_cuts,
    src/st-cuts.c:976) of a sparse 10-vertex derived digraph, s=0
    t=9.  Rows (cid, kind, a, b): kind=0 partition-member rows
    (a=vid, b=-1), kind=1 cut-arc rows; cid ordered by partition
    bitmask.  The oracle enumerates all 2^8 candidate partitions with
    two recursive-CTE reachability closures in SQL."""
    from xdata_igraph_ray.graph.separators import all_st_cuts

    dfarcs = (
        _read_pq(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "u": t["l_orderkey"].to_numpy() % 10,
                    "v": t["l_partkey"].to_numpy() % 10,
                }
            ).filter(
                pa.compute.and_(
                    pa.compute.equal(
                        (t["l_orderkey"].to_numpy() * 131
                         + t["l_partkey"].to_numpy() * 17) % 1321, 0
                    ),
                    pa.compute.not_equal(
                        pa.array(t["l_orderkey"].to_numpy() % 10),
                        pa.array(t["l_partkey"].to_numpy() % 10),
                    ),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates()
    )
    arcs = sorted(
        (int(r.u), int(r.v)) for r in dfarcs.itertuples()
    )
    cuts, parts = all_st_cuts(arcs, 10, 0, 9)
    order = sorted(
        range(len(parts)),
        key=lambda i: sum(1 << v for v in parts[i]),
    )
    rows = {"cid": [], "kind": [], "a": [], "b": []}
    for cid, i in enumerate(order):
        for v in parts[i]:
            rows["cid"].append(cid)
            rows["kind"].append(0)
            rows["a"].append(v)
            rows["b"].append(-1)
        for ei in cuts[i]:
            rows["cid"].append(cid)
            rows["kind"].append(1)
            rows["a"].append(arcs[ei][0])
            rows["b"].append(arcs[ei][1])
    return pd.DataFrame(
        {k: np.array(v, np.int64) for k, v in rows.items()}
    )


def q_transitive_closure(sf_dir: str):
    """Distributed transitive closure (reachability pairs) of the
    200-vertex derived graph via multi-source BFS waves — reference
    igraph_transitive_closure_dag semantics on general digraphs
    (src/structural_properties.c:6340).  Oracle: recursive-CTE
    reachability."""
    from xdata_igraph_ray.graph.paths import transitive_closure

    eng = _engine_200(sf_dir)
    out = transitive_closure(eng, wave=100).to_pandas()
    eng.shutdown()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def q_dominator_tree(sf_dir: str):
    """Dominator tree (igraph_dominator_tree, src/st-cuts.c:388) of a
    40-vertex derived flowgraph rooted at 0: (vid, idom); root -1,
    unreachable -2.  Oracle: per-candidate-dominator reachability
    closures in SQL (u dominates v iff v is unreachable from the root
    when u is removed); idom = the dominator of v with the SMALLEST
    dominated set (the chain is totally ordered and strictly
    shrinking toward v)."""
    from xdata_igraph_ray.graph.dominators import dominator_tree

    nv = 40
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % nv,
                "dst": t["l_partkey"].to_numpy() % nv,
            }
        ).filter(
            pa.compute.equal(
                (t["l_orderkey"].to_numpy() * 7
                 + t["l_partkey"].to_numpy() * 3) % 31, 0
            )
        ),
        batch_format="pyarrow",
    )
    idom, _leftout = dominator_tree(ds, nv, root=0, P=4)
    return pd.DataFrame(
        {"vid": np.arange(nv), "idom": idom.astype(np.int64)}
    )


def q_assortativity_nominal(sf_dir: str):
    """Categorical assortativity (igraph_assortativity_nominal,
    src/mixing.c) with types = vid % 7 over the directed lineitem
    graph; floor(r*1e6+0.5) quantization."""
    from xdata_igraph_ray.graph.metrics import assortativity_nominal

    r = assortativity_nominal(
        _li_edges(sf_dir), np.arange(NV) % 7, P=8, directed=True
    )
    return pd.DataFrame(
        {"rq": [np.int64(np.floor(r * 1e6 + 0.5))]}
    )


def q_mcs(sf_dir: str):
    """Maximum cardinality search
    (igraph_maximum_cardinality_search, src/decomposition.c:56;
    pinned min-id tie-break) on a sparse 12-vertex derived support —
    (vid, alpha) ranks.  The oracle replays the selection rule with a
    recursive bitmask chain in SQL.  The chordality test built on
    this order is pytest-verified vs networkx
    (tests/test_decomposition.py)."""
    from xdata_igraph_ray.graph.decomposition import (
        maximum_cardinality_search,
    )

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 12,
                "dst": t["l_partkey"].to_numpy() % 12,
            }
        ).filter(
            pa.compute.equal(
                (t["l_orderkey"].to_numpy() * 131
                 + t["l_partkey"].to_numpy() * 17) % 487, 0
            )
        ),
        batch_format="pyarrow",
    )
    alpha, _ = maximum_cardinality_search(ds, n=12, P=4)
    return pd.DataFrame(
        {"vid": np.arange(12), "alpha": alpha.astype(np.int64)}
    )


def q_fas(sf_dir: str):
    """Eades feedback arc set (igraph_feedback_arc_set APPROX_EADES,
    src/feedback_arc_set.c:191; pinned min-id re-scan tie rule) on a
    sparse 12-vertex derived digraph.  Rows (kind, a, b): kind=0
    ordering rows (vid, position), kind=1 feedback arcs.  The oracle
    replays the removal rule with a recursive bitmask chain."""
    from xdata_igraph_ray.graph.fas import feedback_arc_set_eades

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 12,
                "dst": t["l_partkey"].to_numpy() % 12,
            }
        ).filter(
            pa.compute.equal(
                (t["l_orderkey"].to_numpy() * 131
                 + t["l_partkey"].to_numpy() * 17) % 487, 0
            )
        ),
        batch_format="pyarrow",
    )
    fas, ordv = feedback_arc_set_eades(ds, 12, P=4)
    rows = {"kind": [], "a": [], "b": []}
    for v in range(12):
        rows["kind"].append(0)
        rows["a"].append(v)
        rows["b"].append(int(ordv[v]))
    for u, v in fas:
        rows["kind"].append(1)
        rows["a"].append(u)
        rows["b"].append(v)
    return pd.DataFrame(
        {k: np.array(v, np.int64) for k, v in rows.items()}
    )


def q_erdos_gallai(sf_dir: str):
    """is_graphical_degree_sequence evidence table: the Erdos-Gallai
    inequality terms for the lineitem support's degree sequence —
    (k, lhs, rhs) for every k; the sequence comes from a real graph
    so lhs <= rhs everywhere, and hash equality checks the entire
    computation (igraph_is_graphical_degree_sequence,
    src/structural_properties.c)."""
    from xdata_igraph_ray.exchange import block_refs, groupby_agg
    from xdata_igraph_ray.graph.generators import (
        is_graphical_degree_sequence,
    )
    from xdata_igraph_ray.graph.scg import _apply as _sapply

    und = _li_und_simple(sf_dir)

    def both(t: pa.Table) -> pa.Table:
        return pa.table({
            "vid": np.concatenate(
                (t["src"].to_numpy(), t["dst"].to_numpy())
            )
        })

    degt = groupby_agg(
        [_sapply.remote(both, r) for r in block_refs(und)],
        ["vid"], [(None, "count", "d")], P=8,
    ).to_pandas()
    deg = np.zeros(NV, np.int64)
    deg[degt["vid"].to_numpy()] = degt["d"].to_numpy()
    assert is_graphical_degree_sequence(deg)
    d = np.sort(deg)[::-1]
    ks = np.arange(1, NV + 1)
    lhs = np.cumsum(d)
    rhs = ks * (ks - 1) + np.array(
        [np.minimum(d[k:], k).sum() for k in ks]
    )
    return pd.DataFrame(
        {"k": ks.astype(np.int64), "lhs": lhs.astype(np.int64),
         "rhs": rhs.astype(np.int64)}
    )


def q_compare_communities(sf_dir: str):
    """igraph_compare_communities + split_join_distance
    (src/community.c:3062,3177) between the degree-rank partition and
    vid%7 on the lineitem support: one row with all five metrics
    (vi/nmi/rand/ari quantized 1e6, split-join exact int)."""
    from xdata_igraph_ray.exchange import block_refs, groupby_agg
    from xdata_igraph_ray.graph.community import (
        compare_communities,
        split_join_distance,
    )
    from xdata_igraph_ray.graph.scg import _apply as _sapply

    und = _li_und_simple(sf_dir)

    def both(t: pa.Table) -> pa.Table:
        return pa.table({
            "vid": np.concatenate(
                (t["src"].to_numpy(), t["dst"].to_numpy())
            )
        })

    degt = groupby_agg(
        [_sapply.remote(both, r) for r in block_refs(und)],
        ["vid"], [(None, "count", "d")], P=8,
    ).to_pandas()
    deg = np.zeros(NV, np.int64)
    deg[degt["vid"].to_numpy()] = degt["d"].to_numpy()
    _, m1 = np.unique(deg, return_inverse=True)
    m2 = np.arange(NV) % 7

    def q6(x):
        return np.int64(np.floor(x * 1e6 + 0.5))

    d12, d21 = split_join_distance(m1, m2)
    return pd.DataFrame(
        {
            "vi_q": [q6(compare_communities(m1, m2, "vi"))],
            "nmi_q": [q6(compare_communities(m1, m2, "nmi"))],
            "rand_q": [q6(compare_communities(m1, m2, "rand"))],
            "ari_q": [q6(compare_communities(m1, m2, "adjusted_rand"))],
            "sj": [np.int64(d12 + d21)],
        }
    )


def q_automorphisms(sf_dir: str):
    """Automorphism group order via VF2 enumeration
    (igraph_count_isomorphisms_vf2, src/topology.c; the
    enumeration-based stand-in for igraph_automorphisms' BLISS
    counting) on a 6-vertex derived digraph; the oracle enumerates
    all 6^6 candidate maps in SQL and keeps arc-preserving
    permutations."""
    from xdata_igraph_ray.graph.isomorphism import count_isomorphisms

    dfarcs = (
        _read_pq(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["l_orderkey"].to_numpy() % 6,
                    "dst": t["l_partkey"].to_numpy() % 6,
                }
            ).filter(
                pa.compute.and_(
                    pa.compute.equal(
                        (t["l_orderkey"].to_numpy() * 131
                         + t["l_partkey"].to_numpy() * 17) % 1009, 0
                    ),
                    pa.compute.not_equal(
                        pa.array(t["l_orderkey"].to_numpy() % 6),
                        pa.array(t["l_partkey"].to_numpy() % 6),
                    ),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates()
    )
    t = pa.table(
        {
            "src": dfarcs["src"].to_numpy().astype(np.int64),
            "dst": dfarcs["dst"].to_numpy().astype(np.int64),
        }
    )
    cnt = count_isomorphisms(t, 6, t, 6, directed=True)
    return pd.DataFrame({"aut": [np.int64(cnt)]})


def q_canonical_permutation(sf_dir: str):
    """Canonical labeling (igraph_canonical_permutation,
    src/topology.c:2695-2762; BLISS stand-in with the pinned
    border-order min-code canonical form — see
    graph/isomorphism.py) of the same 6-vertex derived digraph as
    automorphisms_li.  Oracle: enumerate all 6! labelings in SQL,
    compute the identical 36-bit border-order code, pick min code
    with lexicographically-smallest-labeling tie-break."""
    from xdata_igraph_ray.graph.isomorphism import canonical_permutation

    dfarcs = (
        _read_pq(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["l_orderkey"].to_numpy() % 6,
                    "dst": t["l_partkey"].to_numpy() % 6,
                }
            ).filter(
                pa.compute.and_(
                    pa.compute.equal(
                        (t["l_orderkey"].to_numpy() * 131
                         + t["l_partkey"].to_numpy() * 17) % 1009, 0
                    ),
                    pa.compute.not_equal(
                        pa.array(t["l_orderkey"].to_numpy() % 6),
                        pa.array(t["l_partkey"].to_numpy() % 6),
                    ),
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates()
    )
    t = pa.table(
        {
            "src": dfarcs["src"].to_numpy().astype(np.int64),
            "dst": dfarcs["dst"].to_numpy().astype(np.int64),
        }
    )
    lab = canonical_permutation(t, 6, directed=True)
    return pd.DataFrame({
        "vid": np.arange(6, dtype=np.int64),
        "rank": lab.astype(np.int64),
    })


def q_power_law_fit(sf_dir: str):
    """Continuous power-law fit (igraph_power_law_fit,
    src/other.c:325; CSN linear scan) of the out-degree distribution
    of the distinct-arc lineitem graph.  Distributed path: the fit
    consumes only a groupby-count degree histogram.  Oracle: full SQL
    replay of the linear scan — suffix sums for alpha, a uniques
    cross join for the KS statistic, plfit's piecewise Kolmogorov
    p-value — quantized half-up at 1e-6 on both sides."""
    import math as _math

    import ray

    from xdata_igraph_ray.exchange import block_refs, distinct, groupby_agg
    from xdata_igraph_ray.graph.plfit import power_law_fit

    refs = block_refs(_li_edges(sf_dir))
    uniq = distinct(refs, ["src", "dst"], P=8, as_refs=True)

    @ray.remote
    def drop_loops(t: pa.Table) -> pa.Table:
        return t.filter(pa.compute.not_equal(t["src"], t["dst"]))

    degs = groupby_agg(
        [drop_loops.remote(r) for r in uniq], ["src"],
        [(None, "count", "deg")], P=8,
    )
    r = power_law_fit(degs, col="deg", force_continuous=True, P=8)

    def q6(x: float) -> float:
        return _math.floor(x * 1e6 + 0.5) / 1e6

    return pd.DataFrame({
        "alpha": [q6(r["alpha"])],
        "xmin": [q6(r["xmin"])],
        "ks_d": [q6(r["D"])],
        "p_value": [q6(r["p"])],
        "loglik": [q6(r["L"])],
        "n_tail": [np.int64(r["n_tail"])],
    })


def q_get_incidence(sf_dir: str):
    """Sparse COO incidence export of a derived bipartite table
    (igraph_get_incidence, src/bipartite.c — dense there, sparse COO
    here by design); oracle is the equivalent GROUP BY count."""
    from xdata_igraph_ray.graph.bipartite import get_incidence

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 50,
                "dst": 50 + t["l_partkey"].to_numpy() % 40,
            }
        ),
        batch_format="pyarrow",
    )
    return get_incidence(ds, n1=50, P=8).to_pandas()


def q_all_simple_paths(sf_dir: str):
    """All simple paths 0 -> {8, 9} on the sparse 10-vertex derived
    digraph (igraph_get_all_simple_paths, src/paths.c:60); one row
    per path as an arrow string.  Oracle: recursive CTE carrying the
    visited bitmask."""
    from xdata_igraph_ray.graph.paths import get_all_simple_paths

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 10,
                "dst": t["l_partkey"].to_numpy() % 10,
            }
        ).filter(
            pa.compute.equal(
                (t["l_orderkey"].to_numpy() * 131
                 + t["l_partkey"].to_numpy() * 17) % 1321, 0
            )
        ),
        batch_format="pyarrow",
    )
    paths = get_all_simple_paths(ds, 10, 0, [8, 9], P=4)
    return pd.DataFrame(
        {"path": sorted("->".join(map(str, p)) for p in paths)}
    )


def q_convergence_degree(sf_dir: str):
    """Per-edge convergence degree (igraph_convergence_degree,
    src/structural_properties.c:4011) on the 200-vertex derived
    digraph; ins/outs exact ints, cd quantized."""
    from xdata_igraph_ray.graph.paths import convergence_degree

    t = convergence_degree(_li_edges_200(sf_dir), NV2, directed=True,
                           P=4)
    df = t.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    df["cdq"] = np.floor(
        df["cd"].to_numpy() * 1e6 + 0.5
    ).astype(np.int64)
    return df[["src", "dst", "ins", "outs", "cdq"]]


def q_assortativity(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import assortativity_degree

    r = assortativity_degree(_li_edges(sf_dir), P=8)
    return pd.DataFrame({"assortativity": [round(r, 6)]})


def q_scan1(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import local_scan_1

    return local_scan_1(_li_edges(sf_dir), n=NV, P=8)


# -- documents / text -------------------------------------------------------


def _docs(sf_dir: str):
    return _read_pq(f"{sf_dir}/documents.parquet")


def q_token_stats(sf_dir: str):
    from xdata_igraph_ray.stages.text import token_stats

    return token_stats(_docs(sf_dir))


def q_lang_histogram(sf_dir: str):
    from xdata_igraph_ray.exchange import groupby_agg

    return groupby_agg(_docs(sf_dir), ["lang"], [(None, "count", "n")], P=4)


def q_exact_dedup_docs(sf_dir: str):
    from xdata_igraph_ray.stages.dedup import dedup_exact

    out = dedup_exact(_docs(sf_dir), P=4)
    return out.select_columns(["doc_id"])


def q_fingerprint_docs(sf_dir: str):
    from xdata_igraph_ray.stages.text import fingerprint

    return fingerprint(_docs(sf_dir))


def q_quality_docs(sf_dir: str):
    from xdata_igraph_ray.stages.text import quality_scores

    return quality_scores(_docs(sf_dir))


def q_langid_docs(sf_dir: str):
    from xdata_igraph_ray.stages.text import detect_language

    return detect_language(_docs(sf_dir))


def q_minhash_pairs(sf_dir: str):
    from xdata_igraph_ray.stages.dedup import minhash_lsh_pairs

    out = minhash_lsh_pairs(_docs(sf_dir), threshold=0.7, P=4)
    return out.select_columns(["a", "b"])


def q_simhash_pairs(sf_dir: str):
    from xdata_igraph_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir), max_hamming=3, P=4)


def q_ngram_jaccard_docs(sf_dir: str):
    from xdata_igraph_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), threshold=(1, 2), k=5, P=4)


def q_knn(sf_dir: str):
    from xdata_igraph_ray.stages.similarity import knn_brute

    emb = _read_pq(f"{sf_dir}/embeddings.parquet")
    q = np.stack([r["embedding"] for r in emb.take(4)])
    out = knn_brute(emb, q, k=10)
    return out.select(["query_id", "vec_id"])


def q_knn_ivf(sf_dir: str):
    from xdata_igraph_ray.stages.similarity import knn_ivf

    emb = _read_pq(f"{sf_dir}/embeddings.parquet")
    q = np.stack([r["embedding"] for r in emb.take(4)])
    out = knn_ivf(emb, q, k=10, n_clusters=8, nprobe=8)
    return out.select(["query_id", "vec_id"])


def q_embedding_near_dup(sf_dir: str):
    from xdata_igraph_ray.stages.dedup import embedding_near_dup_pairs

    emb = _read_pq(f"{sf_dir}/embeddings.parquet")
    # ids only: the verify cosine is float64 while DuckDB's
    # list_cosine_similarity on float32 lists differs in the last ulps.
    # Explicit frame: a 0-row Dataset drops its schema in to_pandas.
    df = embedding_near_dup_pairs(emb, threshold=0.95, P=4).to_pandas()
    if "a" not in df.columns:
        df = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                           "b": pd.Series([], dtype="int64")})
    return df[["a", "b"]]


def _planted_emb_path() -> str:
    from xdata_igraph_ray.sources.synth import generate_embeddings

    return generate_embeddings(os.path.join(FIXTURE_ROOT, "emb_planted"))


def q_embedding_near_dup_planted(sf_dir: str):
    """Banded-LSH near-dup over the planted fixture — a NONZERO result
    checked pair-for-pair against a brute-force SQL oracle."""
    from xdata_igraph_ray.stages.dedup import embedding_near_dup_pairs

    emb = _read_pq(_planted_emb_path())
    df = embedding_near_dup_pairs(emb, threshold=0.95, P=4).to_pandas()
    return df[["a", "b"]].sort_values(["a", "b"]).reset_index(drop=True)


def q_multimodal_features(sf_dir: str):
    """REAL decode -> feature pipeline over decodable synthetic media
    (PPM images, WAV audio, raw-PPM video; pure numpy/stdlib codecs)."""
    from xdata_igraph_ray.stages.multimodal import (
        decode_and_featurize,
        synth_media_real,
    )

    n = max(200, _pages_n(sf_dir) // 10)
    feats = decode_and_featurize(rd.from_arrow(synth_media_real(n)))
    return feats.map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "f0": pa.array(
                    np.round(
                        np.stack(t["feature"].to_pandas().to_numpy())[:, 0], 5
                    ).astype(np.float64)
                ),
            }
        ),
        batch_format="pyarrow",
    )


# -- events / relational ----------------------------------------------------


def q_events_hourly(sf_dir: str):
    from xdata_igraph_ray.exchange import groupby_agg

    ev = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )
    out = groupby_agg(
        ev, ["user_id", "hour"],
        [(None, "count", "n"), ("value", "sum", "total")], P=8,
    )
    # np.round (scaled half-even) matches DuckDB round(,4) bit-exact
    # here (2-decimal inputs cannot tie at the 4th decimal); pyarrow's
    # pc.round computes via an inexact 1e-4 multiple and diverges in
    # the last bits
    def _r(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("total"), "total",
            pa.array(np.round(t["total"].to_numpy(), 4)),
        )

    return out.map_batches(_r, batch_format="pyarrow")


def q_events_sliding(sf_dir: str):
    from xdata_igraph_ray.stages.windows import sliding

    ev = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    out = sliding(ev, "user_id", "ts", "value", width_s=7200, step_s=3600, P=8)
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "window_start": t["window_start"],
                "n": t["n"],
                "total": pa.array(np.round(t["total"].to_numpy(), 4)),
            }
        ),
        batch_format="pyarrow",
    )


def q_events_session(sf_dir: str):
    from xdata_igraph_ray.stages.windows import session

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return session(ev, "user_id", "ts", gap_s=1800, P=8)


def q_pagerank_weighted_li(sf_dir: str):
    """Weighted PageRank (weight = l_quantity), fixed iterations."""
    from xdata_igraph_ray.graph.pagerank import pagerank

    eng = _engine_li_w(sf_dir)
    pagerank(eng, tol=0.0, max_iter=PR_ITERS, weighted=True)
    scores = eng.state_arrays("pr")
    eng.shutdown()
    return pd.DataFrame({"vid": np.arange(NV), "score": np.round(scores, 6)})


def q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped aggregate through the engine's exchange."""
    from xdata_igraph_ray.exchange import groupby_agg

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "revenue": pc.multiply(
                    t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = groupby_agg(
        li, ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum", "sum_qty"), ("revenue", "sum", "revenue"),
         (None, "count", "n")], P=4,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.round(t["sum_qty"], ndigits=2),
                "revenue": pc.round(t["revenue"], ndigits=2),
                "n": t["n"],
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# PII / repetition / source rollup (training-data pipeline extras)

# deterministic planted PII, constructed IDENTICALLY in SQL so the
# scrub oracle is non-trivial on this synthetic corpus
_PII_SUFFIX = " contact: user{d}@example.com or +1-555-0100 at 10.0.0.1"


def q_pii_scrub(sf_dir: str):
    from xdata_igraph_ray.stages.text import pii_scrub

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        tx = t["text"].to_pylist()
        out = [
            x + _PII_SUFFIX.format(d=i) if i % 7 == 0 else x
            for i, x in zip(d, tx)
        ]
        return pa.table({"doc_id": d, "text": out})

    return pii_scrub(docs.map_batches(plant, batch_format="pyarrow"))


def q_repetition(sf_dir: str):
    from xdata_igraph_ray.stages.text import repetition_stats

    return repetition_stats(
        _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def q_source_stats(sf_dir: str):
    from xdata_igraph_ray.stages.text import source_stats

    return source_stats(
        _read_pq(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "source"],
        )
    )


# ---------------------------------------------------------------------------
# flow family (igraph_maxflow / st_mincut / connectivity / bipartite;
# reference src/flow.c, src/bipartite.c, src/matching.c).  Graphs are
# kept at <= 2^16 cut masks so DuckDB can oracle max-flow EXACTLY via
# min-cut enumeration (max-flow-min-cut duality).

NF = 12  # flow-graph vertices: 2^NF cut masks stay SQL-enumerable


def _flow_edges(sf_dir: str, unit: bool = False) -> rd.Dataset:
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def mk(t: pa.Table) -> pa.Table:
        cols = {
            "src": t["l_orderkey"].to_numpy() % NF,
            "dst": t["l_partkey"].to_numpy() % NF,
        }
        if not unit:
            cols["weight"] = np.ones(len(t))
        return pa.table(cols)

    return ds.map_batches(mk, batch_format="pyarrow")


def q_maxflow(sf_dir: str):
    """Max-flow value 0 -> 11 on the 12-vertex lineitem multigraph;
    capacity = parallel-edge multiplicity (weight-1 edges collapsed by
    flow_network's capacity-summing simplify)."""
    from xdata_igraph_ray.graph import flow

    eng = flow.flow_network(_flow_edges(sf_dir), n=NF, P=4)
    try:
        val = flow.maxflow(
            eng, 0, NF - 1, with_flow=False, with_cut=False
        )["value"]
    finally:
        eng.shutdown()
    return pd.DataFrame({"maxflow_value": [float(val)]})


def q_st_edge_connectivity(sf_dir: str):
    from xdata_igraph_ray.graph import flow

    eng = flow.flow_network(
        _flow_edges(sf_dir, unit=True), n=NF, P=4, weighted=False
    )
    try:
        val = flow.st_edge_connectivity(eng, 0, NF - 1)
    finally:
        eng.shutdown()
    return pd.DataFrame({"connectivity": np.array([val], dtype=np.int64)})


def _bip_edges(sf_dir: str) -> rd.Dataset:
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    return ds.map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 8,
                "dst": 8 + t["l_suppkey"].to_numpy() % 8,
            }
        ),
        batch_format="pyarrow",
    )


def q_is_bipartite(sf_dir: str):
    """is_bipartite over two derived graphs: the 12-vertex multigraph
    (loops/odd cycles -> false) and an 8+8 two-mode graph (true by
    construction) — igraph_is_bipartite semantics incl. loops."""
    from xdata_igraph_ray.graph import flow

    a = flow.is_bipartite(_flow_edges(sf_dir, unit=True), n=NF, P=4)
    b = flow.is_bipartite(_bip_edges(sf_dir), n=16, P=4)
    return pd.DataFrame(
        {
            "graph": ["li12", "li_bi"],
            "is_bipartite": np.array([a, b], dtype=np.int64),
        }
    )


def _matching_edges(sf_dir: str) -> rd.Dataset:
    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_quantity", "l_linenumber",
                 "l_discount"],
    )

    def mk(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy()
        ln = t["l_linenumber"].to_numpy()
        dc = t["l_discount"].to_numpy()
        m = (q == 1) & (ln == 7) & (dc >= 0.09)
        return pa.table(
            {
                "src": t["l_orderkey"].to_numpy()[m] % 8,
                "dst": 8 + t["l_suppkey"].to_numpy()[m] % 8,
            }
        )

    return ds.map_batches(mk, batch_format="pyarrow")


def q_motifs4(sf_dir: str):
    """Induced size-4 undirected motif census on the 60-vertex
    lineitem graph; the oracle enumerates all C(60,4) quadruples."""
    from xdata_igraph_ray.graph.motifs import motifs_4_undirected

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 60,
                "dst": t["l_partkey"].to_numpy() % 60,
            }
        ),
        batch_format="pyarrow",
    )
    counts = motifs_4_undirected(ds, n=60, P=4)
    names = sorted(counts)
    return pd.DataFrame(
        {"motif": names,
         "count": np.array([counts[c] for c in names], dtype=np.int64)}
    )


def q_random_walks(sf_dir: str):
    """200 x 16-step deterministic random walks on the 1000-vertex
    lineitem graph (igraph_random_walk; counter-hash sampling, so the
    output is a pure function of the graph + seed — but not
    SQL-expressible: rows-only check)."""
    from xdata_igraph_ray.graph.paths import random_walks

    eng = _engine(sf_dir)
    try:
        ds = random_walks(eng, list(range(200)), steps=16, seed=7)
        df = ds.to_pandas().sort_values(["walk", "step"]).reset_index(
            drop=True
        )
    finally:
        eng.shutdown()
    return df


def q_bipartite_matching(sf_dir: str):
    from xdata_igraph_ray.graph import flow

    types = np.array([0] * 8 + [1] * 8, dtype=np.int8)
    r = flow.bipartite_matching(
        _matching_edges(sf_dir), n=16, types=types, P=4
    )
    return pd.DataFrame({"matching_size": np.array([r["size"]], np.int64)})


def q_maximum_matching(sf_dir: str):
    """General-graph maximum-cardinality matching (Edmonds blossom) —
    EXTENSION: the reference's igraph_maximum_matching raises
    UNIMPLEMENTED (src/matching.c:975).  14 deterministic
    lineitem-derived edges on 10 vertices; the oracle enumerates all
    2^14 edge subsets and maximizes cardinality over valid matchings."""
    import ray

    from xdata_igraph_ray.graph.bipartite import maximum_matching

    def mk(tb: pa.Table) -> pa.Table:
        ok = tb["l_orderkey"].to_numpy()
        pk = tb["l_partkey"].to_numpy()
        keep = (ok * 17 + pk) % 13 == 0
        a = (ok[keep] % 10).astype(np.int64)
        b = (pk[keep] % 10).astype(np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        return pa.table({"a": lo[m], "b": hi[m]}).group_by(
            ["a", "b"]).aggregate([])  # per-batch dedup: <=45 rows out

    rows = _read_pq(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_partkey"]
                    ).map_batches(mk, batch_format="pyarrow").take_all()
    pairs = sorted({(r["a"], r["b"]) for r in rows})[:14]
    tbl = pa.table({"src": np.array([x for x, _ in pairs], np.int64),
                    "dst": np.array([y for _, y in pairs], np.int64)})
    r = maximum_matching([ray.put(tbl)], 10, P=4)
    return pd.DataFrame(
        {"matching_size": np.array([r["matching_size"]], np.int64)})


def q_cocitation(sf_dir: str):
    """igraph_cocitation (src/cocitation.c:68): sparse nonzero pairs
    of common-citer counts on the 200-vertex derived graph."""
    from xdata_igraph_ray.graph.vertex_similarity import cocitation

    df = (
        cocitation(_li_edges_200(sf_dir), P=4)
        .to_pandas()
        .sort_values(["u", "w"])
        .reset_index(drop=True)
    )
    df["cnt"] = df["cnt"].astype(np.int64)
    return df


def q_bibcoupling(sf_dir: str):
    """igraph_bibcoupling (src/cocitation.c:102)."""
    from xdata_igraph_ray.graph.vertex_similarity import bibcoupling

    df = (
        bibcoupling(_li_edges_200(sf_dir), P=4)
        .to_pandas()
        .sort_values(["u", "w"])
        .reset_index(drop=True)
    )
    df["cnt"] = df["cnt"].astype(np.int64)
    return df


def q_similarity_jaccard(sf_dir: str):
    """igraph_similarity_jaccard (src/cocitation.c:323), mode=out,
    loops=False, sparse nonzero pairs."""
    from xdata_igraph_ray.graph.vertex_similarity import similarity_jaccard

    df = (
        similarity_jaccard(_li_edges_200(sf_dir), mode="out", P=4)
        .to_pandas()
        .sort_values(["u", "w"])
        .reset_index(drop=True)
    )
    df["jaccard"] = np.round(df["jaccard"], 6)
    return df


def q_similarity_ilw(sf_dir: str):
    """igraph_similarity_inverse_log_weighted (src/cocitation.c:159),
    mode=out (pivots weighted by in-set-degree)."""
    from xdata_igraph_ray.graph.vertex_similarity import (
        similarity_inverse_log_weighted,
    )

    df = (
        similarity_inverse_log_weighted(
            _li_edges_200(sf_dir), mode="out", P=4
        )
        .to_pandas()
        .sort_values(["u", "w"])
        .reset_index(drop=True)
    )
    df["sim"] = np.round(df["sim"], 6)
    return df


def q_topo_layers(sf_dir: str):
    """igraph_topological_sorting layer order
    (src/structural_properties.c:3325): layer(v) = longest path from
    any source, on a sparse derived DAG (edges oriented src < dst)."""
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.paths import topological_layers

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        s = ok % NV
        d = pk % NV
        keep = ((ok * 13 + pk) % 31 == 0) & (s < d)
        return pa.table({"src": s[keep], "dst": d[keep]})

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    eng = GraphEngine.from_edges(ds, n=NV, P=4)
    layers, ok = topological_layers(eng)
    eng.shutdown()
    assert ok
    return pd.DataFrame(
        {"vid": np.arange(NV), "layer": layers.astype(np.int64)}
    )


def q_unigram_logprob(sf_dir: str):
    """Corpus-fit add-one-smoothed unigram LM score per document —
    token rows sharded BY TOKEN (no model broadcast), hash-exact vs
    the identical model expressed in SQL."""
    from xdata_igraph_ray.stages.text import unigram_logprob

    docs = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    df = (
        unigram_logprob(docs, P=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df["avg_logprob"] = np.round(df["avg_logprob"], 6)
    return df


def q_articulation(sf_dir: str):
    """igraph_articulation_points (src/components.c:553) via the
    distributed Tarjan-Vishkin reduction, on a sparse 200-vertex
    derived graph — hash-exact vs a per-vertex-removal reachability
    SQL oracle."""
    from xdata_igraph_ray.graph.biconnectivity import biconnected

    nv = 200

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok * 7 + pk) % 499 == 0
        return pa.table({"src": ok[keep] % nv, "dst": pk[keep] % nv})

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    _, artic, _ = biconnected(ds, nv, P=4)
    df = artic.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"vid": pd.array([], dtype="int64")})
    return df.sort_values("vid").reset_index(drop=True)


def q_laplacian(sf_dir: str):
    """igraph_laplacian (src/spectral_properties.c:272), directed
    unnormalized: sparse COO rows (src, dst, value)."""
    from xdata_igraph_ray.graph.ops import get_laplacian

    df = (
        get_laplacian(_li_edges(sf_dir), P=4)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    df["value"] = np.round(df["value"], 6)
    return df


def q_bipartite_projection(sf_dir: str):
    """igraph_bipartite_projection (src/bipartite.c:198) first-mode
    projection of the order-supplier bipartite table: (u, w, weight =
    shared suppliers)."""
    from xdata_igraph_ray.graph.vertex_similarity import (
        bipartite_projection,
    )

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "src": t["l_orderkey"].to_numpy() % 150,
                "dst": t["l_suppkey"].to_numpy() % 60,
            }
        ),
        batch_format="pyarrow",
    )
    return (
        bipartite_projection(ds, which="first", P=4)
        .to_pandas()
        .sort_values(["u", "w"])
        .reset_index(drop=True)
    )


def q_asof_events(sf_dir: str):
    """Backward as-of join: each click event picks the user's latest
    purchase at-or-before it (DuckDB ASOF LEFT JOIN semantics); right
    side pre-aggregated to one row per (user, ts)."""
    from xdata_igraph_ray.exchange import groupby_agg
    from xdata_igraph_ray.stages.windows import asof_join

    ev = _read_pq(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    clicks = ev.filter(expr="event_type == 'click'").drop_columns(
        ["event_type", "value"]
    )
    purchases = ev.filter(expr="event_type == 'purchase'")
    right = groupby_agg(
        purchases, ["user_id", "ts"], [("value", "max", "rvalue")], P=4
    )
    df = (
        asof_join(
            clicks, right, key="user_id", ts_col="ts",
            left_cols=["event_id"], right_cols=["rvalue"], P=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df["rvalue"] = np.round(df["rvalue"], 6)
    return df[["event_id", "lag_us", "rvalue"]]


def q_lpa_sync(sf_dir: str):
    """Exactly 8 synchronous LPA supersteps (mode=in, keep-if-tie,
    min-label tie-break, per-edge multiplicity votes), renumbered by
    first appearance — hash-exact vs a recursive-CTE replay of the
    identical update rule.  Complements lpa_li (run to convergence
    with red/black damping, pytest-verified invariants)."""
    from xdata_igraph_ray.graph.lpa import label_propagation

    eng = _engine(sf_dir)
    label_propagation(eng, mode="in", max_iter=8, sync_iters=99,
                      plateau_patience=None)
    lab = eng.state_arrays("label")
    eng.shutdown()
    return pd.DataFrame(
        {"vid": np.arange(NV), "label": lab.astype(np.int64)}
    )


def q_similarity_dice(sf_dir: str):
    """igraph_similarity_dice (src/cocitation.c:384), mode=out,
    loops=False, sparse nonzero pairs."""
    from xdata_igraph_ray.graph.vertex_similarity import similarity_dice

    df = (
        similarity_dice(_li_edges_200(sf_dir), mode="out", P=4)
        .to_pandas()
        .sort_values(["u", "w"])
        .reset_index(drop=True)
    )
    df["dice"] = np.round(df["dice"], 6)
    return df


def q_mst(sf_dir: str):
    """igraph_minimum_spanning_tree (src/spanning_trees.c:78) via
    distributed Boruvka on a sparse 5000-vertex derived graph with
    distinct canonical-edge weights (unique MSF).  The SQL oracle
    verifies the spanning-forest STRUCTURE exactly (per-component
    tree-edge count vs a recursive-CTE WCC); minimality is covered by
    tests/test_mst.py vs networkx Kruskal."""
    from xdata_igraph_ray.graph.mst import minimum_spanning_tree

    nv = 5000

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok * 31 + pk) % 97 == 0
        s = ok[keep] % nv
        d = pk[keep] % nv
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table(
            {
                "src": s,
                "dst": d,
                "weight": (a * nv + b + 1).astype(np.float64),
            }
        )

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    forest = minimum_spanning_tree(ds, nv, P=4).to_pandas()

    # per-component tree-edge counts; union-find on the (small) forest
    parent = np.arange(nv)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in forest.itertuples():
        ra, rb = find(int(r.a)), find(int(r.b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = np.array([find(int(r.a)) for r in forest.itertuples()])
    df = (
        pd.DataFrame({"comp": comps})
        .groupby("comp")
        .size()
        .rename("tree_edges")
        .reset_index()
        .sort_values("comp")
        .reset_index(drop=True)
    )
    df["comp"] = df["comp"].astype(np.int64)
    df["tree_edges"] = df["tree_edges"].astype(np.int64)
    return df


def q_cliques_small(sf_dir: str):
    """Maximal-clique (size, count) histogram of a sparse 16-vertex
    derived graph — hash-exact vs an exhaustive 2^16-subset SQL oracle
    (igraph_maximal_cliques, src/maximal_cliques.c:322).  Complements
    cliques_li, whose 5000-vertex graph is beyond SQL enumeration."""
    from xdata_igraph_ray.graph.cliques import maximal_cliques

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok * 131 + pk * 17) % 1009 == 0
        return pa.table({"src": ok[keep] % 16, "dst": pk[keep] % 16})

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    cl = maximal_cliques(ds, P=3).to_pandas()
    sizes = cl["clique"].map(len)
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame(
        {
            "size": hist.index.to_numpy().astype(np.int64),
            "cnt": hist.to_numpy().astype(np.int64),
        }
    )


def q_independence_number(sf_dir: str):
    """Independence number + number of maximum independent sets of
    the sparse 16-vertex derived graph (igraph_independence_number /
    igraph_largest_independent_vertex_sets, src/cliques.c — cliques
    of the complement); oracle enumerates all 2^16 subsets with
    bit tests."""
    from xdata_igraph_ray.graph.cliques import (
        largest_independent_vertex_sets,
    )

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok * 131 + pk * 17) % 1009 == 0
        return pa.table({"src": ok[keep] % 16, "dst": pk[keep] % 16})

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    sets_ = largest_independent_vertex_sets(ds, n=16)
    return pd.DataFrame({
        "alpha": [np.int64(len(sets_[0]) if sets_ else 0)],
        "n_max_sets": [np.int64(len(sets_))],
    })


def q_motifs_no(sf_dir: str):
    """Exact total connected induced 3-subgraph count via ESU
    (igraph_motifs_randesu_no, src/motifs.c:336) on the sparse
    16-vertex derived graph; oracle enumerates all C(16,3) triples in
    SQL (connected iff >= 2 of the 3 pair edges exist)."""
    from xdata_igraph_ray.graph.motifs import motifs_randesu_no

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok * 131 + pk * 17) % 1009 == 0
        return pa.table({"src": ok[keep] % 16, "dst": pk[keep] % 16})

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    cnt = motifs_randesu_no(ds, 16, size=3, P=4)
    return pd.DataFrame({"n_connected_triples": [np.int64(cnt)]})


def q_sir(sf_dir: str):
    """SIR epidemics (igraph_sir, src/sir.c:107): 32 seeded Gillespie
    runs over the simplified undirected 200-vertex lineitem graph,
    fanned out as Ray tasks against one broadcast CSR.  RNG
    simulation — rows-only check (like random_walks_li); every
    structural invariant (S+I+R=n, monotone times, single-transition
    events, termination) is pytest-gated in test_epidemics.py."""
    from xdata_igraph_ray.graph.epidemics import sir

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy() % 200
        pk = t["l_partkey"].to_numpy() % 200
        keep = ok != pk
        lo = np.minimum(ok[keep], pk[keep])
        hi = np.maximum(ok[keep], pk[keep])
        return pa.table({"src": lo, "dst": hi})

    und = (
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_orderkey", "l_partkey"])
        .map_batches(mk, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    t = sir((und["src"].to_numpy(), und["dst"].to_numpy()), 200,
            beta=0.02, gamma=0.4, no_sim=32, seed=7).to_pandas()
    g = t.groupby("sim")
    return pd.DataFrame({
        "sim": np.asarray(sorted(t["sim"].unique()), np.int64),
        "events": (g.size() - 1).to_numpy().astype(np.int64),
        "final_r": g["no_r"].last().to_numpy().astype(np.int64),
        "tq": np.floor(g["t"].last().to_numpy() * 1e6 + 0.5).astype(np.int64),
    })


def _layout_n(sf_dir: str) -> int:
    """Vertex count for the layout queries = documents row count
    (metadata-only read; the oracle derives the same n via
    COUNT(*))."""
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def q_layout_circle(sf_dir: str):
    """Unit-circle layout (igraph_layout_circle, src/layout.c:149)
    over n = |documents| vertices, run through the DISTRIBUTED
    formula path (ray.data.range -> map_batches); cos/sin quantized
    half-up at 1e-6 and compared to the same closed form in SQL."""
    from xdata_igraph_ray.graph.layout import layout_dataset

    n = _layout_n(sf_dir)
    df = layout_dataset("circle", n).to_pandas()
    return pd.DataFrame({
        "vid": df["vid"].to_numpy().astype(np.int64),
        "xq": np.floor(df["x"].to_numpy() * 1e6 + 0.5).astype(np.int64),
        "yq": np.floor(df["y"].to_numpy() * 1e6 + 0.5).astype(np.int64),
    }).sort_values("vid").reset_index(drop=True)


def q_layout_star(sf_dir: str):
    """Star layout centered at vertex 11 (igraph_layout_star,
    src/layout.c:192): the center consumes no angle step, satellites
    take 2*pi/(n-1) steps in vid order; distributed formula path."""
    from xdata_igraph_ray.graph.layout import layout_dataset

    n = _layout_n(sf_dir)
    df = layout_dataset("star", n, center=11).to_pandas()
    return pd.DataFrame({
        "vid": df["vid"].to_numpy().astype(np.int64),
        "xq": np.floor(df["x"].to_numpy() * 1e6 + 0.5).astype(np.int64),
        "yq": np.floor(df["y"].to_numpy() * 1e6 + 0.5).astype(np.int64),
    }).sort_values("vid").reset_index(drop=True)


def q_layout_grid(sf_dir: str):
    """Row-major grid layout, width 37 (igraph_layout_grid,
    src/layout.c:293) — exact integer-valued doubles, distributed
    formula path."""
    from xdata_igraph_ray.graph.layout import layout_dataset

    n = _layout_n(sf_dir)
    df = layout_dataset("grid", n, width=37).to_pandas()
    return pd.DataFrame({
        "vid": df["vid"].to_numpy().astype(np.int64),
        "x": df["x"].to_numpy().astype(np.float64),
        "y": df["y"].to_numpy().astype(np.float64),
    }).sort_values("vid").reset_index(drop=True)


def q_layout_sphere(sf_dir: str):
    """Saff-Kuijlaars sphere spiral (igraph_layout_sphere,
    src/layout.c:246).  The phi recurrence is a positive prefix sum,
    so the SQL oracle replays it with a window SUM + fmod; both sides
    quantize half-up at 1e-4 (window-sum association differs from
    cumsum at the 1e-12 level)."""
    from xdata_igraph_ray.graph.layout import layout_sphere

    n = _layout_n(sf_dir)
    res = layout_sphere(n)
    return pd.DataFrame({
        "vid": np.arange(n, dtype=np.int64),
        "xq": np.floor(res[:, 0] * 1e4 + 0.5).astype(np.int64),
        "yq": np.floor(res[:, 1] * 1e4 + 0.5).astype(np.int64),
        "zq": np.floor(res[:, 2] * 1e4 + 0.5).astype(np.int64),
    })


def q_sugiyama(sf_dir: str):
    """Sugiyama layered layout (igraph_layout_sugiyama,
    src/sugiyama.c:244) on a sparse derived DAG (edges oriented
    src < dst, multiplicity kept).  The SQL-checkable projection is
    the layer structure: auto-layering on a DAG is the longest path
    from any source (the reference's own non-GLPK configuration),
    and each edge instance spanning k layers creates k-1 dummy bend
    vertices, one per intermediate layer.  Emits per layer
    (n_real, n_dummy); the x coordinates are pytest-verified
    invariants (tests/test_sugiyama.py)."""
    from xdata_igraph_ray.graph.layout import layout_sugiyama

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        s = ok % NV
        d = pk % NV
        keep = ((ok * 13 + pk) % 31 == 0) & (s < d)
        return pa.table({"src": s[keep], "dst": d[keep]})

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(mk, batch_format="pyarrow")
    coords = layout_sugiyama(ds, NV, vgap=1.0)
    lay = np.round(coords[:, 1]).astype(np.int64)
    real, dummy = lay[:NV], lay[NV:]
    layers = np.unique(real)
    n_real = np.bincount(real)[layers]
    n_dummy = np.bincount(dummy, minlength=int(layers.max()) + 1)[layers]
    return pd.DataFrame({
        "layer": layers.astype(np.int64),
        "n_real": n_real.astype(np.int64),
        "n_dummy": n_dummy.astype(np.int64),
    })


# ---------------------------------------------------------------------------
# driver surface


def q_linegraph_degree(sf_dir: str):
    """linegraph over the distinct li edge set, aggregated to
    per-line-vertex (= edge id) out-degree so the driver compare
    stays small; edge ids = (src, dst) rank over distinct edges."""
    from xdata_igraph_ray.graph.ops import linegraph

    lg = linegraph(_li_edges(sf_dir), P=8).to_pandas()
    out = (lg.groupby("src").size().rename("ldeg").reset_index()
           .rename(columns={"src": "eid"}))
    out["eid"] = out["eid"].astype(np.int64)
    out["ldeg"] = out["ldeg"].astype(np.int64)
    return out.sort_values("eid").reset_index(drop=True)


def q_contract_vertices(sf_dir: str):
    from xdata_igraph_ray.graph.ops import contract_vertices

    mapping = np.arange(NV, dtype=np.int64) % 97
    out = contract_vertices(_li_edges(sf_dir), mapping,
                            simplify_result=True, P=8).to_pandas()
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def q_neighborhood_size(sf_dir: str):
    from xdata_igraph_ray.graph.paths import neighborhood_size

    eng = _engine(sf_dir)
    seeds = list(range(50))
    ns = neighborhood_size(eng, seeds, order=2, mode="out")
    eng.shutdown()
    return pd.DataFrame({"vid": np.asarray(seeds, np.int64),
                         "nsize": ns.astype(np.int64)})


def q_motifs3(sf_dir: str):
    from xdata_igraph_ray.graph.motifs import motifs_3_undirected

    m = motifs_3_undirected(_li_edges(sf_dir), NV, P=8)
    return pd.DataFrame({"path": [np.int64(m["path"])],
                         "triangle": [np.int64(m["triangle"])]})


def q_graph_scalars(sf_dir: str):
    """density + maxdegree in one deterministic row."""
    from xdata_igraph_ray.graph.metrics import maxdegree
    from xdata_igraph_ray.graph.ops import density

    e = _li_edges(sf_dir)
    dens = density(e, n=NV, directed=True, loops=False)
    mx_out = maxdegree(_li_edges(sf_dir), mode="out")
    mx_in = maxdegree(_li_edges(sf_dir), mode="in")
    return pd.DataFrame({"density": [np.round(np.float64(dens), 9)],
                         "max_out": [np.int64(mx_out)],
                         "max_in": [np.int64(mx_in)]})


def q_is_mutual(sf_dir: str):
    from xdata_igraph_ray.graph.metrics import is_mutual

    df = is_mutual(_li_edges(sf_dir), P=8).to_pandas()
    df["mutual"] = df["mutual"].astype(np.int64)
    return df.sort_values(["src", "dst"]).reset_index(drop=True)


def q_to_undirected(sf_dir: str):
    from xdata_igraph_ray.graph.ops import to_undirected

    return to_undirected(_li_edges(sf_dir), P=8)


def q_compose(sf_dir: str):
    """compose(li-graph, reversed li-graph): (a, c) with a->b, b<-c."""
    from xdata_igraph_ray.graph.ops import compose, reverse

    g1 = _li_edges(sf_dir)
    g2 = reverse(_li_edges(sf_dir))
    out = compose(g1, g2, P=8).to_pandas()
    return (out.drop_duplicates().sort_values(list(out.columns))
            .reset_index(drop=True))


NCIT = 400  # revolver citation-graph vertex space


def _cit_events(sf_dir: str):
    """Deterministic citation history from lineitem: each row cites
    the smaller of the two derived ids from the larger (dst < src, so
    vertex id == arrival order).  Multi-edges kept — revolver counts
    every copy."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    a = t["l_orderkey"].to_numpy() % NCIT
    b = t["l_partkey"].to_numpy() % NCIT
    keep = a != b
    a, b = a[keep], b[keep]
    return np.maximum(a, b).astype(np.int64), \
        np.minimum(a, b).astype(np.int64)


def _q9(x: np.ndarray) -> np.ndarray:
    return np.floor(np.asarray(x, float) * 1e9 + 0.5) / 1e9


def q_revolver_d(sf_dir: str):
    """In-degree attachment kernel of the lineitem citation history
    (igraph_revolver_d, src/revolver_cit.c:38), one measurement pass
    (st == 1).  Oracle: full window-function SQL replay of the delta
    timeline — per-class running counts for ntk at estimate time, the
    ==1-open / ==0-close exposure pairing for normfact — quantized
    half-up at 1e-9 on both sides."""
    from xdata_igraph_ray.graph.revolver import revolver_d

    cit, to = _cit_events(sf_dir)
    out = revolver_d((cit, to), n=NCIT, niter=1)
    k = out["kernel"]
    return pd.DataFrame({
        "deg": np.arange(len(k), dtype=np.int64),
        "kernel": _q9(k),
        "cites": out["cites"].astype(np.int64),
        "norm": _q9(out["norm"]),
    })


def q_revolver_e(sf_dir: str):
    """Category attachment kernel (igraph_revolver_e,
    src/revolver_cit.c:1407) with cats[v] = v mod 5 over the same
    citation history; one pass.  The e-kernel's bookkeeping is
    closed-form (arrivals only), so the oracle is a direct SQL
    aggregation."""
    from xdata_igraph_ray.graph.revolver import revolver_e

    cit, to = _cit_events(sf_dir)
    cats = np.arange(NCIT, dtype=np.int64) % 5
    out = revolver_e((cit, to), cats, n=NCIT, niter=1)
    k = out["kernel"]
    return pd.DataFrame({
        "cat": np.arange(5, dtype=np.int64),
        "kernel": _q9(k),
        "cites": out["cites"].astype(np.int64),
        "norm": _q9(out["norm"]),
    })


def q_revolver_r(sf_dir: str):
    """Windowed in-degree attachment kernel (igraph_revolver_r,
    src/revolver_cit.c:3336) over the same citation history, trailing
    window of 25 citing nodes, one pass.  Oracle: the revolver_d
    delta-timeline SQL extended with the per-target expiry stream."""
    from xdata_igraph_ray.graph.revolver import revolver_r

    cit, to = _cit_events(sf_dir)
    out = revolver_r((cit, to), 25, n=NCIT, niter=1)
    k = out["kernel"]
    return pd.DataFrame({
        "wdeg": np.arange(len(k), dtype=np.int64),
        "kernel": _q9(k),
        "cites": out["cites"].astype(np.int64),
        "norm": _q9(out["norm"]),
    })


def q_revolver_de(sf_dir: str):
    """(category, in-degree) attachment kernel (igraph_revolver_de,
    src/revolver_cit.c:1726), cats[v] = v mod 4, one pass; flattened
    (cat, deg) grid."""
    from xdata_igraph_ray.graph.revolver import revolver_de

    cit, to = _cit_events(sf_dir)
    cats = np.arange(NCIT, dtype=np.int64) % 4
    out = revolver_de((cit, to), cats, n=NCIT, niter=1)
    k = out["kernel"]
    nc, nd = k.shape
    return pd.DataFrame({
        "cat": np.repeat(np.arange(nc, dtype=np.int64), nd),
        "deg": np.tile(np.arange(nd, dtype=np.int64), nc),
        "kernel": _q9(k.reshape(-1)),
        "cites": out["cites"].reshape(-1).astype(np.int64),
        "norm": _q9(out["norm"].reshape(-1)),
    })


def q_revolver_ad(sf_dir: str):
    """(in-degree, age-bin) attachment kernel (igraph_revolver_ad,
    src/revolver_cit.c:478) over the lineitem citation history, 5 age
    bins, one pass; emitted as the flattened (deg, age) grid."""
    from xdata_igraph_ray.graph.revolver import revolver_ad

    cit, to = _cit_events(sf_dir)
    out = revolver_ad((cit, to), 5, n=NCIT, niter=1)
    k = out["kernel"]
    nd, na = k.shape
    deg = np.repeat(np.arange(nd, dtype=np.int64), na)
    age = np.tile(np.arange(na, dtype=np.int64), nd)
    return pd.DataFrame({
        "deg": deg, "age": age,
        "kernel": _q9(k.reshape(-1)),
        "cites": out["cites"].reshape(-1).astype(np.int64),
        "norm": _q9(out["norm"].reshape(-1)),
    })


def q_revolver_l(sf_dir: str):
    """Citation-lag attachment kernel (igraph_revolver_l,
    src/revolver_cit.c:2096) over a sparser 3000-vertex citation
    derivation so the lag bins populate; 24 age bins + the never-cited
    class, one pass."""
    import pyarrow.parquet as pq

    from xdata_igraph_ray.graph.revolver import revolver_l

    t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey"])
    a = t["l_orderkey"].to_numpy() % 3000
    b = t["l_partkey"].to_numpy() % 3000
    keep = a != b
    cit = np.maximum(a, b)[keep].astype(np.int64)
    to = np.minimum(a, b)[keep].astype(np.int64)
    out = revolver_l((cit, to), 24, n=3000, niter=1)
    k = out["kernel"]
    return pd.DataFrame({
        "lag": np.arange(len(k), dtype=np.int64),
        "kernel": _q9(k),
        "cites": out["cites"].astype(np.int64),
        "norm": _q9(out["norm"]),
    })


def q_pagerank_old(sf_dir: str):
    """Deprecated power-method PageRank (igraph_pagerank_old with
    old=True: additive (1-d), NO normalization, loop-excluded
    out-degree clamped to 1, leaky dangling mass) — fixed 40
    iterations; same linear-recursion oracle shape as pagerank_li."""
    from xdata_igraph_ray.graph.pagerank import pagerank_old

    eng = _engine(sf_dir)
    pagerank_old(eng, niter=40, eps=1e-300, old=True)
    scores = eng.state_arrays("prold")
    return pd.DataFrame(
        {"vid": np.arange(NV), "score": np.round(scores, 6)}
    )


def q_is_multiple(sf_dir: str):
    """igraph_is_multiple semantics: every copy after the first per
    (src, dst) pair is flagged; identical copies are interchangeable,
    so the (src, dst, dup_rank) multiset is order-free."""
    from xdata_igraph_ray.graph.ops import is_multiple

    out = is_multiple(_li_edges(sf_dir), P=8).to_pandas()
    return (out[["src", "dst", "dup_rank"]]
            .sort_values(["src", "dst", "dup_rank"])
            .reset_index(drop=True))


def q_list_triangles(sf_dir: str):
    """igraph_list_triangles: every triangle of the undirected
    support once, canonical (a < b < c)."""
    from xdata_igraph_ray.graph.triangles import list_triangles

    out = list_triangles(_li_edges(sf_dir), P=8).to_pandas()
    return out.sort_values(["a", "b", "c"]).reset_index(drop=True)


def entry() -> Any:
    """Flagship pipeline at sf0.001: pages -> extract -> graph ->
    pagerank -> scores."""
    return q_pagerank_pages("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text_pages": q_extract_text,
        "extract_edges_pages": q_extract_edges,
        "vertices_pages": q_vertices_pages,
        "pagerank_pages": q_pagerank_pages,
        "degrees_li": q_degrees,
        "simplify_li": q_simplify,
        "count_multiple_li": q_count_multiple,
        "top_out_degree_li": q_top_out_degree,
        "wcc_li": q_wcc,
        "scc_li": q_scc,
        "pagerank_li": q_pagerank_li,
        "triangles_total_li": q_triangles_total,
        "triangles_per_vertex_li": q_triangles_per_vertex,
        "lpa_li": q_lpa,
        "edge_ops_li": q_edge_ops,
        "reciprocity_li": q_reciprocity,
        "sssp_li": q_sssp,
        "sssp_weighted_li": q_sssp_weighted,
        "closeness_li": q_closeness,
        "closeness_in_li": q_closeness_in,
        "closeness_all_li": q_closeness_all,
        "closeness_weighted_li": q_closeness_weighted,
        "harmonic_li": q_harmonic,
        "betweenness_weighted_li": q_betweenness_weighted,
        "harmonic_weighted_li": q_harmonic_weighted,
        "betweenness_li": q_betweenness,
        "coreness_li": q_coreness,
        "shortest_paths_li": q_shortest_paths,
        "scan0_li": q_scan0,
        "scan2_li": q_scan2,
        "scan2_them_li": q_scan2_them,
        "scan1_them_li": q_scan1_them,
        "personalized_pagerank_li": q_ppr,
        "pseudo_diameter_li": q_pseudo_diameter,
        "strength_li": q_strength,
        "modularity_li": q_modularity,
        "dyad_census_li": q_dyad_census,
        "triad_census_li": q_triad_census,
        "knn_degree_li": q_knn_degree,
        "diversity_li": q_diversity,
        "constraint_li": q_constraint,
        "barrat_li": q_barrat,
        "get_stochastic_li": q_get_stochastic,
        "path_length_hist_li": q_path_length_hist,
        "diameter_li": q_diameter,
        "centralization_degree_li": q_centralization_degree,
        "ase_li": q_ase,
        "graphlets_li": q_graphlets,
        "min_separators_li": q_min_separators,
        "all_st_cuts_li": q_all_st_cuts,
        "transitive_closure_li": q_transitive_closure,
        "assortativity_nominal_li": q_assortativity_nominal,
        "mcs_li": q_mcs,
        "fas_li": q_fas,
        "centralization_closeness_li": q_centralization_closeness,
        "erdos_gallai_li": q_erdos_gallai,
        "compare_communities_li": q_compare_communities,
        "automorphisms_li": q_automorphisms,
        "canonical_permutation_li": q_canonical_permutation,
        "power_law_fit_li": q_power_law_fit,
        "get_incidence_li": q_get_incidence,
        "sir_li": q_sir,
        "layout_circle_docs": q_layout_circle,
        "layout_star_docs": q_layout_star,
        "layout_grid_docs": q_layout_grid,
        "layout_sphere_docs": q_layout_sphere,
        "sugiyama_layers_li": q_sugiyama,
        "independence_number_li": q_independence_number,
        "motifs_no_li": q_motifs_no,
        "all_simple_paths_li": q_all_simple_paths,
        "convergence_degree_li": q_convergence_degree,
        "centralization_betweenness_li": q_centralization_betweenness,
        "centralization_evcent_li": q_centralization_evcent,
        "dominator_tree_li": q_dominator_tree,
        "scg_groups_li": q_scg_groups,
        "scg_coarse_li": q_scg_coarse,
        "cohesive_blocks_li": q_cohesive_blocks,
        "louvain_li": q_louvain,
        "spinglass_li": q_spinglass,
        "spinglass_neg_li": q_spinglass_negative,
        "spinglass_single_li": q_spinglass_single,
        "leading_eigenvector_li": q_leading_eigenvector,
        "fastgreedy_li": q_fastgreedy,
        "girvan_newman_li": q_girvan_newman,
        "walktrap_li": q_walktrap,
        "infomap_li": q_infomap,
        "optimal_modularity_li": q_optimal_modularity,
        "cliques_li": q_cliques,
        "edge_betweenness_li": q_edge_betweenness,
        "eccentricity_li": q_eccentricity,
        "assortativity_li": q_assortativity,
        "local_scan1_li": q_scan1,
        "eigenvector_li": q_eigenvector,
        "hits_li": q_hits,
        "token_stats_docs": q_token_stats,
        "lang_histogram_docs": q_lang_histogram,
        "exact_dedup_docs": q_exact_dedup_docs,
        "fingerprint_docs": q_fingerprint_docs,
        "quality_docs": q_quality_docs,
        "langid_docs": q_langid_docs,
        "minhash_pairs_docs": q_minhash_pairs,
        "ngram_jaccard_docs": q_ngram_jaccard_docs,
        "simhash_pairs_docs": q_simhash_pairs,
        "knn_embeddings": q_knn,
        "knn_ivf_embeddings": q_knn_ivf,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_planted": q_embedding_near_dup_planted,
        "multimodal_features": q_multimodal_features,
        "events_hourly": q_events_hourly,
        "events_sliding": q_events_sliding,
        "events_session": q_events_session,
        "pagerank_weighted_li": q_pagerank_weighted_li,
        "lineitem_pricing": q_lineitem_pricing,
        "maxflow_li": q_maxflow,
        "st_edge_connectivity_li": q_st_edge_connectivity,
        "is_bipartite_li": q_is_bipartite,
        "bipartite_matching_li": q_bipartite_matching,
        "maximum_matching_li": q_maximum_matching,
        "random_walks_li": q_random_walks,
        "motifs4_li": q_motifs4,
        "pii_scrub_docs": q_pii_scrub,
        "repetition_docs": q_repetition,
        "source_stats_docs": q_source_stats,
        "cocitation_li": q_cocitation,
        "bibcoupling_li": q_bibcoupling,
        "similarity_jaccard_li": q_similarity_jaccard,
        "similarity_ilw_li": q_similarity_ilw,
        "similarity_dice_li": q_similarity_dice,
        "lpa_sync_li": q_lpa_sync,
        "asof_events": q_asof_events,
        "bipartite_projection_li": q_bipartite_projection,
        "laplacian_li": q_laplacian,
        "articulation_points_li": q_articulation,
        "unigram_logprob_docs": q_unigram_logprob,
        "topo_layers_li": q_topo_layers,
        "mst_li": q_mst,
        "cliques_small_li": q_cliques_small,
        "linegraph_degree_li": q_linegraph_degree,
        "contract_vertices_li": q_contract_vertices,
        "neighborhood_size_li": q_neighborhood_size,
        "motifs3_li": q_motifs3,
        "graph_scalars_li": q_graph_scalars,
        "is_mutual_li": q_is_mutual,
        "to_undirected_li": q_to_undirected,
        "compose_li": q_compose,
        "revolver_d_li": q_revolver_d,
        "revolver_e_li": q_revolver_e,
        "revolver_r_li": q_revolver_r,
        "revolver_de_li": q_revolver_de,
        "revolver_ad_li": q_revolver_ad,
        "revolver_l_li": q_revolver_l,
        "pagerank_old_li": q_pagerank_old,
        "is_multiple_li": q_is_multiple,
        "list_triangles_li": q_list_triangles,
    }


def oracle_sql() -> dict[str, str]:
    # the pages-fixture path embeds the page count, which scales with
    # sf; the driver gate runs at sf0.01 (the default), and the local
    # gate (tools/check_oracles.py) exports GRAFT_ORACLE_SF_DIR so
    # the SQL reads the same fixture the queries used at other scales
    n_pages = _pages_n(os.environ.get(
        "GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"))
    pages_pq = os.path.join(
        FIXTURE_ROOT, f"pages_{n_pages}", "pages", "*.parquet"
    )
    edges_pq = os.path.join(
        FIXTURE_ROOT, f"pages_{n_pages}", "edges", "*.parquet"
    )
    # language-ID trigram terms generated from the SAME frozen profiles
    # the Ray stage uses (stages/text.py LangId.PROFILES)
    from xdata_igraph_ray.stages.text import LangId

    def _tri_sum(lang: str) -> str:
        tris = sorted({
            LangId.PROFILES[lang][i:i + 3]
            for i in range(len(LangId.PROFILES[lang]) - 2)
        })
        terms = [
            "(CASE WHEN position('" + t.replace("'", "''") + "' IN lt) > 0 "
            "THEN 1 ELSE 0 END)"
            for t in tris
        ]
        return "(" + " + ".join(terms) + ")"

    def _triad_lut_sql() -> str:
        from xdata_igraph_ray.graph.motifs import _TRIAD_OF_CODE

        rows = []
        for i, nm in enumerate(_TRIAD_OF_CODE):
            rows.append(f"({i}, '{nm}', {int(nm[1])}, {int(nm[0])})")
        return ", ".join(rows)

    def _triad_names_sql() -> str:
        from xdata_igraph_ray.graph.motifs import TRIAD_NAMES

        return ", ".join(f"('{nm}')" for nm in TRIAD_NAMES)

    und = f"(SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM {_LI_E} WHERE src <> dst)"
    tri_join = (
        f"{und} e1 JOIN {und} e2 ON e2.a = e1.b "
        f"JOIN {und} e3 ON e3.a = e1.a AND e3.b = e2.b"
    )
    return {
        "extract_text_pages": f"SELECT url, text FROM read_parquet('{pages_pq}')",
        "extract_edges_pages": f"SELECT src_url, dst_url FROM read_parquet('{edges_pq}')",
        "vertices_pages": f"""
            SELECT row_number() OVER (ORDER BY url) - 1 AS vid, url FROM (
              SELECT DISTINCT src_url AS url FROM read_parquet('{edges_pq}')
              UNION
              SELECT DISTINCT dst_url FROM read_parquet('{edges_pq}')
            )""",
        "pagerank_pages": f"""
            WITH RECURSIVE eu AS (
              SELECT src_url, dst_url FROM read_parquet('{edges_pq}')
            ),
            verts AS (
              SELECT url, row_number() OVER (ORDER BY url) - 1 AS vid FROM (
                SELECT DISTINCT src_url AS url FROM eu
                UNION
                SELECT DISTINCT dst_url FROM eu
              )
            ),
            e AS (
              SELECT vs.vid AS src, vd.vid AS dst
              FROM eu
              JOIN verts vs ON vs.url = eu.src_url
              JOIN verts vd ON vd.url = eu.dst_url
            ),
            nn AS (SELECT count(*) AS c FROM verts),
            deg AS (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY src),
            -- igraph dangling semantics (src/centrality.c:926-939):
            -- per iteration the teleport pool is the full mass of
            -- dangling vertices plus (1-d) of everyone else's
            pr(v, score, outdeg, iter) AS (
              SELECT verts.vid, 1.0 / (SELECT c FROM nn),
                     CAST(deg.outdeg AS DOUBLE), 0
              FROM verts LEFT JOIN deg ON deg.vid = verts.vid
              UNION ALL
              SELECT m.v, sum(m.val), any_value(m.outdeg2), min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, {PR_DAMPING} * p.score / p.outdeg AS val,
                       CAST(NULL AS DOUBLE) AS outdeg2, p.iter AS iter
                FROM pr p JOIN e ON e.src = p.v
                WHERE p.outdeg IS NOT NULL
                UNION ALL
                SELECT p.v, ts.t / (SELECT c FROM nn), p.outdeg, p.iter
                FROM pr p JOIN (
                  SELECT iter, sum(CASE WHEN outdeg IS NULL THEN score
                                        ELSE {1.0 - PR_DAMPING} * score END) AS t
                  FROM pr GROUP BY iter
                ) ts ON ts.iter = p.iter
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < {PR_ITERS}
            )
            SELECT v AS vid, round(score, 6) AS score FROM pr
            WHERE iter = {PR_ITERS}
            """,
        "degrees_li": f"""
            SELECT v.vid,
                   coalesce(o.c, 0) AS out_deg,
                   coalesce(i.c, 0) AS in_deg
            FROM {_LI_V} v
            LEFT JOIN (SELECT src AS vid, count(*) AS c FROM {_LI_E} GROUP BY src) o USING (vid)
            LEFT JOIN (SELECT dst AS vid, count(*) AS c FROM {_LI_E} GROUP BY dst) i USING (vid)
            """,
        "simplify_li": f"SELECT DISTINCT src, dst FROM {_LI_E} WHERE src <> dst",
        "count_multiple_li": f"SELECT src, dst, count(*) AS count FROM {_LI_E} GROUP BY src, dst",
        "top_out_degree_li": f"""
            SELECT src AS vid, count(*) AS out_deg FROM {_LI_E}
            GROUP BY src ORDER BY out_deg DESC, vid LIMIT 20""",
        "wcc_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            und AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
            v AS {_LI_V},
            reach(v, l) AS (
              SELECT vid, vid FROM v
              UNION
              SELECT und.b, reach.l FROM reach JOIN und ON und.a = reach.v
            )
            SELECT v AS vid,
                   dense_rank() OVER (ORDER BY ml) - 1 AS wcc
            FROM (SELECT v, min(l) AS ml FROM reach GROUP BY v)
            """,
        "scc_li": f"""
            WITH RECURSIVE de AS (SELECT DISTINCT src, dst FROM {_LI_E}),
            v AS {_LI_V},
            r(s, t) AS (
              SELECT vid, vid FROM v
              UNION
              SELECT r.s, de.dst FROM r JOIN de ON de.src = r.t
            )
            SELECT vid, dense_rank() OVER (ORDER BY ml) - 1 AS scc FROM (
              SELECT a.t AS vid, min(a.s) AS ml
              FROM r a JOIN r b ON a.s = b.t AND a.t = b.s
              GROUP BY a.t
            )
            """,
        "pagerank_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            v AS {_LI_V},
            deg AS (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY src),
            pr(v, score, outdeg, iter) AS (
              -- full vertex universe (LEFT JOIN: dangling outdeg 0) and
              -- igraph's sumfrom teleport term (dangling mass + (1-d) of
              -- the rest, uniformly redistributed) so the replay matches
              -- the engine at EVERY sf, not just the dangling-free ones
              SELECT v.vid, CAST(1.0 / {NV} AS DOUBLE),
                     CAST(coalesce(d.outdeg, 0) AS DOUBLE), 0
              FROM v LEFT JOIN deg d ON d.vid = v.vid
              UNION ALL
              SELECT m.v, sum(m.val), any_value(m.outdeg2), min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, {PR_DAMPING} * p.score / p.outdeg AS val,
                       CAST(NULL AS DOUBLE) AS outdeg2, p.iter AS iter
                FROM pr p JOIN e ON e.src = p.v
                UNION ALL
                SELECT v2.vid AS v, sf.sumfrom / {NV} AS val,
                       CAST(NULL AS DOUBLE) AS outdeg2, sf.iter AS iter
                FROM (
                  SELECT min(iter) AS iter,
                         sum(CASE WHEN outdeg = 0 THEN score
                                  ELSE (1.0 - {PR_DAMPING}) * score END)
                         AS sumfrom
                  FROM pr
                ) sf CROSS JOIN v v2
                UNION ALL
                SELECT p.v, 0.0, p.outdeg, p.iter FROM pr p
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < {PR_ITERS}
            )
            SELECT v AS vid, round(score, 6) AS score FROM pr
            WHERE iter = {PR_ITERS}
            """,
        "triangles_total_li": f"SELECT count(*) AS total FROM {tri_join}",
        "triangles_per_vertex_li": f"""
            WITH t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM {tri_join}),
            corners AS (
              SELECT x AS vid FROM t UNION ALL
              SELECT y FROM t UNION ALL
              SELECT z FROM t
            )
            SELECT v.vid, coalesce(c.cnt, 0) AS count
            FROM {_LI_V} v
            LEFT JOIN (SELECT vid, count(*) AS cnt FROM corners GROUP BY vid) c USING (vid)
            """,
        "edge_ops_li": f"""
            WITH e1 AS (SELECT DISTINCT src, dst FROM {_LI_E}),
            e2 AS (SELECT DISTINCT l_partkey % {NV} AS src, l_suppkey % {NV} AS dst FROM lineitem)
            SELECT
              (SELECT count(*) FROM (SELECT * FROM e1 UNION SELECT * FROM e2)) AS u,
              (SELECT count(*) FROM (SELECT * FROM e1 INTERSECT SELECT * FROM e2)) AS i,
              (SELECT count(*) FROM (SELECT * FROM e1 EXCEPT SELECT * FROM e2)) AS d
            """,
        "reciprocity_li": f"""
            WITH de AS (SELECT DISTINCT src, dst FROM {_LI_E} WHERE src <> dst)
            SELECT round(
              (SELECT count(*) FROM de a JOIN de b ON a.src = b.dst AND a.dst = b.src)
              / CAST((SELECT count(*) FROM de) AS DOUBLE), 6) AS reciprocity
            """,
        "sssp_li": f"""
            WITH RECURSIVE de AS (SELECT DISTINCT src, dst FROM {_LI_E}),
            r(v, d) AS (
              SELECT 0, 0
              UNION
              -- depth bound >> the dense graph's true diameter (~4);
              -- keeps the closure small without risking false -1s
              SELECT de.dst, r.d + 1 FROM r JOIN de ON de.src = r.v
              WHERE r.d < 16
            )
            SELECT v.vid, CAST(coalesce(m.d, -1) AS BIGINT) AS dist
            FROM {_LI_V} v
            LEFT JOIN (SELECT v, min(d) AS d FROM r GROUP BY v) m
              ON m.v = v.vid
            """,
        "shortest_paths_li": f"""
            WITH RECURSIVE de AS (SELECT DISTINCT src, dst FROM {_LI_E}),
            r(v, d) AS (
              SELECT 0, 0
              UNION
              SELECT de.dst, r.d + 1 FROM r JOIN de ON de.src = r.v
              WHERE r.d < 16
            ),
            dist AS (SELECT v, min(d) AS d FROM r GROUP BY v),
            par AS (
              SELECT de.dst AS v, min(de.src) AS p
              FROM de
              JOIN dist da ON da.v = de.src
              JOIN dist db ON db.v = de.dst AND db.d = da.d + 1
              GROUP BY de.dst
            ),
            targets AS (SELECT range * 25 AS t FROM range(0, {NV // 25})),
            walk(t, cur, path) AS (
              SELECT t, t, CAST(t AS VARCHAR) FROM targets
              JOIN dist ON dist.v = targets.t
              UNION ALL
              SELECT w.t, par.p,
                     CAST(par.p AS VARCHAR) || '->' || w.path
              FROM walk w JOIN par ON par.v = w.cur
              WHERE w.cur <> 0
            )
            SELECT targets.t AS target,
                   coalesce(done.path, '') AS path
            FROM targets
            LEFT JOIN (SELECT t, path FROM walk WHERE cur = 0) done
              ON done.t = targets.t
            """,
        "scan0_li": f"""
            WITH e AS {_LI_E}
            SELECT v.vid, round(coalesce(o.c, 0) + coalesce(i.c, 0), 1)
                     AS scan0
            FROM {_LI_V} v
            LEFT JOIN (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS c
                       FROM e GROUP BY src) o USING (vid)
            LEFT JOIN (SELECT dst AS vid, CAST(count(*) AS DOUBLE) AS c
                       FROM e GROUP BY dst) i USING (vid)
            """,
        "scan2_li": f"""
            WITH e AS (SELECT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem),
            de AS (SELECT DISTINCT src, dst FROM e),
            -- closed 2-out-neighborhood membership per source
            n1 AS (SELECT DISTINCT src AS s, dst AS t FROM de),
            reach AS (
              SELECT vid AS s, vid AS t
              FROM (SELECT range AS vid FROM range(0, {NV2}))
              UNION
              SELECT s, t FROM n1
              UNION
              SELECT n1.s, de.dst FROM n1 JOIN de ON de.src = n1.t
            )
            SELECT v.vid, coalesce(cnt.c, 0) AS scan2
            FROM (SELECT range AS vid FROM range(0, {NV2})) v
            LEFT JOIN (
              SELECT ra.s AS vid, count(*) AS c
              FROM e
              JOIN reach ra ON ra.t = e.src
              JOIN reach rb ON rb.s = ra.s AND rb.t = e.dst
              GROUP BY ra.s
            ) cnt USING (vid)
            """,
        "scan2_them_li": f"""
            WITH us AS (SELECT l_orderkey % {NV2} AS src,
                               l_partkey % {NV2} AS dst FROM lineitem),
            them AS (SELECT l_partkey % {NV2} AS src,
                            l_suppkey % {NV2} AS dst FROM lineitem),
            de AS (SELECT DISTINCT src, dst FROM us),
            n1 AS (SELECT DISTINCT src AS s, dst AS t FROM de),
            reach AS (
              SELECT vid AS s, vid AS t
              FROM (SELECT range AS vid FROM range(0, {NV2}))
              UNION
              SELECT s, t FROM n1
              UNION
              SELECT n1.s, de.dst FROM n1 JOIN de ON de.src = n1.t
            )
            SELECT v.vid, coalesce(cnt.c, 0) AS scan2_them
            FROM (SELECT range AS vid FROM range(0, {NV2})) v
            LEFT JOIN (
              SELECT ra.s AS vid, count(*) AS c
              FROM them e
              JOIN reach ra ON ra.t = e.src
              JOIN reach rb ON rb.s = ra.s AND rb.t = e.dst
              GROUP BY ra.s
            ) cnt USING (vid)
            """,
        "scan1_them_li": f"""
            WITH us AS {_LI_E},
            them AS (SELECT l_partkey % {NV} AS src,
                            l_suppkey % {NV} AS dst FROM lineitem),
            adj AS (
              SELECT DISTINCT a, b FROM (
                SELECT src AS a, dst AS b FROM us
                UNION ALL SELECT dst, src FROM us
              )
            ),
            tnl AS (SELECT src AS x, dst AS y FROM them
                    WHERE src <> dst),
            inc AS (
              SELECT t.x, t.y FROM tnl t
              JOIN adj ON adj.a = t.x AND adj.b = t.y
            ),
            loops AS (SELECT src AS vid, count(*) AS c FROM them
                      WHERE src = dst GROUP BY src),
            wedge AS (
              SELECT a1.a AS vid, count(*) AS c
              FROM tnl t
              JOIN adj a1 ON a1.b = t.x
              JOIN adj a2 ON a2.a = a1.a AND a2.b = t.y
              WHERE a1.a <> t.x AND a1.a <> t.y
              GROUP BY a1.a
            ),
            incc AS (
              SELECT vid, count(*) AS c FROM (
                SELECT x AS vid FROM inc UNION ALL SELECT y FROM inc
              ) GROUP BY vid
            )
            SELECT v.vid,
                   coalesce(incc.c, 0) + coalesce(loops.c, 0)
                   + coalesce(wedge.c, 0) AS scan1_them
            FROM {_LI_V} v
            LEFT JOIN incc USING (vid)
            LEFT JOIN loops USING (vid)
            LEFT JOIN wedge USING (vid)
            """,
        "sssp_weighted_li": f"""
            WITH RECURSIVE e AS (
              SELECT l_orderkey % {NV} AS src, l_partkey % {NV} AS dst,
                     min(l_quantity) AS w
              FROM lineitem GROUP BY 1, 2
            ),
            r(v, d) AS (
              SELECT 0, CAST(0 AS DOUBLE)
              UNION
              -- cap 100 >> the measured max shortest distance (76 at
              -- sf0.001, 17 at sf0.01); weights >= 1 bound recursion
              SELECT e.dst, r.d + e.w FROM r JOIN e ON e.src = r.v
              WHERE r.d + e.w < 100
            )
            SELECT v.vid, round(coalesce(m.d, -1), 6) AS dist
            FROM {_LI_V} v
            LEFT JOIN (SELECT v, min(d) AS d FROM r GROUP BY v) m
              ON m.v = v.vid
            """,
        "closeness_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, count(*) AS reach, sum(d) AS dsum
              FROM dist GROUP BY s
            )
            SELECT v.vid,
                   round(1.0 / (agg.dsum + {NV2}.0 * ({NV2} - agg.reach)), 6)
                     AS closeness
            FROM v JOIN agg ON agg.s = v.vid
            """,
        "closeness_in_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.src, r.d + 1 FROM r JOIN de ON de.dst = r.t
              WHERE r.d < 16
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, count(*) AS reach, sum(d) AS dsum
              FROM dist GROUP BY s
            )
            SELECT v.vid,
                   1.0 / (CAST(agg.dsum AS DOUBLE)
                          + {NV2}.0 * ({NV2} - agg.reach)) AS closeness
            FROM v JOIN agg ON agg.s = v.vid
            """,
        "closeness_all_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT a, b FROM (
                SELECT l_orderkey % {NV2} AS a, l_partkey % {NV2} AS b
                FROM lineitem
                UNION ALL
                SELECT l_partkey % {NV2}, l_orderkey % {NV2}
                FROM lineitem
              )
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.b, r.d + 1 FROM r JOIN de ON de.a = r.t
              WHERE r.d < 16
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, count(*) AS reach, sum(d) AS dsum
              FROM dist GROUP BY s
            )
            SELECT v.vid,
                   1.0 / (CAST(agg.dsum AS DOUBLE)
                          + {NV2}.0 * ({NV2} - agg.reach)) AS closeness
            FROM v JOIN agg ON agg.s = v.vid
            """,
        "closeness_weighted_li": """
            WITH RECURSIVE de AS (
              SELECT l_orderkey % 60 AS src, l_partkey % 60 AS dst,
                     min((CAST(l_quantity AS BIGINT) % 3) + 1) AS w
              FROM lineitem
              GROUP BY 1, 2
            ),
            v AS (SELECT range AS vid FROM range(0, 60)),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + de.w FROM r JOIN de ON de.src = r.t
              WHERE r.d + de.w < 25
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, count(*) AS reach, sum(d) AS dsum
              FROM dist GROUP BY s
            )
            SELECT v.vid,
                   round(1.0 / (agg.dsum + 60.0 * (60 - agg.reach)), 6)
                     AS closeness
            FROM v JOIN agg ON agg.s = v.vid
            """,
        # weighted sigma: weighted walks of total weight exactly
        # d(s,t) are precisely the min-weight s->t paths (positive
        # integer weights), summed over step counts
        "betweenness_weighted_li": """
            WITH RECURSIVE de AS (
              SELECT l_orderkey % 60 AS src, l_partkey % 60 AS dst,
                     min((CAST(l_quantity AS BIGINT) % 3) + 1) AS w
              FROM lineitem
              GROUP BY 1, 2
            ),
            v AS (SELECT range AS vid FROM range(0, 60)),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + de.w FROM r JOIN de ON de.src = r.t
              WHERE r.d + de.w < 25
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            wk(s, t, ws, c) AS (
              SELECT vid, vid, 0, CAST(1 AS DOUBLE) FROM v
              UNION ALL
              SELECT w.s, de.dst, w.ws + de.w, sum(w.c)
              FROM wk w JOIN de ON de.src = w.t
              WHERE w.ws + de.w < 25
              GROUP BY w.s, de.dst, w.ws + de.w
            ),
            -- same (s,t,ws) reached at different step counts lands in
            -- different iterations: sum them
            wks AS (SELECT s, t, ws, sum(c) AS c FROM wk GROUP BY 1, 2, 3),
            sp AS (
              SELECT dist.s, dist.t, dist.d, wks.c
              FROM dist JOIN wks ON wks.s = dist.s AND wks.t = dist.t
                                AND wks.ws = dist.d
            )
            SELECT v.vid, round(coalesce(b.bc, 0), 6) AS bc
            FROM v LEFT JOIN (
              SELECT sv.t AS vid, sum(sv.c * vt.c / st.c) AS bc
              FROM sp sv
              JOIN sp vt ON vt.s = sv.t AND vt.d > 0
              JOIN sp st ON st.s = sv.s AND st.t = vt.t
                        AND st.d = sv.d + vt.d
              WHERE sv.d > 0
              GROUP BY sv.t
            ) b USING (vid)
            """,
        "harmonic_weighted_li": """
            WITH RECURSIVE de AS (
              SELECT l_orderkey % 60 AS src, l_partkey % 60 AS dst,
                     min((CAST(l_quantity AS BIGINT) % 3) + 1) AS w
              FROM lineitem
              GROUP BY 1, 2
            ),
            v AS (SELECT range AS vid FROM range(0, 60)),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + de.w FROM r JOIN de ON de.src = r.t
              WHERE r.d + de.w < 25
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END) AS h
              FROM dist GROUP BY s
            )
            SELECT v.vid,
                   round(coalesce(agg.h, 0) / 59.0, 6) AS harmonic
            FROM v LEFT JOIN agg ON agg.s = v.vid
            """,
        "harmonic_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END) AS h
              FROM dist GROUP BY s
            )
            SELECT v.vid,
                   round(coalesce(agg.h, 0) / ({NV2} - 1.0), 6) AS harmonic
            FROM v LEFT JOIN agg ON agg.s = v.vid
            """,
        "betweenness_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            -- walks of length exactly d(s,t) are precisely the
            -- shortest s->t paths, so sigma = walk count at k = d
            wk(s, t, k, c) AS (
              SELECT vid, vid, 0, CAST(1 AS DOUBLE) FROM v
              UNION ALL
              SELECT w.s, de.dst, w.k + 1, sum(w.c)
              FROM wk w JOIN de ON de.src = w.t
              WHERE w.k < 8
              GROUP BY w.s, de.dst, w.k + 1
            ),
            sp AS (
              SELECT dist.s, dist.t, dist.d, wk.c
              FROM dist JOIN wk ON wk.s = dist.s AND wk.t = dist.t
                               AND wk.k = dist.d
            )
            SELECT v.vid, round(coalesce(b.bc, 0), 6) AS bc
            FROM v LEFT JOIN (
              SELECT sv.t AS vid, sum(sv.c * vt.c / st.c) AS bc
              FROM sp sv
              JOIN sp vt ON vt.s = sv.t AND vt.s <> vt.t
              JOIN sp st ON st.s = sv.s AND st.t = vt.t
                        AND st.d = sv.d + vt.d
              WHERE sv.s <> sv.t
              GROUP BY sv.t
            ) b USING (vid)
            """,
        "personalized_pagerank_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            v AS {_LI_V},
            deg AS (SELECT src AS vid, count(*) AS outdeg FROM e GROUP BY src),
            pr(v, score, outdeg, iter) AS (
              SELECT v.vid, CAST(1.0 / {NV} AS DOUBLE),
                     CAST(coalesce(d.outdeg, 0) AS DOUBLE), 0
              FROM v LEFT JOIN deg d ON d.vid = v.vid
              UNION ALL
              SELECT m.v, sum(m.val), any_value(m.outdeg2), min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, {PR_DAMPING} * p.score / p.outdeg AS val,
                       CAST(NULL AS DOUBLE) AS outdeg2, p.iter AS iter
                FROM pr p JOIN e ON e.src = p.v
                UNION ALL
                -- sumfrom (dangling mass + (1-d) of the rest) lands on
                -- the reset distribution, not uniformly
                SELECT v2.vid AS v,
                       sf.sumfrom
                       * (CASE v2.vid WHEN 0 THEN 0.6 WHEN 1 THEN 0.4
                          ELSE 0.0 END) AS val,
                       CAST(NULL AS DOUBLE) AS outdeg2, sf.iter AS iter
                FROM (
                  SELECT min(iter) AS iter,
                         sum(CASE WHEN outdeg = 0 THEN score
                                  ELSE (1.0 - {PR_DAMPING}) * score END)
                         AS sumfrom
                  FROM pr
                ) sf CROSS JOIN v v2
                UNION ALL
                SELECT p.v, 0.0, p.outdeg, p.iter FROM pr p
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < {PR_ITERS}
            )
            SELECT v AS vid, round(score, 6) AS score FROM pr
            WHERE iter = {PR_ITERS}
            """,
        "pseudo_diameter_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            und AS (SELECT DISTINCT src, dst FROM
                    (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
            r1(v, d) AS (
              SELECT 0, 0
              UNION
              SELECT und.dst, r1.d + 1 FROM r1 JOIN und ON und.src = r1.v
              WHERE r1.d < 16
            ),
            d1 AS (SELECT v, min(d) AS d FROM r1 GROUP BY v),
            -- np.argmax tie-break: smallest vid among the max distances
            far AS (SELECT v FROM d1 ORDER BY d DESC, v LIMIT 1),
            r2(v, d) AS (
              SELECT (SELECT v FROM far), 0
              UNION
              SELECT und.dst, r2.d + 1 FROM r2 JOIN und ON und.src = r2.v
              WHERE r2.d < 16
            )
            SELECT CAST(max(d) AS BIGINT) AS pseudo_diameter
            FROM (SELECT v, min(d) AS d FROM r2 GROUP BY v)
            """,
        "eigenvector_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            v AS {_LI_V},
            -- power iteration x <- (A^T x)/64 (the /64 only bounds
            -- growth; the final max-normalization removes all scaling)
            ev(v, x, iter) AS (
              SELECT vid, CAST(1.0 AS DOUBLE), 0 FROM v
              UNION ALL
              SELECT m.v, sum(m.x) / 64.0, min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, p.x AS x, p.iter AS iter
                FROM ev p JOIN e ON e.src = p.v
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < 60
            ),
            fin AS (SELECT v, x FROM ev WHERE iter = 60)
            SELECT v.vid,
                   round(coalesce(fin.x, 0) / (SELECT max(x) FROM fin), 6)
                     AS ev
            FROM v LEFT JOIN fin ON fin.v = v.vid
            """,
        "hits_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            v AS {_LI_V},
            -- hub <- A (A^T hub) / 4096 per round (HITS, reference
            -- src/centrality.c:840,886); scaling removed at the end
            hub(v, x, iter) AS (
              SELECT vid, CAST(1.0 AS DOUBLE), 0 FROM v
              UNION ALL
              SELECT m.v, sum(m.val) / 4096.0, min(m.iter) + 1
              FROM (
                SELECT e1.src AS v, a.val AS val, a.iter AS iter
                FROM e e1 JOIN (
                  SELECT e2.dst AS w, sum(h.x) AS val, h.iter AS iter
                  FROM hub h JOIN e e2 ON e2.src = h.v
                  GROUP BY e2.dst, h.iter
                ) a ON a.w = e1.dst
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < 40
            ),
            hf AS (SELECT v, x FROM hub WHERE iter = 40),
            af AS (
              SELECT e.dst AS v, sum(hf.x) AS x
              FROM e JOIN hf ON hf.v = e.src
              GROUP BY e.dst
            )
            SELECT v.vid,
                   round(coalesce(hf.x, 0) / (SELECT max(x) FROM hf), 6)
                     AS hub,
                   round(coalesce(af.x, 0) / (SELECT max(x) FROM af), 6)
                     AS auth
            FROM v
            LEFT JOIN hf ON hf.v = v.vid
            LEFT JOIN af ON af.v = v.vid
            """,
        "knn_embeddings": """
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS cos
              FROM embeddings q, embeddings e
              WHERE q.vec_id < 4
            )
            QUALIFY row_number() OVER (
              PARTITION BY query_id ORDER BY cos DESC, vec_id) <= 10
            """,
        "knn_ivf_embeddings": """
            -- nprobe = n_clusters in the query => IVF degenerates to
            -- exact brute force, so the oracle is the same top-k
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS cos
              FROM embeddings q, embeddings e
              WHERE q.vec_id < 4
            )
            QUALIFY row_number() OVER (
              PARTITION BY query_id ORDER BY cos DESC, vec_id) <= 10
            """,
        "embedding_near_dup": """
            -- exact brute force: every pair at cosine >= 0.95 (the
            -- banded-LSH recall bound is ~1e-4 misses; on this table
            -- the truth set is computed exactly)
            SELECT a, b FROM (
              SELECT x.vec_id AS a, y.vec_id AS b,
                     list_cosine_similarity(x.embedding, y.embedding)
                       AS cosine
              FROM embeddings x, embeddings y
              WHERE x.vec_id < y.vec_id
            ) WHERE cosine >= 0.95
            """,
        "embedding_near_dup_planted": f"""
            WITH pe AS (
              SELECT * FROM read_parquet(
                '{os.path.join(FIXTURE_ROOT, "emb_planted",
                               "embeddings.parquet")}')
            )
            SELECT a, b FROM (
              SELECT x.vec_id AS a, y.vec_id AS b,
                     list_cosine_similarity(x.embedding, y.embedding)
                       AS cosine
              FROM pe x, pe y
              WHERE x.vec_id < y.vec_id
            ) WHERE cosine >= 0.95
            """,
        "quality_docs": r"""
            WITH w AS (
              SELECT doc_id,
                     greatest(length(text), 1) AS n,
                     regexp_extract_all(text, '[A-Za-z0-9]+') AS words,
                     len(regexp_extract_all(text, '[A-Za-z]')) AS alpha
              FROM documents
            ),
            f AS (
              SELECT doc_id,
                     CAST(alpha AS DOUBLE) / n AS alpha_ratio,
                     CAST(len(list_filter(words, x -> lower(x) IN
                       ('the','of','and','to','in','a','is','that','it',
                        'for','on','as','with','was','at','by','an','be',
                        'this'))) AS DOUBLE)
                       / greatest(len(words), 1) AS stop_ratio,
                     CASE WHEN len(words) = 0 THEN 0.0
                          ELSE list_avg(list_transform(words,
                                                       x -> length(x)))
                     END AS mean_word_len,
                     CASE WHEN n BETWEEN 50 AND 100000
                          THEN 1.0 ELSE 0.0 END AS len_ok
              FROM w
            )
            -- full doubles, no rounding: ratios of exact ints in the
            -- same evaluation order as the Python stage (round() hit
            -- a genuine half-even/half-away tie at 0.8203125)
            SELECT doc_id,
                   alpha_ratio,
                   stop_ratio,
                   mean_word_len,
                   0.3 * alpha_ratio
                   + 0.3 * least(stop_ratio * 4.0, 1.0)
                   + 0.2 * len_ok
                   + 0.2 * (CASE WHEN mean_word_len BETWEEN 2.5
                                 AND 12.0 THEN 1.0 ELSE 0.0 END)
                     AS quality
            FROM f
            """,
        "langid_docs": f"""
            WITH t AS (
              SELECT doc_id,
                     ' ' || lower(substr(text, 1, 2000)) || ' ' AS lt
              FROM documents
            ),
            s AS (
              SELECT doc_id,
                     {_tri_sum('en')} AS s_en,
                     {_tri_sum('de')} AS s_de,
                     {_tri_sum('fr')} AS s_fr
              FROM t
            )
            SELECT doc_id,
                   CASE WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
                        WHEN s_de > s_en THEN 'de'
                        WHEN s_en > 0 THEN 'en'
                        ELSE 'und' END AS lang_pred
            FROM s
            """,
        "strength_li": f"""
            WITH e AS (SELECT l_orderkey % {NV} AS src,
                              l_partkey % {NV} AS dst,
                              l_quantity AS w FROM lineitem)
            SELECT v.vid,
                   round(coalesce(o.s, 0), 4) AS out_strength,
                   round(coalesce(i.s, 0), 4) AS in_strength
            FROM {_LI_V} v
            LEFT JOIN (SELECT src AS vid, sum(w) AS s FROM e GROUP BY src) o USING (vid)
            LEFT JOIN (SELECT dst AS vid, sum(w) AS s FROM e GROUP BY dst) i USING (vid)
            """,
        "modularity_li": f"""
            WITH u AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
                       FROM {_LI_E} WHERE src <> dst),
            m AS (SELECT count(*) AS me FROM u),
            w AS (SELECT count(*) AS win FROM u WHERE a % 4 = b % 4),
            degs AS (
              SELECT comm, CAST(sum(c) AS DOUBLE) AS k FROM (
                SELECT a % 4 AS comm, count(*) AS c FROM u GROUP BY 1
                UNION ALL
                SELECT b % 4, count(*) FROM u GROUP BY 1
              ) GROUP BY comm
            )
            SELECT round(
              (SELECT win FROM w) / CAST((SELECT me FROM m) AS DOUBLE)
              - (SELECT sum((k / (2.0 * (SELECT me FROM m))) ** 2) FROM degs),
            6) AS modularity
            """,
        "dyad_census_li": f"""
            WITH de AS (SELECT DISTINCT src, dst FROM {_LI_E} WHERE src <> dst),
            pc_ AS (
              SELECT least(src,dst) a, greatest(src,dst) b, count(*) c
              FROM de GROUP BY 1, 2
            )
            SELECT
              (SELECT count(*) FROM pc_ WHERE c = 2) AS mut,
              (SELECT count(*) FROM pc_ WHERE c = 1) AS asym,
              {NV} * ({NV} - 1) // 2
                - (SELECT count(*) FROM pc_) AS null
            """,
        "knn_degree_li": f"""
            WITH u AS (SELECT DISTINCT least(src,dst) AS a,
                              greatest(src,dst) AS b
                       FROM {_LI_E} WHERE src <> dst),
            nb AS (SELECT a AS vid, b AS nei FROM u
                   UNION ALL SELECT b, a FROM u),
            deg AS (SELECT vid, count(*) AS d FROM nb GROUP BY vid),
            s AS (
              SELECT nb.vid, sum(dn.d) AS sdeg, count(*) AS k
              FROM nb JOIN deg dn ON dn.vid = nb.nei
              GROUP BY nb.vid
            )
            -- full doubles, no rounding (np.round is banker's, DuckDB
            -- round() half-away -> 6-dp ties hashed differently; the
            -- round-2 driver FAIL): int/int division is bit-identical
            SELECT v.vid, CAST(s.sdeg AS DOUBLE) / CAST(s.k AS DOUBLE) AS knn
            FROM {_LI_V} v LEFT JOIN s ON s.vid = v.vid
            """,
        "diversity_li": f"""
            WITH e AS (SELECT l_orderkey % {NV} AS src,
                              l_partkey % {NV} AS dst,
                              CAST(l_quantity AS DOUBLE) AS w
                       FROM lineitem),
            inc AS (SELECT src AS vid, w FROM e
                    UNION ALL SELECT dst, w FROM e),
            agg AS (
              SELECT vid, sum(w) AS s, sum(w * ln(w)) AS ent,
                     count(*) AS k
              FROM inc GROUP BY vid
            )
            SELECT v.vid,
                   round((ln(agg.s) - agg.ent / agg.s) / ln(agg.k), 6)
                     AS diversity
            FROM {_LI_V} v LEFT JOIN agg ON agg.vid = v.vid
            """,
        "constraint_li": f"""
            WITH e AS {_LI_E},
            mu AS (
              SELECT i, j, CAST(count(*) AS DOUBLE) AS w FROM (
                SELECT src AS i, dst AS j FROM e WHERE src <> dst
                UNION ALL
                SELECT dst, src FROM e WHERE src <> dst
              ) GROUP BY i, j
            ),
            si AS (SELECT i, sum(w) AS s FROM mu GROUP BY i),
            p AS (SELECT mu.i, mu.j, mu.w / si.s AS p
                  FROM mu JOIN si USING (i)),
            ind AS (
              SELECT a.i, b.j, sum(a.p * b.p) AS ind
              FROM p a JOIN p b ON b.i = a.j
              WHERE a.i <> b.j
              GROUP BY a.i, b.j
            ),
            c AS (
              SELECT p.i AS vid,
                     sum((p.p + coalesce(ind.ind, 0)) ** 2) AS c
              FROM p LEFT JOIN ind ON ind.i = p.i AND ind.j = p.j
              GROUP BY p.i
            )
            SELECT v.vid, round(c.c, 6) AS constraint
            FROM {_LI_V} v LEFT JOIN c USING (vid)
            """,
        "barrat_li": f"""
            WITH e AS {_LI_E},
            u AS (SELECT least(src,dst) AS a, greatest(src,dst) AS b,
                         CAST(count(*) AS DOUBLE) AS w
                  FROM e WHERE src <> dst GROUP BY 1, 2),
            deg AS (
              SELECT vid, count(*) AS k, sum(w) AS s FROM (
                SELECT a AS vid, w FROM u UNION ALL SELECT b, w FROM u
              ) GROUP BY vid
            ),
            tri AS (
              SELECT e1.a AS va, e1.b AS vb, e2.b AS vc,
                     e1.w AS wab, e3.w AS wac, e2.w AS wbc
              FROM u e1
              JOIN u e2 ON e2.a = e1.b
              JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            corn AS (
              SELECT va AS vid, wab + wac AS c FROM tri
              UNION ALL SELECT vb, wab + wbc FROM tri
              UNION ALL SELECT vc, wac + wbc FROM tri
            ),
            tw AS (SELECT vid, sum(c) AS tw FROM corn GROUP BY vid)
            SELECT v.vid,
                   round(CASE WHEN deg.k >= 2
                         THEN coalesce(tw.tw, 0) / (deg.s * (deg.k - 1))
                         END, 6) AS barrat
            FROM {_LI_V} v
            LEFT JOIN deg ON deg.vid = v.vid
            LEFT JOIN tw ON tw.vid = v.vid
            """,
        "get_stochastic_li": f"""
            WITH e AS {_LI_E},
            cnt AS (SELECT src, dst, count(*) AS c FROM e GROUP BY 1, 2),
            od AS (SELECT src, count(*) AS d FROM e GROUP BY src)
            SELECT cnt.src, cnt.dst,
                   round(cnt.c / CAST(od.d AS DOUBLE), 6) AS p
            FROM cnt JOIN od USING (src)
            """,
        "path_length_hist_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t)
            SELECT CAST(d AS BIGINT) AS length, count(*) AS count
            FROM dist WHERE d > 0 GROUP BY d
            UNION ALL
            SELECT -1::BIGINT, {NV2} * ({NV2} - 1)
                       - (SELECT count(*) FROM dist WHERE d > 0)
            """,
        "diameter_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            )
            SELECT CAST(max(d) AS BIGINT) AS diameter
            FROM (SELECT s, t, min(d) AS d FROM r GROUP BY s, t)
            """,
        "centralization_degree_li": f"""
            WITH e AS (SELECT * FROM {_LI_E} x WHERE x.src <> x.dst),
            deg AS (
              SELECT v.vid,
                     coalesce(o.c, 0) + coalesce(i.c, 0) AS d
              FROM {_LI_V} v
              LEFT JOIN (SELECT src AS vid, count(*) AS c FROM e
                         GROUP BY src) o USING (vid)
              LEFT JOIN (SELECT dst AS vid, count(*) AS c FROM e
                         GROUP BY dst) i USING (vid)
            )
            SELECT round(
              (SELECT sum((SELECT max(d) FROM deg) - d) FROM deg)
              / (2.0 * ({NV} - 1) * ({NV} - 2)), 6) AS centralization
            """,
        "edge_betweenness_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV4} AS src,
                              l_partkey % {NV4} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV4})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            wk(s, t, k, c) AS (
              SELECT vid, vid, 0, CAST(1 AS DOUBLE) FROM v
              UNION ALL
              SELECT w.s, de.dst, w.k + 1, sum(w.c)
              FROM wk w JOIN de ON de.src = w.t
              WHERE w.k < 8
              GROUP BY w.s, de.dst, w.k + 1
            ),
            sp AS (
              SELECT dist.s, dist.t, dist.d, wk.c
              FROM dist JOIN wk ON wk.s = dist.s AND wk.t = dist.t
                               AND wk.k = dist.d
            )
            SELECT de.src, de.dst,
                   round(coalesce(sum(su.c * vt.c / st.c), 0), 6) AS eb
            FROM de
            LEFT JOIN sp su ON su.t = de.src
            LEFT JOIN sp vt ON vt.s = de.dst
            LEFT JOIN sp st ON st.s = su.s AND st.t = vt.t
                           AND st.d = su.d + 1 + vt.d
            GROUP BY de.src, de.dst
            """,
        "eccentricity_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            ecc AS (
              SELECT s, max(d) AS e
              FROM (SELECT s, t, min(d) AS d FROM r GROUP BY s, t)
              GROUP BY s
            )
            -- CAST: the recursive d literal starts INT32; Ray emits
            -- int64 (driver hash is dtype-sensitive)
            SELECT v.vid, CAST(ecc.e AS BIGINT) AS ecc,
                   CAST((SELECT min(e) FROM ecc) AS BIGINT) AS radius
            FROM v JOIN ecc ON ecc.s = v.vid
            """,
        "triad_census_li": f"""
            WITH de AS (SELECT DISTINCT src, dst FROM {_LI_E}
                        WHERE src <> dst),
            pc_ AS (
              SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                     max(CASE WHEN src < dst THEN 1 ELSE 0 END)
                     + 2 * max(CASE WHEN src > dst THEN 1 ELSE 0 END)
                       AS code
              FROM de GROUP BY 1, 2
            ),
            nb AS (
              SELECT a AS c, b AS o, code FROM pc_
              UNION ALL
              SELECT b, a, code FROM pc_
            ),
            w AS (
              SELECT n1.c AS center, n1.o AS x, n2.o AS y,
                     n1.code AS cx, n2.code AS cy
              FROM nb n1 JOIN nb n2 ON n2.c = n1.c AND n1.o < n2.o
            ),
            t AS (
              SELECT w.*, coalesce(pc_.code, 0) AS cxy
              FROM w LEFT JOIN pc_ ON pc_.a = w.x AND pc_.b = w.y
            ),
            f AS (SELECT * FROM t WHERE cxy = 0 OR center < x),
            coded AS (
              SELECT CASE WHEN center < x THEN cx*16 + cy*4 + cxy
                          WHEN center < y THEN cx*16 + cxy*4 + cy
                          ELSE cxy*16 + cx*4 + cy END AS code64
              FROM f
            ),
            lut(code64, name, na, nm) AS (VALUES {_triad_lut_sql()}),
            counted AS (
              SELECT l.name, count(*) AS c,
                     sum(l.na) AS sa, sum(l.nm) AS sm
              FROM coded JOIN lut l USING (code64) GROUP BY l.name
            ),
            pairstats AS (
              SELECT count(*) FILTER (code <> 3) AS asym,
                     count(*) FILTER (code = 3) AS mut
              FROM pc_
            ),
            fixed AS (
              SELECT name, c FROM counted
              UNION ALL
              SELECT '012',
                     (SELECT asym FROM pairstats) * ({NV} - 2)
                     - coalesce((SELECT sum(sa) FROM counted), 0)
              UNION ALL
              SELECT '102',
                     (SELECT mut FROM pairstats) * ({NV} - 2)
                     - coalesce((SELECT sum(sm) FROM counted), 0)
            ),
            named(name) AS (VALUES {_triad_names_sql()})
            SELECT named.name AS triad,
                   -- CAST: sum() is HUGEINT and '/' is float division in
                   -- DuckDB -> n came out float64 while the Ray side emits
                   -- int64 (round-2 driver hash FAIL); force BIGINT
                   CAST(CASE WHEN named.name = '003'
                        THEN {NV}::BIGINT * ({NV} - 1) * ({NV} - 2) // 6
                             - (SELECT sum(c) FROM fixed)
                        ELSE coalesce((SELECT sum(c) FROM fixed
                                       WHERE fixed.name = named.name), 0)
                   END AS BIGINT) AS n
            FROM named
            """,
        "assortativity_li": f"""
            WITH e AS {_LI_E},
            od AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src),
            idg AS (SELECT dst AS vid, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY dst),
            xy AS (
              SELECT od.d AS x, idg.d AS y FROM e
              JOIN od ON od.vid = e.src
              JOIN idg ON idg.vid = e.dst
            )
            SELECT round(corr(x, y), 6) AS assortativity FROM xy
            """,
        "local_scan1_li": f"""
            WITH t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM {tri_join}),
            corners AS (
              SELECT x AS vid FROM t UNION ALL
              SELECT y FROM t UNION ALL SELECT z FROM t
            ),
            tri AS (SELECT vid, count(*) AS c FROM corners GROUP BY vid),
            u AS {und},
            deg AS (
              SELECT vid, count(*) AS d FROM (
                SELECT a AS vid FROM u UNION ALL SELECT b FROM u
              ) GROUP BY vid
            )
            SELECT v.vid,
                   coalesce(tri.c, 0) + coalesce(deg.d, 0) AS scan1
            FROM {_LI_V} v
            LEFT JOIN tri USING (vid)
            LEFT JOIN deg USING (vid)
            """,
        "token_stats_docs": r"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_words,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_tokens
            FROM documents
            """,
        "lang_histogram_docs": "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
        "exact_dedup_docs": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        # exact n-gram Jaccard join: distinct 5-char shingles of the
        # whitespace-collapsed lowercased text; threshold is the exact
        # rational 1/2 tested in INTEGER arithmetic on both sides so
        # the cut is bit-reproducible (ray side: stages/dedup.py
        # ngram_jaccard_pairs, frequency-ordered prefix filter)
        "ngram_jaccard_docs": """
            WITH n AS (
              SELECT doc_id,
                     lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
              FROM documents
            ), padded AS (
              SELECT doc_id,
                     CASE WHEN length(t) < 5
                          THEN t || repeat(' ', 5 - length(t))
                          ELSE t END AS t
              FROM n
            ), sh AS (
              SELECT DISTINCT doc_id, substr(t, CAST(u.i AS INT), 5) AS s
              FROM padded, UNNEST(range(1, greatest(length(t) - 4, 1) + 1)) AS u(i)
            ), cnt AS (
              SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b,
                   CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
            FROM inter
            JOIN cnt ca ON ca.doc_id = inter.a
            JOIN cnt cb ON cb.doc_id = inter.b
            WHERE 2 * i >= (ca.c + cb.c - i)
            """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n, round(sum(value), 4) AS total
            FROM events GROUP BY user_id, date_trunc('hour', ts)
            """,
        "events_sliding": """
            WITH w AS (
              SELECT user_id, date_trunc('hour', ts) AS window_start, value
              FROM events
              UNION ALL
              SELECT user_id, date_trunc('hour', ts) - INTERVAL 1 HOUR, value
              FROM events
            )
            SELECT user_id, window_start, count(*) AS n,
                   round(sum(value), 4) AS total
            FROM w GROUP BY user_id, window_start
            """,
        "events_session": """
            WITH x AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            y AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM x
            )
            SELECT user_id, min(ts) AS session_start,
                   max(ts) AS session_end, count(*) AS n
            FROM y GROUP BY user_id, sid
            """,
        "pagerank_weighted_li": f"""
            WITH RECURSIVE e AS (
              SELECT l_orderkey % {NV} AS src, l_partkey % {NV} AS dst,
                     l_quantity AS w FROM lineitem
            ),
            v AS {_LI_V},
            st AS (SELECT src AS vid, sum(w) AS s FROM e GROUP BY src),
            pr(v, score, s, iter) AS (
              SELECT v.vid, CAST(1.0 / {NV} AS DOUBLE),
                     CAST(coalesce(st.s, 0) AS DOUBLE), 0
              FROM v LEFT JOIN st ON st.vid = v.vid
              UNION ALL
              SELECT m.v, sum(m.val), any_value(m.s2), min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, {PR_DAMPING} * p.score * e.w / p.s AS val,
                       CAST(NULL AS DOUBLE) AS s2, p.iter AS iter
                FROM pr p JOIN e ON e.src = p.v
                UNION ALL
                SELECT v2.vid AS v, sf.sumfrom / {NV} AS val,
                       CAST(NULL AS DOUBLE) AS s2, sf.iter AS iter
                FROM (
                  SELECT min(iter) AS iter,
                         sum(CASE WHEN s = 0 THEN score
                                  ELSE (1.0 - {PR_DAMPING}) * score END)
                         AS sumfrom
                  FROM pr
                ) sf CROSS JOIN v v2
                UNION ALL
                SELECT p.v, 0.0, p.s, p.iter FROM pr p
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < {PR_ITERS}
            )
            SELECT v AS vid, round(score, 6) AS score FROM pr
            WHERE iter = {PR_ITERS}
            """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            """,
        # induced 4-motif census by EXHAUSTIVE quadruple enumeration:
        # C(60,4) = 487,635 quadruples x 6 edge lookups; classes are
        # separated by (edge count, max within-subset degree)
        "motifs4_li": """
            WITH e AS (
              SELECT DISTINCT
                least(l_orderkey % 60, l_partkey % 60) AS a,
                greatest(l_orderkey % 60, l_partkey % 60) AS b
              FROM lineitem
              WHERE l_orderkey % 60 <> l_partkey % 60
            ),
            v AS (SELECT range AS x FROM range(0, 60)),
            quads AS (
              SELECT v1.x AS p, v2.x AS q, v3.x AS r, v4.x AS s
              FROM v v1 JOIN v v2 ON v2.x > v1.x
                   JOIN v v3 ON v3.x > v2.x
                   JOIN v v4 ON v4.x > v3.x
            ),
            lab AS (
              SELECT
                (CASE WHEN e1.a IS NOT NULL THEN 1 ELSE 0 END) AS x12,
                (CASE WHEN e2.a IS NOT NULL THEN 1 ELSE 0 END) AS x13,
                (CASE WHEN e3.a IS NOT NULL THEN 1 ELSE 0 END) AS x14,
                (CASE WHEN e4.a IS NOT NULL THEN 1 ELSE 0 END) AS x23,
                (CASE WHEN e5.a IS NOT NULL THEN 1 ELSE 0 END) AS x24,
                (CASE WHEN e6.a IS NOT NULL THEN 1 ELSE 0 END) AS x34
              FROM quads
              LEFT JOIN e e1 ON e1.a = p AND e1.b = q
              LEFT JOIN e e2 ON e2.a = p AND e2.b = r
              LEFT JOIN e e3 ON e3.a = p AND e3.b = s
              LEFT JOIN e e4 ON e4.a = q AND e4.b = r
              LEFT JOIN e e5 ON e5.a = q AND e5.b = s
              LEFT JOIN e e6 ON e6.a = r AND e6.b = s
            ),
            cls AS (
              SELECT
                x12 + x13 + x14 + x23 + x24 + x34 AS m,
                greatest(x12 + x13 + x14, x12 + x23 + x24,
                         x13 + x23 + x34, x14 + x24 + x34) AS dmax,
                least(x12 + x13 + x14, x12 + x23 + x24,
                      x13 + x23 + x34, x14 + x24 + x34) AS dmin
              FROM lab
            ),
            named AS (
              SELECT CASE
                WHEN m = 3 AND dmax = 3 THEN 'claw'
                WHEN m = 3 THEN 'p4'
                WHEN m = 4 AND dmax = 3 THEN 'paw'
                WHEN m = 4 THEN 'c4'
                WHEN m = 5 THEN 'diamond'
                WHEN m = 6 THEN 'k4'
              END AS motif
              FROM cls WHERE m >= 3 AND dmin >= 1
            ),
            classes(motif) AS (
              VALUES ('c4'), ('claw'), ('diamond'), ('k4'), ('p4'), ('paw')
            )
            SELECT classes.motif,
                   CAST(count(named.motif) AS BIGINT) AS count
            FROM classes LEFT JOIN named USING (motif)
            GROUP BY classes.motif
            """,
        # same explicit base-131 Horner token hash as
        # stages/text.py::fingerprint (mod 2^31-1), XOR-combined with
        # 1-based token position — bit-exact replay
        "fingerprint_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))
                       AS tok,
                     generate_subscripts(
                       regexp_extract_all(text, '[A-Za-z0-9]+'), 1)
                       AS pos
              FROM documents
            ),
            th AS (
              SELECT doc_id, pos,
                     list_reduce(
                       [0::BIGINT] || list_transform(split(tok, ''),
                                             c -> ord(c)::BIGINT),
                       (a, b) -> (a * 131 + b) % 2147483647) AS h
              FROM toks
            )
            SELECT d.doc_id, CAST(COALESCE(x.fp, 0) AS BIGINT) AS fp
            FROM documents d LEFT JOIN (
              SELECT doc_id, bit_xor(h * pos) AS fp
              FROM th GROUP BY doc_id
            ) x USING (doc_id)
            """,
        "pii_scrub_docs": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 7 = 0
                       THEN ' contact: user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or +1-555-0100 at 10.0.0.1'
                       ELSE '' END AS t
              FROM documents
            ),
            s1 AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(
                       t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                     )) AS BIGINT) AS n_emails,
                     regexp_replace(
                       t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t
              FROM planted
            ),
            s2 AS (
              SELECT doc_id, n_emails,
                     CAST(len(regexp_extract_all(t, '\+\d[\d-]{7,}'))
                          AS BIGINT) AS n_phones,
                     regexp_replace(t, '\+\d[\d-]{7,}', '<PHONE>', 'g') AS t
              FROM s1
            )
            SELECT doc_id, n_emails, n_phones,
                   CAST(len(regexp_extract_all(
                     t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'
                   )) AS BIGINT) AS n_ips,
                   regexp_replace(
                     t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                     '<IP>', 'g') AS text_clean
            FROM s2
            """,
        "repetition_docs": """
            WITH w AS (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS word,
                     generate_subscripts(string_split(text, ' '), 1) AS pos
              FROM documents
            ),
            pw AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
            per AS (
              SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct,
                     max(c) AS top_cnt
              FROM pw GROUP BY 1
            ),
            bg AS (
              SELECT a.doc_id, a.word || ' ' || b.word AS gram
              FROM w a JOIN w b
                ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            ),
            pbg AS (
              SELECT doc_id, count(*) AS n_bg,
                     count(DISTINCT gram) AS d_bg
              FROM bg GROUP BY 1
            )
            SELECT per.doc_id, CAST(per.n_words AS BIGINT) AS n_words,
                   round(per.n_distinct * 1.0 / per.n_words, 6)
                     AS distinct_ratio,
                   round(per.top_cnt * 1.0 / per.n_words, 6)
                     AS top_word_frac,
                   round(CASE WHEN coalesce(pbg.n_bg, 0) = 0 THEN 0
                         ELSE 1.0 - pbg.d_bg * 1.0 / pbg.n_bg END, 6)
                     AS dup_2gram_frac
            FROM per LEFT JOIN pbg USING (doc_id)
            """,
        "source_stats_docs": """
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(text)) AS BIGINT) AS total_chars,
                   round(sum(len(text)) * 1.0 / count(*), 2) AS mean_chars
            FROM documents GROUP BY source
            """,
        # vertex similarity family (src/cocitation.c): sparse nonzero
        # pairs over DISTINCT neighbor sets of the 200-vertex graph
        "cocitation_li": f"""
            WITH de AS (SELECT DISTINCT l_orderkey % {NV2} AS src,
                               l_partkey % {NV2} AS dst FROM lineitem)
            SELECT e1.dst AS u, e2.dst AS w, count(*) AS cnt
            FROM de e1 JOIN de e2
              ON e1.src = e2.src AND e1.dst < e2.dst
            GROUP BY u, w
            """,
        "bibcoupling_li": f"""
            WITH de AS (SELECT DISTINCT l_orderkey % {NV2} AS src,
                               l_partkey % {NV2} AS dst FROM lineitem)
            SELECT e1.src AS u, e2.src AS w, count(*) AS cnt
            FROM de e1 JOIN de e2
              ON e1.dst = e2.dst AND e1.src < e2.src
            GROUP BY u, w
            """,
        "similarity_jaccard_li": f"""
            WITH de AS (SELECT DISTINCT l_orderkey % {NV2} AS src,
                               l_partkey % {NV2} AS dst FROM lineitem),
            dl AS (SELECT * FROM de WHERE src <> dst),
            deg AS (SELECT src AS vid, count(*) AS d FROM dl GROUP BY src),
            c AS (
              SELECT e1.src AS u, e2.src AS w, count(*) AS cnt
              FROM dl e1 JOIN dl e2
                ON e1.dst = e2.dst AND e1.src < e2.src
              GROUP BY u, w
            )
            SELECT c.u, c.w,
                   round(c.cnt * 1.0 / (d1.d + d2.d - c.cnt), 6) AS jaccard
            FROM c JOIN deg d1 ON d1.vid = c.u
                   JOIN deg d2 ON d2.vid = c.w
            """,
        "similarity_dice_li": f"""
            WITH de AS (SELECT DISTINCT l_orderkey % {NV2} AS src,
                               l_partkey % {NV2} AS dst FROM lineitem),
            dl AS (SELECT * FROM de WHERE src <> dst),
            deg AS (SELECT src AS vid, count(*) AS d FROM dl GROUP BY src),
            c AS (
              SELECT e1.src AS u, e2.src AS w, count(*) AS cnt
              FROM dl e1 JOIN dl e2
                ON e1.dst = e2.dst AND e1.src < e2.src
              GROUP BY u, w
            )
            SELECT c.u, c.w,
                   round(c.cnt * 2.0 / (d1.d + d2.d), 6) AS dice
            FROM c JOIN deg d1 ON d1.vid = c.u
                   JOIN deg d2 ON d2.vid = c.w
            """,
        "similarity_ilw_li": f"""
            WITH de AS (SELECT DISTINCT l_orderkey % {NV2} AS src,
                               l_partkey % {NV2} AS dst FROM lineitem),
            g AS (SELECT dst AS c, count(*) AS gsz FROM de GROUP BY dst),
            wt AS (SELECT c, CASE WHEN gsz > 1 THEN 1.0 / ln(gsz)
                             ELSE gsz END AS w FROM g),
            p AS (
              SELECT e1.src AS u, e2.src AS w2, e1.dst AS c
              FROM de e1 JOIN de e2
                ON e1.dst = e2.dst AND e1.src < e2.src
            )
            SELECT p.u, p.w2 AS w, round(sum(wt.w), 6) AS sim
            FROM p JOIN wt ON wt.c = p.c
            GROUP BY p.u, p.w2
            """,
        # optimal modularity oracled EXACTLY by enumerating all 7^7
        # label assignments of the 7-vertex derived multigraph and
        # canonicalizing the argmax to first-appearance numbering
        "optimal_modularity_li": """
            WITH e AS (
              SELECT least(l_orderkey % 7, l_partkey % 7) AS a,
                     greatest(l_orderkey % 7, l_partkey % 7) AS b,
                     CAST(count(*) AS DOUBLE) AS w
              FROM lineitem
              WHERE l_orderkey % 7 <> l_partkey % 7
              GROUP BY 1, 2
            ),
            m AS (SELECT sum(w) AS mm FROM e),
            deg AS (
              SELECT v, sum(w) AS d FROM (
                SELECT a AS v, w FROM e
                UNION ALL SELECT b AS v, w FROM e
              ) GROUP BY v
            ),
            lab AS (
              SELECT t.x, r.v,
                     CAST((t.x // CAST(pow(7, r.v) AS BIGINT)) % 7
                          AS BIGINT) AS lb
              FROM range(0, 823543) t(x), range(0, 7) r(v)
            ),
            intra AS (
              SELECT la.x, sum(e.w) AS iw
              FROM e
              JOIN lab la ON la.v = e.a
              JOIN lab lb2 ON lb2.x = la.x AND lb2.v = e.b
                          AND lb2.lb = la.lb
              GROUP BY la.x
            ),
            degc AS (
              SELECT lab.x, lab.lb, sum(deg.d) AS dc
              FROM lab JOIN deg ON deg.v = lab.v
              GROUP BY lab.x, lab.lb
            ),
            sums AS (
              SELECT x, sum(dc * dc) AS s2 FROM degc GROUP BY x
            ),
            qval AS (
              SELECT s.x,
                     coalesce(i.iw, 0) / m.mm
                       - s.s2 / (4 * m.mm * m.mm) AS q
              FROM sums s LEFT JOIN intra i ON i.x = s.x, m
            ),
            best AS (
              SELECT x, q FROM qval ORDER BY q DESC, x ASC LIMIT 1
            ),
            fin AS (
              SELECT lab.v, lab.lb, best.q
              FROM lab JOIN best ON lab.x = best.x
            ),
            canon AS (
              SELECT v, min(v) OVER (PARTITION BY lb) AS fv, q
              FROM fin
            )
            SELECT v AS vid,
                   dense_rank() OVER (ORDER BY fv) - 1 AS comm,
                   round(q, 6) AS modularity
            FROM canon ORDER BY vid
            """,
        # max-flow oracled EXACTLY via max-flow-min-cut duality: the 12
        # vertices give 2^11 s-side masks; min cut capacity over all of
        # them IS the max flow (no flow algorithm needed in SQL)
        "maxflow_li": """
            WITH e AS (
              SELECT l_orderkey % 12 AS src, l_partkey % 12 AS dst,
                     CAST(count(*) AS DOUBLE) AS cap
              FROM lineitem
              WHERE l_orderkey % 12 <> l_partkey % 12
              GROUP BY 1, 2
            ),
            masks AS (
              SELECT range AS m FROM range(0, 4096)
              WHERE ((range >> 0) & 1) = 1 AND ((range >> 11) & 1) = 0
            ),
            cuts AS (
              SELECT masks.m, coalesce(sum(e.cap), 0) AS cut
              FROM masks LEFT JOIN e
                ON ((masks.m >> e.src) & 1) = 1
               AND ((masks.m >> e.dst) & 1) = 0
              GROUP BY masks.m
            )
            SELECT min(cut) AS maxflow_value FROM cuts
            """,
        "st_edge_connectivity_li": """
            WITH e AS (
              SELECT DISTINCT l_orderkey % 12 AS src, l_partkey % 12 AS dst
              FROM lineitem
              WHERE l_orderkey % 12 <> l_partkey % 12
            ),
            masks AS (
              SELECT range AS m FROM range(0, 4096)
              WHERE ((range >> 0) & 1) = 1 AND ((range >> 11) & 1) = 0
            ),
            cuts AS (
              SELECT masks.m, count(e.src) AS cut
              FROM masks LEFT JOIN e
                ON ((masks.m >> e.src) & 1) = 1
               AND ((masks.m >> e.dst) & 1) = 0
              GROUP BY masks.m
            )
            SELECT CAST(min(cut) AS BIGINT) AS connectivity FROM cuts
            """,
        # bipartite iff no odd closed walk (per component); the walk
        # closure over (start, v, parity) is a tiny fixpoint: 12*12*2
        # states for li12, 16*16*2 for the two-mode graph
        "is_bipartite_li": """
            WITH RECURSIVE
            ea AS (
              SELECT DISTINCT l_orderkey % 12 AS a, l_partkey % 12 AS b
              FROM lineitem
            ),
            ua AS (SELECT a, b FROM ea UNION SELECT b AS a, a AS b FROM ea),
            wa(s, v, p) AS (
              SELECT a AS s, a AS v, 0 AS p FROM (SELECT DISTINCT a FROM ua) q
              UNION
              SELECT w.s, u.b, 1 - w.p FROM wa w JOIN ua u ON u.a = w.v
            ),
            eb AS (
              SELECT DISTINCT l_orderkey % 8 AS a, 8 + (l_suppkey % 8) AS b
              FROM lineitem
            ),
            ub AS (SELECT a, b FROM eb UNION SELECT b AS a, a AS b FROM eb),
            wb(s, v, p) AS (
              SELECT a AS s, a AS v, 0 AS p FROM (SELECT DISTINCT a FROM ub) q
              UNION
              SELECT w.s, u.b, 1 - w.p FROM wb w JOIN ub u ON u.a = w.v
            )
            SELECT 'li12' AS graph,
                   CAST(CASE WHEN EXISTS (
                     SELECT 1 FROM wa WHERE s = v AND p = 1
                   ) THEN 0 ELSE 1 END AS BIGINT) AS is_bipartite
            UNION ALL
            SELECT 'li_bi',
                   CAST(CASE WHEN EXISTS (
                     SELECT 1 FROM wb WHERE s = v AND p = 1
                   ) THEN 0 ELSE 1 END AS BIGINT)
            """,
        # maximum bipartite matching = min cut of the unit network
        # s -> L(8) -> R(8) -> t, enumerated over 2^16 middle masks
        # (Koenig duality; arcs: s->every left, every right->t)
        "maximum_matching_li": """
            WITH raw AS (
              SELECT DISTINCT
                least(l_orderkey % 10, l_partkey % 10) AS a,
                greatest(l_orderkey % 10, l_partkey % 10) AS b
              FROM lineitem
              WHERE (l_orderkey * 17 + l_partkey) % 13 = 0
                AND l_orderkey % 10 <> l_partkey % 10
            ),
            e AS (
              SELECT a, b, ROW_NUMBER() OVER (ORDER BY a, b) - 1 AS i
              FROM raw ORDER BY a, b LIMIT 14
            ),
            masks AS (SELECT range AS m FROM range(0, 16384)),
            bad AS (
              SELECT DISTINCT masks.m
              FROM masks, e e1, e e2
              WHERE e1.i < e2.i
                AND ((masks.m >> e1.i) & 1) = 1
                AND ((masks.m >> e2.i) & 1) = 1
                AND (e1.a = e2.a OR e1.a = e2.b
                     OR e1.b = e2.a OR e1.b = e2.b)
            ),
            sz AS (
              SELECT masks.m, count(e.i) AS c
              FROM masks LEFT JOIN e ON ((masks.m >> e.i) & 1) = 1
              WHERE masks.m NOT IN (SELECT m FROM bad)
              GROUP BY masks.m
            )
            SELECT CAST(max(c) AS BIGINT) AS matching_size FROM sz
            """,
        "bipartite_matching_li": """
            WITH e AS (
              SELECT DISTINCT l_orderkey % 8 AS l, l_suppkey % 8 AS r
              FROM lineitem
              WHERE l_quantity = 1 AND l_linenumber = 7
                AND l_discount >= 0.09
            ),
            masks AS (SELECT range AS m FROM range(0, 65536)),
            sl AS (
              SELECT m, count(*) AS c FROM masks, range(0, 8) t(i)
              WHERE ((m >> i) & 1) = 0 GROUP BY m
            ),
            rt AS (
              SELECT m, count(*) AS c FROM masks, range(0, 8) t(i)
              WHERE ((m >> (8 + i)) & 1) = 1 GROUP BY m
            ),
            mid AS (
              SELECT masks.m, count(e.l) AS c
              FROM masks LEFT JOIN e
                ON ((masks.m >> e.l) & 1) = 1
               AND ((masks.m >> (8 + e.r)) & 1) = 0
              GROUP BY masks.m
            )
            SELECT CAST(min(
              coalesce(sl.c, 0) + coalesce(rt.c, 0) + coalesce(mid.c, 0)
            ) AS BIGINT) AS matching_size
            FROM masks
            LEFT JOIN sl USING (m)
            LEFT JOIN rt USING (m)
            LEFT JOIN mid USING (m)
            """,
        # spanning-forest STRUCTURE oracle: the Boruvka forest must
        # have exactly (component size - 1) edges inside every WCC of
        # the sparse derived graph (minimality is pytest-vs-networkx,
        # tests/test_mst.py)
        "mst_li": """
            WITH RECURSIVE e AS (
              SELECT l_orderkey % 5000 AS src, l_partkey % 5000 AS dst
              FROM lineitem
              WHERE (l_orderkey * 31 + l_partkey) % 97 = 0
            ),
            und AS (
              SELECT src AS a, dst AS b FROM e WHERE src <> dst
              UNION SELECT dst, src FROM e WHERE src <> dst
            ),
            verts AS (SELECT DISTINCT a AS v FROM und),
            reach(v, l) AS (
              SELECT v, v FROM verts
              UNION
              SELECT und.b, reach.l FROM reach JOIN und ON und.a = reach.v
            ),
            wcc AS (SELECT v, min(l) AS comp FROM reach GROUP BY v)
            SELECT comp, count(*) - 1 AS tree_edges
            FROM wcc GROUP BY comp HAVING count(*) > 1
            ORDER BY comp
            """,
        "topo_layers_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV} AS src,
                     l_partkey % {NV} AS dst FROM lineitem
              WHERE (l_orderkey * 13 + l_partkey) % 31 = 0
                AND l_orderkey % {NV} < l_partkey % {NV}
            ),
            v AS {_LI_V},
            lay(x, l) AS (
              SELECT vid, 0 FROM v
              UNION
              SELECT de.dst, lay.l + 1 FROM lay JOIN de ON de.src = lay.x
            )
            SELECT x AS vid, CAST(max(l) AS BIGINT) AS layer FROM lay GROUP BY x
            ORDER BY vid
            """,
        # sugiyama layer structure: auto-layering on a DAG = longest
        # path from any source; each edge INSTANCE spanning k layers
        # contributes one dummy vertex per intermediate layer
        "sugiyama_layers_li": f"""
            WITH RECURSIVE de AS (
              SELECT l_orderkey % {NV} AS src,
                     l_partkey % {NV} AS dst FROM lineitem
              WHERE (l_orderkey * 13 + l_partkey) % 31 = 0
                AND l_orderkey % {NV} < l_partkey % {NV}
            ),
            dd AS (SELECT DISTINCT src, dst FROM de),
            v AS {_LI_V},
            lay(x, l) AS (
              SELECT vid, 0 FROM v
              UNION
              SELECT dd.dst, lay.l + 1 FROM lay JOIN dd ON dd.src = lay.x
            ),
            vl AS (SELECT x AS vid, max(l) AS layer FROM lay GROUP BY x),
            dums AS (
              SELECT unnest(range(a.layer + 1, b.layer)) AS layer
              FROM de
              JOIN vl a ON a.vid = de.src
              JOIN vl b ON b.vid = de.dst
            ),
            dh AS (SELECT layer, count(*) AS n FROM dums GROUP BY layer)
            SELECT CAST(vl.layer AS BIGINT) AS layer,
                   CAST(count(*) AS BIGINT) AS n_real,
                   CAST(coalesce(max(dh.n), 0) AS BIGINT) AS n_dummy
            FROM vl LEFT JOIN dh ON dh.layer = vl.layer
            GROUP BY vl.layer ORDER BY layer
            """,
        "unigram_logprob_docs": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9]+')) AS tok
              FROM documents
            ),
            cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
            tot AS (
              SELECT (SELECT count(*) FROM toks) AS n,
                     (SELECT count(*) FROM cnt) AS v
            )
            SELECT t.doc_id, count(*) AS n_tok,
                   round(sum(ln((c.c + 1.0) / (tot.n + tot.v)))
                         / count(*), 6) AS avg_logprob
            FROM toks t JOIN cnt c USING (tok), tot
            GROUP BY t.doc_id ORDER BY t.doc_id
            """,
        # coreness oracle: recursive-CTE replay of synchronous batch
        # peeling (working-table semantics = one peel wave per step):
        # k ratchets up to the min active ALL-degree (multiplicity,
        # loops count twice), vertices with deg <= k peel at level k
        "coreness_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            und AS (SELECT src AS a, dst AS b FROM e
                    UNION ALL SELECT dst, src FROM e),
            v AS {_LI_V},
            rec(v, core, k) AS (
              SELECT vid, CAST(NULL AS BIGINT), CAST(0 AS BIGINT) FROM v
              UNION ALL
              SELECT s.v,
                     CASE WHEN s.core IS NOT NULL THEN s.core
                          WHEN s.deg <= s.knew THEN s.knew END,
                     s.knew
              FROM (
                SELECT r.v, r.core, coalesce(d.deg, 0) AS deg,
                       greatest(r.k,
                         (SELECT min(coalesce(d2.deg, 0))
                          FROM rec r2
                          LEFT JOIN (
                            SELECT und.a AS v, count(*) AS deg
                            FROM und JOIN rec r3
                              ON r3.v = und.b AND r3.core IS NULL
                            GROUP BY und.a
                          ) d2 ON d2.v = r2.v
                          WHERE r2.core IS NULL)) AS knew
                FROM rec r
                LEFT JOIN (
                  SELECT und.a AS v, count(*) AS deg
                  FROM und JOIN rec r4
                    ON r4.v = und.b AND r4.core IS NULL
                  GROUP BY und.a
                ) d ON d.v = r.v AND r.core IS NULL
                WHERE EXISTS (SELECT 1 FROM rec r5 WHERE r5.core IS NULL)
              ) s
            )
            SELECT DISTINCT v AS vid, core FROM rec
            WHERE core IS NOT NULL ORDER BY vid
            """,
        # articulation oracle: v is a cut vertex iff removing it
        # INCREASES the component count (per-candidate recursive
        # reachability; isolated-vertex removal only decreases it)
        "articulation_points_li": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT least(l_orderkey % 200, l_partkey % 200)
                       AS a,
                     greatest(l_orderkey % 200, l_partkey % 200) AS b
              FROM lineitem
              WHERE (l_orderkey * 7 + l_partkey) % 499 = 0
                AND l_orderkey % 200 <> l_partkey % 200
            ),
            und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
            verts AS (SELECT DISTINCT a AS v FROM und),
            reach(v, l) AS (
              SELECT v, v FROM verts
              UNION
              SELECT und.b, reach.l FROM reach JOIN und ON und.a = reach.v
            ),
            ncomp0 AS (
              SELECT count(DISTINCT ml) AS c
              FROM (SELECT v, min(l) AS ml FROM reach GROUP BY v)
            ),
            reach2(x, v, l) AS (
              SELECT c.v AS x, s.v, s.v
              FROM verts c JOIN verts s ON s.v <> c.v
              UNION
              SELECT reach2.x, und.b, reach2.l
              FROM reach2 JOIN und ON und.a = reach2.v
              WHERE und.b <> reach2.x
            ),
            ncomp AS (
              SELECT x, count(DISTINCT ml) AS c
              FROM (SELECT x, v, min(l) AS ml FROM reach2
                    GROUP BY x, v)
              GROUP BY x
            )
            SELECT ncomp.x AS vid FROM ncomp, ncomp0
            WHERE ncomp.c > ncomp0.c ORDER BY vid
            """,
        "laplacian_li": f"""
            WITH e AS (
              SELECT src, dst FROM {_LI_E} WHERE src <> dst
            ),
            offd AS (
              SELECT src, dst, -CAST(count(*) AS DOUBLE) AS value
              FROM e GROUP BY src, dst
            ),
            diag AS (
              SELECT src, src AS dst, CAST(count(*) AS DOUBLE) AS value
              FROM e GROUP BY src
            )
            SELECT src, dst, round(value, 6) AS value FROM offd
            UNION ALL
            SELECT src, dst, round(value, 6) AS value FROM diag
            """,
        "bipartite_projection_li": """
            WITH de AS (
              SELECT DISTINCT l_orderkey % 150 AS src,
                     l_suppkey % 60 AS dst FROM lineitem
            )
            SELECT e1.src AS u, e2.src AS w,
                   CAST(count(*) AS DOUBLE) AS weight
            FROM de e1 JOIN de e2
              ON e1.dst = e2.dst AND e1.src < e2.src
            GROUP BY u, w
            """,
        "asof_events": """
            WITH l AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ),
            r AS (
              SELECT user_id, ts, max(value) AS rvalue FROM events
              WHERE event_type = 'purchase' GROUP BY user_id, ts
            )
            SELECT l.event_id,
                   CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT)
                     AS lag_us,
                   round(r.rvalue, 6) AS rvalue
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY l.event_id
            """,
        # sync-LPA replay: per iteration each vertex's in-neighbor
        # label votes (per-edge multiplicity, self-loops included) are
        # grouped per (v, l); winner = max votes then min label via the
        # packed key c*1e6 - l; a vertex changes only if its CURRENT
        # label's votes are STRICTLY below the winner's (keep-if-tie)
        "lpa_sync_li": _lpa_sync_sql(8),
        # lpa_li runs the same sync semantics for 16 supersteps (the
        # round-2 no_oracle fix: the canonical name is now the oracled
        # deterministic variant)
        "lpa_li": _lpa_sync_sql(16),
        # community algorithms on planted ring-of-cliques fixtures:
        # the oracle emits the planted partition; hash equality
        # certifies exact recovery (sizes probed exact per algorithm)
        "louvain_li": _planted_sql(10, 10),
        "spinglass_li": _planted_sql(4, 8),
        # signed fixture regenerated in SQL; signed modularity of the
        # planted membership computed from scratch (WriteClusters
        # formula: Q = sum_c[(w+_cc - w-_cc) - (D+_c^2/(2m+)
        # - D-_c^2/(2m-))], result 2Q/(m+ + m-))
        "spinglass_neg_li": """
            WITH e AS (
              SELECT c.range * 8 + i.range AS s,
                     c.range * 8 + j.range AS d, 1.0 AS w
              FROM range(0, 4) c, range(0, 8) i, range(0, 8) j
              WHERE i.range < j.range
              UNION ALL
              SELECT c.range * 8, ((c.range + 1) % 4) * 8, -1.0
              FROM range(0, 4) c
            ),
            m AS (SELECT range AS vid, range // 8 AS comm
                  FROM range(0, 32)),
            deg AS (
              SELECT vid,
                     SUM(CASE WHEN w > 0 THEN w ELSE 0 END) AS dp,
                     SUM(CASE WHEN w < 0 THEN -w ELSE 0 END) AS dn
              FROM (SELECT s AS vid, w FROM e
                    UNION ALL SELECT d, w FROM e)
              GROUP BY vid
            ),
            cd AS (
              SELECT m.comm, SUM(dp) AS cp, SUM(dn) AS cn
              FROM deg JOIN m USING (vid) GROUP BY m.comm
            ),
            tot AS (SELECT SUM(cp) AS mp, SUM(cn) AS mn FROM cd),
            intra AS (
              SELECT SUM(w) AS iw  -- = w+_cc - w-_cc summed over c
              FROM e JOIN m ms ON ms.vid = e.s
                     JOIN m md ON md.vid = e.d
              WHERE ms.comm = md.comm
            ),
            qv AS (
              SELECT intra.iw
                     - (SELECT SUM(cp * cp) FROM cd) / (2 * tot.mp)
                     + (SELECT SUM(cn * cn) FROM cd) / (2 * tot.mn)
                       AS q, tot.mp, tot.mn
              FROM intra, tot
            )
            SELECT m.vid::BIGINT AS vid, m.comm::BIGINT AS comm,
                   (2 * qv.q / (qv.mp + qv.mn))::DOUBLE AS modularity
            FROM m, qv ORDER BY vid
        """,
        "spinglass_single_li": """
            WITH edges AS (
              SELECT c.range * 8 + i.range AS s, c.range * 8 + j.range AS d
              FROM range(0, 4) c, range(0, 8) i, range(0, 8) j
              WHERE i.range < j.range
              UNION ALL
              SELECT c.range * 8, ((c.range + 1) % 4) * 8 FROM range(0, 4) c
            ),
            deg AS (
              SELECT v, COUNT(*)::DOUBLE AS dg FROM (
                SELECT s AS v FROM edges UNION ALL SELECT d FROM edges
              ) GROUP BY v
            ),
            tot AS (SELECT SUM(dg) AS t FROM deg),
            -- planted community of vertex 10 = its clique, vids 8..15
            comm AS (SELECT range AS vid FROM range(8, 16)),
            ks AS (SELECT SUM(dg) AS ks FROM deg WHERE v BETWEEN 8 AND 15),
            cnt AS (
              SELECT
                SUM(CASE WHEN s BETWEEN 8 AND 15 AND d BETWEEN 8 AND 15
                    THEN 1 ELSE 0 END)::DOUBLE AS inner,
                SUM(CASE WHEN (s BETWEEN 8 AND 15) <> (d BETWEEN 8 AND 15)
                    THEN 1 ELSE 0 END)::DOUBLE AS outer
              FROM edges
            )
            SELECT comm.vid::BIGINT AS vid,
              (cnt.inner - 1.0 / tot.t * ks.ks * ks.ks * 0.5)::DOUBLE
                AS cohesion,
              (cnt.outer - 1.0 / tot.t * ks.ks * (tot.t - ks.ks))::DOUBLE
                AS adhesion,
              cnt.inner::BIGINT AS inner_links,
              cnt.outer::BIGINT AS outer_links
            FROM comm, cnt, ks, tot ORDER BY vid
        """,

        "leading_eigenvector_li": _planted_sql(4, 8),
        "fastgreedy_li": _planted_sql(8, 8),
        "girvan_newman_li": _planted_sql(5, 5),
        "walktrap_li": _planted_sql(8, 8),
        "infomap_li": _planted_sql(8, 8),
        # ASE on 6 disjoint 10-cliques: rank-6 Gram = 0.9 within a
        # block / 0 across (closed-form spectrum of K_10), eigenvalues
        # all 9 — integer-rounded, so bit-exact
        # SCG exact grouping on the degree vector: level sets labeled
        # ascending = dense_rank by degree
        "scg_groups_li": f"""
            WITH u AS (
              SELECT DISTINCT least(l_orderkey % {NV}, l_partkey % {NV})
                       AS a,
                     greatest(l_orderkey % {NV}, l_partkey % {NV}) AS b
              FROM lineitem
              WHERE l_orderkey % {NV} <> l_partkey % {NV}
            ),
            nb AS (SELECT a AS vid FROM u UNION ALL SELECT b FROM u),
            deg AS (SELECT vid, count(*) AS d FROM nb GROUP BY vid),
            alldeg AS (
              SELECT v.range AS vid, coalesce(deg.d, 0) AS d
              FROM range(0, {NV}) v LEFT JOIN deg ON deg.vid = v.range
            )
            SELECT vid,
                   dense_rank() OVER (ORDER BY d) - 1 AS g
            FROM alldeg
            """,
        # coarse matrix L A L^T for that grouping: per-edge weight
        # 1/sqrt(|ga||gb|), both symmetric entries, grouped;
        # floor(x*1e6+0.5) quantization matches the Python side's
        # identical formula (rounding-mode independent)
        "scg_coarse_li": f"""
            WITH u AS MATERIALIZED (
              SELECT DISTINCT least(l_orderkey % {NV}, l_partkey % {NV})
                       AS a,
                     greatest(l_orderkey % {NV}, l_partkey % {NV}) AS b
              FROM lineitem
              WHERE l_orderkey % {NV} <> l_partkey % {NV}
            ),
            nb AS (SELECT a AS vid FROM u UNION ALL SELECT b FROM u),
            deg AS (SELECT vid, count(*) AS d FROM nb GROUP BY vid),
            alldeg AS (
              SELECT v.range AS vid, coalesce(deg.d, 0) AS d
              FROM range(0, {NV}) v LEFT JOIN deg ON deg.vid = v.range
            ),
            grp AS MATERIALIZED (
              SELECT vid, dense_rank() OVER (ORDER BY d) - 1 AS g
              FROM alldeg
            ),
            gsz AS (SELECT g, count(*) AS sz FROM grp GROUP BY g),
            pairs AS (
              SELECT ga.g AS ga, gb.g AS gb,
                     1.0 / sqrt(CAST(sa.sz * sb.sz AS DOUBLE)) AS w
              FROM u
              JOIN grp ga ON ga.vid = u.a
              JOIN grp gb ON gb.vid = u.b
              JOIN gsz sa ON sa.g = ga.g
              JOIN gsz sb ON sb.g = gb.g
              UNION ALL
              SELECT gb.g, ga.g,
                     1.0 / sqrt(CAST(sa.sz * sb.sz AS DOUBLE))
              FROM u
              JOIN grp ga ON ga.vid = u.a
              JOIN grp gb ON gb.vid = u.b
              JOIN gsz sa ON sa.g = ga.g
              JOIN gsz sb ON sb.g = gb.g
            )
            SELECT ga, gb,
                   CAST(floor(sum(w) * 1e6 + 0.5) AS BIGINT) AS wq
            FROM pairs GROUP BY ga, gb
            """,
        "fas_li": """
            WITH RECURSIVE arcs AS (
              SELECT DISTINCT l_orderkey % 12 AS u, l_partkey % 12 AS v
              FROM lineitem
              WHERE (l_orderkey * 131 + l_partkey * 17) % 487 = 0
            ),
            masks AS (
              SELECT w.range AS v,
                     coalesce((SELECT sum(DISTINCT 1::BIGINT << a.u)
                               FROM arcs a
                               WHERE a.v = w.range AND a.u <> a.v),
                              0) AS inm,
                     coalesce((SELECT sum(DISTINCT 1::BIGINT << a.v)
                               FROM arcs a
                               WHERE a.u = w.range AND a.u <> a.v),
                              0) AS outm
              FROM range(0, 12) w
            ),
            chain(i, mask, npos, nneg, v, pos) AS (
              SELECT 0, 0::BIGINT, 0, 0, -1, -1
              UNION ALL
              SELECT c.i + 1, pre.nm,
                     c.npos + CASE WHEN pick.pri <> 1 THEN 1 ELSE 0
                              END,
                     c.nneg + CASE WHEN pick.pri = 1 THEN 1 ELSE 0
                              END,
                     pick.v,
                     CASE WHEN pick.pri = 1 THEN 11 - c.nneg
                          ELSE c.npos END
              FROM chain c,
                LATERAL (SELECT CASE WHEN c.v >= 0
                                THEN c.mask | (1::BIGINT << c.v)
                                ELSE c.mask END AS nm) pre,
                LATERAL (
                  SELECT t.v, t.pri FROM (
                    SELECT m.v AS v,
                           CASE WHEN bit_count(
                                  (m.inm & (4095 - pre.nm))::BIGINT
                                ) = 0 THEN 0
                                WHEN bit_count(
                                  (m.outm & (4095 - pre.nm))::BIGINT
                                ) = 0 THEN 1
                                ELSE 2 END AS pri,
                           bit_count((m.inm & (4095 - pre.nm))::BIGINT)
                           - bit_count(
                               (m.outm & (4095 - pre.nm))::BIGINT
                             ) AS negdiff
                    FROM masks m
                    WHERE ((pre.nm >> m.v) & 1) = 0
                  ) t
                  ORDER BY t.pri,
                           CASE WHEN t.pri = 2 THEN t.negdiff
                                ELSE 0 END,
                           t.v
                  LIMIT 1
                ) pick
              WHERE c.i < 12
            ),
            ord_ AS (
              SELECT v, pos FROM chain WHERE v >= 0
            )
            SELECT 0::BIGINT AS kind, CAST(o.v AS BIGINT) AS a,
                   CAST(o.pos AS BIGINT) AS b
            FROM ord_ o
            UNION ALL
            SELECT 1::BIGINT, CAST(a.u AS BIGINT), CAST(a.v AS BIGINT)
            FROM arcs a
            JOIN ord_ cu ON cu.v = a.u
            JOIN ord_ cv ON cv.v = a.v
            WHERE a.u = a.v OR cu.pos > cv.pos
            """,
        # convergence degree: ins(e) = #roots with d(i,u)+1 = d(i,v)
        # (forward all-pairs dist), outs(e) = #roots with
        # d(v,i)+1 = d(u,i) (the same dist table read backwards)
        "convergence_degree_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            e AS (SELECT src, dst FROM de WHERE src <> dst),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de2.dst, r.d + 1
              FROM r JOIN e de2 ON de2.src = r.t
              WHERE r.d < 16
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            cnt AS (
              SELECT e.src, e.dst,
                     (SELECT count(*) FROM dist a JOIN dist b
                      ON a.s = b.s
                      WHERE a.t = e.src AND b.t = e.dst
                        AND a.d + 1 = b.d) AS ins,
                     (SELECT count(*) FROM dist a JOIN dist b
                      ON a.t = b.t
                      WHERE a.s = e.dst AND b.s = e.src
                        AND a.d + 1 = b.d) AS outs
              FROM e
            )
            SELECT CAST(src AS BIGINT) AS src,
                   CAST(dst AS BIGINT) AS dst,
                   CAST(ins AS BIGINT) AS ins,
                   CAST(outs AS BIGINT) AS outs,
                   CAST(floor(CAST(ins - outs AS DOUBLE)
                              / (ins + outs) * 1e6 + 0.5) AS BIGINT)
                     AS cdq
            FROM cnt
            """,
        # all simple paths via a recursive CTE carrying the visited
        # bitmask; loops dropped (reference ignores loop edges)
        "all_simple_paths_li": """
            WITH RECURSIVE arcs AS (
              SELECT DISTINCT l_orderkey % 10 AS u, l_partkey % 10 AS v
              FROM lineitem
              WHERE l_orderkey % 10 <> l_partkey % 10
                AND (l_orderkey * 131 + l_partkey * 17) % 1321 = 0
            ),
            walk(v, mask, p) AS (
              SELECT 0, 1::BIGINT, '0'
              UNION ALL
              SELECT a.v, w.mask | (1::BIGINT << a.v),
                     w.p || '->' || CAST(a.v AS VARCHAR)
              FROM walk w JOIN arcs a ON a.u = w.v
              WHERE ((w.mask >> a.v) & 1) = 0
            )
            SELECT p AS path FROM walk WHERE v IN (8, 9)
            """,
        # automorphism count: all 6^6 candidate maps, keep distinct
        # (permutation) arc-preserving ones
        "automorphisms_li": """
            WITH arcs AS (
              SELECT DISTINCT l_orderkey % 6 AS u, l_partkey % 6 AS v
              FROM lineitem
              WHERE l_orderkey % 6 <> l_partkey % 6
                AND (l_orderkey * 131 + l_partkey * 17) % 1009 = 0
            ),
            perms AS (
              SELECT [p0.range, p1.range, p2.range,
                      p3.range, p4.range, p5.range] AS p
              FROM range(0, 6) p0, range(0, 6) p1, range(0, 6) p2,
                   range(0, 6) p3, range(0, 6) p4, range(0, 6) p5
              WHERE len(list_distinct(
                      [p0.range, p1.range, p2.range,
                       p3.range, p4.range, p5.range])) = 6
            )
            SELECT count(*) AS aut FROM perms
            WHERE NOT EXISTS (
              SELECT 1 FROM arcs a
              WHERE NOT EXISTS (
                SELECT 1 FROM arcs b
                WHERE b.u = list_extract(perms.p, a.u + 1)
                  AND b.v = list_extract(perms.p, a.v + 1)))
            """,
        # canonical labeling: enumerate all 6! labelings l (l[v] = new
        # id of v), compute the 36-bit border-order adjacency code
        # (cell (i,j) at bit j*j+i if i<j else i*i+i+1+j; no loops in
        # the arc set so the diagonal is all 0), min code then lex-min
        # labeling — identical definition to graph/isomorphism.py
        "canonical_permutation_li": """
            WITH arcs AS (
              SELECT DISTINCT l_orderkey % 6 AS u, l_partkey % 6 AS v
              FROM lineitem
              WHERE l_orderkey % 6 <> l_partkey % 6
                AND (l_orderkey * 131 + l_partkey * 17) % 1009 = 0
            ),
            labs AS (
              SELECT [p0.range, p1.range, p2.range,
                      p3.range, p4.range, p5.range] AS l
              FROM range(0, 6) p0, range(0, 6) p1, range(0, 6) p2,
                   range(0, 6) p3, range(0, 6) p4, range(0, 6) p5
              WHERE len(list_distinct(
                      [p0.range, p1.range, p2.range,
                       p3.range, p4.range, p5.range])) = 6
            ),
            coded AS (
              SELECT l,
                (SELECT coalesce(sum(
                   1::BIGINT << (35 - (CASE
                     WHEN list_extract(l, a.u + 1)
                          < list_extract(l, a.v + 1)
                     THEN list_extract(l, a.v + 1)
                          * list_extract(l, a.v + 1)
                          + list_extract(l, a.u + 1)
                     ELSE list_extract(l, a.u + 1)
                          * list_extract(l, a.u + 1)
                          + list_extract(l, a.u + 1) + 1
                          + list_extract(l, a.v + 1)
                   END))::INT), 0)
                 FROM arcs a) AS code,
                list_extract(l, 1) * 7776 + list_extract(l, 2) * 1296
                  + list_extract(l, 3) * 216 + list_extract(l, 4) * 36
                  + list_extract(l, 5) * 6 + list_extract(l, 6)
                  AS lexkey
              FROM labs
            ),
            best AS (
              SELECT l FROM coded ORDER BY code, lexkey LIMIT 1
            )
            SELECT v.range::BIGINT AS vid,
                   list_extract(best.l, v.range + 1)::BIGINT AS rank
            FROM best, range(0, 6) v
            """,
        # continuous CSN power-law fit of the distinct-arc out-degree
        # distribution: suffix sums give alpha = 1 + m/logsum per
        # candidate xmin, a uniques cross join replays the KS scan
        # (first/last-occurrence deviation bounds), plfit's piecewise
        # Kolmogorov Q gives p; half-up 1e-6 quantization both sides
        "power_law_fit_li": f"""
            WITH arcs AS (
              SELECT DISTINCT l_orderkey % {NV} AS src,
                              l_partkey % {NV} AS dst
              FROM lineitem
              WHERE l_orderkey % {NV} <> l_partkey % {NV}
            ),
            deg AS (
              SELECT src, count(*)::DOUBLE AS dv FROM arcs GROUP BY src
            ),
            vals AS (
              SELECT dv AS v, count(*)::DOUBLE AS c FROM deg GROUP BY dv
            ),
            sfx AS (
              SELECT v, c,
                sum(c) OVER (ORDER BY v DESC) AS m,
                sum(c * ln(v)) OVER (ORDER BY v DESC) AS slog,
                coalesce(sum(c) OVER (
                  ORDER BY v ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS cumlt
              FROM vals
            ),
            cand AS (
              SELECT v AS xmin, m, slog - m * ln(v) AS logsum,
                     cumlt AS cum0
              FROM sfx
              WHERE v < (SELECT max(v) FROM vals)
                AND slog - m * ln(v) > 0
            ),
            kd AS (
              SELECT cand.xmin, cand.m, cand.logsum,
                     1.0 + cand.m / cand.logsum AS alpha,
                     max(greatest(
                       abs(1 - pow(cand.xmin / s.v,
                                   cand.m / cand.logsum)
                           - (s.cumlt - cand.cum0) / cand.m),
                       abs(1 - pow(cand.xmin / s.v,
                                   cand.m / cand.logsum)
                           - (s.cumlt - cand.cum0 + s.c - 1) / cand.m)
                     )) AS D
              FROM cand JOIN sfx s ON s.v >= cand.xmin
              GROUP BY cand.xmin, cand.m, cand.logsum, cand.cum0
            ),
            best AS (SELECT * FROM kd ORDER BY D, xmin LIMIT 1),
            bz AS (SELECT *, D * sqrt(m + 1) AS z FROM best),
            pv AS (
              SELECT *,
                CASE
                  WHEN z < 0.2 THEN 1.0
                  WHEN z < 0.755 THEN 1 - 2.50662827 * (
                    exp(-1.2337005501361697 / (z * z))
                    + exp(-11.103304951225528 / (z * z))
                    + exp(-30.842513753404244 / (z * z))) / z
                  WHEN z < 6.8116 THEN 2 * (
                    exp(-2 * z * z)
                    - CASE WHEN floor(3.0 / z + 0.5) >= 2
                           THEN exp(-8 * z * z) ELSE 0 END
                    + CASE WHEN floor(3.0 / z + 0.5) >= 3
                           THEN exp(-18 * z * z) ELSE 0 END
                    - CASE WHEN floor(3.0 / z + 0.5) >= 4
                           THEN exp(-32 * z * z) ELSE 0 END)
                  ELSE 0.0
                END AS p
              FROM bz
            )
            SELECT floor(alpha * 1e6 + 0.5) / 1e6 AS alpha,
                   floor(xmin * 1e6 + 0.5) / 1e6 AS xmin,
                   floor(D * 1e6 + 0.5) / 1e6 AS ks_d,
                   floor(p * 1e6 + 0.5) / 1e6 AS p_value,
                   floor((-alpha * logsum
                          + m * ln((alpha - 1) / xmin)) * 1e6
                         + 0.5) / 1e6 AS loglik,
                   m::BIGINT AS n_tail
            FROM pv
            """,
        # sparse COO incidence of the derived 50 x 40 bipartite table
        "get_incidence_li": """
            SELECT l_orderkey % 50 AS row,
                   l_partkey % 40 AS col,
                   count(*) AS count
            FROM lineitem
            GROUP BY 1, 2
            """,
        # closed-form layout oracles (src/layout.c:149,192,293,246):
        # the same per-vertex formulas in SQL, n = |documents|;
        # operation order mirrors the numpy kernels exactly so the
        # half-up quantization agrees bit-for-bit
        "layout_circle_docs": """
            WITH ids AS (
              SELECT row_number() OVER () - 1 AS vid,
                     count(*) OVER ()::BIGINT AS n
              FROM documents)
            SELECT vid::BIGINT AS vid,
              CAST(floor(cos(2*pi()/n*vid)*1e6+0.5) AS BIGINT) AS xq,
              CAST(floor(sin(2*pi()/n*vid)*1e6+0.5) AS BIGINT) AS yq
            FROM ids
            """,
        "layout_star_docs": """
            WITH ids AS (
              SELECT row_number() OVER () - 1 AS vid,
                     count(*) OVER ()::BIGINT AS n
              FROM documents)
            SELECT vid::BIGINT AS vid,
              CASE WHEN vid = 11 THEN 0 ELSE
                CAST(floor(cos(2*pi()/(n-1)
                  *(vid - (CASE WHEN vid > 11 THEN 1 ELSE 0 END))
                  )*1e6+0.5) AS BIGINT) END AS xq,
              CASE WHEN vid = 11 THEN 0 ELSE
                CAST(floor(sin(2*pi()/(n-1)
                  *(vid - (CASE WHEN vid > 11 THEN 1 ELSE 0 END))
                  )*1e6+0.5) AS BIGINT) END AS yq
            FROM ids
            """,
        "layout_grid_docs": """
            WITH ids AS (
              SELECT row_number() OVER () - 1 AS vid FROM documents)
            SELECT vid::BIGINT AS vid,
                   (vid % 37)::DOUBLE AS x,
                   (vid // 37)::DOUBLE AS y
            FROM ids
            """,
        # Saff-Kuijlaars spiral: theta = acos(h), phi = running sum of
        # 3.6/sqrt(n(1-h^2)) mod 2pi (positive steps, so the window
        # sum equals the reference's stepwise fmod up to association
        # noise — hence the coarser 1e-4 quantization)
        "layout_sphere_docs": """
            WITH ids AS (
              SELECT row_number() OVER () - 1 AS vid,
                     count(*) OVER ()::BIGINT AS n
              FROM documents),
            base AS (
              SELECT vid, n,
                CASE WHEN vid = 0 THEN pi()
                     WHEN vid = n-1 THEN 0.0
                     ELSE acos(-1.0 + 2.0*vid/(n-1))
                END AS theta,
                CASE WHEN vid = 0 OR vid = n-1 THEN 0.0
                     ELSE 3.6/sqrt(n*(1.0
                       - (-1.0 + 2.0*vid/(n-1))
                       * (-1.0 + 2.0*vid/(n-1))))
                END AS step
              FROM ids
            ),
            ph AS (
              SELECT vid, theta,
                CASE WHEN vid = 0 OR vid = n-1 THEN 0.0
                     ELSE fmod(SUM(step) OVER (ORDER BY vid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       2*pi())
                END AS phi
              FROM base
            )
            SELECT vid::BIGINT AS vid,
              CAST(floor(cos(phi)*sin(theta)*1e4+0.5) AS BIGINT) AS xq,
              CAST(floor(sin(phi)*sin(theta)*1e4+0.5) AS BIGINT) AS yq,
              CAST(floor(cos(theta)*1e4+0.5) AS BIGINT) AS zq
            FROM ph
            """,
        # independence number: exhaustive 2^16 subset enumeration —
        # a subset is independent iff no (non-loop) edge has both
        # endpoints inside; alpha = max popcount, count ties
        "independence_number_li": """
            WITH arcs AS (
              SELECT DISTINCT l_orderkey % 16 AS u, l_partkey % 16 AS v
              FROM lineitem
              WHERE (l_orderkey * 131 + l_partkey * 17) % 1009 = 0
                AND l_orderkey % 16 <> l_partkey % 16
            ),
            indep AS (
              SELECT m.range AS m, bit_count(m.range) AS k
              FROM range(0, 65536) m
              WHERE NOT EXISTS (
                SELECT 1 FROM arcs a
                WHERE (m.range >> a.u) & 1 = 1
                  AND (m.range >> a.v) & 1 = 1)
            ),
            mx AS (SELECT max(k) AS alpha FROM indep)
            SELECT mx.alpha::BIGINT AS alpha,
                   (SELECT count(*) FROM indep WHERE k = mx.alpha)::BIGINT
                     AS n_max_sets
            FROM mx
            """,
        # connected-triple count: a 3-set is connected iff at least
        # two of its three vertex pairs are (undirected) edges
        "motifs_no_li": """
            WITH und AS (
              SELECT DISTINCT least(l_orderkey % 16, l_partkey % 16) AS a,
                     greatest(l_orderkey % 16, l_partkey % 16) AS b
              FROM lineitem
              WHERE (l_orderkey * 131 + l_partkey * 17) % 1009 = 0
                AND l_orderkey % 16 <> l_partkey % 16
            )
            SELECT count(*)::BIGINT AS n_connected_triples
            FROM range(0, 16) x, range(0, 16) y, range(0, 16) z
            WHERE x.range < y.range AND y.range < z.range
              AND ((EXISTS (SELECT 1 FROM und WHERE a = x.range
                              AND b = y.range)::INT
                  + EXISTS (SELECT 1 FROM und WHERE a = x.range
                              AND b = z.range)::INT
                  + EXISTS (SELECT 1 FROM und WHERE a = y.range
                              AND b = z.range)::INT) >= 2)
            """,
        # community-comparison metrics between the degree-rank
        # partition and vid%7: confusion matrix by GROUP BY, entropy /
        # mutual information with ln, rand identities per the
        # reference's derivation; floats quantized, split-join exact
        "compare_communities_li": f"""
            WITH u AS (
              SELECT DISTINCT least(l_orderkey % {NV}, l_partkey % {NV})
                       AS a,
                     greatest(l_orderkey % {NV}, l_partkey % {NV}) AS b
              FROM lineitem
              WHERE l_orderkey % {NV} <> l_partkey % {NV}
            ),
            nb AS (SELECT a AS vid FROM u UNION ALL SELECT b FROM u),
            degc AS (SELECT vid, count(*) AS d FROM nb GROUP BY vid),
            mem AS (
              SELECT v.range AS vid,
                     dense_rank() OVER (
                       ORDER BY coalesce(degc.d, 0)) - 1 AS g1,
                     v.range % 7 AS g2
              FROM range(0, {NV}) v
              LEFT JOIN degc ON degc.vid = v.range
            ),
            conf AS (
              SELECT g1, g2, count(*) AS c FROM mem GROUP BY g1, g2
            ),
            rs AS (SELECT g1, sum(c) AS c FROM conf GROUP BY g1),
            cs AS (SELECT g2, sum(c) AS c FROM conf GROUP BY g2),
            nn AS (SELECT CAST({NV} AS DOUBLE) AS n),
            ent AS (
              SELECT
                (SELECT -sum((c / n) * ln(c / n)) FROM rs, nn) AS h1,
                (SELECT -sum((c / n) * ln(c / n)) FROM cs, nn) AS h2,
                (SELECT sum((conf.c / n) * (ln(conf.c / n)
                        - ln(rs.c / n) - ln(cs.c / n)))
                 FROM conf
                 JOIN rs ON rs.g1 = conf.g1
                 JOIN cs ON cs.g2 = conf.g2, nn) AS mi,
                (SELECT sum((c / n) * (c - 1.0) / (n - 1.0))
                 FROM conf, nn) AS rterm,
                (SELECT sum((c / n) * (c - 1.0) / (n - 1.0))
                 FROM rs, nn) AS f1,
                (SELECT sum((c / n) * (c - 1.0) / (n - 1.0))
                 FROM cs, nn) AS f2,
                (SELECT {NV} - sum(mx) FROM (
                   SELECT max(c) AS mx FROM conf GROUP BY g1)) AS d12,
                (SELECT {NV} - sum(mx) FROM (
                   SELECT max(c) AS mx FROM conf GROUP BY g2)) AS d21
            )
            SELECT
              CAST(floor((h1 + h2 - 2 * mi) * 1e6 + 0.5) AS BIGINT)
                AS vi_q,
              CAST(floor((2 * mi / (h1 + h2)) * 1e6 + 0.5) AS BIGINT)
                AS nmi_q,
              CAST(floor((1.0 + 2 * rterm - f1 - f2) * 1e6 + 0.5)
                AS BIGINT) AS rand_q,
              CAST(floor((((1.0 + 2 * rterm - f1 - f2)
                           - (f1 * f2 + (1 - f1) * (1 - f2)))
                          / (1.0 - (f1 * f2 + (1 - f1) * (1 - f2))))
                         * 1e6 + 0.5) AS BIGINT) AS ari_q,
              CAST(d12 + d21 AS BIGINT) AS sj
            FROM ent
            """,
        # Erdos-Gallai inequality terms over the support's sorted
        # degree sequence (window cumsum + per-k tail of min(d, k))
        "erdos_gallai_li": f"""
            WITH u AS (
              SELECT DISTINCT least(l_orderkey % {NV}, l_partkey % {NV})
                       AS a,
                     greatest(l_orderkey % {NV}, l_partkey % {NV}) AS b
              FROM lineitem
              WHERE l_orderkey % {NV} <> l_partkey % {NV}
            ),
            nb AS (SELECT a AS vid FROM u UNION ALL SELECT b FROM u),
            degc AS (SELECT vid, count(*) AS d FROM nb GROUP BY vid),
            alldeg AS (
              SELECT v.range AS vid, coalesce(degc.d, 0) AS d
              FROM range(0, {NV}) v
              LEFT JOIN degc ON degc.vid = v.range
            ),
            sorted_ AS (
              SELECT d,
                     row_number() OVER (ORDER BY d DESC, vid) AS k
              FROM alldeg
            ),
            pre AS (
              SELECT k, sum(d) OVER (ORDER BY k) AS lhs FROM sorted_
            ),
            tail AS (
              -- DuckDB least() SKIPS nulls, so guard the unmatched
              -- LEFT JOIN row explicitly
              SELECT a.k,
                     coalesce(sum(CASE WHEN x.k IS NULL THEN NULL
                                       ELSE least(x.d, a.k) END),
                              0) AS t
              FROM sorted_ a LEFT JOIN sorted_ x ON x.k > a.k
              GROUP BY a.k
            )
            SELECT CAST(pre.k AS BIGINT) AS k,
                   CAST(pre.lhs AS BIGINT) AS lhs,
                   CAST(pre.k * (pre.k - 1) + tail.t AS BIGINT) AS rhs
            FROM pre JOIN tail ON tail.k = pre.k
            """,
        # centralization family: per-vertex score CTEs (same bodies as
        # closeness_li / betweenness_li / eigenvector_li) wrapped with
        # n*max - sum over the star-graph theoretical maxima
        "centralization_closeness_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 16
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            agg AS (
              SELECT s, count(*) AS reach, sum(d) AS dsum
              FROM dist GROUP BY s
            ),
            clo AS (
              SELECT ({NV2} - 1.0)
                     / (CAST(agg.dsum AS DOUBLE)
                        + {NV2}.0 * ({NV2} - agg.reach)) AS c
              FROM v JOIN agg ON agg.s = v.vid
            )
            SELECT CAST(floor(
              ({NV2} * (SELECT max(c) FROM clo)
               - (SELECT sum(c) FROM clo))
              / (({NV2} - 1.0) * (1.0 - 1.0 / {NV2})) * 1e6 + 0.5
            ) AS BIGINT) AS rq
            """,
        "centralization_betweenness_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            v AS (SELECT range AS vid FROM range(0, {NV2})),
            r(s, t, d) AS (
              SELECT vid, vid, 0 FROM v
              UNION
              SELECT r.s, de.dst, r.d + 1 FROM r JOIN de ON de.src = r.t
              WHERE r.d < 12
            ),
            dist AS (SELECT s, t, min(d) AS d FROM r GROUP BY s, t),
            wk(s, t, k, c) AS (
              SELECT vid, vid, 0, CAST(1 AS DOUBLE) FROM v
              UNION ALL
              SELECT w.s, de.dst, w.k + 1, sum(w.c)
              FROM wk w JOIN de ON de.src = w.t
              WHERE w.k < 8
              GROUP BY w.s, de.dst, w.k + 1
            ),
            sp AS (
              SELECT dist.s, dist.t, dist.d, wk.c
              FROM dist JOIN wk ON wk.s = dist.s AND wk.t = dist.t
                               AND wk.k = dist.d
            ),
            bcv AS (
              SELECT round(coalesce(b.bc, 0), 6) AS bc
              FROM v LEFT JOIN (
                SELECT sv.t AS vid, sum(sv.c * vt.c / st.c) AS bc
                FROM sp sv
                JOIN sp vt ON vt.s = sv.t AND vt.s <> vt.t
                JOIN sp st ON st.s = sv.s AND st.t = vt.t
                          AND st.d = sv.d + vt.d
                WHERE sv.s <> sv.t
                GROUP BY sv.t
              ) b USING (vid)
            )
            SELECT CAST(floor(
              ({NV2} * (SELECT max(bc) FROM bcv)
               - (SELECT sum(bc) FROM bcv))
              / (({NV2} - 1.0) * ({NV2} - 1.0) * ({NV2} - 2.0))
              * 1e6 + 0.5
            ) AS BIGINT) AS rq
            """,
        "centralization_evcent_li": f"""
            WITH RECURSIVE e AS {_LI_E},
            v AS {_LI_V},
            ev(v, x, iter) AS (
              SELECT vid, CAST(1.0 AS DOUBLE), 0 FROM v
              UNION ALL
              SELECT m.v, sum(m.x) / 64.0, min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, p.x AS x, p.iter AS iter
                FROM ev p JOIN e ON e.src = p.v
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < 60
            ),
            fin AS (SELECT v, x FROM ev WHERE iter = 60),
            sc AS (
              SELECT coalesce(fin.x, 0) / (SELECT max(x) FROM fin)
                       AS ev
              FROM v LEFT JOIN fin ON fin.v = v.vid
            )
            SELECT CAST(floor(
              ({NV} * (SELECT max(ev) FROM sc)
               - (SELECT sum(ev) FROM sc))
              / ({NV} - 1.0) * 1e6 + 0.5
            ) AS BIGINT) AS rq
            """,
        # MCS replay: recursive chain over the numbered-set bitmask;
        # at each step pick the unnumbered vertex with the most
        # numbered neighbors (popcount of mask & nbmask), tie -> min
        # id (the pinned rule); first pick gets rank n-1
        "mcs_li": """
            WITH RECURSIVE u AS MATERIALIZED (
              SELECT DISTINCT least(l_orderkey % 12, l_partkey % 12)
                       AS a,
                     greatest(l_orderkey % 12, l_partkey % 12) AS b
              FROM lineitem
              WHERE l_orderkey % 12 <> l_partkey % 12
                AND (l_orderkey * 131 + l_partkey * 17) % 487 = 0
            ),
            nbm AS MATERIALIZED (
              SELECT v.range AS v,
                     coalesce((SELECT sum(DISTINCT 1::BIGINT << x.o)
                               FROM (SELECT b AS o FROM u
                                     WHERE a = v.range
                                     UNION
                                     SELECT a FROM u
                                     WHERE b = v.range) x), 0) AS m
              FROM range(0, 12) v
            ),
            mcs(i, mask, v) AS (
              SELECT 11, 0::BIGINT, 0
              UNION ALL
              SELECT r.i - 1,
                     r.mask | (1::BIGINT << r.v),
                     (SELECT c.v FROM nbm c
                      WHERE (((r.mask | (1::BIGINT << r.v))
                              >> c.v) & 1) = 0
                      ORDER BY bit_count(
                        ((r.mask | (1::BIGINT << r.v)) & c.m)::BIGINT
                      ) DESC, c.v
                      LIMIT 1)
              FROM mcs r WHERE r.i > 0
            )
            SELECT CAST(v AS BIGINT) AS vid, CAST(i AS BIGINT) AS alpha FROM mcs
            """,
        "assortativity_nominal_li": f"""
            WITH e AS (
              SELECT (l_orderkey % {NV}) % 7 AS ft,
                     (l_partkey % {NV}) % 7 AS tt
              FROM lineitem
            ),
            m AS (SELECT count(*) AS m FROM e),
            ab AS (
              SELECT t.range AS ty,
                     (SELECT count(*) FROM e WHERE e.ft = t.range)
                       AS ai,
                     (SELECT count(*) FROM e WHERE e.tt = t.range)
                       AS bi,
                     (SELECT count(*) FROM e
                      WHERE e.ft = t.range AND e.tt = t.range) AS eii
              FROM range(0, 7) t
            ),
            s AS (
              SELECT
                sum((CAST(ai AS DOUBLE) / (SELECT m FROM m))
                    * (CAST(bi AS DOUBLE) / (SELECT m FROM m)))
                  AS sumaibi,
                sum(CAST(eii AS DOUBLE) / (SELECT m FROM m)) AS sumeii
              FROM ab
            )
            SELECT CAST(floor(
                     (sumeii - sumaibi) / (1.0 - sumaibi) * 1e6 + 0.5
                   ) AS BIGINT) AS rq
            FROM s
            """,
        "transitive_closure_li": f"""
            WITH RECURSIVE de AS (
              SELECT DISTINCT l_orderkey % {NV2} AS src,
                              l_partkey % {NV2} AS dst FROM lineitem
            ),
            r(s, t) AS (
              SELECT src, dst FROM de WHERE src <> dst
              UNION
              SELECT r.s, de.dst FROM r JOIN de ON de.src = r.t
              WHERE r.s <> de.dst
            )
            SELECT s AS src, t AS dst FROM r
            """,
        # u dominates v iff v is unreachable from the root with u
        # removed; idom(v) = the dominator with the largest dominator
        # set (the chain is totally ordered); root -1, unreachable -2
        "dominator_tree_li": """
            WITH arcs AS MATERIALIZED (
              SELECT DISTINCT l_orderkey % 40 AS u, l_partkey % 40 AS v
              FROM lineitem
              WHERE (l_orderkey * 7 + l_partkey * 3) % 31 = 0
            ),
            reach0 AS MATERIALIZED (
              WITH RECURSIVE r(x) AS (
                SELECT 0
                UNION
                SELECT a.v FROM r JOIN arcs a ON a.u = r.x
              ) SELECT x FROM r
            ),
            -- reach(c, x): reachable from root avoiding candidate c
            avoid AS MATERIALIZED (
              WITH RECURSIVE r(c, x) AS (
                SELECT cand.range, 0 FROM range(1, 40) cand
                UNION
                SELECT r.c, a.v FROM r JOIN arcs a ON a.u = r.x
                WHERE a.v <> r.c AND a.u <> r.c
              ) SELECT c, x FROM r
            ),
            dom AS MATERIALIZED (
              -- c dominates v (v reachable, v<>c, v<>0): v not in
              -- avoid(c); plus root dominates every reachable v
              SELECT c.range AS c, v.x AS v
              FROM range(1, 40) c, reach0 v
              WHERE v.x <> 0 AND v.x <> c.range
                AND NOT EXISTS (SELECT 1 FROM avoid
                                WHERE avoid.c = c.range
                                  AND avoid.x = v.x)
              UNION ALL
              SELECT 0, v.x FROM reach0 v WHERE v.x <> 0
            ),
            domsz AS (
              SELECT c, count(*) AS sz FROM dom GROUP BY c
            ),
            idom AS (
              SELECT d.v AS vid,
                     -- the dominator chain of v is totally ordered
                     -- and |dom(u)| strictly DECREASES toward v, so
                     -- idom = the dominator with the smallest set
                     (SELECT d2.c FROM dom d2
                      JOIN domsz z ON z.c = d2.c
                      WHERE d2.v = d.v
                      ORDER BY z.sz ASC, d2.c LIMIT 1) AS i
              FROM (SELECT DISTINCT v FROM dom) d
            )
            SELECT v.range AS vid,
                   CAST(CASE
                     WHEN v.range = 0 THEN -1
                     WHEN NOT EXISTS (SELECT 1 FROM reach0
                                      WHERE reach0.x = v.range)
                       THEN -2
                     ELSE (SELECT i FROM idom WHERE idom.vid = v.range)
                   END AS BIGINT) AS idom
            FROM range(0, 40) v
            """,
        # all minimal (s,t) edge cuts: enumerate candidate partitions
        # X (s in X, t not in X); X valid iff X = forward closure of s
        # over non-cut arcs AND every cut-arc head reaches t backward
        # over non-cut arcs (Provan-Shier characterization)
        "all_st_cuts_li": """
            WITH arcs AS MATERIALIZED (
              SELECT DISTINCT l_orderkey % 10 AS u, l_partkey % 10 AS v
              FROM lineitem
              WHERE l_orderkey % 10 <> l_partkey % 10
                AND (l_orderkey * 131 + l_partkey * 17) % 1321 = 0
            ),
            subs AS MATERIALIZED (
              SELECT m.range AS m FROM range(0, 1024) m
              WHERE (m.range & 1) = 1 AND ((m.range >> 9) & 1) = 0
            ),
            fwd AS MATERIALIZED (
              WITH RECURSIVE r(m, x) AS (
                SELECT m, 0 FROM subs
                UNION
                SELECT r.m, a.v FROM r JOIN arcs a ON a.u = r.x
                WHERE NOT (((r.m >> a.u) & 1) = 1
                           AND ((r.m >> a.v) & 1) = 0)
              ) SELECT m, x FROM r
            ),
            okx AS MATERIALIZED (
              SELECT s.m FROM subs s
              WHERE (SELECT count(*) FROM fwd WHERE fwd.m = s.m)
                    = bit_count(s.m::BIGINT)
                AND NOT EXISTS (
                  SELECT 1 FROM fwd
                  WHERE fwd.m = s.m AND ((s.m >> fwd.x) & 1) = 0)
            ),
            bwd AS MATERIALIZED (
              WITH RECURSIVE r(m, x) AS (
                SELECT m, 9 FROM okx
                UNION
                SELECT r.m, a.u FROM r JOIN arcs a ON a.v = r.x
                WHERE NOT (((r.m >> a.u) & 1) = 1
                           AND ((r.m >> a.v) & 1) = 0)
              ) SELECT m, x FROM r
            ),
            final AS MATERIALIZED (
              SELECT m FROM okx
              WHERE NOT EXISTS (
                SELECT 1 FROM arcs a
                WHERE ((okx.m >> a.u) & 1) = 1
                  AND ((okx.m >> a.v) & 1) = 0
                  AND NOT EXISTS (SELECT 1 FROM bwd
                                  WHERE bwd.m = okx.m AND bwd.x = a.v))
            ),
            ranked AS (
              SELECT m, row_number() OVER (ORDER BY m) - 1 AS cid
              FROM final
            )
            SELECT r.cid, 0::BIGINT AS kind, v.range AS a,
                   -1::BIGINT AS b
            FROM ranked r, range(0, 10) v
            WHERE ((r.m >> v.range) & 1) = 1
            UNION ALL
            SELECT r.cid, 1::BIGINT, a.u, a.v
            FROM ranked r JOIN arcs a
              ON ((r.m >> a.u) & 1) = 1 AND ((r.m >> a.v) & 1) = 0
            """,
        # minimum-size separators: brute-force all 2^12 subsets in
        # SQL; reachability from the lowest outside vertex via a
        # UNION-dedup recursive CTE; S separates iff the closure
        # misses an outside vertex; keep the minimum popcount
        "min_separators_li": """
            WITH e AS MATERIALIZED (
              SELECT DISTINCT least(l_orderkey % 12, l_partkey % 12)
                       AS a,
                     greatest(l_orderkey % 12, l_partkey % 12) AS b
              FROM lineitem
              WHERE l_orderkey % 12 <> l_partkey % 12
                AND (l_orderkey * 131 + l_partkey * 17) % 487 = 0
            ),
            und AS MATERIALIZED (
              SELECT a AS v, b AS u FROM e UNION SELECT b, a FROM e
            ),
            seed AS MATERIALIZED (
              SELECT m.range AS m,
                     (SELECT min(v.range) FROM range(0, 12) v
                      WHERE ((m.range >> v.range) & 1) = 0) AS s0
              FROM range(0, 4096) m
            ),
            rec AS MATERIALIZED (
              WITH RECURSIVE reach(m, v) AS (
                SELECT m, s0 FROM seed WHERE s0 IS NOT NULL
                UNION
                SELECT r.m, n.u FROM reach r
                JOIN und n ON n.v = r.v
                WHERE ((r.m >> n.u) & 1) = 0
              )
              SELECT m, count(*) AS cnt FROM reach GROUP BY m
            ),
            sep AS MATERIALIZED (
              SELECT s.m FROM seed s JOIN rec ON rec.m = s.m
              WHERE rec.cnt < 12 - bit_count(s.m::BIGINT)
              UNION ALL
              -- reference special case (src/separators.c:692): a
              -- COMPLETE graph (conn = n-1) returns the n sets
              -- V \ {i}, though none of them disconnects anything.
              -- The sf0.1 sample hits all 66 pairs.
              SELECT xor(4095, 1 << i.range)::BIGINT FROM range(0, 12) i
              WHERE (SELECT count(*) FROM e) = 66
            ),
            mins AS (
              SELECT m FROM sep
              WHERE bit_count(m::BIGINT) =
                    (SELECT min(bit_count(m::BIGINT)) FROM sep)
            ),
            ranked AS (
              SELECT m, row_number() OVER (ORDER BY m) - 1 AS sid
              FROM mins
            )
            SELECT r.sid, v.range AS vid
            FROM ranked r, range(0, 12) v
            WHERE ((r.m >> v.range) & 1) = 1
            """,
        # golden oracle: the reference's own published output for the
        # Moody-White graph (examples/simple/cohesive_blocks.out)
        "cohesive_blocks_li": """
            WITH b(block, coh, parent) AS (
              VALUES (0, 1, -1), (1, 2, 0), (2, 2, 0), (3, 5, 1),
                     (4, 3, 2)
            ),
            m(block, vid) AS (
              SELECT 0, range FROM range(0, 23)
              UNION ALL
              SELECT 1, unnest([0,1,2,3,4,5,6,16,17,18,19,20,21,22])
              UNION ALL
              SELECT 2, unnest([6,7,8,9,10,11,12,13,14,15])
              UNION ALL
              SELECT 3, unnest([0,1,2,3,4,5,6])
              UNION ALL
              SELECT 4, unnest([6,7,10,13])
            )
            SELECT CAST(m.block AS BIGINT) AS block,
                   CAST(m.vid AS BIGINT) AS vid,
                   CAST(b.coh AS BIGINT) AS cohesion,
                   CAST(b.parent AS BIGINT) AS parent
            FROM m JOIN b USING (block)
            """,
        # graphlet candidate basis on the planted nested-weight
        # fixture: exhaustive subset enumeration per threshold; a
        # basis clique = maximal clique of G>=t whose min internal
        # weight is exactly t (equals the recursion output on this
        # fixture — proven in tests/test_graphlets.py)
        "graphlets_li": """
            WITH e AS MATERIALIZED (
              SELECT i.range AS a, j.range AS b,
                     CASE WHEN j.range < 3 THEN
                          CASE WHEN i.range = 0 AND j.range = 1
                               THEN 3 ELSE 2 END
                          ELSE 1 END AS w
              FROM range(0, 6) i, range(0, 6) j
              WHERE i.range < j.range
              UNION ALL SELECT 6, 7, 1
            ),
            thr AS (SELECT unnest([1, 2, 3]) AS t),
            cl AS MATERIALIZED (
              SELECT s.range AS m, th.t FROM range(3, 256) s, thr th
              WHERE bit_count(s.range::BIGINT) >= 2
                AND NOT EXISTS (
                  SELECT 1 FROM range(0, 8) i, range(0, 8) j
                  WHERE i.range < j.range
                    AND ((s.range >> i.range) & 1) = 1
                    AND ((s.range >> j.range) & 1) = 1
                    AND NOT EXISTS (
                      SELECT 1 FROM e
                      WHERE e.a = i.range AND e.b = j.range
                        AND e.w >= th.t))
            ),
            maxcl AS MATERIALIZED (
              SELECT m, t FROM cl
              WHERE NOT EXISTS (
                SELECT 1 FROM range(0, 8) v
                WHERE ((cl.m >> v.range) & 1) = 0
                  AND NOT EXISTS (
                    SELECT 1 FROM range(0, 8) u
                    WHERE ((cl.m >> u.range) & 1) = 1
                      AND NOT EXISTS (
                        SELECT 1 FROM e
                        WHERE e.a = least(u.range, v.range)
                          AND e.b = greatest(u.range, v.range)
                          AND e.w >= cl.t)))
            ),
            basis AS (
              SELECT m, t FROM maxcl
              WHERE t = (SELECT min(e.w) FROM e
                         WHERE ((maxcl.m >> e.a) & 1) = 1
                           AND ((maxcl.m >> e.b) & 1) = 1)
            ),
            ranked AS (
              SELECT m, t,
                     row_number() OVER (
                       ORDER BY t, bit_count(m::BIGINT), m) - 1 AS cid
              FROM basis
            )
            SELECT r.cid, v.range AS vid, CAST(r.t AS BIGINT) AS thr
            FROM ranked r, range(0, 8) v
            WHERE ((r.m >> v.range) & 1) = 1
            """,
        "ase_li": """
            SELECT i.range AS u, j.range AS w,
                   CAST(CASE WHEN i.range // 10 = j.range // 10
                        THEN 9 ELSE 0 END AS BIGINT) AS g
            FROM range(0, 60) i, range(0, 60) j
            WHERE i.range <= j.range
            UNION ALL
            SELECT -1 AS u, range AS w, 9::BIGINT AS g FROM range(0, 6)
            """,
        # EXACT maximal-clique histogram oracle on the 5000-vertex
        # sparse graph: enumerate cliques of size 2..5 via k-way
        # self-joins on the canonical edge table; a clique is maximal
        # iff no vertex is adjacent to every member.  If the data ever
        # grew a 6-clique the Ray side would emit a size-6 row the
        # oracle lacks -> loud row-count FAIL, not silent truncation.
        "cliques_li": """
            WITH E AS (SELECT l_orderkey % 5000 AS src,
                              l_partkey % 5000 AS dst FROM lineitem),
            u AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                         greatest(src, dst) AS b
                  FROM E WHERE src <> dst),
            nb AS MATERIALIZED (SELECT a AS v, b AS w FROM u
                   UNION ALL SELECT b, a FROM u),
            c3 AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c
                   FROM u e1
                   JOIN u e2 ON e2.a = e1.b
                   JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
            c4 AS MATERIALIZED (SELECT c3.a, c3.b, c3.c, x1.b AS d
                   FROM c3
                   JOIN u x1 ON x1.a = c3.c
                   JOIN u x2 ON x2.a = c3.b AND x2.b = x1.b
                   JOIN u x3 ON x3.a = c3.a AND x3.b = x1.b),
            c5 AS MATERIALIZED (SELECT c4.a, c4.b, c4.c, c4.d, y1.b AS e
                   FROM c4
                   JOIN u y1 ON y1.a = c4.d
                   JOIN u y2 ON y2.a = c4.c AND y2.b = y1.b
                   JOIN u y3 ON y3.a = c4.b AND y3.b = y1.b
                   JOIN u y4 ON y4.a = c4.a AND y4.b = y1.b),
            c6 AS MATERIALIZED (SELECT c5.a, c5.b, c5.c, c5.d, c5.e,
                          z1.b AS f
                   FROM c5
                   JOIN u z1 ON z1.a = c5.e
                   JOIN u z2 ON z2.a = c5.d AND z2.b = z1.b
                   JOIN u z3 ON z3.a = c5.c AND z3.b = z1.b
                   JOIN u z4 ON z4.a = c5.b AND z4.b = z1.b
                   JOIN u z5 ON z5.a = c5.a AND z5.b = z1.b),
            -- extension sets (k-cliques with a common neighbor),
            -- computed as hash joins + GROUP BY (a correlated NOT
            -- EXISTS per clique row nested-loops and times out)
            ext2 AS (SELECT DISTINCT u.a, u.b
                     FROM u JOIN nb x ON x.v = u.a
                            JOIN nb y ON y.v = u.b AND y.w = x.w),
            ext3 AS (SELECT DISTINCT c3.a, c3.b, c3.c
                     FROM c3 JOIN nb x ON x.v = c3.a
                             JOIN nb y ON y.v = c3.b AND y.w = x.w
                             JOIN nb z ON z.v = c3.c AND z.w = x.w),
            ext4 AS (SELECT DISTINCT c4.a, c4.b, c4.c, c4.d
                     FROM c4 JOIN nb x ON x.v = c4.a
                             JOIN nb y ON y.v = c4.b AND y.w = x.w
                             JOIN nb z ON z.v = c4.c AND z.w = x.w
                             JOIN nb q ON q.v = c4.d AND q.w = x.w),
            ext5 AS (SELECT DISTINCT c5.a, c5.b, c5.c, c5.d, c5.e
                     FROM c5 JOIN nb x ON x.v = c5.a
                             JOIN nb y ON y.v = c5.b AND y.w = x.w
                             JOIN nb z ON z.v = c5.c AND z.w = x.w
                             JOIN nb q ON q.v = c5.d AND q.w = x.w
                             JOIN nb r ON r.v = c5.e AND r.w = x.w),
            ext6 AS (SELECT DISTINCT c6.a, c6.b, c6.c, c6.d, c6.e, c6.f
                     FROM c6 JOIN nb x ON x.v = c6.a
                             JOIN nb y ON y.v = c6.b AND y.w = x.w
                             JOIN nb z ON z.v = c6.c AND z.w = x.w
                             JOIN nb q ON q.v = c6.d AND q.w = x.w
                             JOIN nb r ON r.v = c6.e AND r.w = x.w
                             JOIN nb t ON t.v = c6.f AND t.w = x.w),
            m2 AS (SELECT (SELECT count(*) FROM u)
                        - (SELECT count(*) FROM ext2) AS n),
            m3 AS (SELECT (SELECT count(*) FROM c3)
                        - (SELECT count(*) FROM ext3) AS n),
            m4 AS (SELECT (SELECT count(*) FROM c4)
                        - (SELECT count(*) FROM ext4) AS n),
            m5 AS (SELECT (SELECT count(*) FROM c5)
                        - (SELECT count(*) FROM ext5) AS n),
            m6 AS (SELECT (SELECT count(*) FROM c6)
                        - (SELECT count(*) FROM ext6) AS n)
            -- enumerates maximal cliques up to size 6 (the derived
            -- graph's clique number at the gate scales; networkx
            -- confirms max clique 6 at sf0.1, 4 at sf0.01)
            SELECT * FROM (
              SELECT 2::BIGINT AS size, (SELECT n FROM m2) AS count
              UNION ALL SELECT 3, (SELECT n FROM m3)
              UNION ALL SELECT 4, (SELECT n FROM m4)
              UNION ALL SELECT 5, (SELECT n FROM m5)
              UNION ALL SELECT 6, (SELECT n FROM m6)
            ) WHERE count > 0 ORDER BY size
            """,
        # EXACT maximal-clique oracle: enumerate all 2^16 vertex
        # subsets; m is a clique iff it contains no non-edge pair,
        # maximal iff every outside vertex misses some member
        "cliques_small_li": """
            WITH e AS (
              SELECT DISTINCT least(l_orderkey % 16, l_partkey % 16) AS a,
                     greatest(l_orderkey % 16, l_partkey % 16) AS b
              FROM lineitem
              WHERE (l_orderkey * 131 + l_partkey * 17) % 1009 = 0
                AND l_orderkey % 16 <> l_partkey % 16
            ),
            nonedge AS (
              SELECT i.range AS a, j.range AS b
              FROM range(0, 16) i, range(0, 16) j
              WHERE i.range < j.range
                AND NOT EXISTS (SELECT 1 FROM e
                                WHERE e.a = i.range AND e.b = j.range)
            ),
            cliq AS (
              SELECT range AS m FROM range(1, 65536)
              WHERE NOT EXISTS (
                SELECT 1 FROM nonedge ne
                WHERE ((range >> ne.a) & 1) = 1
                  AND ((range >> ne.b) & 1) = 1)
            ),
            maxl AS (
              SELECT m FROM cliq
              WHERE NOT EXISTS (
                SELECT 1 FROM range(0, 16) v
                WHERE ((cliq.m >> v.range) & 1) = 0
                  AND NOT EXISTS (
                    SELECT 1 FROM nonedge ne
                    WHERE (ne.a = v.range AND ((cliq.m >> ne.b) & 1) = 1)
                       OR (ne.b = v.range AND ((cliq.m >> ne.a) & 1) = 1))
              )
            ),
            sized AS (
              SELECT (SELECT count(*) FROM range(0, 16) r
                      WHERE ((maxl.m >> r.range) & 1) = 1) AS size
              FROM maxl
            )
            SELECT size, count(*) AS cnt FROM sized
            WHERE size >= 2 GROUP BY size ORDER BY size
            """,
        "linegraph_degree_li": f"""
            WITH e AS (SELECT DISTINCT src, dst FROM {_LI_E} t),
            r AS (SELECT src, dst,
                         ROW_NUMBER() OVER (ORDER BY src, dst) - 1 AS eid
                  FROM e)
            SELECT a.eid AS eid, count(*) AS ldeg
            FROM r a JOIN r b ON a.dst = b.src
            GROUP BY a.eid ORDER BY a.eid
            """,
        "contract_vertices_li": f"""
            SELECT DISTINCT src % 97 AS src, dst % 97 AS dst
            FROM {_LI_E} t WHERE (src % 97) <> (dst % 97)
            ORDER BY src, dst
            """,
        "neighborhood_size_li": f"""
            WITH e AS (SELECT DISTINCT src, dst FROM {_LI_E} t),
            seeds AS (SELECT range AS vid FROM range(0, 50)),
            n0 AS (SELECT vid, vid AS w FROM seeds),
            n1 AS (SELECT s.vid, e.dst AS w FROM seeds s
                   JOIN e ON e.src = s.vid),
            n2 AS (SELECT n1.vid, e.dst AS w FROM n1
                   JOIN e ON e.src = n1.w),
            allw AS (SELECT * FROM n0 UNION SELECT * FROM n1
                     UNION SELECT * FROM n2)
            SELECT vid, count(*) AS nsize FROM allw
            GROUP BY vid ORDER BY vid
            """,
        "motifs3_li": f"""
            WITH sup AS (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM {_LI_E} t WHERE src <> dst
            ),
            deg AS (
              SELECT v, count(*) AS d FROM (
                SELECT a AS v FROM sup UNION ALL SELECT b AS v FROM sup
              ) GROUP BY v
            ),
            tri AS (
              SELECT count(*) AS t FROM sup e1
              JOIN sup e2 ON e1.b = e2.a
              JOIN sup e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT
              CAST((SELECT sum(d * (d - 1) / 2) FROM deg)
                   - 3 * (SELECT t FROM tri) AS BIGINT) AS path,
              CAST((SELECT t FROM tri) AS BIGINT) AS triangle
            """,
        "graph_scalars_li": f"""
            WITH e AS (SELECT * FROM {_LI_E} t),
            ne AS (SELECT count(*) AS m FROM e)
            SELECT
              round(CAST((SELECT m FROM ne) AS DOUBLE)
                    / ({NV}::DOUBLE * ({NV} - 1)), 9) AS density,
              CAST((SELECT max(c) FROM (SELECT count(*) AS c FROM e
                    GROUP BY src)) AS BIGINT) AS max_out,
              CAST((SELECT max(c) FROM (SELECT count(*) AS c FROM e
                    GROUP BY dst)) AS BIGINT) AS max_in
            """,
        "is_mutual_li": f"""
            WITH e AS (SELECT DISTINCT src, dst FROM {_LI_E} t)
            SELECT a.src, a.dst,
                   CAST(CASE WHEN b.src IS NULL THEN 0 ELSE 1 END
                        AS BIGINT) AS mutual
            FROM e a LEFT JOIN e b
              ON a.src = b.dst AND a.dst = b.src
            ORDER BY a.src, a.dst
            """,
        "to_undirected_li": f"""
            SELECT DISTINCT least(src, dst) AS src,
                   greatest(src, dst) AS dst
            FROM {_LI_E} t ORDER BY src, dst
            """,
        "compose_li": f"""
            WITH e AS (SELECT * FROM {_LI_E} t)
            SELECT DISTINCT a.src AS src, b.src AS dst
            FROM e a JOIN e b ON a.dst = b.dst
            ORDER BY src, dst
            """,
        # full window-function replay of revolver_d's delta timeline
        # (src/revolver_cit.c:115-253): every ntk mutation is a
        # (citing-node, class, sign) row; per-class running sums give
        # ntk at estimate time (query rows at phase -1 sort before
        # same-body deltas); normfact pairs ==1-opens with ==0-closes
        # plus the final nonzero flush, measured in cumulative-event
        # units.  Quantized half-up 1e-9 both sides.
        "revolver_d_li": """
            WITH ev0 AS (
              SELECT GREATEST(l_orderkey % 400, l_partkey % 400) AS cit,
                     LEAST(l_orderkey % 400, l_partkey % 400) AS tow
              FROM lineitem
              WHERE l_orderkey % 400 <> l_partkey % 400
            ),
            ev AS (
              SELECT cit, tow,
                     ROW_NUMBER() OVER (ORDER BY cit, tow) AS evseq
              FROM ev0
            ),
            e2 AS (
              SELECT cit, tow, evseq,
                ROW_NUMBER() OVER (PARTITION BY tow ORDER BY evseq) - 1
                  AS cum,
                ROW_NUMBER() OVER (PARTITION BY tow ORDER BY evseq) -
                ROW_NUMBER() OVER (PARTITION BY tow, cit ORDER BY evseq)
                  AS prior
              FROM ev
            ),
            mx AS (SELECT MAX(cum) + 1 AS maxind FROM e2),
            ecnt AS (SELECT cit AS c, COUNT(*) AS cnt FROM ev GROUP BY 1),
            ecum AS (
              SELECT r.range AS c,
                     COALESCE(SUM(ecnt.cnt) OVER (ORDER BY r.range),
                              0)::DOUBLE AS ee
              FROM range(0, 400) r LEFT JOIN ecnt ON ecnt.c = r.range
            ),
            etot AS (SELECT COUNT(*)::DOUBLE AS ee FROM ev),
            deltas AS (
              SELECT cit AS cd, cum AS cls, -1 AS sg, 0 AS ph,
                     evseq * 2 AS ord FROM e2
              UNION ALL
              SELECT cit, cum + 1, 1, 0, evseq * 2 + 1 FROM e2
              UNION ALL
              SELECT r.range, 0, 1, 1, 0 FROM range(0, 400) r
            ),
            runs AS (
              SELECT cd, cls, sg, ph, ord,
                SUM(sg) OVER (PARTITION BY cls ORDER BY cd, ph, ord
                              ROWS UNBOUNDED PRECEDING) AS cnt
              FROM deltas
            ),
            flags AS (
              SELECT cls, cd, sg, ph, ord FROM runs
              WHERE (sg > 0 AND cnt = 1) OR (sg < 0 AND cnt = 0)
            ),
            fjoin AS (
              SELECT f.cls, f.sg, e.ee,
                LAG(e.ee) OVER (PARTITION BY f.cls
                                ORDER BY f.cd, f.ph, f.ord) AS preve,
                ROW_NUMBER() OVER (PARTITION BY f.cls
                  ORDER BY f.cd DESC, f.ph DESC, f.ord DESC) AS rdesc
              FROM flags f JOIN ecum e ON e.c = f.cd
            ),
            spans AS (
              SELECT cls,
                SUM(CASE WHEN sg < 0 THEN ee - preve ELSE 0 END) AS nf0,
                MAX(CASE WHEN rdesc = 1 AND sg > 0 THEN 1 ELSE 0 END)
                  AS open_end,
                MAX(CASE WHEN rdesc = 1 AND sg > 0 THEN ee END) AS laste
              FROM fjoin GROUP BY cls
            ),
            nf AS (
              SELECT cls, nf0 + CASE WHEN open_end = 1
                THEN (SELECT ee FROM etot) - laste ELSE 0 END AS nfv
              FROM spans
            ),
            qrows AS (
              -- estimate-time class: same-batch earlier copies are
              -- NOT yet counted in the in-degree (the reference's
              -- estimate loop reads indegree before the updates)
              SELECT cit AS cd, prior AS cls, 0 AS sg, -1 AS ph,
                     evseq AS ord FROM e2
            ),
            run2 AS (
              SELECT cd, cls, sg, ph, ord,
                SUM(sg) OVER (PARTITION BY cls ORDER BY cd, ph, ord
                              ROWS UNBOUNDED PRECEDING) AS cnt
              FROM (SELECT * FROM deltas UNION ALL SELECT * FROM qrows)
            ),
            agg AS (
              SELECT cls, SUM(1.0 / cnt) AS sxk, COUNT(*) AS cites
              FROM run2 WHERE ph = -1 GROUP BY cls
            ),
            classes AS (
              -- every class 0..maxind occurs in the delta stream (a
              -- vertex reaching degree d passed through all d' < d)
              SELECT DISTINCT cls FROM deltas
            ),
            kern AS (
              SELECT c.cls, COALESCE(a.cites, 0) AS cites,
                CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 0.0
                     ELSE COALESCE(a.sxk, 0) / n.nfv END AS k0,
                CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 1.0
                     ELSE n.nfv END AS nfv
              FROM classes c
              LEFT JOIN agg a ON a.cls = c.cls
              LEFT JOIN nf n ON n.cls = c.cls
            ),
            tot AS (SELECT SUM(k0) AS s FROM kern)
            SELECT cls AS deg,
                   FLOOR(k0 / (SELECT s FROM tot) * 1e9 + 0.5) / 1e9
                     AS kernel,
                   cites::BIGINT AS cites,
                   FLOOR(nfv * 1e9 + 0.5) / 1e9 AS norm
            FROM kern ORDER BY deg
            """,
        # the (category, in-degree) matrix kernel: the d timeline with
        # a static cited-category dimension (cats[v] = v mod 4).
        "revolver_de_li": """
            WITH ev0 AS (
              SELECT GREATEST(l_orderkey % 400, l_partkey % 400) AS cit,
                     LEAST(l_orderkey % 400, l_partkey % 400) AS tow
              FROM lineitem WHERE l_orderkey % 400 <> l_partkey % 400
            ),
            ev AS (SELECT cit, tow, ROW_NUMBER() OVER (ORDER BY cit, tow) AS evseq FROM ev0),
            e2 AS (
              SELECT cit, tow, evseq, (tow % 4) AS cat,
                ROW_NUMBER() OVER (PARTITION BY tow ORDER BY evseq) - 1 AS cum,
                ROW_NUMBER() OVER (PARTITION BY tow ORDER BY evseq)
                - ROW_NUMBER() OVER (PARTITION BY tow, cit ORDER BY evseq) AS prior
              FROM ev
            ),
            mx AS (SELECT MAX(cum) + 1 AS maxind FROM e2),
            d2 AS (
              SELECT cit AS cd, cat * (SELECT maxind + 1 FROM mx) + cum AS cls, -1 AS sgn, 0 AS ph,
                     evseq, 0 AS half FROM e2
              UNION ALL
              SELECT cit, cat * (SELECT maxind + 1 FROM mx) + cum + 1, 1, 0, evseq, 1 FROM e2
              UNION ALL
              SELECT r.range, (r.range % 4) * (SELECT maxind + 1 FROM mx), 1, 1, 0, 0
              FROM range(0, 400) r
            ),
            runs AS (
              SELECT cd, cls, sgn, ph, evseq, half,
                SUM(sgn) OVER (PARTITION BY cls ORDER BY cd, ph, evseq, half
                               ROWS UNBOUNDED PRECEDING) AS cnt
              FROM d2
            ),
            ecnt AS (SELECT cit AS c, COUNT(*) AS cnt FROM ev GROUP BY 1),
            ecum AS (
              SELECT r.range AS c,
                     COALESCE(SUM(ecnt.cnt) OVER (ORDER BY r.range), 0)::DOUBLE AS ee
              FROM range(0, 400) r LEFT JOIN ecnt ON ecnt.c = r.range
            ),
            etot AS (SELECT COUNT(*)::DOUBLE AS ee FROM ev),
            flags AS (
              SELECT cls, cd, sgn, ph, evseq, half FROM runs
              WHERE (sgn > 0 AND cnt = 1) OR (sgn < 0 AND cnt = 0)
            ),
            fjoin AS (
              SELECT f.cls, f.sgn, e.ee,
                LAG(e.ee) OVER (PARTITION BY f.cls
                  ORDER BY f.cd, f.ph, f.evseq, f.half) AS preve,
                ROW_NUMBER() OVER (PARTITION BY f.cls
                  ORDER BY f.cd DESC, f.ph DESC, f.evseq DESC, f.half DESC) AS rdesc
              FROM flags f JOIN ecum e ON e.c = f.cd
            ),
            spans AS (
              SELECT cls,
                SUM(CASE WHEN sgn < 0 THEN ee - preve ELSE 0 END) AS nf0,
                MAX(CASE WHEN rdesc = 1 AND sgn > 0 THEN 1 ELSE 0 END) AS open_end,
                MAX(CASE WHEN rdesc = 1 AND sgn > 0 THEN ee END) AS laste
              FROM fjoin GROUP BY cls
            ),
            nf AS (
              SELECT cls, nf0 + CASE WHEN open_end = 1
                THEN (SELECT ee FROM etot) - laste ELSE 0 END AS nfv
              FROM spans
            ),
            run2 AS (
              SELECT cd, cls, sgn, ph,
                SUM(sgn) OVER (PARTITION BY cls ORDER BY cd, ph, evseq, half
                               ROWS UNBOUNDED PRECEDING) AS cnt
              FROM (SELECT * FROM d2
                    UNION ALL
                    SELECT cit, cat * (SELECT maxind + 1 FROM mx) + prior, 0, -1, evseq, 0 FROM e2)
            ),
            agg AS (
              SELECT cls, SUM(1.0 / cnt) AS sxk, COUNT(*) AS cites
              FROM run2 WHERE ph = -1 GROUP BY cls
            ),
            grid AS (
              SELECT c.range AS cat, d.deg, c.range * (SELECT maxind + 1 FROM mx) + d.deg AS cls
              FROM range(0, 4) c
              CROSS JOIN (SELECT DISTINCT cum + 1 AS deg FROM e2
                          UNION SELECT 0) d
            ),
            tot AS (
              SELECT SUM(CASE WHEN COALESCE(n2.nfv, 0) = 0 THEN 0.0
                              ELSE COALESCE(a2.sxk, 0) / n2.nfv END) AS s
              FROM (SELECT DISTINCT cls FROM d2) c2
              LEFT JOIN agg a2 ON a2.cls = c2.cls
              LEFT JOIN nf n2 ON n2.cls = c2.cls
            )
            SELECT g.cat::BIGINT AS cat, g.deg::BIGINT AS deg,
              FLOOR(CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 0.0
                    ELSE COALESCE(a.sxk, 0) / n.nfv END
                    / (SELECT s FROM tot) * 1e9 + 0.5) / 1e9 AS kernel,
              COALESCE(a.cites, 0)::BIGINT AS cites,
              FLOOR(CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 1.0
                    ELSE n.nfv END * 1e9 + 0.5) / 1e9 AS norm
            FROM grid g
            LEFT JOIN agg a ON a.cls = g.cls
            LEFT JOIN nf n ON n.cls = g.cls
            ORDER BY cat, deg
            """,
        # the (in-degree, age-bin) matrix kernel: the same delta
        # timeline plus the closed-form aging schedule — a vertex
        # crosses age bin k-1 -> k at body v + binwidth*k - 1 carrying
        # its CURRENT degree, fetched with an ASOF join against the
        # per-target cumulative citation counts.
        "revolver_ad_li": """
            WITH ev0 AS (
              SELECT GREATEST(l_orderkey % 400, l_partkey % 400) AS cit,
                     LEAST(l_orderkey % 400, l_partkey % 400) AS tow
              FROM lineitem
              WHERE l_orderkey % 400 <> l_partkey % 400
            ),
            ev AS (
              SELECT cit, tow,
                     ROW_NUMBER() OVER (ORDER BY cit, tow) AS evseq
              FROM ev0
            ),
            e2 AS (
              SELECT cit, tow, evseq,
                ROW_NUMBER() OVER (PARTITION BY tow ORDER BY evseq) - 1
                  AS cum,
                ROW_NUMBER() OVER (PARTITION BY tow ORDER BY evseq)
                - ROW_NUMBER() OVER (PARTITION BY tow, cit
                                     ORDER BY evseq) AS prior
              FROM ev
            ),
            cross0 AS (
              SELECT r.range AS v, kk.range AS k,
                     r.range + 81 * kk.range - 1 AS cd
              FROM range(0, 400) r CROSS JOIN range(1, 6) kk
              WHERE r.range + 81 * kk.range - 1 BETWEEN 1 AND 399
            ),
            tgt AS (
              SELECT tow, cit, MAX(cum) + 1 AS deg_after
              FROM e2 GROUP BY tow, cit
            ),
            crossings AS (
              SELECT c.v, c.k, c.cd, COALESCE(t.deg_after, 0) AS deg
              FROM cross0 c ASOF LEFT JOIN tgt t
                ON t.tow = c.v AND t.cit <= c.cd
            ),
            d2 AS (
              SELECT cit AS cd,
                     cum * 6 + ((cit - tow) // 81) AS cls,
                     -1 AS sgn, 0 AS ph, CAST(0 AS BIGINT) AS k,
                     evseq, 0 AS half
              FROM e2
              UNION ALL
              SELECT cit, (cum + 1) * 6 + ((cit - tow) // 81),
                     1, 0, 0, evseq, 1 FROM e2
              UNION ALL
              SELECT r.range, 0, 1, 1, 0, 0, 0 FROM range(0, 400) r
              UNION ALL
              SELECT cd, deg * 6 + (k - 1), -1, 3, k, v, 0
              FROM crossings
              UNION ALL
              SELECT cd, deg * 6 + k, 1, 3, k, v, 1
              FROM crossings
            ),
            runs AS (
              SELECT cd, cls, sgn, ph, k, evseq, half,
                SUM(sgn) OVER (PARTITION BY cls
                  ORDER BY cd, ph, k, evseq, half
                  ROWS UNBOUNDED PRECEDING) AS cnt
              FROM d2
            ),
            ecnt AS (
              SELECT cit AS c, COUNT(*) AS cnt FROM ev GROUP BY 1
            ),
            ecum AS (
              SELECT r.range AS c,
                COALESCE(SUM(ecnt.cnt) OVER (ORDER BY r.range),
                         0)::DOUBLE AS ee
              FROM range(0, 400) r LEFT JOIN ecnt ON ecnt.c = r.range
            ),
            etot AS (SELECT COUNT(*)::DOUBLE AS ee FROM ev),
            flags AS (
              SELECT cls, cd, sgn, ph, k, evseq, half FROM runs
              WHERE (sgn > 0 AND cnt = 1) OR (sgn < 0 AND cnt = 0)
            ),
            fjoin AS (
              SELECT f.cls, f.sgn, e.ee,
                LAG(e.ee) OVER (PARTITION BY f.cls
                  ORDER BY f.cd, f.ph, f.k, f.evseq, f.half) AS preve,
                ROW_NUMBER() OVER (PARTITION BY f.cls
                  ORDER BY f.cd DESC, f.ph DESC, f.k DESC,
                           f.evseq DESC, f.half DESC) AS rdesc
              FROM flags f JOIN ecum e ON e.c = f.cd
            ),
            spans AS (
              SELECT cls,
                SUM(CASE WHEN sgn < 0 THEN ee - preve ELSE 0 END)
                  AS nf0,
                MAX(CASE WHEN rdesc = 1 AND sgn > 0 THEN 1 ELSE 0 END)
                  AS open_end,
                MAX(CASE WHEN rdesc = 1 AND sgn > 0 THEN ee END)
                  AS laste
              FROM fjoin GROUP BY cls
            ),
            nf AS (
              SELECT cls, nf0 + CASE WHEN open_end = 1
                THEN (SELECT ee FROM etot) - laste ELSE 0 END AS nfv
              FROM spans
            ),
            run2 AS (
              SELECT cd, cls, sgn, ph,
                SUM(sgn) OVER (PARTITION BY cls
                  ORDER BY cd, ph, k, evseq, half
                  ROWS UNBOUNDED PRECEDING) AS cnt
              FROM (SELECT * FROM d2
                    UNION ALL
                    SELECT cit,
                           prior * 6 + ((cit - tow) // 81),
                           0, -1, 0, evseq, 0 FROM e2)
            ),
            agg AS (
              SELECT cls, SUM(1.0 / cnt) AS sxk, COUNT(*) AS cites
              FROM run2 WHERE ph = -1 GROUP BY cls
            ),
            grid AS (
              SELECT d.deg, a.range AS age,
                     d.deg * 6 + a.range AS cls
              FROM (SELECT DISTINCT cum + 1 AS deg FROM e2
                    UNION SELECT 0) d
              CROSS JOIN range(0, 5) a
            ),
            tot AS (
              SELECT SUM(CASE WHEN COALESCE(n2.nfv, 0) = 0 THEN 0.0
                          ELSE COALESCE(a2.sxk, 0) / n2.nfv END) AS s
              FROM (SELECT DISTINCT cls FROM d2) c2
              LEFT JOIN agg a2 ON a2.cls = c2.cls
              LEFT JOIN nf n2 ON n2.cls = c2.cls
            )
            SELECT g.deg::BIGINT AS deg, g.age::BIGINT AS age,
              FLOOR(CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 0.0
                    ELSE COALESCE(a.sxk, 0) / n.nfv END
                    / (SELECT s FROM tot) * 1e9 + 0.5) / 1e9 AS kernel,
              COALESCE(a.cites, 0)::BIGINT AS cites,
              FLOOR(CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 1.0
                    ELSE n.nfv END * 1e9 + 0.5) / 1e9 AS norm
            FROM grid g
            LEFT JOIN agg a ON a.cls = g.cls
            LEFT JOIN nf n ON n.cls = g.cls
            ORDER BY deg, age
            """,
        # citation-lag kernel over a sparser 3000-vertex derivation
        # (lag bins actually populate): the same delta-timeline SQL
        # with LAG/MAX-window lastcit flavors and the k-major crossing
        # schedule, per edge copy like the reference's rescan.
        "revolver_l_li": """
            WITH ev0 AS (
              SELECT GREATEST(l_orderkey % 3000, l_partkey % 3000) AS cit,
                     LEAST(l_orderkey % 3000, l_partkey % 3000) AS tow
              FROM lineitem
              WHERE l_orderkey % 3000 <> l_partkey % 3000
            ),
            ev AS (
              SELECT cit, tow,
                     ROW_NUMBER() OVER (ORDER BY cit, tow) AS evseq
              FROM ev0
            ),
            lagw AS (
              SELECT cit, tow, evseq,
                MAX(cit) OVER (PARTITION BY tow ORDER BY cit
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_node,
                LAG(cit) OVER (PARTITION BY tow ORDER BY evseq)
                  AS prev_any,
                MIN(cit) OVER (PARTITION BY tow ORDER BY cit
                  RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                  AS nxt_node
              FROM ev
            ),
            lagcls AS (
              SELECT cit, tow, evseq,
                CASE WHEN prev_node IS NULL THEN 24
                     ELSE LEAST((cit + 1 - (prev_node + 1)) // 126,
                                25) END AS est_cls,
                CASE WHEN prev_any IS NULL THEN 24
                     ELSE LEAST((cit + 1 - (prev_any + 1)) // 126,
                                25) END AS upd_old,
                nxt_node
              FROM lagw
            ),
            -- class deltas: citations (ph 0), arrivals into the
            -- never-cited class (ph 1), lag-bin crossings k-1 -> k at
            -- body cit + binwidth*k - 1 unless re-cited first (ph 3,
            -- k-major within a body, per edge copy like the
            -- reference's rescan)
            d2 AS (
              SELECT cit AS cd, upd_old AS cls, -1 AS sgn, 0 AS ph,
                     CAST(0 AS BIGINT) AS k, evseq, 0 AS half
              FROM lagcls
              UNION ALL
              SELECT cit, 0, 1, 0, 0, evseq, 1 FROM lagcls
              UNION ALL
              SELECT r.range, 24, 1, 1, 0, 0, 0 FROM range(0, 3000) r
              UNION ALL
              SELECT l.cit + 126 * kk.range - 1, kk.range - 1, -1, 3,
                     kk.range, l.evseq, 0
              FROM lagcls l CROSS JOIN range(1, 25) kk
              WHERE l.cit + 126 * kk.range - 1 <= 2999
                AND (l.nxt_node IS NULL
                     OR l.cit + 126 * kk.range - 1 < l.nxt_node)
              UNION ALL
              SELECT l.cit + 126 * kk.range - 1, kk.range, 1, 3,
                     kk.range, l.evseq, 1
              FROM lagcls l CROSS JOIN range(1, 25) kk
              WHERE l.cit + 126 * kk.range - 1 <= 2999
                AND (l.nxt_node IS NULL
                     OR l.cit + 126 * kk.range - 1 < l.nxt_node)
            ),
            runs AS (
              SELECT cd, cls, sgn, ph, k, evseq, half,
                SUM(sgn) OVER (PARTITION BY cls
                  ORDER BY cd, ph, k, evseq, half
                  ROWS UNBOUNDED PRECEDING) AS cnt
              FROM d2
            ),
            ecnt AS (SELECT cit AS c, COUNT(*) AS cnt FROM ev GROUP BY 1),
            ecum AS (
              SELECT r.range AS c,
                COALESCE(SUM(ecnt.cnt) OVER (ORDER BY r.range),
                         0)::DOUBLE AS ee
              FROM range(0, 3000) r LEFT JOIN ecnt ON ecnt.c = r.range
            ),
            etot AS (SELECT COUNT(*)::DOUBLE AS ee FROM ev),
            flags AS (
              SELECT cls, cd, sgn, ph, k, evseq, half FROM runs
              WHERE (sgn > 0 AND cnt = 1) OR (sgn < 0 AND cnt = 0)
            ),
            fjoin AS (
              SELECT f.cls, f.sgn, e.ee,
                LAG(e.ee) OVER (PARTITION BY f.cls
                  ORDER BY f.cd, f.ph, f.k, f.evseq, f.half) AS preve,
                ROW_NUMBER() OVER (PARTITION BY f.cls
                  ORDER BY f.cd DESC, f.ph DESC, f.k DESC,
                           f.evseq DESC, f.half DESC) AS rdesc
              FROM flags f JOIN ecum e ON e.c = f.cd
            ),
            spans AS (
              SELECT cls,
                SUM(CASE WHEN sgn < 0 THEN ee - preve ELSE 0 END) AS nf0
              FROM fjoin GROUP BY cls
            ),
            -- exact final flush (the l rescan quirk can leave a class
            -- count NEGATIVE with no trailing open): flush whenever
            -- the final running count is nonzero, from the last
            -- open's counter (0 if the class never opened)
            fincnt AS (SELECT cls, SUM(sgn) AS fc FROM d2 GROUP BY cls),
            lastopen AS (
              SELECT cls, ee FROM (
                SELECT f.cls, e.ee,
                  ROW_NUMBER() OVER (PARTITION BY f.cls
                    ORDER BY f.cd DESC, f.ph DESC, f.k DESC,
                             f.evseq DESC, f.half DESC) AS rn
                FROM flags f JOIN ecum e ON e.c = f.cd
                WHERE f.sgn > 0) q WHERE rn = 1
            ),
            nf AS (
              SELECT fi.cls,
                COALESCE(s.nf0, 0) + CASE WHEN fi.fc <> 0
                  THEN (SELECT ee FROM etot) - COALESCE(lo.ee, 0)
                  ELSE 0 END AS nfv
              FROM fincnt fi
              LEFT JOIN spans s ON s.cls = fi.cls
              LEFT JOIN lastopen lo ON lo.cls = fi.cls
            ),
            run2 AS (
              SELECT cd, cls, sgn, ph,
                SUM(sgn) OVER (PARTITION BY cls
                  ORDER BY cd, ph, k, evseq, half
                  ROWS UNBOUNDED PRECEDING) AS cnt
              FROM (SELECT * FROM d2
                    UNION ALL
                    SELECT cit, est_cls, 0, -1, 0, evseq, 0 FROM lagcls)
            ),
            agg AS (
              SELECT cls, SUM(1.0 / cnt) AS sxk, COUNT(*) AS cites
              FROM run2 WHERE ph = -1 GROUP BY cls
            ),
            classes AS (SELECT range AS cls FROM range(0, 25)),
            tot AS (
              SELECT SUM(CASE WHEN COALESCE(n2.nfv, 0) = 0 THEN 0.0
                              ELSE COALESCE(a2.sxk, 0) / n2.nfv END) AS s
              FROM (SELECT DISTINCT cls FROM d2) c2
              LEFT JOIN agg a2 ON a2.cls = c2.cls
              LEFT JOIN nf n2 ON n2.cls = c2.cls
            )
            SELECT c.cls::BIGINT AS lag,
              FLOOR(CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 0.0
                    ELSE COALESCE(a.sxk, 0) / n.nfv END
                    / (SELECT s FROM tot) * 1e9 + 0.5) / 1e9 AS kernel,
              COALESCE(a.cites, 0)::BIGINT AS cites,
              FLOOR(CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 1.0
                    ELSE n.nfv END * 1e9 + 0.5) / 1e9 AS norm
            FROM classes c
            LEFT JOIN agg a ON a.cls = c.cls
            LEFT JOIN nf n ON n.cls = c.cls
            ORDER BY lag
            """,
        # deprecated power method, old=True form: additive (1-d), no
        # normalization -> a plain linear recursion like pagerank_li;
        # out-degree excludes loops (clamped to 1) while the gather
        # keeps loop contributions
        "pagerank_old_li": f"""
            WITH RECURSIVE e AS (SELECT * FROM {_LI_E} t),
            v AS (SELECT range AS vid FROM range(0, {NV})),
            deg AS (
              SELECT v.vid,
                GREATEST(COALESCE(d.c, 0), 1)::DOUBLE AS outdeg
              FROM v LEFT JOIN (
                SELECT src AS vid, count(*) AS c FROM e
                WHERE src <> dst GROUP BY src
              ) d ON d.vid = v.vid
            ),
            pr(v, score, outdeg, iter) AS (
              SELECT d.vid, CAST(0.15 AS DOUBLE), d.outdeg, 0 FROM deg d
              UNION ALL
              SELECT m.v, 0.85 * COALESCE(sum(m.val), 0) + 0.15,
                     any_value(m.od), min(m.iter) + 1
              FROM (
                SELECT e.dst AS v, p.score / p.outdeg AS val,
                       CAST(NULL AS DOUBLE) AS od, p.iter AS iter
                FROM pr p JOIN e ON e.src = p.v
                UNION ALL
                SELECT p.v, CAST(NULL AS DOUBLE), p.outdeg, p.iter
                FROM pr p
              ) m
              GROUP BY m.v
              HAVING min(m.iter) < 40
            )
            SELECT v AS vid, round(score, 6) AS score FROM pr
            WHERE iter = 40 ORDER BY vid
            """,
        "is_multiple_li": f"""
            SELECT src, dst,
                   ROW_NUMBER() OVER (PARTITION BY src, dst) - 1
                     AS dup_rank
            FROM {_LI_E} t
            ORDER BY src, dst, dup_rank
            """,
        "list_triangles_li": f"""
            WITH und AS (
              SELECT DISTINCT LEAST(src, dst) AS a,
                              GREATEST(src, dst) AS b
              FROM {_LI_E} t WHERE src <> dst
            )
            SELECT e1.a AS a, e1.b AS b, e2.b AS c
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
            ORDER BY a, b, c
            """,
        # the windowed-in-degree kernel: same delta-timeline SQL as
        # revolver_d_li plus the per-target trailing-window expiry
        # stream (citations leave the class 25 citing nodes later).
        "revolver_r_li": """
            WITH ev0 AS (
              SELECT GREATEST(l_orderkey % 400, l_partkey % 400) AS cit,
                     LEAST(l_orderkey % 400, l_partkey % 400) AS tow
              FROM lineitem
              WHERE l_orderkey % 400 <> l_partkey % 400
            ),
            ev AS (
              SELECT cit, tow,
                     ROW_NUMBER() OVER (ORDER BY cit, tow) AS evseq
              FROM ev0
            ),
            -- per-target windowed-count stream: +1 at the citation,
            -- -1 when it leaves the trailing window (phase 2, after
            -- the arrival like the reference's update order)
            tr0 AS (
              SELECT cit AS cd, tow, 1 AS sg, 0 AS ph, evseq FROM ev
              UNION ALL
              SELECT cit + 25, tow, -1, 2, evseq FROM ev
              WHERE cit + 25 <= 399
            ),
            tr AS (
              SELECT cd, tow, sg, ph, evseq,
                SUM(sg) OVER (PARTITION BY tow ORDER BY cd, ph, evseq
                              ROWS UNBOUNDED PRECEDING) AS val_after
              FROM tr0
            ),
            qr AS (
              SELECT cd, tow, sg, ph, evseq,
                SUM(sg) OVER (PARTITION BY tow ORDER BY cd, ph, evseq
                              ROWS UNBOUNDED PRECEDING) AS val
              FROM (SELECT * FROM tr0
                    UNION ALL
                    SELECT cit, tow, 0, -1, evseq FROM ev)
            ),
            est AS (
              SELECT cd AS cit, tow, evseq, val AS cls
              FROM qr WHERE ph = -1
            ),
            mx AS (SELECT MAX(val_after) AS maxind FROM tr),
            d2 AS (
              SELECT cd, (val_after - sg) AS cls, -1 AS sgn, ph, tow,
                     evseq, 0 AS half FROM tr
              UNION ALL
              SELECT cd, val_after, 1, ph, tow, evseq, 1 FROM tr
              UNION ALL
              SELECT r.range, 0, 1, 1, -1, 0, 0 FROM range(0, 400) r
            ),
            runs AS (
              SELECT cd, cls, sgn, ph, tow, evseq, half,
                SUM(sgn) OVER (PARTITION BY cls
                               ORDER BY cd, ph, tow, evseq, half
                               ROWS UNBOUNDED PRECEDING) AS cnt
              FROM d2
            ),
            ecnt AS (SELECT cit AS c, COUNT(*) AS cnt FROM ev GROUP BY 1),
            ecum AS (
              SELECT r.range AS c,
                     COALESCE(SUM(ecnt.cnt) OVER (ORDER BY r.range),
                              0)::DOUBLE AS ee
              FROM range(0, 400) r LEFT JOIN ecnt ON ecnt.c = r.range
            ),
            etot AS (SELECT COUNT(*)::DOUBLE AS ee FROM ev),
            flags AS (
              SELECT cls, cd, sgn, ph, tow, evseq, half FROM runs
              WHERE (sgn > 0 AND cnt = 1) OR (sgn < 0 AND cnt = 0)
            ),
            fjoin AS (
              SELECT f.cls, f.sgn, e.ee,
                LAG(e.ee) OVER (PARTITION BY f.cls
                  ORDER BY f.cd, f.ph, f.tow, f.evseq, f.half) AS preve,
                ROW_NUMBER() OVER (PARTITION BY f.cls
                  ORDER BY f.cd DESC, f.ph DESC, f.tow DESC,
                           f.evseq DESC, f.half DESC) AS rdesc
              FROM flags f JOIN ecum e ON e.c = f.cd
            ),
            spans AS (
              SELECT cls,
                SUM(CASE WHEN sgn < 0 THEN ee - preve ELSE 0 END) AS nf0,
                MAX(CASE WHEN rdesc = 1 AND sgn > 0 THEN 1 ELSE 0 END)
                  AS open_end,
                MAX(CASE WHEN rdesc = 1 AND sgn > 0 THEN ee END) AS laste
              FROM fjoin GROUP BY cls
            ),
            nf AS (
              SELECT cls, nf0 + CASE WHEN open_end = 1
                THEN (SELECT ee FROM etot) - laste ELSE 0 END AS nfv
              FROM spans
            ),
            run2 AS (
              SELECT cd, cls, sgn, ph,
                SUM(sgn) OVER (PARTITION BY cls
                               ORDER BY cd, ph, tow, evseq, half
                               ROWS UNBOUNDED PRECEDING) AS cnt
              FROM (SELECT * FROM d2
                    UNION ALL
                    SELECT cit, cls, 0, -1, tow, evseq, 0 FROM est)
            ),
            agg AS (
              SELECT cls, SUM(1.0 / cnt) AS sxk, COUNT(*) AS cites
              FROM run2 WHERE ph = -1 GROUP BY cls
            ),
            classes AS (
              SELECT DISTINCT cls FROM d2
              WHERE cls <= (SELECT maxind FROM mx)
            ),
            kern AS (
              SELECT c.cls, COALESCE(a.cites, 0) AS cites,
                CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 0.0
                     ELSE COALESCE(a.sxk, 0) / n.nfv END AS k0,
                CASE WHEN COALESCE(n.nfv, 0) = 0 THEN 1.0
                     ELSE n.nfv END AS nfv
              FROM classes c
              LEFT JOIN agg a ON a.cls = c.cls
              LEFT JOIN nf n ON n.cls = c.cls
            ),
            tot AS (SELECT SUM(k0) AS s FROM kern)
            SELECT cls::BIGINT AS wdeg,
                   FLOOR(k0 / (SELECT s FROM tot) * 1e9 + 0.5) / 1e9
                     AS kernel,
                   cites::BIGINT AS cites,
                   FLOOR(nfv * 1e9 + 0.5) / 1e9 AS norm
            FROM kern ORDER BY wdeg
            """,
        # revolver_e's bookkeeping is closed-form: ntk[cat] at a
        # citation from c counts arrived vertices v <= c-1 with
        # v % 5 == cat; exposure opens at the first arrival of the
        # category (vertex == cat) and never closes.
        "revolver_e_li": """
            WITH ev AS (
              SELECT GREATEST(l_orderkey % 400, l_partkey % 400) AS cit,
                     LEAST(l_orderkey % 400, l_partkey % 400) AS tow
              FROM lineitem
              WHERE l_orderkey % 400 <> l_partkey % 400
            ),
            ecnt AS (SELECT cit AS c, COUNT(*) AS cnt FROM ev GROUP BY 1),
            ecum AS (
              SELECT r.range AS c,
                     COALESCE(SUM(ecnt.cnt) OVER (ORDER BY r.range),
                              0)::DOUBLE AS ee
              FROM range(0, 400) r LEFT JOIN ecnt ON ecnt.c = r.range
            ),
            etot AS (SELECT COUNT(*)::DOUBLE AS ee FROM ev),
            est AS (
              SELECT tow % 5 AS cat,
                1.0 / (((cit - 1 - (tow % 5)) // 5) + 1) AS xk
              FROM ev
            ),
            agg AS (
              SELECT cat, SUM(xk) AS sxk, COUNT(*) AS cites
              FROM est GROUP BY cat
            ),
            nf AS (
              SELECT r.range AS cat,
                     (SELECT ee FROM etot) - e.ee AS nfv
              FROM range(0, 5) r JOIN ecum e ON e.c = r.range
            ),
            kern AS (
              SELECT n.cat, COALESCE(a.sxk, 0) / n.nfv AS k0,
                     COALESCE(a.cites, 0) AS cites, n.nfv
              FROM nf n LEFT JOIN agg a ON a.cat = n.cat
            ),
            tot AS (SELECT SUM(k0) AS s FROM kern)
            SELECT cat,
                   FLOOR(k0 / (SELECT s FROM tot) * 1e9 + 0.5) / 1e9
                     AS kernel,
                   cites::BIGINT AS cites,
                   FLOOR(nfv * 1e9 + 0.5) / 1e9 AS norm
            FROM kern ORDER BY cat
            """,
    }
