"""Graph construction: pages -> url-edge table -> dense-id edge table.

The reference ingests symbolic edge lists by pushing every name through
a trie that assigns dense ids in first-appearance order and stores the
name as the ``name`` attribute (NCOL reader, src/foreign.c:193-360).
A trie is inherently sequential, so the distributed rebuild assigns ids
by **global sorted order of the url** instead — deterministic,
reproducible from any partitioning, and order-independent (FIXTURES.md
§2 pins this choice).  The machinery is a sampled range-partitioned
sort + prefix-sum rank assignment (a distributed zipWithIndex):

    distinct urls --sample--> splitters --route--> P sorted partitions
    --counts--> driver prefix-sums P scalars --> each partition adds
    its offset

``simplify`` mirrors igraph_simplify
(src/structural_properties.c:2177-2344): drop self-loops and/or
collapse multi-edges (weights combined by sum, igraph's default
attr-combination for weight being user-chosen; we pin sum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    distinct,
    groupby_agg,
    hash_join,
    to_dataset,
)
from ..stages.extract import extracted_edges

_SAMPLES_PER_BLOCK = 256


# ---------------------------------------------------------------------------
# distributed sorted ranks (zipWithIndex)


@ray.remote
def _sample_col(tbl: pa.Table, col: str):
    v = tbl[col].to_numpy(zero_copy_only=False)
    if len(v) <= _SAMPLES_PER_BLOCK:
        return v
    idx = np.linspace(0, len(v) - 1, _SAMPLES_PER_BLOCK).astype(np.int64)
    return v[idx]


@ray.remote
def _route_range(tbl: pa.Table, col: str, splitters):
    v = tbl[col].to_numpy(zero_copy_only=False)
    part = np.searchsorted(splitters, v, side="right")
    order = np.argsort(part, kind="stable")
    t = tbl.take(pa.array(order))
    P = len(splitters) + 1
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    out = [t.slice(cuts[p], cuts[p + 1] - cuts[p]) for p in range(P)]
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _sort_count(cols, *parts: pa.Table):
    t = pa.concat_tables([p for p in parts if len(p)], promote_options="default") \
        if any(len(p) for p in parts) else parts[0]
    t = t.sort_by([(c, "ascending") for c in cols])
    return t, len(t)


@ray.remote
def _add_rank(pair, offset: int, rank_name: str):
    t, _ = pair
    return t.append_column(
        rank_name, pa.array(offset + np.arange(len(t), dtype=np.int64))
    )


def sorted_ranks(
    ds: Dataset | list,
    col: str | list[str],
    rank_name: str = "rank",
    P: int = DEFAULT_PARTITIONS,
    as_refs: bool = False,
):
    """Append the global ascending-sort rank of ``col`` (rows must be
    distinct on the key).  A list of columns ranks lexicographically:
    rows are range-routed on the FIRST column (rows sharing its value
    always land together, so the within-partition sort by all columns
    composes to a global lexicographic order) — no packed scalar keys,
    so 64-bit id pairs never collide."""
    cols = [col] if isinstance(col, str) else list(col)
    col = cols[0]
    refs = ds if isinstance(ds, list) else block_refs(ds)
    P = max(1, min(P, len(refs) * 4))
    samples = np.concatenate(ray.get([_sample_col.remote(r, col) for r in refs]))
    samples.sort(kind="stable")
    if len(samples) == 0 or P == 1:
        splitters = samples[:0]
    else:
        qs = np.linspace(0, len(samples) - 1, P + 1)[1:-1].astype(np.int64)
        splitters = np.unique(samples[qs])
    nparts = len(splitters) + 1
    shards: list[list] = [[] for _ in range(nparts)]
    for r in refs:
        outs = _route_range.options(
            num_returns=nparts if nparts > 1 else 1
        ).remote(r, col, splitters)
        outs = [outs] if nparts == 1 else outs
        for p, o in enumerate(outs):
            shards[p].append(o)
    pairs = [_sort_count.remote(cols, *shards[p]) for p in range(nparts)]
    counts = ray.get([_count_of.remote(p) for p in pairs])
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
    out = [
        _add_rank.remote(pairs[p], int(offsets[p]), rank_name)
        for p in range(nparts)
    ]
    return out if as_refs else to_dataset(out)


@ray.remote
def _count_of(pair):
    return pair[1]


# ---------------------------------------------------------------------------
# url dictionary + edge encoding


def vertex_dict(url_edges: Dataset | list, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """(vid, url) with vid = rank of url in global sorted order over the
    distinct urls appearing as source or destination."""

    def both_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": pa.concat_arrays(
                [t["src_url"].combine_chunks(), t["dst_url"].combine_chunks()]
            )}
        )

    refs = url_edges if isinstance(url_edges, list) else block_refs(url_edges)
    flat = [_project.remote(both_cols, r) for r in refs]
    uniq = distinct(flat, ["url"], P=P, as_refs=True)
    return sorted_ranks(uniq, "url", rank_name="vid", P=P)


@ray.remote
def _project(fn, tbl):
    return fn(tbl)


def encode_edges(
    url_edges: Dataset | list, vdict: Dataset | list, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(src_url, dst_url) -> (src, dst) via two partitioned hash joins
    against the dictionary (both sides large: no broadcast)."""
    vrefs = vdict if isinstance(vdict, list) else block_refs(vdict)
    e1 = hash_join(
        url_edges, [_rename.remote(r, {"url": "src_url", "vid": "src"}) for r in vrefs],
        keys=["src_url"], P=P, as_refs=True,
    )
    e2 = hash_join(
        e1, [_rename.remote(r, {"url": "dst_url", "vid": "dst"}) for r in vrefs],
        keys=["dst_url"], P=P, as_refs=True,
    )
    out = [_project.remote(lambda t: t.select(["src", "dst"]), r) for r in e2]
    return to_dataset(out)


@ray.remote
def _rename(tbl: pa.Table, mapping: dict):
    return tbl.rename_columns([mapping.get(c, c) for c in tbl.column_names])


def build_graph_tables(
    pages: Dataset, P: int = DEFAULT_PARTITIONS
) -> tuple[Dataset, Dataset]:
    """pages -> (vertices(vid,url), edges(src,dst)).  The full ingest
    chain of SURVEY.md §3.4: extract -> dictionary-encode -> edge table."""
    url_edges = block_refs(extracted_edges(pages))
    vd = block_refs(vertex_dict(url_edges, P=P))
    edges = encode_edges(url_edges, vd, P=P)
    return to_dataset(vd), edges


# ---------------------------------------------------------------------------
# simplify / degrees (Dataset-level operators)


def simplify(
    edges: Dataset | list,
    remove_loops: bool = True,
    remove_multiple: bool = True,
    weighted: bool = False,
    P: int = DEFAULT_PARTITIONS,
) -> Dataset:
    """igraph_simplify (src/structural_properties.c:2177): drop loops
    and/or collapse parallel edges; weights of collapsed edges sum."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    if remove_loops:
        refs = [
            _project.remote(
                lambda t: t.filter(pc.invert(pc.equal(t["src"], t["dst"]))), r
            )
            for r in refs
        ]
    if not remove_multiple:
        return to_dataset(refs)
    if weighted:
        return groupby_agg(refs, ["src", "dst"], [("weight", "sum", "weight")], P=P)
    return distinct(refs, ["src", "dst"], P=P)


def degrees(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid, out_deg, in_deg) for every vid in [0, n) — reference
    igraph_degree (src/type_indexededgelist.c:935-1010; loops counted
    once per direction here, i.e. OUT/IN modes)."""
    refs = edges if isinstance(edges, list) else block_refs(edges)

    def expand(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        return pa.table(
            {
                "vid": np.concatenate((src, dst)),
                "out_c": np.concatenate(
                    (np.ones(len(src), np.int64), np.zeros(len(dst), np.int64))
                ),
                "in_c": np.concatenate(
                    (np.zeros(len(src), np.int64), np.ones(len(dst), np.int64))
                ),
            }
        )

    base = rd.range(n).map_batches(
        lambda b: pa.table(
            {
                "vid": b["id"],
                "out_c": np.zeros(len(b["id"]), np.int64),
                "in_c": np.zeros(len(b["id"]), np.int64),
            }
        ),
        batch_format="numpy",
    )
    allrefs = [_project.remote(expand, r) for r in refs] + block_refs(base)
    return groupby_agg(
        allrefs,
        ["vid"],
        [("out_c", "sum", "out_deg"), ("in_c", "sum", "in_deg")],
        P=P,
    )
