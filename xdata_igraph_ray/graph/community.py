"""Multilevel (Louvain) community detection — reference
igraph_community_multilevel (src/community.c:2361+).

The reference sweeps vertices sequentially; the distributed variant
runs synchronous local-moving rounds (every vertex proposes its best
modularity-gain move; hash-parity damping breaks swap cycles —
Grappolo's trick), then contracts communities into a weighted
supergraph and recurses.  Each move round is three O(P)-ref
exchanges: Sigma_tot rebuild, neighbor-community messages, owner
Sigma lookups.  The driver sees only scalars and d-level mapping
Datasets.

Graph representation: symmetric arc list — every undirected edge
{a, b} appears as two arcs of weight w; a self-loop as ONE arc of
weight 2w (so arc strength == modularity degree k_i and contraction
composes: collapsing {a, b} inside one community turns its two arcs
into a single (c, c) arc of weight 2w automatically)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import block_refs, groupby_agg, hash_join, to_dataset
from .engine import GraphEngine


@ray.remote
def _symmetrize(t: pa.Table) -> pa.Table:
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    w = (
        t["weight"].to_numpy().astype(np.float64)
        if "weight" in t.column_names else np.ones(len(t))
    )
    loops = s == d
    ns = np.concatenate((s[~loops], d[~loops], s[loops]))
    nd = np.concatenate((d[~loops], s[~loops], s[loops]))
    nw = np.concatenate((w[~loops], w[~loops], 2 * w[loops]))
    return pa.table({"src": ns, "dst": nd, "weight": nw})


def _local_move(
    engine: GraphEngine, m_total: float, max_rounds: int,
    sync_rounds: int = 8, min_moves: int = 0,
) -> int:
    """Synchronous local-moving rounds.  ``min_moves``: stop once a
    full (undamped) round moves at most this many vertices — the
    reference's epsilon stop (src/community.c:2430 uses a modularity
    gain threshold); 0 = exact fixpoint.  Tail rounds that shuffle a
    handful of vertices cost a full superstep each and change
    modularity in the 4th decimal; the contraction levels above clean
    them up anyway."""
    shards = engine.shards
    ray.get([s.lou_init.remote() for s in shards])
    moved_any = 0
    for rnd in range(max_rounds):
        full = rnd < sync_rounds or rnd % 4 == 3
        sig_parts = [s.lou_sigma_split.remote() for s in shards]
        ray.get([
            shards[q].lou_sigma_collect.remote(*sig_parts)
            for q in range(engine.P)
        ])
        outs = engine.scatter("lou_scatter")
        queries = [
            shards[q].lou_candidates.remote(*engine.pieces(outs, q))
            for q in range(engine.P)
        ]
        answers = [
            shards[q].lou_sigma_answer.remote(*queries)
            for q in range(engine.P)
        ]
        moves = sum(ray.get([
            shards[q].lou_move.remote(
                m_total, None if full else rnd, *answers
            )
            for q in range(engine.P)
        ]))
        moved_any += moves
        if moves <= min_moves and full:
            break
    return moved_any


def _contract(edges_refs, mapping: Dataset, P: int):
    """Arcs through the (vid, comm) mapping (two joins) + grouped
    weight sums — scale path, no driver-side mapping array."""
    mrefs = block_refs(mapping)
    m_src = [
        _rename_map.remote(r, "src", "csrc") for r in mrefs
    ]
    m_dst = [
        _rename_map.remote(r, "dst", "cdst") for r in mrefs
    ]
    j1 = hash_join(edges_refs, m_src, keys=["src"], P=P, as_refs=True)
    j2 = hash_join(j1, m_dst, keys=["dst"], P=P, as_refs=True)
    proj = [
        _project_contract.remote(r) for r in j2
    ]
    return groupby_agg(
        proj, ["src", "dst"], [("weight", "sum", "weight")], P=P,
        as_refs=True,
    )


@ray.remote
def _rename_map(t: pa.Table, key: str, out: str) -> pa.Table:
    return pa.table({key: t["vid"], out: t["comm"]})


@ray.remote
def _project_contract(t: pa.Table) -> pa.Table:
    return pa.table(
        {"src": t["csrc"], "dst": t["cdst"], "weight": t["weight"]}
    )


def louvain(
    edges: Dataset | list,
    n: int,
    P: int = 8,
    max_levels: int = 10,
    max_rounds: int = 50,
) -> tuple[Dataset, int]:
    """(membership Dataset (vid, comm), community count).  Communities
    renumbered 0..k-1 by ascending min member vid."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    arcs = [_symmetrize.remote(r) for r in refs]
    mapping: Dataset | None = None  # original vid -> current comm
    n_cur = n
    for level in range(max_levels):
        # contracted supergraphs shrink fast; scale the shard count
        # down with them (each shard actor costs ~0.2 s to spawn and a
        # 6k-vertex level doesn't amortize 8 of them)
        P_lvl = max(2, min(P, n_cur // 4000)) if n_cur < 4000 * P else P
        eng = GraphEngine.from_edges(arcs, n=n_cur, P=P_lvl, weighted=True)
        # total und weight = sum of arc strengths / 2
        strengths = ray.get([
            s.degree_table.remote() for s in eng.shards
        ])
        m_total = sum(
            float(np.sum(t["out_strength"].to_numpy())) for t in strengths
        ) / 2.0
        _local_move(eng, m_total, max_rounds, min_moves=n_cur // 200)
        k = eng.renumber_labels("comm")
        lvl_map = eng.state_dataset(["comm"]).materialize()
        eng.shutdown()
        if mapping is None:
            mapping = lvl_map
        else:
            joined = hash_join(
                block_refs(mapping),
                [_rename_lvl.remote(r) for r in block_refs(lvl_map)],
                keys=["comm"], right_keys=["prev"], P=P, as_refs=True,
            )
            mapping = to_dataset([
                _project_mapping.remote(r) for r in joined
            ]).materialize()
        # a level that merged <0.1% of vertices has converged — more
        # levels would each pay an engine build to move a handful
        if k >= n_cur - max(1, n_cur // 1000):
            n_cur = k
            break
        arcs = _contract(arcs, lvl_map, P)
        n_cur = k
    return mapping, n_cur


@ray.remote
def _rename_lvl(t: pa.Table) -> pa.Table:
    return pa.table({"prev": t["vid"], "new_comm": t["comm"]})


@ray.remote
def _project_mapping(t: pa.Table) -> pa.Table:
    return pa.table({"vid": t["vid"], "comm": t["new_comm"]})
