"""Biconnectivity: articulation points, biconnected components and
bridges.

Reference: src/components.c — igraph_articulation_points (:553),
igraph_biconnected_components (:623).  The reference runs one
sequential DFS with lowpoint bookkeeping; a distributed engine cannot
replay a DFS stream (same pinned divergence as SURVEY §2.9's DFS
visitor), so this module uses the Tarjan-Vishkin reduction — the
public classic parallel algorithm (Tarjan & Vishkin, "An efficient
parallel biconnectivity algorithm", SIAM J. Comput. 14(4), 1985) that
was designed precisely to avoid DFS: the biconnected components of G
are the connected components of an auxiliary graph over G's
spanning-TREE edges.  It needs only

  (a) a rooted spanning forest                — multi-source BFS with
      min-(dist, parent) pointers on the engine (pbfs harness),
  (b) preorder numbers + subtree sizes        — level-synchronous
      bottom-up sums + one sibling-offset exchange + pointer-doubling
      ancestor prefix sums (O(log depth) joins),
  (c) per-subtree low/high extremes of nontree-edge reach —
      level-synchronous bottom-up min/max,

all as Arrow-table pipelines on the exchange layer, plus one WCC run
on the auxiliary edge table (the existing BSP kernel).  Aux-graph
rules (child id c stands for tree edge (parent(c), c)):

  rule 1: nontree edge (u, w), neither endpoint an ancestor of the
          other  ->  aux edge {u, w};
  rule 2: tree edge (v, x), v non-root, and subtree(x) escapes
          subtree(v) (low(x) < pre(v) or high(x) >= pre(v) + sz(v))
          ->  aux edge {v, x}.

Outputs match the reference's semantics: per-edge block ids (loops
and isolated vertices carry no block, components.c:660-664),
articulation point = vertex incident to >= 2 distinct blocks
(components.c:571-599), bridge = the edge of a single-edge block
whose support edge has multiplicity 1 (a parallel pair forms a
2-edge block in igraph, so neither copy is a bridge — the aux graph
runs on the collapsed support, hence the explicit multiplicity
check).  Divergence on multigraphs: blocks are reported per SUPPORT
edge (one (a, b, block) row per distinct endpoint pair), not per
edge id — parallel copies share their pair's row.

Driver footprint: the per-component BFS roots array (one id per
non-singleton component) and scalar level counters — the same
multi-source-seed footprint the sampled-centrality harnesses already
accept; everything else moves as object-store refs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    distinct,
    exchange,
    groupby_agg,
    hash_join,
    to_dataset,
)
from .engine import GraphEngine
from .components import wcc
from .triangles import undirected_support


@ray.remote
def _apply(fn, *tbls):
    return fn(*tbls)


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


def _rename(cols: dict):
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({new: t[old] for old, new in cols.items()})

    return fn


def _scalar_max(refs, col) -> int:
    @ray.remote
    def mx(t: pa.Table) -> int:
        if t.num_rows == 0:
            return -1
        return int(pc.max(t[col]).as_py())

    return max(ray.get([mx.remote(r) for r in refs]))


def _forest(edges, n: int, P: int):
    """(V refs (vid, parent, depth) vid-partitioned, sym support refs,
    und support refs).  Runs WCC for roots + one multi-source BFS."""
    und = undirected_support(edges, P=P)

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table(
            {
                "src": np.concatenate((a, b)),
                "dst": np.concatenate((b, a)),
            }
        )

    sym_refs = [_apply.remote(sym, r) for r in und]
    eng = GraphEngine.from_edges(sym_refs, n=n, P=P)
    wcc(eng, renumber=False)  # labels = component min vid

    @ray.remote
    def roots_of(t: pa.Table) -> np.ndarray:
        return np.unique(t["label"].to_numpy())

    roots = np.unique(
        np.concatenate(
            ray.get(
                [
                    roots_of.remote(s.state_table.remote(["label"]))
                    for s in eng.shards
                ]
            )
        )
    )
    shards = eng.shards
    ray.get([s.pbfs_init.remote(roots) for s in shards])
    while True:
        outs = eng.scatter("pbfs_scatter", ("fwd",))
        stats = ray.get(
            [
                shards[q].pbfs_gather.remote(*eng.pieces(outs, q))
                for q in range(eng.P)
            ]
        )
        if sum(s["changed"] for s in stats) == 0:
            break
    st = [
        s.state_table.remote(["dist", "parent"], {"dist": "depth"})
        for s in eng.shards
    ]
    ray.wait(st, num_returns=len(st), fetch_local=False)
    v_refs = exchange(st, ["vid"], P=P, as_refs=True)
    eng.shutdown()
    return v_refs, sym_refs, und


def biconnected(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
):
    """Returns (edge_blocks, articulation_points, bridges) Datasets:
    (a, b, block) per support edge, (vid) per cut vertex, (a, b) per
    bridge.  See module docstring for the algorithm."""
    V, _, und = _forest(edges, n, P)

    # tree edges (c, p, depth), co-partitioned with V by child vid
    def tree(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["parent"], 0))
        return pa.table(
            {"c": t["vid"], "p": t["parent"], "depth": t["depth"]}
        )

    T = [_apply.remote(tree, r) for r in V]
    D = _scalar_max(T, "depth") if _any_rows(T) else 0

    # nontree edges: support minus tree pairs (canonical a < b)
    def canon_t(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy()
        p = t["p"].to_numpy()
        return pa.table(
            {"a": np.minimum(c, p), "b": np.maximum(c, p)}
        )

    NT = hash_join(
        und, [_apply.remote(canon_t, r) for r in T], ["a", "b"],
        how="left anti", P=P, as_refs=True,
    )

    # ---- subtree sizes: level-synchronous bottom-up sums ----------------
    def init_sz(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": t["vid"],
             "sz": np.ones(t.num_rows, np.int64)}
        )

    S = [_apply.remote(init_sz, r) for r in V]

    def lvl_sz(d):
        def fn(t_part: pa.Table, s_part: pa.Table) -> pa.Table:
            t = t_part.filter(pc.equal(t_part["depth"], d))
            j = t.join(s_part, keys=["c"], right_keys=["vid"])
            return pa.table({"p": j["p"], "sz": j["sz"]})

        return fn

    def add_sz(s_part: pa.Table, inc: pa.Table) -> pa.Table:
        j = s_part.join(
            inc, keys=["vid"], right_keys=["p"], join_type="left outer"
        )
        sz = j["sz"].to_numpy() + np.nan_to_num(
            j["inc"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        return pa.table({"vid": j["vid"], "sz": sz})

    for d in range(D, 0, -1):
        incs = [
            _apply.remote(lvl_sz(d), T[i], S[i]) for i in range(len(T))
        ]
        agg = groupby_agg(
            incs, ["p"], [("sz", "sum", "inc")], P=P, as_refs=True
        )
        S = [_apply.remote(add_sz, S[i], agg[i]) for i in range(len(S))]

    # ---- preorder: sibling base offsets + ancestor prefix sums ----------
    def with_sz(t_part: pa.Table, s_part: pa.Table) -> pa.Table:
        j = t_part.join(s_part, keys=["c"], right_keys=["vid"])
        return pa.table({"c": j["c"], "p": j["p"], "sz": j["sz"]})

    TS = [_apply.remote(with_sz, T[i], S[i]) for i in range(len(T))]

    def sib_base(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "c": np.empty(0, np.int64),
                    "base": np.empty(0, np.int64),
                }
            )
        p = t["p"].to_numpy()
        c = t["c"].to_numpy()
        sz = t["sz"].to_numpy()
        order = np.lexsort((c, p))
        p, c, sz = p[order], c[order], sz[order]
        csum = np.cumsum(sz) - sz
        starts = np.concatenate(([0], np.flatnonzero(p[1:] != p[:-1]) + 1))
        base0 = np.repeat(csum[starts], np.diff(
            np.concatenate((starts, [len(p)]))
        ))
        return pa.table({"c": c, "base": csum - base0 + 1})

    B = exchange(TS, ["p"], P=P, reduce_fn=sib_base, as_refs=True)

    # pointer-doubling rows: (v, ptr, acc); roots self-loop with acc 0
    def pd_init(v_part: pa.Table, b_part: pa.Table) -> pa.Table:
        j = v_part.join(
            b_part, keys=["vid"], right_keys=["c"],
            join_type="left outer",
        )
        vid = j["vid"].to_numpy()
        par = j["parent"].to_numpy()
        base = np.nan_to_num(
            j["base"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        is_root = par < 0
        return pa.table(
            {
                "v": vid,
                "ptr": np.where(is_root, vid, par),
                "acc": np.where(is_root, 0, base),
            }
        )

    # B partitioned by p-hash; re-exchange by c to co-partition with V
    Bc = exchange(B, ["c"], P=P, as_refs=True)
    PD = [_apply.remote(pd_init, V[i], Bc[i]) for i in range(len(V))]
    K = int(np.ceil(np.log2(max(D, 1) + 1))) + 1
    for _ in range(K):
        PDr = [
            _apply.remote(
                _rename({"v": "v2", "ptr": "ptr2", "acc": "acc2"}), r
            )
            for r in PD
        ]
        j = hash_join(PD, PDr, ["ptr"], ["v2"], P=P, as_refs=True)

        def step(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "v": t["v"],
                    "ptr": t["ptr2"],
                    "acc": pc.add(t["acc"], t["acc2"]),
                }
            )

        PD = [_apply.remote(step, r) for r in j]

    PRE = exchange(
        [
            _apply.remote(_rename({"v": "vid", "acc": "pre"}), r)
            for r in PD
        ],
        ["vid"], P=P, as_refs=True,
    )  # co-partitioned with V / S

    def pre_sz(p_part: pa.Table, s_part: pa.Table) -> pa.Table:
        j = p_part.join(s_part, keys=["vid"])
        return pa.table(
            {"vid": j["vid"], "pre": j["pre"], "sz": j["sz"]}
        )

    PS = [_apply.remote(pre_sz, PRE[i], S[i]) for i in range(len(PRE))]

    # ---- nontree endpoints annotated with (pre, sz) ---------------------
    j1 = hash_join(
        NT,
        [_apply.remote(_rename(
            {"vid": "va", "pre": "pre_a", "sz": "sz_a"}), r)
         for r in PS],
        ["a"], ["va"], P=P, as_refs=True,
    )
    NTX = hash_join(
        j1,
        [_apply.remote(_rename(
            {"vid": "vb", "pre": "pre_b", "sz": "sz_b"}), r)
         for r in PS],
        ["b"], ["vb"], P=P, as_refs=True,
    )

    # ---- low/high: own pre + nontree reach, bottom-up min/max ----------
    def nt_reach(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        pre_a = t["pre_a"].to_numpy()
        pre_b = t["pre_b"].to_numpy()
        return pa.table(
            {
                "vid": np.concatenate((a, b)),
                "lo": np.concatenate((pre_b, pre_a)),
                "hi": np.concatenate((pre_b, pre_a)),
            }
        )

    reach = groupby_agg(
        [_apply.remote(nt_reach, r) for r in NTX],
        ["vid"], [("lo", "min", "lo"), ("hi", "max", "hi")],
        P=P, as_refs=True,
    )

    def lh_init(p_part: pa.Table, r_part: pa.Table) -> pa.Table:
        j = p_part.join(r_part, keys=["vid"], join_type="left outer")
        pre = j["pre"].to_numpy()
        lo = j["lo"].to_numpy(zero_copy_only=False).astype(np.float64)
        hi = j["hi"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "vid": j["vid"],
                "low": np.fmin(pre, lo).astype(np.int64),
                "high": np.fmax(pre, hi).astype(np.int64),
            }
        )

    LH = [
        _apply.remote(lh_init, PRE[i], reach[i]) for i in range(len(PRE))
    ]

    def lvl_lh(d):
        def fn(t_part: pa.Table, lh_part: pa.Table) -> pa.Table:
            t = t_part.filter(pc.equal(t_part["depth"], d))
            j = t.join(lh_part, keys=["c"], right_keys=["vid"])
            return pa.table(
                {"p": j["p"], "low": j["low"], "high": j["high"]}
            )

        return fn

    def merge_lh(lh_part: pa.Table, inc: pa.Table) -> pa.Table:
        j = lh_part.join(
            inc, keys=["vid"], right_keys=["p"], join_type="left outer"
        )
        lo = j["low"].to_numpy()
        hi = j["high"].to_numpy()
        il = j["ilow"].to_numpy(zero_copy_only=False).astype(np.float64)
        ih = j["ihigh"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "vid": j["vid"],
                "low": np.fmin(lo, il).astype(np.int64),
                "high": np.fmax(hi, ih).astype(np.int64),
            }
        )

    for d in range(D, 0, -1):
        incs = [
            _apply.remote(lvl_lh(d), T[i], LH[i]) for i in range(len(T))
        ]
        agg = groupby_agg(
            incs, ["p"],
            [("low", "min", "ilow"), ("high", "max", "ihigh")],
            P=P, as_refs=True,
        )
        LH = [
            _apply.remote(merge_lh, LH[i], agg[i]) for i in range(len(LH))
        ]

    # ---- auxiliary edges -----------------------------------------------
    # rule 2: tree edge (p, c) with p non-root, subtree(c) escapes
    # subtree(p)
    def t_lh(t_part: pa.Table, lh_part: pa.Table) -> pa.Table:
        t = t_part.filter(pc.greater_equal(t_part["depth"], 2))
        j = t.join(lh_part, keys=["c"], right_keys=["vid"])
        return pa.table(
            {"c": j["c"], "p": j["p"], "low": j["low"], "high": j["high"]}
        )

    TLH = [_apply.remote(t_lh, T[i], LH[i]) for i in range(len(T))]
    j2 = hash_join(
        TLH,
        [_apply.remote(_rename(
            {"vid": "vp", "pre": "pre_p", "sz": "sz_p"}), r)
         for r in PS],
        ["p"], ["vp"], P=P, as_refs=True,
    )

    def rule2(t: pa.Table) -> pa.Table:
        low = t["low"].to_numpy()
        high = t["high"].to_numpy()
        pre_p = t["pre_p"].to_numpy()
        sz_p = t["sz_p"].to_numpy()
        keep = (low < pre_p) | (high >= pre_p + sz_p)
        return pa.table(
            {
                "src": t["p"].to_numpy()[keep],
                "dst": t["c"].to_numpy()[keep],
            }
        )

    aux2 = [_apply.remote(rule2, r) for r in j2]

    # rule 1: unrelated nontree edges
    def rule1(t: pa.Table) -> pa.Table:
        pre_a = t["pre_a"].to_numpy()
        sz_a = t["sz_a"].to_numpy()
        pre_b = t["pre_b"].to_numpy()
        sz_b = t["sz_b"].to_numpy()
        a_anc = (pre_a <= pre_b) & (pre_b < pre_a + sz_a)
        b_anc = (pre_b <= pre_a) & (pre_a < pre_b + sz_b)
        keep = ~a_anc & ~b_anc
        return pa.table(
            {
                "src": t["a"].to_numpy()[keep],
                "dst": t["b"].to_numpy()[keep],
            }
        )

    aux1 = [_apply.remote(rule1, r) for r in NTX]

    def symd(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d_ = t["dst"].to_numpy()
        return pa.table(
            {
                "src": np.concatenate((s, d_)),
                "dst": np.concatenate((d_, s)),
            }
        )

    aux = [_apply.remote(symd, r) for r in aux1 + aux2]
    eng2 = GraphEngine.from_edges(aux, n=n, P=P)
    wcc(eng2, renumber=False)
    st2 = [
        s.state_table.remote(["label"], {"label": "block"})
        for s in eng2.shards
    ]
    ray.wait(st2, num_returns=len(st2), fetch_local=False)
    BLK = exchange(st2, ["vid"], P=P, as_refs=True)
    eng2.shutdown()

    # ---- per-edge blocks -----------------------------------------------
    def tree_edge_rows(t_part: pa.Table, blk_part: pa.Table) -> pa.Table:
        j = t_part.join(blk_part, keys=["c"], right_keys=["vid"])
        c = j["c"].to_numpy()
        p = j["p"].to_numpy()
        return pa.table(
            {
                "a": np.minimum(c, p),
                "b": np.maximum(c, p),
                "block": j["block"],
            }
        )

    # T is c-partitioned == vid-partitioned like BLK
    eb_tree = [
        _apply.remote(tree_edge_rows, T[i], BLK[i]) for i in range(len(T))
    ]

    def nt_deeper(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        pre_a = t["pre_a"].to_numpy()
        sz_a = t["sz_a"].to_numpy()
        pre_b = t["pre_b"].to_numpy()
        a_anc = (pre_a <= pre_b) & (pre_b < pre_a + sz_a)
        deeper = np.where(a_anc, b, a)
        return pa.table({"a": a, "b": b, "rep": deeper})

    jnt = hash_join(
        [_apply.remote(nt_deeper, r) for r in NTX],
        [_apply.remote(_rename({"vid": "vr", "block": "block"}), r)
         for r in BLK],
        ["rep"], ["vr"], P=P, as_refs=True,
    )
    eb_nt = [
        _apply.remote(
            lambda t: pa.table(
                {"a": t["a"], "b": t["b"], "block": t["block"]}
            ),
            r,
        )
        for r in jnt
    ]
    EB = eb_tree + eb_nt

    # articulation points: vertices touching >= 2 distinct blocks
    def vb(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": np.concatenate(
                    (t["a"].to_numpy(), t["b"].to_numpy())
                ),
                "block": np.concatenate(
                    (t["block"].to_numpy(), t["block"].to_numpy())
                ),
            }
        )

    vblocks = distinct(
        [_apply.remote(vb, r) for r in EB], ["vid", "block"], P=P,
        as_refs=True,
    )
    nblocks = groupby_agg(
        vblocks, ["vid"], [(None, "count", "nb")], P=P, as_refs=True
    )
    artic = [
        _apply.remote(
            lambda t: pa.table(
                {"vid": t.filter(pc.greater(t["nb"], 1))["vid"]}
            ),
            r,
        )
        for r in nblocks
    ]

    # bridges: single-edge blocks whose support edge has multiplicity 1
    # — a parallel edge pair is a 2-edge biconnected block in igraph
    # (components.c: neither copy is a bridge), so a support edge with
    # multiplicity > 1 must never be reported as a bridge even though
    # the collapsed aux graph sees it as a single-edge block
    bsizes = groupby_agg(
        EB, ["block"], [(None, "count", "m")], P=P, as_refs=True
    )
    single = [
        _apply.remote(
            lambda t: t.filter(pc.equal(t["m"], 1)).select(["block"]), r
        )
        for r in bsizes
    ]
    bridges = hash_join(EB, single, ["block"], how="left semi", P=P,
                        as_refs=True)
    from .triangles import _canonicalize

    canon = [_canonicalize.remote(r) for r in _refs(edges)]
    emult = groupby_agg(
        canon, ["a", "b"], [(None, "count", "m")], P=P, as_refs=True
    )
    multi = [
        _apply.remote(
            lambda t: t.filter(pc.greater(t["m"], 1)).select(["a", "b"]),
            r,
        )
        for r in emult
    ]
    bridges = hash_join(bridges, multi, ["a", "b"], how="left anti",
                        P=P, as_refs=True)
    bridges = [
        _apply.remote(lambda t: t.select(["a", "b"]), r) for r in bridges
    ]

    return to_dataset(EB), to_dataset(artic), to_dataset(bridges)


def _any_rows(refs) -> bool:
    @ray.remote
    def nr(t: pa.Table) -> int:
        return t.num_rows

    return sum(ray.get([nr.remote(r) for r in refs])) > 0


def articulation_points(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid) rows — igraph_articulation_points (src/components.c:553)."""
    _, artic, _ = biconnected(edges, n, P=P)
    return artic


def bridges(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(a, b) rows — single-edge biconnected components."""
    _, _, br = biconnected(edges, n, P=P)
    return br
