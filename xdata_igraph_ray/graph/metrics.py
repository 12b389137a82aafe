"""Graph-level metrics and per-vertex scalar maps
(reference src/community.c igraph_modularity, src/assortativity.c,
src/motifs.c dyad census, src/scan.c local scan statistics,
src/structural_properties.c strength/maxdegree).

All are Dataset/exchange compositions — the grouped-sum shapes of
SURVEY.md §2.6.
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


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


def strength(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid, out_strength, in_strength): weighted degree sums
    (igraph_strength, src/structural_properties.c:5923).  Unweighted
    edge tables count 1 per edge."""
    import ray.data as rd

    def expand(t: pa.Table) -> pa.Table:
        w = (
            t["weight"].to_numpy()
            if "weight" in t.column_names
            else np.ones(len(t))
        )
        return pa.table(
            {
                "vid": np.concatenate(
                    (t["src"].to_numpy(), t["dst"].to_numpy())
                ),
                "out_w": np.concatenate((w, np.zeros(len(t)))),
                "in_w": np.concatenate((np.zeros(len(t)), w)),
            }
        )

    base = rd.range(n).map_batches(
        lambda b: pa.table(
            {
                "vid": b["id"],
                "out_w": np.zeros(len(b["id"])),
                "in_w": np.zeros(len(b["id"])),
            }
        ),
        batch_format="numpy",
    )
    refs = [_apply.remote(expand, r) for r in _refs(edges)] + block_refs(base)
    return groupby_agg(
        refs, ["vid"],
        [("out_w", "sum", "out_strength"), ("in_w", "sum", "in_strength")],
        P=P,
    )


def maxdegree(edges: Dataset | list, mode: str = "out",
              P: int = DEFAULT_PARTITIONS) -> int:
    """igraph_maxdegree (src/structural_properties.c:2735)."""
    col = {"out": "src", "in": "dst"}.get(mode)

    def cnt(t: pa.Table) -> pa.Table:
        if mode == "all":
            v = np.concatenate((t["src"].to_numpy(), t["dst"].to_numpy()))
        else:
            v = t[col].to_numpy()
        return pa.table({"vid": v})

    deg = groupby_agg(
        [_apply.remote(cnt, r) for r in _refs(edges)],
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )
    parts = ray.get([
        _apply.remote(lambda t: int(pc.max(t["deg"]).as_py() or 0), r)
        for r in deg
    ])
    return max(parts) if parts else 0


def is_mutual(edges: Dataset | list, P: int = DEFAULT_PARTITIONS) -> Dataset:
    """(src, dst, mutual): whether the reciprocal arc exists
    (igraph_is_mutual, src/structural_properties.c:5613)."""
    refs = _refs(edges)
    dist = distinct(refs, ["src", "dst"], P=P, as_refs=True)

    def swap(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src": t["dst"], "dst": t["src"],
             "m": np.ones(len(t), np.int8)}
        )

    swapped = [_apply.remote(swap, r) for r in dist]
    joined = hash_join(dist, swapped, keys=["src", "dst"],
                       how="left outer", P=P, as_refs=True)

    def flag(t: pa.Table) -> pa.Table:
        m = t["m"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"src": t["src"], "dst": t["dst"],
             "mutual": ~np.isnan(m.astype(np.float64))}
        )

    return to_dataset([_apply.remote(flag, r) for r in joined])


def dyad_census(edges: Dataset | list, n: int,
                P: int = DEFAULT_PARTITIONS) -> dict:
    """(mut, asym, null) counts over unordered vertex pairs
    (igraph_dyad_census, src/motifs.c:848)."""
    refs = _refs(edges)

    def noloop(t):
        return t.filter(pc.invert(pc.equal(t["src"], t["dst"])))

    nl = distinct([_apply.remote(noloop, r) for r in refs],
                  ["src", "dst"], P=P, as_refs=True)

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    pair_counts = groupby_agg(
        [_apply.remote(canon, r) for r in nl],
        ["a", "b"], [(None, "count", "c")], P=P, as_refs=True,
    )
    counts = ray.get([
        _apply.remote(
            lambda t: (
                int(pc.sum(pc.equal(t["c"], 2)).as_py() or 0),
                int(pc.sum(pc.equal(t["c"], 1)).as_py() or 0),
            ),
            r,
        )
        for r in pair_counts
    ])
    mut = sum(c[0] for c in counts)
    asym = sum(c[1] for c in counts)
    null = n * (n - 1) // 2 - mut - asym
    return {"mut": mut, "asym": asym, "null": null}


def modularity(
    edges: Dataset | list, membership: np.ndarray,
    P: int = DEFAULT_PARTITIONS,
) -> float:
    """Newman modularity of a vertex partition on the undirected
    simplified support (igraph_modularity, called from
    src/community.c:2347-2350).  ``membership`` is broadcast once."""
    mref = ray.put(np.asarray(membership, dtype=np.int64))
    refs = _refs(edges)

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = distinct([_apply.remote(canon, r) for r in refs], ["a", "b"],
                   P=P, as_refs=True)

    @ray.remote
    def partial(t: pa.Table, m):
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        ca, cb = m[a], m[b]
        within = int((ca == cb).sum())
        # per-community degree sums (each edge adds 1 to both endpoints)
        ncomm = int(m.max()) + 1 if len(m) else 1
        degs = np.bincount(ca, minlength=ncomm) + np.bincount(cb, minlength=ncomm)
        return len(t), within, degs

    parts = ray.get([partial.remote(r, mref) for r in und])
    m_edges = sum(p[0] for p in parts)
    within = sum(p[1] for p in parts)
    if m_edges == 0:
        return float("nan")
    ncomm = max(len(p[2]) for p in parts)
    degs = np.zeros(ncomm)
    for p in parts:
        degs[: len(p[2])] += p[2]
    return within / m_edges - float(((degs / (2 * m_edges)) ** 2).sum())


def assortativity_degree(
    edges: Dataset | list, P: int = DEFAULT_PARTITIONS
) -> float:
    """Pearson correlation of (out-deg(src), in-deg(dst)) over directed
    edges — igraph_assortativity_degree directed variant
    (src/assortativity.c)."""
    refs = _refs(edges)
    out_d = groupby_agg(
        [_apply.remote(lambda t: pa.table({"vid": t["src"]}), r) for r in refs],
        ["vid"], [(None, "count", "od")], P=P, as_refs=True)
    in_d = groupby_agg(
        [_apply.remote(lambda t: pa.table({"vid": t["dst"]}), r) for r in refs],
        ["vid"], [(None, "count", "id_")], P=P, as_refs=True)
    j1 = hash_join(refs, [
        _apply.remote(lambda t: t.rename_columns(["src", "src_od"]), r)
        for r in out_d
    ], keys=["src"], P=P, as_refs=True)
    j2 = hash_join(j1, [
        _apply.remote(lambda t: t.rename_columns(["dst", "dst_id"]), r)
        for r in in_d
    ], keys=["dst"], P=P, as_refs=True)

    def moments(t: pa.Table):
        x = t["src_od"].to_numpy().astype(float)
        y = t["dst_id"].to_numpy().astype(float)
        return (len(t), x.sum(), y.sum(), (x * y).sum(),
                (x * x).sum(), (y * y).sum())

    parts = ray.get([_apply.remote(moments, r) for r in j2])
    n = sum(p[0] for p in parts)
    if n == 0:
        return float("nan")
    sx = sum(p[1] for p in parts); sy = sum(p[2] for p in parts)
    sxy = sum(p[3] for p in parts)
    sxx = sum(p[4] for p in parts); syy = sum(p[5] for p in parts)
    cov = sxy / n - (sx / n) * (sy / n)
    vx = sxx / n - (sx / n) ** 2
    vy = syy / n - (sy / n) ** 2
    return cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")


def local_scan_1(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid, scan1): edges within the closed 1-neighborhood on the
    undirected simplified support — xdata scan statistic
    (igraph_local_scan_1_ecount, src/scan.c:401).  scan1(v) =
    deg(v) + triangles(v)."""
    from .build import degrees
    from .triangles import triangles, undirected_support

    und = undirected_support(edges, P=P)

    def back(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["a"], "dst": t["b"]})

    und_edges = [_apply.remote(back, r) for r in und]
    _, tri = triangles(und, n, P=P)
    deg = degrees(und_edges, n, P=P)
    joined = hash_join(block_refs(tri), block_refs(deg), keys=["vid"],
                       P=P, as_refs=True)

    def s1(t: pa.Table) -> pa.Table:
        d = t["out_deg"].to_numpy() + t["in_deg"].to_numpy()
        return pa.table(
            {"vid": t["vid"], "scan1": t["count"].to_numpy() + d}
        )

    return to_dataset([_apply.remote(s1, r) for r in joined])


def diversity(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid, diversity): Shannon entropy of incident (ALL-mode) edge
    weights scaled by log(degree) — reference igraph_diversity
    (src/structural_properties.c:6455):
    res = (log(s) - sum(w*log w)/s) / log(k).  k=0 -> NaN, k=1 -> 0/0
    (NaN), exactly the reference's float semantics."""
    refs = _refs(edges)

    def expand(t: pa.Table) -> pa.Table:
        w = (
            t["weight"].to_numpy().astype(np.float64)
            if "weight" in t.column_names else np.ones(len(t))
        )
        return pa.table(
            {
                "vid": np.concatenate(
                    (t["src"].to_numpy(), t["dst"].to_numpy())
                ),
                "w": np.concatenate((w, w)),
                "wlw": np.concatenate((w * np.log(w),) * 2),
                "k": np.ones(2 * len(t), np.int64),
            }
        )

    sums = groupby_agg(
        [_apply.remote(expand, r) for r in refs],
        ["vid"],
        [("w", "sum", "s"), ("wlw", "sum", "ent"), ("k", "sum", "k")],
        P=P, as_refs=True,
    )
    base = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b["id"]}), batch_format="numpy"
    )
    joined = hash_join(block_refs(base), sums, keys=["vid"],
                       how="left outer", P=P, as_refs=True)

    @ray.remote
    def final(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        ent = t["ent"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = (np.log(s) - ent / s) / np.log(k)
        return pa.table({"vid": t["vid"], "diversity": d})

    return to_dataset([final.remote(r) for r in joined])


def avg_nearest_neighbor_degree(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
):
    """(knn Dataset (vid, knn), knnk Dataset (deg, knnk)) — reference
    igraph_avg_nearest_neighbor_degree (structural_properties.c:5799):
    ALL-mode degrees on a simple graph; knn(v) = mean neighbor degree
    (NaN for isolated v), knnk[k] = mean knn over vertices of degree
    k."""
    refs = _refs(edges)

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": np.concatenate(
                    (t["src"].to_numpy(), t["dst"].to_numpy())
                ),
                "nei": np.concatenate(
                    (t["dst"].to_numpy(), t["src"].to_numpy())
                ),
            }
        )

    nb = [_apply.remote(both, r) for r in refs]
    deg = groupby_agg(nb, ["vid"], [(None, "count", "deg")], P=P,
                      as_refs=True)
    j = hash_join(
        nb, [_apply.remote(
            lambda t: pa.table({"nei": t["vid"], "nei_deg": t["deg"]}), r
        ) for r in deg],
        keys=["nei"], P=P, as_refs=True,
    )
    sums = groupby_agg(
        j, ["vid"],
        [("nei_deg", "sum", "sdeg"), (None, "count", "k")],
        P=P, as_refs=True,
    )

    @ray.remote
    def knn_of(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": t["vid"],
                "knn": t["sdeg"].to_numpy().astype(np.float64)
                / t["k"].to_numpy(),
                "deg": t["k"],
            }
        )

    knn_refs = [knn_of.remote(r) for r in sums]
    knnk = groupby_agg(
        knn_refs, ["deg"], [("knn", "sum", "s"), (None, "count", "c")],
        P=P, as_refs=True,
    )

    @ray.remote
    def knnk_of(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "deg": t["deg"],
                "knnk": t["s"].to_numpy() / t["c"].to_numpy(),
            }
        )

    base = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b["id"]}), batch_format="numpy"
    )
    knn_full = hash_join(
        block_refs(base),
        [_apply.remote(lambda t: t.select(["vid", "knn"]), r)
         for r in knn_refs],
        keys=["vid"], how="left outer", P=P,
    )
    return knn_full, to_dataset([knnk_of.remote(r) for r in knnk])


def constraint(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> Dataset:
    """(vid, constraint): Burt's constraint — reference
    igraph_constraint (src/structural_properties.c:2467).
    p_ij = (w_ij + w_ji) / sum_k (w_ik + w_ki); C(i) =
    sum_{j in N(i)} (p_ij + sum_q p_iq p_qj)^2.  Isolated -> NaN."""
    refs = _refs(edges)

    def mutual(t: pa.Table) -> pa.Table:
        w = (
            t["weight"].to_numpy().astype(np.float64)
            if "weight" in t.column_names else np.ones(len(t))
        )
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table(
            {
                "i": np.concatenate((s, d)),
                "j": np.concatenate((d, s)),
                "w": np.concatenate((w, w)),
            }
        )

    # symmetric weights, collapsed per ordered (i, j)
    wsum = groupby_agg(
        [_apply.remote(mutual, r) for r in refs],
        ["i", "j"], [("w", "sum", "w")], P=P, as_refs=True,
    )
    si = groupby_agg(wsum, ["i"], [("w", "sum", "s")], P=P, as_refs=True)
    pj = hash_join(
        wsum, [_apply.remote(lambda t: t, r) for r in si],
        keys=["i"], P=P, as_refs=True,
    )

    @ray.remote
    def pnorm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "i": t["i"], "j": t["j"],
                "p": t["w"].to_numpy() / t["s"].to_numpy(),
            }
        )

    p = [pnorm.remote(r) for r in pj]
    # indirect term: sum_q p_iq * p_qj  (q != i, j excluded below via
    # i != j rows; q = j contributes p_ij*p_jj = 0 since no loops)
    left = [_apply.remote(
        lambda t: pa.table({"i": t["i"], "q": t["j"], "piq": t["p"]}), r
    ) for r in p]
    right = [_apply.remote(
        lambda t: pa.table({"q": t["i"], "j": t["j"], "pqj": t["p"]}), r
    ) for r in p]
    prod = hash_join(left, right, keys=["q"], P=P, as_refs=True)

    @ray.remote
    def mult(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.equal(t["i"], t["j"])),
            pc.invert(pc.equal(t["i"], t["q"])),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "i": t["i"], "j": t["j"],
                "ind": t["piq"].to_numpy() * t["pqj"].to_numpy(),
            }
        )

    ind = groupby_agg(
        [mult.remote(r) for r in prod], ["i", "j"],
        [("ind", "sum", "ind")], P=P, as_refs=True,
    )
    both = hash_join(p, ind, keys=["i", "j"], how="left outer", P=P,
                     as_refs=True)

    @ray.remote
    def sq(t: pa.Table) -> pa.Table:
        indv = np.nan_to_num(
            t["ind"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        c = (t["p"].to_numpy() + indv) ** 2
        return pa.table({"vid": t["i"], "c": c})

    per_i = groupby_agg(
        [sq.remote(r) for r in both], ["vid"], [("c", "sum", "constraint")],
        P=P, as_refs=True,
    )
    base = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b["id"]}), batch_format="numpy"
    )
    return hash_join(block_refs(base), per_i, keys=["vid"],
                     how="left outer", P=P)


def centralization(scores: np.ndarray, tmax: float | None,
                   normalized: bool = True) -> float:
    """sum(max - c_i), optionally / theoretical max — reference
    igraph_centralization (src/centrality.c:2853)."""
    c = float(np.sum(scores.max() - scores))
    if normalized and tmax:
        return c / tmax
    return c


def centralization_degree(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
    mode: str = "all", loops: bool = False,
) -> float:
    """Degree centralization over a directed edge table
    (igraph_centralization_degree, src/centrality.c:2845; tmax per
    igraph_centralization_degree_tmax :2929 — directed graph,
    mode-dependent).  loops=False drops self-loops from the degrees,
    matching igraph_degree's loops flag."""
    from .build import degrees

    refs = _refs(edges)
    if not loops:
        refs = [
            _apply.remote(
                lambda t: t.filter(
                    pc.invert(pc.equal(t["src"], t["dst"]))
                ), r,
            )
            for r in refs
        ]
    deg_ds = degrees(refs, n=n, P=P)
    if mode == "all":
        tmax = 2.0 * (n - 1) * ((n - 1) if loops else (n - 2))
    else:
        tmax = float((n - 1) * (n if loops else n - 1))

    def part(t: pa.Table, m=mode):
        if m == "all":
            d = t["out_deg"].to_numpy() + t["in_deg"].to_numpy()
        else:
            d = t["out_deg" if m == "out" else "in_deg"].to_numpy()
        if not len(d):
            return (0.0, 0.0)
        return (float(d.max()), float(d.sum()))

    # distributed (max, sum) partials: sum(max - d_i) over the degree
    # table = n*max - sum — only P pairs reach the driver (round-2
    # pulled the whole per-vertex table)
    parts = ray.get([_apply.remote(part, r) for r in block_refs(deg_ds)])
    mx = max((p[0] for p in parts), default=0.0)
    c = n * mx - sum(p[1] for p in parts)
    if tmax:
        return c / tmax
    return c


def assortativity_nominal(
    edges: Dataset | list,
    types: np.ndarray,
    P: int = DEFAULT_PARTITIONS,
    directed: bool = True,
) -> float:
    """Categorical assortativity (igraph_assortativity_nominal,
    src/mixing.c): r = (sum e_ii - sum a_i b_i) / (1 - sum a_i b_i)
    over the per-type edge-endpoint fractions, exactly the
    reference's accumulation (undirected doubles both endpoints then
    halves/quarters).  Distributed: the types array is broadcast via
    ray.put once; each block contributes three bincount partials."""
    types = np.asarray(types, np.int64)
    if types.min() < 0:
        raise ValueError("invalid types vector")
    ntypes = int(types.max()) + 1
    tref = ray.put(types)

    @ray.remote
    def part(t: pa.Table, ty):
        ft = ty[t["src"].to_numpy()]
        tt = ty[t["dst"].to_numpy()]
        ai = np.bincount(ft, minlength=ntypes).astype(np.float64)
        bi = np.bincount(tt, minlength=ntypes).astype(np.float64)
        same = ft == tt
        eii = np.bincount(ft[same], minlength=ntypes).astype(np.float64)
        return len(t), ai, bi, eii

    parts = ray.get([part.remote(r, tref) for r in _refs(edges)])
    m = sum(p[0] for p in parts)
    if m == 0:
        return float("nan")
    ai = sum(p[1] for p in parts)
    bi = sum(p[2] for p in parts)
    eii = sum(p[3] for p in parts)
    if not directed:
        # reference undirected: each edge also counts its reversed
        # endpoints, doubling eii and symmetrizing ai/bi
        eii = eii * 2.0
        ai = bi = ai + bi
    sumaibi = float(((ai / m) * (bi / m)).sum())
    sumeii = float((eii / m).sum())
    if not directed:
        sumaibi /= 4.0
        sumeii /= 2.0
    return (sumeii - sumaibi) / (1.0 - sumaibi)


def centralization_closeness_tmax(n: int, mode: str = "out") -> float:
    """igraph_centralization_closeness_tmax (src/centrality.c:3211):
    star-graph maximum for NORMALIZED closeness."""
    if mode != "all":
        return (n - 1.0) * (1.0 - 1.0 / n)
    return (n - 1.0) * (n - 2.0) / (2.0 * n - 3.0)


def centralization_betweenness_tmax(n: int, directed: bool = True) -> float:
    """igraph_centralization_betweenness_tmax (src/centrality.c:3082)."""
    t = (n - 1.0) * (n - 1.0) * (n - 2.0)
    return t if directed else t / 2.0


def centralization_evcent_tmax(
    n: int, directed: bool = False, scale: bool = True,
) -> float:
    """igraph_centralization_eigenvector_centrality_tmax
    (src/centrality.c:3357)."""
    if directed:
        return float(n - 1)
    if scale:
        return float(n - 2)
    return (n - 2.0) / np.sqrt(2.0)


def modularity_matrix(edges, n: int, P: int = DEFAULT_PARTITIONS):
    """igraph_modularity_matrix (src/community.c): dense
    B = A - d d^T / 2m over the undirected support — a small-graph
    export (O(n^2) dense by definition; the leading-eigenvector
    community code uses the restricted form distributed)."""
    import numpy as np

    from .triangles import undirected_support

    und = undirected_support(edges, P=P)
    A = np.zeros((n, n))
    for r in ray.get(und):
        a = r["a"].to_numpy()
        b = r["b"].to_numpy()
        A[a, b] += 1
        A[b, a] += 1
    d = A.sum(axis=1)
    m2 = d.sum()
    if m2 == 0:
        return A
    return A - np.outer(d, d) / m2
