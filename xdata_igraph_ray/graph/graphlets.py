"""Graphlet decomposition (xdata-igraph flagship).

Reference: igraph_graphlets / igraph_graphlets_candidate_basis /
igraph_graphlets_project (src/glet.c:542,774,830;
include/igraph_graphlets.h:53-64).  A weighted undirected simple
graph is modeled as a union of overlapping dense groups: (1) the
candidate basis is found by recursively thresholding the graph and
collecting maximal cliques — start at the global minimum weight,
find maximal cliques, then inside each clique raise the threshold to
the next distinct internal weight and recurse (src/glet.c:321-408);
non-maximal cliques at the same threshold are filtered
(src/glet.c:443-519).  (2) the projection fits a weight Mu_c per
basis clique by the reference's multiplicative update
(src/glet.c:714-731): per iteration
  neww_e = 1e-4 + sum_{c containing e} Mu_c
  Mu_c  *= (sum_{e in c} w_e / neww_e) / (n_c (n_c + 1) / 2).

Ray-Data-first shape: the level-0 maximal cliques run on the
DISTRIBUTED Bron-Kerbosch (cliques.py); the intra-clique weighted
edge lists are extracted with two hash joins (edge x membership) in
one pass — every edge of a simple graph lies inside some maximal
clique, so this is also exactly the edge-clique incidence the
projection needs.  The recursion inside each clique and the Mu fit
run on the driver over those per-clique edge lists (total size
sum_C |E(C)| — the same arrays the reference's single-threaded code
holds; the basis itself is the output and is small relative to the
graph).  Deterministic canonical order divergence: the basis is
sorted by (threshold, size, members) and graphlets() by
(-Mu, members) — the reference's order depends on qsort tie
behavior.  Singleton cliques (isolated vertices) are NOT emitted
(igraph emits them with threshold=inf and their Mu decays to ~0;
documented divergence, consistent with maximal_cliques here)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    groupby_agg,
    hash_join,
)

INF = float("inf")


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


def _canon_weighted(edges, P):
    """Simple canonical weighted support refs (a < b, w); raises on
    parallel support edges (reference: 'Graphlets work on simple
    graphs only', src/glet.c:560)."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        w = t["weight"].to_numpy().astype(np.float64)
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table(
            {"a": np.minimum(s, d), "b": np.maximum(s, d), "w": w}
        )

    canon_refs = [_apply.remote(canon, r) for r in _refs(edges)]
    agg = groupby_agg(
        canon_refs, ["a", "b"],
        [(None, "count", "m"), ("w", "min", "w")], P=P, as_refs=True,
    )

    def check(t: pa.Table) -> pa.Table:
        if len(t) and pa.compute.max(t["m"]).as_py() > 1:
            raise ValueError("graphlets: input graph must be simple "
                             "(parallel support edges found)")
        return t.select(["a", "b", "w"])

    return [_apply.remote(check, r) for r in agg]


def _clique_edge_lists(und_refs, cliques, P):
    """For each clique (list of vids) return its internal weighted
    edges — distributed: explode membership, two hash joins against
    the canonical edge table, group rows by clique id on the driver.
    Returns dict cid -> (a, b, w) arrays."""
    member_rows = []
    for cid, members in enumerate(cliques):
        m = np.asarray(members, np.int64)
        member_rows.append((np.full(len(m), cid, np.int64), m))
    if not member_rows:
        return {}
    cid_arr = np.concatenate([r[0] for r in member_rows])
    vid_arr = np.concatenate([r[1] for r in member_rows])
    mem = [ray.put(pa.table({"cid": cid_arr, "vid": vid_arr}))]

    # edge (a,b,w) x membership on a=vid -> (cid,a,b,w); then keep
    # rows whose (cid, b) is also a member (semi join)
    j1 = hash_join(
        und_refs,
        [_apply.remote(
            lambda t: t.rename_columns(["cid", "a"]), r) for r in mem],
        ["a"], how="inner", P=P, as_refs=True,
    )
    j2 = hash_join(
        j1,
        [_apply.remote(
            lambda t: t.rename_columns(["cid", "b"]), r) for r in mem],
        ["cid", "b"], how="left semi", P=P, as_refs=True,
    )
    out: dict[int, list] = {}
    for t in ray.get(j2):
        if not len(t):
            continue
        c = t["cid"].to_numpy()
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        w = t["w"].to_numpy()
        order = np.argsort(c, kind="stable")
        c, a, b, w = c[order], a[order], b[order], w[order]
        cuts = np.flatnonzero(np.diff(c)) + 1
        for cc, aa, bb, ww in zip(
            np.split(c, cuts), np.split(a, cuts),
            np.split(b, cuts), np.split(w, cuts),
        ):
            out.setdefault(int(cc[0]), []).append((aa, bb, ww))
    return {
        cid: tuple(np.concatenate(parts) for parts in zip(*chunks))
        for cid, chunks in out.items()
    }


def _bk_max_cliques(adj: dict[int, set]) -> list[list[int]]:
    """Driver-side Bron-Kerbosch with pivoting for the tiny per-clique
    recursion subgraphs (the reference recursion is equally
    single-threaded at this point, src/glet.c:393)."""
    out: list[list[int]] = []

    def bk(R, Pset, X):
        if not Pset and not X:
            out.append(sorted(R))
            return
        pivot = max(Pset | X, key=lambda u: len(adj[u] & Pset))
        for v in sorted(Pset - adj[pivot]):
            bk(R | {v}, Pset & adj[v], X & adj[v])
            Pset = Pset - {v}
            X = X | {v}

    bk(set(), set(adj.keys()), set())
    return out


def _recurse(a, b, w, ids_thr_out, startthr):
    """Driver replay of igraph_i_graphlets on one clique's internal
    weighted edge list: record (members, min internal weight), then
    recurse on the subgraph of edges >= the next distinct weight."""
    # the caller guarantees all w >= startthr and (a,b,w) is the
    # induced edge set of the current vertex group
    if not len(a):
        return
    minw = float(w.min())
    above = w[w > minw]
    nextw = float(above.min()) if len(above) else INF
    members = np.unique(np.concatenate((a, b)))
    ids_thr_out.append((members, minw))
    if nextw is INF or not np.isfinite(nextw):
        return
    keep = w >= nextw
    a2, b2, w2 = a[keep], b[keep], w[keep]
    if not len(a2):
        return
    # maximal cliques of the thresholded subgraph, then recurse into
    # each with ITS induced edges at >= nextw
    adj: dict[int, set] = {}
    for x, y in zip(a2.tolist(), b2.tolist()):
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    ew = {(x, y): float(z) for x, y, z in zip(a2, b2, w2)}
    for cl in _bk_max_cliques(adj):
        if len(cl) < 2:
            continue
        cs = set(cl)
        pa_, pb_, pw_ = [], [], []
        for x in cl:
            for y in adj[x]:
                if y in cs and x < y:
                    pa_.append(x)
                    pb_.append(y)
                    pw_.append(ew[(x, y)])
        _recurse(
            np.asarray(pa_, np.int64), np.asarray(pb_, np.int64),
            np.asarray(pw_, np.float64), ids_thr_out, nextw,
        )


def _filter_basis(basis):
    """Drop cliques with a SUPERSET at the same threshold (also dedups
    exact duplicates) — igraph_i_graphlets_filter, src/glet.c:443."""
    order = sorted(
        range(len(basis)),
        key=lambda i: (basis[i][1], len(basis[i][0]),
                       tuple(basis[i][0])),
    )
    keep = [True] * len(basis)
    for ii, i in enumerate(order):
        mi, ti = basis[i]
        si = set(mi.tolist())
        for j in order[ii + 1:]:
            mj, tj = basis[j]
            if tj != ti:
                break
            if len(mj) >= len(mi) and si <= set(mj.tolist()) \
                    and keep[j]:
                keep[i] = False
                break
    out = [basis[i] for i in order if keep[i]]
    return out


def graphlets_candidate_basis(
    edges: Dataset | list, P: int = DEFAULT_PARTITIONS,
) -> tuple[list[np.ndarray], np.ndarray]:
    """(cliques, thresholds): the candidate graphlet basis, sorted by
    (threshold, size, members) for determinism.  Level 0 runs the
    distributed maximal-clique kernel over the full support (the
    global-minimum threshold keeps every edge, src/glet.c:346-353);
    the per-clique threshold recursion replays on the driver over
    distributed-extracted intra-clique edge lists."""
    from .cliques import maximal_cliques

    und = _canon_weighted(edges, P)
    top = maximal_cliques(und, P=P).to_pandas()
    cliques0 = [np.asarray(c, np.int64) for c in top["clique"]
                if len(c) >= 2]
    cl_edges = _clique_edge_lists(und, cliques0, P)
    basis: list = []
    for cid in range(len(cliques0)):
        a, b, w = cl_edges.get(
            cid, (np.empty(0, np.int64), np.empty(0, np.int64),
                  np.empty(0)),
        )
        _recurse(a, b, w, basis, float(w.min()) if len(w) else 0.0)
    basis = _filter_basis(basis)
    return [m for m, _ in basis], np.array([t for _, t in basis])


def graphlets_project(
    edges: Dataset | list,
    cliques: list[np.ndarray],
    niter: int = 100,
    Mu0: np.ndarray | None = None,
    P: int = DEFAULT_PARTITIONS,
) -> np.ndarray:
    """Mu weights for a given basis (igraph_graphlets_project,
    src/glet.c:774): vectorized replay of the reference's
    multiplicative update over the edge-clique incidence, which is
    extracted with the same distributed joins as the basis step."""
    und = _canon_weighted(edges, P)
    cl_edges = _clique_edge_lists(und, cliques, P)
    # global edge list (deduped) + per-clique edge index
    edge_idx: dict[tuple, int] = {}
    wlist: list[float] = []
    inc_e: list[int] = []
    inc_c: list[int] = []
    for cid in range(len(cliques)):
        a, b, w = cl_edges.get(
            cid, (np.empty(0, np.int64), np.empty(0, np.int64),
                  np.empty(0)),
        )
        for x, y, z in zip(a.tolist(), b.tolist(), w.tolist()):
            k = (x, y)
            e = edge_idx.get(k)
            if e is None:
                e = len(wlist)
                edge_idx[k] = e
                wlist.append(z)
            inc_e.append(e)
            inc_c.append(cid)
    wv = np.asarray(wlist)
    ie = np.asarray(inc_e, np.int64)
    ic = np.asarray(inc_c, np.int64)
    nc = len(cliques)
    ne = len(wv)
    sizes = np.array([len(c) for c in cliques], np.float64)
    normfact = sizes * (sizes + 1.0) / 2.0
    Mu = (np.ones(nc) if Mu0 is None
          else np.asarray(Mu0, np.float64).copy())
    for _ in range(niter):
        if ne:
            neww = 1e-4 + np.bincount(ie, weights=Mu[ic], minlength=ne)
            ratio = np.bincount(
                ic, weights=wv[ie] / neww[ie], minlength=nc,
            )
        else:
            ratio = np.zeros(nc)
        Mu *= ratio / np.where(normfact > 0, normfact, 1.0)
    return Mu


def graphlets(
    edges: Dataset | list,
    niter: int = 100,
    P: int = DEFAULT_PARTITIONS,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Basis + projection, ordered by decreasing Mu (ties broken by
    members for determinism) — igraph_graphlets, src/glet.c:830."""
    cliques, _thr = graphlets_candidate_basis(edges, P=P)
    Mu = graphlets_project(edges, cliques, niter=niter, P=P)
    order = sorted(
        range(len(cliques)),
        key=lambda i: (-Mu[i], tuple(cliques[i])),
    )
    idx = np.asarray(order, np.int64)
    return [cliques[i] for i in order], (Mu[idx] if len(idx) else Mu)


def subclique_next(edges: pa.Table, cliques, ids=None):
    """igraph_subclique_next (src/glet.c:94-290): for each clique of
    the previous level, find the within-clique edges, report the
    clique's threshold (minimum weight) and the NEXT distinct weight,
    and build the next-level subgraph from the edges with weight >=
    next threshold (empty when the clique is weight-uniform), vertices
    relabeled in first-appearance order of the surviving edges.

    ``edges``: pyarrow Table (src, dst, weight) — the level's graph;
    ``cliques``: list of vertex-id arrays; ``ids``: global ids per
    local vertex (identity if None).  Returns a list of dicts
    (edges, weights, ids, clique_thr, next_thr) — one per clique, the
    same per-clique artifacts the reference returns through its five
    output vectors.  Driver kernel over small cliques, like the
    reference's own per-clique loop.
    """
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    w = edges["weight"].to_numpy()
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    ids = np.asarray(ids, np.int64)
    # incident edge ids per vertex, ascending edge id (igraph order)
    inc = [[] for _ in range(n)]
    for ei in range(len(src)):
        inc[src[ei]].append(ei)
        if dst[ei] != src[ei]:
            inc[dst[ei]].append(ei)
    out = []
    for clique in cliques:
        clique = list(map(int, clique))
        marked = set()
        found = []
        minw, nextw = np.inf, np.inf
        for v in clique:
            marked.add(v)
            for ei in inc[v]:
                other = int(dst[ei]) if int(src[ei]) == v else int(src[ei])
                if other in marked and (other != v or int(src[ei])
                                        == int(dst[ei])):
                    we = float(w[ei])
                    found.append(ei)
                    if we < minw:
                        nextw = minw
                        minw = we
                    elif minw < we < nextw:
                        nextw = we
        newids, idmap, es, ds, ws = [], {}, [], [], []
        for ei in found:
            if w[ei] >= nextw:
                for endpoint in (int(src[ei]), int(dst[ei])):
                    if endpoint not in idmap:
                        idmap[endpoint] = len(newids)
                        newids.append(int(ids[endpoint]))
                es.append(idmap[int(src[ei])])
                ds.append(idmap[int(dst[ei])])
                ws.append(float(w[ei]))
        out.append({
            "edges": pa.table({"src": np.asarray(es, np.int64),
                               "dst": np.asarray(ds, np.int64),
                               "weight": np.asarray(ws, np.float64)}),
            "ids": np.asarray(newids, np.int64),
            "clique_thr": minw,
            "next_thr": nextw,
        })
    return out
