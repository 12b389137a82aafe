"""Maximal cliques — reference igraph_maximal_cliques
(src/maximal_cliques.c:322-395, Bron–Kerbosch with pivoting).

Distributed shape: orient the simple undirected support by
(degree, vid) rank; every maximal clique is enumerated exactly once at
its minimum-rank member v.  The per-vertex subproblem is classic
pivoted Bron–Kerbosch with R = {v}, P = forward neighbors,
X = backward neighbors, run inside the reduce task of an exchange
keyed by v — each group carries v's neighbor list plus the induced
adjacency among the neighbors (the triangle wedge-match table, so the
shuffled volume is O(#triangles), the same bound as triangle
counting).  Hub neighborhoods are the skew risk: the per-task work is
exponential in the neighborhood's clique structure, not its size, and
the (deg, vid) orientation keeps forward-neighborhoods O(sqrt(m)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    exchange,
    hash_join,
    to_dataset,
)
from .triangles import _rank, undirected_support


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


def _bron_kerbosch(adj: dict[int, set], R: list, P: set, X: set, out: list):
    if not P and not X:
        out.append(sorted(R))
        return
    pivot_pool = P | X
    pivot = max(pivot_pool, key=lambda u: len(P & adj.get(u, set())))
    for v in list(P - adj.get(pivot, set())):
        _bron_kerbosch(
            adj, R + [v], P & adj.get(v, set()), X & adj.get(v, set()), out
        )
        P.discard(v)
        X.add(v)


def maximal_cliques(
    edges: Dataset | list,
    P: int = DEFAULT_PARTITIONS,
    min_size: int = 1,
    roots=None,
) -> Dataset:
    """Dataset of (clique: list<int64>) rows — every maximal clique
    exactly once (isolated vertices are NOT emitted; igraph's
    convention of size>=1 cliques over vertices with edges is matched
    by min_size=1 plus caller-side isolated handling).  ``roots``
    restricts enumeration to cliques whose minimum-rank member is in
    the set — the igraph_maximal_cliques_subset behavior
    (src/maximal_cliques.c:389, which roots its search at the subset
    the same way; with roots=all this is exactly the full
    enumeration)."""
    und = undirected_support(edges, P=P)

    # ranks from support degrees
    from ..exchange import groupby_agg

    def both(t: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy()))}
        )

    deg = groupby_agg(
        [_apply.remote(both, r) for r in und],
        ["vid"], [(None, "count", "deg")], P=P, as_refs=True,
    )
    j1 = hash_join(
        und, [_apply.remote(
            lambda t: pa.table({"a": t["vid"], "deg_a": t["deg"]}), r
        ) for r in deg],
        keys=["a"], P=P, as_refs=True,
    )
    j2 = hash_join(
        j1, [_apply.remote(
            lambda t: pa.table({"b": t["vid"], "deg_b": t["deg"]}), r
        ) for r in deg],
        keys=["b"], P=P, as_refs=True,
    )

    @ray.remote
    def nbr_rows(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        ra = _rank(t["deg_a"].to_numpy(), a)
        rb = _rank(t["deg_b"].to_numpy(), b)
        # neighbor rows for BOTH endpoints, tagged fwd (higher rank)
        return pa.table(
            {
                "v": np.concatenate((a, b)),
                "nbr": np.concatenate((b, a)),
                "fwd": np.concatenate((rb > ra, ra > rb)),
                "rv": np.concatenate((ra, rb)),
                "rn": np.concatenate((rb, ra)),
            }
        )

    nbrs = [nbr_rows.remote(r) for r in j2]

    # induced adjacency among neighbors: wedges at v joined vs edges
    @ray.remote
    def wedge_rows(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas().sort_values(["v", "nbr"])
        outs = {"v": [], "x": [], "y": []}
        for v, g in df.groupby("v", sort=False):
            ns = g["nbr"].to_numpy()
            if len(ns) < 2:
                continue
            iu, ju = np.triu_indices(len(ns), k=1)
            outs["v"].append(np.full(len(iu), v))
            outs["x"].append(np.minimum(ns[iu], ns[ju]))
            outs["y"].append(np.maximum(ns[iu], ns[ju]))
        if not outs["v"]:
            e = np.empty(0, np.int64)
            return pa.table({"v": e, "x": e, "y": e})
        return pa.table({k: np.concatenate(v) for k, v in outs.items()})

    wedges = exchange(nbrs, ["v"], P=P, reduce_fn=None, as_refs=True)
    wedge_refs = [wedge_rows.remote(r) for r in wedges]
    intra = hash_join(
        wedge_refs,
        [_apply.remote(
            lambda t: pa.table({"x": t["a"], "y": t["b"],
                                "hit": np.ones(len(t), np.int8)}), r
        ) for r in und],
        keys=["x", "y"], how="left semi", P=P, as_refs=True,
    )

    # assemble groups: neighbor lists + intra edges, keyed by v
    @ray.remote
    def tag_nbr(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"], "p": t["nbr"],
             "q": np.full(len(t), -1, np.int64),
             "fwd": t["fwd"].to_numpy().astype(np.int8)}
        )

    @ray.remote
    def tag_intra(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"], "p": t["x"], "q": t["y"],
             "fwd": np.zeros(len(t), np.int8)}
        )

    root_set = None if roots is None else {int(r) for r in roots}

    def run_bk(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        cliques = []
        for v, g in df.groupby("v", sort=False):
            if root_set is not None and int(v) not in root_set:
                continue
            nbr_rows_ = g[g["q"] < 0]
            fwd = set(nbr_rows_.loc[nbr_rows_["fwd"] == 1, "p"])
            bwd = set(nbr_rows_.loc[nbr_rows_["fwd"] == 0, "p"])
            adj: dict[int, set] = {}
            for p_, q_ in zip(g["p"].to_numpy(), g["q"].to_numpy()):
                if q_ >= 0:
                    adj.setdefault(int(p_), set()).add(int(q_))
                    adj.setdefault(int(q_), set()).add(int(p_))
            out: list = []
            _bron_kerbosch(adj, [int(v)], set(fwd), set(bwd), out)
            cliques.extend(c for c in out if len(c) >= min_size)
        return pa.table(
            {"clique": pa.array(cliques, pa.list_(pa.int64()))}
        )

    groups = exchange(
        [tag_nbr.remote(r) for r in nbrs]
        + [tag_intra.remote(r) for r in intra],
        ["v"], P=P, reduce_fn=run_bk, as_refs=True,
    )
    return to_dataset(groups)


def count_maximal_cliques(edges, P: int = DEFAULT_PARTITIONS) -> int:
    return int(maximal_cliques(edges, P=P).count())


def maximal_cliques_file(edges, path: str,
                         P: int = DEFAULT_PARTITIONS) -> int:
    """Stream every maximal clique to ``path`` as one
    whitespace-separated line of vertex ids
    (igraph_maximal_cliques_file, src/maximal_cliques.c:435 — same
    line format).  Streams batch-by-batch; returns the clique
    count."""
    ds = maximal_cliques(edges, P=P)
    cnt = 0
    with open(path, "w") as fh:
        for batch in ds.iter_batches(batch_format="pyarrow"):
            for clique in batch["clique"].to_pylist():
                fh.write(" ".join(str(v) for v in clique) + "\n")
                cnt += 1
    return cnt


def clique_number(edges, P: int = DEFAULT_PARTITIONS) -> int:
    """Size of the largest clique (igraph_clique_number,
    src/cliques.c)."""
    ds = maximal_cliques(edges, P=P)
    import pyarrow.compute as pc

    sizes = ds.map_batches(
        lambda t: pa.table({"n": pc.list_value_length(t["clique"])}),
        batch_format="pyarrow",
    )
    return int(sizes.max("n"))


def largest_cliques(edges, P: int = DEFAULT_PARTITIONS) -> list[list[int]]:
    """All maximum-size cliques (igraph_largest_cliques,
    src/cliques.c) — filter of the distributed maximal-clique
    enumeration."""
    rows = [r["clique"] for r in
            maximal_cliques(edges, P=P).take_all()]
    if not rows:
        return []
    k = max(len(c) for c in rows)
    return sorted([sorted(int(x) for x in c) for c in rows
                   if len(c) == k])


def _collapsed_adj(edges, n: int | None = None):
    """(n, adjacency bool matrix) of the undirected simple support —
    driver kernel helper for the exponential enumerations below
    (the reference's igraph_cliques scope is equally exponential,
    src/cliques.c)."""
    import ray as _ray

    from ..exchange import block_refs

    if isinstance(edges, pa.Table):
        refs = [edges]
    elif isinstance(edges, list):
        refs = edges
    else:
        refs = block_refs(edges)
    tabs = _ray.get(list(refs)) if refs and not isinstance(
        refs[0], pa.Table) else list(refs)
    src = np.concatenate([t["src"].to_numpy() for t in tabs]) \
        if tabs else np.empty(0, np.int64)
    dst = np.concatenate([t["dst"].to_numpy() for t in tabs]) \
        if tabs else np.empty(0, np.int64)
    if n is None:
        n = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    A = np.zeros((n, n), dtype=bool)
    keep = src != dst
    A[src[keep], dst[keep]] = True
    A[dst[keep], src[keep]] = True
    return n, A


def cliques(edges, min_size: int = 1, max_size: int = 0,
            n: int | None = None,
            max_results: int = 1_000_000) -> list[list[int]]:
    """ALL complete subgraphs with min_size <= size <= max_size
    (igraph_cliques, src/cliques.c; max_size = 0 means unbounded),
    as sorted vertex lists, lexicographic order.  Driver kernel by
    ordered extension: a (k+1)-clique is a k-clique plus a higher-id
    vertex adjacent to all members — each clique generated exactly
    once.  ``max_results`` raises loudly (never truncates)."""
    nn, A = _collapsed_adj(edges, n)
    return _cliques_dense(A, min_size, max_size, max_results)


def independent_vertex_sets(edges, min_size: int = 1, max_size: int = 0,
                            n: int | None = None,
                            max_results: int = 1_000_000):
    """All independent vertex sets (igraph_independent_vertex_sets,
    src/cliques.c — computed there and here as cliques of the
    complement)."""
    nn, A = _collapsed_adj(edges, n)
    comp = ~A
    np.fill_diagonal(comp, False)
    return _cliques_dense(comp, min_size, max_size, max_results)


def _cliques_dense(A: np.ndarray, min_size: int, max_size: int,
                   max_results: int):
    nn = A.shape[0]
    out: list[list[int]] = []
    if min_size <= 1:
        out.extend([[v] for v in range(nn)])
    level = [[v] for v in range(nn)]
    k = 1
    while level and (max_size <= 0 or k < max_size):
        nxt: list[list[int]] = []
        for c in level:
            last = c[-1]
            cand = np.nonzero(A[last, last + 1:])[0] + last + 1
            for w in cand.tolist():
                if all(A[u, w] for u in c[:-1]):
                    nc = c + [w]
                    nxt.append(nc)
                    if len(nc) >= min_size:
                        out.append(nc)
                        if len(out) > max_results:
                            raise RuntimeError(
                                f"cliques: > {max_results} sets")
        level = nxt
        k += 1
    return sorted(out)


def maximal_independent_vertex_sets(edges, n: int | None = None):
    """Bron-Kerbosch on the complement
    (igraph_maximal_independent_vertex_sets, src/cliques.c)."""
    nn, A = _collapsed_adj(edges, n)
    comp = ~A
    np.fill_diagonal(comp, False)
    adj = {v: set(np.nonzero(comp[v])[0].tolist()) for v in range(nn)}
    out: list = []
    _bron_kerbosch(adj, [], set(range(nn)), set(), out)
    return sorted(sorted(int(x) for x in c) for c in out)


def largest_independent_vertex_sets(edges, n: int | None = None):
    """igraph_largest_independent_vertex_sets."""
    sets_ = maximal_independent_vertex_sets(edges, n)
    if not sets_:
        return []
    k = max(len(s) for s in sets_)
    return [s for s in sets_ if len(s) == k]


def independence_number(edges, n: int | None = None) -> int:
    """igraph_independence_number (src/cliques.c)."""
    sets_ = maximal_independent_vertex_sets(edges, n)
    return max((len(s) for s in sets_), default=0)
