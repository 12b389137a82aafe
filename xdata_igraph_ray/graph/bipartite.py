"""Bipartite constructors / conversions / predicates — the rest of
the reference's igraph_bipartite.h surface (src/bipartite.c).  The
detection (flow.bipartite_types), one-mode projection
(vertex_similarity.bipartite_projection) and maximum matching
(flow.bipartite_matching) already live in their algorithm modules;
this module holds the constructors and the incidence conversions.

Vertex convention (the reference's): the bipartite graph has
n1 + n2 vertices, ids 0..n1-1 are the first type (types[v] = 0),
n1..n1+n2-1 the second (types[v] = 1).

The incidence EXPORT is sparse COO (row, col, count) instead of the
reference's dense matrix (src/bipartite.c:igraph_get_incidence) — a
web-scale bipartite table must never be densified; pinned divergence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .generators import _table

__all__ = [
    "full_bipartite",
    "bipartite_game_gnp",
    "bipartite_game_gnm",
    "incidence",
    "get_incidence",
    "bipartite_projection_size",
    "create_bipartite",
    "is_matching",
    "is_maximal_matching",
]


def create_bipartite(types, edges, directed: bool = False) -> pa.Table:
    """Validated bipartite edge table (igraph_create_bipartite,
    src/bipartite.c:452): every edge must connect the two type
    classes; vertex ids must lie in [0, len(types)).  Returns the
    (src, dst) table; the types vector is the caller's vertex
    attribute, same as the reference's separation of graph and
    types.  ``directed`` is accepted for signature parity — an edge
    TABLE carries no directedness flag; interpretation is the
    caller's, as everywhere in this package."""
    types = np.asarray(types).astype(bool)
    n = len(types)
    e = np.asarray(list(edges) if not isinstance(edges, np.ndarray)
                   else edges, dtype=np.int64)
    if e.ndim == 1:
        if len(e) % 2:
            raise ValueError("Invalid (odd) edges vector")
        e = e.reshape(-1, 2)
    elif e.ndim != 2 or (len(e) and e.shape[1] != 2):
        raise ValueError("edges must be (src, dst) pairs")
    if len(e):
        if e.min() < 0 or e.max() >= n:
            raise ValueError("Invalid vertex id")
        if (types[e[:, 0]] == types[e[:, 1]]).any():
            raise ValueError("Invalid edges, not a bipartite graph")
    return _table(e[:, 0] if len(e) else np.empty(0, np.int64),
                  e[:, 1] if len(e) else np.empty(0, np.int64))


def full_bipartite(n1: int, n2: int, directed: bool = False,
                   mode: str = "all") -> pa.Table:
    """Complete bipartite graph (igraph_full_bipartite,
    src/bipartite.c): every (first, second) pair.  ``mode`` (directed
    only): 'out' first->second, 'in' second->first, 'all' both."""
    a = np.repeat(np.arange(n1, dtype=np.int64), n2)
    b = np.tile(np.arange(n1, n1 + n2, dtype=np.int64), n1)
    if not directed or mode == "out":
        return _table(a, b)
    if mode == "in":
        return _table(b, a)
    return _table(np.concatenate([a, b]), np.concatenate([b, a]))


def _pairs_from_index(idx: np.ndarray, n1: int, n2: int):
    return idx // n2, n1 + idx % n2


def bipartite_game_gnp(n1: int, n2: int, p: float,
                       directed: bool = False, mode: str = "out",
                       seed: int = 42) -> pa.Table:
    """Bipartite G(n1,n2,p) (igraph_bipartite_game_gnp,
    src/bipartite.c): each of the n1*n2 pairs independently with
    probability p — geometric skips over the linearized grid, the
    same sampling the plain gnp generator uses."""
    if not 0 <= p <= 1:
        raise ValueError("invalid connection probability")
    rng = np.random.default_rng(seed)
    sides = ["out", "in"] if (directed and mode == "all") else [mode]
    srcs, dsts = [], []
    for s_i, m in enumerate(sides):
        total = n1 * n2
        idx = []
        pos = -1
        if p > 0:
            while True:
                pos += rng.geometric(p)
                if pos >= total:
                    break
                idx.append(pos)
        idx = np.asarray(idx, dtype=np.int64)
        a, b = _pairs_from_index(idx, n1, n2)
        if m == "in" and directed:
            a, b = b, a
        srcs.append(a)
        dsts.append(b)
    return _table(np.concatenate(srcs) if srcs else [],
                  np.concatenate(dsts) if dsts else [])


def bipartite_game_gnm(n1: int, n2: int, m: int,
                       directed: bool = False, mode: str = "out",
                       seed: int = 42) -> pa.Table:
    """Bipartite G(n1,n2,m): m distinct pairs uniformly
    (igraph_bipartite_game_gnm, src/bipartite.c).  Directed
    mode='all' samples over BOTH orientations (2*n1*n2 slots), like
    the reference."""
    from .nongraph import random_sample

    both = directed and mode == "all"
    total = n1 * n2 * (2 if both else 1)
    if m > total:
        raise ValueError("too many edges requested")
    idx = random_sample(0, total - 1, m, seed=seed)
    if both:
        rev = idx >= n1 * n2
        idx = np.where(rev, idx - n1 * n2, idx)
        a, b = _pairs_from_index(idx, n1, n2)
        a, b = np.where(rev, b, a), np.where(rev, a, b)
        return _table(a, b)
    a, b = _pairs_from_index(idx, n1, n2)
    if directed and mode == "in":
        a, b = b, a
    return _table(a, b)


def incidence(mat: np.ndarray, directed: bool = False,
              mode: str = "out", multiple: bool = False) -> pa.Table:
    """Graph from an n1 x n2 incidence matrix (igraph_incidence,
    src/bipartite.c): entry (i, j) connects first-type i with
    second-type n1+j; with ``multiple`` the entry's integer value
    gives that many parallel edges, otherwise any nonzero gives
    one."""
    mat = np.asarray(mat)
    n1 = mat.shape[0]
    ii, jj = np.nonzero(mat)
    if multiple:
        # truncate toward zero to match the reference's C long cast
        # (src/bipartite.c incidence element -> (long) entry), not
        # round-half-even: entry 2.7 means 2 parallel edges there.
        reps = np.trunc(mat[ii, jj]).astype(np.int64)
        ii = np.repeat(ii, reps)
        jj = np.repeat(jj, reps)
    a = ii.astype(np.int64)
    b = (jj + n1).astype(np.int64)
    if not directed or mode == "out":
        return _table(a, b)
    if mode == "in":
        return _table(b, a)
    return _table(np.concatenate([a, b]), np.concatenate([b, a]))


def get_incidence(edges, n1: int, P: int = 8) -> pa.Table:
    """Sparse COO incidence (row, col, count) of a bipartite edge
    table whose src vertices are the first type 0..n1-1
    (igraph_get_incidence, src/bipartite.c — dense there; sparse
    here by design).  Distributed: one groupby-count exchange."""
    from ..exchange import block_refs, groupby_agg

    refs = edges if isinstance(edges, list) else block_refs(edges)
    counts = groupby_agg(refs, ["src", "dst"],
                         [(None, "count", "count")], P=P)
    t = counts.to_pandas()
    row = t["src"].to_numpy().astype(np.int64)
    col = t["dst"].to_numpy().astype(np.int64) - n1
    if (row >= n1).any() or (col < 0).any():
        raise ValueError(
            "get_incidence: edges must run first-type (src < n1) -> "
            "second-type (dst >= n1)")
    order = np.lexsort((col, row))
    return pa.table({
        "row": row[order], "col": col[order],
        "count": t["count"].to_numpy().astype(np.int64)[order],
    })


def bipartite_projection_size(edges, P: int = 8,
                              max_group: int | None = None) -> dict:
    """(vcount1, ecount1, vcount2, ecount2) of the two one-mode
    projections without materializing their weights
    (igraph_bipartite_projection_size, src/bipartite.c).  vcount =
    distinct vertices of that type IN THE EDGE TABLE (the reference
    counts every typed vertex including fully isolated ones, which an
    edge table cannot see — pinned divergence); ecount = the
    projection's pair count, computed distributed (the projection is
    never pulled to the driver).  ``max_group`` caps hub fan-out
    (counts become lower bounds, logged by the pair expander)."""
    import ray as _ray

    from ..exchange import block_refs as _brefs, distinct
    from .vertex_similarity import bipartite_projection

    refs = edges if isinstance(edges, list) else _brefs(edges)

    @_ray.remote
    def side(t: pa.Table, col: str) -> pa.Table:
        return pa.table({"vid": t[col]})

    out: dict = {}
    for which, col, vk, ek in (("first", "src", "vcount1", "ecount1"),
                               ("second", "dst", "vcount2", "ecount2")):
        uniq = distinct([side.remote(r, col) for r in refs],
                        ["vid"], P=P)
        out[vk] = int(uniq.count())
        proj = bipartite_projection(edges, which=which, P=P,
                                    max_group=max_group)
        out[ek] = int(proj.count())
    return out


def _matching_pairs(matching: np.ndarray):
    matching = np.asarray(matching, dtype=np.int64)
    matched = np.nonzero(matching >= 0)[0]
    return matching, matched


def is_matching(edges: pa.Table, n: int, matching,
                types=None) -> bool:
    """igraph_is_matching (src/matching.c): matching[v] = partner or
    -1; valid iff symmetric, every matched pair is an edge, and (with
    ``types``) partners have different types."""
    matching, matched = _matching_pairs(matching)
    if len(matching) != n:
        raise ValueError("matching length must equal vertex count")
    if (matching >= n).any():
        return False
    for v in matched.tolist():
        w = int(matching[v])
        if matching[w] != v or w == v:
            return False
    if types is not None:
        types = np.asarray(types)
        for v in matched.tolist():
            if types[v] == types[int(matching[v])]:
                return False
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    eset = set(zip(s.tolist(), d.tolist()))
    eset |= {(b, a) for a, b in eset}
    for v in matched.tolist():
        w = int(matching[v])
        if v < w and (v, w) not in eset:
            return False
    return True


def is_maximal_matching(edges: pa.Table, n: int, matching,
                        types=None) -> bool:
    """igraph_is_maximal_matching: a valid matching with no edge
    joining two unmatched vertices (of different types when given)."""
    if not is_matching(edges, n, matching, types=types):
        return False
    matching = np.asarray(matching, dtype=np.int64)
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    types = None if types is None else np.asarray(types)
    for a, b in zip(s.tolist(), d.tolist()):
        if a == b:
            continue
        if matching[a] < 0 and matching[b] < 0 and (
                types is None or types[a] != types[b]):
            return False
    return True


def maximum_matching(edges, n: int, P: int = 8, weights=None) -> dict:
    """Maximum-cardinality matching on GENERAL graphs (Edmonds
    blossom, O(V^3) with union-by-base contraction).

    EXTENSION BEYOND THE REFERENCE: igraph_maximum_matching
    (src/matching.c:975-985) raises IGRAPH_UNIMPLEMENTED for every
    input — "maximum matching on general graphs not implemented yet".
    Here the unweighted case is solved exactly; ``weights`` still
    raises NotImplementedError (the reference has no weighted path
    either).  Deterministic: vertices are tried in id order over
    id-sorted adjacency, with a greedy first-unmatched-neighbor seed
    pass.  Like the reference's own sequential matching kernels this
    is a driver-side small-graph kernel — the one distributed pass is
    the support collapse.

    Returns {"matching" (partner-or--1 int64 array, the
    igraph_is_matching layout), "matching_size"}."""
    if weights is not None:
        raise NotImplementedError(
            "weighted maximum matching on general graphs is not "
            "implemented (the reference raises IGRAPH_UNIMPLEMENTED "
            "for all of igraph_maximum_matching)")
    from collections import deque

    from .separators import collapse_support

    adj_sets = collapse_support(edges, n, P=P)
    adj = [sorted(s - {v}) for v, s in enumerate(adj_sets)]
    match = np.full(n, -1, dtype=np.int64)
    # greedy seed: first unmatched neighbor in id order
    for v in range(n):
        if match[v] == -1:
            for w in adj[v]:
                if match[w] == -1:
                    match[v] = w
                    match[w] = v
                    break

    p = np.full(n, -1, dtype=np.int64)
    base = np.arange(n, dtype=np.int64)

    def _lca(a: int, b: int) -> int:
        seen = np.zeros(n, dtype=bool)
        while True:
            a = int(base[a])
            seen[a] = True
            if match[a] == -1:
                break
            a = int(p[match[a]])
        while True:
            b = int(base[b])
            if seen[b]:
                return b
            b = int(p[match[b]])

    def _mark(v: int, cur: int, child: int, flag: np.ndarray) -> None:
        while int(base[v]) != cur:
            flag[base[v]] = True
            flag[base[match[v]]] = True
            p[v] = child
            child = int(match[v])
            v = int(p[child])

    def _augment_from(root: int) -> bool:
        p[:] = -1
        base[:] = np.arange(n)
        used = np.zeros(n, dtype=bool)
        used[root] = True
        q = deque([root])
        while q:
            v = q.popleft()
            for to in adj[v]:
                if base[v] == base[to] or match[v] == to:
                    continue
                if to == root or (match[to] != -1
                                  and p[match[to]] != -1):
                    # odd cycle: contract the blossom at the LCA
                    cur = _lca(v, to)
                    flag = np.zeros(n, dtype=bool)
                    _mark(v, cur, to, flag)
                    _mark(to, cur, v, flag)
                    for i in range(n):
                        if flag[base[i]]:
                            base[i] = cur
                            if not used[i]:
                                used[i] = True
                                q.append(i)
                elif p[to] == -1:
                    p[to] = v
                    if match[to] == -1:
                        u = to  # augment along parent pointers
                        while u != -1:
                            pv = int(p[u])
                            nxt = int(match[pv])
                            match[u] = pv
                            match[pv] = u
                            u = nxt
                        return True
                    used[match[to]] = True
                    q.append(int(match[to]))
        return False

    for v in range(n):
        if match[v] == -1:
            _augment_from(v)
    return {"matching": match,
            "matching_size": int((match >= 0).sum()) // 2}
