"""Graph isomorphism — reference igraph_isomorphic / VF2
(src/topology.c:783-1306).

The backtracking search itself is inherently sequential and only
sensible for small graphs (the reference's own scope: the VF2
benchmark databases ship graphs of tens-to-hundreds of vertices in
exactly the GraphDB binary format handled by sources/formats.py).
The DISTRIBUTED story is the batch API: matching benchmark suites run
thousands of graph-pair tests, and :func:`isomorphic_many` fans those
pairs out as parallel Ray tasks.

Implementation: VF2 with the standard feasibility rules (degree
compatibility, in/out-neighbor consistency, 1-look-ahead on
unmatched-neighbor counts) over directed simple graphs; undirected
inputs are handled by symmetrizing.  Candidate order is by degree
sequence rank — deterministic.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import ray


def _require_simple(edges: pa.Table, directed: bool, who: str) -> None:
    """The reference's VF2 requires simple graphs (igraph_isomorphic_vf2
    errors on multigraphs, src/topology.c:1306 via the simple-graph
    checks); _adj collapses parallel edges into sets, so accepting them
    silently would give wrong answers — raise instead."""
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    if not directed:
        src, dst = np.minimum(src, dst), np.maximum(src, dst)
    pairs = np.stack([src, dst], axis=1)
    if len(pairs) != len(np.unique(pairs, axis=0)):
        raise ValueError(
            f"{who} requires simple graphs (no parallel edges); "
            "run simplify() first"
        )


def _adj(edges: pa.Table, n: int, directed: bool):
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    if not directed:
        src, dst = (np.concatenate((src, dst)), np.concatenate((dst, src)))
    out = [set() for _ in range(n)]
    inn = [set() for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        out[a].add(b)
        inn[b].add(a)
    return out, inn


def _vf2(out1, in1, out2, in2, n) -> np.ndarray | None:
    """Mapping g1 -> g2 as an array, or None.  Vertices of g1 are
    processed in descending-degree order (classic VF2 heuristic)."""
    deg1 = np.array([len(out1[v]) + len(in1[v]) for v in range(n)])
    order = np.argsort(-deg1, kind="stable")
    core1 = np.full(n, -1, dtype=np.int64)
    core2 = np.full(n, -1, dtype=np.int64)

    def feasible(a: int, b: int) -> bool:
        if (len(out1[a]) != len(out2[b])) or (len(in1[a]) != len(in2[b])):
            return False
        # mapped-neighbor consistency both directions
        for x in out1[a]:
            m = core1[x]
            if m >= 0 and m not in out2[b]:
                return False
        for x in in1[a]:
            m = core1[x]
            if m >= 0 and m not in in2[b]:
                return False
        for y in out2[b]:
            m = core2[y]
            if m >= 0 and m not in out1[a]:
                return False
        for y in in2[b]:
            m = core2[y]
            if m >= 0 and m not in in1[a]:
                return False
        return True

    def rec(i: int) -> bool:
        if i == n:
            return True
        a = int(order[i])
        for b in range(n):
            if core2[b] < 0 and feasible(a, b):
                core1[a] = b
                core2[b] = a
                if rec(i + 1):
                    return True
                core1[a] = -1
                core2[b] = -1
        return False

    return core1 if rec(0) else None


def isomorphic(
    edges1: pa.Table, n1: int, edges2: pa.Table, n2: int,
    directed: bool = True, return_mapping: bool = False,
):
    """igraph_isomorphic_vf2 (src/topology.c:1306) for simple graphs.
    Returns bool, or (bool, mapping array | None)."""
    _require_simple(edges1, directed, "isomorphic")
    _require_simple(edges2, directed, "isomorphic")
    if n1 != n2 or len(edges1) != len(edges2):
        return (False, None) if return_mapping else False
    out1, in1 = _adj(edges1, n1, directed)
    out2, in2 = _adj(edges2, n2, directed)
    # quick invariant: sorted degree sequences must agree
    d1 = sorted((len(out1[v]), len(in1[v])) for v in range(n1))
    d2 = sorted((len(out2[v]), len(in2[v])) for v in range(n2))
    if d1 != d2:
        return (False, None) if return_mapping else False
    m = _vf2(out1, in1, out2, in2, n1)
    if return_mapping:
        return m is not None, m
    return m is not None


def subisomorphic(
    pattern: pa.Table, np_: int, target: pa.Table, nt: int,
    directed: bool = True, induced: bool = False,
    return_mapping: bool = False,
):
    """igraph_subisomorphic_vf2 (src/topology.c:2137): is ``pattern``
    a subgraph of ``target``?  Default is monomorphism semantics
    (pattern edges must exist in the target; extra target edges
    allowed); ``induced=True`` requires the induced subgraph to match
    exactly (igraph_subisomorphic_lad's induced flag)."""
    if np_ > nt or len(pattern) > len(target) and induced:
        return (False, None) if return_mapping else False
    outp, inp = _adj(pattern, np_, directed)
    outt, int_ = _adj(target, nt, directed)
    degp = np.array([len(outp[v]) + len(inp[v]) for v in range(np_)])
    order = np.argsort(-degp, kind="stable")
    core1 = np.full(np_, -1, dtype=np.int64)
    used = np.zeros(nt, dtype=bool)

    def feasible(a: int, b: int) -> bool:
        if len(outp[a]) > len(outt[b]) or len(inp[a]) > len(int_[b]):
            return False
        for x in outp[a]:
            m = core1[x]
            if m >= 0 and m not in outt[b]:
                return False
        for x in inp[a]:
            m = core1[x]
            if m >= 0 and m not in int_[b]:
                return False
        if induced:
            # no target edge may exist between mapped images of
            # pattern non-edges
            for c in range(np_):
                m = core1[c]
                if m < 0 or c == a:
                    continue
                if (m in outt[b]) != (c in outp[a]):
                    return False
                if (m in int_[b]) != (c in inp[a]):
                    return False
        return True

    def rec(i: int) -> bool:
        if i == np_:
            return True
        a = int(order[i])
        for b in range(nt):
            if not used[b] and feasible(a, b):
                core1[a] = b
                used[b] = True
                if rec(i + 1):
                    return True
                core1[a] = -1
                used[b] = False
        return False

    ok = rec(0)
    if return_mapping:
        return ok, (core1 if ok else None)
    return ok


@ray.remote
def _iso_task(e1: pa.Table, n1: int, e2: pa.Table, n2: int,
              directed: bool) -> bool:
    return isomorphic(e1, n1, e2, n2, directed=directed)


def isomorphic_many(pairs, directed: bool = True) -> list[bool]:
    """Batch isomorphism tests — one Ray task per pair, the
    benchmark-database workload shape.  ``pairs``: iterable of
    ((edges1, n1), (edges2, n2))."""
    futs = [
        _iso_task.remote(e1, n1, e2, n2, directed)
        for (e1, n1), (e2, n2) in pairs
    ]
    return ray.get(futs)


def _vf2_all(out1, in1, out2, in2, n, limit=None):
    """Enumerate ALL isomorphism mappings g1 -> g2 (the callback form
    of the reference's igraph_isomorphic_function_vf2 /
    igraph_get_isomorphisms_vf2, src/topology.c)."""
    deg1 = np.array([len(out1[v]) + len(in1[v]) for v in range(n)])
    order = np.argsort(-deg1, kind="stable")
    core1 = np.full(n, -1, dtype=np.int64)
    core2 = np.full(n, -1, dtype=np.int64)
    found: list[np.ndarray] = []

    def feasible(a: int, b: int) -> bool:
        if (len(out1[a]) != len(out2[b])) or (len(in1[a]) != len(in2[b])):
            return False
        for x in out1[a]:
            m = core1[x]
            if m >= 0 and m not in out2[b]:
                return False
        for x in in1[a]:
            m = core1[x]
            if m >= 0 and m not in in2[b]:
                return False
        for y in out2[b]:
            m = core2[y]
            if m >= 0 and m not in out1[a]:
                return False
        for y in in2[b]:
            m = core2[y]
            if m >= 0 and m not in in1[a]:
                return False
        return True

    def rec(i: int) -> bool:
        if i == n:
            found.append(core1.copy())
            return limit is not None and len(found) >= limit
        a = int(order[i])
        for b in range(n):
            if core2[b] < 0 and feasible(a, b):
                core1[a] = b
                core2[b] = a
                if rec(i + 1):
                    return True
                core1[a] = -1
                core2[b] = -1
        return False

    rec(0)
    return found


def get_isomorphisms(
    edges1: pa.Table, n1: int, edges2: pa.Table, n2: int,
    directed: bool = True, limit: int | None = None,
) -> list[np.ndarray]:
    """All g1 -> g2 isomorphism mappings
    (igraph_get_isomorphisms_vf2, src/topology.c); on g1 == g2 this
    enumerates the automorphism group's elements."""
    if n1 != n2 or len(edges1) != len(edges2):
        return []
    out1, in1 = _adj(edges1, n1, directed)
    out2, in2 = _adj(edges2, n2, directed)
    d1 = sorted((len(out1[v]), len(in1[v])) for v in range(n1))
    d2 = sorted((len(out2[v]), len(in2[v])) for v in range(n2))
    if d1 != d2:
        return []
    return _vf2_all(out1, in1, out2, in2, n1, limit=limit)


def count_isomorphisms(
    edges1: pa.Table, n1: int, edges2: pa.Table, n2: int,
    directed: bool = True,
) -> int:
    """igraph_count_isomorphisms_vf2; count_isomorphisms(g, g) is the
    automorphism group order (the enumeration-based stand-in for
    igraph_automorphisms' BLISS counting)."""
    return len(get_isomorphisms(edges1, n1, edges2, n2, directed))


def get_subisomorphisms(
    pattern: pa.Table, np_: int, target: pa.Table, nt: int,
    directed: bool = True, induced: bool = False,
    limit: int | None = None,
) -> list[np.ndarray]:
    """All pattern -> target subgraph-isomorphism mappings
    (igraph_get_subisomorphisms_vf2, src/topology.c:2521-2661).
    Default monomorphism semantics like :func:`subisomorphic`;
    ``induced=True`` requires exact induced match.  ``limit`` bounds
    enumeration on highly symmetric targets."""
    if np_ > nt:
        return []
    outp, inp = _adj(pattern, np_, directed)
    outt, int_ = _adj(target, nt, directed)
    degp = np.array([len(outp[v]) + len(inp[v]) for v in range(np_)])
    order = np.argsort(-degp, kind="stable")
    core1 = np.full(np_, -1, dtype=np.int64)
    used = np.zeros(nt, dtype=bool)
    found: list[np.ndarray] = []

    def feasible(a: int, b: int) -> bool:
        if len(outp[a]) > len(outt[b]) or len(inp[a]) > len(int_[b]):
            return False
        for x in outp[a]:
            m = core1[x]
            if m >= 0 and m not in outt[b]:
                return False
        for x in inp[a]:
            m = core1[x]
            if m >= 0 and m not in int_[b]:
                return False
        if induced:
            for c in range(np_):
                m = core1[c]
                if m < 0 or c == a:
                    continue
                if (m in outt[b]) != (c in outp[a]):
                    return False
                if (m in int_[b]) != (c in inp[a]):
                    return False
        return True

    def rec(i: int) -> bool:
        if i == np_:
            found.append(core1.copy())
            return limit is not None and len(found) >= limit
        a = int(order[i])
        for b in range(nt):
            if not used[b] and feasible(a, b):
                core1[a] = b
                used[b] = True
                stop = rec(i + 1)
                core1[a] = -1
                used[b] = False
                if stop:
                    return True
        return False

    rec(0)
    return found


def count_subisomorphisms(
    pattern: pa.Table, np_: int, target: pa.Table, nt: int,
    directed: bool = True, induced: bool = False,
) -> int:
    """igraph_count_subisomorphisms_vf2 (src/topology.c:2441)."""
    return len(get_subisomorphisms(pattern, np_, target, nt,
                                   directed=directed, induced=induced))


# -- canonical labeling (BLISS replacement) ----------------------------------
#
# The reference wraps the BLISS library for igraph_canonical_permutation /
# igraph_isomorphic_bliss / igraph_automorphisms (src/topology.c:2695-2906,
# src/bliss.cc).  BLISS computes *a* canonical form relative to its
# refinement heuristics; any isomorphism-invariant canonical form is an
# equally valid contract, so instead of porting the refinement machinery we
# pin an explicit, oracle-checkable definition: the canonical labeling is
# the vertex relabeling that MINIMIZES the border-order adjacency bitstring
# (cell (i,j) at position j*j+i if i<j, i*i+i if i==j, i*i+i+1+j if i>j),
# with ties broken by the lexicographically smallest labeling vector.
# Computed exactly by branch-and-bound over labelings with prefix pruning —
# the border order makes each new position append a contiguous bit block,
# so a prefix that already exceeds the incumbent prunes the whole subtree.
#
# Like the reference's BLISS scope this is a small-graph driver kernel
# (worst case exponential; highly symmetric graphs tie massively), guarded
# by a loud node budget.  Multi-edges collapse (BLISS also requires simple
# graphs); self-loops are carried in the diagonal bits.


def _canon_search(edges: pa.Table, n: int, directed: bool,
                  node_budget: int = 5_000_000):
    """(blocks tuple, labeling ndarray, n_optimal) for the minimum
    border-order code.  n_optimal == |Aut(G)| (optimal labelings form
    a coset of the automorphism group).

    Pruning invariant: ``tight`` means the path's blocks equal the
    incumbent's prefix exactly, so comparing the next block against
    ``best[k]`` is meaningful (greater prunes, equal stays tight,
    smaller clears tight).  Once a path diverges smaller, every leaf
    below it beats the incumbent, so no comparisons apply until the
    first such leaf replaces ``best`` — after which this node's path
    IS the incumbent prefix again (depth-first order guarantees any
    replacement during a node's loop passed through its path), which
    ``best['gen']`` detects for the remaining candidates."""
    out, _inn = _adj(edges, n, directed)
    adj = [np.zeros(n, dtype=bool) for _ in range(n)]
    for u in range(n):
        for v in out[u]:
            adj[u][v] = True

    perm: list[int] = []           # position k -> vertex
    used = np.zeros(n, dtype=bool)
    cur: list[int] = []            # per-level bit blocks (ints)
    best: dict[str, Any] = {
        "blocks": None, "labeling": None, "count": 0, "gen": 0,
    }
    nodes = [0]

    def leaf(tight: bool):
        lab = np.empty(n, dtype=np.int64)
        for pos, v in enumerate(perm):
            lab[v] = pos
        if tight and best["blocks"] is not None:
            # full code identical to the incumbent: an automorphism
            best["count"] += 1
            if lab.tolist() < best["labeling"].tolist():
                best["labeling"] = lab
        else:
            # first leaf, or strictly smaller at the first divergence
            best["blocks"] = tuple(cur)
            best["labeling"] = lab
            best["count"] = 1
            best["gen"] += 1

    def rec(k: int, tight: bool):
        nodes[0] += 1
        if nodes[0] > node_budget:
            raise RuntimeError(
                f"canonical_permutation: node budget {node_budget} "
                f"exceeded (n={n}; highly symmetric input?) — this is "
                "a small-graph driver kernel, like the reference's "
                "BLISS scope")
        if k == n:
            leaf(tight)
            return
        gen_in = best["gen"]
        for v in range(n):
            if used[v]:
                continue
            block = 0
            for i in range(k):
                block = (block << 1) | bool(adj[perm[i]][v])
            block = (block << 1) | bool(adj[v][v])
            for j in range(k):
                block = (block << 1) | bool(adj[v][perm[j]])
            eff_tight = tight or best["gen"] > gen_in
            if eff_tight:
                bb = best["blocks"]
                if block > bb[k]:
                    continue
                child_tight = block == bb[k]
            else:
                child_tight = False
            perm.append(v)
            used[v] = True
            cur.append(block)
            rec(k + 1, child_tight)
            perm.pop()
            used[v] = False
            cur.pop()

    rec(0, False)
    return best["blocks"], best["labeling"], best["count"]


def canonical_permutation(
    edges: pa.Table, n: int, directed: bool = True,
    node_budget: int = 5_000_000,
) -> np.ndarray:
    """labeling[v] = canonical new id of old vertex v
    (igraph_canonical_permutation, src/topology.c:2695-2762; BLISS
    stand-in — see _canon_search for the pinned canonical-form
    definition)."""
    _, lab, _ = _canon_search(edges, n, directed, node_budget)
    return lab


def canonical_form(
    edges: pa.Table, n: int, directed: bool = True,
    node_budget: int = 5_000_000,
) -> tuple:
    """The canonical border-order block tuple — equal across graphs
    iff they are isomorphic (same n / directedness assumed)."""
    blocks, _, _ = _canon_search(edges, n, directed, node_budget)
    return blocks


def isomorphic_bliss(
    edges1: pa.Table, n1: int, edges2: pa.Table, n2: int,
    directed: bool = True, node_budget: int = 5_000_000,
) -> tuple[bool, np.ndarray | None]:
    """(isomorphic?, mapping g1->g2 or None) via canonical-form
    comparison (igraph_isomorphic_bliss, src/topology.c:2817-2906:
    canonize both, compare, compose the labelings).

    Multi-edges COLLAPSE before canonization (BLISS itself only
    supports simple graphs — the reference errors on multigraphs;
    here the simple supports are compared instead).  NOTE this
    differs from :func:`isomorphic` (VF2), whose edge-list-length
    fast path makes it multigraph-pessimistic: on inputs with
    duplicate rows the two functions answer different questions —
    simplify first if that matters."""
    if n1 != n2:
        return False, None
    if n1 == 0:
        return True, np.empty(0, dtype=np.int64)
    b1, l1, _ = _canon_search(edges1, n1, directed, node_budget)
    b2, l2, _ = _canon_search(edges2, n2, directed, node_budget)
    if b1 != b2:
        return False, None
    # map12[v] = vertex of g2 at g1-canonical position l1[v]
    pos2 = np.empty(n2, dtype=np.int64)
    pos2[l2] = np.arange(n2)
    return True, pos2[l1]


def automorphism_group_order(
    edges: pa.Table, n: int, directed: bool = True,
    node_budget: int = 5_000_000,
) -> int:
    """|Aut(G)| (igraph_automorphisms, src/topology.c — BLISS group
    counting): the optimal labelings of the canonical search form a
    coset of Aut(G), so their count is the group order.  Exponential
    for highly symmetric graphs (the budget guard raises loudly);
    cross-checked against VF2 enumeration in tests."""
    _, _, cnt = _canon_search(edges, n, directed, node_budget)
    return cnt


def subisomorphic_lad(
    pattern: pa.Table, np_: int, target: pa.Table, nt: int,
    domains: list | None = None, induced: bool = False,
    all_maps: bool = False, map_limit: int | None = None,
):
    """igraph_subisomorphic_lad (src/lad.c:1466, Solnon's LAD):
    domain-constrained subgraph isomorphism on simple UNDIRECTED
    graphs.  ``domains[u]`` (optional) lists the allowed target
    vertices for pattern vertex u — the feature VF2 lacks; ``induced``
    requires pattern non-edges to map to target non-edges.

    Returns ``(iso, map)`` or, with ``all_maps``, ``(iso, maps)``
    where maps is a list of per-pattern-vertex target arrays.

    Pinned divergence: candidate domains are pruned to a fixpoint of
    NEIGHBORHOOD arc consistency (every candidate must keep a
    candidate in each pattern-neighbor's domain) + forward checking,
    instead of LAD's all-different matching filter — identical
    answers, different pruning power (the matching filter only
    affects speed, src/lad.c:992-1100)."""
    # undirected simple adjacency as python sets
    def und(edges, n):
        s = edges["src"].to_numpy()
        d = edges["dst"].to_numpy()
        adj = [set() for _ in range(n)]
        for u, v in zip(s.tolist(), d.tolist()):
            if u == v:
                continue
            adj[u].add(v)
            adj[v].add(u)
        return adj

    padj = und(pattern, np_)
    tadj = und(target, nt)
    pdeg = [len(a) for a in padj]
    tdeg = [len(a) for a in tadj]

    dom = []
    for u in range(np_):
        cand = set(int(x) for x in domains[u]) if domains is not None \
            else set(range(nt))
        dom.append({t for t in cand if 0 <= t < nt and tdeg[t] >= pdeg[u]})

    # arc-consistency fixpoint (igraph_i_lad_updateDomains semantics)
    changed = True
    while changed:
        changed = False
        for u in range(np_):
            bad = [t for t in dom[u]
                   if any(not (tadj[t] & dom[v]) for v in padj[u])]
            if bad:
                dom[u] -= set(bad)
                changed = True
        if any(not d for d in dom):
            return (False, []) if all_maps else (False, None)

    order = sorted(range(np_), key=lambda u: (len(dom[u]), -pdeg[u]))
    assign = np.full(np_, -1, dtype=np.int64)
    used = set()
    sols: list[np.ndarray] = []

    def feasible(u: int, t: int) -> bool:
        for v in padj[u]:
            m = assign[v]
            if m >= 0 and m not in tadj[t]:
                return False
        if induced:
            for v in range(np_):
                m = assign[v]
                if m < 0 or v == u or v in padj[u]:
                    continue
                if m in tadj[t]:
                    return False
        return True

    def rec(i: int) -> bool:
        if i == np_:
            sols.append(assign.copy())
            return not all_maps or (map_limit is not None
                                    and len(sols) >= map_limit)
        u = order[i]
        for t in sorted(dom[u]):
            if t in used or not feasible(u, t):
                continue
            assign[u] = t
            used.add(t)
            if rec(i + 1):
                return True
            assign[u] = -1
            used.discard(t)
        return False

    rec(0)
    if all_maps:
        return (len(sols) > 0, sols)
    return (len(sols) > 0, sols[0] if sols else None)
