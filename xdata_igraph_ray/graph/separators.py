"""Vertex separators and cohesive blocking.

Reference: igraph_is_separator / igraph_is_minimal_separator
(src/separators.c:119,203), igraph_all_minimal_st_separators
(src/separators.c:421 — Berry-Bordat-Cogis generation),
igraph_minimum_size_separators (src/separators.c:643 — Even-Tarjan
reduction + enumeration of all minimum s-t vertex cuts via the
Picard-Queyranne closed-set lattice, st-cuts.c), and
igraph_cohesive_blocks (src/cohesive_blocks.c:202 — Moody-White
cohesive blocking).

Execution shape: the edge table is collapsed to the undirected simple
support with ONE distributed distinct pass; the combinatorial kernels
then run on the driver — the reference algorithms are inherently
sequential and exponential-ish (separator enumeration), used on
analysis-scale graphs, the same stance as the fastgreedy / walktrap /
Girvan-Newman small-graph kernels here.  The distributed
vertex-connectivity / maxflow path (flow.py) remains the entry point
for single large-graph connectivity questions."""

from __future__ import annotations

from collections import deque

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import DEFAULT_PARTITIONS, block_refs, distinct

INF = float("inf")


@ray.remote
def _canon(tbl: pa.Table) -> pa.Table:
    names = tbl.column_names
    s, d = ("a", "b") if "a" in names else ("src", "dst")
    src = tbl[s].to_numpy()
    dst = tbl[d].to_numpy()
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return pa.table({"a": np.minimum(src, dst), "b": np.maximum(src, dst)})


def collapse_support(edges: Dataset | list, n: int,
                     P: int = DEFAULT_PARTITIONS) -> list[set]:
    """Distributed distinct undirected support -> driver adjacency
    sets (the one distributed pass; the kernels below are sequential
    reference algorithms)."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    canon = [_canon.remote(r) for r in refs]
    uniq = distinct(canon, ["a", "b"], P=P, as_refs=True)
    adj: list[set] = [set() for _ in range(n)]
    for t in ray.get(uniq):
        for a, b in zip(t["a"].to_numpy().tolist(),
                        t["b"].to_numpy().tolist()):
            adj[a].add(b)
            adj[b].add(a)
    return adj


# -- basic predicates --------------------------------------------------------


def _components_excl(adj, excluded: set) -> list[list[int]]:
    n = len(adj)
    seen = [False] * n
    out = []
    for v in range(n):
        if seen[v] or v in excluded:
            continue
        comp = []
        q = deque([v])
        seen[v] = True
        while q:
            x = q.popleft()
            comp.append(x)
            for y in adj[x]:
                if not seen[y] and y not in excluded:
                    seen[y] = True
                    q.append(y)
        out.append(comp)
    return out


def is_separator(adj, S) -> bool:
    """igraph_is_separator (src/separators.c:119): removing S leaves
    a disconnected graph (or removes every vertex -> False)."""
    S = set(S)
    if len(S) >= len(adj):
        return False
    comps = _components_excl(adj, S)
    return len(comps) > 1


def is_minimal_separator(adj, S) -> bool:
    """igraph_is_minimal_separator (src/separators.c:203): S
    separates, and no proper subset does — equivalently at least two
    components of G-S are FULL (their neighborhood is exactly S)."""
    S = set(S)
    if not is_separator(adj, S):
        return False
    full = 0
    for comp in _components_excl(adj, S):
        nb = set()
        for v in comp:
            nb |= adj[v] & S
        if nb == S:
            full += 1
    return full >= 2


# -- all minimal (s,t) separators (Berry-Bordat-Cogis) -----------------------


def all_minimal_st_separators(adj) -> list[tuple[int, ...]]:
    """Every vertex set that is a minimal (s,t)-separator for some
    pair — reference igraph_all_minimal_st_separators
    (src/separators.c:421).  Seeds: N(C) of the components C of
    G - N[v] per vertex v; generation: for basis S and x in S, the
    N(C) of components of G - (S u N(x))."""
    n = len(adj)
    found: list[tuple[int, ...]] = []
    seen: set[tuple[int, ...]] = set()

    def store(excluded: set):
        for comp in _components_excl(adj, excluded):
            nb = set()
            for v in comp:
                nb |= adj[v] & excluded
            key = tuple(sorted(nb))
            if key and key not in seen:
                seen.add(key)
                found.append(key)

    for v in range(n):
        store(adj[v] | {v})
    ptr = 0
    while ptr < len(found):
        basis = found[ptr]
        for x in basis:
            store(set(basis) | adj[x])
        ptr += 1
    return found


# -- driver maxflow + all minimum vertex cuts --------------------------------


def _maxflow_ek(nv, arcs, caps, s, t):
    """Edmonds-Karp on an arc list; returns (value, flow array)."""
    head = [[] for _ in range(nv)]  # arc ids leaving each node
    frm = [0] * (2 * len(arcs))
    to = [0] * (2 * len(arcs))
    cap = [0.0] * (2 * len(arcs))
    for i, ((u, v), c) in enumerate(zip(arcs, caps)):
        frm[2 * i], to[2 * i], cap[2 * i] = u, v, float(c)
        frm[2 * i + 1], to[2 * i + 1], cap[2 * i + 1] = v, u, 0.0
        head[u].append(2 * i)
        head[v].append(2 * i + 1)
    value = 0.0
    while True:
        par = [-1] * nv
        par[s] = -2
        q = deque([s])
        while q and par[t] == -1:
            x = q.popleft()
            for a in head[x]:
                if cap[a] > 0 and par[to[a]] == -1:
                    par[to[a]] = a
                    q.append(to[a])
        if par[t] == -1:
            break
        aug = INF
        x = t
        while x != s:
            a = par[x]
            aug = min(aug, cap[a])
            x = frm[a]
        x = t
        while x != s:
            a = par[x]
            cap[a] -= aug
            cap[a ^ 1] += aug
            x = frm[a]
        value += aug
    return value, cap, frm, to, head


def _pq_s_sides(nv, cap, frm, to, s_node, t_node, active=None):
    """Picard-Queyranne enumeration shared by the vertex- and
    edge-cut APIs: given residual capacities after a max flow,
    condense the residual graph's SCCs and enumerate every
    successor-closed SCC set containing s_node's SCC and avoiding
    everything that reaches t_node's SCC (ref igraph_all_st_mincuts,
    src/st-cuts.c).  Returns one boolean S-side membership list per
    minimum cut (deduplicated).  ``active`` (per-node bool)
    restricts BRANCHING to SCCs touched by positive flow, the
    reference's VE1 rule (src/st-cuts.c igraph_all_st_mincuts) —
    inactive free SCCs are pinned out of S so off-path vertices never
    multiply partitions; forced (closure) members are kept either
    way."""
    from collections import deque as _deque

    radj = [[] for _ in range(nv)]
    for a in range(len(cap)):
        if cap[a] > 0:
            radj[frm[a]].append(to[a])
    index = [-1] * nv
    low = [0] * nv
    scc = [-1] * nv
    stack = []
    on = [False] * nv
    cnt = 0
    nscc = 0
    for root in range(nv):
        if index[root] != -1:
            continue
        work = [(root, 0)]
        while work:
            x, pi = work[-1]
            if pi == 0:
                index[x] = low[x] = cnt
                cnt += 1
                stack.append(x)
                on[x] = True
            recurse = False
            for j in range(pi, len(radj[x])):
                y = radj[x][j]
                if index[y] == -1:
                    work[-1] = (x, j + 1)
                    work.append((y, 0))
                    recurse = True
                    break
                elif on[y]:
                    low[x] = min(low[x], index[y])
            if recurse:
                continue
            if low[x] == index[x]:
                while True:
                    y = stack.pop()
                    on[y] = False
                    scc[y] = nscc
                    if y == x:
                        break
                nscc += 1
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[x])
    succ = [set() for _ in range(nscc)]
    for a in range(len(cap)):
        if cap[a] > 0 and scc[frm[a]] != scc[to[a]]:
            succ[scc[frm[a]]].add(scc[to[a]])
    s_scc, t_scc = scc[s_node], scc[t_node]
    mand = set()
    q = _deque([s_scc])
    while q:
        x = q.popleft()
        if x in mand:
            continue
        mand.add(x)
        q.extend(succ[x])
    reach_t = {t_scc}
    changed = True
    while changed:
        changed = False
        for c in range(nscc):
            if c not in reach_t and succ[c] & reach_t:
                reach_t.add(c)
                changed = True
    assert not (mand & reach_t), "not a max flow?"
    free = [c for c in range(nscc) if c not in mand and c not in reach_t]
    nodes_by_scc = {}
    for x in range(nv):
        nodes_by_scc.setdefault(scc[x], []).append(x)
    sides = []

    def emit(S_sccs):
        inS = [False] * nv
        for c in S_sccs:
            for x in nodes_by_scc.get(c, ()):
                inS[x] = True
        sides.append(inS)

    # topological order of the free sub-DAG, sinks first, then
    # successor closures: including an SCC includes its closure (the
    # Provan-Shier grow step), which may pull in inactive SCCs even
    # though only active ones are branched on
    free_set = set(free)
    placed = []
    remaining = set(free)
    while remaining:
        for c in sorted(remaining):
            if all(x not in remaining for x in succ[c] if x in free_set):
                placed.append(c)
                remaining.discard(c)
                break
        else:  # pragma: no cover - condensation is acyclic
            raise AssertionError("cycle in condensation")
    closure = {}
    for c in placed:  # sinks first, so successors are already done
        cl = {c}
        for x in succ[c]:
            if x in free_set:
                cl |= closure[x]
        closure[c] = frozenset(cl)
    if active is not None:
        scc_active = [False] * nscc
        for x in range(nv):
            if active[x]:
                scc_active[scc[x]] = True
        branch = [c for c in placed if scc_active[c]]
    else:
        branch = placed

    def rec(i, chosen):
        if i == len(branch):
            emit(mand | chosen)
            return
        c = branch[i]
        rec(i + 1, chosen)
        if c not in chosen:
            rec(i + 1, chosen | closure[c])
        # c already pulled in by an earlier closure: no new branch

    rec(0, set())
    seen = set()
    out = []
    for m in sides:
        k = tuple(m)
        if k not in seen:
            seen.add(k)
            out.append(m)
    return out


def _all_min_vertex_cuts(adj, s, t, extra: set,
                         expect: int | None = None) -> list:
    """All minimum-size vertex sets separating non-adjacent s from t —
    Even-Tarjan reduction (in(v)=v, out(v)=v+n; internal arc cap 1,
    edge arcs cap n) + Picard-Queyranne: minimum cuts are exactly the
    residual-successor-closed SCC sets containing out(s), excluding
    in(t) (ref igraph_all_st_mincuts, src/st-cuts.c).  ``extra`` holds
    (u,v) pairs added by the minimum_size_separators loop (step 8)."""
    n = len(adj)
    arcs, caps = [], []
    for v in range(n):
        arcs.append((v, v + n))  # in -> out, the arc id == vertex id
        caps.append(1.0)
    pairs = {(u, v) for u in range(n) for v in adj[u]}
    pairs |= extra | {(b, a) for a, b in extra}
    for u, v in sorted(pairs):
        arcs.append((u + n, v))
        caps.append(float(n))
    nv = 2 * n
    value, cap, frm, to, head = _maxflow_ek(nv, arcs, caps, s + n, t)
    if expect is not None and int(value) != expect:
        return []  # reference: only enumerate when |phi| == k

    sides = _pq_s_sides(nv, cap, frm, to, s + n, t)
    cuts: list[tuple[int, ...]] = []
    for inS in sides:
        cuts.append(tuple(
            v for v in range(n) if inS[v] and not inS[v + n]
        ))
    seen = set()
    out = []
    for c in cuts:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def _vertex_connectivity_small(adj) -> int:
    """igraph_vertex_connectivity semantics on the driver: 0 for
    disconnected / trivial, n-1 for complete, else min maxflow over
    the standard Even-Tarjan pair schedule (a minimum-degree vertex v
    vs its non-neighbors, plus non-adjacent pairs inside N(v))."""
    n = len(adj)
    if n <= 1:
        return 0
    if len(_components_excl(adj, set())) > 1:
        return 0
    if all(len(adj[v]) == n - 1 for v in range(n)):
        return n - 1

    def flow(s, t):
        arcs, caps = [], []
        for v in range(n):
            arcs.append((v, v + n))
            caps.append(1.0)
        for u in range(n):
            for v in adj[u]:
                arcs.append((u + n, v))
                caps.append(float(n))
        val, *_ = _maxflow_ek(2 * n, arcs, caps, s + n, t)
        return int(val)

    v0 = min(range(n), key=lambda v: len(adj[v]))
    best = n - 1
    for u in range(n):
        if u != v0 and u not in adj[v0]:
            best = min(best, flow(v0, u))
    nb = sorted(adj[v0])
    for i in range(len(nb)):
        for j in range(i + 1, len(nb)):
            if nb[j] not in adj[nb[i]]:
                best = min(best, flow(nb[i], nb[j]))
    return best


def minimum_size_separators(adj) -> list[tuple[int, ...]]:
    """All minimum-size vertex separators — reference
    igraph_minimum_size_separators (src/separators.c:643): vertex
    connectivity k; k=1 -> articulation points; k=n-1 -> all
    (n-1)-subsets; else the Even schedule: X = top-k-degree vertices
    (if X separates, it is included), then for each x in X and each
    non-adjacent v, enumerate ALL minimum x-v vertex cuts of size k,
    adding the processed (x,v) edge after each pair (step 8)."""
    n = len(adj)
    k = _vertex_connectivity_small(adj)
    if k == 0:
        return []
    if k == 1:
        # articulation points, ascending
        out = []
        for v in range(n):
            if is_separator(adj, {v}):
                out.append((v,))
        return out
    if k == n - 1:
        return [tuple(x for x in range(n) if x != v) for v in range(n)]
    X = sorted(range(n), key=lambda v: (-len(adj[v]), v))[:k]
    seps: list[tuple[int, ...]] = []
    seen: set[tuple[int, ...]] = set()
    if is_separator(adj, set(X)):
        key = tuple(sorted(X))
        seen.add(key)
        seps.append(key)
    extra: set = set()
    for x in X:
        for v in range(n):
            if v == x or v in adj[x] or (x, v) in extra \
                    or (v, x) in extra:
                continue
            for cut in _all_min_vertex_cuts(adj, x, v, extra, expect=k):
                if len(cut) == k and cut not in seen:
                    seen.add(cut)
                    seps.append(cut)
            extra.add((x, v))
    return seps


def all_st_cuts(arcs: list[tuple[int, int]], n: int, s: int, t: int):
    """All MINIMAL (s,t) edge cuts of a directed graph — reference
    igraph_all_st_cuts (src/st-cuts.c:976, Provan-Shier listing).
    Returns (cuts, partition1s): cuts as lists of input-edge indices,
    partition1s the generating vertex sets X (arcs X -> complement
    form the cut).

    Characterization used here (equivalent to the P-S output, checked
    against the reference's own example outputs): C(X) is a minimal
    cut iff X is exactly the s-reachable set of G - C(X) and the HEAD
    of every cut arc reaches t in G - C(X) (then dropping any one cut
    arc restores an s-t path, and every minimal cut arises from a
    unique such X).  Enumeration is over subsets (small-graph kernel,
    n <= ~20) rather than the reference's output-polynomial recursion
    — same output, simpler machinery; the distributed maxflow path
    (flow.py) answers single-cut questions at scale."""
    if s == t:
        raise ValueError("s == t")
    adj: list[list[tuple[int, int]]] = [[] for _ in range(n)]
    for ei, (u, v) in enumerate(arcs):
        adj[u].append((v, ei))
    cuts, parts = [], []
    free = [v for v in range(n) if v not in (s, t)]
    for mask in range(1 << len(free)):
        X = {s}
        for i, v in enumerate(free):
            if (mask >> i) & 1:
                X.add(v)
        cut = [ei for u in X for (v, ei) in adj[u] if v not in X]
        cset = set(cut)
        # reach from s avoiding cut arcs
        seen = {s}
        q = deque([s])
        while q:
            x = q.popleft()
            for (v, ei) in adj[x]:
                if ei not in cset and v not in seen:
                    seen.add(v)
                    q.append(v)
        if seen != X:
            continue
        # the head of every cut arc must reach t avoiding cut arcs
        radj: list[list[int]] = [[] for _ in range(n)]
        for ei2, (u, v) in enumerate(arcs):
            if ei2 not in cset:
                radj[v].append(u)
        back = {t}
        q = deque([t])
        while q:
            x = q.popleft()
            for u in radj[x]:
                if u not in back:
                    back.add(u)
                    q.append(u)
        if not all(arcs[ei][1] in back for ei in cut):
            continue
        cuts.append(sorted(cut))
        parts.append(sorted(X))
    return cuts, parts


# -- cohesive blocking -------------------------------------------------------


def _cb_components(adj, marked: set) -> list[list[int]]:
    """Components omitting separator vertices but INCLUDING each
    component's neighboring separator vertices
    (igraph_i_cb_components, src/cohesive_blocks.c:78)."""
    n = len(adj)
    compid = [0] * n
    cno = 0
    out = []
    for i in range(n):
        if compid[i] or i in marked:
            continue
        cno += 1
        comp = [i]
        compid[i] = cno
        q = deque([i])
        while q:
            x = q.popleft()
            for v in adj[x]:
                if v in marked:
                    if compid[v] != cno:
                        compid[v] = cno
                        comp.append(v)
                else:
                    if not compid[v]:
                        compid[v] = cno
                        comp.append(v)
                        q.append(v)
        out.append(comp)
    return out


def cohesive_blocks(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
):
    """(blocks, cohesion, parents, tree_edges) — reference
    igraph_cohesive_blocks (src/cohesive_blocks.c:202), exact replay
    of the queue algorithm including the ancestor-cohesion and
    subset filters; blocks are vertex-id lists in the ORIGINAL
    numbering, block 0 is the whole graph."""
    adj0 = collapse_support(edges, n, P=P)

    Q: list[list[set]] = [adj0]
    Qmapping: list = [None]
    Qparent = [-1]
    Qcohesion = [_vertex_connectivity_small(adj0)]
    Qcheck = [False]
    qptr = 0
    while qptr < len(Q):
        adj = Q[qptr]
        mynodes = len(adj)
        mycheck = Qcheck[qptr]
        seps = minimum_size_separators(adj)
        marked: set = set()
        for s in seps:
            marked |= set(s)
        comps = _cb_components(adj, marked)
        addedsep = False
        if len(marked) != mynodes and marked:
            comps.append(sorted(marked))
            addedsep = True
        for comp in comps:
            cs = sorted(comp)
            pos = {v: i for i, v in enumerate(cs)}
            sub: list[set] = [set() for _ in cs]
            for v in cs:
                for u in adj[v]:
                    if u in pos:
                        sub[pos[v]].add(pos[u])
            maxdeg = max((len(s) for s in sub), default=0)
            if maxdeg > Qcohesion[qptr]:
                Q.append(sub)
                Qmapping.append(cs)
                Qparent.append(qptr)
                Qcohesion.append(_vertex_connectivity_small(sub))
                Qcheck.append(mycheck or addedsep)
        qptr += 1

    noblocks = len(Q)
    removed = [False] * noblocks
    for i in range(1, noblocks):
        p = Qparent[i]
        while removed[p]:
            p = Qparent[p]
        if Qcohesion[p] >= Qcohesion[i]:
            removed[i] = True

    # rewrite mappings to original ids (parents first)
    for i in range(1, noblocks):
        p = Qparent[i]
        if Qmapping[p] is not None:
            Qmapping[i] = [Qmapping[p][v] for v in Qmapping[i]]

    # subset filter among check-flagged blocks
    for i in range(1, noblocks):
        if not Qcheck[i] or removed[i]:
            continue
        si = set(Qmapping[i])
        for j in range(1, noblocks):
            if j == i or not Qcheck[j] or removed[j]:
                continue
            if si <= set(Qmapping[j]) and Qcohesion[j] >= Qcohesion[i]:
                removed[i] = True
                break

    blocks, cohesion, parents, rewritemap = [], [], [], [0] * noblocks
    tree = []
    resptr = 0
    for i in range(noblocks):
        if removed[i]:
            continue
        rewritemap[i] = resptr
        cohesion.append(Qcohesion[i])
        p = Qparent[i]
        while p >= 0 and removed[p]:
            p = Qparent[p]
        if p >= 0:
            p = rewritemap[p]
        parents.append(p)
        blocks.append(
            list(range(n)) if Qmapping[i] is None else list(Qmapping[i])
        )
        if p >= 0:
            tree.append((p, resptr))
        resptr += 1
    return blocks, cohesion, parents, tree


def all_st_mincuts(arcs, n: int, s: int, t: int, capacity=None):
    """All MINIMUM (s,t) edge cuts of a directed capacitated graph
    (igraph_all_st_mincuts, src/st-cuts.c: max flow, then
    Picard-Queyranne closed-set enumeration over the residual SCC
    condensation).  Returns (value, [(partition1 vid list, cut edge-id
    list)] ) with edge ids indexing the input ``arcs`` order —
    verified against the reference's own igraph_all_st_mincuts.out.
    Small-graph driver kernel like the other cut enumerations."""
    arcs = [(int(a), int(b)) for a, b in arcs]
    caps = ([1.0] * len(arcs) if capacity is None
            else [float(c) for c in capacity])
    value, cap, frm, to, _head = _maxflow_ek(n, arcs, caps, s, t)
    # active vertices = endpoints of arcs carrying positive flow
    # (the reference's VE1 set, src/st-cuts.c)
    active = [False] * n
    for i, (u, v) in enumerate(arcs):
        if caps[i] - cap[2 * i] > 0:
            active[u] = True
            active[v] = True
    sides = _pq_s_sides(n, cap, frm, to, s, t, active=active)
    out = []
    for inS in sides:
        part = [v for v in range(n) if inS[v]]
        cut = [i for i, (u, v) in enumerate(arcs)
               if inS[u] and not inS[v]]
        out.append((part, cut))
    return value, out
