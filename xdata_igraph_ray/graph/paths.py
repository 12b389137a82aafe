"""BFS-based path operators (reference src/structural_properties.c and
src/visitors.c).

* :func:`sssp` — unweighted single/multi-source shortest path lengths
  (igraph_shortest_paths BFS matrix rows, structural_properties.c:455),
  as frontier supersteps on the shard engine.
* :func:`pseudo_diameter` — double-sweep BFS lower bound (the standard
  distributed stand-in for igraph_diameter's all-sources BFS,
  structural_properties.c:91, which is O(V·E) and driver-side only for
  tiny graphs).
* :func:`average_path_length` — exact (all sources) for small n, or
  seeded sampled sources at scale (igraph_average_path_length,
  structural_properties.c:223).
"""

from __future__ import annotations

import numpy as np
import ray

from .engine import GraphEngine

INF = np.iinfo(np.int64).max


def _bfs_rounds(engine: GraphEngine, directions, max_rounds=None) -> int:
    P, shards = engine.P, engine.shards
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        outs = engine.scatter("bfs_scatter", directions)
        stats = ray.get([
            shards[q].bfs_gather.remote(*engine.pieces(outs, q))
            for q in range(P)
        ])
        if sum(s["changed"] for s in stats) == 0:
            break
        rounds += 1
    return rounds


def sssp(
    engine: GraphEngine,
    sources,
    mode: str = "out",
    max_depth: int | None = None,
) -> np.ndarray:
    """Shortest hop-count from the source set to every vertex
    (unreachable -> -1).  mode: out / in / all edge directions."""
    directions = {"out": ("fwd",), "in": ("rev",), "all": ("fwd", "rev")}[mode]
    ray.get([
        s.bfs_init.remote(np.atleast_1d(np.asarray(sources, dtype=np.int64)))
        for s in engine.shards
    ])
    _bfs_rounds(engine, directions, max_rounds=max_depth)
    dist = engine.state_arrays("dist")
    return np.where(dist == INF, -1, dist)


def sssp_weighted(
    engine: GraphEngine,
    sources,
    mode: str = "out",
    max_rounds: int | None = None,
) -> np.ndarray:
    """Weighted shortest-path distances from the source set
    (unreachable -> inf) via Bellman-Ford relaxation supersteps —
    reference igraph_shortest_paths_dijkstra / _bellman_ford
    (src/structural_properties.c:4174, 5158); the distributed frontier
    replaces the priority queue, converging to the same fixed point.
    Requires an engine built with ``weighted=True``; handles negative
    weights (no negative cycles: rounds are capped at n and a
    non-converged run raises, mirroring Bellman-Ford's cycle check)."""
    directions = {"out": ("fwd",), "in": ("rev",), "all": ("fwd", "rev")}[mode]
    shards = engine.shards
    ray.get([
        s.wsssp_init.remote(np.atleast_1d(np.asarray(sources, dtype=np.int64)))
        for s in shards
    ])
    cap = max_rounds if max_rounds is not None else engine.n + 1
    rounds = 0
    while True:
        outs = engine.scatter("wsssp_scatter", directions)
        stats = ray.get([
            shards[q].wsssp_gather.remote(*engine.pieces(outs, q))
            for q in range(engine.P)
        ])
        if sum(s["changed"] for s in stats) == 0:
            break
        rounds += 1
        if rounds > cap:
            raise RuntimeError(
                "sssp_weighted: no fixed point after n rounds "
                "(negative cycle reachable from the sources?)"
            )
    return engine.state_arrays("wdist")


def neighborhood_size(
    engine: GraphEngine, vids, order: int = 1, mode: str = "all"
) -> np.ndarray:
    """|N_<=order(v)| per requested vertex including v itself
    (igraph_neighborhood_size, src/structural_properties.c:2842).
    One bounded BFS per seed — fine for selector-sized vid lists."""
    out = np.empty(len(vids), dtype=np.int64)
    for i, v in enumerate(vids):
        d = sssp(engine, [int(v)], mode=mode, max_depth=order)
        out[i] = int(((d >= 0) & (d <= order)).sum())
    return out


def topological_layers(engine: GraphEngine, max_layers: int | None = None):
    """(layers array | None, is_dag): layer-wise topological order —
    layer(v) = longest path from any source to v.  Sorting vertices by
    (layer, vid) yields a valid topological order, deterministic.
    Returns (None, False) when a cycle blocks peeling
    (igraph_topological_sorting / igraph_is_dag,
    src/structural_properties.c:3325)."""
    shards = engine.shards
    ray.get([s.topo_init.remote() for s in shards])
    layer = 0
    while True:
        remaining = sum(ray.get([s.topo_unassigned.remote() for s in shards]))
        if remaining == 0:
            break
        outs = engine.scatter("topo_indeg_flags")
        peeled = sum(ray.get([
            s.topo_peel.remote(layer, *engine.pieces(outs, q))
            for q, s in enumerate(shards)
        ]))
        if peeled == 0:
            return None, False  # cycle
        layer += 1
        if max_layers is not None and layer > max_layers:
            return None, False
    return engine.state_arrays("layer"), True


def is_dag(engine: GraphEngine) -> bool:
    """igraph_is_dag (src/structural_properties.c:3325)."""
    return topological_layers(engine)[1]


def decompose(
    edges, membership: "ray.data.Dataset", out_dir: str,
    P: int = 8,
) -> int:
    """Split the edge table into per-component Parquet partitions
    (igraph_decompose, src/components.c:450): join edges with the
    (vid, component) table on src (endpoints always share a WCC) and
    write partitioned by component.  Returns the component count."""
    from ..exchange import block_refs, hash_join

    import pyarrow as pa
    import ray as _ray

    mrefs = block_refs(membership)

    @_ray.remote
    def as_src(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["vid"], "component": t[t.column_names[1]]})

    joined = hash_join(
        edges, [as_src.remote(r) for r in mrefs], keys=["src"], P=P
    )
    joined.write_parquet(out_dir, partition_cols=["component"])
    return int(membership.count())


def _farthest(engine: GraphEngine):
    parts = ray.get([s.bfs_max_dist.remote() for s in engine.shards])
    best = max(parts)  # lexicographic: max dist wins
    reach = sum(p[1] for p in parts)
    total = sum(p[2] for p in parts)
    return best[0], best[3], reach, total


def pseudo_diameter(engine: GraphEngine, start: int = 0, mode: str = "all") -> int:
    """Double-sweep BFS: eccentricity lower bound, exact on trees."""
    d1 = sssp(engine, [start], mode=mode)
    far = int(np.argmax(d1))
    d2 = sssp(engine, [far], mode=mode)
    return int(d2.max())


def average_path_length(
    engine: GraphEngine,
    directed: bool = True,
    sample: int | None = None,
    seed: int = 42,
) -> float:
    """Mean finite-pair shortest path length (unconnected pairs
    excluded — igraph's default unconn=True).  ``sample`` caps the
    number of BFS sources (seeded) for large graphs; None = exact."""
    n = engine.n
    sources = np.arange(n)
    if sample is not None and sample < n:
        sources = np.random.default_rng(seed).choice(n, sample, replace=False)
    mode = "out" if directed else "all"
    directions = {"out": ("fwd",), "all": ("fwd", "rev")}[mode]
    total = 0
    pairs = 0
    for s in sources:
        ray.get([
            sh.bfs_init.remote(np.array([s], dtype=np.int64))
            for sh in engine.shards
        ])
        _bfs_rounds(engine, directions)
        _, _, reach, tot = _farthest(engine)
        total += tot
        pairs += reach - 1  # exclude the source itself
    return total / pairs if pairs else float("nan")


def path_length_hist(engine: GraphEngine, wave: int = 128):
    """(histogram dict {length: count}, unconnected ordered pair count)
    over directed shortest paths — reference igraph_path_length_hist
    (src/structural_properties.c:319).  All-sources multi-source BFS in
    waves of ``wave`` columns (exact; at web scale pass a sampled
    source list via :func:`average_path_length` instead)."""
    from .centrality import _ms_forward, _ms_waves

    shards = engine.shards
    hist: dict[int, int] = {}
    unconn = 0
    for ws in _ms_waves(engine, np.arange(engine.n), wave):
        _ms_forward(engine, ws)
        parts = ray.get([s.ms_dist_hist.remote() for s in shards])
        for h, un in parts:
            unconn += un
            for length, c in enumerate(h):
                if length > 0 and c:
                    hist[length] = hist.get(length, 0) + int(c)
    ray.get([s.ms_free.remote() for s in engine.shards])
    return hist, unconn


def diameter(
    engine: GraphEngine, unconn: bool = True, wave: int = 128
) -> int:
    """Exact diameter via all-sources BFS (igraph_diameter,
    src/structural_properties.c:91): with ``unconn`` (default) the
    longest finite distance; otherwise igraph returns the vertex count
    when any pair is unreachable."""
    hist, un = path_length_hist(engine, wave=wave)
    longest = max(hist) if hist else 0
    if not unconn and un > 0:
        return engine.n
    return longest


def get_shortest_paths(
    engine: GraphEngine,
    source: int,
    targets,
    mode: str = "out",
) -> list[list[int]]:
    """One deterministic shortest path (min-vid predecessor rule) from
    ``source`` to each target, as vid lists ([] if unreachable) —
    reference igraph_get_shortest_paths
    (src/structural_properties.c:645-1232).  BFS with parent pointers,
    then a vectorized parent walk (one owner RPC round per hop)."""
    directions = {"out": ("fwd",), "in": ("rev",), "all": ("fwd", "rev")}[mode]
    shards = engine.shards
    ray.get([
        s.pbfs_init.remote(np.array([source], dtype=np.int64))
        for s in shards
    ])
    while True:
        outs = engine.scatter("pbfs_scatter", directions)
        stats = ray.get([
            shards[q].pbfs_gather.remote(*engine.pieces(outs, q))
            for q in range(engine.P)
        ])
        if sum(s["changed"] for s in stats) == 0:
            break
    dist = engine.state_arrays("dist")
    targets = [int(t) for t in np.atleast_1d(np.asarray(targets))]
    paths: dict[int, list[int]] = {}
    cur = {t: t for t in targets if t == source or dist[t] < INF}
    chains = {t: [t] for t in cur}
    bounds = np.asarray(engine.bounds)
    while True:
        pending = {t: v for t, v in cur.items() if v != source}
        if not pending:
            break
        # one batched parent RPC per owner shard
        ts = np.array(list(pending.keys()))
        vs = np.array(list(pending.values()))
        owner = np.searchsorted(bounds, vs, side="right") - 1
        results = {}
        futs = []
        metas = []
        for q in range(engine.P):
            m = owner == q
            if m.any():
                futs.append(shards[q].parent_lookup.remote(vs[m]))
                metas.append(ts[m])
        for meta, pars in zip(metas, ray.get(futs)):
            for t, p in zip(meta, pars):
                results[int(t)] = int(p)
        for t, p in results.items():
            chains[t].append(p)
            cur[t] = p
    for t in targets:
        paths[t] = list(reversed(chains[t])) if t in chains else []
    return [paths[t] for t in targets]


def girth(edges, n: int, P: int = 8, wave: int = 128) -> float:
    """Length of the shortest cycle (igraph_girth,
    src/structural_properties.c:3691: undirected, self-loops and
    multi-edges ignored; inf when the graph is a forest).  All-sources
    BFS waves over the simple undirected support; per wave each vertex
    reduces its in-edge sender levels to (min, count, second-min) and
    evaluates the even/odd cycle candidates — min over everything is
    exact.  Waves after the first are depth-capped by the best
    candidate so far."""
    import pyarrow.compute as pc

    from .centrality import _ms_forward, _ms_waves
    from .ops import to_directed_mutual, to_undirected

    support = to_directed_mutual(to_undirected(edges, P=P).map_batches(
        lambda t: t.filter(
            pc.invert(pc.equal(t["src"], t["dst"]))
        ),
        batch_format="pyarrow",
    ))
    eng = GraphEngine.from_edges(support, n=n, P=P)
    best = np.iinfo(np.int64).max
    for ws in _ms_waves(eng, np.arange(n), wave):
        cap = None if best == np.iinfo(np.int64).max else best // 2 + 1
        _ms_forward(eng, ws, max_level=cap)
        outs = eng.scatter("ms_girth_scatter")
        mins = ray.get([
            eng.shards[q].ms_girth_gather.remote(*eng.pieces(outs, q))
            for q in range(eng.P)
        ])
        best = min(best, int(np.min(mins)))
        if best == 3:
            break  # no shorter cycle exists
    ray.get([s.ms_free.remote() for s in eng.shards])
    eng.shutdown()
    return float("inf") if best >= (1 << 20) else float(best)


def random_walks(
    engine: GraphEngine,
    starts,
    steps: int,
    seed: int = 42,
    weighted: bool = False,
):
    """Uniform (or weight-proportional) random walks —
    igraph_random_walk (src/random_walk.c:55): one walk per entry of
    ``starts``, each advancing ``steps`` hops along out-edges and
    stopping early at sinks.  Deterministic for a given seed at ANY
    shard count: the next-neighbor draw is a counter hash of
    (walk, step), not an RNG stream.  Returns a Dataset
    (walk, step, vid); per-superstep traffic is O(active walks)."""
    import ray.data as rd

    shards = engine.shards
    starts = np.atleast_1d(np.asarray(starts, dtype=np.int64))
    walk_ids = np.arange(len(starts), dtype=np.int64)
    ray.get([
        s.rw_init.remote(walk_ids, starts, seed, weighted) for s in shards
    ])
    for _ in range(steps):
        outs = engine.scatter("rw_advance")
        alive = sum(ray.get([
            shards[q].rw_gather.remote(*engine.pieces(outs, q))
            for q in range(engine.P)
        ]))
        if alive == 0:
            break
    tbls = [s.rw_table.remote() for s in shards]
    ds = rd.from_arrow_refs(tbls)
    ray.get([s.rw_free.remote() for s in shards])
    return ds


def get_all_shortest_paths(
    engine: GraphEngine,
    source: int,
    targets,
    mode: str = "out",
    max_paths: int = 100_000,
) -> dict[int, list[list[int]]]:
    """ALL shortest paths from ``source`` to each target —
    igraph_get_all_shortest_paths (src/structural_properties.c:1232).
    BFS, then ONE extra superstep materializes the shortest-path DAG
    shard-side (parents of v = senders whose dist+1 matched); the
    driver pulls only the targets' ancestor cone (output-sized) and
    enumerates by DP over the DAG.  Raises if the enumeration would
    exceed ``max_paths`` (path counts grow exponentially)."""
    directions = {"out": ("fwd",), "in": ("rev",), "all": ("fwd", "rev")}[mode]
    shards = engine.shards
    ray.get([
        s.bfs_init.remote(np.array([source], dtype=np.int64)) for s in shards
    ])
    _bfs_rounds(engine, directions)
    outs = engine.scatter("spdag_scatter", directions)
    ray.get([
        shards[q].spdag_gather.remote(*engine.pieces(outs, q))
        for q in range(engine.P)
    ])
    dist = engine.state_arrays("dist")
    targets = [int(t) for t in np.atleast_1d(np.asarray(targets))]
    bounds = np.asarray(engine.bounds)

    # pull the ancestor cone level by level (batched per owner shard)
    parent_adj: dict[int, list[int]] = {}
    frontier = sorted({
        t for t in targets if t != source and dist[t] < INF
    })
    while frontier:
        vs = np.asarray(frontier, dtype=np.int64)
        owner = np.searchsorted(bounds, vs, side="right") - 1
        futs, metas = [], []
        for q in range(engine.P):
            m = owner == q
            if m.any():
                futs.append(shards[q].spdag_parents_of.remote(vs[m]))
                metas.append(vs[m])
        nxt: set[int] = set()
        for meta, (off, pars) in zip(metas, ray.get(futs)):
            for i, v in enumerate(meta):
                ps = pars[off[i]:off[i + 1]].tolist()
                parent_adj[int(v)] = ps
                for p in ps:
                    if p != source and p not in parent_adj:
                        nxt.add(p)
        frontier = sorted(nxt - set(parent_adj))
    ray.get([s.spdag_free.remote() for s in shards])

    # DP enumeration over the cone
    memo: dict[int, list[list[int]]] = {source: [[source]]}
    total = 0

    def paths_to(v: int) -> list[list[int]]:
        nonlocal total
        got = memo.get(v)
        if got is not None:
            return got
        acc: list[list[int]] = []
        for u in parent_adj.get(v, ()):
            for p in paths_to(u):
                acc.append(p + [v])
                total += 1
                if total > max_paths:
                    raise ValueError(
                        f"get_all_shortest_paths: > {max_paths} paths"
                    )
        memo[v] = acc
        return acc

    out: dict[int, list[list[int]]] = {}
    import sys as _sys

    old = _sys.getrecursionlimit()
    _sys.setrecursionlimit(max(old, int(dist[dist < INF].max() + 100)))
    try:
        for t in targets:
            if t == source:
                out[t] = [[source]]
            elif dist[t] >= INF:
                out[t] = []
            else:
                out[t] = paths_to(t)
    finally:
        _sys.setrecursionlimit(old)
    return out


def dfs(edges, n: int, root: int = 0, mode: str = "out"):
    """DFS visitor order + parents (igraph_dfs, src/visitors.c:395).
    The visit order is inherently sequential (each step depends on the
    full prior state), so this runs driver-side over a collected
    adjacency — the same scope as the reference's own single-threaded
    visitor; use it for reference-id canonicalization on small/medium
    graphs, not 10^12-edge inputs.  Unreached vertices are restarted
    from ascending vids (igraph's dfs with all components).
    Returns {"order", "parent"} (np arrays; parent -1 at roots)."""
    import pyarrow as pa

    if isinstance(edges, pa.Table):
        tbls = [edges]
    else:
        from ..exchange import block_refs

        refs = edges if isinstance(edges, list) else block_refs(edges)
        tbls = ray.get(list(refs))
    src_l, dst_l = [], []
    for t in tbls:
        if len(t) == 0:
            continue
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        if mode in ("out", "all"):
            src_l.append(s)
            dst_l.append(d)
        if mode in ("in", "all"):
            src_l.append(d)
            dst_l.append(s)
    if src_l:
        src = np.concatenate(src_l)
        dst = np.concatenate(dst_l)
    else:
        src = dst = np.empty(0, dtype=np.int64)
    order_e = np.lexsort((dst, src))
    src, dst = src[order_e], dst[order_e]
    indptr = np.concatenate(
        ([0], np.cumsum(np.bincount(src, minlength=n)))
    )
    visited = np.zeros(n, dtype=bool)
    parent = np.full(n, -1, dtype=np.int64)
    order = np.empty(n, dtype=np.int64)
    k = 0
    roots = [root] + [v for v in range(n) if v != root]
    for r in roots:
        if visited[r]:
            continue
        stack = [(r, int(indptr[r]))]
        visited[r] = True
        order[k] = r
        k += 1
        while stack:
            v, ei = stack[-1]
            end = int(indptr[v + 1])
            while ei < end and visited[dst[ei]]:
                ei += 1
            if ei == end:
                stack.pop()
                continue
            stack[-1] = (v, ei + 1)
            w = int(dst[ei])
            visited[w] = True
            parent[w] = v
            order[k] = w
            k += 1
            stack.append((w, int(indptr[w])))
    return {"order": order, "parent": parent}


def transitive_closure(engine: GraphEngine, wave: int = 128,
                       mode: str = "out"):
    """Reachability closure as a Dataset of (src, dst) pairs —
    reference igraph_transitive_closure_dag
    (src/structural_properties.c:6340; this version handles general
    digraphs, which on a DAG coincides with the reference: edge
    (u, v) iff a nonempty path u -> v exists; self-pairs only for
    vertices on cycles are NOT emitted — DAG semantics).

    Distributed shape: multi-source BFS waves over the shard engine
    ("ms" harness, same as closeness); after each wave every shard
    emits its (source, reached-vid) block ref, so the closure
    streams out as per-shard Arrow blocks and the driver never holds
    the O(n^2) pair set.  ``mode``: out / in / all traversal."""
    import ray.data as rd

    from .centrality import _MODE_DIR, _ms_forward, _ms_waves

    shards = engine.shards
    refs = []
    for ws in _ms_waves(engine, np.arange(engine.n), wave):
        _ms_forward(engine, ws, direction=_MODE_DIR[mode])
        refs.extend([s.ms_reach_table.remote() for s in shards])
    ray.get([s.ms_free.remote() for s in shards])
    return rd.from_arrow_refs(refs)


def get_all_simple_paths(
    edges, n: int, source: int, targets, mode: str = "out",
    cutoff: int | None = None, max_paths: int = 1_000_000,
    P: int = 8,
):
    """All simple paths from ``source`` to each target
    (igraph_get_all_simple_paths, src/paths.c:60 — multi/loop edges
    ignored; exponential worst case, driver kernel over the collapsed
    arc set).  Deterministic order: neighbors expanded ascending.
    ``cutoff`` bounds path length in edges; ``max_paths`` is a loud
    guard against lattice blow-up (raises, never truncates
    silently)."""
    from ..exchange import block_refs, distinct

    refs = edges if isinstance(edges, list) else block_refs(edges)
    uniq = distinct(refs, ["src", "dst"], P=P, as_refs=True)
    adj: list[list[int]] = [[] for _ in range(n)]
    for t in ray.get(uniq):
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        for u, v in zip(s.tolist(), d.tolist()):
            if u == v:
                continue
            if mode in ("out", "all"):
                adj[u].append(v)
            if mode in ("in", "all"):
                adj[v].append(u)
    for a in adj:
        a.sort()
    tset = set(
        int(x) for x in np.atleast_1d(np.asarray(targets)).tolist()
    )
    out: list[list[int]] = []
    path = [source]
    on = np.zeros(n, dtype=bool)
    on[source] = True

    def rec():
        v = path[-1]
        if v in tset:  # the trivial [source] path counts when
            # source is a target, matching the reference's DFS
            out.append(path.copy())
            if len(out) > max_paths:
                raise RuntimeError(
                    f"get_all_simple_paths: > {max_paths} paths"
                )
        if cutoff is not None and len(path) - 1 >= cutoff:
            return
        for w in adj[v]:
            if not on[w]:
                on[w] = True
                path.append(w)
                rec()
                path.pop()
                on[w] = False

    rec()
    return out


def convergence_degree(
    edges, n: int, directed: bool = True, P: int = 8,
):
    """Per-edge convergence degree (igraph_convergence_degree,
    src/structural_properties.c:4011): ins(e) = number of roots i
    with d(i,u) + 1 == d(i,v) (the edge lies on a shortest path out
    of i), outs(e) = number of roots with d(v,i) + 1 == d(u,i); the
    degree is (ins - outs) / (ins + outs) (absolute value for the
    undirected case, whose fields use the canonical a < b
    orientation).  Small-graph driver kernel over the collapsed arc
    set (all-pairs BFS); returns an Arrow table
    (src, dst, ins, outs, cd)."""
    from collections import deque as _dq

    import pyarrow as _pa

    from ..exchange import block_refs, distinct

    refs = edges if isinstance(edges, list) else block_refs(edges)
    uniq = distinct(refs, ["src", "dst"], P=P, as_refs=True)
    su, sv = [], []
    for t in ray.get(uniq):
        su.append(t["src"].to_numpy())
        sv.append(t["dst"].to_numpy())
    s = np.concatenate(su) if su else np.empty(0, np.int64)
    d = np.concatenate(sv) if sv else np.empty(0, np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    if not directed:
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        key = a * n + b
        _, idx = np.unique(key, return_index=True)
        s, d = a[np.sort(idx)], b[np.sort(idx)]

    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for u, v in zip(s.tolist(), d.tolist()):
        adj[u].append(v)
        radj[v].append(u)
        if not directed:
            adj[v].append(u)
            radj[u].append(v)

    def dists(start: int, nbrs) -> np.ndarray:
        out = np.full(n, -1, np.int64)
        out[start] = 0
        q = _dq([start])
        while q:
            x = q.popleft()
            for y in nbrs[x]:
                if out[y] < 0:
                    out[y] = out[x] + 1
                    q.append(y)
        return out

    Dfwd = np.stack([dists(i, adj) for i in range(n)])
    Drev = (Dfwd if not directed
            else np.stack([dists(i, radj) for i in range(n)]))
    du = Dfwd[:, s]  # d(i, u) per root x edge
    dv = Dfwd[:, d]
    ins = ((du >= 0) & (dv >= 0) & (du + 1 == dv)).sum(axis=0)
    ru = Drev[:, s]  # d(u, i) via reverse BFS
    rv = Drev[:, d]
    outs = ((ru >= 0) & (rv >= 0) & (rv + 1 == ru)).sum(axis=0)
    with np.errstate(divide="ignore", invalid="ignore"):
        cd = (ins - outs) / (ins + outs)
    if not directed:
        cd = np.abs(cd)
    return _pa.table({
        "src": s, "dst": d,
        "ins": ins.astype(np.int64), "outs": outs.astype(np.int64),
        "cd": cd,
    })


def subcomponent(engine: GraphEngine, v: int,
                 mode: str = "all") -> np.ndarray:
    """Vertex ids reachable from/to ``v`` (igraph_subcomponent,
    src/structural_properties.c: mode 'out' = reachable FROM v,
    'in' = vertices that reach v, 'all' = weak component of v),
    ascending — one BFS over the existing distributed frontier
    machinery."""
    d = sssp(engine, [int(v)], mode=mode)
    return np.nonzero(d >= 0)[0].astype(np.int64)


def bfs(engine: GraphEngine, root: int, mode: str = "out") -> dict:
    """BFS visitor outputs (igraph_bfs, src/structural_properties.c):
    {"order" (visit order, reached vids), "rank" (visit index per
    vid, -1 unreached), "parents" (BFS-tree parent, -1 for root /
    unreached), "dist"}.  Pinned divergences from the reference's
    adjacency-order queue: level-synchronous order sorted by
    (dist, vid) within levels, min-vid parent rule — deterministic at
    any shard count."""
    directions = {"out": ("fwd",), "in": ("rev",), "all": ("fwd", "rev")}[mode]
    shards = engine.shards
    ray.get([
        s.pbfs_init.remote(np.array([int(root)], dtype=np.int64))
        for s in shards
    ])
    while True:
        outs = engine.scatter("pbfs_scatter", directions)
        stats = ray.get([
            shards[q].pbfs_gather.remote(*engine.pieces(outs, q))
            for q in range(engine.P)
        ])
        if sum(s["changed"] for s in stats) == 0:
            break
    dist = engine.state_arrays("dist")
    dist = np.where(dist == INF, -1, dist).astype(np.int64)
    reached = np.nonzero(dist >= 0)[0]
    order = reached[np.lexsort((reached, dist[reached]))]
    rank = np.full(engine.n, -1, dtype=np.int64)
    rank[order] = np.arange(len(order))
    parents = np.full(engine.n, -1, dtype=np.int64)
    others = order[order != root]
    if len(others):
        bounds = np.asarray(engine.bounds)
        owner = np.searchsorted(bounds, others, side="right") - 1
        futs, metas = [], []
        for q in range(engine.P):
            m = owner == q
            if m.any():
                futs.append(shards[q].parent_lookup.remote(others[m]))
                metas.append(others[m])
        for meta, pars in zip(metas, ray.get(futs)):
            parents[meta] = pars
    return {"order": order, "rank": rank, "parents": parents,
            "dist": dist}


def distances_weighted(
    engine: GraphEngine, sources=None, wave: int = 64,
) -> np.ndarray:
    """(len(sources), n) weighted distance matrix (inf = unreachable)
    via Bellman-Ford supersteps — igraph_shortest_paths_dijkstra /
    _bellman_ford / _johnson collapse to the same fixed point here
    (src/structural_properties.c:4174,5158,5274: Johnson's
    reweighting exists only to make Dijkstra safe under negative
    weights; the BF supersteps handle them directly, and a negative
    cycle raises).  Wave-batched: per-shard transient is
    shard_size x wave doubles."""
    from .centrality import _ms_waves, _wms_run

    shards = engine.shards
    n = engine.n
    if sources is None:
        sources = np.arange(n)
    sources = np.asarray(sources, dtype=np.int64)
    out = np.full((len(sources), n), np.inf)
    pos = 0
    for ws in _ms_waves(engine, sources, wave):
        _wms_run(engine, ws)
        for lo, block in ray.get(
                [s.wms_dist_block.remote() for s in shards]):
            out[pos:pos + len(ws), lo:lo + block.shape[0]] = block.T
        pos += len(ws)
    ray.get([s.wms_free.remote() for s in shards])
    return out


def shortest_paths_johnson(
    engine: GraphEngine, sources=None, wave: int = 64,
) -> np.ndarray:
    """igraph_shortest_paths_johnson (src/structural_properties.c:5274):
    all-pairs (or sources x all) weighted distances with negative
    weights allowed, negative cycles detected.  Alias of
    :func:`distances_weighted` — see its docstring for why the
    reweighting step vanishes in the superstep formulation."""
    return distances_weighted(engine, sources=sources, wave=wave)


def neighborhood(
    engine: GraphEngine, vids, order: int = 1, mode: str = "all",
) -> list[np.ndarray]:
    """Vertex ids within ``order`` hops of each seed, seed included,
    ascending (igraph_neighborhood,
    src/structural_properties.c:2934) — one bounded distributed BFS
    per seed, like neighborhood_size."""
    out = []
    for v in vids:
        d = sssp(engine, [int(v)], mode=mode, max_depth=order)
        out.append(np.nonzero((d >= 0) & (d <= order))[0]
                   .astype(np.int64))
    return out


def get_shortest_path(
    engine: GraphEngine, source: int, target: int, mode: str = "out",
) -> list[int]:
    """One shortest path source -> target ([] if unreachable) —
    igraph_get_shortest_path (src/structural_properties.c:1240, the
    single-target convenience wrapper)."""
    return get_shortest_paths(engine, source, [target], mode=mode)[0]
