"""Evolving-network generator games (reference src/games.c,
src/forestfire.c) — the temporal / aging / citation family that
completes the §2.10 generator surface:

- growing_random_game           (src/games.c:1302)
- callaway_traits_game          (src/games.c:1385)
- establishment_game            (src/games.c:1468)
- recent_degree_game            (src/games.c:1558)
- barabasi_aging_game           (src/games.c:1716)
- recent_degree_aging_game      (src/games.c:1872)
- lastcit_game                  (src/games.c:3017)
- cited_type_game               (src/games.c:3151)
- citing_cited_type_game        (src/games.c:3242)
- asymmetric_preference_game    (src/games.c:2447)
- forest_fire_game              (src/forestfire.c:106)
- barabasi_game power/zero_appeal variant ("nonlinear barabasi",
  src/games.c:191 psumtree algorithm)

All are inherently sequential simulations (each step's attachment
distribution depends on every earlier step), exactly like the
reference: they synthesize seed/fixture graphs, they are not the
100-TB data path.  Each is a pure function of its arguments + seed
and returns a ``pyarrow.Table`` edge list (src:int64, dst:int64);
games that also draw per-vertex types return ``(edges, types)``.

Pinned divergence (same as every other seeded generator here, see
generators.py): a seeded ``numpy.random.default_rng`` replaces the
reference's MT19937 `RNG_*` stream, so edge *sets* differ draw-by-draw
while the model semantics (attachment kernels, aging bins, window
bookkeeping) are replicated exactly; tests verify the distributional
and structural contracts instead of byte-equal streams.

The reference's ``igraph_psumtree_t`` (partial-sum tree,
src/igraph_psumtree.c) is replaced by :class:`_Fenwick`, a numpy
Fenwick tree with the same contract: point update, total sum, and
prefix-search(u) returning the smallest index whose cumulative weight
exceeds ``u``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .generators import _table


class _Fenwick:
    """Partial-sum tree over ``n`` slots (igraph_psumtree contract:
    update / sum / search).  O(log n) per op, numpy storage."""

    def __init__(self, n: int):
        self.n = n
        self.tree = np.zeros(n + 1, dtype=np.float64)
        self.vals = np.zeros(n, dtype=np.float64)

    def update(self, i: int, value: float) -> None:
        delta = value - self.vals[i]
        if delta == 0.0:
            return
        self.vals[i] = value
        j = i + 1
        while j <= self.n:
            self.tree[j] += delta
            j += j & (-j)

    def total(self) -> float:
        # exact re-sum is O(n); keep the running tree total instead.
        # tree[k] slices overlap, so accumulate the root chain:
        s, j = 0.0, self.n
        while j > 0:
            s += self.tree[j]
            j -= j & (-j)
        return s

    def search(self, u: float) -> int:
        """Smallest i with prefix_sum(0..i) > u (psumtree_search)."""
        pos = 0
        bit = 1 << (self.n.bit_length())
        while bit > 0:
            nxt = pos + bit
            if nxt <= self.n and self.tree[nxt] <= u:
                u -= self.tree[nxt]
                pos = nxt
            bit >>= 1
        return min(pos, self.n - 1)


def growing_random_game(n: int, m: int, directed: bool = True,
                        citation: bool = False, seed: int = 42) -> pa.Table:
    """igraph_growing_random_game (src/games.c:1302): each step adds
    one vertex and m uniformly random edges; ``citation`` pins the
    source to the newest vertex and the target uniformly below it."""
    if n < 0 or m < 0:
        raise ValueError("n and m must be non-negative")
    rng = np.random.default_rng(seed)
    src_l: list[int] = []
    dst_l: list[int] = []
    for i in range(1, n):
        if citation:
            tos = rng.integers(0, i, m)
            src_l.extend([i] * m)
            dst_l.extend(int(t) for t in tos)
        else:
            # reference draws from RNG_INTEGER(0, i) x RNG_INTEGER(1, i):
            # endpoints over vertices 0..i (new vertex included), the
            # second endpoint never 0.
            frm = rng.integers(0, i + 1, m)
            tos = rng.integers(1, i + 1, m)
            src_l.extend(int(f) for f in frm)
            dst_l.extend(int(t) for t in tos)
    return _table(src_l, dst_l)


def _draw_types(rng, nodes: int, type_dist) -> np.ndarray:
    """Cumulative-distribution type assignment (games.c:1404-1417)."""
    cd = np.cumsum(np.asarray(type_dist, np.float64))
    u = rng.uniform(0.0, cd[-1], nodes)
    return np.searchsorted(cd, u, side="right").astype(np.int64)


def callaway_traits_game(nodes: int, types: int, edges_per_step: int,
                         type_dist, pref_matrix, directed: bool = False,
                         seed: int = 42):
    """igraph_callaway_traits_game (src/games.c:1385): typed growth —
    each step adds a vertex, then ``edges_per_step`` uniform vertex
    pairs from the current graph, each kept with probability
    pref_matrix[type1][type2].  Returns (edges, node_types)."""
    rng = np.random.default_rng(seed)
    pref = np.asarray(pref_matrix, np.float64)
    node_types = _draw_types(rng, nodes, type_dist)
    src_l: list[int] = []
    dst_l: list[int] = []
    for i in range(1, nodes):
        n1 = rng.integers(0, i + 1, edges_per_step)
        n2 = rng.integers(0, i + 1, edges_per_step)
        keep = rng.random(edges_per_step) < pref[node_types[n1], node_types[n2]]
        src_l.extend(int(v) for v in n1[keep])
        dst_l.extend(int(v) for v in n2[keep])
    return _table(src_l, dst_l), node_types


def establishment_game(nodes: int, types: int, k: int, type_dist,
                       pref_matrix, directed: bool = False,
                       seed: int = 42):
    """igraph_establishment_game (src/games.c:1468): each new vertex
    i >= k samples k distinct earlier vertices and connects to each
    with probability pref_matrix[type_i][type_j].
    Returns (edges, node_types)."""
    rng = np.random.default_rng(seed)
    pref = np.asarray(pref_matrix, np.float64)
    node_types = _draw_types(rng, nodes, type_dist)
    src_l: list[int] = []
    dst_l: list[int] = []
    for i in range(k, nodes):
        pot = rng.choice(i, size=k, replace=False)
        keep = rng.random(k) < pref[node_types[i], node_types[pot]]
        src_l.extend([i] * int(keep.sum()))
        dst_l.extend(int(v) for v in pot[keep])
    return _table(src_l, dst_l), node_types


def _resolve_outseq(n: int, m: int, outseq) -> np.ndarray:
    if outseq is not None and len(outseq) not in (0, n):
        raise ValueError("outseq must have length n")
    if outseq is not None and len(outseq) == n:
        return np.asarray(outseq, np.int64)
    if m < 0:
        raise ValueError("m must be non-negative")
    return np.full(n, m, dtype=np.int64)


def recent_degree_game(n: int, power: float, window: int, m: int = 1,
                       outseq=None, outpref: bool = False,
                       zero_appeal: float = 1.0, directed: bool = True,
                       seed: int = 42) -> pa.Table:
    """igraph_recent_degree_game (src/games.c:1558): preferential
    attachment where attractiveness is (recent degree)^power +
    zero_appeal, recent = edges gained in the last ``window`` steps
    (a FIFO of citations, expired in batches per step)."""
    rng = np.random.default_rng(seed)
    outs = _resolve_outseq(n, m, outseq)
    tree = _Fenwick(max(n, 1))
    degree = np.zeros(n, dtype=np.float64)
    # history of targets per step; step boundaries via list-of-lists
    history: list[list[int]] = [[]]
    src_l: list[int] = []
    dst_l: list[int] = []
    tree.update(0, zero_appeal)
    for i in range(1, n):
        nm = int(outs[i])
        if i >= window:
            for j in history.pop(0):
                degree[j] -= 1
                tree.update(j, degree[j] ** power + zero_appeal)
        total = tree.total()
        step_targets: list[int] = []
        for _ in range(nm if total > 0.0 else 0):
            to = tree.search(rng.uniform(0.0, total))
            degree[to] += 1
            src_l.append(i)
            dst_l.append(to)
            step_targets.append(to)
        history.append(step_targets)
        for to in step_targets:
            tree.update(to, degree[to] ** power + zero_appeal)
        if outpref:
            degree[i] += nm
            tree.update(i, degree[i] ** power + zero_appeal)
        else:
            tree.update(i, zero_appeal)
    return _table(src_l, dst_l)


def barabasi_aging_game(nodes: int, m: int = 1, outseq=None,
                        outpref: bool = False, pa_exp: float = 1.0,
                        aging_exp: float = 0.0, aging_bin: int = 1,
                        zero_deg_appeal: float = 1.0,
                        zero_age_appeal: float = 0.0,
                        deg_coef: float = 1.0, age_coef: float = 1.0,
                        directed: bool = True, seed: int = 42) -> pa.Table:
    """igraph_barabasi_aging_game (src/games.c:1716): attachment
    weight = (deg_coef*k^pa_exp + zero_deg_appeal) *
    (age_coef*(age+1)^aging_exp + zero_age_appeal), age measured in
    bins of width nodes//aging_bin + 1."""
    if aging_bin <= 0:
        raise ValueError("aging_bin must be positive")
    rng = np.random.default_rng(seed)
    outs = _resolve_outseq(nodes, m, outseq)
    binwidth = nodes // aging_bin + 1
    tree = _Fenwick(max(nodes, 1))
    degree = np.zeros(nodes, dtype=np.float64)
    src_l: list[int] = []
    dst_l: list[int] = []

    def _w(deg: float, age: int) -> float:
        return (deg_coef * deg ** pa_exp + zero_deg_appeal) * (
            age_coef * float(age + 1) ** aging_exp + zero_age_appeal
        )

    tree.update(0, zero_deg_appeal * (1.0 + zero_age_appeal))
    for i in range(1, nodes):
        nm = int(outs[i])
        total = tree.total()
        step_targets: list[int] = []
        for _ in range(nm if total > 0.0 else 0):
            to = tree.search(rng.uniform(0.0, total))
            degree[to] += 1
            src_l.append(i)
            dst_l.append(to)
            step_targets.append(to)
        for to in step_targets:
            age = (i - to) // binwidth
            tree.update(to, _w(degree[to], age))
        if outpref:
            degree[i] += nm
            tree.update(i, (zero_age_appeal + 1.0)
                        * (deg_coef * degree[i] ** pa_exp + zero_deg_appeal))
        else:
            tree.update(i, (1.0 + zero_age_appeal) * zero_deg_appeal)
        # vertices crossing a bin boundary age one unit (games.c:1807)
        k = 1
        while i - binwidth * k + 1 >= 1:
            shnode = i - binwidth * k
            age = (i - shnode) // binwidth
            tree.update(shnode, _w(degree[shnode], age + 1))
            k += 1
    return _table(src_l, dst_l)


def recent_degree_aging_game(nodes: int, m: int = 1, outseq=None,
                             outpref: bool = False, pa_exp: float = 1.0,
                             aging_exp: float = 0.0, aging_bin: int = 1,
                             time_window: int = 10,
                             zero_appeal: float = 1.0,
                             directed: bool = True,
                             seed: int = 42) -> pa.Table:
    """igraph_recent_degree_aging_game (src/games.c:1872): weight =
    (recent_deg^pa_exp + zero_appeal) * (age+1)^aging_exp with the
    recent-degree FIFO of recent_degree_game and the bin aging of
    barabasi_aging_game."""
    if aging_bin <= 0:
        raise ValueError("aging_bin must be positive")
    rng = np.random.default_rng(seed)
    outs = _resolve_outseq(nodes, m, outseq)
    binwidth = nodes // aging_bin + 1
    tree = _Fenwick(max(nodes, 1))
    degree = np.zeros(nodes, dtype=np.float64)
    history: list[list[int]] = [[]]
    src_l: list[int] = []
    dst_l: list[int] = []

    def _w(deg: float, age: int) -> float:
        return (deg ** pa_exp + zero_appeal) * float(age + 1) ** aging_exp

    tree.update(0, zero_appeal)
    for i in range(1, nodes):
        nm = int(outs[i])
        if i >= time_window:
            for j in history.pop(0):
                degree[j] -= 1
                tree.update(j, _w(degree[j], (i - j) // binwidth))
        total = tree.total()
        step_targets: list[int] = []
        for _ in range(nm if total > 0.0 else 0):
            to = tree.search(rng.uniform(0.0, total))
            degree[to] += 1
            src_l.append(i)
            dst_l.append(to)
            step_targets.append(to)
        history.append(step_targets)
        for to in step_targets:
            tree.update(to, _w(degree[to], (i - to) // binwidth))
        if outpref:
            degree[i] += nm
            tree.update(i, degree[i] ** pa_exp + zero_appeal)
        else:
            tree.update(i, zero_appeal)
        k = 1
        while i - binwidth * k + 1 >= 1:
            shnode = i - binwidth * k
            age = (i - shnode) // binwidth
            tree.update(shnode, _w(degree[shnode], age + 1))
            k += 1
    return _table(src_l, dst_l)


def lastcit_game(nodes: int, edges_per_node: int = 1, pagebins: int = 10,
                 preference=None, directed: bool = True,
                 seed: int = 42) -> pa.Table:
    """igraph_lastcit_game (src/games.c:3017): citation network where
    attractiveness depends on the time since a vertex was LAST cited,
    binned into ``pagebins`` lags; preference[pagebins] (the last
    element) is the never-cited attractiveness and must be > 0.
    Multi-edges are kept, as in the reference."""
    if preference is None:
        preference = [1.0] * pagebins + [1.0]
    preference = np.asarray(preference, np.float64)
    if len(preference) != pagebins + 1:
        raise ValueError("preference must have length pagebins+1")
    if pagebins <= 1:
        raise ValueError("at least two age bins are needed")
    if preference[pagebins] <= 0:
        raise ValueError("never-cited preference must be positive")
    rng = np.random.default_rng(seed)
    binwidth = nodes // pagebins + 1
    tree = _Fenwick(max(nodes, 1))
    lastcit = np.zeros(nodes, dtype=np.int64)  # 0 = never; else step+1
    index = np.zeros(nodes + 2, dtype=np.int64)  # edge offsets per step
    src_l: list[int] = []
    dst_l: list[int] = []
    tree.update(0, preference[pagebins])
    for i in range(1, nodes):
        for _ in range(edges_per_node):
            to = tree.search(rng.uniform(0.0, tree.total()))
            src_l.append(i)
            dst_l.append(to)
            lastcit[to] = i + 1
            tree.update(to, preference[0])
        tree.update(i, preference[pagebins])
        index[i + 1] = index[i] + edges_per_node
        # re-bin vertices whose last citation just crossed a bin edge
        k = 1
        while i - binwidth * k >= 1:
            shnode = i - binwidth * k
            for e in range(index[shnode], index[shnode + 1]):
                cnode = dst_l[e]
                if lastcit[cnode] == shnode + 1:
                    tree.update(cnode, preference[k])
            k += 1
    return _table(src_l, dst_l)


def cited_type_game(nodes: int, types, pref, edges_per_step: int = 1,
                    directed: bool = True, seed: int = 42) -> pa.Table:
    """igraph_cited_type_game (src/games.c:3151): each new vertex
    cites ``edges_per_step`` earlier vertices drawn with probability
    proportional to pref[type[target]].  Multi-edges kept."""
    types = np.asarray(types, np.int64)
    pref = np.asarray(pref, np.float64)
    rng = np.random.default_rng(seed)
    # cumulative attractivity over vertices in insertion order
    cum = np.zeros(nodes + 1, dtype=np.float64)
    cum[1] = pref[types[0]]
    src_l: list[int] = []
    dst_l: list[int] = []
    for i in range(1, nodes):
        if cum[i] > 0.0:
            r = rng.uniform(0.0, cum[i], edges_per_step)
            tos = np.searchsorted(cum[: i + 1], r, side="right") - 1
            src_l.extend([i] * edges_per_step)
            dst_l.extend(int(t) for t in tos)
        cum[i + 1] = cum[i] + pref[types[i]]
    return _table(src_l, dst_l)


def citing_cited_type_game(nodes: int, types, pref,
                           edges_per_step: int = 1,
                           directed: bool = True,
                           seed: int = 42) -> pa.Table:
    """igraph_citing_cited_type_game (src/games.c:3242): like
    cited_type_game but the attachment kernel depends on BOTH
    endpoint categories — one psumtree per citing category, weight
    pref[citing_cat][cited_cat]."""
    types = np.asarray(types, np.int64)
    pref = np.asarray(pref, np.float64)
    nocats = pref.shape[0]
    rng = np.random.default_rng(seed)
    trees = [_Fenwick(max(nodes, 1)) for _ in range(nocats)]
    sums = np.zeros(nocats, dtype=np.float64)
    for c in range(nocats):
        trees[c].update(0, pref[c, types[0]])
        sums[c] = pref[c, types[0]]
    src_l: list[int] = []
    dst_l: list[int] = []
    for i in range(1, nodes):
        t = int(types[i])
        # zero total attractiveness for this citing category: no valid
        # target (the reference's psumtree_search is degenerate here) —
        # skip the draws, documented divergence.
        if sums[t] > 0.0:
            for _ in range(edges_per_step):
                to = trees[t].search(rng.uniform(0.0, sums[t]))
                src_l.append(i)
                dst_l.append(to)
        for c in range(nocats):
            trees[c].update(i, pref[c, t])
            sums[c] += pref[c, t]
    return _table(src_l, dst_l)


def asymmetric_preference_game(nodes: int, types: int,
                               type_dist_matrix=None, pref_matrix=None,
                               loops: bool = False, seed: int = 42):
    """igraph_asymmetric_preference_game (src/games.c:2447): every
    vertex gets a joint (in-type, out-type) pair from
    ``type_dist_matrix`` (uniform if None); each ordered pair (u, v)
    gains a directed edge with probability
    pref_matrix[out_type(u)][in_type(v)].
    Returns (edges, in_types, out_types)."""
    if types < 1:
        raise ValueError("types must be >= 1")
    pref = np.asarray(pref_matrix, np.float64)
    if pref.shape[0] < types or pref.shape[1] < types:
        raise ValueError("pref_matrix too small")
    rng = np.random.default_rng(seed)
    if type_dist_matrix is None:
        joint = np.full((types, types), 1.0)
    else:
        joint = np.asarray(type_dist_matrix, np.float64)[:types, :types]
    flat = joint.ravel()
    cd = np.cumsum(flat)
    u = rng.uniform(0.0, cd[-1], nodes)
    pair = np.searchsorted(cd, u, side="right")
    in_types = (pair // types).astype(np.int64)
    out_types = (pair % types).astype(np.int64)
    # vectorized pair evaluation: per (out-type, in-type) block use
    # geometric-skip G(n,p) over the index grid, like preference_game.
    src_l: list[np.ndarray] = []
    dst_l: list[np.ndarray] = []
    vids_by_in = [np.flatnonzero(in_types == t) for t in range(types)]
    vids_by_out = [np.flatnonzero(out_types == t) for t in range(types)]
    for i in range(types):
        v1 = vids_by_out[i]
        for j in range(types):
            v2 = vids_by_in[j]
            p = pref[i, j]
            total = len(v1) * len(v2)
            if total == 0 or p <= 0:
                continue
            if p >= 1.0:
                idx = np.arange(total, dtype=np.int64)
            else:
                draws = rng.geometric(p, int(total * p + 10 * np.sqrt(total * p) + 10))
                pos = np.cumsum(draws) - 1
                while pos.size and pos[-1] < total - 1:
                    more = rng.geometric(p, 100)
                    pos = np.concatenate([pos, pos[-1] + np.cumsum(more)])
                idx = pos[pos < total]
            s = v1[idx // len(v2)]
            d = v2[idx % len(v2)]
            if not loops:
                keep = s != d
                s, d = s[keep], d[keep]
            src_l.append(s)
            dst_l.append(d)
    src = np.concatenate(src_l) if src_l else np.empty(0, np.int64)
    dst = np.concatenate(dst_l) if dst_l else np.empty(0, np.int64)
    return _table(src, dst), in_types, out_types


def forest_fire_game(nodes: int, fw_prob: float, bw_factor: float = 1.0,
                     ambs: int = 1, directed: bool = True,
                     seed: int = 42) -> pa.Table:
    """igraph_forest_fire_game (src/forestfire.c:106): each new vertex
    picks ``ambs`` uniform ambassadors and 'burns' outward — from each
    burning vertex it links Geom(1-fw_prob) of its out-neighbors and
    Geom(1-fw_prob*bw_factor) of its in-neighbors, never re-visiting a
    vertex within one step; every burned vertex gets an edge from the
    new vertex and joins the frontier queue."""
    if fw_prob < 0 or bw_factor < 0 or ambs < 0:
        raise ValueError("fw_prob, bw_factor and ambs must be non-negative")
    if fw_prob == 0 or ambs == 0:
        return _table([], [])
    if fw_prob * bw_factor >= 1.0:
        raise ValueError("fw_prob*bw_factor must be < 1")
    rng = np.random.default_rng(seed)
    p_out = 1.0 - fw_prob
    p_in = 1.0 - fw_prob * bw_factor
    inneis: list[list[int]] = [[] for _ in range(nodes)]
    outneis: list[list[int]] = [[] for _ in range(nodes)]
    visited = np.zeros(nodes, dtype=np.int64)
    src_l: list[int] = []
    dst_l: list[int] = []
    for actnode in range(1, nodes):
        visited[actnode] = actnode + 1
        queue: list[int] = []

        def _add(nei: int) -> None:
            if visited[nei] != actnode + 1:
                visited[nei] = actnode + 1
                queue.append(nei)
                src_l.append(actnode)
                dst_l.append(nei)
                outneis[actnode].append(nei)
                inneis[nei].append(actnode)

        for _ in range(ambs):
            _add(int(rng.integers(0, actnode)))
        qi = 0
        while qi < len(queue):
            actamb = queue[qi]
            qi += 1
            outv = outneis[actamb]
            inv = inneis[actamb]
            # RNG_GEOM(p) in igraph counts failures before success:
            # support {0,1,...} — numpy's geometric is {1,2,...}.
            neis_out = int(rng.geometric(p_out)) - 1 if p_out < 1 else 0
            neis_in = int(rng.geometric(p_in)) - 1 if p_in < 1 else 0
            for neis, vec in ((neis_out, outv), (neis_in, inv)):
                if neis >= len(vec):
                    for nei in list(vec):
                        _add(nei)
                else:
                    # partial Fisher-Yates: sample without replacement,
                    # skipping already-visited (forestfire.c:208-222)
                    arr = list(vec)
                    left = len(arr)
                    got = 0
                    while got < neis and left > 0:
                        which = int(rng.integers(0, left))
                        nei = arr[which]
                        arr[which] = arr[left - 1]
                        arr[left - 1] = nei
                        if visited[nei] != actnode + 1:
                            _add(nei)
                            got += 1
                        left -= 1
    return _table(src_l, dst_l)


def barabasi_power_game(n: int, power: float = 1.0, m: int = 1,
                        outseq=None, outpref: bool = False,
                        zero_appeal: float = 1.0, directed: bool = True,
                        seed: int = 42) -> pa.Table:
    """igraph_barabasi_game with power != 1 ("nonlinear barabasi",
    src/games.c:191 psumtree algorithm): attachment weight =
    deg^power + zero_appeal, no multiple edges per step draw
    (the reference's IGRAPH_BARABASI_PSUMTREE re-draws within a
    step only via tree zeroing; here each step's targets are drawn
    with the tree weights frozen at step start, multi-edges kept —
    matching IGRAPH_BARABASI_PSUMTREE_MULTIPLE, games.c:360-414)."""
    rng = np.random.default_rng(seed)
    outs = _resolve_outseq(n, m, outseq)
    tree = _Fenwick(max(n, 1))
    degree = np.zeros(n, dtype=np.float64)
    src_l: list[int] = []
    dst_l: list[int] = []
    tree.update(0, zero_appeal)
    for i in range(1, n):
        nm = int(outs[i])
        total = tree.total()
        step_targets = []
        for _ in range(nm if total > 0.0 else 0):
            to = tree.search(rng.uniform(0.0, total))
            degree[to] += 1
            src_l.append(i)
            dst_l.append(to)
            step_targets.append(to)
        for to in step_targets:
            tree.update(to, degree[to] ** power + zero_appeal)
        if outpref:
            degree[i] += nm
            tree.update(i, degree[i] ** power + zero_appeal)
        else:
            tree.update(i, zero_appeal)
    return _table(src_l, dst_l)
