"""SIR epidemic simulation (reference src/sir.c:107 igraph_sir).

Gillespie stochastic simulation on an undirected simple graph: every
infected vertex recovers at rate ``gamma``; every susceptible vertex
is infected at rate ``beta`` x (number of infected neighbors).  Each
run starts from one uniformly-chosen infected vertex and emits the
(time, #S, #I, #R) trajectory until no event has positive rate.

Distributed design: simulations are independent, so the graph's CSR
adjacency is broadcast ONCE via ``ray.put`` and the ``no_sim`` runs
fan out over Ray tasks in chunks — the per-run kernel is the same
sequential Gillespie loop the reference uses (a per-event psumtree
search is inherently serial), parallelism comes from the simulation
axis, which is exactly how epidemic studies consume it (thousands of
runs for confidence bands).

Event selection uses a Fenwick (binary-indexed) tree over per-vertex
rates — the same O(log n) update/search contract as the reference's
igraph_psumtree (src/psumtree.c), without replicating its layout.

Pinned divergences (documented, distribution-identical):
- RNG: each simulation j draws from ``numpy.random.default_rng((seed,
  j))`` instead of the reference's single global MT stream, making
  every run reproducible independent of the partitioning (the
  reference's trajectories depend on the stream position).
- The reference's psumtree search resolves rate ties by tree order;
  the Fenwick search resolves by vertex index.  Both are measure-zero
  events under continuous rates.
"""

from __future__ import annotations

import numpy as np

S_S, S_I, S_R = 0, 1, 2


class _Fenwick:
    """Prefix-sum tree over float rates; search(r) returns the first
    index whose cumulative sum exceeds r (igraph_psumtree_search
    contract)."""

    __slots__ = ("n", "size", "tree", "vals")

    def __init__(self, n: int):
        self.n = n
        self.size = 1
        while self.size < n:
            self.size <<= 1
        self.tree = np.zeros(self.size + 1)
        self.vals = np.zeros(n)

    def update(self, i: int, value: float) -> None:
        delta = value - self.vals[i]
        if delta == 0.0:
            return
        self.vals[i] = value
        j = i + 1
        while j <= self.size:
            self.tree[j] += delta
            j += j & (-j)

    def get(self, i: int) -> float:
        return float(self.vals[i])

    def search(self, r: float) -> int:
        idx = 0
        bit = self.size
        while bit:
            nxt = idx + bit
            if nxt <= self.size and self.tree[nxt] < r:
                r -= self.tree[nxt]
                idx = nxt
            bit >>= 1
        return min(idx, self.n - 1)



def _sir_one(indptr, indices, n, beta, gamma, seed, j):
    """One Gillespie run — the reference's event loop (sir.c:160-246)
    verbatim: rate(v) = gamma if infected, beta * (#infected
    neighbors) if susceptible, 0 if recovered."""
    rng = np.random.default_rng((seed, j))
    infected = int(rng.integers(0, n))
    status = np.zeros(n, np.int8)
    status[infected] = S_I
    ns, ni, nr = n - 1, 1, 0
    times = [0.0]
    no_s, no_i, no_r = [ns], [ni], [nr]

    tree = _Fenwick(n)
    tree.update(infected, gamma)
    neis = indices[indptr[infected]:indptr[infected + 1]]
    for nei in neis.tolist():
        tree.update(nei, beta)
    # the reference tracks psum by incremental float +/- (sir.c:196);
    # float residue can leave psum > 0 with an all-zero tree, which
    # loops forever.  n_si = EXACT integer count of (S vertex,
    # infected neighbor) pairs, so psum = gamma*ni + beta*n_si is
    # recomputed drift-free every event and terminates exactly.
    n_si = len(neis)
    while True:
        psum = gamma * ni + beta * n_si
        if psum <= 0.0:
            break
        tt = rng.exponential(1.0 / psum)
        r = rng.uniform(0.0, psum)
        v = tree.search(r)
        if status[v] == S_R or tree.get(v) == 0.0:
            # measure-zero guard: tree-internal float drift could in
            # principle land the search on a zero-rate vertex; skip
            # the draw rather than corrupt the state machine
            continue
        neis = indices[indptr[v]:indptr[v + 1]]
        if status[v] == S_I:                     # recovery
            status[v] = S_R
            ni -= 1
            nr += 1
            tree.update(v, 0.0)
            for nei in neis.tolist():
                if status[nei] == S_S:
                    n_si -= 1
                    tree.update(nei, tree.get(nei) - beta)
        else:                                    # infection (S_S)
            status[v] = S_I
            ns -= 1
            ni += 1
            tree.update(v, gamma)
            for nei in neis.tolist():
                st = status[nei]
                if st == S_S:
                    n_si += 1
                    tree.update(nei, tree.get(nei) + beta)
                elif st == S_I:
                    n_si -= 1  # v itself is no longer a susceptible
        times.append(tt + times[-1])
        no_s.append(ns)
        no_i.append(ni)
        no_r.append(nr)
    return times, no_s, no_i, no_r


def _csr_undirected(src, dst, n):
    """ALL-mode adjacency of the undirected simple graph (loops and
    duplicate arcs rejected upstream)."""
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, a + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, b


def sir(edges, n: int, beta: float, gamma: float, no_sim: int,
        seed: int = 42, P: int | None = None, directed: bool = False):
    """Run ``no_sim`` SIR simulations; returns a pyarrow Table
    (sim, t, no_s, no_i, no_r) with one row per event per simulation
    (row 0 of each sim is the t=0 initial state, matching the
    reference's igraph_sir_t vectors).

    Input-validation rules are the reference's (sir.c:122-141):
    empty graph, negative rates, non-positive no_sim error; edge
    directions are ignored with a warning; multigraphs/loops error
    (SIR only works with simple graphs)."""
    import pyarrow as pa
    import ray

    from .layout import _edges_np

    src, dst = _edges_np(edges)
    if n == 0:
        raise ValueError("Cannot run SIR model on empty graph")
    if beta < 0:
        raise ValueError("Beta must be non-negative in SIR model")
    if gamma < 0:
        raise ValueError("Gamma must be non-negative in SIR model")
    if no_sim <= 0:
        raise ValueError("Number of SIR simulations must be positive")
    if directed:
        import warnings

        warnings.warn("Edge directions are ignored in SIR model")
    if (src == dst).any():
        raise ValueError("SIR model only works with simple graphs")
    und = np.unique(np.stack([np.minimum(src, dst),
                              np.maximum(src, dst)], 1), axis=0)
    if len(und) != len(src):
        raise ValueError("SIR model only works with simple graphs")

    indptr, indices = _csr_undirected(src, dst, n)
    if P is None:
        P = min(no_sim, 16)
    adj_ref = ray.put((indptr, indices))

    @ray.remote
    def run_chunk(adj, lo, hi):
        iptr, idx = adj
        sims, tv, sv, iv, rv = [], [], [], [], []
        for j in range(lo, hi):
            times, no_s, no_i, no_r = _sir_one(
                iptr, idx, n, beta, gamma, seed, j)
            sims.extend([j] * len(times))
            tv.extend(times)
            sv.extend(no_s)
            iv.extend(no_i)
            rv.extend(no_r)
        return pa.table({
            "sim": np.asarray(sims, np.int64),
            "t": np.asarray(tv, np.float64),
            "no_s": np.asarray(sv, np.int64),
            "no_i": np.asarray(iv, np.int64),
            "no_r": np.asarray(rv, np.int64),
        })

    bounds = np.linspace(0, no_sim, P + 1).astype(int)
    parts = ray.get([
        run_chunk.remote(adj_ref, int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo
    ])
    return pa.concat_tables(parts)
