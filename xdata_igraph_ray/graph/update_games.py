"""Microscopic update rules for games on graphs — reference
src/microscopic_update.c: igraph_deterministic_optimal_imitation
(:568), igraph_moran_process (:680), igraph_roulette_wheel_imitation
(:844), igraph_stochastic_imitation (:965).

Single-step strategy revisions on a population graph: per-vertex
state is (quantity, strategy); one call updates ONE vertex (or one
birth/death pair for Moran), exactly like the reference.  These are
small-state driver-side kernels: the graph lives in an edge table,
the per-vertex vectors are numpy arrays.  A long simulation loop is
the caller's (seeded) composition of steps, as in the reference's
test programs.

Pinned divergence: seeded ``numpy.random.default_rng`` replaces the
reference's global RNG stream; draw-by-draw results differ while the
update rules (selection kernels, perspective semantics, zero-sum and
isolation guards) are replicated exactly.

Inputs: ``edges`` is a pyarrow.Table (src, dst); ``strategies`` /
``quantities`` are length-n arrays.  Functions return NEW arrays (the
inputs are not mutated), matching numpy convention rather than the
reference's in-place vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMITATE_AUGMENTED = "augmented"
IMITATE_BLIND = "blind"
IMITATE_CONTRACTED = "contracted"


def _neighbors(edges: pa.Table, vid: int, mode: str) -> np.ndarray:
    """Per-incident-edge neighbor list (multiplicity kept, like
    igraph_neighbors); loops excluded from the isolation test only."""
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    out = []
    if mode in ("out", "all"):
        out.append(d[s == vid])
    if mode in ("in", "all"):
        out.append(s[d == vid])
    nb = np.concatenate(out) if out else np.empty(0, np.int64)
    return nb.astype(np.int64)


def _standard_tests(edges: pa.Table, n: int, vid: int, quantities,
                    strategies, mode: str, islocal: bool) -> bool:
    """igraph_microscopic_standard_tests (microscopic_update.c:414):
    raises on malformed input; returns False (no update) for the
    degenerate graphs the reference silently skips."""
    if n < 1:
        raise ValueError("graph cannot be empty")
    if len(quantities) != n:
        raise ValueError("quantities length != vertex count")
    if len(strategies) != n:
        raise ValueError("strategies length != vertex count")
    if n < 2 or edges.num_rows < 1:
        return False
    if islocal:
        nb = _neighbors(edges, vid, mode)
        if (nb != vid).sum() < 1:   # NO_LOOPS degree test
            return False
    return True


def deterministic_optimal_imitation(edges: pa.Table, n: int, vid: int,
                                    quantities, strategies,
                                    optimality: str = "maximum",
                                    mode: str = "all",
                                    seed: int = 42) -> np.ndarray:
    """microscopic_update.c:568 — vid adopts the strategy of the
    neighbor (or itself) with locally maximal (or minimal) quantity;
    ties are broken uniformly at random via a neighbor shuffle."""
    strategies = np.asarray(strategies).copy()
    quantities = np.asarray(quantities, np.float64)
    if not _standard_tests(edges, n, vid, quantities, strategies,
                           mode, islocal=True):
        return strategies
    rng = np.random.default_rng(seed)
    adj = _neighbors(edges, vid, mode)
    rng.shuffle(adj)
    best, q = vid, quantities[vid]
    for v in adj:
        if optimality == "maximum":
            if quantities[v] > q:
                best, q = int(v), quantities[v]
        else:
            if quantities[v] < q:
                best, q = int(v), quantities[v]
    strategies[vid] = strategies[best]
    return strategies


def roulette_wheel_imitation(edges: pa.Table, n: int, vid: int,
                             quantities, strategies,
                             islocal: bool = True, mode: str = "all",
                             seed: int = 42) -> np.ndarray:
    """microscopic_update.c:844 — vid imitates a vertex drawn with
    probability proportional to quantity.  Local perspective draws
    over neighbors with vid's own quantity as the implicit tail (r
    beyond the last neighbor = keep own strategy); global draws over
    all vertices."""
    strategies = np.asarray(strategies).copy()
    quantities = np.asarray(quantities, np.float64)
    if not _standard_tests(edges, n, vid, quantities, strategies,
                           mode, islocal):
        return strategies
    rng = np.random.default_rng(seed)
    if islocal:
        A = _neighbors(edges, vid, mode)
        S = quantities[A].sum() + quantities[vid]
    else:
        A = np.arange(n, dtype=np.int64)
        S = quantities.sum()
    if S == 0.0:
        raise ValueError("vector of values sums to zero")
    V = np.cumsum(quantities[A] / S)
    r = rng.random()
    hit = np.flatnonzero(r <= V)
    if len(hit):
        strategies[vid] = strategies[A[hit[0]]]
    # else: local tail — vid keeps its own strategy
    return strategies


def stochastic_imitation(edges: pa.Table, n: int, vid: int,
                         quantities, strategies,
                         algo: str = IMITATE_BLIND, mode: str = "all",
                         seed: int = 42) -> np.ndarray:
    """microscopic_update.c:965 — blind (copy a uniform neighbor or
    self), augmented (copy a uniform neighbor iff strictly fitter),
    contracted (iff strictly less fit)."""
    if algo not in (IMITATE_AUGMENTED, IMITATE_BLIND, IMITATE_CONTRACTED):
        raise ValueError(f"unsupported imitation algorithm: {algo}")
    strategies = np.asarray(strategies).copy()
    quantities = np.asarray(quantities, np.float64)
    if not _standard_tests(edges, n, vid, quantities, strategies,
                           mode, islocal=True):
        return strategies
    rng = np.random.default_rng(seed)
    adj = _neighbors(edges, vid, mode)
    if algo == IMITATE_BLIND:
        adj = np.concatenate([adj, [vid]])
        u = int(adj[rng.integers(0, len(adj))])
        strategies[vid] = strategies[u]
    elif algo == IMITATE_AUGMENTED:
        u = int(adj[rng.integers(0, len(adj))])
        if quantities[u] > quantities[vid]:
            strategies[vid] = strategies[u]
    else:  # contracted
        u = int(adj[rng.integers(0, len(adj))])
        if quantities[u] < quantities[vid]:
            strategies[vid] = strategies[u]
    return strategies


def moran_process(edges: pa.Table, n: int, quantities, strategies,
                  weights=None, mode: str = "all",
                  seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """microscopic_update.c:680 — one Moran birth/death step: a
    reproducer ``a`` is drawn proportional to quantity over the
    NON-ISOLATED vertices (isolated slots fall through to the next
    vertex, as in the reference's skip loop); the victim ``b`` is the
    far endpoint of an incident edge of ``a`` drawn proportional to
    edge weight; b becomes a clone of a (quantity and strategy)."""
    quantities = np.asarray(quantities, np.float64).copy()
    strategies = np.asarray(strategies).copy()
    if not _standard_tests(edges, n, -1, quantities, strategies,
                           mode, islocal=False):
        return quantities, strategies
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    if weights is None:
        weights = np.ones(edges.num_rows, np.float64)
    weights = np.asarray(weights, np.float64)
    if len(weights) != edges.num_rows:
        raise ValueError("weights length != edge count")
    S = quantities.sum()
    if S == 0.0:
        raise ValueError("vector of values sums to zero")
    rng = np.random.default_rng(seed)

    # degree (NO_LOOPS) per mode, for the isolation skip
    deg = np.zeros(n, np.int64)
    nl = s != d
    if mode in ("out", "all"):
        deg += np.bincount(s[nl], minlength=n)
    if mode in ("in", "all"):
        deg += np.bincount(d[nl], minlength=n)

    V = np.cumsum(quantities / S)
    r = rng.random()
    a = -1
    for u in range(n):
        if deg[u] < 1:
            continue
        if r <= V[u]:
            a = u
            break
    if a < 0:  # float-tail safety: last non-isolated vertex
        a = int(np.flatnonzero(deg >= 1)[-1])

    # incident edges of a, per mode, in edge-id order
    if mode == "out":
        eids = np.flatnonzero(s == a)
    elif mode == "in":
        eids = np.flatnonzero(d == a)
    else:
        eids = np.flatnonzero((s == a) | (d == a))
    w = weights[eids]
    Sw = w.sum()
    if Sw == 0.0:
        raise ValueError("incident edge weights sum to zero")
    r = rng.random()
    k = int(np.searchsorted(np.cumsum(w / Sw), r, side="left"))
    k = min(k, len(eids) - 1)
    e = int(eids[k])
    b = int(d[e]) if int(s[e]) == a else int(s[e])
    quantities[b] = quantities[a]
    strategies[b] = strategies[a]
    return quantities, strategies
