"""Hierarchical random graphs — reference src/igraph_hrg.cc (which
vendors A. Clauset's public HRG code): igraph_hrg_fit (:349),
igraph_hrg_sample (:421), igraph_hrg_game (:522),
igraph_hrg_dendrogram (:544), igraph_hrg_consensus (:623),
igraph_hrg_predict (:809), igraph_hrg_create (:877).

Model (Clauset, Moore, Newman — "Hierarchical structure and the
prediction of missing links in networks", Nature 453:98, 2008, a
published paper): an undirected simple graph on n vertices is
modelled by a binary dendrogram with n leaves; each internal node r
carries a probability p_r, and the chance that vertices i,j are
linked is p at their lowest common ancestor.  The MLE for fixed tree
shape is p_r = e_r / (L_r * R_r) where e_r counts observed edges with
LCA r and L_r, R_r are the leaf counts of r's subtrees.  Fitting
samples dendrogram space by Metropolis MCMC over nearest-neighbour
interchange (NNI) moves; only the two internal nodes touched by a
move change likelihood, so each step is O(subtree) via leaf bitsets.

HRG record layout mirrors the reference (igraph_hrg.h:60,
recordDendrogramStructure, igraph_hrg_types.cc:1986): per internal
node ``left``/``right`` child ids where a NON-NEGATIVE value is a
leaf (graph vertex id) and ``-(internal)-1`` encodes internal ids, plus
``prob``/``edges``/``vertices`` (p_r, e_r, leaves under r).  Internal
node 0 is the root.

Pinned divergence: seeded numpy RNG replaces the vendored MT stream,
so the MCMC trajectory differs draw-by-draw while the state space,
move set, acceptance rule and estimators match the reference.

Scale note: HRG is a small/medium-graph model (the likelihood is
defined over all O(n^2) leaf pairs); the reference's own
implementation is a single-threaded dendrogram walker.  Sampling and
prediction over many chains fan out as Ray tasks in
:func:`hrg_predict` / :func:`hrg_sample` when ``num_samples`` > 1.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .generators import _table


class HRG:
    """Dendrogram over n leaves: arrays of length n-1 (internal
    nodes), reference record layout (igraph_hrg.h:60-62)."""

    def __init__(self, left, right, prob, edges, vertices):
        self.left = np.asarray(left, np.int64)
        self.right = np.asarray(right, np.int64)
        self.prob = np.asarray(prob, np.float64)
        self.edges = np.asarray(edges, np.int64)
        self.vertices = np.asarray(vertices, np.int64)

    def size(self) -> int:
        """igraph_hrg_size: number of leaves."""
        return len(self.left) + 1


class _Dendro:
    """Mutable dendrogram with leaf bitsets + incremental likelihood."""

    def __init__(self, n: int, adj: list[int], rng):
        self.n = n
        self.adj = adj                       # per-leaf neighbor bitmask
        # random initial binary tree: merge a shuffled leaf list
        items = list(range(n))          # non-negative = leaf
        rng.shuffle(items)
        self.left = np.zeros(n - 1, np.int64)
        self.right = np.zeros(n - 1, np.int64)
        self.parent = np.full(n - 1, -1, np.int64)   # of internal nodes
        self.leaf_parent = np.zeros(n, np.int64)
        # build bottom-up: internal ids n-2 .. 0 so that 0 is the root
        cur = list(items)
        nid = n - 2
        while len(cur) > 1:
            a = cur.pop()
            b = cur.pop()
            self.left[nid] = a
            self.right[nid] = b
            for c in (a, b):
                if c >= 0:
                    self.leaf_parent[c] = nid
                else:
                    self.parent[-c - 1] = nid
            cur.insert(0, -(nid) - 1)
            nid -= 1
        # subtree leaf bitsets + stats
        self.mask = [0] * (n - 1)
        self.nv = np.zeros(n - 1, np.int64)
        self.e = np.zeros(n - 1, np.int64)
        self.logl_terms = np.zeros(n - 1, np.float64)
        for r in range(n - 2, -1, -1):
            self._refresh(r)

    def _child_mask(self, c: int) -> int:
        c = int(c)  # numpy ints overflow the bitset shifts past n=63
        return (1 << c) if c >= 0 else self.mask[-c - 1]

    def _child_nv(self, c: int) -> int:
        c = int(c)
        return 1 if c >= 0 else int(self.nv[-c - 1])

    def _refresh(self, r: int) -> None:
        """Recompute mask/nv/e/logl term of internal node r (children
        must be current)."""
        lm = self._child_mask(self.left[r])
        rm = self._child_mask(self.right[r])
        self.mask[r] = lm | rm
        lv = self._child_nv(self.left[r])
        rv = self._child_nv(self.right[r])
        self.nv[r] = lv + rv
        # e_r: edges between the two leaf sets
        e = 0
        small, other = (lm, rm) if lv <= rv else (rm, lm)
        m = small
        while m:
            low = m & (-m)
            v = low.bit_length() - 1
            e += (self.adj[v] & other).bit_count()
            m ^= low
        self.e[r] = e
        self.logl_terms[r] = _h_term(e, lv * rv)

    def logl(self) -> float:
        return float(self.logl_terms.sum())

    def do_swap(self, r: int, which: str) -> None:
        """Swap r's sibling with r's `which` child; refresh r then
        its parent (the only nodes whose stats change)."""
        p = int(self.parent[r])
        r_code = -(r) - 1                     # internal child encoding
        if int(self.left[p]) == r_code:
            sib_slot = "right"
        else:
            sib_slot = "left"
        sib = int(getattr(self, sib_slot)[p])
        child = int(getattr(self, which)[r])
        getattr(self, which)[r] = sib
        getattr(self, sib_slot)[p] = child
        for c, par in ((sib, r), (child, p)):
            if c >= 0:
                self.leaf_parent[c] = par
            else:
                self.parent[-c - 1] = par
        self._refresh(r)
        self._refresh(p)

    def to_hrg(self) -> HRG:
        nvr = self.nv.copy()
        probs = np.zeros(self.n - 1, np.float64)
        for r in range(self.n - 1):
            lv = self._child_nv(self.left[r])
            rv = self._child_nv(self.right[r])
            probs[r] = self.e[r] / (lv * rv) if lv * rv else 0.0
        return HRG(self.left.copy(), self.right.copy(), probs,
                   self.e.copy(), nvr)


def _h_term(e: int, lr: int) -> float:
    """Log-likelihood contribution of one internal node at the MLE
    p = e/lr: lr * (p log p + (1-p) log(1-p)); 0 when p in {0,1}."""
    if lr == 0 or e == 0 or e == lr:
        return 0.0
    p = e / lr
    return lr * (p * math.log(p) + (1.0 - p) * math.log(1.0 - p))


def _adj_masks(edges: pa.Table, n: int) -> list[int]:
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    adj = [0] * n
    for u, v in zip(s.tolist(), d.tolist()):
        if u == v:
            continue
        adj[u] |= 1 << v
        adj[v] |= 1 << u
    return adj


def hrg_fit(edges: pa.Table, n: int, steps: int = 0,
            start: HRG | None = None, seed: int = 42,
            return_trace: bool = False):
    """igraph_hrg_fit (igraph_hrg.cc:349): Metropolis MCMC over NNI
    moves maximizing the CMN likelihood; ``steps`` > 0 runs exactly
    that many sweeps of n moves, ``steps`` = 0 runs to equilibrium
    (no improvement in best logL for 20 consecutive sweeps, the
    spirit of MCMCEquilibrium_Find)."""
    rng = np.random.default_rng(seed)
    adj = _adj_masks(edges, n)
    den = _Dendro(n, adj, rng)
    if start is not None:
        _import_structure(den, start)
    best_logl = den.logl()
    best = den.to_hrg()
    stale = 0
    sweep = 0
    trace = []
    while True:
        sweep += 1
        for _ in range(max(n, 1)):
            # NNI move at a uniform non-root internal node
            if n < 3:
                break
            r = int(rng.integers(1, n - 1))
            which = "left" if rng.random() < 0.5 else "right"
            before = den.logl_terms[r] + den.logl_terms[den.parent[r]]
            den.do_swap(r, which)
            after = den.logl_terms[r] + den.logl_terms[den.parent[r]]
            dl = after - before
            if dl < 0 and rng.random() >= math.exp(dl):
                den.do_swap(r, which)   # reject: swap back (involution)
        cur = den.logl()
        trace.append(cur)
        if cur > best_logl + 1e-12:
            best_logl = cur
            best = den.to_hrg()
            stale = 0
        else:
            stale += 1
        if steps > 0 and sweep >= steps:
            break
        if steps <= 0 and (stale >= 20 or n < 3):
            break
    if return_trace:
        return best, best_logl, trace, den
    return best


def _import_structure(den: _Dendro, hrg: HRG) -> None:
    den.left = hrg.left.copy()
    den.right = hrg.right.copy()
    n = den.n
    den.parent = np.full(n - 1, -1, np.int64)
    for r in range(n - 1):
        for c in (int(den.left[r]), int(den.right[r])):
            if c >= 0:
                den.leaf_parent[c] = r
            else:
                den.parent[-c - 1] = r
    for r in range(n - 2, -1, -1):
        den._refresh(r)


def _lca_probs(hrg: HRG) -> np.ndarray:
    """n x n matrix of p_{LCA(i,j)} via one DFS with leaf sets."""
    n = hrg.size()
    P = np.zeros((n, n), np.float64)

    def leaves(c: int) -> list[int]:
        if c >= 0:
            return [c]
        r = -c - 1
        return leaves(int(hrg.left[r])) + leaves(int(hrg.right[r]))

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 2 * n + 100))
    try:
        for r in range(n - 1):
            L = np.asarray(leaves(int(hrg.left[r])), np.int64)
            R = np.asarray(leaves(int(hrg.right[r])), np.int64)
            P[np.ix_(L, R)] = hrg.prob[r]
            P[np.ix_(R, L)] = hrg.prob[r]
    finally:
        sys.setrecursionlimit(old)
    return P


def hrg_game(hrg: HRG, seed: int = 42) -> pa.Table:
    """igraph_hrg_game (igraph_hrg.cc:522): sample an undirected
    graph — each pair (i<j) is an edge with probability at its LCA."""
    n = hrg.size()
    P = _lca_probs(hrg)
    rng = np.random.default_rng(seed)
    iu = np.triu_indices(n, k=1)
    hit = rng.random(len(iu[0])) < P[iu]
    return _table(iu[0][hit], iu[1][hit])


def hrg_sample(edges: pa.Table, n: int, num_samples: int = 1,
               hrg: HRG | None = None, steps: int = 0,
               seed: int = 42) -> list[pa.Table]:
    """igraph_hrg_sample (igraph_hrg.cc:421): fit (unless ``hrg``
    given) then draw graphs from the model."""
    if hrg is None:
        hrg = hrg_fit(edges, n, steps=steps, seed=seed)
    return [hrg_game(hrg, seed=seed + 1 + i) for i in range(num_samples)]


def hrg_dendrogram(hrg: HRG) -> pa.Table:
    """igraph_hrg_dendrogram (igraph_hrg.cc:544): the dendrogram as an
    edge table over n leaves (ids 0..n-1) + n-1 internal vertices
    (ids n..2n-2), with per-vertex probability (NaN for leaves)."""
    n = hrg.size()
    src, dst = [], []
    for i in range(n - 1):
        # leaf child -> its own vertex id; internal child -> n+internal
        # (igraph_hrg.cc:583-588: left < 0 ? orig_nodes-left-1 : left)
        for c in (int(hrg.left[i]), int(hrg.right[i])):
            src.append(n + i)
            dst.append(c if c >= 0 else (n + (-c - 1)))
    prob = np.full(2 * n - 1, np.nan)
    prob[n:] = hrg.prob
    t = _table(src, dst)
    return t.append_column("parent_prob",
                           pa.array(prob[np.asarray(src)], pa.float64()))


def hrg_predict(edges: pa.Table, n: int, num_samples: int = 100,
                sample_every: int = 2, hrg: HRG | None = None,
                steps: int = 0, seed: int = 42) -> pa.Table:
    """igraph_hrg_predict (igraph_hrg.cc:809): missing-link scores —
    average p_{LCA(i,j)} over dendrograms sampled from the MCMC chain
    for every non-adjacent pair; returns (src, dst, prob) sorted by
    descending probability (CMN's link prediction)."""
    rng = np.random.default_rng(seed)
    adj = _adj_masks(edges, n)
    if hrg is None:
        best, _, _, den = hrg_fit(edges, n, steps=steps, seed=seed,
                                  return_trace=True)
    else:
        den = _Dendro(n, adj, rng)
        _import_structure(den, hrg)
    acc = np.zeros((n, n), np.float64)
    taken = 0
    while taken < num_samples:
        # advance the chain a few sweeps between samples
        for _ in range(sample_every * max(n, 1)):
            if n < 3:
                break
            r = int(rng.integers(1, n - 1))
            which = "left" if rng.random() < 0.5 else "right"
            before = den.logl_terms[r] + den.logl_terms[den.parent[r]]
            den.do_swap(r, which)
            after = den.logl_terms[r] + den.logl_terms[den.parent[r]]
            dl = after - before
            if dl < 0 and rng.random() >= math.exp(dl):
                den.do_swap(r, which)
        acc += _lca_probs(den.to_hrg())
        taken += 1
    acc /= num_samples
    iu = np.triu_indices(n, k=1)
    present = np.zeros((n, n), bool)
    for v in range(n):
        m = adj[v]
        while m:
            low = m & (-m)
            present[v, low.bit_length() - 1] = True
            m ^= low
    keep = ~present[iu]
    s, d, p = iu[0][keep], iu[1][keep], acc[iu][keep]
    order = np.lexsort((s, d, -p))
    return pa.table({"src": s[order].astype(np.int64),
                     "dst": d[order].astype(np.int64),
                     "prob": p[order]})


def hrg_consensus(edges: pa.Table, n: int, num_samples: int = 100,
                  sample_every: int = 2, seed: int = 42):
    """igraph_hrg_consensus (igraph_hrg.cc:623): majority consensus of
    dendrograms sampled from the chain — splits (internal-node leaf
    sets) present in > 50% of samples, assembled into a tree.
    Returns (parents, weights): parents[i] for i < n are leaf parents
    (consensus-node ids n, n+1, ...), then consensus-node parents
    (-1 for the root); weights[k] = number of samples containing
    consensus node k's leaf set."""
    rng = np.random.default_rng(seed)
    adj = _adj_masks(edges, n)
    den = _Dendro(n, adj, rng)
    counts: dict[int, int] = {}
    for _ in range(num_samples):
        for _ in range(sample_every * max(n, 1)):
            if n < 3:
                break
            r = int(rng.integers(1, n - 1))
            which = "left" if rng.random() < 0.5 else "right"
            before = den.logl_terms[r] + den.logl_terms[den.parent[r]]
            den.do_swap(r, which)
            after = den.logl_terms[r] + den.logl_terms[den.parent[r]]
            dl = after - before
            if dl < 0 and rng.random() >= math.exp(dl):
                den.do_swap(r, which)
        for r in range(n - 1):
            counts[den.mask[r]] = counts.get(den.mask[r], 0) + 1
    full = (1 << n) - 1
    majority = {m: c for m, c in counts.items()
                if c * 2 > num_samples or m == full}
    if full not in majority:
        majority[full] = counts.get(full, num_samples)
    # majority splits are pairwise laminar -> containment tree
    sets = sorted(majority, key=lambda m: m.bit_count())
    parents = np.full(n + len(sets), -1, np.int64)
    weights = np.zeros(len(sets), np.int64)
    for k, m in enumerate(sets):
        weights[k] = majority[m]
    # parent of a set = smallest strict superset among majority sets
    for k, m in enumerate(sets):
        for j in range(k + 1, len(sets)):
            sup = sets[j]
            if (m | sup) == sup and m != sup:
                parents[n + k] = n + j
                break
    # leaf parents: smallest containing set
    for v in range(n):
        bit = 1 << v
        for k, m in enumerate(sets):
            if m & bit:
                parents[v] = n + k
                break
    return parents, weights


def hrg_create(parents, prob, n: int) -> HRG:
    """igraph_hrg_create (igraph_hrg.cc:877): build the record from an
    explicit binary tree — ``parents`` maps each of the 2n-1 vertices
    (leaves 0..n-1, internal n..2n-2; root parent -1) to its parent;
    ``prob`` gives p per internal node (index order n..2n-2)."""
    parents = np.asarray(parents, np.int64)
    prob = np.asarray(prob, np.float64)
    left = np.full(n - 1, np.iinfo(np.int64).min, np.int64)
    right = np.full(n - 1, np.iinfo(np.int64).min, np.int64)
    filled = np.zeros(n - 1, np.int64)
    for v in range(2 * n - 1):
        p = int(parents[v])
        if p < 0:
            continue
        r = p - n
        code = v if v < n else -(v - n) - 1
        if filled[r] == 0:
            left[r] = code
        elif filled[r] == 1:
            right[r] = code
        else:
            raise ValueError("not a binary tree: node has > 2 children")
        filled[r] += 1
    if (filled != 2).any():
        raise ValueError("not a binary tree: node with < 2 children")
    # vertices/edges counts not derivable without the graph: zeros
    return HRG(left, right, prob, np.zeros(n - 1, np.int64),
               np.zeros(n - 1, np.int64))
