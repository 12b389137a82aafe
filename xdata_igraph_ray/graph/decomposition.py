"""Maximum cardinality search and chordality testing.

Reference: igraph_maximum_cardinality_search / igraph_is_chordal
(src/decomposition.c:56,252 — the Tarjan-Yannakakis linear-time
algorithms).  Pinned divergence: ties among maximum-cardinality
vertices are broken by SMALLEST vertex id (the reference pops the
head of a LIFO bucket list, an implementation-defined order).  Any
maximum-cardinality order is a perfect elimination order on a
chordal graph, so the chordality verdict is identical; the alpha
ranks and fill-in edge set are deterministic under the pinned rule
(which a SQL oracle can replay step by step).

Driver kernels over the distributed-collapsed support, same stance
as the other decomposition/enumeration algorithms here."""

from __future__ import annotations

import numpy as np
from ray.data import Dataset

from ..exchange import DEFAULT_PARTITIONS
from .separators import collapse_support


def maximum_cardinality_search(
    edges: Dataset | list | list[set],
    n: int | None = None,
    P: int = DEFAULT_PARTITIONS,
) -> tuple[np.ndarray, np.ndarray]:
    """(alpha, alpham1): alpha[v] = rank of vertex v (the first
    chosen vertex gets rank n-1, matching the reference's countdown),
    alpham1[i] = the vertex with rank i."""
    adj = (edges if isinstance(edges, list)
           and (not edges or isinstance(edges[0], set))
           else collapse_support(edges, n, P=P))
    n = len(adj)
    size = np.zeros(n, dtype=np.int64)
    alpha = np.full(n, -1, dtype=np.int64)
    alpham1 = np.full(n, -1, dtype=np.int64)
    numbered = np.zeros(n, dtype=bool)
    for i in range(n - 1, -1, -1):
        cand = np.flatnonzero(~numbered)
        v = int(cand[np.argmax(size[cand])])  # argmax -> first max ->
        # smallest id among ties (cand ascending)
        alpha[v] = i
        alpham1[i] = v
        numbered[v] = True
        for w in adj[v]:
            if not numbered[w]:
                size[w] += 1
    return alpha, alpham1


def is_chordal(
    edges: Dataset | list | list[set],
    n: int | None = None,
    P: int = DEFAULT_PARTITIONS,
    alpha: np.ndarray | None = None,
    alpham1: np.ndarray | None = None,
    fill_in: bool = False,
):
    """chordal flag (+ optional fill-in edge list) — reference
    igraph_is_chordal (src/decomposition.c:252): process vertices in
    alpha order; for each w, follow the f-chain from every earlier
    neighbor; a chain vertex not adjacent to w is a fill-in edge."""
    adj = (edges if isinstance(edges, list)
           and (not edges or isinstance(edges[0], set))
           else collapse_support(edges, n, P=P))
    n = len(adj)
    if alpha is None or alpham1 is None:
        alpha, alpham1 = maximum_cardinality_search(adj)
    f = np.zeros(n, dtype=np.int64)
    index = np.zeros(n, dtype=np.int64)
    chordal = True
    fills: list[tuple[int, int]] = []
    for i in range(n):
        w = int(alpham1[i])
        f[w] = w
        index[w] = i
        for v in adj[w]:
            if alpha[v] >= i:
                continue
            x = int(v)
            while index[x] < i:
                index[x] = i
                if w not in adj[x]:
                    chordal = False
                    if fill_in:
                        fills.append((x, w))
                    else:
                        return False, []
                x = int(f[x])
            if f[x] == x:  # reference: if f(x)=x -> f(x):=w
                f[x] = w
    return chordal, fills
