"""Linear sum assignment (igraph_solve_lsap, src/lsap.c:601,
include/igraph_lsap.h:9): square min-cost assignment, p[i] = the
column assigned to row i.

The reference vendors a classic O(n^3) Hungarian solver; this is the
equally classic Jonker-Volkgenant shortest-augmenting-path formulation
(same optimum, textbook algorithm) with the per-row inner scan
vectorized over columns.  Exact, deterministic; among multiple optima
the returned one may differ from the reference's (any optimal
assignment satisfies the same cost — tests pin the COST against brute
force, plus permutation validity).
"""

from __future__ import annotations

import numpy as np


def solve_lsap(cost) -> np.ndarray:
    """Minimum-cost perfect assignment on a square cost matrix.

    Returns an int64 array ``p`` with ``p[i]`` = column assigned to
    row i (a permutation of 0..n-1) minimizing ``sum(cost[i, p[i]])``.
    """
    c = np.asarray(cost, dtype=np.float64)
    if c.ndim != 2 or c.shape[0] != c.shape[1]:
        raise ValueError("solve_lsap needs a square cost matrix")
    n = c.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if not np.isfinite(c).all():
        raise ValueError("solve_lsap: cost matrix must be finite")

    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row matched to col j
    way = np.zeros(n + 1, dtype=np.int64)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            # vectorized relaxation over unused columns
            free = ~used[1:]
            cur = c[i0 - 1, :] - u[i0] - v[1:]
            upd = free & (cur < minv[1:])
            minv[1:][upd] = cur[upd]
            way[1:][upd] = j0
            cand = np.where(free, minv[1:], INF)
            j1 = int(np.argmin(cand)) + 1
            delta = cand[j1 - 1]
            u[p[used]] += delta
            v[used] -= delta
            minv[1:][free] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0 != 0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    out = np.zeros(n, dtype=np.int64)
    for j in range(1, n + 1):
        out[p[j] - 1] = j - 1
    return out
