"""Feedback arc set.

Reference: igraph_feedback_arc_set (src/feedback_arc_set.c:87) with
IGRAPH_FAS_APPROX_EADES (the Eades-Lin-Smyth greedy,
src/feedback_arc_set.c:191) and IGRAPH_FAS_EXACT_IP (GLPK integer
program) — the exact variant here is a subset-DP over orderings
(max arcs kept; O(2^n n) like the optimal-modularity kernel), no
external solver.

Pinned divergences (documented, verified in tests): the greedy runs
on the DISTINCT arc set (multiplicities collapse; self-loops are
always feedback arcs, same as the reference's from==to rule), and
simultaneous sources/sinks/max-diff ties are taken smallest-id-first
by a per-step re-scan instead of the reference's FIFO queue order —
the removal RULES (drain sources, drain sinks, else max
out-in-degree difference) are identical, so the result is an Eades
ordering; only tie sequencing differs.  The SQL oracle replays the
pinned rule exactly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import DEFAULT_PARTITIONS, block_refs, distinct


@ray.remote
def _arcs(tbl: pa.Table) -> pa.Table:
    s, d = ("src", "dst") if "src" in tbl.column_names else ("a", "b")
    return pa.table({"src": tbl[s], "dst": tbl[d]})


def _collect_arcs(edges, P):
    refs = edges if isinstance(edges, list) else block_refs(edges)
    uniq = distinct([_arcs.remote(r) for r in refs], ["src", "dst"],
                    P=P, as_refs=True)
    src, dst = [], []
    for t in ray.get(uniq):
        src.append(t["src"].to_numpy())
        dst.append(t["dst"].to_numpy())
    s = np.concatenate(src) if src else np.empty(0, np.int64)
    d = np.concatenate(dst) if dst else np.empty(0, np.int64)
    order = np.lexsort((d, s))
    return s[order], d[order]


def feedback_arc_set_eades(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """(feedback arcs, ordering): arcs (u, v) with ord[u] > ord[v]
    plus all self-loops; removing them leaves a DAG."""
    s, d = _collect_arcs(edges, P)
    loop = s == d
    succ: list[set] = [set() for _ in range(n)]
    pred: list[set] = [set() for _ in range(n)]
    for u, v in zip(s[~loop].tolist(), d[~loop].tolist()):
        succ[u].add(v)
        pred[v].add(u)
    indeg = np.array([len(p) for p in pred], np.int64)
    outdeg = np.array([len(x) for x in succ], np.int64)
    removed = np.zeros(n, dtype=bool)
    ordv = np.zeros(n, dtype=np.int64)
    npos, nneg = 0, 0
    left = n
    while left > 0:
        src_c = [v for v in range(n) if not removed[v] and indeg[v] == 0]
        if src_c:
            v = src_c[0]
            ordv[v] = npos
            npos += 1
        else:
            sink_c = [v for v in range(n)
                      if not removed[v] and outdeg[v] == 0]
            if sink_c:
                v = sink_c[0]
                ordv[v] = n - 1 - nneg
                nneg += 1
            else:
                cand = [v for v in range(n) if not removed[v]]
                v = max(cand, key=lambda x: (outdeg[x] - indeg[x], -x))
                ordv[v] = npos
                npos += 1
        removed[v] = True
        for w in succ[v]:
            if not removed[w]:
                indeg[w] -= 1
        for w in pred[v]:
            if not removed[w]:
                outdeg[w] -= 1
        left -= 1
    fas = [
        (int(u), int(v))
        for u, v in zip(s.tolist(), d.tolist())
        if u == v or ordv[u] > ordv[v]
    ]
    return fas, ordv


def feedback_arc_set_exact(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS,
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Minimum feedback arc set via subset DP (replacement for the
    reference's GLPK IP, n <= ~20): dp[S] = max arcs kept with S as
    the order prefix; backtrack yields an optimal ordering, feedback
    arcs = the violated ones (+ self-loops)."""
    if n > 22:
        raise ValueError("exact FAS kernel is bounded at n <= 22")
    s, d = _collect_arcs(edges, P)
    loop = s == d
    inmask = np.zeros(n, dtype=np.int64)
    for u, v in zip(s[~loop].tolist(), d[~loop].tolist()):
        inmask[v] |= 1 << u
    full = (1 << n) - 1
    dp = np.full(1 << n, -1, dtype=np.int32)
    choice = np.zeros(1 << n, dtype=np.int8)
    dp[0] = 0
    for S in range(1 << n):
        if dp[S] < 0:
            continue
        rem = full & ~S
        m = rem
        while m:
            vbit = m & (-m)
            v = vbit.bit_length() - 1
            kept = dp[S] + int(bin(inmask[v] & S).count("1"))
            T = S | vbit
            if kept > dp[T]:
                dp[T] = kept
                choice[T] = v
            m ^= vbit
    # backtrack an optimal ordering
    ordv = np.zeros(n, dtype=np.int64)
    S = full
    for pos in range(n - 1, -1, -1):
        v = int(choice[S])
        ordv[v] = pos
        S &= ~(1 << v)
    fas = [
        (int(u), int(v))
        for u, v in zip(s.tolist(), d.tolist())
        if u == v or ordv[u] > ordv[v]
    ]
    return fas, ordv
