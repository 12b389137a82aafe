"""Dominator tree of a flowgraph.

Reference: igraph_dominator_tree (src/st-cuts.c:388,
include/igraph_flow.h:151) — Lengauer-Tarjan in the reference; here
the Cooper-Harvey-Kennedy iterative algorithm over reverse postorder
(same fixed point, simpler machinery, O(V^2) worst case), run as a
driver kernel over the distributed-collapsed edge list like the
other flow-family enumeration kernels.  Semantics matched to the
reference: idom(root) = -1; vertices unreachable from the root are
reported in ``leftout`` and get idom = -2 (the reference stores NaN
in its float vector); ``mode="in"`` reverses every arc first."""

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


def dominator_tree(
    edges: Dataset | list,
    n: int,
    root: int,
    mode: str = "out",
    P: int = DEFAULT_PARTITIONS,
) -> tuple[np.ndarray, list[int]]:
    """(idom, leftout): immediate dominator per vertex (int64;
    root -> -1, unreachable -> -2) and the unreachable vertex list."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    uniq = distinct([_arcs.remote(r) for r in refs], ["src", "dst"],
                    P=P, as_refs=True)
    succ: list[list[int]] = [[] for _ in range(n)]
    pred: list[list[int]] = [[] for _ in range(n)]
    for t in ray.get(uniq):
        ss = t["src"].to_numpy()
        dd = t["dst"].to_numpy()
        if mode == "in":
            ss, dd = dd, ss
        for u, v in zip(ss.tolist(), dd.tolist()):
            succ[u].append(v)
            pred[v].append(u)

    # DFS postorder from root (iterative)
    post: list[int] = []
    state = np.zeros(n, dtype=np.int8)
    stack = [(root, 0)]
    state[root] = 1
    it = {root: 0}
    while stack:
        v, i = stack[-1]
        if i < len(succ[v]):
            stack[-1] = (v, i + 1)
            w = succ[v][i]
            if state[w] == 0:
                state[w] = 1
                stack.append((w, 0))
        else:
            post.append(v)
            stack.pop()
    order = {v: i for i, v in enumerate(post)}  # postorder number
    rpo = post[::-1]
    reachable = state > 0
    leftout = [v for v in range(n) if not reachable[v]]

    idom = np.full(n, -2, dtype=np.int64)
    idom[root] = root

    def intersect(b1: int, b2: int) -> int:
        while b1 != b2:
            while order[b1] < order[b2]:
                b1 = int(idom[b1])
            while order[b2] < order[b1]:
                b2 = int(idom[b2])
        return b1

    changed = True
    while changed:
        changed = False
        for v in rpo:
            if v == root:
                continue
            new = -1
            for u in pred[v]:
                if reachable[u] and idom[u] != -2:
                    new = u if new == -1 else intersect(new, u)
            if new != -1 and idom[v] != new:
                idom[v] = new
                changed = True
    idom[root] = -1
    return idom, leftout
