"""Exact optimal-modularity kernel vs brute-force partition
enumeration and the greedy kernels it upper-bounds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.community import (
    _collapse_undirected,
    _modularity_of,
    community_fastgreedy,
    community_optimal_modularity,
    community_walktrap,
)


def _t(src, dst, w=None):
    cols = {"src": np.asarray(src, np.int64),
            "dst": np.asarray(dst, np.int64)}
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return pa.table(cols)


def _partitions(items):
    if not items:
        yield []
        return
    first, rest = items[0], items[1:]
    for part in _partitions(rest):
        for i in range(len(part)):
            yield part[:i] + [part[i] + [first]] + part[i + 1:]
        yield [[first]] + part


def _brute_best_q(table, n):
    und_w = _collapse_undirected(table, n)
    two_m = 2.0 * sum(und_w.values())
    best = -np.inf
    for part in _partitions(list(range(n))):
        mem = {}
        for cid, grp in enumerate(part):
            for v in grp:
                mem[v] = cid
        q = _modularity_of(mem, und_w, two_m)
        if q > best:
            best = q
    return best


def test_optimal_matches_bruteforce_random():
    rng = np.random.default_rng(3)
    for trial in range(4):
        n = 7
        src, dst, w = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < 0.45:
                    src.append(i)
                    dst.append(j)
                    w.append(float(rng.integers(1, 4)))
        table = _t(src, dst, w)
        mem, k, q = community_optimal_modularity(table, n=n)
        assert abs(q - _brute_best_q(table, n)) < 1e-12, trial
        # the returned membership realizes the returned Q
        und_w = _collapse_undirected(table, n)
        two_m = 2.0 * sum(und_w.values())
        assert abs(_modularity_of(mem.tolist(), und_w, two_m) - q) < 1e-12


def test_optimal_upper_bounds_greedies():
    # 3 cliques of 4 in a ring (n=12, within the DP guard)
    src, dst = [], []
    for c in range(3):
        base = c * 4
        for i in range(4):
            for j in range(i + 1, 4):
                src.append(base + i)
                dst.append(base + j)
    for c in range(3):
        src.append(c * 4)
        dst.append(((c + 1) % 3) * 4 + 1)
    n = 12
    table = _t(src, dst)
    mem, k, q_opt = community_optimal_modularity(table, n=n)
    assert k == 3
    for c in range(3):
        assert len(set(mem[c * 4:(c + 1) * 4].tolist())) == 1
    _, _, q_fg = community_fastgreedy(table, n=n)
    _, _, q_wt = community_walktrap(table, n=n)
    assert q_opt >= q_fg - 1e-12
    assert q_opt >= q_wt - 1e-12


def test_optimal_edge_cases():
    mem, k, q = community_optimal_modularity(_t([], []), n=4)
    assert k == 4 and q == 0.0
    # single edge: {0,1} together, Q = 0 for the pair-partition...
    mem, k, q = community_optimal_modularity(_t([0], [1]), n=3)
    assert mem[0] == mem[1]
    with pytest.raises(ValueError):
        community_optimal_modularity(_t([0], [1]), n=20)
