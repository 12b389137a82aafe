"""WCC / SCC correctness: exact membership + igraph numbering
(fixtures g_gnm, g_disconnected, g_scc of FIXTURES.md)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph.components import scc, wcc
from xdata_igraph_ray.graph.engine import GraphEngine

from .oracles import gnm_edges, scc_ref, wcc_ref


def build(src, dst, n, P=3):
    return GraphEngine.from_edges(
        pa.table({"src": np.asarray(src, np.int64),
                  "dst": np.asarray(dst, np.int64)}),
        n=n, P=P,
    )


def islands_edges(n_islands=10, size=200, m_each=400, seed=42):
    rng = np.random.default_rng(seed)
    srcs, dsts = [], []
    for i in range(n_islands):
        lo = i * size
        srcs.append(rng.integers(lo, lo + size, m_each))
        dsts.append(rng.integers(lo, lo + size, m_each))
    return np.concatenate(srcs), np.concatenate(dsts), n_islands * size


def test_wcc_islands_exact_numbering():
    src, dst, n = islands_edges()
    eng = build(src, dst, n, P=4)
    info = wcc(eng)
    got = eng.state_arrays("label")
    want = wcc_ref(src, dst, n)
    assert (got == want).all()
    assert info["components"] == len(np.unique(want))


def test_wcc_gnm_with_isolated():
    src, dst = gnm_edges(500, 600, seed=7)
    n = 520  # trailing isolated vertices
    eng = build(src, dst, n, P=3)
    wcc(eng)
    got = eng.state_arrays("label")
    want = wcc_ref(src, dst, n)
    assert (got == want).all()


def cycles_and_bridges(n_cycles=20, cyc=12, seed=3):
    """Directed cycles joined by DAG bridge edges (g_scc fixture)."""
    rng = np.random.default_rng(seed)
    src, dst = [], []
    n = n_cycles * cyc
    for c in range(n_cycles):
        lo = c * cyc
        for i in range(cyc):
            src.append(lo + i)
            dst.append(lo + (i + 1) % cyc)
    for _ in range(n_cycles * 2):
        a, b = sorted(rng.integers(0, n_cycles, 2))
        if a != b:
            src.append(a * cyc + int(rng.integers(cyc)))
            dst.append(b * cyc + int(rng.integers(cyc)))
    return np.array(src), np.array(dst), n


def test_scc_cycles_bridges():
    src, dst, n = cycles_and_bridges()
    eng = build(src, dst, n, P=4)
    info = scc(eng)
    got = eng.state_arrays("scc")
    want = scc_ref(src, dst, n)
    assert (got == want).all()
    assert info["components"] == len(np.unique(want))


def test_scc_gnm():
    src, dst = gnm_edges(300, 900, seed=11)
    eng = build(src, dst, 300, P=3)
    scc(eng)
    got = eng.state_arrays("scc")
    want = scc_ref(src, dst, 300)
    assert (got == want).all()


def test_scc_dag_chain_trims():
    # pure DAG: every vertex its own SCC; trim should finish fast
    n = 50
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    eng = build(src, dst, n, P=2)
    info = scc(eng)
    got = eng.state_arrays("scc")
    assert (got == np.arange(n)).all()
    assert info["rounds"] <= 3


def test_wcc_self_loops_multi():
    src = [0, 0, 1, 3, 4, 4]
    dst = [0, 1, 0, 4, 3, 4]
    eng = build(src, dst, 6, P=2)
    wcc(eng)
    got = eng.state_arrays("label")
    want = wcc_ref(src, dst, 6)
    assert (got == want).all()
