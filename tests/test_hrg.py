"""Hierarchical random graphs (graph/hrg.py) vs reference semantics
(src/igraph_hrg.cc; model: Clauset-Moore-Newman 2008)."""

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph import hrg as H
from xdata_igraph_ray.graph.generators import _table


def two_cliques(k: int = 5, bridges: int = 1):
    src, dst = [], []
    for a in range(k):
        for b in range(a + 1, k):
            src.append(a); dst.append(b)
            src.append(k + a); dst.append(k + b)
    for i in range(bridges):
        src.append(i); dst.append(k + i)
    return _table(src, dst), 2 * k


def _planted_hrg():
    """Handmade dendrogram over 6 leaves: {0,1,2} under internal
    spine 1/3 with p=1, {3,4,5} under spine 2/4 with p=1, root p=0."""
    # internal 0 root(1,2); 1(leaf0, 3); 3(leaf1, leaf2);
    # 2(leaf3, 4); 4(leaf4, leaf5)
    left = np.array([-2, 0, 3, 1, 4], np.int64)
    right = np.array([-3, -4, -5, 2, 5], np.int64)
    prob = np.array([0.0, 1.0, 1.0, 1.0, 1.0], np.float64)
    z = np.zeros(5, np.int64)
    return H.HRG(left, right, prob, z, z)


def test_game_from_planted_dendrogram():
    h = _planted_hrg()
    g = H.hrg_game(h, seed=1)
    s, d = g["src"].to_numpy(), g["dst"].to_numpy()
    # p=1 inside each triple, p=0 across: exactly two triangles
    assert len(s) == 6
    assert all((a < 3) == (b < 3) for a, b in zip(s, d))


def test_lca_probs_structure():
    h = _planted_hrg()
    P = H._lca_probs(h)
    assert P[0, 1] == 1.0 and P[1, 2] == 1.0
    assert P[3, 4] == 1.0
    assert P[0, 3] == 0.0 and P[2, 5] == 0.0


def test_fit_recovers_two_clique_split():
    edges, n = two_cliques(5, bridges=1)
    best, logl, trace, _ = H.hrg_fit(edges, n, steps=60, seed=3,
                                     return_trace=True)
    # likelihood improved over the random start
    assert logl >= trace[0] - 1e-9
    # the fitted model assigns higher link probability within cliques
    P = H._lca_probs(best)
    within = np.mean([P[a, b] for a in range(5) for b in range(a + 1, 5)])
    across = np.mean([P[a, 5 + b] for a in range(5) for b in range(5)])
    assert within > across


def test_fit_record_consistency():
    edges, n = two_cliques(4)
    h = H.hrg_fit(edges, n, steps=20, seed=7)
    assert h.size() == n
    # vertices under root = n; edge counts sum to m
    assert h.vertices.max() == n
    assert h.edges.sum() == edges.num_rows
    # every leaf appears exactly once
    leaves = [int(c) for c in np.concatenate([h.left, h.right]) if c >= 0]
    assert sorted(leaves) == list(range(n))


def test_dendrogram_table():
    h = _planted_hrg()
    t = H.hrg_dendrogram(h)
    n = 6
    assert t.num_rows == 2 * n - 2           # tree edges
    s = t["src"].to_numpy()
    assert (s >= n).all()                    # parents are internal ids


def test_predict_ranks_missing_clique_edge_first():
    # remove one in-clique edge; prediction should rank it on top
    edges, n = two_cliques(5, bridges=1)
    mask = ~((edges["src"].to_numpy() == 0) & (edges["dst"].to_numpy() == 1))
    cut = edges.filter(pa.array(mask))
    pred = H.hrg_predict(cut, n, num_samples=40, sample_every=1, seed=5)
    top = (int(pred["src"][0].as_py()), int(pred["dst"][0].as_py()))
    assert top == (0, 1)


def test_consensus_majority_sets():
    edges, n = two_cliques(4, bridges=1)
    parents, weights = H.hrg_consensus(edges, n, num_samples=30,
                                       sample_every=1, seed=9)
    assert len(parents) >= n + 1
    # every leaf has a consensus parent; root parent is -1
    assert (parents[:n] >= n).all()
    assert (parents == -1).sum() == 1
    assert (weights > 0).all()


def test_create_roundtrip():
    h = _planted_hrg()
    t = H.hrg_dendrogram(h)
    n = 6
    parents = np.full(2 * n - 1, -1, np.int64)
    for s, d in zip(t["src"].to_numpy(), t["dst"].to_numpy()):
        parents[d] = s
    h2 = H.hrg_create(parents, h.prob, n)
    # same pair-probability model (child order may differ)
    assert np.allclose(H._lca_probs(h2), H._lca_probs(h))


def test_sample_many():
    edges, n = two_cliques(4)
    samples = H.hrg_sample(edges, n, num_samples=3, steps=10, seed=2)
    assert len(samples) == 3
    for g in samples:
        assert g.num_rows >= 0
        s, d = g["src"].to_numpy(), g["dst"].to_numpy()
        assert (s < d).all()
