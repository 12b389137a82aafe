"""solve_lsap (src/lsap.c:601) and rewire_edges (src/games.c:2827)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.lsap import solve_lsap
from xdata_igraph_ray.graph.rewire import rewire_edges


def test_lsap_matches_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(1, 8))
        if trial % 3 == 0:
            c = rng.normal(0, 10, (n, n))
        elif trial % 3 == 1:
            c = rng.integers(-5, 6, (n, n)).astype(float)  # ties
        else:
            c = np.zeros((n, n))
            c[rng.integers(0, n), rng.integers(0, n)] = -1.0
        p = solve_lsap(c)
        assert sorted(p.tolist()) == list(range(n))
        got = c[np.arange(n), p].sum()
        best = min(
            c[np.arange(n), list(pp)].sum()
            for pp in itertools.permutations(range(n))
        )
        assert abs(got - best) < 1e-9


def test_lsap_diagonal_and_validation():
    rng = np.random.default_rng(1)
    n = 100
    c = rng.random((n, n)) + 5
    c[np.arange(n), np.arange(n)] = 0.0
    assert (solve_lsap(c) == np.arange(n)).all()
    with pytest.raises(ValueError):
        solve_lsap(np.zeros((2, 3)))
    with pytest.raises(ValueError):
        solve_lsap(np.array([[np.inf]]))
    assert solve_lsap(np.zeros((0, 0))).shape == (0,)


def _ring_edges(n):
    s = np.arange(n, dtype=np.int64)
    return pa.table({"src": s, "dst": (s + 1) % n})


def test_rewire_edges_prob0_identity(ray_session):
    t = _ring_edges(50)
    out = rewire_edges(t, 50, 0.0).to_pandas()
    assert sorted(zip(out.src, out.dst)) == sorted(
        zip(t["src"].to_numpy(), t["dst"].to_numpy()))


def test_rewire_edges_rate_and_no_loops(ray_session):
    n = 2000
    t = _ring_edges(n)
    out = rewire_edges(t, n, 0.3, loops=False, seed=7).to_pandas()
    assert len(out) == n  # edge count invariant
    assert (out.src != out.dst).all()  # loops=False
    moved = ((out.src.to_numpy() != t["src"].to_numpy())
             | (out.dst.to_numpy() != t["dst"].to_numpy())).mean()
    # each edge moves with prob 1-(1-p)^2 ~ 0.51 (minus rare re-draws
    # landing on the original endpoint)
    assert 0.40 < moved < 0.60


def test_rewire_edges_prob1_uniform_targets(ray_session):
    n = 3000
    out = rewire_edges(_ring_edges(n), n, 1.0, loops=True,
                       seed=3).to_pandas()
    # all endpoints redrawn uniformly: mean ~ n/2, no bias to the ring
    assert abs(out.dst.mean() - n / 2) < n * 0.05
    assert abs(out.src.mean() - n / 2) < n * 0.05


def test_rewire_edges_deterministic_and_p_invariant(ray_session):
    n = 500
    t = _ring_edges(n)
    a = rewire_edges(t, n, 0.4, seed=11, P=2).to_pandas()
    b = rewire_edges(t, n, 0.4, seed=11, P=8).to_pandas()
    key = lambda df: sorted(zip(df.src, df.dst))
    assert key(a) == key(b)
    c = rewire_edges(t, n, 0.4, seed=12, P=2).to_pandas()
    assert key(a) != key(c)


def test_rewire_edges_no_multiple(ray_session):
    n = 120
    t = _ring_edges(n)
    out = rewire_edges(t, n, 0.8, loops=False, multiple=False,
                       seed=5).to_pandas()
    assert len(out) == n
    assert (out.src != out.dst).all()
    assert len(set(zip(out.src, out.dst))) == n  # simple


def test_rewire_edges_validates_prob(ray_session):
    with pytest.raises(ValueError):
        rewire_edges(_ring_edges(4), 4, 1.5)


def test_rewire_edges_no_multiple_p_invariant(ray_session):
    # regression: the repair redraw must not depend on bucket layout
    t = _ring_edges(30)
    import pandas as pd
    outs = []
    for P in (1, 2, 8):
        o = rewire_edges(t, 30, 0.9, loops=False, multiple=False,
                         seed=5, P=P).to_pandas()
        outs.append(sorted(zip(o.src, o.dst)))
    assert outs[0] == outs[1] == outs[2]


def test_create_bipartite_rejects_wide_rows():
    import numpy as np
    from xdata_igraph_ray.graph.bipartite import create_bipartite
    with pytest.raises(ValueError):
        create_bipartite([0, 1], np.array([[0, 1, 7]]))
