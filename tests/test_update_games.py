"""Microscopic update rules (graph/update_games.py) vs reference
semantics (src/microscopic_update.c)."""

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph import update_games as ug


def _star():
    # vertex 0 center, undirected star as symmetric directed edges
    src = [0, 1, 0, 2, 0, 3]
    dst = [1, 0, 2, 0, 3, 0]
    return pa.table({"src": np.array(src, np.int64),
                     "dst": np.array(dst, np.int64)})


def test_deterministic_optimal_maximum():
    edges = _star()
    q = [1.0, 5.0, 2.0, 0.5]
    strat = np.array([0, 1, 2, 3])
    out = ug.deterministic_optimal_imitation(
        edges, 4, 0, q, strat, optimality="maximum", mode="all")
    assert out[0] == 1           # vertex 1 has max quantity
    assert (out[1:] == strat[1:]).all()


def test_deterministic_optimal_minimum():
    edges = _star()
    q = [1.0, 5.0, 2.0, 0.5]
    out = ug.deterministic_optimal_imitation(
        edges, 4, 0, q, [0, 1, 2, 3], optimality="minimum", mode="all")
    assert out[0] == 3


def test_deterministic_optimal_self_already_best():
    edges = _star()
    q = [9.0, 5.0, 2.0, 0.5]
    out = ug.deterministic_optimal_imitation(
        edges, 4, 0, q, [0, 1, 2, 3], optimality="maximum")
    assert out[0] == 0           # keeps own strategy


def test_isolated_vertex_no_update():
    edges = pa.table({"src": np.array([0], np.int64),
                      "dst": np.array([1], np.int64)})
    out = ug.deterministic_optimal_imitation(
        edges, 3, 2, [1.0, 2.0, 3.0], [0, 1, 2])
    assert (out == [0, 1, 2]).all()


def test_roulette_local_statistics():
    edges = _star()
    q = np.array([0.0, 10.0, 0.0, 0.0])
    # neighbor 1 holds all the mass: vid 0 must imitate it
    out = ug.roulette_wheel_imitation(edges, 4, 0, q, [0, 1, 2, 3],
                                      islocal=True, seed=5)
    assert out[0] == 1
    # all mass on vid itself: r always lands in the implicit tail
    q2 = np.array([10.0, 0.0, 0.0, 0.0])
    picks = [ug.roulette_wheel_imitation(edges, 4, 0, q2, [0, 1, 2, 3],
                                         islocal=True, seed=s)[0]
             for s in range(20)]
    assert all(p == 0 for p in picks)


def test_roulette_global_zero_sum_raises():
    with pytest.raises(ValueError):
        ug.roulette_wheel_imitation(_star(), 4, 0, [0.0] * 4,
                                    [0, 1, 2, 3], islocal=False)


def test_stochastic_blind_copies_uniformly():
    edges = _star()
    picked = set()
    for s in range(40):
        out = ug.stochastic_imitation(edges, 4, 0, [1.0] * 4,
                                      [0, 1, 2, 3],
                                      algo=ug.IMITATE_BLIND, seed=s)
        picked.add(int(out[0]))
    assert picked == {0, 1, 2, 3}    # self included


def test_stochastic_augmented_only_improves():
    edges = _star()
    q = [5.0, 1.0, 1.0, 9.0]
    for s in range(40):
        out = ug.stochastic_imitation(edges, 4, 0, q, [0, 1, 2, 3],
                                      algo=ug.IMITATE_AUGMENTED, seed=s)
        assert out[0] in (0, 3)      # only strictly fitter imitated


def test_stochastic_contracted_only_worsens():
    edges = _star()
    q = [5.0, 1.0, 9.0, 9.0]
    for s in range(40):
        out = ug.stochastic_imitation(edges, 4, 0, q, [0, 1, 2, 3],
                                      algo=ug.IMITATE_CONTRACTED, seed=s)
        assert out[0] in (0, 1)


def test_stochastic_bad_algo():
    with pytest.raises(ValueError):
        ug.stochastic_imitation(_star(), 4, 0, [1.0] * 4, [0, 1, 2, 3],
                                algo="nope")


def test_moran_clones_quantity_and_strategy():
    edges = _star()
    q = np.array([0.0, 100.0, 0.1, 0.1])
    strat = np.array([0, 1, 2, 3])
    # vertex 1 dominates reproduction; its only neighbor is 0
    q2, s2 = ug.moran_process(edges, 4, q, strat, seed=3)
    assert q2[0] == 100.0 and s2[0] == 1
    assert q2[1] == 100.0 and s2[1] == 1


def test_moran_weighted_death_selection():
    # path 1 - 0 - 2 with all reproduction mass on 0; edge to 2 has
    # all the weight, so 2 always dies
    edges = pa.table({"src": np.array([0, 1, 0, 2], np.int64),
                      "dst": np.array([1, 0, 2, 0], np.int64)})
    w = np.array([0.0, 0.0, 7.0, 7.0])
    q = np.array([10.0, 0.0, 0.0])
    for s in range(10):
        q2, s2 = ug.moran_process(edges, 3, q, [0, 1, 2], weights=w,
                                  seed=s)
        assert s2[2] == 0 and q2[2] == 10.0
        assert s2[1] == 1


def test_moran_population_converges():
    # iterate: a dominant quantity takes over the ring
    n = 8
    src = list(range(n)) + [(i + 1) % n for i in range(n)]
    dst = [(i + 1) % n for i in range(n)] + list(range(n))
    edges = pa.table({"src": np.array(src, np.int64),
                      "dst": np.array(dst, np.int64)})
    q = np.full(n, 0.01)
    q[0] = 50.0
    strat = np.arange(n)
    for step in range(200):
        q, strat = ug.moran_process(edges, n, q, strat, seed=step)
    assert (strat == 0).all()
