"""SIR Gillespie simulation vs the reference's semantics
(src/sir.c:107) — structural invariants, limiting cases,
distributional checks, determinism at any P."""

import numpy as np
import pytest

from xdata_igraph_ray.graph.epidemics import _Fenwick, sir


def _k(n):
    return [(i, j) for i in range(n) for j in range(i + 1, n)]


def test_fenwick_matches_psumtree_contract():
    f = _Fenwick(10)
    rng = np.random.default_rng(0)
    vals = rng.uniform(0, 2, 10)
    for i, v in enumerate(vals):
        f.update(i, float(v))
    cs = np.cumsum(vals)
    for r in np.linspace(0.001, cs[-1] - 0.001, 50):
        want = int(np.searchsorted(cs, r, side="left"))
        assert f.search(float(r)) == want
    f.update(3, 0.0)
    assert f.get(3) == 0.0


def test_sir_invariants(ray_session):
    n = 30
    t = sir(_k(n), n, beta=0.5, gamma=0.3, no_sim=8, seed=1).to_pandas()
    for j, g in t.groupby("sim"):
        s, i, r = g["no_s"].to_numpy(), g["no_i"].to_numpy(), g["no_r"].to_numpy()
        tt = g["t"].to_numpy()
        assert np.all(s + i + r == n)
        assert np.all(np.diff(tt) > 0)          # strictly increasing times
        assert np.all(np.diff(s) <= 0)          # S never grows
        assert np.all(np.diff(r) >= 0)          # R never shrinks
        # every event is exactly one transition
        di, ds, dr = np.diff(i), np.diff(s), np.diff(r)
        assert np.all((ds == -1) == (di == 1))
        assert np.all((dr == 1) == (di == -1))
        # initial row and termination (no infected left)
        assert s[0] == n - 1 and i[0] == 1 and r[0] == 0 and tt[0] == 0
        assert i[-1] == 0


def test_sir_beta_zero_single_recovery(ray_session):
    n = 10
    t = sir(_k(n), n, beta=0.0, gamma=1.0, no_sim=5, seed=2).to_pandas()
    for _, g in t.groupby("sim"):
        assert len(g) == 2                      # t=0 row + one recovery
        assert g["no_r"].iloc[-1] == 1
        assert g["no_s"].iloc[-1] == n - 1


def test_sir_gamma_zero_fills_component(ray_session):
    # two components: a triangle and an edge — with gamma=0 the
    # epidemic infects exactly the seed's component and stops
    edges = [(0, 1), (1, 2), (0, 2), (3, 4)]
    t = sir(edges, 5, beta=1.0, gamma=0.0, no_sim=12, seed=3).to_pandas()
    finals = t.groupby("sim").last()
    assert set(finals["no_i"].tolist()) <= {2, 3}
    assert (finals["no_r"] == 0).all()          # nobody ever recovers


def test_sir_determinism_and_p_invariance(ray_session):
    n = 20
    a = sir(_k(n), n, 0.4, 0.4, no_sim=6, seed=9, P=1).to_pandas()
    b = sir(_k(n), n, 0.4, 0.4, no_sim=6, seed=9, P=4).to_pandas()
    pd_sort = lambda d: d.sort_values(["sim", "t"]).reset_index(drop=True)
    assert pd_sort(a).equals(pd_sort(b))
    c = sir(_k(n), n, 0.4, 0.4, no_sim=6, seed=10, P=1).to_pandas()
    assert not pd_sort(a).equals(pd_sort(c))


def test_sir_attack_rate_scales_with_beta(ray_session):
    # on K_40, beta >> gamma infects nearly everyone; beta << gamma
    # dies out early — compare mean final R
    n = 40
    hot = sir(_k(n), n, beta=1.0, gamma=0.1, no_sim=20, seed=4).to_pandas()
    cold = sir(_k(n), n, beta=0.002, gamma=1.0, no_sim=20, seed=4).to_pandas()
    r_hot = hot.groupby("sim")["no_r"].last().mean()
    r_cold = cold.groupby("sim")["no_r"].last().mean()
    assert r_hot > 0.8 * n
    assert r_cold < 0.2 * n


def test_sir_validation_rules(ray_session):
    with pytest.raises(ValueError):
        sir([], 0, 0.1, 0.1, 1)
    with pytest.raises(ValueError):
        sir([(0, 1)], 2, -0.1, 0.1, 1)
    with pytest.raises(ValueError):
        sir([(0, 1)], 2, 0.1, -0.1, 1)
    with pytest.raises(ValueError):
        sir([(0, 1)], 2, 0.1, 0.1, 0)
    with pytest.raises(ValueError):              # self-loop
        sir([(0, 0), (0, 1)], 2, 0.1, 0.1, 1)
    with pytest.raises(ValueError):              # multi-edge
        sir([(0, 1), (1, 0)], 2, 0.1, 0.1, 1)
    with pytest.warns(UserWarning):
        sir([(0, 1)], 2, 0.1, 0.1, 1, directed=True)
