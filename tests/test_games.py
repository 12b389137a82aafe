"""Evolving-network generator games (graph/games.py) — structural and
distributional contracts vs reference semantics (src/games.c,
src/forestfire.c); RNG streams are pinned-divergent, so tests verify
model invariants, not byte-equal edge sets."""

import numpy as np
import pytest

from xdata_igraph_ray.graph import games


def _cols(t):
    return t.column("src").to_numpy(), t.column("dst").to_numpy()


# ---------------------------------------------------------------- growing


def test_growing_random_citation_shape():
    t = games.growing_random_game(50, 3, citation=True, seed=7)
    s, d = _cols(t)
    assert len(s) == 49 * 3
    # citation mode: source is always the newest vertex, target older
    assert (d < s).all()
    # each vertex i >= 1 originates exactly m edges
    counts = np.bincount(s, minlength=50)
    assert (counts[1:] == 3).all() and counts[0] == 0


def test_growing_random_noncitation_endpoints():
    t = games.growing_random_game(40, 2, citation=False, seed=3)
    s, d = _cols(t)
    assert len(s) == 39 * 2
    # games.c:1336-1338: from in [0, i], to in [1, i] — never target 0
    assert (d >= 1).all()
    # step i draws endpoints <= i: edge k belongs to step 1 + k//m
    steps = 1 + np.arange(len(s)) // 2
    assert (s <= steps).all() and (d <= steps).all()


# ---------------------------------------------------------------- traits


def test_callaway_traits_pref_one_keeps_all():
    t, types = games.callaway_traits_game(
        60, 2, 3, [0.5, 0.5], [[1.0, 1.0], [1.0, 1.0]], seed=11)
    s, d = _cols(t)
    assert len(s) == 59 * 3           # every trial kept at p=1
    assert types.shape == (60,) and set(types) <= {0, 1}
    steps = 1 + np.arange(len(s)) // 3
    assert (s <= steps).all() and (d <= steps).all()


def test_callaway_traits_blocks_forbidden_pairs():
    # pref[0][1]=pref[1][0]=0 and types split: no cross-type edge ever
    t, types = games.callaway_traits_game(
        200, 2, 4, [0.5, 0.5], [[1.0, 0.0], [0.0, 1.0]], seed=5)
    s, d = _cols(t)
    assert len(s) > 0
    assert (types[s] == types[d]).all()


def test_establishment_pref_one_exact_count():
    t, types = games.establishment_game(
        50, 2, 4, [0.5, 0.5], [[1.0, 1.0], [1.0, 1.0]], seed=2)
    s, d = _cols(t)
    assert len(s) == (50 - 4) * 4
    # sources start at k, targets are distinct earlier vertices
    assert s.min() == 4 and (d < s).all()
    for i in range(4, 50):
        tgt = d[s == i]
        assert len(set(tgt.tolist())) == len(tgt)


# ------------------------------------------------------------- recent deg


def test_recent_degree_counts_and_bounds():
    t = games.recent_degree_game(80, power=1.0, window=5, m=2, seed=9)
    s, d = _cols(t)
    assert len(s) == 79 * 2
    assert (d < s).all() or (d <= s).all()  # targets among existing
    steps = 1 + np.arange(len(s)) // 2
    assert (d <= steps).all()


def test_recent_degree_window_expires_hubs():
    """With a huge power the game chases whoever has recent edges; a
    window of 1 means last step's citations expire immediately, so no
    vertex can monopolize (contrast window=n: one hub takes all)."""
    t_short = games.recent_degree_game(
        300, power=8.0, window=1, m=1, zero_appeal=1.0, seed=13)
    t_long = games.recent_degree_game(
        300, power=8.0, window=300, m=1, zero_appeal=1.0, seed=13)
    _, d_s = _cols(t_short)
    _, d_l = _cols(t_long)
    top_short = np.bincount(d_s).max()
    top_long = np.bincount(d_l).max()
    assert top_long > top_short


# ----------------------------------------------------------------- aging


def test_barabasi_aging_edge_count_and_pa():
    t = games.barabasi_aging_game(
        200, m=2, pa_exp=1.0, aging_exp=0.0, aging_bin=1,
        zero_deg_appeal=1.0, zero_age_appeal=1.0, seed=21)
    s, d = _cols(t)
    assert len(s) == 199 * 2
    # linear PA without aging: early vertices accumulate high degree
    indeg = np.bincount(d, minlength=200)
    assert indeg[:20].sum() > indeg[-20:].sum()


def test_barabasi_aging_strong_aging_kills_old_hubs():
    t = games.barabasi_aging_game(
        400, m=1, pa_exp=1.0, aging_exp=-3.0, aging_bin=100,
        zero_deg_appeal=0.1, zero_age_appeal=0.0, deg_coef=1.0,
        age_coef=1.0, seed=21)
    s, d = _cols(t)
    # strong negative aging: most citations go to recent vertices
    recent = (s - d) <= (400 // 100 + 1)
    assert recent.mean() > 0.5


def test_recent_degree_aging_runs():
    t = games.recent_degree_aging_game(
        120, m=2, pa_exp=1.0, aging_exp=-1.0, aging_bin=10,
        time_window=8, zero_appeal=0.5, seed=4)
    s, d = _cols(t)
    assert len(s) == 119 * 2
    steps = 1 + np.arange(len(s)) // 2
    assert (d <= steps).all()


# -------------------------------------------------------------- citation


def test_lastcit_counts_and_validity():
    t = games.lastcit_game(100, edges_per_node=2, pagebins=5,
                           preference=[3.0, 2.0, 1.0, 0.5, 0.2, 1.0],
                           seed=31)
    s, d = _cols(t)
    assert len(s) == 99 * 2
    assert (d < s).all()


def test_lastcit_zero_recency_spreads_citations():
    """preference = [0,...,0,1]: a vertex once cited drops to weight 0
    until it re-bins, so citations spread across the never-cited."""
    t = games.lastcit_game(60, edges_per_node=1, pagebins=2,
                           preference=[0.0, 0.0, 1.0], seed=8)
    s, d = _cols(t)
    # no vertex is cited twice within a bin width (31 steps) window
    binwidth = 60 // 2 + 1
    for v in set(d.tolist()):
        steps = s[d == v]
        assert (np.diff(np.sort(steps)) >= 1).all()
        # consecutive same-bin repeats would need weight>0 at cite time
        same_bin = np.diff(np.sort(steps)) < binwidth
        assert not same_bin.any() or (np.diff(np.sort(steps))[same_bin]
                                      >= binwidth).sum() == 0


def test_cited_type_ratio_follows_pref():
    types = np.arange(600) % 2     # alternating categories
    t = games.cited_type_game(600, types, pref=[1.0, 3.0],
                              edges_per_step=4, seed=17)
    s, d = _cols(t)
    assert len(s) == 599 * 4
    share1 = (types[d] == 1).mean()
    assert 0.65 < share1 < 0.85    # expected 0.75


def test_citing_cited_type_kernel_blocks():
    types = np.arange(400) % 2
    # category-0 citers only cite category 0; cat-1 only cat 1
    t = games.citing_cited_type_game(
        400, types, pref=[[1.0, 0.0], [0.0, 1.0]], edges_per_step=2,
        seed=23)
    s, d = _cols(t)
    # vertex 1 (type 1) finds a zero-sum kernel (only the type-0 vertex
    # 0 exists) and is skipped; every later step draws fully
    assert len(s) == 398 * 2 and s.min() == 2
    assert (types[s] == types[d]).all()
    assert (d < s).all()


# ------------------------------------------------------------ preference


def test_asymmetric_preference_full_pref_all_pairs():
    edges, tin, tout = games.asymmetric_preference_game(
        30, 2, pref_matrix=[[1.0, 1.0], [1.0, 1.0]], loops=False, seed=3)
    s, d = _cols(edges)
    assert len(s) == 30 * 29       # every ordered non-loop pair
    assert tin.shape == (30,) and tout.shape == (30,)


def test_asymmetric_preference_kernel_respected():
    edges, tin, tout = games.asymmetric_preference_game(
        300, 2, pref_matrix=[[0.0, 1.0], [0.0, 0.0]], loops=False, seed=5)
    s, d = _cols(edges)
    assert len(s) > 0
    assert (tout[s] == 0).all() and (tin[d] == 1).all()


def test_asymmetric_preference_joint_dist():
    # joint mass only on (in=0, out=1): every vertex gets that pair
    edges, tin, tout = games.asymmetric_preference_game(
        50, 2, type_dist_matrix=[[0.0, 1.0], [0.0, 0.0]],
        pref_matrix=[[0.5, 0.5], [0.5, 0.5]], seed=9)
    assert (tin == 0).all() and (tout == 1).all()


# ------------------------------------------------------------ forest fire


def test_forest_fire_shape_and_uniqueness():
    t = games.forest_fire_game(200, fw_prob=0.35, bw_factor=0.3,
                               ambs=2, seed=41)
    s, d = _cols(t)
    assert len(s) >= 199 * 1          # at least the ambassador links
    assert (d != s).all()
    # within one step a target is linked at most once
    pairs = set(zip(s.tolist(), d.tolist()))
    assert len(pairs) == len(s)
    # every edge points from a newer to an older vertex
    assert (d < s).all()


def test_forest_fire_connected_with_one_ambassador():
    from xdata_igraph_ray.graph.components import wcc
    from xdata_igraph_ray.graph.engine import GraphEngine
    t = games.forest_fire_game(120, fw_prob=0.3, ambs=1, seed=6)
    eng = GraphEngine.from_edges(t, P=2)
    try:
        info = wcc(eng)
        assert info["components"] == 1
    finally:
        eng.shutdown()


def test_forest_fire_zero_prob_empty():
    t = games.forest_fire_game(50, fw_prob=0.0, ambs=2, seed=1)
    assert t.num_rows == 0


def test_forest_fire_density_grows_with_fw_prob():
    lo = games.forest_fire_game(300, fw_prob=0.1, ambs=1, seed=2)
    hi = games.forest_fire_game(300, fw_prob=0.45, ambs=1, seed=2)
    assert hi.num_rows > lo.num_rows


# ---------------------------------------------------------- barabasi pow


def test_barabasi_power_superlinear_concentrates():
    lin = games.barabasi_power_game(500, power=1.0, m=1, seed=12)
    sup = games.barabasi_power_game(500, power=3.0, m=1, seed=12)
    _, d_lin = _cols(lin)
    _, d_sup = _cols(sup)
    assert np.bincount(d_sup).max() > np.bincount(d_lin).max()
    assert lin.num_rows == sup.num_rows == 499


def test_barabasi_power_outseq():
    outseq = np.zeros(30, np.int64)
    outseq[1:] = np.arange(1, 30) % 3
    t = games.barabasi_power_game(30, power=1.0, outseq=outseq, seed=5)
    s, _ = _cols(t)
    counts = np.bincount(s, minlength=30)
    assert (counts == outseq).all()


# ------------------------------------------------------------- fenwick


def test_fenwick_matches_numpy():
    rng = np.random.default_rng(0)
    f = games._Fenwick(37)
    vals = np.zeros(37)
    for _ in range(200):
        i = int(rng.integers(0, 37))
        v = float(rng.uniform(0, 5))
        f.update(i, v)
        vals[i] = v
    assert np.isclose(f.total(), vals.sum())
    for u in rng.uniform(0, vals.sum(), 50):
        want = int(np.searchsorted(np.cumsum(vals), u, side="right"))
        assert f.search(u) == min(want, 36)
