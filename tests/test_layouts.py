"""Layout generators vs the reference's formulas and invariants
(src/layout.c, layout_fr.c, layout_kk.c)."""

import math

import numpy as np
import pytest

from xdata_igraph_ray.graph.layout import (
    kk_stress,
    layout_bipartite,
    layout_circle,
    layout_dataset,
    layout_fruchterman_reingold,
    layout_grid,
    layout_grid_3d,
    layout_kamada_kawai,
    layout_mds,
    layout_random,
    layout_random_3d,
    layout_reingold_tilford,
    layout_reingold_tilford_circular,
    layout_sphere,
    layout_star,
)


def _ring(n):
    return [(i, (i + 1) % n) for i in range(n)]


# ---------------------------------------------------------- closed forms

def test_circle_formula():
    n = 7
    res = layout_circle(n)
    phi = 2 * np.pi / n * np.arange(n)
    assert np.allclose(res[:, 0], np.cos(phi))
    assert np.allclose(res[:, 1], np.sin(phi))
    # order subset: missing vertices at the origin, included ones at
    # angles over the SUBSET size (layout.c:163 vs_size)
    res = layout_circle(5, order=[3, 1])
    assert np.allclose(res[0], 0) and np.allclose(res[2], 0)
    assert np.allclose(res[3], [1, 0])
    assert np.allclose(res[1], [math.cos(np.pi), math.sin(np.pi)])


def test_star_formula():
    res = layout_star(5, center=2)
    assert np.allclose(res[2], 0)
    phi = 2 * np.pi / 4 * np.arange(4)
    sats = [0, 1, 3, 4]
    assert np.allclose(res[sats, 0], np.cos(phi))
    assert np.allclose(res[sats, 1], np.sin(phi))
    # order includes the center and consumes no angle step
    res2 = layout_star(4, center=1, order=[3, 1, 0, 2])
    assert np.allclose(res2[1], 0)
    phi2 = 2 * np.pi / 3 * np.arange(3)
    for k, v in enumerate([3, 0, 2]):
        assert np.allclose(res2[v], [np.cos(phi2[k]), np.sin(phi2[k])])
    assert np.allclose(layout_star(1), [[0, 0]])
    with pytest.raises(ValueError):
        layout_star(3, order=[0, 1])


def test_grid_formulas():
    res = layout_grid(7, width=3)
    assert res.tolist() == [[0, 0], [1, 0], [2, 0],
                            [0, 1], [1, 1], [2, 1], [0, 2]]
    # auto width = ceil(sqrt(n))
    assert layout_grid(10)[:, 0].max() == 3
    r3 = layout_grid_3d(9, width=2, height=2)
    assert r3[4].tolist() == [0, 0, 1]
    assert r3[8].tolist() == [0, 0, 2]
    # auto: width=height=ceil(n^(1/3))
    assert layout_grid_3d(9)[:, 0].max() <= 2


def test_sphere_unit_radius_and_spread():
    n = 50
    res = layout_sphere(n)
    assert np.allclose(np.linalg.norm(res, axis=1), 1.0)
    # poles per the reference
    assert np.allclose(res[0], [0, 0, -1])
    assert np.allclose(res[-1], [0, 0, 1])
    # Saff-Kuijlaars spreads: min pairwise distance not degenerate
    d = np.linalg.norm(res[:, None] - res[None, :], axis=2)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 1.0 / math.sqrt(n)


def test_random_bounds_and_determinism():
    a = layout_random(100, seed=7)
    b = layout_random(100, seed=7)
    c = layout_random(100, seed=8)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.min() >= -1 and a.max() <= 1
    assert layout_random_3d(10, seed=1).shape == (10, 3)


def test_layout_dataset_matches_driver_kernels(ray_session):
    for kind, kw in [("circle", {}), ("grid", {"width": 4}),
                     ("star", {"center": 2}), ("sphere", {}),
                     ("random", {"seed": 3}), ("grid_3d", {}),
                     ("random_3d", {"seed": 5})]:
        n = 37
        from xdata_igraph_ray.graph import layout as L

        want = getattr(L, f"layout_{kind}")(n, **kw)
        df = layout_dataset(kind, n, **kw).to_pandas().sort_values("vid")
        cols = ["x", "y"] + (["z"] if want.shape[1] == 3 else [])
        got = df[cols].to_numpy()
        assert np.allclose(got, want), kind


# ---------------------------------------------------------- FR

def test_fr_ring_quality_and_determinism():
    n = 24
    edges = _ring(n)
    a = layout_fruchterman_reingold(edges, n, niter=200, seed=5)
    b = layout_fruchterman_reingold(edges, n, niter=200, seed=5)
    assert np.array_equal(a, b)
    assert np.isfinite(a).all()
    # neighbors end up closer than antipodal pairs on a ring
    d_edge = np.mean([np.linalg.norm(a[i] - a[(i + 1) % n])
                      for i in range(n)])
    d_far = np.mean([np.linalg.norm(a[i] - a[(i + n // 2) % n])
                     for i in range(n)])
    assert d_edge < d_far


def test_fr_grid_variant_runs_and_matches_contract():
    n = 1500  # auto-grid threshold is 1000 like the reference
    rng = np.random.default_rng(0)
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(3000, 2)) if a != b]
    res = layout_fruchterman_reingold(edges, n, niter=20, seed=1)
    assert res.shape == (n, 2)
    assert np.isfinite(res).all()
    # explicit grid=True below the auto threshold also works
    small = [(int(a), int(b))
             for a, b in rng.integers(0, 200, size=(400, 2)) if a != b]
    res2 = layout_fruchterman_reingold(small, 200, niter=20,
                                       seed=1, grid=True)
    assert np.isfinite(res2).all()


def test_fr_bounds_respected():
    n = 30
    minx = np.full(n, -0.5)
    maxx = np.full(n, 0.5)
    res = layout_fruchterman_reingold(_ring(n), n, niter=50, seed=2,
                                      minx=minx, maxx=maxx)
    assert res[:, 0].min() >= -0.5 - 1e-12
    assert res[:, 0].max() <= 0.5 + 1e-12


def test_fr_disconnected_and_3d():
    edges = [(0, 1), (2, 3)]
    res = layout_fruchterman_reingold(edges, 4, niter=50, seed=3)
    assert np.isfinite(res).all()
    r3 = layout_fruchterman_reingold(_ring(8), 8, niter=30, seed=4, dim=3)
    assert r3.shape == (8, 3) and np.isfinite(r3).all()


def test_fr_3d_entrypoint_quality_bounds_determinism():
    from xdata_igraph_ray.graph.layout import layout_fruchterman_reingold_3d

    n = 16
    edges = _ring(n)
    a = layout_fruchterman_reingold_3d(edges, n, niter=150, seed=7)
    b = layout_fruchterman_reingold_3d(edges, n, niter=150, seed=7)
    assert a.shape == (n, 3) and np.isfinite(a).all()
    assert np.array_equal(a, b)
    # ring neighbors closer than antipodal pairs, in 3d too
    d_edge = np.mean([np.linalg.norm(a[i] - a[(i + 1) % n])
                      for i in range(n)])
    d_far = np.mean([np.linalg.norm(a[i] - a[(i + n // 2) % n])
                     for i in range(n)])
    assert d_edge < d_far
    # z bounds clamp like the reference's minz/maxz vectors
    minz = np.full(n, -0.25)
    maxz = np.full(n, 0.25)
    r = layout_fruchterman_reingold_3d(edges, n, niter=50, seed=2,
                                       minz=minz, maxz=maxz)
    assert r[:, 2].min() >= -0.25 - 1e-12
    assert r[:, 2].max() <= 0.25 + 1e-12
    # unconnected 3d path (the reference's typo'd branch) stays finite
    # and symmetric here
    r2 = layout_fruchterman_reingold_3d([(0, 1), (2, 3)], 4,
                                        niter=40, seed=3)
    assert r2.shape == (4, 3) and np.isfinite(r2).all()


# ---------------------------------------------------------- KK

def test_kk_reduces_stress_vs_circle_start():
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]  # path
    start = np.array([[math.cos(2 * np.pi * i / n),
                       math.sin(2 * np.pi * i / n)] for i in range(n)])
    before = kk_stress(start, edges, n)
    res = layout_kamada_kawai(edges, n, maxiter=50 * n)
    after = kk_stress(res, edges, n)
    assert after < before
    # deterministic (RNG-free like the reference's default path)
    res2 = layout_kamada_kawai(edges, n, maxiter=50 * n)
    assert np.array_equal(res, res2)


def test_kk_path_orders_distances():
    n = 9
    edges = [(i, i + 1) for i in range(n - 1)]
    res = layout_kamada_kawai(edges, n, maxiter=100 * n)
    d_adj = np.mean([np.linalg.norm(res[i] - res[i + 1])
                     for i in range(n - 1)])
    d_ends = np.linalg.norm(res[0] - res[n - 1])
    assert d_ends > 2 * d_adj


def test_kk_trivial_and_weighted():
    assert layout_kamada_kawai([], 1).shape == (1, 2)
    assert layout_kamada_kawai([], 0).shape == (0, 2)
    edges = [(0, 1), (1, 2), (2, 0)]
    w = [1.0, 1.0, 10.0]
    res = layout_kamada_kawai(edges, 3, weights=w, maxiter=500)
    # the heavy (=long) edge 2-0 ends up the longest side
    d01 = np.linalg.norm(res[0] - res[1])
    d20 = np.linalg.norm(res[2] - res[0])
    assert d20 > d01
    with pytest.raises(ValueError):
        layout_kamada_kawai(edges, 3, kkconst=0)


# ---------------------------------------------------------- MDS

def test_mds_path_is_monotone_line():
    n = 10
    edges = [(i, i + 1) for i in range(n - 1)]
    res = layout_mds(edges, n)
    x = res[:, 0]
    # a path embeds on a line: first coordinate strictly monotone
    assert np.all(np.diff(x) > 0) or np.all(np.diff(x) < 0)
    # second coordinate carries (near) zero variance relative to first
    assert np.std(res[:, 1]) < 0.2 * np.std(x)


def test_mds_trivial_and_matrix_input():
    assert np.allclose(layout_mds([], 1), 0)
    two = layout_mds([], 2, dist=np.array([[0.0, 1], [1, 0]]))
    assert np.allclose(two, [[0, 0], [1, 1]])
    # distance-matrix input: 4 points on a square recover the square
    D = np.array([[0, 1, math.sqrt(2), 1],
                  [1, 0, 1, math.sqrt(2)],
                  [math.sqrt(2), 1, 0, 1],
                  [1, math.sqrt(2), 1, 0]])
    res = layout_mds([], 4, dist=D)
    got = np.linalg.norm(res[0] - res[1]), np.linalg.norm(res[0] - res[2])
    assert abs(got[0] - 1) < 1e-9 and abs(got[1] - math.sqrt(2)) < 1e-9


def test_mds_disconnected_components_do_not_overlap():
    edges = [(0, 1), (1, 2), (3, 4), (4, 5)]
    res = layout_mds(edges, 6)
    c1 = res[:3].mean(axis=0)
    c2 = res[3:].mean(axis=0)
    assert np.linalg.norm(c1 - c2) > 1.0


# ---------------------------------------------------------- RT

def test_rt_balanced_binary_tree():
    # 0 -> 1,2 ; 1 -> 3,4 ; 2 -> 5,6
    edges = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5), (2, 6)]
    res = layout_reingold_tilford(edges, 7, mode="out", roots=[0])
    y = res[:, 1]
    assert y.tolist() == [0, 1, 1, 2, 2, 2, 2]
    x = res[:, 0]
    # parents centered over their children
    assert abs(x[1] - (x[3] + x[4]) / 2) < 1e-9
    assert abs(x[2] - (x[5] + x[6]) / 2) < 1e-9
    assert abs(x[0] - (x[1] + x[2]) / 2) < 1e-9
    # min separation 1 within a level
    lvl2 = np.sort(x[3:])
    assert np.all(np.diff(lvl2) >= 1 - 1e-9)
    # deterministic
    res2 = layout_reingold_tilford(edges, 7, mode="out", roots=[0])
    assert np.array_equal(res, res2)


def test_rt_auto_root_undirected_max_degree():
    # star centered at 3: auto root must be 3 (max degree)
    edges = [(3, 0), (3, 1), (3, 2), (3, 4)]
    res = layout_reingold_tilford(edges, 5, directed=False)
    assert res[3, 1] == 0  # root level 0
    assert np.all(res[[0, 1, 2, 4], 1] == 1)


def test_rt_auto_root_directed_topological():
    # chain 0->1->2: mode=out roots at the topological end per the
    # reference (mode2=in ordering, last element = sink... the layout
    # hangs children along OUT edges from the chosen root)
    edges = [(0, 1), (1, 2)]
    res = layout_reingold_tilford(edges, 3, mode="out")
    assert set(res[:, 1].tolist()) == {0.0, 1.0, 2.0}


def test_rt_multi_root_and_rootlevel():
    edges = [(0, 1), (2, 3)]
    res = layout_reingold_tilford(edges, 4, mode="out", roots=[0, 2])
    # both components laid out, roots on level 1 of the virtual root
    # minus 1 -> y measured from the virtual root: roots at 1, kids 2
    assert res[0, 1] == res[2, 1]
    assert res[1, 1] == res[3, 1] == res[0, 1] + 1
    # rootlevel pushes the second root one level deeper
    res2 = layout_reingold_tilford(edges, 4, mode="out",
                                   roots=[0, 2], rootlevel=[0, 1])
    assert res2[2, 1] == res2[0, 1] + 1


def test_rt_circular_radii_are_levels():
    edges = [(0, 1), (0, 2), (1, 3)]
    polar = layout_reingold_tilford_circular(edges, 4, roots=[0])
    r = np.linalg.norm(polar, axis=1)
    flat = layout_reingold_tilford(edges, 4, roots=[0])
    assert np.allclose(r, flat[:, 1])


def test_rt_cycle_errors():
    with pytest.raises(ValueError):
        layout_reingold_tilford([(0, 1), (1, 0)], 2, mode="out")


# ---------------------------------------------------------- bipartite

def test_bipartite_two_rows_and_gaps():
    types = [0, 0, 0, 1, 1, 1]
    edges = [(0, 3), (1, 4), (2, 5), (0, 5)]
    res = layout_bipartite(edges, 6, types, hgap=2.0, vgap=3.0)
    assert np.all(res[:3, 1] == 3.0)   # type 0 row at vgap
    assert np.all(res[3:, 1] == 0.0)   # type 1 row at 0
    for row in (res[:3, 0], res[3:, 0]):
        s = np.sort(row)
        assert np.all(np.diff(s) >= 2.0 - 1e-9)
    with pytest.raises(ValueError):
        layout_bipartite(edges, 6, [0, 1])


def test_bipartite_crossing_reduction():
    # perfect matching 0-5, 1-4, 2-3 in "crossed" vid order: the
    # barycenter sweep must uncross it (0 crossings possible)
    types = [0, 0, 0, 1, 1, 1]
    edges = [(0, 5), (1, 4), (2, 3)]
    res = layout_bipartite(edges, 6, types, maxiter=50)
    top = np.argsort(res[[0, 1, 2], 0])        # order of type-0 row
    bot = np.argsort(res[[5, 4, 3], 0])        # matched partners
    assert np.array_equal(top, bot)
