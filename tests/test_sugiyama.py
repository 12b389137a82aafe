"""Sugiyama layered layout (reference src/sugiyama.c:244).

Invariant-based: coordinates are heuristic, but the reference pins
hard structure — y = original layer value * vgap, every extended
edge spans exactly one adjacent layer pair downward (after dummy
insertion), within-layer gaps >= hgap, components offset left to
right, first n rows = real vertices.
"""

import numpy as np
import pytest

from xdata_igraph_ray.graph.layout import (
    _eades_order,
    _sugiyama_layers_directed,
    layout_sugiyama,
)


def _edges(pairs):
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    return a, b


def _layer_lookup(coords, n, vgap=1.0):
    ys = coords[:, 1] / vgap
    assert np.allclose(ys, np.round(ys))
    return np.round(ys).astype(int)


def test_eades_order_is_topological_on_dag():
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4)]
    s, d = _edges(pairs)
    ordv = _eades_order(5, s, d)
    assert sorted(ordv.tolist()) == list(range(5))
    for u, v in pairs:
        assert ordv[u] < ordv[v]  # a DAG has no feedback arcs


def test_directed_layering_is_longest_path_on_dag():
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3), (3, 4)]
    s, d = _edges(pairs)
    lay = _sugiyama_layers_directed(5, s, d)
    assert lay.tolist() == [0, 1, 1, 2, 3]


def test_dag_layout_shape_and_dummies():
    # 0->3 spans 2 layers -> exactly one dummy vertex appended
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)]
    s, d = _edges(pairs)
    coords, ee, em = layout_sugiyama((s, d), 4, return_extended=True)
    assert coords.shape == (5, 2)
    lay = _layer_lookup(coords, 4)
    assert lay.tolist() == [0, 1, 1, 2, 1]  # dummy sits on layer 1
    # extended edges each span exactly one layer downward
    for a, b in ee.tolist():
        assert lay[b] == lay[a] + 1
    # the subdivided edge maps both segments back to original eid 4
    assert em.tolist().count(4) == 2
    assert len(ee) == len(pairs) + 1


def test_hgap_within_layers_and_vgap():
    rng = np.random.default_rng(7)
    n = 40
    s = rng.integers(0, n, 120)
    d = rng.integers(0, n, 120)
    hgap, vgap = 2.5, 3.0
    coords = layout_sugiyama((s, d), n, hgap=hgap, vgap=vgap)
    lay = _layer_lookup(coords, n, vgap)
    for l in np.unique(lay):
        xs = np.sort(coords[lay == l, 0])
        if len(xs) > 1:
            assert np.min(np.diff(xs)) >= hgap - 1e-9


def test_given_layers_preserve_original_spacing():
    s, d = _edges([(0, 1), (1, 2)])
    coords = layout_sugiyama((s, d), 3, layers=[0, 2, 5], vgap=2.0)
    assert coords[:, 1].tolist() == [0.0, 4.0, 10.0]


def test_components_offset_and_do_not_overlap():
    s, d = _edges([(0, 1), (1, 2), (3, 4), (4, 5)])
    coords = layout_sugiyama((s, d), 6, hgap=1.0)
    xs_a = coords[:3, 0]
    xs_b = coords[3:, 0]
    assert xs_b.min() >= xs_a.max() + 1.0 - 1e-9


def test_cycle_is_broken_and_laid_out():
    s, d = _edges([(0, 1), (1, 2), (2, 0)])
    coords = layout_sugiyama((s, d), 3)
    lay = _layer_lookup(coords, 3)
    assert lay.max() >= 1  # flattened into >= 2 layers
    assert coords.shape[0] >= 3


def test_self_loop_goes_to_extended_only():
    s, d = _edges([(0, 0), (0, 1)])
    coords, ee, em = layout_sugiyama((s, d), 2, return_extended=True)
    assert coords.shape == (2, 2)
    assert [0, 0] in ee.tolist()
    assert len(ee) == 2


def test_undirected_mode():
    s, d = _edges([(0, 1), (0, 2), (1, 3), (2, 3)])
    coords = layout_sugiyama((s, d), 4, directed=False)
    lay = _layer_lookup(coords, 4)
    # BFS from the max-strength root: some vertex on layer 0, its
    # neighbors on 1, etc; diamond -> 3 BFS levels
    assert lay.min() == 0 and lay.max() == 2


def test_deterministic():
    rng = np.random.default_rng(3)
    n = 30
    s = rng.integers(0, n, 80)
    d = rng.integers(0, n, 80)
    a = layout_sugiyama((s, d), n)
    b = layout_sugiyama((s, d), n)
    np.testing.assert_array_equal(a, b)


def test_barycenter_reduces_crossings_two_layer():
    # classic 2-layer crossing fixture: identity matching shuffled
    pairs = [(0, 7), (1, 6), (2, 5), (3, 4)]  # fully crossed K-pattern
    s, d = _edges(pairs)
    coords = layout_sugiyama((s, d), 8, layers=[0, 0, 0, 0, 1, 1, 1, 1])

    def crossings(c):
        cnt = 0
        for i in range(len(pairs)):
            for j in range(i + 1, len(pairs)):
                (a1, b1), (a2, b2) = pairs[i], pairs[j]
                if (c[a1, 0] - c[a2, 0]) * (c[b1, 0] - c[b2, 0]) < 0:
                    cnt += 1
        return cnt

    base = layout_sugiyama((s, d), 8, layers=[0, 0, 0, 0, 1, 1, 1, 1],
                           maxiter=0)
    assert crossings(coords) <= crossings(base)
    assert crossings(coords) == 0  # a matching can always be untangled


def test_weights_steer_cycle_breaking():
    # 2-cycle: the heavier arc should be kept forward
    s, d = _edges([(0, 1), (1, 0)])
    lay_heavy_fwd = _sugiyama_layers_directed(
        2, s, d, np.array([10.0, 1.0]))
    assert lay_heavy_fwd[0] < lay_heavy_fwd[1]
    lay_heavy_bwd = _sugiyama_layers_directed(
        2, s, d, np.array([1.0, 10.0]))
    assert lay_heavy_bwd[1] < lay_heavy_bwd[0]


def test_layer_vector_length_validated():
    s, d = _edges([(0, 1)])
    with pytest.raises(ValueError):
        layout_sugiyama((s, d), 2, layers=[0])


def test_scale_smoke_powerlaw():
    rng = np.random.default_rng(11)
    n = 1500
    m = 5000
    # power-law-ish targets to stress hub fan-out + dummy chains
    s = rng.zipf(1.6, m) % n
    d = rng.integers(0, n, m)
    coords = layout_sugiyama((s.astype(np.int64), d.astype(np.int64)), n)
    assert coords.shape[0] >= n
    assert np.isfinite(coords).all()


def test_components_never_overlap_random():
    # regression: BK x-coords can be negative; components must still
    # be offset disjointly with >= hgap between them
    rng = np.random.default_rng(0)
    for trial in range(40):
        na = int(rng.integers(2, 15))
        nb = int(rng.integers(2, 15))
        ea = rng.integers(0, na, (max(1, na), 2))
        eb = rng.integers(0, nb, (max(1, nb), 2)) + na
        s = np.concatenate([ea[:, 0], eb[:, 0]]).astype(np.int64)
        d = np.concatenate([ea[:, 1], eb[:, 1]]).astype(np.int64)
        coords = layout_sugiyama((s, d), na + nb, hgap=1.0)
        lab = np.zeros(na + nb, dtype=bool)
        lab[na:] = True
        # components as actually computed (per weak connectivity)
        xa = coords[:na, 0]
        xb = coords[na:nb + na, 0]
        assert xb.min() >= xa.max() + 1.0 - 1e-9, trial
        lay = _layer_lookup(coords, len(coords))  # real + dummy rows
        for l in np.unique(lay):
            xs = np.sort(coords[lay == l, 0])
            if len(xs) > 1:
                assert np.min(np.diff(xs)) >= 1.0 - 1e-9, (trial, l)


def test_undirected_self_loop_extended_once():
    s, d = _edges([(0, 0), (0, 1)])
    coords, ee, em = layout_sugiyama((s, d), 2, directed=False,
                                     return_extended=True)
    assert ee.tolist().count([0, 0]) == 1
    assert len(ee) == 2 and len(em) == 2
