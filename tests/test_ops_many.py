"""N-ary set operators (src/operators.c:137,233,537),
neighborhood_graphs (structural_properties.c:3016) and
create_bipartite (bipartite.c:452)."""

import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph.bipartite import create_bipartite
from xdata_igraph_ray.graph.ops import (
    disjoint_union_many,
    edge_intersection_many,
    edge_union_many,
    neighborhood_graphs,
)


def _t(pairs):
    return pa.table({
        "src": np.array([p[0] for p in pairs], dtype=np.int64),
        "dst": np.array([p[1] for p in pairs], dtype=np.int64),
    })


def _pairs(ds):
    df = ds.to_pandas()
    return sorted(zip(df.src.tolist(), df.dst.tolist()))


def test_union_many(ray_session):
    g1 = _t([(0, 1), (1, 2)])
    g2 = _t([(1, 2), (2, 3)])
    g3 = _t([(3, 4), (0, 1)])
    out = edge_union_many([g1, g2, g3], P=2)
    assert _pairs(out) == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_intersection_many(ray_session):
    g1 = _t([(0, 1), (1, 2), (2, 3), (5, 6)])
    g2 = _t([(1, 2), (2, 3), (5, 6)])
    g3 = _t([(2, 3), (5, 6), (9, 9)])
    out = edge_intersection_many([g1, g2, g3], P=2)
    assert _pairs(out) == [(2, 3), (5, 6)]
    with pytest.raises(ValueError):
        edge_intersection_many([])


def test_disjoint_union_many(ray_session):
    g1 = _t([(0, 1)])
    g2 = _t([(0, 1), (1, 2)])
    g3 = _t([(0, 0)])
    out = disjoint_union_many([g1, g2, g3], [2, 3, 1], P=2)
    assert _pairs(out) == [(0, 1), (2, 3), (3, 4), (5, 5)]
    with pytest.raises(ValueError):
        disjoint_union_many([g1], [2, 3])


def test_neighborhood_graphs(ray_session):
    # path 0->1->2->3 plus offshoot 1->4
    edges = _t([(0, 1), (1, 2), (2, 3), (1, 4)])
    subs = neighborhood_graphs(edges, 5, [0], order=1, mode="out", P=2)
    assert _pairs(subs[0]) == [(0, 1)]  # {0,1}: only 0->1 induced
    subs = neighborhood_graphs(edges, 5, [0, 2], order=2, mode="out", P=2)
    assert _pairs(subs[0]) == [(0, 1), (1, 2), (1, 4)]  # {0,1,2,4}
    assert _pairs(subs[1]) == [(2, 3)]  # {2,3}


def test_create_bipartite():
    t = create_bipartite([0, 1, 0, 1], [(0, 1), (2, 3), (1, 2)])
    assert t.num_rows == 3
    with pytest.raises(ValueError):
        create_bipartite([0, 0, 1], [(0, 1)])  # same class
    with pytest.raises(ValueError):
        create_bipartite([0, 1], [(0, 5)])  # id out of range
    with pytest.raises(ValueError):
        create_bipartite([0, 1], np.array([0, 1, 0]))  # odd flat vector
    assert create_bipartite([0, 1], []).num_rows == 0
