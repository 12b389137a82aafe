"""rewire (igraph_rewire, src/structural_properties.c:1544) invariants
and hsbm (igraph_hsbm_game, src/sbm.c:243) structure checks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph import generators
from xdata_igraph_ray.graph.rewire import rewire


def _degrees(src, dst, n):
    return np.bincount(src, minlength=n), np.bincount(dst, minlength=n)


def _collect(ds):
    df = ds.to_pandas()
    return df["src"].to_numpy(), df["dst"].to_numpy()


def test_rewire_preserves_degrees_and_simplicity():
    t = generators.erdos_renyi_gnm(200, 1200, directed=True, seed=3)
    src0, dst0 = t["src"].to_numpy(), t["dst"].to_numpy()
    n = 200
    out = rewire(t, rounds=4, trials_factor=4, seed=11, P=4)
    src1, dst1 = _collect(out)
    assert len(src1) == len(src0)
    o0, i0 = _degrees(src0, dst0, n)
    o1, i1 = _degrees(src1, dst1, n)
    assert (o0 == o1).all() and (i0 == i1).all()
    # simple: no loops, no duplicates
    assert (src1 != dst1).all()
    assert len(set(zip(src1.tolist(), dst1.tolist()))) == len(src1)
    # actually mixed: most edges moved
    before = set(zip(src0.tolist(), dst0.tolist()))
    after = set(zip(src1.tolist(), dst1.tolist()))
    assert len(before & after) < 0.8 * len(before)


def test_rewire_deterministic():
    t = generators.erdos_renyi_gnm(80, 400, directed=True, seed=5)
    a = sorted(zip(*_collect(rewire(t, seed=9, P=3))))
    b = sorted(zip(*_collect(rewire(t, seed=9, P=3))))
    c = sorted(zip(*_collect(rewire(t, seed=10, P=3))))
    assert a == b
    assert a != c


def test_hsbm_structure():
    t = generators.hsbm(4, 40, [0.5, 0.5], [[0.8, 0.15], [0.15, 0.8]],
                        p_out=0.005, seed=13)
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    n = 160
    assert src.max() < n and (src != dst).all()
    # symmetric storage
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    cl_s, cl_d = src // 40, dst // 40
    within = float((cl_s == cl_d).mean())
    assert within > 0.9  # p_out is tiny
    # within a cluster, same-block pairs dominate (C diag >> offdiag)
    m = cl_s == cl_d
    blk_s = (src[m] % 40) // 20
    blk_d = (dst[m] % 40) // 20
    assert float((blk_s == blk_d).mean()) > 0.6


def test_hsbm_bad_rho_raises():
    import pytest

    with pytest.raises(ValueError):
        generators.hsbm(2, 10, [0.7, 0.7], [[0.5, 0.5], [0.5, 0.5]], 0.1)


def test_hsbm_list_structure():
    t = generators.hsbm_list(
        [30, 20], [[0.5, 0.5], [1.0]],
        [[[0.9, 0.1], [0.1, 0.9]], [[0.8]]], 0.01, seed=7,
    )
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    pairs = set(zip(s.tolist(), d.tolist()))
    assert all((b, a) in pairs for a, b in pairs)  # symmetric
    assert s.max() < 50
    within0 = sum(1 for a, b in pairs if a < 30 and b < 30)
    across = sum(1 for a, b in pairs if (a < 30) != (b < 30))
    assert within0 > 10 * max(across, 1)  # planted density ordering


def test_hsbm_list_validation():
    import pytest as _pytest

    good_C = [[[1.0]]]
    with _pytest.raises(ValueError):
        generators.hsbm_list([], [], [], 0.1)
    with _pytest.raises(ValueError):
        generators.hsbm_list([5], [[0.7, 0.7]], [[[0.5, 0.5], [0.5, 0.5]]], 0.1)
    with _pytest.raises(ValueError):
        generators.hsbm_list([5], [[1.0]], good_C, 1.5)
    with _pytest.raises(ValueError):
        generators.hsbm_list([5], [[1.0]], [[[0.2, 0.1], [0.1, 0.2]]], 0.1)
