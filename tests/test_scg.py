"""Spectral coarse graining vs brute force + algebraic identities."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.scg import (
    coarse_adjacency,
    scg_adjacency,
    scg_grouping,
    scg_norm_eps,
    scg_semiprojectors,
)


def _brute_optimal(v, nt):
    """Minimum within-interval sum of squares over all contiguous
    partitions of the sorted components."""
    sv = np.sort(v)
    n = len(sv)

    def ss(seg):
        return float(np.sum((seg - seg.mean()) ** 2))

    best = np.inf
    for cuts in combinations(range(1, n), nt - 1):
        bounds = [0, *cuts, n]
        cost = sum(
            ss(sv[bounds[i]:bounds[i + 1]]) for i in range(nt)
        )
        best = min(best, cost)
    return best


def _cost_of(v, gr):
    tot = 0.0
    for g in np.unique(gr):
        seg = v[gr == g]
        tot += float(np.sum((seg - seg.mean()) ** 2))
    return tot


def test_optimum_dp_matches_brute_force():
    rng = np.random.default_rng(5)
    for trial in range(8):
        v = rng.normal(size=12)
        for nt in (2, 3, 4):
            gr = scg_grouping(v, nt, algo="optimum")
            assert len(np.unique(gr)) == nt
            # groups are intervals of the sorted order
            order = np.argsort(v)
            labels = gr[order]
            changes = np.sum(labels[1:] != labels[:-1])
            assert changes == nt - 1
            assert abs(_cost_of(v, gr) - _brute_optimal(v, nt)) < 1e-10


def test_exact_and_interval_groupings():
    v = np.array([1.0, 2.0, 1.0, 3.0, 2.0])
    gr = scg_grouping(v, 0, algo="exact")
    assert gr.tolist() == [0, 1, 0, 2, 1]
    v2 = np.linspace(0, 1, 10)
    gr2 = scg_grouping(v2, 5, algo="interv")
    assert len(np.unique(gr2)) == 5
    gr3 = scg_grouping(v2, 5, algo="interv_km")
    assert _cost_of(v2, gr3) <= _cost_of(v2, gr2) + 1e-12


def test_multi_vector_intersection():
    V = np.array([
        [0.0, 0.0],
        [0.0, 1.0],
        [1.0, 0.0],
        [1.0, 1.0],
        [0.0, 0.0],
    ])
    gr = scg_grouping(V, 0, algo="exact")
    # identical rows share a group; distinct rows do not
    assert gr[0] == gr[4]
    assert len({gr[0], gr[1], gr[2], gr[3]}) == 4


def test_semiprojector_identities():
    gr = np.array([0, 0, 1, 2, 2, 2])
    for mtype, p in (
        ("symmetric", None),
        ("laplacian", None),
        ("stochastic", np.array([0.1, 0.2, 0.3, 0.1, 0.2, 0.1])),
    ):
        L, R = scg_semiprojectors(gr, mtype, p)
        np.testing.assert_allclose(L @ R.T, np.eye(3), atol=1e-12)
    eps = scg_norm_eps(
        np.array([1.0, 1.0, 2.0, 3.0, 3.0, 3.0]), gr, "symmetric"
    )
    np.testing.assert_allclose(eps, [0.0], atol=1e-12)


def _clique_ring_ds(nc, k):
    src, dst = [], []
    for c in range(nc):
        base = c * k
        for i in range(k):
            for j in range(i + 1, k):
                src.append(base + i)
                dst.append(base + j)
    for c in range(nc):
        src.append(c * k)
        dst.append(((c + 1) % nc) * k)
    return rd.from_arrow(
        pa.table({"src": np.array(src, np.int64),
                  "dst": np.array(dst, np.int64)})
    ), nc * k


def test_coarse_adjacency_matches_dense():
    ds, n = _clique_ring_ds(3, 4)
    gr = np.arange(n) // 4
    coo = coarse_adjacency(ds, gr, mtype="symmetric", P=2).to_pandas()
    # dense check: L A L^T (A symmetric from the one-row-per-edge list)
    import ray

    A = np.zeros((n, n))
    for t in ray.get(ds.to_arrow_refs()):
        for s, d in zip(t["src"].to_numpy(), t["dst"].to_numpy()):
            A[s, d] += 1
            A[d, s] += 1
    L, R = scg_semiprojectors(gr, "symmetric")
    want = L @ A @ R.T
    got = np.zeros_like(want)
    for r in coo.itertuples():
        got[int(r.ga), int(r.gb)] += r.w
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_scg_adjacency_preserves_eigenpairs():
    """Exact-level-set grouping preserves the selected eigenpairs:
    the coarse matrix's spectrum contains the chosen eigenvalues
    (SCG exactness property, the point of the method)."""
    ds, n = _clique_ring_ds(4, 5)
    r = scg_adjacency(ds, n, ev=[0], nt=0, algo="exact", P=2)
    # rebuild dense coarse symmetric matrix
    k = int(r["groups"].max()) + 1
    C = np.zeros((k, k))
    for row in r["coarse"].to_pandas().itertuples():
        C[int(row.ga), int(row.gb)] += row.w
    cvals = np.linalg.eigvalsh(C)
    assert np.min(np.abs(cvals - r["values"][0])) < 1e-8
    np.testing.assert_allclose(r["eps"], [0.0], atol=1e-8)
