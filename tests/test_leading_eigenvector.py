"""Leading-eigenvector community detection vs a dense-numpy
re-derivation (exact eigh on the restricted modularity matrix, same
split/orient/threshold rules) and structural fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xdata_igraph_ray.graph.community import leading_eigenvector


def _edges_table(src, dst, w=None):
    cols = {
        "src": np.asarray(src, np.int64),
        "dst": np.asarray(dst, np.int64),
    }
    if w is not None:
        cols["weight"] = np.asarray(w, np.float64)
    return pa.table(cols)


def _dense_lec(src, dst, w, n, steps=None):
    """Same algorithm with the exact leading eigenpair (numpy eigh)."""
    A = np.zeros((n, n))
    for u, v, ww in zip(src, dst, w):
        if u == v:
            A[u, u] += 2.0 * ww
        else:
            A[u, v] += ww
            A[v, u] += ww
    k = A.sum(axis=1)
    two_m = k.sum()
    comm = np.zeros(n, dtype=np.int64)
    queue, next_id, splits = [0], 1, 0
    steps = steps if steps is not None else n - 1
    while queue and splits < steps:
        c = queue.pop(0)
        m = comm == c
        if m.sum() < 2:
            continue
        Kg = k[m].sum()
        y = A @ m.astype(float)
        rs = np.where(m, y - k * Kg / two_m, 0.0)
        sigma = np.where(m, y + k * Kg / two_m + np.abs(rs), 0.0).max()
        if sigma <= 0:
            continue
        idx = np.flatnonzero(m)
        B = A[np.ix_(idx, idx)] - np.outer(k[idx], k[idx]) / two_m
        B -= np.diag(B.sum(axis=1))
        evals, evecs = np.linalg.eigh(B)
        lam, x = evals[-1], evecs[:, -1]
        if lam <= 1e-7 * sigma:
            continue
        nz = np.flatnonzero(np.abs(x) > 1e-12)
        if len(nz) and x[nz[0]] < 0:
            x = -x
        pos = x > 0
        if pos.all() or not pos.any():
            continue
        comm[idx[pos]] = next_id
        queue.extend((c, next_id))
        next_id += 1
        splits += 1
    return comm


def _first_appearance(comm):
    out = np.empty_like(comm)
    seen = {}
    for i, c in enumerate(comm):
        out[i] = seen.setdefault(int(c), len(seen))
    return out


def _membership_array(ds, n):
    df = ds.to_pandas().sort_values("vid")
    assert len(df) == n
    return df["comm"].to_numpy()


def test_lec_dumbbell_two_cliques():
    # two K5s joined by a single bridge edge
    src, dst = [], []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                src.append(base + i)
                dst.append(base + j)
    src.append(4)
    dst.append(5)
    mem, k = leading_eigenvector(_edges_table(src, dst), n=10, P=3)
    got = _membership_array(mem, 10)
    assert k == 2
    assert len(set(got[:5])) == 1 and len(set(got[5:])) == 1
    assert got[0] != got[9]
    # first-appearance numbering: vertex 0's community is 0
    assert got[0] == 0


def test_lec_vs_dense_sbm():
    # 3-block SBM, clear structure: engine must match the exact-eigh
    # re-derivation vertex for vertex (same numbering rule)
    rng = np.random.default_rng(4)
    n, b = 60, 20
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = 0.6 if i // b == j // b else 0.03
            if rng.random() < p:
                src.append(i)
                dst.append(j)
    w = [1.0] * len(src)
    want = _first_appearance(_dense_lec(src, dst, w, n))
    mem, k = leading_eigenvector(_edges_table(src, dst), n=n, P=3)
    got = _membership_array(mem, n)
    np.testing.assert_array_equal(got, want)
    assert k == len(set(want.tolist()))
    assert k >= 3


def test_lec_weighted_and_p_invariance():
    # weighted barbell: heavy intra-weights, light bridge; membership
    # must be identical at P=2 and P=4 (deterministic start vector)
    rng = np.random.default_rng(11)
    src, dst, w = [], [], []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                src.append(base + i)
                dst.append(base + j)
                w.append(float(rng.integers(2, 5)))
    src.append(5)
    dst.append(6)
    w.append(0.5)
    t = _edges_table(src, dst, w)
    mem2, k2 = leading_eigenvector(t, n=12, P=2)
    mem4, k4 = leading_eigenvector(t, n=12, P=4)
    g2 = _membership_array(mem2, 12)
    g4 = _membership_array(mem4, 12)
    assert k2 == k4 == 2
    np.testing.assert_array_equal(g2, g4)
    assert len(set(g2[:6])) == 1 and len(set(g2[6:])) == 1


def test_lec_no_split_on_clique():
    # a single clique has no positive modularity split
    src, dst = [], []
    for i in range(7):
        for j in range(i + 1, 7):
            src.append(i)
            dst.append(j)
    mem, k = leading_eigenvector(_edges_table(src, dst), n=7, P=2)
    got = _membership_array(mem, 7)
    assert k == 1
    assert (got == 0).all()
