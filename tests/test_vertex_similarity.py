"""Vertex similarity (cocitation / bibcoupling / Jaccard / Dice /
inverse-log-weighted) vs brute-force set oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.vertex_similarity import (
    bibcoupling,
    cocitation,
    similarity_dice,
    similarity_inverse_log_weighted,
    similarity_jaccard,
)

from .oracles import gnm_edges


def _ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
            }
        )
    )


def _nbr_sets(src, dst, n, mode, drop_self=False):
    out = [set() for _ in range(n)]
    for s, d in zip(src, dst):
        if drop_self and s == d:
            continue
        if mode in ("out", "all"):
            out[s].add(d)
        if mode in ("in", "all"):
            out[d].add(s)
    return out


def _pairs_df(ds, val):
    df = ds.to_pandas().sort_values(["u", "w"]).reset_index(drop=True)
    return {
        (int(r.u), int(r.w)): float(getattr(r, val))
        for r in df.itertuples()
    }


def test_cocitation_bibcoupling_gnm():
    n, m = 60, 400
    src, dst = gnm_edges(n, m, seed=11)
    # add multi-edges + a loop: sets must collapse them
    src = np.concatenate((src, src[:5], [7]))
    dst = np.concatenate((dst, dst[:5], [7]))

    got = _pairs_df(cocitation(_ds(src, dst), P=3), "cnt")
    outs = _nbr_sets(src, dst, n, "out")
    for u in range(n):
        for w in range(u + 1, n):
            c = len(outs_in_common := set())
            # cocitation: common citers — v with u,w in N_out(v)
            c = sum(1 for v in range(n) if u in outs[v] and w in outs[v])
            assert got.get((u, w), 0) == c

    got_b = _pairs_df(bibcoupling(_ds(src, dst), P=3), "cnt")
    for u in range(n):
        for w in range(u + 1, n):
            c = len(outs[u] & outs[w])
            assert got_b.get((u, w), 0) == c


def test_jaccard_dice_modes():
    n, m = 50, 300
    src, dst = gnm_edges(n, m, seed=12)
    for mode in ("out", "in", "all"):
        # loops=False: a vertex is never in its own neighborhood
        nbr = _nbr_sets(src, dst, n, mode, drop_self=True)
        gj = _pairs_df(similarity_jaccard(_ds(src, dst), mode=mode, P=3),
                       "jaccard")
        gd = _pairs_df(similarity_dice(_ds(src, dst), mode=mode, P=3),
                       "dice")
        for u in range(n):
            for w in range(u + 1, n):
                inter = len(nbr[u] & nbr[w])
                union = len(nbr[u] | nbr[w])
                if inter == 0:
                    assert (u, w) not in gj and (u, w) not in gd
                    continue
                assert abs(gj[(u, w)] - inter / union) < 1e-8
                assert abs(
                    gd[(u, w)] - 2 * inter / (len(nbr[u]) + len(nbr[w]))
                ) < 1e-8


def test_jaccard_loops_includes_self():
    # path 0->2, 1->2: N(0)={2}, N(1)={2} => jaccard 1.0 without
    # loops; with loops N(0)={0,2}, N(1)={1,2} => 1/3
    ds = _ds([0, 1], [2, 2])
    g0 = _pairs_df(similarity_jaccard(ds, mode="out", P=2), "jaccard")
    assert g0[(0, 1)] == 1.0
    g1 = _pairs_df(
        similarity_jaccard(ds, mode="out", loops=True, n=3, P=2), "jaccard"
    )
    assert abs(g1[(0, 1)] - 1 / 3) < 1e-9


def test_inverse_log_weighted():
    n, m = 40, 250
    src, dst = gnm_edges(n, m, seed=13)
    got = _pairs_df(
        similarity_inverse_log_weighted(_ds(src, dst), mode="out", P=3),
        "sim",
    )
    outs = _nbr_sets(src, dst, n, "out")
    ins = _nbr_sets(src, dst, n, "in")
    for u in range(n):
        for w in range(u + 1, n):
            commons = outs[u] & outs[w]
            exp = 0.0
            for c in commons:
                d = len(ins[c])  # pivot weighted by its in-degree
                exp += (1.0 / np.log(d)) if d > 1 else float(d)
            if exp == 0.0:
                assert (u, w) not in got
            else:
                assert abs(got[(u, w)] - exp) < 1e-6


def test_max_group_skips_hot_pivot():
    # star pivot 0 -> 1..20 (hot), plus pivot 21 -> 1,2
    src = [0] * 20 + [21, 21]
    dst = list(range(1, 21)) + [1, 2]
    got = _pairs_df(cocitation(_ds(src, dst), P=2, max_group=5), "cnt")
    # hot pivot skipped: only the (1,2) pair from pivot 21 survives
    assert got == {(1, 2): 1.0}


def test_bipartite_projection():
    from xdata_igraph_ray.graph.vertex_similarity import (
        bipartite_projection,
    )

    # bipartite: left 0..9, right 0..4 (roles positional, ids overlap)
    rng = np.random.default_rng(21)
    src = rng.integers(0, 10, 80)
    dst = rng.integers(0, 5, 80)

    for which, piv, mem in (("first", dst, src), ("second", src, dst)):
        got = _pairs_df(
            bipartite_projection(_ds(src, dst), which=which, P=3),
            "weight",
        )
        exp: dict = {}
        for p in set(piv.tolist()):
            members = sorted({int(m) for m, q in zip(mem, piv) if q == p})
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    k = (members[i], members[j])
                    exp[k] = exp.get(k, 0) + 1
        assert {k: int(v) for k, v in got.items()} == exp


def test_similarity_pairs_and_neighborhood_ecount(ray_session):
    import networkx as nx
    import ray.data as rd

    from xdata_igraph_ray.graph.scan import local_scan_neighborhood_ecount
    from xdata_igraph_ray.graph.vertex_similarity import (
        similarity_dice_pairs,
        similarity_jaccard_es,
        similarity_jaccard_pairs,
    )

    rng = np.random.default_rng(51)
    n = 20
    arcs = [(int(a), int(b)) for a, b in
            zip(rng.integers(0, n, 80), rng.integers(0, n, 80))
            if a != b]
    arcs = sorted(set(arcs))
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    ds = rd.from_arrow(t)
    out_nbrs = {v: {b for a, b in arcs if a == v} for v in range(n)}
    pairs = [(0, 1), (2, 3), (4, 4), (5, 19)]
    got = similarity_jaccard_pairs(ds, pairs, mode="out", P=2)
    for i, (a, b) in enumerate(pairs):
        u = out_nbrs[a] | out_nbrs[b]
        want = len(out_nbrs[a] & out_nbrs[b]) / len(u) if u else 0.0
        assert got[i] == want, (a, b)
    # loops rule: self added to the neighborhood
    got_l = similarity_jaccard_pairs(ds, [(0, 1)], mode="out",
                                     loops=True, P=2)
    sa = out_nbrs[0] | {0}
    sb = out_nbrs[1] | {1}
    assert got_l[0] == len(sa & sb) / len(sa | sb)
    # dice identity: d = 2j/(1+j)
    j = similarity_jaccard_pairs(ds, pairs, mode="all", P=2)
    d = similarity_dice_pairs(ds, pairs, mode="all", P=2)
    assert np.allclose(d, 2 * j / (1 + j))
    # es variant == pairs on the edge list itself
    es = arcs[:5]
    assert np.allclose(similarity_jaccard_es(ds, es, mode="out", P=2),
                       similarity_jaccard_pairs(ds, es, mode="out",
                                                P=2))

    # neighborhood ecount vs brute-force induced arc count
    hoods = [[0, 1, 2, 3], [4, 5], list(range(10)), []]
    got_e = local_scan_neighborhood_ecount(ds, hoods, P=2)
    for i, nb in enumerate(hoods):
        s = set(nb)
        want = sum(1 for a, b in arcs if a in s and b in s)
        assert got_e[i] == want, nb
