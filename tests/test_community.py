"""Multilevel (Louvain) community detection: planted-structure
recovery + modularity quality vs networkx's Louvain."""

from __future__ import annotations

import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from xdata_igraph_ray.graph.community import louvain
from xdata_igraph_ray.graph.generators import sbm
from xdata_igraph_ray.graph.metrics import modularity


def _ds(tbl):
    return rd.from_arrow(tbl)


def _modularity_of(edges_tbl, membership, n):
    return modularity(_ds(edges_tbl), membership, P=4)


def test_louvain_ring_of_cliques():
    # 6 cliques of 8, ring-connected: communities == cliques
    blocks, src, dst = 6, [], []
    k = 8
    for b in range(blocks):
        off = b * k
        for i in range(k):
            for j in range(i + 1, k):
                src.append(off + i)
                dst.append(off + j)
        src.append(off)
        dst.append(((b + 1) % blocks) * k)
    t = pa.table({"src": np.array(src, np.int64),
                  "dst": np.array(dst, np.int64)})
    mem_ds, ncomm = louvain(_ds(t), n=blocks * k, P=3)
    df = mem_ds.to_pandas().sort_values("vid")
    mem = df["comm"].to_numpy()
    assert ncomm == blocks
    for b in range(blocks):
        assert len(set(mem[b * k:(b + 1) * k])) == 1
    # distinct cliques get distinct communities
    assert len({mem[b * k] for b in range(blocks)}) == blocks


def test_louvain_sbm_quality():
    import networkx as nx

    t = sbm([50, 50, 50], p_in=0.25, p_out=0.01, seed=8)
    mem_ds, ncomm = louvain(_ds(t), n=150, P=3)
    mem = mem_ds.to_pandas().sort_values("vid")["comm"].to_numpy()
    q_ours = _modularity_of(t, mem, 150)
    g = nx.Graph()
    g.add_nodes_from(range(150))
    g.add_edges_from(zip(t["src"].to_numpy().tolist(),
                         t["dst"].to_numpy().tolist()))
    comms = nx.community.louvain_communities(g, seed=1)
    nx_mem = np.zeros(150, np.int64)
    for i, c in enumerate(comms):
        for v in c:
            nx_mem[v] = i
    q_nx = _modularity_of(t, nx_mem, 150)
    assert q_ours >= q_nx - 0.03, (q_ours, q_nx)
    assert q_ours > 0.5


def test_louvain_deterministic():
    t = sbm([40, 40], p_in=0.3, p_out=0.02, seed=9)
    m1 = louvain(_ds(t), n=80, P=2)[0].to_pandas().sort_values("vid")
    m2 = louvain(_ds(t), n=80, P=3)[0].to_pandas().sort_values("vid")
    assert list(m1["comm"]) == list(m2["comm"])  # partition-count independent


def test_compare_communities_vs_naive():
    """igraph_compare_communities formulas vs direct O(n^2)
    pair-counting / dict-based entropy computation."""
    import math
    from collections import Counter

    import numpy as np

    from xdata_igraph_ray.graph.community import (
        compare_communities,
        split_join_distance,
    )

    rng = np.random.default_rng(41)
    for trial in range(6):
        n = 60
        a = rng.integers(0, 5, n)
        b = rng.integers(0, 4, n)

        # identical partitions: fixed points
        assert abs(compare_communities(a, a, "vi")) < 1e-12
        assert compare_communities(a, a, "nmi") == 1.0
        assert abs(compare_communities(a, a, "rand") - 1) < 1e-12
        assert abs(compare_communities(a, a, "adjusted_rand") - 1) < 1e-12
        assert compare_communities(a, a, "split-join") == 0.0

        # rand via brute pair counting
        same_a = np.equal.outer(a, a)
        same_b = np.equal.outer(b, b)
        iu = np.triu_indices(n, 1)
        agree = (same_a[iu] == same_b[iu]).sum()
        rand_naive = agree / len(iu[0])
        assert abs(compare_communities(a, b, "rand") - rand_naive) < 1e-12

        # vi/nmi via dicts
        pa_ = Counter(a.tolist())
        pb_ = Counter(b.tolist())
        pab = Counter(zip(a.tolist(), b.tolist()))
        h1 = -sum(c / n * math.log(c / n) for c in pa_.values())
        h2 = -sum(c / n * math.log(c / n) for c in pb_.values())
        mi = sum(
            c / n * math.log((c / n) / (pa_[x] / n * pb_[y] / n))
            for (x, y), c in pab.items()
        )
        assert abs(compare_communities(a, b, "vi") - (h1 + h2 - 2 * mi)) < 1e-10
        assert abs(
            compare_communities(a, b, "nmi") - 2 * mi / (h1 + h2)
        ) < 1e-10

        # split-join via dicts
        d12 = n - sum(
            max(c for (x, _y), c in pab.items() if x == i)
            for i in pa_
        )
        d21 = n - sum(
            max(c for (_x, y), c in pab.items() if y == j)
            for j in pb_
        )
        got12, got21 = split_join_distance(a, b)
        assert (got12, got21) == (d12, d21)


def test_dendrogram_helpers():
    from xdata_igraph_ray.graph.community import (
        community_to_membership,
        eb_get_merges,
        reindex_membership,
    )

    # 4 vertices, merges: (0,1)->4, (2,3)->5, (4,5)->6
    merges = np.array([[0, 1], [2, 3], [4, 5]])
    m, cs = community_to_membership(merges, 4, steps=2)
    # after two steps: {0,1} and {2,3}; reverse-discovery numbering:
    # row 1 (2,3) found first -> community 0; row 0 (0,1) -> 1
    assert m.tolist() == [1, 1, 0, 0]
    assert cs.tolist() == [2, 2]
    m3, cs3 = community_to_membership(merges, 4, steps=3)
    assert m3.tolist() == [0, 0, 0, 0] and cs3.tolist() == [4]
    m0, cs0 = community_to_membership(merges, 4, steps=0)
    assert m0.tolist() == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="steps"):
        community_to_membership(merges, 4, steps=5)

    new, n2o = reindex_membership(np.array([7, 3, 7, 9, 3]))
    assert new.tolist() == [1, 0, 1, 2, 0]
    assert n2o.tolist() == [3, 7, 9]

    # path 0-1-2-3; removal order: middle edge first
    removal = [(1, 2), (0, 1), (2, 3)]
    mg, br = eb_get_merges(removal, 4)
    # reverse: (2,3) merge -> row0, (0,1) -> row1, (1,2) joins 4&5
    assert mg.tolist() == [[2, 3], [0, 1], [5, 4]]
    assert br.tolist() == [3, 2, 1]
    # membership from these merges at 2 communities
    mm, _ = community_to_membership(mg, 4, steps=2)
    assert mm[0] == mm[1] and mm[2] == mm[3] and mm[0] != mm[2]


def test_spinglass(ray_session):
    import ray

    from xdata_igraph_ray.graph.community import spinglass

    # planted ring of 5 cliques of 6: exact recovery + determinism
    pairs = []
    k, m = 5, 6
    for c in range(k):
        base = c * m
        pairs += [(base + i, base + j)
                  for i in range(m) for j in range(i + 1, m)]
        pairs.append((base, ((c + 1) % k) * m))
    arcs = pairs + [(b, a) for a, b in pairs]
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    n = k * m
    r = spinglass([ray.put(t)], n, spins=8, seed=3, P=2)
    mem = r["membership"]
    assert mem.tolist() == (np.arange(n) // m).tolist()
    assert r["modularity"] > 0.6
    r2 = spinglass([ray.put(t)], n, spins=8, seed=3, P=2)
    assert (r2["membership"] == mem).all()
    # spins cap: never more communities than spins
    r3 = spinglass([ray.put(t)], n, spins=3, seed=4, P=2)
    assert len(set(r3["membership"].tolist())) <= 3
    # empty graph
    r0 = spinglass([ray.put(pa.table({
        "src": np.array([], np.int64),
        "dst": np.array([], np.int64)}))], 4, P=2)
    assert r0["membership"].tolist() == [0, 0, 0, 0]


def test_spinglass_single(ray_session):
    import ray

    from xdata_igraph_ray.graph.community import spinglass_single

    # planted ring of 5 cliques of 6: the community of any vertex is
    # exactly its clique (plus nothing else)
    pairs = []
    k, m = 5, 6
    for c in range(k):
        base = c * m
        pairs += [(base + i, base + j)
                  for i in range(m) for j in range(i + 1, m)]
        pairs.append((base, ((c + 1) % k) * m))
    arcs = pairs + [(b, a) for a, b in pairs]
    t = pa.table({"src": np.array([a for a, _ in arcs], np.int64),
                  "dst": np.array([b for _, b in arcs], np.int64)})
    n = k * m
    ref = ray.put(t)
    for seed_v in (0, 7, 29):
        r = spinglass_single([ref], n, vertex=seed_v, P=2)
        want = set(range((seed_v // m) * m, (seed_v // m) * m + m))
        assert set(r["community"].tolist()) == want
        assert r["size"] == m
        # clique of 6 has 15 inner edges; 2 ring edges leave it
        assert r["inner_links"] == 15
        assert r["outer_links"] == 2
        # cohesion/adhesion agree with the C formulas
        T = float(2 * len(pairs))
        Ks = float(sum(
            sum(1 for a, b in pairs if a == v or b == v) for v in want))
        assert np.isclose(r["cohesion"], 15 - 1.0 / T * Ks * Ks / 2)
        assert np.isclose(r["adhesion"], 2 - 1.0 / T * Ks * (T - Ks))
        # deterministic
        r2 = spinglass_single([ref], n, vertex=seed_v, P=2)
        assert r2["community"].tolist() == r["community"].tolist()

    # weighted: strong triangle {0,1,2} weakly tied to {3,4,5}
    wpairs = [(0, 1, 10.0), (0, 2, 10.0), (1, 2, 10.0),
              (3, 4, 10.0), (3, 5, 10.0), (4, 5, 10.0), (2, 3, 0.1)]
    src = np.array([a for a, _, _ in wpairs] + [b for _, b, _ in wpairs],
                   np.int64)
    dst = np.array([b for _, b, _ in wpairs] + [a for a, _, _ in wpairs],
                   np.int64)
    ww = np.array([w for _, _, w in wpairs] * 2, np.float64)
    wt = pa.table({"src": src, "dst": dst, "weight": ww})
    r = spinglass_single([ray.put(wt)], 6, vertex=0, P=2)
    assert set(r["community"].tolist()) == {0, 1, 2}
    # int truncation of the weighted sums, like the C's igraph_integer_t
    assert r["inner_links"] == 30
    assert r["outer_links"] == 0  # int(0.1) truncates

    # gamma high enough prefers smaller/denser communities: still the
    # triangle (sanity that gamma wires through)
    r = spinglass_single([ray.put(wt)], 6, vertex=0, gamma=2.0, P=2)
    assert 0 in r["community"].tolist()

    # validation + connectivity gates, mirroring clustertool.cpp
    import pytest as _pytest
    with _pytest.raises(ValueError):
        spinglass_single([ref], n, vertex=0, spins=1, P=2)
    with _pytest.raises(ValueError):
        spinglass_single([ref], n, vertex=0, gamma=-1.0, P=2)
    with _pytest.raises(ValueError):
        spinglass_single([ref], n, vertex=n + 5, P=2)
    disc = pa.table({"src": np.array([0, 2], np.int64),
                     "dst": np.array([1, 3], np.int64)})
    with _pytest.raises(ValueError, match="unconnected"):
        spinglass_single([ray.put(disc)], 4, vertex=0, P=2)
    # n == 1 trivial
    r1 = spinglass_single([ray.put(pa.table({
        "src": np.array([], np.int64),
        "dst": np.array([], np.int64)}))], 1, vertex=0, P=2)
    assert r1["community"].tolist() == [0] and r1["size"] == 1


def test_spinglass_negative(ray_session):
    import ray

    from xdata_igraph_ray.graph.community import spinglass_negative

    # two positive cliques of 6 joined by negative bridges: the
    # negative links force the split (Traag-Bruggeman semantics)
    src, dst, w = [], [], []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                src.append(base + i)
                dst.append(base + j)
                w.append(1.0)
    for i in range(3):
        src.append(i)
        dst.append(6 + i)
        w.append(-1.0)
    t = pa.table({"src": np.array(src, np.int64),
                  "dst": np.array(dst, np.int64),
                  "weight": np.array(w, np.float64)})
    r = spinglass_negative([ray.put(t)], n=12, spins=6, seed=1)
    assert r["membership"].tolist() == [0] * 6 + [1] * 6
    # signed modularity by hand: per clique ip=15, D+=30, m+=60,
    # each bridge endpoint has d-=1 -> D-=3, m-=6
    # Q = 2*(15 - (30*30/120 - 3*3/12)) = 2*8.25 = 16.5
    assert np.isclose(r["modularity"], 2 * 16.5 / (60 + 6))
    # deterministic per seed
    r2 = spinglass_negative([ray.put(t)], n=12, spins=6, seed=1)
    assert (r2["membership"] == r["membership"]).all()
    assert r2["modularity"] == r["modularity"]

    # all-positive input degenerates to plain spinglass behaviour:
    # planted ring of 4 cliques of 8 recovered exactly
    src, dst = [], []
    for c in range(4):
        base = c * 8
        for i in range(8):
            for j in range(i + 1, 8):
                src.append(base + i)
                dst.append(base + j)
        src.append(c * 8)
        dst.append(((c + 1) % 4) * 8)
    t2 = pa.table({"src": np.array(src, np.int64),
                   "dst": np.array(dst, np.int64)})
    r3 = spinglass_negative([ray.put(t2)], n=32, spins=10, seed=1)
    assert r3["membership"].tolist() == (np.arange(32) // 8).tolist()

    # empty graph
    r0 = spinglass_negative([ray.put(pa.table({
        "src": np.array([], np.int64),
        "dst": np.array([], np.int64)}))], 3)
    assert r0["membership"].tolist() == [0, 0, 0]


def _louvain_df(t, n, **kw):
    ds, k = louvain(rd.from_arrow(t), n=n, P=4, **kw)
    df = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    return df, k


def test_louvain_delta_matches_rebuild():
    """Delta local-move rounds (persistent candidate sums patched by
    moved-vertex messages, engine.py lou_delta_candidates) must be
    bit-identical to the legacy O(E)-rebuild rounds: with
    integer-valued weights every incremental float add is exact, and
    the assembled candidate/query arrays replicate the rebuild's
    construction including the zero-weight own-community rows.
    Exercised on a loop/multi-edge graph and an integer-weighted one."""
    rng = np.random.default_rng(33)
    n = 300
    src = rng.integers(0, n, 2500)
    dst = rng.integers(0, n, 2500)
    # loops + forced multi-edges + a hub
    src = np.concatenate((src, np.arange(0, n, 7), src[:200],
                          np.arange(0, n, 2)))
    dst = np.concatenate((dst, np.arange(0, n, 7), dst[:200],
                          np.full((n + 1) // 2, 5)))
    cases = [
        pa.table({"src": src, "dst": dst}),
        pa.table({"src": src, "dst": dst,
                  "weight": rng.integers(1, 9, len(src)).astype(float)}),
    ]
    for t in cases:
        a, ka = _louvain_df(t, n, delta="force")
        b, kb = _louvain_df(t, n, delta="off")
        assert ka == kb
        assert a.equals(b)


def test_louvain_delta_auto_gates_on_nonintegral_weights():
    """auto mode must fall back to the legacy rebuild when weights are
    not integer-valued (incremental float adds would drift) — result
    equals an explicit delta="off" run."""
    rng = np.random.default_rng(34)
    n = 200
    src = rng.integers(0, n, 1500)
    dst = rng.integers(0, n, 1500)
    w = rng.random(len(src)) + 0.25
    t = pa.table({"src": src, "dst": dst, "weight": w})
    a, ka = _louvain_df(t, n, delta="auto")
    b, kb = _louvain_df(t, n, delta="off")
    assert ka == kb
    assert a.equals(b)


def test_symmetric_engine_build_equals_two_direction_build():
    """from_edges(symmetric=True) on a symmetric arc multiset must be
    interchangeable with the default two-direction build: identical rv
    CSR (same routing), and the aliased fw side must agree on every
    order-insensitive read the community path uses (degrees, strengths,
    per-vertex neighbor multisets)."""
    import ray
    from xdata_igraph_ray.graph.engine import GraphEngine

    rng = np.random.default_rng(91)
    n = 120
    src = rng.integers(0, n, 800)
    dst = rng.integers(0, n, 800)
    w = rng.integers(1, 5, 800).astype(float)
    # symmetrize by hand (loops appear once, doubled weight)
    loops = src == dst
    t = pa.table({
        "src": np.concatenate((src[~loops], dst[~loops], src[loops])),
        "dst": np.concatenate((dst[~loops], src[~loops], src[loops])),
        "weight": np.concatenate((w[~loops], w[~loops], 2 * w[loops])),
    })
    engines = [
        GraphEngine.from_edges([ray.put(t)], n=n, P=3, weighted=True,
                               symmetric=sym)
        for sym in (False, True)
    ]
    try:
        tbls = [
            pa.concat_tables(ray.get(
                [s.degree_table.remote() for s in e.shards]
            )).to_pandas().sort_values("vid").reset_index(drop=True)
            for e in engines
        ]
        assert tbls[0].equals(tbls[1])
        for e in engines:
            assert e.edge_count == len(t)
        # the full legacy local-move path (fw-reading lou_scatter +
        # candidate rebuild) must land on identical memberships
        from xdata_igraph_ray.graph.community import _local_move

        members = []
        for e in engines:
            strengths = ray.get(
                [s.degree_table.remote() for s in e.shards])
            m_total = sum(
                float(np.sum(x["out_strength"].to_numpy()))
                for x in strengths
            ) / 2.0
            _local_move(e, m_total, 24, delta="off")
            e.renumber_labels("comm")
            members.append(
                e.state_dataset(["comm"]).to_pandas()
                .sort_values("vid").reset_index(drop=True)
            )
        assert members[0].equals(members[1])
    finally:
        for e in engines:
            e.shutdown()


def test_louvain_cache_contract_matches_join_contract():
    """The shard-local cache-based contraction (engine.lou_contract_emit
    via community._cache_contract) must produce the identical contracted
    arc table as the join-based _contract — checked end-to-end by
    forcing multiple levels on a modular graph and comparing delta=
    "force" (cache contraction) with delta="off" (join contraction)
    memberships, AND at table level on the first contraction."""
    import ray
    from xdata_igraph_ray.exchange import block_refs
    from xdata_igraph_ray.graph.community import (
        _cache_contract, _contract, _local_move, _symmetrize)
    from xdata_igraph_ray.graph.engine import GraphEngine

    t = sbm([50] * 24, 0.12, 0.004, seed=5)
    refs = [ray.put(t)]
    arcs = [_symmetrize.remote(r) for r in refs]
    n = 1200
    eng = GraphEngine.from_edges(arcs, n=n, P=4, weighted=True,
                                 symmetric=True)
    strengths = ray.get([s.degree_table.remote() for s in eng.shards])
    m_total = sum(
        float(np.sum(x["out_strength"].to_numpy())) for x in strengths
    ) / 2.0
    _, use_delta = _local_move(eng, m_total, 24, min_moves=n // 200,
                               delta="force")
    assert use_delta
    outs = eng.scatter("lou_delta_scatter")
    ray.get([
        eng.shards[q].lou_cache_flush.remote(*eng.pieces(outs, q))
        for q in range(eng.P)
    ])
    k = eng.renumber_labels("comm")
    lvl_map = eng.state_dataset(["comm"]).materialize()
    a_refs = _cache_contract(eng, k, 4)
    b_refs = _contract(arcs, lvl_map, 4)

    def collect(rs):
        df = pa.concat_tables(ray.get(rs)).to_pandas()
        return df.sort_values(["src", "dst"]).reset_index(drop=True)

    a, b = collect(a_refs), collect(b_refs)
    eng.shutdown()
    assert len(a) == len(b)
    assert a.equals(b)


def test_louvain_delta_matches_rebuild_powerlaw_midsize():
    """Same delta==rebuild bit-identity on a 5000-vertex power-law web
    graph (hubs, multi-levels of contraction engaged) — the shape the
    bench kernels run on, vs the small adversarial graphs above."""
    from xdata_igraph_ray.sources.synth import generate_edges

    t = generate_edges(5000, seed=11)
    a, ka = _louvain_df(t, 5000, delta="force")
    b, kb = _louvain_df(t, 5000, delta="off")
    assert ka == kb
    assert a.equals(b)
