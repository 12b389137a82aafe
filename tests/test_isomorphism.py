"""VF2 isomorphism (igraph_isomorphic_vf2, src/topology.c:1306) vs
networkx, plus the batch fan-out API."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

from xdata_igraph_ray.graph import generators
from xdata_igraph_ray.graph.isomorphism import isomorphic, isomorphic_many


def _tbl(src, dst):
    return pa.table({"src": np.asarray(src, dtype=np.int64),
                     "dst": np.asarray(dst, dtype=np.int64)})


def _permute(t: pa.Table, n: int, seed: int):
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    return _tbl(perm[t["src"].to_numpy()], perm[t["dst"].to_numpy()]), perm


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_permuted_graph_is_isomorphic(seed):
    t = generators.erdos_renyi_gnm(14, 30, directed=True, seed=seed)
    t2, perm = _permute(t, 14, seed + 100)
    ok, mapping = isomorphic(t, 14, t2, 14, return_mapping=True)
    assert ok
    # the returned mapping must be a real isomorphism
    es1 = set(zip(t["src"].to_numpy(), t["dst"].to_numpy()))
    es2 = set(zip(t2["src"].to_numpy(), t2["dst"].to_numpy()))
    assert {(mapping[a], mapping[b]) for a, b in es1} == es2


def test_non_isomorphic_vs_networkx():
    rng = np.random.default_rng(5)
    hits = 0
    for seed in range(6):
        a = generators.erdos_renyi_gnm(10, 18, directed=True, seed=seed)
        b = generators.erdos_renyi_gnm(10, 18, directed=True, seed=seed + 50)
        g1 = nx.DiGraph(list(zip(a["src"].to_numpy(), a["dst"].to_numpy())))
        g2 = nx.DiGraph(list(zip(b["src"].to_numpy(), b["dst"].to_numpy())))
        g1.add_nodes_from(range(10))
        g2.add_nodes_from(range(10))
        want = nx.is_isomorphic(g1, g2)
        assert isomorphic(a, 10, b, 10) == want
        hits += int(want)
    assert hits < 6  # at least one genuinely non-isomorphic pair


def test_undirected_mode():
    ring = generators.ring(8)
    star = generators.star(8)
    assert isomorphic(ring, 8, ring, 8, directed=False)
    assert not isomorphic(ring, 8, star, 8, directed=False)


def test_multigraph_input_raises():
    # _adj collapses parallel edges into sets; the reference requires
    # simple graphs, so multigraph input must error, not silently
    # report {0->1 x2, 1->2} isomorphic to {0->1, 1->2 x2}.
    g1 = pa.table({"src": np.array([0, 0, 1], np.int64),
                   "dst": np.array([1, 1, 2], np.int64)})
    g2 = pa.table({"src": np.array([0, 1, 1], np.int64),
                   "dst": np.array([1, 2, 2], np.int64)})
    with pytest.raises(ValueError, match="simple"):
        isomorphic(g1, 3, g2, 3)
    # undirected: (0,1)+(1,0) is the same parallel pair
    g3 = pa.table({"src": np.array([0, 1, 1], np.int64),
                   "dst": np.array([1, 0, 2], np.int64)})
    with pytest.raises(ValueError, match="simple"):
        isomorphic(g3, 3, g3, 3, directed=False)
    # ...but a mutual directed pair is simple in directed mode
    assert isomorphic(g3, 3, g3, 3, directed=True)


def test_isomorphic_many_batch():
    pairs = []
    wants = []
    for seed in range(8):
        t = generators.erdos_renyi_gnm(12, 22, directed=True, seed=seed)
        if seed % 2 == 0:
            t2, _ = _permute(t, 12, seed + 7)
            wants.append(True)
        else:
            t2 = generators.erdos_renyi_gnm(
                12, 22, directed=True, seed=seed + 99
            )
            g1 = nx.DiGraph(list(zip(t["src"].to_numpy(),
                                     t["dst"].to_numpy())))
            g2 = nx.DiGraph(list(zip(t2["src"].to_numpy(),
                                     t2["dst"].to_numpy())))
            g1.add_nodes_from(range(12))
            g2.add_nodes_from(range(12))
            wants.append(nx.is_isomorphic(g1, g2))
        pairs.append(((t, 12), (t2, 12)))
    assert isomorphic_many(pairs) == wants


def test_graphdb_pair_workflow(tmp_path):
    """GraphDB files (the VF2 benchmark format) -> batch isomorphism."""
    from xdata_igraph_ray.sources import formats

    t = generators.erdos_renyi_gnm(9, 16, directed=True, seed=3)
    t2, _ = _permute(t, 9, 11)
    p1, p2 = str(tmp_path / "a.gdb"), str(tmp_path / "b.gdb")
    formats.write_graphdb(p1, 9, t)
    formats.write_graphdb(p2, 9, t2)
    n1, e1 = formats.read_graphdb(p1)
    n2, e2 = formats.read_graphdb(p2)
    assert isomorphic_many([((e1, n1), (e2, n2))]) == [True]


def test_subisomorphic_triangle_in_k4():
    from xdata_igraph_ray.graph.isomorphism import subisomorphic

    tri = _tbl([0, 1, 2], [1, 2, 0])
    k4 = generators.full(4, directed=True)  # all ordered pairs
    ok, m = subisomorphic(tri, 3, k4, 4, return_mapping=True)
    assert ok
    es = set(zip(k4["src"].to_numpy(), k4["dst"].to_numpy()))
    for a, b in [(0, 1), (1, 2), (2, 0)]:
        assert (m[a], m[b]) in es
    # path P3 maps monomorphically onto the directed triangle, but is
    # NOT an induced subgraph of it (the closing arc 2->0 exists)
    p3 = _tbl([0, 1], [1, 2])
    c3 = _tbl([0, 1, 2], [1, 2, 0])
    assert subisomorphic(p3, 3, c3, 3)
    assert not subisomorphic(p3, 3, c3, 3, induced=True)


def test_subisomorphic_vs_networkx_monomorphism():
    from xdata_igraph_ray.graph.isomorphism import subisomorphic
    from networkx.algorithms import isomorphism as nxiso

    for seed in range(4):
        tgt = generators.erdos_renyi_gnm(9, 20, directed=True, seed=seed)
        pat = generators.erdos_renyi_gnm(4, 4, directed=True, seed=seed + 30)
        g_t = nx.DiGraph(list(zip(tgt["src"].to_numpy(),
                                  tgt["dst"].to_numpy())))
        g_p = nx.DiGraph(list(zip(pat["src"].to_numpy(),
                                  pat["dst"].to_numpy())))
        g_t.add_nodes_from(range(9))
        g_p.add_nodes_from(range(4))
        gm = nxiso.DiGraphMatcher(g_t, g_p)
        want = gm.subgraph_is_monomorphic()
        assert subisomorphic(pat, 4, tgt, 9) == want, seed


def test_count_isomorphisms_automorphism_groups():
    """count_isomorphisms(g, g) = automorphism group order — known
    groups: cycle C_n -> 2n (dihedral, undirected), directed cycle ->
    n, path P_n -> 2, star K_1,k -> k!."""
    import math

    import numpy as np
    import pyarrow as pa

    from xdata_igraph_ray.graph.isomorphism import (
        count_isomorphisms,
        get_isomorphisms,
    )

    def t(arcs):
        return pa.table({
            "src": np.array([a[0] for a in arcs], np.int64),
            "dst": np.array([a[1] for a in arcs], np.int64),
        })

    c5 = [(i, (i + 1) % 5) for i in range(5)]
    assert count_isomorphisms(t(c5), 5, t(c5), 5, directed=True) == 5
    assert count_isomorphisms(t(c5), 5, t(c5), 5, directed=False) == 10
    p4 = [(0, 1), (1, 2), (2, 3)]
    assert count_isomorphisms(t(p4), 4, t(p4), 4, directed=False) == 2
    star = [(0, i) for i in range(1, 5)]
    assert count_isomorphisms(t(star), 5, t(star), 5,
                              directed=False) == math.factorial(4)
    # mappings are valid isomorphisms
    for m in get_isomorphisms(t(c5), 5, t(c5), 5, directed=True):
        mapped = {(int(m[a]), int(m[b])) for a, b in c5}
        assert mapped == set(c5)
    # vs networkx on random graphs
    import networkx as nx
    from networkx.algorithms.isomorphism import GraphMatcher

    rng = np.random.default_rng(3)
    for trial in range(3):
        n = 7
        pairs = [
            (a, b) for a in range(n) for b in range(a + 1, n)
            if rng.random() < 0.4
        ]
        arcs = pairs + [(b, a) for a, b in pairs]
        g = nx.Graph(pairs)
        g.add_nodes_from(range(n))
        want = sum(1 for _ in GraphMatcher(g, g).isomorphisms_iter())
        got = count_isomorphisms(t(arcs), n, t(arcs), n, directed=True)
        assert got == want, trial


def test_canonical_permutation_brute_force():
    """Canonical labeling == argmin over all labelings of the
    border-order adjacency code; ties counted (= |Aut|) and broken
    lexicographically — vs full permutation enumeration."""
    import itertools

    from xdata_igraph_ray.graph.isomorphism import _canon_search

    def brute(src, dst, n, directed):
        A = np.zeros((n, n), dtype=bool)
        A[src, dst] = True
        if not directed:
            A[dst, src] = True

        def code(lab):
            perm = np.empty(n, dtype=int)
            perm[lab] = np.arange(n)
            blocks = []
            for k in range(n):
                b = 0
                for i in range(k):
                    b = (b << 1) | bool(A[perm[i], perm[k]])
                b = (b << 1) | bool(A[perm[k], perm[k]])
                for j in range(k):
                    b = (b << 1) | bool(A[perm[k], perm[j]])
                blocks.append(b)
            return tuple(blocks)

        bestc, bestl, cnt = None, None, 0
        for p in itertools.permutations(range(n)):
            lab = np.array(p)
            c = code(lab)
            if bestc is None or c < bestc:
                bestc, bestl, cnt = c, lab, 1
            elif c == bestc:
                cnt += 1
                if lab.tolist() < bestl.tolist():
                    bestl = lab
        return bestc, bestl, cnt

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(2, 7))
        directed = bool(rng.integers(0, 2))
        m = int(rng.integers(0, n * (n - 1) + 1))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        e = pa.table({"src": src, "dst": dst})
        got = _canon_search(e, n, directed)
        want = brute(src, dst, n, directed)
        assert got[0] == want[0], trial
        assert got[1].tolist() == want[1].tolist(), trial
        assert got[2] == want[2], trial


def test_canonical_invariance_and_bliss_iso():
    from xdata_igraph_ray.graph.isomorphism import (
        automorphism_group_order,
        count_isomorphisms,
        isomorphic_bliss,
    )

    rng = np.random.default_rng(12)
    for trial in range(10):
        n = int(rng.integers(3, 10))
        directed = bool(rng.integers(0, 2))
        m = int(rng.integers(n, 3 * n))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        e1 = pa.table({"src": src, "dst": dst})
        p = rng.permutation(n)
        e2 = pa.table({"src": p[src], "dst": p[dst]})
        iso, m12 = isomorphic_bliss(e1, n, e2, n, directed)
        assert iso, trial
        s1 = set(zip(src.tolist(), dst.tolist()))
        s2 = set(zip(p[src].tolist(), p[dst].tolist()))
        if not directed:
            s1 |= {(b, a) for a, b in s1}
            s2 |= {(b, a) for a, b in s2}
        for a, b in s1:
            assert (int(m12[a]), int(m12[b])) in s2, trial
        assert automorphism_group_order(e1, n, directed) == \
            count_isomorphisms(e1, n, e1, n, directed), trial
    # non-isomorphic pair: same degree sequence, different structure
    # (C6 vs two triangles)
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    tt = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    e1 = pa.table({"src": np.array([a for a, _ in c6], dtype=np.int64),
                   "dst": np.array([b for _, b in c6], dtype=np.int64)})
    e2 = pa.table({"src": np.array([a for a, _ in tt], dtype=np.int64),
                   "dst": np.array([b for _, b in tt], dtype=np.int64)})
    iso, _ = isomorphic_bliss(e1, 6, e2, 6, directed=False)
    assert not iso


def test_automorphism_known_groups():
    import math

    from xdata_igraph_ray.graph.isomorphism import automorphism_group_order

    def ring(n):
        return pa.table({
            "src": np.arange(n, dtype=np.int64),
            "dst": (np.arange(n, dtype=np.int64) + 1) % n,
        })

    assert automorphism_group_order(ring(6), 6, directed=True) == 6
    assert automorphism_group_order(ring(6), 6, directed=False) == 12
    star = pa.table({"src": np.zeros(4, dtype=np.int64),
                     "dst": np.arange(1, 5, dtype=np.int64)})
    assert automorphism_group_order(star, 5, directed=False) == \
        math.factorial(4)
    full = pa.table({
        "src": np.repeat(np.arange(5), 5).astype(np.int64),
        "dst": np.tile(np.arange(5), 5).astype(np.int64),
    })
    assert automorphism_group_order(full, 5, directed=False) == \
        math.factorial(5)


def test_canonical_node_budget_guard():
    import pytest as _pytest

    from xdata_igraph_ray.graph.isomorphism import canonical_permutation

    full = pa.table({
        "src": np.repeat(np.arange(9), 9).astype(np.int64),
        "dst": np.tile(np.arange(9), 9).astype(np.int64),
    })
    with _pytest.raises(RuntimeError, match="node budget"):
        canonical_permutation(full, 9, directed=False, node_budget=1000)


def test_lad_domains_restrict_matches():
    import numpy as np
    from xdata_igraph_ray.graph.isomorphism import subisomorphic_lad
    # triangle pattern into K4
    pat = _tbl([0, 1, 2], [1, 2, 0])
    tgt = _tbl([0, 0, 0, 1, 1, 2], [1, 2, 3, 2, 3, 3])
    ok, m = subisomorphic_lad(pat, 3, tgt, 4)
    assert ok and len(set(m.tolist())) == 3
    # domain pinning vertex 0 of the pattern to target vertex 3
    ok, m = subisomorphic_lad(pat, 3, tgt, 4, domains=[[3], [0, 1, 2, 3],
                                                       [0, 1, 2, 3]])
    assert ok and m[0] == 3
    # empty effective domain -> no match
    ok, m = subisomorphic_lad(pat, 3, tgt, 4, domains=[[], [0], [1]])
    assert not ok and m is None


def test_lad_induced_semantics():
    from xdata_igraph_ray.graph.isomorphism import subisomorphic_lad
    # path 0-1-2 induced into a triangle: impossible (extra edge)
    path = _tbl([0, 1], [1, 2])
    tri = _tbl([0, 1, 2], [1, 2, 0])
    ok, _ = subisomorphic_lad(path, 3, tri, 3, induced=True)
    assert not ok
    ok, _ = subisomorphic_lad(path, 3, tri, 3, induced=False)
    assert ok
    # induced path in a 4-cycle exists
    c4 = _tbl([0, 1, 2, 3], [1, 2, 3, 0])
    ok, m = subisomorphic_lad(path, 3, c4, 4, induced=True)
    assert ok


def test_lad_all_maps_count():
    from xdata_igraph_ray.graph.isomorphism import subisomorphic_lad
    # triangle into K4: 4 choose 3 triangles x 3! orientations = 24
    pat = _tbl([0, 1, 2], [1, 2, 0])
    tgt = _tbl([0, 0, 0, 1, 1, 2], [1, 2, 3, 2, 3, 3])
    ok, maps = subisomorphic_lad(pat, 3, tgt, 4, all_maps=True)
    assert ok and len(maps) == 24
    seen = {tuple(m.tolist()) for m in maps}
    assert len(seen) == 24


def test_lad_agrees_with_vf2_random():
    import numpy as np
    from xdata_igraph_ray.graph.isomorphism import (subisomorphic,
                                                    subisomorphic_lad)
    rng = np.random.default_rng(7)
    for trial in range(15):
        # random undirected pattern/target as symmetric tables
        def rnd(n, m):
            s = rng.integers(0, n, m)
            d = rng.integers(0, n, m)
            keep = s != d
            pairs = sorted({(min(a, b), max(a, b))
                            for a, b in zip(s[keep], d[keep])})
            return _tbl([p[0] for p in pairs] + [p[1] for p in pairs],
                      [p[1] for p in pairs] + [p[0] for p in pairs])
        pat = rnd(4, 5)
        tgt = rnd(7, 14)
        want = subisomorphic(pat, 4, tgt, 7, directed=True)
        got, _ = subisomorphic_lad(pat, 4, tgt, 7)
        assert got == want, trial
