"""Deterministic seeded graph generators (reference src/games.c,
src/structure_generators.c) — the fixture machinery of SURVEY.md §2.10.

All return a ``pyarrow.Table`` edge list (src, dst); wrap with
``ray.data.from_arrow`` / ``GraphEngine.from_edges`` as needed.  Every
generator is a pure function of its arguments + seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _table(src, dst) -> pa.Table:
    return pa.table(
        {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
    )


def erdos_renyi_gnm(n: int, m: int, directed: bool = True, seed: int = 42,
                    loops: bool = False) -> pa.Table:
    """G(n,m) — igraph_erdos_renyi_game GNM (src/games.c:649)."""
    rng = np.random.default_rng(seed)
    picked: set = set()
    src_l, dst_l = [], []
    while len(src_l) < m:
        k = m - len(src_l)
        a = rng.integers(0, n, 2 * k + 8)
        b = rng.integers(0, n, 2 * k + 8)
        for x, y in zip(a, b):
            if not loops and x == y:
                continue
            key = (x, y) if directed else (min(x, y), max(x, y))
            if key in picked:
                continue
            picked.add(key)
            src_l.append(int(x))
            dst_l.append(int(y))
            if len(src_l) == m:
                break
    return _table(src_l, dst_l)


def erdos_renyi_gnp(n: int, p: float, directed: bool = True,
                    seed: int = 42) -> pa.Table:
    """G(n,p) — geometric-skip sampling (src/games.c:557)."""
    rng = np.random.default_rng(seed)
    total = n * n if directed else n * (n - 1) // 2
    # geometric skips over the linearized pair index
    idx = []
    pos = -1
    while True:
        step = rng.geometric(p)
        pos += step
        if pos >= total:
            break
        idx.append(pos)
    idx = np.array(idx, dtype=np.int64)
    if directed:
        src, dst = idx // n, idx % n
        keep = src != dst
        return _table(src[keep], dst[keep])
    # undirected upper triangle unrank
    src = np.empty(len(idx), np.int64)
    dst = np.empty(len(idx), np.int64)
    for k, x in enumerate(idx):
        i = int(n - 2 - np.floor(
            (np.sqrt(4 * n * (n - 1) - 8 * x - 7) - 1) / 2
        ))
        j = int(x - i * (2 * n - i - 1) // 2 + i + 1)
        src[k], dst[k] = i, j
    return _table(src, dst)


def barabasi(n: int, m: int = 2, seed: int = 42) -> pa.Table:
    """Preferential attachment, Batagelj-Brandes linear construction
    (igraph_barabasi_game analog, src/games.c:473)."""
    rng = np.random.default_rng(seed)
    M = np.zeros(2 * n * m, dtype=np.int64)
    for v in range(n):
        for j in range(m):
            k = 2 * (v * m + j)
            M[k] = v
            M[k + 1] = M[rng.integers(0, k + 1)] if k > 0 else v
    src = M[0::2][m:]  # skip the self-ish seed rows of vertex 0
    dst = M[1::2][m:]
    keep = src != dst
    return _table(src[keep], dst[keep])


def sbm(block_sizes, p_in: float, p_out: float, seed: int = 42) -> pa.Table:
    """Planted-partition stochastic block model, symmetric edges
    (igraph_sbm_game analog, src/sbm.c:71)."""
    rng = np.random.default_rng(seed)
    sizes = np.asarray(block_sizes)
    n = int(sizes.sum())
    member = np.repeat(np.arange(len(sizes)), sizes)
    iu, ju = np.triu_indices(n, k=1)
    p = np.where(member[iu] == member[ju], p_in, p_out)
    keep = rng.random(len(iu)) < p
    a, b = iu[keep], ju[keep]
    return _table(np.concatenate((a, b)), np.concatenate((b, a)))


def watts_strogatz(size: int, nei: int = 2, p: float = 0.05,
                   seed: int = 42) -> pa.Table:
    """Ring lattice + rewiring (igraph_watts_strogatz_game,
    src/games.c:2928); undirected edges stored canonically once."""
    rng = np.random.default_rng(seed)
    src_l, dst_l = [], []
    existing = set()
    for v in range(size):
        for k in range(1, nei + 1):
            w = (v + k) % size
            if rng.random() < p:
                for _ in range(10):
                    cand = int(rng.integers(0, size))
                    key = (min(v, cand), max(v, cand))
                    if cand != v and key not in existing:
                        w = cand
                        break
            key = (min(v, w), max(v, w))
            if key not in existing:
                existing.add(key)
                src_l.append(key[0])
                dst_l.append(key[1])
    return _table(src_l, dst_l)


def ring(n: int, directed: bool = False) -> pa.Table:
    """igraph_ring (src/structure_generators.c)."""
    src = np.arange(n, dtype=np.int64)
    dst = (src + 1) % n
    return _table(src, dst)


def star(n: int, mode: str = "out") -> pa.Table:
    """igraph_star: center 0."""
    others = np.arange(1, n, dtype=np.int64)
    center = np.zeros(n - 1, dtype=np.int64)
    if mode == "out":
        return _table(center, others)
    return _table(others, center)


def full(n: int, directed: bool = False, loops: bool = False) -> pa.Table:
    """igraph_full."""
    if directed:
        a, b = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        src, dst = a.ravel(), b.ravel()
        if not loops:
            keep = src != dst
            src, dst = src[keep], dst[keep]
        return _table(src, dst)
    iu, ju = np.triu_indices(n, k=0 if loops else 1)
    return _table(iu, ju)


def lattice(rows: int, cols: int) -> pa.Table:
    """2-D grid, undirected canonical edges (igraph_lattice)."""
    v = np.arange(rows * cols).reshape(rows, cols)
    right = np.stack((v[:, :-1].ravel(), v[:, 1:].ravel()), axis=1)
    down = np.stack((v[:-1, :].ravel(), v[1:, :].ravel()), axis=1)
    e = np.concatenate((right, down))
    return _table(e[:, 0], e[:, 1])


def kary_tree(n: int, children: int = 2) -> pa.Table:
    """igraph_tree: root 0, edges parent->child."""
    child = np.arange(1, n, dtype=np.int64)
    parent = (child - 1) // children
    return _table(parent, child)


def degree_sequence(out_deg, in_deg=None, seed: int = 42) -> pa.Table:
    """Configuration-model graph with the given degree sequence(s) —
    igraph_degree_sequence_game SIMPLE method (src/games.c:1249):
    random stub matching; multi-edges and loops may appear."""
    rng = np.random.default_rng(seed)
    out_deg = np.asarray(out_deg, np.int64)
    if in_deg is None:  # undirected: one stub pool, paired off
        if out_deg.sum() % 2:
            raise ValueError("sum of degrees must be even")
        stubs = np.repeat(np.arange(len(out_deg)), out_deg)
        rng.shuffle(stubs)
        half = len(stubs) // 2
        return _table(stubs[:half], stubs[half:])
    in_deg = np.asarray(in_deg, np.int64)
    if out_deg.sum() != in_deg.sum():
        raise ValueError("sum(out) must equal sum(in)")
    outs = np.repeat(np.arange(len(out_deg)), out_deg)
    ins = np.repeat(np.arange(len(in_deg)), in_deg)
    rng.shuffle(ins)
    return _table(outs, ins)


def static_fitness(m: int, fitness_out, fitness_in=None,
                   seed: int = 42) -> pa.Table:
    """m edges drawn with endpoint probability proportional to vertex
    fitness — igraph_static_fitness_game (src/games.c:3507); loops and
    multi-edges dropped (the reference's default)."""
    rng = np.random.default_rng(seed)
    fo = np.asarray(fitness_out, np.float64)
    fi = fo if fitness_in is None else np.asarray(fitness_in, np.float64)
    po = fo / fo.sum()
    pi = fi / fi.sum()
    picked: set = set()
    src_l, dst_l = [], []
    tries = 0
    while len(src_l) < m and tries < 100:
        k = m - len(src_l)
        a = rng.choice(len(po), 2 * k + 8, p=po)
        b = rng.choice(len(pi), 2 * k + 8, p=pi)
        for x, y in zip(a, b):
            if x == y or (x, y) in picked:
                continue
            picked.add((int(x), int(y)))
            src_l.append(int(x))
            dst_l.append(int(y))
            if len(src_l) == m:
                break
        tries += 1
    return _table(src_l, dst_l)


def static_power_law(n: int, m: int, exponent_out: float,
                     exponent_in: float | None = None,
                     seed: int = 42) -> pa.Table:
    """Prescribed-exponent power-law degree graph —
    igraph_static_power_law_game (src/games.c:3731): fitness
    f_i = (i + i0)^(-1/(exp-1)) fed to the static fitness game."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    fo = ranks ** (-1.0 / (exponent_out - 1.0))
    fi = (
        None if exponent_in is None
        else ranks ** (-1.0 / (exponent_in - 1.0))
    )
    return static_fitness(m, fo, fi, seed=seed)


def k_regular(n: int, k: int, seed: int = 42,
              max_tries: int = 100) -> pa.Table:
    """Simple undirected k-regular graph — igraph_k_regular_game
    (src/games.c:3839): repeated stub matching until simple."""
    if (n * k) % 2:
        raise ValueError("n * k must be even")
    rng = np.random.default_rng(seed)
    for _ in range(max_tries):
        stubs = np.repeat(np.arange(n), k)
        rng.shuffle(stubs)
        a, b = stubs[::2], stubs[1::2]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        if (a == b).any():
            continue
        pairs = set(zip(lo.tolist(), hi.tolist()))
        if len(pairs) == len(a):
            return _table(lo, hi)
    raise RuntimeError("k_regular: no simple matching found")


def grg(n: int, radius: float, seed: int = 42,
        torus: bool = False) -> pa.Table:
    """Geometric random graph on the unit square — igraph_grg_game
    (src/games.c:2024): connect points within ``radius``.  Spatial
    cell binning keeps candidate pairs near-linear."""
    rng = np.random.default_rng(seed)
    x = rng.random(n)
    y = rng.random(n)
    cell = max(radius, 1e-9)
    ncell = max(1, int(1.0 / cell))
    cx = np.minimum((x / cell).astype(np.int64), ncell - 1)
    cy = np.minimum((y / cell).astype(np.int64), ncell - 1)
    cid = cx * ncell + cy
    order = np.argsort(cid, kind="stable")
    src_l, dst_l = [], []
    by_cell: dict[int, np.ndarray] = {}
    for c in np.unique(cid):
        by_cell[int(c)] = order[np.searchsorted(cid[order], c):
                                np.searchsorted(cid[order], c, "right")]
    r2 = radius * radius
    for c, members in by_cell.items():
        gx, gy = divmod(c, ncell)
        cands = [members]
        for dx_ in (0, 1):
            for dy_ in (-1, 0, 1):
                if (dx_, dy_) <= (0, 0):
                    continue
                nx_, ny_ = gx + dx_, gy + dy_
                if torus:
                    nx_, ny_ = nx_ % ncell, ny_ % ncell
                elif nx_ >= ncell or ny_ < 0 or ny_ >= ncell:
                    continue
                nb = by_cell.get(int(nx_ * ncell + ny_))
                if nb is not None:
                    cands.append(nb)
        mem = members
        for grp_i, other in enumerate(cands):
            if grp_i == 0:
                iu, ju = np.triu_indices(len(mem), k=1)
                a, b = mem[iu], mem[ju]
            else:
                a = np.repeat(mem, len(other))
                b = np.tile(other, len(mem))
            dx = x[a] - x[b]
            dy = y[a] - y[b]
            if torus:
                dx = np.minimum(np.abs(dx), 1 - np.abs(dx))
                dy = np.minimum(np.abs(dy), 1 - np.abs(dy))
            hit = dx * dx + dy * dy <= r2
            src_l.append(np.minimum(a[hit], b[hit]))
            dst_l.append(np.maximum(a[hit], b[hit]))
    if not src_l:
        return _table([], [])
    return _table(np.concatenate(src_l), np.concatenate(dst_l))


def preference(type_sizes, pref_matrix, seed: int = 42) -> pa.Table:
    """Vertex-type preference game — igraph_preference_game
    (src/games.c:2193): block (i, j) is Bernoulli(pref[i][j]) per
    pair, i.e. a general SBM."""
    rng = np.random.default_rng(seed)
    sizes = np.asarray(type_sizes, np.int64)
    offs = np.concatenate(([0], np.cumsum(sizes)))
    pref = np.asarray(pref_matrix, np.float64)
    src_l, dst_l = [], []
    for i in range(len(sizes)):
        for j in range(len(sizes)):
            p = pref[i, j]
            if p <= 0:
                continue
            ni, nj = sizes[i], sizes[j]
            mask = rng.random((ni, nj)) < p
            if i == j:  # undirected within-block, no loops
                mask = np.triu(mask, k=1)
            elif i > j:
                continue  # undirected: handle each unordered pair once
            a, b = np.nonzero(mask)
            src_l.append(a + offs[i])
            dst_l.append(b + offs[j])
    if not src_l:
        return _table([], [])
    return _table(np.concatenate(src_l), np.concatenate(dst_l))


def islands(n_islands: int, size: int, p_in: float, n_inter: int,
            seed: int = 42) -> pa.Table:
    """Dense islands + random inter-island bridges —
    igraph_simple_interconnected_islands_game (src/games.c:3329)."""
    rng = np.random.default_rng(seed)
    src_l, dst_l = [], []
    for i in range(n_islands):
        off = i * size
        mask = np.triu(rng.random((size, size)) < p_in, k=1)
        a, b = np.nonzero(mask)
        src_l.append(a + off)
        dst_l.append(b + off)
    for i in range(n_islands):
        for j in range(i + 1, n_islands):
            a = rng.integers(0, size, n_inter) + i * size
            b = rng.integers(0, size, n_inter) + j * size
            src_l.append(a)
            dst_l.append(b)
    return _table(np.concatenate(src_l), np.concatenate(dst_l))


_FAMOUS = {
    # igraph_famous (src/structure_generators.c / atlas data): a few
    # canonical named graphs, undirected edge lists
    "bull": [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4)],
    "petersen": [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 0),
        (5, 7), (7, 9), (9, 6), (6, 8), (8, 5),
        (0, 5), (1, 6), (2, 7), (3, 8), (4, 9),
    ],
    "cubical": [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    "zachary": [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
        (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
        (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
        (1, 21), (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13),
        (2, 27), (2, 28), (2, 32), (3, 7), (3, 12), (3, 13), (4, 6),
        (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
        (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
        (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
        (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32),
        (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
        (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
        (30, 32), (30, 33), (31, 32), (31, 33), (32, 33),
    ],
}


def famous(name: str) -> pa.Table:
    """Named canonical graphs (igraph_famous) — bull, petersen,
    cubical, zachary."""
    try:
        edges = _FAMOUS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown famous graph {name!r}; have {sorted(_FAMOUS)}"
        ) from None
    return _table([a for a, _ in edges], [b for _, b in edges])


def hsbm(n_clusters: int, m: int, rho, C, p_out: float,
         seed: int = 42) -> pa.Table:
    """Hierarchical stochastic block model (igraph_hsbm_game,
    src/sbm.c:243): ``n_clusters`` clusters of ``m`` vertices; within
    a cluster the vertices split into blocks by proportions ``rho``
    with Bernoulli block matrix ``C``; any inter-cluster pair is
    Bernoulli(``p_out``).  Undirected, symmetric edges (sbm
    conventions above)."""
    rng = np.random.default_rng(seed)
    rho = np.asarray(rho, np.float64)
    C = np.asarray(C, np.float64)
    if abs(float(rho.sum()) - 1.0) > 1e-9:
        raise ValueError("hsbm: rho must sum to 1")
    sizes = np.round(rho * m).astype(np.int64)
    sizes[-1] = m - sizes[:-1].sum()
    if (sizes < 0).any() or sizes.sum() != m:
        raise ValueError("hsbm: rho does not partition the cluster size")
    block_of = np.repeat(np.arange(len(sizes)), sizes)
    n = n_clusters * m
    cluster = np.arange(n) // m
    block = np.tile(block_of, n_clusters)
    iu, ju = np.triu_indices(n, k=1)
    same = cluster[iu] == cluster[ju]
    p = np.where(same, C[block[iu], block[ju]], p_out)
    keep = rng.random(len(iu)) < p
    a, b = iu[keep], ju[keep]
    return _table(np.concatenate((a, b)), np.concatenate((b, a)))


def hsbm_list(mlist, rholist, Clist, p_out: float,
              seed: int = 42) -> pa.Table:
    """General hierarchical SBM (igraph_hsbm_list_game,
    src/sbm.c:417): per-cluster sizes ``mlist`` with per-cluster block
    proportions ``rholist[i]`` and Bernoulli block matrices
    ``Clist[i]``; vertices in different clusters connect with
    Bernoulli(``p_out``).  Undirected, both arcs emitted (sbm
    conventions above); reference validation mirrored (rho sums to 1,
    C symmetric in [0,1], m >= 1)."""
    rng = np.random.default_rng(seed)
    mlist = np.asarray(mlist, np.int64)
    if len(mlist) == 0 or len(rholist) != len(mlist) or len(Clist) != len(mlist):
        raise ValueError("hsbm_list: mlist/rholist/Clist lengths differ")
    if (mlist < 1).any():
        raise ValueError("hsbm_list: every m must be positive")
    if not (0.0 <= p_out <= 1.0):
        raise ValueError("hsbm_list: p_out must be a probability")
    blocks = []
    for m, rho, C in zip(mlist, rholist, Clist):
        rho = np.asarray(rho, np.float64)
        C = np.asarray(C, np.float64)
        if abs(float(rho.sum()) - 1.0) > 1e-7:
            raise ValueError("hsbm_list: each rho must sum to 1")
        if C.shape != (len(rho), len(rho)) or not np.allclose(C, C.T):
            raise ValueError("hsbm_list: C must be symmetric, rho-sized")
        if C.min() < 0 or C.max() > 1:
            raise ValueError("hsbm_list: C entries must be in [0, 1]")
        sizes = np.round(rho * m).astype(np.int64)
        sizes[-1] = m - sizes[:-1].sum()
        if (sizes < 0).any() or sizes.sum() != m:
            raise ValueError("hsbm_list: rho does not partition m")
        blocks.append(np.repeat(np.arange(len(sizes)), sizes))
    n = int(mlist.sum())
    cluster = np.repeat(np.arange(len(mlist)), mlist)
    block = np.concatenate(blocks)
    iu, ju = np.triu_indices(n, k=1)
    p = np.full(len(iu), float(p_out))
    for ci, C in enumerate(Clist):
        C = np.asarray(C, np.float64)
        same = (cluster[iu] == ci) & (cluster[ju] == ci)
        p[same] = C[block[iu[same]], block[ju[same]]]
    keep = rng.random(len(iu)) < p
    a, b = iu[keep], ju[keep]
    return _table(np.concatenate((a, b)), np.concatenate((b, a)))


def atlas(number: int) -> pa.Table:
    """Graph number ``number`` from Read & Wilson's *An Atlas of
    Graphs* (igraph_atlas, src/atlas.c:62).  The reference's embedded
    edge table (src/atlas-edges.h) was itself "converted from the
    NetworkX software package" (src/atlas.c:46-47), so the bundled
    networkx atlas IS the same public dataset; we read it through
    networkx rather than vendoring the 1253-graph table.  Undirected:
    each edge emitted in both directions (sbm/famous conventions)."""
    try:
        import networkx as nx
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "atlas() needs networkx (the atlas data source)"
        ) from exc
    if number < 0 or number > 1252:
        raise ValueError("atlas number out of range [0, 1252]")
    g = nx.graph_atlas(number)
    a = np.array([e[0] for e in g.edges()], np.int64)
    b = np.array([e[1] for e in g.edges()], np.int64)
    return _table(np.concatenate((a, b)), np.concatenate((b, a)))


def is_degree_sequence(out_degrees, in_degrees=None) -> bool:
    """igraph_is_degree_sequence (src/structural_properties.c):
    non-negative; undirected -> even sum; directed -> equal lengths
    and equal in/out sums."""
    out = np.asarray(out_degrees, np.int64)
    if len(out) and out.min() < 0:
        return False
    if in_degrees is None:
        return int(out.sum()) % 2 == 0
    ind = np.asarray(in_degrees, np.int64)
    if len(ind) and ind.min() < 0:
        return False
    return len(out) == len(ind) and int(out.sum()) == int(ind.sum())


def is_graphical_degree_sequence(out_degrees, in_degrees=None) -> bool:
    """igraph_is_graphical_degree_sequence
    (src/structural_properties.c; Hakimi 1962 / Erdos-Miklos-Toroczkai
    2010).  Pinned equivalent theorems instead of the reference's
    Havel-Hakimi-style iteration: the Erdos-Gallai inequalities for
    the undirected case and Fulkerson-Chen-Anstee for the directed
    case — identical verdicts, vectorized."""
    if not is_degree_sequence(out_degrees, in_degrees):
        return False
    out = np.asarray(out_degrees, np.int64)
    n = len(out)
    if n == 0:
        return True
    if in_degrees is None:
        d = np.sort(out)[::-1]
        if d[0] >= n:
            return False
        pre = np.cumsum(d)
        ks = np.arange(1, n + 1)
        # sum_{i>k} min(d_i, k) for each k
        rhs_tail = np.array([
            np.minimum(d[k:], k).sum() for k in ks
        ])
        return bool(np.all(pre <= ks * (ks - 1) + rhs_tail))
    ind = np.asarray(in_degrees, np.int64)
    if len(out) and (out.max() >= n or ind.max() >= n):
        return False
    # FCA: sort pairs by (out, in) non-increasing lexicographic
    order = np.lexsort((-ind, -out))
    o, i_ = out[order], ind[order]
    for k in range(1, n + 1):
        lhs = int(o[:k].sum())
        rhs = int(np.minimum(i_[:k], k - 1).sum()) \
            + int(np.minimum(i_[k:], k).sum())
        if lhs > rhs:
            return False
    return True


# -- xdata latent-position samplers + RDPG / correlated games ----------------
# (ref src/dotproduct.c, src/games.c:3867-4116 — the generators paired
# with the ASE/LSE spectral embedding in the xdata workflow.  RNG
# divergence is pinned like every generator here: seeded numpy streams
# replace igraph's RNG; all distributional semantics mirrored.)


def sample_sphere_surface(dim: int, n: int, radius: float = 1.0,
                          positive: bool = False,
                          seed: int = 42) -> np.ndarray:
    """(n, dim) points uniform on the sphere surface
    (igraph_sample_sphere_surface, src/dotproduct.c:131-173: normal
    deviates normalized to ``radius``; ``positive`` folds into the
    positive orthant)."""
    if dim < 2:
        raise ValueError("sphere must be at least two dimensional")
    if radius <= 0:
        raise ValueError("sphere radius must be positive")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v *= radius / np.linalg.norm(v, axis=1, keepdims=True)
    return np.abs(v) if positive else v


def sample_sphere_volume(dim: int, n: int, radius: float = 1.0,
                         positive: bool = False,
                         seed: int = 42) -> np.ndarray:
    """(n, dim) points uniform in the ball
    (igraph_sample_sphere_volume, src/dotproduct.c:199-221: surface
    sample scaled by U^(1/dim))."""
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v *= radius / np.linalg.norm(v, axis=1, keepdims=True)
    if positive:
        v = np.abs(v)
    u = rng.random((n, 1)) ** (1.0 / dim)
    return v * u


def sample_dirichlet(n: int, alpha, seed: int = 42) -> np.ndarray:
    """(n, len(alpha)) Dirichlet samples (igraph_sample_dirichlet,
    src/dotproduct.c:244-276)."""
    alpha = np.asarray(alpha, dtype=np.float64)
    if len(alpha) < 2:
        raise ValueError("Dirichlet parameter vector too short")
    if alpha.min() <= 0:
        raise ValueError("Dirichlet concentration parameters must be "
                         "positive")
    rng = np.random.default_rng(seed)
    return rng.dirichlet(alpha, size=n)


def dot_product_game(vecs: np.ndarray, directed: bool = True,
                     seed: int = 42, block: int = 2048) -> pa.Table:
    """Random dot-product graph (igraph_dot_product_game,
    src/dotproduct.c:59-106): P(i->j) = <vec_i, vec_j>; negative dot
    products never add an edge, dot products > 1 always do (the
    reference warns once for each; we do too).  ``vecs`` is (n, dim)
    row-per-vertex.  Pair evaluation is blocked numpy matmul —
    O(n^2 dim) like the reference, vectorized."""
    import logging

    vecs = np.asarray(vecs, dtype=np.float64)
    n = vecs.shape[0]
    rng = np.random.default_rng(seed)
    log = logging.getLogger(__name__)
    warned_neg = warned_big = False
    src_l, dst_l = [], []
    for i0 in range(0, n, block):
        hi = min(i0 + block, n)
        P = vecs[i0:hi] @ vecs.T          # (blk, n)
        if not warned_neg and (P < 0).any():
            warned_neg = True
            log.warning("Negative connection probability in "
                        "dot-product graph")
        if not warned_big and (P > 1).any():
            warned_big = True
            log.warning("Greater than 1 connection probability in "
                        "dot-product graph")
        U = rng.random(P.shape)
        hit = U < P                        # P>1 always hits, P<0 never
        ii, jj = np.nonzero(hit)
        ii = ii + i0
        keep = ii != jj if directed else ii < jj
        src_l.append(ii[keep])
        dst_l.append(jj[keep])
    return _table(np.concatenate(src_l) if src_l else [],
                  np.concatenate(dst_l) if dst_l else [])


def correlated_game(edges: pa.Table, n: int, corr: float, p: float,
                    directed: bool = True, seed: int = 42,
                    permutation=None) -> pa.Table:
    """Correlated G(n,p) companion of an existing graph
    (igraph_correlated_game, src/games.c:3889): keep each edge of the
    input with probability q = p + corr*(1-p), add each non-adjacent
    pair with probability (1-q)*p/(1-p), so the result has marginal
    density p and indicator correlation ``corr`` with the input.
    The reference realizes the same Bernoulli process with geometric
    skips; we draw per-edge uniforms and rejection-sample the
    additions — identical distribution, different RNG stream (pinned
    divergence).  ``permutation`` relabels the output vertices."""
    if not -1 <= corr <= 1:
        raise ValueError("correlation must be in [-1,1]")
    if not 0 < p < 1:
        raise ValueError("edge probability must be in (0,1)")
    rng = np.random.default_rng(seed)
    src = edges["src"].to_numpy().astype(np.int64)
    dst = edges["dst"].to_numpy().astype(np.int64)
    if corr == 0:
        out = erdos_renyi_gnp(n, p, directed=directed, seed=seed)
        src2, dst2 = (out["src"].to_numpy().copy(),
                      out["dst"].to_numpy().copy())
    elif corr == 1:
        src2, dst2 = src.copy(), dst.copy()
    else:
        q = p + corr * (1 - p)
        p_del = 1 - q
        p_add = (1 - q) * (p / (1 - p))
        keep = rng.random(len(src)) >= p_del
        if directed:
            existing = set(zip(src.tolist(), dst.tolist()))
            total_missing = n * (n - 1) - len(existing)
        else:
            existing = set(
                zip(np.minimum(src, dst).tolist(),
                    np.maximum(src, dst).tolist())
            )
            total_missing = n * (n - 1) // 2 - len(existing)
        n_add = rng.binomial(total_missing, p_add) if p_add > 0 else 0
        add_pairs: set = set()
        while len(add_pairs) < n_add:
            k = n_add - len(add_pairs)
            a = rng.integers(0, n, 2 * k + 8)
            b = rng.integers(0, n, 2 * k + 8)
            for x, y in zip(a.tolist(), b.tolist()):
                if x == y:
                    continue
                key = (x, y) if directed else (min(x, y), max(x, y))
                if key in existing or key in add_pairs:
                    continue
                add_pairs.add(key)
                if len(add_pairs) == n_add:
                    break
        aa = np.array([a for a, _ in sorted(add_pairs)], dtype=np.int64)
        bb = np.array([b for _, b in sorted(add_pairs)], dtype=np.int64)
        src2 = np.concatenate([src[keep], aa])
        dst2 = np.concatenate([dst[keep], bb])
    if permutation is not None:
        perm = np.asarray(permutation, dtype=np.int64)
        if len(perm) != n:
            raise ValueError("invalid permutation length")
        src2, dst2 = perm[src2], perm[dst2]
    return _table(src2, dst2)


def correlated_pair_game(n: int, corr: float, p: float,
                         directed: bool = True, seed: int = 42,
                         permutation=None) -> tuple[pa.Table, pa.Table]:
    """(g1, g2) correlated G(n,p) pair (igraph_correlated_pair_game,
    src/games.c:4103-4116: one G(n,p) draw + correlated_game)."""
    g1 = erdos_renyi_gnp(n, p, directed=directed, seed=seed)
    g2 = correlated_game(g1, n, corr, p, directed=directed,
                         seed=seed + 1, permutation=permutation)
    return g1, g2


# -- deterministic constructors (src/structure_generators.c) -----------------


def adjacency(mat, mode: str = "directed") -> pa.Table:
    """Graph from a dense adjacency matrix (igraph_adjacency,
    src/structure_generators.c:264): entry = edge MULTIPLICITY.
    Modes: directed / max (= undirected) / min / plus / upper /
    lower — plus uses the full matrix as undirected multiplicities
    (A_ij + A_ji between distinct i,j; A_ii loops), exactly this
    fork's dispatch (ADJ_PLUS -> the directed collector,
    :295-297)."""
    mat = np.asarray(mat)
    n = mat.shape[0]
    if mat.shape[0] != mat.shape[1]:
        raise ValueError("non-square matrix")
    M = np.rint(mat).astype(np.int64)
    src_l, dst_l = [], []

    def emit(i, j, k):
        src_l.extend([i] * k)
        dst_l.extend([j] * k)

    if mode in ("directed", "plus"):
        for i in range(n):
            for j in range(n):
                emit(i, j, int(M[i, j]))
    elif mode in ("max", "undirected"):
        for i in range(n):
            for j in range(i, n):
                emit(i, j, int(max(M[i, j], M[j, i])))
    elif mode == "min":
        for i in range(n):
            for j in range(i, n):
                emit(i, j, int(min(M[i, j], M[j, i])))
    elif mode == "upper":
        for i in range(n):
            for j in range(i, n):
                emit(i, j, int(M[i, j]))
    elif mode == "lower":
        for i in range(n):
            for j in range(i + 1):
                emit(i, j, int(M[i, j]))
    else:
        raise ValueError(f"unknown adjacency mode {mode!r}")
    return _table(src_l, dst_l)


def weighted_adjacency(mat, mode: str = "directed",
                       loops: bool = True) -> pa.Table:
    """(src, dst, weight) from a weighted adjacency matrix
    (igraph_weighted_adjacency, src/structure_generators.c:333-530):
    one edge per nonzero combined entry; ``plus`` sums both halves
    and HALVES the diagonal; ``loops=False`` drops the diagonal."""
    mat = np.asarray(mat, dtype=np.float64)
    n = mat.shape[0]
    if mat.shape[0] != mat.shape[1]:
        raise ValueError("non-square matrix")
    src_l, dst_l, w_l = [], [], []

    def emit(i, j, w):
        if w == 0.0 or (i == j and not loops):
            return
        src_l.append(i)
        dst_l.append(j)
        w_l.append(w)

    if mode == "directed":
        for i in range(n):
            for j in range(n):
                emit(i, j, mat[i, j])
    elif mode in ("max", "undirected"):
        for i in range(n):
            for j in range(i, n):
                emit(i, j, max(mat[i, j], mat[j, i]))
    elif mode == "min":
        for i in range(n):
            for j in range(i, n):
                emit(i, j, min(mat[i, j], mat[j, i]))
    elif mode == "plus":
        for i in range(n):
            for j in range(i, n):
                w = mat[i, j] + mat[j, i]
                emit(i, j, w / 2 if i == j else w)
    elif mode == "upper":
        for i in range(n):
            for j in range(i, n):
                emit(i, j, mat[i, j])
    elif mode == "lower":
        for i in range(n):
            for j in range(i + 1):
                emit(i, j, mat[i, j])
    else:
        raise ValueError(f"unknown adjacency mode {mode!r}")
    return pa.table({
        "src": np.asarray(src_l, np.int64),
        "dst": np.asarray(dst_l, np.int64),
        "weight": np.asarray(w_l, np.float64),
    })


def full_citation(n: int) -> pa.Table:
    """Every vertex cites all lower-id vertices: edges (i, j) for
    j < i (igraph_full_citation,
    src/structure_generators.c:1077)."""
    i = np.repeat(np.arange(n, dtype=np.int64),
                  np.arange(n, dtype=np.int64))
    j = np.concatenate([np.arange(k, dtype=np.int64)
                        for k in range(n)]) if n else np.empty(0, np.int64)
    return _table(i, j)


def extended_chordal_ring(nodes: int, W) -> pa.Table:
    """Ring 0-1-...-(n-1)-0 plus chords i -> i+W[j, i%period] when
    the target stays < n (igraph_extended_chordal_ring,
    src/structure_generators.c:1187 — NOTE the reference adds a
    chord only when i+offset < nodes, no wraparound; mirrored)."""
    W = np.asarray(W, dtype=np.int64).reshape(len(np.asarray(W)), -1)
    period = W.shape[1]
    if nodes < 3:
        raise ValueError("at least 3 nodes needed")
    if nodes % period != 0:
        raise ValueError("period must divide the number of nodes")
    src_l = list(range(nodes - 1)) + [0]
    dst_l = list(range(1, nodes)) + [nodes - 1]
    mpos = 0
    for i in range(nodes):
        for j in range(W.shape[0]):
            off = int(W[j, mpos])
            if i + off < nodes:
                src_l.append(i)
                dst_l.append(i + off)
        mpos = (mpos + 1) % period
    return _table(src_l, dst_l)


def connect_neighborhood(edges: pa.Table, n: int, order: int = 2,
                         mode: str = "all") -> pa.Table:
    """Add an edge to every vertex within ``order`` hops
    (igraph_connect_neighborhood, src/structural_generators.c:1267;
    undirected inputs force mode='all').  Output: original arcs plus
    one (v, u) arc per newly reachable u at hops 2..order —
    deduplicated per source like the reference's 'added' marker."""
    from collections import deque as _dq

    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    out_adj: list[list[int]] = [[] for _ in range(n)]
    in_adj: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(src.tolist(), dst.tolist()):
        out_adj[a].append(b)
        in_adj[b].append(a)
    nbrs = {"out": lambda v: out_adj[v], "in": lambda v: in_adj[v],
            "all": lambda v: out_adj[v] + in_adj[v]}[mode]
    new_s, new_d = [], []
    for v in range(n):
        dist = {v: 0}
        q = _dq([v])
        while q:
            x = q.popleft()
            if dist[x] >= order:
                continue
            for y in nbrs(x):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
                    if dist[y] >= 2:
                        new_s.append(v)
                        new_d.append(y)
    return _table(np.concatenate([src, np.asarray(new_s, np.int64)]),
                  np.concatenate([dst, np.asarray(new_d, np.int64)]))


def de_bruijn(m: int, n: int) -> pa.Table:
    """De Bruijn graph B(m, n): m^n vertices (strings of length n
    over m symbols), arcs i -> (i*m) % m^n + j (igraph_de_bruijn,
    src/structure_generators.c:1400).  n=0 -> one vertex with m
    loops; m=0 -> empty."""
    if m < 0 or n < 0:
        raise ValueError("m and n must be non-negative")
    if m == 0:
        return _table([], [])
    if n == 0:
        return _table([0] * m, [0] * m)
    nv = m ** n
    i = np.repeat(np.arange(nv, dtype=np.int64), m)
    basis = (np.arange(nv, dtype=np.int64) * m) % nv
    j = np.repeat(basis, m) + np.tile(np.arange(m, dtype=np.int64), nv)
    return _table(i, j)


def kautz(m: int, n: int) -> pa.Table:
    """Kautz graph K(m, n): (m+1)*m^n vertices = length-(n+1)
    strings over m+1 symbols with no equal consecutive symbols; arc
    u -> v iff v's prefix is u's suffix (igraph_kautz,
    src/structure_generators.c:1477).  Vertex ids = lexicographic
    rank among valid strings, matching the reference's index
    tables."""
    if m < 0 or n < 0:
        raise ValueError("m and n must be non-negative")
    if m == 0:
        return _table([], [])
    if n == 0:
        return full(m + 1, directed=True)
    import itertools

    valid = []
    for s in itertools.product(range(m + 1), repeat=n + 1):
        if all(s[i] != s[i + 1] for i in range(n)):
            valid.append(s)
    index = {s: i for i, s in enumerate(valid)}  # lexicographic
    src_l, dst_l = [], []
    for s in valid:
        for c in range(m + 1):
            if c != s[-1]:
                src_l.append(index[s])
                dst_l.append(index[s[1:] + (c,)])
    return _table(src_l, dst_l)


def lcf(n: int, shifts, repeats: int) -> pa.Table:
    """Graph from LCF notation (igraph_lcf_vector,
    src/structure_generators.c:1616): ring of n vertices plus chords
    (i, (n + i + shifts[i % k]) % n) taken while i walks 0,1,2,...
    keeping only from < to, until n + k*repeats/2 edges exist —
    mirrored exactly, including the from<to skip rule."""
    shifts = [int(s) for s in np.atleast_1d(np.asarray(shifts))]
    k = len(shifts)
    if repeats < 0:
        raise ValueError("number of repeats must be positive")
    target = n + k * repeats // 2
    src_l = list(range(n))
    dst_l = list(range(1, n)) + [0]
    dst_l[-1] = 0
    sptr = 0
    guard = 4 * max(1, n) * max(1, k) * max(1, repeats) + 16
    while len(src_l) < target:
        sh = shifts[sptr % k]
        frm = sptr % n
        to = (n + sptr + sh) % n
        if frm < to:
            src_l.append(frm)
            dst_l.append(to)
        sptr += 1
        if sptr > guard:
            raise ValueError(
                "lcf: shift pattern never reaches the target edge "
                "count (invalid LCF notation?)")
    return _table(src_l, dst_l)
