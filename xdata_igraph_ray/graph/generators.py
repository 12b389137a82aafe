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
