"""Layout generators (reference src/layout.c, src/layout_fr.c,
src/layout_kk.c).

Coordinate TABLES, not pictures: every layout returns an (n, dim)
float64 array whose row i is vertex i's position, matching the
reference's ``igraph_matrix_t res`` contract; ``layout_dataset``
wraps the closed-form family as a genuinely distributed
``ray.data.range(n).map_batches`` pipeline (a layout is a pure
per-vertex formula there, so it streams at any scale).

Scope mirrors the reference's own: the force/stress kernels (FR, KK,
MDS, Reingold-Tilford) are single-machine O(n^2)-per-iteration code
in the C tree (layout_fr.c:31, layout_kk.c:72), so they are
driver-side vectorized-numpy kernels here with the same cost model;
the grid-FR variant IS the reference's scale path (cellsize-2 spatial
binning, layout_fr.c:180) and is implemented with vectorized cell
bucketing.

Determinism (pinned divergence): the reference draws starting
positions and collision jitter from its global MT RNG stream
(layout_fr.c:58, RNG_UNIF); here a seeded splitmix64 counter-hash
keyed by (seed, vertex, iteration) replaces the stream — same
distribution, reproducible at any partition count, but coordinates
differ from the C stream's.  KK, MDS, RT, circle/star/grid/sphere
are RNG-free in the reference and exactly replicated.

Sugiyama (src/sugiyama.c:244) IS implemented: Eades-ordering /
BFS layering, dummy-vertex subdivision, barycenter sweeps, and
Brandes-Kopf horizontal placement — see layout_sugiyama below.

Excluded (see README): DrL, graphopt, GEM, Davidson-Harel,
LGL, merge_dla — visualization-tuning heuristics with no data-
processing semantics; layout_springs is unimplemented in the
reference itself (layout.c:370 IGRAPH_UNIMPLEMENTED).
"""

from __future__ import annotations

import heapq
import math

import numpy as np

_H1 = np.uint64(0x9E3779B97F4A7C15)
_H2 = np.uint64(0xBF58476D1CE4E5B9)


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * _H1
    x = (x ^ (x >> np.uint64(27))) * _H2
    return x ^ (x >> np.uint64(31))


def _unif(seed: int, stream: int, ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform [0,1) per id — splitmix64 counter hash."""
    k1 = np.uint64((seed * 0x2545F491 * 0xBF58476D1CE4E5B9) % (1 << 64))
    k2 = np.uint64((stream * 0x9E3779B97F4A7C15) % (1 << 64))
    z = _mix(ids.astype(np.uint64) + k1 + k2)
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _edges_np(edges):
    """Accept a Dataset, pyarrow Table, (src,dst) ndarray pair, or a
    list of (src, dst) tuples; return two int64 arrays."""
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(edges, Dataset):
            t = pa.concat_tables(_fetch(edges))
            return (t["src"].to_numpy().astype(np.int64),
                    t["dst"].to_numpy().astype(np.int64))
    except ImportError:  # pragma: no cover
        pass
    if isinstance(edges, pa.Table):
        return (edges["src"].to_numpy().astype(np.int64),
                edges["dst"].to_numpy().astype(np.int64))
    if isinstance(edges, tuple) and len(edges) == 2:
        return (np.asarray(edges[0], dtype=np.int64),
                np.asarray(edges[1], dtype=np.int64))
    arr = np.asarray(list(edges), dtype=np.int64)
    if arr.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return arr[:, 0].copy(), arr[:, 1].copy()


def _fetch(ds):
    import ray

    return ray.get(ds.to_arrow_refs())


# ---------------------------------------------------------------------------
# Closed-form family — pure per-vertex formulas (layout.c:76-377)
# ---------------------------------------------------------------------------

def layout_random(n: int, seed: int = 42, dim: int = 2) -> np.ndarray:
    """Uniform random on [-1,1]^dim (igraph_layout_random,
    layout.c:76; _3d layout.c:110).  Seeded counter-hash instead of
    the reference's MT stream (pinned divergence)."""
    ids = np.arange(n, dtype=np.uint64)
    res = np.empty((n, dim))
    for d in range(dim):
        res[:, d] = _unif(seed, d, ids) * 2.0 - 1.0
    return res


def layout_random_3d(n: int, seed: int = 42) -> np.ndarray:
    return layout_random(n, seed=seed, dim=3)


def layout_circle(n: int, order=None) -> np.ndarray:
    """Unit circle in the order given (igraph_layout_circle,
    layout.c:149): vertex ``order[i]`` sits at angle 2*pi*i/len(order);
    vertices not in ``order`` stay at (0,0)."""
    res = np.zeros((n, 2))
    idx = np.arange(n, dtype=np.int64) if order is None \
        else np.asarray(order, dtype=np.int64)
    k = len(idx)
    if k:
        phi = 2.0 * np.pi / k * np.arange(k)
        res[idx, 0] = np.cos(phi)
        res[idx, 1] = np.sin(phi)
    return res


def layout_star(n: int, center: int = 0, order=None) -> np.ndarray:
    """Center at the origin, the rest on the unit circle in ``order``
    (igraph_layout_star, layout.c:192: angle step 2*pi/(n-1), the
    center consumes no step)."""
    if order is not None and len(order) != n:
        raise ValueError("layout_star: order length must be n")
    res = np.zeros((n, 2))
    if n <= 1:
        return res
    nodes = np.arange(n, dtype=np.int64) if order is None \
        else np.asarray(order, dtype=np.int64)
    sat = nodes[nodes != center]
    phi = 2.0 * np.pi / (n - 1) * np.arange(len(sat))
    res[sat, 0] = np.cos(phi)
    res[sat, 1] = np.sin(phi)
    return res


def layout_grid(n: int, width: int = 0) -> np.ndarray:
    """Row-major unit grid (igraph_layout_grid, layout.c:293);
    width<=0 -> ceil(sqrt(n))."""
    if width <= 0:
        width = int(math.ceil(math.sqrt(n))) if n else 1
    i = np.arange(n, dtype=np.int64)
    return np.stack([(i % width).astype(np.float64),
                     (i // width).astype(np.float64)], axis=1)


def layout_grid_3d(n: int, width: int = 0, height: int = 0) -> np.ndarray:
    """3D unit grid (igraph_layout_grid_3d, layout.c:339 auto rule:
    both<=0 -> ceil(n^(1/3)); one<=0 -> ceil(sqrt(n/other))."""
    if width <= 0 and height <= 0:
        width = height = int(math.ceil(n ** (1.0 / 3))) if n else 1
    elif width <= 0:
        width = int(math.ceil(math.sqrt(n / float(height))))
    elif height <= 0:
        height = int(math.ceil(math.sqrt(n / float(width))))
    i = np.arange(n, dtype=np.int64)
    return np.stack([(i % width).astype(np.float64),
                     (i // width % height).astype(np.float64),
                     (i // (width * height)).astype(np.float64)], axis=1)


def layout_sphere(n: int) -> np.ndarray:
    """Saff-Kuijlaars spiral on the unit sphere (igraph_layout_sphere,
    layout.c:246): theta_0=pi, phi_0=0; phi_i = (phi_{i-1} +
    3.6/sqrt(n(1-h_i^2))) mod 2pi with h_i = -1+2i/(n-1); poles at the
    ends.  The phi recurrence is a prefix sum of positive steps, so
    fmod(cumsum) == the reference's stepwise fmod up to float noise."""
    res = np.zeros((n, 3))
    if n == 0:
        return res
    theta = np.empty(n)
    phi = np.zeros(n)
    theta[0] = np.pi
    if n >= 2:
        i = np.arange(1, n - 1, dtype=np.float64)
        h = -1.0 + 2.0 * i / (n - 1)
        theta[1:n - 1] = np.arccos(h)
        steps = 3.6 / np.sqrt(n * (1.0 - h * h))
        phi[1:n - 1] = np.fmod(np.cumsum(steps), 2.0 * np.pi)
        theta[n - 1] = 0.0
        phi[n - 1] = 0.0
    res[:, 0] = np.cos(phi) * np.sin(theta)
    res[:, 1] = np.sin(phi) * np.sin(theta)
    res[:, 2] = np.cos(theta)
    return res


_FORMULAS = {
    "random": layout_random,
    "random_3d": layout_random_3d,
    "circle": layout_circle,
    "star": layout_star,
    "grid": layout_grid,
    "grid_3d": layout_grid_3d,
    "sphere": layout_sphere,
}


def layout_dataset(kind: str, n: int, **kw):
    """Distributed closed-form layout: stream vid ranges through
    map_batches, each batch evaluating the formula for its own id
    slice only — O(batch) memory per task, any n.  Returns a Dataset
    (vid, x, y[, z]).  ``sphere``'s phi prefix-sum is evaluated from
    0 per batch (O(vid_hi) work per batch — the formula family's one
    non-O(1)-per-row member; still embarrassingly parallel)."""
    import ray.data as rd

    if kind not in _FORMULAS:
        raise ValueError(f"unknown formula layout {kind!r}")
    if kw.get("order") is not None:
        raise ValueError("layout_dataset places vertices in vid order; "
                         "pass order= to the driver kernels instead")

    def _batch(b):
        lo = b["id"].to_numpy().astype(np.int64)
        full = _FORMULAS[kind](n, **kw)  # noqa: B023 — see _slice below
        sl = full[lo]
        out = {"vid": lo, "x": sl[:, 0], "y": sl[:, 1]}
        if sl.shape[1] == 3:
            out["z"] = sl[:, 2]
        import pyarrow as pa

        return pa.table(out)

    if kind in ("random", "random_3d", "circle", "star", "grid", "grid_3d"):
        # O(1)-per-row formulas: evaluate only this batch's slice
        def _batch(b):  # noqa: F811
            import pyarrow as pa

            ids = b["id"].to_numpy().astype(np.int64)
            out = {"vid": ids}
            if kind == "random" or kind == "random_3d":
                dim = 3 if kind == "random_3d" else kw.get("dim", 2)
                seed = kw.get("seed", 42)
                u = ids.astype(np.uint64)
                for d, c in zip(range(dim), "xyz"):
                    out[c] = _unif(seed, d, u) * 2.0 - 1.0
            elif kind == "circle":
                phi = 2.0 * np.pi / max(n, 1) * ids
                out["x"], out["y"] = np.cos(phi), np.sin(phi)
            elif kind == "star":
                c = kw.get("center", 0)
                # ranks skip the center: rank = id - (id > center)
                r = ids - (ids > c).astype(np.int64)
                phi = 2.0 * np.pi / max(n - 1, 1) * r
                x, y = np.cos(phi), np.sin(phi)
                x[ids == c] = 0.0
                y[ids == c] = 0.0
                out["x"], out["y"] = x, y
            elif kind == "grid":
                w = kw.get("width", 0) or (int(math.ceil(math.sqrt(n))) if n else 1)
                out["x"] = (ids % w).astype(np.float64)
                out["y"] = (ids // w).astype(np.float64)
            else:  # grid_3d
                w, h = kw.get("width", 0), kw.get("height", 0)
                if w <= 0 and h <= 0:
                    w = h = int(math.ceil(n ** (1.0 / 3))) if n else 1
                elif w <= 0:
                    w = int(math.ceil(math.sqrt(n / float(h))))
                elif h <= 0:
                    h = int(math.ceil(math.sqrt(n / float(w))))
                out["x"] = (ids % w).astype(np.float64)
                out["y"] = (ids // w % h).astype(np.float64)
                out["z"] = (ids // (w * h)).astype(np.float64)
            return pa.table(out)

    return rd.range(n).map_batches(_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Fruchterman-Reingold (layout_fr.c:31 dense, :180 grid, :462 3d)
# ---------------------------------------------------------------------------

def _components_np(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Min-label propagation with pointer doubling — vectorized WCC
    for the driver kernels (the distributed WCC lives in the engine)."""
    lab = np.arange(n, dtype=np.int64)
    while True:
        before = lab.copy()
        np.minimum.at(lab, src, lab[dst])
        np.minimum.at(lab, dst, lab[src])
        lab = lab[lab]  # pointer doubling
        if np.array_equal(lab, before):
            return lab


def _fr_repulse_dense(pos, disp, conn, C, seed, it):
    n = pos.shape[0]
    # chunked pairwise to bound memory at O(chunk * n)
    chunk = max(1, int(4e6) // max(n, 1))
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d = pos[lo:hi, None, :] - pos[None, :, :]      # (c, n, dim)
        dlen = np.einsum("ijk,ijk->ij", d, d)
        # zero-distance pairs get deterministic jitter (reference
        # draws RNG_UNIF01()*1e-9 per colliding pair, layout_fr.c:95)
        zero = dlen == 0
        rows, cols = np.nonzero(zero)
        self_m = (rows + lo) == cols
        if self_m.any():
            keep = ~self_m
            rows, cols = rows[keep], cols[keep]
        if len(rows):
            jit = _unif(seed, 7000 + it, (rows + lo).astype(np.uint64)
                        * np.uint64(2654435761) + cols.astype(np.uint64))
            for k in range(d.shape[2]):
                d[rows, cols, k] = jit * 1e-9
            dlen[rows, cols] = np.einsum(
                "ij,ij->i", d[rows, cols], d[rows, cols])
        dlen[np.arange(hi - lo), np.arange(lo, hi)] = np.inf  # self
        with np.errstate(invalid="ignore"):
            if conn:
                f = 1.0 / dlen
            else:
                rdlen = np.sqrt(dlen)
                f = (C - dlen * rdlen) / (dlen * C)
        f[np.arange(hi - lo), np.arange(lo, hi)] = 0.0
        disp[lo:hi] += np.einsum("ijk,ij->ik", d, f)


def _fr_repulse_grid(pos, disp, seed, it, cellsize=2.0):
    """The reference's 2dgrid pruning (layout_fr.c:180): repulsion
    only between vertices in the same or adjacent cells and closer
    than cellsize.  Vectorized: bucket by cell, join the 9-neighbor
    cell offsets, mask dist < cellsize."""
    n = pos.shape[0]
    cell = np.floor(pos[:, :2] / cellsize).astype(np.int64)
    # pack 2d cell to one key (coords are bounded by the frame size)
    off = cell.min(axis=0)
    cell -= off
    W = int(cell[:, 0].max()) + 2
    key = cell[:, 1] * W + cell[:, 0]
    order = np.argsort(key, kind="stable")
    sk = key[order]
    uniq, starts = np.unique(sk, return_index=True)
    ends = np.append(starts[1:], n)
    cstart = dict(zip(uniq.tolist(), zip(starts.tolist(), ends.tolist())))
    pairs_i, pairs_j = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) < (0, 0):
                continue  # each unordered cell pair once
            nk = uniq + dy * W + dx
            for a, b in zip(uniq.tolist(), nk.tolist()):
                if b not in cstart:
                    continue
                s1, e1 = cstart[a]
                s2, e2 = cstart[b]
                ii = order[s1:e1]
                jj = order[s2:e2]
                if a == b:
                    iu, ju = np.triu_indices(len(ii), k=1)
                    pairs_i.append(ii[iu])
                    pairs_j.append(jj[ju])
                else:
                    gi, gj = np.meshgrid(ii, jj, indexing="ij")
                    pairs_i.append(gi.ravel())
                    pairs_j.append(gj.ravel())
    if not pairs_i:
        return
    pi = np.concatenate(pairs_i)
    pj = np.concatenate(pairs_j)
    d = pos[pi] - pos[pj]
    dlen = np.einsum("ij,ij->i", d, d)
    m = dlen < cellsize * cellsize
    pi, pj, d, dlen = pi[m], pj[m], d[m], dlen[m]
    zero = dlen == 0
    if zero.any():
        jit = _unif(seed, 7100 + it,
                    pi[zero].astype(np.uint64) * np.uint64(2654435761)
                    + pj[zero].astype(np.uint64))
        d[zero] = (jit * 1e-9)[:, None]
        dlen[zero] = np.einsum("ij,ij->i", d[zero], d[zero])
    f = (d / dlen[:, None])
    np.add.at(disp, pi, f)
    np.subtract.at(disp, pj, f)


def layout_fruchterman_reingold(
    edges,
    n: int,
    niter: int = 500,
    start_temp: float | None = None,
    grid: str | bool = "auto",
    seed: int = 42,
    pos: np.ndarray | None = None,
    dim: int = 2,
    minx=None, maxx=None, miny=None, maxy=None,
    minz=None, maxz=None,
) -> np.ndarray:
    """Force-directed FR layout (igraph_layout_fruchterman_reingold,
    layout_fr.c:349).  Semantics mirrored exactly: repulsion d/|d|^2
    (connected) or the C-scaled unconnected rule, attraction d*|d|,
    per-axis displacement capped at the linearly-cooling temperature;
    ``grid='auto'`` switches to cellsize-2 spatial pruning above 1000
    vertices like the reference.  RNG is the seeded counter hash
    (pinned divergence from the C MT stream)."""
    if niter < 0:
        raise ValueError("niter must be non-negative")
    src, dst = _edges_np(edges)
    if start_temp is None:
        start_temp = math.sqrt(n)
    width = math.sqrt(n)
    if grid == "auto":
        use_grid = n > 1000 and dim == 2
    else:
        use_grid = bool(grid) and dim == 2
    conn = True
    C = 0.0
    if not use_grid:
        lab = _components_np(n, src, dst)
        conn = n <= 1 or (lab == lab[0]).all()
        if not conn:
            C = n * math.sqrt(n)

    bounds = ((minx, maxx), (miny, maxy), (minz, maxz))
    if pos is None:
        ids = np.arange(n, dtype=np.uint64)
        pos = np.empty((n, dim))
        for d_ in range(dim):
            lo, hi = bounds[d_] if d_ < 3 else (None, None)
            u = _unif(seed, 100 + d_, ids)
            lov = np.full(n, -width / 2) if lo is None \
                else np.asarray(lo, dtype=np.float64)
            hiv = np.full(n, width / 2) if hi is None \
                else np.asarray(hi, dtype=np.float64)
            pos[:, d_] = lov + u * (hiv - lov)
    else:
        pos = np.array(pos, dtype=np.float64, copy=True)
        if pos.shape != (n, dim):
            raise ValueError("invalid start position matrix size")

    temp = float(start_temp)
    difftemp = start_temp / niter if niter else 0.0
    for it in range(niter):
        disp = np.zeros_like(pos)
        if use_grid:
            _fr_repulse_grid(pos, disp, seed, it)
        else:
            _fr_repulse_dense(pos, disp, conn, C, seed, it)
        # attraction along edges: -(d * |d|)
        d = pos[src] - pos[dst]
        dlen = np.sqrt(np.einsum("ij,ij->i", d, d))
        f = d * dlen[:, None]
        np.subtract.at(disp, src, f)
        np.add.at(disp, dst, f)
        # temperature-capped update (layout_fr.c:146: per-axis cap,
        # direction from the full displacement vector)
        jit = np.stack([
            _unif(seed, 9000 + it * 4 + d_, np.arange(n, dtype=np.uint64))
            for d_ in range(dim)
        ], axis=1) * 1e-9
        dv = disp + jit
        dl = np.sqrt(np.einsum("ij,ij->i", dv, dv))
        capped = np.where(np.abs(dv) < temp, dv, temp)
        nz = dl > 0
        pos[nz] += dv[nz] / dl[nz, None] * capped[nz]
        for d_, (lo, hi) in enumerate(bounds):
            if d_ >= dim:
                break
            if lo is not None:
                pos[:, d_] = np.maximum(pos[:, d_], np.asarray(lo))
            if hi is not None:
                pos[:, d_] = np.minimum(pos[:, d_], np.asarray(hi))
        temp -= difftemp
    return pos


def layout_fruchterman_reingold_3d(
    edges,
    n: int,
    niter: int = 500,
    start_temp: float | None = None,
    seed: int = 42,
    pos: np.ndarray | None = None,
    minx=None, maxx=None, miny=None, maxy=None,
    minz=None, maxz=None,
) -> np.ndarray:
    """igraph_layout_fruchterman_reingold_3d (layout_fr.c:462): the
    same force model over (n, 3) with per-axis z bounds and cubic
    init frame (depth == width == sqrt(n)).  The reference has no
    grid-pruned 3d variant, so this is always dense-pairwise.  Pinned
    divergence: the reference's UNCONNECTED 3d repulsion loop writes
    the z-term into dispy and never accumulates dispz for v
    (layout_fr.c:586-588, an upstream typo); this implementation is
    symmetric in all three axes."""
    return layout_fruchterman_reingold(
        edges, n, niter=niter, start_temp=start_temp, grid=False,
        seed=seed, pos=pos, dim=3,
        minx=minx, maxx=maxx, miny=miny, maxy=maxy, minz=minz, maxz=maxz,
    )


# ---------------------------------------------------------------------------
# Kamada-Kawai (layout_kk.c:72) — deterministic localized Newton steps
# ---------------------------------------------------------------------------

def _all_pairs_dist(n, src, dst, weights=None):
    """Driver-kernel all-pairs distances (BFS per source, or Dijkstra
    when weighted) over the undirected support — KK/MDS use mode=ALL
    (layout_kk.c:155)."""
    adj = [[] for _ in range(n)]
    w = np.ones(len(src)) if weights is None else np.asarray(weights, float)
    for s, t, ww in zip(src.tolist(), dst.tolist(), w.tolist()):
        if s == t:
            continue
        adj[s].append((t, ww))
        adj[t].append((s, ww))
    dij = np.full((n, n), np.inf)
    for s0 in range(n):
        dist = dij[s0]
        dist[s0] = 0.0
        if weights is None:
            frontier = [s0]
            dd = 0.0
            while frontier:
                dd += 1.0
                nxt = []
                for v in frontier:
                    for u, _ in adj[v]:
                        if dist[u] == np.inf:
                            dist[u] = dd
                            nxt.append(u)
                frontier = nxt
        else:
            h = [(0.0, s0)]
            done = np.zeros(n, bool)
            while h:
                dd, v = heapq.heappop(h)
                if done[v]:
                    continue
                done[v] = True
                for u, ww in adj[v]:
                    nd = dd + ww
                    if nd < dist[u]:
                        dist[u] = nd
                        heapq.heappush(h, (nd, u))
    return dij


def layout_kamada_kawai(
    edges,
    n: int,
    maxiter: int | None = None,
    epsilon: float = 0.0,
    kkconst: float | None = None,
    weights=None,
    pos: np.ndarray | None = None,
    minx=None, maxx=None, miny=None, maxy=None,
) -> np.ndarray:
    """Kamada-Kawai stress layout (igraph_layout_kamada_kawai,
    layout_kk.c:72) — RNG-FREE in the reference when no box
    constraints are given (it starts from the circle layout), so this
    kernel reproduces the reference's update sequence exactly:
    spring lengths L*d_ij with L = sqrt(n)/max(d), strengths K/d^2,
    each iteration Newton-solves the single vertex with the largest
    stress gradient and incrementally patches the gradient cache."""
    src, dst = _edges_np(edges)
    if maxiter is None:
        maxiter = max(50 * n, 200)
    if kkconst is None:
        kkconst = max(n, 1)
    if kkconst <= 0:
        raise ValueError("kkconst must be positive")
    if pos is None:
        if any(v is not None for v in (minx, maxx, miny, maxy)):
            raise NotImplementedError(
                "box-constrained KK needs an explicit start layout here "
                "(the reference draws one from its RNG)")
        pos = layout_circle(n)
    else:
        pos = np.array(pos, dtype=np.float64, copy=True)
    if n <= 1:
        return np.zeros((n, 2))

    dij = _all_pairs_dist(n, src, dst, weights)
    finite = np.isfinite(dij)
    triu = np.triu(finite, 1)
    max_dij = dij[triu].max() if triu.any() else 1.0
    dij = np.where(dij > max_dij, max_dij, dij)  # inf -> max (ref rule)
    L = math.sqrt(n) / max_dij
    with np.errstate(divide="ignore"):
        kij = kkconst / (dij * dij)
        lij = L * dij
    np.fill_diagonal(kij, 0.0)
    np.fill_diagonal(lij, 0.0)

    # gradient cache D1/D2 (layout_kk.c:181)
    def _grad_all():
        dx = pos[:, 0][:, None] - pos[:, 0][None, :]
        dy = pos[:, 1][:, None] - pos[:, 1][None, :]
        dist = np.sqrt(dx * dx + dy * dy)
        np.fill_diagonal(dist, 1.0)
        gx = kij * (dx - lij * dx / dist)
        gy = kij * (dy - lij * dy / dist)
        np.fill_diagonal(gx, 0.0)
        np.fill_diagonal(gy, 0.0)
        return gx.sum(axis=1), gy.sum(axis=1)

    D1, D2 = _grad_all()
    for _ in range(maxiter):
        delta = D1 * D1 + D2 * D2
        m = int(np.argmax(delta))
        if delta[m] < epsilon:
            break
        old = pos[m].copy()
        dx = old[0] - pos[:, 0]
        dy = old[1] - pos[:, 1]
        dist = np.sqrt(dx * dx + dy * dy)
        dist[m] = 1.0
        den = dist * (dx * dx + dy * dy)
        den[m] = 1.0
        A = np.sum(np.delete(kij[m] * (1 - lij[m] * dy * dy / den), m))
        B = np.sum(np.delete(kij[m] * lij[m] * dx * dy / den, m))
        Cc = np.sum(np.delete(kij[m] * (1 - lij[m] * dx * dx / den), m))
        myD1, myD2 = D1[m], D2[m]
        delta_y = (B * myD1 - myD2 * A) / (Cc * A - B * B)
        delta_x = -(myD1 + B * delta_y) / A
        new = old + (delta_x, delta_y)
        if minx is not None:
            new[0] = max(new[0], np.asarray(minx)[m])
        if maxx is not None:
            new[0] = min(new[0], np.asarray(maxx)[m])
        if miny is not None:
            new[1] = max(new[1], np.asarray(miny)[m])
        if maxy is not None:
            new[1] = min(new[1], np.asarray(maxy)[m])
        # incremental gradient patch (layout_kk.c:244)
        old_d = old - pos
        old_dist = np.sqrt(np.einsum("ij,ij->i", old_d, old_d))
        old_dist[m] = 1.0
        new_d = new - pos
        new_dist = np.sqrt(np.einsum("ij,ij->i", new_d, new_d))
        new_dist[m] = 1.0
        km, lm = kij[m], lij[m]
        D1 -= km * (-old_d[:, 0] + lm * old_d[:, 0] / old_dist)
        D2 -= km * (-old_d[:, 1] + lm * old_d[:, 1] / old_dist)
        D1 += km * (-new_d[:, 0] + lm * new_d[:, 0] / new_dist)
        D2 += km * (-new_d[:, 1] + lm * new_d[:, 1] / new_dist)
        D1[m] = np.sum(np.delete(km * (new_d[:, 0] - lm * new_d[:, 0] / new_dist), m))
        D2[m] = np.sum(np.delete(km * (new_d[:, 1] - lm * new_d[:, 1] / new_dist), m))
        pos[m] = new
    return pos


def kk_stress(pos, edges, n, weights=None, kkconst=None) -> float:
    """The KK energy sum k_ij (|p_i-p_j| - l_ij)^2 / 2 — exposed for
    tests and convergence monitoring."""
    src, dst = _edges_np(edges)
    if kkconst is None:
        kkconst = max(n, 1)
    dij = _all_pairs_dist(n, src, dst, weights)
    finite = np.isfinite(dij)
    triu = np.triu(finite, 1)
    max_dij = dij[triu].max() if triu.any() else 1.0
    dij = np.where(dij > max_dij, max_dij, dij)
    L = math.sqrt(n) / max_dij
    with np.errstate(divide="ignore"):
        kij = kkconst / (dij * dij)
    np.fill_diagonal(kij, 0.0)
    lij = L * dij
    dx = pos[:, 0][:, None] - pos[:, 0][None, :]
    dy = pos[:, 1][:, None] - pos[:, 1][None, :]
    dist = np.sqrt(dx * dx + dy * dy)
    return float(np.sum(np.triu(kij * (dist - lij) ** 2, 1)) / 2.0)


# ---------------------------------------------------------------------------
# MDS (igraph_layout_mds, layout.c:2069)
# ---------------------------------------------------------------------------

def layout_mds(edges, n: int, dist: np.ndarray | None = None,
               dim: int = 2) -> np.ndarray:
    """Classical MDS (layout.c:1945 igraph_i_layout_mds_single):
    square the distance matrix, double-center, take the top ``dim``
    eigenpairs, scale by sqrt(|lambda|); column 0 carries the largest
    eigenvalue.  Default distances are unweighted shortest paths.
    Disconnected graphs: each component is embedded separately and
    components are tiled on a grid (pinned divergence from the
    reference's DLA merge, layout.c:2157 — the reference's placement
    is RNG-dependent)."""
    src, dst = _edges_np(edges)
    if dist is not None:
        dist = np.asarray(dist, dtype=np.float64)
        if dist.shape != (n, n):
            raise ValueError("invalid distance matrix size")
        return _mds_single(dist, dim)
    lab = _components_np(n, src, dst)
    comps = np.unique(lab)
    if len(comps) == 1:
        return _mds_single(_all_pairs_dist(n, src, dst), dim)
    res = np.zeros((n, dim))
    side = int(math.ceil(math.sqrt(len(comps))))
    for ci, c in enumerate(comps.tolist()):
        mask = lab == c
        vids = np.flatnonzero(mask)
        remap = -np.ones(n, np.int64)
        remap[vids] = np.arange(len(vids))
        em = mask[src] & mask[dst]
        sub = _mds_single(
            _all_pairs_dist(len(vids), remap[src[em]], remap[dst[em]]), dim)
        # tile components on a grid, each normalized into its own cell
        span = max(np.abs(sub).max(), 1e-9)
        cell = 2.5
        ox, oy = (ci % side) * cell * 2, (ci // side) * cell * 2
        res[vids] = sub / span * cell * 0.45
        res[vids, 0] += ox
        if dim > 1:
            res[vids, 1] += oy
    return res


def _mds_single(dist: np.ndarray, dim: int) -> np.ndarray:
    n = dist.shape[0]
    if n == 1:
        return np.zeros((1, dim))
    if n == 2:
        out = np.zeros((2, dim))
        out[1, :] = 1.0
        return out
    D = dist * dist
    row_means = D.mean(axis=1)
    grand = row_means.mean()
    B = -0.5 * (D - row_means[:, None] - row_means[None, :] + grand)
    B = (B + B.T) / 2.0
    vals, vecs = np.linalg.eigh(B)
    order = np.argsort(-vals)[:dim]  # largest algebraic first
    lam = np.sqrt(np.abs(vals[order]))
    return vecs[:, order] * lam[None, :]


# ---------------------------------------------------------------------------
# Reingold-Tilford tree layout (layout.c:968 wrapper, :712 kernel)
# ---------------------------------------------------------------------------

def _rt_kernel(n, adj, root):
    """Faithful contour-packing RT (layout.c:712): BFS levels with
    the reference's adjlist visit order, postorder subtree placement
    pushing each child's left contour against the previous subtree's
    right contour (min separation 1), parents centered on the mean
    child offset.  Children lists replace the reference's O(n) parent
    scans (the C code's own TODO at layout.c:984)."""
    parent = np.full(n, -1, np.int64)
    level = np.full(n, -1, np.int64)
    parent[root] = root
    level[root] = 0
    children = [[] for _ in range(n)]
    from collections import deque

    q = deque([(root, 0)])
    while q:
        v, d = q.popleft()
        for u in adj[v]:
            if parent[u] >= 0:
                continue
            parent[u] = v
            level[u] = d + 1
            children[v].append(u)
            q.append((u, d + 1))

    offset = np.zeros(n)
    lc = np.full(n, -1, np.int64)     # left contour
    rc = np.full(n, -1, np.int64)     # right contour
    olc = np.zeros(n)                 # offset following left contour
    orc = np.zeros(n)                 # offset following right contour

    def postorder(node):
        stack = [(node, 0)]
        # iterative postorder to dodge recursion limits on deep trees
        out = []
        while stack:
            v, _ = stack.pop()
            out.append(v)
            for ch in children[v]:
                stack.append((ch, 0))
        for v in reversed(out):
            _place(v)

    def _place(node):
        kids = children[node]
        if not kids:
            return
        leftroot = -1
        avg = 0.0
        j = 0
        for i in kids:
            if leftroot >= 0:
                lnode, rnode = leftroot, i
                minsep = 1.0
                rootsep = offset[leftroot] + minsep
                loffset, roffset = 0.0, minsep
                while lnode >= 0 and rnode >= 0:
                    if rc[lnode] >= 0:
                        loffset += orc[lnode]
                        lnode = rc[lnode]
                    else:
                        if lc[rnode] >= 0:
                            lc[lnode] = lc[rnode]
                            rc[lnode] = lc[rnode]
                            olc[lnode] = orc[lnode] = \
                                (roffset - loffset) + olc[rnode]
                        lnode = -1
                    if rnode >= 0 and lc[rnode] >= 0:
                        roffset += olc[rnode]
                        rnode = lc[rnode]
                    else:
                        if rnode >= 0 and lnode >= 0:
                            lc[rnode] = lnode
                            rc[rnode] = lnode
                            olc[rnode] = orc[rnode] = loffset - roffset
                        rnode = -1
                    if lnode >= 0 and rnode >= 0 and \
                            roffset - loffset < minsep:
                        rootsep += minsep - roffset + loffset
                        roffset = loffset + minsep
                offset[i] = rootsep
                rc[node] = i
                orc[node] = rootsep
                avg = (avg * j) / (j + 1) + rootsep / (j + 1)
                leftroot = i
            else:
                leftroot = i
                lc[node] = i
                rc[node] = i
                olc[node] = 0.0
                orc[node] = 0.0
                avg = offset[i]
            j += 1
        olc[node] -= avg
        orc[node] -= avg
        for i in kids:
            offset[i] -= avg

    postorder(root)

    x = np.zeros(n)
    stack = [(root, offset[root])]
    seen = np.zeros(n, bool)
    while stack:
        v, xp = stack.pop()
        if seen[v]:
            continue
        seen[v] = True
        x[v] = xp
        for ch in children[v]:
            stack.append((ch, xp + offset[ch]))
    y = np.where(level >= 0, level, 0).astype(np.float64)
    return x, y


def layout_reingold_tilford(
    edges, n: int, mode: str = "out", roots=None, rootlevel=None,
    directed: bool = True,
) -> np.ndarray:
    """Tree layout (igraph_layout_reingold_tilford, layout.c:968).
    Auto roots per the reference: directed + mode!=all -> last
    vertices of the (reverse-mode) topological order per component;
    undirected -> max-degree vertex per component (ties to the larger
    vid, matching the backward scan over the stable ascending degree
    sort).  Multiple roots hang from a virtual super-root; positive
    ``rootlevel`` entries insert chain gadgets exactly like the
    reference so deeper roots start at their requested level."""
    src, dst = _edges_np(edges)
    if not directed:
        mode = "all"
    if mode not in ("out", "in", "all"):
        raise ValueError("mode must be out/in/all")

    if roots is None or len(roots) == 0:
        if rootlevel is not None and len(rootlevel):
            import warnings

            warnings.warn("Reingold-Tilford layout: 'rootlevel' ignored")
        lab = _components_np(n, src, dst)
        comps, cidx = np.unique(lab, return_inverse=True)
        if directed and mode != "all":
            order = _topo_order(n, src, dst, mode)
        else:
            deg = np.zeros(n, np.int64)
            np.add.at(deg, src, 1)
            np.add.at(deg, dst, 1)
            order = np.argsort(deg, kind="stable")
        myroots = np.full(len(comps), -1, np.int64)
        seen = 0
        for i in range(n - 1, -1, -1):
            v = int(order[i])
            c = int(cidx[v])
            if myroots[c] < 0:
                myroots[c] = v
                seen += 1
                if seen == len(comps):
                    break
        roots = myroots.tolist()
        rootlevel = None
    else:
        roots = list(int(r) for r in roots)

    es, ed = src.copy(), dst.copy()
    n_ext = n
    if rootlevel is not None and len(roots) > 1:
        if len(roots) != len(rootlevel):
            raise ValueError("'roots' and 'rootlevel' lengths differ")
        newe = []
        for i, (rn, rl) in enumerate(zip(list(roots), list(rootlevel))):
            rl = int(rl)
            if rl == 0:
                continue
            newe.append((n_ext, rn))
            for _ in range(rl - 1):
                newe.append((n_ext + 1, n_ext))
                n_ext += 1
            roots[i] = n_ext
            n_ext += 1
        if newe:
            a = np.array(newe, np.int64)
            if mode == "in":
                a = a[:, ::-1]
            es = np.concatenate([es, a[:, 0]])
            ed = np.concatenate([ed, a[:, 1]])

    if len(roots) == 1:
        real_root = int(roots[0])
        if not (0 <= real_root < n_ext):
            raise ValueError("invalid root vertex id")
    else:
        real_root = n_ext
        a = np.array([(n_ext, r) for r in roots], np.int64)
        es = np.concatenate([es, a[:, 0]])
        ed = np.concatenate([ed, a[:, 1]])
        n_ext += 1

    # adjacency in the reference's enumeration order: OUT sorted by
    # (from,to), IN sorted by (to,from), ALL = merged sorted streams
    adj = [[] for _ in range(n_ext)]
    if mode in ("out", "all"):
        o = np.lexsort((ed, es))
        for s, t in zip(es[o].tolist(), ed[o].tolist()):
            adj[s].append(t)
    if mode in ("in", "all"):
        o = np.lexsort((es, ed))
        for s, t in zip(es[o].tolist(), ed[o].tolist()):
            adj[t].append(s)
    if mode == "all":
        adj = [sorted(a_) for a_ in adj]

    x, y = _rt_kernel(n_ext, adj, real_root)
    return np.stack([x[:n], y[:n]], axis=1)


def _topo_order(n, src, dst, mode):
    """Kahn topological order with the min-id heap the reference's
    igraph_topological_sorting uses (src/topology.c semantics);
    mode='out' roots the layout at sinks, so the order is taken in
    reverse-edge direction (mode2, layout.c:992)."""
    # mode2: out -> in means order by removing sources of REVERSED edges
    a, b = (src, dst) if mode == "in" else (dst, src)
    indeg = np.zeros(n, np.int64)
    np.add.at(indeg, b, 1)
    adj = [[] for _ in range(n)]
    for s, t in zip(a.tolist(), b.tolist()):
        adj[s].append(t)
    h = [v for v in range(n) if indeg[v] == 0]
    heapq.heapify(h)
    out = []
    while h:
        v = heapq.heappop(h)
        out.append(v)
        for u in adj[v]:
            indeg[u] -= 1
            if indeg[u] == 0:
                heapq.heappush(h, u)
    if len(out) != n:
        raise ValueError("graph contains a cycle — not a tree/DAG "
                         "(the reference errors identically)")
    return np.array(out, np.int64)


def layout_reingold_tilford_circular(
    edges, n: int, mode: str = "out", roots=None, rootlevel=None,
    directed: bool = True,
) -> np.ndarray:
    """Polar transform of RT (layout.c:1226): x -> angle over
    2*pi*(n-1)/n of the x-span, y (the level) -> radius."""
    res = layout_reingold_tilford(edges, n, mode, roots, rootlevel, directed)
    if n == 0:
        return res
    minx, maxx = res[:, 0].min(), res[:, 0].max()
    ratio = 2.0 * np.pi * (n - 1.0) / n
    span = maxx - minx
    ratio = ratio / span if span > 0 else 0.0
    phi = (res[:, 0] - minx) * ratio
    r = res[:, 1]
    return np.stack([r * np.cos(phi), r * np.sin(phi)], axis=1)


# ---------------------------------------------------------------------------
# Bipartite two-layer layout (igraph_layout_bipartite, layout.c:2217)
# ---------------------------------------------------------------------------

def layout_bipartite(edges, n: int, types, hgap: float = 1.0,
                     vgap: float = 1.0, maxiter: int = 100) -> np.ndarray:
    """Two-row bipartite layout.  The reference delegates to the full
    Sugiyama machinery for crossing minimization (layout.c:2240);
    here the two-layer case is solved directly with the classic
    barycenter sweep (the standard two-layer crossing-reduction
    heuristic Sugiyama itself uses), then positions are spaced hgap
    apart — pinned divergence: same output contract (type 0 row at
    y=vgap, type 1 row at y=0 per the reference's layers=1-type),
    orderings may differ from the Sugiyama implementation's."""
    types = np.asarray(types).astype(bool)
    if len(types) != n:
        raise ValueError("Invalid vertex type vector size")
    src, dst = _edges_np(edges)
    y = np.where(types, 0.0, vgap)

    # initial x: vid order within each row
    x = np.zeros(n)
    for t in (False, True):
        vids = np.flatnonzero(types == t)
        x[vids] = np.arange(len(vids), dtype=np.float64) * hgap

    # barycenter sweeps
    nbr = [[] for _ in range(n)]
    for s, t_ in zip(src.tolist(), dst.tolist()):
        if s == t_:
            continue
        nbr[s].append(t_)
        nbr[t_].append(s)
    for it in range(maxiter):
        moved = False
        side = bool(it % 2)
        vids = np.flatnonzero(types == side)
        bary = np.array([
            np.mean(x[nbr[v]]) if nbr[v] else x[v] for v in vids
        ])
        order = np.argsort(bary, kind="stable")
        newx = np.arange(len(vids), dtype=np.float64) * hgap
        if not np.array_equal(x[vids[order]], newx):
            moved = True
        x[vids[order]] = newx
        if not moved and it > 0:
            break
    return np.stack([x, y], axis=1)


# ---------------------------------------------------------------------------
# Sugiyama layered layout (igraph_layout_sugiyama, src/sugiyama.c:244)
# ---------------------------------------------------------------------------

def _eades_order(n, src, dst, weights=None):
    """Eades-Lin-Smyth greedy ordering (igraph_i_feedback_arc_set_eades,
    src/feedback_arc_set.c:191): drain sources, drain sinks, else remove
    the vertex maximizing out-strength - in-strength.  Weighted variant
    per the reference (strengths decremented per removed incident arc).

    Pinned tie rule (same pin as graph/fas.py): sources/sinks pop
    smallest-id-first and the max-diff pick breaks strength ties on the
    smallest id, instead of the reference's FIFO queue sequencing — the
    removal RULES are identical, so this is an Eades ordering."""
    import heapq

    keep = src != dst
    s, d = src[keep], dst[keep]
    w = (np.ones(len(s)) if weights is None
         else np.asarray(weights, dtype=np.float64)[keep])
    indeg = np.bincount(d, minlength=n).astype(np.int64)
    outdeg = np.bincount(s, minlength=n).astype(np.int64)
    instr = np.bincount(d, weights=w, minlength=n)
    outstr = np.bincount(s, weights=w, minlength=n)

    o = np.argsort(s, kind="stable")
    out_nbr, out_w = d[o], w[o]
    out_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(s, minlength=n), out=out_ptr[1:])
    o = np.argsort(d, kind="stable")
    in_nbr, in_w = s[o], w[o]
    in_ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(d, minlength=n), out=in_ptr[1:])

    removed = np.zeros(n, dtype=bool)
    ordv = np.zeros(n, dtype=np.int64)
    npos, nneg = 0, 0
    # isolated vertices take the first positions in id order
    # (feedback_arc_set.c:229-235)
    iso = np.flatnonzero((indeg == 0) & (outdeg == 0))
    for v in iso.tolist():
        ordv[v] = npos
        npos += 1
        removed[v] = True
    left = n - len(iso)
    sources = [v for v in np.flatnonzero((indeg == 0) & ~removed).tolist()]
    sinks = [v for v in np.flatnonzero(
        (outdeg == 0) & (indeg > 0)).tolist()]
    heapq.heapify(sources)
    heapq.heapify(sinks)

    def _drop_out(v):
        """v removed: decrement in-degrees of v's successors."""
        new_src = []
        for j in range(out_ptr[v], out_ptr[v + 1]):
            k = out_nbr[j]
            if removed[k] or indeg[k] <= 0:
                continue
            indeg[k] -= 1
            instr[k] -= out_w[j]
            if indeg[k] == 0:
                new_src.append(int(k))
        return new_src

    def _drop_in(v):
        new_snk = []
        for j in range(in_ptr[v], in_ptr[v + 1]):
            k = in_nbr[j]
            if removed[k] or outdeg[k] <= 0:
                continue
            outdeg[k] -= 1
            outstr[k] -= in_w[j]
            if outdeg[k] == 0 and indeg[k] > 0:
                new_snk.append(int(k))
        return new_snk

    while left > 0:
        while sources:  # (1) drain sources
            v = heapq.heappop(sources)
            if removed[v] or indeg[v] != 0:
                continue
            ordv[v] = npos
            npos += 1
            removed[v] = True
            left -= 1
            for k in _drop_out(v):
                heapq.heappush(sources, k)
        while sinks:  # (2) drain sinks (cannot create new sources)
            v = heapq.heappop(sinks)
            if removed[v] or outdeg[v] != 0:
                continue
            ordv[v] = n - 1 - nneg
            nneg += 1
            removed[v] = True
            left -= 1
            for k in _drop_in(v):
                heapq.heappush(sinks, k)
        if left <= 0:
            break
        # (3) no sources or sinks left: break one cycle
        cand = np.flatnonzero(~removed)
        diff = outstr[cand] - instr[cand]
        v = int(cand[np.argmax(diff)])  # argmax = first max: min id
        ordv[v] = npos
        npos += 1
        removed[v] = True
        left -= 1
        for k in _drop_out(v):
            heapq.heappush(sources, k)
        for k in _drop_in(v):
            heapq.heappush(sinks, k)
    return ordv


def _sugiyama_layers_directed(n, src, dst, weights=None):
    """Layering for directed graphs without a priori layers: Eades
    ordering, then longest-path relaxation over the forward arcs
    (feedback_arc_set.c:384-407).  This is the reference's own non-GLPK
    build configuration (sugiyama.c:688-694); the GLPK network-simplex
    compaction for n<=1000 needs an LP solver this container lacks."""
    ordv = _eades_order(n, src, dst, weights)
    layers = np.zeros(n, dtype=np.int64)
    o = np.argsort(src, kind="stable")
    nbr = dst[o]
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=ptr[1:])
    for v in np.argsort(ordv, kind="stable").tolist():
        lv = layers[v] + 1
        for j in range(ptr[v], ptr[v + 1]):
            w = nbr[j]
            if w == v or ordv[v] > ordv[w]:
                continue
            if layers[w] < lv:
                layers[w] = lv
    return layers


def _sugiyama_layers_undirected(n, src, dst, weights=None):
    """Layering for undirected graphs: BFS distance, roots tried in
    descending strength order (igraph_i_feedback_arc_set_undirected,
    feedback_arc_set.c:151-177).  Pinned: strength ties and neighbor
    visit order are ascending vertex id (the reference's qsort is
    unstable and its adjacency order is an implementation detail)."""
    from collections import deque

    keep = src != dst
    s, d = src[keep], dst[keep]
    w = (np.ones(len(s)) if weights is None
         else np.asarray(weights, dtype=np.float64)[keep])
    strength = (np.bincount(s, weights=w, minlength=n)
                + np.bincount(d, weights=w, minlength=n))
    order = np.lexsort((np.arange(n), -strength))
    both_s = np.concatenate([s, d])
    both_d = np.concatenate([d, s])
    o = np.lexsort((both_d, both_s))
    nbr = both_d[o]
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(both_s, minlength=n), out=ptr[1:])
    layers = np.full(n, -1, dtype=np.int64)
    for root in order.tolist():
        if layers[root] >= 0:
            continue
        layers[root] = 0
        q = deque([root])
        while q:
            v = q.popleft()
            for j in range(ptr[v], ptr[v + 1]):
                k = nbr[j]
                if layers[k] < 0:
                    layers[k] = layers[v] + 1
                    q.append(k)
    return layers


def _bk_place(n_sub, e_src, e_dst, layer_of, layer_lists, x_order,
              n_real, hgap):
    """Brandes-Kopf horizontal coordinate assignment
    (igraph_i_layout_sugiyama_place_nodes_horizontally, sugiyama.c:
    vertical_alignment + horizontal_compaction + median-of-4).

    ``x_order`` is the within-layer position from the barycenter
    phase; returns final x coordinates.  Divergence from the
    reference, documented: the reference's type-1-conflict scan
    (sugiyama.c "Find all type 1 conflicts") indexes
    ``IGRAPH_FROM(graph, j)`` with a per-layer neighbor counter used
    as a GLOBAL edge id, so it tests an arbitrary prefix of the edge
    list instead of the layer's own edges; here the conflicts are
    computed for the actual edges between each layer pair (the
    behavior the Brandes-Kopf paper, LNCS 2265:31-44, specifies)."""
    m = len(e_src)
    x = x_order.astype(np.float64)

    # --- type 1 conflicts: non-inner segments crossing inner ones ---
    ignored_pairs: set = set()
    if m:
        is_dummy_s = e_src >= n_real
        is_dummy_d = e_dst >= n_real
        inner = is_dummy_s & is_dummy_d
        esl = layer_of[e_src]
        for lay in np.unique(esl).tolist():
            sel = np.flatnonzero(esl == lay)
            if not len(sel):
                continue
            inn = sel[inner[sel]]
            if not len(inn):
                continue
            out = sel[~inner[sel]]
            if not len(out):
                continue
            pu, pv = x[e_src[out]], x[e_dst[out]]
            for e in inn.tolist():
                iu, iv = x[e_src[e]], x[e_dst[e]]
                cross = np.where(pu <= iu, pv >= iv, pv <= iv)
                for k in out[cross].tolist():
                    ignored_pairs.add((int(e_src[k]), int(e_dst[k])))

    # --- vertex_to_the_left from the final layer lists ---
    left = np.arange(n_sub, dtype=np.int64)
    for members in layer_lists:
        for j in range(1, len(members)):
            left[members[j]] = members[j - 1]

    # neighbor lists (with multiplicity) per direction
    up_nbr: list = [[] for _ in range(n_sub)]
    dn_nbr: list = [[] for _ in range(n_sub)]
    for u, v in zip(e_src.tolist(), e_dst.tolist()):
        dn_nbr[u].append(v)
        up_nbr[v].append(u)

    def vertical_alignment(reverse, align_right):
        nbrs = dn_nbr if reverse else up_nbr
        roots = np.arange(n_sub, dtype=np.int64)
        align = np.arange(n_sub, dtype=np.int64)
        lsel = (range(len(layer_lists) - 2, -1, -1) if reverse
                else range(1, len(layer_lists)))
        for li in lsel:
            members = layer_lists[li]
            r = math.inf if align_right else -math.inf
            it = reversed(members) if align_right else iter(members)
            for v in it:
                if align[v] != v:
                    continue
                neis = nbrs[v]
                nn = len(neis)
                if nn == 0:
                    continue
                if nn == 1:
                    medians = (neis[0],)
                else:
                    xs = np.array([x[u] for u in neis])
                    inds = np.argsort(xs, kind="stable")
                    if nn % 2 == 1:
                        medians = (neis[inds[nn // 2]],)
                    elif align_right:
                        medians = (neis[inds[nn // 2]],
                                   neis[inds[nn // 2 - 1]])
                    else:
                        medians = (neis[inds[nn // 2 - 1]],
                                   neis[inds[nn // 2]])
                for mv in medians:
                    if align[v] != v:
                        continue
                    pair = (mv, v) if not reverse else (v, mv)
                    if pair in ignored_pairs:
                        continue
                    pos = x[mv]
                    if (align_right and r > pos) or \
                            (not align_right and r < pos):
                        align[mv] = v
                        roots[v] = roots[mv]
                        align[v] = roots[mv]
                        r = pos
        return roots, align

    def compaction(roots, align):
        sinks = np.arange(n_sub, dtype=np.int64)
        shifts = np.full(n_sub, np.inf)
        xs = np.full(n_sub, -1.0)

        def place_block(v0):
            # iterative version of sugiyama.c's recursive place_block
            stack = [(v0, v0, True)]
            while stack:
                v, w, entering = stack.pop()
                if entering:
                    if xs[v] >= 0:
                        continue
                    xs[v] = 0.0
                    w = v
                # walk the block from w
                while True:
                    u = left[w]
                    if u != w:
                        u = roots[u]
                        if xs[u] < 0:
                            # recurse into u's block, then resume at w
                            stack.append((v, w, False))
                            stack.append((u, u, True))
                            break
                        u_sink = sinks[u]
                        v_sink = sinks[v]
                        if v_sink == v:
                            sinks[v] = v_sink = u_sink
                        if v_sink != u_sink:
                            cand = xs[v] - xs[u] - hgap
                            if shifts[u_sink] > cand:
                                shifts[u_sink] = cand
                        elif xs[v] < xs[u] + hgap:
                            xs[v] = xs[u] + hgap
                    w = align[w]
                    if w == v:
                        break

        for i in range(n_sub):
            if roots[i] == i:
                place_block(i)
        out = xs[roots].copy()
        sh = shifts[sinks[roots]]
        out[np.isfinite(sh)] += sh[np.isfinite(sh)]
        return out

    xs4 = []
    for i in range(4):
        roots, align = vertical_alignment(bool(i // 2), bool(i % 2))
        xs4.append(compaction(roots, align))

    mins = np.array([v.min() for v in xs4])
    maxs = np.array([v.max() for v in xs4])
    j = int(np.argmin(maxs - mins))
    for i in range(4):
        if i == j:
            continue
        xs4[i] += (mins[j] - mins[i]) if i % 2 == 0 else (maxs[j] - maxs[i])
    q = np.sort(np.stack(xs4, axis=0), axis=0)
    return (q[1] + q[2]) / 2.0


def layout_sugiyama(edges, n: int, layers=None, hgap: float = 1.0,
                    vgap: float = 1.0, maxiter: int = 100, weights=None,
                    directed: bool = True, return_extended: bool = False):
    """Sugiyama layered layout (igraph_layout_sugiyama,
    src/sugiyama.c:244): (1) layer assignment (given, or Eades
    feedback-arc ordering + longest path for directed / strength-
    ordered BFS for undirected), (2) per weak component: dummy
    vertices so every edge spans exactly one layer downward,
    (3) barycenter crossing-minimization sweeps (maxiter), (4)
    Brandes-Kopf horizontal coordinates, components offset left to
    right by hgap.

    Returns an ``(n + n_dummy, 2)`` float64 array — first ``n`` rows
    are the real vertices, the rest the dummy bend points, same
    contract as the reference's ``res``.  With
    ``return_extended=True`` also returns the extended edge table
    ``(m, 2)`` int64 and the map from extended edges to original edge
    ids, mirroring ``extd_graph`` / ``extd_to_orig_eids``.

    Pinned divergences (documented): GLPK layer compaction is
    replaced by the reference's own non-GLPK fallback; within-layer
    sort ties are stable (reference qsort is unstable); incident-edge
    visit order is (neighbor id, edge id) ascending; the type-1
    conflict scan fixes the reference's per-layer/global edge-id
    confusion (see _bk_place)."""
    src, dst = _edges_np(edges)
    wvec = None if weights is None else np.asarray(weights, np.float64)

    if layers is not None:
        layers_own = np.asarray(layers, dtype=np.float64)
        if len(layers_own) != n:
            raise ValueError("layer vector too short or too long")
    elif directed:
        layers_own = _sugiyama_layers_directed(n, src, dst, wvec) \
            .astype(np.float64)
    else:
        layers_own = _sugiyama_layers_undirected(n, src, dst, wvec) \
            .astype(np.float64)

    # normalize: eliminate empty layers, remember original spacing
    if n > 0:
        uniq = np.unique(layers_own)
        dense = np.searchsorted(uniq, layers_own).astype(np.int64)
        layer_to_y = uniq * vgap
    else:
        dense = np.zeros(0, np.int64)
        layer_to_y = np.zeros(0)

    membership = _components_np(n, src, dst)

    # out-edge CSR with original edge ids, visit order (nbr, eid)
    m_all = len(src)
    eids = np.arange(m_all, dtype=np.int64)
    if directed:
        o = np.lexsort((eids, dst, src))
        inc_from, inc_to, inc_eid = src[o], dst[o], eids[o]
    else:
        inc_from = np.concatenate([src, dst])
        inc_to = np.concatenate([dst, src])
        both_eid = np.concatenate([eids, eids])
        # visit each edge once (nei < i skip); a self-loop appears
        # identically in both halves, so keep only its first copy
        is_first_half = np.arange(2 * m_all) < m_all
        keep = (inc_to > inc_from) | ((inc_to == inc_from) & is_first_half)
        inc_from, inc_to = inc_from[keep], inc_to[keep]
        inc_eid = both_eid[keep]
        o = np.lexsort((inc_eid, inc_to, inc_from))
        inc_from, inc_to, inc_eid = inc_from[o], inc_to[o], inc_eid[o]
    ptr = np.zeros(n + 1, np.int64)
    np.cumsum(np.bincount(inc_from, minlength=n), out=ptr[1:])

    res_x = np.zeros(n)
    res_y = np.zeros(n)
    dummy_x: list = []
    dummy_y: list = []
    extd_edges: list = []
    extd_orig: list = []
    n_dummies_global = 0
    dx = 0.0

    for comp in np.unique(membership).tolist():
        nodes = np.flatnonzero(membership == comp)
        comp_size = len(nodes)
        old2new = {int(v): i for i, v in enumerate(nodes.tolist())}
        new_layers = [int(dense[v]) for v in nodes.tolist()]
        e_src_l: list = []
        e_dst_l: list = []
        next_new = comp_size

        for i in nodes.tolist():
            for j in range(ptr[i], ptr[i + 1]):
                nei = int(inc_to[j])
                eid = int(inc_eid[j])
                li, ln = int(dense[i]), int(dense[nei])
                if li == ln:
                    if return_extended:
                        extd_edges.append((i, nei))
                        extd_orig.append(eid)
                    continue
                if li > ln:  # upward: flip and subdivide
                    lo, hi, head, tail = ln, li, nei, i
                else:
                    lo, hi, head, tail = li, ln, i, nei
                prev = old2new[head]
                for lay in range(lo + 1, hi):
                    new_layers.append(lay)
                    n_dummies_global += 1
                    e_src_l.append(prev)
                    e_dst_l.append(next_new)
                    prev = next_new
                    next_new += 1
                e_src_l.append(prev)
                e_dst_l.append(old2new[tail])
                if return_extended:
                    span = hi - lo
                    gids = [n + n_dummies_global - span + 1 + k
                            for k in range(span - 1)]
                    if li > ln:
                        path = [i] + gids[::-1] + [nei]
                    else:
                        path = [i] + gids + [nei]
                    for a, b in zip(path, path[1:]):
                        extd_edges.append((a, b))
                        extd_orig.append(eid)

        n_sub = next_new
        e_src = np.array(e_src_l, dtype=np.int64)
        e_dst = np.array(e_dst_l, dtype=np.int64)
        layer_of = np.array(new_layers, dtype=np.int64)

        # layer member lists (new ids ascending = creation order)
        n_layers = int(layer_of.max()) + 1 if n_sub else 0
        layer_lists: list = [[] for _ in range(n_layers)]
        for v in range(n_sub):
            layer_lists[layer_of[v]].append(v)

        # first-seen ordering
        x = np.zeros(n_sub, dtype=np.float64)
        for members in layer_lists:
            for pos, v in enumerate(members):
                x[v] = pos

        up_nbr: list = [[] for _ in range(n_sub)]
        dn_nbr: list = [[] for _ in range(n_sub)]
        for u, v in zip(e_src.tolist(), e_dst.tolist()):
            dn_nbr[u].append(v)
            up_nbr[v].append(u)

        # barycenter sweeps (order_nodes_horizontally)
        changed, it = True, 0
        while changed and it < maxiter:
            changed = False
            for li in range(1, n_layers):  # down, upper barycenters
                members = layer_lists[li]
                if not members:
                    continue
                b = np.array([np.mean(x[up_nbr[v]]) if up_nbr[v]
                              else x[v] for v in members])
                order = np.argsort(b, kind="stable")
                new_members = [members[k] for k in order.tolist()]
                for pos, v in enumerate(new_members):
                    x[v] = pos
                if new_members != members:
                    layer_lists[li] = new_members
                    changed = True
            for li in range(n_layers - 2, -1, -1):  # up, lower bary
                members = layer_lists[li]
                if not members:
                    continue
                b = np.array([np.mean(x[dn_nbr[v]]) if dn_nbr[v]
                              else x[v] for v in members])
                order = np.argsort(b, kind="stable")
                new_members = [members[k] for k in order.tolist()]
                for pos, v in enumerate(new_members):
                    x[v] = pos
                if new_members != members:
                    layer_lists[li] = new_members
                    changed = True
            it += 1

        fx = _bk_place(n_sub, e_src, e_dst, layer_of, layer_lists,
                       x, comp_size, hgap)
        # normalize so this component starts at dx (BK's median-of-4
        # can go negative; without this, components could overlap)
        fx = fx - fx.min()

        dx2 = dx
        for new_id, old in enumerate(nodes.tolist()):
            res_x[old] = fx[new_id] + dx
            res_y[old] = layer_to_y[layer_of[new_id]]
            dx2 = max(dx2, res_x[old])
        for k in range(comp_size, n_sub):
            gx = fx[k] + dx
            dummy_x.append(gx)
            dummy_y.append(layer_to_y[layer_of[k]])
            dx2 = max(dx2, gx)
        dx = dx2 + hgap

    coords = np.stack([
        np.concatenate([res_x, np.array(dummy_x)]),
        np.concatenate([res_y, np.array(dummy_y)]),
    ], axis=1)
    if not return_extended:
        return coords
    ee = (np.array(extd_edges, dtype=np.int64).reshape(-1, 2)
          if extd_edges else np.zeros((0, 2), np.int64))
    return coords, ee, np.array(extd_orig, dtype=np.int64)
