"""The remaining force/annealing layout family — reference:
igraph_layout_gem (src/layout_gem.c:60), igraph_layout_davidson_harel
(src/layout_dh.c:130), igraph_layout_graphopt (src/layout.c:1561),
igraph_layout_lgl (src/layout.c:439), igraph_layout_merge_dla
(src/layout.c:1693), igraph_layout_kamada_kawai_3d
(src/layout_kk.c:330), igraph_layout_drl (src/drl_layout.cpp, the
public OpenOrd/DrL algorithm).

Like layout.py: coordinate TABLES (n, dim) ndarrays, deterministic
per seed.  Layouts are small/medium-graph visual aids in the
reference; they are driver-side numpy kernels here, with
layout.py's ``layout_dataset`` remaining the distributed path for the
closed-form layouts.  Pinned divergence throughout: seeded numpy RNG
replaces the reference's RNG stream (same update rules, different
draws).  igraph_layout_springs is NOT implemented — the reference
itself raises IGRAPH_UNIMPLEMENTED (src/layout.c:370-380).
"""

from __future__ import annotations

import math

import numpy as np

from .layout import _edges_np, layout_random


def _und_adj(src, dst, n):
    adj = [[] for _ in range(n)]
    for u, v in zip(src.tolist(), dst.tolist()):
        if u == v:
            continue
        adj[u].append(v)
        adj[v].append(u)
    return adj


# ------------------------------------------------------------------ GEM


def layout_gem(edges, n: int, maxiter: int | None = None,
               temp_max: float | None = None, temp_min: float = 0.1,
               temp_init: float | None = None, seed: int = 42,
               pos: np.ndarray | None = None) -> np.ndarray:
    """GEM (graph embedder) — src/layout_gem.c:60.  Per-step: pick a
    vertex from a shuffled permutation, apply gravity toward the
    barycenter scaled by phi = deg*(deg/2+1), random jitter, pairwise
    repulsion elen^2/d^2, attraction d^2/(elen^2*phi) to neighbors;
    adaptive per-vertex temperature with oscillation/rotation
    detection (the sigma/alpha gauges of the reference)."""
    if maxiter is None:
        maxiter = 40 * n * n
    if temp_max is None:
        temp_max = max(n, 1)
    if temp_init is None:
        temp_init = max(math.sqrt(max(n, 1)), temp_min + 1e-9)
    temp_max = max(temp_max, temp_init)
    if n == 0:
        return np.zeros((0, 2))
    rng = np.random.default_rng(seed)
    src, dst = _edges_np(edges)
    adj = _und_adj(src, dst, n)
    deg = np.array([len(a) for a in adj], np.float64)
    phi = deg * (deg / 2.0 + 1.0)
    phi[phi == 0] = 1.0
    elen2 = 128.0 * 128.0
    gamma = 1.0 / 16.0
    alpha_o, alpha_r = math.pi, math.pi / 3.0
    sigma_o, sigma_r = 1.0 / 3.0, 1.0 / (2.0 * n)

    if pos is None:
        w = n * 100.0
        P = rng.uniform(-w, w, (n, 2))
    else:
        P = np.asarray(pos, np.float64).copy()
    bary = P.sum(axis=0)
    temp = np.full(n, temp_init)
    impulse = np.zeros((n, 2))
    skew = np.zeros(n)
    temp_global = temp_init * n
    perm: list[int] = []
    it = maxiter
    while temp_global > temp_min * n and it > 0:
        if not perm:
            perm = list(rng.permutation(n))
        v = int(perm.pop())
        p = (bary / n - P[v]) * gamma * phi[v]
        p += rng.uniform(-32.0, 32.0, 2)
        d = P[v] - P                      # (n,2)
        dist2 = (d * d).sum(axis=1)
        mask = (dist2 != 0)
        mask[v] = False
        p += (d[mask] * (elen2 / dist2[mask])[:, None]).sum(axis=0)
        for u in adj[v]:
            du = P[v] - P[u]
            p -= du * ((du * du).sum() / (elen2 * phi[v]))
        if p[0] != 0 or p[1] != 0:
            plen = math.hypot(p[0], p[1])
            p = p * (temp[v] / plen)
            P[v] += p
            bary += p
        pv = impulse[v]
        if pv[0] != 0 or pv[1] != 0:
            beta = math.atan2(pv[1] - p[1], pv[0] - p[0])
            sb, cb = math.sin(beta), math.cos(beta)
            old = temp[v]
            if sb >= math.sin(math.pi / 2 + alpha_r / 2.0):
                skew[v] += sigma_r * (1 if sb > 0 else (-1 if sb < 0 else 0))
            if abs(cb) >= math.cos(alpha_o / 2.0):
                temp[v] *= sigma_o * cb
            temp[v] *= (1 - abs(skew[v]))
            temp[v] = min(temp[v], temp_max)
            impulse[v] = p
            temp_global += temp[v] - old
        it -= 1
    return P


# ------------------------------------------------------- Davidson-Harel


def _seg_intersect(p1, p2, q1, q2) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)
    return (orient(p1, p2, q1) * orient(p1, p2, q2) < 0
            and orient(q1, q2, p1) * orient(q1, q2, p2) < 0)


def _pt_seg_dist2(p, a, b) -> float:
    ab = (b[0] - a[0], b[1] - a[1])
    den = ab[0] * ab[0] + ab[1] * ab[1]
    if den == 0:
        d = (p[0] - a[0], p[1] - a[1])
        return max(d[0] * d[0] + d[1] * d[1], 1e-12)
    t = max(0.0, min(1.0, ((p[0] - a[0]) * ab[0] + (p[1] - a[1]) * ab[1]) / den))
    dx = p[0] - (a[0] + t * ab[0])
    dy = p[1] - (a[1] + t * ab[1])
    return max(dx * dx + dy * dy, 1e-12)


def layout_davidson_harel(edges, n: int, maxiter: int = 10,
                          fineiter: int | None = None,
                          cool_fact: float = 0.75,
                          weight_node_dist: float = 1.0,
                          weight_border: float = 0.0,
                          weight_edge_lengths: float | None = None,
                          weight_edge_crossings: float | None = None,
                          weight_node_edge_dist: float | None = None,
                          seed: int = 42,
                          pos: np.ndarray | None = None) -> np.ndarray:
    """Davidson-Harel simulated annealing — src/layout_dh.c:130: each
    round shuffles the vertices and tries 30 compass moves of radius
    move_radius per vertex, accepting on the five-term energy delta
    (node-node 1/d^2, borderlines, edge length d^2, edge crossings,
    node-edge 1/d^2 in the fine-tuning rounds); Metropolis acceptance
    exp(-dE/move_radius) in the coarse rounds."""
    src, dst = _edges_np(edges)
    m = len(src)
    dens = m / max(n * (n - 1) / 2.0, 1)
    if fineiter is None:
        fineiter = max(10, int(math.log2(max(n, 2))))
    if weight_edge_lengths is None:
        weight_edge_lengths = dens / 10.0
    if weight_edge_crossings is None:
        weight_edge_crossings = 1.0 - math.sqrt(dens)
    if weight_node_edge_dist is None:
        weight_node_edge_dist = 0.2 * (1 - dens)
    if n == 0:
        return np.zeros((0, 2))
    rng = np.random.default_rng(seed)
    width = math.sqrt(n) * 10.0
    height = width
    adj = _und_adj(src, dst, n)
    if pos is None:
        P = rng.uniform(-width / 2, width / 2, (n, 2))
    else:
        P = np.asarray(pos, np.float64).copy()
    no_tries = 30
    tries = [(math.cos(2 * math.pi / no_tries * i),
              math.sin(2 * math.pi / no_tries * i))
             for i in range(no_tries)]
    move_radius = width / 2
    for rnd in range(maxiter + fineiter):
        perm = rng.permutation(n)
        fine = rnd >= maxiter
        if fine:
            span = P.max(axis=0) - P.min(axis=0)
            move_radius = 0.01 * max(min(span[0], span[1]), 1e-9)
        for v in perm:
            v = int(v)
            order = rng.permutation(no_tries)
            for ti in order:
                tx, ty = tries[int(ti)]
                ox, oy = P[v]
                nx = min(max(ox + move_radius * tx, -width / 2), width / 2 - 1e-6)
                ny = min(max(oy + move_radius * ty, -height / 2), height / 2 - 1e-6)
                dE = 0.0
                if weight_node_dist != 0:
                    d = P - [ox, oy]
                    od2 = (d * d).sum(axis=1)
                    d = P - [nx, ny]
                    nd2 = (d * d).sum(axis=1)
                    od2[v] = nd2[v] = 1.0
                    od2 = np.maximum(od2, 1e-12)
                    nd2 = np.maximum(nd2, 1e-12)
                    dE += weight_node_dist * (1.0 / nd2 - 1.0 / od2).sum()
                if weight_border != 0:
                    def bterm(x, y):
                        ds = [width / 2 - x, x + width / 2,
                              height / 2 - y, y + height / 2]
                        return sum(1.0 / (max(dd, 2.0 if dd < 0 else dd) ** 2)
                                   for dd in ds)
                    dE += weight_border * (bterm(nx, ny) - bterm(ox, oy))
                if weight_edge_lengths != 0:
                    for u in adj[v]:
                        od2 = (ox - P[u][0]) ** 2 + (oy - P[u][1]) ** 2
                        nd2 = (nx - P[u][0]) ** 2 + (ny - P[u][1]) ** 2
                        dE += weight_edge_lengths * (nd2 - od2)
                if weight_edge_crossings != 0:
                    no = 0
                    for u in adj[v]:
                        for e in range(m):
                            a, b = int(src[e]), int(dst[e])
                            if v in (a, b) or u in (a, b):
                                continue
                            no -= _seg_intersect((ox, oy), P[u], P[a], P[b])
                            no += _seg_intersect((nx, ny), P[u], P[a], P[b])
                    dE += weight_edge_crossings * no
                if weight_node_edge_dist != 0 and fine:
                    for e in range(m):
                        a, b = int(src[e]), int(dst[e])
                        if v in (a, b):
                            continue
                        dE -= weight_node_edge_dist / _pt_seg_dist2(
                            (ox, oy), P[a], P[b])
                        dE += weight_node_edge_dist / _pt_seg_dist2(
                            (nx, ny), P[a], P[b])
                    for u in adj[v]:
                        for w in range(n):
                            if w == v or w == u:
                                continue
                            dE -= weight_node_edge_dist / _pt_seg_dist2(
                                P[w], (ox, oy), P[u])
                            dE += weight_node_edge_dist / _pt_seg_dist2(
                                P[w], (nx, ny), P[u])
                if dE < 0 or (not fine
                              and rng.random() < math.exp(-dE / move_radius)):
                    P[v] = (nx, ny)
        move_radius *= cool_fact
    return P


# -------------------------------------------------------------- graphopt


def layout_graphopt(edges, n: int, niter: int = 500,
                    node_charge: float = 0.001, node_mass: float = 30.0,
                    spring_length: float = 0.0,
                    spring_constant: float = 1.0,
                    max_sa_movement: float = 5.0, seed: int = 42,
                    pos: np.ndarray | None = None) -> np.ndarray:
    """graphopt physics layout — src/layout.c:1561: Coulomb repulsion
    k*q^2/d^2 between all pairs closer than 500, spring force
    -k_s*|d-L| along each edge (halved, flipped when compressed),
    Newton displacement F/mass clipped to max_sa_movement per axis."""
    COULOMB = 8987500000.0      # src/layout.c:1257
    rng = np.random.default_rng(seed)
    src, dst = _edges_np(edges)
    if pos is None:
        P = rng.uniform(-1, 1, (n, 2))
    else:
        P = np.asarray(pos, np.float64).copy()
    L = int(spring_length)
    for _ in range(niter):
        F = np.zeros((n, 2))
        if node_charge != 0:
            diff = P[:, None, :] - P[None, :, :]       # this - other
            dist = np.sqrt((diff * diff).sum(axis=2))
            with np.errstate(divide="ignore", invalid="ignore"):
                mag = COULOMB * node_charge * node_charge / (dist ** 2)
                unit = diff / dist[:, :, None]
            ok = (dist != 0) & (dist < 500.0)
            np.fill_diagonal(ok, False)
            contrib = np.where(ok[:, :, None], mag[:, :, None] * unit, 0.0)
            F += contrib.sum(axis=1)
        for e in range(len(src)):
            a, b = int(src[e]), int(dst[e])
            d = P[a] - P[b]
            dist = math.hypot(d[0], d[1])
            if dist == 0 or dist == L:
                continue
            disp = abs(dist - L)
            mag = spring_constant * disp
            unit = d / dist
            f = 0.5 * mag * unit          # on a, toward/away from b
            if dist > L:
                f = -f                     # too long: pull together
            F[a] += f
            F[b] -= f
        P += np.clip(F / node_mass, -max_sa_movement, max_sa_movement)
    return P


# ------------------------------------------------------------------ LGL


def layout_lgl(edges, n: int, maxit: int = 150,
               maxdelta: float | None = None, area: float | None = None,
               coolexp: float = 1.5, repulserad: float | None = None,
               root: int = -1, seed: int = 42) -> np.ndarray:
    """Large Graph Layout — src/layout.c:439: BFS layers of a
    spanning tree from ``root``; layer by layer, new vertices start
    at their parent plus a unit step away from the barycenter, then
    the placed set relaxes with FR forces (frk = sqrt(area/n)) under
    a per-iteration cooling cap.  Pinned divergences: the 2d bucket
    grid is replaced by exact pairwise repulsion over the placed set
    (identical forces, no neighborhood cutoff), and the spanning tree
    is BFS rather than unweighted-MST (identical on connected simple
    graphs, src/spanning_trees.c falls back to BFS order too)."""
    if n == 0:
        return np.zeros((0, 2))
    rng = np.random.default_rng(seed)
    if maxdelta is None:
        maxdelta = float(n)
    if area is None:
        area = float(n) ** 2
    if repulserad is None:
        repulserad = area * n
    src, dst = _edges_np(edges)
    adj = _und_adj(src, dst, n)
    if root < 0:
        root = int(rng.integers(0, n))
    # BFS layers + parents
    layer = np.full(n, -1, np.int64)
    parent = np.full(n, -1, np.int64)
    layer[root] = 0
    frontier = [root]
    order = [root]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if layer[v] < 0:
                    layer[v] = layer[u] + 1
                    parent[v] = u
                    nxt.append(v)
                    order.append(v)
        frontier = nxt
    unreached = np.flatnonzero(layer < 0)
    frk = math.sqrt(area / n)
    P = rng.uniform(-1, 1, (n, 2)) * 1e-3
    P[root] = 0.0
    placed = layer == 0
    no_layers = int(layer.max()) + 1 if n else 1
    for act in range(1, no_layers):
        newly = np.flatnonzero(layer == act)
        center = P[placed].mean(axis=0)
        for v in newly:
            pv = P[parent[v]]
            d = pv - center
            norm = math.hypot(d[0], d[1])
            step = d / norm if norm > 0 else rng.uniform(-1, 1, 2)
            P[v] = pv + step * frk + rng.uniform(-0.1, 0.1, 2) * frk
        placed = placed | (layer == act)
        idx = np.flatnonzero(placed)
        sub = {int(u): k for k, u in enumerate(idx)}
        sedges = [(sub[int(a)], sub[int(b)])
                  for a, b in zip(src, dst)
                  if placed[a] and placed[b] and a != b]
        Q = P[idx]
        k = len(idx)
        for it in range(1, maxit + 1):
            t = maxdelta * (it / maxit) ** (-coolexp)
            diff = Q[:, None, :] - Q[None, :, :]
            dist2 = (diff * diff).sum(axis=2)
            np.fill_diagonal(dist2, 1.0)
            rep = diff * (frk * frk / dist2)[:, :, None]
            np.einsum("iij->ij", rep)[:] = 0.0
            D = rep.sum(axis=1)
            for a, b in sedges:
                d = Q[a] - Q[b]
                dd = math.hypot(d[0], d[1])
                if dd == 0:
                    continue
                f = d * (dd / frk)
                D[a] -= f
                D[b] += f
            lens = np.sqrt((D * D).sum(axis=1))
            big = lens > t
            D[big] *= (t / lens[big])[:, None]
            Q += D
        P[idx] = Q
    # unreached components: ring far outside, like a disconnected FR
    if len(unreached):
        R = 2.0 * math.sqrt(area)
        ang = np.linspace(0, 2 * math.pi, len(unreached), endpoint=False)
        P[unreached, 0] = R * np.cos(ang)
        P[unreached, 1] = R * np.sin(ang)
    return P


# -------------------------------------------------------------- KK (3d)


def layout_kamada_kawai_3d(edges, n: int, maxiter: int | None = None,
                           epsilon: float = 0.0,
                           kkconst: float | None = None, weights=None,
                           pos: np.ndarray | None = None) -> np.ndarray:
    """Kamada-Kawai in 3d — src/layout_kk.c:330: same localized
    Newton scheme as the 2d kernel (spring lengths L*d_ij with
    L = sqrt(n)/max d, strengths K/d_ij^2), solving the 3x3 system of
    the vertex with the largest stress gradient each iteration;
    starts from the sphere layout when no seed is given (RNG-free)."""
    from .layout import _all_pairs_dist, layout_sphere
    if maxiter is None:
        maxiter = max(50 * n, 200)
    if kkconst is None:
        kkconst = max(n, 1)
    if n == 0:
        return np.zeros((0, 3))
    dij = _all_pairs_dist(n, *_edges_np(edges), weights=weights)
    max_dij = np.nanmax(np.where(np.isfinite(dij), dij, np.nan))
    dij = np.where(np.isfinite(dij), dij, max_dij)
    L = (math.sqrt(n) / max_dij) if max_dij > 0 else 1.0
    lij = L * dij
    np.fill_diagonal(lij, 0.0)
    with np.errstate(divide="ignore"):
        kij = kkconst / (dij ** 2)
    np.fill_diagonal(kij, 0.0)
    P = layout_sphere(n).astype(np.float64) if pos is None \
        else np.asarray(pos, np.float64).copy()
    # gradient cache
    D = np.zeros((n, 3))
    for m_ in range(n):
        d = P[m_] - P
        dist = np.sqrt((d * d).sum(axis=1))
        dist[m_] = 1.0
        coef = kij[m_] * (1.0 - lij[m_] / dist)
        coef[m_] = 0.0
        D[m_] = (coef[:, None] * d).sum(axis=0)
    for _ in range(maxiter):
        g2 = (D * D).sum(axis=1)
        m_ = int(np.argmax(g2))
        if epsilon > 0 and g2[m_] < epsilon * epsilon:
            break
        # 3x3 Hessian of vertex m_
        d = P[m_] - P
        dist = np.sqrt((d * d).sum(axis=1))
        dist[m_] = 1.0
        dist3 = dist ** 3
        k = kij[m_].copy()
        k[m_] = 0.0
        l = lij[m_]
        H = np.zeros((3, 3))
        for a in range(3):
            for b in range(3):
                if a == b:
                    H[a, a] = (k * (1 - l / dist + l * d[:, a] ** 2 / dist3)).sum()
                else:
                    H[a, b] = (k * l * d[:, a] * d[:, b] / dist3).sum()
        try:
            delta = np.linalg.solve(H, -D[m_])
        except np.linalg.LinAlgError:
            break
        # old pair terms of m_ (term_m(v) = coef * (P[m]-P[v]); the
        # matching term in D[v] is its negative) — remove, move, re-add
        coef_old = kij[m_] * (1.0 - lij[m_] / dist)
        coef_old[m_] = 0.0
        old_c = coef_old[:, None] * d
        D += old_c                    # D[v] -= term_v(m) == += term_m(v)
        P[m_] += delta
        d = P[m_] - P
        dist = np.sqrt((d * d).sum(axis=1))
        dist[m_] = 1.0
        coef = kij[m_] * (1.0 - lij[m_] / dist)
        coef[m_] = 0.0
        new_c = coef[:, None] * d
        D -= new_c                    # D[v] += term_v(m) == -= term_m(v)
        D[m_] = new_c.sum(axis=0)     # gradient of the moved vertex
    return P


# ---------------------------------------------------------------- DrL


def layout_drl(edges, n: int, seed: int = 42,
               options: dict | None = None, dim: int = 2) -> np.ndarray:
    """DrL / OpenOrd — src/drl_layout.cpp (public OpenOrd schedule):
    five phases (liquid, expansion, cooldown, crunch, simmer) with the
    default iteration/temperature/attraction/damping schedule of
    drl_parse.cpp, force model = attraction d^2/att along edges +
    density-grid repulsion (approximated here by exact pairwise
    repulsion with the same temperature-capped jump, a pinned
    divergence from the bucketed density server; identical model,
    different neighborhood truncation).  Edge cutting: the ``cut``
    fraction of longest edges is ignored during expansion/cooldown,
    mirroring real_parm cut handling."""
    defaults = {
        "edge_cut": 32.0 / 40.0,
        "init_iterations": 0,
        "liquid": (200, 2000.0, 2.0, 1.0),       # iters, temp, att, damp
        "expansion": (200, 2000.0, 10.0, 1.0),
        "cooldown": (200, 2000.0, 1.0, 0.1),
        "crunch": (50, 250.0, 1.0, 0.25),
        "simmer": (100, 250.0, 0.5, 0.0),
    }
    if options:
        defaults.update(options)
    rng = np.random.default_rng(seed)
    src, dst = _edges_np(edges)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    P = rng.uniform(-100.0, 100.0, (n, dim))
    m = len(src)
    for phase in ("liquid", "expansion", "cooldown", "crunch", "simmer"):
        iters, temp, att, damp = defaults[phase]
        cut_frac = defaults["edge_cut"] if phase in ("expansion", "cooldown") \
            else 1.0
        scale = temp / 2000.0
        for it in range(iters):
            # attraction along (possibly cut) edges
            d = P[src] - P[dst]
            elen = np.sqrt((d * d).sum(axis=1))
            if cut_frac < 1.0 and m:
                thresh = np.quantile(elen, cut_frac)
                w = (elen <= thresh).astype(np.float64)
            else:
                w = np.ones(m)
            F = np.zeros((n, dim))
            fa = d * (w * elen / max(att, 1e-9))[:, None]
            np.add.at(F, src, -fa)
            np.add.at(F, dst, fa)
            # repulsion (density proxy): inverse-square pairwise
            diff = P[:, None, :] - P[None, :, :]
            dist2 = (diff * diff).sum(axis=2)
            np.fill_diagonal(dist2, 1.0)
            rep = diff / dist2[:, :, None]
            np.einsum("iij->ij", rep)[:] = 0.0
            F += rep.sum(axis=1) * (1.0 + damp)
            step = np.sqrt((F * F).sum(axis=1))
            cap = 10.0 * scale
            big = step > cap
            F[big] *= (cap / step[big])[:, None]
            jitter = rng.uniform(-1, 1, (n, dim)) * scale * 0.1
            P += F + jitter
    return P


def layout_drl_3d(edges, n: int, seed: int = 42,
                  options: dict | None = None) -> np.ndarray:
    """DrL in three dimensions (src/drl_layout_3d.cpp /
    drl_graph_3d.cpp): the identical five-phase OpenOrd schedule and
    force model as :func:`layout_drl`, over (n, 3) coordinates — the
    reference 3d port differs from its 2d code only in the coordinate
    arity, and so does this one."""
    return layout_drl(edges, n, seed=seed, options=options, dim=3)


# ------------------------------------------------------------ merge DLA


def layout_merge_dla(layouts: list[np.ndarray], seed: int = 42) -> np.ndarray:
    """igraph_layout_merge_dla (src/layout.c:1693): merge per-component
    2d layouts — each layout becomes a disc of radius |V|^0.75,
    largest placed first at the origin, the rest walked inward from a
    random angle on the enclosing circle until they touch a placed
    disc (diffusion-limited aggregation); each sub-layout is then
    translated/scaled into its disc.  Returns the stacked (sum n, 2)
    coordinates in input order."""
    rng = np.random.default_rng(seed)
    sizes = [len(p) for p in layouts]
    radii = [max(s, 1) ** 0.75 for s in sizes]
    area = sum(r * r for r in radii)
    R = math.sqrt(5 * area)
    order = sorted(range(len(layouts)), key=lambda i: -sizes[i])
    cx = np.zeros(len(layouts))
    cy = np.zeros(len(layouts))
    placed: list[int] = []
    for idx, g in enumerate(order):
        if idx == 0:
            cx[g] = cy[g] = 0.0
            placed.append(g)
            continue
        ang = rng.uniform(0, 2 * math.pi)
        x, y = R * math.cos(ang), R * math.sin(ang)
        step = max(R / 200.0, 1e-3)
        ux, uy = -math.cos(ang), -math.sin(ang)
        lastx, lasty = x, y
        while True:
            hit = any(math.hypot(x - cx[o], y - cy[o])
                      <= radii[g] + radii[o] for o in placed)
            centered = math.hypot(x, y) < step
            if hit or centered:
                break
            lastx, lasty = x, y
            x += ux * step
            y += uy * step
        cx[g], cy[g] = lastx, lasty
        placed.append(g)
    out = []
    for i, p in enumerate(layouts):
        p = np.asarray(p, np.float64)
        if len(p) == 0:
            out.append(p.reshape(0, 2))
            continue
        c = p.mean(axis=0)
        rad = np.sqrt(((p - c) ** 2).sum(axis=1)).max()
        scale = radii[i] / rad if rad > 0 else 1.0
        out.append((p - c) * scale + [cx[i], cy[i]])
    return np.vstack(out) if out else np.zeros((0, 2))
