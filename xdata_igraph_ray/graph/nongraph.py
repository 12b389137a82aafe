"""Non-graph helper surface of the reference (igraph_nongraph.h):
running mean, seeded sampling/shuffle, 2-D convex hull.  power_law_fit
lives in graph/plfit.py.  All are driver-side numpy utilities — they
operate on small driver vectors in the reference too."""

from __future__ import annotations

import numpy as np

__all__ = [
    "running_mean",
    "random_sample",
    "fisher_yates_shuffle",
    "convex_hull",
]


def running_mean(data, binwidth: int) -> np.ndarray:
    """res[i] = mean(data[i : i+binwidth]) (igraph_running_mean,
    src/other.c:38-88)."""
    data = np.asarray(data, dtype=np.float64)
    if binwidth < 1:
        raise ValueError("binwidth must be at least 1")
    if len(data) < binwidth:
        raise ValueError("binwidth longer than the data")
    c = np.concatenate(([0.0], np.cumsum(data)))
    return (c[binwidth:] - c[:-binwidth]) / binwidth


def random_sample(l: int, h: int, length: int,
                  seed: int = 42) -> np.ndarray:
    """``length`` distinct integers from [l, h], ascending
    (igraph_random_sample, src/random.c:1015 — sequential sampling
    there, seeded numpy choice here; pinned RNG divergence, same
    distribution)."""
    total = h - l + 1
    if length > total:
        raise ValueError("sample length exceeds the range size")
    rng = np.random.default_rng(seed)
    return np.sort(rng.choice(total, size=length, replace=False)) + l


def fisher_yates_shuffle(data, seed: int = 42) -> np.ndarray:
    """Uniform random permutation of ``data``
    (igraph_fisher_yates_shuffle, src/random.c; seeded numpy)."""
    data = np.asarray(data)
    rng = np.random.default_rng(seed)
    return data[rng.permutation(len(data))]


def convex_hull(points) -> np.ndarray:
    """Indices of the convex-hull corners of 2-D ``points`` (n, 2),
    counterclockwise (igraph_convex_hull, src/other.c:92-240 — Graham
    scan there, Andrew monotone chain here; same corner set, pinned
    start/orientation: begins at the lexicographically smallest
    (x, y) point, counterclockwise).  Collinear boundary points are
    dropped like the reference's strict turns."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    if n < 3:
        return order.astype(np.int64)

    def cross(o, a, b):
        return ((pts[a, 0] - pts[o, 0]) * (pts[b, 1] - pts[o, 1])
                - (pts[a, 1] - pts[o, 1]) * (pts[b, 0] - pts[o, 0]))

    lower: list[int] = []
    for i in order.tolist():
        while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(i)
    upper: list[int] = []
    for i in order[::-1].tolist():
        while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(i)
    return np.asarray(lower[:-1] + upper[:-1], dtype=np.int64)
