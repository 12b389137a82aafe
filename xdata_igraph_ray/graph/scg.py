"""Spectral coarse graining (SCG) — the second xdata spectral flagship.

Reference: igraph_scg_grouping / igraph_scg_semiprojectors /
igraph_scg_norm_eps / igraph_scg_adjacency (src/scg.c:349,737,
include/igraph_scg.h:46-89; kernels in src/scg_optimal_method.c,
scg_approximate_methods.c, scg_exact_scg.c).  SCG partitions the
vertices so that a chosen set of eigenpairs of the graph matrix is
preserved by the coarse-grained graph: per eigenvector the partition
minimizes the within-group sum of squares of the components
(exact interval DP = IGRAPH_SCG_OPTIMUM, scg_optimal_method.c:46;
constant binning = INTERV, + 1-D Lloyd refinement = INTERV_KM,
scg_approximate_methods.c:76,96; level sets = EXACT,
scg_exact_scg.c:36), and the final groups intersect the per-vector
partitions (two vertices together iff together in every partition,
scg.c:440-465 — lexicographic row dedup).

Execution shape: the grouping / semi-projector / norm kernels are
numpy translations (the reference is equally sequential, O(nt·n²)
DP); the COARSE GRAPH construction is distributed — group labels are
broadcast via ray.put and the coarse matrix
Ã[α,β] = Σ_{i∈α,j∈β} A_ij · L[α,i]·R[β,j] reduces to one
groupby-sum over the edge table keyed by (group[src], group[dst]),
which is exactly a map_batches + small groupby at any scale."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import DEFAULT_PARTITIONS, block_refs, groupby_agg


@ray.remote
def _apply(fn, tbl):
    return fn(tbl)


def _refs(ds):
    return ds if isinstance(ds, list) else block_refs(ds)


# -- grouping kernels --------------------------------------------------------


def _optimal_partition(v: np.ndarray, nt: int,
                       mtype: str = "symmetric",
                       p: np.ndarray | None = None) -> np.ndarray:
    """Exact interval DP (igraph_i_optimal_partition,
    scg_optimal_method.c:46): sort components, Cv[i,j] = within-sum-
    of-squares of the sorted slice (weighted by p for stochastic),
    DP over nt contiguous intervals, backtrack."""
    n = len(v)
    order = np.argsort(v, kind="stable")
    sv = v[order]
    non_ties = 1 + int(np.sum(np.abs(np.diff(sv)) > 1e-14))
    if nt >= non_ties:
        raise ValueError(
            "invalid number of intervals, should be smaller than the "
            "number of unique values"
        )
    if mtype == "stochastic":
        if p is None:
            raise ValueError("stochastic SCG needs p")
        ps = p[order]
        # Cv[i,j] = sum_k p (v - weighted-mean)^2 over sorted slice
        Cv = np.zeros((n, n))
        for i in range(n):
            t1 = np.cumsum(ps[i:])
            t2 = np.cumsum(ps[i:] * sv[i:])
            for j in range(i + 1, n):
                mean = t2[j - i - 1] / t1[j - i - 1]
                seg = sv[i:j]
                Cv[i, j] = float(np.sum((seg - mean) ** 2))
    else:
        w = np.concatenate(([0.0], np.cumsum(sv)))
        w2 = np.concatenate(([0.0], np.cumsum(sv * sv)))
        ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        with np.errstate(invalid="ignore", divide="ignore"):
            Cv = (w2[jj + 1] - w2[ii]) - \
                (w[jj + 1] - w[ii]) ** 2 / (jj - ii + 1)
        Cv[jj <= ii] = 0.0
    # note: the reference's Cv[i,j] covers the sorted slice [i..j]
    # INCLUSIVE for symmetric/laplacian, but [i..j) for stochastic
    # (k<j loops) — replicated above
    F = np.zeros((nt, n))
    Q = np.zeros((nt, n), dtype=np.int64)
    Q[0, :] += 1
    for i in range(min(nt, n)):
        Q[i, i] = i + 1
    F[0, :] = Cv[0, :]
    for i in range(1, nt):
        for j in range(i + 1, n):
            F[i, j] = F[i - 1, i - 1] + Cv[i, j]
            Q[i, j] = 2
            for q in range(i - 1, j):
                temp = F[i - 1, q] + Cv[q + 1, j]
                if temp < F[i, j]:
                    F[i, j] = temp
                    Q[i, j] = q + 2
    gr = np.zeros(n, dtype=np.int64)
    part_ind = nt
    col = n - 1
    for j in range(nt - 1, -1, -1):
        for i in range(Q[j, col] - 1, col + 1):
            gr[order[i]] = part_ind - 1
        if Q[j, col] != 2:
            col = Q[j, col] - 2
            part_ind -= 1
        else:
            if j > 1:
                for ell in range(j):
                    gr[order[ell]] = ell
                break
            else:
                col = Q[j, col] - 2
                part_ind -= 1
    return gr


def _intervals_method(v: np.ndarray, nt: int) -> np.ndarray:
    """Constant binning (igraph_i_intervals_method,
    scg_approximate_methods.c:96): nt equal-width bins over
    [min, max], left-open assignment."""
    n = len(v)
    lo, hi = float(v.min()), float(v.max())
    breaks = np.linspace(lo, hi, nt + 1)
    gr = np.zeros(n, dtype=np.int64)
    for i in range(n):
        x = v[i]
        a, b = 0, nt
        if x < breaks[a] or breaks[b] < x:
            continue
        while b - a >= 2:
            mid = (a + b) // 2
            if x > breaks[mid] or x == breaks[mid]:
                a = mid
            else:
                b = mid
        gr[i] = a
    return gr


def _intervals_plus_kmeans(v: np.ndarray, nt: int,
                           maxiter: int = 100) -> np.ndarray:
    """Equidistant centers + 1-D Lloyd k-means
    (igraph_i_intervals_plus_kmeans, scg_approximate_methods.c:76)."""
    lo, hi = float(v.min()), float(v.max())
    # mode-2 breaks: nt equidistant CENTERS
    centers = lo + (np.arange(nt) + 0.5) * (hi - lo) / nt
    gr = np.zeros(len(v), dtype=np.int64)
    for _ in range(maxiter):
        d = np.abs(v[:, None] - centers[None, :])
        new = np.argmin(d, axis=1)
        if np.array_equal(new, gr):
            gr = new
            break
        gr = new
        for c in range(nt):
            sel = v[gr == c]
            if len(sel):
                centers[c] = sel.mean()
    return gr


def _exact_groups(v: np.ndarray) -> np.ndarray:
    """Level sets with 1e-14 tolerance (igraph_i_exact_coarse_graining,
    scg_exact_scg.c:36)."""
    order = np.argsort(v, kind="stable")
    sv = v[order]
    gr = np.zeros(len(v), dtype=np.int64)
    g = 0
    gr[order[0]] = 0
    for i in range(1, len(v)):
        if abs(sv[i] - sv[i - 1]) > 1e-14:
            g += 1
        gr[order[i]] = g
    return gr


def scg_grouping(
    V: np.ndarray,
    nt: int | list[int],
    mtype: str = "symmetric",
    algo: str = "optimum",
    p: np.ndarray | None = None,
    maxiter: int = 100,
) -> np.ndarray:
    """Final SCG partition for eigenvector matrix V (n x nev) —
    igraph_scg_grouping (src/scg.c:349).  Per-vector minimizing
    partitions are intersected: vertices share a final group iff they
    share a group in EVERY per-vector partition; final ids follow the
    lexicographic order of the per-vector label tuples."""
    V = np.atleast_2d(np.asarray(V, dtype=np.float64))
    if V.shape[0] < V.shape[1] and V.ndim == 2 and V.shape[0] == 1:
        V = V.T
    n, nev = V.shape
    nts = [nt] * nev if np.isscalar(nt) else list(nt)
    if len(nts) == 1:
        nts = nts * nev
    cols = []
    for i in range(nev):
        v = V[:, i]
        if algo == "optimum":
            cols.append(_optimal_partition(v, int(nts[i]), mtype, p))
        elif algo == "interv":
            cols.append(_intervals_method(v, int(nts[i])))
        elif algo == "interv_km":
            cols.append(_intervals_plus_kmeans(v, int(nts[i]), maxiter))
        elif algo == "exact":
            cols.append(_exact_groups(v))
        else:
            raise ValueError(f"unknown algo {algo!r}")
    if nev == 1:
        return cols[0]
    rows = np.stack(cols, axis=1)
    _, inverse = np.unique(rows, axis=0, return_inverse=True)
    return inverse.astype(np.int64)


# -- semi-projectors ---------------------------------------------------------


def scg_semiprojectors(
    groups: np.ndarray,
    mtype: str = "symmetric",
    p: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(L, R) dense semi-projectors (igraph_scg_semiprojectors,
    src/scg.c:737): symmetric L=R with 1/sqrt(|group|); laplacian
    L=1/|group|, R=indicator; stochastic L=p-weighted, R=indicator."""
    groups = np.asarray(groups, dtype=np.int64)
    n = len(groups)
    k = int(groups.max()) + 1 if n else 0
    ind = np.zeros((k, n))
    ind[groups, np.arange(n)] = 1.0
    sizes = ind.sum(axis=1)
    if mtype == "symmetric":
        L = ind / np.sqrt(sizes)[:, None]
        return L, L.copy()
    if mtype == "laplacian":
        return ind / sizes[:, None], ind
    if mtype == "stochastic":
        if p is None:
            raise ValueError("stochastic SCG needs p")
        pw = ind * p[None, :]
        return pw / pw.sum(axis=1)[:, None], ind
    raise ValueError(f"unknown matrix type {mtype!r}")


def scg_norm_eps(V: np.ndarray, groups: np.ndarray,
                 mtype: str = "symmetric",
                 p: np.ndarray | None = None) -> np.ndarray:
    """||v_i - P v_i|| per eigenvector, P = R^T L (L R^T = I for all
    three semi-projector types) — igraph_scg_norm_eps
    (src/scg.c:912)."""
    V = np.atleast_2d(np.asarray(V, dtype=np.float64))
    if V.shape[0] == 1:
        V = V.T
    L, R = scg_semiprojectors(groups, mtype, p)
    P = R.T @ L
    return np.linalg.norm(V - P @ V, axis=0)


# -- coarse graph construction (distributed) ---------------------------------


def coarse_adjacency(
    edges: Dataset | list,
    groups: np.ndarray,
    mtype: str = "symmetric",
    p: np.ndarray | None = None,
    P: int = DEFAULT_PARTITIONS,
) -> pa.Table:
    """Coarse-grained matrix L A R^T as a sparse COO table
    (ga, gb, w): ONE distributed groupby-sum over the edge table with
    the group labels broadcast via ray.put — the construction scales
    with |E|, never materializing A."""
    groups = np.asarray(groups, dtype=np.int64)
    L, R = scg_semiprojectors(groups, mtype, p)
    lw = L[groups, np.arange(len(groups))]  # L[gamma(j), j]
    rw = R[groups, np.arange(len(groups))]
    g_ref = ray.put(groups)
    lw_ref = ray.put(lw)
    rw_ref = ray.put(rw)

    @ray.remote
    def tag(t: pa.Table, g, lwv, rwv) -> pa.Table:
        # input contract: ONE row per undirected edge; both symmetric
        # entries A[s,d] and A[d,s] contribute (same as the dense
        # build in scg_adjacency)
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        w = (t["weight"].to_numpy().astype(np.float64)
             if "weight" in t.column_names else np.ones(len(t)))
        return pa.table({
            "ga": np.concatenate((g[s], g[d])),
            "gb": np.concatenate((g[d], g[s])),
            "w": np.concatenate((w * lwv[s] * rwv[d],
                                 w * lwv[d] * rwv[s])),
        })

    tagged = [tag.remote(r, g_ref, lw_ref, rw_ref)
              for r in _refs(edges)]
    out = groupby_agg(tagged, ["ga", "gb"], [("w", "sum", "w")], P=P)
    return pa.concat_tables(ray.get(block_refs(out)))


def scg_adjacency(
    edges: Dataset | list,
    n: int,
    ev: list[int],
    nt: int | list[int],
    algo: str = "optimum",
    P: int = DEFAULT_PARTITIONS,
) -> dict:
    """Full symmetric-case SCG pipeline (igraph_scg_adjacency,
    src/scg.c): eigenvectors of the symmetric adjacency for the
    requested indices (``ev`` counted from the LARGEST algebraic
    eigenvalue, 0-based), grouping, semi-projectors, coarse graph.
    The eigensolve runs dense on the driver (small-kernel entry, like
    the reference's LAPACK path); the coarse-matrix construction is
    distributed.  Returns {groups, values, coarse (COO Table), eps}."""
    # dense symmetric adjacency from the collapsed support
    refs = _refs(edges)

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"], "dst": t["dst"],
            "w": (t["weight"]
                  if "weight" in t.column_names
                  else pa.array(np.ones(len(t)))),
        })

    A = np.zeros((n, n))
    for t in ray.get([_apply.remote(to_pairs, r) for r in refs]):
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        w = t["w"].to_numpy().astype(np.float64)
        np.add.at(A, (s, d), w)
        np.add.at(A, (d, s), w)
    vals, vecs = np.linalg.eigh(A)  # ascending algebraic
    idx = [n - 1 - e for e in ev]  # from the largest
    V = vecs[:, idx]
    vals = vals[idx]
    groups = scg_grouping(V, nt, mtype="symmetric", algo=algo)
    coarse = coarse_adjacency(edges, groups, mtype="symmetric", P=P)
    eps = scg_norm_eps(V, groups, mtype="symmetric")
    return {"groups": groups, "values": vals, "coarse": coarse,
            "eps": eps}
