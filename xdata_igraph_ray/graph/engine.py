"""Partitioned BSP graph engine: the distributed analog of igraph's
indexed edge list.

The reference's ``igraph_t`` is an edge list plus CSR/CSC index
permutations (include/igraph_datatype.h:78-88, built by
src/type_indexededgelist.c:835-877).  Here the same structure is
sharded: vertex ids are range-partitioned into P contiguous ranges
whose boundaries are chosen from the *edge* distribution (degree-based
partitioning — a hub-heavy range gets fewer vertices), and each shard
actor holds

* fwd CSR over its src range (analog of ``oi``/``os``),
* rev CSR over its dst range (analog of ``ii``/``is``),
* pre-computed per-destination-shard segmentation of both edge arrays
  (so a superstep's messages are produced partition-contiguously), and
* the per-vertex state arrays (scores / labels / frontiers) for its
  range — the attribute columns of igraph's attribute table
  (src/cattributes.c), as numpy arrays.

A superstep is scatter (pure-numpy per shard: repeat state along CSR,
``bincount``/segment-min pre-aggregation per destination shard — the
combiner that bounds hub fan-in) followed by gather (each shard sums /
mins the P pre-aggregated message blocks it receives).  Messages move
through the object store; the driver only ever sees scalars
(convergence deltas, mass sums).

Why actors and not a Ray Data ``groupby`` per superstep: the state is
a partitioned, mutated-every-iteration index that must stay resident
across supersteps (the "shared mutable index" case), and a Ray Data
all-to-all costs 10-30 s fixed per call in this environment — measured
in BASELINE.md — versus ~50 ms for this exchange.  Ingress and egress
are still Datasets (``from_edges`` consumes block refs,
``state_dataset`` re-exports state as a Dataset).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data import Dataset

from .. import schemas
from ..exchange import block_refs

DEFAULT_SHARDS = 8
_PLAN_BUCKETS = 4096


# ---------------------------------------------------------------------------
# partition planning & routing


@ray.remote
def _bucket_counts(block: pa.Table, col: str, width: int, nbuckets: int):
    from ..exchange import _coerce_arrow

    block = _coerce_arrow(block)
    if col == "both":
        v = np.concatenate(
            (block["src"].to_numpy(), block["dst"].to_numpy())
        )
    else:
        v = block[col].to_numpy()
    return np.bincount(v // width, minlength=nbuckets)


def plan_bounds(refs, n: int, P: int) -> np.ndarray:
    """Vertex-range boundaries balanced by INCIDENT edge count, both
    endpoints (degree-based repartitioning: out-hubs shrink their
    range AND in-hubs shrink theirs — balancing only by src left the
    in-hub owner's rev CSR ~10x oversized, a measured 6.4 s finalize
    straggler vs the 1.1 s median).

    The 'both' count is also exact for symmetrize=True builds: there
    shard p holds every arc whose dst falls in its range, and each
    directed input edge {a, b} lands once at owner(a) and once at
    owner(b) — i.e. shard load == endpoint occurrences in range,
    which is precisely what 'both' measures on the single-orientation
    refs.  No doubled arc table is needed for planning."""
    width = max(1, -(-n // _PLAN_BUCKETS))
    nbuckets = -(-n // width)
    counts = sum(ray.get([_bucket_counts.remote(r, "both", width, nbuckets) for r in refs]))
    cum = np.concatenate(([0], np.cumsum(counts)))
    targets = cum[-1] * np.arange(1, P) / P
    cut_buckets = np.searchsorted(cum, targets)
    bounds = np.concatenate(([0], cut_buckets * width, [n])).astype(np.int64)
    return np.maximum.accumulate(np.minimum(bounds, n))


@ray.remote
def _concat_blocks(*tbls):
    """Bundle tiny read blocks into one table (from_edges coalesce)."""
    from ..exchange import _coerce_arrow

    return pa.concat_tables(
        [_coerce_arrow(t) for t in tbls], promote_options="default"
    )


@ray.remote
def _route(block: pa.Table, bounds, col: str):
    """Split an edge block by owner(col) range; returns P sub-tables.
    Endpoints outside [0, n) fail loudly — an underestimated ``n``
    passed to from_edges must not silently drop edges."""
    from ..exchange import _coerce_arrow

    block = _coerce_arrow(block)
    P = len(bounds) - 1
    v = block[col].to_numpy()
    if len(v) and (int(v.min()) < 0 or int(v.max()) >= int(bounds[-1])):
        raise ValueError(
            f"edge endpoint {col} out of range [0, {int(bounds[-1])}): "
            f"min={int(v.min())}, max={int(v.max())} — pass a correct n"
        )
    part = np.searchsorted(bounds, v, side="right") - 1
    order = np.argsort(part, kind="stable")
    t = block.take(pa.array(order))
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    out = [t.slice(cuts[p], cuts[p + 1] - cuts[p]) for p in range(P)]
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _route_sym(block: pa.Table, bounds, collapse: bool = False):
    """Symmetrizing dst-route for rev-CSR ingest of a DIRECTED edge
    block: each undirected edge {a, b} contributes the arc (a, b) to
    owner(b) and (b, a) to owner(a) — both orientations emitted here,
    so the caller never materializes the doubled arc table (louvain's
    _symmetrize copied 2x the edges into the object store before
    routing).  A self-loop (v, v) lands twice as two weight-w arcs —
    equivalent to the 1-arc/2w convention for every consumer (strength
    sums, candidate sums with loop weights zeroed, grouped
    contraction)."""
    from ..exchange import _coerce_arrow

    block = _coerce_arrow(block)
    P = len(bounds) - 1
    s = block["src"].to_numpy()
    d = block["dst"].to_numpy()
    if len(s):
        mx = max(int(s.max()), int(d.max()))
        mn = min(int(s.min()), int(d.min()))
        if mn < 0 or mx >= int(bounds[-1]):
            raise ValueError(
                f"edge endpoint out of range [0, {int(bounds[-1])}): "
                f"min={mn}, max={mx} — pass a correct n"
            )
    w = (block["weight"].to_numpy().astype(np.float64)
         if "weight" in block.column_names
         else np.ones(len(s)))
    key = np.concatenate((d, s))       # arc dst (= rev-CSR owner)
    oth = np.concatenate((s, d))       # arc src
    ww = np.concatenate((w, w))
    n_tot = int(bounds[-1])
    if collapse and len(key) and n_tot * n_tot < (1 << 62):
        # per-block partial collapse (combiner): duplicate (dst, src)
        # arcs within this block aggregate before shipping; the shard
        # CSR build finishes the job across blocks (_csr_arrays).
        # Exact for integer-valued weights (sums order-independent).
        pack = key * np.int64(n_tot) + oth
        order = np.argsort(pack)
        ps = pack[order]
        runs = np.ones(len(ps), dtype=bool)
        runs[1:] = ps[1:] != ps[:-1]
        idx = np.flatnonzero(runs)
        key = key[order][idx]
        oth = oth[order][idx]
        ww = np.add.reduceat(ww[order], idx)
    part = np.searchsorted(bounds, key, side="right") - 1
    order = np.argsort(part, kind="stable")
    key, oth, ww = key[order], oth[order], ww[order]
    cuts = np.searchsorted(part[order], np.arange(P + 1))
    out = [
        pa.table({
            "src": oth[cuts[p]:cuts[p + 1]],
            "dst": key[cuts[p]:cuts[p + 1]],
            "weight": ww[cuts[p]:cuts[p + 1]],
        })
        for p in range(P)
    ]
    return tuple(out) if P > 1 else out[0]


def _fs_for(path: str):
    """(pyarrow filesystem, path) for a local path or fs URI."""
    from pyarrow import fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _min_by_key(keys: np.ndarray, vals: np.ndarray):
    """(unique_keys, min val per key) — sender-side combiner for
    min-propagation messages."""
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], vals[order]
    uk, idx = np.unique(ks, return_index=True)
    return uk, np.minimum.reduceat(vs, idx) if len(uk) else vs


def _group_pair_sums(keys: np.ndarray, lbls: np.ndarray, ws: np.ndarray,
                     width: int):
    """Sum ``ws`` per (key, label) pair; returns (ukeys, ulabels,
    sums) sorted by (key, label).  Packs both ids into ONE int64 sort
    key when the ranges allow (5-10x faster than np.lexsort — measured
    1.7 s vs 9.6 s on 900k rows); falls back to lexsort otherwise.
    ``width`` is a hint that must exceed every label value — it is
    raised automatically when labels exceed it (custom LPA initial
    labels), and negative labels fall back to lexsort."""
    if len(keys) == 0:
        return keys, lbls, ws
    lmin = int(lbls.min())
    lmax = int(lbls.max())
    if lmin >= 0:
        width = max(width, lmax + 1)
    if lmin >= 0 and keys.max(initial=0) < (1 << 62) // max(width, 1):
        key = keys.astype(np.int64) * np.int64(width) + lbls
        order = np.argsort(key, kind="stable")
        k = key[order]
        w = ws[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        idx = np.flatnonzero(new)
        uk = k[idx]
        return (
            uk // np.int64(width), uk % np.int64(width),
            np.add.reduceat(w, idx) if len(idx) else w,
        )
    order = np.lexsort((lbls, keys))
    k, l, w = keys[order], lbls[order], ws[order]
    new = np.ones(len(k), dtype=bool)
    new[1:] = (k[1:] != k[:-1]) | (l[1:] != l[:-1])
    idx = np.flatnonzero(new)
    return k[idx], l[idx], np.add.reduceat(w, idx) if len(idx) else w


def _dominant_per_key(uo, ul, uw, sentinel: int):
    """Per unique key (``uo`` sorted runs): the (max weight, min label)
    winner — reduceat-based, no second sort.  Returns
    (win_keys, win_labels, win_weights, run_starts)."""
    runs = np.ones(len(uo), dtype=bool)
    runs[1:] = uo[1:] != uo[:-1]
    ostarts = np.flatnonzero(runs)
    lens = np.diff(np.concatenate((ostarts, [len(uo)])))
    run_id = np.repeat(np.arange(len(ostarts)), lens)
    maxw = np.maximum.reduceat(uw, ostarts)
    at_max = uw == maxw[run_id]
    win_l = np.minimum.reduceat(
        np.where(at_max, ul, sentinel), ostarts
    )
    return uo[ostarts], win_l, maxw, ostarts


def _dedup_pairs(keys: np.ndarray, vals: np.ndarray):
    """Distinct (key, val) pairs, sorted by key — message combiner."""
    if len(keys) == 0:
        return keys, vals
    order = np.lexsort((vals, keys))
    k, v = keys[order], vals[order]
    keep = np.ones(len(k), dtype=bool)
    keep[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
    return k[keep], v[keep]


# ---------------------------------------------------------------------------
# shard actor


@ray.remote(num_cpus=0)
class GraphShard:
    """num_cpus=0: shards are resident state holders that compute only
    inside BSP calls; reserving a CPU per shard would let an engine of
    P shards starve every other task on a P-CPU node (actor-capacity
    deadlock).  The OS schedules the actual superstep compute."""
    def __init__(self, part_id: int, bounds, n: int, weighted: bool,
                 collapse_multi: bool = False, narrow: bool = False):
        self.collapse_multi = bool(collapse_multi)
        # narrow=True stores the O(E) CSR arrays (neighbor vids, arc
        # permutations, run offsets) as int32 when n and the local arc
        # count fit — halves resident bytes AND the per-superstep DRAM
        # scan, the measured bottleneck of the bandwidth-bound
        # kernels.  All packed-key arithmetic multiplies by an
        # np.int64 width (promotes), and local id + lo stays < n <
        # 2^31, so no intermediate can wrap.  Opt-in; validated
        # end-to-end for the north-rule kernels (pagerank/wcc/lpa) by
        # equality tests against the int64 engine.
        self.narrow = bool(narrow) and int(n) < (1 << 31)
        self.p = part_id
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.P = len(self.bounds) - 1
        self.lo = int(self.bounds[part_id])
        self.hi = int(self.bounds[part_id + 1])
        self.size = self.hi - self.lo
        self.n = n
        self.weighted = weighted
        self._fwd: list[pa.Table] = []
        self._mvr_pieces = None
        self._rev: list[pa.Table] = []
        self.state: dict[str, np.ndarray] = {}
        self.meta: dict = {}

    # -- build ---------------------------------------------------------------

    def ingest_fwd(self, *tbls):
        self._fwd.extend(t for t in tbls if t is not None and len(t))

    def ingest_rev(self, *tbls):
        self._rev.extend(t for t in tbls if t is not None and len(t))

    def _csr(self, pieces, key_col, other_col, lo):
        if pieces:
            t = pa.concat_tables(pieces, promote_options="default")
            key = t[key_col].to_numpy()
            other = t[other_col].to_numpy()
            w = t["weight"].to_numpy() if self.weighted else None
        else:
            key = other = np.empty(0, dtype=np.int64)
            w = np.empty(0) if self.weighted else None
        return self._csr_arrays(key, other, w, lo)

    def _csr_arrays(self, key, other, w, lo):
        if (self.collapse_multi and w is not None and len(key)
                and int(self.n) * int(self.n) < (1 << 62)):
            # aggregate duplicate (key, other) arcs into summed
            # weights — exact for weight-sum consumers (the community
            # path: integer weights, order-independent sums).  A
            # web-graph mega-hub's arc list shrinks by its duplicate
            # factor (measured 25.8M -> 5.0M incident arcs on the
            # 101.6M-edge bench hub), which is what keeps the shard
            # that owns it from straggling every O(local arcs) phase.
            pack = key * np.int64(self.n) + other
            order = np.argsort(pack)
            ps = pack[order]
            runs = np.ones(len(ps), dtype=bool)
            runs[1:] = ps[1:] != ps[:-1]
            idx = np.flatnonzero(runs)
            key = key[order][idx]
            other = other[order][idx]
            w = np.add.reduceat(w[order], idx)
        order = np.argsort(key, kind="stable")
        indptr = np.concatenate(
            ([0], np.cumsum(np.bincount(key - lo, minlength=self.size)))
        )
        other = other[order]
        w = w[order] if w is not None else None
        # per-destination-shard segmentation of the edge array
        dperm = np.argsort(other, kind="stable")
        dsorted = other[dperm]
        seg = np.searchsorted(dsorted, self.bounds)
        # static full-graph propagation index: local owner id per edge
        # in destination-sorted order, plus unique-destination runs —
        # lets a full-frontier superstep min/sum-combine with one
        # reduceat instead of a per-round sort
        counts = np.diff(indptr)
        own_by_other = np.repeat(
            np.arange(self.size, dtype=np.int64), counts
        )[dperm]
        runs = np.ones(len(dsorted), dtype=bool)
        runs[1:] = dsorted[1:] != dsorted[:-1]
        ustarts = np.flatnonzero(runs)
        udsts = dsorted[ustarts]
        useg = np.searchsorted(udsts, self.bounds)
        # static run-end offsets (ends[k] pairs with ustarts[k]) — cached
        # here because _patch_cache is called once per (receiver, sender)
        # pair per superstep and rebuilding this O(U) array each call is
        # O(P^2 * U) memory traffic per superstep at scale
        uends = (np.concatenate((ustarts[1:], [len(dsorted)]))
                 if len(ustarts) else np.empty(0, np.int64))
        if self.narrow and len(other) < (1 << 31):
            # int32 the O(E) arrays (values: vids < n < 2^31 or local
            # arc indices < len(other) < 2^31); indptr/seg stay int64
            other = other.astype(np.int32)
            dperm = dperm.astype(np.int32)
            dsorted = dsorted.astype(np.int32)
            own_by_other = own_by_other.astype(np.int32)
            ustarts = ustarts.astype(np.int32)
            udsts = udsts.astype(np.int32)
            uends = uends.astype(np.int32)
        return (indptr, other, w, dperm, dsorted, seg,
                own_by_other, ustarts, udsts, useg, uends)

    def finalize(self, symmetric: bool = False):
        self.symmetric = bool(symmetric)
        (self.rv_indptr, self.rv_src, self.rv_w,
         self.rv_sperm, self.rv_src_sorted, self.rv_seg,
         self.rv_dst_by_src, self.rv_ustarts, self.rv_usrcs,
         self.rv_useg, self.rv_uends) = self._csr(
            self._rev, "dst", "src", self.lo)
        self._rev = None  # free raw pieces before building fw (peak)
        if symmetric:
            # caller asserts the arc multiset is symmetric (every
            # {a, b} present both directions, loops pre-doubled —
            # louvain's _symmetrize convention): the fw CSR equals the
            # rv CSR per vertex AS A MULTISET, so alias instead of
            # routing/sorting a second direction.  Only order-
            # insensitive fw reads are valid on such engines (set
            # subscriptions, lexsort-normalized candidate sums,
            # strength reductions) — which is all the community path
            # touches.
            (self.fw_indptr, self.fw_dst, self.fw_w,
             self.fw_dperm, self.fw_dst_sorted, self.fw_seg,
             self.fw_src_by_dst, self.fw_ustarts, self.fw_udsts,
             self.fw_useg, self.fw_uends) = (
                self.rv_indptr, self.rv_src, self.rv_w,
                self.rv_sperm, self.rv_src_sorted, self.rv_seg,
                self.rv_dst_by_src, self.rv_ustarts, self.rv_usrcs,
                self.rv_useg, self.rv_uends)
        else:
            (self.fw_indptr, self.fw_dst, self.fw_w,
             self.fw_dperm, self.fw_dst_sorted, self.fw_seg,
             self.fw_src_by_dst, self.fw_ustarts, self.fw_udsts,
             self.fw_useg, self.fw_uends) = self._csr(
                self._fwd, "src", "dst", self.lo)
        self._fwd = self._rev = None
        self.out_deg = np.diff(self.fw_indptr).astype(np.int64)
        self.in_deg = np.diff(self.rv_indptr).astype(np.int64)
        if self.weighted:
            self.out_strength = np.add.reduceat(
                np.concatenate((self.fw_w, [0.0])), self.fw_indptr[:-1]
            ) * (self.out_deg > 0)
        else:
            self.out_strength = self.out_deg.astype(np.float64)
        return {
            "part": self.p, "lo": self.lo, "hi": self.hi,
            "edges": int(len(self.fw_dst)),
        }

    def _ensure_und(self):
        """Lazily build the union (undirected-view) CSR: per local
        vertex, out-neighbors ++ in-neighbors (per-edge multiplicity
        kept — distances are unaffected, and the relation is
        symmetric, which the hub-broadcast receiver expansion relies
        on).  Built once per shard on first mode='all' traversal."""
        if getattr(self, "symmetric", False):
            # a symmetric engine aliases fw to rv: the union view would
            # see every arc twice.  Fail loudly rather than corrupt.
            raise RuntimeError(
                "mode='all' traversal on a symmetric-aliased engine "
                "(finalize(symmetric=True)); build a directed engine")
        if getattr(self, "und_indptr", None) is not None:
            return
        kf = np.repeat(
            np.arange(self.size, dtype=np.int64) + self.lo,
            np.diff(self.fw_indptr),
        )
        kr = np.repeat(
            np.arange(self.size, dtype=np.int64) + self.lo,
            np.diff(self.rv_indptr),
        )
        key = np.concatenate((kf, kr))
        other = np.concatenate((self.fw_dst, self.rv_src))
        (self.und_indptr, self.und_tgt, _uw,
         _dp, self.und_tgt_sorted, _seg,
         self.und_src_by_tgt, self.und_ustarts, self.und_utgts,
         self.und_useg, self.und_uends) = self._csr_arrays(
            key, other, None, self.lo)

    def _piece(self, o):
        """This shard's slice of a sender's scatter output.  Two wire
        layouts (see GraphEngine.scatter): single-object mode ships the
        whole P-slice list (zero-copy sliced here — optimal on one
        node); per-destination mode (num_returns=P) ships only this
        shard's piece (optimal on a multi-node cluster, where pulling
        all P slices would move ~P x the needed bytes)."""
        return o[self.p] if isinstance(o, list) else o

    # -- generic state access ------------------------------------------------

    def set_state(self, **arrays):
        for k, v in arrays.items():
            self.state[k] = (
                np.full(self.size, v[1], dtype=v[0])
                if isinstance(v, tuple) else np.asarray(v)
            )

    def get_state(self, *names):
        return {k: self.state[k] for k in names}

    def degree_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": np.arange(self.lo, self.hi, dtype=np.int64),
                "out_deg": self.out_deg,
                "in_deg": self.in_deg,
                "out_strength": self.out_strength,
            }
        )

    def state_table(self, cols, rename=None) -> pa.Table:
        data = {"vid": np.arange(self.lo, self.hi, dtype=np.int64)}
        for c in cols:
            data[(rename or {}).get(c, c)] = self.state[c]
        return pa.table(data)

    # -- dense/sparse message helpers ---------------------------------------

    def _split_dense_sum(self, dst_sorted, seg, vals_sorted):
        """Per-destination-shard pre-summed contributions (the
        combiner that bounds hub fan-in).  Adaptive layout: a dense
        array when this sender touches most of the receiver's range,
        else sparse (ids, sums) — computed with reduceat over the
        already-sorted dst segment.  Cuts all-to-all bytes from
        P x n to O(edges) on sparse exchanges."""
        out = []
        for q in range(self.P):
            s, e = seg[q], seg[q + 1]
            size_q = int(self.bounds[q + 1] - self.bounds[q])
            seg_dst = dst_sorted[s:e]
            if e - s >= size_q // 2:
                out.append(
                    np.bincount(
                        seg_dst - self.bounds[q],
                        weights=vals_sorted[s:e],
                        minlength=size_q,
                    )
                )
            else:
                ids, idx = np.unique(seg_dst, return_index=True)
                sums = (
                    np.add.reduceat(vals_sorted[s:e], idx)
                    if len(ids) else vals_sorted[s:e]
                )
                out.append((ids, sums))
        return out

    def _split_sparse_min(self, keys, vals):
        """Per-destination-shard (ids, min-val) sparse messages."""
        uk, mv = _min_by_key(keys, vals)
        seg = np.searchsorted(uk, self.bounds)
        return [
            (uk[seg[q]:seg[q + 1]], mv[seg[q]:seg[q + 1]]) for q in range(self.P)
        ]

    # -- PageRank (semantics: reference src/centrality.c:894-973) ------------

    def pr_init(self, damping: float, weighted: bool, keep_scores: bool = False,
                reset=None):
        self.meta["pr_damping"] = damping
        self.meta["pr_weighted"] = weighted and self.weighted
        # personalized reset distribution (igraph_personalized_pagerank,
        # src/centrality.c:1284-1316): slice of a global, sum-1 vector
        self.meta["pr_reset"] = (
            np.array(reset[self.lo:self.hi], dtype=np.float64)
            if reset is not None else None
        )
        if self.meta["pr_weighted"]:
            # PRPACK drops edges with weight <= 0 at conversion
            # (src/prpack/prpack_igraph_graph.cpp:55-59); clamping to 0
            # in both numerator and denominator is arithmetically
            # identical and keeps the CSR intact.
            w = np.maximum(self.fw_w, 0.0)
            self.meta["pr_w_sorted"] = w[self.fw_dperm]
            denom = np.add.reduceat(
                np.concatenate((w, [0.0])), self.fw_indptr[:-1]
            ) * (self.out_deg > 0) if self.size else np.empty(0)
        else:
            denom = self.out_deg
        self.meta["pr_denom"] = np.asarray(denom, dtype=np.float64)
        # local src index per edge in dst-sorted order (precomputed at
        # finalize): one fancy-index gather per superstep
        self.meta["pr_src_by_dst"] = self.fw_src_by_dst
        if not keep_scores:
            self.state["pr"] = np.full(self.size, 1.0 / self.n)
        return self._pr_sumfrom()

    def _pr_sumfrom(self) -> float:
        """igraph's teleport mass: dangling vertices contribute their
        whole mass, others (1-d) of it (src/centrality.c:926-939)."""
        p = self.state["pr"]
        d = self.meta["pr_damping"]
        dang = self.meta["pr_denom"] == 0
        return float(p[dang].sum() + (1.0 - d) * p[~dang].sum())

    def pr_sum(self) -> float:
        return float(self.state["pr"].sum())

    def pr_scatter(self):
        """P dense per-destination-shard contribution arrays."""
        p = self.state["pr"]
        denom = self.meta["pr_denom"]
        with np.errstate(divide="ignore", invalid="ignore"):
            tmp = np.where(denom == 0, 0.0, p / denom)
        v = tmp[self.meta["pr_src_by_dst"]]
        if self.meta["pr_weighted"]:
            v = v * self.meta["pr_w_sorted"]
        return self._split_dense_sum(self.fw_dst_sorted, self.fw_seg, v)

    def pr_gather(self, sumfrom_total: float, *sender_outs):
        """Applies the update and returns convergence scalars PLUS the
        next iteration's sumfrom partial — so the driver needs exactly
        one synchronization per superstep.  Each ``sender_outs`` item is
        a sender's full per-destination list; we read slice ``self.p``
        (zero-copy out of the object store)."""
        d = self.meta["pr_damping"]
        acc = np.zeros(self.size)
        recv_bytes = 0  # message bytes this shard pulled this superstep
        for out in sender_outs:
            c = self._piece(out)
            if isinstance(c, tuple):
                ids, sums = c
                recv_bytes += ids.nbytes + sums.nbytes
                if len(ids):
                    acc[ids - self.lo] += sums
            else:
                recv_bytes += c.nbytes
                acc += c
        reset = self.meta["pr_reset"]
        if reset is not None:
            new = d * acc + sumfrom_total * reset
        else:
            new = d * acc + sumfrom_total / self.n
        old = self.state["pr"]
        delta = np.abs(new - old)
        self.state["pr"] = new
        return {
            "linf": float(delta.max(initial=0.0)),
            "l1": float(delta.sum()),
            "sum": float(new.sum()),
            "sumfrom": self._pr_sumfrom(),
            "msgs": int(len(self.fw_dst)),
            "bytes": int(recv_bytes),
        }

    def pr_normalize(self, total: float):
        self.state["pr"] /= total

    # -- generic sparse matvec (eigenvector / HITS harness,
    #    reference src/centrality.c:543,840 use the same ARPACK matvec
    #    shape) --------------------------------------------------------------

    def mv_scatter(self, key: str, direction: str, weighted: bool):
        """A-multiply messages: fwd gathers at dst (y = A^T x style,
        x flowing along edge direction), rev gathers at src."""
        x = self.state[key]
        if direction == "fwd":
            per_edge = x[self.fw_src_by_dst]
            if weighted and self.fw_w is not None:
                per_edge = per_edge * self.fw_w[self.fw_dperm]
            return self._split_dense_sum(
                self.fw_dst_sorted, self.fw_seg, per_edge
            )
        per_edge = x[self.rv_dst_by_src]
        if weighted and self.rv_w is not None:
            per_edge = per_edge * self.rv_w[self.rv_sperm]
        return self._split_dense_sum(
            self.rv_src_sorted, self.rv_seg, per_edge
        )

    def mv_gather(self, out_key: str, *sender_outs):
        acc = np.zeros(self.size)
        for out in sender_outs:
            c = self._piece(out)
            if isinstance(c, tuple):
                ids, sums = c
                if len(ids):
                    acc[ids - self.lo] += sums
            else:
                acc += c
        self.state[out_key] = acc
        return {
            "max": float(acc.max(initial=0.0)),
            "sum": float(acc.sum()),
        }

    def mv_scale_delta(self, key: str, prev_key: str, denom: float):
        """x <- x/denom; returns Linf delta vs prev_key (also updated)."""
        x = self.state[key] / (denom if denom else 1.0)
        self.state[key] = x
        prev = self.state.get(prev_key)
        delta = float(np.abs(x - prev).max(initial=0.0)) if prev is not None \
            else float("inf")
        self.state[prev_key] = x.copy()
        return delta

    # -- deprecated 0.5-era power-method PageRank
    #    (igraph_pagerank_old, src/structural_properties.c:1364-1540:
    #    leaky dangling mass — zero out-degrees clamped to 1; the
    #    ``old`` flag reproduces the pre-0.5 unnormalized additive
    #    (1-d) form) ---------------------------------------------------------

    def prold_init(self, damping: float, old: bool):
        # out-degree EXCLUDING self-loops (the reference passes
        # loops=0 to igraph_degree) while the gather keeps loop
        # contributions (the IN-adjlist includes them).
        deg = self.out_deg.astype(np.float64).copy()
        if len(self.fw_dst):
            src_g = np.repeat(
                np.arange(self.size, dtype=np.int64) + self.lo,
                np.diff(self.fw_indptr),
            )
            loop_src = src_g[self.fw_dst == src_g]
            if len(loop_src):
                deg -= np.bincount(loop_src - self.lo, minlength=self.size)
        deg[deg == 0] = 1.0
        self.meta["prold_denom"] = deg
        self.meta["prold_damping"] = damping
        self.meta["prold_old"] = old
        self.state["prold"] = np.full(self.size, 1.0 - damping)

    def prold_scatter(self):
        v = (self.state["prold"] / self.meta["prold_denom"])[
            self.fw_src_by_dst
        ]
        return self._split_dense_sum(self.fw_dst_sorted, self.fw_seg, v)

    def prold_gather(self, *sender_outs) -> float:
        acc = np.zeros(self.size)
        for out in sender_outs:
            c = self._piece(out)
            if isinstance(c, tuple):
                ids, sums = c
                if len(ids):
                    acc[ids - self.lo] += sums
            else:
                acc += c
        d = self.meta["prold_damping"]
        new = d * acc + (
            (1.0 - d) if self.meta["prold_old"] else (1.0 - d) / self.n
        )
        self.state["prold_new"] = new
        return float(new.sum())

    def prold_commit(self, total: float) -> float:
        new = self.state.pop("prold_new")
        if not self.meta["prold_old"]:
            new = new / total
        linf = float(np.abs(new - self.state["prold"]).max(initial=0.0))
        self.state["prold"] = new
        return linf

    # -- leading-eigenvector community splits (Newman spectral,
    #    igraph_community_leading_eigenvector src/community.c ARPACK
    #    arm; power iteration on the SHIFTED restricted modularity
    #    matrix B^(g) + sigma*I here — same leading eigenpair.
    #    B^(g)_ij = A_ij - k_i k_j/2m - delta_ij * rowsum_i with
    #    rowsum_i = (A 1_g)_i - k_i K_g/2m, so row sums vanish and
    #    sigma (a Gershgorin infinity-norm bound) makes the iteration
    #    matrix PSD.  Run on the symmetrized weighted arc list (loop =
    #    one arc of weight 2w) so out_strength == modularity k_i. ---------

    def lec_init(self):
        self.state["lec_comm"] = np.zeros(self.size, dtype=np.int64)
        self.state["lec_k"] = self.out_strength.astype(np.float64)

    def lec_group_stats(self, c: int):
        m = self.state["lec_comm"] == c
        return int(m.sum()), float(self.state["lec_k"][m].sum())

    def lec_set_ones(self, c: int):
        self.state["lec_x"] = (self.state["lec_comm"] == c).astype(
            np.float64
        )

    def lec_rowsum(self, c: int, Kg: float, two_m: float) -> float:
        """After an A-matvec of 1_g into lec_y: store the restricted
        row sums, return this shard's shift candidate
        max_i(sum_j|B^(g)_ij| + |diag correction|)."""
        m = self.state["lec_comm"] == c
        k = self.state["lec_k"]
        y = self.state["lec_y"]
        rs = np.where(m, y - k * (Kg / two_m), 0.0)
        self.state["lec_rs"] = rs
        bound = np.where(m, y + k * (Kg / two_m) + np.abs(rs), 0.0)
        return float(bound.max(initial=0.0))

    def lec_x_init(self, c: int, seed: int):
        """Deterministic +-1 start vector on the members (full
        splitmix64 of vid), zero elsewhere; returns (local sum, local
        member count) so the driver can center it against 1_g — the
        all-ones member vector is the exact eigenvalue-sigma fixed
        point of the shifted iteration and must not dominate the
        start."""
        m = self.state["lec_comm"] == c
        z = np.arange(self.lo, self.hi, dtype=np.uint64)
        z = (z + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
        x = np.where(m, np.where((z & np.uint64(1)).astype(bool),
                                 1.0, -1.0), 0.0)
        self.state["lec_x"] = x
        return float(x.sum()), int(m.sum())

    def lec_x_center(self, c: int, mean: float) -> float:
        """x -= mean on members (orthogonalize against 1_g); returns
        the local sum of squares."""
        m = self.state["lec_comm"] == c
        x = np.where(m, self.state["lec_x"] - mean, 0.0)
        self.state["lec_x"] = x
        return float((x * x).sum())

    def lec_scale_x(self, scale: float) -> float:
        """x *= scale; returns local k.x (next iteration's kx term)."""
        x = self.state["lec_x"] * scale
        self.state["lec_x"] = x
        return float((self.state["lec_k"] * x).sum())

    def lec_gather_update(self, c: int, kx: float, sigma: float,
                          two_m: float, *sender_outs):
        """Fused matvec-gather + modularity-matrix update (one RPC
        round instead of two): accumulate A.x pieces, then
        y <- (B^(g) + sigma I) x restricted to members; returns local
        (x.y, y.y) partials."""
        acc = np.zeros(self.size)
        for out in sender_outs:
            piece = self._piece(out)
            if isinstance(piece, tuple):
                ids, sums = piece
                if len(ids):
                    acc[ids - self.lo] += sums
            else:
                acc += piece
        m = self.state["lec_comm"] == c
        k = self.state["lec_k"]
        x = self.state["lec_x"]
        y = np.where(
            m,
            acc - k * (kx / two_m) - self.state["lec_rs"] * x + sigma * x,
            0.0,
        )
        self.state["lec_y"] = y
        return float((x * y).sum()), float((y * y).sum())

    def lec_y_to_x(self, scale: float) -> float:
        x = self.state["lec_y"] * scale
        self.state["lec_x"] = x
        return float((self.state["lec_k"] * x).sum())

    def lec_orient_probe(self, c: int, eps: float = 1e-12):
        """(vid, x) at the minimum member vid with |x| > eps — the
        driver flips the sign so that entry is positive (eigenvector
        sign is arbitrary; this pins a deterministic choice)."""
        m = (self.state["lec_comm"] == c) & (
            np.abs(self.state["lec_x"]) > eps
        )
        idx = np.flatnonzero(m)
        if len(idx) == 0:
            return None
        i = int(idx[0])
        return i + self.lo, float(self.state["lec_x"][i])

    def lec_negate(self):
        self.state["lec_x"] = -self.state["lec_x"]

    def lec_split_counts(self, c: int):
        m = self.state["lec_comm"] == c
        pos = m & (self.state["lec_x"] > 0)
        return int(pos.sum()), int(m.sum() - pos.sum())

    def lec_split(self, c: int, new_id: int):
        pos = (self.state["lec_comm"] == c) & (self.state["lec_x"] > 0)
        self.state["lec_comm"][pos] = new_id

    def lec_free(self):
        for a in ("lec_x", "lec_y", "lec_rs", "lec_k"):
            self.state.pop(a, None)

    # -- min-label propagation (WCC, reference src/components.c:88-161) ------

    def cc_init(self):
        self.state["label"] = np.arange(self.lo, self.hi, dtype=np.int64)
        self.state["changed"] = np.ones(self.size, dtype=bool)

    def _min_prop_msgs(self, vals_full, direction: str):
        """Full-frontier min-propagation via the static unique-run
        index: one reduceat, no per-round sort."""
        if direction == "fwd":
            per_edge = vals_full[self.fw_src_by_dst]
            ustarts, ukeys, useg = self.fw_ustarts, self.fw_udsts, self.fw_useg
        else:
            per_edge = vals_full[self.rv_dst_by_src]
            ustarts, ukeys, useg = self.rv_ustarts, self.rv_usrcs, self.rv_useg
        mins = (
            np.minimum.reduceat(per_edge, ustarts)
            if len(ustarts) else per_edge[:0]
        )
        return ukeys, mins, useg

    def cc_scatter(self, directions=("fwd", "rev")):
        """Labels flow along requested directions; (ids, min label)
        messages per destination shard.  Dense frontier -> static-index
        reduceat path; sparse frontier -> masked sort path."""
        lab = self.state["label"]
        act = self.state["changed"]
        dense = self.size > 0 and float(act.mean()) > 0.25
        if dense:
            parts = [[] for _ in range(self.P)]
            for d in directions:
                if (d == "fwd" and len(self.fw_dst)) or (
                    d == "rev" and len(self.rv_src)
                ):
                    ukeys, mins, useg = self._min_prop_msgs(lab, d)
                    for q in range(self.P):
                        parts[q].append(
                            (ukeys[useg[q]:useg[q + 1]], mins[useg[q]:useg[q + 1]])
                        )
            out = []
            for q in range(self.P):
                if len(parts[q]) == 1:
                    out.append(parts[q][0])
                elif parts[q]:
                    k = np.concatenate([p[0] for p in parts[q]])
                    v = np.concatenate([p[1] for p in parts[q]])
                    out.append(_min_by_key(k, v))
                else:
                    e = np.empty(0, np.int64)
                    out.append((e, e))
            return out
        keys_parts, vals_parts = [], []
        if "fwd" in directions and len(self.fw_dst):
            counts = np.diff(self.fw_indptr)
            mask = np.repeat(act, counts)
            keys_parts.append(self.fw_dst[mask])
            vals_parts.append(np.repeat(lab, counts)[mask])
        if "rev" in directions and len(self.rv_src):
            counts = np.diff(self.rv_indptr)
            mask = np.repeat(act, counts)
            keys_parts.append(self.rv_src[mask])
            vals_parts.append(np.repeat(lab, counts)[mask])
        keys = np.concatenate(keys_parts) if keys_parts else np.empty(0, np.int64)
        vals = np.concatenate(vals_parts) if vals_parts else np.empty(0, np.int64)
        return self._split_sparse_min(keys, vals)

    def cc_gather(self, *sender_outs):
        lab = self.state["label"]
        new = lab.copy()
        for ids, vals in (self._piece(o) for o in sender_outs):
            if len(ids):
                idx = ids - self.lo
                np.minimum.at(new, idx, vals)
        changed = new < lab
        self.state["label"] = new
        self.state["changed"] = changed
        return {"changed": int(changed.sum())}

    # -- label propagation (reference src/community.c:2124-2359) -------------

    def lpa_init(self, initial=None, fixed=None):
        # .copy(): arrays arriving via ray.put are read-only views
        self.state["label"] = (
            np.arange(self.lo, self.hi, dtype=np.int64)
            if initial is None
            else np.array(initial[self.lo:self.hi], dtype=np.int64)
        )
        self.state["lpa_fixed"] = (
            np.zeros(self.size, dtype=bool)
            if fixed is None else np.array(fixed[self.lo:self.hi], dtype=bool)
        )

    def _pair_messages(self, keys, labels, weights):
        """Combiner: sum weight per (key, label); split by key owner."""
        if len(keys) == 0:
            e = np.empty(0, np.int64)
            return [(e, e, np.empty(0))] * self.P
        uk, ul, uw = _group_pair_sums(keys, labels, weights, self.n)
        seg = np.searchsorted(uk, self.bounds)
        return [
            (uk[seg[q]:seg[q + 1]], ul[seg[q]:seg[q + 1]], uw[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    # -- delta-LPA: pub-sub label caches ------------------------------------
    #
    # Static subscriptions: receiver q needs the labels of the unique
    # sources of its in-edges (rv_usrcs) and, in "all" mode, the unique
    # destinations of its out-edges (fw_udsts).  Each round a sender
    # ships only its CHANGED (vid, label) pairs to subscribers; the
    # receiver patches a per-edge neighbor-label cache (dst-grouped
    # order) and recomputes the dominant label only for vertices with a
    # patched incident edge.  Message volume: O(n) round 0, O(changed)
    # after — instead of O(E) every round.

    def lpa2_init(self, mode: str, weighted: bool, initial=None, fixed=None,
                  hub_deg=None, subfilter: bool = True,
                  prefill: bool = False):
        self.lpa_init(initial, fixed)
        self.meta["lpa_mode"] = mode
        self.meta["lpa_subfilter"] = bool(subfilter)
        self.meta["lpa_weighted"] = bool(weighted and self.weighted)
        self.meta["lpa_hub_deg"] = int(
            hub_deg if hub_deg is not None
            else os.environ.get("XDATA_LPA_HUB_DEG", "16384")
        )
        # neighbor-label caches in CSR (vertex-grouped) edge order.
        # prefill (initial=None, no restore pending): every vertex's
        # label IS its vid, so the caches equal rv_src / fw_dst
        # directly — this replaces round 0's O(E) publish-and-patch
        # (profiled 5.0 s of a 10.2 s run at 101.6M edges / P=32:
        # round 0 random-writes every cache position with the value
        # it would hold anyway).  All vertices start pending so the
        # round-0 DECISIONS still happen for every vertex, giving a
        # bit-identical trajectory (test_lpa_prefill_matches_republish).
        if prefill:
            self.state["_in_cache"] = self.rv_src.astype(np.int64)
            if mode == "all":
                self.state["_out_cache"] = self.fw_dst.astype(np.int64)
            self.state["_lpa_changed"] = np.zeros(self.size, dtype=bool)
            self.state["_lpa_pending"] = np.arange(self.size, dtype=np.int64)
        else:
            self.state["_in_cache"] = np.zeros(len(self.rv_src),
                                               dtype=np.int64)
            if mode == "all":
                self.state["_out_cache"] = np.zeros(len(self.fw_dst),
                                                    dtype=np.int64)
            self.state["_lpa_changed"] = np.ones(self.size, dtype=bool)
            self.state["_lpa_pending"] = np.empty(0, dtype=np.int64)
        # hub histograms are built on the first gather, once the caches
        # are fully patched (round 0 / resume republish all labels)
        self._lpa_hist = None
        self._lpa_hub_mask = None
        # static per-vertex subscriber-shard lists: shard q needs local
        # vid v's label iff v is in q's patch keys — q's rv_usrcs (v has
        # an out-edge into q's range) plus, in "all" mode, q's fw_udsts
        # (v has an in-edge from q's range).  The r3 scatter broadcast
        # the full changed list to every shard, so each receiver paid
        # O(P x changed) searchsorted work per superstep — the measured
        # LPA anti-scaling at P=32 (BASELINE.md §7).  Filtering sends
        # exactly the pairs each receiver's _patch_cache keeps, so the
        # trajectory is bit-identical.  Packed key v*P+q is safe:
        # v < size <= n and n*P << 2^63 at any realistic scale.
        if not subfilter:
            self._lpa_sub = None
            return
        self._lpa_sub = self._build_subscriptions(
            use_fw=True, use_rv=(mode == "all"))

    def _build_subscriptions(self, use_fw: bool, use_rv: bool):
        """(indptr, shard) CSR over local vids: the destination shards
        that consume vid's state — owners of its fw dsts (use_fw)
        and/or of its rv srcs (use_rv)."""
        pv, pq = [], []
        if use_fw and len(self.fw_dst):
            pv.append(np.repeat(
                np.arange(self.size), np.diff(self.fw_indptr)))
            pq.append(
                np.searchsorted(self.bounds, self.fw_dst, side="right") - 1)
        if use_rv and len(self.rv_src):
            pv.append(np.repeat(
                np.arange(self.size), np.diff(self.rv_indptr)))
            pq.append(
                np.searchsorted(self.bounds, self.rv_src, side="right") - 1)
        if pv:
            packed = np.unique(
                np.concatenate(pv) * np.int64(self.P) + np.concatenate(pq))
            vs, qs = packed // self.P, packed % self.P
        else:
            vs = qs = np.empty(0, np.int64)
        indptr = np.concatenate(
            ([0], np.cumsum(np.bincount(vs, minlength=self.size)))
        ).astype(np.int64)
        return indptr, qs.astype(np.int32)

    def _sub_scatter(self, sub, idx, vals):
        """Expand changed local indices ``idx`` (carrying per-index
        payload ``vals``) through a subscription CSR into per-dest
        (global vid, payload) pairs."""
        indptr, qarr = sub
        starts = indptr[idx]
        lens = indptr[idx + 1] - starts
        tot = int(lens.sum())
        if tot == 0:
            e = np.empty(0, np.int64)
            return [(e, e)] * self.P
        first = np.concatenate(([0], np.cumsum(lens)))[:-1]
        flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(
            starts, lens)
        qs = qarr[flat]
        order = np.argsort(qs, kind="stable")
        qs = qs[order]
        vs = np.repeat(idx + self.lo, lens)[order]
        ls = np.repeat(vals, lens)[order]
        seg = np.searchsorted(qs, np.arange(self.P + 1))
        return [(vs[seg[q]:seg[q + 1]], ls[seg[q]:seg[q + 1]])
                for q in range(self.P)]

    def lpa2_scatter(self):
        """Publish changed (vid, label) pairs per subscriber shard,
        filtered by the static subscription index built in lpa2_init
        (per-superstep cost O(sum of subscriber counts over changed
        vertices), not O(P x changed)).  subfilter=False at lpa2_init
        falls back to the r3 broadcast (A/B toggle; output-equal —
        test_lpa_subscription_filter_matches_broadcast)."""
        if not self.P:
            return []
        lab = self.state["label"]
        idx = np.flatnonzero(self.state["_lpa_changed"])
        if not self.meta["lpa_subfilter"]:
            return [(idx + self.lo, lab[idx])] * self.P
        return self._sub_scatter(self._lpa_sub, idx, lab[idx])

    def _patch_cache(self, cache, ustarts, ukeys, sperm, uends,
                     vids, labs, want_old=False):
        """Patch per-edge cache positions for updated neighbor vids;
        returns the patched dst-grouped edge positions (and, with
        ``want_old``, the pre/post labels per position for incremental
        hub-histogram deltas).  uends is the precomputed static run-end
        array paired with ustarts (built once in _csr_arrays) —
        recomputing it here cost O(P^2 * U) per superstep and made lpa2
        gather anti-scale at P=32."""
        empty = np.empty(0, np.int64)
        if len(vids) == 0 or len(ukeys) == 0:
            return (empty, empty, empty) if want_old else empty
        ki = np.searchsorted(ukeys, vids)
        ok = (ki < len(ukeys)) & (ukeys[np.minimum(ki, len(ukeys) - 1)] == vids)
        ki, labs = ki[ok], labs[ok]
        if len(ki) == 0:
            return (empty, empty, empty) if want_old else empty
        lens = uends[ki] - ustarts[ki]
        total = int(lens.sum())
        # expand [ustarts[k], ends[k]) ranges
        first = np.concatenate(([0], np.cumsum(lens)))[:-1]
        flat = np.arange(total) - np.repeat(first, lens) + np.repeat(
            ustarts[ki], lens
        )
        edge_pos = sperm[flat]  # dst-grouped positions
        newl = np.repeat(labs, lens)
        if want_old:
            old = cache[edge_pos]
            cache[edge_pos] = newl
            return edge_pos, old, newl
        cache[edge_pos] = newl
        return edge_pos

    # -- hub histograms ------------------------------------------------------
    #
    # A web-scale graph has mega-in-degree hubs (everyone links to the
    # front pages); a changed label ANYWHERE in a hub's in-neighborhood
    # makes the hub "affected", so the naive delta-LPA re-gathers the
    # hub's full multi-million-edge label list every superstep (profiled
    # on the 101.6M-edge bench graph: 250 affected vertices -> 79.7M
    # edges re-gathered per superstep).  For vertices with gathered
    # degree >= XDATA_LPA_HUB_DEG (default 16384) we instead keep a
    # persistent per-hub (label -> weight) histogram, updated
    # incrementally from the patch deltas (old label -w, new label +w)
    # and compacted when stale zero rows accumulate.  Unweighted LPA
    # sums +-1.0 — exact in float64 — so the histogram path is
    # bit-identical to the full re-gather; weighted LPA keeps the full
    # re-gather to avoid float accumulation-order drift.

    def _lpa_build_hists(self, mode):
        thr = self.meta["lpa_hub_deg"]
        deg = self.in_deg
        if mode == "all":
            deg = deg + self.out_deg
        mask = deg >= thr
        self._lpa_hub_mask = mask
        self._lpa_hist = {}
        in_cache = self.state["_in_cache"]
        out_cache = self.state.get("_out_cache")
        for o in np.flatnonzero(mask):
            o = int(o)
            parts = [in_cache[self.rv_indptr[o]:self.rv_indptr[o + 1]]]
            if mode == "all":
                parts.append(
                    out_cache[self.fw_indptr[o]:self.fw_indptr[o + 1]]
                )
            lbls = np.sort(np.concatenate(parts))
            new = np.ones(len(lbls), dtype=bool)
            new[1:] = lbls[1:] != lbls[:-1]
            idx = np.flatnonzero(new)
            cnt = np.diff(np.concatenate((idx, [len(lbls)]))).astype(
                np.float64
            )
            self._lpa_hist[o] = [lbls[idx], cnt]

    def _lpa_apply_hub_deltas(self, owners, lbls, dws):
        """Merge grouped (hub, label, +-w) deltas into the per-hub
        histograms.  Per superstep this is O(deltas), not O(hub deg)."""
        uo, ul, uw = _group_pair_sums(owners, lbls, dws, self.n)
        starts = np.flatnonzero(
            np.concatenate(([True], uo[1:] != uo[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(uo)]))
        for s, e in zip(starts, ends):
            o = int(uo[s])
            dl, dw = ul[s:e], uw[s:e]
            hl, hw = self._lpa_hist[o]
            i = np.searchsorted(hl, dl)
            exist = i < len(hl)
            if len(hl):
                exist &= hl[np.minimum(i, len(hl) - 1)] == dl
            np.add.at(hw, i[exist], dw[exist])
            if not exist.all():
                ni = i[~exist]
                hl = np.insert(hl, ni, dl[~exist])
                hw = np.insert(hw, ni, dw[~exist])
            dead = hw == 0.0
            ndead = int(dead.sum())
            if ndead > 32 and ndead * 4 > len(hw):
                hl, hw = hl[~dead], hw[~dead]
            self._lpa_hist[o] = [hl, hw]

    def _lpa_hub_decide(self, hubs, lab):
        """(win label, win weight, own-label weight) per hub from the
        histograms — same (max weight, min label) rule as
        _dominant_per_key."""
        win_l = np.empty(len(hubs), dtype=np.int64)
        win_w = np.empty(len(hubs))
        cur_w = np.zeros(len(hubs))
        for j, o in enumerate(hubs):
            hl, hw = self._lpa_hist[int(o)]
            m = hw.max()
            win_w[j] = m
            win_l[j] = hl[hw == m].min()
            c = lab[o]
            i = int(np.searchsorted(hl, c))
            if i < len(hl) and hl[i] == c:
                cur_w[j] = hw[i]
        return win_l, win_w, cur_w

    def lpa2_gather(self, parity, *sender_outs):
        """Patch caches, recompute dominant labels for affected
        vertices (keep-if-dominant, min-label tie-break — same
        semantics as lpa_gather)."""
        mode = self.meta["lpa_mode"]
        weighted = self.meta["lpa_weighted"]
        lab = self.state["label"]
        prof = {} if os.environ.get("XDATA_LPA_PROFILE") else None
        t0 = time.time()
        use_hubs = not weighted
        track = (use_hubs and self._lpa_hist is not None
                 and bool(self._lpa_hub_mask.any()))
        affected_parts = []
        n_patched = 0
        recv_bytes = 0
        d_own, d_lbl, d_w = [], [], []
        for out in sender_outs:
            vids, labs = self._piece(out)
            recv_bytes += vids.nbytes + labs.nbytes
            res = self._patch_cache(
                self.state["_in_cache"], self.rv_ustarts, self.rv_usrcs,
                self.rv_sperm, self.rv_uends, vids, labs, want_old=track,
            )
            pos, old, newl = res if track else (res, None, None)
            if len(pos):
                n_patched += len(pos)
                owners = self.rv_dst_local_by_pos(pos)
                affected_parts.append(owners)
                if track:
                    hm = self._lpa_hub_mask[owners]
                    if hm.any():
                        ho = owners[hm]
                        d_own += [ho, ho]
                        d_lbl += [old[hm], newl[hm]]
                        d_w += [np.full(len(ho), -1.0), np.ones(len(ho))]
            if mode == "all":
                res = self._patch_cache(
                    self.state["_out_cache"], self.fw_ustarts, self.fw_udsts,
                    self.fw_dperm, self.fw_uends, vids, labs, want_old=track,
                )
                pos2, old2, newl2 = res if track else (res, None, None)
                if len(pos2):
                    n_patched += len(pos2)
                    owners2 = self.fw_src_local_by_pos(pos2)
                    affected_parts.append(owners2)
                    if track:
                        hm = self._lpa_hub_mask[owners2]
                        if hm.any():
                            ho = owners2[hm]
                            d_own += [ho, ho]
                            d_lbl += [old2[hm], newl2[hm]]
                            d_w += [np.full(len(ho), -1.0), np.ones(len(ho))]
        affected_parts.append(self.state["_lpa_pending"])
        affected = np.unique(np.concatenate(affected_parts))
        if use_hubs:
            if self._lpa_hist is None:
                # caches are fully patched on the first gather (round 0
                # and checkpoint resume republish every label)
                self._lpa_build_hists(mode)
            elif d_own:
                self._lpa_apply_hub_deltas(
                    np.concatenate(d_own), np.concatenate(d_lbl),
                    np.concatenate(d_w),
                )
        if prof is not None:
            prof["patch_s"] = round(time.time() - t0, 3)
            prof["n_patched"] = int(n_patched)
            prof["n_affected"] = int(len(affected))
            t0 = time.time()
        if len(affected) == 0:
            self.state["_lpa_changed"][:] = False
            return {"changed": 0, "pending": 0, "bytes": int(recv_bytes),
                    **(prof or {})}

        if use_hubs:
            hm = self._lpa_hub_mask[affected]
            hub_aff = affected[hm]
            rest = affected[~hm]
        else:
            hub_aff = np.empty(0, dtype=np.int64)
            rest = affected

        # gather each affected non-hub vertex's incident neighbor labels
        lbl_l, own_l, w_l = [], [], []
        starts = self.rv_indptr[rest]
        lens = self.rv_indptr[rest + 1] - starts
        tot = int(lens.sum())
        if tot:
            first = np.concatenate(([0], np.cumsum(lens)))[:-1]
            flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(starts, lens)
            lbl_l.append(self.state["_in_cache"][flat])
            own_l.append(np.repeat(rest, lens))
            w_l.append(
                self.rv_w[flat] if (weighted and self.rv_w is not None)
                else np.ones(tot)
            )
        if mode == "all":
            starts = self.fw_indptr[rest]
            lens = self.fw_indptr[rest + 1] - starts
            tot = int(lens.sum())
            if tot:
                first = np.concatenate(([0], np.cumsum(lens)))[:-1]
                flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(
                    starts, lens
                )
                lbl_l.append(self.state["_out_cache"][flat])
                own_l.append(np.repeat(rest, lens))
                w_l.append(
                    self.fw_w[flat] if (weighted and self.fw_w is not None)
                    else np.ones(tot)
                )
        if not lbl_l and len(hub_aff) == 0:
            self.state["_lpa_changed"][:] = False
            self.state["_lpa_pending"] = np.empty(0, dtype=np.int64)
            return {"changed": 0, "pending": 0, "bytes": int(recv_bytes),
                    **(prof or {})}
        if lbl_l:
            lbls = np.concatenate(lbl_l)
            owners = np.concatenate(own_l)
            ws = np.concatenate(w_l)
        else:
            lbls = owners = np.empty(0, dtype=np.int64)
            ws = np.empty(0)
        if prof is not None:
            prof["expand_s"] = round(time.time() - t0, 3)
            prof["n_regather_edges"] = int(len(lbls))
            prof["n_hub_affected"] = int(len(hub_aff))
            t0 = time.time()

        uo, ul, uw = _group_pair_sums(owners, lbls, ws, self.n)
        win_o, win_l, win_w, ostarts = _dominant_per_key(uo, ul, uw, self.n)
        own_rows = ul == lab[uo]
        cur_w = np.add.reduceat(
            np.where(own_rows, uw, 0.0), ostarts
        ) if len(ostarts) else np.zeros(0)
        if len(hub_aff):
            h_l, h_w, h_c = self._lpa_hub_decide(hub_aff, lab)
            win_o = np.concatenate((win_o, hub_aff))
            win_l = np.concatenate((win_l, h_l))
            win_w = np.concatenate((win_w, h_w))
            cur_w = np.concatenate((cur_w, h_c))
        if prof is not None:
            prof["group_s"] = round(time.time() - t0, 3)
            t0 = time.time()
        base = ~self.state["lpa_fixed"][win_o] & (cur_w < win_w)
        want = (lab[win_o] != win_l) & base
        if parity is not None:
            with np.errstate(over="ignore"):
                h = (
                    (win_o + self.lo).astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    + np.uint64(parity) * np.uint64(0xC2B2AE3D27D4EB4F)
                )
            allowed = ((h >> np.uint64(33)) & np.uint64(1)) == 0
        else:
            allowed = np.ones(len(win_o), dtype=bool)
        changed = want & allowed
        lab[win_o[changed]] = win_l[changed]
        mask = np.zeros(self.size, dtype=bool)
        mask[win_o[changed]] = True
        self.state["_lpa_changed"] = mask
        # masked-out wishes must be revisited even if no neighbor changes
        self.state["_lpa_pending"] = win_o[want & ~allowed]
        if prof is not None:
            prof["decide_s"] = round(time.time() - t0, 3)
        return {
            "changed": int(changed.sum()),
            "pending": int((want & ~allowed).sum()),
            "bytes": int(recv_bytes),
            **(prof or {}),
        }

    def rv_dst_local_by_pos(self, pos):
        """Local dst vertex of rev edges at dst-grouped positions."""
        return np.searchsorted(self.rv_indptr, pos, side="right") - 1

    def fw_src_local_by_pos(self, pos):
        return np.searchsorted(self.fw_indptr, pos, side="right") - 1

    def lpa_scatter(self, mode: str, weighted: bool):
        """Send (my label, edge weight) to neighbors: along fwd edges
        the receiver sees me as an IN-neighbor (igraph's default
        adjacency for LPA is IGRAPH_IN, src/community.c:2082-2086)."""
        lab = self.state["label"]
        keys_l, lbl_l, w_l = [], [], []
        if mode in ("in", "all") and len(self.fw_dst):
            counts = np.diff(self.fw_indptr)
            keys_l.append(self.fw_dst)
            lbl_l.append(np.repeat(lab, counts))
            w_l.append(
                self.fw_w if (weighted and self.fw_w is not None)
                else np.ones(len(self.fw_dst))
            )
        if mode in ("out", "all") and len(self.rv_src):
            counts = np.diff(self.rv_indptr)
            keys_l.append(self.rv_src)
            lbl_l.append(np.repeat(lab, counts))
            w_l.append(
                self.rv_w if (weighted and self.rv_w is not None)
                else np.ones(len(self.rv_src))
            )
        keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
        lbls = np.concatenate(lbl_l) if lbl_l else np.empty(0, np.int64)
        ws = np.concatenate(w_l) if w_l else np.empty(0)
        return self._pair_messages(keys, lbls, ws)

    def lpa_gather(self, parity, *sender_outs):
        """Adopt the dominant incoming label (ties -> smallest label —
        the deterministic stand-in for igraph's random tie-break,
        src/community.c:2298-2301).  Vertices with no messages or with
        ``fixed`` set keep their label.  ``parity`` (None or a round
        number) enables hash-subsampled damping rounds."""
        msgs = [self._piece(o) for o in sender_outs]
        ks = [m[0] for m in msgs if len(m[0])]
        if not ks:
            return {"changed": 0}
        keys = np.concatenate(ks)
        lbls = np.concatenate([m[1] for m in msgs if len(m[0])])
        ws = np.concatenate([m[2] for m in msgs if len(m[0])])
        uk, ul, uw = _group_pair_sums(keys, lbls, ws, self.n)
        # per key: (weight desc, label asc) winner — reduceat, no sort
        win_k, win_l, win_w, ostarts = _dominant_per_key(uk, ul, uw, self.n)
        lab = self.state["label"]
        idx2 = win_k - self.lo
        # weight of the CURRENT label among incoming labels: a vertex
        # whose label is already dominant keeps it (igraph's invariant
        # requires dominance, not minimality — src/community.c:2302-2306;
        # switching between equally-dominant labels would just churn)
        own = ul == lab[uk - self.lo]
        cur_w = np.add.reduceat(
            np.where(own, uw, 0.0), ostarts
        ) if len(ostarts) else np.zeros(0)
        updatable = ~self.state["lpa_fixed"][idx2] & (cur_w < win_w)
        if parity is not None:
            # deterministic pseudo-random half-subsample per round:
            # adjacent oscillating pairs are split with prob 1/2 per
            # round, so any sync 2-cycle dies geometrically
            with np.errstate(over="ignore"):  # uint64 wraparound intended
                h = (
                    win_k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    + np.uint64(parity) * np.uint64(0xC2B2AE3D27D4EB4F)
                )
            updatable &= ((h >> np.uint64(33)) & np.uint64(1)) == 0
        changed = (lab[idx2] != win_l) & updatable
        lab[idx2[changed]] = win_l[changed]
        return {"changed": int(changed.sum())}

    # -- Louvain local-moving (reference igraph_community_multilevel,
    #    src/community.c:2361+: synchronous distributed variant —
    #    Grappolo-style parity damping replaces the sequential sweep) --------

    def lou_init(self, delta: str = "off") -> bool:
        """``delta``: "off" = legacy rebuild rounds; "auto" = delta
        rounds when exact (integer-valued positive weights and a
        non-overflowing (vid, comm) packed key); "force" = delta
        rounds unconditionally (tests).  Returns whether THIS shard
        can run delta rounds — the driver ANDs across shards."""
        self.state["comm"] = np.arange(self.lo, self.hi, dtype=np.int64)
        # per-phase wall accumulator (XDATA_LOU_SHPROF=1 in the
        # actor's env; fetched once via lou_prof_dump)
        self._lou_prof = (
            {} if os.environ.get("XDATA_LOU_SHPROF") else None
        )
        # arc strength (the symmetric-arc representation makes this
        # the modularity k_i, loops pre-doubled by convention)
        self.meta["lou_k"] = self.out_strength.copy()
        self.state["_lou_changed"] = np.zeros(self.size, dtype=bool)
        self._lou_K = self._lou_W = self._lou_sub = None
        self._lou_recv = 0
        if delta == "off":
            return False
        if delta == "auto":
            # delta rounds maintain the candidate sums incrementally;
            # float adds are exact only for integer-valued weights
            # (+-1.0-style sums, same argument as the LPA hub
            # histograms), and the (vid, comm) pack needs n^2 < 2^62.
            # Louvain over an unweighted graph satisfies both at every
            # level (contracted weights are integer arc counts).
            w = self.rv_w
            ok = int(self.n) * int(self.n) < (1 << 62)
            if ok and w is not None and len(w):
                ok = bool(np.isfinite(w).all() and (w > 0).all()
                          and (w == np.floor(w)).all())
            if not ok:
                return False
        # per-arc neighbor-community cache (dst-grouped rv order),
        # pre-filled: initial communities ARE vids, so the cache is
        # rv_src itself (the LPA prefill trick)
        self._lou_cache = self.rv_src.astype(np.int64)
        owners = np.repeat(
            np.arange(self.size, dtype=np.int64), np.diff(self.rv_indptr))
        w_eff = (self.rv_w.astype(np.float64) if self.rv_w is not None
                 else np.ones(len(self.rv_src)))
        # loop arcs never enter the candidate lists (they move with
        # the vertex; assignment-invariant for the argmax) — zero
        # their weight so patches at loop positions are no-ops
        w_eff = w_eff.copy()
        w_eff[self.rv_src == owners + self.lo] = 0.0
        self._lou_w_eff = w_eff
        # persistent candidate sums keyed by packed (global v, comm)
        width = np.int64(self.n)
        keys = (owners + self.lo) * width + self._lou_cache
        order = np.argsort(keys, kind="stable")
        k, w = keys[order], w_eff[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        idx = np.flatnonzero(new)
        uk = k[idx]
        uw = np.add.reduceat(w, idx) if len(idx) else w[:0]
        keep = uw != 0.0
        self._lou_K, self._lou_W = uk[keep], uw[keep]
        self._lou_sub = self._build_subscriptions(use_fw=True,
                                                  use_rv=False)
        return True

    def lou_delta_scatter(self):
        """Publish moved (vid, community) pairs to subscriber shards
        (empty on round 0: lou_init pre-fills the candidate sums)."""
        if not self.P:
            return []
        t0 = time.perf_counter() if self._lou_prof is not None else 0.0
        idx = np.flatnonzero(self.state["_lou_changed"])
        out = self._sub_scatter(self._lou_sub, idx,
                                self.state["comm"][idx])
        if self._lou_prof is not None:
            self._lou_prof["scatter"] = self._lou_prof.get(
                "scatter", 0.0) + (time.perf_counter() - t0)
        return out

    def lou_delta_candidates(self, *sender_outs):
        """Delta round: patch the per-arc community cache for moved
        in-neighbors, fold the (owner, old comm, -w) / (owner, new
        comm, +w) deltas into the persistent candidate sums, then
        assemble the same (_lou_cand_v/l/w, query) arrays the
        legacy O(E)-rebuild lou_candidates produces — bit-identical
        for integer-valued weights (test_louvain_delta_matches_rebuild)."""
        prof = self._lou_prof
        _t = time.perf_counter() if prof is not None else 0.0

        def _mark(key):
            nonlocal _t
            if prof is None:
                return
            now = time.perf_counter()
            prof[key] = prof.get(key, 0.0) + (now - _t)
            _t = now

        width = np.int64(self.n)
        d_keys, d_ws = [], []
        for out in sender_outs:
            vids, comms = self._piece(out)
            self._lou_recv += vids.nbytes + comms.nbytes
            pos, old, newc = self._patch_cache(
                self._lou_cache, self.rv_ustarts, self.rv_usrcs,
                self.rv_sperm, self.rv_uends, vids, comms, want_old=True,
            )
            if len(pos):
                w = self._lou_w_eff[pos]
                nz = w != 0.0  # loop arcs patch the cache, never sums
                if nz.any():
                    og = (self.rv_dst_local_by_pos(pos[nz])
                          + self.lo) * width
                    d_keys += [og + old[nz], og + newc[nz]]
                    d_ws += [-w[nz], w[nz]]
        _mark("patch")
        K, W = self._lou_K, self._lou_W
        if d_keys:
            ks = np.concatenate(d_keys)
            ws = np.concatenate(d_ws)
            # default (unstable) sort: 2.9x faster than stable on
            # int64 here, and the fold's reduceat sums are
            # order-independent for the integer-valued weights the
            # delta path requires
            order = np.argsort(ks)
            ks, ws = ks[order], ws[order]
            new = np.ones(len(ks), dtype=bool)
            new[1:] = ks[1:] != ks[:-1]
            idx = np.flatnonzero(new)
            uk = ks[idx]
            dw = np.add.reduceat(ws, idx) if len(idx) else ws[:0]
            pos = np.searchsorted(K, uk)
            exist = pos < len(K)
            if len(K):
                exist &= K[np.minimum(pos, len(K) - 1)] == uk
            np.add.at(W, pos[exist], dw[exist])
            miss = ~exist
            if miss.any():
                K = np.insert(K, pos[miss], uk[miss])
                W = np.insert(W, pos[miss], dw[miss])
            keep = W != 0.0  # keep sums exactly the legacy key set
            if not keep.all():
                K, W = K[keep], W[keep]
            self._lou_K, self._lou_W = K, W
        _mark("fold")
        # assemble: stored sums + zero-weight own-community rows for
        # vertices whose (v, comm) key has no arc-derived row
        comm = self.state["comm"]
        own_k = (np.arange(self.lo, self.hi, dtype=np.int64) * width
                 + comm)
        pos = np.searchsorted(K, own_k)
        exist = pos < len(K)
        if len(K):
            exist &= K[np.minimum(pos, len(K) - 1)] == own_k
        miss = ~exist
        if miss.any():
            K = np.insert(K, pos[miss], own_k[miss])
            W = np.insert(W, pos[miss], np.zeros(int(miss.sum())))
        self._lou_cand_v = (K // width) - self.lo
        self._lou_cand_l = K % width
        self._lou_cand_w = W.copy() if W is self._lou_W else W
        _mark("assemble")
        # return_inverse: lou_move needs each candidate's position in
        # the sorted query (0.62 s vs 0.12+1.18 s for unique + a
        # separate 6.3M-row searchsorted, measured at bench scale)
        uniq, inv = np.unique(self._lou_cand_l, return_inverse=True)
        self._lou_query_inv = inv
        seg = np.searchsorted(uniq, self.bounds)
        _mark("unique")
        return [uniq[seg[q]:seg[q + 1]] for q in range(self.P)]

    def lou_sigma_split(self):
        """Per-community k_i sums of OWN vertices, split by community
        owner (labels are vids, so bounds give ownership)."""
        t0 = (time.perf_counter()
              if getattr(self, "_lou_prof", None) is not None else 0.0)
        comm = self.state["comm"]
        k = self.meta["lou_k"]
        order = np.argsort(comm, kind="stable")
        cs, ks = comm[order], k[order]
        uc, starts = np.unique(cs, return_index=True)
        sums = np.add.reduceat(ks, starts) if len(uc) else ks[:0]
        seg = np.searchsorted(uc, self.bounds)
        if self._lou_prof is not None:
            self._lou_prof["sigma_split"] = self._lou_prof.get(
                "sigma_split", 0.0) + (time.perf_counter() - t0)
        return [
            (uc[seg[q]:seg[q + 1]], sums[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def lou_sigma_collect(self, *sender_outs):
        labs, sums = [], []
        for o in sender_outs:
            l, s = self._piece(o)
            self._lou_recv += l.nbytes + s.nbytes
            labs.append(l)
            sums.append(s)
        labs = np.concatenate(labs) if labs else np.empty(0, np.int64)
        sums = np.concatenate(sums) if sums else np.empty(0)
        order = np.argsort(labs, kind="stable")
        ls, ss = labs[order], sums[order]
        ul, starts = np.unique(ls, return_index=True)
        self._lou_sig_lab = ul
        self._lou_sig_sum = (
            np.add.reduceat(ss, starts) if len(ul) else ss[:0]
        )
        # sum of Sigma_tot^2 over owned communities: the degree term of
        # the exact round-start modularity (driver's convergence signal)
        return len(ul), float(np.sum(self._lou_sig_sum ** 2))

    def lou_scatter(self):
        """(dst, my community, arc weight) messages, loop arcs
        excluded (a vertex's self-loop moves with it — contributes
        equally to every candidate, so it never affects the argmax)."""
        comm = self.state["comm"]
        if len(self.fw_dst) == 0:
            e = np.empty(0, np.int64)
            return [(e, e, np.empty(0))] * self.P
        counts = np.diff(self.fw_indptr)
        src_rep = np.repeat(np.arange(self.lo, self.hi), counts)
        keep = self.fw_dst != src_rep
        keys = self.fw_dst[keep]
        lbls = np.repeat(comm, counts)[keep]
        ws = (
            self.fw_w[keep] if self.fw_w is not None
            else np.ones(int(keep.sum()))
        )
        return self._pair_messages(keys, lbls, ws)

    def lou_candidates(self, *sender_outs):
        """Aggregate incoming (community, weight); build per-vertex
        candidate lists + the Sigma_tot query (unique labels split by
        owner).  Own community is always a candidate."""
        msgs = [self._piece(o) for o in sender_outs]
        ks = [m[0] for m in msgs if len(m[0])]
        comm = self.state["comm"]
        if ks:
            keys = np.concatenate(ks)
            lbls = np.concatenate([m[1] for m in msgs if len(m[0])])
            ws = np.concatenate([m[2] for m in msgs if len(m[0])])
        else:
            keys = np.empty(0, np.int64)
            lbls = np.empty(0, np.int64)
            ws = np.empty(0)
        # add zero-weight own-community rows so every vertex has its
        # current community among the candidates
        keys = np.concatenate((keys, np.arange(self.lo, self.hi)))
        lbls = np.concatenate((lbls, comm))
        ws = np.concatenate((ws, np.zeros(self.size)))
        order = np.lexsort((lbls, keys))
        k, l, w = keys[order], lbls[order], ws[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | (l[1:] != l[:-1])
        idx = np.flatnonzero(new)
        self._lou_cand_v = k[idx] - self.lo
        self._lou_cand_l = l[idx]
        self._lou_cand_w = np.add.reduceat(w, idx)
        uniq, inv = np.unique(self._lou_cand_l, return_inverse=True)
        self._lou_query_inv = inv
        seg = np.searchsorted(uniq, self.bounds)
        return [uniq[seg[q]:seg[q + 1]] for q in range(self.P)]

    def lou_sigma_answer(self, *sender_outs):
        """Owner side: Sigma_tot for each sender's queried labels
        (0 for unknown labels — emptied communities)."""
        out = []
        for o in sender_outs:
            q = self._piece(o)
            self._lou_recv += q.nbytes
            pos = np.searchsorted(self._lou_sig_lab, q)
            ok = (pos < len(self._lou_sig_lab)) & (
                self._lou_sig_lab[np.minimum(
                    pos, max(len(self._lou_sig_lab) - 1, 0))] == q
            ) if len(self._lou_sig_lab) else np.zeros(len(q), bool)
            vals = np.zeros(len(q))
            if ok.any():
                vals[ok] = self._lou_sig_sum[pos[ok]]
            out.append(vals)
        return out

    def lou_move(self, m_total: float, parity, *owner_answers):
        """Synchronous greedy move: argmax of
        k_in(c) - k_i * (Sigma_tot(c) - [c == own] k_i) / (2m),
        min-label tie-break, hash-parity damping on non-full rounds.
        Returns (moves, gain): gain = sum of accepted score
        improvements, i.e. m * the round's estimated modularity gain
        (exact for sequential moves; an upper-bound estimate under
        synchronous simultaneous moves) — the driver's epsilon stop."""
        prof = self._lou_prof
        _t = time.perf_counter() if prof is not None else 0.0

        def _mark(key):
            nonlocal _t
            if prof is None:
                return
            now = time.perf_counter()
            prof[key] = prof.get(key, 0.0) + (now - _t)
            _t = now

        sig_by_label = np.concatenate(
            [self._piece(a) for a in owner_answers]
        )
        self._lou_recv += sig_by_label.nbytes
        # align: owner answers arrive in owner order, i.e. exactly the
        # sorted-label order of the query; the inverse was
        # precomputed by the candidate assembly's np.unique
        sig = sig_by_label[self._lou_query_inv]
        self._lou_query_inv = None
        v = self._lou_cand_v
        l = self._lou_cand_l
        w = self._lou_cand_w
        comm = self.state["comm"]
        k = self.meta["lou_k"]
        own = l == comm[v]
        eff_sig = sig - np.where(own, k[v], 0.0)
        score = w - k[v] * eff_sig / (2.0 * m_total)
        _mark("score")
        # per vertex: best (score desc, label asc).  Candidate rows
        # arrive sorted by (v, l) from both assembly paths, so the
        # argmax is a segmented reduceat + first-occurrence-of-max scan
        # (min-label tie-break falls out of the ascending-l order) —
        # O(K), replacing a 3-key lexsort that measured 3.3 s per 6.3M
        # rows per shard per round at the 1e8-edge scale.  Bit-identical
        # to the lexsort (exact float equality against the segment max).
        if len(v):
            first = np.ones(len(v), dtype=bool)
            first[1:] = v[1:] != v[:-1]
            starts = np.flatnonzero(first)
            seg_id = np.cumsum(first) - 1
            mx = np.maximum.reduceat(score, starts)
            pos = np.flatnonzero(score == mx[seg_id])
            sid = seg_id[pos]
            fp = np.ones(len(pos), dtype=bool)
            fp[1:] = sid[1:] != sid[:-1]
            best = pos[fp]
            win_v, win_l, win_s = v[best], l[best], score[best]
        else:
            win_v = win_l = np.empty(0, np.int64)
            win_s = np.empty(0)
        own_score = np.zeros(len(win_v))
        ov, osc = v[own], score[own]
        own_score[np.searchsorted(win_v, ov)] = osc
        want = (win_l != comm[win_v]) & (win_s > own_score + 1e-12)
        would = int(want.sum())  # pre-damping: true-fixpoint signal
        if parity is not None:
            with np.errstate(over="ignore"):
                h = (
                    (win_v + self.lo).astype(np.uint64)
                    * np.uint64(0x9E3779B97F4A7C15)
                    + np.uint64(parity) * np.uint64(0xC2B2AE3D27D4EB4F)
                )
            want &= ((h >> np.uint64(33)) & np.uint64(1)) == 0
        comm[win_v[want]] = win_l[want]
        # movers publish next delta round (lou_delta_scatter)
        mask = np.zeros(self.size, dtype=bool)
        mask[win_v[want]] = True
        self.state["_lou_changed"] = mask
        # round-start internal arc weight (sum over own-community
        # candidate rows; loop arcs are excluded from candidates but
        # their Q contribution is assignment-invariant, so the driver's
        # dQ stop signal is exact)
        own_w = float(np.sum(w[own]))
        self._lou_cand_v = self._lou_cand_l = self._lou_cand_w = None
        _mark("move")
        return int(want.sum()), would, own_w

    def lou_prof_dump(self) -> dict:
        out = dict(self._lou_prof or {})
        out["recv_bytes"] = int(getattr(self, "_lou_recv", 0))
        return out

    def mem_report(self) -> dict:
        """Resident numpy bytes by family (soak instrumentation)."""
        out = {"csr": 0, "state": 0, "caches": 0, "rss": 0}
        csr_names = [a + b for a in ("fw_", "rv_", "und_") for b in (
            "indptr", "dst", "src", "tgt", "w", "dperm", "sperm",
            "dst_sorted", "src_sorted", "tgt_sorted", "seg",
            "src_by_dst", "dst_by_src", "src_by_tgt", "ustarts",
            "udsts", "usrcs", "utgts", "useg", "uends")]
        seen = set()
        for nm in csr_names:
            v = getattr(self, nm, None)
            if isinstance(v, np.ndarray) and id(v) not in seen:
                seen.add(id(v))
                out["csr"] += v.nbytes
        for v in self.state.values():
            if isinstance(v, np.ndarray):
                out["state"] += v.nbytes
        for nm in dir(self):
            if nm.startswith("_") and not nm.startswith("__"):
                try:
                    v = getattr(self, nm)
                except Exception:
                    continue
                if isinstance(v, np.ndarray) and id(v) not in seen:
                    seen.add(id(v))
                    out["caches"] += v.nbytes
        try:
            with open("/proc/self/statm") as f:
                out["rss"] = int(f.read().split()[1]) * os.sysconf(
                    "SC_PAGE_SIZE")
        except Exception:
            pass
        return out

    def lou_cache_flush(self, *sender_outs):
        """Patch the per-arc neighbor-community cache for the FINAL
        round's movers (their lou_delta_scatter fires after the driver
        loop breaks, so without this flush the cache is one round
        stale for them)."""
        for out in sender_outs:
            vids, comms = self._piece(out)
            self._patch_cache(
                self._lou_cache, self.rv_ustarts, self.rv_usrcs,
                self.rv_sperm, self.rv_uends, vids, comms,
            )

    def lou_cache_uniq_split(self):
        """Distinct OLD community labels present in the arc cache,
        split by label owner (labels are vids -> bounds give
        ownership) for the old->dense-rank translation round."""
        uniq = np.unique(self._lou_cache)
        self._lou_cache_uniq = uniq
        seg = np.searchsorted(uniq, self.bounds)
        return [uniq[seg[q]:seg[q + 1]] for q in range(self.P)]

    def lou_cache_rank_answer(self, offset: int, *sender_outs):
        """Owner side: dense rank (renumber_labels order) of each
        sender's queried old labels.  Valid only immediately after
        renumber_labels, while _relabel_dom is still resident; every
        queried label is in the domain by construction (a cached label
        is some vertex's current community, and the flush above made
        the cache current)."""
        dom = self._relabel_dom
        out = []
        for o in sender_outs:
            q = self._piece(o)
            idx = np.searchsorted(dom, q)
            if len(q) and not np.array_equal(dom[np.minimum(
                    idx, len(dom) - 1)], q):
                raise RuntimeError(
                    "lou_cache_rank_answer: cached label absent from "
                    "renumber domain (stale cache — missing flush?)")
            out.append(offset + idx)
        return out

    def lou_contract_emit(self, k_total: int, *owner_answers):
        """Shard-local community contraction: every rv arc (u -> own v)
        becomes (comm[u], comm[v], w) using the resident arc cache for
        comm[u] (translated old->dense via the owner answers) and own
        renumbered state for comm[v]; partial-aggregated by packed key
        (k_total^2 < 2^62 is implied by the delta-round guard n^2 <
        2^62 since k <= n).  Each arc lives in exactly one shard's rv,
        so the union over shards covers the arc multiset once — no
        joins touch the O(E) arc table (vs _contract's two hash joins,
        the dominant cost of the next level's build at 1e8 edges)."""
        uniq = self._lou_cache_uniq
        self._lou_cache_uniq = None
        ranks = np.concatenate([self._piece(a) for a in owner_answers])
        cache_new = ranks[np.searchsorted(uniq, self._lou_cache)]
        cdst = self.state["comm"][np.repeat(
            np.arange(self.size, dtype=np.int64),
            np.diff(self.rv_indptr))]
        w = (self.rv_w.astype(np.float64) if self.rv_w is not None
             else np.ones(len(self.rv_src)))
        kt = np.int64(k_total)
        key = cache_new * kt + cdst
        order = np.argsort(key, kind="stable")
        ks, ws = key[order], w[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        idx = np.flatnonzero(new)
        uk = ks[idx]
        uw = np.add.reduceat(ws, idx) if len(idx) else ws[:0]
        return pa.table({"src": uk // kt, "dst": uk % kt, "weight": uw})

    def label_min_vids(self):
        """(label, min vid carrying it) pairs for first-appearance
        renumbering (src/community.c:2320-2339)."""
        lab = self.state["label"]
        order = np.argsort(lab, kind="stable")
        ul, idx = np.unique(lab[order], return_index=True)
        vids = np.arange(self.lo, self.hi)[order]
        mins = np.minimum.reduceat(vids, idx) if len(ul) else vids
        return ul, mins

    # -- SCC (FW-BW-Trim coloring; see components.py for the driver) ---------

    def scc_init(self):
        self.state["scc"] = np.full(self.size, -1, dtype=np.int64)
        self.state["color"] = np.arange(self.lo, self.hi, dtype=np.int64)

    def scc_unassigned(self) -> int:
        return int((self.state["scc"] < 0).sum())

    def scc_neighbor_flags(self, direction: str):
        """Scatter 1 along ``direction`` edges from unassigned vertices
        so receivers learn their unassigned in/out-neighbor counts."""
        un = (self.state["scc"] < 0).astype(np.float64)
        if direction == "fwd":
            counts = np.diff(self.fw_indptr)
            vals = np.repeat(un, counts)[self.fw_dperm]
            out = self._split_dense_sum(self.fw_dst_sorted, self.fw_seg, vals)
        else:
            counts = np.diff(self.rv_indptr)
            vals = np.repeat(un, counts)[self.rv_sperm]
            out = self._split_dense_sum(self.rv_src_sorted, self.rv_seg, vals)
        return out

    def scc_trim(self, n_in: int, *sender_outs) -> int:
        """First n_in sender outputs: unassigned-in-neighbor counts;
        rest: unassigned-out-neighbor counts.  Unassigned vertices with
        either total zero are singleton SCCs (labeled own vid)."""
        counts = [self._piece(o) for o in sender_outs]
        cin = np.zeros(self.size)
        cout = np.zeros(self.size)

        def acc(dst, c):
            if isinstance(c, tuple):
                ids, sums = c
                if len(ids):
                    dst[ids - self.lo] += sums
            else:
                dst += c

        for c in counts[:n_in]:
            acc(cin, c)
        for c in counts[n_in:]:
            acc(cout, c)
        un = self.state["scc"] < 0
        trim = un & ((cin == 0) | (cout == 0))
        self.state["scc"][trim] = np.arange(self.lo, self.hi)[trim]
        return int(trim.sum())

    def scc_color_reset(self):
        self.state["color"] = np.arange(self.lo, self.hi, dtype=np.int64)
        self.state["changed"] = self.state["scc"] < 0

    def scc_color_scatter(self):
        """Forward min-color propagation within the unassigned subgraph."""
        un = self.state["scc"] < 0
        act = self.state["changed"] & un
        col = self.state["color"]
        if self.size > 0 and float(act.mean()) > 0.25 and len(self.fw_dst):
            # dense path: assigned senders masked to +inf (no-op for min)
            sentinel = np.iinfo(np.int64).max
            vals_full = np.where(un, col, sentinel)
            ukeys, mins, useg = self._min_prop_msgs(vals_full, "fwd")
            keep = mins < sentinel
            return [
                (
                    ukeys[useg[q]:useg[q + 1]][keep[useg[q]:useg[q + 1]]],
                    mins[useg[q]:useg[q + 1]][keep[useg[q]:useg[q + 1]]],
                )
                for q in range(self.P)
            ]
        counts = np.diff(self.fw_indptr)
        mask = np.repeat(act, counts)
        keys = self.fw_dst[mask]
        vals = np.repeat(col, counts)[mask]
        return self._split_sparse_min(keys, vals)

    def scc_color_gather(self, *sender_outs):
        un = self.state["scc"] < 0
        col = self.state["color"]
        new = col.copy()
        for ids, vals in (self._piece(o) for o in sender_outs):
            if len(ids):
                np.minimum.at(new, ids - self.lo, vals)
        new = np.where(un, new, col)
        changed = new < col
        self.state["color"] = new
        self.state["changed"] = changed
        return {"changed": int(changed.sum())}

    def scc_bwd_init(self) -> int:
        """Roots: unassigned vertices whose color is their own vid."""
        un = self.state["scc"] < 0
        vid = np.arange(self.lo, self.hi)
        self.state["reached"] = un & (self.state["color"] == vid)
        self.state["changed"] = self.state["reached"].copy()
        return int(self.state["reached"].sum())

    def scc_bwd_scatter(self):
        """Reachability flows backwards (to in-neighbors) carrying the
        sender's color; receivers accept only matching colors."""
        act = self.state["changed"]
        col = self.state["color"]
        counts = np.diff(self.rv_indptr)
        mask = np.repeat(act, counts)
        keys = self.rv_src[mask]
        vals = np.repeat(col, counts)[mask]
        keys, vals = _dedup_pairs(keys, vals)
        seg = np.searchsorted(keys, self.bounds)
        return [
            (keys[seg[q]:seg[q + 1]], vals[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def scc_bwd_gather(self, *sender_outs):
        un = self.state["scc"] < 0
        col = self.state["color"]
        reached = self.state["reached"]
        newly = np.zeros(self.size, dtype=bool)
        for ids, vals in (self._piece(o) for o in sender_outs):
            if len(ids):
                idx = ids - self.lo
                ok = un[idx] & ~reached[idx] & (col[idx] == vals)
                newly[idx[ok]] = True
        reached |= newly
        self.state["reached"] = reached
        self.state["changed"] = newly
        return {"changed": int(newly.sum())}

    def scc_assign(self) -> int:
        done = self.state["reached"] & (self.state["scc"] < 0)
        self.state["scc"][done] = self.state["color"][done]
        return int(done.sum())

    def relabel(self, old_labels, new_labels, state_key="label"):
        """Map label values through (sorted old -> new) pairs."""
        lab = self.state[state_key]
        pos = np.searchsorted(old_labels, lab)
        self.state[state_key] = new_labels[pos]

    # -- distributed label renumbering ---------------------------------------
    #
    # Labels are vertex ids (min-vid of the component / community), so
    # the vid-range ``bounds`` double as the label ownership map.  The
    # driver never sees a label array — only P partition counts — fixing
    # the driver-OOM path flagged for web-scale WCC (component count is
    # O(n)).  Four O(P)-ref rounds:
    #   1. uniq_split:   each shard's distinct labels, split by owner
    #   2. collect:      owner unions its incoming slices -> sorted
    #                    label domain; optionally merges a per-label
    #                    min-carrier-vid (for first-appearance order)
    #   3. answer:       owner maps each sender's queried labels to
    #                    global ranks (offset + local index)
    #   4. apply:        sender maps its state through (uniq -> rank)

    def relabel_uniq_split(self, state_key="label", with_minvid=False):
        uniq = np.unique(self.state[state_key])
        self._relabel_uniq = uniq
        seg = np.searchsorted(uniq, self.bounds)
        if not with_minvid:
            return [uniq[seg[q]:seg[q + 1]] for q in range(self.P)]
        # min own-vid carrying each distinct label (for LPA's
        # first-appearance numbering, src/community.c:2320-2339)
        lab = self.state[state_key]
        order = np.argsort(lab, kind="stable")
        ls = lab[order]
        starts = np.searchsorted(ls, uniq)
        vids = np.arange(self.lo, self.hi, dtype=np.int64)[order]
        mins = (
            np.minimum.reduceat(vids, starts) if len(uniq) else vids[:0]
        )
        return [
            (uniq[seg[q]:seg[q + 1]], mins[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def relabel_collect(self, *sender_outs) -> int:
        """Owner side: sorted distinct label domain for this vid range."""
        parts = [o[self.p] for o in sender_outs]
        if parts and isinstance(parts[0], tuple):
            labs = np.concatenate([p[0] for p in parts])
            mins = np.concatenate([p[1] for p in parts])
            order = np.argsort(labs, kind="stable")
            ls, ms = labs[order], mins[order]
            dom, starts = np.unique(ls, return_index=True)
            dmin = np.minimum.reduceat(ms, starts) if len(dom) else ms[:0]
            self._relabel_dom = dom
            self._relabel_dom_min = dmin
        else:
            self._relabel_dom = (
                np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64)
            )
            self._relabel_dom_min = None
        return int(len(self._relabel_dom))

    def relabel_set_ranks(self, ranks):
        """Install externally computed ranks aligned with the domain
        (used when rank order != label order, e.g. LPA min-vid order)."""
        self._relabel_ranks = np.asarray(ranks, dtype=np.int64)

    def relabel_answer(self, offset: int, *sender_outs):
        """Owner side: rank of each sender's queried labels."""
        dom = self._relabel_dom
        ranks = getattr(self, "_relabel_ranks", None)
        out = []
        for o in sender_outs:
            q = o[self.p]
            q = q[0] if isinstance(q, tuple) else q
            idx = np.searchsorted(dom, q)
            out.append(
                ranks[idx] if ranks is not None else offset + idx
            )
        self._relabel_ranks = None
        return out

    def relabel_apply(self, state_key, *owner_answers):
        ranks = np.concatenate([a[self.p] for a in owner_answers])
        uniq = self._relabel_uniq
        lab = self.state[state_key]
        self.state[state_key] = ranks[np.searchsorted(uniq, lab)]
        self._relabel_uniq = None

    def relabel_dom_minvids(self):
        """(domain index -> min carrier vid) for this owner's labels —
        split by min-vid owner for the distributed min-vid ranking."""
        dmin = self._relabel_dom_min
        order = np.argsort(dmin, kind="stable")
        seg = np.searchsorted(dmin[order], self.bounds)
        return [
            (dmin[order][seg[q]:seg[q + 1]],
             order[seg[q]:seg[q + 1]].astype(np.int64))
            for q in range(self.P)
        ]

    def relabel_minvid_collect(self, *sender_outs) -> int:
        """Min-vid-owner side: buffer incoming (min-vid, domain-index)
        pieces; return the count so the driver can prefix-sum offsets."""
        self._mvr_pieces = [o[self.p] for o in sender_outs]
        return int(sum(len(p[0]) for p in self._mvr_pieces))

    def relabel_minvid_rank(self, offset: int):
        """Rank the buffered min-vids ascending from ``offset``; return
        each sender its (domain-index, rank) aligned arrays."""
        pieces = self._mvr_pieces
        self._mvr_pieces = None
        mv = np.concatenate([p[0] for p in pieces])
        di = np.concatenate([p[1] for p in pieces])
        order = np.argsort(mv, kind="stable")
        rank = np.empty(len(mv), dtype=np.int64)
        rank[order] = offset + np.arange(len(mv), dtype=np.int64)
        sizes = np.cumsum([0] + [len(p[0]) for p in pieces])
        return [
            (di[sizes[i]:sizes[i + 1]], rank[sizes[i]:sizes[i + 1]])
            for i in range(len(pieces))
        ]

    def relabel_install_minvid_ranks(self, *rank_answers):
        """Owner side: assemble ranks aligned with the label domain."""
        ranks = np.empty(len(self._relabel_dom), dtype=np.int64)
        for a in rank_answers:
            di, rk = a[self.p]
            ranks[di] = rk
        self._relabel_ranks = ranks
        self._relabel_dom_min = None

    # -- BFS frontier (building block for sssp / diameter / reachability) ----

    def bfs_init(self, sources):
        dist = np.full(self.size, np.iinfo(np.int64).max, dtype=np.int64)
        src = np.asarray(sources)
        mine = src[(src >= self.lo) & (src < self.hi)]
        dist[mine - self.lo] = 0
        self.state["dist"] = dist
        self.state["changed"] = np.zeros(self.size, dtype=bool)
        self.state["changed"][mine - self.lo] = True

    def bfs_scatter(self, directions=("fwd",)):
        """dist+1 flows to neighbors; sparse min-combined messages."""
        dist = self.state["dist"]
        act = self.state["changed"]
        keys_l, val_l = [], []
        if "fwd" in directions and len(self.fw_dst):
            counts = np.diff(self.fw_indptr)
            mask = np.repeat(act, counts)
            keys_l.append(self.fw_dst[mask])
            val_l.append(np.repeat(dist, counts)[mask] + 1)
        if "rev" in directions and len(self.rv_src):
            counts = np.diff(self.rv_indptr)
            mask = np.repeat(act, counts)
            keys_l.append(self.rv_src[mask])
            val_l.append(np.repeat(dist, counts)[mask] + 1)
        keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
        vals = np.concatenate(val_l) if val_l else np.empty(0, np.int64)
        return self._split_sparse_min(keys, vals)

    def bfs_gather(self, *sender_outs):
        dist = self.state["dist"]
        new = dist.copy()
        for ids, vals in (self._piece(o) for o in sender_outs):
            if len(ids):
                np.minimum.at(new, ids - self.lo, vals)
        changed = new < dist
        self.state["dist"] = new
        self.state["changed"] = changed
        return {"changed": int(changed.sum())}

    # -- BFS with parent pointers (igraph_get_shortest_paths,
    #    src/structural_properties.c:645-1232: distances plus ONE
    #    deterministic shortest path per target — we pin parent =
    #    minimum-vid predecessor) --------------------------------------------

    def pbfs_init(self, sources):
        self.bfs_init(sources)
        self.state["parent"] = np.full(self.size, -1, dtype=np.int64)

    def pbfs_scatter(self, directions=("fwd",)):
        """(dst, dist+1, sender) messages, min-combined on
        (dist, sender) lexicographically."""
        dist = self.state["dist"]
        act = self.state["changed"]
        keys_l, val_l, par_l = [], [], []
        if "fwd" in directions and len(self.fw_dst):
            counts = np.diff(self.fw_indptr)
            mask = np.repeat(act, counts)
            keys_l.append(self.fw_dst[mask])
            val_l.append(np.repeat(dist, counts)[mask] + 1)
            par_l.append(
                np.repeat(np.arange(self.lo, self.hi), counts)[mask]
            )
        if "rev" in directions and len(self.rv_src):
            counts = np.diff(self.rv_indptr)
            mask = np.repeat(act, counts)
            keys_l.append(self.rv_src[mask])
            val_l.append(np.repeat(dist, counts)[mask] + 1)
            par_l.append(
                np.repeat(np.arange(self.lo, self.hi), counts)[mask]
            )
        if not keys_l:
            e = np.empty(0, np.int64)
            return [(e, e, e)] * self.P
        keys = np.concatenate(keys_l)
        vals = np.concatenate(val_l)
        pars = np.concatenate(par_l)
        # min (dist, parent) per key
        order = np.lexsort((pars, vals, keys))
        k, v, p = keys[order], vals[order], pars[order]
        first = np.ones(len(k), dtype=bool)
        first[1:] = k[1:] != k[:-1]
        k, v, p = k[first], v[first], p[first]
        seg = np.searchsorted(k, self.bounds)
        return [
            (k[seg[q]:seg[q + 1]], v[seg[q]:seg[q + 1]],
             p[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def pbfs_gather(self, *sender_outs):
        dist = self.state["dist"]
        parent = self.state["parent"]
        new = dist.copy()
        newp = parent.copy()
        for o in sender_outs:
            ids, vals, pars = self._piece(o)
            if len(ids):
                idx = ids - self.lo
                better = vals < new[idx]
                tie = (vals == new[idx]) & (pars < newp[idx])
                upd = better | tie
                new[idx[upd]] = vals[upd]
                newp[idx[upd]] = pars[upd]
        changed = (new < dist) | (newp != parent)
        self.state["dist"] = new
        self.state["parent"] = newp
        self.state["changed"] = changed
        return {"changed": int(changed.sum())}

    def parent_lookup(self, vids):
        """Parents of the requested (owned) vids — the path-walk RPC."""
        v = np.asarray(vids, dtype=np.int64)
        return self.state["parent"][v - self.lo]

    # -- shortest-path DAG (igraph_get_all_shortest_paths,
    #    src/structural_properties.c:1232: ALL min-dist predecessors).
    #    One extra superstep after a plain BFS: each shard offers
    #    (neighbor, self, dist+1) along the BFS directions; receivers
    #    keep offers matching their final dist — the kept pairs ARE the
    #    shortest-path DAG, stored v-grouped for the enumeration RPC. --------

    def spdag_scatter(self, directions=("fwd",)):
        dist = self.state["dist"]
        fin = dist < np.iinfo(np.int64).max
        keys_l, val_l, par_l = [], [], []
        if "fwd" in directions and len(self.fw_dst):
            counts = np.diff(self.fw_indptr)
            mask = np.repeat(fin, counts)
            keys_l.append(self.fw_dst[mask])
            val_l.append(np.repeat(dist, counts)[mask] + 1)
            par_l.append(np.repeat(np.arange(self.lo, self.hi), counts)[mask])
        if "rev" in directions and len(self.rv_src):
            counts = np.diff(self.rv_indptr)
            mask = np.repeat(fin, counts)
            keys_l.append(self.rv_src[mask])
            val_l.append(np.repeat(dist, counts)[mask] + 1)
            par_l.append(np.repeat(np.arange(self.lo, self.hi), counts)[mask])
        if not keys_l:
            e = np.empty(0, np.int64)
            return [(e, e, e)] * self.P
        keys = np.concatenate(keys_l)
        vals = np.concatenate(val_l)
        pars = np.concatenate(par_l)
        seg_order = np.argsort(keys, kind="stable")
        keys, vals, pars = keys[seg_order], vals[seg_order], pars[seg_order]
        seg = np.searchsorted(keys, self.bounds)
        return [
            (keys[seg[q]:seg[q + 1]], vals[seg[q]:seg[q + 1]],
             pars[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def spdag_gather(self, *sender_outs):
        dist = self.state["dist"]
        vs_l, ps_l = [], []
        for o in sender_outs:
            ids, vals, pars = self._piece(o)
            if len(ids):
                keep = vals == dist[ids - self.lo]
                vs_l.append(ids[keep])
                ps_l.append(pars[keep])
        vs = np.concatenate(vs_l) if vs_l else np.empty(0, np.int64)
        ps = np.concatenate(ps_l) if ps_l else np.empty(0, np.int64)
        order = np.lexsort((ps, vs))
        vs, ps = vs[order], ps[order]
        runs = np.ones(len(vs), dtype=bool)
        runs[1:] = vs[1:] != vs[:-1]
        self.spdag_v = vs[runs]
        self.spdag_starts = np.flatnonzero(runs)
        self.spdag_parents = ps
        return int(len(ps))

    def spdag_parents_of(self, vids):
        """(offsets, parents) for the requested owned vids — the
        all-paths enumeration RPC (output-sized)."""
        v = np.asarray(vids, dtype=np.int64)
        ki = np.searchsorted(self.spdag_v, v)
        ends = np.concatenate((self.spdag_starts[1:],
                               [len(self.spdag_parents)]))
        out_off = [0]
        out_par = []
        for k, vid in zip(ki, v):
            if k < len(self.spdag_v) and self.spdag_v[k] == vid:
                out_par.append(self.spdag_parents[self.spdag_starts[k]:ends[k]])
                out_off.append(out_off[-1] + (ends[k] - self.spdag_starts[k]))
            else:
                out_off.append(out_off[-1])
        pars = (np.concatenate(out_par) if out_par
                else np.empty(0, np.int64))
        return np.asarray(out_off, dtype=np.int64), pars

    def spdag_free(self):
        for a in ("spdag_v", "spdag_starts", "spdag_parents"):
            if hasattr(self, a):
                delattr(self, a)

    # -- weighted shortest paths (Bellman-Ford relaxation supersteps;
    #    reference igraph_shortest_paths_dijkstra
    #    src/structural_properties.c:4174 / Bellman-Ford :5158 — the
    #    sequential priority queue is replaced by frontier relaxation,
    #    which converges to the same fixed point and, unlike Dijkstra,
    #    tolerates the asynchrony of a distributed frontier) -----------------

    def wsssp_init(self, sources):
        dist = np.full(self.size, np.inf)
        src = np.asarray(sources)
        mine = src[(src >= self.lo) & (src < self.hi)]
        dist[mine - self.lo] = 0.0
        self.state["wdist"] = dist
        self.state["changed"] = np.zeros(self.size, dtype=bool)
        self.state["changed"][mine - self.lo] = True

    def wsssp_scatter(self, directions=("fwd",)):
        """dist + edge weight flows to neighbors; sparse min-combined."""
        dist = self.state["wdist"]
        act = self.state["changed"]
        keys_l, val_l = [], []
        if "fwd" in directions and len(self.fw_dst):
            counts = np.diff(self.fw_indptr)
            mask = np.repeat(act, counts)
            w = self.fw_w if self.fw_w is not None else np.ones(len(self.fw_dst))
            keys_l.append(self.fw_dst[mask])
            val_l.append(np.repeat(dist, counts)[mask] + w[mask])
        if "rev" in directions and len(self.rv_src):
            counts = np.diff(self.rv_indptr)
            mask = np.repeat(act, counts)
            w = self.rv_w if self.rv_w is not None else np.ones(len(self.rv_src))
            keys_l.append(self.rv_src[mask])
            val_l.append(np.repeat(dist, counts)[mask] + w[mask])
        keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
        vals = np.concatenate(val_l) if val_l else np.empty(0)
        return self._split_sparse_min(keys, vals)

    def wsssp_gather(self, *sender_outs):
        dist = self.state["wdist"]
        new = dist.copy()
        for ids, vals in (self._piece(o) for o in sender_outs):
            if len(ids):
                np.minimum.at(new, ids - self.lo, vals)
        changed = new < dist
        self.state["wdist"] = new
        self.state["changed"] = changed
        return {"changed": int(changed.sum())}

    # -- multi-source level-synchronous BFS with path counting (the
    #    Brandes harness: betweenness reference src/centrality.c:1569,
    #    closeness :2473 — S sources advance simultaneously as columns
    #    of a (size x S) matrix; per-wave memory is S*20 bytes/vertex,
    #    message volume (unique-dst x S) doubles) -------------------------

    def ms_init(self, sources):
        src = np.asarray(sources, dtype=np.int64)
        S = len(src)
        self.meta["ms_sources"] = src
        self.ms_dist = np.full((self.size, S), -1, dtype=np.int32)
        self.ms_sigma = np.zeros((self.size, S))
        self.ms_delta = np.zeros((self.size, S))
        mine = np.flatnonzero((src >= self.lo) & (src < self.hi))
        self.ms_dist[src[mine] - self.lo, mine] = 0
        self.ms_sigma[src[mine] - self.lo, mine] = 1.0

    def _ms_matrix_msgs(self, M, direction: str):
        """Per-destination-shard (ids, column-sum matrix) messages."""
        if direction == "fwd":
            per_edge_src = self.fw_src_by_dst
            ustarts, ukeys, useg = self.fw_ustarts, self.fw_udsts, self.fw_useg
            nedges = len(self.fw_dst)
        elif direction == "und":
            self._ensure_und()
            per_edge_src = self.und_src_by_tgt
            ustarts, ukeys, useg = (self.und_ustarts, self.und_utgts,
                                    self.und_useg)
            nedges = len(self.und_tgt)
        else:
            per_edge_src = self.rv_dst_by_src
            ustarts, ukeys, useg = self.rv_ustarts, self.rv_usrcs, self.rv_useg
            nedges = len(self.rv_src)
        if nedges == 0 or not len(ustarts):
            e = np.empty(0, np.int64)
            z = np.zeros((0, M.shape[1]))
            return [(e, z)] * self.P
        per_edge = M[per_edge_src]
        sums = np.add.reduceat(per_edge, ustarts, axis=0)
        return [
            (ukeys[useg[q]:useg[q + 1]], sums[useg[q]:useg[q + 1]])
            for q in range(self.P)
        ]

    def _ms_coo_msgs(self, mask, V, indptr, targets, A=None):
        """COO matrix messages: expand ONLY the active (vertex, column)
        pairs' edges — total work over a whole BFS wave is exactly
        edges x columns (each pair fires once), unlike the dense path
        which touches every edge at EVERY level.  ``V`` is the per-pair
        value array aligned with np.nonzero(mask).

        HUB SPLITTING (the north rule's skew handling): a frontier hub
        sends the SAME value to every neighbor — a rank-1 message — so
        rows with degree >= _MS_HEAVY_DEG ship as one
        (vid, value-row) broadcast to every shard and the RECEIVERS
        expand them against their own static edge index.  Without this
        the hub owner serializes deg x S cells and straggles the whole
        superstep (measured 7.4 s vs 0.2 s across shards)."""
        au, ac = np.nonzero(mask)
        counts = np.diff(indptr)
        out_bc = None
        if A is not None and len(au):
            heavy_row = counts >= self._MS_HEAVY_DEG
            pair_heavy = heavy_row[au]
            if pair_heavy.any():
                hrows = np.unique(au[pair_heavy])
                out_bc = (hrows + self.lo, A[hrows], np.int8(1))
                au, ac, V = au[~pair_heavy], ac[~pair_heavy], V[~pair_heavy]
        lens = counts[au]
        tot = int(lens.sum())
        S = mask.shape[1]
        if tot == 0:
            e = np.empty(0, np.int64)
            empty = (e, e.copy(), np.empty(0))
            if out_bc is not None:
                return [[empty, out_bc]] * self.P
            return [empty] * self.P
        first = np.concatenate(([0], np.cumsum(lens)))[:-1]
        flat = (
            np.arange(tot) - np.repeat(first, lens)
            + np.repeat(indptr[au], lens)
        )
        dsts = targets[flat]
        cols = np.repeat(ac, lens)
        vals = np.repeat(V, lens)
        # combiner: sum duplicate (dst, col) cells before shipping
        # (several active sources often share out-neighbors)
        key = dsts * np.int64(S) + cols
        order = np.argsort(key, kind="stable")
        k = key[order]
        v = vals[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = k[1:] != k[:-1]
        idx = np.flatnonzero(new)
        uk = k[idx]
        uv = np.add.reduceat(v, idx) if len(idx) else v
        dsts = uk // np.int64(S)
        cols = (uk % np.int64(S)).astype(np.int64)
        seg = np.searchsorted(dsts, self.bounds)
        out = [
            (dsts[seg[q]:seg[q + 1]], cols[seg[q]:seg[q + 1]],
             uv[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]
        if out_bc is not None:
            out = [[piece, out_bc] for piece in out]
        return out

    _MS_HEAVY_DEG = 512

    def _ms_coo_cost(self, mask, indptr) -> int:
        # cost of the light pairs only (heavy rows go broadcast)
        counts = np.diff(indptr)
        au = np.nonzero(mask)[0]
        d = counts[au]
        return int(d[d < self._MS_HEAVY_DEG].sum())

    def ms_fwd_scatter(self, level: int, direction: str = "fwd"):
        mask = self.ms_dist == level
        if not mask.any():
            # overshoot no-op level (the stop-check is batched):
            # allocation-free — skip the dense np.where(mask, sigma, 0)
            e = np.empty(0, np.int64)
            return [(e, e.copy(), np.empty(0))] * self.P
        S = mask.shape[1]
        if direction == "fwd":
            indptr, targets = self.fw_indptr, self.fw_dst
        elif direction == "und":
            self._ensure_und()
            indptr, targets = self.und_indptr, self.und_tgt
        else:  # "rev": traverse in-edges (closeness/eccentricity mode=in)
            indptr, targets = self.rv_indptr, self.rv_src
        nedges = len(targets)
        if nedges and self._ms_coo_cost(mask, indptr) * 3 < \
                nedges * S:
            A = np.where(mask, self.ms_sigma, 0.0)
            V = self.ms_sigma[mask]
            return self._ms_coo_msgs(mask, V, indptr, targets, A=A)
        A = np.where(mask, self.ms_sigma, 0.0)
        return self._ms_matrix_msgs(A, direction)

    def _ms_apply_piece(self, acc, piece, direction):
        S = acc.shape[1]
        if isinstance(piece, list):
            for sub in piece:
                self._ms_apply_piece(acc, sub, direction)
            return
        if len(piece) == 3 and piece[1].ndim == 2:
            # broadcast hub rows: expand against the local edge index
            vids, rows, _ = piece
            if direction == "fwd":
                sorted_keys, locs = self.rv_src_sorted, self.rv_dst_by_src
            elif direction == "und":
                # union relation is symmetric: local vertices adjacent
                # to hub h = h's occurrences in the local union targets
                self._ensure_und()
                sorted_keys, locs = self.und_tgt_sorted, self.und_src_by_tgt
            else:
                sorted_keys, locs = self.fw_dst_sorted, self.fw_src_by_dst
            starts = np.searchsorted(sorted_keys, vids)
            ends = np.searchsorted(sorted_keys, vids + 1)
            # per-hub local edge-multiplicity columns, applied as ONE
            # matmul: acc += C @ rows (ufunc.at would be ~100x slower)
            C = np.zeros((acc.shape[0], len(vids)))
            any_edges = False
            for i in range(len(vids)):
                if ends[i] > starts[i]:
                    C[:, i] = np.bincount(
                        locs[starts[i]:ends[i]], minlength=acc.shape[0]
                    )
                    any_edges = True
            if any_edges:
                acc += C @ rows
            return
        if len(piece) == 3:
            ids, cols, vals = piece
            if len(ids):
                flat = (ids - self.lo) * S + cols
                acc += np.bincount(
                    flat, weights=vals, minlength=acc.size
                ).reshape(acc.shape)
            return
        ids, m = piece
        if len(ids):
            acc[ids - self.lo] += m

    def _ms_acc(self, sender_outs, direction="fwd"):
        """Sum matrix / COO / broadcast pieces."""
        acc = np.zeros_like(self.ms_sigma)
        for o in sender_outs:
            self._ms_apply_piece(acc, self._piece(o), direction)
        return acc

    def ms_fwd_gather(self, level: int, *sender_outs,
                      direction: str = "fwd") -> int:
        acc = self._ms_acc(sender_outs, direction)
        newly = (self.ms_dist < 0) & (acc > 0)
        self.ms_dist[newly] = level + 1
        self.ms_sigma[newly] = acc[newly]
        return int(newly.sum())

    def ms_bwd_scatter(self, level: int):
        mask = self.ms_dist == level
        with np.errstate(divide="ignore", invalid="ignore"):
            M = np.where(
                mask & (self.ms_sigma > 0),
                (1.0 + self.ms_delta) / np.where(self.ms_sigma > 0,
                                                 self.ms_sigma, 1.0),
                0.0,
            )
        nedges = len(self.rv_src)
        if nedges and self._ms_coo_cost(mask, self.rv_indptr) * 3 < \
                nedges * mask.shape[1]:
            V = M[mask]
            return self._ms_coo_msgs(
                mask, V, self.rv_indptr, self.rv_src, A=M
            )
        return self._ms_matrix_msgs(M, "rev")

    def ms_bwd_gather(self, level: int, *sender_outs):
        acc = self._ms_acc(sender_outs, "rev")
        upd = self.ms_dist == level - 1
        self.ms_delta[upd] += (self.ms_sigma * acc)[upd]
        return 0

    def ms_accumulate_bc(self):
        """bc[v] += sum_j delta[v, j], excluding each source's own row
        (Brandes sums over v != s)."""
        if "bc" not in self.state:
            self.state["bc"] = np.zeros(self.size)
        d = self.ms_delta.copy()
        src = self.meta["ms_sources"]
        mine = np.flatnonzero((src >= self.lo) & (src < self.hi))
        d[src[mine] - self.lo, mine] = 0.0
        self.state["bc"] += d.sum(axis=1)

    def ms_closeness_stats(self):
        """(reached count, distance sum) per wave column — the driver
        combines them with igraph's unreachable-counts-as-n rule
        (src/centrality.c:2733-2736)."""
        reached = self.ms_dist >= 0
        dsum = np.where(reached, self.ms_dist, 0).sum(axis=0,
                                                      dtype=np.float64)
        return reached.sum(axis=0, dtype=np.int64), dsum

    # -- weighted multi-source distances (Bellman-Ford matrix: S
    #    source columns relax simultaneously; reference weighted
    #    closeness/eccentricity paths of src/centrality.c:2473 and
    #    src/structural_properties.c:4174 use one Dijkstra per source
    #    — here a (size x S) float matrix converges to the same fixed
    #    point in hop-diameter rounds) ------------------------------------

    def wms_init(self, sources):
        src = np.asarray(sources, dtype=np.int64)
        S = len(src)
        self.meta["wms_sources"] = src
        self.wms_dist = np.full((self.size, S), np.inf)
        self.wms_changed = np.zeros((self.size, S), dtype=bool)
        mine = np.flatnonzero((src >= self.lo) & (src < self.hi))
        self.wms_dist[src[mine] - self.lo, mine] = 0.0
        self.wms_changed[src[mine] - self.lo, mine] = True

    def wms_scatter(self):
        """(dst, col, dist + w) triples for active entries, min-combined
        per (dst, col) before the wire."""
        S = self.wms_dist.shape[1]
        e64 = np.empty(0, np.int64)
        rows, cols = np.nonzero(self.wms_changed)
        if len(rows) == 0 or len(self.fw_dst) == 0:
            return [(e64, e64, np.empty(0))] * self.P
        w = (self.fw_w if self.fw_w is not None
             else np.ones(len(self.fw_dst)))
        lens = np.diff(self.fw_indptr)[rows]
        tot = int(lens.sum())
        if tot == 0:
            return [(e64, e64, np.empty(0))] * self.P
        first = np.concatenate(([0], np.cumsum(lens)))[:-1]
        flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(
            self.fw_indptr[rows], lens
        )
        dst = self.fw_dst[flat]
        col = np.repeat(cols, lens)
        val = np.repeat(self.wms_dist[rows, cols], lens) + w[flat]
        key = dst * S + col
        order = np.argsort(key, kind="stable")
        key, val = key[order], val[order]
        runs = np.ones(len(key), dtype=bool)
        runs[1:] = key[1:] != key[:-1]
        idx = np.flatnonzero(runs)
        uk = key[idx]
        mv = np.minimum.reduceat(val, idx)
        udst = uk // S
        ucol = (uk % S).astype(np.int64)
        seg = np.searchsorted(udst, self.bounds)
        return [
            (udst[seg[q]:seg[q + 1]], ucol[seg[q]:seg[q + 1]],
             mv[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def wms_gather(self, *sender_outs) -> int:
        new_changed = np.zeros_like(self.wms_changed)
        for o in sender_outs:
            dst, col, val = self._piece(o)
            if len(dst) == 0:
                continue
            rows = dst - self.lo
            better = val < self.wms_dist[rows, col]
            self.wms_dist[rows[better], col[better]] = val[better]
            new_changed[rows[better], col[better]] = True
        self.wms_changed = new_changed
        return int(new_changed.sum())

    def wms_stats(self):
        """Per-column (reached count, distance sum, finite max)."""
        fin = np.isfinite(self.wms_dist)
        dsum = np.where(fin, self.wms_dist, 0.0).sum(axis=0)
        dmax = np.where(fin, self.wms_dist, -np.inf).max(axis=0)
        return fin.sum(axis=0, dtype=np.int64), dsum, dmax

    def wms_harmonic_stats(self):
        """Per-column sum of 1/d over finite d > 0."""
        pos = np.isfinite(self.wms_dist) & (self.wms_dist > 0)
        return np.where(
            pos, 1.0 / np.where(pos, self.wms_dist, 1.0), 0.0
        ).sum(axis=0)

    def wms_dist_block(self):
        """(lo, dist block copy) — rows are this shard's vertices,
        columns the wave's sources."""
        return self.lo, self.wms_dist.copy()

    def wms_free(self):
        for a in ("wms_dist", "wms_changed", "wbc_sigma", "wbc_ssent",
                  "wbc_delta", "wbc_psum", "wbc_psent", "wbc_acc"):
            if hasattr(self, a):
                delattr(self, a)

    # -- weighted Brandes (betweenness with weights,
    #    igraph_betweenness src/centrality.c:1569 weighted arm): after
    #    wms distances converge, sigma flows forward over the implicit
    #    shortest-path DAG (arc (u,v) is a DAG arc for column c iff
    #    d[u]+w == d[v], checked receiver-side against the SENT value,
    #    so no neighbor-distance replication is needed) by Jacobi
    #    rounds; delta flows backward the same way.  Exact float
    #    equality matches networkx/igraph semantics on integer-ish
    #    weights. ------------------------------------------------------------

    def wbc_sigma_init(self):
        src = self.meta["wms_sources"]
        S = len(src)
        self.wbc_sigma = np.zeros((self.size, S))
        self.wbc_ssent = np.zeros((self.size, S))
        mine = np.flatnonzero((src >= self.lo) & (src < self.hi))
        self.wbc_sigma[src[mine] - self.lo, mine] = 1.0
        if not hasattr(self, "wbc_acc"):
            self.wbc_acc = np.zeros(self.size)

    def _wbc_expand(self, mask, indptr, arcs_other, arcs_w, payload):
        """(dst, col, d_sent, val) quadruples along arcs for active
        (row, col) entries; d_sent = this side's dist + arc weight."""
        S = mask.shape[1]
        rows, cols = np.nonzero(mask)
        e64 = np.empty(0, np.int64)
        if len(rows) == 0 or len(arcs_other) == 0:
            return (e64, e64, np.empty(0), np.empty(0))
        lens = np.diff(indptr)[rows]
        tot = int(lens.sum())
        if tot == 0:
            return (e64, e64, np.empty(0), np.empty(0))
        first = np.concatenate(([0], np.cumsum(lens)))[:-1]
        flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(
            indptr[rows], lens
        )
        dst = arcs_other[flat]
        col = np.repeat(cols, lens)
        w = arcs_w[flat] if arcs_w is not None else np.ones(tot)
        d_sent = np.repeat(self.wms_dist[rows, cols], lens) + w
        val = np.repeat(payload[rows, cols], lens)
        return dst, col, d_sent, val

    @staticmethod
    def _wbc_combine(dst, col, d_sent, val, S, bounds):
        """Sum val per (dst, col, d_sent) is wrong — equality filtering
        happens at the receiver, so combine per (dst, col) only among
        IDENTICAL d_sent... different senders may carry different
        d_sent for the same (dst,col); ship raw triples grouped by
        destination shard instead (volume = DAG-arc fan-in)."""
        order = np.argsort(dst, kind="stable")
        dst, col = dst[order], col[order]
        d_sent, val = d_sent[order], val[order]
        seg = np.searchsorted(dst, bounds)
        return [
            (dst[seg[q]:seg[q + 1]], col[seg[q]:seg[q + 1]],
             d_sent[seg[q]:seg[q + 1]], val[seg[q]:seg[q + 1]])
            for q in range(len(bounds) - 1)
        ]

    def wbc_sigma_scatter(self):
        """Ship sigma INCREMENTS since the last scatter: receivers
        accumulate, so unchanged parents never need to re-send (a
        full Jacobi recompute from changed-only senders would
        undercount)."""
        S = self.wbc_sigma.shape[1]
        inc = self.wbc_sigma - self.wbc_ssent
        mask = inc != 0
        dst, col, d_sent, val = self._wbc_expand(
            mask, self.fw_indptr, self.fw_dst, self.fw_w, inc,
        )
        self.wbc_ssent = self.wbc_sigma.copy()
        return self._wbc_combine(dst, col, d_sent, val, S, self.bounds)

    def wbc_sigma_gather(self, *sender_outs) -> int:
        src = self.meta["wms_sources"]
        changed = 0
        for o in sender_outs:
            dst, col, d_sent, val = self._piece(o)
            if len(dst) == 0:
                continue
            rows = dst - self.lo
            ok = d_sent == self.wms_dist[rows, col]
            np.add.at(self.wbc_sigma, (rows[ok], col[ok]), val[ok])
            changed += int(ok.sum())
        # source entries are pinned at 1 (a zero-weight... no: positive
        # weights mean no DAG arc can re-enter the source at d=0)
        return changed

    def wbc_delta_init(self):
        S = self.wbc_sigma.shape[1]
        self.wbc_delta = np.zeros((self.size, S))
        self.wbc_psum = np.zeros((self.size, S))
        self.wbc_psent = np.zeros((self.size, S))

    def wbc_delta_scatter(self):
        """Ship increments of (1 + delta)/sigma along REVERSE arcs;
        d_sent = d[w] - arc weight must equal d[v] at the receiver."""
        S = self.wbc_delta.shape[1]
        fin = np.isfinite(self.wms_dist) & (self.wbc_sigma > 0)
        payload = np.where(
            fin,
            (1.0 + self.wbc_delta) / np.where(fin, self.wbc_sigma, 1.0),
            0.0,
        )
        inc = payload - self.wbc_psent
        mask = inc != 0
        dsts, col, d_sent, val = self._wbc_expand(
            mask, self.rv_indptr, self.rv_src,
            (-self.rv_w if self.rv_w is not None else None), inc,
        )
        if self.rv_w is None and len(d_sent):
            d_sent = d_sent - 2.0  # expand added +1; want d - 1
        self.wbc_psent = payload
        return self._wbc_combine(dsts, col, d_sent, val, S, self.bounds)

    def wbc_delta_gather(self, *sender_outs) -> int:
        changed = 0
        for o in sender_outs:
            dst, col, d_sent, val = self._piece(o)
            if len(dst) == 0:
                continue
            rows = dst - self.lo
            ok = d_sent == self.wms_dist[rows, col]
            np.add.at(self.wbc_psum, (rows[ok], col[ok]), val[ok])
            changed += int(ok.sum())
        self.wbc_delta = self.wbc_sigma * self.wbc_psum
        return changed

    def wbc_accumulate(self):
        """bc[v] += sum_c delta[v,c], source columns excluded at their
        own vertex (Brandes: w != s)."""
        d = self.wbc_delta.copy()
        src = self.meta["wms_sources"]
        mine = np.flatnonzero((src >= self.lo) & (src < self.hi))
        d[src[mine] - self.lo, mine] = 0.0
        self.wbc_acc += d.sum(axis=1)

    def wbc_result(self):
        return self.wbc_acc

    def ms_harmonic_stats(self):
        """Sum of 1/d per wave column over reached vertices at d > 0
        (igraph_harmonic_centrality, src/centrality.c:2940:
        unreachable pairs contribute 0)."""
        pos = self.ms_dist > 0
        return np.where(
            pos, 1.0 / np.maximum(self.ms_dist, 1), 0.0
        ).sum(axis=0, dtype=np.float64)

    def ms_mask_scatter(self, k: int):
        """Reach-within-k mask flows along fwd edges (the scan_k
        building block: per source column v, G[b] counts edges a->b
        with a inside N_k(v))."""
        A = ((self.ms_dist >= 0) & (self.ms_dist <= k)).astype(np.float64)
        return self._ms_matrix_msgs(A, "fwd")

    def ms_mask_count(self, k: int, *sender_outs):
        """Column sums of mask_b * (sum of in-edge masks) — edges with
        BOTH endpoints inside each source's k-neighborhood."""
        acc = np.zeros_like(self.ms_sigma)
        for o in sender_outs:
            ids, m = self._piece(o)
            if len(ids):
                acc[ids - self.lo] += m
        mask = (self.ms_dist >= 0) & (self.ms_dist <= k)
        return (acc * mask).sum(axis=0)

    _GIRTH_INF = np.int32(1 << 20)

    def ms_girth_scatter(self):
        """Sender half of the girth candidate reduction (igraph_girth,
        src/structural_properties.c:3691; all-sources BFS formulation —
        graph must be the SIMPLE undirected support with both arcs).
        Ships, per (unique fwd dst, column), the partial reduction of
        this shard's sender levels: (k1 = min level, cnt1 = #edges at
        k1, k2 = second-distinct min level)."""
        INF = self._GIRTH_INF
        d = np.where(self.ms_dist >= 0, self.ms_dist, INF)  # (size x S)
        if len(self.fw_dst) == 0 or not len(self.fw_ustarts):
            e = np.empty(0, np.int64)
            z = np.zeros((0, d.shape[1]), np.int32)
            return [(e, z, z, z)] * self.P
        pe = d[self.fw_src_by_dst]  # (E x S), dst-sorted order
        st = self.fw_ustarts
        k1 = np.minimum.reduceat(pe, st, axis=0)
        runs = np.diff(np.concatenate((st, [pe.shape[0]])))
        run_id = np.repeat(np.arange(len(st)), runs)
        at_min = pe == k1[run_id]
        cnt1 = np.add.reduceat(at_min.astype(np.int32), st, axis=0)
        k2 = np.minimum.reduceat(np.where(at_min, INF, pe), st, axis=0)
        useg = self.fw_useg
        return [
            (
                self.fw_udsts[useg[q]:useg[q + 1]],
                k1[useg[q]:useg[q + 1]].astype(np.int32),
                cnt1[useg[q]:useg[q + 1]],
                k2[useg[q]:useg[q + 1]].astype(np.int32),
            )
            for q in range(self.P)
        ]

    def ms_girth_gather(self, *sender_outs):
        """Merge the (k1, cnt1, k2) partials, evaluate cycle
        candidates against own levels, return the per-column minimum
        candidate length (INF sentinel when none)."""
        INF = self._GIRTH_INF
        S = self.ms_dist.shape[1]
        K1 = np.full((self.size, S), INF, np.int32)
        C1 = np.zeros((self.size, S), np.int32)
        K2 = np.full((self.size, S), INF, np.int32)
        for o in sender_outs:
            ids, k1, cnt1, k2 = self._piece(o)
            if not len(ids):
                continue
            idx = ids - self.lo
            a1, b1 = K1[idx], k1
            # merged second-distinct-min: the larger k1 only counts
            # when the two mins differ (else it IS the min)
            m2 = np.minimum(K2[idx], k2)
            m2 = np.where(
                a1 == b1, m2, np.minimum(m2, np.maximum(a1, b1))
            )
            m1 = np.minimum(a1, b1)
            c = np.where(
                a1 == b1, C1[idx] + cnt1,
                np.where(a1 < b1, C1[idx], cnt1),
            )
            K1[idx], C1[idx], K2[idx] = m1, c, m2
        d = np.where(self.ms_dist >= 0, self.ms_dist, INF).astype(np.int32)
        cand = np.full((self.size, S), INF, np.int64)
        # even cycle 2 d[b]: >= 2 in-edges from level d[b]-1
        even_ok = (K1 == d - 1) & (C1 >= 2) & (d < INF)
        np.copyto(cand, 2 * d.astype(np.int64), where=even_ok)
        # odd cycle 2 d[b]+1: any in-edge from level d[b]
        odd_lvl = np.where(K1 == d, K1, np.where(K2 == d, K2, INF))
        odd_ok = (odd_lvl == d) & (d < INF)
        cand = np.where(
            odd_ok, np.minimum(cand, 2 * d.astype(np.int64) + 1), cand
        )
        return cand.min(axis=0)

    def ms_ecc_stats(self):
        """Per-column max finite distance (eccentricity partials)."""
        d = self.ms_dist
        return np.where(d >= 0, d, -1).max(axis=0)

    def ms_reach_table(self) -> pa.Table:
        """(src, dst) reachability pairs of the current wave on this
        shard: src = wave source, dst = local vid with a finite BFS
        level, self-pairs excluded — the per-shard building block of
        the distributed transitive closure (the emitted block persists
        in the object store, so the next wave can reuse the state)."""
        src = self.meta["ms_sources"]
        rows, cols = np.nonzero(self.ms_dist >= 0)
        s = src[cols]
        d = rows + self.lo
        keep = s != d
        return pa.table({"src": s[keep], "dst": d[keep]})

    # -- edge betweenness (reference igraph_edge_betweenness
    #    src/centrality.c:2210): after a wave's backward pass, every
    #    shard accumulates its REV edges' dependencies; the (dist,
    #    sigma) rows of remote edge-sources arrive in one exchange ---------

    def ms_eb_src_ship(self):
        """Per destination shard: (src vids, dist rows, sigma rows)
        for the unique sources of that shard's in-edges from here."""
        out = []
        for q in range(self.P):
            s, e = self.fw_seg[q], self.fw_seg[q + 1]
            if e <= s:
                out.append((np.empty(0, np.int64),
                            np.zeros((0, self.ms_dist.shape[1]), np.int32),
                            np.zeros((0, self.ms_dist.shape[1]))))
                continue
            us = np.unique(self.fw_src_by_dst[s:e])
            out.append(
                (us + self.lo, self.ms_dist[us], self.ms_sigma[us])
            )
        return out

    def ms_eb_accumulate(self, *sender_outs):
        """eb[e] += sum_cols [d_v == d_u + 1] sigma_u (1+delta_v)/sigma_v
        over this shard's rev edges (u -> v, v local)."""
        if getattr(self, "eb_acc", None) is None:
            self.eb_acc = np.zeros(len(self.rv_src))
        if len(self.rv_src) == 0:
            return 0
        ids_l, d_l, s_l = [], [], []
        for o in sender_outs:
            ids, dd, ss = self._piece(o)
            if len(ids):
                ids_l.append(ids)
                d_l.append(dd)
                s_l.append(ss)
        if not ids_l:
            return 0
        ids = np.concatenate(ids_l)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        d_all = np.concatenate(d_l)[order]
        s_all = np.concatenate(s_l)[order]
        pos = np.searchsorted(ids, self.rv_src)
        d_u = d_all[pos]          # (E x S)
        sig_u = s_all[pos]
        v_local = np.repeat(
            np.arange(self.size), np.diff(self.rv_indptr)
        )
        d_v = self.ms_dist[v_local]
        sig_v = self.ms_sigma[v_local]
        del_v = self.ms_delta[v_local]
        with np.errstate(divide="ignore", invalid="ignore"):
            m_v = np.where(sig_v > 0, (1.0 + del_v) / np.where(
                sig_v > 0, sig_v, 1.0), 0.0)
        ok = (d_u >= 0) & (d_v == d_u + 1)
        self.eb_acc += np.where(ok, sig_u * m_v, 0.0).sum(axis=1)
        return 0

    def eb_table(self) -> pa.Table:
        """(src, dst, eb) in this shard's rev-edge order."""
        v_local = np.repeat(
            np.arange(self.size), np.diff(self.rv_indptr)
        )
        return pa.table(
            {
                "src": self.rv_src,
                "dst": v_local + self.lo,
                "eb": getattr(self, "eb_acc", np.zeros(len(self.rv_src))),
            }
        )

    def eb_reset(self):
        self.eb_acc = None

    def ms_dist_hist(self):
        """(bincount of positive distances, unreached pair count) for
        the current wave — the path_length_hist building block
        (reference src/structural_properties.c:319)."""
        d = self.ms_dist
        pos = d[d > 0]
        h = np.bincount(pos) if len(pos) else np.zeros(1, np.int64)
        return h.astype(np.int64), int((d < 0).sum())

    def ms_free(self):
        self.ms_dist = self.ms_sigma = self.ms_delta = None

    def ms_get_dist(self):
        """This shard's multi-source BFS distance matrix (size x S)."""
        return self.ms_dist

    def ms_set_dist(self, dist):
        """Inject a FOREIGN distance matrix (same vid range, another
        engine's BFS) so mask kernels (ms_mask_scatter/ms_mask_count)
        count THIS graph's edges against neighborhoods computed on
        another graph — the scan_k THEM statistics.  Requires the two
        engines to share bounds (build the second with
        ``from_edges(..., bounds=first.bounds)``)."""
        self.ms_dist = np.asarray(dist)
        self.ms_sigma = np.zeros(self.ms_dist.shape, dtype=np.float64)

    # -- block subspace iteration (spectral embedding, reference
    #    xdata src/embedding.c:807 ASE / :998 LSE: top-d eigenpairs of
    #    the (optionally degree-normalized) adjacency via distributed
    #    subspace iteration — the driver only ever holds d x d
    #    matrices) -----------------------------------------------------------

    def emb_init(self, d: int, seed: int, normalized: bool):
        rng = np.random.default_rng(np.random.PCG64(seed + self.p))
        self.emb_X = rng.standard_normal((self.size, d))
        self.emb_Y = None
        if normalized:
            deg = self.out_deg.astype(np.float64)  # symmetric support
            with np.errstate(divide="ignore"):
                self.emb_dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
        else:
            self.emb_dinv = None

    def emb_scatter(self, weighted: bool):
        X = self.emb_X
        if self.emb_dinv is not None:
            X = X * self.emb_dinv[:, None]
        if len(self.fw_dst) == 0 or not len(self.fw_ustarts):
            e = np.empty(0, np.int64)
            return [(e, np.zeros((0, X.shape[1])))] * self.P
        per_edge = X[self.fw_src_by_dst]
        if weighted and self.fw_w is not None:
            per_edge = per_edge * self.fw_w[self.fw_dperm][:, None]
        sums = np.add.reduceat(per_edge, self.fw_ustarts, axis=0)
        useg = self.fw_useg
        return [
            (self.fw_udsts[useg[q]:useg[q + 1]],
             sums[useg[q]:useg[q + 1]])
            for q in range(self.P)
        ]

    def emb_gather(self, *sender_outs):
        """Y = (normalized) A X; returns the partial Gram Y^T Y."""
        acc = np.zeros_like(self.emb_X)
        for o in sender_outs:
            ids, m = self._piece(o)
            if len(ids):
                acc[ids - self.lo] += m
        if self.emb_dinv is not None:
            acc = acc * self.emb_dinv[:, None]
        self.emb_Y = acc
        return acc.T @ acc

    def emb_orthonormalize(self, rinv):
        """X <- Y R^{-1} (distributed QR via driver Cholesky)."""
        self.emb_X = self.emb_Y @ rinv

    def emb_rayleigh(self):
        """Partial X^T Y for the d x d Rayleigh-Ritz projection."""
        return self.emb_X.T @ self.emb_Y

    def emb_finalize(self, w, scale):
        """Rotate into the Ritz basis and scale columns (U |λ|^{1/2})."""
        self.emb_X = (self.emb_X @ w) * scale[None, :]

    def emb_table(self) -> pa.Table:
        return pa.table(
            {
                "vid": np.arange(self.lo, self.hi, dtype=np.int64),
                "x": pa.array(
                    self.emb_X.tolist(),
                    pa.list_(pa.float64()),
                ),
            }
        )

    def emb_free(self):
        self.emb_X = self.emb_Y = self.emb_dinv = None

    def bfs_max_dist(self):
        d = self.state["dist"]
        idx = np.flatnonzero(d < np.iinfo(np.int64).max)
        if len(idx) == 0:
            return (-1, 0, 0, -1)
        fin = d[idx]
        return (
            int(fin.max()),
            int(len(fin)),
            int(fin.sum()),
            int(idx[fin.argmax()] + self.lo),
        )

    # -- k-core decomposition (reference igraph_coreness, src/cores.c:58) ----

    def core_init(self):
        self.state["core"] = np.full(self.size, -1, dtype=np.int64)

    def core_degree_flags(self, direction: str):
        """Scatter 1 from unpeeled vertices along edges so receivers
        learn their remaining degree (same exchange as SCC trim)."""
        un = (self.state["core"] < 0).astype(np.float64)
        if direction == "fwd":
            counts = np.diff(self.fw_indptr)
            vals = np.repeat(un, counts)[self.fw_dperm]
            out = self._split_dense_sum(self.fw_dst_sorted, self.fw_seg, vals)
        else:
            counts = np.diff(self.rv_indptr)
            vals = np.repeat(un, counts)[self.rv_sperm]
            out = self._split_dense_sum(self.rv_src_sorted, self.rv_seg, vals)
        return out

    def core_peel(self, k: int, n_in: int, *sender_outs) -> tuple:
        """Assign coreness k to unpeeled vertices whose remaining
        (ALL-mode) degree <= k; returns (#peeled, min remaining deg)."""
        counts = [self._piece(o) for o in sender_outs]
        deg = np.zeros(self.size)

        def acc(c):
            if isinstance(c, tuple):
                ids, sums = c
                if len(ids):
                    deg[ids - self.lo] += sums
            else:
                deg[:] += c

        for c in counts:
            acc(c)
        un = self.state["core"] < 0
        peel = un & (deg <= k)
        self.state["core"][peel] = k
        rem = deg[un & ~peel]
        return int(peel.sum()), (int(rem.min()) if len(rem) else -1)

    # -- topological layering (igraph_topological_sorting,
    #    src/structural_properties.c; igraph_is_dag :3325) ------------------

    def topo_init(self):
        self.state["layer"] = np.full(self.size, -1, dtype=np.int64)

    def topo_indeg_flags(self):
        """Scatter 1 along fwd edges from unassigned vertices."""
        un = (self.state["layer"] < 0).astype(np.float64)
        counts = np.diff(self.fw_indptr)
        vals = np.repeat(un, counts)[self.fw_dperm]
        return self._split_dense_sum(self.fw_dst_sorted, self.fw_seg, vals)

    def topo_peel(self, layer: int, *sender_outs) -> int:
        """Unassigned vertices with zero unassigned in-neighbors get
        this layer number."""
        indeg = np.zeros(self.size)
        for out in sender_outs:
            c = self._piece(out)
            if isinstance(c, tuple):
                ids, sums = c
                if len(ids):
                    indeg[ids - self.lo] += sums
            else:
                indeg += c
        un = self.state["layer"] < 0
        peel = un & (indeg == 0)
        self.state["layer"][peel] = layer
        return int(peel.sum())

    def topo_unassigned(self) -> int:
        return int((self.state["layer"] < 0).sum())

    # -- max-flow: synchronous push-relabel (Goldberg-Tarjan) ----------------
    #
    # Reference igraph_maxflow (src/flow.c:470-1092) runs a sequential
    # push-relabel with gap/global-relabel heuristics.  The distributed
    # version alternates PURE-push and PURE-relabel supersteps: within a
    # push round every shard uses the same height snapshot, so two
    # endpoints of one edge can never both find it admissible
    # (h[u]=h[v]+1 and h[v]=h[u]+1 are mutually exclusive) and replica
    # flow copies stay consistent; within a relabel round no flow moves,
    # so h'[v] = 1 + min(h[w] | residual (v,w)) preserves the validity
    # invariant h[v] <= h[w] + 1 on every residual arc.  A periodic
    # global relabel (residual BFS from t, then n + residual BFS to s)
    # keeps rounds near the residual distance, as in the reference.
    #
    # Edge state: true flow f(u,v) lives at shard(u) in fwd-CSR order
    # (mf_flow) with a replica at shard(v) in rev-CSR order (mf_rflow);
    # each push updates its local copy and ships (owner, other, delta)
    # to the replica, applied via a packed (local, other) key index.
    # Requires a SIMPLE graph (the (local, other) key must be unique) —
    # flow.py collapses parallel edges by capacity sum first.

    def mf_init(self, s: int, t: int):
        if self.size and (self.size - 1) * self.n + (self.n - 1) >= 2**62:
            raise ValueError("maxflow: vid range too large for packed edge keys")
        self.meta["mf_s"], self.meta["mf_t"] = int(s), int(t)
        # phase 1: route preflow to t (active = e>0, h<n; vertices at
        # h>=n freeze — their excess can no longer reach t); phase 2:
        # return leftover excess to s (active = e>0, h<2n).  Mirrors
        # the reference's two-phase igraph_maxflow (src/flow.c:470).
        self.meta["mf_phase"] = 1
        self.mf_cap = (
            self.fw_w.astype(np.float64) if self.fw_w is not None
            else np.ones(len(self.fw_dst))
        )
        self.mf_rcap = (
            self.rv_w.astype(np.float64) if self.rv_w is not None
            else np.ones(len(self.rv_src))
        )
        self.mf_flow = np.zeros(len(self.fw_dst))
        self.mf_rflow = np.zeros(len(self.rv_src))
        self.mf_e = np.zeros(self.size)
        self.mf_h = np.zeros(self.size, dtype=np.int64)
        if self.lo <= s < self.hi:
            self.mf_h[s - self.lo] = self.n
        # neighbor-height caches in CSR edge order (0 = everyone's start)
        self.mf_h_fwd = np.zeros(len(self.fw_dst), dtype=np.int64)
        self.mf_h_rev = np.zeros(len(self.rv_src), dtype=np.int64)
        # packed (local_vertex, other_endpoint) -> CSR position indices
        own_f = np.repeat(np.arange(self.size), np.diff(self.fw_indptr))
        key_f = own_f * self.n + self.fw_dst
        self.mf_fkey_perm = np.argsort(key_f, kind="stable")
        self.mf_fkey_sorted = key_f[self.mf_fkey_perm]
        own_r = np.repeat(np.arange(self.size), np.diff(self.rv_indptr))
        key_r = own_r * self.n + self.rv_src
        self.mf_rkey_perm = np.argsort(key_r, kind="stable")
        self.mf_rkey_sorted = key_r[self.mf_rkey_perm]
        self.mf_dist = None

    def _split_sparse_sum(self, keys, vals):
        """Per-destination-shard (ids, summed val) sparse messages."""
        order = np.argsort(keys, kind="stable")
        k, v = keys[order], vals[order]
        first = np.ones(len(k), dtype=bool)
        if len(k):
            first[1:] = k[1:] != k[:-1]
        idx = np.flatnonzero(first)
        uk = k[idx]
        sums = np.add.reduceat(v, idx) if len(idx) else v
        seg = np.searchsorted(uk, self.bounds)
        return [
            (uk[seg[q]:seg[q + 1]], sums[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def _mf_route_triples(self, owner, other, delta):
        """Sort (owner, other, delta) by owner and slice per shard."""
        order = np.argsort(owner, kind="stable")
        o, x, d = owner[order], other[order], delta[order]
        seg = np.searchsorted(o, self.bounds)
        return [
            (o[seg[q]:seg[q + 1]], x[seg[q]:seg[q + 1]], d[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def _mf_active(self):
        s, t = self.meta["mf_s"], self.meta["mf_t"]
        limit = self.n if self.meta["mf_phase"] == 1 else 2 * self.n
        act = (self.mf_e > 1e-12) & (self.mf_h < limit)
        for v in (s, t):
            if self.lo <= v < self.hi:
                act[v - self.lo] = False
        return act

    def mf_saturate_source(self):
        """First superstep: saturate every out-arc of s (preflow init,
        reference src/flow.c:557-569).  Only s's owner emits."""
        s = self.meta["mf_s"]
        empty = (np.empty(0, np.int64), np.empty(0))
        empty3 = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        if not (self.lo <= s < self.hi):
            return [(empty, empty3, empty3)] * self.P
        i = s - self.lo
        a, b = self.fw_indptr[i], self.fw_indptr[i + 1]
        pos = np.arange(a, b)
        pos = pos[self.mf_cap[pos] > 0]
        delta = self.mf_cap[pos]
        self.mf_flow[pos] = delta
        dsts = self.fw_dst[pos]
        ex = self._split_sparse_sum(dsts, delta)
        repl = self._mf_route_triples(
            dsts, np.full(len(dsts), s, dtype=np.int64), delta
        )
        return [(ex[q], repl[q], empty3) for q in range(self.P)]

    def mf_push_scatter(self):
        """Push round: discharge active vertices along admissible
        residual arcs under the shared height snapshot.  Per-arc
        allocation is vectorized: delta_j = min(r_j, remaining excess
        after the arcs before j) via a segmented cumsum."""
        act = self._mf_active()
        empty = (np.empty(0, np.int64), np.empty(0))
        empty3 = (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        idx = np.flatnonzero(act)
        if len(idx) == 0:
            return [(empty, empty3, empty3)] * self.P
        h = self.mf_h
        # candidate admissible arcs: fwd (kind 0) then rev (kind 1)
        parts = []
        fa, fb = self.fw_indptr[idx], self.fw_indptr[idx + 1]
        lens = fb - fa
        tot = int(lens.sum())
        if tot:
            first = np.concatenate(([0], np.cumsum(lens)))[:-1]
            flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(fa, lens)
            own = np.repeat(idx, lens)
            r = self.mf_cap[flat] - self.mf_flow[flat]
            adm = (r > 1e-12) & (h[own] == self.mf_h_fwd[flat] + 1)
            parts.append((own[adm], flat[adm], r[adm],
                          np.zeros(int(adm.sum()), dtype=np.int8)))
        ra, rb = self.rv_indptr[idx], self.rv_indptr[idx + 1]
        lens = rb - ra
        tot = int(lens.sum())
        if tot:
            first = np.concatenate(([0], np.cumsum(lens)))[:-1]
            flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(ra, lens)
            own = np.repeat(idx, lens)
            r = self.mf_rflow[flat]
            adm = (r > 1e-12) & (h[own] == self.mf_h_rev[flat] + 1)
            parts.append((own[adm], flat[adm], r[adm],
                          np.ones(int(adm.sum()), dtype=np.int8)))
        if not parts:
            return [(empty, empty3, empty3)] * self.P
        own = np.concatenate([p[0] for p in parts])
        pos = np.concatenate([p[1] for p in parts])
        res = np.concatenate([p[2] for p in parts])
        kind = np.concatenate([p[3] for p in parts])
        if len(own) == 0:
            return [(empty, empty3, empty3)] * self.P
        # group arcs by owner (stable: fwd arcs precede rev arcs)
        order = np.argsort(own, kind="stable")
        own, pos, res, kind = own[order], pos[order], res[order], kind[order]
        starts = np.ones(len(own), dtype=bool)
        starts[1:] = own[1:] != own[:-1]
        cum = np.cumsum(res)
        seg_base = np.repeat(cum[starts] - res[starts], np.diff(
            np.concatenate((np.flatnonzero(starts), [len(own)]))
        ))
        before = cum - res - seg_base
        delta = np.minimum(res, np.maximum(self.mf_e[own] - before, 0.0))
        keep = delta > 1e-12
        own, pos, delta, kind = own[keep], pos[keep], delta[keep], kind[keep]
        if len(own) == 0:
            return [(empty, empty3, empty3)] * self.P
        # apply locally
        np.subtract.at(self.mf_e, own, delta)
        f = kind == 0
        np.add.at(self.mf_flow, pos[f], delta[f])
        np.subtract.at(self.mf_rflow, pos[~f], delta[~f])
        # messages
        nbr = np.empty(len(own), dtype=np.int64)
        nbr[f] = self.fw_dst[pos[f]]
        nbr[~f] = self.rv_src[pos[~f]]
        ex = self._split_sparse_sum(nbr, delta)
        # replica updates: fwd push -> receiver owns dst, patches rflow
        # (kind-0 triple); rev push -> receiver owns src, patches flow
        # with a decrement (kind-1 triple)
        gown = own + self.lo
        repl0 = self._mf_route_triples(nbr[f], gown[f], delta[f])
        repl1 = self._mf_route_triples(nbr[~f], gown[~f], delta[~f])
        return [(ex[q], repl0[q], repl1[q]) for q in range(self.P)]

    def _mf_lookup(self, key_sorted, key_perm, loc, other):
        q = np.searchsorted(key_sorted, loc * self.n + other)
        return key_perm[q]

    def mf_push_gather(self, *sender_outs):
        for o in sender_outs:
            (eids, esum), (a_v, a_o, a_d), (b_v, b_o, b_d) = self._piece(o)
            if len(eids):
                np.add.at(self.mf_e, eids - self.lo, esum)
            if len(a_v):
                p = self._mf_lookup(self.mf_rkey_sorted, self.mf_rkey_perm,
                                    a_v - self.lo, a_o)
                np.add.at(self.mf_rflow, p, a_d)
            if len(b_v):
                p = self._mf_lookup(self.mf_fkey_sorted, self.mf_fkey_perm,
                                    b_v - self.lo, b_o)
                np.subtract.at(self.mf_flow, p, b_d)
        t = self.meta["mf_t"]
        t_ex = (
            float(self.mf_e[t - self.lo]) if self.lo <= t < self.hi else 0.0
        )
        return {"active": int(self._mf_active().sum()), "t_excess": t_ex}

    def mf_relabel_scatter(self):
        """Relabel round: h'[v] = 1 + min residual-neighbor height for
        active vertices with no admissible arc; broadcast changes."""
        act = self._mf_active()
        idx = np.flatnonzero(act)
        e64 = np.empty(0, np.int64)
        if len(idx) == 0:
            return [(e64, e64)] * self.P
        best = np.full(len(idx), 2 * self.n, dtype=np.int64)
        fa, fb = self.fw_indptr[idx], self.fw_indptr[idx + 1]
        lens = fb - fa
        tot = int(lens.sum())
        if tot:
            first = np.concatenate(([0], np.cumsum(lens)))[:-1]
            flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(fa, lens)
            owner_row = np.repeat(np.arange(len(idx)), lens)
            r = self.mf_cap[flat] - self.mf_flow[flat]
            hh = np.where(r > 1e-12, self.mf_h_fwd[flat], 2 * self.n)
            np.minimum.at(best, owner_row, hh)
        ra, rb = self.rv_indptr[idx], self.rv_indptr[idx + 1]
        lens = rb - ra
        tot = int(lens.sum())
        if tot:
            first = np.concatenate(([0], np.cumsum(lens)))[:-1]
            flat = np.arange(tot) - np.repeat(first, lens) + np.repeat(ra, lens)
            owner_row = np.repeat(np.arange(len(idx)), lens)
            r = self.mf_rflow[flat]
            hh = np.where(r > 1e-12, self.mf_h_rev[flat], 2 * self.n)
            np.minimum.at(best, owner_row, hh)
        newh = np.minimum(best + 1, 2 * self.n)
        up = newh > self.mf_h[idx]
        vids = idx[up] + self.lo
        hs = newh[up]
        self.mf_h[idx[up]] = hs
        return [(vids, hs)] * self.P if self.P else []

    def mf_heights_gather(self, *sender_outs) -> int:
        """Patch per-arc neighbor-height caches from (vid, h) updates."""
        changed = 0
        for o in sender_outs:
            vids, hs = self._piece(o)
            if len(vids) == 0:
                continue
            changed += len(vids)
            self._patch_cache(
                self.mf_h_fwd, self.fw_ustarts, self.fw_udsts,
                self.fw_dperm, self.fw_uends, vids, hs,
            )
            self._patch_cache(
                self.mf_h_rev, self.rv_ustarts, self.rv_usrcs,
                self.rv_sperm, self.rv_uends, vids, hs,
            )
        return changed

    def mf_broadcast_heights(self):
        """(vid, h) for every locally nonzero height — cache (re)seed."""
        idx = np.flatnonzero(self.mf_h != 0)
        return [(idx + self.lo, self.mf_h[idx])] * self.P

    # residual BFS (global relabel + min-cut side).  direction:
    # "to"   — dist(v) = residual distance v -> seed (expand along arcs
    #          INTO the frontier: in-arcs with spare capacity, out-arcs
    #          with flow);
    # "from" — dist(v) = residual distance seed -> v (expand along arcs
    #          OUT of the frontier: out-arcs with spare capacity,
    #          in-arcs with flow).

    def mf_resbfs_init(self, seeds):
        dist = np.full(self.size, np.iinfo(np.int64).max, dtype=np.int64)
        sd = np.asarray(seeds, dtype=np.int64)
        mine = sd[(sd >= self.lo) & (sd < self.hi)]
        dist[mine - self.lo] = 0
        self.mf_dist = dist
        self.mf_changed = np.zeros(self.size, dtype=bool)
        self.mf_changed[mine - self.lo] = True

    def mf_resbfs_scatter(self, direction: str):
        """Frontier-indexed residual BFS expansion: only the CHANGED
        vertices' arcs are touched, so a whole BFS costs O(E) total —
        the previous full-arc-mask version (np.repeat over every arc
        at every level) cost O(E x depth) per BFS, the dominant hidden
        cost of maxflow's periodic global relabels on deep networks
        (~51 levels x 12 relabels on the 50x2000 bench network)."""
        d = self.mf_dist
        idx = np.flatnonzero(self.mf_changed)
        keys_l, val_l = [], []
        if len(idx):
            if direction == "to":
                specs = (
                    (self.rv_indptr, self.rv_src, "rcap_rflow"),
                    (self.fw_indptr, self.fw_dst, "flow_pos"),
                )
            else:
                specs = (
                    (self.fw_indptr, self.fw_dst, "cap_flow"),
                    (self.rv_indptr, self.rv_src, "rflow_pos"),
                )
            for indptr, others, kind in specs:
                fa, fb = indptr[idx], indptr[idx + 1]
                lens = fb - fa
                tot = int(lens.sum())
                if tot == 0:
                    continue
                first = np.concatenate(([0], np.cumsum(lens)))[:-1]
                flat = (np.arange(tot) - np.repeat(first, lens)
                        + np.repeat(fa, lens))
                if kind == "rcap_rflow":
                    m = self.mf_rcap[flat] - self.mf_rflow[flat] > 1e-12
                elif kind == "flow_pos":
                    m = self.mf_flow[flat] > 1e-12
                elif kind == "cap_flow":
                    m = self.mf_cap[flat] - self.mf_flow[flat] > 1e-12
                else:
                    m = self.mf_rflow[flat] > 1e-12
                keys_l.append(others[flat[m]])
                val_l.append(np.repeat(d[idx], lens)[m] + 1)
        keys = np.concatenate(keys_l) if keys_l else np.empty(0, np.int64)
        vals = np.concatenate(val_l) if val_l else np.empty(0, np.int64)
        return self._split_sparse_min(keys, vals)

    def mf_resbfs_gather(self, *sender_outs):
        new = self.mf_dist.copy()
        for ids, vals in (self._piece(o) for o in sender_outs):
            if len(ids):
                np.minimum.at(new, ids - self.lo, vals)
        changed = new < self.mf_dist
        self.mf_dist = new
        self.mf_changed = changed
        return {"changed": int(changed.sum())}

    def mf_apply_global_relabel(self):
        """Phase-1 global relabel from a finished residual BFS to t:
        h = max(h, dist_t) for reached vertices, max(h, n) for
        unreached (their excess can no longer reach t).  s and t keep
        their pinned heights.  Exact residual distances are a valid
        labeling, so monotone max() preserves the invariant."""
        INF = np.iinfo(np.int64).max
        reach = self.mf_dist < INF
        s, t = self.meta["mf_s"], self.meta["mf_t"]
        pin = np.zeros(self.size, dtype=bool)
        for v in (s, t):
            if self.lo <= v < self.hi:
                pin[v - self.lo] = True
        m = reach & ~pin
        self.mf_h[m] = np.maximum(self.mf_h[m], self.mf_dist[m])
        m = ~reach & ~pin
        self.mf_h[m] = np.maximum(self.mf_h[m], self.n)

    def mf_set_phase2(self):
        """Enter phase 2 after a finished residual BFS to s:
        h = n + dist_s (reached) / 2n (unreached), one-time fresh
        labeling for the excess-return run (reference src/flow.c phase
        2; hi_pr does the same re-initialization)."""
        INF = np.iinfo(np.int64).max
        self.meta["mf_phase"] = 2
        s, t = self.meta["mf_s"], self.meta["mf_t"]
        reach = self.mf_dist < INF
        h = np.where(reach, self.mf_dist + self.n, 2 * self.n)
        self.mf_h = h.astype(np.int64)
        if self.lo <= s < self.hi:
            self.mf_h[s - self.lo] = self.n
        if self.lo <= t < self.hi:
            self.mf_h[t - self.lo] = 0
        # caches must be rebuilt: heights may have moved down
        self.mf_h_fwd[:] = 0
        self.mf_h_rev[:] = 0

    def mf_apply_phase2_relabel(self):
        """Mid-phase-2 refresh from a finished residual BFS to s:
        monotone h = max(h, n + dist_s) (2n for unreached — those
        carry no excess)."""
        INF = np.iinfo(np.int64).max
        s, t = self.meta["mf_s"], self.meta["mf_t"]
        reach = self.mf_dist < INF
        tgt = np.where(reach, self.mf_dist + self.n, 2 * self.n)
        pin = np.zeros(self.size, dtype=bool)
        for v in (s, t):
            if self.lo <= v < self.hi:
                pin[v - self.lo] = True
        m = ~pin
        self.mf_h[m] = np.maximum(self.mf_h[m], tgt[m])

    def mf_reachable_mask(self):
        return self.mf_dist < np.iinfo(np.int64).max

    def mf_sside_table(self):
        """(vid) rows of this shard's NON-t-reaching vertices after the
        cut BFS — the s-side of the min cut, shipped as an Arrow block
        instead of an O(n) driver-side mask concat."""
        return pa.table({
            "vid": np.flatnonzero(
                self.mf_dist >= np.iinfo(np.int64).max
            ) + self.lo
        })

    def mf_broadcast_reach(self):
        """(vid, 1) for locally t-reaching vertices after the cut
        BFS — patches receivers' per-arc reach caches."""
        idx = np.flatnonzero(self.mf_dist < np.iinfo(np.int64).max)
        return [(idx + self.lo, np.ones(len(idx), dtype=np.int64))] * self.P

    def mf_cut_table(self, *sender_outs) -> pa.Table:
        """Saturated crossing edges (src S-side = cannot reach t,
        dst T-side = reaches t) of the min cut, from locally-owned
        fwd arcs."""
        reach_dst = np.zeros(len(self.fw_dst), dtype=np.int64)
        for o in sender_outs:
            vids, ones = self._piece(o)
            self._patch_cache(
                reach_dst, self.fw_ustarts, self.fw_udsts,
                self.fw_dperm, self.fw_uends, vids, ones,
            )
        src_sside = np.repeat(
            self.mf_dist == np.iinfo(np.int64).max, np.diff(self.fw_indptr)
        )
        own = np.repeat(
            np.arange(self.lo, self.hi, dtype=np.int64),
            np.diff(self.fw_indptr),
        )
        m = src_sside & (reach_dst == 1) & (self.mf_cap > 0)
        return pa.table({
            "src": own[m], "dst": self.fw_dst[m], "capacity": self.mf_cap[m],
        })

    def mf_push_gather_relabel(self, *sender_outs):
        """Fused push-gather + relabel-scatter: the relabel reads this
        shard's post-push residual caches, so running it in the same
        actor call is semantically the sequential pair with one less
        BSP barrier — on a multi-node cluster each barrier is a network
        round-trip and deep networks run many rounds (88 on the 50x2000
        bench network); locally the rounds are numpy-bound so the
        fusion is about wire latency, not CPU."""
        self.mf_push_gather(*sender_outs)
        return self.mf_relabel_scatter()

    def mf_heights_gather_stats(self, *sender_outs):
        """Fused heights-gather + round stats (saves the separate
        mf_stats barrier per round)."""
        self.mf_heights_gather(*sender_outs)
        return self.mf_stats()

    def mf_stats(self):
        s, t = self.meta["mf_s"], self.meta["mf_t"]
        ex = self.mf_e.copy()
        for v in (s, t):
            if self.lo <= v < self.hi:
                ex[v - self.lo] = 0.0
        return {
            "active": int(self._mf_active().sum()),
            "t_excess": (
                float(self.mf_e[t - self.lo]) if self.lo <= t < self.hi else 0.0
            ),
            "frozen_excess": float(ex[ex > 0].sum()),
        }

    def mf_flow_table(self) -> pa.Table:
        """(src, dst, flow) for locally-owned edges with flow > 0."""
        own = np.repeat(
            np.arange(self.lo, self.hi, dtype=np.int64),
            np.diff(self.fw_indptr),
        )
        m = self.mf_flow > 1e-12
        return pa.table({
            "src": own[m], "dst": self.fw_dst[m], "flow": self.mf_flow[m],
        })

    def mf_free(self):
        for a in ("mf_cap", "mf_rcap", "mf_flow", "mf_rflow", "mf_e",
                  "mf_h", "mf_h_fwd", "mf_h_rev", "mf_fkey_perm",
                  "mf_fkey_sorted", "mf_rkey_perm", "mf_rkey_sorted",
                  "mf_dist"):
            if hasattr(self, a):
                delattr(self, a)

    # -- random walks (igraph_random_walk, src/random_walk.c:55: uniform
    #    next-neighbor steps, walk stops at a sink).  Walks are owned by
    #    the shard of their CURRENT vertex and hop between shards as
    #    messages; each shard appends (walk, step, vid) visit records
    #    for walks while resident, so per-superstep traffic is O(active
    #    walks), not O(walks x length).  Next-step sampling is a seeded
    #    counter hash of (walk, step) — deterministic for any P. -----------

    def rw_init(self, walk_ids, starts, seed: int, weighted: bool):
        self.meta["rw_seed"] = int(seed)
        self.meta["rw_weighted"] = bool(weighted and self.weighted)
        w = np.asarray(walk_ids, dtype=np.int64)
        v = np.asarray(starts, dtype=np.int64)
        mine = (v >= self.lo) & (v < self.hi)
        self.rw_ids = w[mine]
        self.rw_cur = v[mine]
        self.rw_step = np.zeros(len(self.rw_ids), dtype=np.int64)
        self.rw_rec = [
            (self.rw_ids.copy(), self.rw_step.copy(), self.rw_cur.copy())
        ]
        if self.meta["rw_weighted"]:
            self.rw_cumw = np.concatenate(
                ([0.0], np.cumsum(self.fw_w))
            )

    @staticmethod
    def _rw_hash(ids, step, seed):
        # mix constants folded in python ints (numpy SCALAR uint64
        # multiplies warn on wraparound; array ops wrap silently)
        k = np.uint64((step + seed * 0x94D049BB133111EB) % (1 << 64))
        x = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        x ^= k
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def rw_advance(self):
        """One step for all resident walks: sample next neighbor,
        route (walk_id, step+1, next_vid) to the next owner."""
        e = np.empty(0, np.int64)
        if len(self.rw_ids) == 0:
            return [(e, e, e)] * self.P
        loc = self.rw_cur - self.lo
        deg = np.diff(self.fw_indptr)[loc]
        alive = deg > 0
        ids = self.rw_ids[alive]
        loc = loc[alive]
        step = self.rw_step[alive]
        h = self._rw_hash(ids, 0, self.meta["rw_seed"])
        h = self._rw_hash(h + step.astype(np.uint64), 1, self.meta["rw_seed"])
        starts_ = self.fw_indptr[loc]
        if self.meta["rw_weighted"]:
            tot = self.rw_cumw[self.fw_indptr[loc + 1]] - self.rw_cumw[starts_]
            u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            tgt = self.rw_cumw[starts_] + u * tot
            pos = np.searchsorted(self.rw_cumw, tgt, side="right") - 1
            pos = np.minimum(
                np.maximum(pos, starts_), self.fw_indptr[loc + 1] - 1
            )
        else:
            pos = starts_ + (h % deg[alive].astype(np.uint64)).astype(np.int64)
        nxt = self.fw_dst[pos]
        # drop walk state locally; records for past residency are kept
        self.rw_ids = np.empty(0, np.int64)
        self.rw_cur = np.empty(0, np.int64)
        self.rw_step = np.empty(0, np.int64)
        order = np.argsort(nxt, kind="stable")
        ids, nsteps, nxt = ids[order], step[order] + 1, nxt[order]
        seg = np.searchsorted(nxt, self.bounds)
        return [
            (ids[seg[q]:seg[q + 1]], nsteps[seg[q]:seg[q + 1]],
             nxt[seg[q]:seg[q + 1]])
            for q in range(self.P)
        ]

    def rw_gather(self, *sender_outs) -> int:
        ids_l, step_l, cur_l = [], [], []
        for o in sender_outs:
            ids, steps, vs = self._piece(o)
            if len(ids):
                ids_l.append(ids)
                step_l.append(steps)
                cur_l.append(vs)
        if ids_l:
            self.rw_ids = np.concatenate(ids_l)
            self.rw_step = np.concatenate(step_l)
            self.rw_cur = np.concatenate(cur_l)
            self.rw_rec.append(
                (self.rw_ids.copy(), self.rw_step.copy(), self.rw_cur.copy())
            )
        return int(len(self.rw_ids))

    def rw_table(self) -> pa.Table:
        if not getattr(self, "rw_rec", None):
            return pa.table({
                "walk": np.empty(0, np.int64),
                "step": np.empty(0, np.int64),
                "vid": np.empty(0, np.int64),
            })
        return pa.table({
            "walk": np.concatenate([r[0] for r in self.rw_rec]),
            "step": np.concatenate([r[1] for r in self.rw_rec]),
            "vid": np.concatenate([r[2] for r in self.rw_rec]),
        })

    def rw_free(self):
        for a in ("rw_ids", "rw_cur", "rw_step", "rw_rec", "rw_cumw"):
            if hasattr(self, a):
                delattr(self, a)

    # -- checkpoint / restore -------------------------------------------------
    #
    # Checkpoints address a filesystem URI, not actor-local disk
    # (round-1 verdict: local paths break on multi-node without a
    # shared FS).  Plain paths resolve to the local filesystem;
    # s3:// / gs:// / hdfs:// resolve through pyarrow.fs.  Atomicity
    # comes from the driver-written _SUCCESS marker (readers only
    # trust complete iterations), which also works on object stores
    # where rename isn't atomic.

    def save_state(self, directory: str, cols) -> dict:
        fs, base = _fs_for(directory)
        fs.create_dir(base, recursive=True)
        with fs.open_output_stream(f"{base}/part={self.p}.parquet") as f:
            pq.write_table(self.state_table(cols), f)
        return {"part": self.p, "rows": self.size}

    def load_state(self, directory: str, cols):
        fs, base = _fs_for(directory)
        with fs.open_input_file(f"{base}/part={self.p}.parquet") as f:
            t = pq.read_table(f)
        for c in cols:
            self.state[c] = t[c].to_numpy().copy()
        return self.p


# ---------------------------------------------------------------------------
# driver-side engine handle


class GraphEngine:
    """Driver handle over P GraphShard actors.

    Build once per graph (the analog of igraph_create +
    igraph_i_create_start, reference src/type_indexededgelist.c:258,835);
    algorithms in sibling modules drive supersteps against it.
    """

    def __init__(self, shards, bounds, n: int, edges: int, weighted: bool,
                 per_dest_refs: bool | None = None):
        self.shards = shards
        self.bounds = bounds
        self.P = len(shards)
        self.n = n
        self.edge_count = edges
        self.weighted = weighted
        # Message wire layout for supersteps.  Single-object mode (one
        # ref holding all P per-destination slices) is fastest on one
        # node: the object store makes the P reads zero-copy and the
        # ref count per superstep is O(P), not O(P^2) (measured 50 ms
        # vs 195 ms per PageRank iter at P=8 — BASELINE.md).  On a real
        # multi-node cluster every receiver would pull ~P x the bytes
        # it needs, so per-destination refs (num_returns=P, like the
        # build path's _route) become mandatory; enable with
        # per_dest_refs=True or XDATA_PER_DEST_REFS=1.
        if per_dest_refs is None:
            env = os.environ.get("XDATA_PER_DEST_REFS", "")
            if env:
                per_dest_refs = env not in ("0",)
            else:
                # default by topology: on a multi-node cluster the
                # single-object wire mode makes every receiver pull
                # ~P x the bytes it needs, so per-destination refs
                # are the right default there; single node keeps the
                # zero-copy single-object mode (proven output-equal,
                # test_engine_modes.py)
                try:
                    alive = sum(1 for nd in ray.nodes()
                                if nd.get("Alive", False))
                except Exception:
                    alive = 1
                per_dest_refs = alive > 1
        self.per_dest_refs = bool(per_dest_refs)

    # -- superstep message routing ------------------------------------------

    def scatter(self, method: str, *args):
        """Launch a scatter on every shard; returns one entry per
        sender (a single ref, or a list of P per-destination refs in
        per_dest_refs mode)."""
        if self.per_dest_refs and self.P > 1:
            return [
                getattr(s, method).options(num_returns=self.P).remote(*args)
                for s in self.shards
            ]
        return [getattr(s, method).remote(*args) for s in self.shards]

    def pieces(self, outs, q: int):
        """The args to pass to receiver ``q``'s gather for ``outs``."""
        return [o[q] if isinstance(o, list) else o for o in outs]

    def gather_scatter(self, method: str, outs, *args):
        """Fused receive-then-send stage: each shard consumes its
        pieces of ``outs`` and returns a fresh scatter, with the same
        wire-mode handling as scatter() — one BSP barrier instead of
        two for gather stages whose output feeds the next exchange."""
        if self.per_dest_refs and self.P > 1:
            return [
                getattr(s, method).options(num_returns=self.P).remote(
                    *args, *self.pieces(outs, q))
                for q, s in enumerate(self.shards)
            ]
        return [
            getattr(s, method).remote(*args, *self.pieces(outs, q))
            for q, s in enumerate(self.shards)
        ]

    # -- construction --------------------------------------------------------

    @classmethod
    def from_edges(
        cls,
        edges: Dataset | pa.Table | list,
        n: int | None = None,
        P: int = DEFAULT_SHARDS,
        weighted: bool = False,
        per_dest_refs: bool | None = None,
        bounds=None,
        symmetric: bool = False,
        symmetrize: bool = False,
        collapse_multi: bool = False,
        narrow: bool = False,
    ) -> "GraphEngine":
        """``symmetric=True``: caller asserts the arc multiset is
        symmetric; only the rv direction is routed/sorted and the fw
        CSR aliases it (see GraphShard.finalize).  Safe for callers
        that read fw only through order-insensitive reductions (the
        community path); do NOT combine with _ensure_und traversals
        (mode="all"), which would double every arc's multiplicity.
        ``symmetrize=True``: input refs are DIRECTED edges; the route
        tasks emit both orientations (weight column added as 1.0 when
        absent), building the same symmetric engine without ever
        materializing the doubled arc table.  Implies symmetric."""
        if isinstance(edges, pa.Table):
            refs = [ray.put(edges)]
        elif isinstance(edges, list):
            refs = edges
        else:
            refs = block_refs(edges)
        if n is None:
            @ray.remote
            def _mx(b):
                if len(b) == 0:
                    return -1
                return max(int(pa.compute.max(b["src"]).as_py()),
                           int(pa.compute.max(b["dst"]).as_py()))
            n = max(ray.get([_mx.remote(r) for r in refs])) + 1
        P = max(1, min(P, max(1, n)))
        if len(refs) > 2 * P:
            # coalesce tiny read blocks so routing/ingest is O(P) tasks,
            # not O(read_blocks x P) actor calls.  Driver-side bundling
            # (P order-preserving concat tasks) — NOT Dataset.repartition,
            # whose all-to-all machinery measured 17 s on a 198-block
            # 12.7M-edge read that these concats do in under a second.
            groups = np.array_split(np.arange(len(refs)), P)
            refs = [
                _concat_blocks.remote(*[refs[i] for i in g])
                for g in groups if len(g)
            ]
        if bounds is not None:
            # caller-pinned vid ranges: co-partition this engine with
            # another one over the same vertex set (scan_k THEM, twin-
            # graph statistics) so per-shard state transfers 1:1
            bounds = np.asarray(bounds, dtype=np.int64)
            if len(bounds) != P + 1 or int(bounds[-1]) < n:
                raise ValueError(
                    f"from_edges: bounds must have P+1={P + 1} entries "
                    f"covering [0, {n}); got {bounds!r}"
                )
        else:
            bounds = plan_bounds(refs, n, P)
        shards = [
            GraphShard.remote(p, bounds, n, weighted, collapse_multi,
                              narrow)
            for p in range(P)
        ]
        if symmetrize:
            symmetric = True
        fwd_parts: list[list] = [[] for _ in range(P)]
        rev_parts: list[list] = [[] for _ in range(P)]
        for r in refs:
            if not symmetric:
                fparts = _route.options(num_returns=P if P > 1 else 1).remote(r, bounds, "src")
                fparts = [fparts] if P == 1 else fparts
                for p in range(P):
                    fwd_parts[p].append(fparts[p])
            router = (
                _route_sym.options(num_returns=P if P > 1 else 1).remote(
                    r, bounds, collapse_multi)
                if symmetrize else
                _route.options(num_returns=P if P > 1 else 1).remote(r, bounds, "dst")
            )
            rparts = [router] if P == 1 else router
            for p in range(P):
                rev_parts[p].append(rparts[p])
        waits = [] if symmetric else [
            shards[p].ingest_fwd.remote(*fwd_parts[p]) for p in range(P)
        ]
        waits += [shards[p].ingest_rev.remote(*rev_parts[p]) for p in range(P)]
        ray.get(waits)
        infos = ray.get([s.finalize.remote(symmetric) for s in shards])
        edges_total = sum(i["edges"] for i in infos)
        return cls(shards, bounds, n, edges_total, weighted,
                   per_dest_refs=per_dest_refs)

    def shutdown(self, force: bool = False):
        """Release shard actors eagerly (GC also reclaims them, but
        engine-churning callers — tests, benches — should be explicit).

        An engine marked ``persistent = True`` (shared across many
        queries, e.g. the driver-gate cache in ``__ray_entry__``)
        ignores plain shutdown() so per-query cleanup code stays
        uniform; pass force=True to really release it."""
        if getattr(self, "persistent", False) and not force:
            return
        for s in self.shards:
            ray.kill(s, no_restart=True)
        self.shards = []

    # -- exports -------------------------------------------------------------

    def degrees(self) -> Dataset:
        return rd.from_arrow_refs([s.degree_table.remote() for s in self.shards])

    def state_dataset(self, cols, rename=None) -> Dataset:
        return rd.from_arrow_refs(
            [s.state_table.remote(cols, rename) for s in self.shards]
        )

    def state_arrays(self, col) -> np.ndarray:
        """Driver-side dense array of a state column (test/small-scale)."""
        parts = ray.get([s.get_state.remote(col) for s in self.shards])
        return np.concatenate([p[col] for p in parts])

    # -- label renumbering ----------------------------------------------------

    def renumber_labels(self, state_key="label"):
        """Replace label values with their rank among distinct labels in
        ascending order — reproduces igraph's WCC numbering (component id
        = rank of its minimum vertex id, src/components.c:119-149).

        Fully distributed: labels are vids, so the shard bounds define
        label ownership; the driver sees only P partition counts (never
        a label array — component count is O(n) on web-scale WCC)."""
        outs = [
            s.relabel_uniq_split.remote(state_key) for s in self.shards
        ]
        counts = ray.get([
            s.relabel_collect.remote(*outs) for s in self.shards
        ])
        offsets = np.concatenate(([0], np.cumsum(counts)))
        answers = [
            self.shards[q].relabel_answer.remote(int(offsets[q]), *outs)
            for q in range(self.P)
        ]
        ray.get([
            s.relabel_apply.remote(state_key, *answers) for s in self.shards
        ])
        # owners keep _relabel_dom; callers needing a second old->rank
        # query round (louvain's cache contraction) reuse these offsets
        self._renumber_offsets = offsets
        return int(offsets[-1])

    def renumber_labels_first_appearance(self, state_key="label"):
        """Renumber labels by ascending min carrier vid — igraph LPA's
        first-appearance-in-vertex-id-order rule
        (src/community.c:2320-2339).  Same O(P)-refs discipline: the
        driver holds only partition counts."""
        outs = [
            s.relabel_uniq_split.remote(state_key, True) for s in self.shards
        ]
        ray.get([s.relabel_collect.remote(*outs) for s in self.shards])
        # rank label domains by min carrier vid (distinct across labels)
        mv_outs = [s.relabel_dom_minvids.remote() for s in self.shards]
        counts = ray.get([
            s.relabel_minvid_collect.remote(*mv_outs) for s in self.shards
        ])
        offsets = np.concatenate(([0], np.cumsum(counts)))
        rank_outs = [
            self.shards[q].relabel_minvid_rank.remote(int(offsets[q]))
            for q in range(self.P)
        ]
        ray.get([
            s.relabel_install_minvid_ranks.remote(*rank_outs)
            for s in self.shards
        ])
        answers = [
            self.shards[q].relabel_answer.remote(0, *outs)
            for q in range(self.P)
        ]
        ray.get([
            s.relabel_apply.remote(state_key, *answers) for s in self.shards
        ])
        return int(offsets[-1])

    # -- checkpointing ---------------------------------------------------------

    def checkpoint(self, ckpt_root, algo, it, cols, metrics_rows, lineage):
        d = f"{ckpt_root}/{algo}/iter={it}"
        ray.get([s.save_state.remote(d, cols) for s in self.shards])
        fs, base = _fs_for(d)
        with fs.open_output_stream(f"{base}/metrics.parquet") as f:
            pq.write_table(
                pa.Table.from_pylist(
                    metrics_rows, schema=schemas.CKPT_METRICS
                ),
                f,
            )
        with fs.open_output_stream(f"{base}/lineage.json") as f:
            f.write(json.dumps(
                {**lineage, "iter": it, "ts": time.time()}
            ).encode())
        # the commit marker — written LAST; readers only trust marked
        # iterations (atomic enough for object stores too)
        with fs.open_output_stream(f"{base}/_SUCCESS") as f:
            f.write(b"ok")

    @staticmethod
    def latest_checkpoint(ckpt_root, algo) -> int | None:
        from pyarrow import fs as pafs

        fs, base = _fs_for(f"{ckpt_root}/{algo}")
        try:
            entries = fs.get_file_info(
                pafs.FileSelector(base, allow_not_found=True)
            )
        except FileNotFoundError:
            return None
        its = []
        for e in entries:
            name = e.base_name
            if name.startswith("iter="):
                marker = fs.get_file_info(f"{e.path}/_SUCCESS")
                if marker.type != pafs.FileType.NotFound:
                    its.append(int(name.split("=")[1]))
        return max(its) if its else None

    def restore(self, ckpt_root, algo, it, cols):
        d = f"{ckpt_root}/{algo}/iter={it}"
        ray.get([s.load_state.remote(d, cols) for s in self.shards])
