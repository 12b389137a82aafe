"""Triad census and size-3 motif counts (reference igraph_triad_census
src/motifs.c:913-1042, igraph_motifs_randesu :121).

The reference classifies every vertex triple sequentially; the
distributed re-expression enumerates only triples with >= 2 connected
pairs (wedge generation on the undirected support — the same machinery
as triangles.py) and recovers the 1-pair and empty classes by
combinatorial complement:

  1. directed pair codes: per unordered pair (a < b),
     code = 1 (a->b) | 2 (b->a)  (3 = mutual) — a grouped bit-OR
  2. wedges per center: every pair is routed to both endpoints; each
     center emits its vid-sorted neighbor pairs with their codes
  3. probe the third pair: left join wedges against the pair table —
     triples whose third pair exists are triangles, generated at all
     three centers, kept only at the minimum-vid center
  4. classify with a 64-entry lookup (canonical-pair-code triple ->
     triad name, validated against networkx.triadic_census in tests)
  5. classes 012/102 follow from pair counts minus their occurrences
     inside counted triples; 003 is the complement of everything

Scale shape: wedge volume is sum(deg^2)/2 over the support — the same
bound as triangle counting; no driver-side per-triple work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..exchange import (
    DEFAULT_PARTITIONS,
    block_refs,
    exchange,
    hash_join,
)

# igraph's triad census order (src/motifs.c:1042 doc block)
TRIAD_NAMES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# canonical-code lookup: index = c12*16 + c13*4 + c23 over the
# vid-sorted triple's canonical pair codes (0 none / 1 lo->hi /
# 2 hi->lo / 3 mutual).  Generated once from networkx.triadic_census
# over all 64 code combinations; tests re-derive it independently.
_TRIAD_OF_CODE = [
    "003", "012", "012", "102", "012", "021U", "021C", "111D",
    "012", "021C", "021D", "111U", "102", "111D", "111U", "201",
    "012", "021C", "021U", "111D", "021D", "030T", "030T", "120D",
    "021C", "030C", "030T", "120C", "111U", "120C", "120U", "210",
    "012", "021D", "021C", "111U", "021C", "030T", "030C", "120C",
    "021U", "030T", "030T", "120U", "111D", "120D", "120C", "210",
    "102", "111U", "111D", "201", "111U", "120U", "120C", "210",
    "111D", "120C", "120D", "210", "201", "210", "210", "300",
]
_LOOKUP = np.array(
    [TRIAD_NAMES.index(nm) for nm in _TRIAD_OF_CODE], dtype=np.int64
)
# mutual / asymmetric pair counts per class (the M and A of the MAN
# label) — used for the complement counting of 102 / 012
_MUT_OF_CLASS = np.array([int(nm[0]) for nm in TRIAD_NAMES])
_ASYM_OF_CLASS = np.array([int(nm[1]) for nm in TRIAD_NAMES])


@ray.remote
def _pair_bits(tbl: pa.Table) -> pa.Table:
    s = tbl["src"].to_numpy()
    d = tbl["dst"].to_numpy()
    keep = s != d
    s, d = s[keep], d[keep]
    return pa.table(
        {
            "a": np.minimum(s, d),
            "b": np.maximum(s, d),
            "code": np.where(s < d, 1, 2).astype(np.int64),
        }
    )


def _or_codes(t: pa.Table) -> pa.Table:
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    c = t["code"].to_numpy()
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    new = np.ones(len(a), dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    idx = np.flatnonzero(new)
    code = np.bitwise_or.reduceat(c, idx) if len(idx) else c
    return pa.table({"a": a[idx], "b": b[idx], "code": code})


def _wedges(t: pa.Table) -> pa.Table:
    """Per-center vid-sorted neighbor pairs with codes."""
    c = t["c"].to_numpy()
    o = t["o"].to_numpy()
    code = t["code"].to_numpy()
    order = np.lexsort((o, c))
    c, o, code = c[order], o[order], code[order]
    starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
    sizes = np.diff(np.concatenate((starts, [len(c)])))
    pos = np.arange(len(c)) - np.repeat(starts, sizes)
    k = np.repeat(sizes, sizes)
    tail = k - 1 - pos
    total = int(tail.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return pa.table({"x": e, "y": e, "center": e, "cx": e, "cy": e})
    row_i = np.repeat(np.arange(len(c)), tail)
    first = np.concatenate(([0], np.cumsum(tail)))[:-1]
    off = np.arange(total) - first[row_i]
    row_j = row_i + 1 + off
    return pa.table(
        {
            "x": o[row_i], "y": o[row_j], "center": c[row_i],
            "cx": code[row_i], "cy": code[row_j],
        }
    )


@ray.remote
def _classify(tbl: pa.Table) -> np.ndarray:
    """16-bin class histogram + [sum asym-in-triple, sum mut-in-triple]."""
    if len(tbl) == 0:
        return np.zeros(18, dtype=np.int64)
    x = tbl["x"].to_numpy()
    cen = tbl["center"].to_numpy()
    cx = tbl["cx"].to_numpy()
    cy = tbl["cy"].to_numpy()
    cxy = tbl["cxy"].to_numpy(zero_copy_only=False)
    cxy = np.nan_to_num(cxy).astype(np.int64)
    # triangles (third pair present) are generated at all three
    # centers; keep only the minimum-vid one (x < y always holds)
    keep = (cxy == 0) | (cen < x)
    x, cen, cx, cy, cxy = x[keep], cen[keep], cx[keep], cy[keep], cxy[keep]
    y = tbl["y"].to_numpy()[keep]
    code64 = np.where(
        cen < x,
        cx * 16 + cy * 4 + cxy,
        np.where(cen < y, cx * 16 + cxy * 4 + cy, cxy * 16 + cx * 4 + cy),
    )
    cls = _LOOKUP[code64]
    out = np.zeros(18, dtype=np.int64)
    out[:16] = np.bincount(cls, minlength=16)
    out[16] = int(_ASYM_OF_CLASS[cls].sum())
    out[17] = int(_MUT_OF_CLASS[cls].sum())
    return out


@ray.remote
def _pair_stats(tbl: pa.Table) -> np.ndarray:
    c = tbl["code"].to_numpy()
    return np.array([int((c != 3).sum()), int((c == 3).sum())])


def triad_census(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> dict[str, int]:
    """The 16-class directed triad census (igraph order)."""
    refs = edges if isinstance(edges, list) else block_refs(edges)
    bits = [_pair_bits.remote(r) for r in refs]
    pairs = exchange(
        bits, ["a", "b"], P=P, map_fn=_or_codes, reduce_fn=_or_codes,
        as_refs=True,
    )

    @ray.remote
    def nb(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": np.concatenate((t["a"].to_numpy(), t["b"].to_numpy())),
                "o": np.concatenate((t["b"].to_numpy(), t["a"].to_numpy())),
                "code": np.concatenate((t["code"].to_numpy(),) * 2),
            }
        )

    wedge_refs = exchange(
        [nb.remote(r) for r in pairs], ["c"], P=P, reduce_fn=_wedges,
        as_refs=True,
    )
    probed = hash_join(
        wedge_refs,
        [_rename_pair.remote(r) for r in pairs],
        keys=["x", "y"], right_keys=["x", "y"],
        how="left outer", P=P, as_refs=True,
    )
    hists = ray.get([_classify.remote(r) for r in probed])
    agg = np.sum(hists, axis=0)
    counts = dict(zip(TRIAD_NAMES, agg[:16].astype(int)))
    stats = np.sum(ray.get([_pair_stats.remote(r) for r in pairs]), axis=0)
    asym_pairs, mut_pairs = int(stats[0]), int(stats[1])
    counts["012"] = asym_pairs * (n - 2) - int(agg[16])
    counts["102"] = mut_pairs * (n - 2) - int(agg[17])
    total = n * (n - 1) * (n - 2) // 6
    counts["003"] = total - sum(
        v for k, v in counts.items() if k != "003"
    )
    return counts


@ray.remote
def _rename_pair(t: pa.Table) -> pa.Table:
    return pa.table({"x": t["a"], "y": t["b"], "cxy": t["code"]})


def motifs_3_undirected(
    edges: Dataset | list, n: int, P: int = DEFAULT_PARTITIONS
) -> dict[str, int]:
    """Connected undirected 3-subgraph counts: open wedges (paths) and
    closed triangles (igraph_motifs_randesu size=3 undirected counts
    the same two connected isoclasses; reference src/motifs.c:121).
    Derived from the triad census: every directed class maps to an
    undirected support shape by its null-pair count."""
    census = triad_census(edges, n, P=P)
    closed = sum(census[k] for k in ("030T", "030C", "120D", "120U",
                                     "120C", "210", "300", "201"))
    open_ = sum(census[k] for k in ("021D", "021U", "021C", "111D",
                                    "111U"))
    return {"path": open_, "triangle": closed}
