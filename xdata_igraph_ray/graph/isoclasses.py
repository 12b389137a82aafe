"""Isomorphism classes of 3- and 4-vertex graphs — reference
igraph_isoclass / igraph_isoclass_subgraph / igraph_isoclass_create
(src/topology.c:697,850,931) and igraph_graph_count semantics.

The reference stores precomputed lookup tables
(igraph_i_isoclass_3_idx / igraph_i_isoclass2_* / igraph_i_classedges_*,
src/topology.c:40-640).  We do NOT copy those tables; we regenerate
them at import time from the underlying rule, which is fully
determined by public information in the source:

- every ordered (directed) / unordered (undirected) vertex pair maps
  to one bit of an integer "code"; the bit order is the classedges
  list (src/topology.c:627-631), most-significant bit first:
  directed 3:   (1,2) (0,2) (2,1) (0,1) (2,0) (1,0)
  undirected 3: (1,2) (0,2) (0,1)
  directed 4:   (2,3) (1,3) (0,3) (3,2) (1,2) (0,2)
                (3,1) (2,1) (0,1) (3,0) (2,0) (1,0)
  undirected 4: (2,3) (1,3) (0,3) (1,2) (0,2) (0,1)
  (verified: the igraph_i_isoclass_3_idx entries {0,4,16,1,0,32,2,8,0}
  are exactly 2^bit for this order)
- class numbers are assigned in order of FIRST APPEARANCE while
  scanning codes 0,1,2,...: a code whose isomorphism orbit has not
  been seen opens the next class id.  This reproduces the documented
  anchors (class 0 = empty graph, last class = full graph) and the
  reference's own triad-census permutation (src/motifs.c:1042-1082
  maps motif bins [0,1,3,6,2,4,5,9,7,11,10,8,13,12,14,15] to the
  census order 003,012,102,021D,... — test_isoclasses pins this).

Class counts: directed 3 -> 16, undirected 3 -> 4, directed 4 -> 218,
undirected 4 -> 11, matching the reference's documentation
(src/topology.c:676-681).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import permutations

import numpy as np
import pyarrow as pa

from .generators import _table

_PAIRS = {
    (3, True): [(1, 2), (0, 2), (2, 1), (0, 1), (2, 0), (1, 0)],
    (3, False): [(1, 2), (0, 2), (0, 1)],
    (4, True): [(2, 3), (1, 3), (0, 3), (3, 2), (1, 2), (0, 2),
                (3, 1), (2, 1), (0, 1), (3, 0), (2, 0), (1, 0)],
    (4, False): [(2, 3), (1, 3), (0, 3), (1, 2), (0, 2), (0, 1)],
}


@lru_cache(maxsize=None)
def _tables(size: int, directed: bool):
    """(class_of_code, representative_code_of_class) regenerated from
    the first-appearance enumeration rule."""
    if size not in (3, 4):
        raise ValueError("only implemented for graphs with 3 or 4 vertices")
    pairs = _PAIRS[(size, directed)]
    L = len(pairs)
    # bit weight of pair (u,v): MSB-first over the pairs list
    weight = {}
    for i, (u, v) in enumerate(pairs):
        weight[(u, v)] = 1 << (L - 1 - i)
        if not directed:
            weight[(v, u)] = weight[(u, v)]
    perms = list(permutations(range(size)))
    # permutation action on codes, vectorized per permutation
    class_of = np.full(1 << L, -1, dtype=np.int64)
    reps: list[int] = []
    for code in range(1 << L):
        if class_of[code] >= 0:
            continue
        cls = len(reps)
        reps.append(code)
        # mark the whole orbit
        edges = [pairs[i] for i in range(L) if code & (1 << (L - 1 - i))]
        for p in perms:
            pc = 0
            for (u, v) in edges:
                pc |= weight[(p[u], p[v])]
            class_of[pc] = cls
    return class_of, np.asarray(reps, dtype=np.int64)


def graph_count(size: int, directed: bool = True) -> int:
    """Number of isomorphism classes of ``size``-vertex graphs."""
    return int(len(_tables(size, directed)[1]))


def _code_of(src, dst, size: int, directed: bool) -> int:
    pairs = _PAIRS[(size, directed)]
    L = len(pairs)
    weight = {}
    for i, (u, v) in enumerate(pairs):
        weight[(u, v)] = 1 << (L - 1 - i)
        if not directed:
            weight[(v, u)] = weight[(u, v)]
    code = 0
    for u, v in zip(src, dst):
        u, v = int(u), int(v)
        if u == v:
            continue  # loops ignored, like the reference's pair index
        code |= weight[(u, v)]
    return code


def isoclass(edges: pa.Table, n: int, directed: bool = True) -> int:
    """igraph_isoclass (src/topology.c:697): the isomorphism class of
    a 3- or 4-vertex graph; 0 = empty, last = complete."""
    class_of, _ = _tables(n, directed)
    code = _code_of(edges["src"].to_numpy(), edges["dst"].to_numpy(),
                    n, directed)
    return int(class_of[code])


def isoclass_subgraph(edges: pa.Table, n: int, vids,
                      directed: bool = True) -> int:
    """igraph_isoclass_subgraph (src/topology.c:850): class of the
    subgraph induced by 3 or 4 vertex ids, in the given vertex order
    (position in ``vids`` = role 0..k-1)."""
    vids = list(int(v) for v in vids)
    size = len(vids)
    pos = {v: i for i, v in enumerate(vids)}
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    keep = np.isin(src, vids) & np.isin(dst, vids)
    s = [pos[int(v)] for v in src[keep]]
    d = [pos[int(v)] for v in dst[keep]]
    class_of, _ = _tables(size, directed)
    return int(class_of[_code_of(s, d, size, directed)])


def isoclass_create(size: int, number: int,
                    directed: bool = True) -> pa.Table:
    """igraph_isoclass_create (src/topology.c:931): the canonical
    representative graph of an isomorphism class — the lowest-code
    member, decoded over the classedges bit order."""
    class_of, reps = _tables(size, directed)
    if not 0 <= number < len(reps):
        raise ValueError(
            f"class number must be in [0, {len(reps)}) for "
            f"size={size} directed={directed}")
    code = int(reps[number])
    pairs = _PAIRS[(size, directed)]
    L = len(pairs)
    src = [pairs[i][0] for i in range(L) if code & (1 << (L - 1 - i))]
    dst = [pairs[i][1] for i in range(L) if code & (1 << (L - 1 - i))]
    return _table(src, dst)


def isomorphic_34(e1: pa.Table, n1: int, e2: pa.Table, n2: int,
                  directed: bool = True) -> bool:
    """igraph_isomorphic_34 (src/topology.c:813): O(1) isomorphism
    decision for 3/4-vertex graphs via class comparison."""
    if n1 != n2:
        return False
    return isoclass(e1, n1, directed) == isoclass(e2, n2, directed)
