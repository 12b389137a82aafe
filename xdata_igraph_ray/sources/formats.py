"""Interchange graph formats (reference src/foreign.c,
src/foreign-graphml.c).

These are small-graph interchange formats (the reference CLI's
GraphML canonical interchange, interfaces/shell/interface.c.in:80-86);
Parquet is this engine's scale-path format (readers.py).  Readers
parse per FILE (parallel across files via read_binary_files); writers
assemble one file driver-side from bounded inputs — by design: none of
these text formats shard, and a 100 TB graph never travels as GraphML.

Format references:
* GraphML  — src/foreign-graphml.c:1163 (read), :1243 (write)
* Pajek    — src/foreign.c:545 (read), :2033 (write); 1-based ids
* GML      — src/foreign.c:1090 (read), :2532 (write)
* DL       — src/foreign.c:3001 (read; edgelist form)
* DIMACS   — src/foreign.c:701 (read), :2405 (write); max-flow "p max"
* DOT      — src/foreign.c:2789 (write only)
* LEDA     — src/foreign.c:3141 (write only)
* LGL      — src/foreign.c:1682 (writer; reader lives in readers.py)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd
import pyarrow as pa

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"

_ATTR_TYPES = {
    "string": str,
    "double": float,
    "float": float,
    "long": int,
    "int": int,
    "boolean": lambda v: v in ("true", "1", "True"),
}
_PY_TO_GRAPHML = {
    "int64": "long", "int32": "long", "float64": "double",
    "float32": "double", "bool": "boolean", "object": "string",
}


def read_graphml(path: str):
    """-> (vertices: pa.Table(vid, name, *attrs),
          edges: pa.Table(src, dst, *attrs), directed: bool).
    Node xml-ids map to dense vids in document order (the reference
    also assigns ids by first appearance,
    src/foreign-graphml.c:586-607)."""
    tree = ET.parse(path)
    root = tree.getroot()

    def tag(name):
        return f"{{{_GRAPHML_NS}}}{name}"

    keys = {}
    for k in root.iter(tag("key")):
        keys[k.get("id")] = (
            k.get("for"), k.get("attr.name"),
            _ATTR_TYPES.get(k.get("attr.type", "string"), str),
            k.get("attr.type", "string"),
        )
    g = root.find(tag("graph"))
    directed = g.get("edgedefault", "undirected") == "directed"
    vids: dict[str, int] = {}
    vattrs: dict[str, list] = {}
    names = []
    for node in g.iter(tag("node")):
        xid = node.get("id")
        vids[xid] = len(vids)
        names.append(xid)
        row = {}
        for d in node.iter(tag("data")):
            spec = keys.get(d.get("key"))
            if spec and spec[0] in ("node", "all"):
                row[spec[1]] = spec[2](d.text or "")
        for a in set(vattrs) | set(row):
            vattrs.setdefault(a, [None] * (len(vids) - 1)).append(
                row.get(a)
            )
    src, dst = [], []
    eattrs: dict[str, list] = {}
    for i, edge in enumerate(g.iter(tag("edge"))):
        src.append(vids[edge.get("source")])
        dst.append(vids[edge.get("target")])
        row = {}
        for d in edge.iter(tag("data")):
            spec = keys.get(d.get("key"))
            if spec and spec[0] in ("edge", "all"):
                row[spec[1]] = spec[2](d.text or "")
        for a in set(eattrs) | set(row):
            eattrs.setdefault(a, [None] * i).append(row.get(a))
    verts = pa.table(
        {
            "vid": np.arange(len(vids), dtype=np.int64),
            "name": pa.array(names, pa.string()),
            **{a: pa.array(v) for a, v in vattrs.items()},
        }
    )
    edges = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            **{a: pa.array(v) for a, v in eattrs.items()},
        }
    )
    return verts, edges, directed


def write_graphml(
    path: str,
    edges: pa.Table,
    vertices: pa.Table | None = None,
    directed: bool = True,
) -> None:
    """Typed attribute columns become <key> declarations (the
    reference writes the same layout, src/foreign-graphml.c:1243)."""
    if vertices is None:
        n = (
            max(
                int(pa.compute.max(edges["src"]).as_py() or -1),
                int(pa.compute.max(edges["dst"]).as_py() or -1),
            ) + 1 if len(edges) else 0
        )
        vertices = pa.table({"vid": np.arange(n, dtype=np.int64)})
    vdf = vertices.to_pandas()
    edf = edges.to_pandas()
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<graphml xmlns="{_GRAPHML_NS}">',
    ]
    key_ids = {}
    for scope, df, skip in (("node", vdf, {"vid", "name"}),
                            ("edge", edf, {"src", "dst"})):
        for col in df.columns:
            if col in skip:
                continue
            kid = f"k{len(key_ids)}"
            key_ids[(scope, col)] = kid
            gtype = _PY_TO_GRAPHML.get(str(df[col].dtype), "string")
            lines.append(
                f'  <key id="{kid}" for="{scope}" attr.name={quoteattr(col)}'
                f' attr.type="{gtype}"/>'
            )
    kind = "directed" if directed else "undirected"
    lines.append(f'  <graph id="G" edgedefault="{kind}">')
    name_col = vdf["name"] if "name" in vdf.columns else vdf["vid"].astype(str)
    for i, row in vdf.iterrows():
        attrs = [
            f'      <data key="{key_ids[("node", c)]}">'
            f"{escape(_fmt(row[c]))}</data>"
            for c in vdf.columns if ("node", c) in key_ids
            and not pd.isna(row[c])
        ]
        nid = escape(str(name_col.iloc[i]))
        if attrs:
            lines.append(f'    <node id="{nid}">')
            lines.extend(attrs)
            lines.append("    </node>")
        else:
            lines.append(f'    <node id="{nid}"/>')
    by_vid = dict(zip(vdf["vid"], name_col))
    for _, row in edf.iterrows():
        s, d = escape(str(by_vid[row["src"]])), escape(str(by_vid[row["dst"]]))
        attrs = [
            f'      <data key="{key_ids[("edge", c)]}">'
            f"{escape(_fmt(row[c]))}</data>"
            for c in edf.columns if ("edge", c) in key_ids
            and not pd.isna(row[c])
        ]
        if attrs:
            lines.append(f'    <edge source="{s}" target="{d}">')
            lines.extend(attrs)
            lines.append("    </edge>")
        else:
            lines.append(f'    <edge source="{s}" target="{d}"/>')
    lines += ["  </graph>", "</graphml>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def _fmt(v) -> str:
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return "true" if v else "false"
    if isinstance(v, float) and float(v).is_integer():
        return repr(float(v))
    return str(v)


# ---------------------------------------------------------------------------
# Pajek


def read_pajek(path: str):
    """-> (vertices(vid, name), edges(src, dst, weight), directed).
    Pajek ids are 1-based (reference src/foreign.c:545)."""
    names = {}
    src, dst, w = [], [], []
    mode = None
    directed = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            low = line.lower()
            if low.startswith("*vertices"):
                mode = "v"
                continue
            if low.startswith("*arcs"):
                mode, directed = "e", True
                continue
            if low.startswith("*edges"):
                mode = "e"
                continue
            if mode == "v":
                parts = line.split(None, 1)
                vid = int(parts[0]) - 1
                nm = parts[1].strip().strip('"') if len(parts) > 1 else str(vid)
                names[vid] = nm
            elif mode == "e":
                parts = line.split()
                src.append(int(parts[0]) - 1)
                dst.append(int(parts[1]) - 1)
                w.append(float(parts[2]) if len(parts) > 2 else 1.0)
    n = max(names) + 1 if names else (
        max(src + dst) + 1 if src else 0
    )
    verts = pa.table(
        {
            "vid": np.arange(n, dtype=np.int64),
            "name": pa.array(
                [names.get(i, str(i)) for i in range(n)], pa.string()
            ),
        }
    )
    edges = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        }
    )
    return verts, edges, directed


def write_pajek(
    path: str,
    edges: pa.Table,
    vertices: pa.Table | None = None,
    directed: bool = True,
) -> None:
    if vertices is None:
        n = (
            max(
                int(pa.compute.max(edges["src"]).as_py() or -1),
                int(pa.compute.max(edges["dst"]).as_py() or -1),
            ) + 1 if len(edges) else 0
        )
        vertices = pa.table({"vid": np.arange(n, dtype=np.int64)})
    vdf = vertices.to_pandas()
    lines = [f"*Vertices {len(vdf)}"]
    names = vdf["name"] if "name" in vdf else vdf["vid"].astype(str)
    for vid, nm in zip(vdf["vid"], names):
        lines.append(f'{int(vid) + 1} "{nm}"')
    lines.append("*Arcs" if directed else "*Edges")
    has_w = "weight" in edges.column_names
    for i in range(len(edges)):
        s = int(edges["src"][i].as_py()) + 1
        d = int(edges["dst"][i].as_py()) + 1
        if has_w:
            lines.append(f"{s} {d} {edges['weight'][i].as_py():g}")
        else:
            lines.append(f"{s} {d}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# GML


def read_gml(path: str):
    """Minimal GML: node [ id N label "..." ] / edge [ source target
    value ] blocks (reference src/foreign.c:1090)."""
    import re

    text = open(path).read()
    directed = bool(re.search(r"\bdirected\s+1\b", text))
    ids, names = [], []
    for m in re.finditer(r"node\s*\[(.*?)\]", text, re.S):
        body = m.group(1)
        mid = re.search(r"\bid\s+(-?\d+)", body)
        mlab = re.search(r'label\s+"([^"]*)"', body)
        ids.append(int(mid.group(1)))
        names.append(mlab.group(1) if mlab else mid.group(1))
    remap = {gml_id: i for i, gml_id in enumerate(ids)}
    src, dst, w = [], [], []
    for m in re.finditer(r"edge\s*\[(.*?)\]", text, re.S):
        body = m.group(1)
        s = int(re.search(r"\bsource\s+(-?\d+)", body).group(1))
        t = int(re.search(r"\btarget\s+(-?\d+)", body).group(1))
        mv = re.search(r"\bvalue\s+([-0-9.eE]+)", body)
        src.append(remap[s])
        dst.append(remap[t])
        w.append(float(mv.group(1)) if mv else 1.0)
    verts = pa.table(
        {
            "vid": np.arange(len(ids), dtype=np.int64),
            "name": pa.array([str(x) for x in names], pa.string()),
        }
    )
    edges = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        }
    )
    return verts, edges, directed


def write_gml(
    path: str,
    edges: pa.Table,
    vertices: pa.Table | None = None,
    directed: bool = True,
) -> None:
    if vertices is None:
        n = (
            max(
                int(pa.compute.max(edges["src"]).as_py() or -1),
                int(pa.compute.max(edges["dst"]).as_py() or -1),
            ) + 1 if len(edges) else 0
        )
        vertices = pa.table({"vid": np.arange(n, dtype=np.int64)})
    lines = ["graph", "[", f"  directed {1 if directed else 0}"]
    vdf = vertices.to_pandas()
    names = vdf["name"] if "name" in vdf else None
    for i, vid in enumerate(vdf["vid"]):
        lines += ["  node", "  [", f"    id {int(vid)}"]
        if names is not None:
            lines.append(f'    label "{names.iloc[i]}"')
        lines.append("  ]")
    has_w = "weight" in edges.column_names
    for i in range(len(edges)):
        lines += [
            "  edge", "  [",
            f"    source {int(edges['src'][i].as_py())}",
            f"    target {int(edges['dst'][i].as_py())}",
        ]
        if has_w:
            lines.append(f"    value {edges['weight'][i].as_py():g}")
        lines.append("  ]")
    lines.append("]")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# DL (UCINET edgelist form), DIMACS max-flow, DOT / LEDA writers


def read_dl(path: str):
    """DL edgelist1 form: ``dl n=N`` header, ``data:`` then 1-based
    pairs (reference src/foreign.c:3001)."""
    n = 0
    src, dst, w = [], [], []
    in_data = False
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        low = line.lower()
        if low.startswith("dl"):
            import re

            m = re.search(r"n\s*=\s*(\d+)", low)
            n = int(m.group(1)) if m else 0
        elif low.startswith("data"):
            in_data = True
        elif low.startswith(("format", "labels")):
            continue
        elif in_data:
            parts = line.split()
            src.append(int(parts[0]) - 1)
            dst.append(int(parts[1]) - 1)
            w.append(float(parts[2]) if len(parts) > 2 else 1.0)
    edges = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array(w, pa.float64()),
        }
    )
    return n or (max(src + dst) + 1 if src else 0), edges


def write_dl(path: str, n: int, edges: pa.Table,
             weights: bool = False) -> None:
    """DL edgelist1 writer (round-trip partner of :func:`read_dl`;
    reference writes DL via the shell interface only — symmetry added
    here so every readable format is writable)."""
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    w = (edges["weight"].to_numpy() if weights
         and "weight" in edges.column_names else None)
    with open(path, "w") as f:
        f.write(f"dl n={n}\nformat = edgelist1\ndata:\n")
        for i in range(len(src)):
            if w is not None:
                f.write(f"{src[i] + 1} {dst[i] + 1} {_fmt(float(w[i]))}\n")
            else:
                f.write(f"{src[i] + 1} {dst[i] + 1}\n")


def read_dimacs(path: str):
    """DIMACS max-flow: ``p max n m`` / ``n id s|t`` / ``a u v cap``
    (1-based; reference src/foreign.c:701).
    -> (n, source, target, edges(src, dst, capacity))."""
    n = source = target = None
    src, dst, cap = [], [], []
    for line in open(path):
        parts = line.split()
        if not parts or parts[0] == "c":
            continue
        if parts[0] == "p":
            n = int(parts[2])
        elif parts[0] == "n":
            if parts[2] == "s":
                source = int(parts[1]) - 1
            else:
                target = int(parts[1]) - 1
        elif parts[0] == "a":
            src.append(int(parts[1]) - 1)
            dst.append(int(parts[2]) - 1)
            cap.append(float(parts[3]))
    edges = pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "capacity": pa.array(cap, pa.float64()),
        }
    )
    return n, source, target, edges


def write_dimacs(
    path: str, edges: pa.Table, n: int, source: int, target: int
) -> None:
    cap = (
        edges["capacity"] if "capacity" in edges.column_names
        else pa.array(np.ones(len(edges)))
    )
    with open(path, "w") as f:
        f.write(f"p max {n} {len(edges)}\n")
        f.write(f"n {source + 1} s\n")
        f.write(f"n {target + 1} t\n")
        for i in range(len(edges)):
            f.write(
                f"a {int(edges['src'][i].as_py()) + 1} "
                f"{int(edges['dst'][i].as_py()) + 1} "
                f"{cap[i].as_py():g}\n"
            )


def write_dot(
    path: str, edges: pa.Table, directed: bool = True
) -> None:
    """Graphviz DOT (write-only in the reference too,
    src/foreign.c:2789)."""
    kind, arrow = ("digraph", "->") if directed else ("graph", "--")
    with open(path, "w") as f:
        f.write(f"{kind} G {{\n")
        for i in range(len(edges)):
            f.write(
                f"  {int(edges['src'][i].as_py())} {arrow} "
                f"{int(edges['dst'][i].as_py())};\n"
            )
        f.write("}\n")


def write_leda(
    path: str, edges: pa.Table, n: int | None = None,
    directed: bool = True,
) -> None:
    """LEDA.GRAPH (write-only in the reference, src/foreign.c:3141):
    header, node count + |V| node lines, edge count + edge lines
    ``src dst 0 |{}|`` with 1-based ids."""
    if n is None:
        n = (
            max(
                int(pa.compute.max(edges["src"]).as_py() or -1),
                int(pa.compute.max(edges["dst"]).as_py() or -1),
            ) + 1 if len(edges) else 0
        )
    with open(path, "w") as f:
        f.write("LEDA.GRAPH\nstring\nint\n")
        f.write(f"{-1 if directed else -2}\n")
        f.write(f"{n}\n")
        for i in range(n):
            f.write(f"|{{{i}}}|\n")
        f.write(f"{len(edges)}\n")
        for i in range(len(edges)):
            f.write(
                f"{int(edges['src'][i].as_py()) + 1} "
                f"{int(edges['dst'][i].as_py()) + 1} 0 |{{}}|\n"
            )


def write_lgl(path: str, edges_url: pa.Table, weights: bool = False) -> None:
    """LGL writer (the reader lives in readers.py; reference writer
    src/foreign.c:1682): ``# source`` header then neighbors, grouped
    by source in first-appearance order."""
    df = edges_url.to_pandas()
    has_w = weights and "weight" in df.columns
    with open(path, "w") as f:
        last = None
        for _, row in df.iterrows():
            if row["src_url"] != last:
                f.write(f"# {row['src_url']}\n")
                last = row["src_url"]
            if has_w:
                f.write(f"{row['dst_url']} {row['weight']:g}\n")
            else:
                f.write(f"{row['dst_url']}\n")


# ---------------------------------------------------------------------------
# GraphDB binary (graph-matching benchmark databases; reference
# igraph_read_graph_graphdb, src/foreign.c:921: little-endian 16-bit
# words — node count, then per node its out-edge count + targets)


def read_graphdb(path: str):
    data = np.fromfile(path, dtype="<u2").astype(np.int64)
    if len(data) == 0:
        return 0, pa.table({"src": pa.array([], pa.int64()),
                            "dst": pa.array([], pa.int64())})
    n = int(data[0])
    pos = 1
    src_l, dst_l = [], []
    for u in range(n):
        k = int(data[pos]); pos += 1
        if k:
            src_l.append(np.full(k, u, dtype=np.int64))
            dst_l.append(data[pos:pos + k])
            pos += k
    src = np.concatenate(src_l) if src_l else np.empty(0, np.int64)
    dst = np.concatenate(dst_l) if dst_l else np.empty(0, np.int64)
    return n, pa.table({"src": src, "dst": dst})


def write_graphdb(path: str, n: int, edges: pa.Table) -> None:
    if n >= 1 << 16:
        raise ValueError("graphdb: 16-bit format holds at most 65535 nodes")
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    words = [np.array([n], dtype=np.int64)]
    indptr = np.concatenate(([0], np.cumsum(counts)))
    for u in range(n):
        words.append(np.array([counts[u]], dtype=np.int64))
        words.append(dst[indptr[u]:indptr[u + 1]])
    np.concatenate(words).astype("<u2").tofile(path)
