"""Graph file-format readers / writers (reference src/foreign.c).

Formats kept from the reference's row-oriented text family; everything
is Dataset-native (``read_text`` -> vectorized parse batches; writers
are ``map_batches`` to text + single-file or partitioned sinks):

* edge list — whitespace-separated integer pairs
  (igraph_read_graph_edgelist, src/foreign.c:78-121 / writer :1443)
* NCOL — symbolic names + optional weight
  (igraph_read_graph_ncol, src/foreign.c:193-360 / writer :1501);
  name -> dense id via the distributed sorted dictionary (the trie
  replacement, SURVEY.md §1.2)
* LGL — ``# source`` header lines then neighbors
  (igraph_read_graph_lgl, src/foreign.c:364-540 / writer :1682)

The canonical interchange format of this engine is Parquet
(read_edges_parquet / write_edges_parquet).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_edgelist(path: str) -> Dataset:
    """Whitespace int-pair lines -> (src, dst)."""

    def parse(batch: pa.Table) -> pa.Table:
        src, dst = [], []
        for line in batch["text"].to_pylist():
            parts = line.split()
            if len(parts) >= 2 and not line.lstrip().startswith("#"):
                try:
                    a, b = int(parts[0]), int(parts[1])
                except ValueError:
                    continue  # headers / comments
                src.append(a)
                dst.append(b)
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_ncol(path: str, weights: bool = True) -> Dataset:
    """NCOL lines ``name name [weight]`` -> (src_url, dst_url[, weight]).
    Use graph.build.vertex_dict/encode_edges for dense ids."""

    def parse(batch: pa.Table) -> pa.Table:
        a, b, w = [], [], []
        for line in batch["text"].to_pylist():
            parts = line.split()
            if len(parts) >= 2:
                a.append(parts[0])
                b.append(parts[1])
                w.append(float(parts[2]) if len(parts) > 2 else 1.0)
        cols = {
            "src_url": pa.array(a, pa.string()),
            "dst_url": pa.array(b, pa.string()),
        }
        if weights:
            cols["weight"] = pa.array(w, pa.float64())
        return pa.table(cols)

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_lgl(path: str, weights: bool = True) -> Dataset:
    """LGL: ``# src`` header then one neighbor (+weight) per line.
    Stateful across lines within a file, so the parse is per-file
    (read_binary_files), still parallel across files."""

    def parse(batch: dict) -> pa.Table:
        a, b, w = [], [], []
        for data in batch["bytes"]:
            cur = None
            for line in bytes(data).decode().splitlines():
                line = line.strip()
                if not line:
                    continue
                if line.startswith("#"):
                    cur = line[1:].strip()
                elif cur is not None:
                    parts = line.split()
                    a.append(cur)
                    b.append(parts[0])
                    w.append(float(parts[1]) if len(parts) > 1 else 1.0)
        cols = {
            "src_url": pa.array(a, pa.string()),
            "dst_url": pa.array(b, pa.string()),
        }
        if weights:
            cols["weight"] = pa.array(w, pa.float64())
        return pa.table(cols)

    return rd.read_binary_files(path).map_batches(parse, batch_format="numpy")


def write_edgelist(edges: Dataset, path: str) -> None:
    """Partitioned text sink (one file per block, resumable layout)."""

    def fmt(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        lines = np.char.add(
            np.char.add(s.astype(str), " "), d.astype(str)
        )
        return pa.table({"text": lines})

    from pyarrow import csv as pacsv

    edges.map_batches(fmt, batch_format="pyarrow").write_csv(
        path,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(
                include_header=False, quoting_style="none"
            )
        },
    )


def write_ncol(edges_url: Dataset, path: str, weights: bool = False) -> None:
    def fmt(t: pa.Table) -> pa.Table:
        a = np.asarray(t["src_url"].to_pylist(), dtype=object)
        b = np.asarray(t["dst_url"].to_pylist(), dtype=object)
        lines = [f"{x} {y}" for x, y in zip(a, b)]
        if weights and "weight" in t.column_names:
            ws = t["weight"].to_pylist()
            lines = [f"{l} {w:g}" for l, w in zip(lines, ws)]
        return pa.table({"text": pa.array(lines, pa.string())})

    from pyarrow import csv as pacsv

    edges_url.map_batches(fmt, batch_format="pyarrow").write_csv(
        path,
        arrow_csv_args_fn=lambda: {
            "write_options": pacsv.WriteOptions(
                include_header=False, quoting_style="none"
            )
        },
    )


def read_parquet_clean(path, columns=None, **kw) -> Dataset:
    """``read_parquet`` with the source's schema-level metadata
    stripped.  pandas-written parquet carries a ``b'pandas'`` metadata
    blob whose parsed dict makes ``pa.Schema`` unhashable on pyarrow
    16, so Ray Data's schema-dedup hash (``set(schemas)`` in
    transform_pyarrow.unify_schemas) warns on EVERY read and forfeits
    its early exit.  Feeding the metadata-free schema restores both."""
    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(path).schema.remove_metadata()
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
    except Exception:
        schema = None
    return rd.read_parquet(path, columns=columns, schema=schema, **kw)


def read_edges_parquet(path: str, columns=None) -> Dataset:
    return read_parquet_clean(path, columns=columns)


def write_edges_parquet(edges: Dataset, path: str, **kw) -> None:
    edges.write_parquet(path, **kw)
