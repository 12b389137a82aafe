"""Arrow schemas for every table the engine reads or writes.

The reference models a graph as two parallel integer edge columns plus
sorted index permutations (``include/igraph_datatype.h:78-88``) and a
pluggable table of named, typed attribute columns
(``include/igraph_attributes.h:111-120``).  Here both collapse into
plain Arrow tables: the edge list is a Dataset, attributes are just
columns.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json input_hint shape).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Dictionary-encoded vertex table (analog of the NCOL reader's trie of
# symbolic names, reference src/foreign.c:193-360).
VERTICES = pa.schema([("vid", pa.int64()), ("url", pa.string())])

EDGES = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
EDGES_W = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("weight", pa.float64())]
)
EDGES_URL = pa.schema([("src_url", pa.string()), ("dst_url", pa.string())])

DEGREES = pa.schema(
    [
        ("vid", pa.int64()),
        ("out_deg", pa.int64()),
        ("in_deg", pa.int64()),
        ("out_strength", pa.float64()),
    ]
)

PAGERANK = pa.schema([("vid", pa.int64()), ("score", pa.float64())])
COMPONENTS = pa.schema([("vid", pa.int64()), ("component", pa.int64())])
LABELS = pa.schema([("vid", pa.int64()), ("label", pa.int64())])
TRIANGLES = pa.schema([("vid", pa.int64()), ("count", pa.int64())])

# Per-iteration checkpoint state (FIXTURES.md §2): one parquet dir per
# iteration, one file per shard, plus lineage.json and metrics rows.
CKPT_METRICS = pa.schema(
    [
        ("part", pa.int32()),
        ("iter", pa.int64()),
        ("msgs", pa.int64()),
        ("bytes", pa.int64()),
        ("wall_s", pa.float64()),
        ("delta", pa.float64()),
    ]
)
