"""Extraction stages: pages Dataset -> text / outlink-edge Datasets.

Stateless ``map_batches`` over Arrow batches (zero shuffle).  The html
column can be MBs per row, so callers should keep ``batch_size`` small
and this stage drops ``html`` immediately — downstream supersteps only
ever touch narrow columns (SURVEY.md §7.4).

Reference analog: the NCOL ingest path (src/foreign.c:193-360) — raw
records to an edge stream; html parsing itself is defined by the frozen
functions in :mod:`..functions.extract`.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ..functions.extract import extract_outlinks, extract_text

# Rows per extraction batch: html rows are wide (KB-MB); keep batches
# small enough that batch x concurrency fits worker heaps.
EXTRACT_BATCH_SIZE = 1024


def _extract_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = [extract_text(h) for h in htmls]
    links = [extract_outlinks(h, base_url=u) for u, h in zip(urls, htmls)]
    counts = [len(l) for l in links]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "outlinks": pa.array(links, pa.list_(pa.string())),
            "n_outlinks": pa.array(counts, pa.int64()),
        }
    )


def extract(pages: Dataset) -> Dataset:
    """pages -> (url, text, outlinks, n_outlinks)."""
    return pages.map_batches(
        _extract_batch,
        batch_format="pyarrow",
        batch_size=EXTRACT_BATCH_SIZE,
        zero_copy_batch=True,
    )


def _edges_batch(batch: pa.Table) -> pa.Table:
    flat = pa.compute.list_flatten(batch["outlinks"])
    src = pa.compute.list_parent_indices(batch["outlinks"])
    return pa.table(
        {
            "src_url": batch["url"].take(src),
            "dst_url": flat,
        }
    )


def extracted_edges(pages: Dataset) -> Dataset:
    """pages -> (src_url, dst_url) multi-edge table, document order."""
    return extract(pages).map_batches(
        _edges_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def extracted_text(pages: Dataset) -> Dataset:
    """pages -> (url, text): the byte-identical-extraction surface."""
    return extract(pages).select_columns(["url", "text"])
