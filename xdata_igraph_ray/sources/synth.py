"""Deterministic synthetic inputs (FIXTURES.md).

Everything derives from one integer seed via
``numpy.random.Generator(PCG64(seed))`` — no external data.  Two
generators:

* :func:`generate_pages` — the Common-Crawl-shaped ``pages`` table
  (url, warc_ts, html, text, lang) with a power-law link graph embedded
  in the html.  ``text`` is produced by running the frozen extractor on
  the generated html, so generator and extractor are
  inverse-consistent by construction, and the embedded edge list is
  written alongside as the golden edge table.
* :func:`generate_edges` — a bare power-law edge table for large
  benchmark graphs (skips html synthesis).

The link model mirrors the reference's generator roles
(Barabási/zipf hub skew, reference src/games.c:473): out-degree is
zipf-ish capped, targets are drawn zipf-over-rank through a seeded
permutation, yielding power-law in-degree (hub pages) — the skew
stressor the north rule calls out.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_text

_WORDS = np.array(
    "the of and to in page link data graph web crawl rank node edge "
    "site index text anchor corpus stream batch shard block arrow ray "
    "vector column table query engine".split()
)


def _urls_for(n_pages: int, seed: int) -> np.ndarray:
    """Unique page urls with zipf-skewed site sizes."""
    rng = np.random.default_rng(np.random.PCG64(seed + 1))
    sites = np.minimum(rng.zipf(1.5, n_pages), 99_999) - 1
    order = np.argsort(sites, kind="stable")
    within = np.arange(n_pages) - np.concatenate(
        ([0], np.cumsum(np.bincount(sites[order])))
    )[sites[order]]
    page_no = np.empty(n_pages, dtype=np.int64)
    page_no[order] = within
    return np.array(
        [
            f"https://site{s:05d}.example/page{p:06d}"
            for s, p in zip(sites, page_no)
        ],
        dtype=object,
    )


GEN_VERSION = 2


def _edge_arrays(
    n_pages: int, seed: int, mean_out: float = 12.0, dangling_frac: float = 0.05
) -> tuple[np.ndarray, np.ndarray]:
    """(src_idx, out_counts): concatenated target indices per page.

    Power-law out-degree (capped zipf scaled so the empirical mean is
    ~mean_out), zipf-over-rank targets through a seeded permutation
    (power-law in-degree), ~5% dangling pages.
    """
    rng = np.random.default_rng(np.random.PCG64(seed + 2))
    k = np.minimum(rng.zipf(1.7, n_pages), 4 * int(mean_out) + 8)
    # scale the capped-zipf draw (empirical mean ~5.7) to mean_out
    k = np.maximum(1, np.round(k * (mean_out / 5.7))).astype(np.int64)
    k[rng.random(n_pages) < dangling_frac] = 0
    total = int(k.sum())
    perm = rng.permutation(n_pages)
    ranks = rng.zipf(1.3, total)
    targets = perm[(ranks - 1) % n_pages]
    return targets, k


def generate_edges(
    n_vertices: int, seed: int = 42, mean_out: float = 12.0
) -> pa.Table:
    """Bare (src, dst) power-law edge table for benchmarks."""
    targets, k = _edge_arrays(n_vertices, seed, mean_out)
    src = np.repeat(np.arange(n_vertices, dtype=np.int64), k)
    return pa.table(
        {"src": src, "dst": targets.astype(np.int64)}
    )


def _page_batch_tables(urls, targets, offsets, word_ids, w_off, langs,
                       lo: int, hi: int):
    """Deterministic (pages_table, edges_table) for rows [lo, hi)."""
    from .. import schemas

    htmls, texts, esrc, edst = [], [], [], []
    for i in range(lo, hi):
        words = _WORDS[word_ids[w_off[i]:w_off[i + 1]]]
        outs = urls[targets[offsets[i]:offsets[i + 1]]]
        parts = [
            f"<html><head><title>T{i}</title>"
            f"<script>var x={i};</script></head><body><p>"
        ]
        step = max(1, len(words) // (len(outs) + 1))
        pos = 0
        for j, t in enumerate(outs):
            parts.append(" ".join(words[pos:pos + step]))
            parts.append(f' <a href="{t}">anchor{j}</a> ')
            pos += step
        parts.append(" ".join(words[pos:]))
        parts.append("</p></body></html>")
        html = "".join(parts).encode()
        htmls.append(html)
        texts.append(extract_text(html))
        esrc.extend([urls[i]] * len(outs))
        edst.extend(outs)
    base_ts = np.datetime64("2025-01-01T00:00:00", "ms")
    ts = base_ts + np.arange(lo, hi) * np.timedelta64(1000, "ms")
    pages = pa.table(
        {
            "url": urls[lo:hi],
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs[lo:hi],
        },
        schema=schemas.PAGES,
    )
    edges = pa.table(
        {"src_url": esrc, "dst_url": edst}, schema=schemas.EDGES_URL
    )
    return pages, edges


def generate_pages(
    out_dir: str,
    n_pages: int,
    seed: int = 42,
    rows_per_batch: int = 20_000,
) -> dict[str, str]:
    """Write a ``pages`` parquet dir + golden ``edges`` parquet dir
    under out_dir.  Idempotent (pure function of (n_pages, seed));
    batches generate in parallel Ray tasks when a session is up."""
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "pages")
    edges_path = os.path.join(out_dir, "edges")
    done = os.path.join(out_dir, f"_DONE_v{GEN_VERSION}_{n_pages}_{seed}")
    if os.path.exists(done):
        return {"pages": pages_path, "edges": edges_path}
    os.makedirs(pages_path, exist_ok=True)
    os.makedirs(edges_path, exist_ok=True)

    urls = _urls_for(n_pages, seed)
    targets, k = _edge_arrays(n_pages, seed)
    offsets = np.concatenate(([0], np.cumsum(k)))
    rng = np.random.default_rng(np.random.PCG64(seed + 3))
    langs = rng.choice(
        np.array(["en", "de", "fr"]), n_pages, p=[0.9, 0.05, 0.05]
    )
    n_words = rng.integers(20, 80, n_pages)
    word_ids = rng.integers(0, len(_WORDS), int(n_words.sum()))
    w_off = np.concatenate(([0], np.cumsum(n_words)))

    bounds = [
        (lo, min(lo + rows_per_batch, n_pages), i)
        for i, lo in enumerate(range(0, n_pages, rows_per_batch))
    ]

    def write_one(lo, hi, i):
        pt, et = _page_batch_tables(
            urls, targets, offsets, word_ids, w_off, langs, lo, hi
        )
        pq.write_table(pt, os.path.join(pages_path, f"part-{i:05d}.parquet"))
        pq.write_table(et, os.path.join(edges_path, f"part-{i:05d}.parquet"))
        return i

    use_ray = False
    if len(bounds) > 2:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass
    if use_ray:
        import ray

        @ray.remote
        def _task(u, t, o, wi, wo, la, lo, hi, i):
            pt, et = _page_batch_tables(u, t, o, wi, wo, la, lo, hi)
            pq.write_table(
                pt, os.path.join(pages_path, f"part-{i:05d}.parquet")
            )
            pq.write_table(
                et, os.path.join(edges_path, f"part-{i:05d}.parquet")
            )
            return i

        refs = [
            ray.put(urls), ray.put(targets), ray.put(offsets),
            ray.put(word_ids), ray.put(w_off), ray.put(langs),
        ]
        ray.get([_task.remote(*refs, lo, hi, i) for lo, hi, i in bounds])
    else:
        for lo, hi, i in bounds:
            write_one(lo, hi, i)
    with open(done, "w") as f:
        f.write("ok")
    return {"pages": pages_path, "edges": edges_path}


def generate_embeddings(
    out_dir: str,
    n_base: int = 2000,
    dim: int = 32,
    n_dups: int = 150,
    seed: int = 42,
) -> str:
    """Write an ``embeddings.parquet`` with planted near-duplicates:
    n_base unit vectors plus n_dups perturbed copies at cosine
    ~[0.96, 0.999] — the dedup-recall fixture (pure function of args,
    idempotent).  Returns the parquet path."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    done = os.path.join(
        out_dir, f"_DONE_v{GEN_VERSION}_{n_base}_{dim}_{n_dups}_{seed}"
    )
    if os.path.exists(done):
        return path
    rng = np.random.default_rng(np.random.PCG64(seed))
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    src = rng.choice(n_base, n_dups, replace=False)
    scale = rng.uniform(0.01, 0.05, (n_dups, 1))
    dups = base[src] + rng.standard_normal((n_dups, dim)) * scale
    dups /= np.linalg.norm(dups, axis=1, keepdims=True)
    vecs = np.vstack([base, dups])
    tbl = pa.table(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
        }
    )
    pq.write_table(tbl, path + ".tmp")
    os.replace(path + ".tmp", path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def generate_documents(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    rows_per_batch: int = 20_000,
) -> str:
    """Synthetic ``documents``-shaped table (doc_id, text) for
    dedup-stage benchmarks past the sf fixtures' 5k-doc overhead
    floor.  Deterministic per (n_docs, seed); ~8% of docs are planted
    near-duplicates of an earlier doc (a few token substitutions), so
    MinHash/SimHash stages have real work.  Chunk-parallel when a Ray
    session is up; idempotent via a done marker."""
    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, f"_DONE_v{GEN_VERSION}_{n_docs}_{seed}")
    if os.path.exists(done):
        return out_dir

    def batch_table(lo: int, hi: int) -> pa.Table:
        rng = np.random.default_rng(np.random.PCG64(seed * 7919 + lo))
        size = hi - lo
        n_tok = rng.integers(40, 400, size)
        ids = rng.zipf(1.3, int(n_tok.sum())) % len(_WORDS)
        off = np.concatenate(([0], np.cumsum(n_tok)))
        texts = [
            " ".join(_WORDS[ids[off[i]:off[i + 1]]])
            for i in range(size)
        ]
        # plant near-dups within the batch: ~8% of docs copy an
        # earlier doc with a few token substitutions
        dup = np.flatnonzero(rng.random(size) < 0.08)
        for d in dup:
            if d == 0:
                continue
            src = int(rng.integers(0, d))
            toks = texts[src].split(" ")
            for _ in range(max(1, len(toks) // 50)):
                toks[int(rng.integers(0, len(toks)))] = str(
                    _WORDS[int(rng.integers(0, len(_WORDS)))]
                )
            texts[d] = " ".join(toks)
        return pa.table({
            "doc_id": np.arange(lo, hi, dtype=np.int64),
            "text": pa.array(texts, pa.string()),
        })

    bounds = [
        (lo, min(lo + rows_per_batch, n_docs), i)
        for i, lo in enumerate(range(0, n_docs, rows_per_batch))
    ]
    use_ray = False
    if len(bounds) > 2:
        try:
            import ray

            use_ray = ray.is_initialized()
        except ImportError:
            pass
    if use_ray:
        import ray

        @ray.remote
        def _task(lo, hi, i):
            pq.write_table(
                batch_table(lo, hi),
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
            )
            return i

        ray.get([_task.remote(lo, hi, i) for lo, hi, i in bounds])
    else:
        for lo, hi, i in bounds:
            pq.write_table(
                batch_table(lo, hi),
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
            )
    with open(done, "w") as f:
        f.write("ok")
    return out_dir
