"""Extraction invariants (FIXTURES.md §5): byte-identical text per url,
and exact recovery of the embedded edge list — single-process oracle vs
the Ray pipeline."""

from __future__ import annotations

import pyarrow.parquet as pq
import ray.data as rd

from xdata_igraph_ray.functions.extract import (
    extract_outlinks,
    extract_text,
    normalize_url,
)
from xdata_igraph_ray.stages.extract import extracted_edges, extracted_text


def test_extract_text_basic():
    html = (
        b"<html><head><title>X</title><script>var a=1;</script></head>"
        b"<body><p>hello   world <a href='http://a.example/'>link</a> end"
        b"</p><!-- c --></body></html>"
    )
    assert extract_text(html) == "hello world link end"


def test_extract_entities_and_quotes():
    html = b'<body>a &amp; b &lt;c&gt;<a href="http://E.example:80/p?q=1#f">x</a></body>'
    assert extract_text(html) == "a & b <c> x"
    assert extract_outlinks(html) == ["http://e.example/p?q=1"]


def test_normalize_url():
    assert normalize_url("HTTP://Foo.Example:80/a#frag") == "http://foo.example/a"
    assert normalize_url("https://foo.example:443") == "https://foo.example/"
    assert normalize_url("b.html", base="http://x.example/dir/a.html") == (
        "http://x.example/dir/b.html"
    )
    assert normalize_url("https://x.example:8443/a") == "https://x.example:8443/a"


def test_outlinks_keep_duplicates_in_order():
    html = (
        b'<body><a href="http://a.example/">1</a>'
        b'<a href="http://b.example/">2</a>'
        b'<a href="http://a.example/">3</a>'
        b'<a href="mailto:x@y">no</a></body>'
    )
    assert extract_outlinks(html) == [
        "http://a.example/",
        "http://b.example/",
        "http://a.example/",
    ]


def test_pipeline_text_byte_identical(tiny_pages):
    pages = pq.read_table(tiny_pages["pages"])
    got = (
        extracted_text(rd.read_parquet(tiny_pages["pages"]))
        .to_pandas()
        .set_index("url")["text"]
    )
    want = pages.to_pandas().set_index("url")["text"]
    assert len(got) == len(want) == 1000
    assert got.sort_index().equals(want.sort_index())
    # oracle: re-extract single-process, byte compare
    for u, h, t in zip(
        pages["url"].to_pylist()[:50],
        pages["html"].to_pylist()[:50],
        pages["text"].to_pylist()[:50],
    ):
        assert extract_text(h) == t == got[u]


def test_pipeline_edges_exact(tiny_pages):
    golden = (
        pq.read_table(tiny_pages["edges"])
        .to_pandas()
        .sort_values(["src_url", "dst_url"])
        .reset_index(drop=True)
    )
    got = (
        extracted_edges(rd.read_parquet(tiny_pages["pages"]))
        .to_pandas()
        .sort_values(["src_url", "dst_url"])
        .reset_index(drop=True)
    )
    assert len(golden) > 1000
    assert got.equals(golden)
