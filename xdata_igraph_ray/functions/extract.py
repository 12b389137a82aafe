"""Frozen page-extraction functions.

These are the engine's per-row invariants: the Ray pipeline and any
single-process oracle must produce byte-identical output for the same
``html`` (BASELINE.json input_hint).  They are deliberately pure
stdlib + ``re`` so they are trivially reproducible anywhere; do NOT
change their behavior without versioning (EXTRACTOR_VERSION below) —
tests pin bytes.

The reference analog of this stage is the symbolic-edge-list ingest
path (NCOL reader, reference src/foreign.c:193-360): raw records in,
``(name, name)`` edge stream out.  HTML handling itself has no
reference equivalent and is defined here, once.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

EXTRACTOR_VERSION = 1

# Strip non-content containers wholesale, then all remaining tags, then
# HTML comments; finally collapse all whitespace runs to single spaces.
_RE_DROP = re.compile(rb"(?is)<(script|style|head|noscript)\b[^>]*>.*?</\1\s*>")
_RE_COMMENT = re.compile(rb"(?s)<!--.*?-->")
_RE_TAG = re.compile(rb"(?s)<[^>]*>")
_RE_HREF = re.compile(
    rb"""(?is)<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))"""
)

_ENTITIES = {
    b"&amp;": b"&",
    b"&lt;": b"<",
    b"&gt;": b">",
    b"&quot;": b'"',
    b"&#39;": b"'",
    b"&nbsp;": b" ",
}
_RE_ENTITY = re.compile(b"|".join(re.escape(k) for k in _ENTITIES))


def extract_text(html: bytes) -> str:
    """html bytes -> visible text, whitespace-normalized. Frozen."""
    s = _RE_DROP.sub(b" ", html)
    s = _RE_COMMENT.sub(b" ", s)
    s = _RE_TAG.sub(b" ", s)
    s = _RE_ENTITY.sub(lambda m: _ENTITIES[m.group(0)], s)
    return " ".join(s.decode("utf-8", "replace").split())


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url(url: str, base: str | None = None) -> str:
    """Canonical absolute url: resolved against ``base``, lowercased
    scheme/host, default port stripped, fragment dropped, empty path ->
    "/". Frozen."""
    u = url.strip()
    if base:
        u = urljoin(base, u)
    parts = urlsplit(u)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    host, _, port = netloc.partition(":")
    if port and port == _DEFAULT_PORTS.get(scheme):
        netloc = host
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def extract_outlinks(html: bytes, base_url: str | None = None) -> list[str]:
    """All http(s) anchor targets in document order, normalized.

    Duplicates are KEPT (the reference keeps multi-edges; dedup is an
    explicit later ``simplify`` step, reference
    src/structural_properties.c:2177). Frozen."""
    out: list[str] = []
    for m in _RE_HREF.finditer(html):
        raw = next(g for g in m.groups() if g is not None)
        href = _RE_ENTITY.sub(
            lambda mm: _ENTITIES[mm.group(0)], raw
        ).decode("utf-8", "replace")
        u = normalize_url(href, base=base_url)
        if u.startswith("http://") or u.startswith("https://"):
            out.append(u)
    return out
