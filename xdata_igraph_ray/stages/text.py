"""Text-analysis stages over a documents table (doc_id, text, ...).

Large-scale training-data operators with no reference-C analog (the
reference's scalar layer is generic container math, SURVEY.md §2.11);
semantics are defined here, frozen, and mirrored in the SQL oracles of
``__ray_entry__``.  All stages are vectorized ``map_batches`` bodies;
the language-ID stage is a callable class (actor pool) so its n-gram
profiles are built once per actor, not once per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

# frozen token definition shared with the SQL oracle ([A-Za-z0-9]+)
TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
# BPE-ish subword splitter: runs of letters, digits, or single
# non-space symbols (GPT-2-style coarse pretokenizer shape)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")

_STOP_EN = frozenset(
    "the of and to in a is that it for on as with was at by an be this".split()
)

# ---- byte-level ASCII text kernels ----------------------------------------
# The frozen token/char classes are pure ASCII, and ASCII bytes never
# occur inside UTF-8 multibyte sequences, so every count below can run
# as numpy lookup-table + cumsum passes over the string column's RAW
# UTF-8 buffer (zero-copy out of Arrow) — no regex engine, no Python
# frame per row.  Semantics are pinned to the DuckDB/RE2 oracle
# (``\s`` = ASCII [\t\n\f\r ], NOT Python's unicode \s).

import string as _string

_ALPHA_LUT = np.zeros(256, np.bool_)
_ALPHA_LUT[[ord(c) for c in _string.ascii_letters]] = True
_DIGIT_LUT = np.zeros(256, np.bool_)
_DIGIT_LUT[[ord(c) for c in _string.digits]] = True
_ALNUM_LUT = _ALPHA_LUT | _DIGIT_LUT
_WS_LUT = np.zeros(256, np.bool_)
_WS_LUT[[9, 10, 12, 13, 32]] = True  # RE2 \s (no \v, no unicode ws)
_LOWER_LUT = np.arange(256, dtype=np.uint8)
for _c in _string.ascii_uppercase:
    _LOWER_LUT[ord(_c)] = ord(_c.lower())
_STOP_BYTES = [np.frombuffer(w.encode(), dtype=np.uint8) for w in _STOP_EN]


def _utf8_views(arr) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """(clean_arrow_array, data_bytes, offsets) of an Arrow string
    column — zero-copy for the data buffer, nulls filled with ""."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, "")
    bufs = arr.buffers()
    width = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=width)[
        arr.offset: arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0]: offs[-1]]
    if offs[0]:
        offs = offs - offs[0]  # sliced array: rebase into the view
    return arr, data, offs


def _per_doc(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document sum of a per-byte bool mask via one cumsum.
    int32 accumulator: a single Arrow block's buffer is < 2^31 bytes."""
    cs = np.zeros(len(mask) + 1, dtype=np.int32)
    np.cumsum(mask, out=cs[1:])
    return (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)


def _run_count(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-document count of maximal True-runs.  Adjacent documents
    touch in the shared buffer, so a doc that STARTS mid-run gets its
    clipped run re-counted explicitly."""
    if len(mask) == 0:
        return np.zeros(len(offs) - 1, np.int64)
    starts = mask.copy()
    starts[1:] &= ~mask[:-1]
    runs = _per_doc(starts, offs)
    s = offs[:-1]
    inner = (s > 0) & (s < offs[1:])
    si = s[inner]
    runs[inner] += (mask[si] & mask[si - 1]).astype(np.int64)
    return runs


def _stopword_count(data: np.ndarray, offs: np.ndarray,
                    alnum: np.ndarray) -> np.ndarray:
    """Per-document count of tokens (maximal alnum runs) that equal a
    stopword case-insensitively: direct byte search per stopword with
    token-boundary checks — no tokenization pass."""
    n = len(data)
    ndocs = len(offs) - 1
    out = np.zeros(ndocs, np.int64)
    if n == 0:
        return out
    low = _LOWER_LUT[data]
    is_b = np.zeros(n + 1, np.bool_)
    is_b[offs] = True  # doc boundaries (start/end positions)
    b_cs = np.zeros(n + 2, dtype=np.int32)
    np.cumsum(is_b, out=b_cs[1:])
    for wb in _STOP_BYTES:
        L = len(wb)
        if n < L:
            continue
        m = low[: n - L + 1] == wb[0]
        for k in range(1, L):
            m &= low[k: n - L + 1 + k] == wb[k]
        pos = np.nonzero(m)[0]
        if not len(pos):
            continue
        # the match may not span a doc boundary
        ok = (b_cs[pos + L] - b_cs[pos + 1]) == 0
        # left token boundary: doc start or non-alnum previous byte
        left = is_b[pos] | ~alnum[np.maximum(pos - 1, 0)]
        left |= pos == 0
        # right token boundary: doc end or non-alnum next byte
        e = pos + L
        right = is_b[e] | (e == n)
        inn = e < n
        right[inn] |= ~alnum[e[inn]]
        pos = pos[ok & left & right]
        if len(pos):
            did = np.searchsorted(offs, pos, side="right") - 1
            np.add.at(out, did, 1)
    return out


def token_stats(docs: Dataset) -> Dataset:
    """(doc_id, n_chars, n_words, n_tokens): whitespace/regex word count
    + BPE-ish subword count.

    Fully vectorized over the raw UTF-8 buffer (see the byte-kernel
    section above): token counts are alnum-run counts, and the BPE-ish
    count decomposes as alpha_runs + digit_chars + symbol_codepoints
    because the alternation's three branches are disjoint.  Count
    semantics are RE2's (the DuckDB oracle's engine), pinned by the
    n_tokens-vs-``regexp_extract_all`` equality in the driver gate."""
    import pyarrow.compute as pc

    def stats(tbl: pa.Table) -> pa.Table:
        clean, data, offs = _utf8_views(tbl["text"])
        ncp = pc.utf8_length(clean).to_numpy().astype(np.int64)
        alnum = _ALNUM_LUT[data]
        n_words = _run_count(alnum, offs)
        alpha_runs = _run_count(_ALPHA_LUT[data], offs)
        digits = _per_doc(_DIGIT_LUT[data], offs)
        alnum_b = _per_doc(alnum, offs)
        ws_b = _per_doc(_WS_LUT[data], offs)
        # symbol code points = all code points - ascii-alnum - ascii-ws
        # (non-ascii chars are [^A-Za-z0-9\s] under RE2's ascii \s)
        n_tokens = alpha_runs + digits + (ncp - alnum_b - ws_b)
        return pa.table(
            {
                "doc_id": tbl["doc_id"],
                "n_chars": pa.array(ncp),
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow", batch_size=4096)


def quality_scores(docs: Dataset) -> Dataset:
    """Heuristic quality features + composite score in [0, 1]
    (length, alpha ratio, stopword ratio, mean word length)."""

    import pyarrow.compute as pc

    def score(df: pd.DataFrame) -> pd.DataFrame:
        clean, data, offs = _utf8_views(pa.array(df["text"].fillna(""),
                                                 type=pa.string()))
        # All counts via the byte kernels — no regex, no Python frame
        # per row; tokens are maximal alnum runs, so per-doc total
        # token length == per-doc alnum byte count (mean word length
        # needs no tokenization) and integer sums are exact in float64,
        # making every ratio bit-identical to the old per-list np.mean.
        n = np.maximum(pc.utf8_length(clean).to_numpy().astype(np.int64), 1)
        alnum_mask = _ALNUM_LUT[data]
        alpha = _per_doc(_ALPHA_LUT[data], offs)
        n_words = _run_count(alnum_mask, offs)
        alnum = _per_doc(alnum_mask, offs)
        stop = _stopword_count(data, offs, alnum_mask)
        nw = np.maximum(n_words, 1)
        mean_len = np.where(n_words > 0, alnum / nw, 0.0)
        alpha_ratio = alpha / n
        stop_ratio = stop / nw
        len_ok = ((n >= 50) & (n <= 100_000)).astype(np.float64)
        word_ok = ((mean_len >= 2.5) & (mean_len <= 12.0)).astype(np.float64)
        q = 0.3 * alpha_ratio + 0.3 * np.minimum(stop_ratio * 4.0, 1.0) \
            + 0.2 * len_ok + 0.2 * word_ok
        # full doubles, no rounding: every value is a ratio/sum of
        # exact ints evaluated in the same order as the SQL oracle, so
        # the floats are bit-identical; rounding here hit a genuine
        # half-even-vs-half-away tie at the 6th decimal (0.8203125)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "alpha_ratio": pd.Series(alpha_ratio, index=df.index),
                "stop_ratio": pd.Series(stop_ratio, index=df.index),
                "mean_word_len": pd.Series(mean_len, index=df.index),
                "quality": pd.Series(q, index=df.index),
            }
        )

    return docs.map_batches(score, batch_format="pandas", batch_size=4096)


class LangId:
    """Character-trigram language scorer (en/de/fr) — a stateful stage:
    profiles compile once per actor in __init__ (actor-pool pattern)."""

    PROFILES = {
        "en": " th the and ing ion to  of  in er  re",
        "de": " de der die und sch ein ich cht en  ge",
        "fr": " de les de  ent le  la ion es  que ais",
    }

    def __init__(self):
        self.tri = {
            lang: {p[i:i + 3] for i in range(0, len(p) - 2)}
            for lang, p in self.PROFILES.items()
        }

    def _score(self, text: str) -> str:
        t = " " + text[:2000].lower() + " "
        grams = {t[i:i + 3] for i in range(len(t) - 2)}
        best, best_s = "und", 0
        for lang, prof in self.tri.items():
            s = len(grams & prof)
            if s > best_s:
                best, best_s = lang, s
        return best

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df[["doc_id", "text"]].copy()
        df["lang_pred"] = df["text"].map(self._score)
        return df.drop(columns=["text"])


def detect_language(docs: Dataset, concurrency: int = 4) -> Dataset:
    return docs.map_batches(
        LangId, batch_format="pandas", batch_size=4096, concurrency=(1, concurrency)
    )


_FP_MOD = 2147483647  # 2^31 - 1


def fingerprint(docs: Dataset) -> Dataset:
    """(doc_id, fp): position-sensitive document fingerprint — XOR
    over tokens of (token_hash * position), where token_hash is the
    base-131 Horner hash of the token's code points mod 2^31-1.  The
    hash is EXPLICITLY specified (not a library-internal hash) so a
    SQL oracle can replicate it bit-exactly (DuckDB list_reduce over
    split(token, '') with the same lambda)."""

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        clean, data, offs = _utf8_views(pa.array(df["text"].fillna(""),
                                                 type=pa.string()))
        nrows = len(df)
        out = np.zeros(nrows, np.int64)
        n = len(data)
        if n:
            alnum = _ALNUM_LUT[data]
            # token run starts/ends over the shared buffer, forced at
            # doc boundaries so runs never span documents
            starts_m = alnum.copy()
            starts_m[1:] &= ~alnum[:-1]
            ends_m = alnum.copy()
            ends_m[:-1] &= ~alnum[1:]
            nonempty_docs = offs[:-1] < offs[1:]
            s_off = offs[:-1][nonempty_docs]
            e_off = offs[1:][nonempty_docs] - 1
            starts_m[s_off] = alnum[s_off]
            ends_m[e_off] = alnum[e_off]
            ts = np.nonzero(starts_m)[0]
            te = np.nonzero(ends_m)[0] + 1
            ntok = len(ts)
            if ntok:
                lens = te - ts
                did = np.searchsorted(offs, ts, side="right") - 1
                # 1-based token position within its doc
                first = np.searchsorted(did, did, side="left")
                pos = np.arange(ntok, dtype=np.int64) - first + 1
                # Horner hash, vectorized over the char index (tokens
                # are ASCII, so byte value == code point).  Tokens are
                # processed longest-first so step k touches only the
                # still-active PREFIX — total work is O(total token
                # bytes), immune to one pathologically long token.
                order = np.argsort(-lens, kind="stable")
                ls = lens[order]
                tso = ts[order]
                asc = ls[::-1]
                hs = np.zeros(ntok, np.int64)
                for k in range(int(ls[0])):
                    a = ntok - np.searchsorted(asc, k, side="right")
                    hs[:a] = (hs[:a] * 131 + data[tso[:a] + k]) % _FP_MOD
                h = np.empty_like(hs)
                h[order] = hs
                contrib = h * pos  # < 2^31 * ntok — safe in int64
                doc_first = np.searchsorted(did, np.arange(nrows), "left")
                doc_last = np.searchsorted(did, np.arange(nrows), "right")
                ne = doc_last > doc_first
                out[ne] = np.bitwise_xor.reduceat(contrib, doc_first[ne])
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "fp": pd.Series(out, index=df.index)})

    return docs.map_batches(fp, batch_format="pandas", batch_size=4096)


# -- PII scrubbing -----------------------------------------------------------
# RE2-safe patterns (no backrefs/lookaround) so the DuckDB oracle can
# run the IDENTICAL expressions via regexp_replace/extract_all.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d[\d-]{7,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_EMAIL_RE = re.compile(PII_EMAIL)
_PHONE_RE = re.compile(PII_PHONE)
_IP_RE = re.compile(PII_IP)


def pii_scrub(docs: Dataset, text_col: str = "text") -> Dataset:
    """(doc_id, text_clean, n_emails, n_phones, n_ips): count and
    redact emails / phone numbers / IPv4 literals.  Order matters and
    is frozen: emails -> phones -> IPs (an IP inside an email host is
    consumed by the email redaction first); the SQL oracle chains
    regexp_replace in the same order."""

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].fillna("")
        n_e = t.str.count(PII_EMAIL).astype("int64")
        t = t.str.replace(PII_EMAIL, "<EMAIL>", regex=True)
        n_p = t.str.count(PII_PHONE).astype("int64")
        t = t.str.replace(PII_PHONE, "<PHONE>", regex=True)
        n_i = t.str.count(PII_IP).astype("int64")
        t = t.str.replace(PII_IP, "<IP>", regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text_clean": t,
                "n_emails": n_e,
                "n_phones": n_p,
                "n_ips": n_i,
            }
        )

    return docs.map_batches(scrub, batch_format="pandas", batch_size=4096)


# -- Gopher-style repetition signals ----------------------------------------


def repetition_stats(docs: Dataset, text_col: str = "text") -> Dataset:
    """(doc_id, n_words, distinct_ratio, top_word_frac,
    dup_2gram_frac): the repetition family of Gopher-style quality
    rules.  Tokenization is frozen as split-on-single-space (matching
    the SQL oracle's string_split); fully vectorized via factorize +
    segmented unique/reduceat."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].fillna("")
        words = texts.str.split(" ")
        lens = words.map(len).to_numpy()
        flat = np.concatenate(words.to_numpy()) if lens.sum() else np.array(
            [], dtype=object
        )
        codes, _ = pd.factorize(flat)
        doc_idx = np.repeat(np.arange(len(df)), lens)
        ncodes = max(int(codes.max()) + 1, 1) if len(codes) else 1
        key = doc_idx * ncodes + codes
        uk, counts = np.unique(key, return_counts=True)
        udoc = uk // ncodes
        n_distinct = np.bincount(udoc, minlength=len(df))
        starts = np.concatenate(([0], np.cumsum(np.bincount(
            udoc, minlength=len(df)
        ))))[:-1]
        top = np.zeros(len(df), dtype=np.int64)
        np.maximum.at(top, udoc, counts)
        # 2-grams within each doc (mask out doc boundaries)
        if len(codes) > 1:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            bg_doc = doc_idx[1:][same_doc]
            bg_key = (codes[:-1][same_doc].astype(np.int64) * ncodes
                      + codes[1:][same_doc])
            bkey = bg_doc * (ncodes * ncodes) + bg_key
            n_bg = np.bincount(bg_doc, minlength=len(df))
            ubk = np.unique(bkey)
            d_bg = np.bincount(ubk // (ncodes * ncodes), minlength=len(df))
        else:
            n_bg = np.zeros(len(df), dtype=np.int64)
            d_bg = np.zeros(len(df), dtype=np.int64)
        nw = np.maximum(lens, 1)
        dup2 = np.where(n_bg > 0, 1.0 - d_bg / np.maximum(n_bg, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_words": lens.astype(np.int64),
                "distinct_ratio": np.round(n_distinct / nw, 6),
                "top_word_frac": np.round(top / nw, 6),
                "dup_2gram_frac": np.round(dup2, 6),
            }
        )

    return docs.map_batches(stats, batch_format="pandas", batch_size=4096)


def source_stats(docs: Dataset) -> Dataset:
    """Per-source corpus rollup (the domain-aggregation shape of a
    crawl pipeline): n_docs, total_chars, mean n_chars."""
    from ..exchange import block_refs, groupby_agg

    pre = docs.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n": np.ones(len(t), dtype=np.int64),
                "chars": pa.compute.utf8_length(t["text"]).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    agg = groupby_agg(
        block_refs(pre), ["source"],
        [("n", "sum", "n_docs"), ("chars", "sum", "total_chars")], P=4,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"],
                "total_chars": t["total_chars"],
                "mean_chars": pa.compute.round(
                    pa.compute.divide(
                        pa.compute.cast(t["total_chars"], pa.float64()),
                        pa.compute.cast(t["n_docs"], pa.float64()),
                    ),
                    ndigits=2,
                ),
            }
        ),
        batch_format="pyarrow",
    )


def unigram_logprob(docs: Dataset, P: int = 8) -> Dataset:
    """Corpus-fit unigram language-model score per document — the
    classic two-phase training-data quality signal: fit token counts
    over the WHOLE corpus (distributed count aggregate), then score
    each document's tokens under the add-one-smoothed model,
    p(tok) = (c(tok)+1)/(N+V).  Output (doc_id, n_tok, avg_logprob)
    for documents with >= 1 token.

    Fully distributed: token rows are exchanged BY TOKEN and joined
    against the co-partitioned count table (no model broadcast — at
    web scale the vocabulary itself is sharded), then re-aggregated by
    doc_id; the driver sees two scalars (N corpus tokens, V vocab).
    Tokenization = TOKEN_RE over lowercased text, replicated exactly
    by the DuckDB oracle via regexp_extract_all(lower(text))."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..exchange import block_refs, exchange, groupby_agg

    @ray.remote
    def apply(fn, *ts):
        return fn(*ts)

    def tok_rows(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        did = t["doc_id"].to_numpy()
        for i, txt in enumerate(t["text"].to_pylist()):
            tt = TOKEN_RE.findall(txt.lower())
            toks.extend(tt)
            ids.append(np.full(len(tt), did[i], np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(ids) if ids
                else np.empty(0, np.int64),
                "tok": pa.array(toks, pa.string()),
            }
        )

    refs = [
        apply.remote(tok_rows, r)
        for r in block_refs(docs.select_columns(["doc_id", "text"]))
    ]
    counts = groupby_agg(
        refs, ["tok"], [(None, "count", "c")], P=P, as_refs=True
    )

    @ray.remote
    def part_nv(t: pa.Table):
        return int(pa.compute.sum(t["c"]).as_py() or 0), t.num_rows

    parts = ray.get([part_nv.remote(r) for r in counts])
    n_total = sum(p[0] for p in parts)
    vocab = sum(p[1] for p in parts)
    denom = float(n_total + vocab)

    tok_parts = exchange(refs, ["tok"], P=P, as_refs=True)

    def score(tp: pa.Table, cp: pa.Table) -> pa.Table:
        j = tp.join(cp, keys=["tok"])
        c = j["c"].to_numpy()
        return pa.table(
            {
                "doc_id": j["doc_id"],
                "lp": np.log((c + 1.0) / denom),
            }
        )

    scored = [
        apply.remote(score, tok_parts[i], counts[i])
        for i in range(len(counts))
    ]
    out = groupby_agg(
        scored, ["doc_id"],
        [("lp", "sum", "lp_sum"), (None, "count", "n_tok")],
        P=P, as_refs=True,
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": t["n_tok"],
                "avg_logprob": t["lp_sum"].to_numpy()
                / t["n_tok"].to_numpy(),
            }
        )

    from ..exchange import to_dataset

    return to_dataset([apply.remote(fin, r) for r in out])
