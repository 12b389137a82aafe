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


def token_stats(docs: Dataset) -> Dataset:
    """(doc_id, n_chars, n_words, n_tokens): whitespace/regex word count
    + BPE-ish subword count."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": texts.str.len().astype("int64"),
                "n_words": texts.map(
                    lambda t: len(TOKEN_RE.findall(t))
                ).astype("int64"),
                "n_tokens": texts.map(
                    lambda t: len(BPE_RE.findall(t))
                ).astype("int64"),
            }
        )

    return docs.map_batches(stats, batch_format="pandas", batch_size=4096)


def quality_scores(docs: Dataset) -> Dataset:
    """Heuristic quality features + composite score in [0, 1]
    (length, alpha ratio, stopword ratio, mean word length)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        n = texts.str.len().clip(lower=1)
        words = texts.map(TOKEN_RE.findall)
        n_words = words.map(len).clip(lower=1)
        alpha = texts.str.count(r"[A-Za-z]")
        stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in _STOP_EN))
        mean_len = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        alpha_ratio = (alpha / n).astype(float)
        stop_ratio = (stop / n_words).astype(float)
        len_ok = ((n >= 50) & (n <= 100_000)).astype(float)
        word_ok = ((mean_len >= 2.5) & (mean_len <= 12.0)).astype(float)
        q = 0.3 * alpha_ratio + 0.3 * np.minimum(stop_ratio * 4.0, 1.0) \
            + 0.2 * len_ok + 0.2 * word_ok
        # full doubles, no rounding: every value is a ratio/sum of
        # exact ints evaluated in the same order as the SQL oracle, so
        # the floats are bit-identical; rounding here hit a genuine
        # half-even-vs-half-away tie at the 6th decimal (0.8203125)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "alpha_ratio": alpha_ratio,
                "stop_ratio": stop_ratio,
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
        cache: dict[str, int] = {}

        def tok_h(tok: str) -> int:
            h = cache.get(tok)
            if h is None:
                h = 0
                for ch in tok:
                    h = (h * 131 + ord(ch)) % _FP_MOD
                cache[tok] = h
            return h

        def roll(t: str) -> int:
            acc = 0
            for i, tk in enumerate(TOKEN_RE.findall(t), 1):
                acc ^= tok_h(tk) * i
            return acc

        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": df["text"].map(roll).astype("int64"),
            }
        )

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
