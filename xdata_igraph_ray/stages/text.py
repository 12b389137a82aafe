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
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "alpha_ratio": alpha_ratio.round(6),
                "stop_ratio": stop_ratio.round(6),
                "mean_word_len": pd.Series(mean_len, index=df.index).round(6),
                "quality": pd.Series(q, index=df.index).round(6),
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


def fingerprint(docs: Dataset) -> Dataset:
    """(doc_id, fp): 64-bit rolling (polynomial) hash over the token
    stream — a deterministic document fingerprint."""

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        def roll(t: str) -> int:
            toks = TOKEN_RE.findall(t)
            if not toks:
                return 0
            with np.errstate(over="ignore"):
                h = pd.util.hash_array(np.array(toks, dtype=object))
                pos = np.arange(1, len(h) + 1, dtype=np.uint64)
                return int(
                    np.bitwise_xor.reduce(h * pos).astype(np.int64)
                )

        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": df["text"].map(roll).astype("int64"),
            }
        )

    return docs.map_batches(fp, batch_format="pandas", batch_size=4096)
