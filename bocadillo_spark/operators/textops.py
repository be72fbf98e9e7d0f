"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the training-data-pipeline layer over
`documents`/pages.

Token counting and quality ratios are pure native expressions (codegen);
language-ID and the rolling fingerprint are Arrow-batched UDFs backed by
the same pure-Python kernels their pytest oracles call.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "a", "of", "and", "to", "in", "is"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "ein"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "un"}),
    "es": frozenset({"el", "la", "los", "y", "es", "un"}),
    "zh": frozenset({"的", "是", "了", "在"}),
    "ja": frozenset({"の", "は", "に", "を"}),
}

LANGID_SCHEMA = "doc_id long, pred_lang string, score double"
FP_SCHEMA = "doc_id long, fingerprint long"


def token_count_col(text_col):
    return F.size(F.split(text_col, r"\s+"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword ratios, all JVM-side."""
    toks = F.split(F.col("text"), " ")
    stops = F.filter(toks, lambda x: (x == "the") | (x == "a"))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.size(toks).cast("long").alias("n_tokens"),
        (F.size(stops).cast("double") / F.size(toks)).alias("stop_ratio"),
        (n_punct.cast("double") / F.greatest(F.length("text"), F.lit(1))).alias("punct_ratio"),
    )


def _langid_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        preds, scores = [], []
        for text in pdf["text"]:
            toks = (text or "").split()
            best, best_score = "und", 0.0
            for lang, prof in sorted(LANG_PROFILES.items()):
                if not toks:
                    continue
                score = sum(1 for t in toks if t in prof) / len(toks)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
            scores.append(best_score)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "pred_lang": preds, "score": scores})


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language heuristic (deterministic; ties → 'und'
    unless a profile strictly wins, iteration order fixed by sort)."""
    return docs.select("doc_id", "text").mapInPandas(_langid_batches, LANGID_SCHEMA)


def _fingerprint_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fingerprint": [
                    H.rolling_fingerprint((t or "").encode("utf-8")) for t in pdf["text"]
                ],
            }
        )


ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=0)
    z = (pdf["value"] - mu) / sd if sd and sd > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "zscore": z.round(9),
        }
    )


def zscore_per_user(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: whole-group normalization (the shape for
    per-group model scoring / feature normalization at scale — one shuffle
    on the group key, pandas per group)."""
    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandas(_zscore_group, ZSCORE_SCHEMA)
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling polynomial hash over the raw text bytes (mod 2^61-1 — fits
    LongType exactly)."""
    return docs.select("doc_id", "text").mapInPandas(_fingerprint_batches, FP_SCHEMA)
