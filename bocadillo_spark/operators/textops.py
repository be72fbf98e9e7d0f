"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the training-data-pipeline layer over
`documents`/pages.

Everything here is native expressions (no Python workers anywhere):
token counting and quality ratios are plain column exprs; language-ID is
a staged token filter + profile-membership counts + CASE argmax;
fingerprinting is a codepoint polynomial fold. The one exception is
zscore_per_user, which deliberately demonstrates the grouped-map
applyInPandas surface. lang_id_kernel / hashing.rolling_fingerprint are
the scalar pytest twins; the DuckDB oracle generators live alongside so
Spark and SQL can't drift.
"""

from __future__ import annotations

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


LANGS_SORTED = sorted(LANG_PROFILES)


def lang_id_kernel(text: str) -> tuple[str, float]:
    """Scalar twin of the native lang_id expression (pytest oracle).
    Tokens = single-space split, empties dropped; per-lang score =
    stopword hits / n_tokens; winner = first lang in sorted order with the
    strictly-highest score, 'und' when every score is zero."""
    toks = [x for x in (text or "").split(" ") if x]
    best, best_score = "und", 0.0
    for lang in LANGS_SORTED:
        prof = LANG_PROFILES[lang]
        score = (sum(1 for t in toks if t in prof) / len(toks)) if toks else 0.0
        if score > best_score:
            best, best_score = lang, score
    return best, best_score


def _langid_score_cols(toks_col):
    """Per-language score expressions over a MATERIALIZED tokens column
    (hits/n_tokens as an exact int/int double division). Callers stage the
    token filter once — the scores reference it ~8x each (6 langs + argmax
    + CASE), and a multiply-referenced expensive expression is exactly
    what Catalyst keeps as its own projection."""
    n_safe = F.greatest(F.size(toks_col), F.lit(1)).cast("double")

    def member_pred(prof):
        return lambda x: x.isin(*prof)

    scores = {}
    for lang in LANGS_SORTED:
        hits = F.size(F.filter(toks_col, member_pred(sorted(LANG_PROFILES[lang]))))
        scores[lang] = hits.cast("double") / n_safe
    return scores


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language heuristic — fully native (token filter +
    per-profile membership counts + CASE argmax; the round-1 per-row
    Python loop is gone). Ties → earliest lang in sorted order; all-zero →
    'und'. Exact under the DuckDB oracle because every score is an int/int
    double division."""
    staged = docs.select(
        "doc_id",
        F.filter(
            F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda x: x != ""
        ).alias("toks"),
    )
    scores = _langid_score_cols(F.col("toks"))
    best = F.greatest(*scores.values())
    pred = F.when(best <= F.lit(0.0), F.lit("und"))
    for lang in LANGS_SORTED:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return staged.select(
        "doc_id", pred.otherwise(F.lit("und")).alias("pred_lang"), best.alias("score")
    )


def langid_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of lang_id, generated from the same LANG_PROFILES so the
    two can't drift."""
    toks = "list_filter(string_split(text, ' '), x -> x <> '')"
    score_exprs = []
    for lang in LANGS_SORTED:
        words = ", ".join(f"'{w}'" for w in sorted(LANG_PROFILES[lang]))
        score_exprs.append(
            f"CAST(len(list_filter(toks, x -> x IN ({words}))) AS DOUBLE)"
            f" / greatest(len(toks), 1) AS s_{lang}"
        )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANGS_SORTED) + ")"
    case = "CASE WHEN " + best + " <= 0 THEN 'und' "
    case += " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANGS_SORTED
    )
    case += " ELSE 'und' END"
    return f"""WITH t AS (SELECT doc_id, {toks} AS toks FROM {table}),
s AS (SELECT doc_id, {", ".join(score_exprs)} FROM t)
SELECT doc_id, {case} AS pred_lang, round({best}, 6) AS score FROM s"""


ZSCORE_SCHEMA = "user_id long, event_id long, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=0)
    z = (pdf["value"] - mu) / sd if sd and sd > 0 else pdf["value"] * 0.0
    # round(6) + 0.0: fixed quantization for the cross-engine oracle and
    # -0.0 normalized to +0.0 (stringifies differently otherwise)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "zscore": z.round(6) + 0.0,
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
    """Rolling polynomial hash over text codepoints mod 2^31-1 — fully
    native (char split → ascii → aggregate fold, whole-stage codegen; the
    round-1 per-byte Python loop is gone). acc*base+v stays < 2^51, exact
    in LongType under ANSI. Same digits as hashing.rolling_fingerprint and
    the DuckDB list_reduce oracle."""
    t = F.coalesce(F.col("text"), F.lit(""))
    cps = F.transform(
        F.filter(F.split(t, ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    fp = F.aggregate(
        cps,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(H.FP_BASE) + v) % F.lit(H.MERSENNE31),
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def fingerprint_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin of doc_fingerprints (same base/modulus constants)."""
    return f"""SELECT doc_id, CAST(list_reduce(
  list_prepend(CAST(0 AS BIGINT),
    list_transform(range(1, length(coalesce(text,''))+1),
                   i -> CAST(ord(coalesce(text,'')[i]) AS BIGINT))),
  (acc, v) -> (acc * {H.FP_BASE} + v) % {H.MERSENNE31}) AS BIGINT) AS fingerprint
FROM {table}"""
