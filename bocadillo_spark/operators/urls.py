"""Canonical-URL normalization + recrawl dedup — the web-pipeline step
between fetch and parse: the same page arrives under many URL spellings
(tracking params, fragments, host case) and must collapse to one canonical
key before any per-url invariant (byte-identical text per url,
BASELINE.json input_hint) can hold.

Everything is native column expressions: the query-string split/filter/
rejoin runs as array exprs inside whole-stage codegen — no Python, no UDF.
At 100 TB the canonicalize step is a pure map (no shuffle); the dedup is
one groupBy on the canonical key, the same shuffle any exact dedup pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tracking params stripped by the canonicalizer (the industry-standard
# strip list: UTM campaign tags + click identifiers + bare ref).
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|ref)="

# scheme matched case-insensitively: recrawls arrive as HTTPS:// too
_AUTHORITY_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$"


def canonical_url(u):
    """Canonicalize a URL column: drop the #fragment, strip tracking
    params (keeping real ones, in order), lowercase scheme+host. Pure
    map-side expression."""
    # 1. fragment off
    u = F.regexp_replace(u, "#.*", "")
    # 2. split base?query, filter tracking params out of the query array
    base = F.substring_index(u, "?", 1)
    query = F.when(u.contains("?"), F.substring_index(u, "?", -1))
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    rebuilt = F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)
    # 3. scheme+host lowercase, path/query case preserved
    authority = F.regexp_extract(rebuilt, _AUTHORITY_RE, 1)
    rest = F.regexp_extract(rebuilt, _REST_RE, 1)
    return F.concat(F.lower(authority), rest)


def _doc_id_from_url(url):
    return F.element_at(F.split(url, "/"), -1).cast("long")


def recrawl_variants(pages: DataFrame) -> DataFrame:
    """Deterministic dirty-URL fixture (the planted-pair idiom, like
    dedup.augment_with_near_dups): each page re-emitted under 0-2 extra
    spellings keyed on doc_id — tracking-tagged (doc_id%3==0),
    fbclid+fragment (doc_id%3==1), uppercased host (doc_id%5==2). The
    %3 and %5 conditions overlap (e.g. doc_id=12 gets both the tracking
    tag and the upper-host variant, 3 spellings total — pinned in
    tests/test_similarity_textops.py), which the url_dedup_canonical
    oracle's additive CASE arithmetic mirrors exactly. All spellings
    canonicalize back to the page's clean url."""
    d = _doc_id_from_url(F.col("url"))
    url = F.col("url")
    upper_host = F.concat(
        F.upper(F.regexp_extract(url, r"^(https?://[^/]*)", 1)),
        F.regexp_extract(url, r"^https?://[^/]*(.*)$", 1),
    )
    variants = F.array(
        url,
        F.when(d % 3 == 0, F.concat(url, F.lit("?utm_source=feed&gclid=1"))),
        F.when(d % 3 == 1, F.concat(url, F.lit("?fbclid=abc#frag"))),
        F.when(d % 5 == 2, upper_host),
    )
    return pages.select(
        F.explode(F.filter(variants, lambda v: v.isNotNull())).alias("url"),
        F.col("warc_ts"),
    )


def url_dedup(crawl: DataFrame) -> DataFrame:
    """Collapse recrawled URL spellings: canonicalize (map-side) then one
    groupBy on the canonical key — keep the earliest fetch, count the
    collapsed spellings.

    The canonicalization runs as STAGED projections rather than the one
    deep canonical_url expression: that tree references rebuilt twice,
    kept twice and base twice, and the interpreted filter() sits outside
    codegen CSE, so the inline form re-evaluated the whole strip chain
    per reference. Same subexpressions composed in the same order —
    values identical to canonical_url (which stays as the single-column
    form for scalar callers)."""
    u = F.regexp_replace(F.col("url"), "#.*", "")
    query = F.when(F.col("u").contains("?"), F.substring_index(F.col("u"), "?", -1))
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    rebuilt = F.when(
        F.size("kept") > 0,
        F.concat(F.col("base"), F.lit("?"), F.array_join("kept", "&")),
    ).otherwise(F.col("base"))
    canon = F.concat(
        F.lower(F.regexp_extract("rb", _AUTHORITY_RE, 1)),
        F.regexp_extract("rb", _REST_RE, 1),
    )
    return (
        crawl.select(u.alias("u"), "warc_ts")
        .select(
            F.substring_index(F.col("u"), "?", 1).alias("base"),
            kept.alias("kept"),
            "warc_ts",
        )
        .select(rebuilt.alias("rb"), "warc_ts")
        .select(canon.alias("canonical_url"), "warc_ts")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.date_format(F.min("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_seen"
            ),
        )
    )
