"""Deduplication operators over the documents table.

Scale shapes (the part that matters at 100 TB):
- exact: one hash-groupBy on a fingerprint column — single shuffle of
  (fp, doc_id), map-side combined.
- minhash-LSH: docs → signature (Arrow-batched UDF) → explode to
  (band_key, doc_id) → self-join on band_key → candidate pairs →
  verify exact Jaccard only on candidates. The band join is the classic
  shuffle-on-bucket plan: no all-pairs blowup; hot buckets are bounded by
  a per-bucket cap.
- simhash: signature + band-exact match on 4 x 16-bit chunks (any equal
  chunk → candidate, Hamming-verify) — same bucket-join shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

MAX_BUCKET = 50  # drop degenerate buckets (e.g. empty-text) — logged, not silent

SIG_SCHEMA = "doc_id long, band_key string"
SIMHASH_SCHEMA = "doc_id long, simhash long"
VERIFY_SCHEMA = "doc_id_a long, doc_id_b long, jaccard double"


NEAR_DUP_STRIDE = 500_000
NEAR_DUP_MOD = 10


def augment_with_near_dups(docs: DataFrame) -> DataFrame:
    """Plant deterministic near-duplicates: every 10th doc gets a variant
    (two tokens appended, doc_id + 500000). Native ops only. This is the
    evaluation corpus for the near-dup operators — the driver tables have
    no natural duplicates."""
    variants = docs.where(F.col("doc_id") % NEAR_DUP_MOD == 0).select(
        (F.col("doc_id") + F.lit(NEAR_DUP_STRIDE)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz yy")).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(variants)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup via content hash: representative = min(doc_id)."""
    return (
        docs.withColumn("fp", F.md5(F.col("text").cast("binary")))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _minhash_bands(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        ids, keys = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            for k in H.band_keys(H.minhash_signature(text or "")):
                ids.append(doc_id)
                keys.append(k)
        yield pd.DataFrame({"doc_id": ids, "band_key": keys})


def minhash_candidates(docs: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """(doc_id_a < doc_id_b) candidate pairs sharing ≥1 LSH band.

    Buckets larger than `max_bucket` are dropped (not silently: they come
    back via `oversized_buckets`) — one degenerate bucket (empty text,
    boilerplate) turns the band join quadratic at 100 TB. Exact duplicates
    are the usual cause and belong to `exact_dedup`, which callers run
    first (cheaper: one shuffle, no pair blowup)."""
    bands = docs.select("doc_id", "text").mapInPandas(_minhash_bands, SIG_SCHEMA)
    sizes = bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("bn"))
    ok_keys = sizes.where(F.col("bn") <= max_bucket).select("band_key")
    pruned = bands.join(ok_keys, "band_key")
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(b, on="band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    return pairs


def oversized_buckets(docs: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """The buckets minhash_candidates dropped — no silent coverage caps."""
    bands = docs.select("doc_id", "text").mapInPandas(_minhash_bands, SIG_SCHEMA)
    return (
        bands.groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bn"))
        .where(F.col("bn") > max_bucket)
    )


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Candidates verified with exact Jaccard (computed only for candidate
    pairs — the verify step touches a vanishing fraction of the corpus)."""
    cands = minhash_candidates(docs)
    texts = docs.select("doc_id", "text")
    joined = (
        cands.join(texts.withColumnRenamed("doc_id", "doc_id_a").withColumnRenamed("text", "text_a"), "doc_id_a")
        .join(texts.withColumnRenamed("doc_id", "doc_id_b").withColumnRenamed("text", "text_b"), "doc_id_b")
    )

    def _verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id_a": pdf["doc_id_a"],
                    "doc_id_b": pdf["doc_id_b"],
                    "jaccard": [
                        H.jaccard(ta or "", tb or "")
                        for ta, tb in zip(pdf["text_a"], pdf["text_b"])
                    ],
                }
            )

    verified = joined.mapInPandas(_verify, VERIFY_SCHEMA)
    return verified.where(F.col("jaccard") >= threshold)


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _simhash_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                # signed int64 (Spark LongType); bit pattern preserved
                "simhash": [_to_i64(H.simhash64(t or "")) for t in pdf["text"]],
            }
        )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", "text").mapInPandas(_simhash_batch, SIMHASH_SCHEMA)


def simhash_near_dup_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Block on 4 x 16-bit chunks (pigeonhole: hamming ≤3 ⇒ ≥1 chunk equal),
    verify Hamming on candidates — all native bit ops, no UDF."""
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{i}:"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * i)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .cast("string"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_key"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, "chunk_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("doc_id_a", "doc_id_b", "hamming")
