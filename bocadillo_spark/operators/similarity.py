"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — one broadcast of the query set,
  one pass over candidates, native zip_with/aggregate dot products
  (JVM codegen, no Python). The correctness baseline.
- lsh_topk: sign-random-projection buckets; probe only buckets within
  `probe_hamming` of the query's bucket. At 100 TB the candidate table is
  pre-bucketed (written partitioned by bucket) so a probe prunes
  partitions; here the bucket column is computed on the fly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions import hashing as H

BUCKET_SCHEMA = "vec_id long, bucket int"


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_col(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(queries: DataFrame, candidates: DataFrame, k: int = 10) -> DataFrame:
    """queries(q_id, qe), candidates(neighbor_id, ce) → top-k by cosine."""
    scored = candidates.crossJoin(F.broadcast(queries)).withColumn(
        "cos", cosine_col(F.col("qe"), F.col("ce"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos")
    )


def split_query_candidates(emb: DataFrame, n_queries: int = 5) -> tuple[DataFrame, DataFrame]:
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("e"))
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    c = e.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")
    )
    return q, c


def _bucket_batches(dim: int):
    planes = H.hyperplanes(dim)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "bucket": [
                        H.lsh_bucket(np.asarray(v, dtype=np.float64), planes)
                        for v in pdf["embedding"]
                    ],
                }
            )

    return fn


def with_lsh_bucket(emb: DataFrame, dim: int = 64) -> DataFrame:
    buckets = emb.select("vec_id", "embedding").mapInPandas(
        _bucket_batches(dim), BUCKET_SCHEMA
    )
    return emb.join(buckets, "vec_id")


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Coarse quantization: nearest centroid per vector — cross join against
    the broadcast centroid set + native min_by argmin. At scale the
    candidate table is written partitioned by `list_id`, so probes prune
    whole partitions (the IVF inverted-list layout)."""
    d = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", _sq_dist(F.col("e"), F.col("ce"))
    )
    return d.groupBy("vec_id").agg(
        F.min_by("centroid_id", "dist").alias("list_id"),
        F.first("e").alias("e"),
    )


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    nprobe: int = 3,
    centroid_mod: int = 25,
) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids (every `centroid_mod`-th
    vector — no training step, honest inverted-list structure), queries probe
    their `nprobe` nearest lists, exact cosine within the probed lists."""
    e = emb.select(
        "vec_id", _as_double(F.col("embedding")).alias("e")
    )
    centroids = e.where(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    assigned = ivf_assign(e, centroids)

    q = assigned.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    c = assigned.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce"), "list_id"
    )
    # nprobe nearest centroid lists per query
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("dist", _sq_dist(F.col("qe"), F.col("ce")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("centroid_id"))
            ),
        )
        .where(F.col("rn") <= nprobe)
        .select("q_id", "qe", F.col("centroid_id").alias("list_id"))
    )
    cand = probes.join(c, "list_id")  # probe only the selected inverted lists
    scored = cand.withColumn("cos", cosine_col(F.col("qe"), F.col("ce")))
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos")
    )


def lsh_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 10, probe_hamming: int = 2, dim: int = 64
) -> DataFrame:
    """Approximate top-k: candidates whose bucket is within probe_hamming
    bits of the query's bucket. bit_count is a native expression, so the
    bucket filter runs JVM-side before any dot product."""
    b = with_lsh_bucket(emb, dim)
    e = b.select("vec_id", "bucket", _as_double(F.col("embedding")).alias("e"))
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("bucket").alias("qb"), F.col("e").alias("qe")
    )
    c = e.where(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), F.col("bucket").alias("cb"), F.col("e").alias("ce")
    )
    cand = c.crossJoin(F.broadcast(q)).where(
        F.bit_count(F.col("cb").bitwiseXOR(F.col("qb"))) <= probe_hamming
    )
    scored = cand.withColumn("cos", cosine_col(F.col("qe"), F.col("ce")))
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos")
    )
