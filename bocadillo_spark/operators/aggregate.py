"""Per-sink aggregate counts (north_rule) + salted two-phase aggregation.

The reference has no aggregation (SURVEY.md §2.4); the target requires
per-sink routed-row counts that equal the scalar oracle's exactly. Counts
use Spark's built-in hash aggregate (partial map-side + final — already a
two-phase combine). For hot keys (the Zipf host fixture, ~60% of rows on 2
hosts) we additionally provide an explicit salted two-phase variant: AQE
skew-join handles skewed *joins*, not skewed groupBy keys, so salting is
manual (SURVEY.md §4 rewrite table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT = 16


def sink_counts(routed: DataFrame) -> DataFrame:
    """groupBy(sink, event_type) → n. Map-side partial agg makes the
    shuffle carry ~|sinks|×|types| rows per task regardless of input size —
    this is the plan that survives 100 TB."""
    return (
        routed.groupBy("sink_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sink_counts_salted(routed: DataFrame, n_salt: int = N_SALT) -> DataFrame:
    """Two-phase: partial by (sink, event_type, salt), final by (sink,
    event_type). Counts must be identical to sink_counts() — the skew
    fixture test asserts it. salt = pmod(hash(url), n) spreads a hot key
    over n reducers in phase 1."""
    salted = routed.withColumn("salt", F.pmod(F.hash("url"), F.lit(n_salt)))
    partial = salted.groupBy("sink_id", "event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn")
    )
    return partial.groupBy("sink_id", "event_type").agg(F.sum("pn").alias("n"))


def route_metrics(routed: DataFrame) -> DataFrame:
    """Parse/route/error observability counts (north_rule metrics)."""
    return routed.groupBy("route_reason").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("url").alias("n_urls"),
    )
