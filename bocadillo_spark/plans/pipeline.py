"""Batch pipeline assembly: pages → parse → route → aggregate.

One Catalyst plan end-to-end (the §3.3 EnhancedReader loop re-expressed
declaratively): native projections/filters first, the single pandas-UDF
parse in the middle, broadcast join + hash aggregate after. See
/root/reference/reader/enhanced_reader.go:80-127 for the scalar original.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregate import sink_counts, sink_counts_salted
from ..operators.parse import parse_events, with_host
from ..operators.route import build_routing_dim, route
from ..synth import synth_pages


def routed_events(spark: SparkSession, pages: DataFrame) -> DataFrame:
    dim = build_routing_dim(spark)
    return route(parse_events(with_host(pages)), dim)


def pipeline_counts(spark: SparkSession, pages: DataFrame, salted: bool = False) -> DataFrame:
    routed = routed_events(spark, pages)
    return sink_counts_salted(routed) if salted else sink_counts(routed)


def pages_from_sf(spark: SparkSession, sf_dir: str, num_partitions: int | None = None) -> DataFrame:
    return synth_pages(spark, sf_dir, num_partitions)


def pages_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
