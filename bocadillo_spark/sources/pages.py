"""Pages source: batch and streaming readers over the pages table.

S1/S2 analogs (/root/reference/mysql/driver/conn.go:95-128,
internal/mysql/packets.go:27-96): the transport/framing layer is the file
format; resumable position is the Structured Streaming checkpoint. Plan B
(no Iceberg jar offline, SURVEY.md §7): parquet paths behind this seam —
swapping in `format("iceberg")` is a one-module change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import PAGES_STRUCT


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAGES_STRUCT).parquet(path)


def stream_pages(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """File-source micro-batches: new files ≙ binlog ROTATE continuation
    (/root/reference/binlog/event_rotate.go:14-29)."""
    return (
        spark.readStream.schema(PAGES_STRUCT)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
