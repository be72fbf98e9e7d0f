"""Broadcast-dimension routing — the TABLE_MAP lookup-join analog.

The reference's only join: every rows-event equi-joins its TableID against
an in-memory map built from TABLE_MAP events; unmatched is a hard error
(/root/reference/reader/reader.go:103-126). Here the dimension is a
broadcast hash join on (lang, host) — no shuffle of the fact side — and
unmatched rows are dead-lettered to the 'error' sink and counted, never
thrown (/root/reference/binlog/event_rows.go:43-59 recover precedent,
softened per SURVEY.md §7 step 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..synth import KNOWN_LANGS, ZH_DARK_HOST_MIN

ERROR_SINK = "error"


def build_routing_dim(spark: SparkSession, n_hosts: int = 99) -> DataFrame:
    """(lang, host) → sink_id dimension (FIXTURES.md §2).

    Built natively (sequence + explode, no Python rows). Deliberate holes:
    - lang 'unknown' absent entirely;
    - (zh, h090..h098) absent — the composite-key unmatched path.
    At 100 TB this stays a few-KB broadcast table reloaded per micro-batch
    (the schema-refresh analog, /root/reference/reader/schema/manager.go:34-42).
    """
    langs = spark.createDataFrame([(l,) for l in KNOWN_LANGS], "lang string")
    hosts = spark.range(n_hosts).select(
        F.format_string("h%03d", F.col("id").cast("int")).alias("host"),
        F.col("id").alias("host_id"),
    )
    dim = langs.crossJoin(hosts).where(
        ~((F.col("lang") == "zh") & (F.col("host_id") >= ZH_DARK_HOST_MIN))
    )
    return dim.select(
        "lang",
        "host",
        F.concat(F.lit("sink_"), F.col("lang")).alias("sink_id"),
        F.concat(F.lit("schema_"), F.col("lang")).alias("schema_id"),
        (F.col("host_id") <= 1).alias("hot"),
    )


def route(events: DataFrame, dim: DataFrame) -> DataFrame:
    """events ⟕ broadcast(dim) on (lang, host) → +sink_id +route_reason.

    Precedence: parse_error beats unmatched_dim (a page that failed to
    frame is an error regardless of its routing keys).
    """
    joined = events.join(
        F.broadcast(dim.select("lang", "host", "sink_id", "schema_id", "hot")),
        on=["lang", "host"],
        how="left",
    )
    is_err = F.col("parse_status") == "error"
    unmatched = F.col("sink_id").isNull()
    return joined.select(
        *events.columns,
        F.when(is_err | unmatched, F.lit(ERROR_SINK)).otherwise(F.col("sink_id")).alias("sink_id"),
        F.when(is_err, F.lit("parse_error"))
        .when(unmatched, F.lit("unmatched_dim"))
        .otherwise(F.lit("ok"))
        .alias("route_reason"),
        F.col("schema_id"),
        F.coalesce(F.col("hot"), F.lit(False)).alias("hot"),
    )
