"""Event-time windowed aggregation with watermark (streaming) must agree
with the batch window query, and observe() metrics reconcile with counts."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bocadillo_spark.plans.pipeline import routed_events_observed
from bocadillo_spark.synth import synth_pages


def test_streaming_windowed_counts_match_batch(spark, sf_dir):
    ev_path = f"{sf_dir}/events.parquet"
    batch = spark.read.parquet(ev_path).withColumn(
        "ts", F.col("ts").cast("timestamp")  # NTZ → LTZ (UTC session): watermark needs TIMESTAMP
    )
    expected = {
        (str(r["ws"]), r["event_type"]): r["n"]
        for r in batch.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
        .collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        # file stream source requires a directory; re-shard the table into one
        spark.read.parquet(ev_path).repartition(4).write.parquet(f"{tmp}/events")
        stream = (
            spark.readStream.schema(spark.read.parquet(ev_path).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        ckpt = f"{tmp}/ckpt"
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName("win_counts")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        (str(r["ws"]), r["event_type"]): r["n"]
        for r in spark.sql(
            "SELECT window.start AS ws, event_type, n FROM win_counts"
        ).collect()
    }
    assert got == expected


def test_observe_metrics_reconcile(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    routed, obs = routed_events_observed(spark, pages)
    by_reason = {
        r["route_reason"]: r["n"]
        for r in routed.groupBy("route_reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    m = obs.get
    assert m["n_rows"] == sum(by_reason.values())
    assert m["n_ok"] == by_reason.get("ok", 0)
    assert m["n_parse_error"] == by_reason.get("parse_error", 0)
    assert m["n_unmatched"] == by_reason.get("unmatched_dim", 0)
    assert m["n_parse_error"] > 0 and m["n_unmatched"] > 0  # fixtures fired
