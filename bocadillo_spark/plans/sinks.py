"""Fan-out sinks + per-partition lineage manifests.

Routing fan-out (S6 analog, /root/reference/cmd/main.go:41-73) lands each
event in its sink's directory via ONE partitioned write — not one job per
sink — so the 100 TB case stays a single pass. Idempotency under replay
(safepoint analog T2, /root/reference/reader/enhanced_reader.go:129-136):
each micro-batch writes to its own batch_id=N subtree with overwrite, so a
re-run of a batch after crash replaces rather than duplicates.

Manifests are the lineage record the north_rule asks for: one row per
output partition with (partition_id, first_url, last_url, count), plus
per-sink counts for reconciliation, written as JSON next to the data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FANOUT_PARTITIONS = 32  # files per batch bounded; hot sinks split by salt


def _spread(routed: DataFrame, n: int = FANOUT_PARTITIONS) -> DataFrame:
    # sink_id alone would put 60%+ of rows in two tasks (Zipf hosts);
    # salt splits hot sinks while keeping sink files clustered.
    return routed.repartition(
        n, F.col("sink_id"), F.pmod(F.hash(F.col("url")), F.lit(8))
    )


def write_fanout(routed: DataFrame, out_dir: str, batch_id: int = 0) -> dict:
    """Write one (micro-)batch fan-out + manifest. Returns the manifest.

    The pipeline executes ONCE (the write); lineage and reconciliation
    counts come from a single cheap read-back pass over the just-written
    files (url + partition columns only — parquet column pruning makes
    this a tiny scan). Lineage is file-granular: files are the unit of
    recovery/commit, the honest analog of the reference's (file, offset)
    position (/root/reference/binlog/event_rotate.go:7-10)."""
    data_dir = os.path.join(out_dir, "data", f"batch_id={batch_id}")
    spark = routed.sparkSession
    (
        _spread(routed).write.mode("overwrite")
        .partitionBy("sink_id", "event_type")
        .parquet(data_dir)
    )

    written = spark.read.parquet(data_dir).select(
        F.input_file_name().alias("file"), "url", "sink_id", "event_type"
    )
    per_file = (
        written.groupBy("file", "sink_id", "event_type")
        .agg(
            F.min("url").alias("first_url"),
            F.max("url").alias("last_url"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    counts: dict[str, int] = {}
    files = []
    for r in per_file:
        key = f"{r['sink_id']}/{r['event_type']}"
        counts[key] = counts.get(key, 0) + r["n"]
        files.append(
            {
                "file": r["file"].rsplit("/batch_id=", 1)[-1],
                "sink": key,
                "first_url": r["first_url"],
                "last_url": r["last_url"],
                "n": r["n"],
            }
        )
    manifest = {
        "batch_id": batch_id,
        "files": sorted(files, key=lambda f: f["file"]),
        "sink_counts": counts,
        "total": int(sum(counts.values())),
    }
    mdir = os.path.join(out_dir, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".batch_{batch_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(mdir, f"batch_{batch_id}.json"))  # atomic commit
    return manifest


def read_sink_counts(spark, out_dir: str) -> DataFrame:
    """Reconciliation read-back over every committed batch."""
    data = os.path.join(out_dir, "data")
    df = spark.read.option("basePath", data).parquet(data)
    return df.groupBy("sink_id", "event_type").agg(F.count(F.lit(1)).alias("n"))


def read_manifests(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("batch_") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out
