"""SparkSession factory with scale-aware defaults.

Local sandbox runs on local[N]; the same config block is what we would
ship to a 1000-executor cluster via spark-submit --conf, so every knob
here is chosen for the 100 TB case and merely *also* works locally:

- AQE on (runtime coalesce + skew-join splitting),
- shuffle partitions sized to cores locally (cluster: ~2-3x total cores),
- Arrow enabled (the parse UDF contract: batched, never per-row Python),
- UTC session TZ (oracle comparison: DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bocadillo_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # SPARK_GRAFT_MASTER overrides the local[N] default; the EMPTY string
    # means "don't set a master at all" — required under spark-submit,
    # whose --master would otherwise be silently overridden by the
    # builder's local[N] and run the whole job in the driver JVM with no
    # executors (round-6 review #6: the documented cluster deployment
    # never left the driver).
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        master = f"local[{cores}]"
    builder = SparkSession.builder
    if master:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Exact-count guarantee under retry: no speculative duplicate tasks
        # (SURVEY.md §7 hard part (b)).
        .config("spark.speculation", "false")
        # Stable Python-worker pool: without these, high-concurrency
        # (local[32]) mapInPandas stages showed 2-10x jitter from worker
        # churn/re-fork storms (measured on this box, see BENCH notes).
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.idleTimeoutSeconds", "600")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
