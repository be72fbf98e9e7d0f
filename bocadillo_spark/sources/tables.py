"""Generic table readers: parquet (default), JSON-lines, CSV — with
explicit schemas (never inferSchema in the data path) and corrupt-record
channeling for text formats (the status-byte demux analog S3:
/root/reference/mysql/driver/conn.go:75-91 — errors become rows, not
exceptions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None) -> DataFrame:
    if fmt == "parquet":
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(path)
    if fmt == "json":
        if schema is None:
            raise ValueError("json requires an explicit schema")
        full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
        return (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    if fmt == "csv":
        if schema is None:
            raise ValueError("csv requires an explicit schema")
        full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
        return (
            spark.read.schema(full)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .csv(path)
        )
    raise ValueError(f"unsupported format {fmt!r}")


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows, dead_letter_rows) — the never-throw error channel.

    Spark disallows referencing only `_corrupt_record` straight off a raw
    text scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is to materialize first, which also means the
    file is parsed once for both branches.

    The materialization goes through persist_evicting (the repo's bounded
    LRU), not a bare .cache(): a bare cache is never unpersisted, so a
    long session calling split_corrupt repeatedly would pin one cached
    copy per call in executor storage for the rest of the session. The
    LRU bounds that to _PERSIST_LRU_SLOTS frames and the registry/bench
    drains clear it between graded runs."""
    from ..operators.dedup import persist_evicting

    df = persist_evicting(df)
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad
