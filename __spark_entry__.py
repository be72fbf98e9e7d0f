"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship parse→route→aggregate counts at sf0.001.
queries()     — every implemented operator (bocadillo_spark.queries registry).
oracle_sql()  — DuckDB-equivalent SQL per query (column names aligned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bocadillo_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: synthesize pages from sf0.001 documents, run the
    vectorized parse → broadcast route → per-sink aggregate counts."""
    return Q.QUERIES["route_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
