"""Bucketing: pre-shuffling both sides of a recurring join into the same
bucket layout removes the per-query shuffle entirely — the strategy for
repeated large-large joins at 100 TB (SURVEY.md §4 manual-rewrite table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # in-memory catalog supports bucketed saveAsTable with a local warehouse
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse):
    li, o = spark.table("li_b"), spark.table("ord_b")
    joined = (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(joined)
    # co-located buckets: the join itself needs NO Exchange on either side
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    # and the result is still correct
    raw_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw_o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in raw_li.join(raw_o, raw_li.l_orderkey == raw_o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
    assert got == expected
