"""Skew handling, both halves of the story:

- skewed JOINs: AQE splits oversized partitions at runtime (built-in —
  SURVEY.md §4: AQE covers joins, not groupBy keys);
- skewed AGGREGATIONS: manual salting (operators/aggregate.py), equality
  asserted against the unsalted plan via the oracle suite.

This test pins the AQE half with a synthetic 90%-hot-key join. It uses the
shared session with set/restore of runtime SQL confs — building a second
session in local mode silently reuses (and on teardown would stop) the one
SparkContext.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONF = {
    # make AQE's skew detector fire on a small fixture
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
}


@pytest.fixture()
def skew_spark(spark):
    saved = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(skew_spark):
    spark = skew_spark
    n = 200_000
    # fact: 90% of rows share key 0 (the hot host), payload pads bytes
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000).alias("k"),
        F.concat(F.lit("p" * 64), F.col("id")).alias("pad"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("d" * 64), F.col("id")).alias("dpad")
    )

    # correctness (separate consumer: a groupBy on k pins the join's
    # partitioning, which blocks the skew split unless forced)
    agg = fact.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    rows = {r["k"]: r["cnt"] for r in agg.collect()}
    assert rows[0] == sum(1 for i in range(n) if i % 10 < 9)

    # skew split: a consumer with no partitioning requirement lets AQE
    # split the hot partition into advisory-sized chunks
    summed = (
        fact.join(dim, "k").select(F.length("pad").alias("l")).agg(F.sum("l").alias("s"))
    )
    assert summed.collect()[0]["s"] > 0
    final_plan = summed._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]


def test_two_pass_global_rank_equals_window(spark, sf_dir):
    """The scale-safe two-pass global rank (range repartition + offsets +
    local row_number) must equal Spark's own unpartitioned-window
    row_number exactly — same total ordering, no single-task stage."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bocadillo_spark.operators.aggregate import global_rank_two_pass

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    totals = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total")
    )
    ranked, n = global_rank_two_pass(totals, ["total", "user_id"], n_parts=7)
    got = {r["user_id"]: r["rank"] for r in ranked.collect()}
    w = W.orderBy(F.asc("total"), F.asc("user_id"))
    want = {
        r["user_id"]: r["rn"]
        for r in totals.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert n == len(want) and got == want


def test_salted_join_equals_plain_join_and_stays_shuffled(spark, sf_dir):
    """Salting must be a pure physical redistribution: row-identical to
    the plain join, and the plan must actually BE a shuffle join (a
    broadcast would bypass the salt — the operator exists for the case
    where broadcast is impossible)."""
    from pyspark.sql import functions as F

    from bocadillo_spark.operators.skew import salted_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    skey = F.when(F.col("event_type") == "click", F.lit("HOT")).otherwise(
        F.col("user_id").cast("string")
    )
    fact = ev.select("event_id", skey.alias("skey"))
    dim = fact.select("skey").distinct().withColumn(
        "attr", F.md5(F.encode(F.col("skey"), "UTF-8"))
    )
    salted = salted_join(fact, dim, "skey", salt_src=F.col("event_id"))
    plain = fact.join(dim, "skey")

    plan = salted._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan

    a = sorted(tuple(r) for r in salted.select("skey", "event_id", "attr").collect())
    b = sorted(tuple(r) for r in plain.select("skey", "event_id", "attr").collect())
    assert a == b and len(a) == ev.count()
    # the hot key is really hot: ~25% of fact rows share it
    hot = sum(1 for r in a if r[0] == "HOT")
    assert hot > len(a) // 10


def test_salted_join_rejects_dim_multiplying_join_types(spark, sf_dir):
    """Outer types that preserve unmatched dim rows would emit them once
    per salt replica — salted_join must refuse rather than silently
    return n_salt-duplicated rows."""
    import pytest
    from pyspark.sql import functions as F

    from bocadillo_spark.operators.skew import salted_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(10)
    fact = ev.select("event_id", F.col("user_id").cast("string").alias("skey"))
    dim = fact.select("skey").distinct()
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, dim, "skey", salt_src=F.col("event_id"), how=how)


def test_salted_join_preserves_caller_salt_column(spark):
    """A caller column named __salt must survive the salted join untouched
    (the helper probes for a collision-free temp name instead of
    overwriting)."""
    from pyspark.sql import functions as F

    from bocadillo_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10, 99), (2, 20, 98)], "k long, v long, __salt long"
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k long, d string")
    out = salted_join(fact, dim, "k", F.col("v")).orderBy("k").collect()
    assert [(r["k"], r["__salt"], r["d"]) for r in out] == [(1, 99, "a"), (2, 98, "b")]
