"""Source formats: JSON-lines / CSV round-trip with explicit schemas and
the corrupt-record dead-letter channel (S3 demux analog)."""

from __future__ import annotations

from pyspark.sql import types as T

from bocadillo_spark.sources.tables import read_table, split_corrupt

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_json_roundtrip_and_dead_letter(spark, tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 1.5}\n'
        '{"id": 2, "name": "b", "score": -2.25}\n'
        "this is not json at all\n"
        '{"id": "not_a_number", "name": "c", "score": 0}\n'
    )
    df = read_table(spark, str(p), fmt="json", schema=SCHEMA)
    good, bad = split_corrupt(df)
    g = {r["id"]: (r["name"], r["score"]) for r in good.collect()}
    assert g == {1: ("a", 1.5), 2: ("b", -2.25)}
    assert bad.count() == 2  # malformed line + type-violating record


def test_csv_roundtrip_and_dead_letter(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,name,score\n1,a,1.5\n2,b,oops\n3,c,3.0\n")
    df = read_table(spark, str(p), fmt="csv", schema=SCHEMA)
    good, bad = split_corrupt(df)
    g = {r["id"]: r["score"] for r in good.collect()}
    assert g == {1: 1.5, 3: 3.0}
    assert bad.count() == 1


def test_parquet_reader_respects_schema(spark, sf_dir):
    df = read_table(spark, f"{sf_dir}/events.parquet")
    assert {"event_id", "ts", "user_id"}.issubset(set(df.columns))


def test_stream_workspace_gc_reaps_stale_roots(spark, sf_dir):
    """Stale same-SF workspace roots (old tag => unreachable forever) and
    legacy un-prefixed roots are GC'd on entry; the live root survives."""
    import os
    import tempfile

    from bocadillo_spark import queries as Q

    tmp = tempfile.gettempdir()
    sf_base = os.path.basename(sf_dir.rstrip("/"))
    stale = os.path.join(tmp, f"bocadillo_stream_q_{sf_base}_deadbeefdead")
    legacy = os.path.join(tmp, "bocadillo_stream_q_0123456789ab")
    other_sf = os.path.join(tmp, "bocadillo_stream_q_sfother_aaaabbbbcccc")
    for d in (stale, legacy, other_sf):
        os.makedirs(d, exist_ok=True)
    try:
        pages_dir, root = Q._stream_workspace(spark, sf_dir)
        assert os.path.exists(os.path.join(pages_dir, "_SUCCESS"))
        assert not os.path.exists(stale), "same-SF stale tag must be reaped"
        assert not os.path.exists(legacy), "legacy root must be reaped"
        assert os.path.exists(other_sf), "other SFs' roots are not ours to reap"
        # idempotent: a second call keeps the live root
        pages2, root2 = Q._stream_workspace(spark, sf_dir)
        assert (pages2, root2) == (pages_dir, root) and os.path.exists(pages_dir)
    finally:
        import shutil

        shutil.rmtree(other_sf, ignore_errors=True)
