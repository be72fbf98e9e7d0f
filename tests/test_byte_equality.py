"""The north_rule per-row invariant: the vectorized Spark parse must
reproduce the scalar reference parser's extracted bytes exactly, per url —
including the invalid-UTF8 and empty-html fixtures. Analog of the
reference's insert→decode→compare round-trip
(/root/reference/tests/suite_test.go:190-279)."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from bocadillo_spark import refparser as rp
from bocadillo_spark import synth
from bocadillo_spark.operators.parse import (
    parse_events,
    parse_events_native,
    parse_events_pandas,
    with_attrs,
    with_host,
)
from bocadillo_spark.operators.route import build_routing_dim, route
from bocadillo_spark.synth import synth_pages


def _collect_parsed(spark, sf_dir, engine="native"):
    pages = synth_pages(spark, sf_dir)
    return pages, parse_events(with_host(pages), engine=engine)


def test_native_equals_pandas_rowset(spark, sf_dir):
    """The JVM-native parse and the Arrow/pandas parse are interchangeable:
    identical row multisets, bytes included."""
    pages = with_host(synth_pages(spark, sf_dir))

    def norm(df):
        return sorted(
            tuple(bytes(x) if isinstance(x, (bytes, bytearray)) else x for x in r)
            for r in df.collect()
        )

    assert norm(parse_events_native(pages)) == norm(parse_events_pandas(pages))


@pytest.mark.parametrize("engine", ["native", "pandas"])
def test_text_bytes_identical_per_url(spark, sf_dir, engine):
    pages, parsed = _collect_parsed(spark, sf_dir, engine)
    got = {
        r["url"]: r["text_bytes"]
        for r in parsed.filter(
            (F.col("parse_status") == "ok") & (F.col("seq") == 0)
        ).select("url", "text_bytes").collect()
    }
    page_rows = pages.select("url", "html").collect()
    n_ok = 0
    for r in page_rows:
        ref = rp.parse_page(r["html"])
        if ref.parse_status == rp.PARSE_ERROR:
            assert r["url"] not in got
            continue
        assert got[r["url"]] == ref.text_bytes, f"byte mismatch at {r['url']}"
        n_ok += 1
    assert n_ok > 400  # sf0.001 has 500 docs, ~5 empty-html


def test_events_identical_per_url(spark, sf_dir):
    pages, parsed = _collect_parsed(spark, sf_dir)
    got: dict[str, list] = {}
    for r in parsed.filter(F.col("parse_status") == "ok").select(
        "url", "seq", "event_type", "payload"
    ).collect():
        got.setdefault(r["url"], []).append((r["seq"], r["event_type"], r["payload"]))
    for r in pages.select("url", "html").collect():
        ref = rp.parse_page(r["html"])
        if ref.parse_status == rp.PARSE_OK:
            assert sorted(got[r["url"]]) == ref.events, f"event mismatch at {r['url']}"


def test_invalid_utf8_fixture_survives_spark(spark, sf_dir):
    _, parsed = _collect_parsed(spark, sf_dir)
    bad = with_attrs(parsed.filter((F.col("seq") == 0) & (F.col("parse_status") == "ok")))
    bad = bad.filter(
        F.col("attrs")["k1"].cast("long") % synth.INVALID_UTF8_MOD
        == synth.INVALID_UTF8_REM
    ).select("text_bytes").collect()
    assert len(bad) > 0
    for r in bad:
        assert synth.INVALID_BYTES in r["text_bytes"]


def test_count_equality_vs_scalar_oracle(spark, sf_dir):
    """Per-sink routed-row counts: Spark pipeline == pure-Python oracle."""
    pages, parsed = _collect_parsed(spark, sf_dir)
    dim_rows = build_routing_dim(spark).collect()
    dim = {(r["lang"], r["host"]): r["sink_id"] for r in dim_rows}
    golden = rp.sink_counts([r.asDict() for r in pages.collect()], dim)

    routed = route(parsed, build_routing_dim(spark))
    got = {
        (r["sink_id"], r["event_type"]): r["n"]
        for r in routed.groupBy("sink_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == golden
