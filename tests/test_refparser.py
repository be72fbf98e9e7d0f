"""Unit tests for the scalar oracle parser — the golden-vector layer
(analog of /root/reference/mysql/decimal_test.go:19-231)."""

from __future__ import annotations

from bocadillo_spark import refparser as rp
from bocadillo_spark import synth


def test_parse_simple_page():
    html = synth.build_html(1, "hello world", "en")
    p = rp.parse_page(html)
    assert p.parse_status == rp.PARSE_OK
    assert p.meta_lang == "en"
    assert p.text_bytes == b"hello world"
    assert p.events == [(0, "update", "k1=1;k2=0;old=31;new=38"), (1, "delete", "k1=1;k2=1")]


def test_parse_empty_html():
    p = rp.parse_page(b"")
    assert p.parse_status == rp.PARSE_ERROR
    assert p.error_msg == rp.ERR_NO_BODY
    assert rp.parse_page(None).parse_status == rp.PARSE_ERROR


def test_parse_no_body():
    p = rp.parse_page(b"<html><head></head>garbage")
    assert p.parse_status == rp.PARSE_ERROR


def test_invalid_utf8_roundtrip():
    doc_id = synth.INVALID_UTF8_REM  # 11 → invalid-bytes fixture
    assert synth.has_invalid_utf8(doc_id)
    html = synth.build_html(doc_id, "abcdefghijKLMNOP", "fr")
    p = rp.parse_page(html)
    assert p.text_bytes == b"abcdefghij" + synth.INVALID_BYTES + b"KLMNOP"
    assert synth.INVALID_BYTES in p.text_bytes  # raw bytes untouched


def test_unknown_lang_fixture():
    assert synth.lang_of(0, "en") == "unknown"
    assert synth.lang_of(1, "en") == "en"
    html = synth.build_html(37, "x", "de")
    assert rp.parse_page(html).meta_lang == "unknown"


def test_synth_determinism():
    a = synth.build_html(123, "some words here", "es")
    b = synth.build_html(123, "some words here", "es")
    assert a == b
    assert synth.synth_page_row(5, "t", "en", "src1") == synth.synth_page_row(5, "t", "en", "src1")


def test_large_doc_roundtrip():
    # >64 KB body (blob boundary precedent /root/reference/tests/type_blob_test.go:11-31)
    big = "word " * 20000
    p = rp.parse_page(synth.build_html(2, big, "en"))
    assert p.parse_status == rp.PARSE_OK
    assert p.text_bytes == big.encode()
    assert len(p.text_bytes) > 65535


def test_sink_counts_oracle():
    pages = [
        synth.synth_page_row(i, f"text {i}", lang, "src0")
        for i, lang in enumerate(["en", "de", "fr", "es", "zh"] * 4)
    ]
    dim = {(l, f"h{h:03d}"): f"sink_{l}" for l in synth.KNOWN_LANGS for h in range(99)}
    counts = rp.sink_counts(pages, dim)
    assert sum(counts.values()) == sum(
        1 if synth.is_empty_html(i) else synth.n_events_of(i) for i in range(20)
    )
    # doc_id 0 → lang unknown → error sink
    assert any(k[0] == "error" for k in counts)


def test_sink_counts_zero_event_page():
    """A well-formed page with zero EVT segments routes one 'none' row —
    the Spark engines' no_events branch; the scalar oracle must count it
    identically (r06 review: it used to skip such pages entirely)."""
    dim = {("en", "h000"): "sink_en"}
    pages = [
        {
            "url": "https://h000.example.com/src0/1",
            "lang": "en",
            "html": b'<html><head><meta lang="en"></head><body>plain text</body></html>',
        },
        {
            # dim hole → the 'none' row dead-letters like any other event
            "url": "https://h001.example.com/src0/2",
            "lang": "de",
            "html": b"<body>also eventless</body>",
        },
    ]
    counts = rp.sink_counts(pages, dim)
    assert counts == {("sink_en", "none"): 1, ("error", "none"): 1}
