"""Pure-Python scalar reference parser — the byte-truth oracle.

This is the repo's analog of the reference's golden decode vectors
(/root/reference/mysql/decimal_test.go:19-231) and its single-threaded
value-at-a-time decode loop (/root/reference/reader/reader.go:66-143,
/root/reference/binlog/event_rows.go:42-133): one page at a time, one
regex match at a time, operating on raw bytes throughout. The vectorized
Spark parser (operators/parse.py) must reproduce this output
byte-identically per url — that is the north_rule's per-row invariant.

Never throws on malformed input: a page without a <body> yields a single
parse_error row (recover precedent /root/reference/binlog/event_rows.go:43-59).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

MARK = b"\xc2\xa7"

# Event segment: §EVT|{type}|{payload}§  (type lowercase ascii, payload
# never contains the marker lead byte).
EVENT_RE = re.compile(rb"\xc2\xa7EVT\|([a-z]+)\|(.*?)\xc2\xa7", re.DOTALL)
BODY_RE = re.compile(rb"<body>(.*)</body>", re.DOTALL)
META_LANG_RE = re.compile(rb'<meta lang="([a-z]+)"')

PARSE_OK = "ok"
PARSE_ERROR = "error"
ERR_NO_BODY = "no_body"


@dataclass
class ParsedPage:
    meta_lang: str | None
    text_bytes: bytes | None  # body text with event segments removed
    events: list[tuple[int, str, str]] = field(default_factory=list)  # (seq, type, payload)
    parse_status: str = PARSE_OK
    error_msg: str | None = None


def parse_page(html: bytes | None) -> ParsedPage:
    """Scalar parse of one html payload. Bytes in, bytes out — no unicode
    decode of the body (invalid-UTF8 fixtures must round-trip untouched)."""
    if not html:
        return ParsedPage(None, None, [], PARSE_ERROR, ERR_NO_BODY)
    m = BODY_RE.search(html)
    if m is None:
        return ParsedPage(None, None, [], PARSE_ERROR, ERR_NO_BODY)
    body = m.group(1)
    lang_m = META_LANG_RE.search(html)
    meta_lang = lang_m.group(1).decode("ascii") if lang_m else None
    events = [
        (seq, t.decode("ascii"), p.decode("ascii"))
        for seq, (t, p) in enumerate(EVENT_RE.findall(body))
    ]
    text_bytes = EVENT_RE.sub(b"", body)
    return ParsedPage(meta_lang, text_bytes, events, PARSE_OK, None)


def sink_counts(pages: list[dict], dim: dict[tuple[str, str], str]) -> dict:
    """Golden per-sink routed-row counts over scalar-parsed pages
    ({(sink_id, event_type): count}) — the count-equality oracle
    (FIXTURES.md §6). `dim` maps (lang, host) → sink_id."""
    counts: dict[tuple[str, str], int] = {}

    def bump(sink: str, et: str) -> None:
        counts[(sink, et)] = counts.get((sink, et), 0) + 1

    host_re = re.compile(r"https://([^/]+)\.example\.com/")
    for page in pages:
        parsed = parse_page(page["html"])
        host = host_re.match(page["url"]).group(1)
        if parsed.parse_status == PARSE_ERROR:
            bump("error", "parse_error")
            continue
        sink = dim.get((page["lang"], host))
        if not parsed.events:
            # a well-formed page with zero EVT segments still routes one
            # event_type='none' row in both Spark engines (the no_events
            # branch, operators/parse.py:175) — count it here too, or the
            # count-equality oracle diverges on event-less pages (synth
            # never makes one: n_events >= 1; this matters for hand-built
            # and adversarial corpora only)
            bump(sink if sink is not None else "error", "none")
            continue
        for _seq, et, _payload in parsed.events:
            bump(sink if sink is not None else "error", et)
    return counts
