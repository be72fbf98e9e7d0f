"""bocadillo_spark — a PySpark-native parse → enrich → route → aggregate engine.

A from-scratch rebuild of the *capabilities* of localhots/bocadillo
(a MySQL binlog event decoder, see /root/reference) re-expressed as an
idiomatic Spark dataflow over Common-Crawl-style web pages:

    header framing          → cheap native-column projection (url, lang, host)
    event-type dispatch     → vectorized pandas-UDF parse of html:binary
    TABLE_MAP lookup join   → broadcast dimension join (lang, host) → sink
    row materialization     → typed event rows (explode + str_to_map)
    position/safepoint      → Structured Streaming checkpoints + manifests
    (no aggregation in ref) → per-sink routed-row counts (north_rule)

Reference parity notes cite /root/reference file:line in each module.
"""

__version__ = "0.1.0"
