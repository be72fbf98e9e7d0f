"""Driver-style oracle comparison for a subset of registry queries.

Mimics the round driver's correctness gate: run the Spark query and its
DuckDB oracle SQL side-by-side at sf0.01, sort columns by name, compare
row count, schema width, and exact values. Usage:

    python tools/oracle_check.py dedup_minhash chunk_dedup_fuzzy ...
    python tools/oracle_check.py --all            # every registry query

Exit code 0 iff every requested query matches — and at least one query
was requested (an empty selection is an error, not a vacuous pass).
Normalization is shared with scripts/dress_rehearsal.py via
tools/compare_core.py so the two gate mirrors cannot drift.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.compare_core import SF_DIR, register_views, rowset


def main(argv):
    import duckdb

    import __spark_entry__ as e
    from bocadillo_spark.session import get_spark

    qs, osql = e.queries(), e.oracle_sql()
    flags = [a for a in argv if a.startswith("-")]
    bad_flags = [f for f in flags if f != "--all"]
    if bad_flags:
        print("unknown flags:", bad_flags, "(did you mean --all?)")
        return 2
    names = list(qs) if "--all" in flags else [a for a in argv if not a.startswith("-")]
    if not names:
        # round-6 review #5: zero comparisons must not exit 0 with a
        # success message — a typo'd invocation would read as green
        print("no queries requested — pass names or --all")
        return 2
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown)
        return 2

    # the repo session factory: same driver-memory/AQE/TZ config the
    # driver-equivalent rehearsal uses (default heap OOMs iterative CC)
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    register_views(con)

    failures = []
    for name in names:
        sdf = qs[name](spark, SF_DIR)
        srows = rowset(sdf.columns, [tuple(r) for r in sdf.collect()])
        if name not in osql:
            print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        rel = con.sql(osql[name])
        drows = rowset(list(rel.columns), rel.fetchall())
        ok = srows == drows
        status = "OK" if ok else "MISMATCH"
        print(f"{name}: {status} (spark {len(srows)} rows, duckdb {len(drows)} rows)")
        if not ok:
            failures.append(name)
            for i, (s, d) in enumerate(zip(srows, drows)):
                if s != d:
                    print("  first diff row", i, "spark", s, "duckdb", d)
                    break
            if len(srows) != len(drows):
                only_s = set(srows) - set(drows)
                only_d = set(drows) - set(srows)
                print("  spark-only sample:", list(only_s)[:3])
                print("  duckdb-only sample:", list(only_d)[:3])
    spark.stop()
    if failures:
        print("FAILED:", failures)
        return 1
    print(f"all {len(names)} requested queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
