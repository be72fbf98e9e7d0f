"""Driver-style oracle comparison for a subset of registry queries.

Mimics the round driver's correctness gate: run the Spark query and its
DuckDB oracle SQL side-by-side at sf0.01, sort columns by name, compare
row count, schema width, and exact values. Usage:

    python tools/oracle_check.py dedup_minhash chunk_dedup_fuzzy ...
    python tools/oracle_check.py --all            # every registry query

Exit code 0 iff every requested query matches.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main(argv):
    import duckdb

    import __spark_entry__ as e
    from bocadillo_spark.session import get_spark

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs) if "--all" in argv else [a for a in argv if not a.startswith("-")]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown)
        return 2

    # the repo session factory: same driver-memory/AQE/TZ config the
    # driver-equivalent rehearsal uses (default heap OOMs iterative CC)
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    for name in names:
        sdf = qs[name](spark, SF_DIR)
        srows = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
        if name not in osql:
            print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        rel = con.sql(osql[name])
        drows = _norm(rel.fetchall(), list(rel.columns))
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
    print("all requested queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
