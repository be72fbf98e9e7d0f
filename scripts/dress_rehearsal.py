"""Mirror the driver's correctness gate: run the first-50 window (or all
queries with --all) on Spark at sf0.01 and compare rows/schema/values
against the DuckDB oracles. Usage: python scripts/dress_rehearsal.py [--all]

Normalization is shared with tools/oracle_check.py via
tools/compare_core.py so the two gate mirrors cannot drift."""
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402
from tools.compare_core import SF_DIR, register_views, rowset  # noqa: E402


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             # provision like bocadillo_spark.session.get_spark — the bare
             # 1g default OOMs a 94-query single-session marathon
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    con = duckdb.connect()
    register_views(con)
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = list(qs) if "--all" in sys.argv else list(qs)[:50]
    t0 = time.time()
    fails = []
    for i, name in enumerate(names):
        try:
            df = qs[name](spark, SF_DIR)
            srows = df.collect()
            scols = df.columns
            rel = con.sql(osql[name])
            drows = rel.fetchall()
            dcols = [d[0] for d in rel.description]
            ok_rows = len(srows) == len(drows)
            ok_schema = sorted(scols) == sorted(dcols)
            ok_vals = rowset(scols, srows) == rowset(dcols, drows)
            status = "PASS" if (ok_rows and ok_schema and ok_vals) else "FAIL"
            if status == "FAIL":
                fails.append((name, ok_rows, ok_schema, ok_vals))
            print(f"[{i+1}/{len(names)}] {name}: {status} ({len(srows)} rows)")
        except Exception as e:
            fails.append((name, "ERR", str(e)[:200]))
            print(f"[{i+1}/{len(names)}] {name}: ERROR {str(e)[:200]}")
    print(f"\n{len(names)-len(fails)}/{len(names)} pass in {time.time()-t0:.0f}s")
    for f in fails:
        print("FAIL:", f)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
