"""Mirror the driver's correctness gate: run the first-50 window (or all
queries with --all) on Spark at sf0.01 and compare rows/schema/values
against the DuckDB oracles. Usage: python scripts/dress_rehearsal.py [--all]"""
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in idx) for r in rows)


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
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
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
