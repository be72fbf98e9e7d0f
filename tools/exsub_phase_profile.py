"""One-shot phase profile for exact_substring_dedup at two core counts.

Follows the pinned phase-profile recipe (BENCH/scaling_history.json
protocol notes; memory: minhash-scaling-protocol): time cumulative
stage prefixes on the SAME session so the persisted window frame is
shared exactly like the real run, at local[1] and local[4], to
localize any non-scaling stage before seeding the exsub_pairs series.
Stages:
  A  kernel+explode -> persist -> count      (window-hash kernel)
  B  duplicate-window agg count (reads cached wh)
  C  cuts (join + groupBy doc_id) count
  D  full operator (md5 reassembly) forced by sum/max agg
Run: python tools/exsub_phase_profile.py [replicas]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import exsub_input_path, cpu_probe_mops  # noqa: E402
from bocadillo_spark.session import get_spark  # noqa: E402


def profile(cores: int, path: str) -> dict:
    from pyspark.sql import functions as F

    from bocadillo_spark.operators.cleanops import (
        EXSUB_K,
        exact_substring_dedup,
        window_hashes_pandas,
    )
    from bocadillo_spark.operators.dedup import persist_drain, persist_evicting

    spark = get_spark(
        app_name=f"exsub_profile_{cores}",
        cores=cores,
        shuffle_partitions=max(cores, 16),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    out = {"cores": cores, "probe_mops": cpu_probe_mops()}
    try:
        docs = spark.read.parquet(path)
        k = EXSUB_K

        t0 = time.time()
        wh = persist_evicting(
            docs.select(
                "doc_id",
                F.posexplode(window_hashes_pandas(k)(F.col("text"))).alias(
                    "pos", "wh"
                ),
            )
        )
        n_wh = wh.count()
        out["A_kernel_sec"] = round(time.time() - t0, 2)
        out["n_windows"] = n_wh

        t0 = time.time()
        agg = wh.groupBy("wh").agg(
            F.min(F.struct("doc_id", "pos")).alias("canon"),
            F.count(F.lit(1)).alias("cnt"),
        )
        n_dup = agg.where(F.col("cnt") > 1).count()
        out["B_agg_sec"] = round(time.time() - t0, 2)
        out["n_dup_windows"] = n_dup

        t0 = time.time()
        dups = (
            wh.join(agg.where(F.col("cnt") > 1), "wh")
            .where(
                ~(
                    (F.col("doc_id") == F.col("canon.doc_id"))
                    & (F.col("pos") == F.col("canon.pos"))
                )
            )
            .select("doc_id", "pos")
        )
        n_cut_docs = dups.groupBy("doc_id").count().count()
        out["C_cuts_sec"] = round(time.time() - t0, 2)
        out["n_cut_docs"] = n_cut_docs
        persist_drain()

        # D: the real operator end-to-end on a fresh plan (kernel reruns;
        # persisted internally exactly as in the bench run)
        t0 = time.time()
        row = (
            exact_substring_dedup(docs)
            .agg(F.sum("n_cut").alias("cut"), F.max("clean_md5").alias("m"))
            .collect()[0]
        )
        out["D_full_sec"] = round(time.time() - t0, 2)
        out["total_cut"] = row["cut"]
        persist_drain()
    finally:
        spark.stop()
    return out


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    spark = get_spark(app_name="exsub_profile_build", cores=8)
    path = exsub_input_path(spark, "/root/testdata/sf0.1", replicas=replicas)
    n = spark.read.parquet(path).count()
    spark.stop()
    print(json.dumps({"corpus": path, "n_docs": n}))
    for cores in (4, 1):
        print(json.dumps(profile(cores, path)), flush=True)


if __name__ == "__main__":
    main()
