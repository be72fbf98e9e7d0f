#!/usr/bin/env python
"""Per-query measurement harness for the r07 OPTIMIZATION round.

Separate from the FROZEN bench.py (whose methodology the driver re-runs):
this tool times individual registry queries with the same best-of-2 /
fresh-plan / persist-drain protocol as bench.py's timed(), but lets us

  - pick a subset of queries (fast iteration while optimizing),
  - repeat the whole set R times in one session (VM burst-credit noise:
    single pairs are bimodal; min-over-repeats is the stable comparator),
  - dump .explain("formatted") for each query to plans/r07/.

Usage:
  python bench_extra.py q1,q2,...      # time those queries
  python bench_extra.py all            # the full bench.py query list
  SPARK_GRAFT_EXPLAIN_TAG=before python bench_extra.py --explain q1,q2
                                       # write plans/r07/<q>_<tag>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), SPARK_GRAFT_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "q1_pricing_summary", "revenue_by_nation", "dedup_exact",
    "ann_cosine_topk", "latest_event_per_user", "text_stats",
    "doc_fingerprint", "lang_id", "dedup_embedding",
    "gopher_repetition", "decontaminate_ngrams",
    "url_dedup_canonical", "chunk_dedup_c4", "unigram_logprob",
    "boilerplate_removal", "token_entropy", "incremental_dedup",
    "salted_skew_join", "chunk_dedup_fuzzy", "importance_resample",
    "curation_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    tag = os.environ.get("SPARK_GRAFT_EXPLAIN_TAG", "before")
    names = BENCH_QUERIES if (not args or args[0] == "all") else args[0].split(",")

    from bocadillo_spark.session import get_spark
    from bocadillo_spark import queries as Q
    from bocadillo_spark.operators.dedup import persist_drain

    spark = get_spark(app_name="bench_extra", cores=cpus)

    if do_explain:
        os.makedirs("plans/r07", exist_ok=True)
        for name in names:
            persist_drain()
            df = Q.QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(plan)
            print(f"wrote plans/r07/{name}_{tag}.txt", file=sys.stderr)
        persist_drain()
        spark.stop()
        return

    # repeats × (best-of-2 with fresh plans), exactly bench.py's timed()
    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:r{r}")
            best = None
            for _ in range(2):
                persist_drain()
                t0 = time.time()
                Q.QUERIES[name](spark, sf_dir).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            samples[name].append(round(best, 3))
    spark.stop()
    out = {
        "queries_min": {n: min(v) for n, v in samples.items()},
        "queries_samples": samples,
        "sf": sf_dir,
        "cores": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
