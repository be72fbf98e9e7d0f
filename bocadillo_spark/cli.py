"""CLI entry point.

Local: python -m bocadillo_spark.cli --mode counts --sf-dir ...

Cluster (the north_rule deployment shape — spark-submit takes a SCRIPT
path, not -m; scripts/run_counts.py is the launcher pattern, exercised
end-to-end by tests/test_spark_submit.py):

    SPARK_GRAFT_MASTER="" spark-submit --master yarn \
        --py-files bocadillo_spark.zip scripts/run_counts.py ...

The empty SPARK_GRAFT_MASTER defers the master to spark-submit's
--master; without it session.get_spark pins local[N], which would
override the submit-time master and run everything in the driver JVM
(round-6 review #6).

In batch mode prints the per-sink counts and writes the fan-out + manifest;
in stream mode runs the checkpointed foreachBatch pipeline to completion of
currently-available files (availableNow trigger).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bocadillo_spark")
    p.add_argument("--mode", choices=["batch", "stream", "counts"], default="counts")
    p.add_argument("--pages", help="pages parquet path; default: synthesize from --sf-dir")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", help="fan-out output dir (batch/stream modes)")
    p.add_argument("--checkpoint", help="checkpoint dir (stream mode)")
    p.add_argument("--cores", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .session import get_spark

    spark = get_spark(app_name=f"bocadillo_{args.mode}", cores=args.cores)
    try:
        if args.mode == "stream":
            if not (args.pages and args.out and args.checkpoint):
                raise SystemExit("stream mode needs --pages --out --checkpoint")
            from .streaming.stream import run_stream_to_completion

            run_stream_to_completion(spark, args.pages, args.out, args.checkpoint)
            from .plans.sinks import read_manifests

            print(json.dumps({"batches": len(read_manifests(args.out))}))
            return 0

        from .plans.pipeline import pages_from_parquet, pages_from_sf, routed_events

        pages = (
            pages_from_parquet(spark, args.pages)
            if args.pages
            else pages_from_sf(spark, args.sf_dir)
        )
        routed = routed_events(spark, pages)
        if args.mode == "batch":
            if not args.out:
                raise SystemExit("batch mode needs --out")
            from .plans.sinks import write_fanout

            manifest = write_fanout(routed, args.out, batch_id=0)
            print(json.dumps({"total": manifest["total"]}))
            return 0

        from .operators.aggregate import sink_counts

        rows = sink_counts(routed).collect()
        counts = {f"{r['sink_id']}/{r['event_type']}": r["n"] for r in rows}
        print(json.dumps({"sink_counts": counts, "total": sum(counts.values())}, sort_keys=True))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
