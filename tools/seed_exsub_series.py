"""Seed the exsub_pairs scaling series with the exact bench.py protocol
(same corpus builder, same run fn, same scaling_pairs persistence), so
the per-round driver run appends to an already-estimated series.
Run: python tools/seed_exsub_series.py [pairs]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    EXSUB_PAIRS_PROTOCOL,
    EXSUB_SCALING_REPLICAS,
    exsub_input_path,
    run_exsub_once,
    scaling_pairs,
)
from bocadillo_spark.session import get_spark  # noqa: E402


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="exsub_seed_build", cores=8)
    path = exsub_input_path(
        spark, "/root/testdata/sf0.1", replicas=EXSUB_SCALING_REPLICAS
    )
    n = spark.read.parquet(path).count()
    spark.stop()
    print(json.dumps({"corpus": path, "n_docs": n}), flush=True)
    res = scaling_pairs(
        lambda s, p=path: run_exsub_once(s, p),
        series="exsub_pairs",
        protocol=EXSUB_PAIRS_PROTOCOL,
        pairs=pairs,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
