"""spark-submit driver script: route-counts over synthesized pages.

Usage:
    spark-submit --py-files bocadillo_spark.zip scripts/run_counts.py [sf_dir]
"""

import sys

from bocadillo_spark.cli import main

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(main(["--mode", "counts", "--sf-dir", sf, "--cores", "8"]))
