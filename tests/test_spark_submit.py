"""The north_rule deployment shape: package the library, ship it with
spark-submit --py-files, run the pipeline from a clean driver process."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = str(Path(pyspark.__file__).parent / "bin" / "spark-submit")
    zip_path = tmp_path / "bocadillo_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in (REPO / "bocadillo_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))

    proc = subprocess.run(
        [spark_submit, "--py-files", str(zip_path), str(REPO / "scripts/run_counts.py")],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must provide the package
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    payload = next(
        (l for l in proc.stdout.splitlines() if l.startswith('{"sink_counts"')), None
    )
    assert payload, proc.stdout[-2000:]
    result = json.loads(payload)
    assert result["total"] == 1490  # sf0.001 golden total
    assert result["sink_counts"]["error/parse_error"] == 5
