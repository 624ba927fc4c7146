"""The north-rule delivery mechanism: the job ships via ``spark-submit
--py-files iresearch_spark.zip`` and executors import the package from the
shipped zip (no repo on their PYTHONPATH)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_submit_job_via_py_files(tmp_path):
    sys.path.insert(0, REPO)
    from iresearch_spark.session import package_zip

    zip_path = package_zip()
    corpus = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(corpus):
        pytest.skip("driver testdata not present")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "examples", "submit_job.py"),
            corpus,
            str(tmp_path / "idx"),
            "scan",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith('{"query"')]
    assert len(lines) == 1
    res = json.loads(lines[0])
    assert res["query"] == "scan" and len(res["top"]) == 10
    assert all(s > 0 for _, s in res["top"])
