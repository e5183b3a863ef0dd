"""North-star deployment shape: `spark-submit --py-files` on a REAL
multi-executor cluster (local-cluster → separate executor JVMs). The
engine must reach the executors ONLY through the built zip — the job and
zip are copied to a neutral directory so nothing resolves from the repo
checkout by accident."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark


def test_spark_submit_pyfiles_multi_executor(spark, tmp_path):
    import pandas as pd

    from pysemantic_spark.fixtures import transcripts_pdf

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # build the zip fresh so the test covers today's code
    out_zip = str(tmp_path / "pysemantic_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "build_pyfiles.py"), out_zip],
        check=True,
        capture_output=True,
    )
    table = str(tmp_path / "transcripts.parquet")
    spark.createDataFrame(transcripts_pdf(3_000)).write.parquet(table)

    workdir = tmp_path / "neutral"
    workdir.mkdir()
    shutil.copy(os.path.join(repo, "tools", "submit_job.py"), workdir)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    proc = subprocess.run(
        [
            submit,
            "--master", "local-cluster[2,1,1536]",
            "--conf", "spark.executor.memory=1536m",
            "--conf", "spark.driver.host=127.0.0.1",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--py-files", out_zip,
            "submit_job.py", table, str(tmp_path / "viol"),
        ],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=480,
        env={**os.environ, "SPARK_DRIVER_MEMORY": "2g"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["n_rows"] == len(transcripts_pdf(3_000))
    assert out["executors"] == "local-cluster[2,1,1536]"
    # the suite found real violations through the zip-shipped engine
    assert out["check_counts"]["referential:tool"] > 0
    assert (tmp_path / "viol").exists()
