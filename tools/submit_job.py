"""Cluster-deploy smoke job for `spark-submit --py-files`.

    python tools/build_pyfiles.py
    spark-submit --master 'local-cluster[2,2,2048]' \
        --conf spark.executor.memory=2g \
        --py-files dist/pysemantic_spark.zip \
        tools/submit_job.py <table.parquet> <out_dir>

Validates the transcripts table with the full trait-spec suite on a REAL
multi-executor cluster (separate executor JVMs; the engine reaches them
only through the --py-files zip — nothing is importable from the repo
checkout on the executor side). Prints one JSON line with row counts and
the per-check violation totals, writes violations to <out_dir>.

This is the deployment shape the north_star names: spark-submit
--py-files on a multi-executor cluster; swap the master URL for
yarn/k8s://… in production.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    table, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("pysemantic_spark_submit").getOrCreate()
    # imported AFTER the session exists: on executors the package resolves
    # from the shipped --py-files zip
    from pysemantic_spark.fixtures import dim_tools_pdf, transcripts_spec
    from pysemantic_spark.operators.runner import execute

    df = spark.read.parquet(table)
    dims = {"dim_tools": spark.createDataFrame(dim_tools_pdf())}
    out = execute(
        spark,
        df,
        transcripts_spec(),
        dims=dims,
        bucket_by="conv_id",
        n_buckets=64,
        violations_sink=out_dir,
    )
    print(
        json.dumps(
            {
                "n_rows": out["n_rows"],
                "n_dup_keys": out["n_dup_keys"],
                "n_buckets_failed": int((~out["partition_report"]["passed"]).sum()),
                "check_counts": {
                    r["check_name"]: int(r["n_violations"])
                    for _, r in out["check_counts"].iterrows()
                },
                "executors": spark.sparkContext.getConf().get("spark.master"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
