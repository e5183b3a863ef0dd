"""Physical-plan regression tests: the properties that matter at 100 TB.

These assert the *shape* of the plan, not timings — a regression that adds a
second full scan, loses broadcast, or widens a pruned read schema fails here
long before it shows up in a benchmark.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pysemantic_spark.fixtures import dim_tools_pdf, transcripts_pdf, transcripts_spec
from pysemantic_spark.operators import dedup, similarity
from pysemantic_spark.operators.runner import validate


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("plans")
    tpath = str(root / "transcripts.parquet")
    spark.createDataFrame(transcripts_pdf(3_000)).write.parquet(tpath)
    df = spark.read.parquet(tpath)
    dims = {"dim_tools": spark.createDataFrame(dim_tools_pdf())}
    res = validate(spark, df, transcripts_spec(), dims=dims, bucket_by="conv_id")
    return df, dims, res


def test_fused_pass_scans_table_exactly_once(parts):
    _, _, res = parts
    plan = _plan(res.violations)
    # the fact table is scanned ONCE — never one scan per check
    assert plan.count("transcripts.parquet") == 1, plan


def test_referential_is_broadcast_not_shuffle(parts):
    _, _, res = parts
    plan = _plan(res.violations)
    assert "BroadcastHashJoin" in plan
    # the FACT side must not be exchanged for the join: the only Exchange
    # allowed in this plan feeds the broadcast (dim dedup)
    fact_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "tool" not in ln
    ]
    assert fact_exchanges == [], fact_exchanges


def test_dupes_scan_is_column_pruned(parts):
    _, _, res = parts
    plan = _plan(res.dupes)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"conv_id", "turn_idx"}, cols
    assert "partial_count" in plan  # map-side combine before the exchange


def test_stats_agg_is_partial_then_final(parts):
    _, _, res = parts
    plan = _plan(res.stats)
    assert "partial_" in plan
    # single-row result: one fact scan feeds the whole wide agg
    assert plan.count("transcripts.parquet") == 1


def test_filter_pushdown_reaches_scan(spark, parts):
    df, _, _ = parts
    plan = _plan(df.filter(F.col("role") == "tool").select("conv_id"))
    assert "PushedFilters: [IsNotNull(role), EqualTo(role,tool)]" in plan


def test_cosine_topk_broadcasts_queries(spark):
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {"vec_id": range(100),
         "embedding": [list(map(float, rng.standard_normal(8))) for _ in range(100)]}
    )
    corpus = spark.createDataFrame(pdf)
    queries = corpus.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    plan = _plan(similarity.cosine_topk(corpus, queries, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # corpus side must not shuffle for the join itself
    assert "CartesianProduct" not in plan


def test_ngram_inverted_index_no_cartesian(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20),
                      "text": [f"w{i} common words here {i}" for i in range(20)]})
    )
    plan = _plan(dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "shingle" in plan  # equi-join on the shingle key


def test_drift_sketch_scan_is_pruned_and_single(spark, parts):
    """The spec-drift current-side sketch must read ONLY the drift columns
    (ReadSchema pruning through the posexplode) and scan the table once for
    ALL drift columns together."""
    from pysemantic_spark.operators import drift

    df, _, _ = parts
    # capture the plan of the sketch aggregation (same DAG multi_sketch_counts
    # collects): two numeric + one categorical column in ONE scan
    exprs = [
        drift.bin_expr("turn_idx", 0.0, 50.0, 16).cast("string"),
        F.col("role").cast("string"),
    ]
    agg = (
        df.select(F.posexplode(F.array(*exprs)).alias("ci", "val"))
        .filter(F.col("val").isNotNull())
        .groupBy("ci", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = _plan(agg)
    assert plan.count("FileScan parquet") == 1
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"turn_idx", "role"}  # text/ts/conv_id never read


def test_ks_between_scans_are_pruned(spark, parts):
    """ks_between reads only the drift column on both sides; the window
    cumsum runs over the aggregated n_bins-row spine, never input rows."""
    from pysemantic_spark.operators.drift import ks_between

    df, _, _ = parts
    base = df.filter(F.col("turn_idx") % 2 == 0)
    cur = df.filter(F.col("turn_idx") % 2 == 1)
    out = ks_between(base, cur, "turn_idx", 0.0, 50.0, n_bins=16)
    plan = _plan(out)
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"turn_idx"}, cols
    # the window operates post-aggregation: it must appear above an agg of
    # the 18-row bin spine, so no Exchange of input-sized data feeds it
    assert "Window" in plan


def test_violating_rows_per_bucket_is_agg_shaped(spark):
    """VERDICT r2 #4: the per-bucket violating-row count must compile to
    partial+final HashAggregates with every exchange keyed by the bucket
    (+ dedup tuple) — never a bucket-less global Distinct of the full
    violations output."""
    import pandas as pd

    from pysemantic_spark.operators.runner import _violating_rows_per_bucket

    viol = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 2, 3, 3, 3],
                "_row_hash": [10, 10, 20, 30, 31, 31],
                "_bucket": [0, 0, 1, 1, 1, 1],
            }
        )
    )
    out = _violating_rows_per_bucket(viol, ["k"])
    got = {r["bucket"]: r["n_violating_rows"] for r in out.collect()}
    # bucket 0: one distinct (k, hash); bucket 1: (2,20), (3,30), (3,31)
    assert got == {0: 1, 1: 3}
    plan = _plan(out)
    assert "HashAggregate" in plan and "partial" in plan.lower()
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "_bucket" in ln or "bucket" in ln, ln


def test_violating_rows_per_bucket_counts_null_keys(spark):
    """count(DISTINCT a, b) drops any-null tuples; the struct wrapper must
    not — a violating row with a NULL key column still counts."""
    import pandas as pd

    from pysemantic_spark.operators.runner import _violating_rows_per_bucket

    viol = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [None, None, 5.0],
                "_row_hash": [1, 2, 3],
                "_bucket": [0, 0, 0],
            }
        )
    )
    out = _violating_rows_per_bucket(viol, ["k"])
    assert out.collect()[0]["n_violating_rows"] == 3


def test_ivf_training_is_single_scan_no_count(spark):
    """VERDICT r2 #5: centroid training must not pay a count() pre-pass —
    the sample job is one limit-bounded scan."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {"vec_id": range(300),
         "embedding": [list(map(float, rng.standard_normal(8))) for _ in range(300)]}
    )
    corpus = spark.createDataFrame(pdf)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    cents = similarity.train_ivf_centroids(corpus, dim=8, n_centroids=4, sample_size=100)
    assert cents.shape == (4, 8)
    # exactly ONE Spark job ran for training (the limit+toPandas sample);
    # a count() pre-pass would make it two
    after = len(tracker.getJobIdsForGroup() or [])
    assert after - before == 1, (before, after)


def test_cosine_pairs_exact_block_join_is_equi(spark):
    """The block-pair expansion joins on the partner block id (equi-join of
    two tiny packed frames) — the n^2 work happens inside bounded GEMM
    tasks, and the input table is scanned once."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(
        {"vec_id": range(200),
         "embedding": [list(map(float, rng.standard_normal(8))) for _ in range(200)]}
    )
    corpus = spark.createDataFrame(pdf)
    out = similarity.cosine_pairs_exact(corpus, threshold=0.9, n_blocks=8)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan
