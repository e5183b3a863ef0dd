"""Drift (KS/PSI) and skew-handling property tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pysemantic_spark.operators import drift, skew
from pysemantic_spark.fixtures import transcripts_pdf


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    base = pd.DataFrame({"v": rng.normal(100, 20, 20_000), "g": rng.integers(0, 4, 20_000)})
    same = pd.DataFrame({"v": rng.normal(100, 20, 20_000), "g": rng.integers(0, 4, 20_000)})
    shifted = pd.DataFrame({"v": rng.normal(140, 20, 20_000), "g": rng.integers(0, 4, 20_000)})
    return (
        spark.createDataFrame(base),
        spark.createDataFrame(same),
        spark.createDataFrame(shifted),
        base,
    )


def test_histogram_sketch_counts(spark, frames):
    dfb, _, _, base = frames
    sk = drift.histogram_sketch(dfb, "v", lo=0, hi=200, n_bins=20)
    assert sk.total == len(base)
    # spot-check one bin against pandas
    in_bin5 = ((base.v >= 40) & (base.v < 50)).sum()
    assert sk.counts[5] == in_bin5


def test_no_drift_between_same_distributions(spark, frames):
    dfb, dfs, _, _ = frames
    b = drift.histogram_sketch(dfb, "v", 0, 200, 32)
    c = drift.histogram_sketch(dfs, "v", 0, 200, 32)
    assert drift.ks(b, c) < 0.05
    assert drift.psi(b, c) < 0.05


def test_drift_detected_on_shift(spark, frames):
    dfb, _, dfx, _ = frames
    b = drift.histogram_sketch(dfb, "v", 0, 200, 32)
    c = drift.histogram_sketch(dfx, "v", 0, 200, 32)
    assert drift.ks(b, c) > 0.3
    assert drift.psi(b, c) > 0.5


def test_drift_report_roundtrip(spark, frames, tmp_path):
    dfb, dfs, dfx, _ = frames
    base_sk = drift.histogram_sketch(dfb, "v", 0, 200, 32)
    rep_same = drift.drift_report(
        dfs, {"v": base_sk.to_dict()}, {"v": (0, 200)}
    )
    rep_shift = drift.drift_report(dfx, {"v": base_sk}, {"v": (0, 200)})
    assert not rep_same["drifted"].any()
    assert rep_shift["drifted"].all()


def test_categorical_psi(spark, frames):
    dfb, dfs, _, _ = frames
    b = drift.categorical_sketch(dfb, "g")
    c = drift.categorical_sketch(dfs, "g")
    assert drift.categorical_psi(b, c) < 0.02
    skewed = drift.categorical_psi(b, {"0": 100, "1": 1})
    assert skewed > 0.5


def test_ecdf_sketch_arrow(spark, frames):
    dfb, _, _, base = frames
    out = drift.ecdf_sketch_arrow(
        dfb.withColumn("bucket", (F.col("g") % 2).cast("long")), "v", "bucket",
        n_quantiles=11,
    )
    assert set(out["bucket"]) == {0, 1}
    assert len(out) == 22
    med = out[(out.bucket == 0) & (out.q == 0.5)]["value"].iloc[0]
    exp = base[base.g % 2 == 0]["v"].median()
    assert abs(med - exp) < 1.0


# --- skew ------------------------------------------------------------------

def test_salted_group_count_invariant_to_salt_factor(spark):
    pdf = transcripts_pdf(n_rows=5_000, skew_conv_frac=0.3)  # one huge conv
    df = spark.createDataFrame(pdf)
    expected = (
        df.groupBy("conv_id").count().orderBy("conv_id").collect()
    )
    for factor in (1, 4, 16):
        got = (
            skew.salted_group_count(df, ["conv_id"], salt_factor=factor,
                                    entropy_cols=("turn_idx",))
            .orderBy("conv_id")
            .collect()
        )
        assert [(r["conv_id"], r["cnt"]) for r in got] == [
            (r["conv_id"], r["count"]) for r in expected
        ], factor


def test_salted_repartition_spreads_heavy_key(spark):
    pdf = transcripts_pdf(n_rows=4_000, skew_conv_frac=0.5)
    df = spark.createDataFrame(pdf)
    heavy = pdf["conv_id"].value_counts().idxmax()
    out = skew.salted_repartition(
        df, "conv_id", num_partitions=8, salt_factor=8, entropy_cols=("turn_idx",)
    )
    parts = (
        out.filter(F.col("conv_id") == heavy)
        .withColumn("pid", F.spark_partition_id())
        .select("pid").distinct().count()
    )
    assert parts >= 4  # heavy conversation spread over multiple partitions
    assert out.count() == len(pdf)  # no rows lost
