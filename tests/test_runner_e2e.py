"""End-to-end: fused check suite over synthetic transcripts vs pandas oracle.

Mirrors the reference's test_validator.py golden-equality style (SURVEY.md
§5): engine output compared row-for-row against an independent pandas
re-statement of clean() semantics, sorted by (conv_id, turn_idx), text
byte-exact.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pysemantic_spark.fixtures import (
    dim_tools_pdf,
    pandas_oracle,
    transcripts_pdf,
    transcripts_spec,
)
from pysemantic_spark.operators.runner import validate


@pytest.fixture(scope="module")
def setup(spark):
    pdf = transcripts_pdf(n_rows=10_000)
    spec = transcripts_spec()
    dims_pdf = {"dim_tools": dim_tools_pdf()}
    df = spark.createDataFrame(pdf)
    dims = {k: spark.createDataFrame(v) for k, v in dims_pdf.items()}
    oracle = pandas_oracle(pdf, spec, dims_pdf)
    result = validate(spark, df, spec, dims=dims, bucket_by="conv_id", n_buckets=16)
    return pdf, spec, oracle, result


def _norm(pdf: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    return pdf.sort_values(keys, kind="mergesort").reset_index(drop=True)


def test_violations_match_oracle(setup):
    _, _, oracle, result = setup
    got = result.violations.toPandas()[["conv_id", "turn_idx", "check_name"]]
    exp = oracle["violations"][["conv_id", "turn_idx", "check_name"]]
    keys = ["conv_id", "turn_idx", "check_name"]
    got, exp = _norm(got, keys), _norm(exp, keys)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    exp["turn_idx"] = exp["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_clean_rows_match_oracle_text_byte_exact(setup):
    _, _, oracle, result = setup
    keys = ["conv_id", "turn_idx"]
    got = _norm(result.clean.toPandas(), keys)
    exp = _norm(oracle["clean"], keys)
    assert len(got) == len(exp)
    assert got["text"].tolist() == exp["text"].tolist()  # byte-exact invariant
    for c in ["conv_id", "turn_idx", "role"]:
        assert got[c].tolist() == exp[c].tolist()


def test_dup_keys_match_oracle(setup):
    _, _, oracle, result = setup
    keys = ["conv_id", "turn_idx"]
    got = _norm(result.dupes.toPandas(), keys)
    exp = _norm(oracle["dupes"], keys)
    assert got[keys].astype(str).values.tolist() == exp[keys].astype(str).values.tolist()
    assert got["dup_count"].astype(int).tolist() == exp["dup_count"].astype(int).tolist()


def test_check_counts_match_oracle(setup):
    _, _, oracle, result = setup
    got = {
        r["check_name"]: r["n_violations"]
        for r in result.check_counts.collect()
    }
    exp = oracle["violations"]["check_name"].value_counts().to_dict()
    for name, n in exp.items():
        assert got.get(name, 0) == n, name
    # checks with zero injected violations must report 0, not be missing
    assert all(v >= 0 for v in got.values())


def test_partition_report_covers_all_rows(setup):
    pdf, _, _, result = setup
    rep = result.partition_report.toPandas()
    assert rep["n_rows"].sum() == len(pdf)
    assert (rep["n_violating_rows"] > 0).any()
    assert set(rep.columns) == {"bucket", "n_rows", "n_violating_rows", "passed"}


def test_stats_agg(setup):
    pdf, _, _, result = setup
    stats = result.stats.toPandas().set_index("column")
    assert int(stats.loc["text", "n_nulls"]) == int(pdf["text"].isna().sum())
    assert int(stats.loc["ts", "n_nulls"]) == int(pdf["ts"].isna().sum())
    assert stats.loc["turn_idx", "null_rate"] == 0.0
    # approx_count_distinct (HLL, rsd=5%) within 3 sigma of exact
    exact = pdf["conv_id"].nunique()
    approx = int(stats.loc["conv_id", "approx_distinct"])
    assert abs(approx - exact) / exact < 0.15
    # strings skip min/max at scale (meaningless over text bodies)
    assert stats.loc["text", "min"] is None or pd.isna(stats.loc["text", "min"])
    # numerics/timestamps keep them
    assert stats.loc["turn_idx", "min"] is not None
