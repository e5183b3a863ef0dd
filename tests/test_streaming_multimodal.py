"""Structured Streaming validation + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pysemantic_spark.fixtures import dim_tools_pdf, transcripts_pdf, transcripts_spec
from pysemantic_spark.multimodal import binary_ops as mm
from pysemantic_spark.streaming import validate_stream as vs


def test_streaming_violations_match_batch(spark, tmp_path):
    pdf = transcripts_pdf(n_rows=3_000)
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    dims = {"dim_tools": spark.createDataFrame(dim_tools_pdf())}
    spec = transcripts_spec()

    stream = spark.readStream.schema(schema).parquet(src)
    assert stream.isStreaming
    viol = vs.violation_stream(stream, spec, ["conv_id", "turn_idx"], dims)
    q = (
        viol.writeStream.format("memory")
        .queryName("viols")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select check_name, count(*) n from viols group by 1").collect()
    got_counts = {r["check_name"]: r["n"] for r in got}

    # batch reference
    from pysemantic_spark.operators.runner import validate

    batch = validate(spark, spark.read.parquet(src), spec, dims=dims)
    exp = {
        r["check_name"]: r["n_violations"]
        for r in batch.check_counts.collect()
        if r["n_violations"] > 0
    }
    assert got_counts == exp


def test_windowed_counts_stream(spark, tmp_path):
    pdf = transcripts_pdf(n_rows=2_000)
    src = str(tmp_path / "src2")
    spark.createDataFrame(pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    wc = vs.windowed_violation_counts(
        stream, transcripts_spec(), ts_col="ts", window="1 hour",
        watermark="2 hours",
        dims={"dim_tools": spark.createDataFrame(dim_tools_pdf())},
    )
    q = (
        wc.writeStream.format("memory").queryName("wc")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from wc").collect()
    # ts-null rows fall out of windows; remaining checks aggregate per hour
    assert {r["check_name"] for r in rows} >= {"levels:role", "min:turn_idx"}
    assert all(r["n_violations"] > 0 for r in rows)


@pytest.fixture(scope="module")
def media_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": bytes(rng.integers(0, 256, 64, dtype=np.uint8))
                if i != 4 else None,
                "mime": f"{kind}/x-test" if i != 7 else "application/pdf",
                "width": 64 if kind == "image" and i != 6 else None,
                "height": 64 if kind == "image" and i != 6 else None,
                "duration_ms": 3500 if kind != "image" else None,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=mm.MEDIA_SCHEMA)


def test_validate_media_checks(spark, media_df):
    out = mm.validate_media(media_df).select("media_id", "_violations").collect()
    flags = {r["media_id"]: list(r["_violations"]) for r in out}
    assert "not_null:payload" in flags[4]
    assert "bad_mime" in flags[7]
    assert "image_dims_missing" in flags[6]
    assert flags[0] == []


def test_extract_features_plumbing(spark, media_df):
    feats = mm.extract_features(media_df).collect()
    assert len(feats) == 20
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in feats)
    # deterministic: same payload → same features
    again = mm.extract_features(media_df).collect()
    assert [r["features"] for r in feats] == [r["features"] for r in again]
    # null payload → zero vector (decoder contract)
    null_row = [r for r in feats if r["media_id"] == 4][0]
    assert all(v == 0.0 for v in null_row["features"])


def test_frame_sample_plan(spark, media_df):
    frames = mm.frame_sample_plan(media_df, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    # videos are media_id % 3 == 2, duration 3500ms → 4 frames each
    assert all(r["count"] == 4 for r in got)
    ts = {r["frame_ts_ms"] for r in frames.filter(F.col("media_id") == 2).collect()}
    assert ts == {0, 1000, 2000, 3000}


def test_real_decoder_seam():
    with pytest.raises(NotImplementedError):
        mm.real_decode_unavailable(b"...")


def test_windowed_drift_sketch_stream_matches_batch(spark, tmp_path):
    """Streaming drift: the per-window sketch stream scored by
    drift_rows_report must reproduce the BATCH spec-drift metrics exactly
    when all data falls in one window (same formulas, same baseline)."""
    from pysemantic_spark.operators.drift import (
        load_drift_baseline,
        save_drift_baseline,
        spec_drift_report,
    )
    from pysemantic_spark.spec import DatasetSpec

    rng = np.random.default_rng(9)
    n = 4000
    base_pdf = pd.DataFrame(
        {
            "v": rng.normal(100, 15, n),
            "cat": rng.choice(["a", "b", "c"], n),
            "ts": pd.Timestamp("2024-01-01 00:00:30"),
        }
    )
    cur_pdf = base_pdf.copy()
    cur_pdf["v"] = rng.normal(130, 15, n)  # shifted → drift
    bl_path = str(tmp_path / "bl.json")
    save_drift_baseline(
        spark.createDataFrame(base_pdf[["v", "cat"]]), ["v", "cat"], bl_path
    )
    baseline = load_drift_baseline(bl_path)

    src = str(tmp_path / "src")
    spark.createDataFrame(cur_pdf).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sk = vs.windowed_drift_sketch(
        stream, baseline, ["v", "cat"], ts_col="ts", window="1 minute"
    )
    q = (
        sk.writeStream.format("memory").queryName("driftsk")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.processAllAvailable(); q.stop()
    rows = spark.sql("select * from driftsk").collect()
    assert len(rows) > 0
    assert len({(r["window_start"], r["window_end"]) for r in rows}) == 1

    got = vs.drift_rows_report(rows, baseline).set_index(["column", "metric"])
    spec = DatasetSpec.from_dict(
        "t", {"drift": {"columns": ["v", "cat"], "baseline": bl_path}}
    )
    exp = spec_drift_report(
        spark.createDataFrame(cur_pdf[["v", "cat"]]), spec.drift
    ).set_index(["column", "metric"])
    assert sorted(got.index) == sorted(exp.index)
    for idx in exp.index:
        assert got.loc[idx, "value"] == exp.loc[idx, "value"], idx
        assert got.loc[idx, "drifted"] == exp.loc[idx, "drifted"], idx
    assert bool(got.loc[("v", "psi"), "drifted"])
    assert not bool(got.loc[("cat", "psi"), "drifted"])
