"""Sequence checks (batch) + stateful streaming contiguity operator."""

from __future__ import annotations

import pandas as pd
import pytest

from pysemantic_spark.operators import sequence


@pytest.fixture(scope="module")
def seq_df(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * 3 + ["b"] * 4 + ["c"] * 2,
            "turn_idx": [0, 1, 2, 0, 1, 3, 4, 5, 6],  # b has a gap; c starts at 5
            "ts": pd.to_datetime(
                [
                    "2026-01-01 00:00:00", "2026-01-01 00:00:10", "2026-01-01 00:00:05",
                    "2026-01-01 01:00:00", "2026-01-01 01:00:01", "2026-01-01 01:00:02",
                    "2026-01-01 01:00:03",
                    "2026-01-01 02:00:00", "2026-01-01 02:00:00",
                ]
            ),
        }
    )
    return spark.createDataFrame(pdf)


def test_contiguity_violations(spark, seq_df):
    got = {
        (r["conv_id"], r["turn_idx"], r["expected_idx"])
        for r in sequence.contiguity_violations(seq_df).collect()
    }
    # b: turns 3,4 should be 2,3; c: turns 5,6 should be 0,1; a is contiguous
    assert got == {("b", 3, 2), ("b", 4, 3), ("c", 5, 0), ("c", 6, 1)}


def test_monotonic_ts_violations(spark, seq_df):
    got = [
        (r["conv_id"], r["turn_idx"])
        for r in sequence.monotonic_ts_violations(seq_df).collect()
    ]
    # a turn2 ts (00:00:05) goes backwards; c turn6 equals turn5 (strict)
    assert sorted(got) == [("a", 2), ("c", 6)]
    loose = sequence.monotonic_ts_violations(seq_df, strict=False).collect()
    assert [(r["conv_id"], r["turn_idx"]) for r in loose] == [("a", 2)]


def test_stateful_streaming_contiguity(spark, tmp_path):
    """Turns arrive across TWO micro-batches; state carries max_seen over."""
    from pysemantic_spark.streaming.stateful import turn_contiguity_stream

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    batch1 = pd.DataFrame({"conv_id": ["x", "x", "y"], "turn_idx": [0, 1, 0]})
    batch2 = pd.DataFrame(
        {"conv_id": ["x", "x", "y"], "turn_idx": [3, 1, 1]}
    )  # x: gap (3, expected 2) then duplicate (1); y: fine

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = "conv_id string, turn_idx int"

    def drop_file(pdf: pd.DataFrame, name: str) -> None:
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       str(src / name))

    drop_file(batch1, "b1.parquet")

    # ONE continuous query; files dropped in over time become micro-batches
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = turn_contiguity_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("contig")
        .outputMode("append").option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("select * from contig").collect()
        assert got1 == []  # batch 1 fully contiguous

        drop_file(batch2, "b2.parquet")
        q.processAllAvailable()
        got2 = {
            (r["conv_id"], r["turn_idx"], r["expected_next"], r["kind"])
            for r in spark.sql("select * from contig").collect()
        }
        # within a micro-batch indices process in sorted order: 1 first
        # (duplicate, expected 2), then 3 (gap, expected 2)
        assert got2 == {("x", 1, 2, "duplicate"), ("x", 3, 2, "gap")}
    finally:
        q.stop()


class _FakeState:
    """Minimal GroupState stand-in for driving the state fn directly."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def _reference_contiguity(idxs, max_seen=-1):
    """The original per-row sequential rule, kept as the test oracle."""
    rows = []
    for idx in sorted(int(i) for i in idxs):
        expected = max_seen + 1
        if idx == expected:
            max_seen = idx
        elif idx > expected:
            rows.append((idx, expected, "gap"))
            max_seen = idx
        else:
            rows.append((idx, expected, "duplicate"))
    return rows, max_seen


def test_vectorized_contiguity_matches_sequential_rule():
    """Property: the numpy path reproduces the per-row loop exactly over
    random batches, including state carry-over between micro-batches."""
    import numpy as np

    from pysemantic_spark.streaming.stateful import _make_check_contiguity

    rng = np.random.default_rng(11)
    fn = _make_check_contiguity(0)
    for trial in range(20):
        state = _FakeState()
        max_seen = -1
        for batch in range(3):
            idxs = rng.integers(0, 40, size=rng.integers(0, 30))
            exp_rows, max_seen = _reference_contiguity(idxs, max_seen)
            out = list(
                fn(("c",), [pd.DataFrame({"turn_idx": idxs})], state)
            )
            got = (
                [
                    (int(r.turn_idx), int(r.expected_next), r.kind)
                    for r in pd.concat(out).itertuples()
                ]
                if out
                else []
            )
            assert got == exp_rows, (trial, batch)
            assert state.get[0] == max_seen


def test_vectorized_contiguity_throughput():
    """10^5-turn single-conversation replay batch must be numpy-fast
    (regression: the per-row Python loop was the throughput ceiling)."""
    import time

    import numpy as np

    from pysemantic_spark.streaming.stateful import _make_check_contiguity

    rng = np.random.default_rng(5)
    # ~10% duplicates and gaps sprinkled into a 100k contiguous run
    idxs = np.arange(100_000)
    idxs[rng.integers(0, 100_000, 5_000)] = rng.integers(0, 100_000, 5_000)
    fn = _make_check_contiguity(0)
    state = _FakeState()
    t0 = time.time()
    out = list(fn(("c",), [pd.DataFrame({"turn_idx": idxs})], state))
    wall = time.time() - t0
    n_viol = sum(len(o) for o in out)
    exp_rows, _ = _reference_contiguity(idxs)
    assert n_viol == len(exp_rows)
    assert wall < 1.0, f"vectorized path took {wall:.2f}s for 1e5 turns"
