"""Sequence/ordering checks over (conv_id, turn_idx, ts) — constraints that
need *within-group structure*, beyond the reference's per-row rules.

- `contiguity_violations`: turn_idx must be 0,1,2,… within each
  conversation (gaps / restarts / duplicates surface as violations).
- `monotonic_ts_violations`: ts strictly increasing within a conversation.

Both are one window pass over (key) with a lag/row_number — the shuffle key
is the conversation, so the skew story is the same as the dedup path:
pathological conversations are bounded by the salted storage layout, and the
window state per group is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguity_violations(
    df: DataFrame,
    key: list[str] | str = "conv_id",
    idx_col: str = "turn_idx",
    order_by: list[str] | None = None,
) -> DataFrame:
    """Rows whose idx within their group ≠ their 0-based rank.

    Returns key cols + idx_col + expected_idx. A conversation with turns
    [0,1,3] reports turn 3 (expected 2); duplicated or shuffled turn
    numbers report every displaced row."""
    keys = [key] if isinstance(key, str) else list(key)
    order = order_by or [idx_col]
    cols = list(dict.fromkeys([*keys, idx_col, *order]))  # keep order cols!
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    ranked = (
        # NULL idx rows are a nullability violation, not a contiguity one —
        # and left in they'd consume ranks and falsely flag every later turn
        df.select(*cols)
        .filter(F.col(idx_col).isNotNull())
        .withColumn("expected_idx", F.row_number().over(w) - 1)
    )
    return ranked.filter(F.col(idx_col) != F.col("expected_idx")).select(
        *keys, idx_col, "expected_idx"
    )


def monotonic_ts_violations(
    df: DataFrame,
    key: list[str] | str = "conv_id",
    ts_col: str = "ts",
    order_by: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Rows whose ts does not advance past the previous turn's ts.

    Ordered by ``order_by`` (default turn_idx); NULL ts rows are excluded
    (nullability is its own check). Returns key cols + order cols + ts +
    prev_ts."""
    keys = [key] if isinstance(key, str) else list(key)
    order = order_by or ["turn_idx"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    with_prev = (
        df.select(*keys, *order, ts_col)
        .filter(F.col(ts_col).isNotNull())
        .withColumn("prev_ts", F.lag(ts_col).over(w))
    )
    bad = (
        (F.col(ts_col) <= F.col("prev_ts"))
        if strict
        else (F.col(ts_col) < F.col("prev_ts"))
    )
    return with_prev.filter(F.col("prev_ts").isNotNull() & bad)
