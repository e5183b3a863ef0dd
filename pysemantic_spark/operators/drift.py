"""Distribution-drift checks: PSI and KS vs a baseline sketch.

Two sketch paths:

- `histogram_sketch` — fixed-bin counts via ONE groupBy agg (pure JVM;
  bin = clamp(floor((x-lo)/width))). This is the scale path: the sketch is
  n_bins rows regardless of input size, mergeable across partitions/runs by
  summing counts.
- `ecdf_sketch_arrow` — per-bucket exact quantile grid via Arrow
  `applyInPandas` (the pandas/Arrow-UDAF path the north_star names): each
  bucket's pandas group computes a q-grid, driver merges. Arrow-batched,
  never per-row Python.

Drift metrics (computed driver-side on two tiny sketches):
- PSI = Σ (p_i − q_i) · ln(p_i / q_i)      over shared bins (ε-smoothed)
- KS  = max_i |CDF_p(i) − CDF_q(i)|        over the binned ECDF

Categorical drift reuses the same machinery with value = category.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class HistogramSketch:
    lo: float
    hi: float
    n_bins: int
    counts: list[int]          # len n_bins + 2 (underflow bin 0, overflow -1)
    total: int

    def probs(self, eps: float = 1e-6) -> list[float]:
        t = max(self.total, 1)
        return [(c + eps * t) / (t * (1 + eps * len(self.counts))) for c in self.counts]

    def to_dict(self) -> dict:
        return self.__dict__.copy()

    @classmethod
    def from_dict(cls, d: dict) -> "HistogramSketch":
        return cls(**d)


def bin_expr(col: str, lo: float, hi: float, n_bins: int) -> "F.Column":
    """Bin id in [0, n_bins+1]: 0 = underflow, n_bins+1 = overflow."""
    c = F.col(col).cast("double")
    width = (hi - lo) / n_bins
    raw = F.floor((c - F.lit(lo)) / F.lit(width)).cast("int") + 1
    return (
        F.when(c.isNull(), None)
        .when(c < lo, 0)
        .when(c >= hi, n_bins + 1)
        .otherwise(raw)
    )


def histogram_sketch(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int = 64
) -> HistogramSketch:
    """One partial+final agg pass → n_bins+2 counts."""
    rows = (
        df.select(bin_expr(col, lo, hi, n_bins).alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    counts = [0] * (n_bins + 2)
    for r in rows:
        counts[r["bin"]] = r["cnt"]
    return HistogramSketch(lo=lo, hi=hi, n_bins=n_bins, counts=counts, total=sum(counts))


def categorical_sketch(df: DataFrame, col: str) -> dict[str, int]:
    rows = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt")).collect()
    return {str(r[col]): r["cnt"] for r in rows if r[col] is not None}


def psi(baseline: HistogramSketch, current: HistogramSketch) -> float:
    p, q = baseline.probs(), current.probs()
    return sum((pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q))


def ks(baseline: HistogramSketch, current: HistogramSketch) -> float:
    p, q = baseline.probs(), current.probs()
    cp = cq = 0.0
    worst = 0.0
    for pi, qi in zip(p, q):
        cp += pi
        cq += qi
        worst = max(worst, abs(cp - cq))
    return worst


def categorical_psi(baseline: dict[str, int], current: dict[str, int]) -> float:
    keys = sorted(set(baseline) | set(current))
    bt = max(sum(baseline.values()), 1)
    ct = max(sum(current.values()), 1)
    eps = 1e-6
    out = 0.0
    for k in keys:
        p = baseline.get(k, 0) / bt + eps
        q = current.get(k, 0) / ct + eps
        out += (p - q) * math.log(p / q)
    return out


def psi_between(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Distributed PSI between two frames as a 1-row DataFrame
    (column, psi) — fully declarative so external engines can replicate it
    bit-for-bit (Laplace-smoothed: p_i = (c_i + 1) / (t + n_bins + 2)).

    Two pruned scans (only ``col``), two partial+final aggs of ≤ n_bins+2
    groups, one tiny join — nothing here grows with input size."""
    def binned(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(bin_expr(col, lo, hi, n_bins).alias("bin"))
            .filter(F.col("bin").isNotNull())
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    nb = n_bins + 2
    b = binned(baseline, "cb")
    c = binned(current, "cc")
    bins = baseline.sparkSession.range(0, nb).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(b, "bin", "left")
        .join(c, "bin", "left")
        .select(
            F.coalesce("cb", F.lit(0)).alias("cb"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    tb = F.sum("cb").cast("double")
    tc = F.sum("cc").cast("double")
    # evaluate via a two-step agg: totals first (scalar subquery-free)
    totals = joined.agg(tb.alias("tb"), tc.alias("tc"))
    with_tot = joined.crossJoin(F.broadcast(totals))
    p = (F.col("cb") + 1) / (F.col("tb") + nb)
    q = (F.col("cc") + 1) / (F.col("tc") + nb)
    return with_tot.agg(
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi")
    ).select(F.lit(col).alias("column"), "psi")


def ecdf_sketch_arrow(
    df: DataFrame, col: str, bucket_col: str, n_quantiles: int = 101
) -> pd.DataFrame:
    """Per-bucket quantile grid via applyInPandas (Arrow UDAF path).

    Returns pandas DF (bucket, q, value) with n_quantiles rows per bucket.
    Each group is one Arrow batch into pandas — vectorized, no row loop."""
    qs = [i / (n_quantiles - 1) for i in range(n_quantiles)]

    def grid(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[col].dropna()
        if len(vals) == 0:
            return pd.DataFrame({"bucket": [], "q": [], "value": []})
        quant = vals.quantile(qs, interpolation="linear")
        return pd.DataFrame(
            {"bucket": pdf[bucket_col].iloc[0], "q": qs, "value": quant.values}
        )

    out = (
        df.select(bucket_col, col)
        .groupBy(bucket_col)
        .applyInPandas(grid, schema="bucket long, q double, value double")
    )
    return out.toPandas()


def drift_report(
    current: DataFrame,
    baseline_sketches: dict[str, HistogramSketch | dict],
    numeric_ranges: dict[str, tuple[float, float]],
    categorical_cols: list[str] | None = None,
    n_bins: int = 64,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> pd.DataFrame:
    """Compare ``current`` against stored baseline sketches.

    Returns pandas DF (column, metric, value, threshold, drifted)."""
    rows = []
    for col, (lo, hi) in numeric_ranges.items():
        base = baseline_sketches[col]
        if isinstance(base, dict):
            base = HistogramSketch.from_dict(base)
        cur = histogram_sketch(current, col, base.lo, base.hi, base.n_bins)
        for metric, value, thr in (
            ("ks", ks(base, cur), ks_threshold),
            ("psi", psi(base, cur), psi_threshold),
        ):
            rows.append(
                {"column": col, "metric": metric, "value": value,
                 "threshold": thr, "drifted": value > thr}
            )
    for col in categorical_cols or []:
        base = baseline_sketches[col]
        cur = categorical_sketch(current, col)
        v = categorical_psi(base, cur)
        rows.append(
            {"column": col, "metric": "psi", "value": v,
             "threshold": psi_threshold, "drifted": v > psi_threshold}
        )
    return pd.DataFrame(rows)
