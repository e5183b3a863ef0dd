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


def ks_between(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
) -> DataFrame:
    """Distributed KS statistic between two frames as a 1-row DataFrame
    (column, ks) — the declarative twin of :func:`psi_between`.

    KS = max_bin |CDF_baseline − CDF_current| over the binned ECDF.
    Two pruned scans (only ``col``), two partial+final aggs of ≤ n_bins+2
    groups, a tiny spine join, then a window cumsum over the n_bins+2
    aggregated rows (single tiny partition — input size never reaches the
    window). Fully SQL-replicable for external verification."""
    from pyspark.sql import Window

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
    bins = baseline.sparkSession.range(0, nb).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        bins.join(b, "bin", "left")
        .join(c, "bin", "left")
        .select(
            "bin",
            F.coalesce("cb", F.lit(0)).alias("cb"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    totals = joined.agg(
        F.sum("cb").cast("double").alias("tb"), F.sum("cc").cast("double").alias("tc")
    )
    # literal partition key: the cumsum runs over exactly n_bins+2
    # aggregated rows, but an unpartitioned window makes Spark log a
    # "WindowExec: No Partition Defined" scale warning that real-cluster
    # operators would (rightly) chase — the literal documents single-
    # partition as intended while keeping the identical result
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = joined.select(
        F.sum("cb").over(w).cast("double").alias("ccb"),
        F.sum("cc").over(w).cast("double").alias("ccc"),
    ).crossJoin(F.broadcast(totals))
    # greatest(total, 1) mirrors the driver-side _ks_counts guard: an empty
    # side reports ks as a real number (max |cdf| of the other side), never
    # a NULL that silently reads as "no drift"
    return cum.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("ccb") / F.greatest(F.col("tb"), F.lit(1.0))
                    - F.col("ccc") / F.greatest(F.col("tc"), F.lit(1.0))
                )
            ),
            6,
        ).alias("ks")
    ).select(F.lit(col).alias("column"), "ks")


# ---------------------------------------------------------------------------
# Spec-driven drift: DriftSpec (YAML `drift:` block) → baseline file →
# drifted/not-drifted report rows in execute()
# ---------------------------------------------------------------------------
#
# All metric formulas here are EXACT and SQL-replicable (so external engines
# can verify them bit-for-bit from the same integer bin counts):
#   hist PSI  = Σ (p−q)·ln(p/q),  p_i=(cb_i+1)/(tb+NB), q_i=(cc_i+1)/(tc+NB)
#               (Laplace smoothing, NB = n_bins+2 — same as psi_between)
#   hist KS   = max_i |cumsum(cb)_i/tb − cumsum(cc)_i/tc|
#   cat  PSI  = Laplace over the union key set K: p=(cb+1)/(tb+|K|)
# Values rounded to 6 decimals.


def _psi_laplace_counts(cb: list[int], cc: list[int]) -> float:
    nb = len(cb)
    tb, tc = sum(cb), sum(cc)
    out = 0.0
    for b_, c_ in zip(cb, cc):
        p = (b_ + 1) / (tb + nb)
        q = (c_ + 1) / (tc + nb)
        out += (p - q) * math.log(p / q)
    return round(out, 6)


def _ks_counts(cb: list[int], cc: list[int]) -> float:
    tb, tc = max(sum(cb), 1), max(sum(cc), 1)
    cum_b = cum_c = 0.0
    worst = 0.0
    for b_, c_ in zip(cb, cc):
        cum_b += b_
        cum_c += c_
        worst = max(worst, abs(cum_b / tb - cum_c / tc))
    return round(worst, 6)


def _cat_psi_laplace(base: dict[str, int], cur: dict[str, int]) -> float:
    keys = sorted(set(base) | set(cur))
    k = len(keys)
    tb, tc = sum(base.values()), sum(cur.values())
    out = 0.0
    for key in keys:
        p = (base.get(key, 0) + 1) / (tb + k)
        q = (cur.get(key, 0) + 1) / (tc + k)
        out += (p - q) * math.log(p / q)
    return round(out, 6)


def multi_sketch_counts(
    df: DataFrame,
    numeric_specs: dict[str, tuple[float, float, int]],
    cat_cols: list[str],
    max_categories: int = 10_000,
) -> tuple[dict[str, list[int]], dict[str, dict[str, int]]]:
    """Sketch counts for EVERY drift column in ONE scan.

    All columns' bin ids / category values are stacked into a single
    array<string> and posexploded, so one pass + one agg of
    Σ(n_bins+2) + Σ|categories| groups covers the whole drift block —
    no per-column scans. Null values drop out per element (nulls are
    tracked by the null-rate stat, not the drift sketch).

    The driver collect is BOUNDED: before collecting, a per-column group
    count (partial+final agg over the already-aggregated counts frame,
    ≤ one row per column) verifies every categorical column has at most
    ``max_categories`` distinct values; a miscategorized high-cardinality
    column (user_id, free text) raises SpecValidationError instead of
    landing Σ|categories| rows on the driver. Bin/hash such columns into
    a bounded numeric surrogate to put them under drift."""
    from pysemantic_spark.errors import SpecValidationError

    exprs: list = []
    order: list[tuple[str, str]] = []
    for c, (lo, hi, nbins) in numeric_specs.items():
        exprs.append(bin_expr(c, lo, hi, nbins).cast("string"))
        order.append(("hist", c))
    for c in cat_cols:
        exprs.append(F.col(c).cast("string"))
        order.append(("cat", c))
    hist = {c: [0] * (nbins + 2) for c, (_, _, nbins) in numeric_specs.items()}
    cat: dict[str, dict[str, int]] = {c: {} for c in cat_cols}
    if not exprs:
        return hist, cat
    counts = (
        df.select(F.posexplode(F.array(*exprs)).alias("ci", "val"))
        .filter(F.col("val").isNotNull())
        .groupBy("ci", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if cat_cols:
        counts = counts.persist()
        sizes = (
            counts.groupBy("ci").agg(F.count(F.lit(1)).alias("n_distinct")).collect()
        )
        oversized = {
            order[r["ci"]][1]: r["n_distinct"]
            for r in sizes
            if order[r["ci"]][0] == "cat" and r["n_distinct"] > max_categories
        }
        if oversized:
            counts.unpersist()
            raise SpecValidationError(
                f"categorical drift column(s) exceed max_categories="
                f"{max_categories}: {oversized} — a sketch must stay bounded; "
                "hash/bin the column to a bounded numeric surrogate, or raise "
                "`max_categories` in the drift block if the cardinality is "
                "genuinely intended"
            )
    rows = counts.collect()
    if cat_cols:
        counts.unpersist()
    for r in rows:
        kind, c = order[r["ci"]]
        if kind == "hist":
            hist[c][int(r["val"])] = r["cnt"]
        else:
            cat[c][r["val"]] = r["cnt"]
    return hist, cat


def build_drift_baseline(
    df: DataFrame, columns: list[str], n_bins: int = 64,
    max_categories: int = 10_000,
) -> dict:
    """Sketch the baseline frame for the given drift columns.

    Numeric columns → histogram sketch with (lo, hi) = observed min/max
    (one skinny agg); string/boolean columns → categorical value counts.
    Returns a JSON-serializable dict; persist with :func:`save_drift_baseline`.
    """
    from pyspark.sql import types as T

    numeric: list[str] = []
    cats: list[str] = []
    for c in columns:
        dt = df.schema[c].dataType
        if isinstance(dt, T.NumericType):
            numeric.append(c)
        elif isinstance(dt, (T.StringType, T.BooleanType)):
            cats.append(c)
        else:
            raise ValueError(
                f"drift column {c!r} has unsupported type {dt.simpleString()} "
                "(numeric → histogram, string/boolean → categorical)"
            )
    numeric_specs: dict[str, tuple[float, float, int]] = {}
    if numeric:
        bounds = df.agg(
            *[F.min(c).cast("double").alias(f"{c}__lo") for c in numeric],
            *[F.max(c).cast("double").alias(f"{c}__hi") for c in numeric],
        ).collect()[0]
        for c in numeric:
            lo = bounds[f"{c}__lo"]
            hi = bounds[f"{c}__hi"]
            if lo is None:  # all-null column: degenerate empty sketch
                lo, hi = 0.0, 1.0
            if hi <= lo:
                hi = lo + 1.0
            numeric_specs[c] = (float(lo), float(hi), n_bins)
    hist, cat = multi_sketch_counts(
        df, numeric_specs, cats, max_categories=max_categories
    )
    out: dict = {"n_bins": n_bins, "columns": {}}
    for c, (lo, hi, nbins) in numeric_specs.items():
        out["columns"][c] = {
            "kind": "hist", "lo": lo, "hi": hi, "n_bins": nbins, "counts": hist[c],
        }
    for c in cats:
        out["columns"][c] = {"kind": "cat", "counts": cat[c]}
    return out


def save_drift_baseline(
    df: DataFrame, columns: list[str], path: str, n_bins: int = 64,
    max_categories: int = 10_000,
) -> dict:
    """Build and atomically write the baseline sketch JSON."""
    import json
    import os

    baseline = build_drift_baseline(
        df, columns, n_bins=n_bins, max_categories=max_categories
    )
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(baseline, f)
    os.replace(tmp, path)
    return baseline


def load_drift_baseline(path: str) -> dict:
    import json

    with open(path) as f:
        return json.load(f)


def spec_drift_report(df: DataFrame, drift_spec) -> pd.DataFrame:
    """Run a DriftSpec (YAML ``drift:`` block) against its baseline file.

    Current-side sketches for every declared column come from ONE fused
    scan (:func:`multi_sketch_counts`); metrics are computed driver-side
    from the two tiny count vectors. Returns pandas
    (column, metric, value, threshold, drifted) — the rows execute()
    attaches to its output."""
    from pysemantic_spark.errors import SpecValidationError

    if not drift_spec.baseline:
        raise SpecValidationError(
            "drift: block declared without a `baseline` sketch path — "
            "build one with save_drift_baseline(baseline_df, columns, path)"
        )
    base = load_drift_baseline(drift_spec.baseline)
    missing = [c for c in drift_spec.columns if c not in base["columns"]]
    if missing:
        raise SpecValidationError(
            f"drift baseline {drift_spec.baseline} lacks sketches for "
            f"columns {missing} — rebuild it with the full column list"
        )
    numeric_specs = {
        c: (e["lo"], e["hi"], e["n_bins"])
        for c, e in base["columns"].items()
        if c in set(drift_spec.columns) and e["kind"] == "hist"
    }
    cat_cols = [
        c for c in drift_spec.columns if base["columns"][c]["kind"] == "cat"
    ]
    hist, cat = multi_sketch_counts(
        df, numeric_specs, cat_cols,
        max_categories=getattr(drift_spec, "max_categories", 10_000),
    )
    rows = []
    for c in drift_spec.columns:
        entry = base["columns"][c]
        if entry["kind"] == "hist":
            for metric, value, thr in (
                ("psi", _psi_laplace_counts(entry["counts"], hist[c]),
                 drift_spec.psi_threshold),
                ("ks", _ks_counts(entry["counts"], hist[c]),
                 drift_spec.ks_threshold),
            ):
                rows.append(
                    {"column": c, "metric": metric, "value": value,
                     "threshold": thr, "drifted": value > thr}
                )
        else:
            v = _cat_psi_laplace(entry["counts"], cat[c])
            rows.append(
                {"column": c, "metric": "psi", "value": v,
                 "threshold": drift_spec.psi_threshold,
                 "drifted": v > drift_spec.psi_threshold}
            )
    return pd.DataFrame(rows)


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
