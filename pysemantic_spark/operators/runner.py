"""Fused single-pass validation runner.

Execution shape (SURVEY.md §3.4 — designed for 10^12 rows, tested small):

    scan ──▶ [broadcast left-outer join per referential dim]
         ──▶ ONE projection emitting the full violation bitmap
             (`_violations: array<string>` of failed check names)
         ──▶ split:  violations (explode)      — row stream
                     clean rows (empty bitmap + dedup keep-first)
                     wide stats agg            — partial+final hash agg
                     per-bucket pass/fail      — groupBy(bucket)
                     unique-key dup counts     — sort-merge agg on the key

Everything row-wise is a single whole-stage-codegen projection: the table is
scanned ONCE per run, not once per check. Referential checks ride the same
pass as broadcast hash joins (no shuffle of the fact side). The only shuffles
are the declared aggregations (stats: partial+final, so tiny exchange;
uniqueness: exchange on the composite key — the sort-merge dedup counts the
north_star names; partition report: exchange on the bucket id, ≤ n_buckets
groups).

Semantics vs the reference (pysemantic/validator.py ::
DataFrameValidator.clean → SeriesValidator.clean loop): the reference drops
rows per-rule sequentially; because every rule only ever *drops* rows, the
surviving set equals "rows violating no rule" — a pure conjunction — so the
fused bitmap reproduces clean() row-for-row. Order matters only for
keep-first dedup, which we make deterministic via `order_by` + row_number.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pysemantic_spark.plans.compiler import CheckPlan, compile_spec
from pysemantic_spark.spec import DatasetSpec

VIOLATIONS_COL = "_violations"
BUCKET_COL = "_bucket"


@dataclass
class ValidationResult:
    """Lazy handles to every artifact of one validation run.

    All fields are unevaluated DataFrames — callers pick what to write or
    collect; nothing is computed twice if `flagged` is cached.
    """

    flagged: DataFrame          # input + _violations array + _bucket
    violations: DataFrame       # key cols + check_name  (one row per failure)
    clean: DataFrame            # surviving rows, original schema
    stats: DataFrame            # per-column: count/nulls/min/max/approx_distinct
    check_counts: DataFrame     # check_name, n_violations
    partition_report: DataFrame # bucket, n_rows, n_violating_rows, passed
    dupes: DataFrame | None     # composite-key duplicate groups (or None)
    check_names: list[str] = field(default_factory=list)


def _bucket_expr(key_col: str | None, n_buckets: int) -> Column:
    """Deterministic partition-bucket id: hashed key (matches the
    hashed-conv_id Iceberg partitioning of the target table), else the
    physical partition id."""
    if key_col is None:
        return F.spark_partition_id()
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def validate(
    spark: SparkSession,
    df: DataFrame,
    spec: DatasetSpec | CheckPlan,
    dims: dict[str, DataFrame] | None = None,
    bucket_by: str | None = None,
    n_buckets: int = 32,
) -> ValidationResult:
    """Run the full compiled check suite over ``df`` in one fused pass.

    dims: logical dim-table name → DataFrame, for referential checks.
    bucket_by: column whose hash defines the per-partition report buckets
        (e.g. "conv_id"); defaults to physical partition ids.
    """
    plan = spec if isinstance(spec, CheckPlan) else compile_spec(spec)
    dims = dims or {}
    input_cols = df.columns

    # --- optional df-level pre-rules (reference DataFrameValidator order) --
    if plan.drop_duplicates:
        df = df.dropDuplicates()
    if plan.drop_na:
        df = df.na.drop("any")

    # --- referential marks: broadcast left-outer joins, fact side unshuffled
    work = df
    ref_flag_cols: list[tuple[str, Column]] = []
    for ref in plan.referential:
        if ref.dim_table not in dims:
            raise KeyError(
                f"referential check {ref.name}: dim table {ref.dim_table!r} "
                f"not provided (have {sorted(dims)})"
            )
        mark = f"__ref_ok__{ref.column}"
        dim = (
            dims[ref.dim_table]
            .select(F.col(ref.dim_column).alias(ref.column))
            .distinct()
            .withColumn(mark, F.lit(True))
        )
        work = work.join(F.broadcast(dim), on=ref.column, how="left")
        ref_flag_cols.append(
            (ref.name, F.col(ref.column).isNotNull() & F.col(mark).isNull())
        )

    # --- THE fused projection: all row checks → one array column ----------
    flag_exprs: list[Column] = [
        F.when(chk.violation_expr(), F.lit(chk.name)) for chk in plan.row_checks
    ]
    flag_exprs += [
        F.when(F.coalesce(expr, F.lit(False)), F.lit(name))
        for name, expr in ref_flag_cols
    ]
    if flag_exprs:
        viol_arr = F.array_compact(F.array(*flag_exprs))
    else:
        viol_arr = F.array().cast("array<string>")

    flagged = (
        work.withColumn(VIOLATIONS_COL, viol_arr)
        .withColumn(BUCKET_COL, _bucket_expr(bucket_by, n_buckets))
        .select(*input_cols, VIOLATIONS_COL, BUCKET_COL)
    )

    # --- violations row stream --------------------------------------------
    key_cols = plan.unique_keys[0] if plan.unique_keys else input_cols[:1]
    violations = (
        flagged.filter(F.size(VIOLATIONS_COL) > 0)
        .select(*key_cols, F.explode(VIOLATIONS_COL).alias("check_name"), BUCKET_COL)
    )

    # --- unique-key duplicate detection: sort-merge agg on the key --------
    dupes = None
    row_ok = F.size(VIOLATIONS_COL) == 0
    clean = flagged.filter(row_ok)
    for key in plan.unique_keys:
        grp = flagged.groupBy(*key).agg(F.count(F.lit(1)).alias("dup_count"))
        d = grp.filter(F.col("dup_count") > 1)
        dupes = d if dupes is None else dupes.unionByName(d, allowMissingColumns=True)
        # keep-first among row-clean survivors, deterministic via order_by
        order = [F.col(c) for c in (plan.spec.order_by or [])] or [F.lit(1)]
        w = Window.partitionBy(*key).orderBy(*order)
        clean = (
            clean.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    clean = clean.select(*input_cols)

    # --- wide stats agg: one partial+final pass ----------------------------
    stat_cols = [c for c in input_cols]
    agg_exprs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        agg_exprs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.approx_count_distinct(c).alias(f"{c}__approx_distinct"),
        ]
    check_count_exprs = [
        F.sum(F.array_contains(VIOLATIONS_COL, n).cast("long")).alias(f"__chk__{n}")
        for n in plan.check_names
        if not n.startswith("unique_key:")
    ]
    wide = flagged.agg(*agg_exprs, *check_count_exprs)

    # unpivot wide → tall (driver-side on a 1-row frame is free)
    stats = _unpivot_stats(wide, stat_cols)
    check_counts = _unpivot_checks(wide, plan)

    # --- per-bucket pass/fail ----------------------------------------------
    partition_report = (
        flagged.groupBy(F.col(BUCKET_COL).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.size(VIOLATIONS_COL) > 0).cast("long")).alias("n_violating_rows"),
        )
        .withColumn("passed", F.col("n_violating_rows") == 0)
    )

    return ValidationResult(
        flagged=flagged,
        violations=violations,
        clean=clean,
        stats=stats,
        check_counts=check_counts,
        partition_report=partition_report,
        dupes=dupes,
        check_names=plan.check_names,
    )


def _unpivot_stats(wide: DataFrame, stat_cols: list[str]) -> DataFrame:
    parts = []
    for c in stat_cols:
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                (F.col(f"{c}__nulls") / F.col("n_rows")).alias("null_rate"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.col(f"{c}__approx_distinct").alias("approx_distinct"),
            )
        )
    return wide.select(F.explode(F.array(*parts)).alias("s")).select("s.*")


def _unpivot_checks(wide: DataFrame, plan: CheckPlan) -> DataFrame:
    names = [n for n in plan.check_names if not n.startswith("unique_key:")]
    if not names:
        return wide.sparkSession.createDataFrame(
            [], "check_name string, n_violations long"
        )
    parts = [
        F.struct(F.lit(n).alias("check_name"), F.col(f"__chk__{n}").alias("n_violations"))
        for n in names
    ]
    return wide.select(F.explode(F.array(*parts)).alias("s")).select("s.*")
