"""Fused single-pass validation runner.

Execution shape (SURVEY.md §3.4 — designed for 10^12 rows, tested small):

    scan ──▶ [broadcast left-outer join per referential dim]
         ──▶ ONE projection emitting the full violation bitmap
             (`_violations: array<string>` of failed check names)
         ──▶ artifacts:
             violations   explode of failing rows            (row stream)
             clean        bitmap-empty rows; keep-first dedup runs ONLY on
                          rows whose key is actually duplicated (semi-join
                          vs the dup-key set) — unique keys never shuffle
             stats        wide agg / observe()d on the main pass
             dupes        sort-merge dedup counts on the composite key,
                          computed on a two-column pruned scan
             report       per-bucket pass/fail, derived from tiny frames

Everything row-wise is a single whole-stage-codegen projection: the table is
scanned ONCE per full-width pass, not once per check. Referential checks ride
the same pass as broadcast hash joins (no shuffle of the fact side).

`execute()` is the production orchestration: ONE full-width action (writing
violations, with stats/check-counts attached via `observe` so they cost
nothing extra) plus skinny pruned-scan aggregations for the per-bucket row
counts and the duplicate-key groups (one per declared key, grouped by the
key alone; written to a sink, never collected). At 100 TB that is the
minimum I/O shape: full data crosses the scanner once; shuffles touch only
(conv_id, turn_idx) pairs and bucket ids, and nothing unbounded lands on
the driver.

Semantics vs the reference (pysemantic/validator.py ::
DataFrameValidator.clean → SeriesValidator.clean loop): the reference drops
rows per-rule sequentially; because every rule only ever *drops* rows, the
surviving set equals "rows violating no rule" — a pure conjunction — so the
fused bitmap reproduces clean() row-for-row. Order matters only for
keep-first dedup, which we make deterministic via `order_by` + row_number.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysemantic_spark.plans.compiler import CheckPlan, compile_spec
from pysemantic_spark.spec import DatasetSpec

VIOLATIONS_COL = "_violations"
BUCKET_COL = "_bucket"


@dataclass
class ValidationResult:
    """Lazy handles to every artifact of one validation run.

    All fields are unevaluated DataFrames — callers pick what to write or
    collect. For the full-suite production run use :func:`execute`, which
    materializes everything in the minimum number of passes.
    """

    flagged: DataFrame          # input + _violations array + _bucket
    violations: DataFrame       # key cols + check_name  (one row per failure)
    clean: DataFrame            # surviving rows, original schema
    # per-column count/nulls/min/max/approx_distinct. NOTE: collecting
    # `stats` separately re-runs the fused pass (lazy plan, PLANS.md §7);
    # the production path is execute(), where stats ride the violations
    # write via observe() for free.
    stats: DataFrame
    check_counts: DataFrame     # check_name, n_violations
    partition_report: DataFrame # bucket, n_rows, n_violating_rows, passed
    dupes: DataFrame | None     # composite-key duplicate groups (or None)
    check_names: list[str] = field(default_factory=list)
    # internals for execute()
    _plan: CheckPlan | None = None
    _bucket_expr: Column | None = None


def _bucket_expr_default(key_col: str | None, n_buckets: int) -> Column:
    """Deterministic partition-bucket id: hashed key (matches the
    hashed-conv_id Iceberg partitioning of the target table), else the
    physical partition id."""
    if key_col is None:
        return F.spark_partition_id()
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _is_string_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _stat_agg_exprs(df: DataFrame) -> list[Column]:
    """Wide per-column stats in one partial+final agg.

    Scale choices: min/max only for orderable non-string types (min/max over
    long text bodies is meaningless and drags the whole agg); distinct
    estimation runs HLL over xxhash64(col) for strings so the sketch hashes
    8 bytes/row instead of the full body. Map-bearing columns get null-count
    only (maps are neither orderable nor hashable in Spark)."""
    exprs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for f_ in df.schema.fields:
        c = f_.name
        exprs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        if _contains_map(f_.dataType):
            exprs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            exprs.append(F.lit(None).cast("string").alias(f"{c}__max"))
            exprs.append(F.lit(None).cast("long").alias(f"{c}__approx_distinct"))
        elif _is_string_type(f_.dataType):
            exprs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            exprs.append(F.lit(None).cast("string").alias(f"{c}__max"))
            exprs.append(
                F.approx_count_distinct(F.xxhash64(c)).alias(f"{c}__approx_distinct")
            )
        else:
            exprs.append(F.min(c).cast("string").alias(f"{c}__min"))
            exprs.append(F.max(c).cast("string").alias(f"{c}__max"))
            exprs.append(F.approx_count_distinct(c).alias(f"{c}__approx_distinct"))
    return exprs


def validate(
    spark: SparkSession,
    df: DataFrame,
    spec: DatasetSpec | CheckPlan,
    dims: dict[str, DataFrame] | None = None,
    bucket_by: str | None = None,
    n_buckets: int = 32,
    bucket_expr: Column | None = None,
) -> ValidationResult:
    """Build the full lazy check-suite DAG over ``df``.

    dims: logical dim-table name → DataFrame, for referential checks.
    bucket_by: column whose hash defines the per-partition report buckets
        (e.g. "conv_id"); defaults to physical partition ids.
    bucket_expr: explicit bucket Column, overriding bucket_by (used when
        the bucket scheme must be reproducible outside Spark).
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

    if bucket_expr is None:
        bucket_expr = _bucket_expr_default(bucket_by, n_buckets)
    flagged = (
        work.withColumn(VIOLATIONS_COL, viol_arr)
        .withColumn(BUCKET_COL, bucket_expr)
        .select(*input_cols, VIOLATIONS_COL, BUCKET_COL)
    )

    # --- violations row stream --------------------------------------------
    key_cols = plan.unique_keys[0] if plan.unique_keys else input_cols[:1]
    violations = (
        flagged.filter(F.size(VIOLATIONS_COL) > 0)
        .select(*key_cols, F.explode(VIOLATIONS_COL).alias("check_name"), BUCKET_COL)
    )

    # --- unique-key duplicate detection: sort-merge agg on a PRUNED scan --
    dupes = None
    row_ok = F.size(VIOLATIONS_COL) == 0
    clean = flagged.filter(row_ok)
    for key in plan.unique_keys:
        grp = df.groupBy(*key).agg(F.count(F.lit(1)).alias("dup_count"))
        d = grp.filter(F.col("dup_count") > 1)
        dupes = d if dupes is None else dupes.unionByName(d, allowMissingColumns=True)
        # keep-first dedup, but ONLY dup-key rows enter the window shuffle:
        # unique keys (the overwhelming majority) pass through untouched.
        # NULL-safe split: NULL keys group together (window semantics),
        # they don't all survive via a never-matching equi anti-join.
        from pysemantic_spark.operators.dedup import split_by_dup_keys

        dup_keys = d.select(*key)
        dup_part, uniq_part = split_by_dup_keys(clean, dup_keys, list(key))
        if plan.spec.order_by:
            order = [F.col(c) for c in plan.spec.order_by]
        else:
            # Deterministic auto-tiebreak: without a declared order_by,
            # row_number() over lit(1) would keep whichever duplicate the
            # partition layout happened to deliver first — a wrong-answer
            # risk on stage retries / repartitions. Order by every hashable
            # non-key column instead: a content-derived total order, so the
            # survivor is a pure function of the data. Rows identical on all
            # hashable columns remain interchangeable (any pick yields the
            # same output set). Property-tested under random repartitions.
            from pysemantic_spark.operators.skew import hashable_cols

            skip = set(key) | {VIOLATIONS_COL, BUCKET_COL}
            tiebreak = [c for c in hashable_cols(clean) if c not in skip]
            order = [F.col(c) for c in tiebreak] or [F.lit(1)]
        w = Window.partitionBy(*key).orderBy(*order)
        dup_kept = (
            dup_part.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        clean = uniq_part.unionByName(dup_kept)
    clean = clean.select(*input_cols)

    # --- postprocessors: applied to survivors only (reference order:
    # SeriesValidator.postprocessors on cleaned series, then df-level) -----
    clean = _apply_postprocessors(clean, plan.spec)

    # --- wide stats agg: one partial+final pass ----------------------------
    agg_exprs = _stat_agg_exprs(df)
    check_count_exprs = [
        F.sum(F.array_contains(VIOLATIONS_COL, n).cast("long")).alias(f"__chk__{n}")
        for n in plan.check_names
        if not n.startswith("unique_key:")
    ]
    wide = flagged.agg(*agg_exprs, *check_count_exprs)
    stats = _unpivot_stats(wide, input_cols)
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
        _plan=plan,
        _bucket_expr=bucket_expr,
    )


def _violating_rows_per_bucket(viol: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-bucket count of DISTINCT violating rows from the violations
    stream (one stream row per (row, failed check): a row violating 3
    checks is still ONE violating row).

    countDistinct(struct(...)) — NOT .distinct() then count — so the
    whole computation is aggregate-shaped: partial HashAggregates map-side
    combine before both exchanges, and every shuffle is keyed BY BUCKET
    (plus the dedup tuple), never a bucket-less global Distinct over the
    full violation output — at a pathological 100% violation rate that
    distinct re-shuffled the entire dataset after the sink write. The
    struct wrapper keeps rows with NULL key columns countable
    (count(DISTINCT a, b) drops any-null argument tuples; a never-null
    struct does not), matching the old distinct() set semantics exactly."""
    return viol.groupBy(F.col(BUCKET_COL).alias("bucket")).agg(
        F.countDistinct(F.struct(*key_cols, F.col("_row_hash"))).alias(
            "n_violating_rows"
        )
    )


def execute(
    spark: SparkSession,
    df: DataFrame,
    spec: DatasetSpec | CheckPlan,
    dims: dict[str, DataFrame] | None = None,
    bucket_by: str | None = None,
    n_buckets: int = 32,
    violations_sink: str | None = None,
    dupes_sink: str | None = None,
    sink_format: str = "parquet",
) -> dict[str, Any]:
    """Production run: one full-width pass + skinny pruned-scan aggs.

    Pass 1 (full width): write/materialize the violations row stream, with
      per-column stats and per-check counts riding the same action via
      ``observe`` — zero extra scans for stats.
    Pass 2 (skinny): pruned-scan aggs producing the per-bucket totals and,
      for EVERY declared unique key, the duplicate-key groups — grouped by
      the key alone (never by (key, bucket): a bucket column not determined
      by the key would split dup groups and undercount). Dup groups are
      written to ``dupes_sink`` (defaults to ``<violations_sink>_dupes``),
      never collected: only their count reaches the driver.

    Returns dict(stats=pandas, check_counts=pandas, partition_report=pandas,
    dupes=lazy DataFrame handle or None, n_dup_keys=int, dupes_path=...,
    n_rows=int, violations_path=...). Tiny frames come back as pandas;
    anything that can grow with the data (violations, dupes) stays a path +
    lazy handle.
    """
    import dataclasses
    import time as _time

    import pandas as pd

    _t0 = _time.time()
    _timings: dict[str, float] = {}

    def _mark(name: str) -> None:
        nonlocal _t0
        now = _time.time()
        _timings[name] = round(now - _t0, 3)
        _t0 = now

    plan = spec if isinstance(spec, CheckPlan) else compile_spec(spec)
    if bucket_by is None:
        # spark_partition_id() is NOT stable across the two passes (they
        # scan different column subsets → different splits); production
        # reports need a content-derived bucket
        raise ValueError(
            "execute() requires bucket_by (a column whose hash defines the "
            "partition buckets); physical partition ids are not comparable "
            "across passes"
        )

    # df-level pre-rules applied ONCE here so pass 1 and pass 2 see the
    # same rows (validate() gets a plan copy with the flags cleared)
    if plan.drop_duplicates:
        df = df.dropDuplicates()
    if plan.drop_na:
        df = df.na.drop("any")
    inner_plan = dataclasses.replace(plan, drop_duplicates=False, drop_na=False)

    res = validate(
        spark, df, inner_plan, dims=dims, bucket_by=bucket_by, n_buckets=n_buckets
    )

    # ---- pass 1: violations + observe(stats, check counts) ---------------
    obs = Observation("validation_stats")
    agg_exprs = _stat_agg_exprs(df)
    check_count_exprs = [
        F.sum(F.array_contains(VIOLATIONS_COL, n).cast("long")).alias(f"__chk__{n}")
        for n in plan.check_names
        if not n.startswith("unique_key:")
    ]
    observed = res.flagged.observe(obs, *(agg_exprs + check_count_exprs))
    key_cols = plan.unique_keys[0] if plan.unique_keys else df.columns[:1]
    # deterministic per-row discriminator so two different rows sharing the
    # unique key (the very thing the engine detects) each count as a
    # violating row; byte-identical full rows still collapse — those are
    # exactly what drop_duplicates removes when declared
    from pysemantic_spark.operators.skew import hashable_cols

    row_hash = F.xxhash64(*[F.col(c) for c in hashable_cols(df)]).alias("_row_hash")
    viol = (
        observed.filter(F.size(VIOLATIONS_COL) > 0)
        .select(
            *key_cols,
            F.explode(VIOLATIONS_COL).alias("check_name"),
            BUCKET_COL,
            row_hash,
        )
    )
    _mark("compile_and_plan")
    if violations_sink:
        viol.write.format(sink_format).mode("overwrite").save(violations_sink)
        viol_small = spark.read.format(sink_format).load(violations_sink)
    else:
        viol_small = viol.persist()
        viol_small.count()  # force the pass
    metrics = obs.get
    _mark("pass1_violations_write")

    # ---- pass 2: skinny aggs, CONCURRENT actions --------------------------
    # Three independent jobs run here: (a) per-bucket violating-row counts
    # from the small violations output, (b) bucket totals (one pruned scan
    # of the bucket_by column), (c) the duplicate-key groups written to the
    # dupes sink. (a) and (b) are tiny (seconds of mostly fixed job cost)
    # but were serialized after (c) — pure driver round-trip latency. They
    # are submitted from helper threads while the main thread runs the big
    # dupes job: independent DAGs, so Spark schedules their tasks into the
    # idle slots of (c)'s waves (standard concurrent-jobs practice on real
    # clusters; PySpark actions are thread-safe). Saves ~2 s/run at every
    # cluster size — material to the N-vs-4N efficiency ratio, where the
    # serial floor is divided by nothing.
    #
    # Bucket totals stay a SEPARATE aggregation from the dup-key aggs on
    # purpose: grouping dupes by (key, bucket) would split a duplicated key
    # across buckets whenever bucket_by is not functionally dependent on
    # the key (each (key,bucket) group counts 1 → duplicates silently
    # missed). Dupes group by the key ALONE, exactly like validate().
    from concurrent.futures import ThreadPoolExecutor

    def _viol_rows_job():
        return _violating_rows_per_bucket(viol_small, key_cols).toPandas()

    def _totals_job():
        return (
            df.select(res._bucket_expr.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .toPandas()
        )

    # Duplicate-key groups for ALL declared keys (composite `uniqueness`
    # entries and per-column is_drop_duplicates alike), unioned. The result
    # is written to a sink, NEVER toPandas()'d: on a 10^12-row table with
    # pervasive duplication the dup-group frame is unbounded — only the
    # group COUNT belongs on the driver.
    dupes = None
    for key in plan.unique_keys:
        d = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("dup_count"))
            .filter(F.col("dup_count") > 1)
        )
        dupes = d if dupes is None else dupes.unionByName(d, allowMissingColumns=True)
    dupes_path = None
    n_dup_keys = 0
    with ThreadPoolExecutor(max_workers=2) as _pool:
        _viol_fut = _pool.submit(_viol_rows_job)
        _totals_fut = _pool.submit(_totals_job)
        if dupes is not None:
            if dupes_sink is None and violations_sink is not None:
                dupes_sink = violations_sink.rstrip("/") + "_dupes"
            if dupes_sink:
                dupes.write.format(sink_format).mode("overwrite").save(dupes_sink)
                dupes = spark.read.format(sink_format).load(dupes_sink)
                dupes_path = dupes_sink
            else:
                dupes = dupes.persist()
            n_dup_keys = dupes.count()
        viol_rows_per_bucket = _viol_fut.result()
        bucket_totals = _totals_fut.result()
    _mark("pass2_overlapped")

    # ---- drift: spec-declared distribution checks vs the baseline sketch --
    # One extra fused scan over ONLY the drift columns (all columns' bins
    # ride a single posexplode+agg); metrics computed driver-side from the
    # two tiny count vectors.
    drift_pdf = None
    if plan.drift is not None:
        from pysemantic_spark.operators.drift import spec_drift_report

        drift_pdf = spec_drift_report(df, plan.drift)
        if plan.drift.on_drift == "fail" and bool(drift_pdf["drifted"].any()):
            from pysemantic_spark.errors import DriftDetectedError

            bad = drift_pdf[drift_pdf["drifted"]]
            raise DriftDetectedError(
                "distribution drift over threshold (on_drift: fail): "
                + "; ".join(
                    f"{r.column}/{r.metric}={r.value} > {r.threshold}"
                    for r in bad.itertuples()
                ),
                report=drift_pdf,
            )

    report = bucket_totals.merge(viol_rows_per_bucket, on="bucket", how="left")
    report["n_violating_rows"] = (
        report["n_violating_rows"].fillna(0).astype("int64")
    )
    report["passed"] = report["n_violating_rows"] == 0
    report = report.sort_values("bucket").reset_index(drop=True)

    # ---- unpack observe() metrics into tall frames ------------------------
    n_rows = int(metrics["n_rows"])
    stats_rows = []
    for f_ in df.schema.fields:
        c = f_.name
        stats_rows.append(
            {
                "column": c,
                "n_rows": n_rows,
                "n_nulls": int(metrics[f"{c}__nulls"] or 0),
                "null_rate": (int(metrics[f"{c}__nulls"] or 0) / n_rows) if n_rows else 0.0,
                "min": metrics[f"{c}__min"],
                "max": metrics[f"{c}__max"],
                "approx_distinct": int(metrics[f"{c}__approx_distinct"] or 0),
            }
        )
    counts_rows = [
        {"check_name": n, "n_violations": int(metrics[f"__chk__{n}"] or 0)}
        for n in plan.check_names
        if not n.startswith("unique_key:")
    ]
    if not violations_sink:
        viol_small.unpersist(blocking=True)

    return {
        "n_rows": n_rows,
        "stats": pd.DataFrame(stats_rows),
        "check_counts": pd.DataFrame(counts_rows),
        "partition_report": report,
        "dupes": dupes,
        "n_dup_keys": n_dup_keys,
        "dupes_path": dupes_path,
        "drift": drift_pdf,
        "violations_path": violations_sink,
        # wall-clock per phase (driver-observed) — the scaling protocol
        # uses this to attribute serial overhead (commits, driver
        # round-trips) separately from the parallelizable passes
        "timings": _timings,
    }


def _apply_postprocessors(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    """Column postprocessors = named vectorized pandas Series fns (Arrow
    batches) resolved from the CONVERTER registry — register them with
    ``register_converter()`` (same callable shape as converters; only the
    application point differs: converters run at load, postprocessors run
    on the cleaned survivors). Df-level postprocessors = named
    DataFrame→DataFrame transforms from ``register_postprocessor()``.
    Unknown names raise ParserArgumentError at plan time, matching the
    converters path. No per-row Python anywhere."""
    from pysemantic_spark.errors import ParserArgumentError
    from pysemantic_spark.sources.readers import (
        CONVERTER_REGISTRY,
        POSTPROCESSOR_REGISTRY,
    )

    for col, rules in spec.column_rules.items():
        for name in rules.postprocessors:
            fn = CONVERTER_REGISTRY.get(name)
            if fn is None:
                raise ParserArgumentError(
                    f"{spec.name}: unknown column postprocessor {name!r} for "
                    f"{col!r} — register a pandas Series fn via "
                    "register_converter()"
                )
            udf = F.pandas_udf(fn, returnType=df.schema[col].dataType)
            df = df.withColumn(col, udf(F.col(col)))
    for name in spec.postprocessors:
        fn = POSTPROCESSOR_REGISTRY.get(name)
        if fn is None:
            raise ParserArgumentError(
                f"{spec.name}: unknown postprocessor {name!r} — register a "
                "DataFrame transform via register_postprocessor()"
            )
        df = df.transform(fn)
    return df


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
