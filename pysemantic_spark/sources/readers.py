"""Source readers: compile a DatasetSpec's ingest keys into a Spark scan.

Analog of the reference's parser-args compilation + dispatch
(pysemantic/validator.py :: SchemaValidator.get_parser_args and
pysemantic/project.py :: Project.load_dataset): sep/header/column_names/
use_columns/dtypes/na_values/nrows/converters, multi-file concat, md5
verification — re-expressed as Spark reader options + Column casts so
Catalyst keeps projection pruning and scan-level null handling.

Differences by design (SURVEY.md §1.2):
- int-with-NA: Spark IntegerType is natively nullable; failed casts yield
  NULL and surface through the null-rate check instead of a parse quirk.
- converters: named vectorized functions from a registry, wrapped as Arrow
  `pandas_udf`s — the only Python in the path, batch-at-a-time.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysemantic_spark.errors import ParserArgumentError
from pysemantic_spark.plans.compiler import spark_type
from pysemantic_spark.spec import DatasetSpec

def normalize_ws(s: pd.Series) -> pd.Series:
    """Collapse internal whitespace runs and strip — the canonical example
    of a module-level converter reachable from a spec file by dotted path
    (``converters: ["pysemantic_spark.sources.readers:normalize_ws"]``).
    Module-level (not a lambda) so pickling is by reference and any
    executor that can import the package can run it."""
    return s.str.replace(r"\s+", " ", regex=True).str.strip()


# named converter registry: YAML references converters by name; the engine
# resolves them here (arbitrary callables can't live in YAML safely)
CONVERTER_REGISTRY: dict[str, Callable[[pd.Series], pd.Series]] = {
    "strip": lambda s: s.str.strip(),
    "lower": lambda s: s.str.lower(),
    "upper": lambda s: s.str.upper(),
    "abs": lambda s: s.abs(),
    "normalize_ws": normalize_ws,
}


def register_converter(name: str, fn: Callable[[pd.Series], pd.Series]) -> None:
    CONVERTER_REGISTRY[name] = fn


# Modules (prefix match on dotted segments) a spec file may name in a
# ``module:function`` converter reference. Importing a module runs
# arbitrary code, so an UNRESTRICTED dotted path would let any untrusted
# YAML spec execute whatever is on sys.path at compile time — the exact
# hole the whitelisted !!python/name loader in spec.py closes. Engine code
# opts additional trusted prefixes in via allow_converter_modules(); the
# PYSEMANTIC_SPARK_CONVERTER_MODULES env var (colon-separated prefixes)
# covers spark-submit deployments where the spec and job config travel
# together.
ALLOWED_CONVERTER_MODULES: list[str] = ["pysemantic_spark"]


def allow_converter_modules(*prefixes: str) -> None:
    """Opt trusted module prefixes into dotted-path converter resolution."""
    for p in prefixes:
        if p not in ALLOWED_CONVERTER_MODULES:
            ALLOWED_CONVERTER_MODULES.append(p)


def _converter_module_allowed(mod_name: str) -> bool:
    allowed = list(ALLOWED_CONVERTER_MODULES)
    env = os.environ.get("PYSEMANTIC_SPARK_CONVERTER_MODULES", "")
    allowed += [p for p in env.split(":") if p]
    return any(
        mod_name == p or mod_name.startswith(p + ".") for p in allowed
    )


def resolve_converter(name: str) -> Callable[[pd.Series], pd.Series]:
    """Registry lookup, with an allowlist-gated ``module.sub:function``
    dotted-path escape.

    The reference's converters are arbitrary YAML-referenced callables
    (SURVEY §2.2 C10, SchemaValidator.converters ≈L140). The registry is
    the safe default; the dotted path lets a spec-file-only user reference
    their own vectorized Series→Series function without touching engine
    code — resolved at COMPILE time so a typo fails the spec, not a task.
    Only modules opted in via :func:`allow_converter_modules` (or the
    PYSEMANTIC_SPARK_CONVERTER_MODULES env var) resolve, so an untrusted
    spec file cannot trigger arbitrary imports. The resolved callable must
    still be importable on executors (ship it with --py-files), same
    contract as any pandas_udf."""
    if name in CONVERTER_REGISTRY:
        return CONVERTER_REGISTRY[name]
    if ":" in name:
        mod_name, _, fn_name = name.partition(":")
        if not _converter_module_allowed(mod_name):
            raise ParserArgumentError(
                f"converter {name!r}: module {mod_name!r} is not on the "
                f"converter allowlist — call allow_converter_modules"
                f"({mod_name.split('.')[0]!r}) in engine code or set "
                f"PYSEMANTIC_SPARK_CONVERTER_MODULES (untrusted spec files "
                f"must not name arbitrary import paths)"
            )
        import importlib

        try:
            mod = importlib.import_module(mod_name)
        except ImportError as e:
            raise ParserArgumentError(
                f"converter {name!r}: cannot import module {mod_name!r} ({e})"
            ) from None
        fn = getattr(mod, fn_name, None)
        if not callable(fn):
            raise ParserArgumentError(
                f"converter {name!r}: {mod_name!r} has no callable {fn_name!r}"
            )
        return fn
    raise ParserArgumentError(
        f"unknown converter {name!r} (not registered; allowlisted "
        f"'module:function' dotted paths are accepted)"
    )


# named DataFrame→DataFrame postprocessors (reference: df-level
# `postprocessors` spec key, DataFrameValidator ≈L500); applied via
# df.transform AFTER cleaning
POSTPROCESSOR_REGISTRY: dict[str, Callable[[DataFrame], DataFrame]] = {
    "drop_empty_strings": lambda df: df.na.replace("", None),
}


def register_postprocessor(name: str, fn: Callable[[DataFrame], DataFrame]) -> None:
    POSTPROCESSOR_REGISTRY[name] = fn


def infer_format(path: str, declared: str | None) -> str:
    if declared:
        return declared
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    return {"csv": "csv", "tsv": "tsv", "txt": "csv", "parquet": "parquet",
            "xlsx": "excel", "xls": "excel"}.get(ext, "parquet")


def _md5_many(paths: list[str]) -> str:
    """Checksum of the concatenated byte streams of all files, in order."""
    h = hashlib.md5()
    for p in paths:
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def get_md5_checksum(path: str) -> str:
    """Reference: pysemantic/utils.py :: get_md5_checksum."""
    return _md5_many([path])


def load_dataset(spark: SparkSession, spec: DatasetSpec) -> DataFrame:
    """Scan per the spec: format dispatch, options, projection, renames,
    NA handling, casts, converters, nrows, multifile union, md5 check."""
    if spec.path is None:
        raise ParserArgumentError(f"{spec.name}: spec has no path")
    paths = spec.path if isinstance(spec.path, list) else [spec.path]
    for p in paths:
        if not os.path.exists(p):
            raise ParserArgumentError(f"{spec.name}: path does not exist: {p}")
    if spec.md5:
        # multi-file datasets: checksum over all files in declared order
        actual = _md5_many(paths)
        if actual != spec.md5:
            raise ParserArgumentError(
                f"{spec.name}: md5 mismatch (expected {spec.md5}, got {actual})"
            )

    fmt = infer_format(paths[0], spec.format)
    frames = [_read_one(spark, p, fmt, spec) for p in paths]
    df = frames[0]
    for other in frames[1:]:
        df = df.unionByName(other, allowMissingColumns=True)

    df = _apply_projection(df, spec)
    df = _apply_renames(df, spec)
    df = _apply_na_values(df, spec)
    df = _apply_combine_dt(df, spec)
    df = _apply_casts(df, spec)
    df = _apply_converters(df, spec)
    if spec.ncols is not None and len(df.columns) != spec.ncols:
        raise ParserArgumentError(
            f"{spec.name}: expected {spec.ncols} columns, found {len(df.columns)}"
        )
    df = _apply_nrows(df, spec)
    return df


def _apply_nrows(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    """int → head-limit; dict form → random sample.

    `fraction` is the scale path: df.sample is a per-partition Bernoulli
    filter — no shuffle, no driver involvement, works unchanged at 10^12
    rows. `count` compiles to orderBy(rand(seed)).limit(n) =
    TakeOrderedAndProject: a bounded per-partition top-k heap merged on the
    driver — O(n) memory in the requested count, NOT in the data size."""
    if spec.nrows is None:
        return df
    if isinstance(spec.nrows, dict):
        seed = int(spec.nrows.get("seed", 42))
        frac = spec.nrows.get("fraction")
        if frac is not None:
            return df.sample(fraction=float(frac), seed=seed)
        return df.orderBy(F.rand(seed)).limit(int(spec.nrows["count"]))
    return df.limit(spec.nrows)


# fallback patterns tried (in order) when no explicit format is declared:
# Spark's default timestamp parse, then the pandas parse_dates part-column
# shapes ('2021 3 7', '2021 3 7 14 5 9') that the default pattern rejects
_COMBINE_DT_FALLBACKS = ("yyyy M d", "yyyy M d H m s")


def _apply_combine_dt(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    """Build one timestamp from several raw columns (pandas parse_dates
    list form): sources string-concatenated with a space, parsed via
    try_to_timestamp (ANSI-safe: malformed rows → NULL, surfacing through
    null-rate / not_null checks), sources dropped.

    With an explicit ``format`` only that pattern is used; otherwise the
    default parse plus the common part-column fallbacks are coalesced.
    Guard against silent whole-column loss: a bounded sample (first rows
    only, never a full scan) is checked eagerly — if every non-empty
    combined string parses to NULL, the spec is wrong for this data and
    the load fails loudly with a format hint instead of shipping an
    all-NULL timestamp column."""
    for out, decl in (spec.combine_dt_columns or {}).items():
        fmt = None
        srcs = decl
        if isinstance(decl, dict):
            srcs = decl["columns"]
            fmt = decl.get("format")
        missing = [c for c in srcs if c not in df.columns]
        if missing:
            raise ParserArgumentError(
                f"{spec.name}: combine_dt_columns[{out!r}] references missing "
                f"columns {missing}"
            )
        combined = F.concat_ws(" ", *[F.col(c).cast("string") for c in srcs])
        if fmt is not None:
            parsed = F.try_to_timestamp(combined, F.lit(fmt))
        else:
            parsed = F.coalesce(
                F.try_to_timestamp(combined),
                *[F.try_to_timestamp(combined, F.lit(p)) for p in _COMBINE_DT_FALLBACKS],
            )
        probe = (
            df.select(combined.alias("_c"), parsed.alias("_p"))
            .filter(F.trim(F.col("_c")) != "")
            .limit(500)
            .agg(
                F.count(F.lit(1)).alias("n_nonempty"),
                F.count("_p").alias("n_parsed"),
                F.first("_c").alias("example"),
            )
            .first()
        )
        if probe["n_nonempty"] > 0 and probe["n_parsed"] == 0:
            raise ParserArgumentError(
                f"{spec.name}: combine_dt_columns[{out!r}] parsed 0 of "
                f"{probe['n_nonempty']} sampled non-empty values (example: "
                f"{probe['example']!r}) — the whole column would be NULL. "
                "Declare an explicit Spark datetime pattern, e.g. "
                f"{out}: {{columns: {list(srcs)!r}, format: 'yyyy M d'}}"
            )
        df = df.withColumn(out, parsed)
        df = df.drop(*[c for c in srcs if c != out])
    return df


def _read_one(spark: SparkSession, path: str, fmt: str, spec: DatasetSpec) -> DataFrame:
    if fmt in ("csv", "tsv"):
        sep = "\t" if fmt == "tsv" else (spec.delimiter or ",")
        # header semantics (reference: pandas `header`): None/False → no
        # header row; True/0 → first row is the header. Offsets > 0 (skip
        # leading rows) have no Spark csv-reader equivalent — fail loudly
        # rather than silently consuming data rows as a header.
        if spec.header is None or spec.header is False:
            header_opt = "false"
        elif spec.header is True or spec.header == 0:
            header_opt = "true"
        else:
            raise ParserArgumentError(
                f"{spec.name}: header row offsets > 0 are not supported "
                f"(got header={spec.header!r}); preprocess the file or use "
                "header: 0"
            )
        reader = (
            spark.read.option("sep", sep)
            .option("header", header_opt)
            # dtypes declared → read everything as STRING in one scan:
            # (a) declared-string columns keep raw text (leading zeros!),
            # (b) ALL na_values sentinels null out while columns are still
            #     strings, (c) declared types apply via try_cast afterwards,
            # (d) no second inference scan of the file.
            # No dtypes → fall back to inference (reference behavior).
            .option("inferSchema", "false" if spec.dtypes else "true")
        )
        if spec.na_values:
            # Spark csv supports one nullValue; remaining handled post-scan
            reader = reader.option("nullValue", str(spec.na_values[0]))
        return reader.csv(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "excel":
        # tiny dimension tables only: driver-side pandas, then parallelize.
        # Engine pinned by extension so failure modes are deterministic
        # (pandas' format sniff raises a confusing ValueError otherwise).
        engine = "xlrd" if path.lower().endswith(".xls") else "openpyxl"
        try:
            pdf = pd.read_excel(path, engine=engine)
        except ImportError as e:
            raise ParserArgumentError(
                f"{spec.name}: reading Excel requires the {engine!r} engine "
                f"(pip install {engine}): {e}"
            ) from None
        return spark.createDataFrame(pdf)
    raise ParserArgumentError(f"{spec.name}: unsupported format {fmt!r}")


def _apply_projection(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    if spec.use_columns:
        return df.select(*[c for c in spec.use_columns if c in df.columns])
    if spec.exclude_columns:
        keep = [c for c in df.columns if c not in set(spec.exclude_columns)]
        return df.select(*keep)
    return df


def _apply_renames(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    if isinstance(spec.column_names, list):
        if len(spec.column_names) != len(df.columns):
            raise ParserArgumentError(
                f"{spec.name}: column_names has {len(spec.column_names)} names "
                f"for {len(df.columns)} columns"
            )
        return df.toDF(*spec.column_names)
    if isinstance(spec.column_names, dict):
        return df.withColumnsRenamed(spec.column_names)
    return df


def _na_match_expr(field: T.StructField, vals: list) -> "F.Column | None":
    """Boolean Column: True where the value equals any sentinel, matched by
    the column's TYPE (pandas na_values applies to every column, not just
    strings): string columns compare raw text; numeric columns compare
    parsed numeric literals ('-999' nulls a -999 in an inferred-int column);
    other types compare their string rendering. ANSI-safe (try_cast only)."""
    c = F.col(field.name)
    if isinstance(field.dataType, T.StringType):
        return c.isin([str(v) for v in vals])
    if isinstance(field.dataType, T.NumericType):
        nums = []
        for v in vals:
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                nums.append(v)
            else:
                try:
                    f = float(str(v))
                    nums.append(int(f) if f.is_integer() else f)
                except ValueError:
                    continue  # 'NA' can never equal a numeric value
        return c.isin(nums) if nums else None
    return c.try_cast("string").isin([str(v) for v in vals])


def _apply_na_values(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    """Null out sentinel values — ONE projection for the whole table
    (a withColumn per (sentinel × column) bloats the plan on wide tables)."""
    sentinels = list(spec.na_values or [])
    per_col = {
        col: list(rules.na_values or []) for col, rules in spec.column_rules.items()
    }
    exprs: dict[str, F.Column] = {}
    for field in df.schema.fields:
        vals = sentinels + per_col.get(field.name, [])
        if not vals:
            continue
        match = _na_match_expr(field, vals)
        if match is not None:
            exprs[field.name] = (
                F.when(match, None).otherwise(F.col(field.name))
            )
    return df.withColumns(exprs) if exprs else df


def _apply_casts(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    casts = {}
    for col, t in spec.dtypes.items():
        if col in df.columns:
            current = df.schema[col].dataType
            target = spark_type(t)
            if current != target:
                # try_cast: under ANSI mode a failed cast must yield NULL
                # (surfacing via null-rate / bad_cast checks), not throw
                casts[col] = F.col(col).try_cast(target)
    return df.withColumns(casts) if casts else df


def _apply_converters(df: DataFrame, spec: DatasetSpec) -> DataFrame:
    for col, rules in spec.column_rules.items():
        for name in rules.converters:
            try:
                fn = resolve_converter(name)
            except ParserArgumentError as e:
                raise ParserArgumentError(f"{spec.name}: column {col!r}: {e}") from None
            dtype = df.schema[col].dataType

            udf = F.pandas_udf(fn, returnType=dtype)
            df = df.withColumn(col, udf(F.col(col)))
    return df
