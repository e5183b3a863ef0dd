"""Spec → CheckPlan: compile YAML trait rules into Spark Column predicates.

This is the analog of the reference's SchemaValidator.get_parser_args()
(pysemantic/validator.py, the 'kwargs dict' physical plan) — except our IR is
a set of **vectorized Boolean Column expressions** plus aggregation/join
specs, so Catalyst folds constants, fuses the whole rule set into one
whole-stage-codegen projection, and pushes column pruning to the scan.

Check kinds:
- row checks (violation = Boolean expr per row):
    not_null, min, max, regex, levels, exclude, bad_cast
- key checks: unique_key (composite-key duplicate detection)
- join checks: referential (broadcast anti-join vs a dimension table)
- distribution checks: drift (KS/PSI vs a baseline sketch; operators/drift.py)

Violation-predicate semantics (match the reference SeriesValidator.clean()
row-drop behavior, SURVEY.md §2.2):
- value-based checks (min/max/regex/levels/bad_cast) do NOT fire on NULL —
  nullability is its own rule (`is_drop_na`), so a null row is counted once.
- `exclude` fires only on listed values; a row survives cleaning iff it fires
  no check (conjunction), which makes rule order irrelevant for survivors.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysemantic_spark.errors import SpecValidationError
from pysemantic_spark.spec import ColumnRules, DatasetSpec

_SPARK_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}


def spark_type(canonical: str) -> T.DataType:
    return _SPARK_TYPES[canonical]


@dataclass
class Check:
    """One compiled check. ``name`` keys every downstream artifact
    (violation rows, stats counters, partition report columns)."""

    name: str
    kind: str
    column: str | None = None
    key: list[str] = field(default_factory=list)
    params: dict[str, Any] = field(default_factory=dict)

    def violation_expr(self) -> Column:
        """Boolean Column: True where this row violates the check.

        Null-safe: wrapped so three-valued logic can never leak a NULL
        into the violation bitmap.
        """
        c = F.col(self.column)
        k = self.kind
        if k == "not_null":
            return c.isNull()
        if k in ("min", "max"):
            v = self.params["value"]
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                # ANSI mode: comparing a raw string column to a numeric
                # literal would THROW on unparseable values; try_cast makes
                # them NULL (they surface via bad_cast / null-rate instead).
                # Integral declared types compare as LONG — routing longs
                # through double would lose exactness past 2^53.
                declared = self.params.get("col_dtype")
                if declared in ("int", "long") and isinstance(v, int):
                    cc = c.try_cast("long")
                    bound = F.lit(int(v))
                else:
                    cc = c.try_cast("double")
                    bound = F.lit(float(v))
            else:
                cc = c
                bound = F.lit(v)
            cmp = (cc < bound) if k == "min" else (cc > bound)
            expr = c.isNotNull() & cmp
        elif k == "regex":
            # rlike = unanchored search, matching the reference's re.search
            expr = c.isNotNull() & ~c.rlike(self.params["pattern"])
        elif k == "levels":
            expr = c.isNotNull() & ~c.isin(*self.params["values"])
        elif k == "exclude":
            expr = c.isNotNull() & c.isin(*self.params["values"])
        elif k == "bad_cast":
            # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain
            # cast THROW on malformed input instead of yielding NULL
            t = spark_type(self.params["dtype"])
            expr = c.isNotNull() & c.try_cast(t).isNull()
        else:
            raise SpecValidationError(f"{self.name}: not a row check ({k})")
        return F.coalesce(expr, F.lit(False))


@dataclass
class ReferentialCheck:
    name: str
    column: str
    dim_table: str  # logical name or path; resolved by the runner via `dims`
    dim_column: str


@dataclass
class CheckPlan:
    """Compiled plan for one dataset spec."""

    spec: DatasetSpec
    row_checks: list[Check] = field(default_factory=list)
    unique_keys: list[list[str]] = field(default_factory=list)
    referential: list[ReferentialCheck] = field(default_factory=list)
    drop_duplicates: bool = False
    drop_na: bool = False
    # DriftSpec carried into the executable plan (None = no drift: block).
    # Consumed by execute(): current-side sketches in one fused scan,
    # compared against the baseline sketch file (operators/drift.py).
    drift: Any = None

    @property
    def check_names(self) -> list[str]:
        names = [c.name for c in self.row_checks]
        names += [r.name for r in self.referential]
        names += ["unique_key:" + ",".join(k) for k in self.unique_keys]
        return names


def _compile_column(rules: ColumnRules, declared_dtype: str | None) -> list[Check]:
    col = rules.column
    checks: list[Check] = []
    if rules.is_drop_na:
        checks.append(Check(f"not_null:{col}", "not_null", col))
    if rules.min is not None:
        checks.append(
            Check(f"min:{col}", "min", col,
                  params={"value": rules.min, "col_dtype": declared_dtype})
        )
    if rules.max is not None:
        checks.append(
            Check(f"max:{col}", "max", col,
                  params={"value": rules.max, "col_dtype": declared_dtype})
        )
    if rules.regex is not None:
        checks.append(Check(f"regex:{col}", "regex", col, params={"pattern": rules.regex}))
    if rules.unique_values is not None:
        checks.append(
            Check(f"levels:{col}", "levels", col, params={"values": rules.unique_values})
        )
    if rules.exclude is not None:
        checks.append(
            Check(f"exclude:{col}", "exclude", col, params={"values": rules.exclude})
        )
    return checks


def compile_spec(spec: DatasetSpec) -> CheckPlan:
    """Compile a validated DatasetSpec into a CheckPlan.

    Raises SpecValidationError for rule/dtype contradictions (the reference
    raises TraitError at SchemaValidator construction for its
    bad_dictionary.yaml fixtures — same compile-time timing here).
    """
    plan = CheckPlan(
        spec=spec, drop_duplicates=spec.drop_duplicates, drop_na=spec.drop_na
    )
    # dtype enforcement covers EVERY declared non-string dtype, with or
    # without other rules on the column
    for col, dtype in spec.dtypes.items():
        if dtype != "string":
            plan.row_checks.append(
                Check(f"bad_cast:{col}", "bad_cast", col, params={"dtype": dtype})
            )
    for col, rules in spec.column_rules.items():
        declared = spec.dtypes.get(col)
        plan.row_checks.extend(_compile_column(rules, declared))
        if rules.is_drop_duplicates:
            plan.unique_keys.append([col])
        if rules.reference is not None:
            plan.referential.append(
                ReferentialCheck(
                    name=f"referential:{col}",
                    column=col,
                    dim_table=rules.reference["table"],
                    dim_column=rules.reference["column"],
                )
            )
    for key in spec.uniqueness:
        plan.unique_keys.append(list(key))
    if spec.drift is not None:
        if not spec.drift.columns:
            raise SpecValidationError("drift: block needs a non-empty `columns` list")
        if spec.drift.n_bins <= 0:
            raise SpecValidationError(
                f"drift: n_bins must be positive, got {spec.drift.n_bins}"
            )
        plan.drift = spec.drift
    return plan
