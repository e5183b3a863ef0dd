"""pysemantic_spark — a PySpark-native schema + constraint validation engine.

A from-scratch reimplementation of the *capabilities* of jaidevd/pysemantic
(a traits-based, YAML-driven validation/cleaning library for pandas), rebuilt
Spark-first for Iceberg/Parquet tables of multi-turn conversation transcripts
at 10^12-turn scale:

- YAML trait specs (dtype, min/max, regex, nullability, uniqueness,
  referential integrity, categorical levels) compile to **vectorized
  DataFrame constraint predicates** — one fused projection pass, all JVM-side
  whole-stage-codegen, no per-row Python.
- Per-column stats via one wide aggregation (count / null-rate / min / max /
  approx_count_distinct).
- Uniqueness on (conv_id, turn_idx) via sort-merge dedup counts; referential
  checks via broadcast anti-joins; KS/PSI drift via Arrow `applyInPandas`
  sketches.
- Per-partition pass/fail rows + violation-row DataFrames written back to the
  table store; resumable from a checkpoint manifest with per-partition
  lineage + metrics.

Reference semantics: pysemantic/validator.py (SchemaValidator /
SeriesValidator / DataFrameValidator), pysemantic/project.py (registry +
load_dataset), per SURVEY.md. This is a re-expression on Spark, not a port.
"""

from pysemantic_spark.errors import (
    MissingConfigError,
    MissingProject,
    ParserArgumentError,
    SpecValidationError,
)
from pysemantic_spark.spec import ColumnRules, DatasetSpec, load_spec_file
from pysemantic_spark.plans.compiler import CheckPlan, compile_spec
from pysemantic_spark.operators.runner import ValidationResult, execute, validate
from pysemantic_spark.registry import Project

__version__ = "0.1.0"

__all__ = [
    "MissingProject",
    "MissingConfigError",
    "ParserArgumentError",
    "SpecValidationError",
    "DatasetSpec",
    "ColumnRules",
    "load_spec_file",
    "CheckPlan",
    "compile_spec",
    "ValidationResult",
    "validate",
    "execute",
    "Project",
]
