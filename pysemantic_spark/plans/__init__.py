from pysemantic_spark.plans.compiler import Check, CheckPlan, compile_spec

__all__ = ["Check", "CheckPlan", "compile_spec"]
