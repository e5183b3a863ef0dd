from pysemantic_spark.operators.runner import ValidationResult, validate

__all__ = ["ValidationResult", "validate"]
