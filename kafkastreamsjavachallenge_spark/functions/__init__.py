"""Scalar / higher-order function packs: JSON, text, vector math.

All built on ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) —
UDFs only where Spark genuinely lacks the primitive (none so far; the
pandas_udf in text.py exists to exercise the Arrow UDF surface)."""
