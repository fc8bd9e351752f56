"""Vector math over array<float> embedding columns — built-in higher-order
functions only (zip_with + aggregate), JVM-side, no UDF.

Elements are cast to double before any arithmetic so accumulation order and
precision match a sequential double fold — reproducible in DuckDB
(list_transform + list_sum over the zipped pair) and stable across
partitionings (per-row computation, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
