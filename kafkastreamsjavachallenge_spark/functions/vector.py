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


def pandas_cosine_to(query_vec: list[float]):
    """Arrow-vectorized cosine against a fixed query vector.

    The numpy path: each Arrow batch's embedding column becomes one
    (batch, dim) matrix and the score is a single matrix-vector product —
    the shape to prefer when scoring against MANY query vectors at once
    (matrix-matrix) or when the HOF fold becomes the bottleneck at very
    high dimensionality.  For the single-query case the built-in
    ``cosine`` above stays JVM-side and needs no Python workers; both
    paths are equivalence-tested (tests/test_operators.py).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype="float64")
    qn = np.sqrt((q * q).sum())

    def _score(s):
        import pandas as pd

        m = np.stack(s.apply(lambda v: np.asarray(v, dtype="float64")))
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return pandas_udf(_score, "double")


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance — same HOF fold shape as ``dot``."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
