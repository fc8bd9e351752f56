"""Column profiling: one-pass data-quality stats for pipeline auditing.

A 100 TB ingest needs cheap answers to "what's in this table" before any
model sees it: null rates, cardinalities, ranges.  ``profile_columns``
computes every column's stats in a SINGLE aggregation job (one scan; the
distinct counts expand via Catalyst's Expand operator, still one shuffle
round), then unpivots driver-side-free via ``stack`` into a tall
(column, metric...) table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Profile ``cols``: rows, non-null count, distinct count, min, max.

    Returns one row per column: (column, n_rows, n_nonnull, n_distinct,
    min_val, max_val) with min/max stringified so heterogeneous column
    types coexist in one result.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.select(
        F.col("__rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, n_nonnull, n_distinct, min_val, max_val)"
        ),
    ).select("column", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")
