"""Grouped-map operators via ``applyInPandas`` — the Arrow-batched escape
hatch for per-group logic the built-in aggregates cannot express
(SURVEY.md §4.2 guidance: composition first, pandas second).

``normalize_per_group`` itself IS expressible with window functions — it
exists (and is oracle-checked) precisely to pin the applyInPandas surface:
schema contract, group partitioning, Arrow batch shape.  Real users slot
model scoring / per-group fitting into the same shape.

Scale: one shuffle on the group key; each group must fit one executor's
memory (the applyInPandas contract) — for skewed/huge groups fall back to
window functions or salted pre-aggregation (operators/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    ddof: int = 1,
) -> DataFrame:
    """z-score ``value_col`` within each ``group_col`` group.

    Output: (id_col, group_col, z) with z = (x - mean) / std rounded to 4;
    null when the group std is 0/undefined (singleton groups).
    """

    def _norm(pdf):
        import pandas as pd

        std = pdf[value_col].std(ddof=ddof)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std == std else None
        # + 0.0 normalizes IEEE -0.0: numpy round preserves the sign of
        # zero (unlike Spark's BigDecimal round and unlike the +0-guarded
        # oracles), and the driver compares strings ('-0.0' != '0.0')
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                "z": None if z is None else z.round(4) + 0.0,
            }
        )

    schema = f"{id_col} long, {group_col} string, z double"
    return df.groupBy(group_col).applyInPandas(_norm, schema=schema)
