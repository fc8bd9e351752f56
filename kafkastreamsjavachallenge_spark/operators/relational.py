"""Relational breadth: joins, aggregation variants, analytic windows,
sorts/top-k, set ops.

The reference has none of these (its topology is a single linear chain,
UniqueUsersApp.java:91-198); they are the declared extension surface of
SURVEY.md §2.2 for the t2 relational coverage.  Everything is built-in
Catalyst — the value added here is the *physical strategy* choices that
survive a 100×/1000× scale-up:

- ``broadcast_join``: explicit broadcast hints for dimension tables so the
  fact-side scan never shuffles.
- ``top_k``: orderBy+limit compiles to TakeOrderedAndProject — a per
  -partition heap + driver merge, not a global sort.
- ``asof_join``: Spark lacks AS-OF; we express it as join + ranked window,
  a composition of existing DataFrame ops (SURVEY.md §4.2 guidance).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------- joins

def equi_join(
    left: DataFrame, right: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join; Catalyst picks BHJ vs SMJ from stats + AQE."""
    return left.join(right, on=on, how=how)


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact ⋈ broadcast(dim): no shuffle of the fact side.

    At 100 TB the fact scan dominates; broadcasting the dimension keeps the
    join inside the scan stage (one whole-stage-codegen span, zero exchange).
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def range_join(
    left: DataFrame, right: DataFrame, condition: Column
) -> DataFrame:
    """Theta/band join on a range predicate.

    Spark executes this as BroadcastNestedLoopJoin when one side is small —
    keep the small side filtered first (done by callers) so the NLJ input is
    bounded.  For large-large band joins, pre-bucketing both sides on
    floor(value/band_width) turns it into an equi-join + residual filter.
    """
    return left.join(right, on=condition)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """AS-OF join: for each left row, the single latest (backward) right row
    with right_ts <= left_ts, per key.

    Implemented as equi-join on the key + event-time inequality + rank-1
    window — all shuffles are on the join key, so it scales like a normal
    equi-join.  ``tolerance`` bounds how far back to look (keeps the
    intermediate join slim, analogous to a watermark).
    """
    cmp = (
        (F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}"))
        if direction == "backward"
        else (F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}"))
    )
    cond = (F.col(f"__l.{on}") == F.col(f"__r.{on}")) & cmp
    if tolerance is not None:
        low = (
            F.col(f"__r.{right_ts}") >= F.col(f"__l.{left_ts}") - tolerance
            if direction == "backward"
            else F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}") + tolerance
        )
        cond = cond & low
    joined = left.alias("__l").join(right.alias("__r"), on=cond, how="left")
    order = (
        F.col(f"__r.{right_ts}").desc_nulls_last()
        if direction == "backward"
        else F.col(f"__r.{right_ts}").asc_nulls_last()
    )
    w = Window.partitionBy(*[F.col(f"__l.{c}") for c in left.columns]).orderBy(order)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__r.{c}").alias(c) for c in right.columns if c != on
    ]
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


# ---------------------------------------------------------- sorts / top-k

def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Top-k = orderBy + limit → TakeOrderedAndProject (heap, no full sort).

    Callers must make ``order`` a total order (tie-break on a unique key)
    for deterministic results.
    """
    return df.orderBy(*order).limit(k)


# ------------------------------------------------------------- grouping

def rollup_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    return df.cube(*keys).agg(*aggs)
