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

    Implemented as equi-join on the key + event-time inequality, then ONE
    hash aggregation with ``max_by``/``min_by`` over the right-row struct —
    no sort, no rank window.  All shuffles are on the join key, so it
    scales like a normal equi-join; the agg is partial map-side.  Ties on
    ``right_ts`` resolve arbitrarily (callers needing total determinism
    add a tie-break column to ``right_ts``).  ``tolerance`` bounds how far
    back to look (keeps the intermediate join slim, analogous to a
    watermark).
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
    pick = F.max_by if direction == "backward" else F.min_by
    right_out = [c for c in right.columns if c != on]
    rstruct = F.struct(*[F.col(f"__r.{c}").alias(c) for c in right_out])
    best = pick(rstruct, F.col(f"__r.{right_ts}")).alias("__best")
    grouped = joined.groupBy(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns]
    ).agg(best)
    return grouped.select(
        *left.columns,
        *[F.col(f"__best.{c}").alias(c) for c in right_out],
    )


# ---------------------------------------------------------- sorts / top-k

def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Top-k = orderBy + limit → TakeOrderedAndProject (heap, no full sort).

    Callers must make ``order`` a total order (tie-break on a unique key)
    for deterministic results.
    """
    return df.orderBy(*order).limit(k)


# ----------------------------------------------------------------- skew

def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting for skewed group keys.

    Phase 1 groups on (keys, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of one; phase 2 re-combines the
    partials on the true keys.  ``aggs`` maps output name →
    (partial_expr, merge_expr) where merge_expr runs over the phase-1
    column of the same name, e.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),  F.sum("n")),
            "tot": (F.sum("x"),         F.sum("tot")),
        })

    AQE's skew-join splitting handles *join* skew at runtime; aggregation
    skew still needs the salt because a single group's final combine is
    otherwise pinned to one task.  For non-decomposable aggregates
    (countDistinct) use dedup-then-count instead.
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit salting of a skewed left side.

    The skewed side gets a random-ish salt (derived from a stable hash of
    all columns so the plan stays deterministic); the other side is
    replicated ``salt_buckets``× via an exploded salt array.  The join key
    becomes (on, salt) — a hot key's rows land on ``salt_buckets``
    reducers.  Prefer AQE skew handling when it triggers; this is the
    explicit form for when it cannot (e.g. a skewed aggregation feeding the
    join, or a build side too large for AQE's split heuristic).
    """
    salted_left = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)),
    )
    replicated = other.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<bigint>")),
    )
    out = salted_left.join(replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")


# ------------------------------------------------------------- grouping

def rollup_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: Sequence[str], *aggs: Column) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


# ---------------------------------------------------------- spatial near-join


def grid_near_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    lat: str = "lat",
    lon: str = "lon",
    cell_deg: float = 10.0,
) -> DataFrame:
    """Distance near-join via grid bucketing: the left side is replicated
    into its 3x3 cell neighborhood (bounded 9x explode), both sides key on
    the (cell_x, cell_y) grid cell, and the exact haversine predicate
    prunes after the equi-join.  The shuffle key is the grid cell, so the
    cross product is confined to one neighborhood and skew is bounded by
    cell population, not dataset size — the decomposition that makes a
    distance join hash-partitionable at any scale.

    Preconditions (the 3x3 neighborhood is only complete within them):

    - ``radius_km <= cell_deg * 111`` is NECESSARY (latitude axis,
      ~111 km/degree) and is enforced with ``ValueError``.
    - Longitude cells shrink by ``cos(lat)``, so the caller must also
      ensure ``radius_km <= cell_deg * 111 * cos(max |lat|)`` for the
      latitudes actually present (e.g. clamp \\|lat\\| <= 60 for a 2x
      shrink).  This cannot be checked without scanning the data, so it
      is documented, not enforced.
    - Cells do NOT wrap at +/-180 longitude: a pair straddling the
      antimeridian is silently missed.  Keep ``lon`` away from the seam
      (e.g. within [-180 + radius_deg, 180 - radius_deg]) or pre-rotate.

    Column names must be disjoint apart from the coordinate pair; output
    carries all columns plus ``km`` (rounded to 4 decimals BEFORE the
    predicate so libm-vs-JVM trig ulps cannot flip membership).
    """
    if radius_km > cell_deg * 111.0:
        raise ValueError(
            f"grid_near_join: radius_km={radius_km} spans more than one "
            f"{cell_deg}-degree cell (max {cell_deg * 111.0:.0f} km on the "
            "latitude axis); widen cell_deg or shrink radius_km"
        )
    l_cols = [c for c in left.columns if c not in (lat, lon)]
    r_cols = [c for c in right.columns if c not in (lat, lon)]
    l9 = (
        left.withColumn("__dx", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("__dy", F.expr("explode(array(-1, 0, 1))"))
        .select(
            *l_cols,
            F.col(lat).alias("__l_lat"),
            F.col(lon).alias("__l_lon"),
            (F.floor(F.col(lat) / cell_deg) + F.col("__dx")).alias("__cx"),
            (F.floor(F.col(lon) / cell_deg) + F.col("__dy")).alias("__cy"),
        )
    )
    rg = right.select(
        *r_cols,
        F.col(lat).alias("__r_lat"),
        F.col(lon).alias("__r_lon"),
        F.floor(F.col(lat) / cell_deg).alias("__cx"),
        F.floor(F.col(lon) / cell_deg).alias("__cy"),
    )
    dlat = (F.radians(F.col("__r_lat")) - F.radians(F.col("__l_lat"))) / 2
    dlon = (F.radians(F.col("__r_lon")) - F.radians(F.col("__l_lon"))) / 2
    h = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(F.col("__l_lat"))) * F.cos(
        F.radians(F.col("__r_lat"))
    ) * F.sin(dlon) * F.sin(dlon)
    km = F.round(2 * 6371.0 * F.asin(F.sqrt(h)), 4)
    # No distinct: the right side keys on its OWN single cell and the 3x3
    # replication puts at most one left copy in any given cell, so the
    # equi-join emits each qualifying (left, right) input pair exactly
    # once — output multiplicity equals input multiplicity (the r11 plan
    # paid a full-output Exchange for a provably no-op distinct).
    return (
        l9.join(rg, ["__cx", "__cy"])
        .withColumn("km", km)
        .filter(F.col("km") < radius_km)
        .select(*l_cols, *r_cols, "km")
    )
