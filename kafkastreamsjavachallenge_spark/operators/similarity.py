"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against a query vector.  The
  query row is broadcast; scoring is a pure projection; top-k compiles to
  TakeOrderedAndProject (per-partition heap + driver merge) — the exact
  baseline, linear scan, embarrassingly parallel.
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH bucketing
  (deterministic hyperplanes derived from md5 so results are reproducible);
  only the query's bucket (and optional neighbor probes) is scored.  At
  100 TB the bucketed table is written partitioned by bucket id, turning
  each query into a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.functions.vector import cosine, dot

from kafkastreamsjavachallenge_spark.functions.text import hex4_to_int


def cosine_scores(
    df: DataFrame, query: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Score every row against a single-row query DataFrame (broadcast)."""
    q = query.select(F.col(vec_col).alias("__qvec"))
    return df.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 4).alias("cos_sim"),
    )


def cosine_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k; ties broken by id for determinism."""
    scores = cosine_scores(df, query, id_col, vec_col)
    return scores.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def _hyperplane(dim: int, plane: int):
    """Deterministic pseudo-random hyperplane: component i of plane p is
    derived from md5(p|i) → centered in [-0.5, 0.5).  Portable to any
    engine with md5 — no RNG state, no driver-side materialization."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            hex4_to_int(F.md5(F.concat_ws("|", F.lit(str(plane)), i.cast("string"))))
            / F.lit(65536.0)
            - F.lit(0.5)
        ),
    )


def lsh_buckets(
    df: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a sign-bit LSH bucket id (int) per row — pure projection."""
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        s = F.when(dot(F.col(vec_col), _hyperplane(dim, p)) >= 0, 1).otherwise(0)
        bucket = bucket + F.shiftleft(s.cast("bigint"), p)
    return df.withColumn("bucket", bucket)


def lsh_ann_topk(
    df: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket.

    Recall/latency trade-off is n_planes; multi-probe (flip one bit) is the
    standard extension.  The candidate filter is an equi-join on bucket —
    partition-prunable when the table is stored bucketed.
    """
    b_df = lsh_buckets(df, n_planes, dim, vec_col)
    b_q = lsh_buckets(query, n_planes, dim, vec_col).select(
        F.col("bucket").alias("__qbucket")
    )
    cands = b_df.join(F.broadcast(b_q), on=F.col("bucket") == F.col("__qbucket"))
    return cosine_topk(cands, query, k, id_col, vec_col)
