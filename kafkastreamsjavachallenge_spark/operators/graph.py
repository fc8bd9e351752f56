"""Distributed graph operators over plain (src, dst) edge DataFrames.

The reference has no graph surface; these serve the LLM-pipeline north
star (near-dup graphs from dedup.connected_components feed degree /
triangle / rank analyses) and the co-occurrence graph queries
(queries/graphs.py).  All operators take an ORDERED unique edge list
(src < dst per row, one row per undirected edge) — the canonical
shuffle-friendly representation: every algorithm below is joins and
hash aggregates keyed on node ids, so a 1000-executor cluster
partitions them like any other equi-join workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame, src: str = "ua", dst: str = "ub") -> DataFrame:
    """Both directions of an ordered edge list as (a, b) rows."""
    return edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))


def degrees(edges: DataFrame, src: str = "ua", dst: str = "ub") -> DataFrame:
    """(a, deg) per node of the undirected graph."""
    return undirected(edges, src, dst).groupBy("a").agg(
        F.count("*").alias("deg")
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int | None = None,
    src: str = "src",
    dst: str = "dst",
    with_convergence: bool = False,
) -> DataFrame:
    """k-core peel over a SYMMETRIC edge list (both directions present):
    ``max_rounds`` simultaneous-removal rounds of dropping nodes with
    fewer than ``k`` surviving neighbors (Matula & Beck 1983); returns
    (node, deg_core) for the surviving core.

    ``max_rounds`` is the round-9 tunable surfaced from q_kcore's fixed
    unroll: at sf-scale LSH graphs the peel converges in 2-3 rounds, but
    at 100× a pathological chain needs depth/2 rounds — so the cap is a
    DEFINED CONTRACT, not a convergence guarantee, and callers that need
    the distinction pass ``with_convergence=True`` to get a constant
    ``converged`` column: true iff one more peel round would remove
    nothing (every surviving node keeps degree >= k).  The flag is a
    1-row broadcast attached declaratively — no driver-side action, no
    extra shuffle beyond one aggregate over the (small) core.

    Scale: each round is one count aggregate + two semi-joins shuffling
    on node id, cost tracking the monotonically-shrinking edge set;
    per-round ``localCheckpoint`` truncates lineage (the degree agg and
    two semi-joins reference the prior round three times, so an
    unchecked plan grows 3^rounds copies of the base).  A ``None``
    ``max_rounds`` defers to the active ``scale.ScaleProfile`` and
    falls back to 8 (the round-9 default) when the profile leaves the
    knob off."""
    from kafkastreamsjavachallenge_spark.scale import resolve

    max_rounds = resolve(max_rounds, "max_rounds") or 8
    sym = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    # r12 optimization (guide §1.2: don't compute what you throw away):
    # a peel round only REMOVES edges, so if a round's edge count is
    # unchanged the round was the identity — and every later round is
    # too (keep_{i+1} depends only on sym_i), so the remaining rounds of
    # the fixed contract are provably no-ops and are skipped.  The
    # RESULT is bit-identical to running all ``max_rounds`` rounds (the
    # oracle unrolls them; parity unchanged).  LSH graphs converge in
    # 2-3 rounds, so this cuts the 8-round contract's cost ~in half;
    # counts run over eagerly-checkpointed blocks (tiny jobs), which
    # also keeps the per-round lineage truncation this loop always
    # needed.
    n_prev = sym.count()
    for _ in range(max_rounds):
        keep = (
            sym.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("src")
        )
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        n = sym.count()
        if n == n_prev:
            break  # fixed point: the remaining rounds are the identity
        n_prev = n
    core = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg_core")
    )
    if not with_convergence:
        return core
    flag = core.agg(
        F.count_if(F.col("deg_core") < k).alias("n_under")
    ).select((F.col("n_under") == 0).alias("converged"))
    return core.crossJoin(F.broadcast(flag))


def triangle_count(
    edges: DataFrame, src: str = "ua", dst: str = "ub"
) -> DataFrame:
    """Exact triangle count via the ordered-edge three-way self-join
    (node-iterator on the ordered edge set): because every edge is
    stored with src < dst, each triangle {x < y < z} is generated
    exactly once as (x,y)+(y,z)+(x,z).  Three hash joins keyed on node
    ids — no broadcast of the big side, no squaring of heavy hitters
    beyond true wedge counts.  Returns a 1-row (n_triangles) frame."""
    e = edges.select(F.col(src).alias("ua"), F.col(dst).alias("ub"))
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.ub") == F.col("e2.ua"))
        .join(
            e3,
            (F.col("e1.ua") == F.col("e3.ua"))
            & (F.col("e2.ub") == F.col("e3.ub")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )


def neighbor_jaccard(
    edges: DataFrame, src: str = "ua", dst: str = "ub"
) -> DataFrame:
    """Neighborhood Jaccard |N(u) n N(v)| / |N(u) u N(v)| for every node
    pair with >= 1 common neighbor: one self-join of the undirected edge
    list on the shared-neighbor id, degrees broadcast in.  Returns
    (u, v, common, jaccard) with u < v."""
    und = undirected(edges, src, dst)
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    n1, n2 = und.alias("n1"), und.alias("n2")
    common = (
        n1.join(
            n2,
            (F.col("n1.b") == F.col("n2.b"))
            & (F.col("n1.a") < F.col("n2.a")),
        )
        .groupBy(F.col("n1.a").alias("u"), F.col("n2.a").alias("v"))
        .agg(F.count("*").alias("common"))
    )
    da = deg.withColumnsRenamed({"a": "u", "deg": "deg_u"})
    db = deg.withColumnsRenamed({"a": "v", "deg": "deg_v"})
    return (
        common.join(F.broadcast(da), "u")
        .join(F.broadcast(db), "v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "ua",
    dst: str = "ub",
) -> DataFrame:
    """PageRank on the undirected graph, `iters` fixed iterations of the
    rank/out-degree contribution join.  Each iteration is one shuffle on
    the node id; localCheckpoint truncates the per-iteration lineage
    (reliable checkpoint on a real cluster — same pattern as
    similarity.kmeans).  Returns (a, rank)."""
    und = undirected(edges, src, dst).localCheckpoint(eager=True)
    deg = und.groupBy("a").agg(F.count("*").alias("out_deg"))
    ranks = deg.select("a", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contribs = (
            und.join(ranks, "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("a"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("a")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contribs, "a", "left")
            .select(
                "a",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
