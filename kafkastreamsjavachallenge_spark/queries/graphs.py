"""Graph-analytics pack over a user co-occurrence graph, plus two
scale-pattern queries (algebraic partial-aggregate merge, single-pass
histogram quantile).

The graph is derived from the events stream the reference processes
(UniqueUsersApp.java:91-134 groups the same stream by minute): two users
are connected if they emitted the same event type in the same minute.
Buckets larger than MAX_BUCKET users are dropped before pairing — the
standard bound that keeps the per-bucket pair blowup O(cap^2) instead of
O(heavy-hitter^2), i.e. skew control by construction rather than by
salting (a minute with a million users would otherwise generate 5e11
pairs).  All graph queries are pure Catalyst joins/aggregates over the
bounded edge list; everything is integer arithmetic until a final
rounded ratio, so oracle hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.operators import graph as G

MAX_BUCKET = 20

# Shared CTE prefix for the oracle SQL: distinct (type, minute, user)
# memberships -> bucket-size cap -> ordered unique edges (ua < ub).
_EDGE_CTE = (
    "WITH b AS (SELECT event_type, date_trunc('minute', ts) AS m, user_id "
    "FROM events GROUP BY 1, 2, 3), "
    "sz AS (SELECT event_type, m, count(*) AS c FROM b GROUP BY 1, 2), "
    "ok AS (SELECT b.* FROM b JOIN sz USING (event_type, m) "
    f"WHERE c <= {MAX_BUCKET}), "
    "e AS (SELECT DISTINCT a.user_id AS ua, o.user_id AS ub "
    "FROM ok a JOIN ok o ON a.event_type = o.event_type AND a.m = o.m "
    "AND a.user_id < o.user_id) "
)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _edges(spark, sf_dir):
    """Ordered unique edge list (ua < ub) of the co-occurrence graph.
    Two shuffles total (r12 rewrite, was four wide stages): ONE
    collect_set aggregate builds each bucket's distinct-user set
    (map-side partial sets, so the shuffle carries per-bucket distinct
    users — the same bytes the old standalone distinct shuffled), the
    bucket-size cap is ``size(set)``, and the a<b pairs are generated
    in-array from the sorted set (≤ cap²/2 = 190 structs per bucket, an
    interpreted-HOF loop over ≤ 20 elements) — replacing the old
    distinct → window-count → bucket self-join chain whose window sort
    and join shuffles are pure overhead when the pair fan-out is
    cap-bounded anyway.  A degenerate over-cap bucket's set is built
    then dropped, exactly like the old window count had to scan it; the
    cap keeps per-group memory bounded at scale.  The pair distinct is
    the second shuffle.  The result is lazily localCheckpoint-ed: every
    consumer fans out into 3-4 self-join branches, and without the
    checkpoint each branch re-runs the whole edge build (on a cluster
    this would be a reliable checkpoint or a cached table)."""
    ev = _t(spark, sf_dir, "events")
    us = (
        ev.select(
            "event_type",
            F.date_trunc("minute", "ts").alias("m"),
            "user_id",
        )
        .groupBy("event_type", "m")
        .agg(F.collect_set("user_id").alias("us"))
        .filter(F.size("us") <= MAX_BUCKET)
        .select(F.sort_array("us").alias("us"))
    )
    # sorted distinct elements → us[i] < us[j] for i < j by construction
    pair_arr = F.flatten(
        F.transform(
            "us",
            lambda x, i: F.transform(
                F.slice(F.col("us"), i + F.lit(2), F.size("us")),
                lambda y: F.struct(x.alias("ua"), y.alias("ub")),
            ),
        )
    )
    return (
        us.select(F.explode(pair_arr).alias("p"))
        .select("p.ua", "p.ub")
        .distinct()
        .localCheckpoint(eager=False)
    )


# --------------------------------------------- triangle counting


def q_triangle_count(spark, sf_dir):
    """Exact triangle count + global clustering coefficient
    (operators/graph.py triangle_count: ordered-edge three-way
    self-join, each triangle generated exactly once); wedges come from
    the degree table (sum of deg*(deg-1)/2).  All joins hash-partition
    on user ids; with the bucket cap the edge list is linear in the
    input."""
    e = _edges(spark, sf_dir)
    tri = G.triangle_count(e)
    wed = G.degrees(e).agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2)
        .cast("bigint")
        .alias("n_wedges"),
        F.count("*").alias("n_nodes"),
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    return (
        tri.crossJoin(F.broadcast(wed))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering"),
        )
    )


# --------------------------------------------- neighbor Jaccard


def q_jaccard_neighbors(spark, sf_dir):
    """Top-20 user pairs by neighborhood Jaccard similarity
    (operators/graph.py neighbor_jaccard) — link-prediction's baseline
    score.  Integer counts throughout, rounded ratio + full pair
    tie-break for a deterministic top-20."""
    j = G.neighbor_jaccard(_edges(spark, sf_dir)).select(
        "u", "v", "common", F.round("jaccard", 6).alias("jaccard")
    )
    return j.orderBy(F.desc("jaccard"), F.asc("u"), F.asc("v")).limit(20)


# --------------------------------------------- PageRank (iterative)


def q_pagerank(spark, sf_dir):
    """PageRank (d = 0.85, 5 fixed iterations; operators/graph.py
    pagerank) on the undirected co-occurrence graph — the canonical
    iterative DataFrame algorithm.  Each iteration is one shuffle on the
    node id; at scale the edge list would be pre-partitioned once and
    every iteration reuses that partitioning.  Oracle: the 5 iterations
    unrolled as chained SQL CTEs; both sides round to 6 dp and order by
    the rounded rank so cross-engine float-sum order cannot flip the
    top-10."""
    ranks = G.pagerank(_edges(spark, sf_dir), iters=5, damping=0.85)
    return (
        ranks.select("a", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("a"))
        .limit(10)
    )


# --------------------------------------------- partial-aggregate merge


def q_reagg_merge(spark, sf_dir):
    """Algebraic-aggregate decomposition: daily partials (sum / count /
    min / max per day x flag) merged into monthly rollups with sum-of-
    sums, sum-of-counts, min-of-mins — and avg recomputed from the
    merged sum/count rather than averaged-of-averages.  This is the
    incremental-view-maintenance pattern: at 100 TB the daily partials
    are what you persist, and month/quarter/year views merge them
    without rescanning the fact table.  The merged average is emitted in
    exact fixed-point (price * 10^4, integer-divided) because a rounded
    double quotient can land exactly on a .xxxx5 boundary where Spark's
    BigDecimal HALF_UP and DuckDB's binary-double rounding disagree."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag", F.date_trunc("day", "l_shipdate").alias("d")
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("s"),
        F.count("*").alias("c"),
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    merged = daily.groupBy(
        "l_returnflag", F.date_trunc("month", "d").alias("month")
    ).agg(
        F.sum("s").alias("s_dec"),
        F.sum("c").alias("n"),
        F.min("mn").alias("min_price"),
        F.max("mx").alias("max_price"),
    )
    return merged.select(
        "l_returnflag",
        "month",
        F.col("s_dec").cast("double").alias("sum_price"),
        "n",
        "min_price",
        "max_price",
        F.expr("CAST(s_dec * 10000 AS BIGINT) div n").alias("avg_price_e4"),
    )


# --------------------------------------------- histogram quantile


def q_hist_quantile(spark, sf_dir):
    """Single-pass-style approximate median via a 1000-bin fixed-width
    histogram: global min/max (1-row broadcast), integer bin assignment,
    bin counts, then the first bin whose cumulative count crosses n/2 —
    the mergeable, sort-free quantile pattern that scales where exact
    percentile (full sort) does not.  Bin math is identical IEEE double
    arithmetic in both engines, and everything after the 1000-row bin
    table is integer, so the result is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    mm = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    binned = li.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * 1000
            ).cast("int"),
            F.lit(999),
        ).alias("bin"),
        "lo",
        "hi",
    )
    bins = binned.groupBy("bin", "lo", "hi").agg(F.count("*").alias("c"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = bins.select(
        "bin",
        "lo",
        "hi",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    med = cum.filter(F.col("cum") * 2 >= F.col("n")).orderBy("bin").limit(1)
    return med.select(
        "bin",
        "n",
        F.round(
            F.col("lo")
            + (F.col("bin") + 0.5) / 1000 * (F.col("hi") - F.col("lo")),
            4,
        ).alias("approx_median"),
    )


def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton-curve) layout audit — the data-layout move behind
    Delta/Iceberg OPTIMIZE ZORDER BY: interleave the bits of two
    predicate columns so one sort key clusters BOTH dimensions, letting
    min/max file statistics prune scans on either column.  Here events
    are z-coded on (user_id low byte, day-of-month), bucketed by z-prefix
    (the \"file\" boundary at 100 TB), and each bucket reports its
    per-dimension min/max envelope + row count — narrow envelopes in both
    dimensions are exactly what makes stats-based pruning fire.  Pure
    integer bit arithmetic end-to-end; one shuffle (the groupBy)."""
    ev = _t(spark, sf_dir, "events")
    qx = F.col("user_id").cast("bigint") % 256
    # stretch day-of-month onto the full 8-bit range (exact integer DIV)
    # so both dimensions contribute equally many significant bits to the
    # interleave — unbalanced widths would let one dim dominate buckets
    qy = F.expr("((day(ts) - 1) * 255) DIV 30").cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(8):
        z = z + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    coded = ev.select(qx.alias("qx"), qy.alias("qy"), (F.shiftright(z, 10)).alias("zbucket"))
    return coded.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("qx").alias("min_user"),
        F.max("qx").alias("max_user"),
        F.min("qy").alias("min_qday"),
        F.max("qy").alias("max_qday"),
    )


def q_skew_advisor(spark, sf_dir):
    """Shuffle-skew diagnosis: per-key load share of the would-be join /
    aggregation key, plus the integer salt factor that would level it
    across 32 shuffle partitions (salt = ceil(share * 32), floor 1) —
    the report an engineer reads before keying a 100 TB shuffle.  Two
    hash aggregates + a broadcast scalar; shares in exact basis points
    (integer DIV), so the oracle is bit-identical."""
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = per_key.agg(F.sum("cnt").alias("total"))
    top = (
        per_key.crossJoin(F.broadcast(total))
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(10)
    )
    return top.select(
        "user_id",
        "cnt",
        F.expr("(cnt * 10000) DIV total").alias("share_bp"),
        F.greatest(
            F.lit(1).cast("bigint"), F.expr("(cnt * 32 + total - 1) DIV total")
        ).alias("salt_factor"),
    )


_ZORDER_SQL = (
    "WITH c AS (SELECT user_id % 256 AS qx, "
    "((day(ts) - 1) * 255) // 30 AS qy FROM events), "
    "z AS (SELECT qx, qy, ("
    + " + ".join(
        f"(((qx >> {i}) & 1) << {2 * i}) + (((qy >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    + ") >> 10 AS zbucket FROM c) "
    "SELECT zbucket, count(*) AS n_events, "
    "min(qx) AS min_user, max(qx) AS max_user, "
    "min(qy) AS min_qday, max(qy) AS max_qday FROM z GROUP BY zbucket"
)

_SKEW_SQL = (
    "WITH k AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id), "
    "t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM k), "
    "top AS (SELECT user_id, cnt, total FROM k CROSS JOIN t "
    "ORDER BY cnt DESC, user_id LIMIT 10) "
    "SELECT user_id, cnt, (cnt * 10000) // total AS share_bp, "
    "greatest(1, (cnt * 32 + total - 1) // total) AS salt_factor FROM top"
)


def q_broadcast_advisor(spark, sf_dir):
    """Broadcast-feasibility report for the dimension tables — the other
    half of physical join planning next to q_skew_advisor: per table, an
    in-query row-exact size estimate (8 bytes per numeric column +
    varchar byte lengths, the same arithmetic on both engines) and
    whether it fits Spark's default 10 MiB autoBroadcastJoinThreshold.
    At 100 TB this report is what decides which joins get the shuffle-
    free broadcast plan and which must shuffle — the estimate is one
    map-side-combinable aggregate per dimension table (fact tables are
    never candidates and never scanned here)."""
    specs = {
        "region": F.lit(8) + F.length("r_name"),
        "nation": F.lit(16) + F.length("n_name"),
        "supplier": F.lit(24) + F.length("s_name"),
        "customer": F.lit(24) + F.length("c_name") + F.length("c_mktsegment"),
    }
    parts = []
    for tbl, width in specs.items():
        parts.append(
            _t(spark, sf_dir, tbl).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(width.cast("bigint")).alias("est_bytes"),
            ).select(
                F.lit(tbl).alias("tbl"),
                "n_rows",
                "est_bytes",
                (F.col("est_bytes") < F.lit(10 * 1024 * 1024))
                .cast("int")
                .alias("broadcastable"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_BROADCAST_ADVISOR_SQL = (
    "SELECT 'region' AS tbl, CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(sum(8 + length(r_name)) AS BIGINT) AS est_bytes, "
    "CAST(sum(8 + length(r_name)) < 10485760 AS INTEGER) AS broadcastable "
    "FROM region "
    "UNION ALL SELECT 'nation', CAST(count(*) AS BIGINT), "
    "CAST(sum(16 + length(n_name)) AS BIGINT), "
    "CAST(sum(16 + length(n_name)) < 10485760 AS INTEGER) FROM nation "
    "UNION ALL SELECT 'supplier', CAST(count(*) AS BIGINT), "
    "CAST(sum(24 + length(s_name)) AS BIGINT), "
    "CAST(sum(24 + length(s_name)) < 10485760 AS INTEGER) FROM supplier "
    "UNION ALL SELECT 'customer', CAST(count(*) AS BIGINT), "
    "CAST(sum(24 + length(c_name) + length(c_mktsegment)) AS BIGINT), "
    "CAST(sum(24 + length(c_name) + length(c_mktsegment)) < 10485760 "
    "AS INTEGER) FROM customer"
)


def q_prune_simulator(spark, sf_dir):
    """Zone-map pruning simulator — quantifies WHY clustered layout
    matters at 100 TB: pack events into 100 simulated files two ways
    (ingest order = ntile over event_id; clustered = ntile over
    user_id), build each file's min/max user_id zone map, and count how
    many files a middle-decade range predicate on user_id can skip.
    Ingest-order files have full-domain envelopes (nothing prunes);
    clustered files prune ~90% — the exact effect parquet row-group /
    Delta file stats give a sorted table.  Predicate bounds derive from
    the key domain (umin + 45%/55% of the span, integer DIV), never from
    baked-in values.  The ntiles rank a NARROW (event_id, user_id)
    projection — at 100 TB file boundaries are physical metadata and
    this simulator would rank a per-partition sample, but the plan shape
    (rank → zone aggregate → broadcast-scalar overlap test) is the
    same."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    b = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax")
    ).select(
        F.expr("umin + ((umax - umin) * 45) div 100").alias("lo"),
        F.expr("umin + ((umax - umin) * 55) div 100").alias("hi"),
    )
    wi = Window.orderBy("event_id")
    wk = Window.orderBy("user_id", "event_id")
    files = ev.select(
        "user_id",
        F.ntile(100).over(wi).alias("f_ingest"),
        F.ntile(100).over(wk).alias("f_clustered"),
    )
    zf = files.select(
        F.lit("ingest").alias("layout"),
        F.col("f_ingest").alias("f"),
        "user_id",
    ).unionByName(
        files.select(
            F.lit("clustered").alias("layout"),
            F.col("f_clustered").alias("f"),
            "user_id",
        )
    )
    zones = zf.groupBy("layout", "f").agg(
        F.min("user_id").alias("zmin"), F.max("user_id").alias("zmax")
    )
    hit = F.when(
        (F.col("zmax") >= F.col("lo")) & (F.col("zmin") <= F.col("hi")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        zones.crossJoin(F.broadcast(b))
        .groupBy("layout", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(hit).cast("bigint").alias("n_scanned"),
        )
        .select(
            "layout",
            "n_files",
            "n_scanned",
            F.expr("((n_files - n_scanned) * 10000) div n_files").alias(
                "prune_bp"
            ),
        )
    )


_PRUNE_SIM_SQL = (
    "WITH ev AS (SELECT event_id, user_id FROM events), "
    "b AS (SELECT umin + ((umax - umin) * 45) // 100 AS lo, "
    "umin + ((umax - umin) * 55) // 100 AS hi FROM "
    "(SELECT min(user_id) AS umin, max(user_id) AS umax FROM ev)), "
    "f AS (SELECT user_id, "
    "ntile(100) OVER (ORDER BY event_id) AS f_ingest, "
    "ntile(100) OVER (ORDER BY user_id, event_id) AS f_clustered FROM ev), "
    "zf AS (SELECT 'ingest' AS layout, f_ingest AS f, user_id FROM f "
    "UNION ALL SELECT 'clustered', f_clustered, user_id FROM f), "
    "z AS (SELECT layout, f, min(user_id) AS zmin, max(user_id) AS zmax "
    "FROM zf GROUP BY 1, 2) "
    "SELECT layout, CAST(count(*) AS BIGINT) AS n_files, "
    "CAST(sum(CASE WHEN zmax >= lo AND zmin <= hi THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_scanned, "
    "CAST(((count(*) - sum(CASE WHEN zmax >= lo AND zmin <= hi "
    "THEN 1 ELSE 0 END)) * 10000) // count(*) AS BIGINT) AS prune_bp "
    "FROM z CROSS JOIN b GROUP BY layout, lo, hi"
)



def q_hits(spark, sf_dir):
    """HITS hubs on the bipartite user -> event-type graph, one unrolled
    mutual-reinforcement round kept UNNORMALIZED so every score stays an
    exact integer (authority_1 = distinct-user in-degree, hub_1 = sum of
    the authorities a user touches) — no float normalization step, so
    the oracle is hash-exact with no rounding gate (the normalized
    variant divides each iteration by a constant and ranks identically).
    Top-10 hubs by (hub_1 DESC, user_id).

    Scale: edges collapse to DISTINCT (user, type) first; each iteration
    is one broadcast-size join (|event types| rows) + one user-keyed
    aggregate — the classic bipartite shape where one side is tiny."""
    ev = _t(spark, sf_dir, "events")
    edges = ev.select("user_id", "event_type").distinct()
    a1 = edges.groupBy("event_type").agg(F.count(F.lit(1)).alias("auth1"))
    h1 = (
        edges.join(F.broadcast(a1), "event_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("auth1").alias("hub1"),
        )
    )
    return h1.orderBy(F.col("hub1").desc(), "user_id").limit(10)

QUERIES = {
    "q_triangle_count": (
        q_triangle_count,
        _EDGE_CTE
        + ", tri AS (SELECT count(*) AS n_triangles FROM e e1 "
        "JOIN e e2 ON e1.ub = e2.ua "
        "JOIN e e3 ON e1.ua = e3.ua AND e2.ub = e3.ub), "
        "und AS (SELECT ua AS a, ub AS b FROM e "
        "UNION ALL SELECT ub, ua FROM e), "
        "deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a), "
        "wed AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) "
        "AS n_wedges, count(*) AS n_nodes FROM deg), "
        "ne AS (SELECT count(*) AS n_edges FROM e) "
        "SELECT n_nodes, n_edges, n_triangles, "
        "round(3.0 * n_triangles / n_wedges, 6) AS clustering "
        "FROM tri CROSS JOIN wed CROSS JOIN ne",
    ),
    "q_jaccard_neighbors": (
        q_jaccard_neighbors,
        _EDGE_CTE
        + ", und AS (SELECT ua AS a, ub AS b FROM e "
        "UNION ALL SELECT ub, ua FROM e), "
        "deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a), "
        "common AS (SELECT n1.a AS u, n2.a AS v, count(*) AS common "
        "FROM und n1 JOIN und n2 ON n1.b = n2.b AND n1.a < n2.a "
        "GROUP BY 1, 2) "
        "SELECT u, v, common, "
        "round(common / (du.deg + dv.deg - common), 6) AS jaccard "
        "FROM common JOIN deg du ON common.u = du.a "
        "JOIN deg dv ON common.v = dv.a "
        "ORDER BY jaccard DESC, u ASC, v ASC LIMIT 20",
    ),
    # 5 fixed PageRank iterations unrolled as chained CTEs (recursive
    # terms can't aggregate portably); contribution sums are double adds
    # whose order differs between engines, so the 6-dp round on BOTH
    # sides (and ordering by the rounded rank) absorbs ulp drift — if a
    # rank ever sat exactly on a rounding boundary the deterministic
    # parity test would catch it, not flake.
    "q_hits": (
        q_hits,
        "WITH e AS (SELECT DISTINCT user_id, event_type FROM events), "
        "a1 AS (SELECT event_type, count(*) AS auth1 FROM e GROUP BY 1) "
        "SELECT user_id, count(*) AS n_types, "
        "CAST(sum(auth1) AS BIGINT) AS hub1 "
        "FROM e JOIN a1 USING (event_type) GROUP BY user_id "
        "ORDER BY hub1 DESC, user_id LIMIT 10",
    ),
    "q_pagerank": (
        q_pagerank,
        _EDGE_CTE
        + ", und AS (SELECT ua AS a, ub AS b FROM e "
        "UNION ALL SELECT ub, ua FROM e), "
        "deg AS (SELECT a, count(*) AS out_deg FROM und GROUP BY a), "
        "r0 AS (SELECT a, 1.0 AS rank FROM deg), "
        + " ".join(
            f"c{i} AS (SELECT u.b AS a, sum(r.rank / d.out_deg) AS s "
            f"FROM und u JOIN r{i-1} r ON u.a = r.a "
            "JOIN deg d ON u.a = d.a GROUP BY u.b), "
            f"r{i} AS (SELECT d.a, 0.15 + 0.85 * coalesce(c.s, 0.0) AS rank "
            f"FROM deg d LEFT JOIN c{i} c ON d.a = c.a),"
            for i in range(1, 6)
        ).rstrip(",")
        + " SELECT a, round(rank, 6) AS rank FROM r5 "
        "ORDER BY rank DESC, a LIMIT 10",
    ),
    "q_reagg_merge": (
        q_reagg_merge,
        "WITH daily AS (SELECT l_returnflag, "
        "date_trunc('day', l_shipdate) AS d, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS s, count(*) AS c, "
        "min(l_extendedprice) AS mn, max(l_extendedprice) AS mx "
        "FROM lineitem GROUP BY 1, 2), "
        "merged AS (SELECT l_returnflag, date_trunc('month', d) AS month, "
        "sum(s) AS s_dec, CAST(sum(c) AS BIGINT) AS n, min(mn) AS min_price, "
        "max(mx) AS max_price FROM daily GROUP BY 1, 2) "
        "SELECT l_returnflag, month, CAST(s_dec AS DOUBLE) AS sum_price, "
        "n, min_price, max_price, "
        "CAST(s_dec * 10000 AS BIGINT) // n AS avg_price_e4 FROM merged",
    ),
    "q_hist_quantile": (
        q_hist_quantile,
        "WITH mm AS (SELECT min(l_extendedprice) AS lo, "
        "max(l_extendedprice) AS hi FROM lineitem), "
        "binned AS (SELECT least(CAST(floor((l_extendedprice - lo) / "
        "(hi - lo) * 1000) AS INT), 999) AS bin, lo, hi "
        "FROM lineitem CROSS JOIN mm), "
        "bins AS (SELECT bin, lo, hi, count(*) AS c FROM binned "
        "GROUP BY 1, 2, 3), "
        "cum AS (SELECT bin, lo, hi, "
        "sum(c) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS cum, sum(c) OVER () AS n FROM bins) "
        "SELECT bin, CAST(n AS BIGINT) AS n, "
        "round(lo + (bin + 0.5) / 1000 * (hi - lo), 4) "
        "AS approx_median FROM cum WHERE cum * 2 >= n "
        "ORDER BY bin LIMIT 1",
    ),
    "q_zorder_layout": (q_zorder_layout, _ZORDER_SQL),
    "q_skew_advisor": (q_skew_advisor, _SKEW_SQL),
    "q_prune_simulator": (q_prune_simulator, _PRUNE_SIM_SQL),
    "q_broadcast_advisor": (q_broadcast_advisor, _BROADCAST_ADVISOR_SQL),
}
