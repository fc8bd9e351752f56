"""Time-series & spatial pack: calendar-spine gap filling with forward
fill, gaps-and-islands streak detection, grid-bucketed spatial joins,
OHLC resampling, and URL parsing.

These are the time-series shapes the reference's per-minute output table
feeds directly (README.md:63-83 is itself a gappy minute series — the
golden table skips minutes with no traffic): filling the gaps, finding
streaks, and resampling it to coarser grains are the next queries its
user writes.  All queries stay in built-in Catalyst expressions; the
spine/explode fan-outs are bounded by the calendar (|days|), never by
the fact-table row count, and the spatial join is the standard
grid-bucket decomposition that replaces an O(n*m) cross join with a
per-cell equi-join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------- calendar gap fill


def q_gap_fill(spark, sf_dir):
    """Calendar-spine gap filling of a sparse daily series (days with
    high-value events per type): per-type min/max day -> sequence()
    date spine (explode bounded by |days|, not rows) -> left join the
    observed counts -> zero-fill plus forward-fill of the last observed
    value (last() IGNORE NULLS over an unbounded-preceding frame).  The
    fact table is aggregated before the spine join, so the join's left
    side is |types| x |days| however large the input."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value") > 190)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "event_type", F.explode(F.sequence("d0", "d1")).alias("day")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    j = spine.join(daily, ["event_type", "day"], "left")
    return j.select(
        "event_type",
        "day",
        F.coalesce("cnt", F.lit(0)).alias("cnt_zero"),
        F.last("cnt", ignorenulls=True).over(w).alias("cnt_ffill"),
        F.col("cnt").isNull().cast("int").alias("was_gap"),
    )


# --------------------------------------------- gaps and islands


def q_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user via the
    gaps-and-islands idiom: distinct active days, island key =
    day - row_number() days (constant within a consecutive run), group
    to streak lengths, max per user, then the distribution of longest
    streaks.  Pure date/integer arithmetic end-to-end; the only
    fact-table shuffle is the distinct (user, day) aggregate."""
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = d.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(F.max("len").alias("best"))
    return longest.groupBy("best").agg(F.count("*").alias("n_users"))


# --------------------------------------------- grid-bucketed spatial join


def q_grid_join(spark, sf_dir):
    """Spatial near-join via grid bucketing (operators/relational.py
    grid_near_join): key-derived lat/lon for suppliers and customers,
    20-degree grid cells, suppliers replicated into their 3x3 cell
    neighborhood (a bounded 9x explode), equi-join on the cell, then the
    exact rounded-haversine predicate (< 1000 km).  This is the standard
    decomposition that makes a distance join hash-partitionable: the
    shuffle key is the grid cell, the cross product is confined to one
    neighborhood, and skew is bounded by cell population, not dataset
    size.

    Coordinates respect grid_near_join's completeness preconditions:
    \\|lat\\| <= 60 so a 20-degree cell is >= 20*111*cos(60) = 1110 km
    wide on the longitude axis (>= the 1000 km radius), and
    \\|lon\\| <= 160 so no qualifying pair straddles the antimeridian
    (the 40-degree seam gap is >= 40*111*cos(60) = 2220 km > radius).
    The oracle is a BRUTE-FORCE distance join (no grid), so the parity
    check proves the decomposition is lossless, not merely that both
    engines bucket identically."""
    from kafkastreamsjavachallenge_spark.operators.relational import (
        grid_near_join,
    )

    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")

    def coords(df, key):
        return df.withColumns(
            {
                "lat": (F.col(key) % 121 - 60).cast("double"),
                "lon": (F.col(key) * 7 % 321 - 160).cast("double"),
            }
        )

    sup = coords(su.select("s_suppkey", "s_nationkey"), "s_suppkey")
    cus = coords(cu.select("c_custkey"), "c_custkey")
    pairs = grid_near_join(sup, cus, radius_km=1000.0, cell_deg=20.0)
    return pairs.groupBy("s_nationkey").agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("c_custkey").alias("n_customers"),
        F.min("km").alias("min_km"),
    )


# --------------------------------------------- OHLC resample


def q_resample_ohlc(spark, sf_dir):
    """Weekly OHLC resample of the daily revenue series: open/close via
    min_by/max_by on the day key (each day is unique within its week, so
    the argmin/argmax is deterministic), high/low as plain min/max.
    Two cheap aggregates: fact -> day (one shuffle), day -> week (|days|
    rows)."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    )
    return daily.groupBy(
        F.date_trunc("week", "d").cast("date").alias("week")
    ).agg(
        F.round(F.min_by("rev", "d"), 4).alias("open"),
        F.round(F.max("rev"), 4).alias("high"),
        F.round(F.min("rev"), 4).alias("low"),
        F.round(F.max_by("rev", "d"), 4).alias("close"),
        F.count("*").alias("n_days"),
    )


# --------------------------------------------- URL parsing


def q_url_parse(spark, sf_dir):
    """URL synthesis + parse-back: build a URL from customer attributes,
    then extract scheme/host/path with the same regex in both engines
    (kept RE2-simple: no backtracking constructs).  The per-host rollup
    is a plain hash aggregate; regexes run in the JVM (no Python)."""
    cu = _t(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_replace("c_mktsegment", " ", "-")),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?n="),
        F.col("c_nationkey").cast("string"),
    )
    u = cu.select(url.alias("url"))
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    path = F.regexp_extract("url", r"^https?://[^/]+(/[^?]*)", 1)
    return (
        u.select(host.alias("host"), path.alias("path"))
        .groupBy("host")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("path").alias("n_paths"),
            F.min("path").alias("first_path"),
        )
    )




# --------------------------------------------- motif similarity search


_TS_PATTERN = (0.0, 0.0, 1.0, 3.0, 8.0, 3.0, 1.0, 0.0)  # a spike shape


def _ts_zq() -> list:
    """Z-normalized query pattern, computed in plain sequential Python
    floats so the embedded literals are bit-identical on both engines."""
    m = 0.0
    for v in _TS_PATTERN:
        m = m + v
    m = m / 8.0
    s = 0.0
    for v in _TS_PATTERN:
        s = s + (v - m) * (v - m)
    import math

    sd = math.sqrt(s / 8.0)
    return [(v - m) / sd for v in _TS_PATTERN]


def q_ts_motif(spark, sf_dir):
    """Time-series similarity search (the streaming-similarity shape of
    Time Series Similarity Search for Streaming Data, EDBT 2019): the 10
    sliding windows of each user's event-value series closest to a fixed
    spike pattern under z-normalized squared Euclidean distance.  Window
    arrays come from one frame-bounded collect_list per row (order pinned
    by the unique (ts, event_id) sort key, so the array is deterministic
    on both engines); z-normalization and the distance are sequential
    8-element folds; constant windows (sd = 0) are not comparable and are
    dropped.  One shuffle on user_id; the global top-10 is a
    TakeOrderedAndProject heap over rounded distances."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, 7)
    )
    s = ev.select(
        "user_id", "ts", "event_id", F.collect_list("value").over(w).alias("w8")
    ).filter(F.size("w8") == 8)

    def fold(arr):
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    # r12 (guide §4.1 / let): the sd > 0 filter used to be pushed below
    # the (m, sd) projections by SUBSTITUTION, re-expanding the mean
    # fold TWICE PER ARRAY ELEMENT inside the interpreted HOF lambda
    # (~16 8-element folds per row just to test the filter — HOF lambdas
    # get no codegen subexpression sharing).  Compute (m, sd) once per
    # row with a let-bound mean and materialize the struct through a
    # 1-element explode_outer Generate (the ivf_assign idiom: a
    # generated attribute cannot be substituted below its Generate), so
    # the filter and the distance read plain columns.  Same folds over
    # the same values in the same order — bit-identical m/sd/dist.
    from kafkastreamsjavachallenge_spark.functions.text import let

    stat = let(
        fold(F.col("w8")) / F.lit(8.0),
        lambda m: F.struct(
            m.alias("m"),
            F.sqrt(
                fold(F.transform("w8", lambda x: (x - m) * (x - m)))
                / F.lit(8.0)
            ).alias("sd"),
        ),
    )
    s = s.select(
        "user_id",
        "ts",
        "event_id",
        "w8",
        F.explode_outer(F.array(stat)).alias("__st"),
    ).filter(F.col("__st")["sd"] > 0)
    m_c, sd_c = F.col("__st")["m"], F.col("__st")["sd"]
    zq = F.array(*[F.lit(z) for z in _ts_zq()])
    diff = F.zip_with(
        F.col("w8"),
        zq,
        lambda x, q: ((x - m_c) / sd_c - q) * ((x - m_c) / sd_c - q),
    )
    return (
        s.select(
            "user_id",
            F.col("ts").alias("window_start"),
            "event_id",
            F.round(fold(diff), 4).alias("dist"),
        )
        .orderBy("dist", "user_id", "window_start", "event_id")
        .limit(10)
        .select("user_id", "window_start", "dist")
    )


def _ts_motif_sql() -> str:
    zq = "[" + ", ".join(repr(z) for z in _ts_zq()) + "]"

    def fold(lst):
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            + lst
            + "), (a, x) -> a + x)"
        )

    return (
        "WITH e AS (SELECT user_id, ts, event_id, value FROM events "
        "WHERE value IS NOT NULL), "
        "s AS (SELECT user_id, ts, event_id, list(value) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w FROM e), "
        "f AS (SELECT * FROM s WHERE len(w) = 8), "
        f"z1 AS (SELECT *, {fold('w')} / 8.0 AS m FROM f), "
        "z2 AS (SELECT *, sqrt("
        + fold("list_transform(w, x -> (x - m) * (x - m))")
        + " / 8.0) AS sd FROM z1), "
        "z3 AS (SELECT * FROM z2 WHERE sd > 0) "
        "SELECT user_id, window_start, dist FROM ("
        "SELECT user_id, ts AS window_start, event_id, round("
        + fold(
            f"list_transform(range(1, 9), i -> "
            f"((w[i] - m) / sd - {zq}[i]) * ((w[i] - m) / sd - {zq}[i]))"
        )
        + ", 4) AS dist FROM z3 "
        "ORDER BY dist, user_id, window_start, event_id LIMIT 10)"
    )


_TS_MOTIF_SQL = _ts_motif_sql()



def q_changepoint(spark, sf_dir):
    """CUSUM changepoint monitor over the monthly order series: the
    one-sided cumulative sum S_i = max(0, S_{i-1} + (x_i - mu)) with an
    integer mean and an integer alarm gate (2*S >= mu) — level-shift
    detection for ingest-volume monitoring, entirely in integers so the
    recurrence is cross-engine exact.

    The max() breaks prefix-sum linearity, so this cannot be a window
    frame; and a WITH RECURSIVE chain re-executes its anchor subtree per
    level in Spark (measured 33 s at sf0.1 for 80 levels — a scan per
    month).  The right shape for a BOUNDED series is the ts-motif one:
    collapse the corpus to |months| rows, collect the sorted sequence
    into ONE row, and run the recurrence as a single sequential HOF fold
    — one corpus scan, one job, the fold itself 80 steps on one core.
    The oracle keeps the recursive-CTE form, pinning that fold == chain."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.count(F.lit(1)).alias("x"))
    stats = monthly.agg(
        F.expr("sum(x) DIV count(*)").alias("mu")
    )
    seq = monthly.agg(
        F.array_sort(F.collect_list(F.struct("month", "x"))).alias("seq")
    )
    elem_t = "array<struct<month:timestamp,x:bigint,s:bigint>>"
    folded = seq.crossJoin(F.broadcast(stats)).select(
        "mu",
        F.aggregate(
            "seq",
            F.struct(
                F.lit(0).cast("bigint").alias("s"),
                F.expr(f"CAST(array() AS {elem_t})").alias("out"),
            ),
            lambda acc, e: F.struct(
                F.greatest(
                    F.lit(0).cast("bigint"), acc["s"] + e["x"] - F.col("mu")
                ).alias("s"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            e["month"].alias("month"),
                            e["x"].alias("x"),
                            F.greatest(
                                F.lit(0).cast("bigint"),
                                acc["s"] + e["x"] - F.col("mu"),
                            ).alias("s"),
                        )
                    ),
                ).alias("out"),
            ),
            lambda acc: acc["out"],
        ).alias("cs"),
    )
    return folded.select("mu", F.explode("cs").alias("e")).select(
        F.col("e.month").alias("month"),
        F.col("e.x").alias("n_orders"),
        F.col("e.s").alias("cusum"),
        (F.col("e.s") * 2 >= F.col("mu")).cast("int").alias("is_alarm"),
    )



def q_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend over the monthly order series: the exact
    median of all pairwise slopes ((x_j - x_i)·1e6 DIV (j - i) over
    month-index pairs) — the slope estimator that shrugs off the
    outlier months a least-squares fit (q_regr) chases.  Slopes are
    integer e6 rationals and the median is rank-exact ((n+1) DIV 2 over
    (slope, i, j)), so the whole estimate is cross-engine exact.

    Scale: the corpus collapses to |months| rows FIRST; the pair join is
    |months|² ≈ 3k rows — bounded by calendar length, not corpus size
    (at decade scale, sample month pairs or switch to the repeated-
    median variant; same two-stage shape)."""
    o = _t(spark, sf_dir, "orders")
    # r12 (guide §1.2): the |months|-row series fans out to both pair
    # sides and the count/median branches — checkpoint so the corpus
    # aggregate runs once, not once per branch
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=False)
    )
    r = monthly.select(
        "x",
        F.row_number()
        .over(Window.orderBy("month"))
        .alias("rn"),
    )
    a = r.select(F.col("rn").alias("i"), F.col("x").alias("xi"))
    b = r.select(F.col("rn").alias("j"), F.col("x").alias("xj"))
    slopes = (
        a.join(b, F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.expr("((xj - xi) * 1000000) DIV (j - i)").alias("slope_e6"),
        )
        # |months|²/2 rows, read by the count AND the median rank filter
        .localCheckpoint(eager=False)
    )
    n = slopes.agg(F.count(F.lit(1)).alias("n_pairs"))
    w = Window.orderBy("slope_e6", "i", "j")
    med = (
        slopes.withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(n.withColumnRenamed("n_pairs", "__n")))
        .filter(F.col("rk") == F.expr("(__n + 1) DIV 2"))
        .select(F.col("slope_e6").alias("median_slope_e6"))
    )
    return n.crossJoin(F.broadcast(med)).select("n_pairs", "median_slope_e6")


def q_mad(spark, sf_dir):
    """Median absolute deviation of the monthly order series — the
    robust scale estimate that pairs with q_theil_sen's robust slope
    (outlier months move a stddev, not a MAD): two rank-exact medians
    (values, then absolute deviations from the first), both integers,
    so the whole report is cross-engine exact.

    Scale: |months| rows after the one corpus aggregate; each median is
    a rank filter against a 1-row count broadcast."""
    o = _t(spark, sf_dir, "orders")
    # r12 (guide §1.2): the |months|-row series feeds the count, both
    # medians and the deviation table — checkpoint so the corpus
    # aggregate runs once, not once per branch
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=False)
    )
    n = monthly.agg(F.count(F.lit(1)).alias("__n"))

    def exact_median(df, col, order_extra):
        w = Window.orderBy(col, *order_extra)
        return (
            df.withColumn("rk", F.row_number().over(w))
            .crossJoin(F.broadcast(n))
            .filter(F.col("rk") == F.expr("(__n + 1) DIV 2"))
            .select(F.col(col).alias("med"))
        )

    med = exact_median(monthly, "x", ["month"])
    dev = monthly.crossJoin(F.broadcast(med)).select(
        "month", F.abs(F.col("x") - F.col("med")).alias("d")
    )
    mad = exact_median(dev, "d", ["month"]).withColumnRenamed("med", "mad")
    return (
        n.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            F.col("__n").alias("n_months"),
            F.col("med").alias("median_orders"),
            F.col("mad").alias("mad_orders"),
        )
    )

def q_concurrency_sweep(spark, sf_dir):
    """Sweep-line concurrency: peak number of simultaneously-active user
    spans per day — the "max concurrent sessions" metric every capacity
    plan starts from.  Each (user, day) activity span [first event,
    last event] becomes a +1 boundary at its start and a -1 at its end;
    a running sum over the day's boundary stream IS the live-span count,
    and its max is the peak.  START boundaries sort before ends at equal
    timestamps (delta DESC), the closed [s, e] convention: touching
    spans [a, t] and [t, b] DO count as concurrent, and — the important
    edge — a single-event user (s == e) registers as live at that
    instant instead of silently vanishing from the peak.  The running
    sum is also monotone-safe (never transiently negative), since no
    prefix can hold more ends than starts.  Pinned identically in the
    oracle and by the single-event case in tests/test_corpus_pack.py.

    Scale shape: spans come from one (user, day) hash aggregate; the
    sweep partitions BY DAY, so the sort and prefix sum parallelize
    across the calendar (each partition holds 2×|users active that day|
    boundary rows — never the raw event stream), and the peak is one
    more per-day aggregate.  This is the sweep-line replacement for the
    quadratic interval self-join."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    bounds = spans.select(
        "day", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select("day", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("t", F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    live = bounds.withColumn("live", F.sum("delta").over(w))
    return live.groupBy("day").agg(
        F.max("live").cast("bigint").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_spans"),
    )


_CONCURRENCY_SQL = (
    "WITH spans AS (SELECT user_id, date_trunc('day', ts) AS day, "
    "min(ts) AS s, max(ts) AS e FROM events GROUP BY 1, 2), "
    "bounds AS (SELECT day, s AS t, 1 AS delta FROM spans "
    "UNION ALL SELECT day, e, -1 FROM spans), "
    "live AS (SELECT day, sum(delta) OVER (PARTITION BY day "
    "ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS live FROM bounds) "
    "SELECT day, CAST(max(live) AS BIGINT) AS peak_concurrency, "
    "CAST(count(*) / 2 AS BIGINT) AS n_spans FROM live GROUP BY day"
)


QUERIES = {
    "q_concurrency_sweep": (q_concurrency_sweep, _CONCURRENCY_SQL),
    "q_mad": (
        q_mad,
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
        "count(*) AS x FROM orders GROUP BY 1), "
        "n AS (SELECT count(*) AS nn FROM m), "
        "med AS (SELECT x AS med FROM (SELECT x, month, row_number() OVER "
        "(ORDER BY x, month) AS rk FROM m) r CROSS JOIN n "
        "WHERE rk = (nn + 1) // 2), "
        "dev AS (SELECT m.month, abs(m.x - med.med) AS d "
        "FROM m CROSS JOIN med), "
        "mad AS (SELECT d AS mad FROM (SELECT d, month, row_number() OVER "
        "(ORDER BY d, month) AS rk FROM dev) r CROSS JOIN n "
        "WHERE rk = (nn + 1) // 2) "
        "SELECT n.nn AS n_months, med.med AS median_orders, "
        "mad.mad AS mad_orders FROM n CROSS JOIN med CROSS JOIN mad",
    ),
    "q_theil_sen": (
        q_theil_sen,
        "WITH m AS (SELECT date_trunc('month', o_orderdate) AS month, "
        "count(*) AS x FROM orders GROUP BY 1), "
        "r AS (SELECT x, row_number() OVER (ORDER BY month) AS rn FROM m), "
        "sl AS (SELECT a.rn AS i, b.rn AS j, "
        "((b.x - a.x) * 1000000) // (b.rn - a.rn) AS slope_e6 "
        "FROM r a JOIN r b ON a.rn < b.rn), "
        "n AS (SELECT count(*) AS n_pairs FROM sl), "
        "md AS (SELECT slope_e6 AS median_slope_e6 FROM "
        "(SELECT slope_e6, row_number() OVER "
        "(ORDER BY slope_e6, i, j) AS rk FROM sl) x CROSS JOIN n "
        "WHERE rk = (n_pairs + 1) // 2) "
        "SELECT n_pairs, median_slope_e6 FROM n CROSS JOIN md",
    ),
    "q_changepoint": (
        q_changepoint,
        "WITH RECURSIVE m AS (SELECT date_trunc('month', o_orderdate) "
        "AS month, count(*) AS x FROM orders GROUP BY 1), "
        "r AS (SELECT month, x, row_number() OVER (ORDER BY month) AS rn "
        "FROM m), "
        "st AS (SELECT CAST(sum(x) AS BIGINT) // count(*) AS mu FROM m), "
        "c(rn, month, x, s) AS ("
        "SELECT r.rn, r.month, r.x, "
        "greatest(CAST(0 AS BIGINT), r.x - st.mu) "
        "FROM r CROSS JOIN st WHERE r.rn = 1 "
        "UNION ALL "
        "SELECT r.rn, r.month, r.x, "
        "greatest(CAST(0 AS BIGINT), c.s + r.x - st.mu) "
        "FROM c JOIN r ON r.rn = c.rn + 1 CROSS JOIN st) "
        "SELECT c.month, c.x AS n_orders, c.s AS cusum, "
        "CAST(CASE WHEN c.s * 2 >= st.mu THEN 1 ELSE 0 END AS INTEGER) "
        "AS is_alarm FROM c CROSS JOIN st",
    ),
    "q_ts_motif": (
        q_ts_motif,
        _TS_MOTIF_SQL,
    ),
    "q_gap_fill": (
        q_gap_fill,
        "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        "count(*) AS cnt FROM events WHERE value > 190 GROUP BY 1, 2), "
        "bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1 "
        "FROM daily GROUP BY 1), "
        "spine AS (SELECT event_type, "
        "CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) "
        "AS day FROM bounds) "
        "SELECT spine.event_type, spine.day, "
        "coalesce(cnt, 0) AS cnt_zero, "
        "last_value(cnt IGNORE NULLS) OVER (PARTITION BY spine.event_type "
        "ORDER BY spine.day ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS cnt_ffill, "
        "CAST(cnt IS NULL AS INT) AS was_gap "
        "FROM spine LEFT JOIN daily ON spine.event_type = daily.event_type "
        "AND spine.day = daily.day",
    ),
    "q_streaks": (
        q_streaks,
        "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        "FROM events), "
        "isl AS (SELECT user_id, day - CAST(row_number() OVER "
        "(PARTITION BY user_id ORDER BY day) AS INT) AS anchor FROM d), "
        "streaks AS (SELECT user_id, anchor, count(*) AS len FROM isl "
        "GROUP BY 1, 2), "
        "longest AS (SELECT user_id, max(len) AS best FROM streaks "
        "GROUP BY 1) "
        "SELECT best, count(*) AS n_users FROM longest GROUP BY best",
    ),
    "q_grid_join": (
        q_grid_join,
        # Brute-force oracle (no grid): every supplier x customer pair with
        # the exact rounded-haversine predicate.  Parity with the Spark
        # grid decomposition proves the 3x3 neighborhood loses no pairs.
        "WITH sup AS (SELECT s_suppkey, s_nationkey, "
        "CAST(s_suppkey % 121 - 60 AS DOUBLE) AS s_lat, "
        "CAST(s_suppkey * 7 % 321 - 160 AS DOUBLE) AS s_lon FROM supplier), "
        "cus AS (SELECT c_custkey, "
        "CAST(c_custkey % 121 - 60 AS DOUBLE) AS c_lat, "
        "CAST(c_custkey * 7 % 321 - 160 AS DOUBLE) AS c_lon FROM customer), "
        "pairs AS (SELECT DISTINCT s_suppkey, s_nationkey, c_custkey, "
        "round(2 * 6371.0 * asin(sqrt("
        "sin((radians(c_lat) - radians(s_lat)) / 2) * "
        "sin((radians(c_lat) - radians(s_lat)) / 2) + "
        "cos(radians(s_lat)) * cos(radians(c_lat)) * "
        "sin((radians(c_lon) - radians(s_lon)) / 2) * "
        "sin((radians(c_lon) - radians(s_lon)) / 2))), 4) AS km "
        "FROM sup, cus "
        "WHERE round(2 * 6371.0 * asin(sqrt("
        "sin((radians(c_lat) - radians(s_lat)) / 2) * "
        "sin((radians(c_lat) - radians(s_lat)) / 2) + "
        "cos(radians(s_lat)) * cos(radians(c_lat)) * "
        "sin((radians(c_lon) - radians(s_lon)) / 2) * "
        "sin((radians(c_lon) - radians(s_lon)) / 2))), 4) < 1000.0) "
        "SELECT s_nationkey, count(*) AS n_pairs, "
        "count(DISTINCT c_custkey) AS n_customers, min(km) AS min_km "
        "FROM pairs GROUP BY s_nationkey",
    ),
    "q_resample_ohlc": (
        q_resample_ohlc,
        "WITH daily AS (SELECT CAST(l_shipdate AS DATE) AS d, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) "
        "AS rev FROM lineitem GROUP BY 1) "
        "SELECT CAST(date_trunc('week', d) AS DATE) AS week, "
        "round(min_by(rev, d), 4) AS open, round(max(rev), 4) AS high, "
        "round(min(rev), 4) AS low, round(max_by(rev, d), 4) AS close, "
        "count(*) AS n_days FROM daily GROUP BY 1",
    ),
    "q_url_parse": (
        q_url_parse,
        "WITH u AS (SELECT 'https://' || "
        "lower(replace(c_mktsegment, ' ', '-')) || "
        "'.example.com/cust/' || CAST(c_custkey AS VARCHAR) || '?n=' || "
        "CAST(c_nationkey AS VARCHAR) AS url FROM customer), "
        "p AS (SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, "
        "regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path FROM u) "
        "SELECT host, count(*) AS n, count(DISTINCT path) AS n_paths, "
        "min(path) AS first_path FROM p GROUP BY host",
    ),
}
