"""Applied-analytics pack: the statistical / BI workloads a production
user runs on top of the event + order tables — chi-square independence,
Gini concentration, Benford first-digit profiling, exponentially
weighted moving averages, moving medians, Pareto/ABC classification,
market-basket co-occurrence lift, RFM segmentation, and geo distance.

The reference's analytics surface is a single windowed count-distinct
(UniqueUsersApp.java:91-134); these are the follow-on questions its
operators feed (README.md:63-83's per-minute unique table is exactly the
kind of daily/minutely rollup these queries consume).  Engine rules as
everywhere else in this repo: built-in Catalyst expressions only, one
shuffle per fact-table pass, tiny derived tables broadcast, decimal
accumulation wherever a float sum crosses the oracle hash, unique
tie-break keys under every window order.

Cross-engine determinism notes specific to this pack:
- q_ewma fixes alpha = 0.5 so every weight is an exact power of two:
  pow(0.5, k) and weight * x are exact IEEE-754 operations in both
  engines, and the final sum is decimal-accumulated (order-free).
- q_chi_square / q_gini sum per-row double terms AFTER casting each term
  to decimal, so the aggregate is order-independent; each term itself is
  computed from integers (counts, ranks) and is bit-identical across
  engines.
- q_haversine rounds the per-row distance to 4 decimals before any
  aggregation, absorbing libm-vs-JVM trig ulp differences.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------- chi-square independence


def q_chi_square(spark, sf_dir):
    """Pearson chi-square test of independence between o_orderstatus and
    o_orderpriority.  One hash aggregate collapses the fact table to the
    |statuses| x |priorities| contingency table; row/column/grand totals
    are windows over that tiny table, and the final statistic is a
    decimal-accumulated sum of per-cell terms (order-independent)."""
    od = _t(spark, sf_dir, "orders")
    cells = od.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("obs")
    )
    w_row = Window.partitionBy("o_orderstatus")
    w_col = Window.partitionBy("o_orderpriority")
    w_all = Window.partitionBy()
    t = cells.select(
        "o_orderstatus",
        "o_orderpriority",
        "obs",
        F.sum("obs").over(w_row).alias("rt"),
        F.sum("obs").over(w_col).alias("ct"),
        F.sum("obs").over(w_all).alias("tot"),
    )
    exp = F.col("rt") * F.col("ct") / F.col("tot")
    term = (F.col("obs") - exp) * (F.col("obs") - exp) / exp
    return t.agg(
        F.round(
            F.sum(term.cast("decimal(28,10)")).cast("double"), 4
        ).alias("chi2"),
        (
            (F.count_distinct("o_orderstatus") - 1)
            * (F.count_distinct("o_orderpriority") - 1)
        ).cast("bigint").alias("dof"),
        F.max("tot").alias("n"),
    )


# --------------------------------------------- Gini concentration


def q_gini(spark, sf_dir):
    """Gini coefficient of order value per priority class, via the exact
    rank formula  G = (2*SUM(i*x) - (n+1)*SUM(x)) / (n*SUM(x))  over
    values sorted ascending.  The i*x products are cast to decimal
    per-row so the sums are order-free; permuting equal x values within
    a rank block leaves SUM(i*x) unchanged, so ties are harmless and the
    result is engine-independent.  One shuffle (partitionBy priority)."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    r = od.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
    )
    sum_ix = F.sum(
        (F.col("rn") * F.col("o_totalprice")).cast("decimal(28,6)")
    ).cast("double")
    sum_x = F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double")
    n = F.count("*")
    return r.groupBy("o_orderpriority").agg(
        F.round((2 * sum_ix - (n + 1) * sum_x) / (n * sum_x), 6).alias("gini"),
        n.alias("n"),
    )


# --------------------------------------------- Benford profile


def q_benford(spark, sf_dir):
    """First-significant-digit distribution of o_totalprice vs Benford's
    law.  The digit is taken from the string form of floor(value) cast
    through bigint (explicit floor first: Spark's double->bigint cast
    truncates while DuckDB's rounds, so the floor is load-bearing).
    Single hash aggregate to 9 rows."""
    od = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    d = od.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    w_all = Window.partitionBy()
    return d.select(
        "digit",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_all), 6).alias("pct"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_pct"),
    )


# --------------------------------------------- EWMA


def q_ewma(spark, sf_dir):
    """Exponentially weighted moving average (alpha = 0.5) of daily
    revenue per return flag, evaluated at the last day of each series
    via the closed form  s_n = sum_k w_k * x_k  with
    w_k = alpha*(1-alpha)^(n-k) for k>1 and w_1 = (1-alpha)^(n-1).
    alpha = 0.5 makes every weight an exact binary power, so weight and
    weight*x are bit-exact in both engines; the sum is decimal-
    accumulated.  The fact table collapses to |flag|x|day| rows in one
    hash aggregate before any window runs."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_returnflag", "l_shipdate").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_shipdate")
    w_n = Window.partitionBy("l_returnflag")
    r = daily.select(
        "l_returnflag",
        "rev",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_n).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.5), F.col("n") - 1)
    ).otherwise(F.lit(0.5) * F.pow(F.lit(0.5), F.col("n") - F.col("rn")))
    return r.groupBy("l_returnflag").agg(
        F.round(
            F.sum((weight * F.col("rev")).cast("decimal(38,12)")).cast(
                "double"
            ),
            4,
        ).alias("ewma_rev"),
        F.max("n").alias("n_days"),
    )


# --------------------------------------------- moving median


def q_moving_median(spark, sf_dir):
    """7-day centered moving median of global daily revenue: exact
    interpolated percentile(0.5) over a ROWS BETWEEN 3 PRECEDING AND 3
    FOLLOWING frame (Spark's F.percentile supports frames; F.median does
    not).  The fact table is first collapsed to one row per day — at any
    scale the windowed input is |days| rows, so the single-partition
    ordered window is a constant-size post-aggregation step, not a
    fact-table sort."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy("l_shipdate").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("l_shipdate").rowsBetween(-3, 3)
    return daily.select(
        "l_shipdate",
        F.round("rev", 4).alias("rev"),
        F.round(F.percentile("rev", F.lit(0.5)).over(w), 4).alias("med7"),
    )


# --------------------------------------------- Pareto / ABC


def q_pareto(spark, sf_dir):
    """ABC (Pareto) classification of part brands by revenue: brands
    covering the first 80% of cumulative revenue are class A, to 95% B,
    rest C.  Revenue per brand is one broadcast-joined hash aggregate;
    the cumulative share runs over the tiny |brands| table with revenue
    cast to decimal so the running sum is exact (window running sums of
    doubles can re-associate differently across engines)."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    rev = (
        li.join(
            F.broadcast(pt.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
                "rev_d"
            )
        )
    )
    w_cum = (
        Window.orderBy(F.desc("rev_d"), F.asc("p_brand"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    c = rev.select(
        "p_brand",
        "rev_d",
        (
            F.sum("rev_d").over(w_cum) / F.sum("rev_d").over(w_all)
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    return c.groupBy(cls.alias("abc_class")).agg(
        F.count("*").alias("n_brands"),
        F.sum("rev_d").cast("double").alias("class_rev"),
    )


# --------------------------------------------- market-basket lift


def q_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence of part types within an order:
    support and lift for every unordered p_type pair.  The item table is
    distinct (order, type) — one shuffle on orderkey — and the pair join
    is co-partitioned on that same key, so no second fact-table shuffle;
    per-type and total counts are tiny aggregates broadcast into the
    15-row pair table."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    items = (
        li.join(
            F.broadcast(pt.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_type")
        .distinct()
        # r12 (guide §1.2): items fans out five ways (both self-join
        # sides, per-type counts twice, the order total) — checkpoint so
        # the fact-table join + distinct runs once, not once per branch
        # (measured 4.11 -> 2.82 s at sf0.1)
        .localCheckpoint(eager=False)
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_type") < F.col("b.p_type")),
        )
        .groupBy(
            F.col("a.p_type").alias("type_a"),
            F.col("b.p_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_ab"))
    )
    per_type = items.groupBy(F.col("p_type")).agg(
        F.count("*").alias("n_t")
    )
    total = items.agg(
        F.count_distinct(F.col("l_orderkey")).alias("n_orders")
    )
    return (
        pairs.join(
            F.broadcast(per_type.withColumnsRenamed({"p_type": "type_a", "n_t": "n_a"})),
            "type_a",
        )
        .join(
            F.broadcast(per_type.withColumnsRenamed({"p_type": "type_b", "n_t": "n_b"})),
            "type_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("n_ab") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------- RFM segmentation


def q_rfm(spark, sf_dir):
    """RFM customer segmentation: per-customer recency (days since last
    order, vs the global max order date), frequency (order count), and
    monetary (decimal revenue sum), each cut into quartiles by ntile(4)
    with c_custkey tie-breaks, then segment cells counted.  Two passes:
    one shuffle on custkey for the per-customer rollup, then three
    windows over the |customers| table; the global max date is a 1-row
    broadcast."""
    od = _t(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_d"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("monetary"),
    )
    maxd = od.agg(F.max("o_orderdate").alias("max_d"))
    rfm = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff("max_d", "last_d").alias("recency_d"),
        "freq",
        "monetary",
    )
    w_r = Window.orderBy("recency_d", "o_custkey")
    w_f = Window.orderBy(F.desc("freq"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    scored = rfm.select(
        F.ntile(4).over(w_r).alias("r_q"),
        F.ntile(4).over(w_f).alias("f_q"),
        F.ntile(4).over(w_m).alias("m_q"),
        "monetary",
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_cust"),
        F.round(
            F.sum(F.col("monetary").cast("decimal(18,4)")).cast("double"), 4
        ).alias("seg_rev"),
    )


# --------------------------------------------- geo distance


def q_haversine(spark, sf_dir):
    """Haversine great-circle distance from synthesized supplier
    coordinates (deterministic key-derived lat/lon) to the origin, with
    per-zone counts of suppliers inside a 5000 km radius.  Per-row
    distances are rounded to 4 decimals BEFORE aggregation so 1-ulp trig
    differences between libm and the JVM cannot leak into the decimal-
    accumulated sums or the radius predicate."""
    su = _t(spark, sf_dir, "supplier")
    lat = (F.col("s_suppkey") % 181 - 90).cast("double")
    lon = (F.col("s_suppkey") * 7 % 361 - 180).cast("double")
    dlat = F.radians(lat) / 2
    dlon = F.radians(lon) / 2
    h = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat)) * F.cos(
        F.lit(0.0)
    ) * F.sin(dlon) * F.sin(dlon)
    km = F.round(2 * 6371.0 * F.asin(F.sqrt(h)), 4)
    z = su.select(
        (F.col("s_nationkey") % 5).alias("zone"), km.alias("km")
    )
    return z.groupBy("zone").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("km") < 5000.0).alias("n_within_5000km"),
        F.round(
            F.sum(F.col("km").cast("decimal(18,4)")).cast("double")
            / F.count("*"),
            4,
        ).alias("avg_km"),
    )


def q_anomaly_zscore(spark, sf_dir):
    """Daily-volume anomaly detection per event type: z-score each day's
    count against that type's own mean/std and flag |z| >= 2 — the
    monitoring query an ingest pipeline alerts on.  Mean and variance
    derive from EXACT integer sums (count, sum, sum of squares), so the
    float expressions are structurally identical in both engines;
    zero-variance series yield null z (guarded, no NaN drift).  Two hash
    aggregates + a broadcast of the per-type stats table."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("k")
    var = F.col("ss").cast("double") / F.col("k") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    guarded = F.when(var <= 0, F.lit(None).cast("double")).otherwise(
        F.round(z, 4)
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            guarded.alias("z"),
            F.when(F.abs(F.coalesce(guarded, F.lit(0.0))) >= 2, 1)
            .otherwise(0)
            .alias("is_anomaly"),
        )
    )


QUERIES = {
    "q_anomaly_zscore": (
        q_anomaly_zscore,
        "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        "count(*) AS n FROM events GROUP BY 1, 2), "
        "st AS (SELECT event_type, count(*) AS k, "
        "CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS ss "
        "FROM daily GROUP BY 1) "
        "SELECT event_type, day, n, "
        "CASE WHEN CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * "
        "(CAST(s AS DOUBLE) / k) <= 0 THEN NULL "
        "ELSE round((n - CAST(s AS DOUBLE) / k) / "
        "sqrt(CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * "
        "(CAST(s AS DOUBLE) / k)), 4) + 0 END AS z, "
        "CASE WHEN abs(coalesce(CASE WHEN CAST(ss AS DOUBLE) / k - "
        "(CAST(s AS DOUBLE) / k) * (CAST(s AS DOUBLE) / k) <= 0 THEN NULL "
        "ELSE round((n - CAST(s AS DOUBLE) / k) / "
        "sqrt(CAST(ss AS DOUBLE) / k - (CAST(s AS DOUBLE) / k) * "
        "(CAST(s AS DOUBLE) / k)), 4) END, 0.0)) >= 2 THEN 1 ELSE 0 END "
        "AS is_anomaly "
        "FROM daily JOIN st USING (event_type)",
    ),
    "q_chi_square": (
        q_chi_square,
        "WITH cells AS (SELECT o_orderstatus, o_orderpriority, count(*) AS obs "
        "FROM orders GROUP BY 1, 2), "
        "t AS (SELECT o_orderstatus, o_orderpriority, obs, "
        "sum(obs) OVER (PARTITION BY o_orderstatus) AS rt, "
        "sum(obs) OVER (PARTITION BY o_orderpriority) AS ct, "
        "sum(obs) OVER () AS tot FROM cells) "
        "SELECT round(CAST(sum(CAST((obs - rt*ct/tot) * (obs - rt*ct/tot) "
        "/ (rt*ct/tot) AS DECIMAL(28,10))) AS DOUBLE), 4) AS chi2, "
        "CAST((count(DISTINCT o_orderstatus) - 1) * "
        "(count(DISTINCT o_orderpriority) - 1) AS BIGINT) AS dof, "
        "CAST(max(tot) AS BIGINT) AS n FROM t",
    ),
    "q_gini": (
        q_gini,
        "WITH r AS (SELECT o_orderpriority, o_totalprice, "
        "row_number() OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey) AS rn FROM orders) "
        "SELECT o_orderpriority, "
        "round((2 * CAST(sum(CAST(rn * o_totalprice AS DECIMAL(28,6))) "
        "AS DOUBLE) - (count(*) + 1) * CAST(sum(CAST(o_totalprice "
        "AS DECIMAL(28,6))) AS DOUBLE)) / (count(*) * "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)), 6) "
        "AS gini, count(*) AS n FROM r GROUP BY o_orderpriority",
    ),
    "q_benford": (
        q_benford,
        "WITH d AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice) "
        "AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit FROM orders), "
        "c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit) "
        "SELECT digit, n, round(n / sum(n) OVER (), 6) AS pct, "
        "round(log10(1.0 + 1.0 / digit), 6) AS benford_pct FROM c",
    ),
    "q_ewma": (
        q_ewma,
        "WITH daily AS (SELECT l_returnflag, l_shipdate, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev "
        "FROM lineitem GROUP BY 1, 2), "
        "r AS (SELECT l_returnflag, rev, "
        "row_number() OVER (PARTITION BY l_returnflag ORDER BY l_shipdate) "
        "AS rn, count(*) OVER (PARTITION BY l_returnflag) AS n FROM daily) "
        "SELECT l_returnflag, "
        "round(CAST(sum(CAST((CASE WHEN rn = 1 THEN pow(0.5, n - 1) "
        "ELSE 0.5 * pow(0.5, n - rn) END) * rev AS DECIMAL(38,12))) "
        "AS DOUBLE), 4) AS ewma_rev, max(n) AS n_days "
        "FROM r GROUP BY l_returnflag",
    ),
    "q_moving_median": (
        q_moving_median,
        "WITH daily AS (SELECT l_shipdate, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev "
        "FROM lineitem GROUP BY 1) "
        "SELECT l_shipdate, round(rev, 4) AS rev, "
        "round(median(rev) OVER (ORDER BY l_shipdate "
        "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS med7 FROM daily",
    ),
    "q_pareto": (
        q_pareto,
        "WITH rev AS (SELECT p_brand, "
        "sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev_d "
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1), "
        "c AS (SELECT p_brand, rev_d, "
        "sum(rev_d) OVER (ORDER BY rev_d DESC, p_brand ASC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / "
        "sum(rev_d) OVER () AS cum_share FROM rev) "
        "SELECT CASE WHEN cum_share <= 0.80 THEN 'A' "
        "WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc_class, "
        "count(*) AS n_brands, CAST(sum(rev_d) AS DOUBLE) AS class_rev "
        "FROM c GROUP BY 1",
    ),
    "q_cooccurrence": (
        q_cooccurrence,
        "WITH items AS (SELECT DISTINCT l_orderkey, p_type "
        "FROM lineitem JOIN part ON l_partkey = p_partkey), "
        "pairs AS (SELECT a.p_type AS type_a, b.p_type AS type_b, "
        "count(*) AS n_ab FROM items a JOIN items b "
        "ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type "
        "GROUP BY 1, 2), "
        "per_type AS (SELECT p_type, count(*) AS n_t FROM items GROUP BY 1), "
        "total AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items) "
        "SELECT type_a, type_b, n_ab, "
        "round(n_ab / n_orders, 6) AS support, "
        "round(n_ab * n_orders / (ta.n_t * tb.n_t), 6) AS lift "
        "FROM pairs JOIN per_type ta ON pairs.type_a = ta.p_type "
        "JOIN per_type tb ON pairs.type_b = tb.p_type CROSS JOIN total",
    ),
    "q_rfm": (
        q_rfm,
        "WITH per_cust AS (SELECT o_custkey, max(o_orderdate) AS last_d, "
        "count(*) AS freq, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) "
        "AS monetary FROM orders GROUP BY 1), "
        "rfm AS (SELECT o_custkey, "
        "date_diff('day', last_d, (SELECT max(o_orderdate) FROM orders)) "
        "AS recency_d, freq, monetary FROM per_cust), "
        "scored AS (SELECT "
        "ntile(4) OVER (ORDER BY recency_d, o_custkey) AS r_q, "
        "ntile(4) OVER (ORDER BY freq DESC, o_custkey ASC) AS f_q, "
        "ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_q, "
        "monetary FROM rfm) "
        "SELECT r_q, f_q, m_q, count(*) AS n_cust, "
        "round(CAST(sum(CAST(monetary AS DECIMAL(18,4))) AS DOUBLE), 4) "
        "AS seg_rev FROM scored GROUP BY 1, 2, 3",
    ),
    "q_haversine": (
        q_haversine,
        "WITH z AS (SELECT s_nationkey % 5 AS zone, "
        "round(2 * 6371.0 * asin(sqrt("
        "sin(radians(CAST(s_suppkey % 181 - 90 AS DOUBLE)) / 2) * "
        "sin(radians(CAST(s_suppkey % 181 - 90 AS DOUBLE)) / 2) + "
        "cos(radians(CAST(s_suppkey % 181 - 90 AS DOUBLE))) * cos(0.0) * "
        "sin(radians(CAST(s_suppkey * 7 % 361 - 180 AS DOUBLE)) / 2) * "
        "sin(radians(CAST(s_suppkey * 7 % 361 - 180 AS DOUBLE)) / 2))), 4) "
        "AS km FROM supplier) "
        "SELECT zone, count(*) AS n, "
        "count(*) FILTER (WHERE km < 5000.0) AS n_within_5000km, "
        "round(CAST(sum(CAST(km AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) "
        "AS avg_km FROM z GROUP BY zone",
    ),
}
