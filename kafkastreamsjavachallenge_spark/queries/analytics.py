"""Analytics breadth pack: statistical aggregates, ordered string
aggregation, distribution window functions, top-k-per-group, LATERAL
joins, gaps-and-islands sessionization, sequence generation, safe casts,
array higher-order functions, embedding centroids, four more TPC-H
composites (Q8/Q12/Q16/Q21, schema-adapted), and corpus-level text
statistics (bigram frequency, document frequency / IDF).

The reference's surface is tiny (SURVEY.md §0); these rows extend the
declared-inventory categories of SURVEY.md §2.2 (aggregations, window
functions, joins, scalar functions, LLM-pipeline text analysis) with the
same Spark-first rules: built-in Catalyst expressions only, no Python in
the hot path, deterministic output (explicit tiebreaks, decimal-
accumulated sums where hash-compared).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table, register_views


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _dsum(col, scale=4, alias=None):
    """Exact sum: decimal accumulate, double out (engine-order independent)."""
    c = F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
    return c.alias(alias) if alias else c


# ------------------------------------------------------------ stats pack


def q_stats_agg(spark, sf_dir):
    """Statistical aggregates (stddev/variance/correlation/covariance) per
    group — all partial-aggregatable moments, so the plan is a single
    map-side-combine hash aggregate (scale-safe: one shuffle of G rows)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


def q_median(spark, sf_dir):
    """Exact grouped median (percentile_cont 0.5, linear interpolation) —
    an order statistic, not a running sum, so it is bit-deterministic
    across engines and partitionings.  Spark computes it with a
    partial-aggregatable sketch-free sort per group."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.median("l_extendedprice").alias("med_price"),
    )


def q_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of the daily-revenue series: one fact-table
    hash aggregate to ~O(days) rows, then a window lag + corr on the tiny
    series (single-partition window is deliberate — the series is small
    by construction, the fact table never passes through it)."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("day")).agg(
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
        ).alias("rev")
    )
    w = Window.orderBy("day")
    series = daily.withColumn("prev_rev", F.lag("rev").over(w))
    return series.agg(
        F.round(F.corr("rev", "prev_rev"), 4).alias("lag1_autocorr"),
        F.count("prev_rev").alias("n_days"),
    )


def q_null_fns(spark, sf_dir):
    """Null-handling scalar pack: nullif / coalesce / null-guarded
    division — pure projections inside whole-stage codegen."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri_nn"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("MEDIUM")
        ).alias("pri_filled"),
        (F.col("o_totalprice") / F.nullif(F.lit(0.0), F.lit(0.0))).alias("div_null"),
    )


def q_funnel(spark, sf_dir):
    """Ordered event funnel (view → click → purchase): each stage's
    timestamp is the min event time strictly after the previous stage.
    Three user-keyed aggregates + joins, all sharing
    HashPartitioning(user_id), so AQE plans one logical shuffle reused
    across stages — per-user state never materializes on the driver."""
    ev = _t(spark, sf_dir, "events")
    # r12 (guide §1.2): each stage table feeds the next stage AND the
    # final assembly — checkpoint v and c so each stage's scan+aggregate
    # runs once (the r11 plan re-computed v twice and c twice: six event
    # scans for three stages)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            ).alias("stage"),
        )
    )


def q_retention(spark, sf_dir):
    """Cohort retention: users grouped by first active day; for each
    (cohort, day-offset) the count of distinct users active that day.
    Two hash aggregates on user_id + one broadcast-able join — the
    classic retention triangle without any driver-side loop."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    cohort = days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_day"),
            F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def q_scd2(spark, sf_dir):
    """SCD-type-2 interval construction: collapse each user's event-type
    run-length sequence into (state, valid_from, valid_to) rows — change
    detection via lag, interval close via lead over the change rows.
    Both window passes and the filter share one user-keyed sort-shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )


def q_regr(spark, sf_dir):
    """Linear-regression aggregates (slope/intercept/R²/count) per group —
    moment-based, partially aggregatable, one map-side-combine shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


def q_bit_agg(spark, sf_dir):
    """Bitwise aggregates (bit_and / bit_or / bit_xor) per group — all
    commutative-associative, so partial aggregation applies and the plan
    is one map-side-combine hash aggregate (G rows shuffled)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bit_and("l_linenumber").alias("band"),
        F.bit_or("l_linenumber").alias("bor"),
        F.bit_xor("l_orderkey").alias("bxor"),
    )


def q_dense_rank(spark, sf_dir):
    """rank vs dense_rank over a tie-prone ordering (acctbal rounded to
    hundreds) — tie semantics are engine-independent because ranks are
    fully determined by the (partition, order-key) multiset."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "bal_bucket", (F.floor(F.col("c_acctbal") / 100) * 100).cast("bigint")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("bal_bucket").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "bal_bucket",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def q_bool_agg(spark, sf_dir):
    """Boolean/conditional aggregates: count_if, bool_and, bool_or."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).cast("int").alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).cast("int").alias("any_over_400k"),
    )


def q_string_agg(spark, sf_dir):
    """Ordered string aggregation (LISTAGG/string_agg analog):
    sort_array(collect_list) → concat_ws gives a deterministic ordered
    join independent of shuffle arrival order."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


def q_cume_dist(spark, sf_dir):
    """Distribution window functions: cume_dist + nth_value with an
    explicit full-partition frame (deterministic tie-break on c_custkey)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("c_custkey", 3).over(w_full).alias("third_custkey"),
    )


def q_topk_per_group(spark, sf_dir):
    """Top-k per group via ranked window + filter. At scale this is the
    shuffle-once pattern (no per-group ORDER BY + LIMIT loop); AQE handles
    group skew."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


def q_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 orders per customer) through the
    SQL surface — Catalyst decorrelates/plans the lateral join natively."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 200
        """
    )


def q_sessionize_gap(spark, sf_dir):
    """Batch sessionization (gaps-and-islands): a new session starts after
    a >30-minute silence per user; sessions numbered by a running sum of
    boundary flags, then aggregated. One shuffle on user_id serves both
    window passes and the final groupBy (same partitioning reused)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    new_sess = F.when(
        (us - F.lag(us).over(w)).isNull() | ((us - F.lag(us).over(w)) > 1800 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("sess_n", F.sum(new_sess).over(run))
        .groupBy("user_id", "sess_n")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
    )


def q_sequence(spark, sf_dir):
    """Row generation: explode(sequence(...)) — the distributed analog of
    generate_series (greatest() guard: Spark's sequence auto-reverses on
    end < start instead of returning empty)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    seq = F.sequence(F.lit(1), F.greatest(F.lit(1), F.least(F.col("p_size"), F.lit(5))))
    return p.select("p_partkey", F.explode(seq).alias("i"))


def q_try_cast(spark, sf_dir):
    """Safe casts / safe arithmetic: try_cast returns NULL instead of
    erroring (ANSI mode stays on at scale; one poison row can't kill a
    100 TB job), try_divide nulls division-by-zero."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.regexp_extract("o_orderpriority", r"^(\d+)", 1).try_cast("bigint").alias("prio_digit"),
        F.round(F.try_divide("o_totalprice", F.col("o_custkey") % 3), 4).alias("safe_ratio"),
    )


def q_hof_filter(spark, sf_dir):
    """Array higher-order functions over embeddings: filter / exists /
    zip_with+aggregate (squared norm) — all Catalyst lambda expressions,
    no Python UDF."""
    e = _t(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    sq = F.aggregate(
        F.zip_with(emb, emb, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.exists(emb, lambda x: x > 0.9).cast("int").alias("has_big"),
        F.round(sq, 4).alias("sq_norm"),
    )


def q_embed_centroid(spark, sf_dir):
    """Per-label centroid of embedding vectors, expressed positionally
    (label, dim, sum/count/mean) — posexplode + hash agg scales linearly
    in rows × dims and shuffles only (labels × dims) groups.

    Each element is floored to e6 fixed-point BEFORE the sum, so the
    aggregate is an exact bigint on both engines regardless of partial-
    aggregation order, and the mean is one shared double division over
    identical integer operands.  (The earlier round(avg(val), 4) form
    passed at sf0.01 by summation-order luck and diverged on a third of
    the dims at sf0.001 — caught by the cross-SF sim sweep, round 6.)"""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "i", "val"
            ),
        )
        .withColumn("i", F.col("i") + 1)
        .groupBy("label", "i")
        .agg(
            F.sum(
                F.floor(F.col("val") * 1000000).cast("bigint")
            ).alias("dim_sum_e6"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select(
            "label",
            "i",
            "dim_sum_e6",
            "n_vecs",
            F.floor(F.col("dim_sum_e6") / F.col("n_vecs"))
            .cast("bigint")
            .alias("dim_mean_e6"),
        )
    )


def q_salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation (explicit salting): phase 1 groups
    on (key, salt) so a hot key spreads over many reducers, phase 2 merges
    partials on the true key.  The oracle is the PLAIN group-by — the
    point is that salting is invisible in the result."""
    from kafkastreamsjavachallenge_spark.operators import relational as R

    ev = _t(spark, sf_dir, "events")
    out = R.salted_agg(
        ev,
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total_value": (
                F.sum(F.col("value").cast("decimal(18,4)")),
                F.sum("total_value"),
            ),
        },
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


def q_salted_join(spark, sf_dir):
    """Skew-safe equi-join (explicit salting of the probe side, exploded
    replication of the build side) — again oracle-checked against the
    plain join to pin semantics-preservation."""
    from kafkastreamsjavachallenge_spark.operators import relational as R

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = R.salted_join(o, c, on="o_custkey", salt_buckets=8)
    return j.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_orders"))


# ------------------------------------------------------- TPC-H composites


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): two nation roles (customer
    side filters by region, supplier side labels volume), dims broadcast,
    single fact pass over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("cust_nationkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nationkey"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    t = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cust_nationkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("supp_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
    )
    share_num = _dsum(F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(0.0), 2)
    return t.groupBy("o_year").agg(
        F.round(share_num / _dsum(F.col("volume"), 2), 6).alias("mkt_share")
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping-priority split). Schema adaptation: no
    l_shipmode/commitdate/receiptdate in the synthetic lineitem, so
    l_returnflag stands in for shipmode and 'late' := shipped >30 days
    after the order date; the CASE-split conditional aggregation is the
    Q12 core and is preserved exactly."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (supplier count per part attribute). Schema
    adaptation: no partsupp table, so lineitem serves as the part-supplier
    relation; the complaints NOT-IN subquery becomes a negative-balance
    supplier exclusion (same anti-join shape)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (~F.col("p_type").startswith("ECONOMY"))
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS →
    left-semi, NOT EXISTS → left-anti against the same fact. Schema
    adaptation: 'late' := shipped >60 days after order date (no
    commit/receipt dates). Semi/anti keys are the order key, so all three
    lineitem passes share one shuffle partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    l1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    sem = l1.join(
        l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi"
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    anti = sem.join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        anti.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                  anti.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# ------------------------------------------------------------- text corpus


def q_bigram_freq(spark, sf_dir):
    """Corpus bigram frequency (top 20, deterministic tiebreak): zip_with
    over shifted token slices builds bigrams without a self-join; the only
    shuffle is the final hash agg on the bigram key."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # greatest(n-1, 0): single-token docs yield an empty bigram array that
    # explode() drops — no derived-predicate filter blocking scan pushdown
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


def q_pmi_collocations(spark, sf_dir):
    """Collocation extraction by pointwise mutual information — the
    measure tokenizer-merge and phrase-mining pipelines rank candidate
    merges with: PMI(a,b) = ln(p(ab) / (p(a)p(b))), support-gated at
    c_ab >= 5, top-20 by (pmi desc, bigram).

    Float discipline: both engines compute the ratio as ONE double
    division of two exact integer products — (c_ab·n_uni²) /
    (n_bi·c_a·c_b) — then one ln and one 6-dp round, so there is no
    intermediate-rounding drift to disagree on.  (The integer products
    stay in BIGINT range up to ~10⁹ tokens; beyond that, shard the
    corpus and PMI per shard or move the products to double.)  Scale
    shape: two hash aggregates (bigram, unigram), two joins against the
    small vocabulary relation, one 1-row totals broadcast."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    # r12 (guide §1.2): the bigram table feeds the totals AND the PMI
    # chain, the unigram table the totals AND both vocab joins —
    # checkpoint each so its tokenize + explode + aggregate corpus pass
    # runs once, not once per consumer
    bg = (
        d.select(F.explode(pairs).alias("s"))
        .groupBy(F.col("s.a").alias("a"), F.col("s.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    uni = (
        d.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    totals = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bg.agg(F.sum("c_ab").alias("n_bi"))
    )
    return (
        bg.filter(F.col("c_ab") >= 5)
        .join(uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b")), "b")
        .join(F.broadcast(totals))
        .select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "c_ab",
            F.round(
                F.log(
                    (
                        F.col("c_ab") * F.col("n_uni") * F.col("n_uni")
                    ).cast("double")
                    / (F.col("n_bi") * F.col("c_a") * F.col("c_b")).cast(
                        "double"
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "bigram")
        .limit(20)
    )


def q_doc_freq(spark, sf_dir):
    """Document frequency + IDF per token (df >= 20): per-doc distinct via
    array_distinct (map-side, no extra shuffle), corpus size via a
    broadcast scalar — the standard first stage of TF-IDF featurization."""
    register_views(spark, sf_dir)
    # corpus size as a scalar subquery (planned as an independent subquery
    # job + literal — no cartesian join against the token aggregate)
    return spark.sql(
        """
        SELECT token, count(*) AS df,
               round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
                        / count(*)), 4) AS idf
        FROM (SELECT explode(array_distinct(split(text, ' '))) AS token
              FROM documents)
        GROUP BY token HAVING count(*) >= 20
        """
    )


def q_time_to_convert(spark, sf_dir):
    """Conversion-latency profile: per user, seconds from first `view` to
    the first `purchase` strictly after it; reported as count / min /
    exact lower-median / max.  Every number is an integer (truncated
    epoch-second difference; median by rank, not interpolation), so the
    oracle is bit-exact.  Two user-keyed aggregates share one
    HashPartitioning; the rank windows run over the small converted-user
    relation, and the median attaches as a 1-row broadcast."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"), F.min("t_view").alias("t_view2"))
    )
    deltas = p.select(
        "user_id",
        (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view2")).alias("delta_s"),
    )
    w = Window.orderBy("delta_s", "user_id")
    wn = Window.partitionBy()
    ranked = deltas.select(
        "delta_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.filter(F.expr("rn = (n + 1) DIV 2")).select(
        F.col("delta_s").alias("median_s")
    )
    stats = deltas.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("delta_s").alias("min_s"),
        F.max("delta_s").alias("max_s"),
    )
    return stats.crossJoin(F.broadcast(med)).select(
        "n_converted", "min_s", "median_s", "max_s"
    )


QUERIES = {
    "q_time_to_convert": (
        q_time_to_convert,
        "WITH v AS (SELECT user_id, min(ts) AS t_view FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t_buy, min(v.t_view) AS t_view2 "
        "FROM events e JOIN v USING (user_id) "
        "WHERE e.event_type = 'purchase' AND e.ts > v.t_view GROUP BY e.user_id), "
        "d AS (SELECT user_id, date_diff('second', t_view2, t_buy) AS delta_s "
        "FROM p), "
        "r AS (SELECT delta_s, row_number() OVER (ORDER BY delta_s, user_id) "
        "AS rn, count(*) OVER () AS n FROM d), "
        "m AS (SELECT delta_s AS median_s FROM r WHERE rn = (n + 1) // 2), "
        "s AS (SELECT count(*) AS n_converted, min(delta_s) AS min_s, "
        "max(delta_s) AS max_s FROM d) "
        "SELECT n_converted, min_s, median_s, max_s FROM s CROSS JOIN m",
    ),
    "q_stats_agg": (
        q_stats_agg,
        "SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS sd_qty, "
        "round(var_samp(l_quantity), 4) AS var_qty, "
        "round(corr(l_quantity, l_extendedprice), 4) + 0 AS corr_qty_price, "
        "round(covar_samp(l_quantity, l_extendedprice), 2) + 0 AS covar_qty_price "
        "FROM lineitem GROUP BY l_returnflag",
    ),
    "q_median": (
        q_median,
        "SELECT l_returnflag, median(l_quantity) AS med_qty, "
        "median(l_extendedprice) AS med_price FROM lineitem "
        "GROUP BY l_returnflag",
    ),
    "q_autocorr": (
        q_autocorr,
        "WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day, "
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) "
        "AS DOUBLE) AS rev FROM lineitem GROUP BY 1), "
        "series AS (SELECT rev, lag(rev) OVER (ORDER BY day) AS prev_rev "
        "FROM daily) "
        "SELECT round(corr(rev, prev_rev), 4) + 0 AS lag1_autocorr, "
        "count(prev_rev) AS n_days FROM series",
    ),
    "q_null_fns": (
        q_null_fns,
        "SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS pri_nn, "
        "coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'MEDIUM') AS pri_filled, "
        "o_totalprice / nullif(0.0, 0.0) AS div_null FROM orders",
    ),
    "q_funnel": (
        q_funnel,
        "WITH v AS (SELECT user_id, min(ts) AS t_view FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e "
        "JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id) "
        "SELECT v.user_id, 1 + CAST(c.user_id IS NOT NULL AS INTEGER) "
        "+ CAST(p.user_id IS NOT NULL AS INTEGER) AS stage FROM v "
        "LEFT JOIN c ON v.user_id = c.user_id "
        "LEFT JOIN p ON v.user_id = p.user_id",
    ),
    "q_retention": (
        q_retention,
        "WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d "
        "FROM events), "
        "cohort AS (SELECT user_id, min(d) AS cohort_day FROM days GROUP BY user_id) "
        "SELECT cohort_day, date_diff('day', cohort_day, d) AS day_offset, "
        "count(DISTINCT days.user_id) AS n_users FROM days "
        "JOIN cohort ON days.user_id = cohort.user_id "
        "GROUP BY cohort_day, day_offset",
    ),
    "q_scd2": (
        q_scd2,
        "WITH chg AS (SELECT user_id, event_type, ts, event_id, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev_type FROM events) "
        "SELECT user_id, event_type AS state, ts AS valid_from, "
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to "
        "FROM chg WHERE prev_type IS NULL OR event_type <> prev_type",
    ),
    "q_regr": (
        q_regr,
        "SELECT l_returnflag, round(regr_slope(l_extendedprice, l_quantity), 4) "
        "+ 0 AS slope, round(regr_intercept(l_extendedprice, l_quantity), 4) "
        "+ 0 AS intercept, round(regr_r2(l_extendedprice, l_quantity), 6) AS r2, "
        "regr_count(l_extendedprice, l_quantity) AS n "
        "FROM lineitem GROUP BY l_returnflag",
    ),
    "q_bit_agg": (
        q_bit_agg,
        "SELECT l_linestatus, bit_and(l_linenumber) AS band, "
        "bit_or(l_linenumber) AS bor, bit_xor(l_orderkey) AS bxor "
        "FROM lineitem GROUP BY l_linestatus",
    ),
    "q_dense_rank": (
        q_dense_rank,
        "SELECT c_custkey, c_mktsegment, "
        "CAST(floor(c_acctbal / 100) * 100 AS BIGINT) AS bal_bucket, "
        "rank() OVER w AS rnk, dense_rank() OVER w AS drnk FROM customer "
        "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY "
        "CAST(floor(c_acctbal / 100) * 100 AS BIGINT) DESC)",
    ),
    "q_bool_agg": (
        q_bool_agg,
        "SELECT o_orderstatus, count(*) FILTER (o_totalprice > 200000) AS n_big, "
        "CAST(bool_and(o_totalprice > 1000) AS INTEGER) AS all_over_1k, "
        "CAST(bool_or(o_totalprice > 400000) AS INTEGER) AS any_over_400k "
        "FROM orders GROUP BY o_orderstatus",
    ),
    "q_string_agg": (
        q_string_agg,
        "SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations, "
        "count(*) AS n_nations FROM nation JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY r_name",
    ),
    "q_cume_dist": (
        q_cume_dist,
        "SELECT c_custkey, c_mktsegment, round(cume_dist() OVER w1, 6) AS cd, "
        "nth_value(c_custkey, 3) OVER w2 AS third_custkey FROM customer "
        "WINDOW w1 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey), "
        "w2 AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    ),
    "q_topk_per_group": (
        q_topk_per_group,
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM ("
        "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, "
        "row_number() OVER (PARTITION BY l_returnflag "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn "
        "FROM lineitem) WHERE rn <= 3",
    ),
    "q_lateral_topn": (
        q_lateral_topn,
        "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice FROM customer c, "
        "LATERAL (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey "
        "LIMIT 2) t WHERE c.c_custkey < 200",
    ),
    "q_sessionize_gap": (
        q_sessionize_gap,
        "WITH flagged AS (SELECT user_id, ts, CASE WHEN "
        "epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL "
        "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 "
        "THEN 1 ELSE 0 END AS new_sess FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT user_id, ts, sum(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_n "
        "FROM flagged) "
        "SELECT user_id, CAST(sess_n AS BIGINT) AS sess_n, count(*) AS n_events, "
        "min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us "
        "FROM sess GROUP BY user_id, sess_n",
    ),
    "q_sequence": (
        q_sequence,
        "SELECT p_partkey, CAST(unnest(generate_series(1, "
        "greatest(1, least(p_size, 5)))) AS INTEGER) AS i "
        "FROM part WHERE p_partkey < 100",
    ),
    "q_try_cast": (
        q_try_cast,
        "SELECT o_orderkey, TRY_CAST(o_orderpriority AS INTEGER) AS prio_int, "
        "TRY_CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS BIGINT) AS prio_digit, "
        "round(o_totalprice / nullif(o_custkey % 3, 0), 4) AS safe_ratio "
        "FROM orders",
    ),
    "q_hof_filter": (
        q_hof_filter,
        "SELECT vec_id, len(list_filter(embedding, x -> x > 0)) AS n_pos, "
        "CAST(len(list_filter(embedding, x -> x > 0.9)) > 0 AS INTEGER) AS has_big, "
        "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)), 4) "
        "AS sq_norm FROM embeddings",
    ),
    "q_embed_centroid": (
        q_embed_centroid,
        "SELECT label, i, dim_sum_e6, n_vecs, "
        "CAST(floor(CAST(dim_sum_e6 AS DOUBLE) / CAST(n_vecs AS DOUBLE)) "
        "AS BIGINT) AS dim_mean_e6 FROM ("
        "SELECT label, i, CAST(sum(CAST(floor(val * 1000000) AS BIGINT)) "
        "AS BIGINT) AS dim_sum_e6, CAST(count(*) AS BIGINT) AS n_vecs "
        "FROM (SELECT label, "
        "CAST(generate_subscripts(embedding, 1) AS INTEGER) AS i, "
        "CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings) "
        "GROUP BY label, i)",
    ),
    "q_salted_agg": (
        q_salted_agg,
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value "
        "FROM events GROUP BY event_type",
    ),
    "q_salted_join": (
        q_salted_join,
        "SELECT c_mktsegment, count(*) AS n_orders FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
    ),
    "q_tpch_q8": (
        q_tpch_q8,
        "SELECT o_year, round(CAST(sum(CAST(CASE WHEN nation = 'NATION_7' "
        "THEN volume ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) / "
        "CAST(sum(CAST(volume AS DECIMAL(18,2))) AS DOUBLE), 6) AS mkt_share FROM ("
        "SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
        "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
        "FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region "
        "WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey "
        "AND l_orderkey = o_orderkey AND o_custkey = c_custkey "
        "AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey "
        "AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey "
        "AND o_orderdate >= DATE '1995-01-01' AND o_orderdate <= DATE '1996-12-31' "
        "AND p_type = 'ECONOMY') t GROUP BY o_year",
    ),
    "q_tpch_q12": (
        q_tpch_q12,
        "SELECT l_returnflag, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) "
        "AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) "
        "AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY l_returnflag",
    ),
    "q_tpch_q16": (
        q_tpch_q16,
        "SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#2' AND p_type NOT LIKE 'ECONOMY%' "
        "AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45) "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size",
    ),
    "q_tpch_q21": (
        q_tpch_q21,
        "SELECT s_name, count(*) AS numwait FROM supplier, lineitem l1, orders, nation "
        "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey "
        "AND o_orderstatus = 'F' "
        "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY "
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey "
        "AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) "
        "AND s_nationkey = n_nationkey AND n_name = 'NATION_3' "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20",
    ),
    "q_bigram_freq": (
        q_bigram_freq,
        "SELECT bigram, count(*) AS n FROM ("
        "SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) "
        "AS bigram FROM (SELECT string_split(text, ' ') AS t FROM documents) "
        "WHERE len(t) >= 2) GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20",
    ),
    "q_pmi_collocations": (
        q_pmi_collocations,
        "WITH pairs AS (SELECT unnest([struct_pack(a := t[i], b := t[i+1]) "
        "for i in range(1, len(t))]) AS s "
        "FROM (SELECT string_split(text, ' ') AS t FROM documents)), "
        "bg AS (SELECT s.a AS a, s.b AS b, count(*) AS c_ab "
        "FROM pairs GROUP BY s.a, s.b), "
        "uni AS (SELECT tok, count(*) AS c FROM "
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
        "GROUP BY tok), "
        "tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_uni, "
        "(SELECT CAST(sum(c_ab) AS BIGINT) FROM bg) AS n_bi) "
        "SELECT a || ' ' || b AS bigram, c_ab, "
        "round(ln(CAST(c_ab * n_uni * n_uni AS DOUBLE) / "
        "CAST(n_bi * ua.c * ub.c AS DOUBLE)), 6) + 0 AS pmi "
        "FROM bg JOIN uni ua ON ua.tok = bg.a "
        "JOIN uni ub ON ub.tok = bg.b CROSS JOIN tot "
        "WHERE c_ab >= 5 ORDER BY pmi DESC, bigram LIMIT 20",
    ),
    "q_doc_freq": (
        q_doc_freq,
        "SELECT token, count(*) AS df, "
        "round(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / count(*)), 4) AS idf "
        "FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS token "
        "FROM documents) GROUP BY token HAVING count(*) >= 20",
    ),
}
