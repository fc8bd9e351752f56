"""Relational-breadth queries (SURVEY.md §2.2): joins, aggregation
variants, analytic windows, sorts/top-k, set ops, scalar-function packs,
sliding/session windows, TPC-H-style composites.

Determinism conventions (oracle-drift guards, SURVEY.md §7.3):
- Money/quantity sums go through DECIMAL then cast to DOUBLE so the
  aggregation is exact and engine-order-independent.
- Every top-k has a unique tie-break key.
- Averages are expressed as exact decimal sum / count in double math.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.operators import relational as R
from kafkastreamsjavachallenge_spark.operators import windows as W


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _dsum(col, scale=4, alias=None):
    """Exact sum: decimal accumulate, double out (engine-order independent)."""
    c = F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
    return c.alias(alias) if alias else c


# ------------------------------------------------------------------ joins

def q_join_inner(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return R.equi_join(
        orders, customer, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "c_custkey", "c_name", "o_totalprice")


def q_join_left(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    joined = R.equi_join(
        customer, orders, F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(_dsum(F.col("o_totalprice"), 2), F.lit(0.0)).alias("total_spend"),
    )


def q_join_semi(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    big = orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(big, "c_custkey", "left_semi").select("c_custkey", "c_name")


def q_join_anti(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    big = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(big, "c_custkey", "left_anti").select("c_custkey", "c_name")


def q_join_broadcast(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    joined = R.broadcast_join(
        lineitem, part, F.col("l_partkey") == F.col("p_partkey")
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("l_extendedprice"), 2, "revenue"),
    )


def q_join_range(spark, sf_dir):
    lineitem, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    small = part.filter(F.col("p_size") <= 5)  # bound the NLJ side first
    joined = R.range_join(
        small,
        lineitem,
        (F.col("l_quantity") >= F.col("p_size") - 1)
        & (F.col("l_quantity") < F.col("p_size") + 1),
    )
    return joined.groupBy("p_partkey", "p_size").agg(F.count(F.lit(1)).alias("n"))


def q_join_full(spark, sf_dir):
    """Full outer join: customers vs high-value order owners — both
    unmatched sides surface with nulls."""
    orders, customer = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    big = (
        orders.filter(F.col("o_totalprice") > 350000)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    cust = customer.filter(F.col("c_custkey") < 200).select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    return cust.join(big, on="k", how="full_outer").select(
        "k", "c_name", "n_big"
    )


def q_asof_join(spark, sf_dir):
    """AS-OF: per order, latest lineitem shipdate <= orderdate + 60 days."""
    orders, lineitem = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    left = orders.select(
        "o_orderkey",
        "o_orderdate",
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("deadline"),
    )
    right = lineitem.select("l_orderkey", "l_shipdate")
    out = R.asof_join(
        left, right.withColumnRenamed("l_orderkey", "o_orderkey"),
        on="o_orderkey", left_ts="deadline", right_ts="l_shipdate",
    )
    return out.select("o_orderkey", "o_orderdate", F.col("l_shipdate").alias("asof_ship"))


# ----------------------------------------------------------- aggregation

def q_agg_multi(spark, sf_dir):
    """TPC-H Q1 shape: multi-aggregate with partial/final hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), 4, "sum_qty"),
        _dsum(F.col("l_extendedprice"), 4, "sum_base_price"),
        _dsum(disc_price, 6, "sum_disc_price"),
        (_dsum(F.col("l_quantity"), 4) / n).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice"), 4) / n).alias("avg_price"),
        n.alias("count_order"),
    )


def q_rollup(spark, sf_dir):
    customer, nation = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation")
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return R.rollup_agg(joined, ["n_name", "c_mktsegment"], F.count(F.lit(1)).alias("n"))


def q_cube(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return R.cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("o_totalprice"), 2, "total"),
    )


def q_approx_distinct(spark, sf_dir):
    """HLL++ sketch — algorithm differs from DuckDB's, so rows-only check.
    The EXACT cross-engine surface is ``q_approx_distinct_bound``, which
    pins this sketch's error contract as an integer predicate."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


def q_approx_distinct_bound(spark, sf_dir):
    """Error-contract oracle for the HLL++ built-in: per event_type, the
    exact distinct-user count plus an integer predicate pinning
    |approx - exact| <= 5·rsd·exact at the default rsd = 0.05 (so
    4·|Δ| <= exact, integers only — no float boundary).  DuckDB cannot
    reproduce Spark's sketch VALUE, but it can assert the CONTRACT: the
    oracle emits the same exact counts with within_5rsd constant 1, and
    the row hash-matches iff Spark's sketch actually honors the bound on
    this data.  The margin is 5·rsd (not 3) because rsd is a STANDARD
    error, not a worst case — a 3-sigma tail has nonzero per-group
    failure probability across repeated fuzz regenerations, while at
    these cardinalities (well inside HLL++'s near-exact linear-counting
    range for rsd 0.05) a 25% deviation is effectively impossible.  The
    q_hll_explicit move applied to the built-in — turns a rows-only id
    into a hash-checked one.

    Scale: one hash aggregate; exact + sketch compute in the same
    partial-agg pass, group keys bounded by the event-type catalog."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("exact_users"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users")) * 4
                <= F.col("exact_users")
            )
            .cast("int")
            .alias("within_5rsd"),
        )
    )


# ----------------------------------------------------- analytic windows

def q_row_number(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_lag_lead(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
    )


def q_running_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 3).alias("run_sum"),
    )


# ------------------------------------------------------------- sorts

def q_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return R.top_k(
        orders.select("o_orderkey", F.col("o_totalprice").alias("price")),
        10,
        F.col("price").desc(),
        F.col("o_orderkey"),
    )


# ------------------------------------------------------------- set ops

def q_union(spark, sf_dir):
    customer, supplier = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    return customer.select(
        F.col("c_name").alias("name"), F.lit("customer").alias("src")
    ).unionAll(
        supplier.select(F.col("s_name").alias("name"), F.lit("supplier").alias("src"))
    )


def q_intersect(spark, sf_dir):
    customer, supplier = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nk")).intersect(
        supplier.select(F.col("s_nationkey").alias("nk"))
    )


def q_except(spark, sf_dir):
    """Brands present in the catalog but absent from small-quantity sales —
    non-degenerate EXCEPT (nation-vs-supplier keys fully overlap)."""
    part, lineitem = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    sold_small = part.join(
        lineitem.filter(F.col("l_quantity") <= 2),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    return part.select(F.col("p_brand").alias("brand")).subtract(
        sold_small.select(F.col("p_brand").alias("brand"))
    )


# ------------------------------------------- sliding / session windows

def q_sliding_window(spark, sf_dir):
    ev = W.sliding(_t(spark, sf_dir, "events"), "ts", "2 minutes", "1 minute")
    return ev.groupBy(F.col("window.start").alias("window_start")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q_session_window(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = W.session_windows(ev, "ts", "5 minutes", "user_id")
    return out.select("user_id", "session_start", "n")


# -------------------------------------------------- scalar function packs

def q_string_fns(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_pfx"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_id"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("@")).alias("replaced"),
    )


def q_math_fns(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw double product: bit-identical across engines; round() near .005
        # boundaries is not (half-up vs binary-double representation)
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "disc_price"
        ),
        F.floor("l_quantity").cast("bigint").alias("fq"),
        F.ceil("l_quantity").cast("bigint").alias("cq"),
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("absd"),
        F.sqrt("l_quantity").alias("sq"),
        (F.col("l_orderkey") % 7).alias("okmod"),
    )


# ----------------------------------------------------- TPC-H composites

def q_tpch_q3(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders, lineitem = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate").agg(
        _dsum(revenue, 6, "revenue")
    )
    return R.top_k(
        agg.select("o_orderkey", "revenue", "o_orderdate"),
        10,
        F.col("revenue").desc(),
        F.col("o_orderkey"),
    )


def q_tpch_q5(spark, sf_dir):
    t = lambda n: _t(spark, sf_dir, n)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = (
        t("lineitem")
        .join(t("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t("supplier"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(t("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
    )
    return joined.groupBy("n_name").agg(_dsum(revenue, 6, "revenue"))


def q_tpch_q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_dsum(F.col("l_extendedprice") * F.col("l_discount"), 6, "revenue"))
    )


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: order-priority count over a date band with an EXISTS
    (late lineitem) — decorrelates to a semi join."""
    orders, lineitem = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    # the synthetic lineitem has no commitdate; the Q4 *shape* (EXISTS →
    # semi join over a date-banded fact) is preserved with a quantity
    # predicate standing in for "late"
    late = lineitem.filter(F.col("l_quantity") >= 48).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    band = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    return (
        band.join(late, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape: large-quantity orders (HAVING over a grouped sum)
    joined back to customer — aggregate-then-join keeps the fact shuffle
    to one pass."""
    orders, lineitem = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(_dsum(F.col("l_quantity"), 4, "total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(big, on="o_orderkey")
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 literal: shipdate-banded pricing summary with charge/discount
    aggregates. Scan-side filter + single partial/final hash agg on two
    low-cardinality keys — no shuffle pressure at any scale."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-12-01")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), 4, "sum_qty"),
        _dsum(F.col("l_extendedprice"), 4, "sum_base_price"),
        _dsum(disc_price, 6, "sum_disc_price"),
        _dsum(charge, 6, "sum_charge"),
        (_dsum(F.col("l_quantity"), 4) / n).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice"), 4) / n).alias("avg_price"),
        (_dsum(F.col("l_discount"), 4) / n).alias("avg_disc"),
        n.alias("count_order"),
    )


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7: shipping volume between two nations by year. Supplier and
    customer dims pre-joined to nation and broadcast; the only shuffle is
    the lineitem-orders join on orderkey."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    sup2 = (
        _t(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust2 = (
        _t(spark, sf_dir, "customer")
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(sup2), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust2), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
                "revenue",
            )
        )
    )


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation and order year for one part
    type (no partsupp table in the synthetic schema, so profit omits
    supplycost). Part and supplier-nation dims broadcast; one orderkey
    shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    pt = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    supn = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"), F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(pt), "l_partkey")
        .join(F.broadcast(supn), "l_suppkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
                "sum_profit",
            )
        )
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10: returned-item revenue by customer over one quarter,
    top 20. Date band prunes orders before the fact join; customer and
    nation broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    customer = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
                "revenue",
            )
        )
    )
    return R.top_k(agg, 20, F.col("revenue").desc(), F.col("c_custkey"))


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13: distribution of order counts per customer (left join so
    zero-order customers survive), then a second tiny agg on the count."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14: promo revenue share over one month — conditional aggregate
    ratio, part dim broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    part = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * _dsum(promo, 6) / _dsum(disc_price, 6)).alias(
                "promo_revenue"
            )
        )
    )


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15: top supplier(s) by quarterly revenue — scalar max joined
    back by equality (revenue sums are decimal-exact so the double compare
    is deterministic)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        _dsum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            6,
            "total_revenue",
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(_t(spark, sf_dir, "supplier")), "s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand —
    correlated avg-quantity subquery decorrelated into a per-part agg that
    is joined back (brand filter applied before the agg, so both passes
    touch only the brand's rows)."""
    pt = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#9")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    lb = _t(spark, sf_dir, "lineitem").join(F.broadcast(pt), "l_partkey")
    avgq = lb.groupBy("l_partkey").agg(
        (_dsum(F.col("l_quantity"), 2) / F.count(F.lit(1))).alias("aq")
    )
    return (
        lb.join(F.broadcast(avgq), "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
        .agg((_dsum(F.col("l_extendedprice"), 2) / F.lit(7.0)).alias("avg_yearly"))
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of brand/size/quantity bands as the join
    residual — Catalyst extracts the common equi-key (partkey) so this
    stays a broadcast hash join, not a nested-loop."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bands = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(
            F.broadcast(part),
            (F.col("l_partkey") == F.col("p_partkey")) & bands,
        )
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                6,
                "revenue",
            )
        )
    )


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, grouped by nation (no phone column, so nationkey stands in for
    the country code). Scalar avg broadcast + anti join."""
    customer = _t(spark, sf_dir, "customer")
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        (_dsum(F.col("c_acctbal"), 2) / F.count(F.lit(1))).alias("ab")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal"), 2, "totacctbal"),
        )
    )


_Q1_AVG = (
    "CAST(sum(CAST({x} AS DECIMAL(18,4))) AS DOUBLE) / count(*)"
)

def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part): the synthetic schema has
    no partsupp, so the supply relation is derived from lineitem as
    min(l_extendedprice) per (partkey, suppkey) — docstring substitution per
    SURVEY.md §2.3. The correlated min-cost subquery is decorrelated as a
    window min per part (one shuffle on partkey — the former
    aggregate-plus-self-join formulation built the whole supply subtree
    twice), and the LARGE-part predicate semi-join-prunes the FACT before
    its aggregate (per-part mins are independent, so pruning parts early
    cannot change any surviving row — a pushdown Catalyst cannot infer
    across the aggregate).  Nation/region dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    region_supp = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
        supp.s_nationkey == F.col("n_nationkey"),
    )
    supply = (
        li.join(
            F.broadcast(part.select(F.col("p_partkey").alias("__pk"))),
            li.l_partkey == F.col("__pk"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
        .join(
            region_supp.select("s_suppkey", "s_name", "s_acctbal", "n_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        supply.withColumn("__min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("__min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (important parts by supplied value): partsupp value is
    derived from lineitem revenue restricted to one nation's suppliers
    (substitution per SURVEY.md §2.3). The HAVING threshold compares each
    part's value to a global scalar — computed once and broadcast as a
    1-row cross join, so the plan is two hash aggregates over the same
    filtered fact, not a re-scan per group."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    fact = li.join(
        F.broadcast(nat_supp.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
    ).withColumn(
        "val",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
            "decimal(18,6)"
        ),
    )
    # round the EXACT decimal sum to cents BEFORE any double cast: the
    # decimal sum of 2dp-money products can land exactly on a half-cent
    # (seed-9 fuzz caught part_value = 264571.915000), where Spark's
    # round(double) (HALF_UP on the shortest decimal repr) says .92 and
    # DuckDB's round(double) (on the binary value, just below the half)
    # says .91 — decimal round is HALF_UP on the exact value in BOTH
    # engines, and the identical decimal then casts to the identical
    # double
    by_part = fact.groupBy("l_partkey").agg(
        F.sum("val").alias("val_sum")
    )
    total = fact.agg((F.sum("val").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("val_sum").cast("double") > F.col("threshold"))
        .select(
            "l_partkey",
            F.round("val_sum", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with excess shipped volume of a part
    family): availqty is derived from shipped quantity (no partsupp —
    substitution per SURVEY.md §2.3). Nested semi-joins: parts by name
    prefix → lineitem volume per supplier in one year, HAVING over the
    sum → left-semi against supplier filtered to one nation. The part
    filter broadcasts; the only shuffle is the supplier-keyed agg."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("blue"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    vol = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
        )
        .groupBy("l_suppkey")
        .agg(_dsum(F.col("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > 50.0)
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(vol, supp.s_suppkey == vol.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_REV6 = "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"

QUERIES = {
    "q_join_inner": (
        q_join_inner,
        "SELECT o_orderkey, c_custkey, c_name, o_totalprice FROM orders "
        "JOIN customer ON o_custkey = c_custkey",
    ),
    "q_join_left": (
        q_join_left,
        "SELECT c_custkey, c_name, count(o_orderkey) AS n_orders, "
        "coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend "
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey, c_name",
    ),
    "q_join_semi": (
        q_join_semi,
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 250000)",
    ),
    "q_join_anti": (
        q_join_anti,
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)",
    ),
    "q_join_broadcast": (
        q_join_broadcast,
        "SELECT p_brand, count(*) AS n, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand",
    ),
    "q_join_range": (
        q_join_range,
        "SELECT p_partkey, p_size, count(*) AS n FROM part, lineitem "
        "WHERE p_size <= 5 AND l_quantity >= p_size - 1 AND l_quantity < p_size + 1 "
        "GROUP BY p_partkey, p_size",
    ),
    "q_join_full": (
        q_join_full,
        "SELECT coalesce(c.k, b.k) AS k, c_name, n_big FROM "
        "(SELECT c_custkey AS k, c_name FROM customer WHERE c_custkey < 200) c "
        "FULL OUTER JOIN "
        "(SELECT o_custkey AS k, count(*) AS n_big FROM orders "
        "WHERE o_totalprice > 350000 GROUP BY o_custkey) b USING (k)",
    ),
    "q_asof_join": (
        q_asof_join,
        "SELECT o_orderkey, o_orderdate, "
        "(SELECT max(l_shipdate) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY) AS asof_ship FROM orders o",
    ),
    "q_agg_multi": (
        q_agg_multi,
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price, "
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price, "
        + _Q1_AVG.format(x="l_quantity")
        + " AS avg_qty, "
        + _Q1_AVG.format(x="l_extendedprice")
        + " AS avg_price, count(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    ),
    "q_rollup": (
        q_rollup,
        "SELECT n_name, c_mktsegment, count(*) AS n FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY ROLLUP(n_name, c_mktsegment)",
    ),
    "q_cube": (
        q_cube,
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)",
    ),
    "q_approx_distinct": (q_approx_distinct, None),
    "q_approx_distinct_bound": (
        q_approx_distinct_bound,
        "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
        "AS exact_users, 1 AS within_5rsd FROM events GROUP BY event_type",
    ),
    "q_row_number": (
        q_row_number,
        "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn "
        "FROM orders) WHERE rn <= 3",
    ),
    "q_lag_lead": (
        q_lag_lead,
        "SELECT event_id, user_id, "
        "lag(event_id) OVER w AS prev_event, lead(event_id) OVER w AS next_event "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
    ),
    "q_running_sum": (
        q_running_sum,
        "SELECT event_id, user_id, round(sum(value) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW), 3) AS run_sum FROM events",
    ),
    "q_topk": (
        q_topk,
        "SELECT o_orderkey, o_totalprice AS price FROM orders "
        "ORDER BY price DESC, o_orderkey LIMIT 10",
    ),
    "q_union": (
        q_union,
        "SELECT c_name AS name, 'customer' AS src FROM customer "
        "UNION ALL SELECT s_name AS name, 'supplier' AS src FROM supplier",
    ),
    "q_intersect": (
        q_intersect,
        "SELECT c_nationkey AS nk FROM customer INTERSECT "
        "SELECT s_nationkey AS nk FROM supplier",
    ),
    "q_except": (
        q_except,
        "SELECT p_brand AS brand FROM part EXCEPT "
        "SELECT p_brand AS brand FROM part JOIN lineitem ON p_partkey = l_partkey "
        "WHERE l_quantity <= 2",
    ),
    "q_sliding_window": (
        q_sliding_window,
        "SELECT ws AS window_start, count(*) AS n FROM ("
        "SELECT unnest([date_trunc('minute', ts), date_trunc('minute', ts) - INTERVAL 1 MINUTE]) AS ws "
        "FROM events) GROUP BY ws",
    ),
    "q_session_window": (
        q_session_window,
        "WITH e AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
        "OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS new_s "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM e) "
        "SELECT user_id, min(ts) AS session_start, count(*) AS n FROM s GROUP BY user_id, sid",
    ),
    "q_string_fns": (
        q_string_fns,
        "SELECT c_custkey, upper(c_name) AS uname, lower(c_mktsegment) AS lseg, "
        "length(c_name) AS name_len, substr(c_name, 1, 8) AS name_pfx, "
        "concat_ws('-', c_name, c_mktsegment) AS tagged, "
        "lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded_id, "
        "replace(c_name, '#', '@') AS replaced FROM customer",
    ),
    "q_math_fns": (
        q_math_fns,
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1.0 - l_discount) AS disc_price, "
        "CAST(floor(l_quantity) AS BIGINT) AS fq, CAST(ceil(l_quantity) AS BIGINT) AS cq, "
        "abs(l_discount - 0.05) AS absd, sqrt(l_quantity) AS sq, "
        "l_orderkey % 7 AS okmod FROM lineitem",
    ),
    "q_tpch_q3": (
        q_tpch_q3,
        "SELECT o_orderkey, "
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue, "
        "o_orderdate FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10",
    ),
    "q_tpch_q5": (
        q_tpch_q5,
        "SELECT n_name, "
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name",
    ),
    "q_tpch_q4": (
        q_tpch_q4,
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-10-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_quantity >= 48) GROUP BY o_orderpriority",
    ),
    "q_tpch_q18": (
        q_tpch_q18,
        "SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty FROM orders "
        "JOIN (SELECT l_orderkey AS o_orderkey, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty "
        "FROM lineitem GROUP BY l_orderkey HAVING "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300) USING (o_orderkey) "
        "JOIN customer ON o_custkey = c_custkey",
    ),
    "q_tpch_q6": (
        q_tpch_q6,
        "SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue "
        "FROM lineitem WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24",
    ),
    "q_tpch_q1": (
        q_tpch_q1,
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price, "
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price, "
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge, "
        + _Q1_AVG.format(x="l_quantity")
        + " AS avg_qty, "
        + _Q1_AVG.format(x="l_extendedprice")
        + " AS avg_price, "
        + _Q1_AVG.format(x="l_discount")
        + " AS avg_disc, count(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= '2000-12-01' "
        "GROUP BY l_returnflag, l_linestatus",
    ),
    "q_tpch_q7": (
        q_tpch_q7,
        "SELECT supp_nation, cust_nation, l_year, " + _REV6 + " AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "year(l_shipdate) AS l_year, l_extendedprice, l_discount "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01' "
        "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))"
        ") GROUP BY supp_nation, cust_nation, l_year",
    ),
    "q_tpch_q9": (
        q_tpch_q9,
        "SELECT n_name AS nation, year(o_orderdate) AS o_year, "
        + _REV6 + " AS sum_profit "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "WHERE p_type = 'ECONOMY' GROUP BY n_name, year(o_orderdate)",
    ),
    "q_tpch_q10": (
        q_tpch_q10,
        "SELECT c_custkey, c_name, c_acctbal, n_name, " + _REV6 + " AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE l_returnflag = 'R' AND o_orderdate >= '1996-01-01' "
        "AND o_orderdate < '1996-04-01' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20",
    ),
    "q_tpch_q13": (
        q_tpch_q13,
        "SELECT c_count, count(*) AS custdist FROM ("
        "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '1-URGENT' GROUP BY c_custkey"
        ") GROUP BY c_count",
    ),
    "q_tpch_q14": (
        q_tpch_q14,
        "SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END "
        "AS DECIMAL(18,6))) AS DOUBLE) / " + _REV6 + " AS promo_revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-02-01'",
    ),
    "q_tpch_q15": (
        q_tpch_q15,
        "WITH r AS (SELECT l_suppkey AS s_suppkey, " + _REV6 + " AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01' "
        "GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue FROM r "
        "JOIN supplier USING (s_suppkey) "
        "WHERE total_revenue = (SELECT max(total_revenue) FROM r)",
    ),
    "q_tpch_q17": (
        q_tpch_q17,
        "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 "
        "AS avg_yearly FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#9' AND l_quantity < 0.2 * ("
        "SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) "
        "FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)",
    ),
    "q_tpch_q19": (
        q_tpch_q19,
        "SELECT " + _REV6 + " AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 "
        "AND l_quantity BETWEEN 1 AND 20) "
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 "
        "AND l_quantity BETWEEN 10 AND 30) "
        "OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 30 "
        "AND l_quantity BETWEEN 20 AND 40)",
    ),
    "q_tpch_q2": (
        q_tpch_q2,
        "WITH region_supp AS ("
        "SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
        "supply AS ("
        "SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name, "
        "min(l_extendedprice) AS cost FROM lineitem "
        "JOIN region_supp ON l_suppkey = s_suppkey "
        "GROUP BY ALL) "
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost FROM supply "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_type = 'LARGE' AND cost = ("
        "SELECT min(s2.cost) FROM supply s2 WHERE s2.l_partkey = supply.l_partkey) "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100",
    ),
    "q_tpch_q11": (
        q_tpch_q11,
        "WITH fact AS ("
        "SELECT l_partkey, CAST(l_extendedprice * (1.0 - l_discount) "
        "AS DECIMAL(18,6)) AS val FROM lineitem "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_7') "
        "SELECT l_partkey, CAST(round(sum(val), 2) AS DOUBLE) AS part_value "
        "FROM fact GROUP BY l_partkey "
        "HAVING CAST(sum(val) AS DOUBLE) > ("
        "SELECT CAST(sum(val) AS DOUBLE) * 0.001 FROM fact) "
        "ORDER BY part_value DESC, l_partkey",
    ),
    "q_tpch_q20": (
        q_tpch_q20,
        "SELECT s_name, s_acctbal FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_3' AND s_suppkey IN ("
        "SELECT l_suppkey FROM lineitem "
        "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%') "
        "AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01' "
        "GROUP BY l_suppkey "
        "HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 50.0) "
        "ORDER BY s_name",
    ),
    "q_tpch_q22": (
        q_tpch_q22,
        "SELECT c_nationkey AS cntrycode, count(*) AS numcust, "
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
        "FROM customer WHERE c_acctbal > ("
        "SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) "
        "FROM customer WHERE c_acctbal > 0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT') "
        "GROUP BY c_nationkey",
    ),
}
