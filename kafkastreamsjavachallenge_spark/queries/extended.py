"""Extended relational/vector surface: posexplode, range window frames,
GROUPING SETS, pivot (conditional aggregation), embedding near-dup pairs.

These round out categories SURVEY.md §2.2 lists beyond the reference's
own operators."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table, register_views
from kafkastreamsjavachallenge_spark.functions.vector import cosine


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def q_posexplode(spark, sf_dir):
    """Array explode with ordinality over embedding vectors (first 8 dims,
    first 100 vectors — bounded, deterministic)."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("i", "val")
    ).withColumn("i", F.col("i") + 1)  # 1-based to match SQL ordinality


def q_range_frame(spark, sf_dir):
    """RANGE frame: count of same-customer orders within ±30 days of each
    order — an interval self-window without a self-join."""
    o = _t(spark, sf_dir, "orders")
    day = F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) / 86400
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("double"))
        .rangeBetween(-30, 30)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_near"),
    )


def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS via the SQL surface (engine exposes spark.sql over the
    registered catalog views)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_pivot(spark, sf_dir):
    """Pivot events: rows = event_type, columns = fixed user_id buckets.

    Spark's native pivot operator with an explicit value list (explicit
    values keep the plan one-pass — no values-discovery job — which is the
    100 TB-safe form); oracle expresses the same as conditional aggregation.
    """
    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket", F.concat(F.lit("b"), (F.col("user_id") % 4).cast("string"))
    )
    return (
        ev.groupBy("event_type")
        .pivot("bucket", ["b0", "b1", "b2", "b3"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["b0", "b1", "b2", "b3"])
    )


def q_array_fns(spark, sf_dir):
    """Array scalar + higher-order functions (SURVEY.md §2.2 array row):
    split → size / array_contains / array_distinct / transform / aggregate.

    Whole-stage-codegen JVM expressions end to end — the 100 TB-safe way to
    do per-document token math (no Python boundary)."""
    d = _t(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_distinct"),
        F.array_contains(tokens, "the").cast("int").alias("has_the"),
        F.array_max(F.transform(tokens, lambda t: F.length(t))).alias("max_tok_len"),
        F.aggregate(
            F.transform(tokens, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_tok_len"),
    )


def q_map_fns(spark, sf_dir):
    """Map functions over the events ``props`` JSON column: from_json to
    map<string,int>, key extraction, lookup, cardinality."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys"),
        F.size(m).alias("n_keys"),
        m.getItem("k").alias("k_val"),
    )


def q_ntile(spark, sf_dir):
    """Ranking analytics: ntile quartiles + percent_rank over order value."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def q_first_last(spark, sf_dir):
    """first/last value per partition frame (full-partition frame so the
    result is deterministic)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


def q_regexp_fns(spark, sf_dir):
    """Regexp scalar pack: extract / replace / match over customer names."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("trailing_digits"),
        F.regexp_replace("c_name", r"\d", "*").alias("masked"),
        F.col("c_name").rlike(r"[02468]$").cast("int").alias("even_end"),
    )


def q_date_arith(spark, sf_dir):
    """Date arithmetic pack: add/diff/truncate/extract on order dates."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_add(d, 30).cast("string").alias("due_date"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofweek(d).alias("dow"),
        F.datediff(F.lit("2025-01-01").cast("date"), d).alias("days_to_2025"),
        F.last_day(d).cast("string").alias("month_end"),
    )


def q_percentile(spark, sf_dir):
    """Exact percentiles (continuous interpolation) per group — the exact
    form; approx_percentile is the 100 TB sketch path (rows-only cousin)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25_price"),
    )


def q_exists_subquery(spark, sf_dir):
    """Correlated EXISTS via the SQL surface (decorrelated by Catalyst to a
    semi-join — same plan family as q_join_semi, different front door)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        """
    )


def q_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (decorrelated to an aggregate + join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey)
                 AS n_items
        FROM orders
        """
    )


def q_group_normalize(spark, sf_dir):
    """Per-group z-score via applyInPandas (grouped-map Arrow surface);
    oracle is the plain SQL window form — results must agree exactly."""
    from kafkastreamsjavachallenge_spark.operators.grouped import normalize_per_group

    ev = _t(spark, sf_dir, "events")
    return normalize_per_group(ev, "event_type", "value", "event_id")


def q_histogram(spark, sf_dir):
    """Equi-width binning (width_bucket) — the distributed histogram shape:
    one projection + one groupBy on the bin id."""
    o = _t(spark, sf_dir, "orders")
    bin_ = F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12))
    return (
        o.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def q_unpivot(spark, sf_dir):
    """unpivot/melt: lineitem measure columns to tall (measure, val) —
    bounded to orderkey<100 so the oracle UNION ALL stays cheap."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


def q_profile(spark, sf_dir):
    """One-pass column profiler over orders (rows/non-null/distinct/range
    per column, single scan)."""
    from kafkastreamsjavachallenge_spark.operators.profile import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_custkey", "o_totalprice"],
    )


def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (bounded block).

    Brute-force within an id-bounded block with a cosine threshold; ties to
    the LSH-bucketed path (operators/similarity.py) at scale — buckets
    first, exact cosine only within buckets.  Bounded here so the oracle
    is exact and cost is flat across scale factors.
    """
    from kafkastreamsjavachallenge_spark.functions.vector import dot, norm

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    # norms hoisted to the join branches (see operators/similarity.py):
    # one fold per vector instead of one per pair, bit-identical values
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("__na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("__nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        F.round(
            dot(F.col("va"), F.col("vb")) / (F.col("__na") * F.col("__nb")), 4
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= 0.35)


_DOT_AB = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_NORM = (
    "sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST({v}.embedding[i] AS DOUBLE) * CAST({v}.embedding[i] AS DOUBLE))))"
)

QUERIES = {
    "q_posexplode": (
        q_posexplode,
        "SELECT vec_id, CAST(generate_subscripts(embedding[1:8], 1) AS INTEGER) AS i, "
        "unnest(embedding[1:8]) AS val FROM embeddings WHERE vec_id < 100",
    ),
    "q_range_frame": (
        q_range_frame,
        "SELECT o_orderkey, o_custkey, count(*) OVER "
        "(PARTITION BY o_custkey ORDER BY epoch(o_orderdate)/86400 "
        "RANGE BETWEEN 30 PRECEDING AND 30 FOLLOWING) AS n_near FROM orders",
    ),
    "q_grouping_sets": (
        q_grouping_sets,
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
    ),
    "q_pivot": (
        q_pivot,
        "SELECT event_type, "
        "count(*) FILTER (user_id % 4 = 0) AS b0, "
        "count(*) FILTER (user_id % 4 = 1) AS b1, "
        "count(*) FILTER (user_id % 4 = 2) AS b2, "
        "count(*) FILTER (user_id % 4 = 3) AS b3 "
        "FROM events GROUP BY event_type",
    ),
    "q_histogram": (
        q_histogram,
        "SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0 "
        "WHEN o_totalprice >= 600000 THEN 13 "
        "ELSE floor(o_totalprice / 50000) + 1 END AS BIGINT) AS bin, "
        "count(*) AS n, round(min(o_totalprice), 2) AS lo, "
        "round(max(o_totalprice), 2) AS hi FROM orders GROUP BY bin",
    ),
    "q_unpivot": (
        q_unpivot,
        "SELECT l_orderkey, l_linenumber, measure, val FROM ("
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val "
        "FROM lineitem WHERE l_orderkey < 100 "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice "
        "FROM lineitem WHERE l_orderkey < 100 "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount "
        "FROM lineitem WHERE l_orderkey < 100 "
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax "
        "FROM lineitem WHERE l_orderkey < 100)",
    ),
    "q_profile": (
        q_profile,
        "SELECT 'o_orderstatus' AS \"column\", count(*) AS n_rows, "
        "count(o_orderstatus) AS n_nonnull, count(DISTINCT o_orderstatus) AS n_distinct, "
        "CAST(min(o_orderstatus) AS VARCHAR) AS min_val, CAST(max(o_orderstatus) AS VARCHAR) AS max_val FROM orders "
        "UNION ALL SELECT 'o_custkey', count(*), count(o_custkey), count(DISTINCT o_custkey), "
        "CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders "
        "UNION ALL SELECT 'o_totalprice', count(*), count(o_totalprice), count(DISTINCT o_totalprice), "
        "CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR) FROM orders",
    ),
    "q_group_normalize": (
        q_group_normalize,
        # + 0 normalizes IEEE -0.0 (DuckDB round preserves signed zero,
        # Spark round never emits it; the driver compares strings)
        "SELECT event_id, event_type, "
        "round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) "
        "+ 0 AS z "
        "FROM events WINDOW w AS (PARTITION BY event_type)",
    ),
    "q_percentile": (
        q_percentile,
        "SELECT l_returnflag, "
        "round(quantile_cont(l_quantity, 0.5), 4) AS median_qty, "
        "round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty, "
        "round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price "
        "FROM lineitem GROUP BY l_returnflag",
    ),
    "q_exists_subquery": (
        q_exists_subquery,
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
    ),
    "q_scalar_subquery": (
        q_scalar_subquery,
        "SELECT o_orderkey, (SELECT count(*) FROM lineitem "
        "WHERE l_orderkey = o_orderkey) AS n_items FROM orders",
    ),
    "q_ntile": (
        q_ntile,
        "SELECT o_orderkey, ntile(4) OVER w AS quartile, "
        "round(percent_rank() OVER w, 6) AS pct_rank FROM orders "
        "WINDOW w AS (ORDER BY o_totalprice, o_orderkey)",
    ),
    "q_first_last": (
        q_first_last,
        "SELECT event_id, user_id, "
        "first_value(event_type) OVER w AS first_type, "
        "last_value(event_type) OVER w AS last_type FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    ),
    "q_regexp_fns": (
        q_regexp_fns,
        "SELECT c_custkey, "
        "coalesce(regexp_extract(c_name, '(\\d+)$', 1), '') AS trailing_digits, "
        "regexp_replace(c_name, '\\d', '*', 'g') AS masked, "
        "CAST(regexp_matches(c_name, '[02468]$') AS INTEGER) AS even_end "
        "FROM customer",
    ),
    "q_date_arith": (
        q_date_arith,
        "SELECT o_orderkey, "
        "strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date, "
        "CAST(year(o_orderdate) AS INTEGER) AS yr, "
        "CAST(month(o_orderdate) AS INTEGER) AS mo, "
        "CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow, "
        "date_diff('day', CAST(o_orderdate AS DATE), DATE '2025-01-01') AS days_to_2025, "
        "strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end "
        "FROM orders",
    ),
    "q_array_fns": (
        q_array_fns,
        "SELECT doc_id, "
        "len(string_split(text, ' ')) AS n_tokens, "
        "len(list_distinct(string_split(text, ' '))) AS n_distinct, "
        "CAST(list_contains(string_split(text, ' '), 'the') AS INTEGER) AS has_the, "
        "list_max(list_transform(string_split(text, ' '), t -> length(t))) AS max_tok_len, "
        "CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_tok_len "
        "FROM documents",
    ),
    "q_map_fns": (
        q_map_fns,
        "SELECT event_id, "
        "list_aggregate(list_sort(json_keys(props)), 'string_agg', ',') AS keys, "
        "len(json_keys(props)) AS n_keys, "
        "CAST(json_extract(props, '$.k') AS INTEGER) AS k_val "
        "FROM events",
    ),
    "q_embed_neardup": (
        q_embed_neardup,
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        f"round({_DOT_AB} / ({_NORM.format(v='a')} * {_NORM.format(v='b')}), 4) AS cos_sim "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE a.vec_id < 500 AND b.vec_id < 500 "
        f"AND round({_DOT_AB} / ({_NORM.format(v='a')} * {_NORM.format(v='b')}), 4) >= 0.35",
    ),
}
