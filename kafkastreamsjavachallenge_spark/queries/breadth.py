"""Breadth pack 2: information-theoretic aggregates, deterministic mode,
distribution window functions, conditional counts, null-safe joins,
CDC keep-latest dedup, Markov transition matrices, inter-arrival-time
statistics, robust statistics (winsorized sums, IQR outlier detection),
cryptographic hash functions, and JSON property extraction.

These extend SURVEY.md §2.2's declared categories (aggregations, window
functions, joins, scalar fns, event analytics) beyond the reference's
tiny surface (the reference's only stateful computation is the windowed
unique-user count, UniqueUsersApp.java:91-134); each row here is a
pattern a production stream-analytics user of the reference would need
next.  Same Spark-first rules as the other packs: built-in Catalyst
expressions only (whole-stage codegen end-to-end), deterministic output
via explicit tie-breaks, decimal accumulation for hash-compared float
sums, broadcast for small derived dimensions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _dsum(col, scale=4, alias=None):
    c = F.sum(col.cast(f"decimal(18,{scale})")).cast("double")
    return c.alias(alias) if alias else c


# --------------------------------------------- information theory


def q_entropy(spark, sf_dir):
    """Shannon entropy (bits) of the event-type distribution, computed
    with the algebraic identity  H = log2(T) - (Σ c·log2 c)/T  so the
    whole thing is ONE map-side-combinable hash aggregate over 5 group
    rows — no second pass over the fact table for the total.  At 100 TB
    this is a single shuffle of |distinct event_type| rows."""
    ev = _t(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return cnt.agg(
        F.round(
            F.log2(F.sum("cnt"))
            - F.sum(F.col("cnt") * F.log2("cnt")) / F.sum("cnt"),
            4,
        ).alias("entropy_bits"),
        F.count("*").alias("n_classes"),
    )


# --------------------------------------------- deterministic mode


def q_mode_det(spark, sf_dir):
    """Deterministic grouped mode: most frequent l_returnflag per
    l_linestatus, ties broken by flag value.  Expressed as count +
    row_number rather than mode() because mode() is tie-nondeterministic
    in both engines; the count aggregate collapses the fact table to
    |groups| rows before the (tiny) window sort."""
    li = _t(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_linestatus", "l_returnflag").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("l_linestatus").orderBy(
        F.desc("cnt"), F.asc("l_returnflag")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_linestatus",
            F.col("l_returnflag").alias("mode_flag"),
            F.col("cnt").alias("mode_cnt"),
        )
    )


# --------------------------------------------- distribution windows


def q_percent_rank(spark, sf_dir):
    """percent_rank + fraction-of-partition-max analytics per market
    segment.  Order key includes the unique c_custkey tie-break so the
    rank sequence is engine-independent; the full-partition max uses an
    explicit unbounded frame (default frames differ across engines)."""
    cu = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_full = Window.partitionBy("c_mktsegment").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cu.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.col("c_acctbal") / F.max("c_acctbal").over(w_full), 6).alias(
            "frac_of_max"
        ),
    )


# --------------------------------------------- conditional counts


def q_count_if(spark, sf_dir):
    """Conditional counting (count_if / FILTER clause): several
    predicates folded into one pass — map-side partial aggregation means
    the fact table is read once regardless of predicate count."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("big_cnt"),
        F.count_if(F.col("user_id") % 2 == 0).alias("even_users"),
        F.count_if(F.minute("ts") < 30).alias("first_half_hour"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------- null-safe join


def q_null_safe_join(spark, sf_dir):
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): two aggregated
    sides that each map one event type to NULL, inner-joined with
    null-safe equality so the NULL groups pair up.  Null-safe equality
    is still hash-partitionable (NULL hashes to a single key), so the
    plan is a normal shuffled hash join, not a nested loop."""
    ev = _t(spark, sf_dir, "events")
    left = ev.groupBy(
        F.nullif(F.col("event_type"), F.lit("view")).alias("et")
    ).agg(F.count("*").alias("n_l"))
    right = ev.groupBy(
        F.nullif(F.col("event_type"), F.lit("error")).alias("et")
    ).agg(F.count("*").alias("n_r"))
    return (
        left.alias("l")
        .join(right.alias("r"), F.col("l.et").eqNullSafe(F.col("r.et")), "inner")
        .select(
            F.col("l.et").alias("et_l"),
            F.col("r.et").alias("et_r"),
            "n_l",
            "n_r",
        )
    )


# --------------------------------------------- CDC keep-latest dedup


def q_keep_latest(spark, sf_dir):
    """Keep-latest-per-key dedup (the CDC / upsert compaction pattern):
    row_number over (ts DESC, event_id DESC) per user, keep rank 1, then
    summarize the surviving snapshot.  One shuffle on user_id; at scale
    the window sort is per-key and spills gracefully.  This is the batch
    analog of the reference's last-write-wins changelog semantics
    (UniqueUsersApp.java:117 aggregate keeps the latest value)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = ev.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return latest.groupBy("event_type").agg(
        F.count("*").alias("n_users"),
        _dsum(F.col("value"), 4, "sum_value"),
    )


# --------------------------------------------- Markov transitions


def q_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: lead() within (user_id ORDER BY ts, event_id), count
    (state, next_state) pairs, and normalize to row-stochastic
    probabilities with a window over the tiny 5×5 pair table.  The fact
    table passes through exactly one shuffle (user_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n_trans"))
    )
    w_row = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        "n_trans",
        F.round(F.col("n_trans") / F.sum("n_trans").over(w_row), 6).alias(
            "p_trans"
        ),
    )


# --------------------------------------------- inter-arrival stats


def q_interarrival(spark, sf_dir):
    """Per-user inter-arrival gaps (seconds, fractional) grouped by the
    arriving event's type: lag() per user, epoch subtraction (timezone-
    independent), decimal-accumulated mean.  The workhorse latency/
    cadence query for any event stream — one user_id shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .withColumn(
            "gap_s",
            F.col("ts").cast("double") - F.col("prev_ts").cast("double"),
        )
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(
            F.sum(F.col("gap_s").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            4,
        ).alias("avg_gap_s"),
        F.round(F.max("gap_s"), 4).alias("max_gap_s"),
    )


# --------------------------------------------- robust statistics


def q_winsorize(spark, sf_dir):
    """Winsorized revenue: clip l_extendedprice to the per-group
    [p05, p95] band (exact interpolated percentiles — identical
    percentile_cont semantics in both engines), then decimal-sum.  The
    percentile table is |groups| rows and broadcast back onto the fact
    table, so the fact table is scanned twice but shuffled zero times."""
    li = _t(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.05).alias("p05"),
        F.percentile("l_extendedprice", 0.95).alias("p95"),
    )
    j = li.join(F.broadcast(pct), "l_returnflag")
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95"))
    return j.groupBy("l_returnflag").agg(
        _dsum(clipped, 4, "win_sum"),
        F.count_if(
            (F.col("l_extendedprice") < F.col("p05"))
            | (F.col("l_extendedprice") > F.col("p95"))
        ).alias("n_clipped"),
    )


def q_iqr_outliers(spark, sf_dir):
    """Tukey-fence outlier detection: per-group Q1/Q3 → 1.5·IQR fences
    (broadcast join of the tiny fence table), count points outside.
    Same two-scan zero-shuffle shape as q_winsorize."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q1"),
        F.percentile("l_quantity", 0.75).alias("q3"),
    )
    fences = q.select(
        "l_returnflag",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    j = li.join(F.broadcast(fences), "l_returnflag")
    return j.groupBy("l_returnflag").agg(
        F.round(F.min("lo"), 4).alias("lo_fence"),
        F.round(F.min("hi"), 4).alias("hi_fence"),
        F.count_if(
            (F.col("l_quantity") < F.col("lo")) | (F.col("l_quantity") > F.col("hi"))
        ).alias("n_outliers"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------- hash functions


def q_hash_fns(spark, sf_dir):
    """Cryptographic hash scalar fns (md5 / sha-256) driving a bucketed
    profile: group by the first md5 hex nibble — the standard trick for
    uniform key-salting and shard assignment at scale (16-way balanced
    regardless of key skew)."""
    cu = _t(spark, sf_dir, "customer")
    return cu.select(
        F.substring(F.md5(F.col("c_name")), 1, 1).alias("bucket"),
        F.substring(F.sha2(F.col("c_name"), 256), 1, 2).alias("sha_pfx"),
    ).groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.count_distinct(F.col("sha_pfx")).alias("n_sha_pfx"),
    )


# --------------------------------------------- JSON property stats


def q_json_props_stats(spark, sf_dir):
    """Typed extraction from the events.props JSON payload
    (get_json_object → int cast) with per-type stats.  Integer sums are
    exact so the mean is engine-order independent; JSON parsing stays in
    the JVM (no Python)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.round(F.sum("k").cast("double") / F.count("k"), 4).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count_distinct(F.col("k")).alias("n_k"),
    )


def q_variant_extract(spark, sf_dir):
    """Semi-structured extraction through the VARIANT type (Spark 4):
    parse_json once into the binary variant encoding, then typed
    variant_get path access — the open-format answer to JSON-string
    re-parsing per field (at scale the parse cost is paid once per row,
    not once per extracted path; shredded variant columns push the paths
    into the scan).  Decile histogram of the extracted metric."""
    ev = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select(k.alias("k"), "event_type")
        .groupBy((F.col("k") - F.col("k") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("event_type").alias("n_types"),
        )
    )


def q_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): ancestor-chain depth over
    the implicit custkey DIV 10 hierarchy — the iterative-closure SQL
    surface (org charts, BOM explosions, graph reachability) that needed
    driver-side loops before 4.0.  Each recursion level is one
    distributed self-step; the depth histogram aggregates the closure."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("rc_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain(custkey, anc, depth) AS (
          SELECT c_custkey, c_custkey DIV 10, 1
          FROM rc_customer WHERE c_custkey < 1000
          UNION ALL
          SELECT custkey, anc DIV 10, depth + 1 FROM chain WHERE anc > 0
        )
        SELECT depth, count(*) AS n, count(DISTINCT custkey) AS n_keys
        FROM chain GROUP BY depth
        """
    )


# --------------------------------------------- multi-distinct aggregate


def q_multi_distinct(spark, sf_dir):
    """Several count(DISTINCT ...) over different columns in one
    aggregate — compiles to Catalyst's Expand operator (one row
    replicated per distinct-group), the plan shape that keeps
    multi-distinct a single shuffle instead of one job per distinct
    column."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct("l_partkey", "l_suppkey").alias("n_part_supp"),
        F.count("*").alias("n"),
    )


# --------------------------------------------- CDC upsert merge


def q_merge_upsert(spark, sf_dir):
    """MERGE/upsert emulation without a table format: apply a CDC delta
    (per-user event-value sums, including keys absent from the target)
    onto the customer snapshot with one full-outer join on the key —
    insert where only the delta exists, update where both do, keep
    where only the target does.  This is the batch upsert plan a lake
    MERGE executes under the hood; both sides shuffle once on the key.
    Summarized per action with decimal-exact balance sums."""
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("bal")
    )
    ev = _t(spark, sf_dir, "events")
    # try_cast, not cast: a dirty feed's out-of-range value (1e308 in the
    # robustness sweep) must drop to NULL, not kill the whole CDC batch
    delta = ev.groupBy(F.col("user_id").cast("bigint").alias("key")).agg(
        F.sum(F.col("value").try_cast("decimal(18,4)"))
        .cast("double")
        .alias("dv")
    )
    m = cu.join(delta, "key", "full_outer").select(
        "key",
        F.when(F.col("bal").isNull(), F.lit("insert"))
        .when(F.col("dv").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
        (F.coalesce("bal", F.lit(0.0)) + F.coalesce("dv", F.lit(0.0))).alias(
            "new_bal"
        ),
    )
    return m.groupBy("action").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(F.col("new_bal").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_new_bal"),
    )


QUERIES = {
    "q_entropy": (
        q_entropy,
        "WITH c AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1) "
        "SELECT round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 4) "
        "AS entropy_bits, count(*) AS n_classes FROM c",
    ),
    "q_mode_det": (
        q_mode_det,
        "WITH c AS (SELECT l_linestatus, l_returnflag, count(*) AS cnt "
        "FROM lineitem GROUP BY 1, 2), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY l_linestatus "
        "ORDER BY cnt DESC, l_returnflag ASC) AS rn FROM c) "
        "SELECT l_linestatus, l_returnflag AS mode_flag, cnt AS mode_cnt "
        "FROM r WHERE rn = 1",
    ),
    "q_percent_rank": (
        q_percent_rank,
        "SELECT c_custkey, c_mktsegment, "
        "round(percent_rank() OVER (PARTITION BY c_mktsegment "
        "ORDER BY c_acctbal, c_custkey), 6) AS pr, "
        "round(c_acctbal / max(c_acctbal) OVER (PARTITION BY c_mktsegment "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 6) "
        "AS frac_of_max FROM customer",
    ),
    "q_count_if": (
        q_count_if,
        "SELECT event_type, "
        "count(*) FILTER (WHERE value > 100) AS big_cnt, "
        "count(*) FILTER (WHERE user_id % 2 = 0) AS even_users, "
        "count(*) FILTER (WHERE minute(ts) < 30) AS first_half_hour, "
        "count(*) AS n FROM events GROUP BY event_type",
    ),
    "q_null_safe_join": (
        q_null_safe_join,
        "WITH l AS (SELECT nullif(event_type, 'view') AS et, count(*) AS n_l "
        "FROM events GROUP BY 1), "
        "r AS (SELECT nullif(event_type, 'error') AS et, count(*) AS n_r "
        "FROM events GROUP BY 1) "
        "SELECT l.et AS et_l, r.et AS et_r, n_l, n_r FROM l "
        "JOIN r ON l.et IS NOT DISTINCT FROM r.et",
    ),
    "q_keep_latest": (
        q_keep_latest,
        "WITH ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "SELECT event_type, count(*) AS n_users, "
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value "
        "FROM ranked WHERE rn = 1 GROUP BY event_type",
    ),
    "q_markov": (
        q_markov,
        "WITH seq AS (SELECT event_type, lead(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS next_type "
        "FROM events), "
        "pairs AS (SELECT event_type, next_type, count(*) AS n_trans "
        "FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2) "
        "SELECT event_type, next_type, n_trans, "
        "round(n_trans / sum(n_trans) OVER (PARTITION BY event_type), 6) "
        "AS p_trans FROM pairs",
    ),
    "q_interarrival": (
        q_interarrival,
        "WITH g AS (SELECT event_type, "
        "epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id)) AS gap_s FROM events) "
        "SELECT event_type, count(*) AS n_gaps, "
        "round(CAST(sum(CAST(gap_s AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) "
        "AS avg_gap_s, round(max(gap_s), 4) AS max_gap_s "
        "FROM g WHERE gap_s IS NOT NULL GROUP BY event_type",
    ),
    "q_winsorize": (
        q_winsorize,
        "WITH pct AS (SELECT l_returnflag, "
        "percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS p05, "
        "percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95 "
        "FROM lineitem GROUP BY 1) "
        "SELECT l.l_returnflag, "
        "CAST(sum(CAST(least(greatest(l_extendedprice, p05), p95) "
        "AS DECIMAL(18,4))) AS DOUBLE) AS win_sum, "
        "count(*) FILTER (WHERE l_extendedprice < p05 OR l_extendedprice > p95) "
        "AS n_clipped "
        "FROM lineitem l JOIN pct ON l.l_returnflag = pct.l_returnflag "
        "GROUP BY l.l_returnflag",
    ),
    "q_iqr_outliers": (
        q_iqr_outliers,
        "WITH q AS (SELECT l_returnflag, "
        "percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS q1, "
        "percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity) AS q3 "
        "FROM lineitem GROUP BY 1), "
        "f AS (SELECT l_returnflag, q1 - 1.5 * (q3 - q1) AS lo, "
        "q3 + 1.5 * (q3 - q1) AS hi FROM q) "
        "SELECT l.l_returnflag, round(min(lo), 4) AS lo_fence, "
        "round(min(hi), 4) AS hi_fence, "
        "count(*) FILTER (WHERE l_quantity < lo OR l_quantity > hi) "
        "AS n_outliers, count(*) AS n "
        "FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag "
        "GROUP BY l.l_returnflag",
    ),
    "q_hash_fns": (
        q_hash_fns,
        "WITH h AS (SELECT substring(md5(c_name), 1, 1) AS bucket, "
        "substring(sha256(c_name), 1, 2) AS sha_pfx FROM customer) "
        "SELECT bucket, count(*) AS n, count(DISTINCT sha_pfx) AS n_sha_pfx "
        "FROM h GROUP BY bucket",
    ),
    "q_multi_distinct": (
        q_multi_distinct,
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, "
        "count(DISTINCT l_suppkey) AS n_supps, "
        "count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp, "
        "count(*) AS n FROM lineitem GROUP BY l_returnflag",
    ),
    "q_merge_upsert": (
        q_merge_upsert,
        "WITH cu AS (SELECT c_custkey AS key, c_acctbal AS bal "
        "FROM customer), "
        "delta AS (SELECT CAST(user_id AS BIGINT) AS key, "
        "CAST(sum(TRY_CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS dv "
        "FROM events GROUP BY 1), "
        "m AS (SELECT coalesce(cu.key, delta.key) AS key, "
        "CASE WHEN bal IS NULL THEN 'insert' "
        "WHEN dv IS NULL THEN 'keep' ELSE 'update' END AS action, "
        "coalesce(bal, 0.0) + coalesce(dv, 0.0) AS new_bal "
        "FROM cu FULL OUTER JOIN delta ON cu.key = delta.key) "
        "SELECT action, count(*) AS n_rows, "
        "round(CAST(sum(CAST(new_bal AS DECIMAL(18,4))) AS DOUBLE), 4) "
        "AS sum_new_bal FROM m GROUP BY action",
    ),
    "q_variant_extract": (
        q_variant_extract,
        "WITH k AS (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, "
        "event_type FROM events) "
        "SELECT k - k % 10 AS bucket, count(*) AS n, "
        "count(DISTINCT event_type) AS n_types FROM k GROUP BY 1",
    ),
    "q_recursive_cte": (
        q_recursive_cte,
        "WITH RECURSIVE chain(custkey, anc, depth) AS ("
        "SELECT c_custkey, c_custkey // 10, 1 FROM customer WHERE c_custkey < 1000 "
        "UNION ALL SELECT custkey, anc // 10, depth + 1 FROM chain WHERE anc > 0) "
        "SELECT depth, count(*) AS n, count(DISTINCT custkey) AS n_keys "
        "FROM chain GROUP BY depth",
    ),
    "q_json_props_stats": (
        q_json_props_stats,
        "WITH k AS (SELECT event_type, "
        "CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) "
        "SELECT event_type, round(CAST(sum(k) AS DOUBLE) / count(k), 4) "
        "AS avg_k, min(k) AS min_k, max(k) AS max_k, "
        "count(DISTINCT k) AS n_k FROM k GROUP BY event_type",
    ),
}
