"""Data-quality & sketch pack: dbt-style constraint audits and
cross-engine-deterministic probabilistic sketches (count-min, Bloom).

The audits are what a production pipeline runs before trusting a new
batch — referential orphans, key uniqueness, null rates — each an
anti-join or hash aggregate that scales like any other join on the
fact table.  The sketches use explicit universal hashing
((a*x + b) mod p mod w in exact bigint arithmetic) rather than an
engine hash function precisely so the DuckDB oracle computes the SAME
sketch: the point of a mergeable sketch at 100 TB is that every
partition builds its piece independently and merge is associative,
which the groupBy-based construction here preserves.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table

# Mersenne prime 2^31-1; (a, b) pairs chosen arbitrarily-but-fixed.
_P = 2147483647
_CMS_W = 512
_CMS_HASHES = [(1000003, 12345), (999983, 54321), (824633, 98765), (752023, 13579)]
_BLOOM_M = 4096
_BLOOM_HASHES = [(1000003, 7), (999983, 11), (824633, 13)]


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _bucket(x, a, b, w):
    # bigint arithmetic: a * x exceeds int32 (DuckDB auto-promotes; Spark
    # ANSI mode overflows instead, so the promotion must be explicit)
    return ((F.lit(a) * x.cast("bigint") + F.lit(b)) % _P) % w


# --------------------------------------------- constraint audit


def q_dq_audit(spark, sf_dir):
    """Constraint audit table — one row per check, (check, n_bad,
    n_total): referential orphans both directions (anti-join / left
    join-null count), key uniqueness (groupBy-having), and null rate.
    Each check is an independent aggregate; a real deployment unions
    dozens of these and writes them as a partition per batch, so every
    check stays a single scan + join of the audited table."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")

    orphan_li = li.join(
        od.select("o_orderkey"),
        li["l_orderkey"] == od["o_orderkey"],
        "left_anti",
    ).agg(F.count("*").alias("n_bad"))
    li_total = li.agg(F.count("*").alias("n_total"))

    dup_cust = (
        cu.groupBy("c_custkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n_bad"))
    )
    cu_total = cu.agg(F.count("*").alias("n_total"))

    idle_cust = cu.join(
        od.select("o_custkey"),
        cu["c_custkey"] == od["o_custkey"],
        "left_anti",
    ).agg(F.count("*").alias("n_bad"))

    null_props = ev.agg(
        F.count_if(F.col("props").isNull()).alias("n_bad")
    )
    ev_total = ev.agg(F.count("*").alias("n_total"))

    def row(name, bad_df, total_df):
        return (
            bad_df.crossJoin(F.broadcast(total_df))
            .select(
                F.lit(name).alias("check_name"),
                "n_bad",
                "n_total",
            )
        )

    return (
        row("orphan_lineitem_orderkey", orphan_li, li_total)
        .unionAll(row("duplicate_custkey", dup_cust, cu_total))
        .unionAll(row("customer_without_orders", idle_cust, cu_total))
        .unionAll(row("null_event_props", null_props, ev_total))
    )


# --------------------------------------------- count-min sketch


def q_countmin(spark, sf_dir):
    """Count-min sketch (depth 4 x width 512, universal hashing in
    exact bigint arithmetic) of per-user event counts, probed for the
    top-5 true heavy hitters: estimate = min over rows of the bucket
    counter, always >= truth.  The sketch build is one explode(4) +
    groupBy — the partition-local pieces merge by addition, which is
    what makes CMS the heavy-hitter structure for streams at scale.
    Every number is an integer, so the DuckDB oracle builds the
    identical sketch."""
    ev = _t(spark, sf_dir, "events")
    hashes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _bucket(F.col("user_id"), a, b, _CMS_W).alias("bucket"),
            )
            for d, (a, b) in enumerate(_CMS_HASHES)
        ]
    )
    cms = (
        ev.select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.d").alias("d"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    truth = ev.groupBy("user_id").agg(F.count("*").alias("true_cnt"))
    top = truth.orderBy(F.desc("true_cnt"), F.asc("user_id")).limit(5)
    probes = top.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col("user_id"), a, b, _CMS_W).alias(
                            "bucket"
                        ),
                    )
                    for d, (a, b) in enumerate(_CMS_HASHES)
                ]
            )
        ).alias("h"),
    ).select("user_id", "true_cnt", F.col("h.d").alias("d"), F.col("h.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy("user_id", "true_cnt")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )
    return est.select(
        "user_id",
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
    )


# --------------------------------------------- Bloom filter


def q_bloom_fpr(spark, sf_dir):
    """Bloom-filter membership (k = 3 universal hashes into m = 4096
    positions) built over the distinct user ids, then probed with 1000
    keys known to be absent — reporting set-bit count and the measured
    false-positive rate.  The filter is materialized as its distinct
    set-position table (the degenerate-exact form of the bit array);
    a probe is a hit iff all k of its positions are present (join +
    count = k).  Bit-set union across partitions is a distinct — i.e.
    the merge is associative, the property that matters at scale."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()

    def positions(df, col):
        return df.select(
            F.col(col).alias("key"),
            F.explode(
                F.array(
                    *[
                        _bucket(F.col(col), a, b, _BLOOM_M)
                        for a, b in _BLOOM_HASHES
                    ]
                )
            ).alias("pos"),
        )

    bits = positions(users, "user_id").select("pos").distinct()
    n_bits = bits.agg(F.count("*").alias("n_set_bits"))

    probes = spark.range(100000, 101000).select(
        F.col("id").cast("int").alias("probe_id")
    )
    probe_pos = positions(probes, "probe_id")
    hits = (
        probe_pos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("k_hits"))
        .filter(F.col("k_hits") == len(_BLOOM_HASHES))
        .agg(F.count("*").alias("n_false_pos"))
    )
    return hits.crossJoin(F.broadcast(n_bits)).select(
        "n_set_bits",
        F.lit(1000).alias("n_probes"),
        "n_false_pos",
        F.round(F.col("n_false_pos") / 1000.0, 6).alias("fpr"),
    )


# --------------------------------------------- explicit-register HLL

# b = 8 address bits -> m = 256 registers; the remaining 24 hash bits
# feed the leading-zero rank, so ranks lie in [1, 25] and the indicator
# sum S = sum_j 2^(25 - M_j) is an exact BIGINT (<= 256 * 2^25 = 2^33).
_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
# alpha * m^2 * 2^25: the whole float numerator as ONE literal so both
# engines perform exactly one correctly-rounded division by the exact
# integer S — no cross-engine ulp drift is possible.
_HLL_NUM = repr(_HLL_ALPHA * _HLL_M * _HLL_M * (1 << 25))


def q_hll_explicit(spark, sf_dir):
    """HyperLogLog with EXPLICIT registers (md5-derived 32-bit hash,
    m = 256) — unlike ``q_hll_union`` (Spark's built-in DataSketches,
    engine-internal, rows-only check) this sketch is reproducible in any
    engine, so the DuckDB oracle builds the IDENTICAL register file and
    the estimate is hash-checked, not rows-only.

    Shape is the mergeable-rollup pattern for 100 TB distinct counts:
    per-day register files (groupBy day,reg -> max rank), merged upward
    by another max — associative, idempotent, no rescan of the fact.
    All register arithmetic is exact integers; the only float op is the
    single final division (correctly rounded, cross-engine identical).
    Raw HLL estimate — the small-range linear-counting correction needs
    ln(), which is libm and engine-dependent, so it is reported as the
    zero-register count instead of folded into the estimate."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    h32 = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    reg = F.shiftright(h32, 24)
    w = h32.bitwiseAND(F.lit(16777215))
    # rank = leading zeros of the 24-bit suffix + 1 = 25 - bitlength(w);
    # bitlength via base-2 string length (exact in both engines)
    rank = F.when(w == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.conv(w, 10, 2))
    )
    daily = (
        ev.select(F.to_date("ts").alias("day"), reg.alias("reg"), rank.alias("rank"))
        .groupBy("day", "reg")
        .agg(F.max("rank").alias("m_j"))
    )
    merged = daily.groupBy("reg").agg(F.max("m_j").alias("m_j"))
    sketch = merged.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - m_j)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    denom = F.col("s_present") + (F.lit(_HLL_M) - F.col("n_present")) * F.lit(1 << 25)
    return sketch.crossJoin(F.broadcast(exact)).select(
        F.round(F.lit(float(_HLL_NUM)) / denom, 4).alias("approx_users"),
        (F.lit(_HLL_M) - F.col("n_present")).alias("zero_registers"),
        "exact_users",
    )


_HLL_SQL = (
    "WITH h AS (SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT "
    "AS h32, CAST(ts AS DATE) AS day FROM events WHERE user_id IS NOT NULL), "
    "daily AS (SELECT day, h32 >> 24 AS reg, "
    "max(CASE WHEN (h32 & 16777215) = 0 THEN 25 "
    "ELSE 25 - length(bin(h32 & 16777215)) END) AS m_j FROM h GROUP BY 1, 2), "
    "m AS (SELECT reg, max(m_j) AS m_j FROM daily GROUP BY 1), "
    "s AS (SELECT CAST(sum(1::BIGINT << (25 - m_j)) AS BIGINT) AS s_present, "
    "count(*) AS n_present FROM m), "
    "x AS (SELECT count(DISTINCT user_id) AS exact_users FROM events) "
    f"SELECT round({_HLL_NUM} / (s_present + (256 - n_present) * 33554432), 4) "
    "AS approx_users, 256 - n_present AS zero_registers, exact_users "
    "FROM s CROSS JOIN x"
)


QUERIES = {
    "q_dq_audit": (
        q_dq_audit,
        "SELECT 'orphan_lineitem_orderkey' AS check_name, "
        "(SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN "
        "(SELECT o_orderkey FROM orders)) AS n_bad, "
        "(SELECT count(*) FROM lineitem) AS n_total "
        "UNION ALL SELECT 'duplicate_custkey', "
        "(SELECT count(*) FROM (SELECT c_custkey FROM customer "
        "GROUP BY c_custkey HAVING count(*) > 1)), "
        "(SELECT count(*) FROM customer) "
        "UNION ALL SELECT 'customer_without_orders', "
        "(SELECT count(*) FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders)), "
        "(SELECT count(*) FROM customer) "
        "UNION ALL SELECT 'null_event_props', "
        "(SELECT count(*) FROM events WHERE props IS NULL), "
        "(SELECT count(*) FROM events)",
    ),
    "q_countmin": (
        q_countmin,
        "WITH h(d, a, b) AS (VALUES "
        + ", ".join(
            f"({d}, {a}, {b})" for d, (a, b) in enumerate(_CMS_HASHES)
        )
        + "), "
        f"cms AS (SELECT d, ((a * user_id + b) % {_P}) % {_CMS_W} "
        "AS bucket, count(*) AS cnt FROM events CROSS JOIN h "
        "GROUP BY 1, 2), "
        "truth AS (SELECT user_id, count(*) AS true_cnt FROM events "
        "GROUP BY 1), "
        "top AS (SELECT * FROM truth ORDER BY true_cnt DESC, user_id ASC "
        "LIMIT 5), "
        "probes AS (SELECT user_id, true_cnt, d, "
        f"((a * user_id + b) % {_P}) % {_CMS_W} AS bucket "
        "FROM top CROSS JOIN h) "
        "SELECT p.user_id, p.true_cnt, "
        "min(coalesce(cms.cnt, 0)) AS est_cnt, "
        "min(coalesce(cms.cnt, 0)) - p.true_cnt AS overcount "
        "FROM probes p LEFT JOIN cms ON p.d = cms.d "
        "AND p.bucket = cms.bucket GROUP BY p.user_id, p.true_cnt",
    ),
    "q_bloom_fpr": (
        q_bloom_fpr,
        "WITH src AS (SELECT DISTINCT user_id FROM events), "
        "h(a, b) AS (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in _BLOOM_HASHES)
        + "), "
        "bits AS (SELECT DISTINCT "
        "((a * user_id + b) % 2147483647) % 4096 AS pos "
        "FROM src CROSS JOIN h), "
        "nb AS (SELECT count(*) AS n_set_bits FROM bits), "
        "probes AS (SELECT unnest(generate_series(100000, 100999)) "
        "AS probe_id), "
        "pp AS (SELECT probe_id, "
        "((a * probe_id + b) % 2147483647) % 4096 AS pos "
        "FROM probes CROSS JOIN h), "
        "fp AS (SELECT count(*) AS n_false_pos FROM ("
        "SELECT probe_id FROM pp WHERE pos IN (SELECT pos FROM bits) "
        "GROUP BY probe_id HAVING count(*) = 3)) "
        "SELECT n_set_bits, 1000 AS n_probes, n_false_pos, "
        "round(n_false_pos / 1000.0, 6) AS fpr FROM fp CROSS JOIN nb",
    ),
    "q_hll_explicit": (q_hll_explicit, _HLL_SQL),
}
