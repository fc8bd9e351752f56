"""Round-7 audit pack: graph-core curation, margin-based neighbor
mining, Good-Turing coverage, inter-filter agreement, and URL
canonicalization dedup — operators a web-scale training-data pipeline
runs between ingest and release.

Reference parity note: the reference (UniqueUsersApp.java) has no analog
for any of these; they extend SURVEY.md §2.2's LLM-pipeline north-star
row.  Conventions as everywhere in the repo: integer fixed-point
(basis points / e6 floors over IEEE-exact single ops) in every hashed
column, md5-derived portable hashing, strict-left-fold array arithmetic
shared verbatim with the DuckDB oracles, and zero Python row UDFs.
Negative integer division is safe cross-engine (Spark ``DIV`` and
DuckDB ``//`` both truncate toward zero — verified, used by
q_theil_sen); zero denominators are filtered on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.functions import text as T
from kafkastreamsjavachallenge_spark.functions.vector import dot, norm
from kafkastreamsjavachallenge_spark.operators import dedup as D
from kafkastreamsjavachallenge_spark.queries.corpus import _TOKS_NE, _toks_ne
from kafkastreamsjavachallenge_spark.queries.llm import _MINHASH_SIG_CTE


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# ------------------------------------------------------------ graph core


_KCORE_K = 2
_KCORE_ROUNDS = 8


def q_kcore(spark, sf_dir):
    """k-core peel of the MinHash-LSH candidate graph (k=2, 8 simultaneous
    peel rounds): iteratively drop nodes with fewer than k candidate
    neighbors, keeping only the densely-duplicated core.  This is the
    graph-curation gate between LSH candidates and clustering — tree-ish
    spurious collisions (a doc that banded with one random partner) peel
    away, near-clique duplicate clusters survive intact, so the
    components pass runs on a graph whose every node genuinely belongs
    to a cluster.  The round count is FIXED (the repo's unrolled-
    iteration convention, as in PageRank/k-means): both engines compute
    exactly 8 simultaneous-removal rounds, so they agree bit-for-bit
    whether or not the peel has converged; LSH graphs at any scale
    converge in 2-3 rounds (cliques never peel).

    Scale: each round is one count aggregate + two semi-joins, all
    shuffling on node id — cost tracks surviving edges, which shrink
    monotonically; the candidate graph itself is the banded bucket join
    (never all-pairs).  Cites the peeling formulation of Matula &
    Beck 1983."""
    from kafkastreamsjavachallenge_spark.operators.graph import kcore

    sigs = D.minhash_signatures(_docs(spark, sf_dir), n_perm=8)
    # r12: the mirror union references pairs twice — checkpoint so the
    # band self-join + distinct runs once, not once per direction
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).localCheckpoint(
        eager=False
    )
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # the peel loop lives in operators/graph.kcore (round-9: max_rounds
    # surfaced as a tunable with an optional convergence flag); the
    # ORACLE stays pinned at the fixed 8-round contract, so the query
    # keeps the defaults and no flag column
    return kcore(sym, k=_KCORE_K, max_rounds=_KCORE_ROUNDS).select(
        F.col("node").alias("doc_id"), "deg_core"
    )


def _kcore_sql() -> str:
    sql = (
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, "
        "md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b "
        "FROM bands a JOIN bands c ON a.b = c.b AND a.bucket = c.bucket "
        "AND a.doc_id < c.doc_id), "
        # MATERIALIZED is load-bearing: each peel stage references the
        # previous edge set twice, and DuckDB inlines plain CTEs per
        # reference — 8 stages would expand to 2^8 copies of the whole
        # MinHash chain (observed as an fd-exhaustion error, not just
        # slowness)
        "e0 AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs)"
    )
    for i in range(1, _KCORE_ROUNDS + 1):
        sql += (
            f", k{i} AS MATERIALIZED (SELECT src FROM e{i-1} GROUP BY src "
            f"HAVING count(*) >= {_KCORE_K})"
            f", e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i-1} e "
            f"JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src)"
        )
    return sql + (
        f" SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS deg_core "
        f"FROM e{_KCORE_ROUNDS} GROUP BY src"
    )


# -------------------------------------------------- margin-based mining


_MARGIN_K = 4


def q_margin_knn(spark, sf_dir):
    """Margin-based nearest-neighbor mining (the Artetxe & Schwenk 2019
    bitext-mining criterion): for each query vector (vec_id < 10) the
    best target (20 <= vec_id < 120) by cos(x,y) RATIO-normalized
    against both endpoints' k-NN neighborhoods — margin = 2k·cos(x,y) /
    (Σ top-k cos(x,·) + Σ top-k cos(y,·)).  Absolute-threshold mining
    over-collects in dense regions and under-collects in sparse ones;
    the margin is the standard fix.  All cosines are e6-floored bigints
    over the shared strict-left-fold dot, the k-NN sets are pinned by
    (cos_e6 DESC, id) ranks, and the margin emerges in integer basis
    points — one bigint division, no float drift.  Pairs whose combined
    neighborhood mass is non-positive are excluded on both sides (a
    margin against an anti-correlated neighborhood is meaningless).

    Scale: the query block broadcasts (bounded, like every retrieval op
    here); the target-side k-NN is the block's self-join — at corpus
    scale the neighborhood sums come from the ANN index (same top-k
    semantics), which is the documented composition, not a new plan."""
    e = _embs(spark, sf_dir).withColumn("nrm", norm(F.col("embedding")))
    x = e.filter((F.col("vec_id") < 10) & (F.col("nrm") > 0)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # r12 (guide §1.2): the target block feeds the query-target scores
    # and BOTH sides of its own k-NN self-join — checkpoint so the scan
    # + norm filter runs once, not once per branch
    y = (
        e.filter(
            (F.col("vec_id") >= 20) & (F.col("vec_id") < 120) & (F.col("nrm") > 0)
        )
        .select(
            F.col("vec_id").alias("tid"),
            F.col("embedding").alias("tv"),
            F.col("nrm").alias("tn"),
        )
        .localCheckpoint(eager=False)
    )
    cos = lambda av, an, bv, bn: F.floor(
        dot(F.col(av), F.col(bv)) / (F.col(an) * F.col(bn)) * 1000000
    ).cast("bigint")
    # |q|×|targets| scored pairs, read by the query-side k-NN sum AND
    # the final margin join
    xy = (
        x.crossJoin(F.broadcast(y))
        .select("qid", "tid", cos("qv", "qn", "tv", "tn").alias("cos_e6"))
        .localCheckpoint(eager=False)
    )
    wq = Window.partitionBy("qid").orderBy(F.col("cos_e6").desc(), "tid")
    sx = (
        xy.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= _MARGIN_K)
        .groupBy("qid")
        .agg(F.sum("cos_e6").cast("bigint").alias("sx"))
    )
    y2 = y.select(
        F.col("tid").alias("t2"), F.col("tv").alias("v2"), F.col("tn").alias("n2")
    )
    yy = (
        y.crossJoin(F.broadcast(y2))
        .filter(F.col("tid") != F.col("t2"))
        .select("tid", "t2", cos("tv", "tn", "v2", "n2").alias("c2"))
    )
    wt = Window.partitionBy("tid").orderBy(F.col("c2").desc(), "t2")
    sy = (
        yy.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= _MARGIN_K)
        .groupBy("tid")
        .agg(F.sum("c2").cast("bigint").alias("sy"))
    )
    m = (
        xy.join(sx, "qid")
        .join(sy, "tid")
        .filter(F.col("sx") + F.col("sy") > 0)
        .withColumn(
            "margin_bp",
            F.expr(
                f"({2 * _MARGIN_K} * cos_e6 * 10000) DIV (sx + sy)"
            ).cast("bigint"),
        )
    )
    wm = Window.partitionBy("qid").orderBy(F.col("margin_bp").desc(), "tid")
    return (
        m.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("tid").alias("match_id"),
            "cos_e6",
            "margin_bp",
        )
    )


_VEC_CTES = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
    "FROM embeddings), "
    "n AS (SELECT vec_id, vec, sqrt(list_sum(list_transform(range(1, 65), "
    "i -> vec[i] * vec[i]))) AS nrm FROM v)"
)

_MARGIN_SQL = (
    _VEC_CTES + ", "
    "x AS (SELECT vec_id AS qid, vec AS qv, nrm AS qn FROM n "
    "WHERE vec_id < 10 AND nrm > 0), "
    "y AS (SELECT vec_id AS tid, vec AS tv, nrm AS tn FROM n "
    "WHERE vec_id >= 20 AND vec_id < 120 AND nrm > 0), "
    "xy AS (SELECT qid, tid, CAST(floor(list_sum(list_transform("
    "range(1, 65), i -> qv[i] * tv[i])) / (qn * tn) * 1000000) AS BIGINT) "
    "AS cos_e6 FROM x CROSS JOIN y), "
    "sx AS (SELECT qid, CAST(sum(cos_e6) AS BIGINT) AS sx FROM "
    "(SELECT qid, cos_e6, row_number() OVER (PARTITION BY qid "
    f"ORDER BY cos_e6 DESC, tid) AS rn FROM xy) WHERE rn <= {_MARGIN_K} "
    "GROUP BY qid), "
    "yy AS (SELECT a.tid, b.tid AS t2, CAST(floor(list_sum(list_transform("
    "range(1, 65), i -> a.tv[i] * b.tv[i])) / (a.tn * b.tn) * 1000000) "
    "AS BIGINT) AS c2 FROM y a JOIN y b ON a.tid <> b.tid), "
    "sy AS (SELECT tid, CAST(sum(c2) AS BIGINT) AS sy FROM "
    "(SELECT tid, c2, row_number() OVER (PARTITION BY tid "
    f"ORDER BY c2 DESC, t2) AS rn FROM yy) WHERE rn <= {_MARGIN_K} "
    "GROUP BY tid), "
    "m AS (SELECT xy.qid, xy.tid, xy.cos_e6, "
    f"CAST(({2 * _MARGIN_K} * xy.cos_e6 * 10000) // (sx.sx + sy.sy) "
    "AS BIGINT) AS margin_bp "
    "FROM xy JOIN sx ON sx.qid = xy.qid JOIN sy ON sy.tid = xy.tid "
    "WHERE sx.sx + sy.sy > 0), "
    "r AS (SELECT *, row_number() OVER (PARTITION BY qid "
    "ORDER BY margin_bp DESC, tid) AS rn FROM m) "
    "SELECT qid AS vec_id, tid AS match_id, cos_e6, margin_bp "
    "FROM r WHERE rn = 1"
)


# --------------------------------------------------- Good-Turing coverage


def q_good_turing(spark, sf_dir):
    """Good-Turing coverage audit per source: the simple-GT missing-mass
    estimate p0 = n1/N (Gale & Sampson 1995) from the frequency-of-
    frequencies spectrum — "how much of this source's language have we
    NOT seen" — plus the r=1 adjusted count 2·n2/n1 that calibrates
    singleton trustworthiness.  Everything is exact bigint counts until
    two integer fixed-point divisions (basis points / e6); sources with
    no hapax legomena are excluded on both sides (their GT estimate is
    degenerate and their coverage is effectively complete).

    Scale: one explode + (source, token) count, then a per-source
    aggregate over the tf spectrum — the same two-aggregate shape as
    q_ttr_hapax; group keys are catalog-bounded."""
    d = _docs(spark, sf_dir).select("source", F.explode(_toks_ne()).alias("tok"))
    tf = d.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    return agg.filter(F.col("n1") > 0).select(
        "source",
        "n_tokens",
        "vocab",
        "n1",
        "n2",
        F.expr("(n1 * 10000) DIV n_tokens").cast("bigint").alias("p0_bp"),
        F.expr("(2 * n2 * 1000000) DIV n1").cast("bigint").alias("r1_star_e6"),
    )


_GOOD_TURING_SQL = (
    f"WITH t AS (SELECT source, unnest({_TOKS_NE}) AS tok FROM documents), "
    "tf AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2), "
    "a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS vocab, "
    "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
    "CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2 "
    "FROM tf GROUP BY source) "
    "SELECT source, n_tokens, vocab, n1, n2, "
    "CAST((n1 * 10000) // n_tokens AS BIGINT) AS p0_bp, "
    "CAST((2 * n2 * 1000000) // n1 AS BIGINT) AS r1_star_e6 "
    "FROM a WHERE n1 > 0"
)


# ------------------------------------------------- inter-filter agreement


def q_cohen_kappa(spark, sf_dir):
    """Cohen's kappa between two independent quality raters, per source:
    rater A = length gate (≥ 50 tokens), rater B = lexical-diversity
    gate (distinct ≥ n/2) — the agreement audit that tells a curation
    pipeline whether a second filter adds signal (kappa ≈ 1: redundant,
    drop one; kappa ≈ 0: independent, keep both).  The observed and
    chance agreements are exact integer products; kappa itself follows
    the PMI convention — ONE double division of two exact bigints + the
    4-dp round — so there is no intermediate-rounding drift.  Sources
    where either rater is constant (chance agreement = 1, kappa
    undefined) are excluded on both sides.

    Scale: one scan with two scan-side gate projections, one hash
    aggregate on source."""
    toks = _toks_ne()
    d = _docs(spark, sf_dir).select(
        "source",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("nd"),
    )
    g = d.select(
        "source",
        (F.col("n_tok") >= 50).cast("int").alias("a"),
        (F.col("nd") * 2 >= F.col("n_tok")).cast("int").alias("b"),
    )
    agg = g.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("a1"),
        F.sum("b").cast("bigint").alias("b1"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
    )
    agg = agg.withColumn(
        "n00", (F.col("n") - F.col("a1") - F.col("b1") + F.col("n11"))
    ).withColumn(
        "pe_num",
        F.col("a1") * F.col("b1") + (F.col("n") - F.col("a1")) * (F.col("n") - F.col("b1")),
    )
    return (
        agg.filter(F.col("n") * F.col("n") - F.col("pe_num") > 0)
        .select(
            "source",
            "n",
            "n11",
            "n00",
            F.round(
                (F.col("n") * (F.col("n11") + F.col("n00")) - F.col("pe_num")).cast(
                    "double"
                )
                / (F.col("n") * F.col("n") - F.col("pe_num")).cast("double"),
                4,
            ).alias("kappa_4"),
        )
    )


_KAPPA_SQL = (
    f"WITH d AS (SELECT source, len({_TOKS_NE}) AS n_tok, "
    f"len(list_distinct({_TOKS_NE})) AS nd FROM documents), "
    "g AS (SELECT source, "
    "CASE WHEN n_tok >= 50 THEN 1 ELSE 0 END AS a, "
    "CASE WHEN nd * 2 >= n_tok THEN 1 ELSE 0 END AS b FROM d), "
    "ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(a) AS BIGINT) AS a1, CAST(sum(b) AS BIGINT) AS b1, "
    "CAST(sum(a * b) AS BIGINT) AS n11 FROM g GROUP BY source), "
    "k AS (SELECT source, n, n11, n - a1 - b1 + n11 AS n00, "
    "a1 * b1 + (n - a1) * (n - b1) AS pe_num FROM ag) "
    "SELECT source, n, n11, CAST(n00 AS BIGINT) AS n00, "
    # + 0 normalizes IEEE -0.0 (kappa is sign-indefinite; repo convention)
    "round(CAST(n * (n11 + n00) - pe_num AS DOUBLE) / "
    "CAST(n * n - pe_num AS DOUBLE), 4) + 0 AS kappa_4 "
    "FROM k WHERE n * n - pe_num > 0"
)


# ------------------------------------------------ URL canonicalization


def q_url_dedup(spark, sf_dir):
    """URL canonicalization dedup-rate audit: synthesize crawl-style URLs
    with the three classic duplicate vectors (host case, tracking
    params, trailing slash) deterministically from order attributes,
    canonicalize — lowercase host, strip utm_* query params, trim the
    trailing slash — and report how much of the raw frontier collapses.
    This is the first dedup a web corpus runs (before any content hash):
    the same document behind N tracking-tagged URLs is N fetches and N
    exact-dup docs if the frontier is not canonicalized.  Regexes stay
    RE2-simple and identical on both engines (the q_url_parse
    discipline); the utm filter is an array filter over the split query
    string, not a regex rewrite.

    Scale: pure scan-side string projection + one hash aggregate on the
    canonical key + one tiny summary aggregate — no joins, no windows."""
    o = load_table(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("Shop.Example.COM")).otherwise(
            F.lit("shop.example.com")
        ),
        F.lit("/item/"),
        (F.col("o_custkey") % 200).cast("string"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.lit("?utm_source=news&utm_campaign=mail"),
        )
        .when(F.col("o_orderkey") % 3 == 1, F.lit("?ref=aff"))
        .otherwise(F.lit("")),
    )
    u = o.select(url.alias("url"))
    c = u.selectExpr(
        "lower(regexp_extract(url, '^https?://([^/]+)', 1)) AS chost",
        "regexp_replace(regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1), "
        "'/$', '') AS cpath",
        "array_join(filter(split(regexp_extract(url, '\\\\?([^#]*)', 1), '&'), "
        "p -> p != '' AND NOT startswith(p, 'utm_')), '&') AS cq",
    ).selectExpr(
        "concat('https://', chost, cpath, "
        "CASE WHEN cq != '' THEN concat('?', cq) ELSE '' END) AS canon"
    )
    groups = c.groupBy("canon").agg(F.count(F.lit(1)).alias("g"))
    return groups.agg(
        F.sum("g").cast("bigint").alias("n_raw"),
        F.count(F.lit(1)).cast("bigint").alias("n_canon"),
        F.max("g").cast("bigint").alias("max_group"),
    ).select(
        "n_raw",
        "n_canon",
        "max_group",
        F.expr("((n_raw - n_canon) * 10000) DIV n_raw").cast("bigint").alias(
            "dup_bp"
        ),
    )


_URL_DEDUP_SQL = (
    "WITH u AS (SELECT 'https://' || "
    "(CASE WHEN o_orderkey % 2 = 0 THEN 'Shop.Example.COM' "
    "ELSE 'shop.example.com' END) || '/item/' || "
    "CAST(o_custkey % 200 AS VARCHAR) || "
    "(CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END) || "
    "(CASE WHEN o_orderkey % 3 = 0 THEN '?utm_source=news&utm_campaign=mail' "
    "WHEN o_orderkey % 3 = 1 THEN '?ref=aff' ELSE '' END) AS url "
    "FROM orders), "
    "c AS (SELECT 'https://' || "
    "lower(regexp_extract(url, '^https?://([^/]+)', 1)) || "
    "regexp_replace(regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1), "
    "'/$', '') || "
    "(CASE WHEN array_to_string(list_filter(string_split("
    "regexp_extract(url, '\\?([^#]*)', 1), '&'), "
    "p -> p <> '' AND NOT starts_with(p, 'utm_')), '&') <> '' "
    "THEN '?' || array_to_string(list_filter(string_split("
    "regexp_extract(url, '\\?([^#]*)', 1), '&'), "
    "p -> p <> '' AND NOT starts_with(p, 'utm_')), '&') ELSE '' END) "
    "AS canon FROM u), "
    "g AS (SELECT canon, count(*) AS g FROM c GROUP BY canon) "
    "SELECT CAST(sum(g) AS BIGINT) AS n_raw, "
    "CAST(count(*) AS BIGINT) AS n_canon, "
    "CAST(max(g) AS BIGINT) AS max_group, "
    "CAST(((sum(g) - count(*)) * 10000) // sum(g) AS BIGINT) AS dup_bp "
    "FROM g"
)



# -------------------------------------------------- t-closeness (privacy)


_TCLOSE_M = 8  # sensitive-attribute buckets (ordered 0..7)


def q_t_closeness(spark, sf_dir):
    """t-closeness audit — the third gate of the release-privacy trilogy
    (q_k_anonymity: class size; q_l_diversity: sensitive diversity;
    here: sensitive DISTRIBUTION).  A QI class can be large and diverse
    yet still leak if its sensitive-value distribution diverges from the
    corpus (Li et al., ICDE 2007): for the same (event_type, hour) QI
    and an ordered 8-bucket sensitive measurement (|floor(value)| % 8),
    each class's Earth-Mover distance to the global distribution is the
    mean of |prefix-sum gaps| — a rational with denominator
    (m-1)·sz·N, so t lands as an exact-integer e6 floor with no float
    in the hash (the q_ks_test construction, applied per class).
    Reports, per threshold t ∈ {0.20, 0.35, 0.50}, how many classes
    (and rows) exceed it — the same 3-row broadcast threshold-join
    shape as the two sibling audits.

    Scale: one (QI, bucket) aggregate, a per-class window over the
    FIXED 8-bucket grid, one threshold join — no stage touches raw rows
    twice.  The cross-multiplied prefix numerator stays under 2^63 to
    ~10^8 rows per class; beyond that, pre-normalize to a fixed 1e9
    grid (same note as q_ks_test)."""
    ev = load_table(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        (F.abs(F.floor("value")).cast("bigint") % _TCLOSE_M).alias("sb"),
    )
    cb = rows.groupBy("event_type", "hr", "sb").agg(
        F.count(F.lit(1)).alias("c")
    )
    cls = cb.groupBy("event_type", "hr").agg(F.sum("c").alias("sz"))
    g = rows.groupBy("sb").agg(F.count(F.lit(1)).alias("gc"))
    tot = g.agg(F.sum("gc").alias("n_total"))
    grid = (
        cls.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(tot))
        .join(cb, ["event_type", "hr", "sb"], "left")
    )
    w = (
        Window.partitionBy("event_type", "hr")
        .orderBy("sb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "event_type",
        "hr",
        "sz",
        "n_total",
        F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w).alias("cum_c"),
        F.sum("gc").over(w).alias("cum_g"),
    )
    t = (
        cum.groupBy("event_type", "hr", "sz", "n_total")
        .agg(
            F.sum(
                F.abs(F.col("cum_c") * F.col("n_total") - F.col("cum_g") * F.col("sz"))
            ).alias("t_num")
        )
        .select(
            "sz",
            "n_total",
            F.expr(
                f"(t_num * 1000000) DIV ({_TCLOSE_M - 1} * sz * n_total)"
            ).alias("t_e6"),
        )
    )
    # threshold frame from literals, NOT from `tot`: deriving it from the
    # aggregate would re-execute the whole rows->g->tot subtree (a second
    # full events scan) just to seed three constants
    thr = (
        spark.range(1)
        .select(
            F.explode(
                F.array(F.lit(200000), F.lit(350000), F.lit(500000))
            ).alias("t")
        )
        .select(F.col("t").cast("bigint").alias("thr_e6"))
    )
    return (
        thr.join(t, F.col("t_e6") > F.col("thr_e6"), "left")
        .groupBy("thr_e6")
        .agg(
            F.count("t_e6").cast("bigint").alias("n_classes"),
            F.coalesce(F.sum("sz"), F.lit(0)).cast("bigint").alias("n_rows"),
            F.coalesce(F.max("t_e6"), F.lit(0)).cast("bigint").alias("max_t_e6"),
        )
    )


_TCLOSE_SQL = (
    "WITH rws AS (SELECT event_type, date_trunc('hour', ts) AS hr, "
    f"CAST(abs(floor(value)) AS BIGINT) % {_TCLOSE_M} AS sb FROM events), "
    "cb AS (SELECT event_type, hr, sb, count(*) AS c FROM rws GROUP BY 1, 2, 3), "
    "cls AS (SELECT event_type, hr, CAST(sum(c) AS BIGINT) AS sz FROM cb GROUP BY 1, 2), "
    "g AS (SELECT sb, count(*) AS gc FROM rws GROUP BY sb), "
    "tot AS (SELECT CAST(sum(gc) AS BIGINT) AS n_total FROM g), "
    "cum AS (SELECT cls.event_type, cls.hr, cls.sz, tot.n_total, "
    "sum(coalesce(cb.c, 0)) OVER (PARTITION BY cls.event_type, cls.hr "
    "ORDER BY g.sb ROWS UNBOUNDED PRECEDING) AS cum_c, "
    "sum(g.gc) OVER (PARTITION BY cls.event_type, cls.hr "
    "ORDER BY g.sb ROWS UNBOUNDED PRECEDING) AS cum_g "
    "FROM cls CROSS JOIN g CROSS JOIN tot "
    "LEFT JOIN cb ON cb.event_type = cls.event_type AND cb.hr = cls.hr "
    "AND cb.sb = g.sb), "
    "t AS (SELECT sz, n_total, "
    "CAST((sum(abs(cum_c * n_total - cum_g * sz)) * 1000000) "
    f"// ({_TCLOSE_M - 1} * sz * n_total) AS BIGINT) AS t_e6 "
    "FROM cum GROUP BY event_type, hr, sz, n_total), "
    "thr AS (SELECT CAST(thr_e6 AS BIGINT) AS thr_e6 FROM "
    "(SELECT unnest([200000, 350000, 500000]) AS thr_e6)) "
    "SELECT thr.thr_e6, CAST(count(t.t_e6) AS BIGINT) AS n_classes, "
    "CAST(coalesce(sum(t.sz), 0) AS BIGINT) AS n_rows, "
    "CAST(coalesce(max(t.t_e6), 0) AS BIGINT) AS max_t_e6 "
    "FROM thr LEFT JOIN t ON t.t_e6 > thr.thr_e6 GROUP BY thr.thr_e6"
)


# --------------------------------------- approx-percentile error contract


_PCT_ACC = 100  # percentile_approx accuracy -> rank error <= n/accuracy


def q_approx_quantile_bound(spark, sf_dir):
    """Error-contract oracle for percentile_approx — the
    q_approx_distinct_bound move applied to the quantile sketch: per
    event_type, the approximate median must identify a value whose
    EXACT rank interval [count_lt + 1, count_le] intersects the true
    median rank window widened by 3x the sketch's guaranteed rank error
    (n / accuracy, Greenwald-Khanna bound).  The predicate is pure
    integers (both sides multiplied through by the accuracy), so DuckDB
    can assert the CONTRACT — constant 1 — without reproducing the
    sketch value, and the row hash-matches iff Spark's sketch honors
    its bound on this data.  The sketch VALUE itself never enters the
    hash (merge order across partitions may legally vary it within the
    bound).

    Scale: one aggregate for the sketch, one map-side-combinable
    conditional count join back on the bounded event-type key."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    ap = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, _PCT_ACC).alias("apx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    ranks = (
        ev.join(F.broadcast(ap), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.sum(F.when(F.col("value") < F.col("apx"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_lt"),
            F.sum(F.when(F.col("value") <= F.col("apx"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_le"),
        )
    )
    a = _PCT_ACC
    lo = F.expr("(n + 1) DIV 2")
    hi = F.expr("(n + 2) DIV 2")
    within = (
        (F.lit(a) * (F.col("c_lt") + 1) <= F.lit(a) * hi + 3 * F.col("n"))
        & (F.lit(a) * F.col("c_le") >= F.lit(a) * lo - 3 * F.col("n"))
    )
    return ranks.select(
        "event_type", "n", within.cast("int").alias("within_3err")
    )


_PCT_BOUND_SQL = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, 1 AS within_3err "
    "FROM events GROUP BY event_type"
)


QUERIES = {
    "q_kcore": (q_kcore, _kcore_sql()),
    "q_margin_knn": (q_margin_knn, _MARGIN_SQL),
    "q_good_turing": (q_good_turing, _GOOD_TURING_SQL),
    "q_cohen_kappa": (q_cohen_kappa, _KAPPA_SQL),
    "q_url_dedup": (q_url_dedup, _URL_DEDUP_SQL),
    "q_t_closeness": (q_t_closeness, _TCLOSE_SQL),
    "q_approx_quantile_bound": (q_approx_quantile_bound, _PCT_BOUND_SQL),
}
