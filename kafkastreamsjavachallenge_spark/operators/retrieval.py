"""Lexical retrieval and importance-weighted data selection.

``bm25_topk`` is the lexical-retrieval half of a RAG / data-selection
stack; ``dsir_logweights`` is the DSIR recipe (Xie et al. 2023,
arXiv:2302.03169) for scoring raw documents by how target-like their
hashed-unigram distribution is.

Scale shapes (100 TB):
- BM25 with a bounded query vocabulary never shuffles the corpus: term
  frequencies are ``size(filter(...))`` projections, the corpus
  statistics are ONE 1-row aggregate broadcast back, and the final
  top-k is TakeOrderedAndProject's per-partition heap.
- DSIR shuffles the corpus once (the doc×bucket aggregate); the two
  bucket models are tiny (n_buckets rows) broadcast aggregates.  The
  per-document sum folds a sorted bucket list sequentially so the
  result is independent of partitioning AND bit-reproducible across
  engines (the unordered-float-agg drift class from round 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.functions import text as T


def bm25_topk(
    d: DataFrame,
    terms: tuple,
    k: int = 10,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, Lucene's +1-inside-the-log idf) top-``k``
    documents for a fixed bag of query ``terms``.

    ``avgdl`` is derived as Σdl/N (exact integer sum, one correctly-
    rounded divide) rather than ``avg()`` and the per-term sum is a
    literal fixed-order expression, so any engine evaluating the same
    tree reproduces the score bit-for-bit up to the shared ``ln``.
    """
    if not terms:
        raise ValueError("bm25_topk: terms must be a non-empty tuple")
    tf = d.select(
        id_col,
        F.size(toks_col).alias("dl"),
        # NB: a `lambda x, t=t:` default would be treated as the (elem,
        # index) two-arg HOF form by F.filter — hence the closure factory
        *[
            F.size(
                F.filter(toks_col, (lambda term: lambda x: x == F.lit(term))(t))
            ).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    st = tf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    sc = tf.crossJoin(F.broadcast(st))
    n = F.col("n").cast("double")
    avgdl = F.col("sdl").cast("double") / F.col("n")

    def contrib(i: int) -> Column:
        t = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
        den = t + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / avgdl)
        return idf * (t * F.lit(2.2)) / den

    score = contrib(0)
    for i in range(1, len(terms)):
        score = score + contrib(i)
    score = F.round(score, 4)
    return (
        sc.select(id_col, score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def dsir_logweights(
    tok: DataFrame,
    is_target: Column,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    cache: bool = False,
) -> DataFrame:
    """DSIR importance log-weights over a (doc, token) relation.

    ``is_target`` marks the rows belonging to the target domain; every
    NON-target document gets ``log_weight`` = Σ_b c_b · (ln p̂_tgt(b) −
    ln p̂_raw(b)) over ``n_buckets`` hashed-unigram features with
    add-one smoothing, rounded to 4 dp.
    """
    tok = tok.select(
        id_col,
        is_target.alias("__tgt"),
        (T.base_hash28(F.col(tok_col)) % n_buckets).alias("b"),
    )
    # The (doc, bucket) counts are the ONE corpus-sized aggregate; both
    # bucket models re-aggregate that bounded relation (≤ docs × n_buckets
    # rows).  r12 optimization (guide §1.2 "don't compute things twice"):
    # without materialization Catalyst pushes the __tgt filters below the
    # aggregate and specializes each of the FIVE consumers (db/tgt/raw/
    # nt/nr) into its own full token-scan+aggregate — the r11
    # q_dsir_weights plan carried five copies of the explode+groupBy
    # subtree.  A lazy localCheckpoint computes it once; every model
    # branch re-aggregates the cached ≤ docs × n_buckets rows, so the
    # corpus is read a single time at any scale (on a cluster: reliable
    # checkpoint / temp table).  ``cache=True`` keeps the old persist()
    # semantics for callers that want executor-memory caching instead.
    db_all = tok.groupBy(id_col, "__tgt", "b").agg(F.count(F.lit(1)).alias("c"))
    db_all = db_all.persist() if cache else db_all.localCheckpoint(eager=False)
    tgt = db_all.filter(F.col("__tgt")).groupBy("b").agg(F.sum("c").alias("ct"))
    raw = db_all.filter(~F.col("__tgt")).groupBy("b").agg(F.sum("c").alias("cr"))
    nt = tgt.agg(F.sum("ct").alias("n_tgt"))
    nr = raw.agg(F.sum("cr").alias("n_raw"))
    db = db_all.filter(~F.col("__tgt")).select(id_col, "b", "c")
    j = (
        db.join(F.broadcast(tgt), "b", "left")
        .join(F.broadcast(raw), "b", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
    )
    lr = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("n_tgt") + F.lit(n_buckets)).cast("double")
    ) - F.log(
        (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.col("n_raw") + F.lit(n_buckets)).cast("double")
    )
    per = j.select(id_col, "b", (F.col("c") * lr).alias("contrib"))
    folded = per.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("b", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("lw")
    )
    return folded.select(id_col, F.round("lw", 4).alias("log_weight"))


def cap_domains_scaled(
    df: DataFrame,
    domain_col: str = "source",
    cap: int = 15,
    id_col: str = "doc_id",
    margin: int = 4,
) -> DataFrame:
    """Exact per-domain cap with the hash-threshold scale path: the
    semantics of the plain window-rank cap (keep the ``cap`` docs with
    the smallest md5(id) per domain), but the per-domain window sort
    only ever sees a bounded candidate set.

    A hot domain's rank sort serializes onto one task in the naive
    plan.  Because ranks come from a UNIFORM hash, the cap-th smallest
    hash of an n-row domain concentrates near cap/n, so filtering to
    hashes below ``margin``·cap/n keeps ~margin·cap candidates per
    domain — the exact rank sort then touches only those.  Domains
    where the margin under-selects (possible, vanishingly rare) are
    detected by a candidate count < min(cap, n) and routed through the
    full sort, so the result is EXACT for every input, not just with
    high probability.  Small domains (n ≤ cap) skip both paths.

    Two aggregates + one bounded window; nothing corpus-sized is ever
    globally sorted.
    """
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    hv = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")  # uniform u32
    d = df.select(
        F.col(domain_col).alias("__dom"), F.col(id_col), h.alias("__h"), hv.alias("__hv")
    )
    sizes = d.groupBy("__dom").agg(F.count(F.lit(1)).alias("__n"))
    # r12 (guide §1.2): the size-annotated table fans out four ways
    # (small, big -> candidates + fallback) — checkpoint so the scan +
    # md5 projection + broadcast join runs once, not once per branch
    d = d.join(F.broadcast(sizes), "__dom").localCheckpoint(eager=False)

    small = d.filter(F.col("__n") <= cap)
    big = d.filter(F.col("__n") > cap)
    thresh = (F.lit(float(margin * cap)) / F.col("__n") * F.lit(2.0**32)).cast(
        "bigint"
    )
    cand = big.filter(F.col("__hv") < thresh)
    # exactness guard: a domain whose candidate set is smaller than cap
    # cannot prove it holds the true top-cap — route it to the full sort
    ok = (
        cand.groupBy("__dom")
        .agg(F.count(F.lit(1)).alias("__nc"))
        .filter(F.col("__nc") >= cap)
        .select("__dom")
    )
    fallback = big.join(F.broadcast(ok), "__dom", "left_anti")
    ranked_input = cand.join(F.broadcast(ok), "__dom", "left_semi").unionByName(
        fallback
    )
    w = Window.partitionBy("__dom").orderBy("__h", id_col)
    capped = (
        ranked_input.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .select("__dom", id_col, "__rk")
    )
    small_ranked = small.withColumn("__rk", F.row_number().over(w)).select(
        "__dom", id_col, "__rk"
    )
    return capped.unionByName(small_ranked).select(
        F.col("__dom").alias(domain_col), id_col, F.col("__rk").alias("rk")
    )


def maxsim_pandas(
    docs: DataFrame,
    query_vecs: list[list[float]],
    group_col: str = "label",
    vec_col: str = "embedding",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Arrow-accelerated MaxSim (ColBERT late interaction): per document
    group G, score = sum over query vectors q of max over d in G of
    cos(q, d) — computed as ONE numpy matmul per group inside
    ``applyInPandas``.

    This is the documented escape hatch for the HOF fold (queries/llm.py
    q_maxsim): the declarative fold is oracle-exact but evaluates 64-dim
    dots element-by-element in codegen; when |Q| x |corpus| grows, the
    Arrow batch path turns the same arithmetic into a (|G|, dim) x
    (dim, |Q|) BLAS call — same asymptotics, vastly better constants.
    Equivalence to the exact path is pinned in
    tests/test_operators.py::test_maxsim_pandas_matches_hof (float sums
    may differ from the sequential fold only in final ulps, so the test
    compares at 1e-9 relative).  Scale notes: groups shuffle once on
    ``group_col``; the query matrix rides the closure (broadcast by
    Spark's task serializer).

    ``salt_buckets``: skew hardening for a giant group (one label owning
    a corpus-scale share of the rows would otherwise pin its whole
    matmul — and its whole Arrow batch — on one task).  Per-q max is
    mergeable, so the salted path computes PARTIAL max vectors per
    (group, salt) split, then merges with an elementwise max aggregate
    (posexplode → per-(group, q-index) max → sum).  The salt is
    ``xxhash64`` of the vector itself — DETERMINISTIC per row, which
    matters under shuffle-retry: a nondeterministic salt (rand,
    monotonically_increasing_id) can re-bucket rows between a map
    task's original run and its recomputation after executor loss,
    silently dropping rows from every consumed partial.  Identical
    vectors co-bucket (they contribute identical maxes, so balance is
    the only cost, and only in the pathological all-duplicates corpus).
    Same values as the unsalted path to final-sum ulps (the merge
    reorders the float sum); equivalence pinned in
    tests/test_operators.py::test_maxsim_pandas_salted_matches_unsalted.
    """
    import numpy as np
    import pandas as pd

    from kafkastreamsjavachallenge_spark.scale import resolve

    salt_buckets = resolve(salt_buckets, "salt_buckets")
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)

    if salt_buckets and salt_buckets > 1:
        part_schema = f"{group_col} long, maxes array<double>"

        def partial(pdf: "pd.DataFrame") -> "pd.DataFrame":
            g = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            gn = np.linalg.norm(g, axis=1)
            cos = (g @ q.T) / np.outer(gn, qn)
            return pd.DataFrame(
                {
                    group_col: [int(pdf[group_col].iloc[0])],
                    "maxes": [cos.max(axis=0).tolist()],
                }
            )

        salted = docs.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(vec_col)), F.lit(salt_buckets))
        )
        parts = salted.groupBy(group_col, "__salt").applyInPandas(
            partial, part_schema
        )
        return (
            parts.select(group_col, F.posexplode("maxes").alias("qi", "m"))
            .groupBy(group_col, "qi")
            .agg(F.max("m").alias("mm"))
            .groupBy(group_col)
            .agg(
                F.sum("mm").alias("maxsim"),
                F.count(F.lit(1)).cast("int").alias("n_query_vecs"),
            )
            .select(
                F.col(group_col).cast("long").alias("doc_label"),
                "maxsim",
                "n_query_vecs",
            )
        )

    schema = "doc_label bigint, maxsim double, n_query_vecs int"

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        g = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        gn = np.linalg.norm(g, axis=1)
        cos = (g @ q.T) / np.outer(gn, qn)
        return pd.DataFrame(
            {
                "doc_label": [int(pdf[group_col].iloc[0])],
                "maxsim": [float(cos.max(axis=0).sum())],
                "n_query_vecs": [q.shape[0]],
            }
        )

    return docs.groupBy(group_col).applyInPandas(score, schema)


def mmr_select(
    cand: DataFrame,
    pairsims: DataFrame,
    k: int = 3,
    qid_col: str = "qid",
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein 1998)
    over pre-scored candidates: per query, greedily pick the candidate
    maximizing ``relevance - max(similarity to already-selected)`` —
    diversified top-k for retrieval-augmented training-data selection
    (near-identical top hits waste the context window; MMR keeps one of
    each near-dup family).

    The greedy loop is inherently sequential PER QUERY but embarrassingly
    parallel ACROSS queries, and each group is bounded by the candidate
    cutoff (N ≤ ~tens) — the exact shape grouped-map ``applyInPandas`` is
    for (SURVEY.md §2.2 custom-operator path (b)).  Both inputs carry
    INTEGER fixed-point scores (e6), so the pandas stage does pure integer
    arithmetic: all float work (dot products, norms) stays JVM-side in the
    caller, and the result is bit-identical across engines.

    ``cand``: one row per (query, candidate) with ``cos_e6`` relevance.
    ``pairsims``: candidate-candidate sims per query, BOTH directions,
    ``sim_e6``.  Groups are cogrouped on ``qid_col``.

    100 TB shape: candidates per query are top-N from an upstream ANN
    stage, so group size is a constant; the cogroup shuffles rows
    proportional to queries × N (never the corpus), and selection state
    never leaves the executor.
    """
    schema = f"{qid_col} bigint, mmr_rank int, vec_id bigint, score_e6 bigint"

    def _greedy(key, cdf, pdf):
        import pandas as pd

        sims = {
            (int(a), int(b)): int(s)
            for a, b, s in zip(pdf["id_a"], pdf["id_b"], pdf["sim_e6"])
        }
        avail = {
            int(v): int(c) for v, c in zip(cdf["vec_id"], cdf["cos_e6"])
        }
        selected: list[int] = []
        rows = []
        for r in range(1, min(k, len(avail)) + 1):
            best_vid, best_score = None, None
            # ascending id order + strict '>' == ORDER BY score DESC, vec_id
            for vid in sorted(avail):
                # a missing pair means "no measured redundancy" — penalty
                # 0, so sparse pairsims (only near pairs materialized, the
                # realistic shape at scale) degrade gracefully
                score = (
                    avail[vid]
                    if not selected
                    else avail[vid]
                    - max(sims.get((vid, s), 0) for s in selected)
                )
                if best_score is None or score > best_score:
                    best_vid, best_score = vid, score
            rows.append((int(key[0]), r, best_vid, best_score))
            selected.append(best_vid)
            del avail[best_vid]
        return pd.DataFrame(
            rows, columns=[qid_col, "mmr_rank", "vec_id", "score_e6"]
        )

    return (
        cand.groupBy(qid_col)
        .cogroup(pairsims.groupBy(qid_col))
        .applyInPandas(_greedy, schema=schema)
    )
