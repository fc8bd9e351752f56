"""LLM-data-pipeline queries (BASELINE.json north star): dedup (exact /
MinHash+LSH / SimHash / n-gram Jaccard), similarity search, text analysis,
multimodal binary plumbing — over documents/embeddings (FIXTURES.md §4).

Oracles reproduce the exact same md5-derived hashing so results match
bit-for-bit (see functions/text.py hashing note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.functions import text as T
from kafkastreamsjavachallenge_spark.functions.vector import cosine
from kafkastreamsjavachallenge_spark.operators import dedup as D
from kafkastreamsjavachallenge_spark.operators import similarity as S


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def q_graph_degree(spark, sf_dir):
    """Degree distribution of the MinHash-LSH candidate graph — the
    audit view a dedup run reads before clustering (a heavy-tailed degree
    histogram means a hot band bucket; salt it before the pair join).
    Two hash aggregates over the pairs relation."""
    sigs = D.minhash_signatures(_docs(spark, sf_dir), n_perm=8)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    ends = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))


def q_fuzzy_join(spark, sf_dir):
    """Blocked fuzzy self-join: part names within edit distance 2, blocked
    on the first token — the standard record-linkage shape.

    The expensive predicate runs on the DISTINCT-value projection, not the
    row pairs: names dedupe to a tiny vocabulary, the per-block name×name
    levenshtein runs over |vocab|² (thousands of comparisons, not the
    50M row-pair candidates the naive block join evaluates at sf0.1), and
    the qualifying name-pairs broadcast back onto the fact twice to expand
    into key pairs.  This aggregate-then-expand move is exactly how fuzzy
    joins survive 100 TB when the dirty attribute has bounded cardinality;
    when it doesn't, the block key becomes the shuffle key and skewed
    blocks get the salting treatment (operators/relational.py)."""
    p = load_table(spark, sf_dir, "part")
    # r12: the vocab feeds both join sides — checkpoint so the distinct
    # aggregate over the part scan runs once, not once per side
    names = p.select(F.col("p_name")).distinct().localCheckpoint(eager=False)
    na = names.select(
        F.col("p_name").alias("name_a"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    nb = names.select(
        F.col("p_name").alias("name_b"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    name_pairs = (
        na.join(nb, "blk")
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("name_a", "name_b", "dist")
    )
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(F.broadcast(name_pairs), "name_a")
        .join(b, "name_b")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b", "dist")
    )


def q_doc_chunks(spark, sf_dir):
    """Context-window chunking for training pipelines: split each document
    into 8-token chunks with stride 6 (2-token overlap).  Pure built-in
    HOFs (sequence → posexplode → slice) — JVM-side, whole-stage-codegen,
    linear fan-out with no shuffle at all; the UDTF variant
    (functions/udtf.py) is the API-surface twin, parity-pinned by unit
    test but kept out of the hot path per the Python-boundary policy."""
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks") - F.lit(2), F.lit(1)), F.lit(6)
    )
    return (
        d.select("doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "s"))
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("s"), 8)).alias("chunk"),
            F.size(F.slice(F.col("toks"), F.col("s"), 8)).alias("n_tok"),
        )
    )


def q_kmeans(spark, sf_dir):
    """Distributed Lloyd's k-means (operators/similarity.py kmeans) over the
    embeddings table: cluster sizes for k=8 after 3 iterations.  Oracle:
    the 3 iterations unrolled as chained SQL CTEs (assignment = struct-min
    argmin with the same lowest-cid tie-break, update = per-(cid, dim)
    mean re-packed in index order, empty clusters keep the prior
    centroid) — cluster sizes are integers, so the hash check is exact;
    cluster recovery is additionally pinned by unit test."""
    assigned, _ = S.kmeans(_embs(spark, sf_dir), k=8, iters=3)
    return (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("centroid_id")
    )


def q_batch_padding(spark, sf_dir):
    """Inference-batching padding audit: fixed-size batches of 8 docs
    per source, assigned (a) in arrival order and (b) length-sorted —
    the length-bucketing trick batch-inference engines use.  Every batch
    pads to its longest member, so padded = Σ_b max_tok(b)·|b| and the
    waste ratio (padded − real) / padded, in exact integer basis points,
    quantifies what bucketing saves.  One output row per strategy.

    Scale shape: both assignments are per-source window ranks (the
    parallel unit is the source shard — no global sort), then two hash
    aggregates; everything is integer arithmetic, so the comparison is
    hash-checked, not a float claim."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(T.tokens("text")).alias("n_tok")
    )
    out = []
    for strategy, order in (
        ("arrival", [F.col("doc_id")]),
        ("length_sorted", [F.col("n_tok"), F.col("doc_id")]),
    ):
        w = Window.partitionBy("source").orderBy(*order)
        batched = d.select(
            "source",
            "n_tok",
            ((F.row_number().over(w) - 1) / 8).cast("bigint").alias("b"),
        )
        per_batch = batched.groupBy("source", "b").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("n_tok").alias("mx"),
            F.sum("n_tok").alias("s"),
        )
        out.append(
            per_batch.agg(
                F.count(F.lit(1)).alias("n_batches"),
                F.sum(F.col("mx") * F.col("n")).alias("padded_tokens"),
                F.sum("s").alias("real_tokens"),
            ).select(
                F.lit(strategy).alias("strategy"),
                "n_batches",
                "padded_tokens",
                "real_tokens",
                F.expr(
                    "((padded_tokens - real_tokens) * 10000) "
                    "DIV padded_tokens"
                ).alias("waste_bp"),
            )
        )
    return out[0].unionByName(out[1])


def q_rouge_overlap(spark, sf_dir):
    """ROUGE-1/2 recall between adjacent doc pairs (ref = doc_id, cand =
    doc_id+1) — the n-gram overlap metric summarization/distillation
    evals compute at corpus scale, with CLIPPED counts (Σ_g min(c_ref,
    c_cand) / Σ_g c_ref), which is what distinguishes ROUGE from set
    Jaccard.  Emitted in exact integer basis points (·10000 DIV), so the
    oracle compares integers — no float discipline needed.

    Scale shape: per-doc n-gram counts are one explode + hash agg; the
    pair overlap is an equi-join on (gram, adjacent-id) — generalizing to
    arbitrary eval pairs means joining through a (ref_id, cand_id) pair
    table on the gram key, still never all-pairs."""
    d = _docs(spark, sf_dir)

    def gram_counts(n):
        toks = T.tokens("text")
        grams = (
            F.explode(T.shingles(toks, n)) if n > 1 else F.explode(toks)
        )
        return (
            d.select("doc_id", grams.alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    ids = d.select("doc_id")
    pairs = ids.alias("r").join(
        ids.alias("c"),
        F.col("r.doc_id") + 1 == F.col("c.doc_id"),
    ).select(F.col("r.doc_id").alias("doc_id"))

    def rouge_n(n, name):
        # r12 note: cnt fans out three ways but is deliberately NOT
        # checkpointed — its (doc_id, g) aggregate partitioning is
        # reused exchange-free by the ref-side overlap join, and a
        # checkpoint (UnknownPartitioning) forces that exchange back in:
        # measured 1.03 -> 1.84 s at sf0.1 when tried
        cnt = gram_counts(n)
        a = cnt.select(
            F.col("doc_id"), F.col("g"), F.col("c").alias("c_ref")
        )
        b = cnt.select(
            (F.col("doc_id") - 1).alias("doc_id"),
            F.col("g"),
            F.col("c").alias("c_cand"),
        )
        ov = (
            a.join(b, ["doc_id", "g"])
            .groupBy("doc_id")
            .agg(F.sum(F.least("c_ref", "c_cand")).alias("ov"))
        )
        denom = a.groupBy("doc_id").agg(F.sum("c_ref").alias("tot"))
        return (
            pairs.join(denom, "doc_id")
            .join(ov, "doc_id", "left")
            .select(
                "doc_id",
                F.expr("(coalesce(ov, 0) * 10000) DIV tot").alias(name),
            )
        )

    return rouge_n(1, "rouge1_e4").join(rouge_n(2, "rouge2_e4"), "doc_id")


def q_topic_labels(spark, sf_dir):
    """Topic-cluster labeling — the human-readable face of embedding
    clustering: k-means assignments (k=8, 3 iterations, q_kmeans's exact
    trainer) joined to the documents by id, then cluster-level TF-IDF
    (term count within cluster × ln(k / #clusters containing the term))
    names each cluster by its top-3 salient terms.

    Scale shape: the assignment side never shuffles the corpus (broadcast
    centroids + min_by), the doc→cluster join is an equi-join on id, and
    the labeling is two hash aggregates over (cluster, term) — all
    map-side combinable.  Oracle: the q_kmeans CTE chain reused verbatim
    (same init/tie-breaks) + the TF-IDF arithmetic of q_tfidf_top."""
    from pyspark.sql import Window

    e = _embs(spark, sf_dir)
    assigned, _ = S.kmeans(e, k=8, iters=3)
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    joined = toks.join(
        assigned.select(F.col("vec_id").alias("doc_id"), "centroid_id"),
        "doc_id",
    )
    tf = joined.groupBy("centroid_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    scored = tf.join(dfr, "term").select(
        "centroid_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(8.0) / F.col("dfc")), 6).alias(
            "score"
        ),
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.col("score").desc(), "term"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("centroid_id", "term", "score", "rn")
    )


def q_inverted_index(spark, sf_dir):
    """Inverted index build — the retrieval backbone feeding q_bm25:
    per-term document frequency, collection frequency, and the posting
    list (doc ids ascending, with parallel per-doc term frequencies),
    reported for the 20 rarest terms (df asc, term — rare terms are
    where index lookup beats a scan).

    Two shuffles total: (term, doc) TF with map-side combine, then one
    hash aggregate on term whose collect_list is bounded by df.  At
    100 TB a hot term's posting list outgrows one task, so the stored
    index is doc-range-sharded per term (key = (term, doc_id bucket)) and
    written partitioned by term — df/cf stay mergeable counts and a
    lookup is a partition-pruned scan; the per-term collect here is the
    single-shard case of that layout."""
    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(T.tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    inv = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("__p"),
    )
    # posting arrays serialize to pipe-joined strings (the repo's
    # oracle-checkable wire format for sets, cf. collect_uid_set)
    return inv.select(
        "term",
        "df",
        "cf",
        F.array_join(
            F.transform(F.col("__p"), lambda s: s["doc_id"].cast("string")),
            "|",
        ).alias("postings"),
        F.array_join(
            F.transform(F.col("__p"), lambda s: s["tf"].cast("string")), "|"
        ).alias("tfs"),
    ).orderBy("df", "term").limit(20)


def q_tfidf_top(spark, sf_dir):
    """Top-3 TF-IDF terms per document: term frequency from one explode +
    (doc, token) aggregate, document frequency from re-aggregating that
    same TF relation (no second corpus pass), corpus size as a broadcast
    scalar, ranked per doc with a unique (score desc, token) tie-break.
    At 100 TB the TF relation partitions by doc_id and DF by token — the
    two hash aggregates are the only shuffles besides the final rank."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dfreq")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "score", "rn")
    )


def q_gopher_repetition(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per-doc
    top-token fraction and top-bigram fraction, plus a keep/drop flag.
    One explode per n-gram order, each aggregated by (doc_id, gram) then
    (doc_id); the two per-doc profiles join on doc_id — identical hash
    partitioning on both sides, so the join adds no third shuffle."""
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    tok_stats = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.max("c").alias("top_tok_c"),
        )
    )
    big = d.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.size("toks") - 1),
                F.slice(F.col("toks"), 2, F.size("toks") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    big_stats = (
        big.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_big"), F.max("c").alias("top_big_c"))
    )
    return (
        tok_stats.join(big_stats, "doc_id")
        .select(
            "doc_id",
            F.round(F.col("top_tok_c") / F.col("n_tok"), 4).alias("top_tok_frac"),
            F.round(F.col("top_big_c") / F.col("n_big"), 4).alias("top_big_frac"),
            (
                (F.col("top_tok_c") / F.col("n_tok") <= 0.2)
                & (F.col("top_big_c") / F.col("n_big") <= 0.1)
            )
            .cast("int")
            .alias("keep"),
        )
    )


# ------------------------------------------------------------- dedup

def q_doc_dedup(spark, sf_dir):
    return D.exact_dedup_groups(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", T.token_fingerprint("text").alias("fp"))


def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003, the MOSS scheme):
    per position, the 3-gram shingle's 28-bit hash; per length-4 window
    of consecutive positions, keep the minimum hash; the fingerprint is
    the distinct set of kept minima.  Winnowing guarantees any shared
    run of >= w+k-1 tokens between two docs shares a fingerprint — the
    LOCAL containment detector (copied passages), complementing MinHash's
    GLOBAL resemblance.  Pure per-row HOF projection — zero shuffles; at
    100 TB the (fingerprint → doc) inverted index is one explode away,
    partitioned by fingerprint like any posting list.  Ascending-sorted,
    pipe-joined for the oracle wire format; integer hashes → exact."""
    from kafkastreamsjavachallenge_spark.functions.text import (
        base_hash28,
        let,
    )

    sh = T.shingles(T.tokens("text"), 3)
    w = 4
    fps = let(
        F.transform(sh, lambda g: base_hash28(g)),
        lambda hs: F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(hs) - w),
                    lambda i: F.array_min(F.slice(hs, i + 1, w)),
                )
            )
        ),
    )
    d = _docs(spark, sf_dir)
    return d.filter(F.size(T.tokens("text")) >= 3 + w - 1).select(
        "doc_id",
        F.array_join(
            F.transform(fps, lambda x: x.cast("string")), "|"
        ).alias("fps"),
    )


def q_minhash_sig(spark, sf_dir):
    sigs = D.minhash_signatures(_docs(spark, sf_dir), n_perm=4)
    return sigs.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("sig", lambda x: x.cast("string"))
        ).alias("sig"),
    )


def q_minhash_pairs(spark, sf_dir):
    sigs = D.minhash_signatures(_docs(spark, sf_dir), n_perm=8)
    return D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)


def q_neardup_components(spark, sf_dir):
    """Near-dup cluster formation: MinHash → LSH candidate pairs → connected
    components (min-label propagation); each component id is the canonical
    (minimum) doc_id of a duplicate cluster.  Oracle: same pair generation +
    a recursive CTE reachability closure."""
    d = _docs(spark, sf_dir)
    sigs = D.minhash_signatures(d, n_perm=8)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return D.connected_components(pairs, d.select("doc_id"))


def q_neardup_verified(spark, sf_dir):
    """End-to-end near-dup detection: MinHash → LSH candidate pairs →
    exact n-gram Jaccard verification → similarity threshold.  The exact
    verification only ever touches candidate pairs (never all pairs), so
    the whole pipeline stays sub-quadratic at any scale."""
    d = _docs(spark, sf_dir)
    sigs = D.minhash_signatures(d, n_perm=8)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return D.ngram_jaccard(d, pairs).filter(F.col("jaccard") >= 0.5)


def q_dedup_recall(spark, sf_dir, max_df=None):
    """Dedup recall audit — the q_ann_recall counterpart for the MinHash
    path: EXACT ground-truth near-dup pairs (3-gram Jaccard >= 0.5,
    integer-exact as 2·|A∩B| >= |A|+|B|-|A∩B|) vs the LSH candidate set
    (n_perm=8, 4 bands × 2 rows — same config as q_minhash_pairs).
    ``max_df`` is the at-scale hot-shingle cap on the ground-truth stage
    (None for sf0.01 oracle parity; the sf1 rehearsal passes 100).

    The ground truth is exact WITHOUT an all-pairs stage: two docs with
    Jaccard > 0 share a shingle, so candidates come from a self-equi-join
    of the shingle inverted index and |A∩B| is the join's pair count —
    cost Σ_g df(g)², bounded by the hottest shingle, never corpus-
    quadratic (at 100 TB, boilerplate shingles are df-capped first; a
    pair sharing ONLY ultra-common shingles sits far below any useful
    threshold).  Reports n_true / n_caught / recall, plus n_cand /
    precision of the candidate set (how much the exact verify stage pays
    per true pair found) — the two numbers a dedup deployment must
    monitor before trusting its banding config."""
    d = _docs(spark, sf_dir)
    # one shingling pass for both pipelines: the interpreted-HOF shingle
    # subtree dominates per-doc cost and is identical in the exact ground
    # truth and the MinHash signatures — localCheckpoint materializes it
    # once (lazily, at first action) and both consumers read the cached
    # partitions instead of re-shingling the corpus
    shd = D.shingled_docs(d, spread=True).localCheckpoint(eager=False)
    truth = D.exact_neardup_pairs_from_shingled(shd, max_df=max_df)
    # r12: cands feeds the recall left-join AND the n_cand aggregate —
    # checkpoint it so the MinHash→banding→pair-join chain runs once
    # (the r11 plan carried two full copies of it, nodes 30-56 / 62-90)
    cands = D.lsh_candidate_pairs(
        D.minhash_signatures_from_shingled(shd, n_perm=8),
        bands=4,
        rows_per_band=2,
    ).localCheckpoint(eager=False)
    flagged = truth.join(
        cands.select("id_a", "id_b", F.lit(1).alias("__hit")),
        ["id_a", "id_b"],
        "left",
    )
    return (
        flagged.agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("__hit").alias("n_caught"),
        )
        .crossJoin(F.broadcast(cands.agg(F.count(F.lit(1)).alias("n_cand"))))
        .select(
            "n_true",
            "n_caught",
            F.when(F.col("n_true") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_caught") / F.col("n_true"), 4))
            .alias("recall"),
            "n_cand",
            F.when(F.col("n_cand") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("n_caught") / F.col("n_cand"), 4))
            .alias("precision"),
        )
    )


def q_minhash_estimate(spark, sf_dir):
    """MinHash estimator audit: per LSH candidate pair, the signature-
    agreement estimate of Jaccard (agreeing positions / n_perm — the
    unbiased MinHash estimator) NEXT TO the exact shingle Jaccard, both
    in integer basis points (est_e4 = agree·10000/8 = agree·1250; jac_e4 =
    (|A∩B|·10000) DIV |A∪B|), so the sketch's accuracy is itself
    hash-checked.  This closes the audit triangle: q_minhash_pairs pins
    the banding, q_dedup_recall pins recall, this pins the estimator.
    Cost: the signatures/pairs already exist; exact Jaccard touches
    candidates only."""
    d = _docs(spark, sf_dir)
    # r12 (guide §1.2): the narrow signature table feeds the banding AND
    # both agreement sides — checkpoint it so the tokenize + 8-permute
    # corpus pass runs once.  The shingle sides are deliberately NOT
    # checkpointed: shingle arrays are fatter than the source text, so
    # materializing them moves more bytes than recomputing the
    # projection from the (page-cached / pruned) scan costs.
    sigs = D.minhash_signatures(d, n_perm=8).localCheckpoint(eager=False)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb"))
    agree = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sh = F.array_distinct(T.shingles(T.tokens("text"), 3))
    da = d.select(F.col("doc_id").alias("id_a"), sh.alias("ga"))
    db = d.select(F.col("doc_id").alias("id_b"), sh.alias("gb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            (agree * 1250).alias("est_e4"),
            F.expr(
                "(size(array_intersect(ga, gb)) * 10000) "
                "DIV size(array_distinct(concat(ga, gb)))"
            ).alias("jac_e4"),
        )
    )


def q_crosscorpus_dedup(spark, sf_dir):
    """Cross-corpus near-dup removal (operators/dedup.py
    crosscorpus_dedup): the corpus (source != 'src0') deduped against the
    reference set (source = 'src0') — MinHash banding joined reference ×
    corpus, exact Jaccard verify on candidates only, anti-join out.  The
    incremental-crawl companion to q_neardup_verified's self-dedup."""
    d = _docs(spark, sf_dir)
    kept = D.crosscorpus_dedup(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        threshold=0.5,
    )
    return kept.select("doc_id", "lang")


def q_knn_join(spark, sf_dir):
    """k-NN join: top-3 cosine neighbors for EACH query vector (bounded
    query block, vec_id < 20) via broadcast nested-loop + ranked window —
    the exact-scoring building block that IVF/LSH (q_ann_*) route through
    after candidate pruning at scale."""
    from kafkastreamsjavachallenge_spark.functions.vector import dot, norm

    e = _embs(spark, sf_dir)
    # norms hoisted to the join branches (see operators/similarity.py):
    # one fold per vector instead of one per scored pair, bit-identical
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("__qn"),
    )
    base = e.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        norm(F.col("embedding")).alias("__nn"),
    )
    from pyspark.sql import Window

    scored = base.crossJoin(F.broadcast(q)).select(
        "q_id",
        "n_id",
        F.round(
            dot(F.col("nv"), F.col("qv")) / (F.col("__nn") * F.col("__qn")), 4
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "n_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


def q_hll_union(spark, sf_dir):
    """Mergeable cardinality sketches (Apache DataSketches HLL): per-day
    sketch → re-aggregated union → estimate.  The 100 TB pattern for
    distinct counts over rollup hierarchies: sketch once at fine grain,
    merge upward without rescanning the fact.  Approximate → rows-only."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_unique_users")
    )


def q_hll_union_bound(spark, sf_dir):
    """Error-contract oracle for the DataSketches HLL MERGE path — the
    q_approx_distinct_bound move applied to q_hll_union, retiring the
    last contract-less rows-only id (round-7 VERDICT item 7).  Per-day
    sketches are unioned and estimated exactly as q_hll_union does, and
    the result is the corpus-exact distinct-user count plus an integer
    predicate pinning |union_estimate - exact| * 12 <= exact — a 8.33%
    margin ~= 5x the default sketch's rsd (lgConfigK = 12 ->
    rsd = 1.04/sqrt(4096) ~= 1.63%; the 5-sigma margin for the same
    fuzz-across-seeds reason q_approx_distinct_bound documents).  DuckDB
    cannot reproduce the sketch value, but the contract is exact: the
    oracle emits the same exact count with within_5rsd constant 1, so
    the hash matches iff the union estimate actually honors the bound.
    hll_sketch_estimate returns BIGINT, so the predicate is pure integer
    arithmetic — no float boundary.

    Scale: the whole point of the merge path — sketch once per day at
    fine grain, merge upward without rescanning the fact table; the
    exact count here is the TEST's referee, not part of the production
    plan."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_users",
        # est is NULL when events is empty / all user_ids NULL (union of
        # zero sketches) — coalesce to 0 so the degenerate corpus yields
        # |0 − 0| <= 0 -> 1, matching the oracle's constant, instead of
        # a NULL that can never hash-match
        (
            F.abs(F.coalesce(F.col("est"), F.lit(0)) - F.col("exact_users")) * 12
            <= F.col("exact_users")
        )
        .cast("int")
        .alias("within_5rsd"),
    )


def q_ngram_jaccard(spark, sf_dir):
    """Jaccard verification over deterministic candidate pairs (id, id+1)."""
    d = _docs(spark, sf_dir)
    pairs = d.select(F.col("doc_id").alias("id_a")).join(
        d.select((F.col("doc_id")).alias("id_b")),
        on=F.col("id_b") == F.col("id_a") + 1,
    )
    return D.ngram_jaccard(d, pairs)


def q_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


# -------------------------------------------------------- similarity

def q_cosine_topk(spark, sf_dir):
    e = _embs(spark, sf_dir)
    query = e.filter(F.col("vec_id") == 0)
    return S.cosine_topk(e.filter(F.col("vec_id") != 0), query, k=10)


def q_ann_lsh(spark, sf_dir):
    """SRP binary-sketch approximate NN: 192-bit sign signatures, Hamming
    <= 84 candidate filter, exact cosine re-rank (deployment-grade recall:
    measured 1.0@10 at sf0.01/sf0.1 vs 0.3 for the retired single-bucket
    probe).  Deterministic md5-derived hyperplanes make even this
    "approximate" operator exactly reproducible: the SQL oracle
    (_ANN_LSH_SQL) rebuilds the same planes, signatures, Hamming filter,
    and candidate scoring — hash-checked, not rows-only."""
    e = _embs(spark, sf_dir)
    query = e.filter(F.col("vec_id") == 0)
    return S.lsh_ann_topk(e.filter(F.col("vec_id") != 0), query, k=10)


def q_ann_ivf(spark, sf_dir):
    """IVF approximate NN: deterministic centroid set (lowest 16 ids),
    broadcast assignment, nprobe=4 probed lists.  Deterministic end to
    end, so the SQL oracle (_ANN_IVF_SQL) reproduces assignment, probe
    selection, and candidate scoring exactly — hash-checked."""
    e = _embs(spark, sf_dir)
    centroids = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    query = e.filter(F.col("vec_id") == 0)
    return S.ivf_ann_topk(
        e.filter(F.col("vec_id") != 0), query, centroids, k=10, nprobe=4
    )


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN: per-subspace k-means codebook (8 subspaces
    × 16 codes), m-byte code words, asymmetric-distance top-10 for one
    query — the IVF-PQ memory-compression path (codes are m bytes/vector
    vs 4·dim for raw floats).  Deterministic training (lowest-id init,
    tie-broken argmins) makes the whole pipeline SQL-mirrorable: the
    oracle (_ANN_PQ_SQL) unrolls the per-subspace k-means with the same
    init/tie-break/fold order; code assignments are integers and ADC
    distances agree away from rounding boundaries (centroid MEANS are
    order-unspecified float group-aggs on both engines, absorbed by the
    4-dp round); recall vs exact L2 is additionally pinned in
    tests/test_approx.py."""
    e = _embs(spark, sf_dir)
    base = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    # sample-train, encode-all: the codebook learns from a deterministic
    # ~10% hash sample, so training cost is fixed by the sample while
    # encode/probe remain the only corpus-sized stages (the discipline
    # tests/test_scale.py runs at 200k vectors)
    train = base.filter(_h28(F.col("vec_id")) % 10 == 0)
    codebook = S.pq_train(train, m=8, k=16, iters=2)
    return S.pq_ann_topk(base, query, codebook, k=10)


def q_ann_pq_blas(spark, sf_dir):
    """Arrow/BLAS twin of q_ann_pq (operators/similarity.py
    pq_ann_topk_blas): identical deterministic trainer, encode + ADC
    fused into one vectorized kernel per Arrow batch with sequential
    index-order accumulation so per-subspace distances match the
    Catalyst fold and the DuckDB oracle bit-for-bit — registered against
    the SAME _ANN_PQ_SQL oracle, hash-checked, and exact-equivalence
    pinned against the declarative path in tests/test_approx.py."""
    e = _embs(spark, sf_dir)
    base = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    train = base.filter(_h28(F.col("vec_id")) % 10 == 0)
    codebook = S.pq_train(train, m=8, k=16, iters=2)
    return S.pq_ann_topk_blas(base, query, codebook, k=10)


def _refine_knobs() -> tuple[int, int]:
    """(nprobe, candidate width) for the refine-retrieval ids — the
    active ``scale.ScaleProfile``'s ``ann_nprobe`` / ``ann_refine_width``
    when set (PRODUCTION_100TB: 8 / 200), else the oracle-pinned 4 / 100.
    Only the REFINE ids consume these.  For q_ann_pq_refine the PQ
    candidate stage scans the whole corpus, so a wider ADC prefix is a
    strict SUPERSET and the exact re-rank returns the identical
    saturated top-10 — parity pinned by
    tests/test_scale.py::test_scale_profile_parity.  For
    q_ann_ivfpq_refine ann_nprobe is a recall-IMPROVING knob: wider
    probes reach inverted lists the default misses, so the profile's
    result may be strictly better (pinned there as pointwise dominance
    of the sorted cosines).  The raw ADC ids (q_ann_ivf / q_ann_ivfpq*)
    keep their hard-coded nprobe=4: widening probes changes THEIR
    result set by design, and their hash oracles encode nprobe=4."""
    from kafkastreamsjavachallenge_spark.scale import resolve

    nprobe = resolve(None, "ann_nprobe")
    width = resolve(None, "ann_refine_width")
    # is-None (not truthiness): a profile that explicitly sets 0 is a
    # config error and must fail loudly, never be coerced to the default
    for name, v in (("ann_nprobe", nprobe), ("ann_refine_width", width)):
        if v is not None and v < 1:
            raise ValueError(f"{name} must be >= 1, got {v}")
    return (4 if nprobe is None else nprobe, 100 if width is None else width)


def _exact_rerank(base, query, cands, k=10):
    """Shared refine tail (FAISS IndexRefineFlat shape): exact e6-floored
    cosine re-rank of a bounded candidate set against the single query
    vector.  The exact stage touches only |cands| rows (broadcast 1-row
    query block), zero-norm rows excluded on both engines — the
    q_embed_norm_audit lesson.  Deterministic: integer e6 cosine, ties
    break on vec_id."""
    from kafkastreamsjavachallenge_spark.functions.vector import dot, norm

    q = query.select(
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("__qn"),
    ).filter(F.col("__qn") > 0)
    rer = (
        cands.select("vec_id")
        .join(base.select("vec_id", "embedding"), "vec_id")
        .withColumn("__bn", norm(F.col("embedding")))
        .filter(F.col("__bn") > 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.floor(
                dot(F.col("embedding"), F.col("qv"))
                / (F.col("__bn") * F.col("__qn"))
                * 1000000
            ).cast("bigint").alias("cos_e6"),
        )
    )
    return rer.orderBy(F.col("cos_e6").desc(), "vec_id").limit(k)


def q_ann_pq_refine(spark, sf_dir):
    """PQ-refine retrieval (FAISS IndexRefineFlat shape): ADC-rank the
    corpus from the code words, keep the top-100 candidates, exact
    e6-floored cosine re-rank of the survivors — the deployment answer
    to PQ's quantization noise.  Motivated by a round-9 measurement: the
    default 8x16 codebook's raw ADC top-10 has recall 0.0-0.2 vs exact
    cosine on this near-uniform corpus, and NO sampled codebook geometry
    fixes the top-10 directly — but a 16-subspace, 64-code codebook's
    ADC top-100 contains the true top-10 at every SF (10/10 measured at
    sf0.001/0.01/0.1), so candidate-generate + refine restores
    recall@10 = 1.0 while the exact stage touches only 100 rows.  Fully
    deterministic (ADC ties break on vec_id; the re-rank is integer
    e6 cosine; zero-norm rows excluded both engines) — hash-checked
    against _ANN_PQ_REFINE_SQL.  Recall tracked per round in bench.py
    (ann_recall@10: pq raw vs pq_refine)."""
    e = _embs(spark, sf_dir)
    base = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    train = base.filter(_h28(F.col("vec_id")) % 10 == 0)
    codebook = S.pq_train(train, m=16, k=64, iters=2)
    _, width = _refine_knobs()
    cands = S.pq_ann_topk_blas(base, query, codebook, k=width, m=16)
    return _exact_rerank(base, query, cands, k=10)


def q_ann_ivfpq(spark, sf_dir):
    """IVF-PQ composite ANN (no-residual IVFPQ): the coarse quantizer
    (16 deterministic centroids, nprobe=4) prunes the corpus to 4
    inverted lists, then PQ asymmetric distance ranks only the survivors
    from their 8-byte code words.  Both parents are individually
    oracle-checked (q_ann_ivf, q_ann_pq); this id pins that composing
    them — the layout a 100 TB vector store actually ships — changes
    neither the probe set nor the ADC arithmetic.  The SQL oracle
    (_ANN_IVFPQ_SQL) reuses the PQ trainer CTE chain and adds the IVF
    assignment/probe CTEs as a candidate filter on the final ADC sum.

    NOTE — encode/storage-layout verification only: the raw 8x16 ADC
    top-10 has measured recall@10 = 0.0 on this near-uniform corpus
    (tracked per round in bench.py ann_recall@10).  For actual
    retrieval use q_ann_ivfpq_refine, which restores recall via a
    finer codebook's ADC top-100 + exact re-rank."""
    e = _embs(spark, sf_dir)
    base = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    centroids = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    train = base.filter(_h28(F.col("vec_id")) % 10 == 0)
    codebook = S.pq_train(train, m=8, k=16, iters=2)
    return S.ivfpq_ann_topk(
        base, query, centroids, codebook, k=10, nprobe=4
    )


def q_ann_ivfpq_blas(spark, sf_dir):
    """Arrow twin of q_ann_ivfpq (operators/similarity.py
    ivfpq_ann_topk_blas): BLAS coarse assignment with index-order
    accumulation + the fused encode/ADC kernel over the probed lists —
    candidate sets and 4-dp ADC distances match the declarative
    composite bit-for-bit, so it registers against the SAME
    _ANN_IVFPQ_SQL oracle; exact equality vs q_ann_ivfpq is pinned in
    tests/test_approx.py."""
    e = _embs(spark, sf_dir)
    base = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    centroids = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    train = base.filter(_h28(F.col("vec_id")) % 10 == 0)
    codebook = S.pq_train(train, m=8, k=16, iters=2)
    return S.ivfpq_ann_topk_blas(
        base, query, centroids, codebook, k=10, nprobe=4
    )


def q_ann_ivfpq_refine(spark, sf_dir):
    """IVF-PQ refine retrieval — the deployment-grade form of the
    billion-vector layout: coarse quantizer prunes to nprobe=4 lists,
    a 16x64 codebook's ADC ranks the survivors, keep the ADC top-100,
    exact e6-floored cosine re-rank of those 100.  Motivated by the
    round-9 bench record: q_ann_ivfpq's raw 8x16 ADC top-10 has
    recall@10 = 0.0 on this near-uniform corpus (same failure as raw
    PQ), while the probed lists DO contain the true top-10 (q_ann_ivf
    recall = 1.0) — so the recall loss is purely ADC quantization noise
    and the q_ann_pq_refine fix transfers: candidate-generate wider
    (top-100) from a finer codebook, then re-rank exactly.  At 100 TB
    the exact stage still touches only 100 rows; the scan shape is the
    composite's (partition-pruned code lists, broadcast ADC table).
    Fully deterministic, hash-checked against _ANN_IVFPQ_REFINE_SQL
    (the PQ CTE chain + IVF candidate filter + refine tail).  The raw
    q_ann_ivfpq path is encode/storage-layout verification only —
    retrieve via this id.  Recall tracked per round in bench.py
    (ann_recall@10: ivfpq raw vs ivfpq_refine)."""
    e = _embs(spark, sf_dir)
    base = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    centroids = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    train = base.filter(_h28(F.col("vec_id")) % 10 == 0)
    codebook = S.pq_train(train, m=16, k=64, iters=2)
    nprobe, width = _refine_knobs()
    cands = S.ivfpq_ann_topk_blas(
        base, query, centroids, codebook, k=width, nprobe=nprobe, m=16
    )
    return _exact_rerank(base, query, cands, k=10)


def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation composite — the north-star pipeline as ONE
    declarative plan: quality gate (token-count bounds + lexical
    diversity) → exact dedup (keep lowest doc_id per content hash) →
    deterministic hash split → per-split audit (docs, tokens).

    Because it is a single DataFrame expression, Catalyst fuses the gate
    into the scan (pushdown), the dedup is one shuffle on the content
    digest, and the split+audit is map-side arithmetic over the dedup
    output — three logical stages, one shuffle + one final aggregate
    physically.  At 100 TB each stage's shape is already proven by its
    standalone id (q_quality_score / q_doc_dedup / q_train_test_split);
    this pins that composing them does not introduce new shuffles."""
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    n_tok = F.size("toks")
    # integer-exact lexical-diversity gate (ttr >= 0.2 rewritten as
    # 5*distinct >= total): both engines compare exact integers, so no
    # float-boundary doc can flip between splits across testdata seeds
    diverse = F.size(F.array_distinct("toks")) * 5 >= n_tok
    gated = d.filter((n_tok >= 10) & (n_tok <= 500) & diverse).select(
        F.md5("text").alias("h"), "doc_id", n_tok.alias("n_tok")
    )
    kept = gated.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"), F.min("n_tok").alias("n_tok")
    )
    b = _h28(F.col("doc_id")) % 100
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return kept.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


def q_embed_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column: per-vector
    symmetric scale (maxabs/127), elements mapped by floor(x/scale + 0.5)
    — the storage/bandwidth step before shipping vectors to an ANN index
    (4 bytes → 1 byte per element).  Pure projection, zero shuffle; the
    rounding mode is pinned with floor(+0.5) so every engine agrees on
    half-way cases."""
    e = _embs(spark, sf_dir)
    v = F.col("embedding")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = maxabs / F.lit(127.0)
    q8 = F.when(maxabs == 0, F.transform(v, lambda x: F.lit(0).cast("bigint"))).otherwise(
        F.transform(v, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)))
    )
    return e.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.concat_ws(",", q8.cast("array<string>")).alias("q8"),
    )


# ------------------------------------------------------ text analysis

def q_token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(T.tokens("text")).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


def q_text_stats(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    n = F.count(F.lit(1))
    return d.groupBy("lang").agg(
        n.alias("n_docs"),
        (F.sum("n_chars").cast("double") / n).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum(F.size("toks")).cast("double") / n).alias("avg_tokens"),
    )


def q_quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.round(T.type_token_ratio(F.col("toks")), 4).alias("ttr"),
        F.round(T.mean_token_len(F.col("toks")), 4).alias("mean_tok_len"),
        T.quality_score(F.col("toks")).alias("score_e4"),
    )


def q_lang_id(spark, sf_dir):
    """Corpus-trained token-overlap language ID (deterministic heuristic):
    top-20 tokens per language by frequency → per-doc overlap → argmax."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", "lang", F.explode(T.tokens("text")).alias("tok"))
    tf = toks.groupBy(F.col("lang").alias("l2"), "tok").agg(F.count(F.lit(1)).alias("c"))
    w_rank = Window.partitionBy("l2").orderBy(F.col("c").desc(), "tok")
    top = tf.withColumn("rn", F.row_number().over(w_rank)).filter(F.col("rn") <= 20)
    score = (
        toks.join(F.broadcast(top.select("l2", "tok")), "tok")
        .groupBy("doc_id", "l2")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), "l2")
    pred = (
        score.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("l2").alias("pred_lang"))
    )
    return d.select("doc_id", F.col("lang").alias("true_lang")).join(
        pred, "doc_id"
    ).select(
        "doc_id",
        "pred_lang",
        "true_lang",
        (F.col("pred_lang") == F.col("true_lang")).cast("int").alias("is_correct"),
    )


def q_udf_text(spark, sf_dir):
    """Arrow-vectorized pandas UDF token count (the UDF-surface query)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", T.pandas_token_count()(F.col("text")).alias("tok_cnt"))


# ----------------------------------------------- pipeline curation ops

def _h28(col):
    """Portable doc-id hash for deterministic sampling (see functions/text
    hashing note): md5-derived 28-bit int, reproducible in any engine."""
    return T.base_hash28(col.cast("string"))


def q_sample_hash(spark, sf_dir):
    """Deterministic Bernoulli sample (10%) via portable hash — unlike
    rand() it is reproducible across runs/engines and is a pure scan-side
    filter: no shuffle, no state, trivially parallel at any scale."""
    d = _docs(spark, sf_dir)
    return d.filter(_h28(F.col("doc_id")) % 100 < 10).select(
        "doc_id", "lang", "source"
    )


def q_stratified_sample(spark, sf_dir):
    """Stratified (per-language) sampling rates — the domain-rebalance
    primitive of a training-data mix: minority strata keep a higher rate.
    Still a stateless scan-side filter."""
    d = _docs(spark, sf_dir)
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(40))
    return d.filter(_h28(F.col("doc_id")) % 100 < rate).select("doc_id", "lang")


def q_train_test_split(spark, sf_dir):
    """Deterministic train/valid/test assignment (80/10/10 hash buckets),
    audited as counts per (split, lang). Hash-bucket splits survive
    re-runs and dataset growth — rows never migrate between splits."""
    d = _docs(spark, sf_dir)
    b = _h28(F.col("doc_id")) % 100
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("valid")).otherwise(
            F.lit("test")
        )
    )
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_shard_assign(spark, sf_dir):
    """Output-shard assignment + balance audit: shard = hash % 8, per-shard
    doc count and total chars. This is the skew check a distributed
    training-shard writer runs before repartition(shard).write."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy((_h28(F.col("doc_id")) % 8).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_dup_rate_by_source(spark, sf_dir):
    """Per-source near-duplication rate: fraction of each source's docs
    that participate in ANY verified near-dup pair (q_neardup_verified's
    chain) — the report that tells a crawl operator WHICH feed is
    recycling content.  Pairs stay candidate-bounded; the rate lands in
    exact integer basis points."""
    d = _docs(spark, sf_dir)
    verified = q_neardup_verified(spark, sf_dir)
    dup_ids = (
        verified.select(F.col("id_a").alias("doc_id"))
        .unionAll(verified.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    flagged = d.select("doc_id", "source").join(dup_ids, "doc_id", "left")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("__dup"), F.lit(0))).alias("n_dup"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup",
            F.expr("(n_dup * 10000) DIV n_docs").alias("dup_rate_bp"),
        )
    )


def q_export_manifest(spark, sf_dir):
    """Dataset-release manifest: one row per output shard with doc count,
    byte budget, id range, and an ORDER-INDEPENDENT integer content
    checksum (sum of per-doc text hashes mod 2^40) — what a consumer
    verifies after copying a release, and what an incremental publisher
    diffs to find changed shards.  Commutative integer sum means the
    checksum is partitioning- and order-agnostic, so any engine/cluster
    layout reproduces it; one hash aggregate total."""
    d = _docs(spark, sf_dir)
    shard = (_h28(F.col("doc_id")) % 8).alias("shard")
    return d.groupBy(shard).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        (F.sum(T.base_hash28(F.col("text"))) % F.lit(1099511627776)).alias(
            "content_checksum"
        ),
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: drop corpus docs sharing any 5-token
    n-gram with the benchmark set (source='src0' stands in for the eval
    suite). Benchmark grams are small by construction → broadcast semi
    join; corpus side is one explode + one distinct, no pairwise work."""
    d = _docs(spark, sf_dir)
    sh = T.shingles(T.tokens("text"), 5)
    bench = (
        d.filter(F.col("source") == "src0")
        .select(F.explode_outer(sh).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    cand = (
        d.filter(F.col("source") != "src0")
        .select("doc_id", F.explode_outer(sh).alias("g"))
        .filter(F.col("g").isNotNull())
    )
    contaminated = (
        cand.join(F.broadcast(bench), "g", "left_semi").select("doc_id").distinct()
    )
    return (
        d.filter(F.col("source") != "src0")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang")
    )


def q_contamination_report(spark, sf_dir):
    """Decontamination AUDIT (the report a data owner reviews before the
    drop in q_decontaminate runs): for every benchmark doc (source='src0'),
    how many corpus docs share at least one 5-gram, and how many distinct
    5-grams are shared.  Benchmark grams broadcast (small by
    construction); the corpus side is one explode + distinct — identical
    scale shape to q_decontaminate, plus one small left join so
    uncontaminated benchmark docs report zeros instead of vanishing."""
    d = _docs(spark, sf_dir)
    sh = T.shingles(T.tokens("text"), 5)
    bg = (
        d.filter(F.col("source") == "src0")
        .select(F.col("doc_id").alias("bench_id"), F.explode_outer(sh).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    cg = (
        d.filter(F.col("source") != "src0")
        .select("doc_id", F.explode_outer(sh).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    hits = (
        cg.join(F.broadcast(bg), "g")
        .groupBy("bench_id")
        .agg(
            F.countDistinct("doc_id").alias("n_docs_hit"),
            F.countDistinct("g").alias("n_grams_hit"),
        )
    )
    bench_docs = d.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("bench_id")
    )
    return bench_docs.join(hits, "bench_id", "left").select(
        "bench_id",
        F.coalesce("n_docs_hit", F.lit(0)).alias("n_docs_hit"),
        F.coalesce("n_grams_hit", F.lit(0)).alias("n_grams_hit"),
    )


def q_ngram_novelty(spark, sf_dir):
    """Corpus novelty score (template/boilerplate detector): per doc, the
    fraction of its distinct 3-gram shingles that FIRST appear in that doc
    (first = lowest doc_id corpus-wide).  Low novelty late in the corpus
    marks recycled text.  r12 shape: one explode + distinct, then the
    per-gram first-doc as a WINDOW min over g and one doc-keyed agg —
    a single pass over the gram table.  The old groupBy(g) + join-back
    computed the explode+distinct subtree once per branch AND (at
    sf0.1's sizes) broadcast the entire gram vocabulary, which cannot
    fit at 100 TB; the window shuffles the gram table by g exactly once
    and holds one gram group at a time.  The ratio is integer/integer so
    both engines agree exactly, rounded 4 dp for display."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    g = (
        d.select("doc_id", F.explode_outer(T.shingles(T.tokens("text"), 3)).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    first = F.min("doc_id").over(Window.partitionBy("g"))
    per = (
        g.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint")).alias(
                "n_novel"
            ),
        )
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 4).alias(
            "novelty"
        ),
    )


def q_semdedup(spark, sf_dir):
    """Semantic dedup (SemDeDup, Abbas et al. 2023): cluster embeddings to
    the 16 deterministic centroids (vec_id < 16), drop the higher id of
    any within-cluster pair with cosine >= 0.92, keep the rest.  The
    pairwise stage is cluster-local (sum of |c|², never corpus-
    quadratic); assignment is a broadcast argmax — operators/
    similarity.py semdedup.  Oracle mirrors the assignment tie-break and
    the same sequential-fold cosine."""
    e = _embs(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    kept = S.semdedup(e, cent, threshold=0.92)
    return kept.select("vec_id", "centroid_id")


def q_semdedup_blas(spark, sf_dir):
    """Arrow/BLAS SemDeDup twin (similarity.semdedup_pandas): identical
    kept-set contract to q_semdedup — nearest-centroid assignment
    (lowest-id ties) then drop the higher id of any within-cluster pair
    with cosine >= 0.92 — computed as one assignment matmul per Arrow
    batch and one Gram matrix per cluster, the shape that survived the
    round-9 sf1 rehearsal at 2.3x growth where the declarative path's
    n*k interpreted assignment folds grew 45x.  The output is INTEGER
    (vec_id, centroid_id), so the q_semdedup oracle checks this path
    exactly; parity holds away from ulp-of-threshold/argmax boundaries
    (BLAS reorders sums), the same documented class as q_maxsim_blas —
    set equality with the declarative path is additionally pinned in
    tests/test_operators.py across both sf dirs and two k values."""
    e = _embs(spark, sf_dir)
    cent = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    kept = S.semdedup_pandas(e, cent, threshold=0.92)
    return kept.select("vec_id", "centroid_id")


def q_pii_scrub(spark, sf_dir):
    """PII redaction pass: email then digit-run regex rewrite over a
    synthesized contact string — stateless projection, Catalyst keeps it
    inside whole-stage codegen (no UDF)."""
    c = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.col("c_name"),
        F.lit(" <user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com>"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(contact, "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
        "[0-9]+",
        "<NUM>",
    )
    return c.select("c_custkey", scrub.alias("scrubbed"))


def q_unigram_logprob(spark, sf_dir):
    """Corpus-LM quality score: mean unigram negative log-likelihood per
    document — the classic cheap perplexity proxy used to filter training
    data (high avg NLL = out-of-distribution / noisy text).  Vocabulary is
    one token aggregate (bounded by the language, not the corpus — a few
    hundred thousand types at web scale), broadcast back onto the exploded
    token stream; the scalar corpus total rides along as a literal-free
    cross join of a 1-row aggregate."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(T.tokens("text")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n_total"))
    scored = tok.join(F.broadcast(vocab), "tok").crossJoin(F.broadcast(total))
    return scored.groupBy("doc_id").agg(
        F.round(
            F.avg(-F.log(F.col("c") / F.col("n_total"))), 4
        ).alias("avg_nll"),
        F.count(F.lit(1)).alias("n_tok"),
    )


def q_chunk_dedup(spark, sf_dir):
    """Chunk-level exact dedup: the 8-token/stride-6 training chunks
    (q_doc_chunks) grouped by content digest — duplicated chunks with
    their occurrence count and the min (doc_id, chunk_idx) keeper.  The
    sub-document twin of exact_dedup: one shuffle on the digest, uniform
    keys; at 100 TB this is how boilerplate shared across distinct
    documents gets removed."""
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks") - F.lit(2), F.lit(1)), F.lit(6)
    )
    chunks = d.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_idx", "s")
    ).select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("s"), 8)).alias("chunk"),
    )
    return (
        chunks.groupBy(F.md5("chunk").alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("k"),
        )
        .filter(F.col("n_occurrences") > 1)
        .select(
            "chunk_hash",
            "n_occurrences",
            F.col("k.doc_id").alias("keep_doc_id"),
            F.col("k.chunk_idx").alias("keep_chunk_idx"),
        )
    )


def q_mix_weights(spark, sf_dir):
    """Data-mixing weights: per-source resampling factor that rebalances
    the corpus to a uniform target mix (weight = target_share /
    corpus_share).  The one-aggregate step every training-mix pipeline
    runs before weighted sampling; the k-source count rides along from a
    1-row broadcast aggregate."""
    d = _docs(spark, sf_dir)
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = per_src.agg(
        F.sum("n_docs").alias("n_total"), F.count(F.lit(1)).alias("k")
    )
    return per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.round(
            F.col("n_total") / (F.col("k") * F.col("n_docs")), 4
        ).alias("weight"),
    )


def q_remove_dup_spans(spark, sf_dir):
    """Substring-level dedup with reconstruction (operators/dedup.py
    remove_dup_spans — the remove-the-span move of Lee et al. 2022,
    arXiv:2107.06499, adapted to non-overlapping 8-token blocks): keep
    only the corpus-wide first occurrence of any repeated block and
    re-assemble every document from its surviving blocks in order.
    Unlike q_chunk_dedup (reporting) this emits the cleaned corpus."""
    return D.remove_dup_spans(_docs(spark, sf_dir), block=8)

def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: Reciprocal Rank Fusion (Cormack et al. 2009) of
    the BM25 lexical top-20 and the dense cosine top-20 — the standard
    fusion step of a two-tower search stack.  rrf = sum over lists of
    1/(60+rank), absent-from-list contributing 0.  Both input lists are
    tiny (k rows) by the time fusion happens, so the full-outer join and
    final sort are driver-trivial at any corpus scale; the heavy lifting
    stays in the two underlying retrievers (shuffle-free BM25, heap-based
    cosine top-k).  Ranks are integers over hash-checked orderings and
    1/(60+r) is one correctly-rounded divide, so fusion is bit-exact."""
    from pyspark.sql import Window

    from kafkastreamsjavachallenge_spark.operators.retrieval import bm25_topk

    e = _embs(spark, sf_dir)
    query = e.filter(F.col("vec_id") == 0)
    dense = S.cosine_topk(e.filter(F.col("vec_id") != 0), query, k=20)
    wd = Window.orderBy(F.col("cos_sim").desc(), "vec_id")
    dense = dense.select(
        F.col("vec_id").alias("id"), F.row_number().over(wd).alias("rd")
    )
    d = _docs(spark, sf_dir).select("doc_id", T.tokens("text").alias("toks"))
    lex = bm25_topk(d, _BM25_TERMS, k=20)
    wl = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = lex.select(
        F.col("doc_id").alias("id"), F.row_number().over(wl).alias("rl")
    )
    fused = dense.join(lex, "id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("rd")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rl")), F.lit(0.0))
    return (
        fused.select("id", rrf.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), "id")
        .limit(10)
    )


def q_pca_project(spark, sf_dir):
    """PCA projection onto the top principal component, fitted by power
    iteration over a bounded deterministic sample (vec_id < 128, 3
    iterations, v0 = the exactly-representable 1/8 vector) — the
    dimensionality-reduction step before ANN indexing.  The whole fit is
    ONE 1-row aggregate of sequential folds (operators/similarity.py
    pca_top_component), so model cost is fixed by the sample at any
    corpus size; projection is per-row arithmetic under a broadcast
    1-row model.  Oracle unrolls the identical folds via
    list_reduce/list_prepend — bit-exact, not rows-only."""
    e = _embs(spark, sf_dir)
    model = S.pca_top_component(e, sample_max_id=128, iters=3)
    return S.pca_project(e, model)


def q_rp_project(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64 -> 16 dims in long form
    (operators/similarity.py rp_project): deterministic md5-derived
    projection matrix, per-row sequential-fold dot products, zero
    shuffles at any scale.  Oracle rebuilds the identical plane family
    and fold — hash-checked."""
    return S.rp_project(_embs(spark, sf_dir), out_dim=16, dim=64)


def q_bpe_tokenize(spark, sf_dir):
    """Real BPE tokenizer application (functions/text.py bpe_units): the
    fixed priority-ordered merge table rewrites each token's character
    units pair-by-pair, and the query reports per-document whitespace
    token count vs BPE unit count — the token-budget accounting every
    training pipeline does with its tokenizer config.

    Scale shape: the 12 chained merge folds run once per DISTINCT token
    type, not per occurrence — the vocabulary is bounded by the language
    (a few hundred thousand types at web scale) while occurrences are
    corpus-sized, so the expensive HOF chain touches |vocab| rows and
    broadcasts back onto the exploded token stream (the same
    aggregate-then-expand move as q_unigram_logprob / q_fuzzy_join).
    7x faster than the naive per-occurrence fold at sf0.1.  The oracle
    unrolls the identical 12 merge folds in DuckDB, so the op stays
    hash-checked end to end."""
    # r12 (guide §1.2): the tokenized corpus feeds THREE consumers (the
    # distinct-type vocabulary, the per-doc unit sum, and the final
    # n_tok projection) — Catalyst re-planned the scan+tokenize chain
    # per branch.  Checkpoint the narrow (doc_id, toks) projection
    # (text dropped) so the split runs once.
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", T.tokens("text").alias("toks"))
        .localCheckpoint(eager=False)
    )
    tok = d.select(
        "doc_id", F.explode(F.filter(F.col("toks"), lambda t: t != F.lit(""))).alias("tok")
    )
    types = (
        tok.select("tok")
        .distinct()
        .withColumn("n_units", F.size(T.bpe_units(F.col("tok"))))
    )
    per_doc = (
        tok.join(F.broadcast(types), "tok")
        .groupBy("doc_id")
        .agg(F.sum("n_units").cast("int").alias("__nb"))
    )
    # null text -> null count (matching the per-row fold's null semantics);
    # zero nonempty tokens -> 0 (no exploded rows survive the join)
    n_bpe = F.when(F.col("toks").isNull(), F.lit(None).cast("int")).otherwise(
        F.coalesce(F.col("__nb"), F.lit(0))
    )
    return (
        d.select("doc_id", "toks")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").alias("n_tok"),
            n_bpe.alias("n_bpe_units"),
        )
    )


def q_domain_cap_scaled(spark, sf_dir):
    """The hash-threshold scale path of the per-domain cap
    (operators/retrieval.py cap_domains_scaled): identical semantics to
    q_domain_cap — same oracle — but the per-domain rank sort only sees
    a bounded candidate set (uniform-hash threshold + exact fallback
    guard), so a hot domain can never serialize a corpus-sized window.
    Exposing both paths under one oracle lets the driver independently
    certify the equivalence."""
    from kafkastreamsjavachallenge_spark.operators.retrieval import (
        cap_domains_scaled,
    )

    return cap_domains_scaled(_docs(spark, sf_dir), cap=15)


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer TRAINING as one declarative Spark plan: learn the
    top-4 merge rules from the corpus (Sennrich et al. 2016) with no
    driver-side loop at all.  The corpus compresses to the word-frequency
    vocabulary first (classic BPE trains on (word, count), so pair
    statistics weigh by count and the working set is |vocab|, not corpus
    tokens); each round counts adjacent unit pairs, takes the argmax
    (count DESC, then lexicographic — total order), broadcasts the 1-row
    winner, and re-segments the vocab by folding the DYNAMIC rule (the
    same sequential fold as bpe_units, comparing against the broadcast
    rule columns instead of literals).  Four rounds unroll into one lazy
    plan: 4 × (pair agg + 1-row broadcast + fold), all integer counts —
    hash-exact.  Returns (round, a, b, pair_count)."""
    d = _docs(spark, sf_dir)
    vocab = (
        d.select(F.explode(T.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("u", F.split("tok", ""))
    )

    def pair_counts(v):
        z = F.zip_with(
            F.slice(F.col("u"), 1, F.size("u") - 1),
            F.slice(F.col("u"), 2, F.size("u") - 1),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        return (
            v.select("n", F.explode(z).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("pair_count"))
        )

    def apply_rule(v):
        # fold the broadcast (a, b) rule over each word's unit list
        merged = F.aggregate(
            F.col("u"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("a"))
                & (x == F.col("b")),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.col("a"), F.col("b"))),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        return v.withColumn("u", merged).drop("a", "b", "pair_count")

    out = None
    v = vocab
    for r in range(1, 5):
        best = (
            pair_counts(v)
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
        )
        step = best.withColumn("round", F.lit(r)).select(
            "round", "a", "b", "pair_count"
        )
        out = step if out is None else out.unionByName(step)
        v = apply_rule(v.crossJoin(F.broadcast(best)))
    return out


def q_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality score — the declarative analog of the
    KenLM/CCNet perplexity filter: train an add-one-smoothed bigram
    model ON the corpus (context counts + bigram counts + vocabulary
    size) and score every multi-token document by its mean conditional
    negative log-likelihood  avg_i −ln (c(a_i b_i)+1)/(c_ctx(a_i)+V).
    Bigrams come from zip_with over shifted slices (no self-join); the
    model joins are plain shuffle joins (the bigram table is
    vocabulary-sized, too big to assume broadcastable at web scale);
    only the 1-row vocabulary count broadcasts.  The per-document sum
    folds the position-sorted contribution list sequentially on both
    engines — the order-unspecified float-agg drift class cannot
    occur."""
    d = _docs(spark, sf_dir).select("doc_id", T.tokens("text").alias("t"))
    n1 = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("t", 1, n1),
        F.slice("t", 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    # posexplode_outer + null filter: plain posexplode makes
    # InferFiltersFromGenerate re-evaluate the pairs expression in an
    # unpushable pre-explode filter (DESIGN.md footgun (a))
    bg = (
        d.select("doc_id", F.posexplode_outer(pairs).alias("i", "p"))
        .filter(F.col("p").isNotNull())
        .select(
            "doc_id",
            (F.col("i") + 1).alias("i"),
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
        )
        # r12 (guide §1.2): bg feeds the bigram counts AND the scoring
        # probe side — checkpoint so the tokenize + zip_with + explode
        # chain runs once, not once per consumer
        .localCheckpoint(eager=False)
    )
    cab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    # r12 (guide §2.3): c(a) = Σ_b c(a,b) exactly — aggregate the
    # vocabulary-sized bigram table instead of a third corpus-sized
    # pass over bg (identical integers by construction)
    ctx = cab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vv = d.select(F.explode("t").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    contrib = -F.log(
        (F.col("c_ab") + F.lit(1)).cast("double")
        / (F.col("c_a") + F.col("v")).cast("double")
    )
    per = (
        bg.join(cab, ["a", "b"])
        .join(ctx, ["a"])
        .crossJoin(F.broadcast(vv))
        .select("doc_id", "i", contrib.alias("contrib"))
    )
    folded = per.groupBy("doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("i", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("s"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    return folded.select(
        "doc_id",
        F.round(F.col("s") / F.col("n_bigrams"), 4).alias("avg_nll"),
        "n_bigrams",
    )


def q_pack_sequences(spark, sf_dir):
    """Sequence packing: assign documents to fixed token-budget training
    bins (budget 512) by contiguous fill in deterministic doc_id order,
    packed independently per source (the parallel unit — each source's
    prefix sum is its own window partition, so packing scales with the
    number of shards, not one global sort).  bin = tokens-before / budget;
    a doc straddling a boundary belongs to the bin its first token falls
    in — the standard concat-then-split packing discipline."""
    budget = 512
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.size(T.tokens("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select(
        "source",
        "doc_id",
        "n_tok",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / budget)
        .cast("bigint")
        .alias("bin"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


# -------------------------------------------------------- multimodal

def q_multimodal_decode(spark, sf_dir):
    """The full multimodal decode path as a checked query: wrap text bytes
    as opaque media records (operators/multimodal.to_media), run the
    Arrow-batched mapInPandas decoder over size-bucketed partitions, and
    emit typed features.  The deterministic stand-in decoder derives
    (width, height) from payload length — so the ENTIRE plumbing (binary
    column handling, Arrow batch shape, repartitionByRange skew control,
    output schema) is hash-checked against SQL; a real codec swaps in via
    ``decoder=`` without touching the plan.  Cites reference scope: the
    reference has no media path; this is north-star surface."""
    from kafkastreamsjavachallenge_spark.operators.multimodal import (
        decode_media,
        to_media,
    )

    d = _docs(spark, sf_dir)
    media = to_media(d, "doc_id", "text", "image")
    return decode_media(media)


def q_binary_meta(spark, sf_dir):
    """Binary-column plumbing: byte length + content digest of the payload
    (stand-in for image/audio blobs; decode path lives in
    operators/multimodal.py)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.sha2(F.col("text").cast("binary"), 256).alias("digest"),
    )


_BM25_TERMS = ("spark", "window", "join")


def q_domain_cap(spark, sf_dir):
    """Per-domain document cap — the crawl-curation step that stops a
    single hot site from dominating the training mix (the `source` column
    stands in for the registrable domain).  Each domain keeps at most 15
    documents, chosen by a DETERMINISTIC hash order (md5 of the doc id),
    not arrival order, so re-runs and backfills select the identical
    subset.  One shuffle on the domain key.  At 100 TB the window sort
    serializes each hot domain onto one task; the scale remedy keeps the
    same semantics — because ranks come from a uniform hash, a first
    pass computes each mega-domain's cap-quantile hash threshold and
    filters by comparison, leaving the exact rank sort to the tiny
    remainder under the threshold.  (The all-domains-fit-in-one-window
    version here is the semantic spec both paths must match.)"""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        d.select("source", "doc_id", rk.alias("rk"))
        .filter(F.col("rk") <= 15)
    )


def q_bm25(spark, sf_dir):
    """BM25 top-10 retrieval for a fixed 3-term query (k1=1.2, b=0.75,
    Lucene's +1-inside-the-log idf) — the lexical-retrieval half of a
    RAG / data-selection stack.  With a bounded query vocabulary the
    whole computation is shuffle-free on the corpus side: per-document
    term frequencies are size(filter(...)) projections (no explode, no
    (doc, term) shuffle), the corpus statistics are ONE 1-row aggregate
    broadcast back, and the only corpus-sized operation left is
    TakeOrderedAndProject's per-partition top-10 heap — see
    operators/retrieval.py bm25_topk for the float-discipline notes."""
    from kafkastreamsjavachallenge_spark.operators.retrieval import bm25_topk

    d = _docs(spark, sf_dir).select("doc_id", T.tokens("text").alias("toks"))
    return bm25_topk(d, _BM25_TERMS, k=10)


def q_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-unigram distribution is.
    Target = the `src0` domain; features = 64 hash buckets over tokens
    (base_hash28 % 64); weight = sum_b c_b * (ln p_tgt(b) - ln p_raw(b))
    with add-one smoothing.  The two 64-row bucket models are corpus
    aggregates broadcast back onto per-document bucket counts, so the
    corpus shuffles once (doc x bucket agg) regardless of scale; the
    per-document sum folds a sorted bucket list SEQUENTIALLY on both
    engines so the round-3 unordered-float-agg drift class cannot occur
    (operators/retrieval.py dsir_logweights)."""
    from kafkastreamsjavachallenge_spark.operators.retrieval import dsir_logweights

    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", "source", F.explode(T.tokens("text")).alias("tok")
    )
    return dsir_logweights(tok, F.col("source") == "src0", n_buckets=64)


_TOKS = "string_split(trim(text), ' ')"
_H28_SQL = "('0x' || substr(md5({x}), 1, 7))::BIGINT"


def _bm25_sql(terms: tuple, k: int = 10) -> str:
    """DuckDB oracle for q_bm25, assembled per-term so the arithmetic
    expression tree (cast points, parenthesisation, fold order of the
    c0+c1+c2 sum) is textually in lockstep with the Spark expression."""
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"ln((CAST(n AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5) / "
        f"(CAST(df{i} AS DOUBLE) + 0.5) + 1.0) * "
        f"(CAST(tf{i} AS DOUBLE) * 2.2) / (CAST(tf{i} AS DOUBLE) + "
        f"1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / "
        f"(CAST(sdl AS DOUBLE) / n)))"
        for i in range(len(terms))
    )
    return (
        f"WITH t AS (SELECT doc_id, len(toks) AS dl, {tf_cols} "
        f"FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)), "
        f"st AS (SELECT count(*) AS n, sum(dl) AS sdl, {df_cols} FROM t) "
        f"SELECT doc_id, score FROM (SELECT doc_id, "
        f"round({contribs}, 4) AS score FROM t CROSS JOIN st) "
        f"WHERE score > 0 ORDER BY score DESC, doc_id LIMIT {k}"
    )


_BM25_SQL = _bm25_sql(_BM25_TERMS)


def _pca_sql(iters: int = 3) -> str:
    """DuckDB oracle for q_pca_project: the same sequential folds as
    pca_top_component/pca_project, unrolled per power-iteration step
    (list_prepend seeds the fold with the identical 0.0 / zero-vector
    inits Spark's F.aggregate uses)."""
    zeros = "list_transform(range(1, 65), i -> CAST(0.0 AS DOUBLE))"

    def vsum(lst):
        return (
            f"list_reduce(list_prepend({zeros}, {lst}), "
            f"(acc, x) -> list_transform(range(1, 65), i -> acc[i] + x[i]))"
        )

    def sdot(a, b):
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, 65), i -> {a}[i] * {b}[i])), "
            f"(acc, v) -> acc + v)"
        )

    sql = (
        "WITH s0 AS (SELECT list(list_transform(embedding, "
        "e -> CAST(e AS DOUBLE)) ORDER BY vec_id) AS xs "
        "FROM embeddings WHERE vec_id < 128), "
        f"s1 AS (SELECT xs, list_transform({vsum('xs')}, "
        "v -> v / CAST(len(xs) AS DOUBLE)) AS mu FROM s0), "
        "s2 AS (SELECT xs, mu, list_transform(xs, x -> "
        "list_transform(range(1,65), i -> x[i] - mu[i])) AS cx FROM s1), "
        "s3 AS (SELECT *, list_transform(range(1,65), "
        "i -> CAST(0.125 AS DOUBLE)) AS v0 FROM s2)"
    )
    prev = "s3"
    for t in range(iters):
        vt, vn = f"v{t}", f"v{t + 1}"
        scaled = (
            f"list_transform(list_zip(cx, list_transform(cx, "
            f"c -> {sdot('c', vt)})), "
            "z -> list_transform(z[1], ci -> z[2] * ci))"
        )
        sql += f", w{t} AS (SELECT *, {vsum(scaled)} AS w_{t} FROM {prev})"
        sql += (
            f", i{t} AS (SELECT *, list_transform(w_{t}, "
            f"wi -> wi / sqrt({sdot(f'w_{t}', f'w_{t}')})) AS {vn} "
            f"FROM w{t})"
        )
        prev = f"i{t}"
    centered = (
        "list_transform(range(1,65), "
        "i -> CAST(e.embedding[i] AS DOUBLE) - m.mu[i])"
    )
    sql += (
        f", m AS (SELECT mu, v{iters} AS pc FROM {prev}) "
        f"SELECT e.vec_id, round({sdot(centered, 'm.pc')}, 4) + 0 AS pc1 "
        "FROM embeddings e, m"
    )
    return sql


_PCA_SQL = _pca_sql(3)


def _bpe_fold_expr() -> str:
    """The 12 merge folds as one DuckDB expression over a token `t` —
    each rule one sequential left fold over the unit list (list_prepend
    of the empty accumulator mirrors Spark's F.aggregate init)."""
    from kafkastreamsjavachallenge_spark.functions.text import BPE_MERGES

    fold = "string_split(t, '')"
    for a, b in BPE_MERGES:
        fold = (
            "list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
            f"list_transform({fold}, c -> [c])), "
            f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '{a}' "
            f"AND x[1] = '{b}' THEN acc[1:len(acc)-1] || ['{a + b}'] "
            "ELSE acc || x END)"
        )
    return fold


def _bpe_sql() -> str:
    """DuckDB oracle for q_bpe_tokenize (identical 12 merge folds)."""
    fold = _bpe_fold_expr()
    return (
        f"WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents) "
        "SELECT doc_id, len(toks) AS n_tok, "
        "CAST(coalesce(list_sum(list_transform("
        f"list_filter(toks, t -> t <> ''), t -> len({fold}))), 0) AS BIGINT) "
        "AS n_bpe_units FROM d"
    )


_BPE_SQL = _bpe_sql()


def _bpe_train_sql(rounds: int = 4) -> str:
    """DuckDB oracle for q_bpe_train: the same vocabulary compression,
    weighted pair counts, (count DESC, a, b) argmax, and dynamic-rule
    fold, unrolled per round as chained CTEs."""
    fold = (
        "list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
        "list_transform(u, c -> [c])), "
        "(acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m{r}.a "
        "AND x[1] = m{r}.b THEN acc[1:len(acc)-1] || [m{r}.a || m{r}.b] "
        "ELSE acc || x END)"
    )
    sql = (
        "WITH v AS (SELECT tok, count(*) AS n FROM "
        f"(SELECT unnest({_TOKS}) AS tok FROM documents) "
        "WHERE tok <> '' GROUP BY tok), "
        "s0 AS (SELECT tok, n, string_split(tok, '') AS u FROM v)"
    )
    for r in range(1, rounds + 1):
        sql += (
            f", p{r} AS (SELECT pr[1] AS a, pr[2] AS b, sum(n) AS pair_count "
            f"FROM (SELECT n, unnest(list_zip(u[1:len(u)-1], u[2:len(u)])) "
            f"AS pr FROM s{r - 1}) WHERE pr[2] IS NOT NULL GROUP BY 1, 2), "
            f"m{r} AS (SELECT a, b, pair_count FROM p{r} "
            "ORDER BY pair_count DESC, a, b LIMIT 1), "
            f"s{r} AS (SELECT tok, n, " + fold.format(r=r)
            + f" AS u FROM s{r - 1} CROSS JOIN m{r})"
        )
    sql += " " + " UNION ALL ".join(
        f"SELECT {r} AS round, a, b, "
        f"CAST(pair_count AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return sql


_BPE_TRAIN_SQL = _bpe_train_sql(4)



_SHINGLES = (
    "list_distinct([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)])"
)
_HEXVAL = (
    "((strpos('0123456789abcdef', substr(m,1,1))-1)*4096 + "
    "(strpos('0123456789abcdef', substr(m,2,1))-1)*256 + "
    "(strpos('0123456789abcdef', substr(m,3,1))-1)*16 + "
    "(strpos('0123456789abcdef', substr(m,4,1))-1))"
)
_DOT = (
    "list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))"
)

# Universal-hash MinHash (mirrors functions/text.py MINHASH_A/B/P): base
# 28-bit md5-derived hash per shingle, then (a_s*v + b_s) mod 2^31-1 minima.
_MINHASH_A = "[1373158607, 239081664, 53710185, 1592467582, 590620972, 525901257, 479341424, 299655413]"
_MINHASH_B = "[906070220, 68252793, 63989047, 201209005, 469521477, 499635468, 1085242216, 1292825378]"
_MINHASH_SIG_CTE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents),
d AS (SELECT doc_id, {_SHINGLES} AS sh FROM t WHERE len(l) >= 3),
hv AS (SELECT doc_id, list_transform(sh, x -> ('0x' || substr(md5(x), 1, 7))::BIGINT) AS vs FROM d),
sig AS (SELECT doc_id,
  [list_min(list_transform(vs, v -> (({_MINHASH_A}[s+1])*v + ({_MINHASH_B}[s+1])) % 2147483647)) for s in range(0, {{nperm}})] AS sigl
FROM hv)
"""

# Sign-bit LSH mirrored in SQL: identical md5-derived hyperplanes per
# (plane, dim) cell.  Two schemes share the md5 cell formula:
#  - _LSH_BK_CTES: the coarse 8-plane BUCKET id (q_ann_batch's equi-join
#    key, Hamming-1 probe fan-out) — float planes hex4/65536 - 0.5 with
#    sequential-fold dots (list ops, so addition order matches Spark's
#    HOF fold);
#  - _ANN_LSH_CTES: the 192-bit SRP SIGNATURE + Hamming<=84 candidate
#    filter (q_ann_lsh / q_ann_frontier / q_rank_biased_overlap) — the
#    binary-sketch prefilter that replaced bucket probing in round 9
#    (bucket probing could not pass recall 0.5 at <=400 candidates on
#    this near-uniform corpus; signatures measure 1.0 at 244, sf0.1).
#    INTEGER planes (hex4 - 32768) against floor(vec*2^20): the sign dot
#    is exact on every engine in ANY accumulation order (products <=
#    2^36, sums <= 2^42 < 2^53), which is what lets the Spark side run
#    it as one BLAS matmul per Arrow batch while this oracle folds —
#    and still hash-match bit-for-bit.
_LSH_PLANES, _LSH_DIM = 8, 64
_SRP_BITS, _SRP_HAMT = 192, 84  # t = floor(0.4375 * bits)
_COSINE_TOPK_SQL = (
    "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0), "
    "n AS (SELECT sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS qnorm FROM q) "
    f"SELECT a.vec_id, round({_DOT} / "
    "(sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) * n.qnorm), 4) AS cos_sim "
    "FROM embeddings a, q, n WHERE a.vec_id <> 0 "
    "ORDER BY cos_sim DESC, a.vec_id LIMIT 10"
)

# (v, pl, bk): the md5-derived hyperplanes and every vector's sign-bit
# BUCKET (8 planes) — the batch retriever oracle's equi-join key
# (queries/corpus._ann_batch_sql)
_LSH_BK_CTES = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
    "FROM embeddings), "
    "pl AS (SELECT p.p, list(('0x' || substr(md5(p.p || '|' || i.i), 1, 4))"
    "::BIGINT / 65536.0 - 0.5 ORDER BY i.i) AS wv "
    f"FROM range(0, {_LSH_PLANES}) p(p) "
    f"CROSS JOIN range(0, {_LSH_DIM}) i(i) GROUP BY p.p), "
    "bk AS (SELECT v.vec_id, v.vec, "
    "CAST(sum(CASE WHEN list_sum(list_transform("
    f"range(1, {_LSH_DIM + 1}), i -> v.vec[i] * pl.wv[i])) >= 0 "
    "THEN (1::BIGINT << pl.p) ELSE 0 END) AS BIGINT) AS bucket "
    "FROM v CROSS JOIN pl GROUP BY v.vec_id, v.vec), "
)
# SRP signature CTEs: plf = the flat row-major INTEGER plane matrix
# (cell p*dim+i holds plane p component i as md5hex4 - 32768 — exactly
# similarity.srp_plane_ints); bk = every vector with its 192-bit sign
# signature packed into four 48-bit words (sign of the integer-quantized
# dot floor(vec*2^20)·plane — exact and order-independent on every
# engine, see srp_plane_ints); cand = vectors within Hamming 84 of the
# query's signature via bit_count(xor) over the words.  Downstream
# consumers (_ANN_LSH_SQL scoring, _rbo_sql, q_ann_frontier's count)
# read bk/qn/cand — same CTE contract as the retired bucket-probe
# version.
_SRP_WORD_BITS = 48
_SRP_WORDS = _SRP_BITS // _SRP_WORD_BITS
_ANN_LSH_CTES = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
    "FROM embeddings), "
    "vq AS (SELECT vec_id, vec, list_transform(vec, "
    "x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS iq FROM v), "
    "plf AS (SELECT list((('0x' || substr(md5("
    f"(t.t // {_LSH_DIM}) || '|' || (t.t % {_LSH_DIM})), 1, 4))"
    "::BIGINT - 32768) ORDER BY t.t) AS w "
    f"FROM range(0, {_SRP_BITS * _LSH_DIM}) t(t)), "
    "bk AS (SELECT vq.vec_id, vq.vec, "
    f"list_transform(range(0, {_SRP_WORDS}), wd -> "
    f"CAST(list_sum(list_transform(range(0, {_SRP_WORD_BITS}), j -> "
    f"CASE WHEN list_sum(list_transform(range(1, {_LSH_DIM + 1}), "
    f"i -> vq.iq[i] * plf.w[(wd * {_SRP_WORD_BITS} + j) * {_LSH_DIM} + i]"
    ")) >= 0 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT)) AS sw "
    "FROM vq CROSS JOIN plf), "
    "qb AS (SELECT sw, vec FROM bk WHERE vec_id = 0), "
    "qn AS (SELECT sqrt(list_sum(list_transform("
    f"range(1, {_LSH_DIM + 1}), i -> vec[i] * vec[i]))) AS qnorm, "
    "vec AS qv FROM qb), "
    "cand AS (SELECT b.vec_id, b.vec FROM bk b CROSS JOIN qb q "
    "WHERE b.vec_id <> 0 AND "
    f"list_sum(list_transform(range(1, {_SRP_WORDS + 1}), "
    "w -> bit_count(xor(b.sw[w], q.sw[w])))) "
    f"<= {_SRP_HAMT}) "
)
_ANN_LSH_SQL = (
    _ANN_LSH_CTES
    + "SELECT c.vec_id, round(list_sum(list_transform("
    f"range(1, {_LSH_DIM + 1}), i -> c.vec[i] * q.qv[i])) / "
    "(sqrt(list_sum(list_transform("
    f"range(1, {_LSH_DIM + 1}), i -> c.vec[i] * c.vec[i]))) * q.qnorm), 4) "
    "AS cos_sim FROM cand c CROSS JOIN qn q "
    "ORDER BY cos_sim DESC, c.vec_id LIMIT 10"
)

# PQ ANN mirrored in SQL: per-subspace k-means unrolled (2 iterations,
# same lowest-id init / struct-min tie-break / index-ordered mean
# re-pack as the Spark trainer), then encode + query distance table +
# ADC sum.  All assignment outputs are integers; the ADC sum rounds to
# 4 dp on both sides.  Caveat: centroid means (avg) are float group-
# aggregations with unspecified accumulation order on BOTH engines, so
# parity holds away from rounding/argmin boundaries, not bit-for-bit;
# the per-row list folds (l2, dot) ARE order-pinned.
_PQ_M, _PQ_K, _PQ_ITERS, _PQ_SUB = 8, 16, 2, 8


def _pq_l2(a, b, sub=None):
    # (x-y)*(x-y), not (x-y)**2: DuckDB's ** is libm pow, which differs
    # from the correctly-rounded product by 1 ulp for ~2% of doubles —
    # enough to flip an argmin when two centroids are near-equidistant.
    # Spark's l2_sq multiplies, so the oracle must multiply too.
    return (
        f"list_sum(list_transform(range(1, {(sub or _PQ_SUB) + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_sql(ivf_nprobe=None, m=None, k=None, refine=None):
    """PQ ADC oracle; with ``ivf_nprobe`` set, adds the IVF coarse-
    quantizer CTEs (same centroid set / tie-breaks as _ANN_IVF_SQL) and
    restricts the final ADC sum to vectors in the probed lists — the
    IVF-PQ composite.  Encoding stays corpus-wide on both engines (codes
    are per-vector deterministic, so restricting before or after encode
    yields identical candidate distances).  ``m``/``k`` override the
    default codebook geometry; ``refine`` switches the tail to the
    FAISS-style refine contract — ADC-rank the corpus, keep the top
    ``refine`` candidates (ORDER BY adc, vec_id — deterministic), then
    EXACT e6-floored cosine re-rank of the survivors (zero-norm rows
    excluded on both engines, the q_embed_norm_audit lesson)."""
    m = m or _PQ_M
    k = k or _PQ_K
    sub = 64 // m
    s = (
        "WITH v AS (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
        "FROM embeddings), "
        "base AS (SELECT * FROM v WHERE vec_id <> 0), "
        "q AS (SELECT * FROM v WHERE vec_id = 0), "
        "subs AS (SELECT vec_id, s.s AS sub, "
        f"vec[s.s*{sub}+1 : s.s*{sub}+{sub}] AS sv "
        f"FROM base CROSS JOIN range(0, {m}) s(s)), "
        # sample-train mirror: codebook iterations see only the ~10%
        # hash-sampled vectors, encode/probe see all of them
        "tsubs AS (SELECT s.* FROM subs s WHERE "
        f"{_H28_SQL.format(x='CAST(s.vec_id AS VARCHAR)')} % 10 = 0), "
        "cb0 AS (SELECT sub, row_number() OVER "
        "(PARTITION BY sub ORDER BY vec_id) - 1 AS code, sv AS cvec "
        "FROM (SELECT * FROM tsubs QUALIFY row_number() OVER "
        f"(PARTITION BY sub ORDER BY vec_id) <= {k}))"
    )
    prev = "cb0"
    for it in range(1, _PQ_ITERS + 1):
        s += (
            f", a{it} AS (SELECT s.vec_id, s.sub, s.sv, "
            f"(min(struct_pack(d := {_pq_l2('s.sv', 'c.cvec')}, c := c.code))).c "
            f"AS code FROM tsubs s JOIN {prev} c ON s.sub = c.sub "
            "GROUP BY s.vec_id, s.sub, s.sv), "
            f"m{it} AS (SELECT a.sub, a.code, t.i, avg(a.sv[t.i]) AS m "
            f"FROM a{it} a CROSS JOIN range(1, {sub + 1}) t(i) "
            "GROUP BY a.sub, a.code, t.i), "
            f"cb{it} AS (SELECT c.sub, c.code, coalesce(n.cvec, c.cvec) AS cvec "
            f"FROM {prev} c LEFT JOIN (SELECT sub, code, "
            f"list(m ORDER BY i) AS cvec FROM m{it} GROUP BY sub, code) n "
            "ON c.sub = n.sub AND c.code = n.code)"
        )
        prev = f"cb{it}"
    s += (
        ", enc AS (SELECT s.vec_id, s.sub, "
        f"(min(struct_pack(d := {_pq_l2('s.sv', 'c.cvec', sub)}, c := c.code))).c "
        f"AS code FROM subs s JOIN {prev} c ON s.sub = c.sub "
        "GROUP BY s.vec_id, s.sub, s.sv), "
        "qsubs AS (SELECT s.s AS sub, "
        f"vec[s.s*{sub}+1 : s.s*{sub}+{sub}] AS sv "
        f"FROM q CROSS JOIN range(0, {m}) s(s)), "
        f"dtab AS (SELECT c.sub, c.code, {_pq_l2('qs.sv', 'c.cvec', sub)} AS d "
        f"FROM qsubs qs JOIN {prev} c ON qs.sub = c.sub)"
    )
    cand_where = ""
    if ivf_nprobe is not None:
        # coarse quantizer mirror (same CTE shapes as _ANN_IVF_SQL):
        # centroids = vec_id < 16, argmax-cosine with lowest-cid
        # tie-break, nprobe nearest lists to the query
        s += (
            ", cent AS (SELECT vec_id AS cid, vec AS cvec "
            "FROM v WHERE vec_id < 16), "
            "assignedc AS (SELECT b.vec_id, "
            f"(min(struct_pack(s := -{_ivf_cos('b.vec', 'c.cvec')}, "
            "c := c.cid))).c AS cid "
            "FROM base b CROSS JOIN cent c GROUP BY b.vec_id, b.vec), "
            "probes AS (SELECT c.cid FROM cent c CROSS JOIN q "
            f"ORDER BY {_ivf_cos('q.vec', 'c.cvec')} DESC, c.cid "
            f"LIMIT {ivf_nprobe}), "
            "cand AS (SELECT a.vec_id FROM assignedc a "
            "WHERE a.cid IN (SELECT cid FROM probes))"
        )
        cand_where = "WHERE e.vec_id IN (SELECT vec_id FROM cand) "
    if refine is None:
        s += (
            " SELECT e.vec_id, round(sum(t.d), 4) AS adc_dist "
            "FROM enc e JOIN dtab t ON e.sub = t.sub AND e.code = t.code "
            f"{cand_where}"
            "GROUP BY e.vec_id ORDER BY adc_dist, e.vec_id LIMIT 10"
        )
        return s
    dot_bq = (
        "list_sum(list_transform(range(1, 65), "
        "i -> b.vec[i] * qq.vec[i]))"
    )
    nrm_b = (
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> b.vec[i] * b.vec[i])))"
    )
    s += (
        ", adc AS (SELECT e.vec_id, round(sum(t.d), 4) AS adc_dist "
        "FROM enc e JOIN dtab t ON e.sub = t.sub AND e.code = t.code "
        f"{cand_where}"
        f"GROUP BY e.vec_id ORDER BY adc_dist, e.vec_id LIMIT {refine}), "
        "qn2 AS (SELECT vec, sqrt(list_sum(list_transform(range(1, 65), "
        "i -> vec[i] * vec[i]))) AS qnorm FROM q) "
        "SELECT a.vec_id, CAST(floor("
        f"{dot_bq} / ({nrm_b} * qq.qnorm) * 1000000) AS BIGINT) AS cos_e6 "
        "FROM adc a JOIN base b ON a.vec_id = b.vec_id "
        "CROSS JOIN qn2 qq "
        f"WHERE {nrm_b} > 0 AND qq.qnorm > 0 "
        "ORDER BY cos_e6 DESC, a.vec_id LIMIT 10"
    )
    return s


_ANN_PQ_SQL = _pq_sql()
_ANN_PQ_REFINE_SQL = _pq_sql(m=16, k=64, refine=100)

# IVF ANN mirrored in SQL: identical centroid set (vec_id < 16),
# identical argmax-cosine assignment with lowest-cid tie-break
# (struct-min over (-cos, cid)), nprobe=4 probed lists, exact cosine
# top-10 over the candidates.  Same sequential-fold list arithmetic.
_IVF_DOT = (
    "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
)


def _ivf_cos(a, b):
    d = _IVF_DOT.format(a=a, b=b)
    na = f"sqrt({_IVF_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_IVF_DOT.format(a=b, b=b)})"
    return f"({d} / ({na} * {nb}))"


_ANN_IVF_CTES = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
    "FROM embeddings), "
    "cent AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < 16), "
    "base AS (SELECT * FROM v WHERE vec_id <> 0), "
    "q AS (SELECT vec AS qv FROM v WHERE vec_id = 0), "
    "assigned AS (SELECT b.vec_id, b.vec, "
    f"(min(struct_pack(s := -{_ivf_cos('b.vec', 'c.cvec')}, c := c.cid))).c "
    "AS cid FROM base b CROSS JOIN cent c GROUP BY b.vec_id, b.vec), "
    "probes AS (SELECT c.cid FROM cent c CROSS JOIN q "
    f"ORDER BY {_ivf_cos('q.qv', 'c.cvec')} DESC, c.cid LIMIT 4), "
    "cand AS (SELECT a.vec_id, a.vec FROM assigned a "
    "WHERE a.cid IN (SELECT cid FROM probes)) "
)
_ANN_IVF_SQL = (
    _ANN_IVF_CTES
    + f"SELECT c.vec_id, round({_ivf_cos('c.vec', 'q.qv')}, 4) AS cos_sim "
    "FROM cand c CROSS JOIN q ORDER BY cos_sim DESC, c.vec_id LIMIT 10"
)

# IVF-PQ composite oracle: the PQ CTE chain + the IVF candidate filter
# (built here, after _ivf_cos exists — _pq_sql resolves it at call time)
_ANN_IVFPQ_SQL = _pq_sql(ivf_nprobe=4)
# IVF-PQ refine oracle: the composite above with the 16x64 codebook and
# the FAISS-refine tail (ADC top-100 over the probed lists, exact
# e6-cosine re-rank)
_ANN_IVFPQ_REFINE_SQL = _pq_sql(ivf_nprobe=4, m=16, k=64, refine=100)

# SemDeDup mirrored in SQL: same broadcast-argmax assignment tie-break as
# IVF (struct-min over (-cos, cid)), then within-cluster pairs only, drop
# the higher id of any pair with cosine >= 0.92 — same sequential-fold
# cosine as the Spark side.
_SEMDEDUP_SQL = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
    "FROM embeddings), "
    "cent AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < 16), "
    "assigned AS (SELECT b.vec_id, b.vec, "
    f"(min(struct_pack(s := -{_ivf_cos('b.vec', 'c.cvec')}, c := c.cid))).c "
    "AS cid FROM v b CROSS JOIN cent c GROUP BY b.vec_id, b.vec), "
    "dup AS (SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b "
    "ON a.cid = b.cid AND a.vec_id < b.vec_id "
    f"WHERE {_ivf_cos('a.vec', 'b.vec')} >= 0.92) "
    "SELECT vec_id, cid AS centroid_id FROM assigned "
    "WHERE vec_id NOT IN (SELECT vec_id FROM dup)"
)

# Lloyd's k-means (k=8, 3 iterations) unrolled as chained CTEs — same
# construction as operators/similarity.py kmeans (parity away from
# rounding boundaries; centroid means are order-unspecified float aggs
# on both engines): init = lowest-id vectors,
# assignment argmin breaks distance ties on the lowest centroid id
# (struct-min lexicographic), update = per-(cid, dim) mean re-packed in
# index order, empty clusters keep the previous centroid.
_KM_K, _KM_ITERS, _KM_DIM = 8, 3, 64


def _km_l2(a, c):
    # multiply instead of ** for the same ulp-exactness reason as _pq_l2
    return (
        f"list_sum(list_transform(range(1, {_KM_DIM + 1}), "
        f"i -> (CAST({a}[i] AS DOUBLE) - {c}[i]) * (CAST({a}[i] AS DOUBLE) - {c}[i])))"
    )


# CTE prefix shared by q_kmeans and q_topic_labels: iterations unrolled,
# final assignment relation = a{_KM_ITERS}(vec_id, cid)
_KMEANS_CTES = (
    "WITH v AS (SELECT vec_id, "
    "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
    "FROM embeddings), "
    "c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, "
    f"vec AS cvec FROM (SELECT * FROM v ORDER BY vec_id LIMIT {_KM_K}))"
    + "".join(
        f", a{it} AS (SELECT v.vec_id, "
        f"(min(struct_pack(d := {_km_l2('v.vec', 'c.cvec')}, c := c.cid))).c "
        f"AS cid FROM v CROSS JOIN c{it - 1} c GROUP BY v.vec_id), "
        f"m{it} AS (SELECT a.cid, t.i, avg(v.vec[t.i]) AS m "
        f"FROM a{it} a JOIN v USING (vec_id) "
        f"CROSS JOIN range(1, {_KM_DIM + 1}) t(i) GROUP BY a.cid, t.i), "
        f"c{it} AS (SELECT c.cid, coalesce(n.cvec, c.cvec) AS cvec "
        f"FROM c{it - 1} c LEFT JOIN (SELECT cid, list(m ORDER BY i) AS cvec "
        f"FROM m{it} GROUP BY cid) n ON c.cid = n.cid)"
        for it in range(1, _KM_ITERS + 1)
    )
)

_KMEANS_SQL = (
    _KMEANS_CTES
    + f" SELECT cid AS centroid_id, count(*) AS n FROM a{_KM_ITERS} "
    "GROUP BY cid ORDER BY cid"
)

_TOPIC_LABELS_SQL = (
    _KMEANS_CTES
    + f", asg AS (SELECT vec_id AS doc_id, cid FROM a{_KM_ITERS}), "
    "tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term "
    "FROM documents), "
    "tf AS (SELECT g.cid, t.term, count(*) AS tf FROM tok t "
    "JOIN asg g USING (doc_id) GROUP BY g.cid, t.term), "
    "dfr AS (SELECT term, count(*) AS dfc FROM tf GROUP BY term), "
    "scored AS (SELECT cid AS centroid_id, term, "
    f"round(tf * ln({_KM_K}.0 / dfc), 6) AS score "
    "FROM tf JOIN dfr USING (term)) "
    "SELECT centroid_id, term, score, rn FROM (SELECT centroid_id, term, "
    "score, row_number() OVER (PARTITION BY centroid_id "
    "ORDER BY score DESC, term) AS rn FROM scored) WHERE rn <= 3"
)


# --------------------------------------- weighted selection / release ops

def q_ann_recall(spark, sf_dir):
    """Recall@10 audit of the ANN indexes against the exact scan — the
    eval a retrieval deployment runs before trusting an index (and after
    every index rebuild).  Because every retriever here is
    deterministic (md5 hyperplanes / lowest-id centroids), recall is an
    exact integer, so even the EVALUATION is oracle-checked.  Cost: the
    exact scan plus three index retrievals (LSH, IVF, IVF-PQ) and three
    semi-joins on 10-row sets."""
    # 10-row exact top-k referenced by all three method branches —
    # materialize once instead of re-running the exact corpus scan per
    # semi-join (the q_ann_ndcg / q_dedup_recall shared-subtree lesson)
    exact = q_cosine_topk(spark, sf_dir).select("vec_id").localCheckpoint(
        eager=True
    )

    def hits(df, name):
        return (
            df.select("vec_id")
            .join(exact, "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
            .select(
                F.lit(name).alias("method"),
                "hits",
                (F.col("hits") * 1000).alias("recall_bp"),
            )
        )

    return (
        hits(q_ann_lsh(spark, sf_dir), "lsh")
        .unionByName(hits(q_ann_ivf(spark, sf_dir), "ivf"))
        .unionByName(hits(q_ann_ivfpq(spark, sf_dir), "ivfpq"))
    )


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility audit: BPE units per whitespace word, by
    language — THE metric for judging how a tokenizer treats each
    language in a multilingual corpus (high fertility = more compute per
    word = under-served language).  Reuses the type-level BPE trick
    (fold once per distinct token, broadcast counts back); the ratio is
    emitted in exact integer basis points (DIV), so the oracle compares
    integers."""
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    tok = d.select(
        "lang",
        F.explode(F.filter(F.col("toks"), lambda t: t != F.lit(""))).alias("tok"),
    )
    types = (
        tok.select("tok")
        .distinct()
        .withColumn("n_units", F.size(T.bpe_units(F.col("tok"))))
    )
    return (
        tok.join(F.broadcast(types), "tok")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_units").cast("bigint").alias("n_units"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_units",
            F.expr("(n_units * 10000) DIV n_tokens").alias("fertility_e4"),
        )
    )


def q_maxsim(spark, sf_dir):
    """MaxSim late-interaction scoring (ColBERT, Khattab & Zaharia 2020):
    a multi-vector query Q scores a multi-vector document G as
    sum over q in Q of max over d in G of cos(q, d) — token-level
    matching that single-vector cosine cannot express.  Query set =
    label-0 vectors; every other label plays a document's token bag.

    Scale shape: the query block broadcasts (|Q| vectors), per-vector
    norms are hoisted into the join branches, the per-(doc, q) max is a
    map-side-combinable hash aggregate and the doc score one more —
    nothing corpus-sized shuffles, and at 100 TB the doc side would
    carry an ANN pre-filter so MaxSim reranks candidates only.  Each max
    is floored to e6 fixed-point BEFORE the sum so the cross-engine
    comparison is integer-exact (float-sum order never enters the
    hash)."""
    from kafkastreamsjavachallenge_spark.functions.vector import dot, norm

    e = _embs(spark, sf_dir)
    q = e.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        norm(F.col("embedding")).alias("__qn"),
    )
    d = e.filter(F.col("label") > 0).select(
        F.col("label").alias("doc_label"),
        F.col("embedding").alias("dv"),
        norm(F.col("embedding")).alias("__dn"),
    )
    cos = dot(F.col("dv"), F.col("qv")) / (F.col("__dn") * F.col("__qn"))
    per_q = (
        d.crossJoin(F.broadcast(q))
        .groupBy("doc_label", "q_id")
        .agg(F.max(cos).alias("best"))
    )
    return per_q.groupBy("doc_label").agg(
        F.sum(F.floor(F.col("best") * 1000000).cast("bigint")).alias("maxsim_e6"),
        F.count(F.lit(1)).alias("n_query_vecs"),
    )


def q_maxsim_blas(spark, sf_dir):
    """MaxSim via the Arrow/BLAS escape hatch (operators/retrieval.py
    maxsim_pandas): identical arithmetic to q_maxsim — sum over query
    vectors of the per-document-group max cosine — computed as ONE numpy
    matmul per group instead of a 64-dim interpreted fold per (doc, q)
    pair.  This is the headline BENCH entry for late interaction
    (round-7 VERDICT item 2: the declarative fold was 10% of headline
    wall-time with 45% run-to-run spread); q_maxsim stays registered as
    the integer-exact oracle twin and the two paths are
    equivalence-tested at 1e-9 relative in tests/test_operators.py.

    Cross-engine check: BLAS reorders float summation, so the e6-floor
    integer surface of q_maxsim would flip on final-ulp differences.
    The contract here rounds the SCORE to e2 after a deterministic
    +1e-9 nudge applied identically on BOTH engines (round-8 ADVICE):
    ulp-scale deviations (~1e-12 absolute on a sum of ~199 cosines)
    flip an e2 rounding only when the exact sum lies within ~1e-12 of
    a grid point, and data-derived sums cluster near NATURAL decimal
    boundaries (x.xx5), not near the shifted boundary x.xx5 - 1e-9 —
    so the nudge moves the rounding cliff off every value the corpus
    can plausibly produce instead of betting on measure-zero odds.
    DuckDB computes the exact sequential sum and applies the same
    nudge+round, so the row hash-matches iff the BLAS values are
    pointwise within rounding of the exact ones.  (If a fuzz seed ever
    DOES red this id with all values agreeing to ~1e-9, that is grid
    noise at the shifted boundary, not a correctness break.)

    Driver-side materialization: the 199-vector query block (label 0)
    is collected to ship inside the pandas closure — bounded by the
    label-0 filter (|Q| x 64 floats, ~100 KB), the same bounded-scalar
    class as the IVF probe lists; at 100 TB the query set is still a
    query set.  Sorted by vec_id so the numpy sum order is
    deterministic."""
    from kafkastreamsjavachallenge_spark.operators.retrieval import maxsim_pandas

    e = _embs(spark, sf_dir)
    qvecs = [
        list(r["embedding"])
        for r in e.filter(F.col("label") == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
        if r["embedding"] is not None
    ]
    if not qvecs:
        # empty-query-set guard (fresh deployment / empty table): no
        # scores to compute, return the empty result with the schema
        return spark.createDataFrame(
            [], "doc_label bigint, maxsim_r2 double, n_query_vecs int"
        )
    scored = maxsim_pandas(e.filter(F.col("label") > 0), qvecs, group_col="label")
    return scored.select(
        "doc_label",
        F.round(F.col("maxsim") + F.lit(1e-9), 2).alias("maxsim_r2"),
        "n_query_vecs",
    )


def q_fasttext_score(spark, sf_dir):
    """Linear text-classifier inference — the fastText-style quality
    filter every web-scale curation pipeline runs (CCNet, RefinedWeb):
    hashed bigram features, a sparse dot with a fixed weight table, keep
    iff the margin is non-negative.  The weight table here is derived
    deterministically from the feature hash (model weights are CONFIG,
    exactly like the BPE merge table — a trained model ships the same
    shape), so the DuckDB oracle computes the identical integer margins.

    Scale shape: pure scan-side inference — one md5 per bigram occurrence
    inside a per-row fold, zero shuffles, embarrassingly parallel; the
    expensive part of a real deployment (training) never touches the
    corpus scan."""
    d = _docs(spark, sf_dir)
    # NULL-total: coalesce text to '' so a NULL row yields n_feat=0,
    # margin=0, keep=1 — matching the oracle (DuckDB greatest() ignores
    # NULLs, list_sum([]) is coalesced to 0).  Fixture text is non-null;
    # this pins behavior only for out-of-contract inputs (ADVICE r04).
    toks = T.tokens(F.coalesce(F.col("text"), F.lit("")))
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bgs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    weight = lambda g: (T.base_hash28(g) % 1024) % 21 - 10
    margin = F.aggregate(
        F.transform(F.col("bgs"), weight),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        d.withColumn("bgs", bgs)
        .select(
            "doc_id",
            F.size("bgs").alias("n_feat"),
            margin.alias("margin"),
            (margin >= 0).cast("int").alias("keep"),
        )
    )


def q_priority_sample(spark, sf_dir):
    """Priority sampling (Duffield-Lund-Thorup): weight-proportional
    top-k without replacement — priority q_i = w_i / u_i with a
    hash-derived uniform u_i, keep the k highest, and the (k+1)-th
    priority tau yields the unbiased per-item estimator max(w_i, tau).
    The production use: pick a token-budget-weighted subset of a corpus
    deterministically (re-runs and engines agree on the exact sample).

    Scale shape: priority is a scan-side projection (two IEEE ops:
    w * 2^28 then / (h+1), identically ordered in the oracle so the
    doubles are bit-equal), and top-(k+1) is TakeOrderedAndProject — a
    per-partition heap + driver merge of k+1 rows, never a global sort.
    The rank window runs over the 51 surviving rows only."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    h = T.base_hash28(F.col("doc_id").cast("string"))
    prio = (F.col("n_chars").cast("double") * F.lit(268435456.0)) / (
        h + F.lit(1)
    ).cast("double")
    top = (
        d.select("doc_id", F.col("n_chars").alias("weight"), prio.alias("prio"))
        .orderBy(F.col("prio").desc(), "doc_id")
        .limit(51)
    )
    w = Window.orderBy(F.col("prio").desc(), "doc_id")
    ranked = top.withColumn("rn", F.row_number().over(w))
    tau = ranked.filter(F.col("rn") == 51).select(F.col("prio").alias("tau"))
    return (
        ranked.filter(F.col("rn") <= 50)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id",
            "weight",
            F.round("prio", 4).alias("priority"),
            F.round(F.greatest(F.col("weight").cast("double"), F.col("tau")), 4).alias(
                "est_weight"
            ),
        )
    )


def q_dataset_diff(spark, sf_dir):
    """Release diff audit: compare two dataset versions by content digest
    and classify every document as removed / changed / unchanged (the
    general full-outer shape also yields `added`).  v2 here is the
    curated release derived from v1: short docs dropped, digit runs
    redacted.  At 100 TB the compare joins 16-byte md5 digests, never
    the bodies — one equi-join on doc_id, counts rolled up per source."""
    d = _docs(spark, sf_dir)
    v1 = d.select("doc_id", "source", F.md5("text").alias("h1"))
    v2 = d.filter(F.col("n_chars") >= 100).select(
        "doc_id",
        F.md5(F.regexp_replace("text", "[0-9]+", "<NUM>")).alias("h2"),
    )
    status = (
        F.when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") == F.col("h2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        v1.join(v2, "doc_id", "left")
        .groupBy("source", status.alias("status"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_curriculum(spark, sf_dir):
    """Curriculum phase assignment: per-language quality quartiles
    (ntile over the integer quality score) -> per-phase token budget.
    Partitioning the window BY LANGUAGE keeps the sort per-group (no
    global single-partition sort); at corpus scale the same result comes
    from broadcast quantile cutpoints, but the windowed form is the
    exact-deterministic one (total order pinned by (score, doc_id))."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    scored = d.select(
        "doc_id", "lang", F.size("toks").alias("n_tok"),
        T.quality_score(F.col("toks")).alias("score_e4"),
    )
    # NULLS LAST on both sides: Spark ASC defaults NULLS FIRST, DuckDB
    # NULLS LAST — fixture text is non-null so this is a pin for
    # out-of-contract inputs only (ADVICE r04, q_fasttext_score class)
    w = Window.partitionBy("lang").orderBy(
        F.col("score_e4").asc_nulls_last(), "doc_id"
    )
    phased = scored.withColumn("phase", F.ntile(4).over(w))
    return phased.groupBy("lang", "phase").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min("score_e4").alias("min_score"),
        F.max("score_e4").alias("max_score"),
    )


_NEARDUP_VERIFIED_SQL = (
    _MINHASH_SIG_CTE.format(nperm=8)
    + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
    "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
    "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
    "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id) "
    "SELECT * FROM (SELECT p.id_a, p.id_b, "
    "round(len(list_intersect(da.sh, db.sh)) / len(list_distinct(da.sh || db.sh)), 4) "
    "AS jaccard FROM pairs p JOIN d da ON da.doc_id = p.id_a "
    "JOIN d db ON db.doc_id = p.id_b) WHERE jaccard >= 0.5"
)


# the add-one bigram-LM oracle, shared by q_bigram_logprob and the
# perplexity bucketing built on it (nested as a FROM-subquery there —
# DuckDB scopes CTEs per subquery, same trick as q_ann_recall)
_BIGRAM_NLL_SQL = (
    f"WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents), "
    "bg AS (SELECT doc_id, i, t[i] AS a, t[i + 1] AS b FROM "
    "(SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM d "
    "WHERE len(t) >= 2)), "
    "cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2), "
    "ctx AS (SELECT a, count(*) AS c_a FROM bg GROUP BY 1), "
    "vv AS (SELECT count(DISTINCT tok) AS v FROM "
    "(SELECT unnest(t) AS tok FROM d)), "
    "per AS (SELECT doc_id, i, -ln(CAST(c_ab + 1 AS DOUBLE) / "
    "CAST(c_a + v AS DOUBLE)) AS contrib FROM bg "
    "JOIN cab USING (a, b) JOIN ctx USING (a) CROSS JOIN vv) "
    "SELECT doc_id, round(list_reduce(list_prepend("
    "CAST(0.0 AS DOUBLE), list(contrib ORDER BY i)), "
    "(x, y) -> x + y) / count(*), 4) AS avg_nll, "
    "count(*) AS n_bigrams FROM per GROUP BY doc_id"
)


# ---------------------------------------------- round-5 additions:
# fuzzy verify, CDC chunking, sampling temperature, vocab coverage,
# LM-perplexity buckets, duplicate-cluster canonical selection


def q_edit_distance(spark, sf_dir, max_bucket=None, distance_cap=None):
    """Edit-distance verification of LSH candidate pairs — the fuzzy-
    dedup verify stage where token-level Jaccard is too coarse (OCR
    noise, single-character edits): exact Levenshtein over each
    candidate pair's raw text (Spark's JVM built-in, value-identical to
    DuckDB's levenshtein), plus an integer basis-point similarity
    (max_len - dist)·10000 DIV max_len for thresholding.

    Scale shape: Levenshtein is O(len_a·len_b) per pair but runs ONLY
    on LSH candidates — banding prunes the corpus-quadratic pair space
    first, so the verify cost tracks candidate count, not corpus size;
    at 100 TB add an upstream length cap (the curation pipeline already
    bounds doc length) to bound the per-pair cost.  ``max_bucket`` is
    the at-scale band-bucket population cap (operators/dedup.py
    lsh_candidate_pairs); ``distance_cap`` switches the DP to Spark's
    banded thresholded levenshtein (O(cap·len) per pair instead of
    O(len_a·len_b); a pair beyond the cap reports dist=max_len,
    sim_bp=0 — "not a near-dup" is the only fact the stage needs) — a verify stage only needs the decision
    boundary, not exact distances for far pairs (measured at sf1:
    176 s -> 13 s for the Levenshtein stage at cap 512).  Both default
    None for sf0.01 oracle parity; the sf1 rehearsal passes
    (max_bucket=50, distance_cap=512).  ``None`` kwargs defer to the
    active ``scale.ScaleProfile`` (max_bucket resolves inside
    lsh_candidate_pairs)."""
    from kafkastreamsjavachallenge_spark.scale import resolve

    distance_cap = resolve(distance_cap, "distance_cap")
    d = _docs(spark, sf_dir)
    pairs = D.lsh_candidate_pairs(
        D.minhash_signatures(d, n_perm=8), bands=4, rows_per_band=2,
        max_bucket=max_bucket,
    )
    # per-pair cost is O(len_a * len_b): cap the compared prefix at 4096
    # chars (the oracle applies the same cap) so one pathological
    # million-char near-dup pair cannot go quadratic — beyond the cap,
    # prefix distance is the verify signal curation actually acts on.
    # Non-ASCII codepoints collapse to a single '?' FIRST ([^ -~] is the
    # same class in Java regex and RE2, one match per codepoint even for
    # astral chars): Spark's levenshtein counts characters but DuckDB's
    # counts UTF-8 bytes, so a multi-byte codepoint in a candidate pair
    # would otherwise shift the distance by bytes-per-char minus one
    # (found by fuzz seed 206: an emoji near-dup pair, 125 vs 127)
    cap = F.regexp_replace(
        F.substring(F.col("text"), 1, 4096), "[^ -~]", "?"
    )
    ta = d.select(F.col("doc_id").alias("id_a"), cap.alias("ta"))
    tb = d.select(F.col("doc_id").alias("id_b"), cap.alias("tb"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.levenshtein("ta", "tb").cast("bigint")
                if distance_cap is None
                # thresholded form returns -1 above the cap -> clamp
                else F.nullif(
                    F.levenshtein("ta", "tb", distance_cap).cast("bigint"),
                    F.lit(-1),
                )
            ).alias("dist"),
            F.greatest(F.length("ta"), F.length("tb"))
            .cast("bigint")
            .alias("max_len"),
        )
        .select(
            "id_a",
            "id_b",
            F.coalesce("dist", F.col("max_len")).alias("dist"),
            F.expr(
                "((max_len - coalesce(dist, max_len)) * 10000) DIV max_len"
            ).alias("sim_bp"),
        )
    )


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (FastCDC/rolling-hash family): a chunk
    boundary falls AFTER token position i whenever that token's 28-bit
    hash is 0 mod 16 (expected chunk ≈ 16 tokens) — so chunk boundaries
    survive insertions/deletions elsewhere in the document, the property
    that makes CDC the storage-dedup splitter (fixed-width chunks shift
    on any edit; content-defined ones don't).  Reports per-doc chunk
    count and extreme chunk sizes.

    Pure per-row HOF projection — zero shuffles, embarrassingly
    parallel; the (chunk-hash → doc) dedup index this feeds is one
    explode + groupBy away, exactly like q_chunk_dedup's fixed-width
    variant."""
    d = _docs(spark, sf_dir)
    out = d.select("doc_id", T.tokens("text").alias("t"))
    bp = F.when(
        F.size("t") >= 2,
        F.filter(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: T.base_hash28(F.element_at("t", i)) % 16 == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    lens = T.let(
        bp,
        lambda b: F.zip_with(
            F.concat(F.array(F.lit(0)), b),
            F.concat(b, F.array(F.size("t"))),
            lambda a, e: e - a,
        ),
    )
    return out.select(
        "doc_id",
        F.size("t").alias("n_tok"),
        T.let(
            lens,
            lambda ls: F.struct(
                F.size(ls).alias("n_chunks"),
                F.array_max(ls).alias("max_chunk"),
                F.array_min(ls).alias("min_chunk"),
            ),
        ).alias("c"),
    ).select("doc_id", "n_tok", "c.n_chunks", "c.max_chunk", "c.min_chunk")


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled sampling weights per source (the multilingual
    mixing rule of mC4/XLM-R): p_i ∝ n_tokens_i^τ with τ = 0.5 — hot
    sources are downweighted, rare ones upweighted, τ→0 is uniform and
    τ=1 proportional.  Reported in integer e6 (floor), with the
    denominator folded in source order on BOTH engines so the irrational
    sqrt sums add in one pinned sequence (the order-unspecified float-agg
    drift class cannot occur).

    Scale shape: one map-side-combinable agg to per-source token counts
    (|sources| rows), a scalar broadcast — the corpus is scanned once."""
    per = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size(T.tokens("text"))).alias("n_tokens"))
    )
    scored = per.select(
        "source",
        "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).alias("s"),
    )
    denom = scored.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"],
        ).alias("denom")
    )
    return scored.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_tokens",
        F.floor(F.col("s") / F.col("denom") * F.lit(1000000.0))
        .cast("bigint")
        .alias("weight_e6"),
    )


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve — the tokenizer-design question "how
    many types cover 90% / 99% of all token occurrences?": rank types by
    (frequency desc, token), take the running occurrence sum, and report
    the smallest rank whose cumulative share crosses each threshold.
    The gates are integer-exact (cum·10 >= 9·total), so no float
    boundary can flip a rank across engines or testdata seeds.

    Scale shape: the corpus collapses to a vocab-sized (type, count)
    table first (one map-side-combinable agg), so the global running-sum
    window runs over |vocab| rows, not |tokens|; at a 100 TB vocab the
    same prefix sum is two passes (per-range subtotals broadcast back),
    never a corpus sort."""
    from pyspark.sql import Window

    tf = (
        _docs(spark, sf_dir)
        .select(F.explode(T.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = Window.orderBy(F.col("n").desc(), "tok")
    ranked = tf.select(
        "n",
        F.row_number().over(order).alias("r"),
        F.sum("n")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    tot = tf.agg(F.sum("n").alias("tot"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .agg(
            F.max("r").alias("vocab_size"),
            F.max("tot").alias("n_tokens"),
            F.min(F.when(F.col("cum") * 10 >= F.col("tot") * 9, F.col("r"))).alias(
                "v90"
            ),
            F.min(
                F.when(F.col("cum") * 100 >= F.col("tot") * 99, F.col("r"))
            ).alias("v99"),
        )
    )


def q_perplexity_bucket(spark, sf_dir):
    """CCNet-style perplexity bucketing: score every document with the
    corpus-trained bigram LM (q_bigram_logprob's exact add-one model),
    then split EACH LANGUAGE into head/middle/tail terciles of mean NLL
    — the bucketing CCNet uses to keep fluent text per language rather
    than letting one language's distribution set every threshold.

    Scale shape: the LM pipeline is q_bigram_logprob's (vocabulary-sized
    shuffle joins, order-pinned per-doc folds); the tercile window
    partitions by language, so no global single-partition sort — a
    pathologically hot language gets the same hash-threshold treatment
    as q_domain_cap_scaled."""
    from pyspark.sql import Window

    nll = q_bigram_logprob(spark, sf_dir)
    langs = _docs(spark, sf_dir).select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    b = nll.join(langs, "doc_id").select(
        "lang",
        "avg_nll",
        "n_bigrams",
        F.ntile(3).over(w).alias("bucket"),
    )
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("avg_nll").alias("lo"),
        F.max("avg_nll").alias("hi"),
        F.sum("n_bigrams").alias("total_bigrams"),
    )


def q_cluster_canonical(spark, sf_dir):
    """Canonical-member selection for near-dup clusters: after connected
    components over the LSH candidate graph, each multi-doc cluster
    keeps its HIGHEST-QUALITY member (longest text, doc_id as the
    deterministic tie-break) — the survivorship policy real dedup runs
    use instead of min-id (min-id keeps whatever crawled first; quality
    keeps the best copy).

    Scale shape: components via min-label propagation (bounded rounds),
    then one window per cluster — clusters are tiny by construction
    (near-dup groups), so the per-partition sort is trivially bounded."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    comp = D.connected_components(
        D.lsh_candidate_pairs(
            D.minhash_signatures(d, n_perm=8), bands=4, rows_per_band=2
        ),
        d.select("doc_id"),
    )
    j = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    ranked = j.select(
        "component",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("component")).alias("n_members"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("n_members") >= 2)).select(
        "component",
        "n_members",
        F.col("doc_id").alias("canonical_id"),
        F.col("n_chars").alias("kept_chars"),
    )



def q_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance re-ranking (operators/retrieval.py
    mmr_select): 3 query vectors, brute-force cosine top-8 candidates
    each, then greedy MMR selection of 3 — relevance minus max-similarity
    to the already-selected set, the diversified-retrieval step that keeps
    one representative per near-dup family in a RAG / data-selection
    context window.

    All float work (dot products, norms, the e6 fixed-point floor) stays
    JVM-side with sequential folds mirrored by DuckDB list_sum; the
    greedy loop itself runs on INTEGER tables in a cogrouped
    applyInPandas (bounded group: 8 candidates + 56 pair sims per query),
    so the sequential-per-query / parallel-across-queries shape is
    explicit.  Scale: candidates come from an ANN stage upstream, the
    cogroup shuffles queriesxN rows, never the corpus."""
    from pyspark.sql import Window

    from kafkastreamsjavachallenge_spark.operators.retrieval import mmr_select

    e = _embs(spark, sf_dir)
    nv = e.select("vec_id", F.col("embedding").alias("vec"))
    q = nv.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv")
    )
    c = nv.filter(F.col("vec_id") >= 3)
    cos_e6 = F.floor(
        cosine(F.col("vec"), F.col("qv")) * F.lit(1000000.0)
    ).cast("bigint")
    scored = (
        c.crossJoin(F.broadcast(q))
        .select("qid", "vec_id", cos_e6.alias("cos_e6"))
        .filter(F.col("cos_e6").isNotNull())
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos_e6").desc(), "vec_id")
    # r12: cand fans out three ways (mmr_select input + both pair-sim
    # sides via cv) — checkpoint so the corpus-scan + score + top-8
    # window runs once instead of once per branch (the r11 plan carried
    # the subtree twice more inside the cogroup's right side)
    cand = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 8)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    cv = cand.join(nv, "vec_id").select("qid", "vec_id", "vec").localCheckpoint(
        eager=False
    )
    a = cv.select(
        F.col("qid").alias("qid_a"),
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("va"),
    )
    b = cv.select(
        F.col("qid").alias("qid_b"),
        F.col("vec_id").alias("id_b"),
        F.col("vec").alias("vb"),
    )
    sim_e6 = F.floor(
        cosine(F.col("va"), F.col("vb")) * F.lit(1000000.0)
    ).cast("bigint")
    pairs = (
        a.join(
            b,
            (F.col("qid_a") == F.col("qid_b")) & (F.col("id_a") != F.col("id_b")),
        )
        .select(
            F.col("qid_a").alias("qid"), "id_a", "id_b", sim_e6.alias("sim_e6")
        )
        .filter(F.col("sim_e6").isNotNull())
    )
    return mmr_select(cand, pairs, k=3)


def q_template_detect(spark, sf_dir):
    """Boilerplate / template detection: per source, the most frequent
    leading bigram and its share of documents — a crawl whose docs all
    open with the same tokens is template-wrapped (cookie banners, nav
    headers) and needs prefix stripping before training.  One
    projection + two hash aggregates; share in integer basis points.

    Scale: group keys are (source, first-2-tokens) — cardinality bounded
    by distinct templates, not corpus size; the window per source ranks
    a handful of rows."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    lead = F.concat_ws(" ", F.slice(T.tokens("text"), 1, 2))
    g = d.select("source", lead.alias("lead_bigram")).filter(
        F.length("lead_bigram") > 0
    )
    counts = g.groupBy("source", "lead_bigram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), "lead_bigram"
    )
    tot = Window.partitionBy("source")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("tot", F.sum("n_docs").over(tot))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            "lead_bigram",
            "n_docs",
            F.expr("(n_docs * 10000) DIV tot").alias("share_bp"),
        )
    )


def q_lsh_tuning(spark, sf_dir):
    """LSH band-configuration advisor: from ONE 8-permutation MinHash
    signature table, candidate-pair counts and mean signature-agreement
    estimate for (4 bands x 2 rows) vs (2 bands x 4 rows) — the s-curve
    trade (more bands = higher recall / more candidates; longer bands =
    higher precision / fewer).  Tuning reads this table instead of
    re-running dedup per config.

    Scale: signatures computed once; each config adds one band-explode +
    bucket self-join (hash-uniform keys), cost tracking candidates, not
    pairs**2."""
    d = _docs(spark, sf_dir)
    # r12 (guide §1.2): ONE signature table feeds both band configs and
    # both agreement sides — checkpoint it so the tokenize + 8-permute
    # corpus pass runs once, not once per consumer
    sigs = D.minhash_signatures(d, n_perm=8).localCheckpoint(eager=False)
    agree = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sb"))
    outs = []
    for bands, rpb in ((4, 2), (2, 4)):
        pairs = D.lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rpb)
        est = (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .select((agree * 1250).alias("est_e4"))
        )
        outs.append(
            est.agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("est_e4").alias("s_est"),
            ).select(
                F.lit(bands).alias("bands"),
                F.lit(rpb).alias("rows_per_band"),
                "n_pairs",
                F.coalesce(
                    F.expr("s_est DIV n_pairs"), F.lit(0).cast("bigint")
                ).alias("mean_est_e4"),
            )
        )
    return outs[0].unionAll(outs[1])


def q_dup_threshold_curve(spark, sf_dir):
    """Dedup threshold selection curve: for each Jaccard threshold in a
    grid, how many LSH candidate pairs would be treated as duplicates —
    the CDF a curation run reads to pick its cut (too low merges
    distinct docs, too high leaks near-dups).  Pairs + exact Jaccard are
    computed ONCE; the grid is a 5-row broadcast explode.

    Scale: exact Jaccard touches candidates only (banding prunes the
    quadratic space); the curve is a 5-group aggregate."""
    d = _docs(spark, sf_dir)
    sigs = D.minhash_signatures(d, n_perm=8)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    sh = F.array_distinct(T.shingles(T.tokens("text"), 3))
    da = d.select(F.col("doc_id").alias("id_a"), sh.alias("ga"))
    db = d.select(F.col("doc_id").alias("id_b"), sh.alias("gb"))
    jac = (
        pairs.join(da, "id_a")
        .join(db, "id_b")
        .select(
            F.expr(
                "(size(array_intersect(ga, gb)) * 10000) "
                "DIV size(array_distinct(concat(ga, gb)))"
            ).alias("jac_e4")
        )
    )
    grid = [5000, 6000, 7000, 8000, 9000]
    return (
        jac.select(
            "jac_e4",
            F.explode(F.array(*[F.lit(t) for t in grid])).alias("threshold_e4"),
        )
        .groupBy("threshold_e4")
        .agg(
            F.sum(
                F.when(F.col("jac_e4") >= F.col("threshold_e4"), 1).otherwise(0)
            ).alias("n_dup_pairs"),
            F.count(F.lit(1)).alias("n_cand_pairs"),
        )
        .select(
            "threshold_e4",
            "n_dup_pairs",
            "n_cand_pairs",
            F.expr("(n_dup_pairs * 10000) DIV n_cand_pairs").alias("dup_share_bp"),
        )
    )



def q_kn_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (the smoothing real
    LM-based quality filters ship, vs q_bigram_logprob's add-one):
    absolute discount d = 3/4, continuation probability from distinct
    left-context counts.  With d rational the whole estimate is one
    integer expression —
    kn_e6 = 1e6·((4·c_ab − 3)·T + 3·N1a·Cb) DIV (4·c_a·T)
    (c_ab = bigram count, c_a = context occurrences, N1a = distinct
    continuations of a, Cb = distinct left-contexts of b, T = distinct
    bigram types) — so no float ever enters and the top-20 report is
    cross-engine exact.

    Scale shape: three vocabulary-sized aggregates over one bigram
    explode + a 1-row type-count broadcast; the corpus is scanned once,
    joins are type-level.  At true corpus scale the 1e6·4·c_a·T product
    needs headroom — move to DECIMAL(38) or drop to e4 there (docstring
    contract, same plan)."""
    d = _docs(spark, sf_dir).select("doc_id", T.tokens("text").alias("t"))
    n1 = F.greatest(F.size("t") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("t", 1, n1),
        F.slice("t", 2, n1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    bg = (
        d.select(F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    cab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    ctx = bg.groupBy("a").agg(
        F.count(F.lit(1)).alias("c_a"), F.countDistinct("b").alias("n1a")
    )
    cont = bg.groupBy("b").agg(F.countDistinct("a").alias("cb"))
    nt = cab.agg(F.count(F.lit(1)).alias("ntypes"))
    return (
        cab.join(ctx, "a")
        .join(cont, "b")
        .crossJoin(F.broadcast(nt))
        .select(
            "a",
            "b",
            "c_ab",
            F.expr(
                "(1000000 * ((4 * c_ab - 3) * ntypes + 3 * n1a * cb)) "
                "DIV (4 * c_a * ntypes)"
            ).alias("kn_e6"),
        )
        .orderBy(F.col("c_ab").desc(), "a", "b")
        .limit(20)
    )


def q_ann_ndcg(spark, sf_dir):
    """NDCG@10 audit of the ANN indexes against the exact scan — the
    graded companion of q_ann_recall (recall treats position 1 and 10
    the same; NDCG pays log-discounted credit, the metric retrieval
    deployments actually report).  Relevance of the exact top-10 is
    graded 10..1; the log2 position discounts are PINNED INTEGER
    literals floor(1e6/log2(p+1)) shared verbatim with the oracle, so
    the whole metric — including the ideal-DCG normalizer — is integer
    arithmetic and cross-engine exact.

    Cost: the exact scan plus three 10-row retrievals; every join is on
    a 10-row set."""
    from pyspark.sql import Window

    W10 = [1000000, 630929, 500000, 430676, 386852,
           356207, 333333, 315464, 301029, 289064]
    idcg = sum((10 - i) * W10[i] for i in range(10))
    wex = Window.orderBy(F.col("cos_sim").desc(), "vec_id")
    rel = (
        q_cosine_topk(spark, sf_dir)
        .select("vec_id", F.row_number().over(wex).alias("r"))
        .select("vec_id", (F.lit(11) - F.col("r")).alias("rel"))
        # 10-row graded-relevance table, referenced by all three method
        # branches — materialize once instead of re-running the exact
        # scan per branch (the q_dedup_recall shared-subtree lesson)
        .localCheckpoint(eager=True)
    )
    warr = F.array(*[F.lit(w) for w in W10])

    def ndcg(df, name, order):
        pos = df.select(
            "vec_id", F.row_number().over(Window.orderBy(*order)).alias("p")
        )
        g = (
            pos.join(rel, "vec_id", "left")
            .select(
                (
                    F.coalesce("rel", F.lit(0))
                    * F.element_at(warr, F.col("p"))
                ).alias("g")
            )
            .agg(F.sum("g").alias("s"))
        )
        return g.select(
            F.lit(name).alias("method"),
            F.coalesce("s", F.lit(0)).cast("bigint").alias("dcg_e6"),
            F.expr(f"(CAST(coalesce(s, 0) AS BIGINT) * 10000) DIV {idcg}").alias(
                "ndcg_bp"
            ),
        )

    desc_cos = [F.col("cos_sim").desc(), "vec_id"]
    return (
        ndcg(q_ann_lsh(spark, sf_dir), "lsh", desc_cos)
        .unionByName(ndcg(q_ann_ivf(spark, sf_dir), "ivf", desc_cos))
        .unionByName(
            ndcg(
                q_ann_ivfpq(spark, sf_dir),
                "ivfpq",
                [F.col("adc_dist").asc(), "vec_id"],
            )
        )
    )



def q_filter_funnel(spark, sf_dir):
    """Curation funnel attribution — the report a pipeline operator reads
    before tuning any single filter: each quality gate applied IN
    SEQUENCE (length bounds, lexical diversity, Gopher top-token
    fraction, exact dedup), with per-stage in/removed/out counts and an
    integer basis-point removal rate.  Cumulative semantics (stage N sees
    stage N-1 survivors) matches how the filters actually compose in
    q_curation_pipeline.

    Every gate is integer-exact (5·distinct ≥ n, 10·top_c ≤ 3·n), so no
    seed regeneration can flip a count.  Scale shape: per-doc flags come
    from one token explode + one hash window; the funnel itself is ONE
    4-count aggregate row unpivoted with stack()."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    n_tok = F.size("toks")
    # linear per-token shape (the gopher-repetition pattern) — a per-row
    # distinct×total HOF would go quadratic on a pathological document
    top = (
        d.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    flags = (
        d.select(
            "doc_id",
            "text",
            (n_tok.between(10, 500)).alias("f1"),
            (F.size(F.array_distinct("toks")) * 5 >= n_tok).alias("f2"),
            n_tok.alias("n_tok"),
        )
        .join(top, "doc_id")
        .withColumn("f3", F.col("top_c") * 10 <= F.col("n_tok") * 3)
    )
    keep_id = F.min(F.when(F.col("f1") & F.col("f2") & F.col("f3"), F.col("doc_id"))).over(
        Window.partitionBy(F.md5("text"))
    )
    staged = flags.withColumn("f4", F.col("doc_id") == keep_id)
    agg = staged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.when(F.col("f1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("f1") & F.col("f2"), 1).otherwise(0)).alias("n2"),
        F.sum(
            F.when(F.col("f1") & F.col("f2") & F.col("f3"), 1).otherwise(0)
        ).alias("n3"),
        F.sum(
            F.when(
                F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"), 1
            ).otherwise(0)
        ).alias("n4"),
    )
    return agg.selectExpr(
        "stack(4, 'length', 1, n0, n1, 'diversity', 2, n1, n2, "
        "'top_token', 3, n2, n3, 'exact_dup', 4, n3, n4) "
        "AS (stage, stage_idx, n_in, n_out)"
    ).selectExpr(
        "stage",
        "stage_idx",
        "CAST(n_in AS BIGINT) AS n_in",
        "CAST(n_in - n_out AS BIGINT) AS n_removed",
        "CAST(n_out AS BIGINT) AS n_out",
        "((n_in - n_out) * 10000) DIV n_in AS removal_bp",
    )


def q_source_overlap(spark, sf_dir, max_source_df=None):
    """Source-pair content-overlap matrix: distinct bigram shingles per
    source, co-occurrence counts per source pair, Jaccard in integer
    basis points — the corpus-composition heatmap that shows which feeds
    mirror each other BEFORE paying for doc-level cross-source dedup.

    Scale shape: the corpus collapses to (source, shingle) DISTINCT
    first; the pair join fans out per shingle by its source-df, bounded
    by |sources| (20), never by corpus size.  ``max_source_df`` drops
    shingles present in more than that many sources (boilerplate
    carries no composition signal) BEFORE the pair join — default off
    for oracle parity; with thousands of sources set it to keep the
    per-shingle fan-out (source-df²) sparse."""
    d = _docs(spark, sf_dir).withColumn("toks", T.tokens("text"))
    sh = (
        d.filter(F.size("toks") >= 2)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.zip_with(
                        F.slice(F.col("toks"), 1, F.size("toks") - 1),
                        F.slice(F.col("toks"), 2, F.size("toks") - 1),
                        lambda a, b: F.concat_ws(" ", a, b),
                    )
                )
            ).alias("sh"),
        )
        .distinct()
    )
    if max_source_df is not None:
        sh = D._drop_hot_shingles(sh, max_source_df, col="sh")
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("source").alias("source_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("source").alias("source_b"), F.col("sh").alias("sh_b"))
    common = (
        a.join(
            b,
            (F.col("sh_a") == F.col("sh_b"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.expr(
                "(n_common * 10000) DIV (n_a + n_b - n_common)"
            ).alias("jaccard_bp"),
        )
    )



def q_dataset_card(spark, sf_dir):
    """Dataset-card composition table — the per-source summary a release
    ships next to its manifest: document and token counts, mean length,
    language spread, and the dominant language with its share (integer
    basis points).  Two hash aggregates (per (source, lang), then per
    source) + one tiny window; the corpus is scanned once.

    Scale: group keys are (source, lang) — bounded by catalog
    cardinality, not corpus size."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "source", "lang", F.size(T.tokens("text")).alias("n_tok")
    )
    by_lang = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_docs").desc(), "lang"
    )
    return (
        by_lang.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.when(F.col("rn") == 1, F.col("lang"))).alias("top_lang"),
            F.max(F.when(F.col("rn") == 1, F.col("n_docs"))).alias("__top_n"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr("total_tokens DIV n_docs").alias("mean_tokens"),
            "n_langs",
            "top_lang",
            F.expr("(__top_n * 10000) DIV n_docs").alias("top_lang_share_bp"),
        )
    )


def q_token_budget(spark, sf_dir):
    """Token-budget allocation by largest-remainder (Hamilton) rounding:
    a 10M-token training budget split across sources proportionally to
    the temperature-scaled weights, with the remainder seats going to the
    largest fractional parts (ties by source) — so the allocations are
    integers that sum EXACTLY to the budget, the property naive
    per-source rounding loses.  Entirely integer arithmetic over the e6
    weight table: floor share = B·w DIV W, fractional part = B·w mod W.

    Scale: the weight table is |sources| rows; everything after the one
    corpus-scan aggregate (inherited from q_temperature_mix) is
    broadcast-size."""
    from pyspark.sql import Window

    budget = 10_000_000
    # r12 (guide §1.2): the |sources|-row weight table feeds the total
    # AND the share table, which itself feeds the remainder AND the
    # final allocation — checkpoint both so the corpus scan inherited
    # from q_temperature_mix runs once (the r11 plan carried it 8x)
    w = (
        q_temperature_mix(spark, sf_dir)
        .select("source", "weight_e6")
        .localCheckpoint(eager=False)
    )
    tot = w.agg(F.sum("weight_e6").alias("W"))
    j = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "weight_e6",
            F.expr(f"({budget} * weight_e6) DIV W").alias("base"),
            F.expr(f"({budget} * weight_e6) % W").alias("frac"),
        )
        .localCheckpoint(eager=False)
    )
    rem = j.agg((F.lit(budget) - F.sum("base")).alias("R"))
    wnd = Window.orderBy(F.col("frac").desc(), "source")
    return (
        j.withColumn("rk", F.row_number().over(wnd))
        .crossJoin(F.broadcast(rem))
        .select(
            "source",
            "weight_e6",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("R"), 1).otherwise(0)
            ).cast("bigint").alias("alloc_tokens"),
        )
    )



def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing, hash-checked end to end: wrap each
    document payload as an opaque video record (operators/multimodal
    to_media), fan out to 4 frames inside the Arrow batch loop
    (sample_frames' mapInPandas — the row-multiplying multimodal shape),
    and emit per-frame byte counts + digests.  The stand-in extractor
    slices CHARACTERS (then re-encodes) so the oracle is expressible in
    portable SQL (substr is char-based; this DuckDB build has no BLOB
    slicing) — a real demuxer slices bytes and swaps in via
    ``extractor=`` without touching the plan; the operator's byte-based
    default keeps its own unit tests."""
    from kafkastreamsjavachallenge_spark.operators.multimodal import (
        sample_frames,
        to_media,
    )

    def char_frames(payload, n):
        if payload is None:
            return []
        try:
            text = bytes(payload).decode("utf-8")
        except UnicodeDecodeError:
            return []
        if not text:
            return []
        step = max(1, len(text) // n)
        return [
            text[i * step : (i + 1) * step].encode("utf-8") for i in range(n)
        ]

    d = _docs(spark, sf_dir)
    media = to_media(d, "doc_id", "text", "video")
    frames = sample_frames(media, n_frames=4, extractor=char_frames)
    return frames.select(
        "media_id",
        "frame_index",
        F.octet_length("frame").alias("n_frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )



def q_quality_threshold_sweep(spark, sf_dir):
    """Classifier-threshold tuning curve: keep-rate of the fastText-style
    quality filter at each candidate margin cut — the sweep an operator
    reads before picking the filter's operating point (too low keeps
    junk, too high starves the mix).  The margin pipeline runs ONCE; the
    grid is a 5-row explode; rates land in integer basis points.

    Scale: inherits q_fasttext_score's zero-shuffle scan-side inference;
    the sweep adds one 5-group aggregate."""
    scored = q_fasttext_score(spark, sf_dir).select("margin")
    grid = [-20, -10, 0, 10, 20]
    return (
        scored.select(
            "margin",
            F.explode(
                F.array(*[F.lit(t) for t in grid])
            ).alias("threshold"),
        )
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(F.col("margin") >= F.col("threshold"), 1).otherwise(0)
            ).alias("n_keep"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "threshold",
            "n_keep",
            "n_docs",
            F.expr("(n_keep * 10000) DIV n_docs").alias("keep_bp"),
        )
    )


def q_embed_norm_audit(spark, sf_dir):
    """Embedding-table health audit before indexing: vector count,
    zero-norm count (cosine-undefined rows that poison ANN), and the
    min / exact-median / max norm in e6 fixed point — the one-row report
    an index build gates on.  The median is rank-exact ((n+1) DIV 2 over
    a (norm, vec_id) total order), not an interpolated percentile, so
    the whole row is cross-engine exact.

    Scale: one projection + one rank window over norms (at 100 TB the
    median comes from the two-pass partial-histogram form; the windowed
    form here is the semantic spec)."""
    from pyspark.sql import Window

    from kafkastreamsjavachallenge_spark.functions.vector import norm

    e = _embs(spark, sf_dir)
    n_e6 = F.floor(norm(F.col("embedding")) * F.lit(1000000.0)).cast("bigint")
    norms = e.select("vec_id", n_e6.alias("norm_e6"))
    counts = norms.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.when(F.col("norm_e6") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
        F.min("norm_e6").alias("min_norm_e6"),
        F.max("norm_e6").alias("max_norm_e6"),
    )
    w = Window.orderBy("norm_e6", "vec_id")
    med = (
        norms.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(counts.select("n_vecs").withColumnRenamed("n_vecs", "__n")))
        .filter(F.col("rn") == F.expr("(__n + 1) DIV 2"))
        .select(F.col("norm_e6").alias("med_norm_e6"))
    )
    return counts.crossJoin(F.broadcast(med)).select(
        "n_vecs", "n_zero", "min_norm_e6", "med_norm_e6", "max_norm_e6"
    )



def q_ann_frontier(spark, sf_dir):
    """ANN cost/recall frontier — the table a deployment reads to pick
    its index: per retrieval method, how many candidates its pruning
    admits (the cost proxy that scales with latency) next to the
    recall@10 it buys.  Exact scan anchors the frontier (all candidates,
    recall 10000 bp by definition); LSH multi-probe and IVF nprobe=4
    show their prune ratios.  Candidate sets come from the SAME shared
    operators the retrievals use (similarity.lsh_candidates /
    ivf_assign + _probe_lists), so the audit can never drift from the
    audited path.

    Scale: each count is one aggregate over an already-pruned set; the
    per-method rows are 1-row broadcast composes."""
    e = _embs(spark, sf_dir)
    corpus = e.filter(F.col("vec_id") != 0)
    query = e.filter(F.col("vec_id") == 0)
    centroids = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    exact_ids = q_cosine_topk(spark, sf_dir).select("vec_id").localCheckpoint(
        eager=True
    )
    # recall denominator derived from the exact scan itself (not a
    # hard-coded k): stays correct if k or the corpus size changes, and
    # a sub-k corpus reports honest numbers instead of fabricated 10s
    n_exact = F.broadcast(
        exact_ids.agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    recall_bp = (
        F.when(F.col("n_exact") > 0, F.expr("(hits * 10000) DIV n_exact"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("recall_bp")
    )

    def row(method, cand_df, topk_df):
        n_c = cand_df.agg(F.count(F.lit(1)).alias("n_candidates"))
        hits = (
            topk_df.select("vec_id")
            .join(exact_ids, "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("hits"))
        )
        return (
            n_c.crossJoin(F.broadcast(hits))
            .crossJoin(n_exact)
            .select(
                F.lit(method).alias("method"),
                "n_candidates",
                "hits",
                recall_bp,
            )
        )

    exact_row = (
        corpus.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(n_exact)
        .select(
            F.lit("exact").alias("method"),
            "n_candidates",
            F.col("n_exact").alias("hits"),
            recall_bp,
        )
    )
    # r12 (guide §1.2): each method's candidate set feeds BOTH the cost
    # count and the recall top-k — checkpoint it once instead of letting
    # the audit recompute the corpus-sized stage per consumer (the SRP
    # Arrow matmul ran twice for LSH, the broadcast-argmax assignment
    # twice for IVF).  The retrieval tails are inlined over the SAME
    # candidate rows: lsh_ann_topk / ivf_ann_topk are by definition
    # candidates → cosine_topk (same k/planes/nprobe defaults as
    # q_ann_lsh / q_ann_ivf), so the audited composition is unchanged
    # and the audit still cannot drift from the audited path.
    lsh_c = S.lsh_candidates(corpus, query).localCheckpoint(eager=False)
    ivf_c = (
        S.ivf_assign(corpus, centroids)
        .join(
            F.broadcast(S._probe_lists(query, centroids, 4, "embedding")),
            on="centroid_id",
            how="left_semi",
        )
        .localCheckpoint(eager=False)
    )
    return (
        exact_row.unionByName(
            row("lsh", lsh_c, S.cosine_topk(lsh_c, query, k=10))
        ).unionByName(row("ivf", ivf_c, S.cosine_topk(ivf_c, query, k=10)))
    )



_LANG_ID_SQL = (
    f"WITH toks AS (SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents), "
    "tf AS (SELECT lang AS l2, tok, count(*) AS c FROM toks GROUP BY l2, tok), "
    "top AS (SELECT l2, tok FROM (SELECT l2, tok, row_number() OVER "
    "(PARTITION BY l2 ORDER BY c DESC, tok) AS rn FROM tf) WHERE rn <= 20), "
    "score AS (SELECT t.doc_id, p.l2, count(*) AS overlap FROM toks t "
    "JOIN top p ON t.tok = p.tok GROUP BY t.doc_id, p.l2), "
    "pred AS (SELECT doc_id, l2 AS pred_lang FROM (SELECT doc_id, l2, "
    "row_number() OVER (PARTITION BY doc_id ORDER BY overlap DESC, l2) AS rn "
    "FROM score) WHERE rn = 1) "
    "SELECT d.doc_id, p.pred_lang, d.lang AS true_lang, "
    "CAST(p.pred_lang = d.lang AS INTEGER) AS is_correct "
    "FROM documents d JOIN pred p ON d.doc_id = p.doc_id"
)


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the corpus-trained classifier
    (q_lang_id) evaluated against the labeled lang column — per
    (true, predicted) pair counts and the row-share in integer basis
    points, the error-analysis artifact a curation run reads before
    trusting lang-based routing.  One aggregate + one tiny window over
    the classifier output; at scale the matrix is |langs|**2 rows."""
    from pyspark.sql import Window

    pred = q_lang_id(spark, sf_dir)
    c = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        c.withColumn(
            "row_total", F.sum("n").over(Window.partitionBy("true_lang"))
        )
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.expr("(n * 10000) DIV row_total").alias("share_bp"),
        )
    )



def q_source_hhi(spark, sf_dir):
    """Corpus concentration (Herfindahl-Hirschman index) over source
    token shares: HHI = sum(share_bp^2) DIV 10000 — the single number a
    mixture review reads first (10000 = one source owns the corpus,
    10000/n = perfectly even).  Shares in integer basis points, so the
    index is cross-engine exact; reported next to the top source's share
    and the effective source count ceiling 10000*10000 DIV HHI (the
    integer "equivalent number of equal sources").

    Scale: one map-side-combinable aggregate to |sources| rows, then
    arithmetic."""
    per = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum(F.size(T.tokens("text"))).alias("n_tok"))
    )
    tot = per.agg(F.sum("n_tok").alias("tot"))
    shares = per.crossJoin(F.broadcast(tot)).select(
        "source", F.expr("(n_tok * 10000) DIV tot").alias("share_bp")
    )
    return shares.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.expr("CAST(sum(share_bp * share_bp) DIV 10000 AS BIGINT)").alias(
            "hhi_bp"
        ),
        F.max("share_bp").alias("top_share_bp"),
    ).select(
        "n_sources",
        "hhi_bp",
        "top_share_bp",
        F.expr("(10000 * 10000) DIV hhi_bp").alias("effective_sources_e4"),
    )



def q_length_deciles(spark, sf_dir):
    """Per-language document-length distribution audit: decile buckets
    over token counts (ntile(10) on the (n_tok, doc_id) total order —
    rank-based, so entirely integer) with per-decile doc counts, token
    bounds, and token mass — the table a length-filter review reads
    instead of a mean ± stddev that hides the tail.

    Scale: one projection + one per-language window; at corpus scale the
    same buckets come from approx quantile cutpoints, the rank form is
    the exact spec."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.size(T.tokens("text")).alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("n_tok", "doc_id")
    return (
        d.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )


QUERIES = {
    "q_doc_dedup": (
        q_doc_dedup,
        "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_docs "
        "FROM documents GROUP BY md5(text)",
    ),
    "q_fingerprint": (
        q_fingerprint,
        f"SELECT doc_id, list_min(list_transform({_TOKS}, t -> md5(t))) AS fp FROM documents",
    ),
    "q_winnow_fingerprint": (
        q_winnow_fingerprint,
        # positional (non-distinct) shingles — winnowing is positional
        "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS l "
        "FROM documents), "
        "s AS (SELECT doc_id, "
        "[array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)] AS sh "
        "FROM t WHERE len(l) >= 6), "
        "h AS (SELECT doc_id, list_transform(sh, "
        "x -> ('0x' || substr(md5(x), 1, 7))::BIGINT) AS hs FROM s) "
        "SELECT doc_id, array_to_string(list_sort(list_distinct("
        "[list_min(hs[i+1:i+4]) for i in range(0, len(hs) - 3)])), '|') AS fps "
        "FROM h",
    ),
    "q_minhash_sig": (
        q_minhash_sig,
        _MINHASH_SIG_CTE.format(nperm=4)
        + "SELECT doc_id, array_to_string(sigl, ',') AS sig FROM sig",
    ),
    "q_minhash_pairs": (
        q_minhash_pairs,
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)) "
        "SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id",
    ),
    "q_crosscorpus_dedup": (
        q_crosscorpus_dedup,
        # same signature/banding CTEs as q_minhash_pairs, but the band
        # join runs reference (src0) × corpus and the verified gate uses
        # the same round-then-threshold as q_neardup_verified
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b "
        "FROM bands a JOIN bands c ON a.b = c.b AND a.bucket = c.bucket "
        "JOIN documents da ON da.doc_id = a.doc_id "
        "JOIN documents dc ON dc.doc_id = c.doc_id "
        "WHERE da.source = 'src0' AND dc.source <> 'src0'), "
        "dup AS (SELECT DISTINCT id_b FROM (SELECT p.id_b, "
        "round(len(list_intersect(da.sh, db.sh)) / len(list_distinct(da.sh || db.sh)), 4) "
        "AS jaccard FROM pairs p JOIN d da ON da.doc_id = p.id_a "
        "JOIN d db ON db.doc_id = p.id_b) WHERE jaccard >= 0.5) "
        "SELECT doc_id, lang FROM documents WHERE source <> 'src0' "
        "AND doc_id NOT IN (SELECT id_b FROM dup)",
    ),
    "q_neardup_components": (
        q_neardup_components,
        _MINHASH_SIG_CTE.format(nperm=8).replace("WITH ", "WITH RECURSIVE ", 1)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "cc AS (SELECT doc_id AS node, doc_id AS label FROM documents "
        "UNION SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src) "
        "SELECT node AS doc_id, min(label) AS component FROM cc GROUP BY node",
    ),
    "q_neardup_verified": (q_neardup_verified, _NEARDUP_VERIFIED_SQL),
    "q_minhash_estimate": (
        q_minhash_estimate,
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id) "
        "SELECT p.id_a, p.id_b, "
        "CAST(list_sum(list_transform(range(1, 9), "
        "i -> CASE WHEN sa.sigl[i] = sb.sigl[i] THEN 1 ELSE 0 END)) * 1250 "
        "AS BIGINT) AS est_e4, "
        "(len(list_intersect(da.sh, db.sh)) * 10000) // "
        "len(list_distinct(da.sh || db.sh)) AS jac_e4 "
        "FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a "
        "JOIN sig sb ON sb.doc_id = p.id_b "
        "JOIN d da ON da.doc_id = p.id_a JOIN d db ON db.doc_id = p.id_b",
    ),
    "q_dedup_recall": (
        q_dedup_recall,
        # exact ground truth from the shingle inverted index (no
        # all-pairs), LSH candidates from the q_minhash_pairs CTEs
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id), "
        "ex AS (SELECT doc_id, unnest(sh) AS g FROM d), "
        "shared AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter "
        "FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id), "
        "sz AS (SELECT doc_id, len(sh) AS n FROM d), "
        "truth AS (SELECT s.id_a, s.id_b FROM shared s "
        "JOIN sz za ON za.doc_id = s.id_a JOIN sz zb ON zb.doc_id = s.id_b "
        "WHERE 2 * s.inter >= za.n + zb.n - s.inter), "
        "hit AS (SELECT t.id_a FROM truth t JOIN cand c "
        "ON t.id_a = c.id_a AND t.id_b = c.id_b) "
        "SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true, "
        "CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_caught, "
        "CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 0.0 "
        "ELSE round((SELECT count(*) FROM hit) / "
        "CAST((SELECT count(*) FROM truth) AS DOUBLE), 4) END AS recall, "
        "CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand, "
        "CASE WHEN (SELECT count(*) FROM cand) = 0 THEN 0.0 "
        "ELSE round((SELECT count(*) FROM hit) / "
        "CAST((SELECT count(*) FROM cand) AS DOUBLE), 4) END AS precision",
    ),
    "q_knn_join": (
        q_knn_join,
        "SELECT * FROM (SELECT q.vec_id AS q_id, a.vec_id AS n_id, "
        "round(list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))), 4) "
        "AS cos_sim, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        "round(list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))), 4) "
        "DESC, a.vec_id) AS rn "
        "FROM embeddings a, embeddings q WHERE q.vec_id < 20 AND a.vec_id >= 20) "
        "WHERE rn <= 3",
    ),
    "q_hll_union": (q_hll_union, None),
    "q_hll_union_bound": (
        q_hll_union_bound,
        "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
        "1 AS within_5rsd FROM events",
    ),
    "q_ngram_jaccard": (
        q_ngram_jaccard,
        f"WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents), "
        f"d AS (SELECT doc_id, {_SHINGLES} AS sh FROM t WHERE len(l) >= 3) "
        "SELECT a.doc_id AS id_a, c.doc_id AS id_b, "
        "round(len(list_intersect(a.sh, c.sh)) / len(list_distinct(a.sh || c.sh)), 4) AS jaccard "
        "FROM d a JOIN d c ON c.doc_id = a.doc_id + 1",
    ),
    "q_simhash": (
        q_simhash,
        f"WITH toks AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents), "
        f"h AS (SELECT doc_id, {_HEXVAL} AS v FROM (SELECT doc_id, md5(tok) AS m FROM toks)), "
        "bits AS (SELECT doc_id, b, sum(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s "
        "FROM h, (SELECT unnest(range(0, 16)) AS b) GROUP BY doc_id, b) "
        "SELECT doc_id, CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash "
        "FROM bits GROUP BY doc_id",
    ),
    "q_cosine_topk": (q_cosine_topk, _COSINE_TOPK_SQL),
    "q_ann_lsh": (q_ann_lsh, _ANN_LSH_SQL),
    "q_ann_ivf": (q_ann_ivf, _ANN_IVF_SQL),
    "q_ann_pq": (q_ann_pq, _ANN_PQ_SQL),
    "q_ann_pq_blas": (q_ann_pq_blas, _ANN_PQ_SQL),
    "q_ann_pq_refine": (q_ann_pq_refine, _ANN_PQ_REFINE_SQL),
    "q_ann_ivfpq": (q_ann_ivfpq, _ANN_IVFPQ_SQL),
    "q_ann_ivfpq_blas": (q_ann_ivfpq_blas, _ANN_IVFPQ_SQL),
    "q_ann_ivfpq_refine": (q_ann_ivfpq_refine, _ANN_IVFPQ_REFINE_SQL),
    "q_semdedup": (q_semdedup, _SEMDEDUP_SQL),
    # the BLAS twin shares q_semdedup's oracle: same integer kept-set
    # contract, different physical path (round 9)
    "q_semdedup_blas": (q_semdedup_blas, _SEMDEDUP_SQL),
    "q_curation_pipeline": (
        q_curation_pipeline,
        f"WITH t AS (SELECT doc_id, text, {_TOKS} AS l FROM documents), "
        "q AS (SELECT doc_id, text, len(l) AS n_tok FROM t "
        "WHERE len(l) BETWEEN 10 AND 500 "
        "AND 5 * len(list_distinct(l)) >= len(l)), "
        "k AS (SELECT min(doc_id) AS doc_id, min(n_tok) AS n_tok "
        "FROM q GROUP BY md5(text)), "
        "s AS (SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' "
        "ELSE 'test' END AS split, n_tok FROM ("
        f"SELECT {_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 100 AS b, "
        "n_tok FROM k)) "
        "SELECT split, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS total_tokens "
        "FROM s GROUP BY split",
    ),
    "q_embed_quantize": (
        q_embed_quantize,
        # identical arithmetic shape to the Spark side: scale = maxabs/127
        # computed first, elements mapped by floor(x/scale + 0.5) — same
        # IEEE op order, so results are bit-identical.
        "WITH s AS (SELECT vec_id, embedding, "
        "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 "
        "AS raw_scale FROM embeddings) "
        "SELECT vec_id, round(raw_scale, 6) AS scale, "
        "CASE WHEN raw_scale = 0 THEN array_to_string(list_transform(embedding, x -> 0), ',') "
        "ELSE array_to_string(list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) / raw_scale + 0.5) AS BIGINT)), ',') END AS q8 "
        "FROM s",
    ),
    "q_token_count": (
        q_token_count,
        f"SELECT tok, count(*) AS n FROM (SELECT unnest({_TOKS}) AS tok FROM documents) "
        "GROUP BY tok ORDER BY n DESC, tok LIMIT 20",
    ),
    "q_text_stats": (
        q_text_stats,
        f"SELECT lang, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars, "
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars, "
        f"CAST(sum(len({_TOKS})) AS DOUBLE) / count(*) AS avg_tokens "
        "FROM documents GROUP BY lang",
    ),
    "q_quality_score": (
        q_quality_score,
        f"SELECT doc_id, len(l) AS n_tokens, "
        "round(len(list_distinct(l)) / len(l), 4) AS ttr, "
        "round(list_sum(list_transform(l, x -> length(x))) / len(l), 4) AS mean_tok_len, "
        "CAST(floor(((len(list_distinct(l)) / len(l)) * 0.5 + "
        "least((list_sum(list_transform(l, x -> length(x))) / len(l)) / 10.0, 1.0) * 0.5) "
        "* 10000) AS BIGINT) AS score_e4 "
        f"FROM (SELECT doc_id, {_TOKS} AS l FROM documents)",
    ),
    "q_lang_id": (q_lang_id, _LANG_ID_SQL),
    "q_udf_text": (
        q_udf_text,
        f"SELECT doc_id, len({_TOKS}) AS tok_cnt FROM documents",
    ),
    "q_multimodal_decode": (
        q_multimodal_decode,
        # mirrors fake_decode exactly: width = n%640+1, height = n%480+1,
        # checksum = md5 over the utf8 payload bytes
        "SELECT doc_id AS media_id, 'image' AS kind, "
        "octet_length(encode(text)) AS n_bytes, "
        "octet_length(encode(text)) % 640 + 1 AS width, "
        "octet_length(encode(text)) % 480 + 1 AS height, "
        "md5(text) AS checksum FROM documents",
    ),
    "q_binary_meta": (
        q_binary_meta,
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS digest "
        "FROM documents",
    ),
    "q_sample_hash": (
        q_sample_hash,
        f"SELECT doc_id, lang, source FROM documents "
        f"WHERE {_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 100 < 10",
    ),
    "q_stratified_sample": (
        q_stratified_sample,
        f"SELECT doc_id, lang FROM documents "
        f"WHERE {_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 100 < "
        "(CASE WHEN lang = 'en' THEN 10 ELSE 40 END)",
    ),
    "q_train_test_split": (
        q_train_test_split,
        "SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' "
        "ELSE 'test' END AS split, lang, count(*) AS n FROM ("
        f"SELECT {_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 100 AS b, lang "
        "FROM documents) GROUP BY split, lang",
    ),
    "q_shard_assign": (
        q_shard_assign,
        f"SELECT {_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 8 AS shard, "
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY shard",
    ),
    "q_decontaminate": (
        q_decontaminate,
        "WITH t AS (SELECT doc_id, source, lang, "
        + _TOKS.replace("text", "text")
        + " AS l FROM documents), "
        "grams AS (SELECT doc_id, source, "
        "unnest([array_to_string(l[i:i+4], ' ') for i in range(1, len(l) - 3)]) AS g "
        "FROM t), "
        "bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'), "
        "bad AS (SELECT DISTINCT doc_id FROM grams WHERE source <> 'src0' "
        "AND g IN (SELECT g FROM bench)) "
        "SELECT doc_id, lang FROM documents WHERE source <> 'src0' "
        "AND doc_id NOT IN (SELECT doc_id FROM bad)",
    ),
    "q_contamination_report": (
        q_contamination_report,
        f"WITH t AS (SELECT doc_id, source, {_TOKS} AS l FROM documents), "
        "g AS (SELECT DISTINCT doc_id, source, "
        "unnest([array_to_string(l[i:i+4], ' ') for i in range(1, len(l) - 3)]) AS g "
        "FROM t), "
        "hits AS (SELECT b.doc_id AS bench_id, "
        "count(DISTINCT c.doc_id) AS n_docs_hit, "
        "count(DISTINCT c.g) AS n_grams_hit "
        "FROM g b JOIN g c ON b.g = c.g AND c.source <> 'src0' "
        "WHERE b.source = 'src0' GROUP BY b.doc_id) "
        "SELECT d.doc_id AS bench_id, "
        "CAST(coalesce(h.n_docs_hit, 0) AS BIGINT) AS n_docs_hit, "
        "CAST(coalesce(h.n_grams_hit, 0) AS BIGINT) AS n_grams_hit "
        "FROM documents d LEFT JOIN hits h ON d.doc_id = h.bench_id "
        "WHERE d.source = 'src0'",
    ),
    "q_ngram_novelty": (
        q_ngram_novelty,
        f"WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents), "
        "g AS (SELECT DISTINCT doc_id, "
        "unnest([array_to_string(l[i:i+2], ' ') for i in range(1, len(l) - 1)]) AS g "
        "FROM t), "
        "f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY g), "
        "per AS (SELECT g.doc_id, count(*) AS n_grams, "
        "sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel "
        "FROM g JOIN f USING (g) GROUP BY g.doc_id) "
        "SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, "
        "CAST(n_novel AS BIGINT) AS n_novel, "
        "round(CAST(n_novel AS DOUBLE) / n_grams, 4) AS novelty FROM per",
    ),
    "q_graph_degree": (
        q_graph_degree,
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id), "
        "deg AS (SELECT doc_id, count(*) AS degree FROM "
        "(SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b FROM pairs) "
        "GROUP BY doc_id) "
        "SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree",
    ),
    "q_fuzzy_join": (
        q_fuzzy_join,
        "SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, "
        "a.p_name AS name_a, b.p_name AS name_b, "
        "levenshtein(a.p_name, b.p_name) AS dist FROM part a JOIN part b "
        "ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1) "
        "AND a.p_partkey < b.p_partkey "
        "WHERE levenshtein(a.p_name, b.p_name) <= 2",
    ),
    "q_doc_chunks": (
        q_doc_chunks,
        "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks "
        "FROM documents), "
        "s AS (SELECT doc_id, toks, unnest(generate_series(1, "
        "greatest(len(toks) - 2, 1), 6)) AS st FROM t) "
        "SELECT doc_id, CAST((st - 1) // 6 AS INTEGER) AS chunk_idx, "
        "array_to_string(list_slice(toks, st, st + 7), ' ') AS chunk, "
        "len(list_slice(toks, st, st + 7)) AS n_tok FROM s",
    ),
    "q_batch_padding": (
        q_batch_padding,
        "WITH d AS (SELECT doc_id, source, "
        "len(string_split(trim(text), ' ')) AS n_tok FROM documents), "
        "a AS (SELECT source, n_tok, (row_number() OVER "
        "(PARTITION BY source ORDER BY doc_id) - 1) // 8 AS b FROM d), "
        "pa AS (SELECT source, b, count(*) AS n, max(n_tok) AS mx, "
        "CAST(sum(n_tok) AS BIGINT) AS s FROM a GROUP BY source, b), "
        "ra AS (SELECT 'arrival' AS strategy, "
        "CAST(count(*) AS BIGINT) AS n_batches, "
        "CAST(sum(mx * n) AS BIGINT) AS padded_tokens, "
        "CAST(sum(s) AS BIGINT) AS real_tokens FROM pa), "
        "l AS (SELECT source, n_tok, (row_number() OVER "
        "(PARTITION BY source ORDER BY n_tok, doc_id) - 1) // 8 AS b "
        "FROM d), "
        "pl AS (SELECT source, b, count(*) AS n, max(n_tok) AS mx, "
        "CAST(sum(n_tok) AS BIGINT) AS s FROM l GROUP BY source, b), "
        "rl AS (SELECT 'length_sorted' AS strategy, "
        "CAST(count(*) AS BIGINT) AS n_batches, "
        "CAST(sum(mx * n) AS BIGINT) AS padded_tokens, "
        "CAST(sum(s) AS BIGINT) AS real_tokens FROM pl) "
        "SELECT strategy, n_batches, padded_tokens, real_tokens, "
        "((padded_tokens - real_tokens) * 10000) // padded_tokens "
        "AS waste_bp FROM (SELECT * FROM ra UNION ALL SELECT * FROM rl)",
    ),
    "q_rouge_overlap": (
        q_rouge_overlap,
        "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS l "
        "FROM documents), "
        "c1 AS (SELECT doc_id, g, count(*) AS c FROM "
        "(SELECT doc_id, unnest(l) AS g FROM t) GROUP BY doc_id, g), "
        "c2 AS (SELECT doc_id, g, count(*) AS c FROM "
        "(SELECT doc_id, unnest([array_to_string(l[i:i+1], ' ') "
        "for i in range(1, len(l))]) AS g FROM t) GROUP BY doc_id, g), "
        "pairs AS (SELECT r.doc_id FROM t r JOIN t c "
        "ON c.doc_id = r.doc_id + 1), "
        "ov1 AS (SELECT a.doc_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov "
        "FROM c1 a JOIN c1 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g "
        "GROUP BY a.doc_id), "
        "d1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM c1 "
        "GROUP BY doc_id), "
        "r1 AS (SELECT p.doc_id, (coalesce(ov.ov, 0) * 10000) // d.tot "
        "AS rouge1_e4 FROM pairs p JOIN d1 d USING (doc_id) "
        "LEFT JOIN ov1 ov USING (doc_id)), "
        "ov2 AS (SELECT a.doc_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov "
        "FROM c2 a JOIN c2 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g "
        "GROUP BY a.doc_id), "
        "d2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot FROM c2 "
        "GROUP BY doc_id), "
        "r2 AS (SELECT p.doc_id, (coalesce(ov.ov, 0) * 10000) // d.tot "
        "AS rouge2_e4 FROM pairs p JOIN d2 d USING (doc_id) "
        "LEFT JOIN ov2 ov USING (doc_id)) "
        "SELECT r1.doc_id, rouge1_e4, rouge2_e4 FROM r1 JOIN r2 USING (doc_id)",
    ),
    "q_kmeans": (q_kmeans, _KMEANS_SQL),
    "q_topic_labels": (q_topic_labels, _TOPIC_LABELS_SQL),
    "q_inverted_index": (
        q_inverted_index,
        "WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM "
        "(SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term "
        "FROM documents) GROUP BY doc_id, term) "
        "SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf, "
        "string_agg(CAST(doc_id AS VARCHAR), '|' ORDER BY doc_id) AS postings, "
        "string_agg(CAST(tf AS VARCHAR), '|' ORDER BY doc_id) AS tfs "
        "FROM tf GROUP BY term ORDER BY df, term LIMIT 20",
    ),
    "q_tfidf_top": (
        q_tfidf_top,
        "WITH tf AS (SELECT doc_id, tok, count(*) AS tf FROM "
        "(SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok "
        "FROM documents) GROUP BY doc_id, tok), "
        "dfreq AS (SELECT tok, count(*) AS dfreq FROM tf GROUP BY tok), "
        "scored AS (SELECT doc_id, tok, round(tf * ln("
        "CAST((SELECT count(*) FROM documents) AS DOUBLE) / dfreq), 6) AS score "
        "FROM tf JOIN dfreq USING (tok)) "
        "SELECT doc_id, tok, score, rn FROM (SELECT doc_id, tok, score, "
        "row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn "
        "FROM scored) WHERE rn <= 3",
    ),
    "q_gopher_repetition": (
        q_gopher_repetition,
        "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t "
        "FROM documents), "
        "tok_stats AS (SELECT doc_id, sum(c) AS n_tok, max(c) AS top_tok_c "
        "FROM (SELECT doc_id, tok, count(*) AS c FROM "
        "(SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok) "
        "GROUP BY doc_id), "
        "big_stats AS (SELECT doc_id, sum(c) AS n_big, max(c) AS top_big_c "
        "FROM (SELECT doc_id, bigram, count(*) AS c FROM "
        "(SELECT doc_id, unnest(list_transform(range(1, len(t)), "
        "i -> t[i] || ' ' || t[i + 1])) AS bigram FROM toks WHERE len(t) >= 2) "
        "GROUP BY doc_id, bigram) GROUP BY doc_id) "
        "SELECT tok_stats.doc_id, "
        "round(top_tok_c / CAST(n_tok AS DOUBLE), 4) AS top_tok_frac, "
        "round(top_big_c / CAST(n_big AS DOUBLE), 4) AS top_big_frac, "
        "CAST(top_tok_c / CAST(n_tok AS DOUBLE) <= 0.2 "
        "AND top_big_c / CAST(n_big AS DOUBLE) <= 0.1 AS INTEGER) AS keep "
        "FROM tok_stats JOIN big_stats USING (doc_id)",
    ),
    "q_pii_scrub": (
        q_pii_scrub,
        "SELECT c_custkey, regexp_replace(regexp_replace("
        "c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com>', "
        "'[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'), "
        "'[0-9]+', '<NUM>', 'g') AS scrubbed FROM customer",
    ),
    "q_unigram_logprob": (
        q_unigram_logprob,
        "WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) "
        "AS tok FROM documents), "
        "vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok), "
        "t AS (SELECT sum(c) AS n_total FROM vocab) "
        "SELECT doc_id, round(avg(-ln(c / CAST(n_total AS DOUBLE))), 4) "
        "AS avg_nll, count(*) AS n_tok "
        "FROM tok JOIN vocab USING (tok) CROSS JOIN t GROUP BY doc_id",
    ),
    "q_chunk_dedup": (
        q_chunk_dedup,
        "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks "
        "FROM documents), "
        "s AS (SELECT doc_id, toks, unnest(generate_series(1, "
        "greatest(len(toks) - 2, 1), 6)) AS st FROM t), "
        "chunks AS (SELECT doc_id, CAST((st - 1) // 6 AS INTEGER) "
        "AS chunk_idx, array_to_string(list_slice(toks, st, st + 7), ' ') "
        "AS chunk FROM s) "
        "SELECT md5(chunk) AS chunk_hash, count(*) AS n_occurrences, "
        "(min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx))).doc_id "
        "AS keep_doc_id, "
        "(min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx))).chunk_idx "
        "AS keep_chunk_idx "
        "FROM chunks GROUP BY md5(chunk) HAVING count(*) > 1",
    ),
    "q_mix_weights": (
        q_mix_weights,
        "WITH per_src AS (SELECT source, count(*) AS n_docs FROM documents "
        "GROUP BY source), "
        "t AS (SELECT sum(n_docs) AS n_total, count(*) AS k FROM per_src) "
        "SELECT source, n_docs, "
        "round(n_total / CAST(k * n_docs AS DOUBLE), 4) AS weight "
        "FROM per_src CROSS JOIN t",
    ),
    "q_remove_dup_spans": (
        q_remove_dup_spans,
        "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks "
        "FROM documents), "
        "s AS (SELECT doc_id, toks, unnest(generate_series(1, "
        "greatest(len(toks), 1), 8)) AS st FROM t), "
        "b AS (SELECT doc_id, CAST((st - 1) // 8 AS BIGINT) AS block_idx, "
        "array_to_string(list_slice(toks, st, st + 7), ' ') AS block FROM s), "
        "k AS (SELECT doc_id, block_idx, block, "
        "min(struct_pack(doc_id := doc_id, block_idx := block_idx)) "
        "OVER (PARTITION BY block) AS kp FROM b), "
        "kept AS (SELECT doc_id, block_idx, block FROM k "
        "WHERE kp.doc_id = doc_id AND kp.block_idx = block_idx), "
        "agg AS (SELECT doc_id, string_agg(block, ' ' ORDER BY block_idx) "
        "AS ct, count(*) AS nk FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.ct, '') AS cleaned_text, "
        "coalesce(a.nk, 0) AS n_blocks_kept "
        "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id",
    ),
    "q_hybrid_rrf": (
        q_hybrid_rrf,
        # dense CTE = q_cosine_topk's oracle at k=20; lex CTE = the BM25
        # oracle at k=20 (nested WITH is legal in a CTE body)
        "WITH dense AS (WITH q AS (SELECT embedding AS qv FROM embeddings "
        "WHERE vec_id = 0), "
        "n AS (SELECT sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)))) AS qnorm FROM q) "
        f"SELECT a.vec_id AS id, round({_DOT} / "
        "(sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) "
        "* n.qnorm), 4) AS cos_sim "
        "FROM embeddings a, q, n WHERE a.vec_id <> 0 "
        "ORDER BY cos_sim DESC, a.vec_id LIMIT 20), "
        "dr AS (SELECT id, row_number() OVER (ORDER BY cos_sim DESC, id) AS rd "
        "FROM dense), "
        f"lex AS ({_bm25_sql(_BM25_TERMS, k=20)}), "
        "lr AS (SELECT doc_id AS id, row_number() OVER "
        "(ORDER BY score DESC, doc_id) AS rl FROM lex) "
        "SELECT id, coalesce(CAST(1.0 AS DOUBLE) / (60 + rd), "
        "CAST(0.0 AS DOUBLE)) + coalesce(CAST(1.0 AS DOUBLE) / (60 + rl), "
        "CAST(0.0 AS DOUBLE)) AS rrf_score "
        "FROM dr FULL OUTER JOIN lr USING (id) "
        "ORDER BY rrf_score DESC, id LIMIT 10",
    ),
    "q_pca_project": (q_pca_project, _PCA_SQL),
    "q_bpe_tokenize": (q_bpe_tokenize, _BPE_SQL),
    "q_bpe_train": (q_bpe_train, _BPE_TRAIN_SQL),
    "q_bigram_logprob": (q_bigram_logprob, _BIGRAM_NLL_SQL),
    "q_rp_project": (
        q_rp_project,
        "WITH v AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS vec FROM embeddings), "
        "pl AS (SELECT j.j, list(('0x' || substr(md5('rp' || j.j || '|' || i.i), "
        "1, 4))::BIGINT / 65536.0 - 0.5 ORDER BY i.i) AS wv "
        "FROM range(0, 16) j(j) CROSS JOIN range(0, 64) i(i) GROUP BY j.j) "
        "SELECT v.vec_id, pl.j AS j, round(list_reduce(list_prepend("
        "CAST(0.0 AS DOUBLE), list_transform(range(1, 65), "
        "i -> v.vec[i] * pl.wv[i])), (acc, x) -> acc + x), 4) + 0 AS val "
        "FROM v CROSS JOIN pl",
    ),

    "q_domain_cap_scaled": (
        q_domain_cap_scaled,
        # same oracle as q_domain_cap: the scale path must be
        # indistinguishable from the semantic spec
        "SELECT source, doc_id, rk FROM (SELECT source, doc_id, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk "
        "FROM documents) WHERE rk <= 15",
    ),
    "q_domain_cap": (
        q_domain_cap,
        "SELECT source, doc_id, rk FROM (SELECT source, doc_id, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk "
        "FROM documents) WHERE rk <= 15",
    ),
    "q_bm25": (
        q_bm25,
        _BM25_SQL,
    ),
    "q_dsir_weights": (
        q_dsir_weights,
        "WITH tok AS (SELECT doc_id, source, "
        f"{_H28_SQL.format(x='t')} % 64 AS b FROM "
        f"(SELECT doc_id, source, unnest({_TOKS}) AS t FROM documents)), "
        "tgt AS (SELECT b, count(*) AS ct FROM tok WHERE source = 'src0' "
        "GROUP BY b), "
        "raw AS (SELECT b, count(*) AS cr FROM tok WHERE source <> 'src0' "
        "GROUP BY b), "
        "nt AS (SELECT sum(ct) AS n_tgt FROM tgt), "
        "nr AS (SELECT sum(cr) AS n_raw FROM raw), "
        "db AS (SELECT doc_id, b, count(*) AS c FROM tok "
        "WHERE source <> 'src0' GROUP BY doc_id, b), "
        "per AS (SELECT doc_id, b, "
        "c * (ln(CAST(coalesce(ct, 0) + 1 AS DOUBLE) / "
        "CAST(n_tgt + 64 AS DOUBLE)) - "
        "ln(CAST(coalesce(cr, 0) + 1 AS DOUBLE) / "
        "CAST(n_raw + 64 AS DOUBLE))) AS contrib "
        "FROM db LEFT JOIN tgt USING (b) LEFT JOIN raw USING (b) "
        "CROSS JOIN nt CROSS JOIN nr) "
        # list_prepend(0.0, ...) + list_reduce = the same sequential
        # 0.0-seeded left fold as Spark's F.aggregate over array_sort
        "SELECT doc_id, round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(contrib ORDER BY b)), (acc, x) -> acc + x), 4) + 0 AS log_weight "
        "FROM per GROUP BY doc_id",
    ),
    "q_pack_sequences": (
        q_pack_sequences,
        "WITH d AS (SELECT doc_id, source, "
        "len(string_split(trim(text), ' ')) AS n_tok FROM documents), "
        "b AS (SELECT source, doc_id, n_tok, "
        "CAST((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok) // 512 "
        "AS BIGINT) AS bin FROM d) "
        "SELECT source, bin, count(*) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS total_tokens "
        "FROM b GROUP BY source, bin",
    ),
    "q_dup_rate_by_source": (
        q_dup_rate_by_source,
        # the verified-pairs oracle nests as a FROM-subquery (per-subquery
        # CTE scoping, same trick as q_ann_recall)
        f"WITH ids AS (SELECT id_a AS doc_id FROM ({_NEARDUP_VERIFIED_SQL}) nv1 "
        f"UNION SELECT id_b FROM ({_NEARDUP_VERIFIED_SQL}) nv2) "
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM ids) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_dup, "
        "(CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM ids) THEN 1 ELSE 0 END) "
        "AS BIGINT) * 10000) // count(*) AS dup_rate_bp "
        "FROM documents GROUP BY source",
    ),
    "q_export_manifest": (
        q_export_manifest,
        f"SELECT {_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} % 8 AS shard, "
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "min(doc_id) AS min_id, max(doc_id) AS max_id, "
        f"CAST(sum({_H28_SQL.format(x='text')}) AS BIGINT) % 1099511627776 "
        "AS content_checksum FROM documents GROUP BY shard",
    ),
    "q_ann_recall": (
        q_ann_recall,
        # each retriever's full oracle nests as a FROM-subquery (DuckDB
        # scopes WITH clauses per subquery, so their CTE names cannot
        # collide); recall is hits * 1000 basis points at k = 10
        f"SELECT method, hits, hits * 1000 AS recall_bp FROM ("
        f"SELECT 'lsh' AS method, count(*) AS hits FROM ({_ANN_LSH_SQL}) l "
        f"WHERE l.vec_id IN (SELECT vec_id FROM ({_COSINE_TOPK_SQL}) x1) "
        f"UNION ALL "
        f"SELECT 'ivf', count(*) FROM ({_ANN_IVF_SQL}) v "
        f"WHERE v.vec_id IN (SELECT vec_id FROM ({_COSINE_TOPK_SQL}) x2) "
        f"UNION ALL "
        f"SELECT 'ivfpq', count(*) FROM ({_ANN_IVFPQ_SQL}) p "
        f"WHERE p.vec_id IN (SELECT vec_id FROM ({_COSINE_TOPK_SQL}) x3))",
    ),
    "q_tokenizer_fertility": (
        q_tokenizer_fertility,
        f"WITH d AS (SELECT lang, list_filter({_TOKS}, t -> t <> '') AS toks "
        "FROM documents), "
        "tok AS (SELECT lang, unnest(toks) AS t FROM d), "
        f"u AS (SELECT lang, len({_bpe_fold_expr()}) AS nu FROM tok) "
        "SELECT lang, count(*) AS n_tokens, CAST(sum(nu) AS BIGINT) AS n_units, "
        "(CAST(sum(nu) AS BIGINT) * 10000) // count(*) AS fertility_e4 "
        "FROM u GROUP BY lang",
    ),
    "q_maxsim": (
        q_maxsim,
        "WITH q AS (SELECT vec_id AS q_id, embedding AS qv, "
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS qn "
        "FROM embeddings WHERE label = 0), "
        "d AS (SELECT label AS doc_label, embedding AS dv, "
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS dn "
        "FROM embeddings WHERE label > 0), "
        "s AS (SELECT doc_label, q_id, "
        "max(list_sum(list_transform(range(1, 65), "
        "i -> CAST(dv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) / (dn * qn)) AS best "
        "FROM d CROSS JOIN q GROUP BY doc_label, q_id) "
        "SELECT doc_label, "
        "CAST(sum(CAST(floor(best * 1000000) AS BIGINT)) AS BIGINT) AS maxsim_e6, "
        "count(*) AS n_query_vecs FROM s GROUP BY doc_label",
    ),
    "q_maxsim_blas": (
        q_maxsim_blas,
        "WITH q AS (SELECT vec_id AS q_id, embedding AS qv, "
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS qn "
        "FROM embeddings WHERE label = 0), "
        "d AS (SELECT label AS doc_label, embedding AS dv, "
        "sqrt(list_sum(list_transform(range(1, 65), "
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS dn "
        "FROM embeddings WHERE label > 0), "
        "s AS (SELECT doc_label, q_id, "
        "max(list_sum(list_transform(range(1, 65), "
        "i -> CAST(dv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) / (dn * qn)) AS best "
        "FROM d CROSS JOIN q GROUP BY doc_label, q_id) "
        # + 1e-9 mirrors the Spark side's deterministic off-grid nudge
        "SELECT doc_label, round(sum(best) + 1e-9, 2) AS maxsim_r2, "
        "CAST(count(*) AS INT) AS n_query_vecs FROM s GROUP BY doc_label",
    ),
    "q_fasttext_score": (
        q_fasttext_score,
        f"WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents), "
        "b AS (SELECT doc_id, list_transform("
        "range(1, greatest(len(l) - 1, 0) + 1), "
        "i -> l[i] || ' ' || l[i + 1]) AS bgs FROM t), "
        "f AS (SELECT doc_id, len(bgs) AS n_feat, "
        "list_sum(list_transform(bgs, "
        f"g -> ({_H28_SQL.format(x='g')} % 1024) % 21 - 10)) AS margin FROM b) "
        "SELECT doc_id, n_feat, "
        "CAST(coalesce(margin, 0) AS BIGINT) AS margin, "
        "CASE WHEN coalesce(margin, 0) >= 0 THEN 1 ELSE 0 END AS keep FROM f",
    ),
    "q_priority_sample": (
        q_priority_sample,
        "WITH t AS (SELECT doc_id, n_chars AS weight, "
        "(CAST(n_chars AS DOUBLE) * 268435456.0) / "
        f"CAST({_H28_SQL.format(x='CAST(doc_id AS VARCHAR)')} + 1 AS DOUBLE) "
        "AS prio FROM documents), "
        "r AS (SELECT doc_id, weight, prio, "
        "row_number() OVER (ORDER BY prio DESC, doc_id) AS rn FROM t), "
        "tau AS (SELECT prio AS tau FROM r WHERE rn = 51) "
        "SELECT doc_id, weight, round(prio, 4) AS priority, "
        "round(greatest(CAST(weight AS DOUBLE), tau), 4) AS est_weight "
        "FROM r CROSS JOIN tau WHERE rn <= 50",
    ),
    "q_dataset_diff": (
        q_dataset_diff,
        "WITH v1 AS (SELECT doc_id, source, md5(text) AS h1 FROM documents), "
        "v2 AS (SELECT doc_id, "
        "md5(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS h2 "
        "FROM documents WHERE n_chars >= 100) "
        "SELECT source, CASE WHEN h2 IS NULL THEN 'removed' "
        "WHEN h1 = h2 THEN 'unchanged' ELSE 'changed' END AS status, "
        "count(*) AS n_docs FROM v1 LEFT JOIN v2 USING (doc_id) "
        "GROUP BY source, status",
    ),
    "q_curriculum": (
        q_curriculum,
        f"WITH t AS (SELECT doc_id, lang, {_TOKS} AS l FROM documents), "
        "s AS (SELECT doc_id, lang, len(l) AS n_tok, "
        "CAST(floor(((len(list_distinct(l)) / len(l)) * 0.5 + "
        "least((list_sum(list_transform(l, x -> length(x))) / len(l)) / 10.0, 1.0) "
        "* 0.5) * 10000) AS BIGINT) AS score_e4 FROM t), "
        "p AS (SELECT lang, n_tok, score_e4, "
        "ntile(4) OVER (PARTITION BY lang "
        "ORDER BY score_e4 NULLS LAST, doc_id) AS phase "
        "FROM s) "
        "SELECT lang, phase, count(*) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS total_tokens, "
        "min(score_e4) AS min_score, max(score_e4) AS max_score "
        "FROM p GROUP BY lang, phase",
    ),
    "q_edit_distance": (
        q_edit_distance,
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id) "
        ", ct AS (SELECT doc_id, "
        "regexp_replace(substr(text, 1, 4096), '[^ -~]', '?', 'g') AS t "
        "FROM documents) "
        "SELECT id_a, id_b, "
        "CAST(levenshtein(da.t, db.t) AS BIGINT) AS dist, "
        "((greatest(length(da.t), length(db.t)) "
        "- levenshtein(da.t, db.t)) "
        "* 10000) // greatest(length(da.t), length(db.t)) AS sim_bp "
        "FROM pairs p JOIN ct da ON da.doc_id = p.id_a "
        "JOIN ct db ON db.doc_id = p.id_b",
    ),
    "q_cdc_chunks": (
        q_cdc_chunks,
        f"WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents), "
        "b AS (SELECT doc_id, l, list_filter(range(1, len(l)), "
        f"i -> {_H28_SQL.format(x='l[i]')} % 16 = 0) AS bp FROM t), "
        "c AS (SELECT doc_id, len(l) AS n_tok, "
        "list_prepend(0, bp) AS st, list_append(bp, len(l)) AS en FROM b), "
        "lens AS (SELECT doc_id, n_tok, list_transform(range(1, len(st) + 1), "
        "i -> en[i] - st[i]) AS ls FROM c) "
        "SELECT doc_id, n_tok, len(ls) AS n_chunks, "
        "list_max(ls) AS max_chunk, list_min(ls) AS min_chunk FROM lens",
    ),
    "q_temperature_mix": (
        q_temperature_mix,
        f"WITH per AS (SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) "
        "AS n_tokens FROM documents GROUP BY source), "
        "s AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sq "
        "FROM per), "
        "d AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(sq ORDER BY source)), (a, x) -> a + x) AS denom FROM s) "
        "SELECT source, n_tokens, "
        "CAST(floor(sq / denom * 1000000.0) AS BIGINT) AS weight_e6 "
        "FROM s CROSS JOIN d",
    ),
    "q_vocab_coverage": (
        q_vocab_coverage,
        f"WITH tf AS (SELECT tok, count(*) AS n FROM "
        f"(SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY tok), "
        "r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS r, "
        "CAST(sum(n) OVER (ORDER BY n DESC, tok ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM tf), "
        "t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tf) "
        "SELECT max(r.r) AS vocab_size, max(tot) AS n_tokens, "
        "min(CASE WHEN cum * 10 >= tot * 9 THEN r.r END) AS v90, "
        "min(CASE WHEN cum * 100 >= tot * 99 THEN r.r END) AS v99 "
        "FROM r CROSS JOIN t",
    ),
    "q_perplexity_bucket": (
        q_perplexity_bucket,
        f"WITH nll AS (SELECT * FROM ({_BIGRAM_NLL_SQL}) x), "
        "j AS (SELECT d.lang, nll.avg_nll, nll.n_bigrams, "
        "ntile(3) OVER (PARTITION BY d.lang "
        "ORDER BY nll.avg_nll, nll.doc_id) AS bucket "
        "FROM nll JOIN documents d USING (doc_id)) "
        "SELECT lang, bucket, count(*) AS n_docs, min(avg_nll) AS lo, "
        "max(avg_nll) AS hi, CAST(sum(n_bigrams) AS BIGINT) AS total_bigrams "
        "FROM j GROUP BY lang, bucket",
    ),
    "q_cluster_canonical": (
        q_cluster_canonical,
        _MINHASH_SIG_CTE.format(nperm=8).replace("WITH ", "WITH RECURSIVE ", 1)
        + ", bands AS (SELECT doc_id, b, md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b FROM bands a "
        "JOIN bands c ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "cc AS (SELECT doc_id AS node, doc_id AS label FROM documents "
        "UNION SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src), "
        "comp AS (SELECT node AS doc_id, min(label) AS component "
        "FROM cc GROUP BY node), "
        "rk AS (SELECT comp.component, comp.doc_id, documents.n_chars, "
        "row_number() OVER (PARTITION BY component "
        "ORDER BY n_chars DESC, comp.doc_id) AS rn, "
        "count(*) OVER (PARTITION BY component) AS n_members "
        "FROM comp JOIN documents USING (doc_id)) "
        "SELECT component, n_members, doc_id AS canonical_id, "
        "n_chars AS kept_chars FROM rk WHERE rn = 1 AND n_members >= 2",
    ),
    "q_mmr_rerank": (
        q_mmr_rerank,
        # three unrolled greedy rounds: r1 = plain argmax, r2/r3 subtract
        # the max pair-sim to the already-selected set; every score is an
        # e6 fixed-point BIGINT so the greedy argmax is integer-exact
        "WITH v AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS vec FROM embeddings), "
        "n AS (SELECT vec_id, vec, sqrt(list_sum(list_transform("
        "range(1, 65), i -> vec[i] * vec[i]))) AS nrm FROM v), "
        "q AS (SELECT vec_id AS qid, vec AS qv, nrm AS qn FROM n "
        "WHERE vec_id < 3), "
        # n.nrm > 0 / q.qn > 0 mirror the Spark isNotNull(cos_e6) filter:
        # a zero-norm embedding makes cosine NULL on both engines, and the
        # oracle must not let a NULL-scored row enter the candidate pool
        "s0 AS (SELECT q.qid, n.vec_id, CAST(floor(list_sum("
        "list_transform(range(1, 65), i -> n.vec[i] * q.qv[i])) "
        "/ (n.nrm * q.qn) * 1000000) AS BIGINT) AS cos_e6 "
        "FROM n CROSS JOIN q WHERE n.vec_id >= 3 "
        "AND n.nrm > 0 AND q.qn > 0), "
        "cand AS (SELECT qid, vec_id, cos_e6 FROM (SELECT qid, vec_id, "
        "cos_e6, row_number() OVER (PARTITION BY qid "
        "ORDER BY cos_e6 DESC, vec_id) AS rn FROM s0) x WHERE rn <= 8), "
        "cv AS (SELECT c.qid, c.vec_id, c.cos_e6, n.vec, n.nrm "
        "FROM cand c JOIN n USING (vec_id)), "
        "ps AS (SELECT a.qid, a.vec_id AS id_a, b.vec_id AS id_b, "
        "CAST(floor(list_sum(list_transform(range(1, 65), "
        "i -> a.vec[i] * b.vec[i])) / (a.nrm * b.nrm) * 1000000) "
        "AS BIGINT) AS sim_e6 FROM cv a JOIN cv b "
        "ON a.qid = b.qid AND a.vec_id <> b.vec_id "
        "WHERE a.nrm > 0 AND b.nrm > 0), "
        "r1 AS (SELECT qid, vec_id, cos_e6 AS score_e6 FROM (SELECT qid, "
        "vec_id, cos_e6, row_number() OVER (PARTITION BY qid "
        "ORDER BY cos_e6 DESC, vec_id) AS rn FROM cand) x WHERE rn = 1), "
        "s2 AS (SELECT c.qid, c.vec_id, c.cos_e6 - p.sim_e6 AS score "
        "FROM cand c JOIN r1 ON c.qid = r1.qid AND c.vec_id <> r1.vec_id "
        "JOIN ps p ON p.qid = c.qid AND p.id_a = c.vec_id "
        "AND p.id_b = r1.vec_id), "
        "r2 AS (SELECT qid, vec_id, score AS score_e6 FROM (SELECT qid, "
        "vec_id, score, row_number() OVER (PARTITION BY qid "
        "ORDER BY score DESC, vec_id) AS rn FROM s2) x WHERE rn = 1), "
        "s3 AS (SELECT c.qid, c.vec_id, "
        "c.cos_e6 - greatest(p1.sim_e6, p2.sim_e6) AS score "
        "FROM cand c JOIN r1 ON c.qid = r1.qid AND c.vec_id <> r1.vec_id "
        "JOIN r2 ON c.qid = r2.qid AND c.vec_id <> r2.vec_id "
        "JOIN ps p1 ON p1.qid = c.qid AND p1.id_a = c.vec_id "
        "AND p1.id_b = r1.vec_id "
        "JOIN ps p2 ON p2.qid = c.qid AND p2.id_a = c.vec_id "
        "AND p2.id_b = r2.vec_id), "
        "r3 AS (SELECT qid, vec_id, score AS score_e6 FROM (SELECT qid, "
        "vec_id, score, row_number() OVER (PARTITION BY qid "
        "ORDER BY score DESC, vec_id) AS rn FROM s3) x WHERE rn = 1) "
        "SELECT qid, 1 AS mmr_rank, vec_id, score_e6 FROM r1 "
        "UNION ALL SELECT qid, 2 AS mmr_rank, vec_id, score_e6 FROM r2 "
        "UNION ALL SELECT qid, 3 AS mmr_rank, vec_id, score_e6 FROM r3",
    ),
    "q_template_detect": (
        q_template_detect,
        f"WITH t AS (SELECT source, array_to_string(l[1:2], ' ') "
        f"AS lead_bigram FROM (SELECT source, {_TOKS} AS l "
        "FROM documents) x WHERE length(array_to_string(l[1:2], ' ')) > 0), "
        "c AS (SELECT source, lead_bigram, count(*) AS n_docs "
        "FROM t GROUP BY 1, 2), "
        "r AS (SELECT source, lead_bigram, n_docs, "
        "row_number() OVER (PARTITION BY source "
        "ORDER BY n_docs DESC, lead_bigram) AS rn, "
        "CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS tot "
        "FROM c) "
        "SELECT source, lead_bigram, n_docs, "
        "(n_docs * 10000) // tot AS share_bp FROM r WHERE rn = 1",
    ),
    "q_lsh_tuning": (
        q_lsh_tuning,
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", b42 AS (SELECT doc_id, b, "
        "md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "p42 AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b "
        "FROM b42 a JOIN b42 c ON a.b = c.b AND a.bucket = c.bucket "
        "AND a.doc_id < c.doc_id), "
        "b24 AS (SELECT doc_id, b, "
        "md5(array_to_string(sigl[b*4+1:b*4+4], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 2)) AS b)), "
        "p24 AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b "
        "FROM b24 a JOIN b24 c ON a.b = c.b AND a.bucket = c.bucket "
        "AND a.doc_id < c.doc_id), "
        "e42 AS (SELECT CAST(list_sum(list_transform(range(1, 9), "
        "i -> CASE WHEN sa.sigl[i] = sb.sigl[i] THEN 1 ELSE 0 END)) * 1250 "
        "AS BIGINT) AS est_e4 FROM p42 p "
        "JOIN sig sa ON sa.doc_id = p.id_a "
        "JOIN sig sb ON sb.doc_id = p.id_b), "
        "e24 AS (SELECT CAST(list_sum(list_transform(range(1, 9), "
        "i -> CASE WHEN sa.sigl[i] = sb.sigl[i] THEN 1 ELSE 0 END)) * 1250 "
        "AS BIGINT) AS est_e4 FROM p24 p "
        "JOIN sig sa ON sa.doc_id = p.id_a "
        "JOIN sig sb ON sb.doc_id = p.id_b) "
        "SELECT 4 AS bands, 2 AS rows_per_band, count(*) AS n_pairs, "
        "COALESCE(CAST(sum(est_e4) AS BIGINT) // count(*), 0) "
        "AS mean_est_e4 FROM e42 "
        "UNION ALL SELECT 2 AS bands, 4 AS rows_per_band, "
        "count(*) AS n_pairs, "
        "COALESCE(CAST(sum(est_e4) AS BIGINT) // count(*), 0) "
        "AS mean_est_e4 FROM e24",
    ),
    "q_dup_threshold_curve": (
        q_dup_threshold_curve,
        _MINHASH_SIG_CTE.format(nperm=8)
        + ", bands AS (SELECT doc_id, b, "
        "md5(array_to_string(sigl[b*2+1:b*2+2], '|')) AS bucket "
        "FROM sig, (SELECT unnest(range(0, 4)) AS b)), "
        "pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b "
        "FROM bands a JOIN bands c ON a.b = c.b AND a.bucket = c.bucket "
        "AND a.doc_id < c.doc_id), "
        "jac AS (SELECT (len(list_intersect(da.sh, db.sh)) * 10000) // "
        "len(list_distinct(da.sh || db.sh)) AS jac_e4 FROM pairs p "
        "JOIN d da ON da.doc_id = p.id_a JOIN d db ON db.doc_id = p.id_b), "
        "g AS (SELECT unnest([5000, 6000, 7000, 8000, 9000]) "
        "AS threshold_e4) "
        "SELECT g.threshold_e4, "
        "CAST(sum(CASE WHEN jac.jac_e4 >= g.threshold_e4 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_dup_pairs, "
        "count(*) AS n_cand_pairs, "
        "(CAST(sum(CASE WHEN jac.jac_e4 >= g.threshold_e4 THEN 1 ELSE 0 END) "
        "AS BIGINT) * 10000) // count(*) AS dup_share_bp "
        "FROM jac CROSS JOIN g GROUP BY g.threshold_e4",
    ),
    "q_lang_confusion": (
        q_lang_confusion,
        f"WITH p AS (SELECT * FROM ({_LANG_ID_SQL}) x), "
        "c AS (SELECT true_lang, pred_lang, count(*) AS n FROM p "
        "GROUP BY 1, 2) "
        "SELECT true_lang, pred_lang, n, (n * 10000) // "
        "CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS share_bp "
        "FROM c",
    ),
    "q_ann_frontier": (
        q_ann_frontier,
        # per-branch WITH subqueries reuse the retrievers' own candidate
        # CTEs, so the counted set IS the scored set; the exact row's
        # hits and every recall denominator come from the exact scan
        # itself (no hard-coded k)
        f"WITH ne AS (SELECT CAST(count(*) AS BIGINT) AS n_exact "
        f"FROM ({_COSINE_TOPK_SQL}) x0) "
        "SELECT method, n_candidates, hits, "
        "CASE WHEN n_exact > 0 THEN (hits * 10000) // n_exact "
        "ELSE CAST(0 AS BIGINT) END AS recall_bp "
        "FROM ("
        "SELECT 'exact' AS method, "
        "(SELECT count(*) FROM embeddings WHERE vec_id <> 0) "
        "AS n_candidates, (SELECT n_exact FROM ne) AS hits "
        "UNION ALL "
        f"SELECT 'lsh', ({_ANN_LSH_CTES} SELECT count(*) FROM cand), "
        f"(SELECT count(*) FROM ({_ANN_LSH_SQL}) l WHERE l.vec_id IN "
        f"(SELECT vec_id FROM ({_COSINE_TOPK_SQL}) x1)) "
        "UNION ALL "
        f"SELECT 'ivf', ({_ANN_IVF_CTES} SELECT count(*) FROM cand), "
        f"(SELECT count(*) FROM ({_ANN_IVF_SQL}) v2 WHERE v2.vec_id IN "
        f"(SELECT vec_id FROM ({_COSINE_TOPK_SQL}) x2))"
        ") t CROSS JOIN ne",
    ),
    "q_quality_threshold_sweep": (
        q_quality_threshold_sweep,
        # the fasttext margin CTEs, swept over a 5-threshold grid
        f"WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents), "
        "b AS (SELECT doc_id, list_transform("
        "range(1, greatest(len(l) - 1, 0) + 1), "
        "i -> l[i] || ' ' || l[i + 1]) AS bgs FROM t), "
        "f AS (SELECT doc_id, CAST(coalesce(list_sum(list_transform(bgs, "
        f"g -> ({_H28_SQL.format(x='g')} % 1024) % 21 - 10)), 0) AS BIGINT) "
        "AS margin FROM b), "
        "g AS (SELECT unnest([-20, -10, 0, 10, 20]) AS threshold) "
        "SELECT g.threshold, "
        "CAST(sum(CASE WHEN f.margin >= g.threshold THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_keep, count(*) AS n_docs, "
        "(CAST(sum(CASE WHEN f.margin >= g.threshold THEN 1 ELSE 0 END) "
        "AS BIGINT) * 10000) // count(*) AS keep_bp "
        "FROM f CROSS JOIN g GROUP BY g.threshold",
    ),
    "q_embed_norm_audit": (
        q_embed_norm_audit,
        "WITH n AS (SELECT vec_id, CAST(floor(sqrt(list_sum(list_transform("
        "range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * "
        "CAST(embedding[i] AS DOUBLE)))) * 1000000) AS BIGINT) AS norm_e6 "
        "FROM embeddings), "
        "c AS (SELECT count(*) AS n_vecs, "
        "CAST(sum(CASE WHEN norm_e6 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_zero, min(norm_e6) AS min_norm_e6, "
        "max(norm_e6) AS max_norm_e6 FROM n), "
        "m AS (SELECT norm_e6 AS med_norm_e6 FROM (SELECT norm_e6, "
        "row_number() OVER (ORDER BY norm_e6, vec_id) AS rn FROM n) r "
        "CROSS JOIN c WHERE rn = (n_vecs + 1) // 2) "
        "SELECT n_vecs, n_zero, min_norm_e6, med_norm_e6, max_norm_e6 "
        "FROM c CROSS JOIN m",
    ),
    "q_frame_sample": (
        q_frame_sample,
        "WITH t AS (SELECT doc_id, text, "
        "greatest(1, length(text) // 4) AS step FROM documents "
        "WHERE length(text) > 0), "
        "f AS (SELECT doc_id AS media_id, CAST(g.i AS INTEGER) "
        "AS frame_index, substr(text, g.i * step + 1, step) AS fr "
        "FROM t, (SELECT unnest(range(0, 4)) AS i) g) "
        "SELECT media_id, frame_index, octet_length(encode(fr)) "
        "AS n_frame_bytes, md5(fr) AS frame_md5 FROM f",
    ),
    "q_length_deciles": (
        q_length_deciles,
        f"WITH d AS (SELECT doc_id, lang, len({_TOKS}) AS n_tok "
        "FROM documents), "
        "t AS (SELECT lang, n_tok, ntile(10) OVER (PARTITION BY lang "
        "ORDER BY n_tok, doc_id) AS decile FROM d) "
        "SELECT lang, decile, count(*) AS n_docs, min(n_tok) AS min_tok, "
        "max(n_tok) AS max_tok, CAST(sum(n_tok) AS BIGINT) "
        "AS total_tokens FROM t GROUP BY lang, decile",
    ),
    "q_source_hhi": (
        q_source_hhi,
        f"WITH per AS (SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) "
        "AS n_tok FROM documents GROUP BY source), "
        "t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot FROM per), "
        "sh AS (SELECT source, (n_tok * 10000) // tot AS share_bp "
        "FROM per CROSS JOIN t), "
        "h AS (SELECT count(*) AS n_sources, "
        "CAST(CAST(sum(share_bp * share_bp) AS BIGINT) // 10000 AS BIGINT) "
        "AS hhi_bp, max(share_bp) AS top_share_bp FROM sh) "
        "SELECT n_sources, hhi_bp, top_share_bp, "
        "(10000 * 10000) // hhi_bp AS effective_sources_e4 FROM h",
    ),
    "q_dataset_card": (
        q_dataset_card,
        f"WITH d AS (SELECT source, lang, len({_TOKS}) AS n_tok "
        "FROM documents), "
        "bl AS (SELECT source, lang, count(*) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d GROUP BY 1, 2), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY source "
        "ORDER BY n_docs DESC, lang) AS rn FROM bl) "
        "SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS total_tokens, "
        "CAST(sum(n_tokens) AS BIGINT) // CAST(sum(n_docs) AS BIGINT) "
        "AS mean_tokens, "
        "count(*) AS n_langs, "
        "max(CASE WHEN rn = 1 THEN lang END) AS top_lang, "
        "(CAST(max(CASE WHEN rn = 1 THEN n_docs END) AS BIGINT) * 10000) "
        "// CAST(sum(n_docs) AS BIGINT) AS top_lang_share_bp "
        "FROM r GROUP BY source",
    ),
    "q_token_budget": (
        q_token_budget,
        # temperature-mix oracle nested as a FROM-subquery, then exact
        # integer Hamilton rounding: floor shares + largest remainders
        f"WITH tm AS (SELECT source, weight_e6 FROM (WITH per AS ("
        f"SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens "
        "FROM documents GROUP BY source), "
        "s AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) "
        "AS sq FROM per), "
        "d AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list(sq ORDER BY source)), (a, x) -> a + x) AS denom FROM s) "
        "SELECT source, "
        "CAST(floor(sq / denom * 1000000.0) AS BIGINT) AS weight_e6 "
        "FROM s CROSS JOIN d) x), "
        "t AS (SELECT CAST(sum(weight_e6) AS BIGINT) AS W FROM tm), "
        "j AS (SELECT source, weight_e6, "
        "(10000000 * weight_e6) // W AS base, "
        "(10000000 * weight_e6) % W AS frac FROM tm CROSS JOIN t), "
        "rm AS (SELECT 10000000 - CAST(sum(base) AS BIGINT) AS R FROM j), "
        "rk AS (SELECT *, row_number() OVER (ORDER BY frac DESC, source) "
        "AS rk FROM j) "
        "SELECT source, weight_e6, "
        "CAST(base + CASE WHEN rk.rk <= rm.R THEN 1 ELSE 0 END AS BIGINT) "
        "AS alloc_tokens FROM rk CROSS JOIN rm",
    ),
    "q_kn_bigram": (
        q_kn_bigram,
        f"WITH d AS (SELECT doc_id, {_TOKS} AS t FROM documents), "
        "bg AS (SELECT t[i] AS a, t[i + 1] AS b FROM "
        "(SELECT t, unnest(range(1, len(t))) AS i FROM d "
        "WHERE len(t) >= 2) x), "
        "cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2), "
        "ctx AS (SELECT a, count(*) AS c_a, count(DISTINCT b) AS n1a "
        "FROM bg GROUP BY 1), "
        "cont AS (SELECT b, count(DISTINCT a) AS cb FROM bg GROUP BY 1), "
        "nt AS (SELECT count(*) AS ntypes FROM cab) "
        "SELECT a, b, c_ab, "
        "(1000000 * ((4 * c_ab - 3) * ntypes + 3 * n1a * cb)) "
        "// (4 * c_a * ntypes) AS kn_e6 "
        "FROM cab JOIN ctx USING (a) JOIN cont USING (b) CROSS JOIN nt "
        "ORDER BY c_ab DESC, a, b LIMIT 20",
    ),
    "q_ann_ndcg": (
        q_ann_ndcg,
        # same nested-retriever composition as q_ann_recall; the
        # position-discount weights and the ideal-DCG constant 29966086
        # are the SAME integer literals the Spark side pins
        "SELECT method, dcg_e6, (dcg_e6 * 10000) // 29966086 AS ndcg_bp "
        "FROM ("
        "SELECT 'lsh' AS method, "
        "CAST(coalesce(sum(coalesce(r.rel, 0) * w.wt), 0) AS BIGINT) "
        "AS dcg_e6 FROM (SELECT vec_id, row_number() OVER "
        f"(ORDER BY cos_sim DESC, vec_id) AS p FROM ({_ANN_LSH_SQL}) l) pos "
        "JOIN (VALUES (1, 1000000), (2, 630929), (3, 500000), "
        "(4, 430676), (5, 386852), (6, 356207), (7, 333333), "
        "(8, 315464), (9, 301029), (10, 289064)) w(p, wt) "
        "ON w.p = pos.p "
        "LEFT JOIN (SELECT vec_id, 11 - row_number() OVER "
        "(ORDER BY cos_sim DESC, vec_id) AS rel "
        f"FROM ({_COSINE_TOPK_SQL}) x1) r ON r.vec_id = pos.vec_id "
        "UNION ALL "
        "SELECT 'ivf' AS method, "
        "CAST(coalesce(sum(coalesce(r.rel, 0) * w.wt), 0) AS BIGINT) "
        "AS dcg_e6 FROM (SELECT vec_id, row_number() OVER "
        f"(ORDER BY cos_sim DESC, vec_id) AS p FROM ({_ANN_IVF_SQL}) v) pos "
        "JOIN (VALUES (1, 1000000), (2, 630929), (3, 500000), "
        "(4, 430676), (5, 386852), (6, 356207), (7, 333333), "
        "(8, 315464), (9, 301029), (10, 289064)) w(p, wt) "
        "ON w.p = pos.p "
        "LEFT JOIN (SELECT vec_id, 11 - row_number() OVER "
        "(ORDER BY cos_sim DESC, vec_id) AS rel "
        f"FROM ({_COSINE_TOPK_SQL}) x2) r ON r.vec_id = pos.vec_id "
        "UNION ALL "
        "SELECT 'ivfpq' AS method, "
        "CAST(coalesce(sum(coalesce(r.rel, 0) * w.wt), 0) AS BIGINT) "
        "AS dcg_e6 FROM (SELECT vec_id, row_number() OVER "
        "(ORDER BY adc_dist ASC, vec_id) AS p "
        f"FROM ({_ANN_IVFPQ_SQL}) pq) pos "
        "JOIN (VALUES (1, 1000000), (2, 630929), (3, 500000), "
        "(4, 430676), (5, 386852), (6, 356207), (7, 333333), "
        "(8, 315464), (9, 301029), (10, 289064)) w(p, wt) "
        "ON w.p = pos.p "
        "LEFT JOIN (SELECT vec_id, 11 - row_number() OVER "
        "(ORDER BY cos_sim DESC, vec_id) AS rel "
        f"FROM ({_COSINE_TOPK_SQL}) x3) r ON r.vec_id = pos.vec_id"
        ") t",
    ),
    "q_filter_funnel": (
        q_filter_funnel,
        f"WITH t AS (SELECT doc_id, text, {_TOKS} AS l FROM documents), "
        "tc AS (SELECT doc_id, max(c) AS top_c FROM (SELECT doc_id, tok, "
        "count(*) AS c FROM (SELECT doc_id, unnest(l) AS tok FROM t) u "
        "GROUP BY 1, 2) g GROUP BY 1), "
        "f AS (SELECT t.doc_id, t.text, len(l) AS n_tok, "
        "len(list_distinct(l)) AS nd, tc.top_c FROM t "
        "JOIN tc USING (doc_id)), "
        "s1 AS (SELECT * FROM f WHERE n_tok BETWEEN 10 AND 500), "
        "s2 AS (SELECT * FROM s1 WHERE 5 * nd >= n_tok), "
        "s3 AS (SELECT * FROM s2 WHERE 10 * top_c <= 3 * n_tok), "
        "s4 AS (SELECT * FROM (SELECT s3.*, min(doc_id) OVER "
        "(PARTITION BY md5(text)) AS keep_id FROM s3) x "
        "WHERE doc_id = keep_id), "
        "c AS (SELECT (SELECT count(*) FROM f) AS n0, "
        "(SELECT count(*) FROM s1) AS n1, "
        "(SELECT count(*) FROM s2) AS n2, "
        "(SELECT count(*) FROM s3) AS n3, "
        "(SELECT count(*) FROM s4) AS n4) "
        "SELECT stage, stage_idx, n_in, n_in - n_out AS n_removed, n_out, "
        "((n_in - n_out) * 10000) // n_in AS removal_bp FROM ("
        "SELECT 'length' AS stage, 1 AS stage_idx, n0 AS n_in, n1 AS n_out "
        "FROM c "
        "UNION ALL SELECT 'diversity', 2, n1, n2 FROM c "
        "UNION ALL SELECT 'top_token', 3, n2, n3 FROM c "
        "UNION ALL SELECT 'exact_dup', 4, n3, n4 FROM c) x",
    ),
    "q_source_overlap": (
        q_source_overlap,
        f"WITH t AS (SELECT source, {_TOKS} AS l FROM documents "
        "WHERE len(string_split(trim(text), ' ')) >= 2), "
        "sh AS (SELECT DISTINCT source, unnest(list_distinct("
        "[array_to_string(l[i:i+1], ' ') for i in range(1, len(l))])) AS sh "
        "FROM t), "
        "sz AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1), "
        "cm AS (SELECT a.source AS source_a, b.source AS source_b, "
        "count(*) AS n_common FROM sh a JOIN sh b "
        "ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2) "
        "SELECT cm.source_a, cm.source_b, cm.n_common, "
        "(cm.n_common * 10000) // (sa.n_sh + sb.n_sh - cm.n_common) "
        "AS jaccard_bp FROM cm "
        "JOIN sz sa ON sa.source = cm.source_a "
        "JOIN sz sb ON sb.source = cm.source_b",
    ),
}
