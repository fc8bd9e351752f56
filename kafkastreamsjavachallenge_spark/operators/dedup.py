"""Deduplication operators for the LLM-data-pipeline surface: exact,
MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the reason these shapes were chosen):
- Exact dedup: hash-groupBy on a content digest — one shuffle keyed on the
  digest; digests distribute uniformly so no skew.
- MinHash+LSH: signature is a pure projection; candidate generation is a
  self-equi-join on (band_index, band_hash) buckets — the only shuffle is on
  bucket keys, and bucket sizes are bounded by collision probability, never
  by corpus size.  This is the classic shingle→minhash→band→bucket-join
  pipeline; no pairwise O(n²) stage ever materializes.
- SimHash: projection to a 16-bit fingerprint; near-dup candidates share a
  fingerprint (or a band of it) — again a groupBy, not a cross join.
- n-gram Jaccard: exact verification for *candidate pairs only* (from LSH
  or blocking), via array_intersect/array_union on distinct shingle sets.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.functions.text import (
    base_hash28,
    hexn_to_int,
    minhash_perm,
    shingles,
    tokens,
)


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest: (digest, keeper id, count).

    md5 here is the portable digest; at 100 TB you shard by digest prefix —
    the groupBy already partitions on the digest so the plan is unchanged.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (the min-id representative)."""
    w_keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(w_keep, on=id_col, how="left_semi")


def remove_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 8,
) -> DataFrame:
    """Substring-level dedup with reconstruction (Lee et al. 2022,
    arXiv:2107.06499, adapted to fixed blocks): split every document
    into non-overlapping ``block``-token blocks, keep only the
    corpus-wide FIRST occurrence (min (id, block_idx)) of any repeated
    block, and re-assemble each document from its surviving blocks in
    order.  Returns (id, cleaned_text, n_blocks_kept) for EVERY input
    row — a fully-boilerplate document comes back with the empty string.

    Scale shape: one shuffle on the block content (uniform keys — block
    text hashes spread evenly), one back on the doc id; the reassembly
    folds an array_sort'ed (idx, block) list so the output string is
    independent of partitioning.  At 100 TB the window-min on the block
    key is a plain partial-aggregatable shuffle, and the block length
    bounds every group row's size.
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("__toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("__toks"), F.lit(1)), F.lit(block)
    )
    blocks = d.select(
        id_col, "__toks", F.posexplode(starts).alias("__bidx", "__s")
    ).select(
        id_col,
        "__bidx",
        F.concat_ws(" ", F.slice(F.col("__toks"), F.col("__s"), block)).alias(
            "__block"
        ),
    )
    w = Window.partitionBy("__block")
    keep = blocks.withColumn(
        "__keeper", F.min(F.struct(id_col, "__bidx")).over(w)
    ).filter(
        (F.col(f"__keeper.{id_col}") == F.col(id_col))
        & (F.col("__keeper.__bidx") == F.col("__bidx"))
    )
    agg = keep.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__bidx", "__block"))),
                lambda x: x["__block"],
            ),
            " ",
        ).alias("__ct"),
        F.count(F.lit(1)).alias("__nk"),
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("__ct"), F.lit("")).alias("cleaned_text"),
        F.coalesce(F.col("__nk"), F.lit(0)).alias("n_blocks_kept"),
    )


def shingled_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    spread: bool = False,
) -> DataFrame:
    """(id, sh: array<string>) — the distinct-k-shingle subtree shared by
    ``minhash_signatures`` and ``exact_neardup_pairs``.  The interpreted-
    HOF shingling is the dominant per-doc cost of both; an audit that
    needs both (q_dedup_recall) computes this once, ``localCheckpoint``s
    it, and feeds the two ``*_from_shingled`` consumers — one shingling
    pass instead of two.  ``spread=True`` repartitions the cheap raw docs
    on id first so the |docs|×|shingles| expansion is parallel on any
    input split layout."""
    base = df
    if spread:
        base = df.repartition(
            df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
        )
    sh = F.array_distinct(shingles(tokens(text_col), shingle_k))
    return base.select(F.col(id_col), sh.alias("sh"))


def minhash_signatures_from_shingled(
    shd: DataFrame,
    id_col: str = "doc_id",
    n_perm: int = 8,
) -> DataFrame:
    """MinHash signatures from a pre-shingled (id, sh) frame — see
    ``minhash_signatures`` for the scheme and plan-shape notes."""
    # explode_outer + post-explode null filter, NOT plain explode: for
    # explode, InferFiltersFromGenerate infers `size(sh)>0` and predicate
    # pushdown moves it below the repartition — re-evaluating the
    # (interpreted-HOF) shingle expression in the unparallelized
    # pre-shuffle stage, doubling its cost.  explode_outer is exempt from
    # that inference; the cheap isNotNull filter on the generated column
    # cannot sink below the Generate and restores identical semantics
    # (short docs contribute no rows).
    base = (
        shd.select(F.col(id_col), F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .select(F.col(id_col), base_hash28(F.col("shingle")).alias("v"))
    )
    mins = [
        F.min(minhash_perm(F.col("v"), s)).alias(f"mh{s}") for s in range(n_perm)
    ]
    return (
        base.groupBy(id_col)
        .agg(*mins)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"mh{s}") for s in range(n_perm)]).alias("sig"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature over distinct k-token shingles.

    Universal-hash scheme: one portable 28-bit base hash per shingle
    (md5-derived), then n_perm linear permutation hashes
    (a_s*v + b_s) mod 2^31-1 folded as n_perm `min` aggregates in a single
    groupBy(id).  Plan shape: one repartition on id *before* the explode
    (moves the cheap raw docs, makes the |docs|×|shingles| expansion
    parallel on any input split layout), then explode → md5 → n_perm
    min-aggregates, all whole-stage codegen with map-side partial
    aggregation; HashPartitioning(id) satisfies the groupBy distribution so
    there is no second exchange.  Versus hashing every shingle n_perm
    times, the work drops by ~n_perm×.  Returns (id, sig: array<bigint>).
    """
    return minhash_signatures_from_shingled(
        shingled_docs(df, text_col, id_col, shingle_k, spread=True),
        id_col,
        n_perm,
    )


def lsh_band_buckets(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode signatures into (id, band, bucket) rows — the shared
    banding step of self-join (``lsh_candidate_pairs``) and cross-corpus
    (``crosscorpus_dedup``) LSH.  Bucket = md5 of the band's signature
    slice, so join keys are uniform hashes (no skew by construction)."""
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:  # max_bucket=None defers to the active ScaleProfile
    """LSH banding: docs sharing any band bucket become candidate pairs.

    One explode (docs × bands) + one self-equi-join on (band, band_hash).
    Distinct (id_a < id_b) pairs out.  Bucket-join keys are hashes →
    uniform partitioning, no skew; AQE splits any pathological bucket.

    ``max_bucket`` is the scale knob for DEGENERATE corpora (boilerplate
    floods, template farms, tiny vocabularies): a band bucket holding n
    docs emits n² candidate rows, so one non-discriminative bucket of
    10⁶ docs is a 10¹²-row join.  With the cap, buckets above the
    population limit are dropped BEFORE the self-join (one (band,
    bucket) count + a broadcast-able semi-join), bounding join work by
    buckets × cap² — the same hygiene production dedup pipelines apply
    (an over-full bucket means that band hash isn't discriminative
    there; its members' true near-dups still collide in their OTHER
    bands).  Default ``None`` keeps exact banding semantics (oracle
    parity); measured on the saturated-vocab sf1 fuzz corpus the uncapped
    candidate set grew q_edit_distance 34x for 10x data while
    max_bucket=50 restores near-linear growth.  A ``None`` kwarg defers
    to the active ``scale.ScaleProfile`` (the one-switch 100 TB config);
    the default EXACT profile leaves the cap off."""
    from kafkastreamsjavachallenge_spark.scale import resolve

    max_bucket = resolve(max_bucket, "max_bucket")
    # r12 optimization (guide §2.4 "remove shuffles outright" applied to
    # passes): the band table feeds BOTH sides of the self-join (and the
    # bucket-size cap when active), and Catalyst re-plans the whole
    # upstream pipeline per reference — the r11 q_minhash_pairs plan ran
    # the scan→shingle→MinHash-aggregate chain TWICE (once per join
    # side).  A lazy localCheckpoint materializes (id, band, bucket) once
    # — docs × bands tiny rows — and every branch reads the cached
    # partitions; on a cluster this is a reliable checkpoint or a temp
    # table, same as the shd idiom in q_dedup_recall.
    banded = lsh_band_buckets(sigs, id_col, bands, rows_per_band).localCheckpoint(
        eager=False
    )
    if max_bucket is not None:
        small = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(small, ["band", "bucket"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def exact_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT near-dup ground truth (Jaccard >= 0.5 over distinct k-token
    shingles) without an all-pairs stage: two docs with Jaccard > 0 share
    a shingle, so candidate pairs come from a self-equi-join of the
    shingle inverted index and |A∩B| is that join's per-pair row count.
    The threshold gate is integer-exact (2·|A∩B| >= |A|+|B|-|A∩B|), so
    no float boundary can flip a pair across engines or testdata seeds.

    Cost is Σ_g df(g)² — bounded by the hottest shingle, never corpus-
    quadratic.  ``max_df`` is the scale knob that enforces that bound:
    shingles with document frequency above the cap are dropped from the
    inverted index BEFORE the self-join (one tiny hot-list aggregate +
    an anti-join, broadcast by AQE), so one boilerplate shingle with
    df=10⁶ can no longer produce a 10¹²-row join on a single skewed key.
    Default ``None`` keeps the exact semantics (oracle parity); with a
    cap the result is conservative — a pair is missed only if its
    overlap consists mostly of ultra-common shingles, which sits far
    below the 0.5 threshold once those shingles stop being
    discriminative.  This is the referee for LSH configs
    (q_dedup_recall), not the scale dedup path itself — that remains
    MinHash banding."""
    return exact_neardup_pairs_from_shingled(
        shingled_docs(df, text_col, id_col, shingle_k), id_col, max_df
    )


def exact_neardup_pairs_from_shingled(
    shd: DataFrame, id_col: str = "doc_id", max_df: int | None = None
) -> DataFrame:
    """Exact near-dup pairs from a pre-shingled (id, sh) frame — see
    ``exact_neardup_pairs`` for semantics, the Σ df(g)² cost bound, and
    the ``max_df`` hot-shingle cap that enforces it at scale.  A ``None``
    kwarg defers to the active ``scale.ScaleProfile``."""
    from kafkastreamsjavachallenge_spark.scale import resolve

    max_df = resolve(max_df, "max_df")
    shd = shd.filter(F.size("sh") > 0)
    ex = shd.select(F.col(id_col), F.explode_outer("sh").alias("g")).filter(
        F.col("g").isNotNull()
    )
    if max_df is not None:
        ex = _drop_hot_shingles(ex, max_df)
    shared = (
        ex.select(F.col(id_col).alias("id_a"), "g")
        .join(ex.select(F.col(id_col).alias("id_b"), "g"), "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz = shd.select(F.col(id_col), F.size("sh").alias("n"))
    return (
        shared.join(
            sz.select(F.col(id_col).alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sz.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .filter(
            F.lit(2) * F.col("inter")
            >= F.col("na") + F.col("nb") - F.col("inter")
        )
        .select("id_a", "id_b")
    )


def _drop_hot_shingles(ex: DataFrame, max_df: int, col: str = "g") -> DataFrame:
    """Anti-join an exploded inverted index against its own hot-key list
    (frequency > max_df on ``col``).  The hot list is tiny by
    construction — Zipf puts very few shingles above any sane cap — so
    AQE broadcasts it and the cap costs one map-side-combinable count
    aggregate, no extra full shuffle of the index itself.  Shared by the
    doc-frequency caps (exact_neardup_pairs, q_containment) and the
    source-frequency cap (q_source_overlap)."""
    hot = (
        ex.groupBy(col)
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select(col)
    )
    return ex.join(hot, col, "left_anti")


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard over distinct shingle sets for given candidate pairs.

    Shingle sets are computed only for docs that appear in a candidate
    pair (semi-join first): the expensive HOF shingling touches
    |candidates| docs, not |corpus| — at 100 TB candidates are orders of
    magnitude smaller than the corpus, so the verify stage's cost tracks
    LSH selectivity, not data size.  Then two joins attach the sets and a
    per-row array intersection scores each pair — never all-pairs.

    ``pairs`` is referenced twice (the id restriction and the score join),
    so it is lazily checkpointed — one materialization shared by both
    branches instead of recomputing the upstream MinHash+LSH chain per
    branch (same lineage-sharing move as the graph operators).
    """
    pairs = pairs.localCheckpoint(eager=False)
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # AQE broadcasts the (small) candidate id set at runtime.  The
    # shingle table feeds BOTH score-join sides (sh_a and sh_b) — without
    # the r12 lazy checkpoint Catalyst re-planned the semi-join AND the
    # HOF shingling once per side (two copies in the r11
    # q_neardup_verified plan); materialized once, the verify stage
    # shingles each candidate doc exactly once.
    sh = df.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col),
        F.array_distinct(shingles(tokens(text_col), shingle_k)).alias("sh"),
    ).localCheckpoint(eager=False)
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    # a doc shorter than the shingle width has NO n-grams: such pairs are
    # not comparable (and 0/0 would raise under ANSI) — drop them, the
    # same semantics as the oracle's len >= k document gate
    return (
        out.filter((F.size("sh_a") > 0) & (F.size("sh_b") > 0))
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
    )


def crosscorpus_dedup(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Incremental-crawl dedup: drop corpus docs that are near-duplicates
    of ANY reference doc (the production case when a new crawl lands on
    top of an existing training set — self-dedup alone cannot catch
    cross-corpus repeats).

    Same sub-quadratic chain as ``lsh_candidate_pairs`` +
    ``ngram_jaccard``, but the band-bucket equi-join runs reference ×
    corpus instead of self × self: candidates are docs sharing any LSH
    band, the exact Jaccard verify touches candidates only, and the
    final step is one anti-join.  At 100 TB the reference side's banded
    table is computed once and reused across crawl increments.

    Ids must be unique across the two inputs (they share the verify
    join's id space).  Returns the surviving corpus rows.
    """
    sig_c = minhash_signatures(corpus, text_col, id_col, n_perm, shingle_k)
    sig_r = minhash_signatures(reference, text_col, id_col, n_perm, shingle_k)
    bc = lsh_band_buckets(sig_c, id_col, bands, rows_per_band).select(
        F.col(id_col).alias("id_b"), "band", "bucket"
    )
    br = lsh_band_buckets(sig_r, id_col, bands, rows_per_band).select(
        F.col(id_col).alias("id_a"), "band", "bucket"
    )
    pairs = br.join(bc, ["band", "bucket"]).select("id_a", "id_b").distinct()
    both = reference.select(id_col, text_col).unionByName(
        corpus.select(id_col, text_col)
    )
    verified = ngram_jaccard(both, pairs, text_col, id_col, shingle_k)
    dupes = (
        verified.filter(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return corpus.join(dupes, id_col, "left_anti")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    hex_chars: int = 4,
) -> DataFrame:
    """SimHash fingerprint over distinct tokens (md5-derived planes,
    ``hex_chars`` hex chars of md5 per token → ``bits`` usable planes;
    defaults give the original 16-bit fingerprint, (bits=60, hex_chars=15)
    the banding-grade one — 15 hex chars is the signed-64 cap).

    Explode tokens × bit positions → per-bit ±1 vote sum → sign bits →
    integer fingerprint.  Repartitioning on id up front makes the
    token × bit expansion parallel on any input split layout, and both
    downstream groupBys ((id, bit), then (id)) are satisfied by
    HashPartitioning(id) — one shuffle total.  Tie (vote sum == 0) counts
    as bit set, fixed so oracles agree.
    """
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    # explode_outer + null filter for the same reason as minhash_signatures:
    # keeps InferFiltersFromGenerate from re-evaluating the token expression
    # below the repartition.
    toks = (
        spread.select(
            F.col(id_col),
            F.explode_outer(F.array_distinct(tokens(text_col))).alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
        .withColumn("v", hexn_to_int(F.md5(F.col("tok")), hex_chars))
    )
    votes = (
        toks.select(id_col, "v", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .withColumn(
            "vote",
            F.when(F.expr("shiftright(v, b) % 2") == 1, 1).otherwise(-1),
        )
        .groupBy(id_col, "b")
        .agg(F.sum("vote").alias("s"))
    )
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").alias("simhash"))
    )


def write_band_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    mode: str = "overwrite",
) -> None:
    """Materialize the MinHash LSH band index on disk: (id, band, bucket)
    rows PARTITIONED BY (band, bucket-prefix) — bands × 16 directories.
    This is the build step of INCREMENTAL dedup at 100 TB: the corpus
    index is written once (and appended per ingest batch with
    mode='append'); each nightly batch then probes only the directories
    its own band buckets hash into (`band_index_matches`), reading
    batch-proportional bytes instead of rescanning the corpus.  The
    bucket md5 is uniform, so the 16-way prefix split is balanced by
    construction — the same directory-pruning contract as
    ``similarity.write_ivf_partitioned``."""
    sigs = minhash_signatures(df, text_col, id_col, n_perm, shingle_k)
    rows = lsh_band_buckets(sigs, id_col, bands, rows_per_band).withColumn(
        "bp", F.substring("bucket", 1, 1)
    )
    # cluster rows by their target directory before the partitioned
    # write: each task then writes whole directories (one file per dir
    # per task that owns it) instead of every task opening every dir —
    # fewer, larger files, which is also what the probe reads want.
    # WITHIN each file, rows are sorted by bucket so parquet min/max
    # stats carry tight bucket ranges — the probe's bucket-literal
    # pushdown (band_index_matches) then skips whole row groups/files
    # inside a touched directory, not just untouched directories.
    rows.repartition(F.col("band"), F.col("bp")).sortWithinPartitions(
        "band", "bp", "bucket"
    ).write.mode(mode).partitionBy("band", "bp").parquet(path)


# max distinct bucket literals a probe ships as a parquet In filter —
# ~34 bytes/value, so the cap bounds the driver fetch and the filter
# plan at ~140 KB; larger batches rely on directory pruning alone
_BUCKET_PUSHDOWN_CAP = 4096


def band_index_matches(
    new_docs: DataFrame,
    spark,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """LSH candidate matches of a NEW batch against the persisted band
    index: distinct (new_id, indexed_id) pairs sharing any band bucket —
    the cross-corpus candidate semantics of ``crosscorpus_dedup``, but
    the corpus side is a DIRECTORY-PRUNED scan: the batch's distinct
    (band, bucket-prefix) pairs (≤ bands×16 scalars — the documented
    bounded driver-side fetch, like IVF probe ids) become literal
    partition predicates, so only the touched index directories are read.
    A small batch against a huge index reads O(|batch| directories), not
    the index."""
    sigs = minhash_signatures(new_docs, text_col, id_col, n_perm, shingle_k)
    nb = lsh_band_buckets(sigs, id_col, bands, rows_per_band).withColumn(
        "bp", F.substring("bucket", 1, 1)
    )
    nb = nb.localCheckpoint(eager=False)  # feeds the probe list AND the join
    probes = [
        (int(r["band"]), str(r["bp"]))
        for r in nb.select("band", "bp").distinct().collect()
    ]
    if not probes:
        return (
            nb.select(F.col(id_col).alias("new_id"))
            .withColumn("indexed_id", F.col("new_id"))
            .limit(0)
        )
    pred = None
    for band, bp in probes:
        term = (F.col("band") == band) & (F.col("bp") == bp)
        pred = term if pred is None else (pred | term)
    # the explicit schema (same fields the index writer produced) keeps
    # the read total on an EMPTY index — a fresh deployment's first batch
    # has nothing to collide with, not a schema-inference error
    scan = spark.read.schema(nb.schema).parquet(path).filter(pred)
    # bucket-LITERAL pushdown for small batches (round-9): beyond the
    # (band, prefix) directory pruning above, ship the batch's distinct
    # bucket values as an In filter — parquet min/max stats on the
    # bucket-sorted files (write_band_index / compact_band_index keep
    # each file a tight bucket range) then skip files and row groups
    # INSIDE the touched directories, so a tiny probe's bytes track the
    # probe, not the directory.  Capped: the literal list is a driver-
    # side fetch, bounded here by _BUCKET_PUSHDOWN_CAP scalars; a batch
    # with more distinct buckets saturates the prefix directories anyway
    # (uniform md5), so the dir predicate alone is the right plan there.
    bkts = [
        r["bucket"]
        for r in nb.select("bucket")
        .distinct()
        .limit(_BUCKET_PUSHDOWN_CAP + 1)
        .collect()
    ]
    if len(bkts) <= _BUCKET_PUSHDOWN_CAP:
        scan = scan.filter(F.col("bucket").isin(bkts))
    return (
        nb.join(
            scan.select(
                F.col(id_col).alias("indexed_id"), "band", "bucket"
            ),
            ["band", "bucket"],
        )
        .select(F.col(id_col).alias("new_id"), "indexed_id")
        .distinct()
    )


def dedup_against_band_index(
    new_docs: DataFrame,
    spark,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Incremental-ingest dedup: keep only the new-batch rows with NO LSH
    band collision against the persisted index (``band_index_matches``'s
    candidates; verify with ``ngram_jaccard`` before dropping when the
    band config is loose).  The production loop is: dedup today's batch
    against the index, then ``write_band_index(mode='append')`` the
    survivors — the index grows monotonically and each day's cost tracks
    the batch, not the corpus."""
    matches = band_index_matches(
        new_docs, spark, path, text_col, id_col, n_perm, bands,
        rows_per_band, shingle_k,
    )
    return new_docs.join(
        matches.select(F.col("new_id").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )


def compact_band_index(
    spark,
    path: str,
    max_files_per_dir: int = 8,
    target_file_mb: int = 128,
    parquet_block_bytes: int | None = None,
) -> dict[str, int]:
    """Compact over-appended band-index directories in place.

    The incremental loop (``dedup_against_band_index`` then
    ``write_band_index(mode='append')``) adds at least one file to every
    touched (band, bucket-prefix) directory per ingest batch, so hot
    buckets accrete small files linearly with batch count — and at scale
    the probe's planning cost (one task + footer read per file) grows
    with them even though the pruned byte volume stays flat.  This is
    the band-index instance of the small-files problem ``writers.
    compact`` solves for flat tables and ``q_compaction_plan`` plans for
    source shards: directories over ``max_files_per_dir`` are rewritten
    to ~``target_file_mb`` files (per-directory — each rewrite reads and
    writes only that directory's rows, so nightly maintenance costs
    O(over-appended dirs), never the index).  The rewrite stages into a
    dot-prefixed temp dir (invisible to parquet readers) and swaps via
    two renames (live -> trash, tmp -> live); both complete file sets
    persist until the final trash delete, every ``rename`` return value
    is checked (a failed promote restores the trash copy instead of
    proceeding to the delete), and a recovery scan at entry restores any
    bucket a prior crash left mid-swap (live dir absent -> promote the
    completed tmp rewrite if present, else rename the trash copy back)
    BEFORE any leftover staging dirs are cleaned — so no crash point,
    within a run or across runs, loses rows.
    The swap is NOT atomic: a probe that plans during the
    instant between the renames sees an absent directory (empty bucket),
    so run compaction as a maintenance step off the probe path — at
    cluster scale, under the table lock / snapshot isolation the
    catalog layer (Delta/Iceberg) provides.  Returns
    {band=N/bp=X: new file count} for the directories it rewrote."""
    import math

    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(path)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return {}
    _recover_band_index(jvm, fs, jroot)
    compacted: dict[str, int] = {}
    for band_st in fs.listStatus(jroot):
        if not band_st.isDirectory() or not band_st.getPath().getName().startswith("band="):
            continue
        for bp_st in fs.listStatus(band_st.getPath()):
            if not bp_st.isDirectory() or not bp_st.getPath().getName().startswith("bp="):
                continue
            dpath = bp_st.getPath()
            files = [
                st
                for st in fs.listStatus(dpath)
                if st.isFile() and st.getPath().getName().endswith(".parquet")
            ]
            if len(files) <= max_files_per_dir:
                continue
            n_out = max(
                1,
                math.ceil(
                    sum(st.getLen() for st in files)
                    / (target_file_mb * 1024 * 1024)
                ),
            )
            key = f"{band_st.getPath().getName()}/{dpath.getName()}"
            tmp = jvm.org.apache.hadoop.fs.Path(jroot, f".compact_tmp/{key}")
            trash = jvm.org.apache.hadoop.fs.Path(jroot, f".compact_trash/{key}")
            # range-partition + sort by bucket: each rewritten file (and
            # each ROW GROUP inside it) covers a disjoint bucket range
            # with tight parquet min/max stats, so the probe's bucket-
            # literal pushdown keeps skipping files/row-groups after
            # compaction (a hash repartition would smear every bucket
            # range over every file and defeat stat-based skipping).
            # parquet_block_bytes overrides the row-group size — the
            # prune granularity; production keeps parquet's default
            # (128 MB), tests shrink it to get the multi-row-group file
            # shape a at-scale index actually has.
            w = (
                spark.read.parquet(dpath.toString())
                .repartitionByRange(n_out, "bucket")
                .sortWithinPartitions("bucket")
                .write.mode("overwrite")
            )
            if parquet_block_bytes:
                w = w.option("parquet.block.size", parquet_block_bytes)
            w.parquet(tmp.toString())
            # rename the live dir ASIDE (not delete) before promoting the
            # rewrite: a crash at any point leaves both complete file
            # sets on disk — the old rows are only deleted after the new
            # set is live
            fs.mkdirs(trash.getParent())
            if fs.exists(trash):
                # any trash here is stale (recovery at entry restored or
                # swept every key whose swap was interrupted) — remove it
                # so the rename below cannot nest into it
                fs.delete(trash, True)
            if not fs.rename(dpath, trash):
                # couldn't move the live dir aside — nothing changed;
                # drop the staged rewrite and leave the bucket as-is
                fs.delete(tmp, True)
                continue
            if not fs.rename(tmp, dpath):
                # promote failed with the live dir already in trash:
                # restore the old rows; if even that fails, RAISE with
                # the trash copy intact — never fall through to a delete
                if not fs.rename(trash, dpath):
                    raise RuntimeError(
                        f"compact_band_index: promote and restore both "
                        f"failed for {key}; old rows preserved at "
                        f"{trash.toString()}"
                    )
                fs.delete(tmp, True)
                continue
            fs.delete(trash, True)
            compacted[key] = n_out
    for d in (".compact_tmp", ".compact_trash"):
        p = jvm.org.apache.hadoop.fs.Path(jroot, d)
        if fs.exists(p):
            fs.delete(p, True)
    return compacted


def _recover_band_index(jvm, fs, jroot) -> None:
    """Restore buckets a crashed ``compact_band_index`` run left mid-swap.

    For every ``band=N/bp=X`` key under ``.compact_trash``: if the live
    directory exists the crash happened after a successful promote (the
    trash copy is a superseded duplicate — safe for the caller's final
    cleanup to remove); if it is MISSING the crash hit between the two
    renames, and the only copies of that bucket's rows live in the
    staging dirs — promote the completed tmp rewrite (its ``_SUCCESS``
    marker proves the write finished; the live dir is only ever renamed
    aside AFTER the rewrite commits) or, lacking one, rename the trash
    copy back.  Runs before any staging cleanup so a crash loop can
    never delete the last copy."""
    trash_root = jvm.org.apache.hadoop.fs.Path(jroot, ".compact_trash")
    tmp_root = jvm.org.apache.hadoop.fs.Path(jroot, ".compact_tmp")
    if not fs.exists(trash_root):
        return
    for band_st in fs.listStatus(trash_root):
        if not band_st.isDirectory():
            continue
        for bp_st in fs.listStatus(band_st.getPath()):
            if not bp_st.isDirectory():
                continue
            key = f"{band_st.getPath().getName()}/{bp_st.getPath().getName()}"
            live = jvm.org.apache.hadoop.fs.Path(jroot, key)
            if fs.exists(live):
                # promote completed; the trash copy is a stale duplicate.
                # Delete it NOW rather than leaving it for the end-of-run
                # sweep: if this same bucket is re-compacted this run,
                # rename(live, trash) against an existing trash dir
                # either fails (local FS) or nests the live dir inside
                # the stale copy (HDFS) — and a subsequent restore would
                # resurrect the stale file set
                fs.delete(bp_st.getPath(), True)
                continue
            tmp = jvm.org.apache.hadoop.fs.Path(tmp_root, key)
            success = jvm.org.apache.hadoop.fs.Path(tmp, "_SUCCESS")
            fs.mkdirs(live.getParent())
            if fs.exists(success) and fs.rename(tmp, live):
                continue  # finish the interrupted promote
            if not fs.rename(bp_st.getPath(), live):
                raise RuntimeError(
                    f"compact_band_index recovery failed for {key}; "
                    f"rows preserved at {bp_st.getPath().toString()}"
                )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
    algorithm: str = "propagation",
) -> DataFrame:
    """Connected components: min-label propagation (default) or the
    alternating large-star/small-star algorithm (``algorithm="star"``).

    Completes the near-dup pipeline (reference has no analog — SURVEY.md
    §2.2 LLM-pipeline row): LSH candidate pairs are *edges*; a component is
    a duplicate cluster whose canonical id is the minimum member id.

    **propagation** — each iteration is one shuffle-join (edges ⋈ labels
    on src) + one min-aggregate on dst + a coalescing left join back onto
    labels; convergence is detected when sum(label) stops decreasing (it
    is strictly monotone non-increasing and bounded, so termination is
    guaranteed in ≤ diameter iterations).  LSH duplicate clusters are
    near-cliques, so diameters are tiny and this is the cheaper plan.

    **star** — the Two-Phase algorithm of Kiveris et al. (MapReduce and
    Beyond, SoCC'14): alternate large-star (hook every neighbor larger
    than u to u's min neighbor) and small-star (hook the smaller
    neighbors and u itself to the min) until the edge set is a fixpoint
    of root-pointing stars.  Converges in O(log n) rounds on ANY graph —
    the skew-hardening for adversarial duplicate chains (a 10k-node path
    needs 10k propagation rounds but ~log² star rounds, pinned by
    tests/test_scale.py).  Both endpoints of every rewritten edge are
    monotone non-increasing, so the exact fixpoint check (anti-join,
    below) terminates.

    `localCheckpoint` truncates the iteration lineage so plan size stays
    O(1) per round — at cluster scale the same loops run with reliable
    `checkpoint`.  The number of rounds the call used is exposed via
    ``cc_last_rounds()`` (thread-local introspection for tests and
    tuning, not part of the result — each thread sees only its own
    calls, so parallel test workers can't observe each other's counts).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if algorithm == "star":
        return _cc_two_phase(e, nodes, id_col, max_iter)
    # r12: the mirror union references the edge pipeline twice — lazily
    # checkpoint the directed list first so the upstream (e.g. the whole
    # MinHash→LSH chain in q_neardup_components) computes once, then
    # materialize the symmetric list the iterations reuse
    e = e.localCheckpoint(eager=False)
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.localCheckpoint(eager=True)  # reused every iteration
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).cast("long").alias("label")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    rounds = 0
    converged = False
    for _ in range(max_iter):
        prop = (
            e.join(labels, e.src == labels.node)
            .groupBy(F.col("dst").alias("pnode"))
            .agg(F.min("label").alias("plabel"))
        )
        labels = (
            labels.join(prop, labels.node == prop.pnode, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        rounds += 1
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    _cc_introspect.last_rounds = rounds
    _cc_introspect.converged = converged
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))


_cc_introspect = threading.local()


def cc_last_rounds() -> int | None:
    """Rounds used by THIS thread's most recent ``connected_components``
    call (None if the thread has not run one).  Thread-local so parallel
    pytest workers / concurrent jobs on a shared SparkSession never read
    another call's count; the value is not updated on exception, so read
    it only directly after a successful call."""
    return getattr(_cc_introspect, "last_rounds", None)


def cc_last_converged() -> bool | None:
    """Whether THIS thread's most recent ``connected_components`` call
    reached its fixpoint before ``max_iter`` (round-9: the round cap is
    a defined contract, and a caller raising graph scale 100× needs to
    SEE when the cap truncated convergence instead of silently getting
    partially-propagated labels).  Same thread-local discipline as
    ``cc_last_rounds``."""
    return getattr(_cc_introspect, "converged", None)


def _cc_two_phase(e: DataFrame, nodes: DataFrame, id_col: str, max_iter: int) -> DataFrame:
    """Kiveris et al. Two-Phase (alternating large-star / small-star).

    Edges are kept canonical-undirected (src < dst, distinct); each round
    is two grouped min-aggregates + joins, both shuffling on node id.
    At the fixpoint every edge is (root, member) with root = component
    min, so labels fall out of one left join; isolated nodes label
    themselves."""

    def canon(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
        )

    cur = canon(e).localCheckpoint(eager=True)
    rounds = 0
    converged = False
    for _ in range(max_iter):
        start = cur  # fixpoint = a FULL round leaves the edge set unchanged
        # large-star: per node u, hook every LARGER neighbor to
        # m(u) = min(N(u) ∪ {u})
        sym = cur.union(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = (
            sym.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m"))
        )
        large = (
            sym.filter(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        cur = canon(large).localCheckpoint(eager=True)
        # small-star: per node u over its SMALLER neighbors v (< u),
        # hook every v ≠ m and u itself to m = min(N_small(u))
        d = cur.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        m2 = d.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            d.join(m2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .union(m2.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        )
        nxt = canon(small).localCheckpoint(eager=True)
        rounds += 1
        # exact fixpoint check against the ROUND'S START (comparing to the
        # intermediate post-large-star set would false-converge: on a
        # path graph large and small emit the same set every round)
        changed = (
            nxt.count() != start.count()
            or nxt.join(start, ["src", "dst"], "left_anti").limit(1).count() > 0
        )
        cur = nxt
        if not changed:
            converged = True
            break
    _cc_introspect.last_rounds = rounds
    _cc_introspect.converged = converged
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(
            cur.select(
                F.col("dst").alias("node"), F.col("src").cast("long").alias("component")
            ),
            "node",
            "left",
        )
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", F.col("node").cast("long")).alias("component"),
        )
    )
