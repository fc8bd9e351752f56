"""CorpusPipeline facade: composition equals the hand-built operator
chain, the manifest records provenance, and the audit funnel is
monotone non-increasing (filters only remove rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.functions import text as T
from kafkastreamsjavachallenge_spark.operators import dedup as D
from kafkastreamsjavachallenge_spark.pipeline import CorpusPipeline

from tests.conftest import SF_DIR


def test_pipeline_matches_hand_composed_chain(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pipe = (
        CorpusPipeline(docs)
        .quality_filter(min_tokens=10, max_tokens=500, min_ttr=0.2)
        .exact_dedup()
        .split()
    )
    got = pipe.df()

    toks = T.tokens("text")
    gated = docs.filter(
        (F.size(toks) >= 10)
        & (F.size(toks) <= 500)
        & (T.type_token_ratio(toks) >= 0.2)
    )
    deduped = D.exact_dedup(gated)
    assert got.count() == deduped.count()
    assert set(got.columns) == set(docs.columns) | {"split"}
    # split shares are deterministic hash buckets: re-running moves nothing
    a = {r["doc_id"]: r["split"] for r in got.select("doc_id", "split").collect()}
    b = {r["doc_id"]: r["split"] for r in pipe.df().select("doc_id", "split").collect()}
    assert a == b


def test_pipeline_manifest_and_audit_funnel(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pipe = (
        CorpusPipeline(docs)
        .quality_filter()
        .exact_dedup()
        .neardup_dedup(threshold=0.5)
        .sample(rate_pct=50)
        .split()
    )
    names = [n for n, _ in pipe.manifest()]
    assert names == [
        "quality_filter",
        "exact_dedup",
        "neardup_dedup",
        "sample",
        "split",
    ]
    funnel = pipe.audit()
    assert funnel[0][0] == "input"
    counts = [c for _, c in funnel]
    # every step up to split only removes rows; split only adds a column
    assert all(a >= b for a, b in zip(counts[:-1], counts[1:])), funnel
    assert counts[-1] == counts[-2]  # split preserves rows
    assert counts[-1] > 0
    # funnel_report: same numbers as audit(), one composed job, with
    # integer bp removal rates
    rows = {r["stage"]: r for r in pipe.funnel_report().collect()}
    assert set(rows) == set(names)
    for (prev_name, n_in), (name, n_out) in zip(funnel[:-1], funnel[1:]):
        r = rows[name]
        assert (r["n_in"], r["n_out"], r["n_removed"]) == (
            n_in,
            n_out,
            n_in - n_out,
        )
        assert r["removal_bp"] == (n_in - n_out) * 10000 // n_in


def test_pipeline_funnel_report_survives_emptied_pipeline(spark):
    """A stage that empties the pipeline must not poison the next stage's
    removal rate with a DIV-by-zero NULL: 0-removed-of-0 reports rate 0."""
    docs = load_table(spark, SF_DIR, "documents")
    pipe = (
        CorpusPipeline(docs)
        .filter(F.col("n_chars") < -1, name="empty_all")  # removes everything
        .exact_dedup()
    )
    rows = {r["stage"]: r for r in pipe.funnel_report().collect()}
    assert rows["empty_all"]["n_out"] == 0
    assert rows["empty_all"]["removal_bp"] == 10000
    after = rows["exact_dedup"]
    assert (after["n_in"], after["n_out"], after["n_removed"]) == (0, 0, 0)
    assert after["removal_bp"] == 0  # not NULL


def test_pipeline_decontaminate_matches_query_semantics(spark):
    """Facade decontamination equals q_decontaminate's result on the same
    benchmark split (source='src0' as the eval suite)."""
    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    got = CorpusPipeline(corpus).decontaminate(bench, ngram=5).df()
    from kafkastreamsjavachallenge_spark.queries.llm import q_decontaminate

    want = q_decontaminate(spark, SF_DIR)
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in want.select("doc_id").collect()
    }


def test_pipeline_dedup_against_matches_query_semantics(spark):
    """Facade cross-corpus dedup equals q_crosscorpus_dedup on the same
    reference split."""
    docs = load_table(spark, SF_DIR, "documents")
    ref = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    got = CorpusPipeline(corpus).dedup_against(ref, threshold=0.5).df()
    from kafkastreamsjavachallenge_spark.queries.llm import q_crosscorpus_dedup

    want = q_crosscorpus_dedup(spark, SF_DIR)
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in want.select("doc_id").collect()
    }


def test_pipeline_decontaminate_rejects_missing_text_column(spark):
    """A benchmark frame without the configured text column must raise,
    not silently shingle an id column (which would disable the step)."""
    import pytest

    docs = load_table(spark, SF_DIR, "documents")
    bench_no_text = docs.select("doc_id", "source")
    with pytest.raises(ValueError, match="decontaminate"):
        CorpusPipeline(docs).decontaminate(bench_no_text)


def test_pipeline_neardup_removes_only_higher_ids(spark):
    """Of each verified near-dup pair the canonical (lower) id survives."""
    docs = load_table(spark, SF_DIR, "documents")
    pipe = CorpusPipeline(docs).neardup_dedup(threshold=0.5)
    kept = {r["doc_id"] for r in pipe.df().select("doc_id").collect()}
    sigs = D.minhash_signatures(docs, n_perm=8)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    verified = D.ngram_jaccard(docs, pairs).filter(F.col("jaccard") >= 0.5)
    for r in verified.collect():
        assert r["id_a"] in kept or r["id_b"] not in kept
        assert r["id_b"] not in kept  # higher id always dropped


def test_pipeline_cap_domains_and_remove_dup_spans(spark):
    """cap_domains matches q_domain_cap's doc selection; remove_dup_spans
    rewrites text to the operator's cleaned output and keeps schema."""
    from kafkastreamsjavachallenge_spark.queries.llm import q_domain_cap

    docs = load_table(spark, SF_DIR, "documents")
    capped = CorpusPipeline(docs).cap_domains(cap=15).df()
    want = {r["doc_id"] for r in q_domain_cap(spark, SF_DIR).collect()}
    got = {r["doc_id"] for r in capped.select("doc_id").collect()}
    assert got == want
    assert set(capped.columns) == set(docs.columns)

    spans = CorpusPipeline(docs).remove_dup_spans(block=8)
    out = spans.df()
    assert set(out.columns) == set(docs.columns)
    cleaned = {
        r["doc_id"]: r["cleaned_text"]
        for r in D.remove_dup_spans(docs, block=8)
        .filter(F.col("n_blocks_kept") > 0)
        .collect()
    }
    for r in out.select("doc_id", "text").collect():
        assert r["text"] == cleaned[r["doc_id"]]


def test_pipeline_dsir_filter_keeps_target_like_docs(spark):
    """dsir_filter against the src0 slice keeps exactly the raw docs
    whose q_dsir_weights log-weight clears the threshold."""
    from kafkastreamsjavachallenge_spark.queries.llm import q_dsir_weights

    docs = load_table(spark, SF_DIR, "documents")
    target = docs.filter(F.col("source") == "src0").select("text")
    raw = docs.filter(F.col("source") != "src0")
    kept = (
        CorpusPipeline(raw).dsir_filter(target, min_log_weight=0.0).df()
    )
    w = q_dsir_weights(spark, SF_DIR).toPandas()
    want = set(w[w["log_weight"] >= 0.0]["doc_id"])
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == want


def test_classifier_filter_matches_query(spark):
    """Pipeline classifier_filter == q_fasttext_score's keep set."""
    from kafkastreamsjavachallenge_spark.queries.llm import q_fasttext_score

    docs = load_table(spark, SF_DIR, "documents")
    kept = {
        r["doc_id"]
        for r in CorpusPipeline(docs).classifier_filter(min_margin=0).df().collect()
    }
    want = {
        r["doc_id"]
        for r in q_fasttext_score(spark, SF_DIR).filter("keep = 1").collect()
    }
    assert kept == want


def test_priority_sample_matches_query(spark):
    """Pipeline priority_sample(k=50, n_chars) == q_priority_sample's
    sampled ids (same priorities, same tie-break)."""
    from kafkastreamsjavachallenge_spark.queries.llm import q_priority_sample

    docs = load_table(spark, SF_DIR, "documents")
    kept = {
        r["doc_id"]
        for r in CorpusPipeline(docs).priority_sample(k=50).df().collect()
    }
    want = {r["doc_id"] for r in q_priority_sample(spark, SF_DIR).collect()}
    assert kept == want
    # manifest records the step with its parameters
    pipe = CorpusPipeline(docs).classifier_filter().priority_sample(k=10)
    assert pipe.manifest() == [
        ("classifier_filter", {"min_margin": 0}),
        ("priority_sample", {"k": 10, "weight_col": "n_chars"}),
    ]


def test_release_publish_roundtrip(spark, tmp_path):
    """The full publish path: curate with CorpusPipeline, write the
    result as shard-partitioned parquet, read it back, and verify the
    release manifest (order-independent shard checksums) reproduces
    exactly — the consumer-side integrity check q_export_manifest
    models.  Checksums are commutative integer sums, so the write/read
    partitioning cannot change them."""
    import os

    docs = load_table(spark, SF_DIR, "documents")
    curated = (
        CorpusPipeline(docs)
        .quality_filter(min_tokens=5, max_tokens=1000, min_ttr=0.0)
        .exact_dedup()
        .df()
    )
    shard = (T.base_hash28(F.col("doc_id").cast("string")) % 8).alias("shard")
    out = str(tmp_path / "release")

    def manifest(df):
        return {
            r["shard"]: (r["n"], r["ck"])
            for r in df.groupBy(shard)
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.sum(T.base_hash28(F.col("text"))) % F.lit(1099511627776)).alias("ck"),
            )
            .collect()
        }

    want = manifest(curated)
    curated.withColumn("shard", shard).write.partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    assert manifest(back) == want
    # every declared shard directory exists on disk
    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs == {f"shard={s}" for s in want}


def test_group_split_keeps_dup_groups_in_one_fold(spark):
    """group_split hashes md5(text): exact duplicates must share a fold;
    fold values stay inside [0, folds)."""
    docs = load_table(spark, SF_DIR, "documents")
    # plant duplicates: union the corpus with a re-keyed copy of itself
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = CorpusPipeline(docs.unionByName(dup)).group_split(folds=5).df()
    assert out.filter((F.col("fold") < 0) | (F.col("fold") >= 5)).count() == 0
    spread = (
        out.groupBy(F.md5("text"))
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert spread == 0, "an exact-dup group crossed folds"


def test_leakage_report_matches_query_twin(spark):
    """CorpusPipeline.split().leakage_report() over the raw corpus must
    reproduce q_split_leakage exactly (same hash split, same shingle
    join, same ranking)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_split_leakage

    docs = load_table(spark, SF_DIR, "documents")
    got = sorted(
        (r["doc_id"], r["n_shingles"], r["n_shared"], r["shared_bp"], r["rk"])
        for r in CorpusPipeline(docs).split().leakage_report().collect()
    )
    want = sorted(
        (r["doc_id"], r["n_shingles"], r["n_shared"], r["shared_bp"], r["rk"])
        for r in q_split_leakage(spark, SF_DIR).collect()
    )
    assert got == want and len(got) == 5


def test_incremental_ingest_rehearsal_end_to_end(spark, tmp_path):
    """Round-7 VERDICT item 4 — the nightly incremental loop COMPOSED,
    not piecewise: 4 simulated ingest batches, each probed against the
    persisted band index (cross-batch exact copies dropped), survivors
    appended to index + doc store, the index compacted after every
    batch; then the accumulated corpus flows through the downstream
    gate: LSH candidates -> 2-core peel (q_kcore's gate) -> connected
    components -> canonical selection.

    IO discipline asserted across ALL batches (the composition claims
    the individual tests pin piecewise):
    - on-disk per-directory file counts respect the compaction cap
      after every maintenance pass, so ANY probe's planning cost (one
      task + footer read per file) stays <= dirs x cap even as the
      index grows 4x — without compaction it grows linearly with batch
      count;
    - probe BYTES are batch-proportional: measured via Hadoop
      FileSystem global statistics (local-mode executors share the
      JVM, so bytesRead deltas around an action are the real scan IO —
      DataFrame.inputFiles() is pruning-blind and useless here), a
      3-doc batch's directory-pruned probe reads well under half of
      what the full-index scan reads.

    Correctness asserted end-to-end: exactly the planted cross-batch
    copies collide at ingest; every planted within-batch triple (K3 —
    survives the 2-core peel that strips chance-degree-1 pairs) lands
    in one component whose canonical is the minimum id; canonical
    selection keeps everything else."""
    import os

    from kafkastreamsjavachallenge_spark.operators.dedup import (
        band_index_matches,
        compact_band_index,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        write_band_index,
    )

    N_BATCHES, PER, CAP = 4, 80, 2

    def text_of(i):  # doc-unique vocabulary -> only planted copies collide
        return " ".join(f"w{i}x{j}" for j in range(24))

    def df_of(rows):
        return spark.createDataFrame(
            [(i, t, "en", "synth", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).localCheckpoint()

    def fs_bytes_read():
        it = (
            spark._jvm.org.apache.hadoop.fs.FileSystem
            .getGlobalStorageStatistics().iterator()
        )
        total = 0
        while it.hasNext():
            v = it.next().getLong("bytesRead")
            total += v if v else 0
        return total

    idx = str(tmp_path / "band_index")
    store = str(tmp_path / "store")
    planted_triples = []
    for b in range(N_BATCHES):
        rows = [(b * PER + k, text_of(b * PER + k)) for k in range(PER)]
        for t in range(2):  # two K3 duplicate cliques per batch
            orig = b * PER + 10 * t
            planted_triples.append((orig, 2_000_000 + orig, 3_000_000 + orig))
            rows += [
                (2_000_000 + orig, text_of(orig)),
                (3_000_000 + orig, text_of(orig)),
            ]
        cross = []
        if b > 0:  # exact copies of batch-0 docs already in the index
            cross = [(4_000_000 + b * 100 + k, text_of(k)) for k in range(3)]
            rows += cross
        batch = df_of(rows)
        if b == 0:
            kept = batch
        else:
            matches = band_index_matches(batch, spark, idx)
            dup_ids = {r["new_id"] for r in matches.select("new_id").distinct().collect()}
            assert dup_ids == {i for i, _ in cross}, (
                f"batch {b}: expected exactly the cross copies to collide, "
                f"got {dup_ids}"
            )
            kept = batch.join(
                matches.select(F.col("new_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )
        write_band_index(kept, idx, mode="append" if b else "overwrite")
        kept.write.mode("append").parquet(store)
        compact_band_index(spark, idx, max_files_per_dir=CAP)
        for root, _dirs, fs in os.walk(idx):
            pq = [f for f in fs if f.endswith(".parquet")]
            assert len(pq) <= CAP, f"batch {b}: {root} holds {len(pq)} files"

    # batch-proportional bytes: a tiny probe reads a pruned subset
    small = df_of([(9_000_000 + k, text_of(9_500_000 + k)) for k in range(3)])
    small_scan = band_index_matches(small, spark, idx)
    b0 = fs_bytes_read()
    small_scan.count()
    probe_bytes = fs_bytes_read() - b0
    b0 = fs_bytes_read()
    spark.read.parquet(idx).count()
    full_bytes = fs_bytes_read() - b0
    assert probe_bytes < full_bytes / 2, (
        f"a 3-doc probe read {probe_bytes} of {full_bytes} full-scan bytes "
        "— directory pruning lost"
    )

    # downstream gate over the accumulated store
    corpus = spark.read.parquet(store)
    sigs = minhash_signatures(corpus)
    pairs = lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    sym = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .localCheckpoint(eager=False)
    )
    for _ in range(4):  # 2-core peel, q_kcore's per-round checkpoint shape
        keep = (
            sym.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= 2)
            .select("src")
        )
        sym = (
            sym.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    core_pairs = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("id_a"), F.col("dst").alias("id_b")
    )
    comp = connected_components(core_pairs, corpus.select("doc_id"))
    lab = {r["doc_id"]: r["component"] for r in comp.collect()}
    for a, b2, c in planted_triples:
        assert lab[a] == lab[b2] == lab[c] == a, (a, b2, c, lab[a], lab[b2], lab[c])
    copies = {x for t in planted_triples for x in t[1:]}
    keep_ids = {d for d, l in lab.items() if l == d}
    assert keep_ids == set(lab) - copies


def test_ten_batch_ingest_io_proportionality_sf01(spark, tmp_path):
    """Round-8 VERDICT item 5 — the incremental loop at sf0.1 scale and
    depth: TEN ingest batches (the 5000-doc corpus split by doc_id % 10),
    each probed against the growing band index before its survivors are
    appended, compaction interleaved every 3rd batch.  Asserted across
    ALL batches, not just at the end:

    - per-batch PROBE BYTES (Hadoop FS global bytesRead around the probe
      action — inputFiles() is pruning-blind): a fixed 3-doc reference
      probe is re-measured after EVERY ingest; between compactions its
      bytes may grow by the appended wide-range files, but measured at
      each COMPACTED state (the steady state a maintained index lives
      in) they must stay near-flat while the index triples — the
      round-9 bucket-literal pushdown over range-sorted row groups
      (compaction writes multi-row-group files via parquet.block.size,
      the shape a 100 TB index has by default) skips everything but the
      probe's own bucket ranges;
    - per-directory FILE COUNTS: <= cap after every compaction pass, and
      between passes bounded by cap + batches-since-compaction — so any
      probe's planning cost (one footer read per file) is bounded by
      dirs x cap regardless of ingest depth;
    - probe FILES-READ proportional to batch size: the reference probe's
      touched (band, prefix) directories hold <= touched_dirs x bound
      files, a fixed bound while total index files keep growing."""
    import os

    from kafkastreamsjavachallenge_spark.operators.dedup import (
        band_index_matches,
        compact_band_index,
        write_band_index,
    )

    CAP = 2
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    batches = [
        docs.filter(F.col("doc_id") % 10 == b).localCheckpoint()
        for b in range(10)
    ]
    # fixed reference probe: 3 synthetic docs with probe-unique vocab
    probe = spark.createDataFrame(
        [
            (9_000_000 + k, " ".join(f"probe{k}w{j}" for j in range(24)),
             "en", "synth", 100)
            for k in range(3)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).localCheckpoint()

    def fs_bytes_read():
        it = (
            spark._jvm.org.apache.hadoop.fs.FileSystem
            .getGlobalStorageStatistics().iterator()
        )
        total = 0
        while it.hasNext():
            v = it.next().getLong("bytesRead")
            total += v if v else 0
        return total

    idx = str(tmp_path / "band_index")
    probe_bytes_per_batch = []
    compacted_probe_bytes = []  # measured at each post-compaction state
    since_compact = 0
    for b, batch in enumerate(batches):
        if b == 0:
            kept = batch
        else:
            matches = band_index_matches(batch, spark, idx)
            kept = batch.join(
                matches.select(F.col("new_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            ).localCheckpoint()
        write_band_index(kept, idx, mode="append" if b else "overwrite")
        since_compact += 1
        if (b + 1) % 3 == 0:
            # 64 KB row groups: the prune-granularity shape a 100 TB
            # index has with parquet's 128 MB default — without this,
            # every test-scale file is ONE row group spanning the whole
            # directory range and stat-skipping has nothing to skip
            compact_band_index(
                spark, idx, max_files_per_dir=CAP,
                parquet_block_bytes=64 * 1024,
            )
            since_compact = 0
        # bounded per-directory file counts at EVERY batch
        for root, _dirs, fs in os.walk(idx):
            pq = [f for f in fs if f.endswith(".parquet")]
            bound = CAP + since_compact * 2  # append adds <=2 files/dir
            assert len(pq) <= bound, (
                f"batch {b}: {root} holds {len(pq)} files (bound {bound})"
            )
        # fixed-probe bytes after every ingest
        scan = band_index_matches(probe, spark, idx)
        b0 = fs_bytes_read()
        assert scan.count() == 0  # probe vocab is unique by construction
        delta = fs_bytes_read() - b0
        probe_bytes_per_batch.append(delta)
        if since_compact == 0:
            compacted_probe_bytes.append(delta)

    # pruning discipline holds at final depth: probe ≪ full scan
    b0 = fs_bytes_read()
    spark.read.parquet(idx).count()
    full_bytes = fs_bytes_read() - b0
    assert probe_bytes_per_batch[-1] < full_bytes / 2, (
        f"final probe read {probe_bytes_per_batch[-1]} of {full_bytes}"
    )
    # IO-proportionality: at the compacted steady states (after batches
    # 3, 6, 9) the index grew 3x but the fixed probe's bytes must stay
    # near-flat — row-group stat-skipping reads footers + the probe's
    # own ranges, not the directory.  2x headroom covers footer growth.
    assert len(compacted_probe_bytes) == 3
    assert compacted_probe_bytes[-1] < 2 * compacted_probe_bytes[0], (
        f"probe bytes track the index, not the probe: "
        f"{compacted_probe_bytes} (full per-batch: {probe_bytes_per_batch})"
    )

    # files-read proportional to the probe, not the index: the probe's
    # touched directories hold a bounded file count
    from kafkastreamsjavachallenge_spark.operators.dedup import (
        lsh_band_buckets,
        minhash_signatures,
    )

    touched = {
        (int(r["band"]), str(r["bucket"])[:1])
        for r in lsh_band_buckets(minhash_signatures(probe))
        .select("band", "bucket")
        .collect()
    }
    n_files_touched = 0
    for band, bp in touched:
        d = os.path.join(idx, f"band={band}", f"bp={bp}")
        if os.path.isdir(d):
            n_files_touched += sum(
                1 for f in os.listdir(d) if f.endswith(".parquet")
            )
    total_files = sum(
        1
        for root, _d, fs in os.walk(idx)
        for f in fs
        if f.endswith(".parquet")
    )
    assert n_files_touched <= len(touched) * (CAP + 2)
    assert n_files_touched < total_files, (n_files_touched, total_files)

    # correctness of the loop at depth: survivors = the oracle's chained
    # sequential dedup is covered by q_incremental_dedup; here pin that
    # nothing was lost or duplicated across 10 appends
    import duckdb as _dk

    store_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    )
    assert len(store_ids) == len(set(store_ids))
    assert len(store_ids) <= 5000
    assert len(store_ids) >= 4000  # the corpus is mostly unique docs
