"""Closed-form planted tests for the round-6 corpus-health pack
(queries/corpus.py): each test constructs inputs whose expected output is
known exactly, so correctness is asserted against arithmetic, not against
another engine.  (Cross-engine parity is covered by the oracle entries in
the registry + scripts/verify_driver_sim.py; these tests pin semantics.)
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    """rows: list of (doc_id, text, lang, source).  n_chars derived."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


def _write_embs(spark, path, rows):
    """rows: list of (vec_id, embedding list[float64] of dim 64, label)."""
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def _basis(i, scale=1.0, dim=64):
    v = [0.0] * dim
    v[i] = scale
    return v


def test_heaps_law_closed_form(spark, tmp_path):
    """Every doc introduces exactly 2 brand-new types, so the growth curve
    is linear: at decile k (cut = 10k docs), n_vocab = 2*cut = n_tokens."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_heaps_law

    rows = [
        (i, f"u{2 * i} u{2 * i + 1}", "en", "s") for i in range(100)
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r["decile"]: r for r in q_heaps_law(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == list(range(1, 11))
    for k in range(1, 11):
        cut = 10 * k
        assert out[k]["n_docs"] == cut
        assert out[k]["n_tokens"] == 2 * cut
        assert out[k]["n_vocab"] == 2 * cut


def test_ttr_hapax_closed_form(spark, tmp_path):
    from kafkastreamsjavachallenge_spark.queries.corpus import q_ttr_hapax

    _write_docs(
        spark,
        tmp_path,
        [(0, "a b c d", "en", "uniq"), (1, "x x x x", "en", "loop")],
    )
    out = {r["source"]: r for r in q_ttr_hapax(spark, str(tmp_path)).collect()}
    assert out["uniq"]["ttr_bp"] == 10000 and out["uniq"]["hapax_bp"] == 10000
    assert out["loop"]["n_tokens"] == 4 and out["loop"]["n_types"] == 1
    assert out["loop"]["ttr_bp"] == 2500 and out["loop"]["hapax_bp"] == 0


def test_zipf_slope_negative_on_real_corpus(spark):
    from kafkastreamsjavachallenge_spark.queries.corpus import q_zipf_slope

    row = q_zipf_slope(spark, SF_DIR).collect()[0]
    assert 0 < row["n_top"] <= 100
    assert row["slope"] < 0  # frequency decreases with rank


def test_simhash_banding_finds_exactly_hamming2(spark, tmp_path):
    """The banded candidate join must return EXACTLY the Hamming≤2 pair
    set (pigeonhole: 3 disjoint 20-bit bands, ≤2 differing bits can touch
    ≤2 bands).  Verified against a brute-force all-pairs scan of the same
    60-bit signatures."""
    from kafkastreamsjavachallenge_spark.operators.dedup import simhash
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_simhash_neardup,
    )

    base = " ".join(f"w{j}" for j in range(30))
    rows = []
    for i in range(40):
        if i % 4 == 0:
            txt = base  # identical group -> hamming 0 pairs
        elif i % 4 == 1:
            txt = base + f" extra{i % 8}"  # near-identical variants
        else:
            txt = " ".join(f"v{i}_{j}" for j in range(25))  # distinct
        rows.append((i, txt, "en", "s"))
    _write_docs(spark, tmp_path, rows)

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash(
            spark.read.parquet(f"{tmp_path}/documents.parquet"),
            bits=60,
            hex_chars=15,
        ).collect()
    }
    truth = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 2
    }
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in q_simhash_neardup(spark, str(tmp_path)).collect()
    }
    assert {(a, b) for a, b, _ in got} == truth
    assert all(
        h == bin(sigs[a] ^ sigs[b]).count("1") and h <= 2 for a, b, h in got
    )
    assert truth, "fixture must plant at least one near-dup pair"


def test_containment_detects_embedded_quote(spark, tmp_path):
    """Doc 1 is a contiguous 20-token run of doc 0: every one of its
    shingles appears in doc 0 -> containment (1,0) = 10000, while the
    reverse direction stays far below the 80% gate (and is absent)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_containment

    big = " ".join(f"t{j}" for j in range(50))
    quote = " ".join(f"t{j}" for j in range(10, 30))
    other = " ".join(f"z{j}" for j in range(40))
    _write_docs(
        spark,
        tmp_path,
        [(0, big, "en", "s"), (1, quote, "en", "s"), (2, other, "en", "s")],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in q_containment(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(1, 0)}
    r = out[(1, 0)]
    assert r["containment_bp"] == 10000
    assert r["n_common"] == r["n_a"] == 18 and r["n_b"] == 48


def test_containment_max_df_drops_boilerplate_only(spark, tmp_path):
    """The max_df hot-shingle cap: three docs share a universal
    boilerplate prefix (df = 3 > cap of 2), docs 0 and 1 additionally
    share a genuine 12-token quote (each quote shingle has df = 2).
    With max_df=2 the boilerplate shingles leave the inverted index, so
    the quote pair survives on its real overlap while the
    boilerplate-only pairs (with doc 2) produce NO join rows at all —
    the skew the cap exists to cut."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_containment

    boiler = "of the and in to for"  # 4 boilerplate 3-shingles, df = 3
    quote = " ".join(f"q{j}" for j in range(20))  # 18 shingles, df = 2
    _write_docs(
        spark,
        tmp_path,
        [
            (0, f"{boiler} {quote} " + " ".join(f"a{j}" for j in range(30)), "en", "s"),
            (1, f"{boiler} {quote}", "en", "s"),
            (2, f"{boiler} " + " ".join(f"z{j}" for j in range(30)), "en", "s"),
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in q_containment(spark, str(tmp_path), max_df=2).collect()
    }
    # doc1 has 24 shingles (4 boiler + 2 bridge + 18 quote); the cap
    # drops the 4 df=3 boiler shingles -> inter(1,0) = 20 of n_a = 24
    # -> 8333 bp, still over the gate; no pair involving doc 2 can
    # appear (its only overlap was boilerplate, now gone from the index)
    assert all(2 not in pair for pair in out)
    assert (1, 0) in out and out[(1, 0)]["containment_bp"] == 8333
    assert out[(1, 0)]["n_common"] == 20


def test_hard_negatives_excludes_same_label(spark, tmp_path):
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_hard_negatives,
    )

    rows = [
        (0, _basis(0), 0),  # the query
        (5, [x * 0.9 for x in _basis(0)], 1),  # nearest, different label
        (6, _basis(0), 0),  # nearest of all but SAME label -> excluded
        (7, _basis(1), 2),  # orthogonal
    ]
    _write_embs(spark, tmp_path, rows)
    out = q_hard_negatives(spark, str(tmp_path)).collect()
    by_rank = {r["rk"]: r for r in out}
    assert all(r["query_id"] == 0 for r in out)
    assert 6 not in {r["vec_id"] for r in out}
    assert by_rank[1]["vec_id"] == 5 and by_rank[1]["cos_e6"] == 1000000
    assert by_rank[2]["vec_id"] == 7 and by_rank[2]["cos_e6"] == 0


def test_embedding_drift_identical_halves(spark, tmp_path):
    """Even/odd halves hold the SAME vectors -> per-component sums are
    equal integers -> drift cosine is 1.0 up to one ulp (d/(sqrt(d)*
    sqrt(d)) is not exactly 1 in IEEE), so the e6 floor is 999999 or
    1000000 — identically on both engines (same single-op sequence)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_embedding_drift,
    )

    rows = []
    for i in range(10):
        v = [((i * 13 + j) % 7) * 0.25 - 0.75 for j in range(64)]
        rows.append((2 * i, v, i % 3))
        rows.append((2 * i + 1, v, i % 3))
    _write_embs(spark, tmp_path, rows)
    for r in q_embedding_drift(spark, str(tmp_path)).collect():
        assert r["n_a"] == r["n_b"]
        assert r["drift_cos_e6"] in (999999, 1000000)


def test_cluster_sample_sqrt_allocation(spark, tmp_path):
    """8 orthogonal clusters with different sizes: the sample must keep
    exactly floor(sqrt(size)) rows per cluster."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_cluster_sample,
    )

    rows = [(c, _basis(c), 0) for c in range(8)]  # centroids, 1 per axis
    nxt = 8
    sizes = {}
    for c in range(8):
        extra = 2 + 3 * c  # members beyond the centroid vector itself
        for _ in range(extra):
            rows.append((nxt, _basis(c, scale=2.0), 0))
            nxt += 1
        sizes[c] = extra + 1
    _write_embs(spark, tmp_path, rows)
    out = q_cluster_sample(spark, str(tmp_path)).collect()
    per = {}
    for r in out:
        per[r["cluster_id"]] = per.get(r["cluster_id"], 0) + 1
        assert r["cluster_size"] == sizes[r["cluster_id"]]
        assert r["rk"] <= r["target"]
    assert per == {c: int(sizes[c] ** 0.5) for c in range(8)}


def test_bootstrap_ci_constant_column(spark, tmp_path):
    """With a constant n_chars every resampled mean equals the true mean,
    so CI collapses to a point: lo == mean == hi, 200 replicates."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_bootstrap_ci

    _write_docs(
        spark,
        tmp_path,
        [(i, "x" * 42, "en", "s") for i in range(50)],
    )
    r = q_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 50 and r["n_boot"] == 200
    assert r["mean_bp"] == r["ci_lo_bp"] == r["ci_hi_bp"] == 420000


def test_bootstrap_ci_brackets_mean_on_real_data(spark):
    from kafkastreamsjavachallenge_spark.queries.corpus import q_bootstrap_ci

    r = q_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert r["ci_lo_bp"] <= r["mean_bp"] <= r["ci_hi_bp"]
    assert r["ci_lo_bp"] < r["ci_hi_bp"]  # real data has variance


def test_watermark_audit_ordered_single_shard(spark, tmp_path):
    """One shard, event time monotone in arrival order -> everything is
    on_time and the histogram is a single 100% bucket."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_watermark_audit,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 0, "click", 1.0, "{}")
        for i in range(100)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = q_watermark_audit(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == "on_time" and r["n_events"] == 100
    assert r["max_late_ms"] == 0 and r["pct_bp"] == 10000


def test_group_kfold_keeps_dup_groups_together(spark, tmp_path):
    """4 exact copies of each of 50 texts: every fold must hold complete
    groups, i.e. n_docs == 4 * n_groups in every fold."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_group_kfold

    rows = []
    i = 0
    for g in range(50):
        for _ in range(4):
            rows.append((i, f"text of group {g} " * 3, "en", f"src{i % 7}"))
            i += 1
    _write_docs(spark, tmp_path, rows)
    out = q_group_kfold(spark, str(tmp_path)).collect()
    assert sum(r["n_docs"] for r in out) == 200
    assert sum(r["n_groups"] for r in out) == 50
    for r in out:
        assert r["n_docs"] == 4 * r["n_groups"], "dup group split across folds"


def test_rbo_identical_rankings_hits_truncated_max(spark, tmp_path):
    """All candidates colinear with the query -> every LSH bucket matches
    the query's, both retrievers return the identical ranking, X_d = d,
    and RBO hits the exact truncated maximum Σ w_d·d / D."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        _RBO_D,
        _RBO_W,
        q_rank_biased_overlap,
    )

    vec = [0.5] * 64
    rows = [(i, [x * (1.0 + i) for x in vec], 0) for i in range(12)]
    _write_embs(spark, tmp_path, rows)
    r = q_rank_biased_overlap(spark, str(tmp_path)).collect()[0]
    expected = sum(_RBO_W[d] * d for d in range(1, 11)) * 10000 // _RBO_D
    assert r["overlap_at_10"] == 10
    assert r["rbo_bp"] == expected  # 6513 bp for p=0.9 truncated at 10


def test_cosine_histogram_orthogonal_sample(spark, tmp_path):
    """Only hash-sampled ids participate; orthogonal vectors put every
    pair in bucket 0 with cosine exactly 0."""
    import hashlib

    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_cosine_histogram,
    )

    def h28(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:7], 16)

    sampled = [i for i in range(400) if h28(i) % 100 < 20][:6]
    skipped = [i for i in range(400) if h28(i) % 100 >= 20][:4]
    rows = [(vid, _basis(j % 64), 0) for j, vid in enumerate(sampled)]
    # non-sampled rows point in a shared direction: if they leaked into
    # the pair join they would create nonzero-cosine buckets
    rows += [(vid, [1.0] * 64, 0) for vid in skipped]
    _write_embs(spark, tmp_path, rows)
    out = q_cosine_histogram(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 0
    assert r["n_pairs"] == len(sampled) * (len(sampled) - 1) // 2
    assert r["min_cos_e6"] == r["max_cos_e6"] == 0


def test_bigram_entropy_closed_forms(spark, tmp_path):
    """Perfectly predictable alternation -> H = 0; a 2-way branching
    continuation after 'a' -> H = (4/7)·ln 2."""
    import math

    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_bigram_entropy,
    )

    _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b a b a b", "det", "s"),
            (1, "a b a c a b a c", "mix", "s"),
        ],
    )
    out = {r["lang"]: r for r in q_bigram_entropy(spark, str(tmp_path)).collect()}
    assert out["det"]["n_bigrams"] == 5
    assert out["det"]["cond_entropy_4"] == 0.0
    assert out["mix"]["n_bigrams"] == 7
    assert abs(out["mix"]["cond_entropy_4"] - (4 / 7) * math.log(2)) < 1e-3


def test_epoch_shuffle_reorders_between_epochs(spark, tmp_path):
    from kafkastreamsjavachallenge_spark.queries.corpus import q_epoch_shuffle

    _write_docs(
        spark, tmp_path, [(i, f"tok{i}", "en", "s") for i in range(100)]
    )
    out = q_epoch_shuffle(spark, str(tmp_path)).collect()
    per = {}
    for r in out:
        per.setdefault(r["epoch"], {})[r["pos"]] = r["doc_id"]
    assert sorted(per) == [1, 2, 3]
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())
    # the hash reshuffle must actually produce different epoch orders
    assert per[1] != per[2] and per[2] != per[3]
    # and each epoch's order is deterministic across invocations
    again = {
        (r["epoch"], r["pos"]): r["doc_id"]
        for r in q_epoch_shuffle(spark, str(tmp_path)).collect()
    }
    assert all(again[(e, p)] == d for e, v in per.items() for p, d in v.items())


def test_dup_cluster_sizes_conserves_docs(spark):
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_dup_cluster_sizes,
    )

    out = q_dup_cluster_sizes(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    assert all(r["cluster_size"] >= 1 for r in out)
    assert all(r["n_docs"] == r["cluster_size"] * r["n_clusters"] for r in out)


def test_k_anonymity_counts_small_classes(spark, tmp_path):
    """Classes: (A, h0) size 1, (B, h0) size 5, (C, h0) size 12 ->
    k=2 flags only A; k=5 likewise (B is exactly 5, not below); k=10
    flags A and B."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_k_anonymity

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    rows = (
        [(0, t0, 1, "A", 1.0, "{}")]
        + [(10 + i, t0, 1, "B", 1.0, "{}") for i in range(5)]
        + [(20 + i, t0, 1, "C", 1.0, "{}") for i in range(12)]
    )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r["k"]: r for r in q_k_anonymity(spark, str(tmp_path)).collect()}
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 1
    assert out[5]["n_classes"] == 1 and out[5]["n_rows"] == 1
    assert out[10]["n_classes"] == 2 and out[10]["n_rows"] == 6
    assert out[10]["pct_bp"] == 6 * 10000 // 18


def test_split_leakage_flags_duplicated_test_doc(spark, tmp_path):
    """A test-bucket doc that duplicates a train-bucket doc leaks 100% of
    its shingles; an unrelated test doc leaks none."""
    import hashlib

    from kafkastreamsjavachallenge_spark.queries.corpus import q_split_leakage

    def bucket(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:7], 16) % 100

    train_ids = [i for i in range(500) if bucket(i) < 80]
    test_ids = [i for i in range(500) if bucket(i) >= 90]
    leaked, clean = test_ids[0], test_ids[1]
    shared = " ".join(f"w{j}" for j in range(20))
    rows = [(train_ids[0], shared, "en", "s")]
    rows += [(train_ids[1], "other train text here", "en", "s")]
    rows += [(leaked, shared, "en", "s")]
    rows += [(clean, " ".join(f"q{j}" for j in range(15)), "en", "s")]
    _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in q_split_leakage(spark, str(tmp_path)).collect()}
    assert out[leaked]["shared_bp"] == 10000 and out[leaked]["rk"] == 1
    assert out[clean]["shared_bp"] == 0 and out[clean]["n_shared"] == 0


def test_score_calibration_maps_medians_to_corpus_percentile(spark, tmp_path):
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_score_calibration,
    )

    rows = [
        (0, "x" * 10, "en", "short"),
        (1, "x" * 20, "en", "short"),
        (2, "x" * 30, "en", "short"),
        (3, "x" * 40, "en", "long"),
        (4, "x" * 50, "en", "long"),
        (5, "x" * 60, "en", "long"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: r
        for r in q_score_calibration(spark, str(tmp_path)).collect()
    }
    # medians: 20 (corpus rank 2 of 6 -> 2000bp), 50 (rank 5 -> 8000bp)
    assert out["short"]["median_score"] == 20
    assert out["short"]["corpus_pct_bp"] == (2 - 1) * 10000 // 5
    assert out["long"]["median_score"] == 50
    assert out["long"]["corpus_pct_bp"] == (5 - 1) * 10000 // 5


def test_js_divergence_zero_for_identical_distributions(spark, tmp_path):
    """Two sources with the same unigram distribution == the corpus
    distribution -> JS divergence exactly 0 (every log term is ln 1)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_js_divergence,
    )

    text = "alpha beta beta gamma"
    _write_docs(
        spark,
        tmp_path,
        [(0, text, "en", "a"), (1, text, "en", "b")],
    )
    out = {r["source"]: r for r in q_js_divergence(spark, str(tmp_path)).collect()}
    assert out["a"]["js_4"] == 0.0 and out["b"]["js_4"] == 0.0
    # disjoint vocabularies -> strictly positive, bounded by ln 2
    _write_docs(
        spark,
        tmp_path,
        [(0, "a1 a2 a3 a4", "en", "a"), (1, "b1 b2 b3 b4", "en", "b")],
    )
    out2 = q_js_divergence(spark, str(tmp_path)).collect()
    for r in out2:
        assert 0 < r["js_4"] <= 0.6932


def test_rbo_integer_weights_match_exact_rationals():
    """Property: for ANY overlap profile X_1..X_10 (monotone, X_d <= d,
    steps <= 1), the integer-weight formula (sum w_d*X_d * 10^4) // D
    equals floor(10^4 * RBO) computed in exact rational arithmetic —
    i.e. the pinned weight table IS truncated RBO(p=9/10), not an
    approximation of it."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkastreamsjavachallenge_spark.queries.corpus import _RBO_D, _RBO_W

    @st.composite
    def overlap_profiles(draw):
        xs, x = [], 0
        for d in range(1, 11):
            step = draw(st.integers(min_value=0, max_value=1))
            x = min(x + step, d)
            xs.append(x)
        return xs

    @given(overlap_profiles())
    @settings(max_examples=200, deadline=None)
    def check(xs):
        p = Fraction(9, 10)
        exact = sum(
            (1 - p) * p ** (d - 1) * Fraction(xs[d - 1], d)
            for d in range(1, 11)
        )
        want = (exact * 10000).__floor__()
        got = (sum(_RBO_W[d] * xs[d - 1] for d in range(1, 11)) * 10000) // _RBO_D
        assert got == want, (xs, got, want)

    check()


def test_ann_batch_finds_colinear_neighbors(spark, tmp_path):
    """8 axis-aligned queries, each with colinear corpus members: every
    query's own-bucket probe must surface its axis family, rank 1 per
    query is the lowest-id member at cosine exactly 1 (2a/(1*2) = 1.0
    -> e6 floor 1000000)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_ann_batch

    rows = [(a, _basis(a), 0) for a in range(8)]  # the queries
    first_member = {}
    nxt = 8
    for a in range(8):
        for m in range(3):
            rows.append((nxt, _basis(a, scale=2.0 + m), 0))
            first_member.setdefault(a, nxt)
            nxt += 1
    _write_embs(spark, tmp_path, rows)
    out = q_ann_batch(spark, str(tmp_path)).collect()
    top1 = {r["query_id"]: r for r in out if r["rk"] == 1}
    assert sorted(top1) == list(range(8))
    for a in range(8):
        assert top1[a]["vec_id"] == first_member[a]
        assert top1[a]["cos_e6"] == 1000000
    assert all(1 <= r["rk"] <= 3 for r in out)


def test_rejection_sample_rates(spark, tmp_path):
    """Docs at max length are always accepted (rate 10000); 1-char docs
    are accepted only when their hash lands on exactly h=0 — computed
    explicitly so the expected count is exact."""
    import hashlib

    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_rejection_sample,
    )

    def h(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:7], 16) % 10000

    rows = [(i, "x" * 5000, "en", "full") for i in range(20)]
    rows += [(100 + i, "y", "en", "tiny") for i in range(50)]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in q_rejection_sample(spark, str(tmp_path)).collect()}
    assert out["full"]["n_accepted"] == 20 and out["full"]["acc_bp"] == 10000
    # tiny docs: rate_bp = (1*10000)//5000 = 2 -> accepted iff h < 2
    want_tiny = sum(1 for i in range(50) if h(100 + i) < 2)
    assert out["tiny"]["n_accepted"] == want_tiny


def test_ks_test_disjoint_and_overlap(spark, tmp_path):
    """Two fully disjoint length distributions give the supremum KS of
    1.0 (e6 = 1000000); a half-overlapping pair gives exactly 0.5."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_ks_test

    rows = [(i, "x" * (10 + i), "en", "a") for i in range(10)]
    rows += [(100 + i, "x" * (30 + i), "en", "b") for i in range(10)]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in q_ks_test(spark, str(tmp_path)).collect()}
    assert out["a"]["n_docs"] == 10 and out["b"]["n_docs"] == 10
    assert out["a"]["ks_e6"] == 1000000
    assert out["b"]["ks_e6"] == 1000000

    rows = [
        (0, "x" * 10, "en", "a"),
        (1, "x" * 20, "en", "a"),
        (2, "x" * 10, "en", "b"),
        (3, "x" * 30, "en", "b"),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in q_ks_test(spark, str(tmp_path)).collect()}
    # CDFs agree at 10 (.5 vs .5); at 20 F_a=1 vs F_b=.5 -> sup = .5
    assert out["a"]["ks_e6"] == 500000
    assert out["b"]["ks_e6"] == 500000


def test_spearman_perfect_and_reversed(spark, tmp_path):
    """A source where token count rises with char length has rho = 1
    (sum_d2 = 0); a source where they move in opposite directions has
    rho = -1 with the exact reversal sum_d2 = n(n^2-1)/3 = 40 at n=5."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_spearman

    mono = [(i, " ".join(["aa"] * (i + 1)), "en", "mono") for i in range(5)]
    # lengths k*(L+1)-1 strictly decreasing while n_tok = k increases
    anti = [
        (10 + k, " ".join(["z" * L] * k), "en", "anti")
        for k, L in [(1, 100), (2, 40), (3, 20), (4, 10), (5, 5)]
    ]
    _write_docs(spark, tmp_path, mono + anti)
    out = {r["source"]: r for r in q_spearman(spark, str(tmp_path)).collect()}
    assert out["mono"]["sum_d2"] == 0 and out["mono"]["rho_4"] == 1.0
    assert out["anti"]["sum_d2"] == 40 and out["anti"]["rho_4"] == -1.0


def test_semantic_decontaminate_flags_paraphrase_twin(spark, tmp_path):
    """A corpus vector equal to a benchmark vector is flagged with cosine
    exactly 1e6 against that benchmark id; a 3-4-5 mixture points at its
    dominant benchmark with cos_e6 = 800000; an orthogonal vector scores
    0 and survives (bench_id 0 on the all-tied-at-zero row via the
    min-id tie-break)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_semantic_decontaminate,
    )

    rows = [
        (0, _basis(0), 0),
        (1, _basis(1), 0),
        (20, _basis(0), 1),
        (21, [3.0 if i == 0 else (4.0 if i == 1 else 0.0) for i in range(64)], 1),
        (22, _basis(5), 1),
    ]
    _write_embs(spark, tmp_path, rows)
    out = {
        r["vec_id"]: r
        for r in q_semantic_decontaminate(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [20, 21, 22]
    assert out[20]["bench_id"] == 0 and out[20]["cos_e6"] == 1000000
    assert out[20]["contaminated"] == 1
    # dot = 4, norm = 5 exactly (9+16=25): cos = 4/5 -> e6 floor 800000
    assert out[21]["bench_id"] == 1 and out[21]["cos_e6"] == 800000
    assert out[21]["contaminated"] == 1
    assert out[22]["cos_e6"] == 0 and out[22]["contaminated"] == 0
    assert out[22]["bench_id"] == 0


def test_seasonal_decompose_pure_daily_cycle(spark, tmp_path):
    """One event per hour with value = hod - 11.5 (zero-sum over a day):
    every full 24-row window sums to 0, so the trend vanishes and the
    seasonal index recovers hod - 11.5 exactly at every hour-of-day."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_seasonal_decompose,
    )

    base = datetime.datetime(2024, 3, 1, 0, 1, 0)
    rows = [
        (
            day * 24 + hod,
            base + datetime.timedelta(hours=day * 24 + hod),
            7,
            "view",
            float(hod) - 11.5,
            "{}",
        )
        for day in range(4)
        for hod in range(24)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {
        r["hod"]: r for r in q_seasonal_decompose(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == list(range(24))
    for hod in range(24):
        assert out[hod]["seasonal_4"] == pytest.approx(hod - 11.5, abs=0)
        assert out[hod]["n_hours"] >= 2


def _write_events(spark, path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, ts, u, et, v, "{}") for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_auc_separation_ties_and_midranks(spark, tmp_path):
    """Perfectly separated scores give AUC exactly 1; an all-tied score
    column gives exactly 0.5 through the midrank path; a hand-computed
    mixed case with one tie straddling the classes gives 5/8."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_auc

    ts = datetime.datetime(2024, 5, 1)
    sep = [(i, ts, 1, "purchase", 100.0 + i) for i in range(10)]
    sep += [(100 + i, ts, 1, "view", float(i)) for i in range(10)]
    _write_events(spark, tmp_path, sep)
    r = q_auc(spark, str(tmp_path)).collect()[0]
    assert r["n_pos"] == 10 and r["n_neg"] == 10
    assert r["auc_e6"] == 1000000

    tied = [(i, ts, 1, "purchase" if i < 4 else "click", 7.0) for i in range(10)]
    _write_events(spark, tmp_path, tied)
    r = q_auc(spark, str(tmp_path)).collect()[0]
    assert r["auc_e6"] == 500000

    # values 1,2,3,3,4 with the positive on one of the tied 3s:
    # r2(3) = 2*3 + 2 - 1 = 7, U2 = 7 - 1*2 = 5, AUC = 5/8
    mixed = [
        (0, ts, 1, "view", 1.0),
        (1, ts, 1, "view", 2.0),
        (2, ts, 1, "purchase", 3.0),
        (3, ts, 1, "view", 3.0),
        (4, ts, 1, "view", 4.0),
    ]
    _write_events(spark, tmp_path, mixed)
    r = q_auc(spark, str(tmp_path)).collect()[0]
    assert r["n_pos"] == 1 and r["n_neg"] == 4
    assert r["auc_e6"] == 625000


def test_silhouette_perfect_clusters(spark, tmp_path):
    """Two tight clusters on orthogonal axes: every vector sits exactly
    on its own centroid (a = 0) with the rival centroid at positive
    distance, so every silhouette — and both means — is exactly 1e6."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_silhouette

    rows = [(i, _basis(0, 2.0), 0) for i in range(3)]
    rows += [(10 + i, _basis(1, 2.0), 1) for i in range(3)]
    _write_embs(spark, tmp_path, rows)
    out = {r["label"]: r for r in q_silhouette(spark, str(tmp_path)).collect()}
    assert sorted(out) == [0, 1]
    for lbl in (0, 1):
        assert out[lbl]["n_vecs"] == 3
        assert out[lbl]["mean_sil_e6"] == 1000000


def test_compaction_plan_rolls_per_source(spark, tmp_path):
    """Source 'a': four 2048-char docs pack two-per-file at exactly the
    4096 target (fill_bp = 10000); source 'b': three 3000-char docs roll
    when full — the first file overflows to 6000 chars (roll-when-full
    keeps the straddling doc), the second holds the remainder.  Sources
    pack independently (the window partitions by source)."""
    from kafkastreamsjavachallenge_spark.queries.corpus import (
        q_compaction_plan,
    )

    rows = [(i, "x" * 2048, "en", "a") for i in range(4)]
    rows += [(10 + i, "y" * 3000, "en", "b") for i in range(3)]
    _write_docs(spark, tmp_path, rows)
    out = {
        (r["source"], r["file_id"]): r
        for r in q_compaction_plan(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
    for fid in (0, 1):
        r = out[("a", fid)]
        assert r["n_docs"] == 2 and r["bytes"] == 4096
        assert r["fill_bp"] == 10000
    r0, r1 = out[("b", 0)], out[("b", 1)]
    assert r0["n_docs"] == 2 and r0["bytes"] == 6000
    assert r0["fill_bp"] == 6000 * 10000 // 4096
    assert r1["n_docs"] == 1 and r1["bytes"] == 3000
    assert r1["fill_bp"] == 3000 * 10000 // 4096


def test_l_diversity_thresholds(spark, tmp_path):
    """Three QI classes with user-diversity 1, 5 and 2 over 12 rows:
    l=2 catches only the single-user class, l=5 adds the 2-user class,
    l=10 catches all three — counts and basis-point shares are exact."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_l_diversity

    t = datetime.datetime(2024, 1, 1, 9, 0, 0)
    rows = [(i, t, 7, "view", 1.0) for i in range(5)]
    rows += [(10 + i, t, 100 + i, "click", 1.0) for i in range(5)]
    t2 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows += [(20 + i, t2, 200 + i, "view", 1.0) for i in range(2)]
    _write_events(spark, tmp_path, rows)
    out = {r["l"]: r for r in q_l_diversity(spark, str(tmp_path)).collect()}
    assert sorted(out) == [2, 5, 10]
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 5
    assert out[2]["pct_bp"] == 5 * 10000 // 12
    assert out[5]["n_classes"] == 2 and out[5]["n_rows"] == 7
    assert out[5]["pct_bp"] == 7 * 10000 // 12
    assert out[10]["n_classes"] == 3 and out[10]["n_rows"] == 12
    assert out[10]["pct_bp"] == 10000


def test_concurrency_sweep_closed_intervals_and_singleton(spark, tmp_path):
    """Three users on one day: u1 spans 9:00-11:00, u2 spans 10:00-12:00,
    u3 spans exactly [11:00, 13:00] — u3 starts the instant u1 ends, and
    under the closed [s, e] convention (starts sort before ends at equal
    t) all three are live at 11:00, so the peak is 3.  A second day with
    one singleton span (s == e) is point activity that still counts:
    peak 1, not the silent 0 the old half-open ordering produced."""
    from kafkastreamsjavachallenge_spark.queries.timeseries import (
        q_concurrency_sweep,
    )

    def t(d, h):
        return datetime.datetime(2024, 1, d, h, 0, 0)

    rows = [
        (1, t(1, 9), 1, "view", 1.0), (2, t(1, 11), 1, "view", 1.0),
        (3, t(1, 10), 2, "view", 1.0), (4, t(1, 12), 2, "view", 1.0),
        (5, t(1, 11), 3, "view", 1.0), (6, t(1, 13), 3, "view", 1.0),
        (7, t(2, 9), 9, "view", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["day"].day: r
        for r in q_concurrency_sweep(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_spans"] == 3 and out[1]["peak_concurrency"] == 3
    assert out[2]["n_spans"] == 1 and out[2]["peak_concurrency"] == 1


def test_skyline_dominance_closed_form(spark, tmp_path):
    """Five planted (n_tok, n_chars) points with a known frontier:
    (4 tok, 40ch) dominates (4, 50) same-tok and (3, 45) fewer-tok-more-
    chars; (2, 20) survives (cheaper than everything above); (5, 60)
    survives (nothing above it).  Frontier = {(5,60), (4,40), (2,20)};
    the (4,*) row must report BOTH docs at that token count."""
    from kafkastreamsjavachallenge_spark.queries.corpus import q_skyline

    specs = [(0, 5, 60), (1, 4, 40), (2, 4, 50), (3, 3, 45), (4, 2, 20)]
    data = []
    for i, nt, nc in specs:
        text = " ".join(f"t{j}" for j in range(nt))
        data.append((i, text, "en", "s", nc))
    spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r["n_tok"]: r for r in q_skyline(spark, str(tmp_path)).collect()}
    assert sorted(out) == [2, 4, 5]
    assert out[5]["min_chars"] == 60 and out[5]["n_docs"] == 1
    assert out[4]["min_chars"] == 40 and out[4]["n_docs"] == 2
    assert out[2]["min_chars"] == 20 and out[2]["n_docs"] == 1
