"""Degenerate-input robustness: every registered query must plan AND
execute over completely EMPTY tables (schema preserved, zero rows) —
the first thing a real deployment hits on a fresh topic/bucket.  No
oracle compare here (DuckDB trivially agrees on empty); the property
under test is "no exception": no division-by-zero crash, no empty-fold
error, no first()-on-empty surprise anywhere in 200+ operators."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kafkastreamsjavachallenge_spark.queries import registry

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        src = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], f.type) for f in src}),
            f"{d}/{t}.parquet",
        )
    return d


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_survives_empty_tables(name, spark, empty_sf):
    fn, _ = registry()[name]
    df = fn(spark, empty_sf)
    assert df.count() >= 0
    assert len(df.columns) > 0


_KEY_COLS = {
    "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey", "p_partkey",
    "o_orderkey", "l_orderkey", "l_linenumber", "event_id", "doc_id",
    "vec_id",
}


@pytest.fixture(scope="module")
def nulled_sf(tmp_path_factory):
    """sf0.001 tables with every 3rd row of every non-key column nulled —
    the dirty-feed edge (keys stay sane so joins remain meaningful)."""
    import pyarrow.compute as pc

    d = str(tmp_path_factory.mktemp("sf_nulls"))
    for t in TABLES:
        tbl = pq.read_table(f"{SF_DIR}/{t}.parquet")
        n = tbl.num_rows
        mask = pa.array([i % 3 == 0 for i in range(n)])
        cols = {}
        for f in tbl.schema:
            col = tbl[f.name].combine_chunks()
            cols[f.name] = (
                col
                if f.name in _KEY_COLS
                else pc.if_else(mask, pa.nulls(n, f.type), col)
            )
        pq.write_table(pa.table(cols), f"{d}/{t}.parquet")
    return d


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_survives_nulled_columns(name, spark, nulled_sf):
    """Found a real bug on first run: the multimodal Arrow decode path
    crashed on null payloads (fixed: null features + nullable Int32)."""
    fn, _ = registry()[name]
    df = fn(spark, nulled_sf)
    assert df.count() >= 0


_ADVERSARIAL_TEXT = [
    "café naïve résumé über straße",
    "日本語 テスト 中文 한국어",
    "emoji \U0001F600 \U0001F680 mixed ascii",
    "combining é à ô marks",
    "double  space and\ttab\tinside",
    "trailing spaces   ",
    "   leading spaces",
    "zero​width and nbsp space",
    "rtl שלום مرحبا text",
    "math ∞ ∑ ∫ symbols",
    # a NEAR-DUP unicode pair: enough shared 3-shingles to collide in
    # MinHash banding, differing by one emoji token — forces the
    # edit-distance / containment verify stages onto multi-byte text
    # (the class of bug fuzz seed 206 caught: char-counting Spark
    # levenshtein vs byte-counting DuckDB)
    "日本語 emoji \U0001F600 shared run of tokens alpha beta gamma delta "
    "epsilon zeta eta theta iota kappa",
    "日本語 emoji \U0001F680 shared run of tokens alpha beta gamma delta "
    "epsilon zeta eta theta iota kappa",
]


@pytest.fixture(scope="module")
def unicode_sf(tmp_path_factory):
    """sf0.001 with the first 10 documents replaced by adversarial
    unicode (CJK, emoji, RTL, zero-width, combining marks, tab/space
    weirdness) — cross-engine hashing and tokenization must agree on
    the raw UTF-8 bytes, not just ASCII."""
    import shutil

    d = str(tmp_path_factory.mktemp("sf_unicode"))
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    for i, txt in enumerate(_ADVERSARIAL_TEXT):
        tbl.loc[tbl.index[i], "text"] = txt
        tbl.loc[tbl.index[i], "n_chars"] = len(txt)
    pq.write_table(
        pa.Table.from_pandas(tbl, preserve_index=False), f"{d}/documents.parquet"
    )
    return d


# the text-heavy ids most exposed to unicode: full oracle value-compare,
# not just no-crash (the all-202 sweep runs in the driver sim; this keeps
# the suite's copy fast)
_UNICODE_CHECK = [
    "q_doc_dedup", "q_minhash_pairs", "q_ngram_jaccard", "q_simhash",
    "q_fingerprint", "q_token_count", "q_text_stats", "q_bpe_tokenize",
    "q_remove_dup_spans", "q_bm25", "q_dsir_weights", "q_chunk_dedup",
    "q_lang_id", "q_unigram_logprob",
    # verify stages that now see a planted unicode near-dup PAIR (the
    # last two adversarial texts collide in MinHash banding)
    "q_edit_distance", "q_neardup_verified", "q_minhash_estimate",
    "q_containment", "q_simhash_neardup", "q_ttr_hapax", "q_heaps_law",
    "q_incremental_dedup", "q_split_leakage", "q_group_kfold",
]


@pytest.mark.parametrize("name", _UNICODE_CHECK)
def test_unicode_parity(name, spark, unicode_sf):
    """Exact Spark-vs-DuckDB parity on the unicode-contaminated corpus.
    First run caught a real bug: ngram_jaccard raised on 0/0 for docs
    shorter than the shingle width (now dropped, matching the oracle)."""
    import duckdb
    import pandas as pd

    from tests.test_parity import REG, normalize

    fn, sql = REG[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{unicode_sf}/{t}.parquet')"
        )
    got = normalize(fn(spark, unicode_sf).toPandas())
    want = normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.fixture(scope="module")
def extreme_sf(tmp_path_factory):
    """sf0.001 with (a) NaN / ±Inf / 1e308 injected into events.value,
    (b) ALL user_ids collapsed to one key (maximal skew), and (c) one
    100k-token document.  First runs caught two real bugs: the quadratic
    HOF re-evaluation on long documents (fixed by `let` in
    functions/text.py) and a decimal-overflow abort in the CDC upsert
    (fixed with try_cast)."""
    import shutil

    d = str(tmp_path_factory.mktemp("sf_extreme"))
    for t in TABLES:
        if t not in ("events", "documents"):
            shutil.copy(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    n = len(ev)
    step = max(n // 50, 1)
    ev.loc[ev.index[::step], "value"] = float("nan")
    ev.loc[ev.index[1::step], "value"] = float("inf")
    ev.loc[ev.index[2::step], "value"] = -float("inf")
    ev.loc[ev.index[3::step], "value"] = 1e308
    ev["user_id"] = 1
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False), f"{d}/events.parquet")
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    big = " ".join(f"w{i % 997}" for i in range(100_000))
    docs.loc[docs.index[0], "text"] = big
    docs.loc[docs.index[0], "n_chars"] = len(big)
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), f"{d}/documents.parquet"
    )
    return d


@pytest.mark.parametrize("name", sorted(registry()))
def test_query_survives_extreme_inputs(name, spark, extreme_sf):
    fn, _ = registry()[name]
    df = fn(spark, extreme_sf)
    assert df.count() >= 0
