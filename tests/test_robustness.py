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
