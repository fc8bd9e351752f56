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
