"""Local mirror of the driver's t2 DuckDB-oracle gate: run every registered
query on Spark and its oracle on DuckDB over the same parquet (sf0.001),
compare row count + column names + values (order-insensitive, exact)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from kafkastreamsjavachallenge_spark.queries import registry

from tests.conftest import SF_DIR

REG = registry()
WITH_ORACLE = sorted(name for name, (_, sql) in REG.items() if sql is not None)
ROWS_ONLY = sorted(name for name, (_, sql) in REG.items() if sql is None)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, duck):
    fn, sql = REG[name]
    got = normalize(fn(spark, SF_DIR).toPandas())
    want = normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)} duck={list(want.columns)}"
    )
    assert len(got) == len(want), f"rowcount mismatch: spark={len(got)} duck={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, spark):
    fn, _ = REG[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.columns) > 0
