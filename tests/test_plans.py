"""Physical-plan quality gates: the properties that make these operators
survive a 100 TB scale-up.  Each assertion pins a plan shape — if a code
change silently introduces an extra shuffle, drops a broadcast, or breaks
scan-level pushdown, these fail before any benchmark does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamsjavachallenge_spark.catalog import load_table
from kafkastreamsjavachallenge_spark.queries import registry

from tests.conftest import SF_DIR

REG = registry()


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushed_to_scan(spark):
    """Predicate + column pruning reach the parquet reader."""
    df = REG["q_filter"][0](spark, SF_DIR)
    p = plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)" in p
    # column pruning: scan must not read the unused props/value columns
    assert "props" not in p.split("ReadSchema")[1]


def test_broadcast_join_is_broadcast(spark):
    df = REG["q_join_broadcast"][0](spark, SF_DIR)
    assert "BroadcastHashJoin" in plan(df)


def test_topk_is_take_ordered_not_global_sort(spark):
    df = REG["q_topk"][0](spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan(df)


def test_flagship_has_partial_aggregation(spark):
    """countDistinct plans as two-phase (partial_count + final) hash
    aggregation around a single window-key exchange."""
    p = plan(REG["q_unique_users"][0](spark, SF_DIR))
    assert "HashAggregate" in p
    assert "partial_count" in p


def test_semi_anti_join_types(spark):
    assert "LeftSemi" in plan(REG["q_join_semi"][0](spark, SF_DIR))
    assert "LeftAnti" in plan(REG["q_join_anti"][0](spark, SF_DIR))


def test_lsh_self_join_reuses_exchange(spark):
    """The LSH candidate self-join must not recompute the signature
    pipeline twice: the two join inputs are identical subplans, so the
    physical plan (with AQE resolved) reuses one shuffle exchange."""
    df = REG["q_minhash_pairs"][0](spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()  # resolve AQE
    p = plan(df)
    assert "ReusedExchange" in p or p.count("FileScan parquet") <= 2


def test_scalar_pack_is_whole_stage_codegen(spark):
    """Projection-only queries stay in one WholeStageCodegen span — no
    exchanges, no interpreted expressions in the hot path."""
    p = plan(REG["q_string_fns"][0](spark, SF_DIR))
    assert "Exchange" not in p
    assert p.lstrip().startswith("*(1)")  # '*' marks a WholeStageCodegen span
