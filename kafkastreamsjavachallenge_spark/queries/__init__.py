"""Query registry: every SURVEY.md §2 query id → (Spark callable, DuckDB
oracle SQL).

Each Spark callable has signature ``(spark, sf_dir) -> DataFrame`` and every
computed column is aliased identically in the Spark plan and the oracle SQL
(driver compares row-count + schema + order-insensitive value hash).
Oracle ``None`` → non-SQL-expressible (approximate/streaming-only) →
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafkastreamsjavachallenge_spark.queries import (
    analytics,
    applied,
    audits,
    breadth,
    core,
    corpus,
    extended,
    graphs,
    llm,
    quality,
    relational,
    streaming_q,
    timeseries,
)

_MODULES = (
    core,
    relational,
    extended,
    analytics,
    breadth,
    applied,
    graphs,
    timeseries,
    quality,
    llm,
    corpus,
    audits,
    streaming_q,
)

# The external grader's CORRECTNESS check covers the FIRST 50 registry ids,
# so registration order is part of the public surface.  The slate ROTATES
# each round: flagship canaries stay pinned and the rest are the ids with
# the most to prove — never-checked first, then oldest-checked.
# r11 (this slate, per round-10 VERDICT item 3 "burn q_grid_join"):
# 2 pinned flagships; q_grid_join FIRST after them — the single registry
# id whose latest driver-green row is r03 (its r10 slot went to the new
# q_ann_ivfpq_refine); then the 41 ids whose latest driver-green row is
# r04, alphabetical, and the 6 alphabetically-first of the 44 r05 ids to
# fill the 50.  Green slate => zero registry ids with a driver check
# older than r05.
_PRIORITY = (
    # flagship constants — every round
    "q_source_scan",
    "q_unique_users",
    # stale burn: the ONE id whose latest driver-green row is r03
    "q_grid_join",
    # stale burn: latest driver-green row r04 (all 41 ids)
    "q_ann_pq",
    "q_bm25",
    "q_bpe_tokenize",
    "q_chunk_dedup",
    "q_cume_dist",
    "q_curriculum",
    "q_dataset_diff",
    "q_decontaminate",
    "q_dense_rank",
    "q_domain_cap",
    "q_dsir_weights",
    "q_first_last",
    "q_fuzzy_join",
    "q_gopher_repetition",
    "q_hll_explicit",
    "q_hybrid_rrf",
    "q_mix_weights",
    "q_ntile",
    "q_pca_project",
    "q_percent_rank",
    "q_pii_scrub",
    "q_priority_sample",
    "q_range_frame",
    "q_remove_dup_spans",
    "q_rp_project",
    "q_sample_hash",
    "q_shard_assign",
    "q_stratified_sample",
    "q_stream_curation",
    "q_stream_session",
    "q_tpch_q11",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q2",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
    "q_tpch_q8",
    "q_train_test_split",
    # stale burn: oldest r05 ids, alphabetical (6 slots remaining)
    "q_ann_ivfpq",
    "q_array_fns",
    "q_autocorr",
    "q_batch_padding",
    "q_bit_agg",
    "q_bool_agg",
)


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    flat: dict[str, tuple] = {}
    for m in _MODULES:
        for name, spec in m.QUERIES.items():
            assert name not in flat, f"duplicate query id {name}"
            flat[name] = spec
    missing = [n for n in _PRIORITY if n not in flat]
    assert not missing, f"_PRIORITY ids not registered: {missing}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate id in _PRIORITY"
    out: dict[str, tuple] = {name: flat[name] for name in _PRIORITY}
    for name, spec in flat.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
