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
# the most to prove — never-checked first (cleared by r08: lifetime
# coverage equals the registry, 308/308), then oldest-checked.
# r09 (this slate, per round-8 VERDICT item 4 "re-burn the stale
# third"): 2 pinned flagships (the reference-parity headliner and the
# 1-row source canary — the other four round-8 flagships were all green
# r08 and give up their slots to stale ids this round); the NEW
# never-driver-checked id q_semdedup_blas; the 5 ids whose
# oracles CHANGED this round (q_ann_lsh family — the LSH retrieval moved
# from 8-bit bucket probing to 192-bit SRP signatures + Hamming<=84 for
# deployment-grade recall, which rewrites _ANN_LSH_CTES and so also
# q_ann_recall / q_ann_frontier / q_rank_biased_overlap; plus
# q_maxsim_blas whose e2 contract gained the symmetric +1e-9 off-grid
# nudge from round-8 ADVICE); then the 43 ids whose latest driver-green
# row is r01/r02 — six-plus rounds of shared-operator churn ago —
# ordered oldest-checked first.  Green slate => no id's latest check
# older than r03, and every oracle-touched id re-burned same-round.
_PRIORITY = (
    # flagship constants — every round
    "q_source_scan",
    "q_unique_users",
    # oracle changed this round: SRP signature LSH + dependents
    "q_ann_lsh",
    "q_ann_recall",
    "q_ann_frontier",
    "q_rank_biased_overlap",
    # oracle changed this round: symmetric off-grid rounding nudge
    "q_maxsim_blas",
    # NEW ids this round (never driver-checked): the BLAS SemDeDup and
    # PQ twins — never-checked outranks oldest-checked, so they take the
    # slate slots of two r02 stale ids (q_ngram_jaccard, q_minhash_sig
    # roll to the r10 burn)
    "q_semdedup_blas",
    "q_ann_pq_blas",
    "q_ann_ivfpq_blas",
    "q_ann_pq_refine",
    # stale burn: latest driver-green row r01 (39 ids)
    "q_agg_multi",
    "q_cube",
    "q_date_trunc",
    "q_dedup_window",
    "q_distinct",
    "q_except",
    "q_from_unixtime",
    "q_intersect",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_full",
    "q_join_inner",
    "q_join_left",
    "q_join_range",
    "q_join_semi",
    "q_lag_lead",
    "q_math_fns",
    "q_null_filter",
    "q_orderby",
    "q_project_cast",
    "q_rollup",
    "q_row_number",
    "q_running_sum",
    "q_session_window",
    "q_sliding_window",
    "q_string_fns",
    "q_topk",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q18",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q9",
    "q_union",
    "q_windowed_count",
    # (the four r02 stale ids — q_ngram_jaccard, q_minhash_sig,
    # q_fingerprint, q_ewma — all gave their slots to this round's new
    # never-checked ids and roll to the r10 burn)
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
