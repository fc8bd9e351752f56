"""Physical/optimized plan accessors and structural summaries.

Everything goes through the public ``df._jdf.queryExecution()`` surface —
no Spark internals beyond the stable plan-string format that
``df.explain()`` itself prints.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan string — what ``df.explain()`` prints."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    """The Catalyst-optimized logical plan string."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` output as a string (operator tree + details)."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the data source scans, one entry per scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the columns actually read off disk."""
    return re.findall(r"ReadSchema: ([^\n]*)", executed_plan(df))


@dataclass
class PlanSummary:
    """Structural facts about a physical plan, for assertions and lints."""

    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    n_file_scans: int = 0
    n_reused_exchanges: int = 0
    joins: list[str] = field(default_factory=list)
    has_cartesian: bool = False
    has_bnlj_cross: bool = False
    python_eval_ops: list[str] = field(default_factory=list)
    codegen_spans: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)


_JOIN_RE = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\b"
)
_PY_EVAL_RE = re.compile(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                         r"FlatMapGroupsInPandas\w*)\b")


def plan_summary(df: DataFrame) -> PlanSummary:
    p = executed_plan(df)
    return PlanSummary(
        # 'Exchange' counts shuffle exchanges; broadcasts counted separately.
        n_exchanges=len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", p)),
        n_broadcast_exchanges=p.count("BroadcastExchange"),
        n_file_scans=p.count("FileScan"),
        n_reused_exchanges=p.count("ReusedExchange"),
        joins=_JOIN_RE.findall(p),
        has_cartesian="CartesianProduct" in p,
        has_bnlj_cross=re.search(r"BroadcastNestedLoopJoin [^\n]*Cross", p)
        is not None,
        python_eval_ops=sorted(set(_PY_EVAL_RE.findall(p))),
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", p))),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", p),
    )
