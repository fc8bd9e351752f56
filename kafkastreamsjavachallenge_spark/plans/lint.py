"""Plan-quality linter: flags physical-plan shapes that will not survive a
large scale-up, before any benchmark catches them.

Rules (each encodes a 100 TB failure mode):
- ``cartesian-product``: O(n*m) — always a bug at scale unless one side is
  provably tiny and bounded.
- ``python-row-eval``: ``BatchEvalPython`` means a row-at-a-time Python UDF
  in the hot path (Arrow/pandas variants are allowed — they batch).
- ``full-width-scan``: a file scan reading 8+ columns while the query
  projects few — column pruning lost (heuristic: ReadSchema wider than
  24 fields is always reported).
- ``no-pushdown-with-filter``: the plan has a Filter directly above a scan
  whose PushedFilters is empty — predicate pushdown lost.
- ``broadcast-candidate``: a SortMergeJoin whose one side is a scan of a
  table below the broadcast threshold — a missed broadcast.

``lint(df)`` returns findings, it never raises: plan linting is advisory
(AQE may fix some of these at runtime, and tests pin the ones that must
hold).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from kafkastreamsjavachallenge_spark.plans.introspect import (
    executed_plan,
    plan_summary,
)


@dataclass(frozen=True)
class LintFinding:
    rule: str
    detail: str


def lint(df: DataFrame) -> list[LintFinding]:
    p = executed_plan(df)
    s = plan_summary(df)
    findings: list[LintFinding] = []

    if s.has_cartesian:
        findings.append(
            LintFinding(
                "cartesian-product",
                "CartesianProduct in plan: O(n*m) pair generation with both "
                "sides shuffled does not scale; bound one side or add an "
                "equi/range key.",
            )
        )

    if s.has_bnlj_cross:
        findings.append(
            LintFinding(
                "broadcast-cross-join",
                "BroadcastNestedLoopJoin Cross in plan: linear in the big "
                "side ONLY if the broadcast side is bounded (a query row, "
                "k centroids); verify the broadcast side cannot grow with "
                "the data.",
            )
        )

    if "BatchEvalPython" in p:
        findings.append(
            LintFinding(
                "python-row-eval",
                "BatchEvalPython (row-at-a-time Python UDF) in the plan; "
                "use built-in functions or a pandas_udf (ArrowEvalPython).",
            )
        )

    for rs in s.read_schemas:
        n_fields = rs.count(":")
        if n_fields > 24:
            findings.append(
                LintFinding(
                    "full-width-scan",
                    f"scan reads {n_fields} columns ({rs[:80]}...); column "
                    "pruning may be lost.",
                )
            )

    # Filter immediately above a scan with no pushed filters.  An
    # isnotnull-ONLY filter left unpushed is always a null check Catalyst
    # inferred on a COMPUTED join key (floor(expr), hash(col), ...):
    # plain-column IsNotNull is pushable and Spark always pushes it, so
    # the unpushed form is unpushable by construction, not a lost
    # optimization — skip it.
    for m in re.finditer(r"Filter ([^\n]*)\n[^\n]*FileScan[^\n]*PushedFilters: \[\]", p):
        preds = m.group(1)
        # null-checks only: no comparison / string / set predicate present
        if not re.search(
            r"[<>]|= |LIKE|Contains|StartsWith|EndsWith|RLike| IN \(", preds
        ):
            continue
        findings.append(
            LintFinding(
                "no-pushdown-with-filter",
                f"filter not pushed to scan: {m.group(0)[:120]}...",
            )
        )

    return findings
