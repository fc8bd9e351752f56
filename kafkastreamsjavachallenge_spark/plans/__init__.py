"""Plan introspection and plan-quality linting.

The reference executes its topology exactly as written (no optimizer —
SURVEY.md §4.1); this engine leans on Catalyst instead, and this package is
the guard-rail: programmatic access to the physical plan plus a linter that
flags the shapes that do not survive a 100 TB scale-up (missing pushdown,
lost broadcasts, interpreted Python in the hot path, cartesian products).
"""

from kafkastreamsjavachallenge_spark.plans.introspect import (
    executed_plan,
    formatted_plan,
    optimized_plan,
    plan_summary,
    pushed_filters,
    read_schemas,
)
from kafkastreamsjavachallenge_spark.plans.lint import lint, LintFinding

__all__ = [
    "executed_plan",
    "formatted_plan",
    "optimized_plan",
    "plan_summary",
    "pushed_filters",
    "read_schemas",
    "lint",
    "LintFinding",
]
