"""Physical-plan audits: assert the plans we designed for are the plans
we get (SURVEY §4). Used by tests and by ``tools/audit_plans.py`` which
writes PLANS.md.

Checks:
- broadcast joins actually broadcast (no SortMergeJoin on dim joins);
- filters/column pruning reach the parquet scan (PushedFilters,
  ReadSchema narrower than the table);
- the extraction path contains no Exchange (shuffle-free claim);
- banded LSH join is the only shuffle in dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    return simple_plan(df).count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in simple_plan(df)


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(
        ln.strip() for ln in plan.splitlines()
        if "PushedFilters" in ln or "ReadSchema" in ln
    )
