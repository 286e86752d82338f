"""Physical-plan inspection helpers.

Scale guarantees here are not vibes — they are assertions on the optimized
plan: a filter that should prune parquet row groups must appear in
``PushedFilters``, a projection must shrink ``ReadSchema``, a dimension join
must be a ``BroadcastHashJoin``, and a range join must NOT degrade to
``BroadcastNestedLoopJoin``. tests/test_plans.py pins these for the headline
queries so a regression that silently de-optimizes a plan fails CI, the same
way a wrong result would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def physical_plan(df: DataFrame) -> str:
    return explain_str(df, "simple")


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    plan = explain_str(df, mode)
    return all(needle in plan for needle in needles)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the formatted plan."""
    plan = explain_str(df, "formatted")
    out: list[str] = []
    # Filters are Name(args...) forms; args may themselves contain commas and
    # brackets (e.g. In(col, [1,2])), so split on top-level boundaries only.
    for m in re.finditer(r"PushedFilters: \[(.*)\]\n", plan):
        body = m.group(1).strip()
        if not body:
            continue
        depth = 0
        token = ""
        for ch in body:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            if ch == "," and depth == 0:
                out.append(token.strip())
                token = ""
            else:
                token += ch
        if token.strip():
            out.append(token.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema entries)."""
    plan = explain_str(df, "formatted")
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas
