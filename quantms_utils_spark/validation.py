"""Expectations layer: the reference's validation semantics (SURVEY §2.11) as
reusable helpers. Distributed jobs must fail fast on the driver with the same
messages the reference raises/exits with — checks here run on schemas (free)
or via bounded actions (limit-1 counts), never full scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


class SampleSheetError(ValueError):
    """Sample sheet / design validation failure (reference exits 1)."""


def require_columns(
    columns: Sequence[str], required: Sequence[str], context: str
) -> list[str]:
    """Case-insensitive required-column presence check
    (reference sdrf/check_samplesheet.py:64-99). Returns error strings."""
    lower = {c.lower() for c in columns}
    return [
        f"{context} is missing required column: '{r}'"
        for r in required
        if r.lower() not in lower
    ]


def require_nonempty(df: DataFrame, context: str) -> None:
    """Header-but-no-rows check (check_samplesheet.py:75-78)."""
    if df.limit(1).count() == 0:
        raise SampleSheetError(f"{context} contains a header but no data rows")


def require_unique_mapping(
    df: DataFrame, key: str, value_cols: Sequence[str], context: str
) -> None:
    """Each key must map to exactly one value tuple
    (diann2msstats.py:205-213)."""
    from pyspark.sql import functions as F

    dups = (
        df.select(key, *value_cols)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(50)
        .collect()
    )
    if dups:
        bad = ", ".join(str(r[key]) for r in dups)
        raise SampleSheetError(
            f"Inconsistent {context}: Sample(s) {bad} map to multiple "
            f"({', '.join(value_cols)}) combinations."
        )
