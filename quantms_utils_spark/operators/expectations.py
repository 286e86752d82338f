"""Declarative data-quality expectations: evaluate a rule table against a
DataFrame in ONE aggregate pass (the Deequ / dbt-test shape, Spark-first).

Rules are data, not code — a list of (name, kind, params) constraints:

- ``not_null``       — column has no NULLs
- ``unique``         — non-null column values are distinct
- ``min`` / ``max``  — numeric bound on a column
- ``accepted``       — every non-null value drawn from an allowed set
- ``matches``        — every non-null value matches a regex
- ``row_count_min``  — table has at least N rows

Scale shape: every rule compiles to a conditional-count EXPRESSION, and all
of them evaluate in a single map-side-combinable aggregate over ONE scan —
adding a rule adds a column to the aggregate, never a pass over the data
(``unique`` contributes a count-distinct, which Catalyst plans into the
same Aggregate via Expand — still one scan). The result is one row per
rule with checked/violation counts — O(rules) output, driver-safe at any
table size. This generalizes the one-pass SDRF template validation
(`pipelines/check_samplesheet.py`) into a reusable constraint engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["Expectation", "check_expectations"]

_KINDS = (
    "not_null",
    "unique",
    "min",
    "max",
    "accepted",
    "matches",
    "row_count_min",
)


@dataclass(frozen=True)
class Expectation:
    """One declarative constraint; ``params`` meaning depends on ``kind``
    (bound value, accepted values, regex, or minimum row count)."""

    name: str
    kind: str
    column: str | None = None
    params: tuple = field(default_factory=tuple)

    def __post_init__(self) -> None:
        if self.kind not in _KINDS:
            raise ValueError(f"unknown expectation kind {self.kind!r}")
        if self.kind != "row_count_min" and self.column is None:
            raise ValueError(f"{self.kind} expectation needs a column")
        # round 11 (review): a parameterized rule with no params previously
        # surfaced as a bare IndexError from expression compilation
        if self.kind in ("min", "max", "matches", "row_count_min") and len(
            self.params
        ) != 1:
            raise ValueError(
                f"{self.kind} expectation needs exactly one param, got "
                f"{len(self.params)}"
            )
        if self.kind == "accepted" and not self.params:
            raise ValueError(
                "accepted expectation needs at least one allowed value"
            )


def _violations(e: Expectation) -> Column:
    """Aggregate expression counting this rule's violations (all
    map-side-combinable; NULLs violate only ``not_null``)."""
    c = F.col(e.column) if e.column is not None else None
    if e.kind == "not_null":
        return F.count_if(c.isNull())
    if e.kind == "unique":
        # count() skips nulls, so this is exactly the surplus duplicate
        # count among non-null values
        return F.count(c) - F.count_distinct(c)
    if e.kind == "min":
        return F.count_if(c < F.lit(e.params[0]))
    if e.kind == "max":
        return F.count_if(c > F.lit(e.params[0]))
    if e.kind == "accepted":
        return F.count_if(c.isNotNull() & ~c.isin(*e.params))
    if e.kind == "matches":
        return F.count_if(c.isNotNull() & ~c.cast("string").rlike(e.params[0]))
    # row_count_min: shortfall below the floor
    return F.greatest(
        F.lit(0).cast("long"),
        F.lit(int(e.params[0])) - F.count(F.lit(1)),
    )


def check_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Evaluate every expectation in one aggregate pass over one scan;
    returns one row per rule:
    ``(rule, kind, column, n_checked, n_violations, passed)`` where
    ``n_checked`` is the table row count and ``passed`` ⇔ zero
    violations. Unpivoting the 1-row aggregate to rule rows is an O(rules)
    stack, not a per-rule scan.
    """
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            _violations(e).cast("long").alias(f"__v_{i}")
            for i, e in enumerate(expectations)
        ],
    )
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(e.name).alias("rule"),
                    F.lit(e.kind).alias("kind"),
                    F.lit(e.column).cast("string").alias("column"),
                    F.col(f"__v_{i}").alias("n_violations"),
                )
                for i, e in enumerate(expectations)
            ]
        )
    ).alias("r")
    return stats.select(F.col("__n"), stack).select(
        F.col("r.rule").alias("rule"),
        F.col("r.kind").alias("kind"),
        F.col("r.column").alias("column"),
        F.col("__n").alias("n_checked"),
        F.col("r.n_violations").alias("n_violations"),
        (F.col("r.n_violations") == 0).alias("passed"),
    )
