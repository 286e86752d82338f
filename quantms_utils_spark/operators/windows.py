"""Window-based operators: exclusive prefix sums, as-of lookups, and linear
interpolation along an ordered timeline.

These re-express three reference idioms (cited file:line into /root/reference):

- exclusive prefix sum — the pTIC running cumulative computed by appending
  *before* adding (quantmsutils/mzml/ms1_feature_finder.py:75-102): each row
  sees the sum of everything strictly before it.
- as-of lookup — ``getPrecursorSpectrum(i)`` walks back to the nearest
  preceding MS1 spectrum (quantmsutils/mzml/mzml_statistics.py:253-260). In
  Spark this is ``last(when(cond, value), ignorenulls=True)`` over an
  unbounded-preceding window: no join, one shuffle on the partition key.
- interpolation — bisect + lerp of the pTIC curve at an arbitrary retention
  time (quantmsutils/mzml/ms1_feature_finder.py:104-142, edge clamping
  :129-132). Expressed as prev/next anchor windows + a lerp expression.

All three are single-shuffle (one ``partitionBy`` key) and scale linearly: at
100 TB the partition key is the run/file (or user), so state per key stays
small and skew is bounded by the largest single run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _window(partition_cols: Sequence[str], order_cols: Sequence[str]):
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def exclusive_prefix_sum(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "prefix_sum",
) -> DataFrame:
    """Running sum of ``value_col`` over everything strictly before the row.

    First row of each partition gets 0.0 (the reference starts its cumulative
    list with the pre-append value, ms1_feature_finder.py:94-99).
    """
    w = _window(partition_cols, order_cols).rowsBetween(Window.unboundedPreceding, -1)
    return df.withColumn(out_col, F.coalesce(F.sum(value_col).over(w), F.lit(0.0)))


def asof_lookup(
    df: DataFrame,
    cond: Column,
    value_col: Column | str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "asof_value",
    *,
    strict: bool = True,
) -> DataFrame:
    """For each row, the ``value_col`` of the last preceding row where ``cond``.

    ``strict=True`` excludes the current row (precursor semantics: an MS2
    spectrum's precursor is the *previous* MS1, mzml_statistics.py:253-260).
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    upper = -1 if strict else 0
    w = _window(partition_cols, order_cols).rowsBetween(Window.unboundedPreceding, upper)
    return df.withColumn(out_col, F.last(F.when(cond, value), ignorenulls=True).over(w))


def interpolate_at(
    df: DataFrame,
    anchor_cond: Column,
    x_col: str,
    y_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "interp",
) -> DataFrame:
    """Linear interpolation of ``y_col`` (defined on anchor rows) at every
    row's ``x_col`` position, per partition.

    Mirrors the reference's lerp of the pTIC curve at feature retention times
    (ms1_feature_finder.py:104-142): rows before the first anchor clamp to the
    first anchor's y, rows after the last clamp to the last (:129-132); exact
    hits and zero-width brackets return the previous anchor's y.
    """
    anchor_y = F.when(anchor_cond, F.col(y_col))
    anchor_x = F.when(anchor_cond, F.col(x_col))
    w_prev = _window(partition_cols, order_cols).rowsBetween(Window.unboundedPreceding, 0)
    w_next = _window(partition_cols, order_cols).rowsBetween(0, Window.unboundedFollowing)

    prev_y = F.last(anchor_y, ignorenulls=True).over(w_prev)
    prev_x = F.last(anchor_x, ignorenulls=True).over(w_prev)
    next_y = F.first(anchor_y, ignorenulls=True).over(w_next)
    next_x = F.first(anchor_x, ignorenulls=True).over(w_next)

    x = F.col(x_col)
    lerp = prev_y + (next_y - prev_y) * (x - prev_x) / (next_x - prev_x)
    interp = (
        F.when(prev_y.isNull(), next_y)
        .when(next_y.isNull(), prev_y)
        .when(next_x == prev_x, prev_y)
        .otherwise(lerp)
    )
    return df.withColumn(out_col, interp)
