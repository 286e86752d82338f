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


def weighted_quantile(
    df,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    q: float = 0.5,
    order_tiebreak: Sequence[str] = (),
):
    """Per-group weighted quantile: the smallest ``value_col`` whose
    running weight (ordered by value, then ``order_tiebreak`` for
    determinism under ties) reaches ``q`` of the group's total weight —
    the weighted median at q=0.5. percentile() has no weighted form, so
    this is the canonical two-window formulation: one cumulative sum and
    one total over the SAME partition key (one Exchange, one Sort), then
    the first qualifying row per group via a min-by aggregate. Output:
    group cols + ``(<value_col>_q, total_weight)``; per-group state is a
    running scalar, so skew is bounded by the hottest single group.
    """
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    order = [F.col(value_col), *[F.col(c) for c in order_tiebreak]]
    wc = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*group_cols)
    cum = df.select(
        *group_cols,
        F.col(value_col),
        F.sum(weight_col).over(wc).alias("__cw"),
        F.sum(weight_col).over(wt).alias("__tw"),
    )
    hit = cum.filter(F.col("__cw") >= F.lit(q) * F.col("__tw"))
    return hit.groupBy(*group_cols).agg(
        F.min(value_col).alias(f"{value_col}_q"),
        F.max("__tw").alias("total_weight"),
    )
