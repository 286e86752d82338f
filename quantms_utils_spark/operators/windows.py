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

    Round 11 (review): an anchor row with a NULL ``x_col`` or ``y_col`` is
    ignored entirely. Without that guard the prev/next (x, y) pairs
    DESYNCHRONIZE — ``last(ignorenulls)`` skips the NULL y but still takes
    that anchor's x, so the lerp silently mixes one anchor's x with an
    older anchor's y.
    """
    valid = anchor_cond & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    anchor_y = F.when(valid, F.col(y_col))
    anchor_x = F.when(valid, F.col(x_col))
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
    the weighted median at q=0.5. Output: group cols +
    ``(<value_col>_q, total_weight)``.

    TWO-PHASE shape (optimization round 13; guide §2.5 skew — the same
    discipline as ``operators.rank``): the old form ran the cumulative
    and total windows ``partitionBy(group)``, so the whole frame sorted
    inside ONE task per group — with few groups (the weighted-median
    registry query has 3 return flags) that is a 3-task bottleneck
    locally and an unbounded whale-group funnel at 100 TB. Now:

    1. ``repartitionByRange(group, value, tiebreak)`` — one AQE-sized
       range exchange; global order = partition order + local order.
       ``monotonically_increasing_id`` yields the partition index
       (checkpoint-pinned so every consumer sees one placement).
    2. ONE tiny aggregate: per-(partition, group) weight sums (this pass
       also runs the NULL/negative-weight probe over every row). A
       window over that aggregate-sized frame derives per-group
       exclusive partition offsets and totals — no driver collect.
    3. The threshold can only cross inside the FIRST partition whose
       inclusive prefix reaches ``q·total`` (earlier partitions are all
       below it; later partitions hold only larger values, which cannot
       change the min qualifying value). Only those crossing-partition
       rows — ~1/n_partitions of one group each — flow into the local
       cumulative window; everything else never re-shuffles.

    Weight summation is therefore REASSOCIATED (partition partials +
    local running sum) relative to the old single window: exact for
    integer/decimal weights (the registry caller sums DECIMAL), for
    float weights the usual distributed-sum last-ulp caveat applies.

    Round 11 (review): rows with a NULL value, NULL weight, or negative
    weight raise instead of silently corrupting the quantile — a NULL
    value sorts first while its weight still shifts the cumulative curve
    (every later quantile moves), a NULL weight silently contributes 0,
    and a negative weight makes the running sum non-monotone, after which
    "first row to reach q·total" is not a quantile at all. The probe now
    runs inside the phase-2 aggregate — still every row, no extra scan.
    """
    if not 0 < q <= 1:
        raise ValueError("q must be in (0, 1]")
    reserved = {"_wq_mid", "_wq_pid", "_wq_s", "_wq_rs", "_wq_off",
                "_wq_tw", "_wq_cw"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"weighted_quantile reserves column name(s) {sorted(clash)}; "
            "rename them on the input frame first"
        )
    checked_w = F.when(
        F.col(value_col).isNull()
        | F.col(weight_col).isNull()
        | (F.col(weight_col) < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    "weighted_quantile: NULL value/weight or negative "
                    "weight at row (value="
                ),
                F.coalesce(F.col(value_col).cast("string"), F.lit("NULL")),
                F.lit(", weight="),
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
                F.lit(") — drop or impute these rows first"),
            )
        ).cast(df.schema[weight_col].dataType),
    ).otherwise(F.col(weight_col))
    gcols = list(group_cols)
    order = [
        *[F.col(c) for c in gcols],
        F.col(value_col),
        *[F.col(c) for c in order_tiebreak],
    ]
    local_order = [F.col(value_col), *[F.col(c) for c in order_tiebreak]]
    # Phase 1: range layout. No within-partition sort and no
    # monotonically_increasing_id — the offset algebra only needs the
    # PARTITION-level prefix property (partition i's keys ≤ partition
    # j's for i < j), and the phase-3 window sorts its own partition
    # anyway, so a local sort here would be pure waste. The lazy
    # localCheckpoint pins the sampled range boundaries so the offset
    # aggregate and the crossing-partition pass read the SAME physical
    # placement (a re-sample could move boundary rows between
    # partitions); spark_partition_id() over the pinned blocks is then
    # deterministic.
    body = (
        df.repartitionByRange(*order)
        .localCheckpoint(eager=False)
        .withColumn("_wq_pid", F.spark_partition_id().cast("long"))
    )
    # Phase 2: per-(partition, group) sums — aggregate-sized (≤ one row
    # per group per partition). `_wq_s` sums the CHECKED weight while
    # `_wq_rs` sums the raw column for the reported total — safe only
    # because both run in this same aggregate, so the checked branch
    # raises on any NULL/negative row before either sum is observable.
    # Do not drop or move _wq_s's checked_w without re-guarding _wq_rs.
    psums = body.groupBy("_wq_pid", *gcols).agg(
        F.sum(checked_w).alias("_wq_s"),
        F.sum(F.col(weight_col)).alias("_wq_rs"),
    )
    zero = F.lit(0).cast(psums.schema["_wq_s"].dataType)
    woff = (
        Window.partitionBy(*gcols)
        .orderBy("_wq_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(*gcols)
    offs = psums.select(
        "_wq_pid",
        *gcols,
        F.coalesce(F.sum("_wq_s").over(woff), zero).alias("_wq_off"),
        F.sum("_wq_rs").over(wtot).alias("_wq_tw"),
        "_wq_s",
    )
    # Phase 3: the first partition (per group) whose inclusive prefix
    # reaches the threshold holds the qualifying row with the minimal
    # value; later partitions only contribute larger values.
    crossing = (
        offs.filter(
            F.col("_wq_off") + F.col("_wq_s") >= F.lit(q) * F.col("_wq_tw")
        )
        .groupBy(*gcols)
        .agg(
            F.min("_wq_pid").alias("_wq_pid"),
            F.min_by("_wq_off", "_wq_pid").alias("_wq_off"),
            F.max("_wq_tw").alias("_wq_tw"),
        )
    )
    wc = (
        Window.partitionBy("_wq_pid", *gcols)
        .orderBy(*local_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = (
        body.join(F.broadcast(crossing), ["_wq_pid", *gcols])
        .withColumn("_wq_cw", F.col("_wq_off") + F.sum(checked_w).over(wc))
        .filter(F.col("_wq_cw") >= F.lit(q) * F.col("_wq_tw"))
    )
    return hit.groupBy(*gcols).agg(
        F.min(value_col).alias(f"{value_col}_q"),
        F.max("_wq_tw").alias("total_weight"),
    )


def ewma_chunked(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    *,
    alpha: float = 0.3,
    chunk_size: int = 8192,
) -> DataFrame:
    """Per-key EWMA (``s1 = v1``; ``s_i = α·v_i + (1−α)·s_{i−1}``) with a
    WHALE-KEY-SAFE two-level fold — the hardened form of the single
    ``collect_list`` fold in the ``event_value_ewma`` registry query,
    whose per-key array is unbounded (a 1M-event user materializes a 1M
    struct array in one aggregation buffer).

    The recursion is affine in the state: a run of values u₁..u_m maps
    s → d·s + c with ``d = (1−α)^m`` and ``c = α·Σ (1−α)^{m−i} u_i``, and
    affine maps COMPOSE ASSOCIATIVELY — so the fold distributes like any
    algebraic aggregate:

    1. one streaming window ranks each key's rows (no array state) and
       assigns ``chunk = rank // chunk_size``;
    2. per (key, chunk): a BOUNDED ``collect_list`` (≤ chunk_size
       structs) is sorted in-row and folded to the chunk's (d, c) pair —
       plus the chunk's first value, which seeds the whole chain when the
       chunk is chunk 0 (the reference recursion has no s₀: the first
       element IS the state);
    3. per key: the ≤ n/chunk_size chunk rows fold in chunk order —
       chunk 0 contributes its internally-resolved state (its post-first
       affine map applied to its first value), every later chunk applies
       d·s + c.

    Peak per-key aggregation state is max(chunk_size, n/chunk_size)
    rows — at chunk_size 8192 a 1M-event whale peaks at 8192 structs in
    level 2 and 123 chunk rows in level 3, vs 1M structs for the naive
    fold. Two shuffles on the same key (window + final group) instead of
    one. Numerically this re-associates the same linear combination
    (α·(1−α)-power weights on each value), so it agrees with the naive
    fold to float re-association tolerance, not bit-for-bit — the
    equivalence test compares at 1e-9 relative.
    """
    if chunk_size < 2:
        raise ValueError("chunk_size must be >= 2")
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    ranked = df.select(
        *keys,
        F.struct(*order_cols).alias("_ord"),
        F.col(value_col).cast("double").alias("_v"),
        ((F.row_number().over(w) - 1) / F.lit(chunk_size))
        .cast("long")
        .alias("_chunk"),
    )
    a = float(alpha)
    per_chunk = (
        ranked.groupBy(*keys, "_chunk")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sort_array(F.collect_list(F.struct("_ord", "_v"))).alias("_seq"),
        )
        .select(
            *keys,
            "_chunk",
            "_n",
            F.element_at(F.col("_seq"), 1)["_v"].alias("_first"),
            # affine map of the TAIL (elements 2..m): acc=(d,c) starts at
            # (1,0); per element d←(1−α)d, c←(1−α)c+αx. Chunk 0 applies
            # this map to its first value; later chunks fold their full
            # sequence (elements 1..m) the same way.
            F.aggregate(
                F.slice(
                    F.transform(F.col("_seq"), lambda st: st["_v"]),
                    F.lit(2),
                    F.greatest(F.size("_seq") - 1, F.lit(0)),
                ),
                F.struct(
                    F.lit(1.0).alias("d"), F.lit(0.0).alias("c")
                ),
                lambda acc, x: F.struct(
                    (F.lit(1.0 - a) * acc["d"]).alias("d"),
                    (F.lit(1.0 - a) * acc["c"] + F.lit(a) * x).alias("c"),
                ),
            ).alias("_tail_map"),
        )
        .select(
            *keys,
            "_chunk",
            "_n",
            "_first",
            # full-sequence map = tail map composed after the first
            # element's own step (d←(1−α)d, c←(1−α)c+αv₁ BEFORE the tail):
            # compose(tail ∘ first): d = d_t·(1−α),
            # c = d_t·α·v₁ + c_t  — used by chunks ≥ 1.
            (F.col("_tail_map")["d"] * F.lit(1.0 - a)).alias("_d_full"),
            (
                F.col("_tail_map")["d"] * F.lit(a) * F.col("_first")
                + F.col("_tail_map")["c"]
            ).alias("_c_full"),
            # chunk-0 resolved state: tail map applied to seed v₁
            (
                F.col("_tail_map")["d"] * F.col("_first")
                + F.col("_tail_map")["c"]
            ).alias("_state0"),
        )
    )
    merged = per_chunk.groupBy(*keys).agg(
        F.sum("_n").alias("n_events"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct("_chunk", "_state0", "_d_full", "_c_full")
                )
            ),
            F.lit(None).cast("double"),
            lambda acc, ch: F.when(ch["_chunk"] == 0, ch["_state0"]).otherwise(
                ch["_d_full"] * acc + ch["_c_full"]
            ),
        ).alias("ewma"),
    )
    return merged
