"""Scale-safe global ranking: two-phase row_number / rank / percent_rank
without the single-partition ``Window.orderBy`` funnel.

An unpartitioned ordered window (``Window.orderBy(...)``) is correct but
plans as ONE task sorting the whole frame — fine for a dimension-sized
input, a scale-killer once the ranked frame derives from a fact table.
The two-phase shape here is the classic distributed fix:

1. ``repartitionByRange`` on the sort expressions — each output partition
   holds a contiguous, disjoint key range, so global order = partition
   order + within-partition order. The range boundaries come from Spark's
   reservoir sample (one extra lightweight pass, done by the exchange).
2. ``sortWithinPartitions`` + ``monotonically_increasing_id`` — the id's
   low 33 bits are the record number within the partition (its documented
   layout), giving a per-partition ordered index with ZERO extra shuffle.
3. A per-partition row-count aggregate (≤ num_partitions rows — driver
   tiny) turns into exclusive prefix offsets, inlined back as a literal
   MAP lookup in a plain projection (no join, no extra stage):
   ``global row_number = offset[partition] + local index + 1``.

Every stage is partition-parallel; the only driver materialization is the
partition-count list. The frame is ``localCheckpoint``-pinned before the
count so the offsets and the final output are computed from the SAME
physical placement (range sampling and id assignment are re-executed
otherwise, and a re-sample could move boundary rows between partitions).

``rank()`` (ties share a rank, gaps follow) is derived from the unique
row_number by a ``min`` window partitioned BY THE TIE KEYS — a hash
shuffle over key groups, still no global funnel.

Reference parity: the reference ranks hits per spectrum with pandas
``rank`` (quantmsutils/psm/psm_conversion.py — per-group, small); the
GLOBAL variant has no reference twin and exists for the 100 TB paths
(BM25 corpus ranks, Pareto shares, period-over-period movers).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "global_row_number",
    "global_rank",
    "global_percent_rank",
    "global_ntile",
]

_LOCAL_MASK = (1 << 33) - 1  # low 33 bits of monotonically_increasing_id


def _check_out_col(df: DataFrame, name: str) -> None:
    """An output column colliding with an input column would yield a
    duplicate-name frame whose later resolution fails with an ambiguity
    error far from the cause (r13 audit) — reject it here."""
    if name in df.columns:
        raise ValueError(
            f"output column {name!r} already exists on the input frame; "
            "pass a different rank_col/bucket_col or rename the input"
        )


def _two_phase(
    df: DataFrame,
    order_by: Sequence[Column],
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Range-partitioned frame with ``_gr_rn`` (unique global row number,
    1-based) appended; also returns the total row count (free from the
    offset pass). ``order_by`` are sort expressions (``.desc()`` allowed)
    and MUST be a total order for row_number determinism."""
    reserved = {"_gr_mid", "_gr_pid", "_gr_local", "_gr_off", "_gr_rn"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"global rank reserves column name(s) {sorted(clash)}; rename "
            "them on the input frame first"
        )
    # Partition-count policy (optimization round 13, guide §2.2/§2.5):
    # with num_partitions=None (the default) the range exchange is created
    # WITHOUT an explicit partition count, so AQE sizes it from the actual
    # shuffle bytes (advisoryPartitionSizeInBytes / parallelismFirst) —
    # a dimension-sized frame coalesces to a handful of partitions (32
    # near-empty sort tasks + 32 offset rows otherwise), a fact-derived
    # frame still fans out to cluster parallelism. An explicit
    # num_partitions is respected exactly as before (REPARTITION_BY_NUM
    # shuffles are never AQE-coalesced). Rank values are invariant to
    # where the range boundaries fall: offset[pid] + local index is the
    # global position under ANY contiguous range partitioning.
    parted = (
        df.repartitionByRange(int(num_partitions), *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    body = (
        parted.sortWithinPartitions(*order_by)
        .withColumn("_gr_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=False)
        .withColumn("_gr_pid", F.shiftrightunsigned("_gr_mid", 33))
        .withColumn(
            "_gr_local", F.col("_gr_mid").bitwiseAND(F.lit(_LOCAL_MASK))
        )
    )
    # ≤ n rows: the ONLY driver-side materialization in the operator.
    counts = sorted(
        body.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["_gr_pid"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((int(r["_gr_pid"]), acc))
        acc += int(r["c"])
    if not offsets:  # empty input: keep a valid lookup expression
        offsets = [(0, 0)]
    # ≤ n (pid, offset) pairs — inline them as a literal MAP projection
    # (element_at on _gr_pid) instead of a broadcast join: same lookup,
    # zero extra stage, and the whole rank assignment stays inside one
    # whole-stage-codegen projection over the checkpointed partitions.
    off_map = F.create_map(
        *[F.lit(x).cast("long") for pair in offsets for x in pair]
    )
    ranked = body.select(
        *df.columns,
        (F.element_at(off_map, F.col("_gr_pid")) + F.col("_gr_local") + 1)
        .alias("_gr_rn"),
    )
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY ...)`` without the global
    window. ``order_by`` must fully break ties (a total order); output is
    the input columns plus ``rank_col`` (1-based, long)."""
    _check_out_col(df, rank_col)
    ranked, _ = _two_phase(df, order_by, num_partitions)
    return ranked.withColumnRenamed("_gr_rn", rank_col)


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    tie_cols: Sequence[str],
    *,
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``rank() OVER (ORDER BY ...)`` (ties share, gaps follow).

    ``order_by`` must extend the ranking keys with a unique tiebreak (any
    total order works — ties are re-merged); ``tie_cols`` are the plain
    columns whose equal values form a tie group. The merge is a
    per-tie-group ``min`` AGGREGATE joined back — not a window
    partitioned by ``tie_cols``: a window sorts each tie group inside
    ONE task, so a whale tie-group (one dominant value — the normal
    shape of rank-by-score data) would re-create the funnel this
    operator exists to remove, while the aggregate's map-side partial
    min reduces the whale before it ever shuffles.

    NULL tie values rank like ``rank()`` does: ``groupBy`` puts NULLs in
    one group and the merge join is NULL-SAFE (``eqNullSafe`` per tie
    col) — a plain equi-join would silently DROP null-keyed rows that
    the window form ranks (round-6 ADVICE fix)."""
    _check_out_col(df, rank_col)
    ranked, _ = _two_phase(df, order_by, num_partitions)
    mins = ranked.groupBy(*tie_cols).agg(F.min("_gr_rn").alias(rank_col))
    r, m = ranked.alias("_gr_r"), mins.alias("_gr_m")
    cond = reduce(
        lambda a, b: a & b,
        [
            F.col(f"_gr_r.{c}").eqNullSafe(F.col(f"_gr_m.{c}"))
            for c in tie_cols
        ],
    )
    return r.join(m, cond).select(
        *[F.col(f"_gr_r.{c}") for c in df.columns], F.col(f"_gr_m.{rank_col}")
    )


def global_percent_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    *,
    rank_col: str = "pr",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``percent_rank()`` = (row_number - 1) / (rows - 1) under a
    total order (unique ties ⇒ rank == row_number). The total row count is
    a by-product of the offset pass — no extra action. Single-row input
    gets 0.0 (SQL percent_rank convention)."""
    _check_out_col(df, rank_col)
    ranked, total = _two_phase(df, order_by, num_partitions)
    denom = float(total - 1) if total > 1 else 1.0
    return ranked.withColumn(
        rank_col, (F.col("_gr_rn") - 1).cast("double") / F.lit(denom)
    ).drop("_gr_rn")


def global_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n_buckets: int,
    *,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global ``ntile(n) OVER (ORDER BY ...)`` from the two-phase row
    number plus the driver-known total: SQL ntile gives the first
    ``total % n`` buckets ``⌈total/n⌉`` rows and the rest ``⌊total/n⌋``
    — a closed-form function of (row_number, total), so no second pass.
    ``order_by`` must be a total order (ntile over ties is
    nondeterministic in any engine; callers here always tiebreak).
    Bucket numbers are ints to match the built-in's type."""
    _check_out_col(df, bucket_col)
    ranked, total = _two_phase(df, order_by, num_partitions)
    size, rem = divmod(total, n_buckets) if total else (0, 0)
    rn1 = F.col("_gr_rn") - 1  # 0-based
    cut = rem * (size + 1)
    if size == 0:
        bucket = F.col("_gr_rn")  # fewer rows than buckets: one row each
    else:
        bucket = F.when(
            rn1 < cut, F.floor(rn1 / (size + 1)) + 1
        ).otherwise(F.floor((rn1 - cut) / size) + rem + 1)
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop("_gr_rn")
