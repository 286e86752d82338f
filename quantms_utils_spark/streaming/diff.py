"""Continuous CDC: classify an arriving upsert stream against the standing
snapshot state — the streaming twin of ``operators.diff.table_diff``.

Each micro-batch is diffed against the accumulated key→digest state and
emits only its CHANGES (inserted / updated; unchanged rows produce no
output), then advances the state with the batch's own digests. An
append-only stream cannot witness deletions — full-snapshot reconciliation
stays with the batch operator.

Scale / correctness shape (same contract as ``streaming.curation``):

- State is a parquet directory of ``epoch=N`` subdirectories holding
  (keys..., digest) rows; the current state is latest-epoch-wins per key,
  reconstructed per micro-batch with one max_by aggregate. Spark re-plans
  the static side every batch, so growth is visible without restarts.
- The state read for epoch N loads only epochs **strictly below N** and
  every write is an ``overwrite`` into its own ``epoch=N`` subdir, so an
  at-least-once foreachBatch replay reproduces the original output
  instead of classifying the epoch against itself.
- Change detection is the same map-side ``xxhash64`` over canonicalized
  non-key columns as batch ``table_diff`` (hash contract documented
  there); only (keys, 8-byte digest) rows persist as state — and only
  for the epoch's CHANGED keys (round 9): ``max_by(digest, epoch)``
  reconstructs each key's latest digest whether or not later epochs
  re-wrote it, so re-delivered full snapshots (the common CDC-polling
  shape) grow state O(changes) per epoch, not O(keys) — previously every
  epoch persisted the whole key set and state grew with total rows seen.
- NULL key values are first-class (round 9): last-per-key collapses via
  a window (partitionBy groups NULLs like groupBy), and the standing
  lookup joins null-safely — since round 10 batch ``table_diff`` matches
  the same null-safe key contract (previously its full-outer join
  classified NULL-key rows as phantom delete+insert pairs every diff).
- Within a batch, the LAST row per key wins (upsert semantics), ordered
  by a stable in-batch sequence via ``monotonically_increasing_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quantms_utils_spark.operators.diff import _digest_expr
from quantms_utils_spark.operators.layout import _glob_escape
from quantms_utils_spark.streaming.curation import _list_epoch_dirs

__all__ = ["diff_and_apply", "start_continuous_diff"]

# In-flight working columns added to the user's batch frame. '__'-prefixed
# (matching the '_seq'/'_rn' convention) so a user payload column named
# 'digest' survives into the epoch output untouched; 'status' is the one
# documented output column this operator claims.
_RESERVED = ("__digest", "__prev", "_seq", "_rn", "status")


def diff_and_apply(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    keys: list[str],
    state_dir: str,
    out_dir: str,
) -> None:
    """foreachBatch callback: emit the batch's inserted/updated rows vs the
    standing state (epochs < ``epoch_id``), then record the batch digests
    as ``epoch=N`` state. Idempotent under replay."""
    clashes = [c for c in batch_df.columns if c in _RESERVED]
    if clashes:
        raise ValueError(
            f"batch columns {clashes} collide with diff_and_apply's "
            f"reserved working/output columns {list(_RESERVED)}; rename "
            "them before streaming through the diff"
        )
    spark = batch_df.sparkSession
    key_schema = ", ".join(
        f"{k} {batch_df.schema[k].dataType.simpleString()}" for k in keys
    )
    state_schema = f"{key_schema}, digest long, epoch long"

    dirs = _list_epoch_dirs(spark, state_dir, int(epoch_id))
    if dirs:
        prior = spark.read.schema(state_schema).parquet(
            *[_glob_escape(d) for d in dirs]
        )
        standing = (
            prior.groupBy(*keys)
            .agg(F.max_by("digest", "epoch").alias("_prev"))
        )
    else:
        standing = spark.createDataFrame([], state_schema).select(
            *keys, F.col("digest").alias("_prev")
        )

    # upsert semantics inside the batch: last row per key wins. A window
    # (not a groupBy + self-join-back) so NULL key values collapse into
    # their own group instead of vanishing through a null-rejecting
    # equi-join, and the full row rides along — no second join needed.
    from functools import reduce

    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("_seq").desc())
    batch_last = (
        batch_df.withColumn("_seq", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_seq", "_rn")
    )

    non_keys = [c for c in batch_last.columns if c not in keys]
    # same xxhash64 contract as batch table_diff — shared single source
    digested = batch_last.withColumn("__digest", _digest_expr(non_keys)).alias("b")
    s = standing.alias("s")
    # null-safe standing lookup: a NULL-key row must compare against its
    # stored digest, not classify 'inserted' forever
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"b.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )
    classified = (
        digested.join(s, cond, "left")
        .select("b.*", F.col("s._prev").alias("__prev"))
        .withColumn(
            "status",
            F.when(F.col("__prev").isNull(), F.lit("inserted"))
            .when(F.col("__prev") != F.col("__digest"), F.lit("updated"))
            .otherwise(F.lit("unchanged")),
        )
        .localCheckpoint(eager=True)  # one computation feeds both writes
    )
    changes = classified.filter(F.col("status") != "unchanged")
    changes.drop("__digest", "__prev").write.mode("overwrite").parquet(
        f"{out_dir}/epoch={int(epoch_id)}"
    )
    # state delta: ONLY the changed keys' digests — unchanged keys keep
    # their older-epoch rows and max_by still reconstructs them
    changes.select(
        *keys,
        F.col("__digest").alias("digest"),
        F.lit(int(epoch_id)).alias("epoch"),
    ).write.mode("overwrite").parquet(f"{state_dir}/epoch={int(epoch_id)}")


def start_continuous_diff(
    incoming: DataFrame,
    *,
    keys: list[str],
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Wire an upsert stream into the continuous-diff loop (availableNow
    drain). Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        diff_and_apply(
            batch_df,
            epoch_id,
            keys=keys,
            state_dir=state_dir,
            out_dir=out_dir,
        )

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
