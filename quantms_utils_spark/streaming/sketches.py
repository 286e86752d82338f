"""Continuous frequency sketching: maintain a standing Count-Min sketch over
a token stream — the streaming proof of the sketch's defining property, that
depth×width cell tables MERGE by cell-wise addition.

Each micro-batch reduces to its own CMS cell table (one map-side-combinable
aggregate, ≤ depth×width rows regardless of batch size) written to an
``epoch=N`` subdirectory; the standing sketch at any moment is the cell-wise
SUM over epoch files. Nothing about history is re-read per batch — each
epoch write is O(sketch), and an at-least-once foreachBatch replay simply
overwrites its own epoch subdir with identical cells (idempotent, same
contract as ``streaming.curation`` / ``streaming.diff``).

At 100 TB/day the same loop runs per shard/executor-group and the merge is
associative+commutative, so region-local sketches combine into a global one
with one tiny union — the reason CMS (not an exact groupBy) is the streaming
frequency structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.layout import _glob_escape
from quantms_utils_spark.operators.sketches import cms_build, cms_estimate
from quantms_utils_spark.streaming.curation import _list_epoch_dirs

__all__ = [
    "sketch_batch",
    "merged_sketch",
    "start_continuous_sketch",
    "standing_estimates",
]

_CELL_SCHEMA = "cms_row int, cms_bucket long, cms_cnt long, epoch long"


def sketch_batch(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    token_col: str,
    depth: int,
    width: int,
    state_dir: str,
) -> None:
    """foreachBatch callback: collapse the batch to its CMS cells and record
    them as ``epoch=N``. Replay-safe: the overwrite reproduces the same
    cells for the same batch."""
    cells = cms_build(batch_df, token_col, depth, width)
    cells.write.mode("overwrite").parquet(
        f"{state_dir}/epoch={int(epoch_id)}"
    )


def merged_sketch(
    spark: SparkSession, state_dir: str, *, upto_epoch: int | None = None
) -> DataFrame:
    """The standing sketch: cell-wise sum over recorded epochs (strictly
    below ``upto_epoch`` when given — the replay-safe read for use INSIDE a
    batch callback; all epochs otherwise). Always ≤ depth×width rows."""
    before = (1 << 62) if upto_epoch is None else int(upto_epoch)
    dirs = _list_epoch_dirs(spark, state_dir, before)
    if not dirs:
        return spark.createDataFrame([], _CELL_SCHEMA).drop("epoch")
    return (
        spark.read.schema(_CELL_SCHEMA)
        .parquet(*[_glob_escape(d) for d in dirs])
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cms_cnt").alias("cms_cnt"))
    )


def standing_estimates(
    spark: SparkSession,
    state_dir: str,
    probes: DataFrame,
    token_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Frequency estimates for ``probes`` against the standing merged
    sketch — the query side of the continuous loop."""
    return cms_estimate(
        merged_sketch(spark, state_dir), probes, token_col, depth, width
    )


def start_continuous_sketch(
    incoming: DataFrame,
    *,
    token_col: str,
    depth: int,
    width: int,
    state_dir: str,
    checkpoint_dir: str,
):
    """Wire a token stream into the continuous sketch loop (availableNow
    drain). Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        sketch_batch(
            batch_df,
            epoch_id,
            token_col=token_col,
            depth=depth,
            width=width,
            state_dir=state_dir,
        )

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# --- continuous KMV: standing distinct/overlap sketches ----------------------


def kmv_batch(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    group_cols: list[str],
    value_col: str,
    k: int,
    state_dir: str,
) -> None:
    """foreachBatch callback for the KMV loop: collapse the batch to its
    per-group k-minimum-values sketches (``operators.sketches.kmv_sketch``)
    and record them as ``epoch=N``. O(groups × k) per epoch regardless of
    batch size; replay overwrites identical rows (xxhash64 is
    deterministic)."""
    from quantms_utils_spark.operators.sketches import kmv_sketch

    kmv_sketch(batch_df, group_cols, value_col, k=k).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/epoch={int(epoch_id)}")


def merged_kmv(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    *,
    k: int,
    upto_epoch: int | None = None,
    group_types: dict[str, str] | None = None,
) -> DataFrame:
    """The standing KMV sketch per group: ``kmv_merge`` over recorded
    epochs. Because the k smallest of a union are always among the union
    of each side's k smallest, this is BIT-IDENTICAL to sketching the
    entire history in one batch (pinned by test) — the property that lets
    a continuous overlap monitor ("how much does today's shard overlap
    the standing corpus / that eval set") run on O(groups × k) state with
    zero history re-reads."""
    from quantms_utils_spark.operators.sketches import kmv_merge

    before = (1 << 62) if upto_epoch is None else int(upto_epoch)
    dirs = _list_epoch_dirs(spark, state_dir, before)
    if not dirs:
        # No epoch exists yet, so group-column types cannot be read from
        # the state — pass ``group_types`` ({col: spark type string}) for
        # non-string groups, or the empty frame defaults them to string
        # and a downstream unionByName/join against the real type fails
        # only on fresh state (the schema converges once an epoch lands).
        types = group_types or {}
        schema = (
            ", ".join(f"{g} {types.get(g, 'string')}" for g in group_cols)
            + ", kmv array<bigint>"
        )
        return spark.createDataFrame([], schema)
    return kmv_merge(
        spark.read.parquet(*[_glob_escape(d) for d in dirs]),
        group_cols, k=k,
    )


def start_continuous_kmv(
    incoming: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    k: int,
    state_dir: str,
    checkpoint_dir: str,
):
    """Wire a stream into the continuous KMV loop (availableNow drain).
    Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        kmv_batch(
            batch_df,
            epoch_id,
            group_cols=group_cols,
            value_col=value_col,
            k=k,
            state_dir=state_dir,
        )

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


__all__ += ["kmv_batch", "merged_kmv", "start_continuous_kmv"]
