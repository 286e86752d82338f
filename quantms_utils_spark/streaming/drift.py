"""Continuous distribution-drift monitoring: maintain standing bin counts
over a document/event stream and score PSI against a frozen baseline —
the streaming twin of ``queries/mlops.py:corpus_drift_psi``.

Same state discipline as ``streaming.sketches`` (the structure this module
mirrors): each micro-batch collapses to its own per-bin count table (one
map-side-combinable aggregate, rows = bins regardless of batch size)
written to an ``epoch=N`` subdirectory; the standing distribution at any
moment is the bin-wise SUM over epoch files. Counts merge by addition, so
an at-least-once foreachBatch replay overwrites its own epoch with
identical rows (idempotent) and region-local monitors combine with one
tiny union. The PSI read side is
``operators.ml.population_stability_from_counts`` over (standing, baseline).

At 100 TB/day the whole loop's state is O(bins × epochs) rows — the drift
monitor never re-reads the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.layout import _glob_escape
from quantms_utils_spark.operators.ml import population_stability_from_counts
from quantms_utils_spark.streaming.curation import _list_epoch_dirs

__all__ = [
    "bins_batch",
    "standing_bins",
    "drift_report",
    "start_continuous_drift",
]

_BIN_SCHEMA = "bin long, n long, epoch long"


def bins_batch(
    batch_df: DataFrame, epoch_id: int, *, bin_col: str, state_dir: str
) -> None:
    """foreachBatch callback: collapse the batch to per-bin counts and
    record them as ``epoch=N`` (replay-safe overwrite). ``bin_col`` must
    be an integral histogram-bin index — it is cast to long so the state
    matches the pinned ``_BIN_SCHEMA`` read (an int32 column written
    as-is would fail the schema-forced re-read); a non-integral column
    fails loudly here instead of corrupting state."""
    dt = batch_df.schema[bin_col].dataType.simpleString()
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"bin_col must be an integral bin index, got {bin_col!r}: {dt}"
        )
    counts = batch_df.groupBy(
        F.col(bin_col).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    counts.write.mode("overwrite").parquet(f"{state_dir}/epoch={int(epoch_id)}")


def standing_bins(
    spark: SparkSession, state_dir: str, *, upto_epoch: int | None = None
) -> DataFrame:
    """The standing distribution: bin-wise count sum over recorded epochs
    (strictly below ``upto_epoch`` for replay-safe in-callback reads)."""
    before = (1 << 62) if upto_epoch is None else int(upto_epoch)
    dirs = _list_epoch_dirs(spark, state_dir, before)
    if not dirs:
        return spark.createDataFrame([], _BIN_SCHEMA).drop("epoch")
    return (
        spark.read.schema(_BIN_SCHEMA)
        .parquet(*[_glob_escape(d) for d in dirs])
        .groupBy("bin")
        .agg(F.sum("n").alias("n"))
    )


def drift_report(
    spark: SparkSession,
    state_dir: str,
    baseline_counts: DataFrame,
    *,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-bin PSI terms of the standing stream distribution (side a)
    against a frozen baseline ``(bin, n)`` table (side b); Σ psi_term is
    the alert value."""
    a = standing_bins(spark, state_dir).withColumnRenamed("n", "n_a")
    b = baseline_counts.select(
        F.col("bin"), F.col("n").alias("n_b")
    )
    return population_stability_from_counts(a, b, smoothing=smoothing)


def start_continuous_drift(
    incoming: DataFrame,
    *,
    bin_col: str,
    state_dir: str,
    checkpoint_dir: str,
):
    """Wire a stream into the continuous drift loop (availableNow drain).
    Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        bins_batch(batch_df, epoch_id, bin_col=bin_col, state_dir=state_dir)

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
