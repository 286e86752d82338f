"""Continuous data-skipping-manifest maintenance: land a stream's batches
as epoch-keyed parquet and keep the FILE-SKIPPING manifests (min/max zone
map + Bloom filter) current per batch — so point and range lookups over the
growing table keep pruning without ever re-scanning history.

This is the streaming twin of the layout family
(`operators/layout.py:file_zone_map` / `file_bloom_manifest` and their
incremental `*_update` forms): in production, a table that ingests
continuously has manifests that are only trustworthy if they are maintained
*in the same transaction cadence* as the data lands — a manifest rebuilt
nightly lets 24 h of files go unprunable (and, worse, a STALE manifest that
claims completeness would silently drop rows from pruned reads).

Design — everything is epoch-keyed, so at-least-once foreachBatch replay is
idempotent end-to-end:

- data lands at ``{table_dir}/epoch={id}`` with ``mode("overwrite")`` — a
  replayed epoch overwrites itself, never duplicates. Epoch ids are unique
  only WITHIN a checkpoint, so a table is owned by exactly ONE checkpoint
  for its whole life (the invariant Structured Streaming requires anyway);
  pointing a fresh checkpoint at an existing table would restart epoch
  numbering at 0 and overwrite history;
- each manifest is itself an epoch-keyed parquet table
  (``{manifest_dir}/zone/epoch={id}``, ``{manifest_dir}/bloom/epoch={id}``)
  whose per-epoch rows are derived ONLY from that epoch's files — replay
  overwrites the same manifest slice. No read-modify-write cycle exists
  anywhere, so there is no torn-manifest window and maintenance is O(new
  files) per batch (the same incremental discipline as
  ``zone_map_update`` / ``bloom_manifest_update``, with the union
  materialized by the directory layout instead of a job);
- readers assemble the current manifest by reading the manifest directory
  (`current_zone_manifest` / `current_bloom_manifest`) and prune with the
  UNCHANGED batch operators (`zone_pruned_read` / `bloom_pruned_read`) —
  streaming maintenance and batch pruning share one code path.

Reference scope: the reference package has no streaming surface (it is a
single-process CLI, /root/reference/quantmsutils); this family exists for
the 100 TB continuous-ingest deployments the engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def land_and_maintain(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    table_dir: str,
    manifest_dir: str,
    zone_cols: list[str] | None = None,
    bloom_col: str | None = None,
    m_bits: int = 4096,
    k: int = 3,
) -> None:
    """foreachBatch callback: land ``batch_df`` as this epoch's parquet
    files, then write this epoch's slice of each requested manifest from
    exactly those files. At least one of ``zone_cols`` / ``bloom_col``
    must be requested — landing without maintenance is just a write."""
    from quantms_utils_spark.operators.layout import (
        file_bloom_manifest,
        file_zone_map,
    )

    if not zone_cols and not bloom_col:
        raise ValueError("request zone_cols and/or bloom_col to maintain")
    spark = batch_df.sparkSession
    epoch_path = f"{table_dir}/epoch={int(epoch_id)}"
    batch_df.write.mode("overwrite").parquet(epoch_path)
    # The (file_size, file_mtime) identity columns are STRIPPED from the
    # epoch-slice manifests (round 9): they exist solely so the batch-side
    # manifest_reconcile can detect a same-name rewrite, but these slices
    # are epoch-keyed and never reconciled by identity — replay overwrites
    # the whole slice. Keeping mtime would BREAK the design invariant this
    # module is built on: an at-least-once replay rewrites the epoch's
    # files in place, mtimes move, and the replayed manifest slice would
    # no longer be bit-identical to the original (replay idempotence is
    # what makes foreachBatch safe here).
    if zone_cols:
        file_zone_map(spark, epoch_path, zone_cols).drop(
            "file_size", "file_mtime"
        ).write.mode("overwrite").parquet(
            f"{manifest_dir}/zone/epoch={int(epoch_id)}"
        )
    if bloom_col:
        file_bloom_manifest(
            spark, epoch_path, bloom_col, m_bits=m_bits, k=k
        ).drop("file_size", "file_mtime").write.mode("overwrite").parquet(
            f"{manifest_dir}/bloom/epoch={int(epoch_id)}"
        )


def start_manifest_maintained_ingest(
    incoming: DataFrame,
    *,
    table_dir: str,
    manifest_dir: str,
    checkpoint_dir: str,
    zone_cols: list[str] | None = None,
    bloom_col: str | None = None,
    m_bits: int = 4096,
    k: int = 3,
):
    """Wire a streaming frame into :func:`land_and_maintain` with
    availableNow semantics (drain everything landed, then stop — the
    scheduled-incremental-run shape). Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        land_and_maintain(
            batch_df,
            epoch_id,
            table_dir=table_dir,
            manifest_dir=manifest_dir,
            zone_cols=zone_cols,
            bloom_col=bloom_col,
            m_bits=m_bits,
            k=k,
        )

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_zone_manifest(spark, manifest_dir: str) -> DataFrame:
    """The standing zone-map manifest: one row per landed data file,
    assembled by reading the epoch-keyed manifest table (the epoch
    partition column is dropped — pruning is file-granular)."""
    from quantms_utils_spark.operators.layout import _glob_escape

    return spark.read.parquet(
        _glob_escape(f"{manifest_dir}/zone")
    ).drop("epoch")


def current_bloom_manifest(spark, manifest_dir: str) -> DataFrame:
    """The standing Bloom manifest, same assembly as
    :func:`current_zone_manifest`."""
    from quantms_utils_spark.operators.layout import _glob_escape

    return spark.read.parquet(
        _glob_escape(f"{manifest_dir}/bloom")
    ).drop("epoch")


__all__ = [
    "land_and_maintain",
    "start_manifest_maintained_ingest",
    "current_zone_manifest",
    "current_bloom_manifest",
]
