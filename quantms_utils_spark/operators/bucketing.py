"""Bucketed tables: co-located joins with no exchange.

The reference never joins two large relations (its dimensions are tiny TSVs),
but the engine's 100 TB story needs the fact⋈fact case: PSMs ⋈ spectra of the
same corpus, lineitem ⋈ orders, repeated every run. Shuffling both sides per
query is the dominant cost; bucketing amortizes it ONCE at write time.

``bucketBy(n, key)`` + ``sortBy(key)`` writes each partition pre-hashed into
n buckets, recorded in the catalog. A subsequent sort-merge join between two
tables bucketed the same way (same key, same n) reads bucket-aligned splits
and skips BOTH the exchange and (with sortBy) the sort — the plan shows
SortMergeJoin directly over the scans. This is the batch analog of
co-partitioned stream-stream joins, and the knob to revisit whenever the same
join key appears in every query of a workload.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str | Sequence[str],
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    ``path`` makes it an external table at that location (keeps artifacts
    out of the session warehouse dir — the oracle-gated query uses a
    tempdir)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables; with matching bucket specs the
    planner elides the exchange on both sides."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
