"""Snapshot comparison (CDC-style table diff).

``table_diff`` classifies every key across two snapshots of the same table
as inserted / deleted / updated / unchanged — the reconciliation primitive
behind incremental loads, backfill audits, and replication checks.

Scale shape: ONE full-outer equi-join on the key columns (co-partitioned by
the shuffle on the key — at 100 TB, bucket both snapshots by the key and the
join goes exchange-free), with change detection via a single xxhash64 over
the canonicalized non-key columns computed map-side on each side before the
join. No column-by-column comparison expression blow-up, no driver work;
emitting only changed rows keeps the output proportional to the drift, not
the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["table_diff"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """Diff two snapshots sharing a schema on ``keys``.

    Returns the key columns plus ``status`` in {'inserted', 'deleted',
    'updated'} (plus 'unchanged' when ``include_unchanged``). Non-key
    columns are compared by a null-safe xxhash64 over their canonical
    string forms (every value cast to string, nulls sentineled), so two
    snapshots disagree iff any non-key value differs.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshots must share a schema")
    non_keys = [c for c in old.columns if c not in keys]

    def _hashed(df: DataFrame, alias: str) -> DataFrame:
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")).alias(c)
            for c in non_keys
        ]
        return df.select(
            *keys, F.xxhash64(*cols).alias(f"_h_{alias}") if non_keys
            else F.lit(0).alias(f"_h_{alias}")
        )

    joined = _hashed(old, "old").join(_hashed(new, "new"), keys, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("inserted"))
        .when(F.col("_h_new").isNull(), F.lit("deleted"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, status.alias("status"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
