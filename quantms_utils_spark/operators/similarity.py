"""Similarity search over embedding columns (array<float>).

- ``cosine_sim`` — pure Catalyst expression (zip_with + aggregate fold): stays
  JVM-side, no Python boundary.
- ``ann_bruteforce`` — exact top-k: broadcast the query vector, score every
  row, TakeOrderedAndProject (per-partition heap, no full sort shuffle).
- ``ann_partitioned`` — the scale path: restrict scoring to one coarse
  partition (here the pre-assigned ``label``; in a real IVF deployment the
  centroid assignment computed the same way) before scoring. This is an IVF
  probe with nprobe=1: at 100 TB the partition column is the parquet
  partition key, so partition pruning skips everything else at scan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    ad, bd = _to_double(a), _to_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def ann_bruteforce(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
) -> DataFrame:
    """Exact top-k cosine neighbors of the single-row ``query`` (column
    ``q_emb``), deterministic tiebreak on id."""
    scored = vectors.crossJoin(broadcast(query)).select(
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col("q_emb")).alias("cos_raw"),
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cos_raw", 4).alias("cos_sim"))
    )
