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

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.types import DoubleType


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
    n_buckets: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold within coarse blocks.

    The block column (cluster/label/IVF-centroid assignment) turns the O(n²)
    all-pairs space into Σ b² per block — the same blocking idea as LSH
    banding, but in embedding space. Vectors are L2-normalized ONCE before the
    self-join so per-pair work is a single dot product.

    Parallelism is pair-TILED, not just blocked: a plain self-join on the
    block column puts each block's entire b² pairing into one task — block
    count caps parallelism and hot blocks straggle. Instead the right side is
    hashed into one of ``n_buckets`` deterministic buckets and the left side
    is replicated across all buckets, so each (block, bucket) tile pairs
    independently: parallelism = blocks × n_buckets, each pair produced
    exactly once, no distinct needed. Cost: left side replicated ×n_buckets
    through the shuffle — the usual replicate-vs-straggle trade, tunable per
    corpus. Output pairs satisfy id_a < id_b.
    """
    # Two-step normalization: materialize the norm as a column FIRST, then
    # divide. Referencing l2_norm(...) inside the transform lambda would
    # re-evaluate the whole O(d) fold per element — O(d²) per vector.
    vec_d = _to_double(F.col(vec_col))
    with_norm = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        vec_d.alias("v"),
        l2_norm(vec_d).alias("nrm"),
    )
    normed = with_norm.select(
        "block",
        "id",
        F.transform("v", lambda x: x / F.col("nrm")).alias("u"),
    )
    a = normed.select(
        F.col("block"), F.col("id").alias("id_a"), F.col("u").alias("ua")
    ).select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
    )
    b = normed.select(
        F.col("block"),
        F.col("id").alias("id_b"),
        F.col("u").alias("ub"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_buckets)).cast("int").alias("bucket"),
    )
    # Explicit repartition on the tile key: with a broadcast-size right side
    # the join would otherwise inherit the left scan's partitioning (often 1
    # for a small file) and serialize every tile into one task.
    a = a.repartition(F.col("block"), F.col("bucket"))
    # Per-pair scoring is the hot loop (Σ block² pairs): Catalyst higher-order
    # functions interpret the fold lambda per element, so a d-dim dot over
    # millions of pairs is millions×d interpreted steps. The Arrow-batched
    # numpy einsum does the same arithmetic vectorized.
    return (
        a.join(b, ["block", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", _batch_dot(F.col("ua"), F.col("ub")).alias("cos_raw")
        )
        .filter(F.col("cos_raw") >= threshold)
    )


@F.pandas_udf(DoubleType())
def _batch_dot(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized dot product over two array<double> columns (equal length
    per row). Arrow hands each batch as object Series of numpy arrays."""
    import numpy as np

    if len(a) == 0:
        return pd.Series([], dtype="float64")
    A = np.stack(a.to_numpy())
    B = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", A, B))


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
