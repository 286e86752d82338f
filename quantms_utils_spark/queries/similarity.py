"""Similarity-search queries over the `embeddings` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from quantms_utils_spark.operators.similarity import (
    ann_bruteforce,
    cosine_pairs_blocked,
    cosine_sim,
)
from quantms_utils_spark.tables import load


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 cosine neighbors of vec_id=0 — the correctness baseline
    every approximate variant is measured against."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return ann_bruteforce(
        e.filter(F.col("vec_id") != 0), q, id_col="vec_id", vec_col="embedding", k=20
    )


ANN_BRUTEFORCE_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qe), 4) AS cos_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY list_cosine_similarity(embedding::DOUBLE[], qe) DESC, vec_id
LIMIT 20
"""


def ann_partitioned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style partitioned search (nprobe=1): only score vectors sharing the
    query's coarse partition (label). At scale the partition column is the
    parquet partition key → partition pruning at scan."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("label").alias("q_label")
    )
    candidates = e.join(broadcast(q), e.label == q.q_label).filter(
        F.col("vec_id") != 0
    )
    scored = candidates.select(
        "vec_id", cosine_sim(F.col("embedding"), F.col("q_emb")).alias("cos_raw")
    )
    return (
        scored.orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round("cos_raw", 4).alias("cos_sim"))
    )


ANN_PARTITIONED_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe, label AS ql FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qe), 4) AS cos_sim
FROM embeddings, q
WHERE label = ql AND vec_id <> 0
ORDER BY list_cosine_similarity(embedding::DOUBLE[], qe) DESC, vec_id
LIMIT 10
"""


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norm profile per label — the cheap sanity scan run before any
    ANN campaign (degenerate/zero vectors surface here)."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        e.select(F.col("label").cast("long").alias("label"), norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("norm"), 4).alias("min_norm"),
            F.round(F.max("norm"), 4).alias("max_norm"),
        )
    )


EMBEDDING_NORMS_SQL = """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
       round(min(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))), 4) AS min_norm,
       round(max(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))), 4) AS max_norm
FROM embeddings GROUP BY label
"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4), blocked by the coarse
    `label` partition — the embedding-space sibling of MinHash-LSH dedup.
    Normalization happens once per vector before the block self-join."""
    e = load(spark, sf_dir, "embeddings")
    pairs = cosine_pairs_blocked(
        e, id_col="vec_id", vec_col="embedding", block_col="label", threshold=0.4
    )
    return pairs.select(
        F.col("id_a").alias("vec_a"),
        F.col("id_b").alias("vec_b"),
        F.round("cos_raw", 4).alias("cos_sim"),
    )


DEDUP_EMBEDDING_COSINE_SQL = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.emb, b.emb), 4) AS cos_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
"""


QUERIES = {
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    "ann_partitioned_topk": (ann_partitioned_topk, ANN_PARTITIONED_SQL),
    "embedding_norms": (embedding_norms, EMBEDDING_NORMS_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL),
}
