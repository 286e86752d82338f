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


#: Oracles rank by the ROUND-6 score with an id tie-break, mirroring the
#: engine's round-before-rank discipline (round 13): raw-score ORDER BY is
#: engine-divergent on tie-dense (duplicate-embedding) data because the two
#: engines sum dot products in different orders.
ANN_BRUTEFORCE_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qe), 4) AS cos_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY round(list_cosine_similarity(embedding::DOUBLE[], qe), 6) DESC, vec_id
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
    # round-before-rank (round 13): see ann_bruteforce's docstring.
    return (
        scored.orderBy(F.round("cos_raw", 6).desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round("cos_raw", 4).alias("cos_sim"))
    )


ANN_PARTITIONED_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe, label AS ql FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qe), 4) AS cos_sim
FROM embeddings, q
WHERE label = ql AND vec_id <> 0
ORDER BY round(list_cosine_similarity(embedding::DOUBLE[], qe), 6) DESC, vec_id
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


def _hyperplanes(n_planes: int = 4, dim: int = 64) -> list[list[float]]:
    """Fixed random hyperplanes (seeded, rounded so the SQL literal and the
    Spark literal are the same numbers)."""
    import numpy as np

    rng = np.random.RandomState(7)
    return [[round(float(x), 6) for x in row] for row in rng.randn(n_planes, dim)]


_PLANES = _hyperplanes()


def _bucket_expr(emb: F.Column) -> F.Column:
    """Sign-bit bucket id from the fixed hyperplanes (random-hyperplane LSH:
    nearby vectors agree on most sign bits, so same-bucket is a high-recall
    candidate filter)."""
    from quantms_utils_spark.functions.core import let_once

    def _sign_bits(emb_d: F.Column) -> F.Column:
        bucket = F.lit(0)
        for j, plane in enumerate(_PLANES):
            lit_plane = F.array(*[F.lit(v) for v in plane])
            dot_j = F.aggregate(
                F.zip_with(emb_d, lit_plane, lambda x, h: x * h),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(dot_j > 0, F.lit(2**j)).otherwise(F.lit(0))
        return bucket

    # let-bound: every plane's dot references the cast array; unbound it
    # would be re-cast once per plane per row
    return let_once(F.transform(emb, lambda x: x.cast("double")), _sign_bits)


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN (the scale path next to the IVF/label probe): bucket
    every vector by 4 random-hyperplane sign bits (16 buckets), score only the
    query's bucket, exact cosine top-10 within it. At 100 TB the bucket id is
    a partition/cluster key, so the probe prunes ~15/16 of the corpus at scan
    time; recall is tuned by adding planes/probing neighbor buckets."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "bucket", _bucket_expr(F.col("embedding"))
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    candidates = e.join(broadcast(q), e.bucket == q.q_bucket).filter(
        F.col("vec_id") != 0
    )
    scored = candidates.select(
        "vec_id", cosine_sim(F.col("embedding"), F.col("q_emb")).alias("cos_raw")
    )
    # round-before-rank (round 13): see ann_bruteforce's docstring.
    return (
        scored.orderBy(F.round("cos_raw", 6).desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", F.round("cos_raw", 4).alias("cos_sim"))
    )


def _bucket_sql() -> str:
    terms = []
    for j, plane in enumerate(_PLANES):
        lit = "[" + ", ".join(repr(v) for v in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
            f"THEN {2**j} ELSE 0 END)"
        )
    return " + ".join(terms)


ANN_LSH_BUCKETED_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, {_bucket_sql()} AS bucket
  FROM embeddings
), q AS (
  SELECT emb AS qe, bucket AS qb FROM b WHERE vec_id = 0
)
SELECT vec_id, round(list_cosine_similarity(emb, qe), 4) AS cos_sim
FROM b, q
WHERE bucket = qb AND vec_id <> 0
ORDER BY round(list_cosine_similarity(emb, qe), 6) DESC, vec_id
LIMIT 10
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
WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.4
"""


# ---------------------------------------------------------------------------
# IVF with a REAL k-means coarse quantizer (Lloyd's iterations)

IVF_K = 8
IVF_ITER = 2
IVF_NPROBE = 2


def _ivf_centroids(spark: SparkSession, sf_dir: str):
    """Train the coarse quantizer: seeds = vec_id < k (deterministic), two
    Lloyd iterations, centroids quantized to 2 decimals per update (see
    operators.similarity.kmeans_train for why quantization makes the training
    loop itself oracle-reproducible)."""
    from quantms_utils_spark.operators.similarity import kmeans_train

    e = load(spark, sf_dir, "embeddings")
    init_rows = (
        e.filter(F.col("vec_id") < IVF_K)
        .select("vec_id", "embedding")
        .collect()
    )
    init = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in sorted(init_rows, key=lambda r: r["vec_id"])
    ]
    return e, kmeans_train(
        e, "embedding", init, n_iter=IVF_ITER, round_decimals=2
    )


def ann_ivf_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained IVF centroids themselves, exploded to (cid, dim, coord)
    rows — value-checks the distributed Lloyd loop (argmin assignment +
    partial-aggregated mean) against an unrolled-SQL twin, independent of any
    search that uses it."""
    spark_e, centroids = _ivf_centroids(spark, sf_dir)
    rows = [
        (cid, dim, float(v))
        for cid, vec in centroids
        for dim, v in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "cid int, dim int, coord double")


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: assign every vector to its nearest trained centroid,
    probe the nprobe=2 centroids nearest the query, exact cosine top-10
    within the probed cells. At 100 TB the assignment is the table's
    partition key (written once at ingest), so the probe prunes ~(1 -
    nprobe/k) of the corpus at scan time."""
    from quantms_utils_spark.operators.similarity import ivf_search

    e, centroids = _ivf_centroids(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return ivf_search(
        e.filter(F.col("vec_id") != 0),
        q,
        centroids,
        id_col="vec_id",
        vec_col="embedding",
        nprobe=IVF_NPROBE,
        k=10,
    )


def _kmeans_iter_sql(prev_assign: str, prev_cent: str, a: str, c: str) -> str:
    """One unrolled Lloyd iteration: argmin assignment vs {prev_cent}, then
    per-(cid, dim) mean rounded to 2 decimals, re-packed into an array."""
    return f"""
{a} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, {prev_cent}.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.v, {prev_cent}.c), {prev_cent}.cid
           ) AS rn
    FROM e, {prev_cent}
  ) WHERE rn = 1
),
{c} AS (
  SELECT cid, list(m ORDER BY i) AS c FROM (
    SELECT cid, i, round(avg(v[i]), 2) AS m
    FROM {a}, UNNEST(generate_series(1, 64)) t(i)
    GROUP BY cid, i
  ) GROUP BY cid
)"""


_KMEANS_PRELUDE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {IVF_K}),
{_kmeans_iter_sql('e', 'c0', 'a1', 'c1')},
{_kmeans_iter_sql('e', 'c1', 'a2', 'c2')}
"""


ANN_IVF_KMEANS_CENTROIDS_SQL = f"""
{_KMEANS_PRELUDE}
SELECT CAST(cid AS INT) AS cid, CAST(i - 1 AS INT) AS dim, c[i] AS coord
FROM c2, UNNEST(generate_series(1, 64)) t(i)
"""


ANN_IVF_TOPK_SQL = f"""
{_KMEANS_PRELUDE},
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
probes AS (
  SELECT cid FROM c2, q ORDER BY list_distance(qv, c), cid LIMIT {IVF_NPROBE}
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c2.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.v, c2.c), c2.cid
           ) AS rn
    FROM e, c2
  ) WHERE rn = 1
)
SELECT vec_id, round(list_cosine_similarity(v, qv), 4) AS cos_sim
FROM assign, q
WHERE cid IN (SELECT cid FROM probes) AND vec_id <> 0
ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id
LIMIT 10
"""


def ann_batch_queries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched retrieval: top-10 cosine neighbors for five query vectors in
    ONE pass (operators.similarity.ann_batch_topk — broadcast query batch,
    map-only scoring, rank shuffle carries only id/score triples)."""
    from quantms_utils_spark.operators.similarity import ann_batch_topk

    e = load(spark, sf_dir, "embeddings")
    qs = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    return ann_batch_topk(e, qs, k=10)


ANN_BATCH_SQL = """
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 5
), s AS (
  SELECT q.q_id, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) AS c
  FROM embeddings e JOIN q ON e.vec_id <> q.q_id
), r AS (
  SELECT q_id, vec_id, c,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY round(c, 6) DESC, vec_id) AS rank
  FROM s
)
SELECT q_id, vec_id, round(c, 4) AS cos_sim, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 10
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding
    (operators.similarity.quantize_int8 — pure Catalyst, map-only). The full
    quantized code array is value-checked via an md5 digest of its CSV form
    (the driver's canonicalizer can't sort list columns), plus the scale and
    the dequantization MSE. All arithmetic is deterministic IEEE double ops,
    so DuckDB reproduces the exact codes."""
    from quantms_utils_spark.operators.similarity import quantize_int8

    e = load(spark, sf_dir, "embeddings")
    qs = quantize_int8(F.col("embedding"))
    return e.withColumn("qs", qs).select(
        "vec_id",
        F.col("qs.scale").alias("scale"),
        F.md5(
            F.concat_ws(",", F.transform(F.col("qs.q"), lambda x: x.cast("string")))
        ).alias("q_digest"),
        F.round(F.col("qs.mse"), 12).alias("mse"),
    )


EMBEDDING_QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
           AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, scale, v,
    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
         ELSE list_transform(v, x -> CAST(round(x / scale) AS INT)) END AS q
  FROM v
)
SELECT vec_id, scale,
  md5(array_to_string(q, ',')) AS q_digest,
  CASE WHEN scale = 0 THEN 0.0
       ELSE round(list_sum(list_transform(generate_series(1, len(v)),
                    i -> (v[i] - q[i] * scale) * (v[i] - q[i] * scale)))
                  / len(v), 12) END AS mse
FROM q
"""


def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 cosine retrieval over the int8-QUANTIZED corpus (dequantized
    on the fly, full-precision query) — the memory-bound serving shape:
    4× less scan IO than float32 at a small recall cost, and because
    quantization is IEEE-deterministic the oracle reproduces the exact
    dequantized scores. Compare against ann_bruteforce_topk to see the
    rank drift quantization introduces."""
    from quantms_utils_spark.operators.similarity import (
        ann_bruteforce,
        quantize_int8,
    )

    e = load(spark, sf_dir, "embeddings")
    qs = quantize_int8(F.col("embedding"))
    deq = e.withColumn("qs", qs).select(
        "vec_id",
        F.transform(
            F.col("qs.q"), lambda x: x.cast("double") * F.col("qs.scale")
        ).alias("embedding"),
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return ann_bruteforce(
        deq.filter(F.col("vec_id") != 0), q, id_col="vec_id",
        vec_col="embedding", k=20,
    )


ANN_QUANTIZED_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
           AS scale
  FROM embeddings
), dq AS (
  SELECT vec_id,
    CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS DOUBLE))
         ELSE list_transform(v, x -> CAST(CAST(round(x / scale) AS INT)
                                          AS DOUBLE) * scale) END AS emb
  FROM v
), q AS (
  SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
)
SELECT vec_id, round(list_cosine_similarity(emb, qe), 4) AS cos_sim
FROM dq, q
WHERE vec_id <> 0
ORDER BY round(list_cosine_similarity(emb, qe), 6) DESC, vec_id
LIMIT 20
"""


def embedding_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed population covariance of the embedding column as
    (i, j, cov) rows (operators.similarity.covariance_matrix): per-partition
    Gram partials via one numpy GEMM per Arrow batch, merged by a tiny
    aggregate — the shuffle is (d+1)² doubles per partition, independent of
    corpus size. Oracle is DuckDB's covar_pop over the unnested pairs."""
    from quantms_utils_spark.operators.similarity import covariance_matrix

    e = load(spark, sf_dir, "embeddings")
    return covariance_matrix(e, "embedding", 64)


EMBEDDING_PCA_COV_SQL = """
WITH u AS (
  SELECT vec_id, CAST(i AS INT) AS i, embedding[i + 1]::DOUBLE AS v
  FROM embeddings, UNNEST(generate_series(0, 63)) AS t(i)
)
SELECT a.i AS i, b.i AS j, round(covar_pop(a.v, b.v), 9) AS cov
FROM u a JOIN u b USING (vec_id)
GROUP BY 1, 2
"""


def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-NN graph within label blocks: every vector's top-3 cosine
    neighbors among same-label vectors, via the tiled-GEMM self-join
    (per-tile local top-k candidates, one global rank — the pair space
    never shuffles). Oracle is the brute-force within-label pair join."""
    from quantms_utils_spark.operators.similarity import knn_self_join

    e = load(spark, sf_dir, "embeddings")
    return knn_self_join(
        e, id_col="vec_id", vec_col="embedding", block_col="label", k=3
    )


ANN_KNN_GRAPH_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cos_sim
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
"""


SEMANTIC_DEDUP_THRESHOLD = 0.4


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embeddings table: assign every
    vector to its nearest TRAINED k-means centroid (the same oracle-verified
    Lloyd loop as the IVF queries), then within each cell mark a vector as a
    semantic duplicate when a lower-id cell-mate has cosine ≥ 0.4, keeper =
    min such id (operators.similarity.semantic_dedup — pair-tiled GEMM
    within cells, one min aggregate, one left join; the cell id is the
    ingest-time partition key at 100 TB so the pair stage is
    partition-local)."""
    from quantms_utils_spark.operators.similarity import (
        assign_to_centroids,
        semantic_dedup,
    )

    e, centroids = _ivf_centroids(spark, sf_dir)
    cells = e.withColumn("cid", assign_to_centroids("embedding", centroids))
    out = semantic_dedup(
        cells,
        id_col="vec_id",
        vec_col="embedding",
        block_col="cid",
        threshold=SEMANTIC_DEDUP_THRESHOLD,
    )
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cid").cast("int").alias("cid"),
        F.col("dup_of").cast("long").alias("dup_of"),
        "is_dup",
    )


DEDUP_SEMANTIC_SQL = f"""
{_KMEANS_PRELUDE},
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c2.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.v, c2.c), c2.cid
           ) AS rn
    FROM e, c2
  ) WHERE rn = 1
), p AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {SEMANTIC_DEDUP_THRESHOLD}
), dup AS (
  SELECT vb AS vec_id, min(va) AS dup_of FROM p GROUP BY 1
)
SELECT CAST(a.vec_id AS BIGINT) AS vec_id, CAST(a.cid AS INT) AS cid,
       CAST(dup.dup_of AS BIGINT) AS dup_of,
       dup.dup_of IS NOT NULL AS is_dup
FROM assign a LEFT JOIN dup ON a.vec_id = dup.vec_id
"""


NEG_SAMPLE_PER_LABEL = 8
NEG_SAMPLE_K = 3


def embedding_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negative sampling — the data-prep step for
    embedding training: each anchor gets k=3 negatives drawn from OTHER
    coarse labels, reproducibly (md5 pseudo-order, no RNG state, stable
    under repartitioning). Scale shape: the candidate pool is a per-label
    md5-ranked sample (labels × 8 rows) that BROADCASTS; the anchor side
    meets it in a BroadcastNestedLoopJoin over that tiny pool (the batched-
    ANN precedent — never a corpus×corpus product), then one per-anchor
    rank window picks the k negatives."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    w_pool = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    pool = (
        e.select("vec_id", "label")
        .withColumn("rn", F.row_number().over(w_pool))
        .where(F.col("rn") <= NEG_SAMPLE_PER_LABEL)
        .select(
            F.col("vec_id").alias("neg_id"), F.col("label").alias("neg_label")
        )
    )
    anchors = e.select("vec_id", "label")
    cand = anchors.join(
        F.broadcast(pool), F.col("label") != F.col("neg_label")
    )
    w_rank = Window.partitionBy("vec_id").orderBy(
        F.md5(
            F.concat(
                F.col("vec_id").cast("string"),
                F.lit("-"),
                F.col("neg_id").cast("string"),
            )
        ),
        F.col("neg_id"),
    )
    return (
        cand.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= NEG_SAMPLE_K)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("neg_id").cast("long").alias("neg_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


EMBEDDING_NEG_SAMPLES_SQL = f"""
WITH pool AS (
  SELECT vec_id AS neg_id, label AS neg_label FROM (
    SELECT vec_id, label,
           row_number() OVER (
             PARTITION BY label
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
           ) AS rn
    FROM embeddings
  ) WHERE rn <= {NEG_SAMPLE_PER_LABEL}
), cand AS (
  SELECT e.vec_id, p.neg_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY md5(CAST(e.vec_id AS VARCHAR) || '-'
                        || CAST(p.neg_id AS VARCHAR)), p.neg_id
         ) AS rank
  FROM embeddings e JOIN pool p ON e.label <> p.neg_label
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(neg_id AS BIGINT) AS neg_id,
       CAST(rank AS INT) AS rank
FROM cand WHERE rank <= {NEG_SAMPLE_K}
"""


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the approximate searches against exact brute force —
    the serving-quality report every ANN deployment tracks. One lazy plan:
    the exact top-10 id set joins each approximate method's top-10 and the
    hit counts aggregate per method. The oracle recomputes all three
    searches (including the unrolled k-means training) in SQL."""
    from quantms_utils_spark.operators.similarity import ann_bruteforce, ivf_search

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    corpus = e.filter(F.col("vec_id") != 0)
    bf_ids = ann_bruteforce(corpus, q, id_col="vec_id", vec_col="embedding", k=10).select("vec_id")

    lsh_ids = ann_lsh_bucketed(spark, sf_dir).select("vec_id")
    spark_e, centroids = _ivf_centroids(spark, sf_dir)
    ivf_ids = ivf_search(
        corpus, q, centroids, id_col="vec_id", vec_col="embedding",
        nprobe=IVF_NPROBE, k=10,
    ).select("vec_id")

    reports = []
    for method, ids in (("lsh", lsh_ids), ("ivf", ivf_ids)):
        reports.append(
            ids.join(bf_ids, "vec_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(
                F.lit(method).alias("method"),
                F.lit(10).alias("k"),
                "n_hits",
                F.round(F.col("n_hits") / F.lit(10.0), 4).alias("recall"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


ANN_RECALL_SQL = f"""
{_KMEANS_PRELUDE},
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
bf AS (
  SELECT vec_id FROM e, q WHERE vec_id <> 0
  ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id LIMIT 10
),
b AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, {{bucket}} AS bucket
  FROM embeddings
),
qb AS (SELECT emb AS qe, bucket AS qbk FROM b WHERE vec_id = 0),
lsh AS (
  SELECT vec_id FROM b, qb WHERE bucket = qbk AND vec_id <> 0
  ORDER BY round(list_cosine_similarity(emb, qe), 6) DESC, vec_id LIMIT 10
),
probes AS (
  SELECT cid FROM c2, q ORDER BY list_distance(qv, c), cid LIMIT {IVF_NPROBE}
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c2.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.v, c2.c), c2.cid
           ) AS rn
    FROM e, c2
  ) WHERE rn = 1
),
ivf AS (
  SELECT vec_id FROM assign, q
  WHERE cid IN (SELECT cid FROM probes) AND vec_id <> 0
  ORDER BY round(list_cosine_similarity(v, qv), 6) DESC, vec_id LIMIT 10
)
SELECT 'lsh' AS method, 10 AS k, CAST(count(*) AS BIGINT) AS n_hits,
       round(count(*) / 10.0, 4) AS recall
FROM lsh JOIN bf USING (vec_id)
UNION ALL
SELECT 'ivf' AS method, 10 AS k, CAST(count(*) AS BIGINT) AS n_hits,
       round(count(*) / 10.0, 4) AS recall
FROM ivf JOIN bf USING (vec_id)
""".replace("{bucket}", _bucket_sql())


QUERIES = {
    "dedup_semantic": (dedup_semantic, DEDUP_SEMANTIC_SQL),
    "ann_recall_report": (ann_recall_report, ANN_RECALL_SQL),
    "embedding_negative_samples": (embedding_negative_samples, EMBEDDING_NEG_SAMPLES_SQL),
    "ann_bruteforce_topk": (ann_bruteforce_topk, ANN_BRUTEFORCE_SQL),
    "ann_knn_graph": (ann_knn_graph, ANN_KNN_GRAPH_SQL),
    "ann_batch_queries_topk": (ann_batch_queries_topk, ANN_BATCH_SQL),
    "ann_quantized_topk": (ann_quantized_topk, ANN_QUANTIZED_SQL),
    "embedding_quantize_int8": (embedding_quantize_int8, EMBEDDING_QUANTIZE_SQL),
    "embedding_pca_covariance": (embedding_pca_covariance, EMBEDDING_PCA_COV_SQL),
    "ann_partitioned_topk": (ann_partitioned_topk, ANN_PARTITIONED_SQL),
    "ann_lsh_bucketed": (ann_lsh_bucketed, ANN_LSH_BUCKETED_SQL),
    "embedding_norms": (embedding_norms, EMBEDDING_NORMS_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL),
    "ann_ivf_kmeans_centroids": (
        ann_ivf_kmeans_centroids,
        ANN_IVF_KMEANS_CENTROIDS_SQL,
    ),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
}


# --- product quantization (PQ) ----------------------------------------------

PQ_M = 4       # subspaces
PQ_K = 8       # centroids per subspace codebook
PQ_SUBD = 16   # 64-dim vectors / 4 subspaces
PQ_ITER = 2


def _pq_books(spark: SparkSession, sf_dir: str):
    from quantms_utils_spark.operators.similarity import pq_train

    e = load(spark, sf_dir, "embeddings")
    return e, pq_train(
        e, "embedding", dim=64, n_subspaces=PQ_M, k=PQ_K,
        n_iter=PQ_ITER, round_decimals=2,
    )


def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code words (operators.similarity.pq_train /
    pq_codes): 4 independent 8-centroid codebooks trained per 16-dim
    subspace (Jégou et al., TPAMI 2011), every vector compressed to 4
    small codes = 64 dims → 4 bytes-ish, the third compression point next
    to int8 and PCA. The oracle unrolls all FOUR Lloyd loops (the IVF
    twin technique per subspace) and re-derives every code, so training,
    slicing, and assignment are all value-checked."""
    from quantms_utils_spark.operators.similarity import pq_codes

    e, books = _pq_books(spark, sf_dir)
    return pq_codes(e, "embedding", books, dim=64)


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (ADC): the query (vec_id 0) scans only
    the CODE columns — per subspace an 8-entry code→distance literal map
    (computed driver-side from the query sub-vector), summed and ranked.
    At 100 TB this is the scan that touches 4 bytes per vector instead of
    256: the codes table is the index. Top-10 by approximate L2 (rounded
    before the cut, vec_id tiebreak)."""
    from quantms_utils_spark.operators.similarity import (
        pq_adc_score,
        pq_codes,
    )

    e, books = _pq_books(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    query = [float(x) for x in q["embedding"]]
    codes = pq_codes(e.filter(F.col("vec_id") != 0), "embedding", books, dim=64)
    return (
        codes.select(
            "vec_id", F.round(pq_adc_score(books, query), 4).alias("adc_dist")
        )
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


def _pq_iter_sql(sub: int, src: str, prev_cent: str, a: str, c: str) -> str:
    return f"""
{a} AS (
  SELECT vec_id, v, cid FROM (
    SELECT {src}.vec_id, {src}.v, {prev_cent}.cid,
           row_number() OVER (
             PARTITION BY {src}.vec_id
             ORDER BY list_distance({src}.v, {prev_cent}.c), {prev_cent}.cid
           ) AS rn
    FROM {src}, {prev_cent}
  ) WHERE rn = 1
),
{c} AS (
  SELECT cid, list(m ORDER BY i) AS c FROM (
    SELECT cid, i, round(avg(v[i]), 2) AS m
    FROM {a}, UNNEST(generate_series(1, {PQ_SUBD})) t(i)
    GROUP BY cid, i
  ) GROUP BY cid
)"""


def _pq_prelude() -> str:
    parts = ["WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]
    for m in range(PQ_M):
        lo, hi = m * PQ_SUBD + 1, (m + 1) * PQ_SUBD
        parts.append(
            f"e{m} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e)"
        )
        parts.append(
            f"c0_{m} AS (SELECT vec_id AS cid, v AS c FROM e{m} WHERE vec_id < {PQ_K})"
        )
        parts.append(_pq_iter_sql(m, f"e{m}", f"c0_{m}", f"a1_{m}", f"c1_{m}").lstrip())
        parts.append(_pq_iter_sql(m, f"e{m}", f"c1_{m}", f"a2_{m}", f"c2_{m}").lstrip())
        parts.append(
            f"""codes_{m} AS (
  SELECT vec_id, cid AS code_{m} FROM (
    SELECT e{m}.vec_id, c2_{m}.cid,
           row_number() OVER (
             PARTITION BY e{m}.vec_id
             ORDER BY list_distance(e{m}.v, c2_{m}.c), c2_{m}.cid
           ) AS rn
    FROM e{m}, c2_{m}
  ) WHERE rn = 1
)"""
        )
    return ",\n".join(parts)


_PQ_CODES_JOIN = " JOIN ".join(
    ["codes_0"] + [f"codes_{m} USING (vec_id)" for m in range(1, PQ_M)]
)

ANN_PQ_CODES_SQL = f"""
{_pq_prelude()}
SELECT vec_id, {", ".join(f"CAST(code_{m} AS INT) AS code_{m}" for m in range(PQ_M))}
FROM {_PQ_CODES_JOIN}
"""

ANN_PQ_TOPK_SQL = f"""
{_pq_prelude()},
{",".join(
    f'''q{m} AS (SELECT v[{m * PQ_SUBD + 1}:{(m + 1) * PQ_SUBD}] AS qv
            FROM e WHERE vec_id = 0),
dtab{m} AS (
  SELECT cid, list_sum(list_transform(generate_series(1, {PQ_SUBD}),
                       i -> (qv[i] - c[i]) * (qv[i] - c[i]))) AS d
  FROM c2_{m}, q{m}
)''' for m in range(PQ_M)
)}
SELECT co.vec_id,
       round({" + ".join(f"d{m}.d" for m in range(PQ_M))}, 4) AS adc_dist
FROM (SELECT * FROM {_PQ_CODES_JOIN}) co
{" ".join(f"JOIN dtab{m} d{m} ON d{m}.cid = co.code_{m}" for m in range(PQ_M))}
WHERE co.vec_id <> 0
ORDER BY adc_dist, co.vec_id
LIMIT 10
"""

QUERIES["ann_pq_codes"] = (ann_pq_codes, ANN_PQ_CODES_SQL)
QUERIES["ann_pq_topk"] = (ann_pq_topk, ANN_PQ_TOPK_SQL)


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production ANN index shape (FAISS IVFPQ; Jégou et al.):
    the coarse quantizer prunes the corpus to the nprobe=2 cells nearest
    the query (partition pruning at 100 TB — the cell id is the table's
    cluster key), and within the probed cells the scan reads ONLY the 4
    PQ code columns, ranking by asymmetric distance (code→distance
    literal maps from the query sub-vectors). Composes the two
    independently-oracle-verified components (`ann_ivf_topk`,
    `ann_pq_topk`); the oracle here replays BOTH training loops and the
    composed probe+ADC, so a drift in either quantizer or in the cell
    filter breaks the hash. Scan cost: 4 bytes/vector over nprobe/k of
    the corpus — the multiplicative win neither component gets alone."""
    import numpy as np

    from quantms_utils_spark.operators.similarity import (
        assign_to_centroids,
        pq_adc_score,
        pq_codes,
    )

    e, centroids = _ivf_centroids(spark, sf_dir)
    _, books = _pq_books(spark, sf_dir)
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    query = [float(x) for x in qrow["embedding"]]
    qv = np.asarray(query, dtype=np.float64)
    order = sorted(
        centroids,
        key=lambda c: (float(((np.asarray(c[1]) - qv) ** 2).sum()), c[0]),
    )
    probe_ids = [cid for cid, _ in order[:IVF_NPROBE]]
    probed = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("_cid", assign_to_centroids("embedding", centroids))
        .filter(F.col("_cid").isin(probe_ids))
    )
    codes = pq_codes(probed, "embedding", books, dim=64)
    return (
        codes.select(
            "vec_id", F.round(pq_adc_score(books, query), 4).alias("adc_dist")
        )
        .orderBy("adc_dist", "vec_id")
        .limit(10)
    )


# oracle: the IVF Lloyd prelude (e, c0..c2) + the PQ preludes (e{m},
# c2_{m}, codes_{m}) share the one `e` CTE — strip the duplicate WITH
_PQ_TAIL = _pq_prelude().split(
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)", 1
)[1]

ANN_IVFPQ_TOPK_SQL = f"""
{_KMEANS_PRELUDE}{_PQ_TAIL},
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
probes AS (
  SELECT cid FROM c2, q ORDER BY list_distance(qv, c), cid LIMIT {IVF_NPROBE}
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c2.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.v, c2.c), c2.cid
           ) AS rn
    FROM e, c2
  ) WHERE rn = 1
),
{",".join(
    f'''q{m} AS (SELECT v[{m * PQ_SUBD + 1}:{(m + 1) * PQ_SUBD}] AS qv
            FROM e WHERE vec_id = 0),
dtab{m} AS (
  SELECT cid, list_sum(list_transform(generate_series(1, {PQ_SUBD}),
                       i -> (qv[i] - c[i]) * (qv[i] - c[i]))) AS d
  FROM c2_{m}, q{m}
)''' for m in range(PQ_M)
)}
SELECT co.vec_id,
       round({" + ".join(f"d{m}.d" for m in range(PQ_M))}, 4) AS adc_dist
FROM (SELECT * FROM {_PQ_CODES_JOIN}) co
JOIN assign a ON a.vec_id = co.vec_id
{" ".join(f"JOIN dtab{m} d{m} ON d{m}.cid = co.code_{m}" for m in range(PQ_M))}
WHERE co.vec_id <> 0 AND a.cid IN (SELECT cid FROM probes)
ORDER BY adc_dist, co.vec_id
LIMIT 10
"""

QUERIES["ann_ivfpq_topk"] = (ann_ivfpq_topk, ANN_IVFPQ_TOPK_SQL)


def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the cosine between the
    MEAN VECTOR of the first snapshot half (vec_id < median split) and the
    second — the cheap "did my encoder / corpus shift" check run before
    re-training ANN indexes. The 100 TB shape is a pure algebraic
    aggregate: posexplode each vector once, ONE (label, half, dim)
    hash-aggregate builds both centroids component-wise (d·|labels| rows —
    never a vector collect), then the cosine folds over the d component
    rows per label. No pairwise stage exists; cost is one pass + one
    dimension-sized aggregate, so it scales with corpus size, not
    corpus². The oracle replays the split, the component means, and the
    dot/norm fold with DuckDB list functions."""
    e = load(spark, sf_dir, "embeddings")
    half = F.when(F.col("vec_id") < 250, F.lit("a")).otherwise(F.lit("b"))
    comp = e.select(
        "label",
        half.alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    cent = comp.groupBy("label", "half", "dim").agg(F.avg("x").alias("m"))
    a = cent.filter(F.col("half") == "a").select(
        "label", "dim", F.col("m").alias("ma")
    )
    b = cent.filter(F.col("half") == "b").select(
        "label", "dim", F.col("m").alias("mb")
    )
    counts = e.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") < 250, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("vec_id") >= 250, 1).otherwise(0)).alias("n_b"),
    )
    dot = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("_dot"),
            F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("_na"),
            F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("_nb"),
        )
    )
    return (
        dot.join(broadcast(counts), "label")
        .select(
            "label",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.col("_dot") / (F.col("_na") * F.col("_nb")), 6
            ).alias("centroid_cosine"),
        )
    )


EMBEDDING_CENTROID_SHIFT_SQL = """
WITH comp AS (
  SELECT label,
         CASE WHEN vec_id < 250 THEN 'a' ELSE 'b' END AS half,
         t.dim - 1 AS dim, CAST(embedding[t.dim] AS DOUBLE) AS x
  FROM embeddings,
       LATERAL unnest(generate_series(1, len(embedding))) AS t(dim)
), cent AS (
  SELECT label, half, dim, avg(x) AS m FROM comp GROUP BY 1, 2, 3
), ab AS (
  SELECT a.label, sum(a.m * b.m) AS dot,
         sqrt(sum(a.m * a.m)) AS na, sqrt(sum(b.m * b.m)) AS nb
  FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
  WHERE a.half = 'a' AND b.half = 'b'
  GROUP BY 1
), counts AS (
  SELECT label,
         CAST(sum(CASE WHEN vec_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN vec_id >= 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM embeddings GROUP BY 1
)
SELECT ab.label, n_a, n_b, round(dot / (na * nb), 6) AS centroid_cosine
FROM ab JOIN counts ON ab.label = counts.label
"""

QUERIES["embedding_centroid_shift"] = (
    embedding_centroid_shift,
    EMBEDDING_CENTROID_SHIFT_SQL,
)


HARD_NEG_K = 3
HARD_NEG_ANCHORS = 8


def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-negative mining — the contrastive-training companion to the
    random `embedding_negative_samples`: for each anchor (vec_id <
    8, the batched-ANN anchor convention), the k=3 most-similar vectors
    carrying a DIFFERENT label — near-misses that teach a metric model
    the boundary randoms never probe. Plan: the anchor set broadcasts
    (anchors × corpus, never corpus²; the batched-ANN precedent), cosine
    runs as the zip_with dot product on normalized arrays, the label
    inequality prunes before ranking, one per-anchor window takes the
    top-k (rounded score + id tie-break so float last-ulp cannot flip
    ranks). The oracle replays the full scan with DuckDB's
    list_cosine_similarity."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < HARD_NEG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").cast("array<double>").alias("a_emb"),
    )
    cand = e.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").cast("array<double>").alias("n_emb"),
    )
    scored = (
        cand.join(F.broadcast(anchors), F.col("neg_label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            "neg_id",
            "neg_label",
            F.round(cosine_sim(F.col("a_emb"), F.col("n_emb")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARD_NEG_K)
        .select("anchor_id", "anchor_label", "neg_id", "neg_label", "cos_sim", "rank")
    )


EMBEDDING_HARD_NEG_SQL = f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label,
         embedding::DOUBLE[] AS a_emb
  FROM embeddings WHERE vec_id < {HARD_NEG_ANCHORS}
), scored AS (
  SELECT anchor_id, anchor_label, e.vec_id AS neg_id, e.label AS neg_label,
         round(list_cosine_similarity(e.embedding::DOUBLE[], a_emb), 4)
           AS cos_sim
  FROM embeddings e JOIN anchors ON e.label <> anchor_label
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY anchor_id ORDER BY cos_sim DESC, neg_id) AS rank
  FROM scored
)
SELECT anchor_id, anchor_label, neg_id, neg_label, cos_sim, rank
FROM ranked WHERE rank <= {HARD_NEG_K}
"""

QUERIES["embedding_hard_negatives"] = (
    embedding_hard_negatives,
    EMBEDDING_HARD_NEG_SQL,
)
