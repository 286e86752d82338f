"""Continuous ANN index maintenance: ingest-time cluster assignment.

The batch IVF path (`operators/similarity.py:ivf_search`) documents the
100 TB contract: the coarse-quantizer assignment is a STORED partition key
computed once at ingest, so a probe is partition pruning at scan time, not
a full-corpus argmin. This module is that ingest side as a Structured
Streaming sink — new embeddings stream in, the (frozen) centroid set is
folded into a map-only codegen'd assignment expression, and the index
directory grows hive-partitioned by cluster id. No state store is needed:
the assignment is stateless per row, exactly-once comes from the file
sink's commit log, and the centroid set only changes on an explicit
retrain (a new index generation directory, never in-place).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.similarity import assign_to_centroids

EMBEDDING_STREAM_SCHEMA = (
    "vec_id long, embedding array<double>, label string"
)


def read_embedding_stream(spark: SparkSession, src: str) -> DataFrame:
    """File-source stream of embedding rows (one JSON file per arriving
    shard — the object-store landing pattern)."""
    return spark.readStream.schema(EMBEDDING_STREAM_SCHEMA).json(src)


def assign_stream(
    stream: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-assign a (streaming or batch) embedding frame: map-only,
    whole-stage-codegen argmin over the broadcast-as-literals centroid
    set — identical expression, and therefore identical assignments, on
    both engines' sides of the batch-parity test."""
    return stream.select(
        F.col(id_col),
        F.col(vec_col),
        assign_to_centroids(vec_col, centroids).alias("cid"),
    )


def start_continuous_index(
    stream: DataFrame,
    centroids: list[tuple[int, list[float]]],
    index_path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Grow a cluster-partitioned parquet index from an embedding stream.

    ``partitionBy("cid")`` makes every future probe of ``nprobe`` clusters
    a directory-pruned scan (`cid=K/` paths) — the probe never lists, let
    alone reads, the other clusters' files. Exactly-once per input file is
    the file sink's commit-log guarantee; availableNow drains make the
    grow-on-arrival loop replay-idempotent across restarts.
    """
    assigned = assign_stream(stream, centroids, id_col, vec_col)
    return (
        assigned.writeStream.format("parquet")
        .option("path", index_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("cid")
        .trigger(availableNow=True)
        .start()
    )
