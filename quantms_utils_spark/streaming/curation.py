"""Continuous corpus curation: a foreachBatch ingest loop that classifies
arriving documents against the standing fingerprint corpus AND grows that
corpus with each micro-batch — the stateful-across-batches half that
``stream_classify_against_corpus`` (stateless stream-static join) leaves to
the batch layer.

Design for scale / exactly-once:

- The standing state is a plain parquet directory of (fp, match_id)
  fingerprint aggregates, re-read per micro-batch (Spark re-plans the static
  side of a stream-static join every batch, so growth is visible to the next
  batch without restarting the query).
- Every write inside the callback goes to an ``epoch=N`` subdirectory in
  ``overwrite`` mode, and the standing-corpus read for epoch N only loads
  epochs **strictly below N**: foreachBatch is at-least-once on
  failure/retry, and a replayed epoch must see exactly the pre-epoch state —
  otherwise the epoch's own (already-written) fingerprints would classify
  every document in the replay as a duplicate of itself and the epoch's
  corpus shard would be overwritten empty. Epoch-scoped reads + per-epoch
  overwrite make the replay a true no-op (the poor man's transactional
  sink — a table format with commits would subsume this).
- Corpus discovery goes through the Hadoop FileSystem API, not driver-local
  ``os`` calls, so an object-store / HDFS ``corpus_dir`` behaves the same as
  a local one.
- Document ids keep their native column type end to end (the min-id keeper
  and all joins work on strings and uuids as well as longs); nothing is
  silently cast.
- Within a batch, documents deduplicate against the batch itself first
  (min-id per fingerprint) and then against the standing corpus, so two
  copies landing together classify one as the keeper and one as the dup.
- The per-epoch ``localCheckpoint(eager=True)`` calls (signature and
  classified frames; the streaming/diff.py precedent) trade fault
  tolerance for single computation: the truncated lineage lives in
  non-replicated executor block storage, so losing an executor mid-epoch
  fails that micro-batch unrecoverably instead of recomputing it
  (ADVICE r12). That is the right trade here — foreachBatch retries the
  failed epoch from the source, and the epoch-scoped overwrite protocol
  above makes the replay exact — but it does mean recovery is
  batch-granular, never task-granular, on the epoch state-write path.
- Nothing is collected to the driver; every step is a join or aggregation
  on the (tiny) fingerprint frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.layout import _glob_escape

__all__ = ["classify_and_grow", "start_continuous_ingest"]


def _norm_fp(text_col: str):
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )


def _list_epoch_dirs(
    spark: SparkSession, corpus_dir: str, before_epoch: int
) -> list[str]:
    """Epoch subdirectories of ``corpus_dir`` with epoch number strictly
    below ``before_epoch``, via the Hadoop FileSystem API (works for local,
    HDFS, and object-store paths alike)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(corpus_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        name = status.getPath().getName()
        if not name.startswith("epoch="):
            continue
        try:
            n = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if n < before_epoch:
            out.append(status.getPath().toString())
    return out


def _read_standing(
    spark: SparkSession, corpus_dir: str, before_epoch: int, fp_schema: str
) -> DataFrame:
    dirs = _list_epoch_dirs(spark, corpus_dir, before_epoch)
    if not dirs:
        return spark.createDataFrame([], fp_schema)
    # literal listed paths: escape glob metachars (see operators.layout._glob_escape)
    return spark.read.schema(fp_schema).parquet(
        *[_glob_escape(d) for d in dirs]
    )


def classify_and_grow(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    corpus_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """foreachBatch callback: classify ``batch_df`` against the standing
    fingerprint corpus (epochs < ``epoch_id`` only, so a retried epoch is
    idempotent), append the keepers' fingerprints to it, and write
    per-document classifications."""
    spark = batch_df.sparkSession
    id_type = batch_df.schema[id_col].dataType.simpleString()
    fp_schema = f"fp string, match_id {id_type}"
    standing = _read_standing(spark, corpus_dir, int(epoch_id), fp_schema)

    fps = batch_df.select(
        F.col(id_col).alias("bid"), _norm_fp(text_col).alias("fp")
    )
    # in-batch keeper per fingerprint (min id), then standing-corpus lookup.
    # LEFT join (round 9): a NULL fingerprint (NULL text) never
    # equi-matches, and the previous inner join silently DROPPED such
    # docs from the epoch output; with the left join they classify 'new'
    # with no match, exactly as the batch twin incremental_dedup's left
    # join does.
    keepers = fps.groupBy("fp").agg(F.min("bid").alias("keeper_id"))
    classified = (
        fps.join(keepers, "fp", "left")
        .join(F.broadcast(standing), "fp", "left")
        .select(
            F.col("bid").alias(id_col),
            F.when(F.col("match_id").isNotNull(), F.lit("exact_dup"))
            .when(F.col("bid") != F.col("keeper_id"), F.lit("batch_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.coalesce(
                F.col("match_id"),
                F.when(F.col("bid") != F.col("keeper_id"), F.col("keeper_id")),
            ).alias("match_id"),
        )
    )
    classified.write.mode("overwrite").parquet(
        f"{out_dir}/epoch={int(epoch_id)}"
    )
    # grow the standing corpus with genuinely-new fingerprints only; a
    # NULL fingerprint is excluded — it can never match anything later,
    # so storing it would only accrete junk rows in the corpus
    new_fps = (
        keepers.filter(F.col("fp").isNotNull())
        .join(standing.select("fp"), "fp", "left_anti")
        .select("fp", F.col("keeper_id").alias("match_id"))
    )
    new_fps.write.mode("overwrite").parquet(
        f"{corpus_dir}/epoch={int(epoch_id)}"
    )


def start_continuous_ingest(
    incoming: DataFrame,
    *,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire a streaming document frame into the classify-and-grow loop with
    availableNow semantics (drain everything landed, then stop) — the shape
    of a scheduled incremental ingest run. Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        classify_and_grow(
            batch_df,
            epoch_id,
            corpus_dir=corpus_dir,
            out_dir=out_dir,
            id_col=id_col,
            text_col=text_col,
        )

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def classify_and_grow_near(
    batch_df: DataFrame,
    epoch_id: int,
    *,
    corpus_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> None:
    """Near-dup-aware classify-and-grow: the continuous form of
    ``operators.dedup.incremental_dedup``. The standing state gains two
    families next to the fingerprints — per-keeper MinHash SIGNATURES
    (``corpus_dir/sigs``) and TEXTS (``corpus_dir/texts``) — written
    once per epoch, so each micro-batch LSH-joins its shard against
    standing bands without the corpus ever paying a self-join (the
    "materialized banded signatures at write time" design the batch
    operator's docstring promises, actually landed). Status precedence:
    exact_dup > batch_dup > near_dup > new; only genuinely-new keepers
    grow the state. Same epoch-scoped idempotence as
    ``classify_and_grow`` (a replayed epoch re-reads only epochs < N and
    overwrites its own shard). In-batch NEAR dups are out of scope by
    design — the shard's own batch dedup owns those; this loop guards
    the shard-vs-corpus boundary."""
    from quantms_utils_spark.operators.dedup import (
        jaccard_for_pairs,
        lsh_cross_pairs,
        minhash_signatures,
    )

    spark = batch_df.sparkSession
    id_type = batch_df.schema[id_col].dataType.simpleString()
    fp_schema = f"fp string, match_id {id_type}"
    sig_schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"sig_{i} long" for i in range(n_hashes)]
    )
    text_schema = f"{id_col} {id_type}, {text_col} string"
    epoch = int(epoch_id)
    standing_fp = _read_standing(spark, f"{corpus_dir}/fps", epoch, fp_schema)
    standing_sig = _read_standing(spark, f"{corpus_dir}/sigs", epoch, sig_schema)
    standing_txt = _read_standing(spark, f"{corpus_dir}/texts", epoch, text_schema)

    fps = batch_df.select(
        F.col(id_col).alias("bid"), _norm_fp(text_col).alias("fp")
    )
    # LEFT join for the same NULL-fingerprint reason as classify_and_grow:
    # NULL-text docs must classify 'new', never silently drop
    keepers = fps.groupBy("fp").agg(F.min("bid").alias("keeper_id"))
    base = (
        fps.join(keepers, "fp", "left")
        .join(F.broadcast(standing_fp), "fp", "left")
        .select(
            "bid",
            "fp",
            "keeper_id",
            F.col("match_id").alias("exact_match"),
        )
    )

    # near-dup check only for batch keepers with no exact match
    pending_ids = base.filter(
        F.col("exact_match").isNull() & (F.col("bid") == F.col("keeper_id"))
    ).select(F.col("bid").alias(id_col))
    pending_docs = batch_df.join(pending_ids, id_col, "left_semi")
    # localCheckpoint (round 12, same pattern as streaming/diff.py): the
    # signature frame feeds the LSH candidate join AND the end-of-epoch
    # state write — without the checkpoint each consumer re-runs the
    # shingle→minhash subtree (and the standing-fp classification under
    # it). Blocks release with the frame at callback exit.
    sigs = minhash_signatures(
        pending_docs, id_col, text_col, n_hashes=n_hashes, shingle_n=shingle_n
    ).localCheckpoint(eager=True)
    cand = lsh_cross_pairs(
        sigs, standing_sig, id_col, n_hashes=n_hashes, band_size=band_size
    )
    union_txt = standing_txt.unionByName(
        batch_df.select(id_col, text_col)
    )
    ver = jaccard_for_pairs(
        union_txt,
        cand.select(
            F.col("new_id").alias("doc_a"), F.col("corpus_id").alias("doc_b")
        ),
        id_col,
        text_col,
        n=shingle_n,
        threshold=threshold,
    )
    best = (
        ver.groupBy("doc_a")
        .agg(
            F.min(
                F.struct(
                    (-F.col("jaccard")).alias("nj"),
                    F.col("doc_b").alias("mid"),
                )
            ).alias("b")
        )
        .select(
            F.col("doc_a").alias("bid"),
            F.col("b.mid").alias("near_match"),
            (-F.col("b.nj")).alias("near_jaccard"),
        )
    )

    classified = (
        base.join(best, "bid", "left")
        .select(
            F.col("bid").alias(id_col),
            F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("bid") != F.col("keeper_id"), F.lit("batch_dup"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.coalesce(
                F.col("exact_match"),
                F.when(F.col("bid") != F.col("keeper_id"), F.col("keeper_id")),
                F.col("near_match"),
            ).alias("match_id"),
            F.when(
                F.col("exact_match").isNull()
                & (F.col("bid") == F.col("keeper_id")),
                F.col("near_jaccard"),
            ).alias("jaccard"),
        )
        # one computation feeds the epoch output AND the three new-keeper
        # state derivations below (round 12; streaming/diff.py precedent) —
        # otherwise each write re-executes the LSH + verify subtree
        .localCheckpoint(eager=True)
    )
    classified.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch}")

    new_ids = classified.filter(F.col("status") == "new").select(
        F.col(id_col)
    )
    # NULL-text 'new' docs stay OUT of the corpus: no fingerprint, no
    # shingles — they can never match a later doc, only accrete junk
    new_docs = batch_df.join(new_ids, id_col, "left_semi").filter(
        _norm_fp(text_col).isNotNull()
    )
    new_docs.select(
        _norm_fp(text_col).alias("fp"), F.col(id_col).alias("match_id")
    ).write.mode("overwrite").parquet(f"{corpus_dir}/fps/epoch={epoch}")
    sigs.join(new_ids, id_col, "left_semi").write.mode("overwrite").parquet(
        f"{corpus_dir}/sigs/epoch={epoch}"
    )
    new_docs.select(id_col, text_col).write.mode("overwrite").parquet(
        f"{corpus_dir}/texts/epoch={epoch}"
    )


def start_continuous_near_ingest(
    incoming: DataFrame,
    *,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """availableNow drain through ``classify_and_grow_near`` — the
    scheduled incremental near-dup ingest run. Returns the StreamingQuery."""

    def _batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        classify_and_grow_near(
            batch_df,
            epoch_id,
            corpus_dir=corpus_dir,
            out_dir=out_dir,
            id_col=id_col,
            text_col=text_col,
            threshold=threshold,
        )

    return (
        incoming.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


__all__ += ["classify_and_grow_near", "start_continuous_near_ingest"]
