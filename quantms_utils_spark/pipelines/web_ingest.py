"""Crawl → training-corpus ingestion: the end-to-end composition a web
pretraining pipeline runs, built from this repo's operators —

    WARC records (sources.warc.read_warc, one crawl file per task)
    → keep 200-OK HTML responses
    → visible-text extraction (operators.web.html_text)
    → canonical URL (operators.web.normalize_url) + URL-level dedup
    → language id / quality metrics / content fingerprint (operators.text)

The output frame has the same (doc_id, text, source, …) shape as the
synthetic `documents` table, so it feeds straight into
``pipelines.curation.curate_corpus`` — crawl in, curated train set out.

Scale notes: every stage after the parse is map-only except the two
keyed reductions (URL dedup, fingerprint dedup), both map-side-combinable
min_by keeper aggregates on a hash/URL key. The parse parallelizes by crawl file
(Common Crawl ships ~1 GB files; 100 TB ≈ 10⁵ files ≈ 10⁵ tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.text import (
    content_fingerprint,
    lang_id,
    quality_metrics,
)
from quantms_utils_spark.operators.web import html_text, normalize_url
from quantms_utils_spark.sources.warc import read_warc

__all__ = ["web_corpus", "start_continuous_crawl"]


def web_corpus(
    spark: SparkSession,
    path_glob: str,
    min_chars: int = 1,
) -> DataFrame:
    """Parse crawl files into a curation-ready corpus frame:
    (doc_id, url, source, text, lang, n_chars, fp, quality booleans),
    URL- and content-deduplicated (min record keeper, deterministic).
    """
    recs = read_warc(spark, path_glob)
    pages = _page_transform(recs, min_chars)

    # Both keeper reductions are min_by(struct, doc_id) AGGREGATES, not
    # keyed windows (round 10 review, same fix as curate_corpus stage 2):
    # a page crawled millions of times — one canonical URL, or identical
    # boilerplate content under many URLs, both NORMAL in crawls — would
    # funnel O(copies) rows through a single WindowExec task's buffer; the
    # aggregate combines map-side with one struct of state per group.
    def _min_id_keeper(df: DataFrame, key: str) -> DataFrame:
        return (
            df.groupBy(key)
            .agg(F.min_by(F.struct(*df.columns), F.col("doc_id")).alias("_r"))
            .select("_r.*")
        )

    # URL-level dedup: the same canonical page crawled twice keeps one copy
    by_url = _min_id_keeper(pages, "url")
    # content-level exact dedup across different URLs
    deduped = _min_id_keeper(
        by_url.withColumn("fp", content_fingerprint(F.col("text"))), "fp"
    )
    qm = quality_metrics(F.col("text"))
    return deduped.select(
        "doc_id",
        "url",
        F.call_function("parse_url", F.col("url"), F.lit("HOST")).alias(
            "source"
        ),
        "text",
        lang_id(F.col("text")).alias("lang"),
        F.length("text").alias("n_chars"),
        "fp",
        qm["keep"].alias("quality_keep"),
    )


def _page_transform(recs: DataFrame, min_chars: int) -> DataFrame:
    """200-OK HTML responses → (doc_id, url, text) page rows (map-only)."""
    return (
        recs.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            # header values are case-insensitive in the wild ('TEXT/HTML',
            # 'Text/Html; charset=...') — a case-sensitive prefix silently
            # dropped those pages (round 10 review)
            & F.lower(F.col("http_content_type")).startswith("text/html")
        )
        .select(
            F.col("record_id").alias("doc_id"),
            normalize_url(F.col("target_uri")).alias("url"),
            html_text(F.col("body").cast("string")).alias("text"),
        )
        .where(F.length(F.trim(F.col("text"))) >= min_chars)
    )


def start_continuous_crawl(
    spark: SparkSession,
    landing_dir: str,
    *,
    corpus_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_chars: int = 1,
):
    """Continuous crawl ingestion: WARC files landing in ``landing_dir``
    stream through the parse + extraction transform and into the standing
    fingerprint corpus (streaming.curation.classify_and_grow) — every
    landed dump's pages are classified new / exact_dup / batch_dup against
    EVERYTHING ingested before it, and the corpus grows per epoch with the
    replay-idempotent contract. availableNow drain; returns the
    StreamingQuery."""
    from quantms_utils_spark.sources.warc import read_warc_stream
    from quantms_utils_spark.streaming.curation import classify_and_grow

    recs = read_warc_stream(spark, landing_dir)

    def _batch(batch_df: DataFrame, epoch_id: int) -> None:
        classify_and_grow(
            _page_transform(batch_df, min_chars),
            epoch_id,
            corpus_dir=corpus_dir,
            out_dir=out_dir,
            id_col="doc_id",
            text_col="text",
        )

    return (
        recs.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
