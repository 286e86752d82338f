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
keyed reductions (URL dedup, fingerprint dedup), both min-id keeper
windows on a hash/URL key. The parse parallelizes by crawl file
(Common Crawl ships ~1 GB files; 100 TB ≈ 10⁵ files ≈ 10⁵ tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from quantms_utils_spark.operators.text import (
    content_fingerprint,
    lang_id,
    quality_metrics,
)
from quantms_utils_spark.operators.web import html_text, normalize_url
from quantms_utils_spark.sources.warc import read_warc

__all__ = ["web_corpus"]


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
    pages = (
        recs.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        )
        .select(
            F.col("record_id").alias("doc_id"),
            normalize_url(F.col("target_uri")).alias("url"),
            html_text(F.col("body").cast("string")).alias("text"),
        )
        .where(F.length(F.trim(F.col("text"))) >= min_chars)
    )
    # URL-level dedup: the same canonical page crawled twice keeps one copy
    w_url = Window.partitionBy("url")
    by_url = (
        pages.withColumn("keep_id", F.min("doc_id").over(w_url))
        .where(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )
    # content-level exact dedup across different URLs
    w_fp = Window.partitionBy("fp")
    deduped = (
        by_url.withColumn("fp", content_fingerprint(F.col("text")))
        .withColumn("keep_id", F.min("doc_id").over(w_fp))
        .where(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
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
