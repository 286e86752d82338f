"""Sketch-backed corpus queries (Bloom decontamination, Count-Min heavy
hitters) plus capacity-planning scans (token-length histogram, compaction
plan) over the `documents` table.

The sketch queries follow the tolerance-oracle pattern established by
``approx_event_stats``: the hash-function-specific sketch internals never
appear in the compared output — instead the sketch's mathematical CONTRACT
(no false negatives / estimate ≥ exact within a bound) is emitted as boolean
columns that the DuckDB oracle asserts as constant TRUE, next to the exact
values both engines must reproduce verbatim.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from quantms_utils_spark.tables import load

# ---------------------------------------------------------------------------
# Bloom-filter decontamination

BLOOM_NGRAM_N = 5
BLOOM_HASHES = 3
BLOOM_BITS = 1 << 20


def bloom_decontaminate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate decontamination: the train/benchmark split and exact
    n-gram overlap of ``text_decontaminate``, plus a broadcast Bloom-filter
    probe of the same grams (operators.sketches.bloom_decontaminate). The
    compared columns are the exact results and the filter's one-sided
    guarantees (no false negatives; bloom count covers the exact count) —
    at 100 TB the exact branch is dropped and only the map-only Bloom probe
    runs against the corpus."""
    from quantms_utils_spark.operators.sketches import bloom_decontaminate

    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
    pct = F.pmod(h.cast("long"), F.lit(100))
    train = d.where(pct < 80)
    bench = d.where(pct >= 90)
    return bloom_decontaminate(
        train,
        bench,
        "doc_id",
        "text",
        ngram_n=BLOOM_NGRAM_N,
        n_hashes=BLOOM_HASHES,
        n_bits=BLOOM_BITS,
    )


BLOOM_DECONTAMINATE_SQL = r"""
WITH d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 AS pct
  FROM documents
), tg AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 4), ' ') AS g
  FROM (SELECT doc_id, str_split(s, ' ') AS toks FROM d
        WHERE pct < 80 AND length(s) > 0),
       UNNEST(generate_series(1, len(toks) - 4)) AS t(i)
), bg AS (
  SELECT DISTINCT array_to_string(list_slice(toks, i, i + 4), ' ') AS g
  FROM (SELECT str_split(s, ' ') AS toks FROM d
        WHERE pct >= 90 AND length(s) > 0),
       UNNEST(generate_series(1, len(toks) - 4)) AS t(i)
), ov AS (
  SELECT doc_id, count(*) AS n_overlap FROM tg JOIN bg USING (g) GROUP BY 1
)
SELECT d.doc_id, CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(ov.n_overlap, 0) > 0 AS contaminated,
       TRUE AS bloom_no_false_negative,
       TRUE AS bloom_covers_exact
FROM d LEFT JOIN ov USING (doc_id)
WHERE d.pct < 80
"""


# ---------------------------------------------------------------------------
# Count-Min heavy hitters

CMS_DEPTH = 3
CMS_WIDTH = 1024
CMS_TOPK = 20


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters with a Count-Min certificate: exact top-20 token
    frequencies (the verifiable anchor) joined against the CMS estimates
    (operators.sketches.cms_build / cms_estimate — one map-side-combinable
    aggregate into depth×width cells, broadcast to the probes). Emitted
    booleans pin the CMS contract: estimate ≥ exact always, and the
    overestimate stays within e/width · N (the standard bound; at width
    1024 that is ≈0.27 % of the token stream). At 100 TB the exact
    aggregate is what you drop — the sketch is the fixed-size summary that
    survives streaming/sharded merges."""
    from quantms_utils_spark.operators.sketches import cms_build, cms_estimate
    from quantms_utils_spark.operators.text import normalized_tokens

    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(normalized_tokens(F.col("text"))).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = (
        exact.orderBy(F.col("exact_cnt").desc(), F.col("tok"))
        .limit(CMS_TOPK)
    )
    sketch = cms_build(toks, "tok", CMS_DEPTH, CMS_WIDTH)
    est = cms_estimate(
        sketch, top.select("tok"), "tok", CMS_DEPTH, CMS_WIDTH
    )
    stats = toks.agg(F.count(F.lit(1)).alias("n_total"))
    bound = F.lit(math.e) * F.col("n_total") / F.lit(CMS_WIDTH)
    return (
        top.join(est, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "tok",
            "exact_cnt",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("est_ge_exact"),
            ((F.col("cms_est") - F.col("exact_cnt")) <= bound).alias(
                "est_within_bound"
            ),
        )
    )


HEAVY_HITTERS_SQL = r"""
WITH d AS (
  SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
  FROM documents
), w AS (
  SELECT unnest(str_split(s, ' ')) AS tok FROM d WHERE length(s) > 0
)
SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt,
       TRUE AS est_ge_exact, TRUE AS est_within_bound
FROM w GROUP BY tok
ORDER BY count(*) DESC, tok
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Token-length histogram (sequence-length planning)

HIST_BUCKET_TOKENS = 32


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-token length histogram with cumulative coverage — the scan
    that picks a training max_seq_len (the smallest bucket whose cum_frac
    clears the target coverage). One aggregate over the corpus; the window
    runs over the AGGREGATED histogram (rows = bucket count, not corpus
    size), so the unpartitioned cumulative sum is bounded and cheap."""
    d = load(spark, sf_dir, "documents")
    from quantms_utils_spark.operators.text import ws_token_count

    tok = ws_token_count(F.col("text"))
    hist = (
        d.select(
            F.floor(tok / F.lit(HIST_BUCKET_TOKENS)).cast("int").alias("bucket"),
            tok.alias("t"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("sum_tokens"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return hist.select(
        "bucket",
        "n_docs",
        "sum_tokens",
        F.sum("n_docs").over(w_cum).alias("cum_docs"),
        F.round(
            F.sum("n_docs").over(w_cum)
            / F.sum("n_docs").over(w_all).cast("double"),
            4,
        ).alias("cum_frac"),
    )


LENGTH_HISTOGRAM_SQL = r"""
WITH d AS (
  SELECT len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS t
  FROM documents
), h AS (
  SELECT CAST(floor(t / 32) AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(t) AS BIGINT) AS sum_tokens
  FROM d GROUP BY 1
)
SELECT bucket, n_docs, sum_tokens,
       CAST(sum(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs,
       round(sum(n_docs) OVER (ORDER BY bucket)
             / (sum(n_docs) OVER ())::DOUBLE, 4) AS cum_frac
FROM h
"""


# ---------------------------------------------------------------------------
# Compaction plan (small-files maintenance)

COMPACTION_TARGET_BYTES = 1 << 16


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compaction plan — the OPTIMIZE-style maintenance scan that
    turns byte totals into target file counts (65,536-byte target here so
    the toy corpus plans multiple files; a production lakehouse uses
    128 MB–1 GB). One aggregate on the partition column; at 100 TB this is
    the query a table-maintenance service runs before rewriting each
    partition to ceil(bytes/target) evenly sized files."""
    d = load(spark, sf_dir, "documents")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.octet_length(F.col("text"))).alias("total_bytes"),
    )
    n_files = F.greatest(
        F.lit(1),
        F.ceil(F.col("total_bytes") / F.lit(COMPACTION_TARGET_BYTES)),
    ).cast("int")
    return agg.select(
        "source",
        "n_docs",
        "total_bytes",
        n_files.alias("n_files"),
        F.ceil(F.col("n_docs") / n_files.cast("double"))
        .cast("long")
        .alias("rows_per_file"),
        F.round(
            F.col("total_bytes") / F.col("n_docs").cast("double"), 2
        ).alias("avg_doc_bytes"),
    )


COMPACTION_PLAN_SQL = r"""
WITH a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
  FROM documents GROUP BY source
), p AS (
  SELECT *, CAST(greatest(1, ceil(total_bytes / 65536.0)) AS INT) AS n_files
  FROM a
)
SELECT source, n_docs, total_bytes, n_files,
       CAST(ceil(n_docs / n_files::DOUBLE) AS BIGINT) AS rows_per_file,
       round(total_bytes / n_docs::DOUBLE, 2) AS avg_doc_bytes
FROM p
"""


QUERIES = {
    "text_bloom_decontaminate": (
        bloom_decontaminate_split,
        BLOOM_DECONTAMINATE_SQL,
    ),
    "text_heavy_hitters_cms": (heavy_hitters_cms, HEAVY_HITTERS_SQL),
    "text_length_histogram": (length_histogram, LENGTH_HISTOGRAM_SQL),
    "layout_compaction_plan": (compaction_plan, COMPACTION_PLAN_SQL),
}
