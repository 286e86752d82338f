"""Text-analysis + multimodal-metadata queries over the `documents` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from quantms_utils_spark.operators.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    content_fingerprint,
    lang_id,
    marker_score,
    quality_metrics,
    ws_token_count,
)
from quantms_utils_spark.tables import load


def lang_id_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID per document + per-language marker scores."""
    d = load(spark, sf_dir, "documents")
    text = F.col("text")
    cols = [F.col("doc_id"), lang_id(text).alias("predicted_lang")]
    for lang, pat in LANG_MARKERS.items():
        cols.append(marker_score(text, pat).alias(f"s_{lang}"))
    return d.select(*cols)


def _score_sql(lang: str) -> str:
    return (
        f"CAST(len(regexp_extract_all(lower(text), '{LANG_MARKERS[lang]}')) AS BIGINT)"
    )


_LANGS = list(LANG_MARKERS)


def _winner_cond(lang: str) -> str:
    i = _LANGS.index(lang)
    conds = [f"s_{lang} > 0"]
    for other in _LANGS:
        if other == lang:
            continue
        op = ">" if _LANGS.index(other) < i else ">="
        conds.append(f"s_{lang} {op} s_{other}")
    return " AND ".join(conds)


LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id, text,
    {", ".join(f"{_score_sql(lang)} AS s_{lang}" for lang in _LANGS)}
  FROM documents
)
SELECT doc_id,
  CASE {" ".join(f"WHEN {_winner_cond(lang)} THEN '{lang}'" for lang in _LANGS)}
       ELSE 'und' END AS predicted_lang,
  {", ".join(f"s_{lang}" for lang in _LANGS)}
FROM s
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining quality heuristics per document."""
    d = load(spark, sf_dir, "documents")
    m = quality_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_chars"].alias("n_chars_m"),
        m["n_tokens"].alias("n_tokens"),
        m["mean_token_len"].alias("mean_token_len"),
        m["stop_ratio"].alias("stop_ratio"),
        m["punct_ratio"].alias("punct_ratio"),
        m["keep"].alias("keep"),
    )


QUALITY_SCORES_SQL = r"""
WITH m AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars,
    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_chars,
    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|to|in)\b')) AS BIGINT) AS stop_tokens
  FROM documents
)
SELECT doc_id, n_chars_m, n_tokens,
  round(CAST(alpha_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS mean_token_len,
  round(CAST(stop_tokens AS DOUBLE) / greatest(n_tokens, 1), 4) AS stop_ratio,
  round(CAST(punct_chars AS DOUBLE) / greatest(n_chars_m, 1), 4) AS punct_ratio,
  (n_tokens >= 5
   AND round(CAST(alpha_chars AS DOUBLE) / greatest(n_tokens, 1), 4) >= 2
   AND round(CAST(alpha_chars AS DOUBLE) / greatest(n_tokens, 1), 4) <= 12
   AND round(CAST(punct_chars AS DOUBLE) / greatest(n_chars_m, 1), 4) <= 0.2) AS keep
FROM m
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    d = load(spark, sf_dir, "documents")
    text = F.col("text")
    return d.select(
        "doc_id",
        ws_token_count(text).alias("ws_tokens"),
        bpe_ish_token_count(text).alias("bpe_tokens"),
    )


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens
FROM documents
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) per document."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", content_fingerprint(F.col("text")).alias("fp"))


FINGERPRINTS_SQL = r"""
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
FROM documents
"""


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary-column plumbing: payload bytes + typed metadata.

    Here the document text stands in for an image/audio payload: the engine
    treats it as bytes (encode → binary), records size + content digest, and
    carries typed metadata alongside — the schema shape used for real
    multimodal columns (decode kernels live in
    quantms_utils_spark.operators.multimodal and are stubbed per environment).
    """
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
        F.col("source").alias("media_source"),
    )


MULTIMODAL_METADATA_SQL = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, sha256(text) AS digest,
       source AS media_source
FROM documents
"""


def _media(spark: SparkSession, sf_dir: str):
    """documents.text as a stand-in binary payload with standard metadata."""
    from quantms_utils_spark.operators.multimodal import attach_payload_metadata

    d = load(spark, sf_dir, "documents")
    return attach_payload_metadata(
        d.withColumn("payload_src", F.encode(F.col("text"), "UTF-8")),
        payload_col="payload_src",
        id_col="doc_id",
        media_type="image/fake",
    )


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract over opaque payloads via Arrow-batched
    mapInPandas (operators.multimodal.extract_image_features). The stub
    decode is a pure function of the sha256 digest, so the oracle reproduces
    the WHOLE UDF pipeline — schema, batching, and values — in SQL."""
    from quantms_utils_spark.operators.multimodal import extract_image_features

    return extract_image_features(_media(spark, sf_dir), decode_stub=True)


MULTIMODAL_IMAGE_FEATURES_SQL = """
SELECT doc_id AS media_id,
       64 + (('0x' || substr(sha256(text), 1, 2))::INT % 192) AS width,
       64 + (('0x' || substr(sha256(text), 3, 2))::INT % 192) AS height,
       3 AS n_channels,
       round(('0x' || substr(sha256(text), 5, 2))::INT / 255.0, 4) AS mean_luma
FROM documents
"""


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction (rate / length / duration / RMS) over opaque
    payloads — same mapInPandas contract, digest-derived stub kernel."""
    from quantms_utils_spark.operators.multimodal import extract_audio_features

    return extract_audio_features(_media(spark, sf_dir), decode_stub=True)


MULTIMODAL_AUDIO_FEATURES_SQL = """
SELECT doc_id AS media_id,
       8000 * (1 + ('0x' || substr(sha256(text), 1, 2))::INT % 5) AS sample_rate,
       CAST(strlen(text) * 256 + ('0x' || substr(sha256(text), 3, 2))::INT AS BIGINT)
         AS n_samples,
       (strlen(text) * 256 + ('0x' || substr(sha256(text), 3, 2))::INT)
         / (8000 * (1 + ('0x' || substr(sha256(text), 1, 2))::INT % 5))
         AS duration_s,
       round(('0x' || substr(sha256(text), 5, 2))::INT / 255.0, 4) AS rms
FROM documents
"""


def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail/resize over opaque payloads (binary in → smaller binary +
    typed metadata out) via mapInPandas; the stub thumbnail is digest-derived
    ascii, so even the emitted BYTES are oracle-checked (via their digest)."""
    from quantms_utils_spark.operators.multimodal import resize_images

    resized = resize_images(_media(spark, sf_dir), 64, 64, decode_stub=True)
    return resized.select("media_id", "out_width", "out_height", "thumb_digest")


MULTIMODAL_IMAGE_RESIZE_SQL = """
SELECT doc_id AS media_id,
       64 AS out_width,
       64 AS out_height,
       sha256(sha256(text || ':64x64')) AS thumb_digest
FROM documents
"""


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one payload → N frame rows (UDTF-shaped fan-out in
    mapInPandas); frame count and per-frame digests are digest-derived, so the
    row-multiplying UDF is still fully oracle-checked."""
    from quantms_utils_spark.operators.multimodal import sample_video_frames

    return sample_video_frames(_media(spark, sf_dir), decode_stub=True)


MULTIMODAL_VIDEO_FRAMES_SQL = """
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       round(i * CAST(0.5 AS DOUBLE), 2) AS ts_s,
       sha256(text || ':' || CAST(i AS VARCHAR)) AS frame_digest
FROM documents,
     UNNEST(generate_series(0, ('0x' || substr(sha256(text), 7, 2))::INT % 4)) AS t(i)
"""


def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-stable
    hash of the document id — the split every training-data pipeline needs:
    reproducible across engines and runs (no RNG state), stable under
    re-partitioning, joinable back to any derived table. The bucket is
    md5-derived so the oracle reproduces it exactly."""
    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
    pct = F.pmod(h.cast("long"), F.lit(100))
    split = (
        F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test")
    )
    return d.select(
        "doc_id", split.alias("split"), pct.cast("int").alias("pct_bucket")
    )


TRAIN_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN pct < 80 THEN 'train' WHEN pct < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(pct AS INT) AS pct_bucket
FROM (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 AS pct
  FROM documents
)
"""


def winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) document fingerprints as (doc_id, fingerprint) rows:
    rolling k-gram hash, window-min selection, distinct minima — the
    position-robust fingerprint set (any shared substring ≥ k + w - 1 chars
    guarantees a shared fingerprint). Pure Catalyst, map-only: the per-doc
    array is already distinct (``array_distinct`` inside the operator), so
    exploding needs NO distinct shuffle. md5-derived hashes so the oracle
    recomputes every value."""
    from quantms_utils_spark.operators.text import winnow_fingerprints

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(winnow_fingerprints(F.col("text"))).alias("fingerprint"),
    )


# the (doc, position-window) → min-hash fingerprint derivation, shared by the
# fingerprint listing and the candidate-pair oracle
_WINNOW_FP_CTE = """
d AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS s
  FROM documents
), g AS (
  SELECT doc_id, i,
         ('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 8))::BIGINT AS h,
         len(s) AS n
  FROM d, UNNEST(generate_series(1, len(s) - 4)) AS t(i)
  WHERE len(s) >= 8
), fp AS (
  SELECT DISTINCT a.doc_id, min(b.h) AS fingerprint
  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.i BETWEEN a.i AND a.i + 3
  WHERE a.i <= a.n - 7
  GROUP BY a.doc_id, a.i
)
"""

WINNOW_FPS_SQL = f"""
WITH {_WINNOW_FP_CTE}
SELECT doc_id, fingerprint FROM fp
"""


def winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints (≥2 shared,
    document-frequency cap 50) — the positional complement to MinHash-LSH:
    catches contained/partial overlaps that whole-document Jaccard misses.
    One groupBy(fingerprint) shuffle + in-bucket pair explosion, never a
    fingerprint self-join."""
    from quantms_utils_spark.operators.dedup import winnow_candidate_pairs

    d = load(spark, sf_dir, "documents")
    return winnow_candidate_pairs(
        d, "doc_id", "text", min_shared=2, max_df=50, hash_family="md5"
    )


WINNOW_PAIRS_SQL = f"""
WITH {_WINNOW_FP_CTE},
keep AS (
  SELECT fingerprint FROM fp
  GROUP BY fingerprint HAVING count(*) BETWEEN 2 AND 50
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM fp a
JOIN keep k ON k.fingerprint = a.fingerprint
JOIN fp b ON b.fingerprint = a.fingerprint AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


def repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction, top-word
    fraction, duplicate word-2-gram fraction per document (operators.text.
    repetition_signals — two map-side-combinable aggregates, no self-join)."""
    from quantms_utils_spark.operators.text import repetition_signals

    d = load(spark, sf_dir, "documents")
    return repetition_signals(d, "doc_id", "text", ngram_n=2)


REPETITION_SQL = r"""
WITH d AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS s
  FROM documents
), w AS (
  SELECT doc_id, unnest(str_split(s, ' ')) AS w FROM d WHERE length(s) > 0
), wc AS (
  SELECT doc_id, w, count(*) AS cnt FROM w GROUP BY 1, 2
), ws AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words, max(cnt) AS top_word_cnt
  FROM wc GROUP BY 1
), g AS (
  SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS g
  FROM (SELECT doc_id, str_split(s, ' ') AS toks FROM d WHERE length(s) > 0),
       UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
), gc AS (
  SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2
), gs AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
         count(*) AS n_distinct_grams
  FROM gc GROUP BY 1
)
SELECT dd.doc_id, CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
  round((coalesce(n_words, 0) - coalesce(n_distinct_words, 0))::DOUBLE
        / greatest(coalesce(n_words, 0), 1), 4) AS dup_word_frac,
  round(coalesce(top_word_cnt, 0)::DOUBLE
        / greatest(coalesce(n_words, 0), 1), 4) AS top_word_frac,
  round((coalesce(n_grams, 0) - coalesce(n_distinct_grams, 0))::DOUBLE
        / greatest(coalesce(n_grams, 0), 1), 4) AS dup_ngram_frac
FROM documents dd LEFT JOIN ws ON ws.doc_id = dd.doc_id
LEFT JOIN gs ON gs.doc_id = dd.doc_id
"""


def decontaminate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag train-split documents sharing any word
    5-gram with a test-split ('benchmark') document. The split reuses the
    deterministic md5 bucket of text_train_split; the benchmark n-gram set is
    broadcast (operators.text.decontaminate), so the corpus side never
    shuffles except the final per-doc count."""
    from quantms_utils_spark.operators.text import decontaminate

    d = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
    pct = F.pmod(h.cast("long"), F.lit(100))
    train = d.where(pct < 80)
    bench = d.where(pct >= 90)
    return decontaminate(train, bench, "doc_id", "text", ngram_n=5)


DECONTAMINATE_SQL = r"""
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
       coalesce(ov.n_overlap, 0) > 0 AS contaminated
FROM d LEFT JOIN ov USING (doc_id)
WHERE d.pct < 80
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction. The synthetic corpus contains no PII, so a
    deterministic doc_id-derived contact line (email, phone, IPv4) is appended
    first — making every count non-trivial and the redacted output
    value-checkable (by md5 digest) in both engines. Counting and redaction
    are codegen'd regexp expressions (operators.text.pii_counts/pii_redact):
    a 100 TB scrub is a single map-only scan."""
    from quantms_utils_spark.operators.text import pii_counts, pii_redact

    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad(F.pmod(did, F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(did * 7, F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" from 10."),
        F.pmod(did, F.lit(256)).cast("string"),
        F.lit(".0.1"),
    )
    c = pii_counts(aug)
    return d.select(
        "doc_id",
        c["n_emails"].alias("n_emails"),
        c["n_phones"].alias("n_phones"),
        c["n_ipv4"].alias("n_ipv4"),
        F.md5(pii_redact(aug)).alias("redacted_md5"),
    )


PII_SCRUB_SQL = r"""
WITH a AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@example.com or call 555-'
         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
         || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS aug
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(aug,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(aug, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT)
    AS n_phones,
  CAST(len(regexp_extract_all(aug,
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
FROM a
"""


def mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture downsampling to a 500-token-per-source budget:
    per-source totals → broadcast keep-rates → deterministic md5-bucket keep
    decision (operators.text.mixture_sample). Map-only on the corpus side."""
    from quantms_utils_spark.operators.text import mixture_sample

    d = load(spark, sf_dir, "documents")
    return mixture_sample(d, "source", "doc_id", "text", tokens_per_group=500)


MIXTURE_SQL = r"""
WITH tok AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT)
      AS doc_tokens
  FROM documents
), tot AS (
  SELECT source, CAST(sum(doc_tokens) AS BIGINT) AS group_tokens
  FROM tok GROUP BY 1
), r AS (
  SELECT source, group_tokens,
         least(1.0, 500.0 / greatest(group_tokens, 1)) AS keep_rate
  FROM tot
)
SELECT t.doc_id, t.source, t.doc_tokens, r.group_tokens,
       round(r.keep_rate, 6) AS keep_rate
FROM tok t JOIN r USING (source)
WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 6))::BIGINT % 10000
      < r.keep_rate * 10000
"""


def pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contiguous sequence packing into 128-token training bins
    (operators.text.pack_sequences — one per-group window, never a global
    sort)."""
    from quantms_utils_spark.operators.text import pack_sequences

    d = load(spark, sf_dir, "documents")
    return pack_sequences(d, "source", "doc_id", "text", seq_len=128)


PACK_SQL = r"""
WITH tok AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT)
      AS doc_tokens
  FROM documents
), cum AS (
  SELECT doc_id, source, doc_tokens,
    CAST(coalesce(sum(doc_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
  FROM tok
)
SELECT doc_id, source, doc_tokens, "offset",
  "offset" // 128 AS bin,
  doc_tokens > 0 AND ("offset" // 128) <> (("offset" + doc_tokens - 1) // 128)
    AS spans_boundary
FROM cum
"""


def group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-per-source inspection sample
    (operators.text.hash_sample_per_group — md5 pseudo-order, no RNG)."""
    from quantms_utils_spark.operators.text import hash_sample_per_group

    d = load(spark, sf_dir, "documents")
    return hash_sample_per_group(d, "source", "doc_id", 3)


GROUP_SAMPLE_SQL = """
SELECT source, doc_id, CAST(sample_rank AS INT) AS sample_rank FROM (
  SELECT source, doc_id, row_number() OVER (
    PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
  ) AS sample_rank
  FROM documents
) WHERE sample_rank <= 3
"""




def chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking of every document (16-token windows, 4-token
    overlap): the RAG/long-context preparation step. Chunk text is emitted
    as an md5 digest so the value check covers the exact chunk bytes without
    hauling full text through the compare."""
    from quantms_utils_spark.operators.text import chunk_documents

    d = load(spark, sf_dir, "documents")
    c = chunk_documents(d, "doc_id", "text", chunk_tokens=16, overlap=4)
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        "start",
        "n_tokens",
        F.md5("chunk_text").alias("chunk_digest"),
    )


CHUNK_SLIDING_SQL = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS t
  FROM norm
), sized AS (
  SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
), counts AS (
  SELECT doc_id, t, n,
         CASE WHEN n <= 16 THEN 1 ELSE ((n - 16 + 11) // 12) + 1 END AS m
  FROM sized
), chunks AS (
  SELECT doc_id, i AS chunk_id, (i - 1) * 12 + 1 AS start, n, t
  FROM counts, UNNEST(generate_series(1, m)) AS u(i)
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start,
       CAST(least(16, n - start + 1) AS BIGINT) AS n_tokens,
       md5(array_to_string(t[start:start + 15], ' ')) AS chunk_digest
FROM chunks
"""


def bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First three BPE merge rules learned from the corpus word-frequency
    table (distributed tokenizer induction). The oracle unrolls the same
    three rounds in DuckDB, replaying the left-to-right merge fold with
    list_reduce, so the whole iterative loop is value-checked.

    LAZY chain (optimization round 13, guide §5 "the driver should do
    almost no data work"): ``operators.text.bpe_merges`` runs one blocking
    ``.collect()`` per merge round during query CONSTRUCTION — three
    full-corpus driver sync-barriers before the query's own action even
    starts (the captured before-plan is just `Scan ExistingRDD`: all the
    work was invisible pre-actions). This builds the identical three
    rounds declaratively — round k's winning pair is a 1-row
    ``orderBy(cnt desc, l, r).limit(1)`` aggregate cross-joined
    (broadcast) back onto the type table, exactly the oracle's unrolled
    ``m{k}``/``w{k}`` CTE shape — so induction executes inside the
    query's single action. Update algebra is term-for-term the
    operator's: same `normalized_tokens` word table, same NUL-token
    exclusion, same adjacent-pair count weighted by type frequency, same
    lexicographic tie-break, same left-to-right non-overlapping
    `merge_pair_fold`. Equivalence to the eager operator is pinned in
    tests/test_review_r13.py. `operators.text.bpe_merges` (batched,
    driver-paced — the 30k-vocab scale form whose conflict rule NEEDS the
    picked values) remains the operator API, still tested.
    """
    d = load(spark, sf_dir, "documents")
    return _bpe_lazy_rounds(d)


def _bpe_lazy_rounds(d: DataFrame) -> DataFrame:
    """The 3-round lazy BPE induction chain over ``d.text`` — one frame of
    (round, left, right, merged, pair_freq) rows whose plan embeds all
    three rounds (1-row winner aggregates cross-joined back, the oracle's
    unrolled CTE shape), so training executes inside whatever single
    action consumes it. Shared by ``bpe_merge_rules`` (the registry query)
    and ``bpe_encode_arrow_counts`` (which collects the rules once to
    parameterize the Arrow kernel). Equivalence to the eager
    ``operators.text.bpe_merges`` is pinned in tests/test_review_r13.py."""
    from quantms_utils_spark.operators.dedup import _fan_out
    from quantms_utils_spark.operators.text import (
        merge_pair_fold,
        normalized_tokens,
    )

    cur = (
        _fan_out(d)
        .select(F.explode(normalized_tokens(F.col("text"))).alias("w"))
        .filter(~F.col("w").contains("\x00"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", F.split(F.col("w"), "").alias("syms"))
    )
    rounds: list[DataFrame] = []
    for k in range(1, 4):
        pairs = cur.select(
            "freq",
            F.explode(
                F.when(
                    F.size("syms") > 1,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", (i + 1).cast("int")).alias("r"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<l:string,r:string>>")
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
        )
        rounds.append(
            top.select(
                F.lit(k).alias("round"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                F.concat("l", "r").alias("merged"),
                F.col("cnt").cast("long").alias("pair_freq"),
            )
        )
        if k < 3:
            # the 1-row winner broadcast back onto the type table: a
            # bounded BroadcastNestedLoopJoin of the adjudicated
            # 1-row-aggregate class (tests/test_registry_plan_invariants)
            cur = cur.crossJoin(F.broadcast(top)).select(
                "freq",
                merge_pair_fold(
                    F.col("syms"), F.col("l"), F.col("r")
                ).alias("syms"),
            )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionAll(r)
    return out


def _bpe_round(k: int) -> str:
    prev = f"w{k - 1}"
    return f"""p{k} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS cnt
  FROM {prev}, UNNEST(generate_series(1, len(syms) - 1)) AS u(i)
  GROUP BY 1, 2
), m{k} AS (
  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
), w{k} AS (
  SELECT freq,
         list_reduce(list_transform(syms, c -> [c]),
           (acc, x) -> CASE WHEN acc[-1] = l AND x[1] = r
                            THEN acc[:-2] || [acc[-1] || x[1]]
                            ELSE acc || x END) AS syms
  FROM {prev} CROSS JOIN m{k}
)"""


BPE_MERGE_RULES_SQL = f"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), words AS (
  SELECT unnest(CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
                     ELSE string_split(nt, ' ') END) AS w
  FROM norm
), w0 AS (
  SELECT count(*) AS freq, string_split(w, '') AS syms
  FROM words GROUP BY w
), {_bpe_round(1)}, {_bpe_round(2)}, {_bpe_round(3)}
SELECT * FROM (
  SELECT 1 AS round, l AS "left", r AS "right", l || r AS merged,
         CAST(cnt AS BIGINT) AS pair_freq FROM m1
  UNION ALL
  SELECT 2, l, r, l || r, CAST(cnt AS BIGINT) FROM m2
  UNION ALL
  SELECT 3, l, r, l || r, CAST(cnt AS BIGINT) FROM m3
) ORDER BY round
"""



def quality_percentile_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percentile banding of document length: percent_rank of
    n_tokens WITHIN each source (deterministic tie-break on doc_id) and the
    keep decision for the middle [0.1, 0.9] band — per-domain outlier
    trimming, the distribution-aware cousin of the absolute thresholds in
    `text_quality_scores`. One window per source partition — no global
    sort."""
    from pyspark.sql import Window

    from quantms_utils_spark.operators.text import ws_token_count

    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("n_tokens", "doc_id")
    pr = F.percent_rank().over(w)
    return base.select(
        "doc_id",
        "source",
        "n_tokens",
        F.round(pr, 4).alias("pr"),
        ((pr >= 0.1) & (pr <= 0.9)).alias("kept"),
    )


QUALITY_PERCENTILE_BAND_SQL = r"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
), ranked AS (
  SELECT doc_id, source, n_tokens,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY n_tokens, doc_id) AS pr
  FROM base
)
SELECT doc_id, source, n_tokens, round(pr, 4) AS pr,
       (pr >= 0.1 AND pr <= 0.9) AS kept
FROM ranked
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources, the
    number of distinct word-3-gram shingle TYPES they share and the overlap
    coefficient (shared / smaller source's type count). The between-corpora
    twin of within-corpus dedup — the first report run before mixing
    crawl snapshots. One distinct (source, shingle) aggregation, then an
    equi-join on the shingle (never a doc-level cross join)."""
    from quantms_utils_spark.operators.dedup import word_shingles

    d = load(spark, sf_dir, "documents")
    sh = (
        word_shingles(d, "doc_id", "text", n=3)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_types"))
    shared = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_types"))
    )
    na = sizes.select(
        F.col("source").alias("source_a"), F.col("n_types").alias("_na")
    )
    nb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_types").alias("_nb")
    )
    return (
        shared.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_types",
            F.round(
                F.col("shared_types") / F.least("_na", "_nb"), 4
            ).alias("overlap_coef"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_MATRIX_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT d.source, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks t
  JOIN documents d USING (doc_id),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
  WHERE len(words) >= 3
), sizes AS (
  SELECT source, count(*) AS n_types FROM sh GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_types
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, shared_types,
       round(CAST(shared_types AS DOUBLE) / least(sa.n_types, sb.n_types), 4)
         AS overlap_coef
FROM shared
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
ORDER BY source_a, source_b
"""


def duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate word-8-gram spans per document (Lee et al.
    2022 boilerplate detection): occurrences, occurrences shared with at
    least one other document, and the duplicated fraction. One (doc, gram)
    reduction + a window docs-per-gram count — no self-join."""
    from quantms_utils_spark.operators.text import duplicate_spans

    d = load(spark, sf_dir, "documents")
    return duplicate_spans(d, "doc_id", "text", n=8)


DUPLICATE_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(words[i:i+7], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(words) - 7)) AS t(i)
  WHERE len(words) >= 8
), occ AS (
  SELECT doc_id, g, count(*) AS occ FROM g GROUP BY 1, 2
), docs AS (
  SELECT g, count(*) AS d FROM occ GROUP BY 1
)
SELECT doc_id,
       CAST(sum(occ) AS BIGINT) AS n_ngrams,
       CAST(sum(CASE WHEN d > 1 THEN occ ELSE 0 END) AS BIGINT) AS n_dup_ngrams,
       round(sum(CASE WHEN d > 1 THEN occ ELSE 0 END) * 1.0 / sum(occ), 6)
         AS dup_fraction
FROM occ JOIN docs USING (g)
GROUP BY doc_id
"""


def remove_duplicate_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus with cross-document duplicate word-8-gram spans cut
    out (the action half of `text_duplicate_spans`): per document, the
    original and kept token counts plus the rejoined cleaned text."""
    from quantms_utils_spark.operators.text import remove_duplicate_spans

    d = load(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, "doc_id", "text", n=8)


REMOVE_DUPLICATE_SPANS_SQL = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS words
  FROM norm
), pos AS (
  SELECT doc_id, i AS p, words[i] AS w
  FROM toks, UNNEST(generate_series(1, len(words))) AS t(i)
), g AS (
  SELECT doc_id, i AS gp, array_to_string(words[i:i+7], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(words) - 7)) AS t(i)
  WHERE len(words) >= 8
), docs AS (
  SELECT g, count(DISTINCT doc_id) AS d FROM g GROUP BY 1
), dup_pos AS (
  SELECT DISTINCT g.doc_id, u.i AS p
  FROM g JOIN docs USING (g), UNNEST(generate_series(g.gp, g.gp + 7)) AS u(i)
  WHERE docs.d > 1
), kept AS (
  SELECT pos.doc_id, pos.p, pos.w
  FROM pos LEFT JOIN dup_pos
    ON pos.doc_id = dup_pos.doc_id AND pos.p = dup_pos.p
  WHERE dup_pos.p IS NULL
), rebuilt AS (
  SELECT doc_id,
         array_to_string(list(w ORDER BY p), ' ') AS cleaned_text,
         count(*) AS n_tokens_kept
  FROM kept GROUP BY doc_id
)
SELECT toks.doc_id,
       CAST(len(toks.words) AS BIGINT) AS n_tokens,
       CAST(coalesce(rebuilt.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       coalesce(rebuilt.cleaned_text, '') AS cleaned_text
FROM toks LEFT JOIN rebuilt USING (doc_id)
"""


def bigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained character-bigram LM quality score per document (cheap
    perplexity proxy): average -ln P(c2|c1) under unsmoothed corpus
    conditionals. The model lives in two window sums — never collected."""
    from quantms_utils_spark.operators.text import bigram_logprob

    d = load(spark, sf_dir, "documents")
    return bigram_logprob(d, "doc_id", "text")


BIGRAM_LOGPROB_SQL = """
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), b AS (
  SELECT doc_id, substr(nt, i, 2) AS bg
  FROM norm, UNNEST(generate_series(1, length(nt) - 1)) AS u(i)
  WHERE length(nt) >= 2
), occ AS (
  SELECT doc_id, bg, count(*) AS occ FROM b GROUP BY 1, 2
), gb AS (
  SELECT bg, sum(occ) AS cb FROM occ GROUP BY 1
), pref AS (
  SELECT substr(bg, 1, 1) AS p, sum(occ) AS cp FROM occ GROUP BY 1
)
SELECT occ.doc_id,
       CAST(sum(occ.occ) AS BIGINT) AS n_bigrams,
       round(sum(occ.occ * (ln(pref.cp) - ln(gb.cb))) / sum(occ.occ), 6)
         AS avg_neg_logprob
FROM occ
JOIN gb USING (bg)
JOIN pref ON substr(occ.bg, 1, 1) = pref.p
GROUP BY occ.doc_id
"""


def bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary table after 3 learned merges: every surviving symbol
    (single characters plus merged tokens) with its corpus occurrence
    count — the artifact a tokenizer trainer exports. One map-only encode
    pass with the merges baked as literals plus one count shuffle; the
    oracle replays the same three sequential rounds over the DuckDB word
    table and unnests the final symbol sequences weighted by word
    frequency."""
    from quantms_utils_spark.operators.text import bpe_vocabulary

    d = load(spark, sf_dir, "documents")
    # Rules come off the lazy 3-round chain in ONE collect (optimization
    # round 13, guide §5) instead of the eager operator's per-round
    # blocking collects; rule equivalence is test-pinned.
    merges = [
        (r["left"], r["right"])
        for r in sorted(
            _bpe_lazy_rounds(d).collect(), key=lambda r: r["round"]
        )
    ]
    return bpe_vocabulary(d, "text", merges)


BPE_VOCAB_SQL = f"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), words AS (
  SELECT unnest(CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
                     ELSE string_split(nt, ' ') END) AS w
  FROM norm
), w0 AS (
  SELECT count(*) AS freq, string_split(w, '') AS syms
  FROM words GROUP BY w
), {_bpe_round(1)}, {_bpe_round(2)}, {_bpe_round(3)}
SELECT symbol, CAST(sum(freq) AS BIGINT) AS n_occurrences
FROM (SELECT freq, unnest(syms) AS symbol FROM w3)
GROUP BY symbol
"""


def bpe_encode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE: learn 3 merge rules from the corpus
    (`bpe_merges`, driver-held merge table — vocabulary metadata), bake them
    into a pure-Catalyst encode expression (`bpe_apply`, map-only, zero
    shuffles), and report per-document symbol counts. n_chars_total is
    invariant under merging (a sanity column the oracle recomputes from raw
    text); n_bpe_symbols shrinks where learned pairs fire."""
    from quantms_utils_spark.operators.text import bpe_apply

    d = load(spark, sf_dir, "documents")
    # Rules come off the lazy 3-round chain in ONE collect (optimization
    # round 13, guide §5) instead of the eager operator's per-round
    # blocking collects; rule equivalence is test-pinned.
    merges = [
        (r["left"], r["right"])
        for r in sorted(
            _bpe_lazy_rounds(d).collect(), key=lambda r: r["round"]
        )
    ]
    enc = bpe_apply(F.col("text"), merges)
    n_syms = F.aggregate(enc, F.lit(0), lambda acc, w: acc + F.size(w))
    n_chars = F.aggregate(
        enc,
        F.lit(0),
        lambda acc, w: acc
        + F.aggregate(w, F.lit(0), lambda a2, s: a2 + F.length(s)),
    )
    return d.select(
        "doc_id",
        n_syms.cast("long").alias("n_bpe_symbols"),
        n_chars.cast("long").alias("n_chars_total"),
    )


BPE_ENCODE_COUNTS_SQL = f"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), words AS (
  SELECT unnest(CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
                     ELSE string_split(nt, ' ') END) AS w
  FROM norm
), w0 AS (
  SELECT count(*) AS freq, string_split(w, '') AS syms
  FROM words GROUP BY w
), {_bpe_round(1)}, {_bpe_round(2)}, {_bpe_round(3)},
rules AS (
  SELECT m1.l AS l1, m1.r AS r1, m2.l AS l2, m2.r AS r2, m3.l AS l3, m3.r AS r3
  FROM m1, m2, m3
), docs AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
  FROM documents
), dtoks AS (
  SELECT doc_id,
         CASE WHEN nt = '' THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS ws,
         length(replace(nt, ' ', '')) AS n_chars
  FROM docs
)
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(ws, w -> len(list_reduce(list_transform(list_reduce(list_transform(list_reduce(list_transform(string_split(w, ''), _ca1 -> [_ca1]), (a1, x1) -> CASE WHEN a1[-1] = l1 AND x1[1] = r1 THEN a1[:-2] || [a1[-1] || x1[1]] ELSE a1 || x1 END), _ca2 -> [_ca2]), (a2, x2) -> CASE WHEN a2[-1] = l2 AND x2[1] = r2 THEN a2[:-2] || [a2[-1] || x2[1]] ELSE a2 || x2 END), _ca3 -> [_ca3]), (a3, x3) -> CASE WHEN a3[-1] = l3 AND x3[1] = r3 THEN a3[:-2] || [a3[-1] || x3[1]] ELSE a3 || x3 END)))), 0) AS BIGINT)
         AS n_bpe_symbols,
       CAST(n_chars AS BIGINT) AS n_chars_total
FROM dtoks CROSS JOIN rules
"""


def unicode_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization proof: every document gets a deterministic
    decomposed suffix (combining acute on 'cafe'), the normalizer composes
    it, and the digest/length columns pin the exact normalized form against
    DuckDB's nfc_normalize. Map-only — a 100 TB normalization is one scan."""
    from quantms_utils_spark.operators.text import unicode_nfc

    d = load(spark, sf_dir, "documents")
    decomposed = F.concat(F.col("text"), F.lit(" cafe\u0301"))
    norm = unicode_nfc(decomposed)
    return d.select(
        "doc_id",
        F.length(decomposed).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_nfc"),
        (F.length(norm) < F.length(decomposed)).alias("composed"),
        F.md5(norm).alias("nfc_md5"),
    )


UNICODE_NORMALIZE_SQL = """
WITH d AS (
  SELECT doc_id, text || ' cafe' || chr(769) AS raw FROM documents
)
SELECT doc_id,
       CAST(length(raw) AS INT) AS n_chars_raw,
       CAST(length(nfc_normalize(raw)) AS INT) AS n_chars_nfc,
       length(nfc_normalize(raw)) < length(raw) AS composed,
       md5(nfc_normalize(raw)) AS nfc_md5
FROM d
"""


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional 200-document sample (weights = n_chars) via
    operators.text.weighted_sample — Efraimidis–Spiridakis exponential keys,
    so longer documents are proportionally likelier, with no RNG state and
    no replacement. The oracle recomputes the identical key formula; the
    Spark plan is TakeOrderedAndProject (per-partition top-k, no global
    sort)."""
    from quantms_utils_spark.operators.text import weighted_sample

    d = load(spark, sf_dir, "documents")
    return weighted_sample(d, "doc_id", "n_chars", 200).select(
        "doc_id", "n_chars", F.round("sample_key", 6).alias("sample_key")
    )


WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                 + 0.5) / 16777216.0) / n_chars, 6) AS sample_key
FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
             + 0.5) / 16777216.0) / n_chars DESC, doc_id
LIMIT 200
"""


QUERIES = {
    "text_weighted_sample": (weighted_sample_docs, WEIGHTED_SAMPLE_SQL),
    "text_train_split": (train_split_assign, TRAIN_SPLIT_SQL),
    "text_pack_sequences": (pack, PACK_SQL),
    "text_group_sample": (group_sample, GROUP_SAMPLE_SQL),
    "text_repetition_signals": (repetition, REPETITION_SQL),
    "text_decontaminate": (decontaminate_split, DECONTAMINATE_SQL),
    "text_pii_scrub": (pii_scrub, PII_SCRUB_SQL),
    "text_mixture_sample": (mixture, MIXTURE_SQL),
    "text_lang_id": (lang_id_predict, LANG_ID_SQL),
    "text_unicode_normalize": (unicode_normalize_docs, UNICODE_NORMALIZE_SQL),
    "text_quality_scores": (quality_scores, QUALITY_SCORES_SQL),
    "text_token_counts": (token_counts, TOKEN_COUNTS_SQL),
    "text_fingerprints": (fingerprints, FINGERPRINTS_SQL),
    "text_quality_percentile_band": (quality_percentile_band, QUALITY_PERCENTILE_BAND_SQL),
    "text_source_overlap": (source_overlap_matrix, SOURCE_OVERLAP_MATRIX_SQL),
    "text_chunk_sliding": (chunk_sliding, CHUNK_SLIDING_SQL),
    "text_bpe_merges": (bpe_merge_rules, BPE_MERGE_RULES_SQL),
    "text_bpe_encode": (bpe_encode_counts, BPE_ENCODE_COUNTS_SQL),
    "text_bpe_vocab": (bpe_vocab, BPE_VOCAB_SQL),
    "text_duplicate_spans": (duplicate_spans_q, DUPLICATE_SPANS_SQL),
    "text_remove_duplicate_spans": (
        remove_duplicate_spans_q,
        REMOVE_DUPLICATE_SPANS_SQL,
    ),
    "text_bigram_logprob": (bigram_logprob_q, BIGRAM_LOGPROB_SQL),
    "text_winnow_fingerprints": (winnow_fps, WINNOW_FPS_SQL),
    "dedup_winnow_pairs": (winnow_pairs, WINNOW_PAIRS_SQL),
    "multimodal_metadata": (multimodal_metadata, MULTIMODAL_METADATA_SQL),
    "multimodal_image_features": (
        multimodal_image_features,
        MULTIMODAL_IMAGE_FEATURES_SQL,
    ),
    "multimodal_audio_features": (
        multimodal_audio_features,
        MULTIMODAL_AUDIO_FEATURES_SQL,
    ),
    "multimodal_video_frames": (
        multimodal_video_frames,
        MULTIMODAL_VIDEO_FRAMES_SQL,
    ),
    "multimodal_image_resize": (
        multimodal_image_resize,
        MULTIMODAL_IMAGE_RESIZE_SQL,
    ),
}


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per document (nats) — the
    information-theoretic member of the quality family: gibberish and
    single-character spam sit at the extremes where the ratio heuristics
    (text_quality_scores) go blind. Explode to (doc, char) → two
    map-side-combinable aggregates (total = length(text), carried as a
    grouping key — no window); deliberately NOT the in-row
    O(len × distinct) transform shape (the repetition-signals rule).
    Entropy gets the shared 1e-12 nudge before round so engines cannot
    split on a terminating-decimal boundary."""
    d = load(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        F.length("text").alias("total"),
        F.explode(F.split(F.col("text"), "")).alias("ch"),
    ).filter(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "total", "ch").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    p = F.col("cnt") / F.col("total")
    return counts.groupBy("doc_id").agg(
        F.max("total").cast("long").alias("n_counted"),
        F.round(-F.sum(p * F.log(p)) + F.lit(1e-12), 6).alias(
            "entropy_nats"
        ),
    )


CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, length(text) AS total, substr(text, CAST(i AS INT), 1) AS ch
  FROM documents, UNNEST(generate_series(1, length(text))) AS u(i)
), counts AS (
  SELECT doc_id, total, ch, count(*) AS cnt FROM chars GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(max(total) AS BIGINT) AS n_counted,
       round(-sum((cnt / CAST(total AS DOUBLE))
                  * ln(cnt / CAST(total AS DOUBLE))) + 1e-12, 6)
         AS entropy_nats
FROM counts
GROUP BY doc_id
"""


QUERIES["text_char_entropy"] = (char_entropy, CHAR_ENTROPY_SQL)


def novelty_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty vs boilerplate: the fraction of a document's
    3-gram shingles that are corpus-UNIQUE (df = 1 — novel content) and the
    fraction shared by ≥ 20 documents (template/boilerplate) — the two
    ends of the shingle-df spectrum that drive keep/trim curation calls.
    One shingle scan + one df window + one per-doc aggregate (the
    prefix-filter family's df-window idiom, `operators/dedup.py`); no
    joins back to the corpus. The oracle recomputes df from scratch."""
    from quantms_utils_spark.operators.dedup import word_shingles

    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", n=3)
    w = Window.partitionBy("shingle")
    per = (
        sh.withColumn("_df", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count_if(F.col("_df") == 1).alias("_novel"),
            F.count_if(F.col("_df") >= 20).alias("_boiler"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        F.round(F.col("_novel") / F.col("n_shingles"), 6).alias("novel_frac"),
        F.round(F.col("_boiler") / F.col("n_shingles"), 6).alias(
            "boilerplate_frac"
        ),
    )


NOVELTY_BOILERPLATE_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
), dfreq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
)
SELECT doc_id, count(*) AS n_shingles,
       round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novel_frac,
       round(sum(CASE WHEN df >= 20 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS boilerplate_frac
FROM sh JOIN dfreq USING (shingle)
GROUP BY doc_id
"""

QUERIES["text_novelty_boilerplate"] = (
    novelty_boilerplate,
    NOVELTY_BOILERPLATE_SQL,
)


def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document from three regexp counts — words
    (whitespace tokens), sentences (terminal-punctuation runs, floored at
    1), syllables (vowel-group runs, the standard heuristic) — all
    codegen'd, map-only, zero shuffle; the formula is plain arithmetic on
    the counts so both engines agree bit-for-bit before rounding."""
    from quantms_utils_spark.operators.text import ws_token_count

    d = load(spark, sf_dir, "documents")
    words = ws_token_count(F.col("text")).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long"),
    )
    syllables = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("long")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences.cast("double"))
        - F.lit(84.6) * (syllables / words.cast("double"))
    )
    return d.select(
        "doc_id",
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.when(words > 0, F.round(flesch, 4)).alias("flesch"),
    )


READABILITY_SQL = r"""
WITH c AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS w,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
  FROM documents
)
SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(s AS BIGINT) AS n_sentences,
       CAST(y AS BIGINT) AS n_syllables,
       CASE WHEN w > 0
            THEN round(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                       - 84.6 * (y / CAST(w AS DOUBLE)), 4)
            END AS flesch
FROM c
"""

QUERIES["text_readability"] = (readability_scores, READABILITY_SQL)


_TEMP_ALPHA = 0.5


def temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture re-sampling (the T5/mT5 α-sampling rule,
    α=0.5): source s keeps documents at rate (share_s)^α / max_s'
    (share_s')^α — low-resource sources are kept in full while dominant
    sources downsample toward the tempered distribution, flattening the
    mixture without an explicit token budget (the budget-based variant is
    `text_mixture_sample`). Plan: ONE count aggregate builds the
    per-source rate table (|sources| rows, broadcast back); the keep
    decision is the md5-24-bit-uniform integer compare (no RNG, stable
    under repartitioning) against floor(rate·2²⁴) — the threshold is
    derived from identical integer counts through identical IEEE double
    ops in both engines, so the integer compare cannot disagree. Output
    is the per-source audit row (n_docs, share, rate, n_kept)."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n_total"))
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "w", F.pow(F.col("n_docs") / F.col("n_total"), F.lit(_TEMP_ALPHA))
        )
        .withColumn("w_max", F.max("w").over(Window.partitionBy()))
        .select(
            "source",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
            (F.col("w") / F.col("w_max")).alias("_rate"),
        )
    )
    hv = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
        "long"
    )
    kept = (
        d.select("doc_id", "source")
        .join(F.broadcast(rates.select("source", "_rate")), "source")
        .filter(hv < F.floor(F.col("_rate") * F.lit(16777216)).cast("long"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "share",
            F.round("_rate", 6).alias("rate"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


TEMPERATURE_MIXTURE_SQL = """
WITH counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
), tot AS (SELECT sum(n_docs) AS n_total FROM counts),
rates AS (
  SELECT source, n_docs,
         round(n_docs / CAST(n_total AS DOUBLE), 6) AS share,
         pow(n_docs / CAST(n_total AS DOUBLE), 0.5)
           / max(pow(n_docs / CAST(n_total AS DOUBLE), 0.5)) OVER () AS rate_raw
  FROM counts, tot
), kept AS (
  SELECT d.source, count(*) AS n_kept
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
        < CAST(floor(rate_raw * 16777216) AS BIGINT)
  GROUP BY 1
)
SELECT r.source, CAST(n_docs AS BIGINT) AS n_docs, share,
       round(rate_raw, 6) AS rate,
       CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.source = k.source
"""

QUERIES["text_temperature_mixture"] = (temperature_mixture, TEMPERATURE_MIXTURE_SQL)


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — the per-language cost metric a
    multilingual pretraining budget is planned around: bytes/token and
    chars/token under the BPE-ish tokenizer, plus the whitespace→BPE
    blow-up ratio (how much worse the tokenizer does than word
    segmentation). One map-side projection (language ID + token counts are
    all JVM regex expressions) followed by one |languages|-row aggregate;
    ratios divide SUMS (corpus-level fertility), not averaged per-doc
    ratios, so every aggregate is map-combinable. Output
    (predicted_lang, n_docs, bytes_per_token, chars_per_token,
    bpe_blowup)."""
    d = load(spark, sf_dir, "documents")
    text = F.col("text")
    per_doc = d.select(
        lang_id(text).alias("predicted_lang"),
        F.octet_length(F.encode(text, "UTF-8")).cast("long").alias("n_bytes"),
        F.length(text).cast("long").alias("n_chars"),
        ws_token_count(text).alias("ws_tokens"),
        bpe_ish_token_count(text).alias("bpe_tokens"),
    )
    return (
        per_doc.groupBy("predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("sb"),
            F.sum("n_chars").alias("sc"),
            F.sum("ws_tokens").alias("sw"),
            F.sum("bpe_tokens").alias("st"),
        )
        .select(
            "predicted_lang",
            "n_docs",
            F.round(F.col("sb") / F.greatest(F.col("st"), F.lit(1)), 4).alias(
                "bytes_per_token"
            ),
            F.round(F.col("sc") / F.greatest(F.col("st"), F.lit(1)), 4).alias(
                "chars_per_token"
            ),
            F.round(F.col("st") / F.greatest(F.col("sw"), F.lit(1)), 4).alias(
                "bpe_blowup"
            ),
        )
        .orderBy("predicted_lang")
    )


_FERTILITY_LANG_CASE = (
    "CASE "
    + " ".join(f"WHEN {_winner_cond(lang)} THEN '{lang}'" for lang in _LANGS)
    + " ELSE 'und' END"
)

TOKENIZER_FERTILITY_SQL = f"""
WITH s AS (
  SELECT text,
    {", ".join(f"{_score_sql(lang)} AS s_{lang}" for lang in _LANGS)}
  FROM documents
), per_doc AS (
  SELECT {_FERTILITY_LANG_CASE} AS predicted_lang,
    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT)
      AS ws_tokens,
    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         AS BIGINT) AS bpe_tokens
  FROM s
)
SELECT predicted_lang, count(*) AS n_docs,
  round(CAST(sum(n_bytes) AS DOUBLE) / greatest(sum(bpe_tokens), 1), 4)
    AS bytes_per_token,
  round(CAST(sum(n_chars) AS DOUBLE) / greatest(sum(bpe_tokens), 1), 4)
    AS chars_per_token,
  round(CAST(sum(bpe_tokens) AS DOUBLE) / greatest(sum(ws_tokens), 1), 4)
    AS bpe_blowup
FROM per_doc
GROUP BY 1 ORDER BY 1
"""

QUERIES["text_tokenizer_fertility"] = (tokenizer_fertility, TOKENIZER_FERTILITY_SQL)


def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier CONFUSION MATRIX for the marker-word language ID
    against the corpus's ground-truth ``lang`` column — the eval artifact
    that localizes WHERE a classifier fails (which true language bleeds
    into which prediction), where accuracy alone cannot. One map-side
    projection + one |langs|²-bounded aggregate; per-cell recall shares
    divide exact counts. Output (actual, predicted, n, recall_share)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("actual")
    return (
        d.select(
            F.col("lang").alias("actual"),
            lang_id(F.col("text")).alias("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "actual",
            "predicted",
            "n",
            F.round(F.col("n") / F.sum("n").over(w), 6).alias("recall_share"),
        )
        .orderBy("actual", "predicted")
    )


LANG_CONFUSION_SQL = f"""
WITH s AS (
  SELECT lang AS actual, text,
    {", ".join(f"{_score_sql(lang)} AS s_{lang}" for lang in _LANGS)}
  FROM documents
), pred AS (
  SELECT actual,
    {_FERTILITY_LANG_CASE} AS predicted
  FROM s
), cells AS (
  SELECT actual, predicted, count(*) AS n FROM pred GROUP BY 1, 2
)
SELECT actual, predicted, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY actual), 6) AS recall_share
FROM cells ORDER BY 1, 2
"""

QUERIES["text_lang_confusion"] = (lang_confusion_matrix, LANG_CONFUSION_SQL)


def bpe_encode_arrow_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-kernel twin of `text_bpe_encode`: learn the same 3 merge
    rules, encode with `bpe_encode_arrow` (the deep-vocabulary
    priority-merge kernel — one Arrow-batched map pass instead of one
    nested Catalyst fold per rule) and report the SAME per-document
    symbol counts against the SAME oracle. A green row here proves the
    Python kernel's priority-iteration semantics equal the fold chain's
    in-order-pass semantics on a real learned list — the equivalence the
    30k-rule path rests on — under the driver's hash gate, not just
    pytest."""
    from quantms_utils_spark.operators.text import bpe_encode_arrow

    d = load(spark, sf_dir, "documents")
    # Training rides the lazy 3-round chain (optimization round 13, guide
    # §5): the kernel needs the rules driver-side, but ONE collect of the
    # chained frame replaces the eager operator's one-blocking-collect-per
    # round (4 full word-table sync-barriers → 1). Rules are identical —
    # the lazy chain == eager operator equivalence is test-pinned.
    merges = [
        (r["left"], r["right"])
        for r in sorted(
            _bpe_lazy_rounds(d).collect(), key=lambda r: r["round"]
        )
    ]
    enc = bpe_encode_arrow(d, "text", merges, out_col="_syms")
    return enc.select(
        "doc_id",
        F.aggregate(
            F.col("_syms"), F.lit(0), lambda acc, w: acc + F.size(w)
        ).cast("long").alias("n_bpe_symbols"),
        F.aggregate(
            F.col("_syms"),
            F.lit(0),
            lambda acc, w: acc
            + F.aggregate(w, F.lit(0), lambda a2, s: a2 + F.length(s)),
        ).cast("long").alias("n_chars_total"),
    )


QUERIES["text_bpe_encode_arrow"] = (bpe_encode_arrow_counts, BPE_ENCODE_COUNTS_SQL)


def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization QA (operators.text.feature_hash_vectors):
    per document, the sparse-vector summary (token count, non-zero
    feature count, exact integer squared L2 norm) over a 256-dim hashed
    space. nnz < n_tokens exposes collisions; l2_sq is integer-exact so
    the hash gate needs no float tolerance. The oracle replays the same
    md5 index/sign hashes token-by-token — a tokenizer drift, a modulo
    slip, or a sign-balance bug all mismatch. Output (doc_id, n_tokens,
    nnz, l2_sq) for the first 50 docs."""
    from quantms_utils_spark.operators.text import feature_hash_vectors

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    vec = feature_hash_vectors(d, "doc_id", "text", dim=256)
    ntok = (
        d.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda t: t != ""
                )
            ).cast("long").alias("n_tokens"),
        )
    )
    per_doc = vec.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum(F.col("weight") * F.col("weight")).cast("long").alias("l2_sq"),
    )
    return (
        ntok.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("nnz", F.lit(0)).alias("nnz"),
            F.coalesce("l2_sq", F.lit(0)).alias("l2_sq"),
        )
        .orderBy("doc_id")
    )


TEXT_FEATURE_HASHING_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE doc_id < 50
), nz AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 6))::BIGINT % 256 AS idx,
         CASE WHEN ('0x' || substr(md5(tok), 7, 1))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM toks WHERE tok <> ''
), vec AS (
  SELECT doc_id, idx, sum(sign) AS weight
  FROM nz GROUP BY doc_id, idx
  HAVING sum(sign) <> 0
), per_doc AS (
  SELECT doc_id, count(*) AS nnz, sum(weight * weight) AS l2_sq
  FROM vec GROUP BY doc_id
), ntok AS (
  SELECT doc_id, count(*) AS n_tokens FROM nz GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(ntok.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(per_doc.nnz, 0) AS BIGINT) AS nnz,
       CAST(coalesce(per_doc.l2_sq, 0) AS BIGINT) AS l2_sq
FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d
LEFT JOIN ntok USING (doc_id)
LEFT JOIN per_doc USING (doc_id)
ORDER BY doc_id
"""

QUERIES["text_feature_hashing"] = (text_feature_hashing, TEXT_FEATURE_HASHING_SQL)
