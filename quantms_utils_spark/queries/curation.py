"""The end-to-end corpus-curation query: five chained stages (quality →
exact dedup → MinHash-LSH near-dup → decontamination → mixture sampling),
value-checked against a single DuckDB CTE pipeline that re-derives every
stage — including the recursive-CTE transitive closure of the LSH candidate
graph. One green hash here proves the operator family COMPOSES, not just
that each stage works in isolation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from quantms_utils_spark.pipelines.curation import curate_corpus
from quantms_utils_spark.queries.dedup import (
    BAND_SIZE,
    N_HASHES,
    _BAND_CASE,
    _minhash_sig_sql_columns,
)
from quantms_utils_spark.tables import load

TOKEN_BUDGET = 300


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated train set for the documents corpus (benchmark = its own test
    split, budget 300 tokens/source)."""
    return curate_corpus(
        load(spark, sf_dir, "documents"), token_budget=TOKEN_BUDGET
    )


CURATION_SQL = rf"""
WITH RECURSIVE qm AS (
  SELECT doc_id, text, source,
    CAST(length(text) AS BIGINT) AS n_chars_m,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT)
      AS n_tokens,
    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
      AS alpha_chars,
    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT)
      AS punct_chars
  FROM documents
), q AS (
  SELECT doc_id, text, source FROM qm
  WHERE n_tokens >= 5
    AND round(CAST(alpha_chars AS DOUBLE) / greatest(n_tokens, 1), 4)
        BETWEEN 2 AND 12
    AND round(CAST(punct_chars AS DOUBLE) / greatest(n_chars_m, 1), 4) <= 0.2
), ex AS (
  SELECT doc_id, text, source FROM (
    SELECT doc_id, text, source,
      min(doc_id) OVER (
        PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
      ) AS keep_id
    FROM q
  ) WHERE doc_id = keep_id
), toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS words
  FROM ex
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
), sig AS (
  SELECT doc_id,
    {_minhash_sig_sql_columns()}
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, b, CASE b {_BAND_CASE} END AS bucket
  FROM sig,
    UNNEST([{", ".join(str(b) for b in range(N_HASHES // BAND_SIZE))}]) AS t(b)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2
    ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), walk(v, label) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, walk.label FROM walk JOIN edges e ON walk.v = e.a
), reps AS (
  SELECT v AS doc_id, min(label) AS cluster FROM walk GROUP BY v
), surv AS (
  SELECT e.doc_id, e.text, e.source
  FROM ex e LEFT JOIN reps r USING (doc_id)
  WHERE r.cluster IS NULL OR r.cluster = e.doc_id
), pctd AS (
  SELECT doc_id,
    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 AS pct
  FROM documents
), bg AS (
  SELECT DISTINCT array_to_string(list_slice(tk, i, i + 4), ' ') AS g
  FROM (SELECT str_split(lower(trim(regexp_replace(d.text, '\s+', ' ', 'g'))),
                         ' ') AS tk
        FROM documents d JOIN pctd USING (doc_id)
        WHERE pct >= 90 AND length(trim(d.text)) > 0),
       UNNEST(generate_series(1, len(tk) - 4)) AS t(i)
), tc AS (
  SELECT s.doc_id, s.text, s.source
  FROM surv s JOIN pctd USING (doc_id) WHERE pct < 80
), tg AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(tk, i, i + 4), ' ') AS g
  FROM (SELECT doc_id,
               str_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                         ' ') AS tk
        FROM tc WHERE length(trim(text)) > 0),
       UNNEST(generate_series(1, len(tk) - 4)) AS t(i)
), contaminated AS (
  SELECT DISTINCT doc_id FROM tg JOIN bg USING (g)
), clean AS (
  SELECT * FROM tc
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
), tok AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT)
      AS doc_tokens
  FROM clean
), tot AS (
  SELECT source, CAST(sum(doc_tokens) AS BIGINT) AS group_tokens
  FROM tok GROUP BY 1
), r AS (
  SELECT source, group_tokens,
         least(1.0, {TOKEN_BUDGET}.0 / greatest(group_tokens, 1)) AS keep_rate
  FROM tot
)
SELECT t.doc_id, t.source, t.doc_tokens, r.group_tokens,
       round(r.keep_rate, 6) AS keep_rate
FROM tok t JOIN r USING (source)
WHERE ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 6))::BIGINT % 10000
      < r.keep_rate * 10000
"""


QUERIES = {
    "curation_pipeline": (curation_pipeline, CURATION_SQL),
}
