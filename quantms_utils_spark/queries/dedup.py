"""Deduplication queries over the `documents` table: exact, n-gram Jaccard,
MinHash signatures + LSH banding, and SimHash.

Scale design (100 TB story):
- exact dedup is a single hash-aggregate on a fingerprint — fingerprint first
  (md5 of normalized text, 32 bytes) so the shuffle carries hashes, not bodies.
- MinHash/LSH: shingle → k minhashes → band buckets → equi-join on
  (band, band_hash). The only pairwise work happens within a bucket, so cost
  is driven by bucket skew, not corpus size. Hash family is md5-based and
  therefore reproducible in DuckDB — the oracle checks the *whole* pipeline,
  not a Python reimplementation.
- exact n-gram Jaccard is quadratic per shared shingle; it is the verify step
  applied to LSH candidates at scale. The standalone oracle query bounds the
  corpus (doc_id < 200) to keep the demonstration exact.
- SimHash is a Pandas-UDF (Arrow-batched) bit-manipulation kernel; its
  md5-derived token hashes are re-derived in the DuckDB oracle with HUGEINT
  nibble arithmetic, so the fingerprints are value-checked bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.dedup import (
    connected_components,
    jaccard_for_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from quantms_utils_spark.tables import load

N_HASHES = 8
BAND_SIZE = 2


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint: one hash-aggregate, keeper = min
    doc_id per group (deterministic survivor policy)."""
    d = load(spark, sf_dir, "documents")
    fp = F.md5(F.col("text"))
    return d.groupBy(fp.alias("fp")).agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS fp, min(doc_id) AS keeper, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity pairs (threshold 0.2) on a bounded
    slice — the verification kernel for LSH candidates."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)


NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents WHERE doc_id < 200
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
"""


def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=8) per document — md5 family pinned here so the
    DuckDB oracle can reproduce every hash; the engine default (xxhash64) is
    the production/bench path and shares the identical pipeline structure."""
    d = load(spark, sf_dir, "documents")
    return minhash_signatures(
        d, "doc_id", "text", n_hashes=N_HASHES, shingle_n=3, hash_family="md5"
    )


def minhash_lsh_pairs_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-default LSH pipeline (xxhash64 family) — benchmark
    entry; structure-identical to the oracle-checked md5 variant."""
    d = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        d, "doc_id", "text", n_hashes=N_HASHES, shingle_n=3, hash_family="xxhash64"
    )
    return lsh_candidate_pairs(sigs, "doc_id", n_hashes=N_HASHES, band_size=BAND_SIZE)


def _minhash_sig_sql_columns() -> str:
    # Mirrors operators.dedup.minhash_signatures: four 32-bit minhashes carved
    # from each seeded md5 (disjoint 8-hex-char windows).
    return ",\n  ".join(
        f"min(substr(md5('{j // 4}|' || shingle), {(j % 4) * 8 + 1}, 8)) AS sig_{j}"
        for j in range(N_HASHES)
    )


MINHASH_SIGS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
)
SELECT doc_id,
  {_minhash_sig_sql_columns()}
FROM sh GROUP BY doc_id
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: 4 bands × 2 rows; docs sharing any band bucket."""
    sigs = minhash_sigs(spark, sf_dir)
    return lsh_candidate_pairs(sigs, "doc_id", n_hashes=N_HASHES, band_size=BAND_SIZE)


_BAND_CASE = " ".join(
    f"WHEN {b} THEN md5(sig_{b * BAND_SIZE} || sig_{b * BAND_SIZE + 1})"
    for b in range(N_HASHES // BAND_SIZE)
)

MINHASH_LSH_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
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
  FROM sig, UNNEST([{", ".join(str(b) for b in range(N_HASHES // BAND_SIZE))}]) AS t(b)
)
SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
FROM bands a JOIN bands b2 ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
"""


def minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: LSH candidate pairs → connected components
    → (doc_id, cluster) where cluster is the minimum member id, i.e. the
    keeper. Components route through :func:`cluster_components`, which picks
    min-label propagation for sparse graphs and large-star/small-star for
    dense (whale-suspect) ones — same (v, min-id) contract either way. The
    oracle reproduces the transitive closure with a recursive CTE over the
    identical pair set."""
    from quantms_utils_spark.operators.dedup import cluster_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    cc = cluster_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster"))


MINHASH_CLUSTERS_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
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
  FROM sig, UNNEST([{", ".join(str(b) for b in range(N_HASHES // BAND_SIZE))}]) AS t(b)
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
)
SELECT v AS doc_id, min(label) AS cluster FROM walk GROUP BY v
"""


def lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full candidate→verify near-dup pipeline: LSH pairs, then exact
    Jaccard computed ONLY on candidates (threshold 0.5). At corpus scale the
    exact step touches O(|candidates|) rows — LSH did the pruning."""
    pairs = minhash_lsh_pairs(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    return jaccard_for_pairs(d, pairs, "doc_id", "text", n=3, threshold=0.5)


LSH_VERIFIED_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
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
  FROM sig, UNNEST([{", ".join(str(b) for b in range(N_HASHES // BAND_SIZE))}]) AS t(b)
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2
    ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_common
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND a.shingle = b.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (Arrow-batched Pandas UDF kernel).

    The md5-derived token hashes make the whole bit-twiddling pipeline
    reproducible in the oracle dialect: the DuckDB twin re-derives each
    token's top-8-md5-bytes as a HUGEINT via nibble arithmetic, re-runs the
    per-bit +/-1 vote, and reassembles the signed 64-bit fingerprint — so
    even the one Python kernel in the dedup family is value-checked, not
    just property-tested.
    """
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", simhash(F.col("text")).alias("simhash64"))


SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), toks2 AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), hx AS (
  SELECT doc_id, substr(md5(tok), 1, 16) AS hex FROM toks2
), hv AS (
  -- big-endian uint64 of the first 8 md5 bytes, via per-nibble arithmetic
  SELECT doc_id,
    (SELECT sum((strpos('0123456789abcdef', substr(hex, i, 1)) - 1)::HUGEINT
                << (4 * (16 - i)))
     FROM generate_series(1, 16) g(i)) AS h
  FROM hx
), bits AS (
  SELECT doc_id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS s
  FROM hv, generate_series(0, 63) t(b)
), acc AS (
  SELECT doc_id, b, sum(s) AS a FROM bits GROUP BY 1, 2
), v AS (
  SELECT doc_id, sum(CASE WHEN a > 0 THEN 1::HUGEINT << b ELSE 0 END) AS u
  FROM acc GROUP BY doc_id
)
SELECT doc_id,
       CAST(CASE WHEN u >= (1::HUGEINT << 63) THEN u - (1::HUGEINT << 64)
                 ELSE u END AS BIGINT) AS simhash64
FROM v
"""


def incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-shard dedup: documents with doc_id ≥ 400 ('today's shard')
    classified against the standing corpus (doc_id < 400) as exact_dup /
    near_dup / new (operators.dedup.incremental_dedup — fingerprint
    equi-join + cross-set LSH banding + candidate-only Jaccard verify; the
    corpus side never self-joins)."""
    from quantms_utils_spark.operators.dedup import incremental_dedup

    d = load(spark, sf_dir, "documents")
    return incremental_dedup(
        d.where(F.col("doc_id") < 400),
        d.where(F.col("doc_id") >= 400),
        "doc_id",
        "text",
        n_hashes=N_HASHES,
        band_size=BAND_SIZE,
        shingle_n=3,
        threshold=0.5,
        hash_family="md5",
    )


INCREMENTAL_SQL = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 400
), incoming AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 400
), cfp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         min(doc_id) AS exact_match
  FROM corpus GROUP BY 1
), ifp AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM incoming
), toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
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
), cand AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
  FROM bands n JOIN bands c ON n.b = c.b AND n.bucket = c.bucket
  WHERE n.doc_id >= 400 AND c.doc_id < 400
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT cand.new_id, cand.corpus_id, count(*) AS n_common
  FROM cand
  JOIN sh a ON a.doc_id = cand.new_id
  JOIN sh b ON b.doc_id = cand.corpus_id AND a.shingle = b.shingle
  GROUP BY 1, 2
), ver AS (
  SELECT new_id, corpus_id,
         round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = new_id
  JOIN sizes sb ON sb.doc_id = corpus_id
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
), best AS (
  SELECT new_id, corpus_id, jaccard FROM (
    SELECT *, row_number() OVER (
      PARTITION BY new_id ORDER BY jaccard DESC, corpus_id
    ) AS rn FROM ver
  ) WHERE rn = 1
)
SELECT i.doc_id,
  CASE WHEN cfp.exact_match IS NOT NULL THEN 'exact_dup'
       WHEN best.corpus_id IS NOT NULL THEN 'near_dup'
       ELSE 'new' END AS status,
  coalesce(cfp.exact_match, best.corpus_id) AS match_id,
  CASE WHEN cfp.exact_match IS NULL THEN best.jaccard END AS jaccard
FROM ifp i
LEFT JOIN cfp USING (fp)
LEFT JOIN best ON best.new_id = i.doc_id
"""


def prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs (word-3-gram-shingle Jaccard >= 0.6) by
    frequency-ordered prefix filtering — no all-pairs stage on the Spark
    side; the oracle IS the brute-force all-pairs join, which is exactly the
    point: prefix filtering must reproduce it verbatim (no false negatives),
    unlike the probabilistic LSH family."""
    from quantms_utils_spark.operators.dedup import prefix_filter_pairs

    d = load(spark, sf_dir, "documents")
    return prefix_filter_pairs(d, "doc_id", "text", threshold=0.6, shingle_n=3)


PREFIX_PAIRS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.6
"""


def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup QA: the near-dup CLUSTER SIZE DISTRIBUTION — the first
    diagnostic run after any dedup campaign (a fat tail means boilerplate /
    template explosions; dup_excess totals the removable documents). Two
    bounded aggregates on top of the component labels: components → sizes →
    histogram; output is at most max-cluster-size rows."""
    cc = minhash_clusters(spark, sf_dir)
    sizes = cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                "dup_excess"
            ),
        )
    )


CLUSTER_SIZE_HISTOGRAM_SQL = f"""
WITH cc AS ({MINHASH_CLUSTERS_SQL}),
sizes AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
  FROM cc GROUP BY cluster
)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * count(*) AS BIGINT) AS dup_excess
FROM sizes GROUP BY cluster_size
"""


def lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-QA: candidate-quality report for MinHash-LSH against EXACT
    ground truth (the `ann_recall_report` pattern applied to near-dup
    detection). Truth = all pairs with word-3-gram Jaccard ≥ 0.5, computed
    by the exact prefix-filter join (never all-pairs on the Spark side);
    candidates = the banding pairs BEFORE verification. One row:
    candidate/truth/hit counts with precision (how much verify work is
    wasted on non-dups) and recall (what the bands miss — the number that
    picks band geometry). All counts fold to one-row dims crossed together;
    no collect."""
    from quantms_utils_spark.operators.dedup import prefix_filter_pairs

    d = load(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    truth = prefix_filter_pairs(
        d, "doc_id", "text", threshold=0.5, shingle_n=3
    ).select("doc_a", "doc_b")
    c1 = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    t1 = truth.agg(F.count(F.lit(1)).alias("n_true"))
    h1 = cand.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        c1.crossJoin(t1)
        .crossJoin(h1)
        .select(
            "n_candidates",
            "n_true",
            "n_hits",
            F.round(
                F.col("n_hits") / F.col("n_candidates").cast("double"), 6
            ).alias("precision"),
            F.round(F.col("n_hits") / F.col("n_true").cast("double"), 6).alias(
                "recall"
            ),
        )
    )


LSH_RECALL_REPORT_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
), sig AS (
  SELECT doc_id,
    {{sig_cols}}
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, b, CASE b {{band_case}} END AS bucket
  FROM sig, UNNEST([{{band_ids}}]) AS t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2
    ON a.b = b2.b AND a.bucket = b2.bucket AND a.doc_id < b2.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
), c AS (SELECT count(*) AS n_candidates FROM cand),
t AS (SELECT count(*) AS n_true FROM truth),
h AS (SELECT count(*) AS n_hits FROM cand JOIN truth USING (doc_a, doc_b))
SELECT n_candidates, n_true, n_hits,
       round(n_hits / CAST(n_candidates AS DOUBLE), 6) AS precision,
       round(n_hits / CAST(n_true AS DOUBLE), 6) AS recall
FROM c, t, h
""".format(
    sig_cols=_minhash_sig_sql_columns(),
    band_case=_BAND_CASE,
    band_ids=", ".join(str(b) for b in range(N_HASHES // BAND_SIZE)),
)




def containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs (operators.dedup.containment_pairs,
    |A∩B|/|A| >= 0.8): the quote/subset detector symmetric Jaccard misses —
    a lifted paragraph scores near-zero Jaccard but containment ~1.
    Candidates from the df-capped inverted-shingle join (the documented
    cap contract: a pair overlapping only in ubiquitous shingles is not a
    candidate), exact intersection verify on candidates only. The oracle
    replicates BOTH stages, cap included."""
    from quantms_utils_spark.operators.dedup import containment_pairs

    d = load(spark, sf_dir, "documents")
    return containment_pairs(
        d, "doc_id", "text", threshold=0.8, shingle_n=3, max_df=50
    )


CONTAINMENT_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM toks, UNNEST(generate_series(1, len(words) - 2)) AS t(i)
  WHERE len(words) >= 3
), dfreq AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
), rare AS (
  SELECT s.doc_id, s.shingle FROM sh s JOIN dfreq USING (shingle)
  WHERE df <= 50
), cand AS (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM rare a JOIN rare b USING (shingle)
  WHERE a.doc_id <> b.doc_id
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT c.ia, c.ib, count(*) AS nc
  FROM cand c
  JOIN sh a ON a.doc_id = c.ia
  JOIN sh b ON b.doc_id = c.ib AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT ia AS doc_small, ib AS doc_host,
       round(nc / CAST(sa.n AS DOUBLE), 4) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = ia
WHERE nc / CAST(sa.n AS DOUBLE) >= 0.8
"""




def simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS at Hamming ≤ 3 (operators.dedup.simhash_pairs):
    pigeonhole 16-bit banding makes candidates a band-value equi-join —
    exact for max_hamming < n_bands — and only candidates pay the
    bit_count(xor) verify. The oracle rebuilds the fingerprints with the
    HUGEINT nibble arithmetic of `dedup_simhash`, re-derives the bands with
    the same arithmetic-shift+mask, and replays the pigeonhole join."""
    from quantms_utils_spark.operators.dedup import simhash_pairs

    fps = simhash_fingerprints(spark, sf_dir)
    return simhash_pairs(fps, "doc_id", "simhash64", max_hamming=3, n_bands=4)


SIMHASH_PAIRS_SQL = """

WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), toks2 AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), hx AS (
  SELECT doc_id, substr(md5(tok), 1, 16) AS hex FROM toks2
), hv AS (
  -- big-endian uint64 of the first 8 md5 bytes, via per-nibble arithmetic
  SELECT doc_id,
    (SELECT sum((strpos('0123456789abcdef', substr(hex, i, 1)) - 1)::HUGEINT
                << (4 * (16 - i)))
     FROM generate_series(1, 16) g(i)) AS h
  FROM hx
), bits AS (
  SELECT doc_id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS s
  FROM hv, generate_series(0, 63) t(b)
), acc AS (
  SELECT doc_id, b, sum(s) AS a FROM bits GROUP BY 1, 2
), v AS (
  SELECT doc_id, sum(CASE WHEN a > 0 THEN 1::HUGEINT << b ELSE 0 END) AS u
  FROM acc GROUP BY doc_id
)
, fp AS (
  SELECT doc_id,
       CAST(CASE WHEN u >= (1::HUGEINT << 63) THEN u - (1::HUGEINT << 64)
                 ELSE u END AS BIGINT) AS simhash64
FROM v
), bands AS (
  SELECT doc_id, b, (simhash64 >> (16 * b)) & 65535 AS bv
  FROM fp, generate_series(0, 3) t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM bands a JOIN bands b2
    ON a.b = b2.b AND a.bv = b2.bv AND a.doc_id < b2.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fa.simhash64, fb.simhash64)) AS BIGINT) AS hamming
FROM cand
JOIN fp fa ON fa.doc_id = doc_a
JOIN fp fb ON fb.doc_id = doc_b
WHERE bit_count(xor(fa.simhash64, fb.simhash64)) <= 3
"""


QUERIES = {
    "dedup_simhash_pairs": (simhash_hamming_pairs, SIMHASH_PAIRS_SQL),
    "dedup_containment_pairs": (containment, CONTAINMENT_SQL),
    "dedup_lsh_recall_report": (lsh_recall_report, LSH_RECALL_REPORT_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_incremental": (incremental, INCREMENTAL_SQL),
    "dedup_ngram_jaccard": (ngram_jaccard, NGRAM_JACCARD_SQL),
    "dedup_minhash_signatures": (minhash_sigs, MINHASH_SIGS_SQL),
    "dedup_minhash_lsh_pairs": (minhash_lsh_pairs, MINHASH_LSH_PAIRS_SQL),

    "dedup_minhash_clusters": (minhash_clusters, MINHASH_CLUSTERS_SQL),
    "dedup_cluster_sizes": (cluster_size_histogram, CLUSTER_SIZE_HISTOGRAM_SQL),
    "dedup_lsh_verified": (lsh_verified, LSH_VERIFIED_SQL),
    "dedup_simhash": (simhash_fingerprints, SIMHASH_SQL),
    "dedup_prefix_pairs": (prefix_pairs, PREFIX_PAIRS_SQL),
}


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST dedup policy: within each near-dup cluster keep the
    highest-quality member (longest n_chars, id tie-break) instead of the
    min-id keeper the pipeline defaults to — the policy real curation
    runs (near-dup groups usually contain one full document and several
    truncated/boilerplate variants; min-id keeps an arbitrary one).
    Plan: cluster labels from the oracle-verified components, one
    broadcast-sized join back to document quality, one per-cluster
    row_number window (clusters are small — the window partition is a
    cluster, never the corpus). Output one row per cluster: keeper id,
    its quality, member count, removed count, and whether the policy
    DISAGREES with the min-id keeper (the visible consequence of the
    policy choice). The oracle replays closure + ranking."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    cc = minhash_clusters(spark, sf_dir)
    membered = cc.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = membered.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias(
                "kept_n_chars"
            ),
            F.count(F.lit(1)).alias("n_members"),
            (F.count(F.lit(1)) - 1).alias("n_removed"),
            F.min("doc_id").alias("_min_id"),
        )
        .select(
            "cluster",
            "kept_doc",
            "kept_n_chars",
            "n_members",
            "n_removed",
            (F.col("kept_doc") != F.col("_min_id")).alias("differs_from_min_id"),
        )
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH cc AS ({MINHASH_CLUSTERS_SQL}),
m AS (
  SELECT cc.cluster, cc.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY cc.cluster
                            ORDER BY d.n_chars DESC, cc.doc_id) AS rn
  FROM cc JOIN documents d ON cc.doc_id = d.doc_id
)
SELECT cluster,
       max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc,
       max(CASE WHEN rn = 1 THEN n_chars END) AS kept_n_chars,
       count(*) AS n_members,
       count(*) - 1 AS n_removed,
       max(CASE WHEN rn = 1 THEN doc_id END) <> min(doc_id)
         AS differs_from_min_id
FROM m GROUP BY cluster
"""

QUERIES["dedup_keep_best"] = (dedup_keep_best, DEDUP_KEEP_BEST_SQL)
