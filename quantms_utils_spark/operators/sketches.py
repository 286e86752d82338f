"""Probabilistic membership / frequency sketches as native Catalyst plans.

PySpark 4 does not expose ``bloom_filter_agg`` / ``count_min_sketch`` to the
public API (they are analyzer-internal), so both sketches are built from
first principles with DataFrame operators — which is the better shape anyway:
the "sketch" lives as a tiny DataFrame that broadcasts, every probe is a
codegen'd hash expression, and nothing round-trips through opaque JVM binary
blobs.

Scale contracts (the reason these exist next to the exact operators):

- **Bloom decontamination**: the benchmark side collapses to its set of SET
  BIT POSITIONS (≤ n_hashes × |bench grams| longs — KBs to low MBs for real
  eval suites, independent of corpus size) and is broadcast. The 100 TB
  corpus side is a map-only n-gram explode probed by a broadcast-hash join;
  only HIT positions ever shuffle. False positives are bounded by the m-bit
  position space; false negatives are impossible — and that one-sided
  guarantee is exactly what the oracle checks.
- **Count-Min frequency sketch**: the corpus reduces to depth × width
  counter cells via one map-side-combinable aggregate — a fixed-size
  mergeable summary (the property that makes CMS the streaming/100 TB
  frequency structure). Estimates only ever OVER-count (est ≥ exact,
  est ≤ exact + e/width · N w.h.p.), and those two inequalities are the
  oracle-checked contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_positions(col: Column, n_hashes: int, n_bits: int) -> Column:
    """The ``n_hashes`` Bloom bit positions of a value as an array<long>.

    Independent hash functions come from seeding xxhash64 with the hash
    index (an extra literal column changes the digest), the classic
    k-independent-hash construction. Pure codegen — no Python, no shuffle.

    NULL values hash on the seed alone (Spark's xxhash64 skips NULL
    inputs), so every NULL collides into one synthetic member — callers
    probing nullable columns should filter or coalesce first.
    """
    if n_hashes <= 0 or n_bits <= 0:
        raise ValueError("n_hashes and n_bits must be positive")
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )


def bloom_bit_positions(
    values: DataFrame, value_col: str, n_hashes: int, n_bits: int
) -> DataFrame:
    """The sparse Bloom filter of ``values``: the distinct set of SET bit
    positions (column ``bloom_pos`` long). Equivalent to an m-bit Bloom
    bitmap — membership(v) ⇔ all of v's positions appear here — but stored
    sparsely so it stays a broadcastable DataFrame instead of a binary blob.
    """
    return (
        values.select(
            F.explode(
                hash_positions(F.col(value_col), n_hashes, n_bits)
            ).alias("bloom_pos")
        )
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_hashes: int,
    n_bits: int,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Probe every ``probes`` row's ``value_col`` against a sparse Bloom
    filter (from :func:`bloom_bit_positions`). Returns the distinct
    ``key_cols`` rows with boolean ``out_col`` appended. ``key_cols`` must
    uniquely identify probe rows (a deterministic key, NOT
    ``monotonically_increasing_id`` — the probe plan is evaluated on both
    sides of a join, and a nondeterministic key would not line up).

    A value hits iff ALL ``n_hashes`` of its positions are set: its exploded
    positions inner-join the broadcast position set and the match count per
    key must equal ``n_hashes`` (duplicate positions from hash coincidence
    count each time, so the arithmetic stays exact). Only matching positions
    survive the join, so the count aggregate sees hit rows, not the corpus ×
    n_hashes.
    """
    keyed = probes.select(*key_cols, F.col(value_col).alias("_bloom_val"))
    matched = (
        keyed.select(
            *key_cols,
            F.explode(
                hash_positions(F.col("_bloom_val"), n_hashes, n_bits)
            ).alias("bloom_pos"),
        )
        .join(F.broadcast(bloom), "bloom_pos")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_bloom_matches"))
    )
    return (
        keyed.join(matched, key_cols, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("_bloom_matches"), F.lit(0)) == n_hashes,
        )
        .drop("_bloom_val", "_bloom_matches")
    )


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    ngram_n: int = 5,
    n_hashes: int = 3,
    n_bits: int = 1 << 20,
) -> DataFrame:
    """Approximate benchmark decontamination through a Bloom filter of the
    benchmark's word n-grams, with the exact overlap computed alongside so
    the filter's one-sided contract is a *checkable output*.

    Returns one row per ``train`` document:

    - ``n_overlap`` / ``contaminated`` — the exact results (same semantics
      as :func:`operators.text.decontaminate`).
    - ``bloom_overlap`` — how many of the document's distinct n-grams the
      Bloom filter flags (≥ ``n_overlap`` by construction).
    - ``bloom_no_false_negative`` — ``bloom_contaminated OR NOT
      contaminated``: constant TRUE unless the no-false-negative guarantee
      is broken. This (plus ``bloom_overlap >= n_overlap``) is what the
      DuckDB oracle asserts; the raw bloom counts themselves are
      hash-function-specific and intentionally not part of the compared
      output.

    At 100 TB the exact side is what you *drop* — the production plan keeps
    only the broadcast Bloom probe (map-only over the corpus). This operator
    keeps both so small-scale runs can certify the filter before the exact
    branch is switched off.
    """
    from quantms_utils_spark.operators.text import (
        normalized_tokens,
        word_ngrams,
    )

    def _grams(df: DataFrame, *cols: str) -> DataFrame:
        return df.select(
            *cols,
            F.explode(
                F.array_distinct(
                    word_ngrams(normalized_tokens(F.col(text_col)), ngram_n)
                )
            ).alias("g"),
        )

    bench_grams = _grams(benchmark).select("g").distinct()
    bloom = bloom_bit_positions(bench_grams, "g", n_hashes, n_bits)

    train_grams = _grams(train, id_col)
    probed = bloom_probe(
        train_grams, bloom, [id_col, "g"], "g", n_hashes, n_bits
    )
    exact_hits = train_grams.join(F.broadcast(bench_grams), "g").groupBy(
        id_col
    ).agg(F.count(F.lit(1)).alias("n_overlap"))
    bloom_hits = (
        probed.where(F.col("bloom_hit"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("bloom_overlap"))
    )
    n_ov = F.coalesce(F.col("n_overlap"), F.lit(0))
    b_ov = F.coalesce(F.col("bloom_overlap"), F.lit(0))
    return (
        train.select(id_col)
        .join(exact_hits, id_col, "left")
        .join(bloom_hits, id_col, "left")
        .select(
            id_col,
            n_ov.alias("n_overlap"),
            (n_ov > 0).alias("contaminated"),
            ((b_ov > 0) | ~(n_ov > 0)).alias("bloom_no_false_negative"),
            (b_ov >= n_ov).alias("bloom_covers_exact"),
        )
    )


def cms_build(
    tokens: DataFrame, token_col: str, depth: int, width: int
) -> DataFrame:
    """Count-Min sketch of the token stream as a (cms_row, cms_bucket,
    cms_cnt) cell table — at most ``depth × width`` rows regardless of
    corpus size, produced by ONE map-side-combinable aggregate (each
    occurrence contributes to exactly ``depth`` cells; partial aggregation
    collapses a partition to ≤ depth × width partials before any shuffle,
    which is the fixed-size-mergeable property that defines CMS).
    """
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                F.pmod(F.xxhash64(F.col(token_col), F.lit(i)), F.lit(width))
                .alias("cms_bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.cms_row").alias("cms_row"), F.col("c.cms_bucket").alias("cms_bucket"))
        .agg(F.count(F.lit(1)).alias("cms_cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int,
    width: int,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for each ``probes`` row: min over the
    sketch rows of the probed cell's count (0 for an absent cell — possible
    when the probe never occurred). The sketch table broadcasts (≤ depth ×
    width rows); the probe side explodes to ``depth`` cell lookups and
    re-aggregates by token, so the work is O(probes × depth), never a pass
    over the sketched corpus.
    """
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    cell_of = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                F.pmod(F.xxhash64(F.col(token_col), F.lit(i)), F.lit(width))
                .alias("cms_bucket"),
            )
            for i in range(depth)
        ]
    )
    exploded = probes.select(
        F.col(token_col), F.explode(cell_of).alias("c")
    ).select(
        token_col,
        F.col("c.cms_row").alias("cms_row"),
        F.col("c.cms_bucket").alias("cms_bucket"),
    )
    joined = exploded.join(
        F.broadcast(sketch), ["cms_row", "cms_bucket"], "left"
    )
    return joined.groupBy(token_col).agg(
        F.min(F.coalesce(F.col("cms_cnt"), F.lit(0))).alias(out_col)
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group KMV (k-minimum-values) sketch: the ``k`` smallest
    distinct ``xxhash64`` values of ``value_col``, as a sorted
    ``array<long>`` (signed ascending — the natural order of Spark's
    hash domain; estimators below account for the signed offset).

    KMV is the distinct-count sketch that, unlike HLL, supports SET
    INTERSECTION: the k smallest hashes of A ∪ B are a uniform sample
    of the union, so the fraction also present in both sketches
    estimates Jaccard — the "how much do these two corpora overlap"
    question exact joins can't answer at 100 TB and HLL can only
    inclusion-exclude with compounding error.

    Whale-safe two-level top-k (the pigeonhole pattern): distinct
    (group, hash) pairs are spread over ``n_buckets`` hash-derived
    buckets, a per-(group, bucket) ordered window keeps ≤ k each
    (every bucket partition holds ~1/n_buckets of even the largest
    group), then one bounded per-group fold (≤ n_buckets·k rows) sorts
    and slices the final k. No global window, no unbounded collect.

    Mergeability (pinned by test): ``kmv_merge`` of per-shard sketches
    is BIT-IDENTICAL to the sketch of the union — the k smallest of a
    union are always among the union of each side's k smallest.
    """
    if k <= 0 or n_buckets <= 0:
        raise ValueError("k and n_buckets must be positive")
    from pyspark.sql import Window

    h = F.xxhash64(F.col(value_col)).alias("_kmv_h")
    pairs = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(
        *group_cols, F.pmod(F.col("_kmv_h"), F.lit(n_buckets))
    ).orderBy("_kmv_h")
    survivors = (
        pairs.withColumn("_kmv_rn", F.row_number().over(w))
        .filter(F.col("_kmv_rn") <= k)
        .drop("_kmv_rn")
    )
    return survivors.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_list("_kmv_h")), 1, k).alias("kmv")
    )


def kmv_merge(df: DataFrame, group_cols: list[str], *, k: int) -> DataFrame:
    """Re-aggregate KMV sketches up a hierarchy (the rollup property):
    union the arrays, keep the k smallest distinct. Input needs a
    ``kmv`` column; output is one merged ``kmv`` per group."""
    return (
        df.select(*group_cols, F.explode("kmv").alias("_kmv_h"))
        .distinct()
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("_kmv_h")), 1, k).alias("kmv"))
    )


def kmv_distinct_estimate(kmv: Column, k: int) -> Column:
    """Distinct-count estimator from a KMV array: exact cardinality when
    the sketch is unsaturated (fewer than k values seen), else
    ``(k-1) / fraction-of-hash-space-covered-by-the-kth-minimum`` —
    the classic unbiased KMV estimator, with the signed-long domain
    shifted to [0, 1).

    Audited edge (r13): a k-th minimum of exactly ``-2**63`` makes
    ``kth_frac`` 0.0 and the estimate +Infinity (IEEE double division —
    no error even under ANSI mode). One hash value out of 2**64 triggers
    it, i.e. it is unreachable in practice and a saturated sketch whose
    k-th minimum is the domain minimum genuinely indicates ~2**64
    distinct values, so Infinity is not a misleading answer. NULL values
    hash on the seed alone (one synthetic member — same caveat as
    :func:`hash_positions`)."""
    kth_frac = (
        F.element_at(kmv, k).cast("double") - float(-(2**63))
    ) / float(2**64)
    return (
        F.when(F.size(kmv) < k, F.size(kmv).cast("double"))
        .otherwise((k - 1) / kth_frac)
        .alias("kmv_distinct")
    )


def kmv_jaccard(a: Column, b: Column, k: int) -> Column:
    """Jaccard estimate between two KMV sketches: the k smallest of the
    merged sketch are a uniform sample of A ∪ B; the fraction of that
    sample present in BOTH inputs estimates |A ∩ B| / |A ∪ B|. All
    native array expressions — no UDF."""
    merged = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    inter = F.size(F.array_intersect(F.array_intersect(merged, a), b))
    return (inter.cast("double") / F.size(merged)).alias("kmv_jaccard")


__all__ = [
    "hash_positions",
    "bloom_bit_positions",
    "bloom_probe",
    "bloom_decontaminate",
    "cms_build",
    "cms_estimate",
    "kmv_sketch",
    "kmv_merge",
    "kmv_distinct_estimate",
    "kmv_jaccard",
]
