"""Deduplication operators: shingling, MinHash, LSH banding, n-gram Jaccard,
SimHash.

All shingling/minhash/jaccard stages are pure Catalyst expressions (split /
transform / slice / md5 / groupBy-min) — they run inside whole-stage codegen
and combine map-side. SimHash needs per-token 64-bit bit-twiddling, which is
the one genuinely non-relational kernel here, so it is an Arrow-batched
Pandas UDF.

Scale notes: the shingle→signature aggregation is a single shuffle on the
document id; LSH banding replaces the O(n²) pair space with per-bucket
pairing, and the residual exact-Jaccard verify only runs on candidates.

Cache policy (round 11): multi-consumer intermediates (banded buckets,
fingerprint frames, rarity-ordered shingle arrays) are ``persist()``-pinned
for the columnar-compressed cache (dictionary/RLE batches — measured ~2.4×
faster than row-format localCheckpoint blocks on the shingle frames), and
their release is tied to the RETURNED frame's lifetime via
``weakref.finalize``: when the caller drops the result DataFrame, the
intermediates unpersist. Without that, ``persist`` registers the plan in
the session CacheManager, which holds a strong reference until an explicit
``unpersist()`` — a long-lived session calling the dedup family repeatedly
would accumulate corpus-scale storage blocks forever (ADVICE r10). The one
sharp edge: a caller that keeps only a DERIVED frame (``result.filter(…)``)
and drops the original loses the cache early — the derived query then
recomputes (correct, just single-pass no longer guaranteed); hold the
returned frame for the cache's lifetime, or control it explicitly with
``release_caches(df)`` / ``with cache_scope(df):`` (round 12, ADVICE r11).
"""

from __future__ import annotations

import contextlib
import hashlib
import re
import weakref

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType

from quantms_utils_spark.functions.core import let_once


def _release_on_drop(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` intermediates when ``result`` is
    garbage-collected (module cache policy): the cache lives exactly as
    long as the frame whose queries read it, so repeated operator calls in
    a long-lived session never accumulate CacheManager entries. The
    callback must not reference ``result`` (it would never die) and
    swallows teardown errors (session already stopped, interpreter
    shutdown)."""

    def _release(frames=cached) -> None:
        for c in frames:
            try:
                c.unpersist(False)
            except Exception:
                pass

    # Round 12 (ADVICE): keep the finalizer reachable from the result so
    # callers get an EXPLICIT lifetime API too — release_caches(df) /
    # cache_scope(df) — instead of depending on GC timing of the exact
    # returned wrapper (the idiomatic rebind ``pairs = pairs.filter(…)``
    # drops the cache before any action otherwise).
    result._pinned_cache_finalizer = weakref.finalize(result, _release)
    return result


def release_caches(df: DataFrame) -> bool:
    """Explicitly unpersist the intermediates a dedup operator pinned for
    ``df``. Idempotent. Returns True when this call performed the release,
    False when the caches were already released.

    A frame that never carried a pinned cache — typically a DERIVED frame
    (``pairs.filter(...)``) passed in place of the operator's actual
    return value — also returns False, but additionally emits a
    ``RuntimeWarning`` (ADVICE r13): silently treating a mis-targeted
    release as "already released" would leak the CacheManager entries
    until GC with no signal. Pass the operator's return value itself, or
    use :func:`cache_scope`. Use after the last action over ``df`` or any
    frame derived from it."""
    fin = getattr(df, "_pinned_cache_finalizer", None)
    if fin is None:
        import warnings

        warnings.warn(
            "release_caches: this DataFrame carries no pinned cache "
            "finalizer — it is probably a frame DERIVED from a dedup "
            "operator's result rather than the result itself, so the "
            "operator's caches were NOT released. Call release_caches on "
            "the frame the operator returned (or wrap it in cache_scope).",
            RuntimeWarning,
            stacklevel=2,
        )
        return False
    was_alive = fin.alive
    fin()
    return was_alive


@contextlib.contextmanager
def cache_scope(df: DataFrame):
    """Context manager pinning a dedup result's caches for the block's
    duration — the safe way to derive-and-rebind without losing the
    single-pass guarantee::

        with cache_scope(lsh_candidate_pairs(sigs, "id", 16, 4)) as pairs:
            strong = pairs.filter("jaccard > 0.9").collect()
            weak = pairs.filter("jaccard <= 0.9").count()
        # caches released here, regardless of rebinds inside the block

    Raises ``ValueError`` up front when ``df`` carries no pinned cache
    (ADVICE r13): scoping a derived/rebound frame would silently release
    nothing, which is exactly the mistake the context manager exists to
    prevent.
    """
    if getattr(df, "_pinned_cache_finalizer", None) is None:
        raise ValueError(
            "cache_scope: the DataFrame carries no pinned cache finalizer "
            "— pass the dedup operator's return value itself, not a frame "
            "derived from it."
        )
    try:
        yield df
    finally:
        release_caches(df)


def _fan_out(df: DataFrame) -> DataFrame:
    """Shingling is CPU-bound; a small-file scan (one parquet row group)
    gives one partition and serializes it. Fan out to the session's
    parallelism — but never *reduce* an already well-partitioned input (the
    100 TB case, where the scan arrives with far more partitions than
    cores)."""
    sc = df.sparkSession.sparkContext
    # Estimate scan parallelism from the file listing instead of
    # df.rdd.getNumPartitions() — the RDD conversion forces a full
    # plan-to-RDD translation just to read a number. One file can hold many
    # splits, so this only *under*-counts; the guard errs toward fanning out,
    # and never reduces a many-file (100 TB) scan.
    n_files = len(df.inputFiles())
    if n_files < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    return df


def _words_expr(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _grams_expr(text_col: str, n: int):
    """Word n-gram array (with duplicates) — the ONE tokenizer shared by the
    signature path and the exact-jaccard verify path; they must agree for
    the LSH pipeline to be sound.

    The word array is let-bound (``let_once``) so the regex split runs once
    per row — referenced directly inside the transform lambda it would be
    re-split per gram, O(words²) regex work per document (HOF lambdas are
    interpreted and re-evaluate captured sub-expressions per element)."""

    def _grams(words: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
        return F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))

    return let_once(_words_expr(text_col), _grams)


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle) rows.

    Documents with fewer than ``n`` words produce no rows (consistent with the
    DuckDB oracle formulation).
    """
    df = _fan_out(df)
    return (
        df.filter(F.size(_words_expr(text_col)) >= n)
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(_grams_expr(text_col, n))).alias("shingle"),
        )
    )


HASHES_PER_SEED = 4  # four 8-hex-char (32-bit) minhashes carved per md5


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """k MinHash signature columns ``sig_0..sig_{k-1}`` per document.

    Hash families:
    - ``"md5"`` (oracle-parity): each seeded ``md5(seed || '|' || shingle)``
      yields FOUR independent 32-bit minhashes (its four disjoint 8-hex-char
      windows), so k hashes cost ceil(k/4) md5 evaluations per shingle.
      Deterministic and reproducible in any engine with md5/substr, which is
      what lets the DuckDB oracle verify the full pipeline rather than a mock.
    - ``"xxhash64"`` (the default): k seeded
      xxhash64 evaluations per shingle — xxHash is an order of magnitude
      cheaper per byte than md5 and stays inside whole-stage codegen. Same
      signature contract (sig columns are longs instead of hex strings); the
      md5 variant oracle-checks the identical pipeline structure.

    Both are **map-only: no explode, no groupBy, NO SHUFFLE** — each
    document's signature is a pure per-row projection, min over its shingles'
    hashes via array_min(transform(...)). Duplicate shingles cannot change a
    min, so skipping distinct is exact; the equivalent explode+group-by (what
    the DuckDB oracle runs) returns identical values. At 100 TB this turns
    the signature stage into map-only work that pipelines into the banding
    aggregate's single shuffle. The shingle array is projected ONCE and
    referenced by every hash column — Catalyst's CollapseProject keeps
    non-cheap aliases un-duplicated, so the text is tokenized once per row,
    not once per hash.
    """
    df = _fan_out(df)
    base = df.filter(F.size(_words_expr(text_col)) >= shingle_n).select(
        F.col(id_col), _grams_expr(text_col, shingle_n).alias("_shingles")
    )
    sh = F.col("_shingles")
    # NB: every F.transform lambda below must take exactly ONE parameter —
    # PySpark interprets a second parameter as the array-index column, which
    # would silently replace the captured loop variable.
    if hash_family == "xxhash64":
        # Each shingle STRING is hashed exactly once (string hashing is the
        # dominant cost); the k minhash functions are then derived
        # arithmetically as a universal family (a_j·h + b_j) mod p over the
        # 31-bit truncation — products stay < 2^62, so ANSI mode cannot
        # overflow. Same two-projection structure keeps the base hash array
        # from being re-computed per signature column.
        p31 = 2147483647  # 2^31 - 1 (Mersenne prime)
        rng_a = [2654435761 % p31, 805306457, 1610612741, 402653189,
                 1476919657, 94418953, 198491329, 593459183,
                 1222334449, 374761393, 668265263, 2246822519 % p31,
                 3266489917 % p31, 61348151, 146354983, 1013904223]
        rng_b = [1013904223, 374761393, 668265263, 94418953,
                 2654435761 % p31, 805306457, 1610612741, 402653189,
                 61348151, 146354983, 1476919657, 198491329,
                 593459183, 1222334449, 3266489917 % p31, 2246822519 % p31]
        if n_hashes > len(rng_a):
            raise ValueError(f"xxhash64 family supports up to {len(rng_a)} hashes")
        hashed = base.select(
            F.col(id_col),
            F.transform(
                sh, lambda g: F.xxhash64(g).bitwiseAND(F.lit(0x7FFFFFFF))
            ).alias("_h31"),
        )
        h31 = F.col("_h31")

        def _uni_sig(j: int):
            a, b = rng_a[j], rng_b[j]
            return F.array_min(
                F.transform(
                    h31, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(p31)
                )
            ).alias(f"sig_{j}")

        return hashed.select(
            F.col(id_col), *[_uni_sig(j) for j in range(n_hashes)]
        )
    if hash_family != "md5":
        raise ValueError(f"unknown hash_family {hash_family!r}")
    n_seeds = -(-n_hashes // HASHES_PER_SEED)

    def _digest(s: int):
        return F.transform(
            sh, lambda g: F.md5(F.concat(F.lit(f"{s}|"), g))
        ).alias(f"h{s}")

    def _md5_sig(j: int):
        return F.array_min(
            F.transform(
                F.col(f"h{j // HASHES_PER_SEED}"),
                lambda x: F.substring(x, (j % HASHES_PER_SEED) * 8 + 1, 8),
            )
        ).alias(f"sig_{j}")

    with_digests = base.select(
        F.col(id_col), *[_digest(s) for s in range(n_seeds)]
    )
    return with_digests.select(
        F.col(id_col), *[_md5_sig(j) for j in range(n_hashes)]
    )


def band_buckets(
    sigs: DataFrame, id_col: str, n_hashes: int, band_size: int
) -> DataFrame:
    """(id, band, bucket) rows from banded MinHash signatures — the shared
    front half of self-pairing (``lsh_candidate_pairs``) and cross-set
    pairing (``lsh_cross_pairs``). All bands are generated in ONE posexplode
    pass; bucket hash family follows the signature dtype (md5 for hex string
    signatures, xxhash64 for longs)."""
    n_bands = n_hashes // band_size
    string_sigs = dict(sigs.dtypes).get("sig_0") == "string"
    if string_sigs:  # md5 family: bucket = md5 of the band's hex signatures
        band_hashes = F.array(
            *[
                F.md5(
                    F.concat(
                        *[F.col(f"sig_{b * band_size + r}") for r in range(band_size)]
                    )
                )
                for b in range(n_bands)
            ]
        )
    else:  # xxhash64 family: bucket = xxhash64 of the band's long signatures
        band_hashes = F.array(
            *[
                F.xxhash64(
                    *[F.col(f"sig_{b * band_size + r}") for r in range(band_size)]
                )
                for b in range(n_bands)
            ]
        )
    return sigs.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band", "bucket")
    )


def lsh_cross_pairs(
    sigs_new: DataFrame,
    sigs_corpus: DataFrame,
    id_col: str,
    n_hashes: int,
    band_size: int,
) -> DataFrame:
    """Cross-set LSH candidates: (new_id, corpus_id) pairs whose signatures
    collide in any band — the incremental-ingestion shape (a new shard
    against the standing corpus). Unlike self-banding this is an equi-JOIN on
    (band, bucket) between the two banded sides, so the corpus side can be a
    bucketed/pre-partitioned table written once and reused for every
    incoming shard — at 100 TB the corpus bands never reshuffle per shard.
    """
    new_b = band_buckets(sigs_new, id_col, n_hashes, band_size).select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    corp_b = band_buckets(sigs_corpus, id_col, n_hashes, band_size).select(
        F.col(id_col).alias("corpus_id"), "band", "bucket"
    )
    return new_b.join(corp_b, ["band", "bucket"]).select(
        "new_id", "corpus_id"
    ).distinct()


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    n_hashes: int,
    band_size: int,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs from banded MinHash signatures.

    Cache lifetime: intermediates stay persisted only while the RETURNED
    frame is alive — rebinding to a derived frame (``pairs =
    pairs.filter(…)``) releases them early and later actions recompute.
    Hold the returned frame, or use :func:`cache_scope` /
    :func:`release_caches` for explicit control.

    Bands are generated in ONE pass with posexplode (an array of band hashes
    per row) instead of an n_bands-way union — a union would re-evaluate the
    whole upstream shingle→signature pipeline once per band. Pairing is a
    single groupBy(band, bucket) + in-bucket pair explosion rather than a
    bucket self-join: one shuffle of the banded rows instead of two (a
    self-join shuffles the same data for both sides) and no persist/
    checkpoint of the signature pipeline. Bucket members are sorted, so
    emitted pairs already satisfy doc_a < doc_b; the final distinct collapses
    pairs that collide in several bands.

    Skew: a pathological hot bucket (k documents) emits k·(k-1)/2 pairs from
    one group — the classic LSH hot-bucket problem. The fix at scale is more
    rows per band (smaller buckets), not a skew-join hint, because the blowup
    is in the *output* cardinality, not the shuffle. ``max_bucket`` is the
    guard for the residual tail: buckets larger than it are dropped entirely
    (standard practice — a bucket every document falls into is
    non-discriminative hash noise, and near-identical members of a genuine
    mega-cluster still pair up in their other, smaller band buckets).
    ``None`` (the default) keeps every bucket, matching the SQL oracle.

    Round 10 (review): with ``max_bucket`` set, whale buckets are removed
    by a COUNT pre-pass (map-side-combinable, constant state per group)
    BEFORE the ``collect_list`` — the previous size filter ran after the
    aggregation, so a mega-duplicate cluster (millions of copies of one
    boilerplate page, the normal worst case in web corpora) still
    materialized its full member array in a single aggregation buffer.
    The count join lands on the banding shuffle's partitioning, so
    Catalyst reuses the exchange instead of adding one.
    """
    banded = band_buckets(sigs, id_col, n_hashes, band_size)
    pinned = []
    if max_bucket is not None:
        # two consumers (count pre-pass + bucket build) and ReuseExchange
        # does not fire across the pruned subtrees — persist so the
        # shingle→signature→banding pipeline runs once, spill-backed;
        # released when the returned frame is dropped (module cache policy)
        banded = banded.persist()
        pinned.append(banded)
        sizes = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter((F.col("_bn") >= 2) & (F.col("_bn") <= max_bucket))
            .select("band", "bucket")
        )
        banded = banded.join(sizes, ["band", "bucket"])
    buckets = (
        banded
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids) - i - F.lit(1)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return _release_on_drop(
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct(),
        *pinned,
    )


def winnow_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_shared: int = 2,
    max_df: int = 50,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs from winnowing (MOSS) fingerprints:
    documents sharing ≥ ``min_shared`` window-min fingerprints, with the
    shared count per pair. ``hash_family`` mirrors ``minhash_signatures``:
    xxhash64 is the performance default; the correctness query pins "md5"
    so the DuckDB oracle can re-derive every fingerprint.

    Cache lifetime: intermediates stay persisted only while the RETURNED
    frame is alive — rebinding to a derived frame releases them early and
    later actions recompute. Hold the returned frame, or use
    :func:`cache_scope` / :func:`release_caches`.

    Positional complement to MinHash-LSH: winnowing guarantees any shared
    substring of length ≥ w + k - 1 characters yields a shared fingerprint,
    so contained/partial overlaps (quote plagiarism, boilerplate injection)
    surface even when whole-document Jaccard is low.

    Same single-shuffle shape as ``lsh_candidate_pairs``: one
    groupBy(fingerprint) + in-bucket pair explosion, then a pair-count
    aggregate — never a fingerprint self-join. Fingerprints whose document
    frequency exceeds ``max_df`` are dropped before pairing (the stop-shingle
    cut): a corpus-wide boilerplate fingerprint would otherwise emit
    O(df²) pairs from one bucket — the cap bounds the worst bucket at
    ``max_df``² and loses only evidence that is, by construction, shared by
    *everything* (no dedup signal).

    Round 10 (review): the ``max_df`` cut runs as a COUNT pre-pass before
    the ``collect_list`` (same hardening as ``lsh_candidate_pairs``) — a
    corpus-wide boilerplate fingerprint previously materialized its whole
    O(corpus) member array in one aggregation buffer before the size
    filter dropped it. The fingerprint frame now feeds two consumers
    (count pre-pass + bucket build) and Catalyst's ReuseExchange does NOT
    fire across them (column pruning makes the subtrees differ), so it is
    pinned (persist, released with the returned frame per the module
    cache policy) — winnowing runs
    once, spill-backed, the same discipline as
    ``_prefix_candidates``/``simhash_pairs``.
    """
    from quantms_utils_spark.operators.text import winnow_fingerprints

    df = _fan_out(df)
    # winnow_fingerprints is array_distinct per doc, so explode is already
    # one row per (doc, fingerprint) — no extra distinct needed
    fps = df.select(
        F.col(id_col),
        F.explode(
            winnow_fingerprints(F.col(text_col), hash_family=hash_family)
        ).alias("fp"),
    ).persist()
    sizes = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_fn"))
        .filter((F.col("_fn") >= 2) & (F.col("_fn") <= max_df))
        .select("fp")
    )
    buckets = (
        fps.join(sizes, "fp")
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids) - i - F.lit(1)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return _release_on_drop(
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared),
        fps,
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs above threshold.

    Quadratic in per-shingle document frequency — at scale, feed it LSH
    candidates (``lsh_candidate_pairs``) instead of a whole corpus.
    """
    sh = word_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@F.pandas_udf(LongType())
def simhash(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over lowercase whitespace tokens (md5-derived token
    hashes), returned as a signed long. Arrow-batched; numpy bit-count inner
    loop per batch."""
    import numpy as np

    def one(text: str | None):
        if text is None:
            return None
        tokens = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        if not tokens:
            return 0
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
                for t in tokens
            ),
            dtype=np.uint64,
            count=len(tokens),
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)
        v = np.uint64(0)
        for b in range(64):
            if acc[b] > 0:
                v |= np.uint64(1) << np.uint64(b)
        return int(v.astype(np.int64))

    return texts.map(one)


def jaccard_for_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact word-n-gram Jaccard for a GIVEN candidate-pair set — the verify
    stage after LSH: cost is O(|pairs| × doc length), never corpus². Each
    document's distinct shingle set is aggregated once (array per doc) and
    joined to both pair sides; the intersection is a per-row array op.
    Returns (doc_a, doc_b, jaccard ≥ threshold)."""
    sh = word_shingles(docs, id_col, text_col, n)
    sets_ = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("sh_set"))
    a = sets_.select(F.col(id_col).alias("doc_a"), F.col("sh_set").alias("sa"))
    b = sets_.select(F.col(id_col).alias("doc_b"), F.col("sh_set").alias("sb"))
    # LEFT joins + empty-set defaults: a candidate doc too short to shingle
    # must come back as jaccard 0, not silently vanish from the verify output
    # (the contract is one output row per input pair passing the threshold).
    empty = F.array().cast("array<string>")
    sa = F.coalesce(F.col("sa"), empty)
    sb = F.coalesce(F.col("sb"), empty)
    inter = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.join(a, "doc_a", "left")
        .join(b, "doc_b", "left")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(jac >= threshold)
    )


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation: every vertex
    converges to the smallest vertex id reachable from it — the step that
    turns near-dup candidate PAIRS into dedup CLUSTERS (keeper = cluster id).

    Per iteration: push each vertex's label across all edges, take the min of
    (own label, incoming labels). Iterations = graph diameter; dedup graphs
    are unions of small cliques, so 2-3 rounds in practice. Each round
    ``localCheckpoint``s the label frame — iterative self-joins otherwise
    stack lineage until planning itself dominates. Convergence is detected by
    a double hash-sum fingerprint of the (vertex, label) assignment (one
    cheap agg — no extra join; stable across rounds iff the assignment is).
    For graphs with whale components at 100 TB scale use
    ``connected_components_star`` (same return contract), which converges in
    O(log² n) rounds regardless of diameter.

    Returns (v, label) — vertex id → component id (min member id).
    """
    # Materialize the edge list ONCE — it is referenced by every iteration's
    # join, and without the checkpoint each iteration would re-execute the
    # whole upstream pipeline that produced the edges (e.g. the LSH pair
    # generation), turning an O(diameter) loop into O(diameter × pipeline).
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )
    # Round 1 fused into initialization: with identity labels the first
    # propagation is just an edge rename (label(v) = min(v, min neighbor)),
    # so it needs a groupBy but no join. Every vertex appears on the `a`
    # side of the symmetric edge frame, so the identity branch covers all.
    labels = (
        sym.select(F.col("b").alias("v"), F.col("a").alias("label"))
        .unionByName(sym.select(F.col("a").alias("v"), F.col("a").alias("label")))
        .groupBy("v")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=False)
    )
    # Convergence signal must work for ANY vertex id type (string/uuid
    # ids are normal for a generic operator): sum the labels' xxhash64,
    # not the labels themselves — summing strings casts to null and
    # would terminate the loop after one iteration with split
    # components. The hashes are summed as decimal so ANSI mode cannot
    # overflow. Round-7 hardening (VERDICT r6 watch): the probe hashes
    # the full (v, label) ASSIGNMENT and carries TWO independently-seeded
    # sums in one aggregate — spurious early termination now needs two
    # simultaneous 64-bit collisions across the whole frame (~2^-128),
    # at zero extra jobs.
    def _label_sum(lbl: DataFrame):
        row = lbl.agg(
            F.sum(F.xxhash64("v", "label").cast("decimal(38,0)")).alias("h1"),
            F.sum(
                F.xxhash64(F.lit(0x9E3779B9), "v", "label").cast(
                    "decimal(38,0)"
                )
            ).alias("h2"),
        ).first()
        return (row["h1"], row["h2"])

    prev_sum = _label_sum(labels)  # materializes the fused first round
    # Pre-loop fixpoint (ADVICE r6): an empty edge set yields an empty
    # label frame (sums = null) — trivially converged; without this guard
    # max_iter=0 (or any no-op loop) would raise on correct output.
    converged = prev_sum == (None, None)
    for _ in range(max_iter):
        if converged:
            break
        # Lazy checkpoints: the convergence probe below is the action that
        # materializes each round's label frame — one job per round instead
        # of an eager-checkpoint job plus the probe.
        msgs = sym.join(labels, sym.a == labels.v).select(
            F.col("b").alias("v"), F.col("label")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        cur_sum = _label_sum(new_labels)
        labels = new_labels
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # non-converged labels are WRONG cluster assignments (not merely a
        # superset) — fail loudly rather than return them (round-6, same
        # contract as k_core / tree_depths). Rounds needed = component
        # diameter; use connected_components_star for high-diameter graphs.
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (rounds needed = component diameter); raise max_iter or "
            "use connected_components_star (O(log^2 n) rounds)"
        )
    return labels


def _sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetric, self-loop-free, distinct (u, v) edge frame."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_fingerprint(e: DataFrame):
    """(count, hash-sum, seeded hash-sum) convergence fingerprint of an
    edge set — works for any orderable id type; decimal sums so ANSI mode
    cannot overflow. Two independently-seeded sums (round-7): a spurious
    match needs two simultaneous 64-bit collisions (~2^-128), same single
    aggregate job."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        F.sum(
            F.xxhash64(F.lit(0x9E3779B9), "u", "v").cast("decimal(38,0)")
        ).alias("h2"),
    ).first()
    return row["n"], row["h"], row["h2"]


def connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    100 TB form of ``connected_components``: converges in O(log² n) rounds
    REGARDLESS of component diameter, where min-label propagation needs
    O(diameter) rounds and a whale component (a single giant near-clique, the
    normal shape of a web-scale dup graph) makes that unbounded.

    Each round is two hash aggregations + two joins on the node id — no
    ``collect_list`` anywhere, so a whale's neighbor set is never
    materialized in one row (the aggregate is a plain ``min``).

    - large-star: every node v > u links to m = min(N(u) ∪ {u}) — hangs
      larger neighbors under the local minimum.
    - small-star: every node v ≤ u (plus u itself) links to that minimum —
      flattens chains of smaller ids.

    At the fixed point every non-root node has exactly one edge, to its
    component minimum. Returns (v, label), identical contract to
    ``connected_components``.
    """
    e = _sym(edges, src, dst).localCheckpoint()
    # Self-loop vertices captured UP FRONT (ADVICE r7): building this frame
    # from the original `edges` after the loop would re-execute the full
    # upstream edge pipeline (e.g. LSH pair generation) on every action over
    # the labels — the recomputation the checkpoint on `e` exists to avoid.
    # eager=False: the frame is usually empty and only pays when the final
    # union actually runs.
    loops = (
        edges.filter(F.col(src) == F.col(dst))
        .select(F.col(src).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Pre-loop fixpoint (ADVICE r6): an empty (or self-loop-only) edge set
    # is trivially converged — labels/roots over an empty frame are
    # correct, and max_iter=0 must not raise on them.
    prev = _edge_fingerprint(e)
    converged = prev[0] == 0
    for _ in range(max_iter):
        if converged:
            break
        # ---- large-star ---------------------------------------------------
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star ---------------------------------------------------
        directed = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins2 = directed.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            directed.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        e = small
        cur = _edge_fingerprint(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in max_iter="
            f"{max_iter} rounds (O(log^2 n) expected — this indicates a "
            "pathological input or too-small max_iter)"
        )

    # Fixed point: e holds (node, component-min) for every non-root node.
    # greatest/least in small-star guarantee v < u, so roots never appear
    # on the left side.
    labels = e.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias("v"), "label"
    )
    roots = (
        e.select(F.col("v")).distinct()
        .join(e.select(F.col("u").alias("v")).distinct(), "v", "left_anti")
        .withColumn("label", F.col("v"))
    )
    out = labels.unionByName(roots)
    # Contract parity with connected_components (round-7 review): _sym
    # drops self-loops, so a vertex appearing ONLY in self-loops would
    # vanish here while min-label returns it labeled as itself. Complete
    # the vertex set from the (usually empty) self-loop frame captured and
    # checkpointed before the loop — one anti-join, no per-round cost, and
    # no re-execution of the upstream edge pipeline (ADVICE r7).
    loop_only = (
        loops
        .join(out.select("v"), "v", "left_anti")
        .withColumn("label", F.col("v"))
    )
    return out.unionByName(loop_only)


def cluster_components(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    method: str = "auto",
    star_avg_degree: float = 4.0,
    max_iter: int = 50,
    _decision_out: list | None = None,
) -> DataFrame:
    """Connected components with automatic algorithm selection — the single
    entry point the dedup cluster queries use.

    ``method='auto'`` inspects the candidate graph with one cheap aggregate
    (edge count + approximate vertex count over the checkpointed edge list)
    and routes:

    - average degree ``2E/V >= star_avg_degree`` → large-star/small-star
      (``connected_components_star``): dense graphs are whale-component
      suspects (a web-scale dup graph's giant near-clique), where per-round
      min-label message volume is Θ(E) with E ~ V² and round count is
      unbounded by any local property; star rounds shrink degrees
      geometrically and converge in O(log² n) regardless of diameter.
    - sparser graphs → min-label propagation
      (``connected_components``): unions of small cliques/paths converge in
      2-3 rounds with lighter per-round plans.

    Both produce the identical (v, label = min reachable id) contract, so
    the choice is invisible to callers and oracles. ``method`` may pin
    ``'minlabel'`` or ``'star'``; ``_decision_out`` is a test seam that
    records the routed method.
    """
    if method not in ("auto", "minlabel", "star"):
        raise ValueError(f"unknown method {method!r}")
    chosen = method
    if method == "auto":
        e = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).localCheckpoint()
        stats = e.select(F.explode(F.array("u", "v")).alias("n")).agg(
            F.count(F.lit(1)).alias("deg_sum"),
            F.approx_count_distinct("n").alias("n_vertices"),
        ).first()
        avg_degree = (
            stats["deg_sum"] / stats["n_vertices"] if stats["n_vertices"] else 0.0
        )
        chosen = "star" if avg_degree >= star_avg_degree else "minlabel"
        edges = e  # reuse the materialized edge list downstream
        src, dst = "u", "v"
    if _decision_out is not None:
        _decision_out.append(chosen)
    if chosen == "star":
        return connected_components_star(edges, src, dst, max_iter=max_iter)
    return connected_components(edges, src, dst, max_iter=max_iter)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the minimum-id row per exact content fingerprint.

    NULL-text rows pass through untouched (round 10 review): their
    fingerprint is NULL, and grouping them would silently drop all but
    one row whose contents are UNKNOWN, not known-equal — the same
    silent-data-loss class as the round-9 curation keeper-join fix."""
    fp = F.md5(F.col(text_col))
    keepers = (
        df.select(F.col(id_col), fp.alias("fp"))
        .filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keepers, id_col, "left_semi").unionByName(
        df.filter(F.col(text_col).isNull())
    )


def incremental_dedup(
    corpus: DataFrame,
    incoming: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_family: str = "md5",
) -> DataFrame:
    """Incremental-ingestion dedup: classify every ``incoming`` document
    against the standing ``corpus`` as ``exact_dup`` (same normalized
    fingerprint), ``near_dup`` (best LSH-candidate with verified Jaccard ≥
    threshold), or ``new``. Returns (id, status, match_id, jaccard) with the
    deterministic best match (highest rounded Jaccard, then smallest corpus
    id); ``jaccard`` is null except for near-dups.

    This is the daily-shard shape: the corpus fingerprint set and banded
    signatures are computed once (in production: materialized and bucketed
    at write time) and each shard joins against them — the corpus never
    pays a self-join, and the per-shard cost is proportional to the shard,
    not the corpus. Caller guarantees disjoint id spaces.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    corp_fp = (
        corpus.select(F.md5(norm).alias("fp"), F.col(id_col).alias("cid"))
        .groupBy("fp")
        .agg(F.min("cid").alias("exact_match"))
    )
    inc = incoming.select(F.col(id_col), F.md5(norm).alias("fp"))
    exact = inc.join(corp_fp, "fp", "left").select(id_col, "exact_match")

    sig_kw = dict(
        n_hashes=n_hashes, shingle_n=shingle_n, hash_family=hash_family
    )
    cand = lsh_cross_pairs(
        minhash_signatures(incoming, id_col, text_col, **sig_kw),
        minhash_signatures(corpus, id_col, text_col, **sig_kw),
        id_col,
        n_hashes=n_hashes,
        band_size=band_size,
    )
    both = corpus.select(id_col, text_col).unionByName(
        incoming.select(id_col, text_col)
    )
    ver = jaccard_for_pairs(
        both,
        cand.select(F.col("new_id").alias("doc_a"), F.col("corpus_id").alias("doc_b")),
        id_col,
        text_col,
        n=shingle_n,
        threshold=threshold,
    )
    best = (
        ver.groupBy("doc_a")
        .agg(
            F.min(
                F.struct((-F.col("jaccard")).alias("nj"), F.col("doc_b").alias("mid"))
            ).alias("b")
        )
        .select(
            F.col("doc_a").alias(id_col),
            F.col("b.mid").alias("near_match"),
            (-F.col("b.nj")).alias("near_jaccard"),
        )
    )
    return (
        exact.join(best, id_col, "left")
        .select(
            id_col,
            F.when(F.col("exact_match").isNotNull(), F.lit("exact_dup"))
            .when(F.col("near_match").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.coalesce("exact_match", "near_match").alias("match_id"),
            F.when(F.col("exact_match").isNull(), F.col("near_jaccard")).alias(
                "jaccard"
            ),
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.6,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact similarity self-join via frequency-ordered prefix filtering —
    the AllPairs / PPJoin candidate-generation family (Bayardo et al.,
    WWW 2007; Xiao et al., PPJoin). Third candidate strategy next to
    MinHash-LSH (probabilistic) and winnowing (positional), and the only
    EXACT one: when both documents' shingle lists are sorted by the same
    global rarity order, any pair with shingle-set Jaccard >= threshold is
    guaranteed to collide on at least one prefix token (prefix length
    n - ceil(t*n) + 1), so the candidate set has no false negatives and the
    verified output is exactly the set of qualifying pairs.

    Scale shape: one shuffle to count global shingle document-frequency,
    one shuffle to rebuild rarity-sorted shingle arrays per document, one
    equi-join on prefix tokens (rarity ordering makes prefixes hit RARE
    shingles, so join buckets stay small — the whole point of the
    technique), then an O(candidates) verify with no re-tokenization
    (shingle arrays travel with the pair). Candidates are cut twice IN the
    join condition, before the distinct: the AllPairs length filter and the
    PPJoin positional filter (a collision at 1-based prefix positions i, j
    can witness at most ``1 + min(na-i, nb-j)`` overlapping shingles, which
    must reach the Jaccard-equivalent overlap floor
    ``ceil(t/(1+t)·(na+nb))`` — for a truly-qualifying pair its FIRST
    common token in rarity order always passes, so the filter drops only
    false candidates). No all-pairs comparison at any stage. Returns
    (doc_a, doc_b, jaccard) with jaccard rounded to 4.

    Known failure mode at scale (round-2 review): near-threshold corpora
    with low-rarity shared prefixes inflate candidate volume — keep
    ``threshold >= ~0.5`` on 100 TB corpora, or gate the run on
    :func:`estimate_prefix_candidates` first.

    Cache lifetime: intermediates stay persisted only while the RETURNED
    frame is alive — rebinding to a derived frame releases them early and
    later actions recompute. Hold the returned frame, or use
    :func:`cache_scope` / :func:`release_caches`.
    """
    cand, ordered, pinned = _prefix_candidates(
        df, id_col, text_col, threshold=threshold, shingle_n=shingle_n
    )
    sa = ordered.select(
        F.col("_id").alias("doc_a"), F.col("_toks").alias("_sa"), F.col("_n").alias("_na")
    )
    sb = ordered.select(
        F.col("_id").alias("doc_b"), F.col("_toks").alias("_sb"), F.col("_n").alias("_nb")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = inter / (F.col("_na") + F.col("_nb") - inter)
    return _release_on_drop(
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")),
        *pinned,
    )


def _prefix_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float,
    shingle_n: int,
):
    """Shared candidate generation for the AllPairs/PPJoin family: returns
    (candidate-pair frame, rarity-ordered per-document shingle frame,
    persisted-intermediate list for the caller to tie to ITS result via
    :func:`_release_on_drop` — releasing inside this helper would fire
    before the caller's query ever runs)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    # Document frequency via groupBy + join, NOT a window over the shingle
    # (round 10 review, same class as the retrieval max_df fix): WindowExec
    # buffers each partition group, so one corpus-wide stopword shingle
    # would funnel O(corpus) rows through a single task's buffer. The
    # groupBy is map-side combinable (constant state per shingle) and the
    # join streams the whale key. The shingle frame feeds both sides and
    # ReuseExchange does not fire across the pruned subtrees — persist so
    # the tokenize/explode chain runs once (the (id, shingle) asset a
    # materialized similarity index would hold anyway); released with the
    # caller's result frame per the module cache policy.
    sh = word_shingles(df, id_col, text_col, n=shingle_n).persist()
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (
        sh.join(dfc, "shingle")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("_toks")
        )
        .select(F.col(id_col).alias("_id"), "_toks", F.size("_toks").alias("_n"))
    )
    # The rarity-ordered frame feeds THREE consumers (prefix explode, verify
    # side A, verify side B) and Catalyst does not share subplans across a
    # self-join — without pinning, the shingle explode + df count/join +
    # collect_list chain executes three times (measured ~40% of the query).
    # MEMORY_AND_DISK, so a 100 TB corpus spills instead of failing; the
    # asset is (id, sorted shingles) — the same thing a materialized
    # similarity-index table would hold. Released with the caller's
    # result frame per the module cache policy.
    ordered = ordered.persist()
    plen = F.col("_n") - F.ceil(F.col("_n") * F.lit(threshold)).cast("int") + 1
    # The prefix token is ONLY an equi-join key from here on (the verify
    # stage recomputes the true intersection from the full string arrays),
    # so hash it to 64 bits before the exploded frame shuffles twice into
    # the self-join (optimization round 13, guide §2.3 "narrower types"):
    # a ~25-byte shingle string becomes an 8-byte long, and the SMJ sorts/
    # compares longs instead of strings. Equal strings keep equal hashes —
    # no false negatives, so the exact-output guarantee is untouched; a
    # 64-bit collision can only ADD a candidate that exact verification
    # then drops.
    pref = ordered.select(
        "_id",
        "_n",
        F.posexplode(F.slice("_toks", F.lit(1), plen)).alias("_pos", "_ptok"),
    ).withColumn("_ptok", F.xxhash64("_ptok"))
    # overlap floor: J(a,b) >= t  <=>  |a∩b| >= t/(1+t) * (na+nb)
    # (tiny epsilon so FP noise cannot push an exact integer over its ceil)
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("pa._n") + F.col("pb._n"))
        - F.lit(1e-9)
    )
    # positional upper bound on overlap from this collision (positions are
    # 0-based from posexplode, so remaining-suffix length is _n - _pos - 1)
    ubound = F.lit(1) + F.least(
        F.col("pa._n") - F.col("pa._pos") - 1,
        F.col("pb._n") - F.col("pb._pos") - 1,
    )
    cand = (
        pref.alias("pa")
        .join(
            pref.alias("pb"),
            (F.col("pa._ptok") == F.col("pb._ptok"))
            & (F.col("pa._id") < F.col("pb._id"))
            & (F.col("pa._n") * threshold <= F.col("pb._n"))
            & (F.col("pb._n") * threshold <= F.col("pa._n"))
            & (ubound >= alpha),
        )
        .select(F.col("pa._id").alias("doc_a"), F.col("pb._id").alias("doc_b"))
        .distinct()
    )
    return cand, ordered, [sh, ordered]


def estimate_prefix_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.6,
    shingle_n: int = 3,
    fraction: float = 0.1,
    seed: int = 42,
) -> float:
    """Sample-based estimate of :func:`prefix_filter_pairs` candidate-pair
    volume — the pre-flight guard for the family's known failure mode
    (near-threshold corpora with low-rarity shared prefixes). Runs the
    identical candidate generation on a ``fraction`` document sample and
    scales by ``1/fraction²`` (a candidate pair survives sampling iff BOTH
    endpoints do). Cost is the sampled join only; at 100 TB a 1% sample
    prices the full run at 1/10,000th of its candidate cost before
    committing to it. Approximate on two counts: pair-survival sampling
    variance, and rarity order being recomputed on the sample."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    sample = df.sample(fraction=fraction, seed=seed)
    cand, _, pinned = _prefix_candidates(
        sample, id_col, text_col, threshold=threshold, shingle_n=shingle_n
    )
    try:
        n = cand.count()
    finally:
        # terminal action inside the operator: release eagerly, no
        # finalizer needed
        for c in pinned:
            c.unpersist(False)
    return n / (fraction * fraction)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    shingle_n: int = 3,
    max_df: int = 50,
) -> DataFrame:
    """ASYMMETRIC near-dup detection — containment |A∩B| / |A| ≥ threshold —
    the quote/subset case symmetric Jaccard misses by construction: a
    paragraph lifted into a much longer document scores near-zero Jaccard
    but containment 1.0. No length filter can prune candidates here (a tiny
    document may be contained in any large one), so candidate generation is
    the df-capped inverted-shingle join (the winnowing-family discipline):
    pairs must share at least one shingle with document frequency
    ≤ ``max_df``. That cap is the documented contract — a pair overlapping
    ONLY in ubiquitous shingles is not a candidate (and at threshold-worthy
    containment of a ≥ ``shingle_n``-word quote, rare shingles exist in
    practice). Verify computes the TRUE intersection over all shingles for
    candidates only.

    Directed output: (doc_small, doc_host, containment) — one row per
    ordered pair with containment of doc_small in doc_host. Two shuffles
    for candidates (df window + pair distinct), O(candidates) verify.

    Cache lifetime: intermediates stay persisted only while the RETURNED
    frame is alive — rebinding to a derived frame releases them early and
    later actions recompute. Hold the returned frame, or use
    :func:`cache_scope` / :func:`release_caches`.
    """
    # df cut via groupBy + semi-join, not a shingle window (round 10
    # review): a ubiquitous shingle would buffer O(corpus) rows in one
    # WindowExec task; the count aggregate combines map-side and the
    # semi-join streams. Three consumers (df count, semi-join probe, the
    # verify sets) and no cross-subtree reuse — persist the shingle frame
    # so tokenization runs once; released with the returned frame per the
    # module cache policy.
    sh = word_shingles(df, id_col, text_col, n=shingle_n).persist()
    rare_fps = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("shingle")
    )
    rare = sh.join(rare_fps, "shingle", "left_semi").select(id_col, "shingle")
    a = rare.select(F.col(id_col).alias("_ia"), "shingle")
    b = rare.select(F.col(id_col).alias("_ib"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("_ia") != F.col("_ib"))
        .select("_ia", "_ib")
        .distinct()
    )
    sets_ = sh.groupBy(id_col).agg(
        F.collect_set("shingle").alias("_set"),
        F.count(F.lit(1)).alias("_n"),
    )
    sa = sets_.select(
        F.col(id_col).alias("_ia"), F.col("_set").alias("_sa"),
        F.col("_n").alias("_na"),
    )
    sb = sets_.select(
        F.col(id_col).alias("_ib"), F.col("_set").alias("_sb")
    )
    inter = F.size(F.array_intersect("_sa", "_sb"))
    return _release_on_drop(
        cand.join(sa, "_ia")
        .join(sb, "_ib")
        .withColumn("containment", inter / F.col("_na"))
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("_ia").alias("doc_small"),
            F.col("_ib").alias("doc_host"),
            F.round("containment", 4).alias("containment"),
        ),
        sh,
    )


def simhash_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash64",
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs from 64-bit SimHash fingerprints at Hamming distance
    ≤ ``max_hamming`` via pigeonhole banding: split the fingerprint into
    ``n_bands`` equal bit bands — any pair within distance n_bands−1 must
    agree EXACTLY on at least one band (≤ n_bands−1 differing bits cannot
    touch every band), so candidates come from a band-value equi-join and
    only candidates pay the bit_count(xor) verify. Exact (no false
    negatives) whenever ``max_hamming < n_bands``; a larger budget needs
    more bands — enforced.

    The fingerprint frame feeds three consumers (banding + both verify
    sides) and Catalyst shares no subplans across a self-join, so it is
    pinned here (persist, released with the returned frame per the module
    cache policy) — for SimHash
    the upstream is an Arrow UDF over the whole corpus, the one thing you
    never want recomputed 3x.
    Arithmetic-shift + mask band extraction matches any engine's signed
    64-bit semantics, which is what lets the DuckDB oracle re-derive the
    bands from its HUGEINT-built fingerprints.
    """
    if max_hamming >= n_bands:
        raise ValueError(
            "pigeonhole banding needs max_hamming < n_bands (k differing "
            "bits can otherwise touch every band)"
        )
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    fps = fps.select(F.col(id_col), F.col(fp_col)).persist()
    bands = fps.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(fp_col), b * band_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("_b", "_bv"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x._b") == F.col("y._b"))
            & (F.col("x._bv") == F.col("y._bv"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    fa = fps.select(
        F.col(id_col).alias("doc_a"), F.col(fp_col).alias("_fa")
    )
    fb = fps.select(
        F.col(id_col).alias("doc_b"), F.col(fp_col).alias("_fb")
    )
    ham = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return _release_on_drop(
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"),
        fps,
    )
