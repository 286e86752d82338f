"""Cross-family MinHash/LSH tests.

The md5 family is the oracle-parity path (value-checked by DuckDB in
test_queries_oracle.py); the xxhash64 family is the production default
(one xxhash64 per shingle, k universal-family derivations). These tests pin
the contract between them: identical pipeline structure, identical *verified*
near-duplicate output, and the minhash collision property each family must
satisfy on its own.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.operators.dedup import (
    jaccard_for_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)

N_HASHES = 8
BAND_SIZE = 2


def _corpus(spark):
    rows = []
    # 5 clusters of 3 near-identical docs + 15 unrelated docs; each cluster
    # has a disjoint vocabulary so cross-cluster jaccard is exactly 0
    for c in range(5):
        stem = " ".join(f"c{c}word{i}" for i in range(25))
        rows.append((c * 10 + 0, stem))
        rows.append((c * 10 + 1, stem + " extra tail word"))
        rows.append((c * 10 + 2, "leading word " + stem))
    for i in range(15):
        words = " ".join(f"unique{i}w{j}" for j in range(25))
        rows.append((1000 + i, words))
    return spark.createDataFrame(rows, "doc_id int, text string")


def _verified_pairs(docs, family):
    sigs = minhash_signatures(
        docs, "doc_id", "text", n_hashes=N_HASHES, shingle_n=3,
        hash_family=family,
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", N_HASHES, BAND_SIZE)
    verified = jaccard_for_pairs(docs, pairs, "doc_id", "text", 3, 0.5)
    return {(r.doc_a, r.doc_b) for r in verified.collect()}


def test_families_find_identical_verified_dup_sets(spark):
    docs = _corpus(spark)
    md5_set = _verified_pairs(docs, "md5")
    xx_set = _verified_pairs(docs, "xxhash64")
    # every intra-cluster pair must be found; both families must agree
    expected = {
        (c * 10 + a, c * 10 + b)
        for c in range(5)
        for a, b in [(0, 1), (0, 2), (1, 2)]
    }
    assert md5_set == expected
    assert xx_set == expected


@pytest.mark.parametrize("family", ["md5", "xxhash64"])
def test_identical_texts_have_identical_signatures(spark, family):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),
         (3, "zeta eta theta iota kappa")],
        "doc_id int, text string",
    )
    sigs = minhash_signatures(
        docs, "doc_id", "text", n_hashes=N_HASHES, hash_family=family
    ).collect()
    by_id = {r.doc_id: tuple(r[f"sig_{j}"] for j in range(N_HASHES)) for r in sigs}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]


def test_xxhash64_signature_collision_tracks_jaccard(spark):
    # two docs sharing ~75% of shingles should collide on most sig columns;
    # two disjoint docs on none (up to rare 31-bit collisions).
    shared = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, shared), (2, shared + " x1 x2 x3"),
         (3, " ".join(f"z{i}" for i in range(30)))],
        "doc_id int, text string",
    )
    sigs = minhash_signatures(
        docs, "doc_id", "text", n_hashes=16, hash_family="xxhash64"
    ).collect()
    by_id = {r.doc_id: [r[f"sig_{j}"] for j in range(16)] for r in sigs}
    near = sum(a == b for a, b in zip(by_id[1], by_id[2]))
    far = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert near >= 8  # E[near] = 16 * J(1,2) ≈ 16 * 0.87
    assert far <= 2


def test_xxhash64_family_size_cap(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    with pytest.raises(ValueError, match="up to"):
        minhash_signatures(
            docs, "doc_id", "text", n_hashes=32, hash_family="xxhash64"
        )


def test_signatures_are_map_only(spark):
    """The signature stage must not shuffle: no Exchange in the plan."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id int, text string"
    )
    for family in ("md5", "xxhash64"):
        plan = minhash_signatures(
            docs, "doc_id", "text", n_hashes=8, hash_family=family
        )._jdf.queryExecution().executedPlan().toString()
        # a repartition from _fan_out is allowed; a hash/range exchange from
        # an aggregation is not
        assert "hashpartitioning" not in plan.lower()


def test_lsh_max_bucket_drops_hot_buckets(spark):
    # 30 identical docs -> every band bucket holds all 30 ids (hot bucket);
    # with max_bucket=10 those buckets are dropped and no pairs survive.
    df = spark.createDataFrame(
        [(i, "same words repeated over and over again here") for i in range(30)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(
        df, "doc_id", "text", n_hashes=N_HASHES, shingle_n=3, hash_family="xxhash64"
    )
    uncapped = lsh_candidate_pairs(sigs, "doc_id", N_HASHES, BAND_SIZE)
    assert uncapped.count() == 30 * 29 // 2
    capped = lsh_candidate_pairs(sigs, "doc_id", N_HASHES, BAND_SIZE, max_bucket=10)
    assert capped.count() == 0
    # small genuine clusters are untouched by the cap
    small = _corpus(spark)
    sigs2 = minhash_signatures(
        small, "doc_id", "text", n_hashes=N_HASHES, shingle_n=3,
        hash_family="xxhash64",
    )
    plain = lsh_candidate_pairs(sigs2, "doc_id", N_HASHES, BAND_SIZE)
    guarded = lsh_candidate_pairs(sigs2, "doc_id", N_HASHES, BAND_SIZE, max_bucket=10)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, guarded.collect()))


def test_incremental_dedup_classifies_exact_near_new(spark):
    from quantms_utils_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "unrelated corpus document with its own words"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            # exact dup of 1 (modulo case/whitespace normalization)
            (10, "  Alpha beta   gamma delta epsilon zeta eta THETA "),
            # near dup of 2: one word changed
            (11, "one two three four five six seven eight nine zzz"),
            # brand new vocabulary
            (12, "totally fresh content nothing shared at all here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in incremental_dedup(
            corpus, incoming, "doc_id", "text", threshold=0.3
        ).collect()
    }
    assert rows[10]["status"] == "exact_dup" and rows[10]["match_id"] == 1
    assert rows[10]["jaccard"] is None
    assert rows[11]["status"] == "near_dup" and rows[11]["match_id"] == 2
    assert rows[11]["jaccard"] and rows[11]["jaccard"] >= 0.3
    assert rows[12]["status"] == "new" and rows[12]["match_id"] is None


# --- prefix filtering (AllPairs / PPJoin family) -----------------------------


def _brute_force_pairs(rows, threshold, n=3):
    """All-pairs shingle-set Jaccard — the oracle the exact method must
    reproduce verbatim."""
    import itertools
    import re

    sets = {}
    for doc_id, text in rows:
        words = re.split(r"\s+", text.strip().lower())
        if len(words) < n:
            continue
        sets[doc_id] = {
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        }
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= threshold:
            out.add((a, b))
    return out


def test_prefix_filter_matches_brute_force(spark):
    from pyspark.sql import Row
    from quantms_utils_spark.operators.dedup import prefix_filter_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (4, "completely different words appear in this one"),
        (5, "totally unrelated content goes right here now"),
        (6, "completely different words appear in this text"),  # near-dup of 4
        (7, "ab"),  # under shingle size -> no shingles
    ]
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    for t in (0.4, 0.6, 0.9):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in prefix_filter_pairs(
                df, "doc_id", "text", threshold=t
            ).collect()
        }
        assert got == _brute_force_pairs(rows, t), f"threshold {t}"


def test_prefix_filter_jaccard_values(spark):
    from pyspark.sql import Row
    from quantms_utils_spark.operators.dedup import prefix_filter_pairs

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text="a b c d e"),
        ]
    )
    out = prefix_filter_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert len(out) == 1
    assert out[0]["jaccard"] == 1.0


def test_prefix_filter_threshold_validation(spark):
    import pytest
    from pyspark.sql import Row
    from quantms_utils_spark.operators.dedup import prefix_filter_pairs

    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError):
        prefix_filter_pairs(df, "doc_id", "text", threshold=0.0)


def test_estimate_prefix_candidates_tracks_truth(spark):
    """The sampled estimate lands within a small factor of the true
    candidate count (and at fraction=1.0 it IS the true count)."""
    from pyspark.sql import Row
    from quantms_utils_spark.operators.dedup import (
        _prefix_candidates,
        estimate_prefix_candidates,
    )

    # 9 shared tokens + 1 unique -> pairwise Jaccard 7/9: every pair is a
    # genuine candidate, the family's near-worst case
    rows = [
        Row(doc_id=i,
            text=f"the same nine shared tokens repeat across docs w{i}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    true_cand, _, pinned = _prefix_candidates(
        df, "doc_id", "text", threshold=0.5, shingle_n=3
    )
    truth = true_cand.count()
    for c in pinned:
        c.unpersist(False)
    assert truth > 0

    exact = estimate_prefix_candidates(
        df, "doc_id", "text", threshold=0.5, fraction=1.0
    )
    assert exact == truth

    est = estimate_prefix_candidates(
        df, "doc_id", "text", threshold=0.5, fraction=0.5, seed=7
    )
    assert truth / 5 <= est <= truth * 5

    import pytest as _pytest
    with _pytest.raises(ValueError):
        estimate_prefix_candidates(df, "doc_id", "text", fraction=0.0)


def test_simhash_pairs_pigeonhole_exact(spark):
    """Constructed fingerprints: pairs within hamming<=3 are found exactly;
    a pair at distance 4 spread across all four bands is correctly absent
    from candidates; max_hamming >= n_bands is rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.dedup import simhash_pairs

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x123456789ABCDEF0
    rows = [
        (1, signed(base)),
        (2, signed(base ^ 0b101)),      # hamming 2, same band differs
        (3, signed(base ^ (1 << 63))),  # hamming 1 in the top band
        # hamming 4, one flipped bit in EACH 16-bit band -> no shared band
        (4, signed(base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48)))),
    ]
    fps = spark.createDataFrame(rows, "doc_id long, simhash64 long")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(fps, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 1
    assert got[(2, 3)] == 3
    assert (1, 4) not in got  # correct: distance 4 exceeds the budget
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(fps, max_hamming=4, n_bands=4)


def test_lsh_max_bucket_prunes_before_collect_list(spark):
    """Round-10 (review): with max_bucket set, whale buckets are removed by
    a COUNT pre-pass BEFORE collect_list materializes member arrays — the
    optimized plan must carry two aggregates over the banded rows (count
    prefilter + collect_list), and results stay identical to the
    post-filter semantics (pinned behaviorally in
    test_lsh_max_bucket_drops_hot_buckets)."""
    df = spark.createDataFrame(
        [(i, f"doc {i} words {i % 3} shared tail text here") for i in range(12)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(
        df, "doc_id", "text", n_hashes=N_HASHES, shingle_n=3,
        hash_family="xxhash64",
    )
    capped = lsh_candidate_pairs(
        sigs, "doc_id", N_HASHES, BAND_SIZE, max_bucket=10
    )
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("collect_list") == 1
    # the count prefilter exists and sits below the collect_list aggregate
    assert "count(1)" in plan
    cl, cnt = plan.index("collect_list"), plan.index("count(1)")
    assert cnt > cl  # optimizedPlan prints top-down: count is deeper


def test_exact_dedup_null_text_rows_pass_through(spark):
    """Round-10 (review): NULL-text rows have unknown, not known-equal,
    content — exact_dedup must keep ALL of them, not collapse them into
    one survivor through the NULL md5 group."""
    from quantms_utils_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None), (5, "x")],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect())
    assert got == [1, 3, 4, 5]


def test_prefix_and_containment_df_not_window_based(spark):
    """Round-10 (review): document frequency in the PPJoin and containment
    candidate generators runs as a map-side-combinable aggregate + join,
    never a shingle-partitioned window (whale-funnel class) — and the
    results are unchanged."""
    from quantms_utils_spark.operators.dedup import (
        containment_pairs,
        prefix_filter_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words in this one document"),
            (4, "the quick brown fox"),
        ],
        "doc_id long, text string",
    )
    pp = prefix_filter_pairs(docs, "doc_id", "text", threshold=0.5)
    ct = containment_pairs(docs, "doc_id", "text", threshold=0.9, max_df=10)
    for q in (pp, ct):
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan
    got_pp = {(r["doc_a"], r["doc_b"]) for r in pp.collect()}
    assert (1, 2) in got_pp
    got_ct = {(r["doc_small"], r["doc_host"]) for r in ct.collect()}
    assert (4, 1) in got_ct and (4, 2) in got_ct


def test_curation_exact_dedup_stage_is_aggregate_not_window(spark):
    """Round-10 (review): curate_corpus stage 2 dedups via one min_by
    aggregate (constant state per fingerprint group), not a fingerprint
    window that buffers whale duplicate clusters in one task."""
    from quantms_utils_spark.pipelines.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            (i, "common words shared by every copy of this page here", "web")
            for i in range(6)
        ]
        + [(10, "a unique document with its own distinct words inside", "web")],
        "doc_id long, text string, source string",
    )
    benchmark = spark.createDataFrame(
        [(99, "benchmark eval sentence sharing nothing with corpus pages",
          "eval")],
        "doc_id long, text string, source string",
    )
    out = curate_corpus(docs, benchmark=benchmark, token_budget=1000)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "min_by" in plan
    survivors = {r["doc_id"] for r in out.collect()}
    assert 0 in survivors          # keeper of the duplicate cluster
    assert not survivors & set(range(1, 6))  # other copies deduped


def test_dedup_family_leaves_cache_manager_empty(spark):
    """Round-11 (ADVICE r10 / VERDICT item 3): the dedup family's
    multi-consumer intermediates persist for the columnar cache, but their
    release is tied to the RETURNED frame via weakref.finalize — once the
    caller drops the result, the CacheManager entry goes away, so repeated
    calls in a long-lived session never accumulate corpus-scale storage.
    Regression: after running every persisting operator and dropping the
    result frames, the session CacheManager must be empty."""
    import gc

    from quantms_utils_spark.operators.dedup import (
        containment_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        prefix_filter_pairs,
        simhash_pairs,
        winnow_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [
            (i, "common words shared by every copy of this page here")
            for i in range(8)
        ]
        + [(20, "a unique document with entirely different tokens inside")],
        "doc_id long, text string",
    )
    spark.catalog.clearCache()  # isolate from other tests

    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8)
    lsh_candidate_pairs(sigs, "doc_id", 8, 2, max_bucket=10).collect()
    winnow_candidate_pairs(docs, "doc_id", "text").collect()
    prefix_filter_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    containment_pairs(docs, "doc_id", "text", threshold=0.9).collect()
    fps = spark.createDataFrame(
        [(1, 0b1010), (2, 0b1011), (3, -42)], "doc_id long, simhash64 long"
    )
    simhash_pairs(fps, "doc_id", "simhash64", max_hamming=3).collect()

    # the result frames above are temporaries — CPython refcounting fires
    # the finalizers at statement end; gc.collect() covers any cycle
    gc.collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
