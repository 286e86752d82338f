"""Scale-parity tests at sf0.1 (10x the driver's correctness gate) for the
queries whose execution shape is scale-sensitive (tiling, banding, iterative
propagation, windows over 100k rows).

A fast three-query subset runs in EVERY pytest invocation; the expensive
tail is enabled with RUN_SCALE_TESTS=1."""

from __future__ import annotations

import os

import duckdb
import pytest

from quantms_utils_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.1"

# Always-on subset: three scale-sensitive-but-fast headline queries run at
# sf0.1 in EVERY test invocation (gated only on the testdata existing), so a
# scale regression fails the suite, not just the bench.
ALWAYS_ON = [
    "text_weighted_sample",
    "moving_avg_range",
    "asof_join_two_table",
    "hourly_gap_fill",
]

# The expensive tail (tiling, banding, iterative propagation at sf0.1) stays
# behind RUN_SCALE_TESTS=1, mirroring the reference's local-only big-file
# test (its tests/test_commands.py marks the large-scale case "run locally").
SCALE_SENSITIVE = [
    "graph_pagerank",
    "graph_label_propagation",
    "dedup_containment_pairs",
    "ann_pq_codes",
    "supplier_wait_blame",
    "text_inverted_index",
    "dedup_lsh_recall_report",
    "rag_chunk_retrieve",
    "dedup_semantic",
    "text_bloom_decontaminate",
    "text_heavy_hitters_cms",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_clusters",
    "dedup_lsh_verified",
    "dedup_prefix_pairs",
    "text_bm25_topk",
    "snapshot_diff",
    "snapshot_diff_exact",
    "text_duplicate_spans",
    "text_bigram_logprob",
    "text_bpe_vocab",
    "graph_triangle_count",
    "event_rolling_distinct",
    "snapshot_merge_apply",
    "er_fuzzy_part_names",
    "media_phash_pairs",
    "weighted_median_price",
    "event_trend_slopes",
    "graph_tree_depths",
    "event_bootstrap_ci",
    "scd2_point_in_time",
    "media_wav_signal",
    "text_novelty_boilerplate",
    "ann_ivfpq_topk",
    "event_type_affinity",
    # round-4 additions: the shuffle-heavy classics + new event/embedding ops
    "volume_shipping",
    "market_share",
    "large_orders",
    "parts_supplier_relationship",
    "event_gap_fill",
    "embedding_centroid_shift",
    "graph_triangle_degree",
    "event_seasonality",
    "event_dwell_time",
    "event_retry_collapse",
    "er_edit_distance_pairs",
    "sessionize_session_window",
    "json_variant_stats",
    "small_quantity_revenue",
    "disjunctive_revenue",
    "excess_shipment_suppliers",
    "dormant_customer_opportunity",
    "event_pattern_match",
    "event_attribution_last_touch",
    "balance_quartile_bands",
    "text_tokenizer_fertility",
    "supplier_concentration_hhi",
    "customer_pareto_share",
    "market_basket_lift",
    "cube_revenue",
    "event_hll_rollup",
    "event_top_types_sketch",
    "tree_depths_recursive_cte",
    "lateral_top_customers",
    "orders_vs_customer_avg",
    "er_entity_clusters",
    "text_quality_logreg_lift",
    "text_lang_confusion",
    "part_rank_movers",
    "event_activity_streaks",
    "user_modal_event_type",
    "orderkey_gap_islands",
    "event_value_mad_outliers",
    "graph_bfs_hops",
    "forecast_revenue_change",
    "product_type_profit",
    "event_value_grid_quantiles",
    "text_bpe_encode_arrow",
    "customer_spend_band_migration",
    "segment_top_brand",
    "layout_zone_manifest",
    "bloom_pruned_source_stats",
    "customer_overlap_kmv",
    "unshipped_orders_revenue",
    "ship_delay_priority_mix",
    "event_cuped_ab_lift",
    "user_survival_km",
    "text_feature_hashing",
    "event_changepoint_cusum",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason="sf0.1 testdata not present",
)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(
            f"{r[i]:.9g}" if isinstance(r[i], float) else str(r[i]) for i in order
        )
        for r in rows
    )


def _check_parity(spark, oracle, name):
    fn, sql = REGISTRY[name]
    df = fn(spark, SF_DIR)
    got = _canon(df.columns, [tuple(r) for r in df.collect()])
    res = oracle.execute(sql)
    want = _canon([c[0] for c in res.description], res.fetchall())
    assert got == want


@pytest.mark.parametrize("name", ALWAYS_ON)
def test_sf01_parity(spark, oracle, name):
    _check_parity(spark, oracle, name)


@pytest.mark.skipif(
    not os.environ.get("RUN_SCALE_TESTS"),
    reason="expensive sf0.1 parity; run locally with RUN_SCALE_TESTS=1",
)
@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_sf01_parity_heavy(spark, oracle, name):
    _check_parity(spark, oracle, name)


@pytest.mark.skipif(
    os.environ.get("RUN_SCALE_TESTS") != "1",
    reason="expensive 10x stress behind RUN_SCALE_TESTS=1",
)
def test_sketch_properties_hold_at_10x(spark):
    """10x-replicated corpus (50k docs / 20k vectors, distinct ids): the
    sketch and SemDeDup CONTRACTS must hold, not just at the oracle scale —
    Bloom keeps zero false negatives, CMS never undercounts, and replicated
    identical vectors in the same cell are always flagged as duplicates of
    the minimum replica id."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_train_fast,
        semantic_dedup,
    )
    from quantms_utils_spark.operators.sketches import bloom_decontaminate
    from quantms_utils_spark.tables import load

    reps = spark.range(10).select(F.col("id").alias("rep"))

    d = load(spark, SF_DIR, "documents")
    d10 = d.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        "text",
    )
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
    pct = F.pmod(h.cast("long"), F.lit(100))
    flags = bloom_decontaminate(
        d10.where(pct < 80), d10.where(pct >= 90), "doc_id", "text", ngram_n=5
    )
    assert flags.where(~F.col("bloom_no_false_negative")).count() == 0
    assert flags.where(~F.col("bloom_covers_exact")).count() == 0

    e = load(spark, SF_DIR, "embeddings")
    e10 = e.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        "embedding",
    )
    init_rows = e10.where(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    init = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in sorted(init_rows, key=lambda r: r["vec_id"])
    ]
    cents = kmeans_train_fast(e10, "embedding", init, n_iter=2)
    cells = e10.withColumn("cid", assign_to_centroids("embedding", cents))
    out = semantic_dedup(
        cells, "vec_id", "embedding", "cid", threshold=0.4, n_buckets=8
    )
    # every replica of a vector lands in the same cell with cosine 1 to the
    # base replica -> all non-minimum replicas must be flagged duplicates
    replicas = out.where(F.col("vec_id") >= 1_000_000)
    assert replicas.where(~F.col("is_dup")).count() == 0


@pytest.mark.skipif(
    os.environ.get("RUN_SCALE_TESTS") != "1",
    reason="expensive 10x stress behind RUN_SCALE_TESTS=1",
)
def test_retrieval_and_graph_hold_at_10x(spark):
    """10x-replicated corpus (50k docs) and a 50k-node graph: the
    inverted-index document frequencies must scale EXACTLY 10x (replication
    multiplies every term's df by the replica count — an off-by-anything
    here means the df window leaks across docs), and PageRank on a
    no-dangling graph must conserve rank mass at any size."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.graph import pagerank
    from quantms_utils_spark.operators.retrieval import inverted_postings
    from quantms_utils_spark.tables import load

    reps = spark.range(10).select(F.col("id").alias("rep"))
    d = load(spark, SF_DIR, "documents")
    d10 = d.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"), "text"
    )
    base_df = (
        inverted_postings(d, min_df=1)
        .select("term", "df")
        .distinct()
        .withColumnRenamed("df", "df_base")
    )
    big_df = (
        inverted_postings(d10, min_df=1).select("term", "df").distinct()
    )
    mismatch = (
        big_df.join(base_df, "term", "full_outer")
        .where(
            F.col("df").isNull()
            | F.col("df_base").isNull()
            | (F.col("df") != 10 * F.col("df_base"))
        )
        .count()
    )
    assert mismatch == 0

    n = 50_000
    nodes = spark.range(n).toDF("id")
    edges = (
        spark.range(n)
        .toDF("src")
        .select(
            "src",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("j"),
        )
        .select(
            "src",
            F.pmod(
                F.xxhash64(F.col("src") * F.lit(31) + F.col("j")), F.lit(n)
            ).alias("dst"),
        )
    )
    total = (
        pagerank(edges, nodes, iterations=3)
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    assert abs(total - 1.0) < 1e-6
