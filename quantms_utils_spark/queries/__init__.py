"""Query registry: every implemented operator from SURVEY.md §2 exposed as a
(spark_callable, duckdb_oracle_sql) pair over the synthetic test tables.

``REGISTRY[name] = (fn, sql_or_None)`` where ``fn(spark, sf_dir) -> DataFrame``
and ``sql`` is the ANSI-SQL equivalent DuckDB runs on the same parquet files.
``sql is None`` marks genuinely non-SQL-expressible ops (driver records a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quantms_utils_spark.queries import (
    core,
    curation,
    dedup,
    graphops,
    media,
    relational,
    retrieval,
    similarity,
    sketchops,
    mlops,
    webops,
    pathops,
    linkage,
    textops,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}
for _mod in (core, dedup, relational, similarity, textops, media, curation, retrieval, sketchops, mlops, webops, graphops, pathops, linkage):
    for _name, _pair in _mod.QUERIES.items():
        if _name in REGISTRY:
            raise ValueError(f"duplicate query name {_name!r}")
        REGISTRY[_name] = _pair

# Front-load the queries that most need a fresh driver row, so a capped or
# time-budgeted checker covers them first. Round-3 priorities lead:
# snapshot_diff (added after the r02 run — the only registry query never
# driver-checked) and approx_event_stats (reworked in round 3 from rows-only
# to a hash-checkable tolerance oracle). The rest keep their round-2 order.
_FRONT = [
    "snapshot_diff", "approx_event_stats",
    "graph_triangle_count", "event_transitions",  # new in round 3 (session 2)
    "event_rolling_distinct", "snapshot_merge_apply",  # new in r3 (session 2)
    "er_fuzzy_part_names", "media_ahash_fingerprints",  # new in r3 (session 2)
    "media_phash_pairs", "data_quality_report",  # new in r3 (session 2)
    "weighted_median_price", "text_quality_calibration",  # new in r3 (s2)
    "event_trend_slopes", "event_type_affinity",  # new in r3 (session 2)
    "graph_tree_depths", "event_bootstrap_ci",  # new in r3 (session 2)
    "scd2_point_in_time",  # new in r3 (session 2)
    "graph_pagerank", "graph_degree_stats",  # new in round 3 (late)
    "text_weighted_sample", "event_scd2_intervals",  # new in round 3 (late)
    "table_skew_report", "rag_chunk_retrieve",  # new in round 3 (late)
    "text_inverted_index", "sink_orc_roundtrip",  # new in round 3 (late)
    "dedup_lsh_recall_report", "corpus_drift_psi",  # new in round 3 (late)
    "text_more_like_this", "sink_jsonl_roundtrip",  # new in round 3 (late)
    "text_char_entropy", "event_anomaly_mad",  # new in round 3 (late)
    "incremental_view_refresh",  # new in round 3 (late)
    "supplier_wait_blame", "cheapest_supplier_per_part",  # new in round 3 (late)
    "graph_label_propagation", "dedup_containment_pairs",  # new in round 3 (late)
    "ann_pq_codes", "ann_pq_topk",  # new in round 3 (late)
    "event_value_ewma", "dedup_simhash_pairs",  # new in round 3 (late)
    "skew_salted_join_agg", "event_type_revenue_share",  # new in round 3 (late)
    "bucketed_join_revenue", "text_top_terms",  # new in round 3 (late)
    "dedup_semantic", "text_bloom_decontaminate",  # new in round 3
    "text_heavy_hitters_cms", "text_length_histogram",  # new in round 3
    "layout_compaction_plan",  # new in round 3
    "text_quality_logreg_weights", "text_quality_logreg_scores",  # new in round 3
    "text_quality_logreg_eval", "dedup_cluster_sizes",  # new in round 3
    "event_retention_cohorts", "event_value_winsorized",  # new in round 3
    "warc_roundtrip_stats", "web_url_canonical",  # new in round 3
    "embedding_negative_samples", "text_unicode_normalize",  # new in round 3
    "interval_overlap_pairs", "ann_recall_report",  # new in round 3
    "snapshot_diff_exact", "text_bpe_vocab",  # new in round 3
    "text_duplicate_spans", "text_bigram_logprob",  # new in round 3
    "text_remove_duplicate_spans", "ann_knn_graph",  # new in round 3
    "returned_items_topk", "big_orders_having", "rollup_revenue",
    "moving_avg_range", "ann_bruteforce_topk", "ann_partitioned_topk",
    "ann_lsh_bucketed", "embedding_norms", "dedup_embedding_cosine",
    "text_train_split", "text_lang_id", "text_quality_scores",
    "text_token_counts", "text_fingerprints", "multimodal_metadata",
    "multimodal_image_features", "multimodal_audio_features",
    "multimodal_video_frames", "multimodal_image_resize",
    "dedup_simhash",
    "ann_ivf_kmeans_centroids", "ann_ivf_topk",
    "text_winnow_fingerprints", "dedup_winnow_pairs",
    "media_wav_features", "media_bmp_features", "media_y4m_frames",
    "text_repetition_signals", "text_decontaminate", "text_pii_scrub",
    "text_mixture_sample", "embedding_quantize_int8", "embedding_pca_covariance",
    "curation_pipeline", "ann_batch_queries_topk", "text_pack_sequences",
    "dedup_incremental", "ann_quantized_topk", "text_group_sample",
    "table_profile", "text_bm25_topk", "hybrid_rrf_topk",
    "text_chunk_sliding", "text_bpe_merges", "dedup_prefix_pairs",
    "layout_zorder_stats", "text_quality_percentile_band", "text_source_overlap",
    "text_bpe_encode",
]
REGISTRY = {
    **{n: REGISTRY[n] for n in _FRONT},
    **{n: p for n, p in REGISTRY.items() if n not in _FRONT},
}

def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}

def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
