"""Registry-wide physical-plan invariants (round 12).

tests/test_plans.py pins scale-critical plan properties per query; this
sweep pins two GLOBAL invariants across every one of the 230 registry
entries, so a refactor anywhere in the query layer cannot silently
introduce the two cluster-killing join degradations:

1. No CartesianProduct, anywhere, ever.
2. BroadcastNestedLoopJoin only in the explicitly-adjudicated allowlist —
   each allowlisted site broadcasts a 1-row aggregate (corpus totals,
   n_docs/n_orders dimensions) or a vocabulary-bounded tiny frame
   (query-term lists, anchor batches, sampling pools, sketch tables),
   which is the documented batched-ANN / scalar-dimension pattern. A
   BNLJ appearing in ANY other query is a regression: at 100 TB it is a
   corpus-sized nested loop.

Building a plan is lazy, but several registry entries run bounded
driver-side actions during CONSTRUCTION (BPE merge collect, k-means
centroid training, ORC/JSONL roundtrip writes), so this sweep costs a
couple of minutes at sf0.001 — the price of a net under all 230 plans.
"""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# Every site here was individually adjudicated (rounds 5-11 plan audits +
# the round-12 sweep): the BNL build side is a broadcast 1-row aggregate
# or a tiny bounded dimension, never a corpus.
BNLJ_ALLOWED = {
    "ann_batch_queries_topk",      # 5-query anchor batch broadcast
    "ann_bruteforce_topk",         # 1-row query vector broadcast
    "ann_ivf_topk",                # 1-row query vector broadcast
    "ann_quantized_topk",          # 1-row query vector broadcast
    "ann_recall_report",           # 1-row query vector + 10-row id sets
    "corpus_drift_psi",            # 1-row corpus totals broadcast
    "customer_overlap_kmv",        # k-row sketch arrays crossed
    "customer_pareto_share",       # 1-row corpus total broadcast
    "dedup_lsh_recall_report",     # three 1-row count aggregates crossed
    "dormant_customer_opportunity",# 1-row global cutoff broadcast
    "embedding_hard_negatives",    # 8-anchor batch broadcast
    "embedding_negative_samples",  # labels x 8 sampling pool broadcast
    "embedding_pca_covariance",    # (d+1)^2 Gram partials, tiny
    "er_edit_distance_pairs",      # <=5-char short-name brute branch
    "event_changepoint_cusum",     # 1-row global mean broadcast
    "graph_degree_stats",          # 1-row vertex-count dimension
    "hybrid_rrf_topk",             # 1-row query vector broadcast
    "important_parts",             # 1-row global threshold broadcast
    "market_basket_lift",          # 1-row n_orders broadcast
    "rag_chunk_retrieve",          # 1-row corpus stats broadcast
    "text_bm25_topk",              # 1-row (n_docs, avgdl) broadcast
    # r13 lazy BPE chain: each merge round crossJoin(broadcast)s the
    # previous round's 1-ROW winning-pair aggregate (queries/textops.py::
    # bpe_merge_rules) — the bounded scalar-dimension pattern, exactly
    # the oracle's unrolled m{k} CROSS JOIN shape.
    "text_bpe_merges",             # 1-row winning-pair aggregates (lazy BPE)
    "text_heavy_hitters_cms",      # depth x width sketch + 1-row total
    "text_more_like_this",         # 1-row n_docs + query postings
    # r13 lazy logreg chain: each GD iteration crossJoin(broadcast)s the
    # previous iteration's 1-ROW weight aggregate (queries/mlops.py::
    # _train_frame) — the bounded scalar-dimension pattern; lift consumes
    # the same chain behind the rank operator's checkpoint truncation.
    "text_quality_calibration",    # 1-row weight aggregates (lazy GD)
    "text_quality_logreg_eval",    # 1-row weight aggregates (lazy GD)
    "text_quality_logreg_scores",  # 1-row weight aggregates (lazy GD)
    "text_quality_logreg_weights", # 1-row weight aggregates (lazy GD)
    "text_temperature_mixture",    # 1-row corpus total broadcast
    "text_top_terms",              # 1-row n_docs broadcast
    "user_survival_km",            # 1-row horizon aggregate broadcast
}


def test_no_cartesian_anywhere_and_bnlj_only_allowlisted(spark):
    qs = entry.queries()
    assert len(qs) == 230  # registry freeze (ninth round)
    cartesian, rogue_bnlj, errors = [], [], []
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — collect, report all at once
            errors.append((name, repr(e)[:200]))
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            rogue_bnlj.append(name)
    assert not errors, f"queries failed to build a plan: {errors}"
    assert not cartesian, f"CartesianProduct in: {cartesian}"
    assert not rogue_bnlj, (
        f"unadjudicated BroadcastNestedLoopJoin in: {rogue_bnlj} — either "
        "fix the join to an equi-join/broadcast-hash form, or (only if the "
        "build side is provably a 1-row/tiny broadcast) add it to "
        "BNLJ_ALLOWED with a justification comment"
    )
