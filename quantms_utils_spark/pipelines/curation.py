"""End-to-end training-corpus curation: the composition every pretraining
data pipeline runs, expressed entirely from this repo's operators —

    quality filter → exact dedup → near-dup dedup (MinHash-LSH + connected
    components) → benchmark decontamination → domain-mixture downsampling

Each stage is the already-oracle-checked operator; the value of this module
is proving they COMPOSE: one DataFrame flows through all five stages and the
whole chain is value-checked against a single DuckDB CTE pipeline
(`queries/curation.py`).

Scale notes (100 TB): every stage is shuffle-bounded by design — the quality
filter is map-only; exact dedup is one map-side-combinable min_by aggregate
on the 32-byte fingerprint (constant state per group — no whale-partition
window buffering);
LSH is the banding shuffle; connected components run on the candidate-pair
set (orders of magnitude smaller than the corpus); the benchmark n-gram set
is broadcast; the mixture keep-decision is map-only against broadcast rates.
No stage collects data rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quantms_utils_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
)
from quantms_utils_spark.operators.text import (
    content_fingerprint,
    decontaminate,
    mixture_sample,
    quality_metrics,
)


def split_pct(id_col: str = "doc_id") -> F.Column:
    """Deterministic 0–99 bucket from the md5 of the id (the train/val/test
    split hash used by text_train_split)."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
    return F.pmod(h.cast("long"), F.lit(100))


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    token_budget: int = 300,
    n_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
    decontam_ngram: int = 5,
    hash_family: str = "md5",
) -> DataFrame:
    """Run the five-stage curation chain over ``docs`` (columns: doc_id,
    text, source). ``benchmark`` defaults to the corpus' own test split
    (bucket ≥ 90) — in production it is the external eval set. Returns the
    curated train set: (doc_id, source, doc_tokens, group_tokens, keep_rate).
    """
    pct = split_pct()

    # 1. quality filter (map-only)
    q = docs.where(quality_metrics(F.col("text"))["keep"])

    # 2. exact dedup: min-doc_id keeper per normalized content fingerprint.
    # min_by(struct, doc_id) in ONE map-side-combinable aggregate (round 10
    # review) — the previous fingerprint window buffered whole partition
    # groups, so a mega-duplicate cluster (millions of copies of one
    # boilerplate page) funneled O(copies) rows through a single WindowExec
    # task; the aggregate holds one struct per group instead.
    cols = q.columns
    ex = (
        q.groupBy(content_fingerprint(F.col("text")).alias("fp"))
        .agg(F.min_by(F.struct(*cols), F.col("doc_id")).alias("_row"))
        .select("_row.*")
    )

    # 3. near-dup dedup: LSH candidates -> connected components -> keep the
    # cluster representative (min member id); singletons pass through
    sigs = minhash_signatures(
        ex, "doc_id", "text",
        n_hashes=n_hashes, shingle_n=shingle_n, hash_family=hash_family,
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id", n_hashes=n_hashes, band_size=band_size)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    surv = (
        ex.join(cc.withColumnRenamed("v", "doc_id"), "doc_id", "left")
        .where(F.col("label").isNull() | (F.col("label") == F.col("doc_id")))
        .drop("label")
    )

    # 4. decontamination of the train split against the benchmark
    if benchmark is None:
        benchmark = docs.where(pct >= 90)
    train_cand = surv.where(pct < 80)
    flags = decontaminate(
        train_cand, benchmark, "doc_id", "text", ngram_n=decontam_ngram
    )
    clean = train_cand.join(
        flags.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )

    # 5. mixture downsampling to the per-source token budget
    return mixture_sample(clean, "source", "doc_id", "text", token_budget)
