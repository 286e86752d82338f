"""Lexical (BM25) retrieval and reciprocal-rank hybrid fusion.

The reference engine has no keyword-search operator; these belong to the
LLM-data-pipeline extension family: corpus-scale lexical retrieval with
Okapi BM25 (Robertson et al., TREC-3) and reciprocal-rank fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) merging a lexical ranking with
an embedding-cosine semantic ranking — the standard hybrid-search recipe
for retrieval-based decontamination and targeted corpus slicing.

100 TB design notes:

- The posting build filters each document's token array down to the (tiny)
  query-term set with a higher-order ``filter`` BEFORE any explode, so the
  one shuffle carries only matching ``(doc, term)`` pairs — never a full
  inverted index and never non-matching tokens. A document without query
  terms contributes zero shuffle rows.
- Corpus statistics (N, avgdl) ride along as a broadcast single-row dim
  (BroadcastNestedLoopJoin over one row), not a driver-side collect — the
  whole computation stays one lazy DAG that Catalyst schedules.
- Per-term document frequency is a second aggregation over the already
  query-filtered postings: O(matching docs × |query|), not O(vocabulary).
- ``rrf_fuse`` is a full-outer equi-join of two ranked lists on the doc id;
  at scale the inputs should already be per-system top-k lists (bounded),
  so the join is trivially broadcastable from either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from quantms_utils_spark.operators.text import normalized_tokens

__all__ = ["bm25_scores", "bm25_rank", "rrf_fuse", "inverted_postings"]


def inverted_postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """The write side of lexical retrieval: build the inverted-index posting
    rows ``(term, doc, tf, first_pos, df)`` — one row per (term, document)
    pair, with the term's corpus document frequency attached so downstream
    scoring never needs a second vocabulary pass.

    ``min_df``/``max_df`` drop the long tail and the stopword head at build
    time (the standard index-size control); at 100 TB this is what keeps
    the index O(useful postings) instead of O(tokens).

    Shape: posexplode (map-only) → one (term, doc) hash aggregate → df as a
    ``count() over (partition by term)`` window on the aggregate itself.
    The window formulation matters at scale: a groupBy-df-then-join-back
    would make Catalyst RE-SCAN and RE-EXPLODE the whole corpus for the df
    branch (no common-subexpression reuse across a self-join), doubling the
    token explosion — the window computes df from the already-aggregated
    (term, doc) rows in the same DAG. Two shuffles total, one corpus scan.
    With ``max_df`` set, a salted pre-pass strips whale terms BEFORE the
    window (round 9, see inline comment), bounding every window partition
    at max_df rows — the funnel guard costs one extra pruned corpus pass
    and only when the caller asked for stopword removal.
    ``first_pos`` is 1-based token position (phrase/proximity seeds).
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(normalized_tokens(F.col(text_col))).alias(
            "__pos", "term"
        ),
    )
    tf = toks.groupBy("term", id_col).agg(
        F.count(F.lit(1)).alias("tf"),
        (F.min("__pos") + 1).alias("first_pos"),
    )
    if max_df is not None:
        # Whale guard (round 9): the df window funnels every posting of a
        # term through ONE partition's sort — a stopword present in ~every
        # document puts O(corpus) rows into one task even though max_df
        # would drop it afterwards. Compute the (by definition FEW) whale
        # terms first via a salted two-phase count — fully parallel, no
        # single-term partition ever holds more than its salt share — and
        # broadcast-anti-join them away BEFORE the window, which bounds
        # every window partition at max_df rows. Costs one extra pruned
        # (id, term) pass over the corpus; without max_df the single-scan
        # window shape below is kept unchanged.
        whale_terms = (
            toks.groupBy(
                "term",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(64)).alias("_s"),
            )
            .agg(F.count_distinct(F.col(id_col)).alias("_c"))
            .groupBy("term")
            .agg(F.sum("_c").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("term")
        )
        tf = tf.join(F.broadcast(whale_terms), "term", "left_anti")
    w = Window.partitionBy("term")
    out = tf.withColumn("df", F.count(F.lit(1)).over(w)).filter(
        F.col("df") >= min_df
    )
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out.select("term", id_col, "tf", "first_pos", "df")


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every matching document for a bag of query terms.

    Returns ``(id_col, bm25)`` with one row per document that contains at
    least one query term; non-matching documents are absent (score 0).

    idf uses the non-negative BM25+ style ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    so common terms cannot produce negative contributions.

    Query terms are normalized (trim + lowercase) to match
    ``normalized_tokens``' casing — a raw uppercase term would otherwise
    silently match nothing — and weighted by their multiplicity in the
    query (true bag semantics: a term repeated in the query multiplies
    its contribution, round 9).

    Two corpus passes by design: the (N, avgdl) stats aggregate and the
    match branch are independent subtrees, and Catalyst has no
    common-subexpression reuse across them (ReuseExchange needs
    bit-identical exchanges, which column pruning breaks — verified).
    The stats subtree only tokenizes and counts (no explode/shuffle of
    tokens), so the duplicated work is one map-side tokenization, the
    price of keeping the operator a pure plan with no cache side effects.
    """
    from collections import Counter

    qcounts = Counter(
        t.strip().lower() for t in query_terms if t and t.strip()
    )
    if not qcounts:
        raise ValueError("query_terms must be non-empty")
    terms = F.array(*[F.lit(t) for t in qcounts])

    base = docs.select(
        F.col(id_col),
        normalized_tokens(F.col(text_col)).alias("_toks"),
    ).select(id_col, "_toks", F.size("_toks").alias("_dl"))

    # single-row broadcast dim: corpus size and average doc length
    stats = base.agg(
        F.count(F.lit(1)).alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )

    # keep only query-term occurrences before exploding: the shuffle input is
    # O(matches), not O(tokens)
    matched = base.select(
        id_col,
        "_dl",
        F.explode(
            F.filter(F.col("_toks"), lambda x: F.array_contains(terms, x))
        ).alias("_term"),
    )
    tf = matched.groupBy(id_col, "_dl", "_term").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfreq = tf.groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))

    scored = tf.join(F.broadcast(dfreq), "_term").join(F.broadcast(stats))
    idf = F.log(
        1.0 + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    denom = F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    # bag semantics: the contribution of a term repeated in the query
    # scales with its query frequency (a tiny literal map, k/v per term)
    qf = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for t, c in qcounts.items()
                for x in (t, float(c))
            ]
        ),
        F.col("_term"),
    )
    contrib = qf * idf * F.col("_tf") * (k1 + 1.0) / denom
    return (
        scored.withColumn("_contrib", contrib)
        .groupBy(id_col)
        .agg(F.sum("_contrib").alias("bm25"))
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """BM25 scores plus a global rank (1 = best).

    Scores are rounded before ranking so a last-ulp float divergence between
    engines cannot flip adjacent ranks; ties break on the doc id (a total
    order, so row_number ≡ rank). The rank is the TWO-PHASE global rank
    (operators/rank.py) — range-partition on (score desc, id), local index,
    broadcast offsets — so a corpus-sized candidate set never funnels
    through a single-task ordered window.
    """
    from quantms_utils_spark.operators.rank import global_row_number

    s = bm25_scores(
        docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b
    ).withColumn("bm25", F.round("bm25", round_digits))
    return global_row_number(
        s, [F.col("bm25").desc(), F.col(id_col)], rank_col="rnk"
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    *,
    id_col: str = "id",
    rank_col: str = "rnk",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists.

    ``rrf = Σ_systems 1/(k + rank)``; a document missing from one list
    contributes 0 for that system (full-outer join). Returns
    ``(id_col, rank_a, rank_b, rrf)``.
    """
    a = ranked_a.select(F.col(id_col), F.col(rank_col).alias("rank_a"))
    bdf = ranked_b.select(F.col(id_col), F.col(rank_col).alias("rank_b"))
    fused = a.join(bdf, id_col, "full_outer")

    def _part(c: Column) -> Column:
        return F.coalesce(1.0 / (F.lit(float(k)) + c), F.lit(0.0))

    return fused.select(
        id_col,
        "rank_a",
        "rank_b",
        (_part(F.col("rank_a")) + _part(F.col("rank_b"))).alias("rrf"),
    )
