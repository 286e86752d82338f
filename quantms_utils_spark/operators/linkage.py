"""Record linkage / entity resolution: blocked fuzzy matching.

The classic ER pipeline is (1) collapse records to candidate ENTITIES,
(2) generate candidate pairs inside cheap blocks, (3) score candidates
with an expensive similarity, (4) keep matches. The quadratic stage (3)
must only ever see blocked candidates — the same discipline as every
dedup family in `operators/dedup.py` (LSH bands, winnow buckets, prefix
tokens), here with edit distance as the verifier.

Scale shape:
- The record table first collapses to the DISTINCT (block, name) entity
  table (one hash aggregate). Real-world name vocabularies follow Heaps'
  law — the entity table is orders of magnitude smaller than the record
  table, and pair cost depends on it alone, exactly like the BPE
  word-type collapse (`operators/text.py:bpe_merges`).
- Candidates come from a block equi-join; the length filter
  |len(a)−len(b)| ≤ d (an edit-distance lower bound) rides INSIDE the
  join condition so hopeless pairs die before the levenshtein evaluates.
- `levenshtein` is a JVM builtin (codegen'd, no Python) — the verify
  stage is CPU on candidates only.
- A hot block (one giant city/first-token) is the known failure mode;
  `max_block` drops non-discriminative blocks, mirroring the LSH
  `max_bucket` guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["fuzzy_name_pairs", "edit_distance_pairs"]


def fuzzy_name_pairs(
    records: DataFrame,
    name_col: str,
    block: Column,
    *,
    max_distance: int = 3,
    max_block: int | None = None,
) -> DataFrame:
    """Fuzzy-match pairs of distinct names within blocks at Levenshtein
    distance 1..``max_distance``; returns ``(block, name_a, name_b,
    distance, n_a, n_b)`` where ``n_*`` are the record counts behind each
    name (the entities a merge decision would collapse).

    Identical names are distance 0 and deliberately excluded — exact
    duplicates are the hash-dedup family's job; this operator finds what
    exact matching misses.
    """
    if max_distance < 1:
        raise ValueError("max_distance must be >= 1")
    names = (
        records.select(block.alias("block"), F.col(name_col).alias("name"))
        .groupBy("block", "name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_block is not None:
        counts = names.groupBy("block").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        names = (
            names.join(counts, "block")
            .filter(F.col("__bn") <= max_block)
            .drop("__bn")
        )
    # distinct column names on each side: a self-join on a shared-lineage
    # column silently degrades to a trivially-true predicate (Spark resolves
    # both sides to the same attribute), turning the block join into a
    # cross join of the whole entity table.
    a = names.select(
        "block",
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.length("name").alias("__la"),
    )
    b = names.select(
        F.col("block").alias("__block_b"),
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.length("name").alias("__lb"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(
            b,
            (F.col("block") == F.col("__block_b"))
            & (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.col("__la") - F.col("__lb")) <= F.lit(max_distance)
            ),
        )
        .withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select("block", "name_a", "name_b", "distance", "n_a", "n_b")
    )


def edit_distance_pairs(
    records: DataFrame,
    name_col: str,
    *,
    max_distance: int = 2,
    q: int = 2,
) -> DataFrame:
    """EXACT edit-distance similarity self-join WITHOUT blocking — the
    q-gram count-filter family (EDJoin, Xiao et al., VLDB 2008): one edit
    operation destroys at most ``q`` of a string's positional q-grams, so
    two strings within distance d must share at least
    ``max(|a|,|b|) − q + 1 − d·q`` q-grams — any pair below that floor is
    provably out of range and never reaches the levenshtein verify.

    Candidate generation is the inverted q-gram equi-join with the length
    lower bound in the join condition and a GROUP-BY count applying the
    floor (one shuffle each); the quadratic all-pairs stage never exists.
    Like :func:`fuzzy_name_pairs`, records first collapse to DISTINCT
    names (Heaps'-law small). Returns (name_a, name_b, distance, n_a,
    n_b) for 1 ≤ distance ≤ ``max_distance``. Against fuzzy_name_pairs,
    this is the no-blocking-key variant: nothing escapes because of a
    block boundary, at the price of q-gram join fan-out — the standard
    recall/cost trade documented by the family.

    SHORT STRINGS: the count floor is only a filter when it is ≥ 1, i.e.
    when ``max(|a|,|b|) > q−1+d·q``; below that, within-range pairs may
    share ZERO q-grams (and strings shorter than ``q`` have no grams at
    all), so the inverted join would silently miss them. Completeness is
    preserved by splitting on that exact threshold: the gram join keeps
    only pairs with ``greatest(la,lb) > q−1+d·q`` (where the floor is
    provably sound), and names with ``len ≤ q−1+d·q`` go through a
    brute-force levenshtein branch instead — the short set is bounded by
    the alphabet (only strings of ≤ q·(d+1)−1 chars), so its self-join is
    a broadcast of a tiny side, not a scale risk. A pair spanning the
    threshold with one side shorter than ``q`` cannot be within range
    (its length gap alone exceeds ``d``), so the two branches cover all
    qualifying pairs exactly once.
    """
    if max_distance < 1:
        raise ValueError("max_distance must be >= 1")
    if q < 1:
        raise ValueError("q must be >= 1")
    thresh = q - 1 + max_distance * q
    names_all = (
        records.select(F.col(name_col).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("len", F.length("name"))
    )
    short = names_all.filter(F.col("len") <= F.lit(thresh))
    sa = short.select(
        F.col("name").alias("name_a"), F.col("n").alias("n_a"), F.col("len").alias("la")
    )
    sb = short.select(
        F.col("name").alias("name_b"), F.col("n").alias("n_b"), F.col("len").alias("lb")
    )
    short_pairs = (
        sa.join(
            F.broadcast(sb),
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= F.lit(max_distance)),
        )
        .withColumn("distance", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance", "n_a", "n_b")
    )
    names = names_all.filter(F.col("len") >= q)
    grams = names.select(
        "name",
        "n",
        "len",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("len") - q + 1),
                lambda i: F.col("name").substr(i, F.lit(q)),
            )
        ).alias("gram"),
    )
    a = grams.select(
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.col("len").alias("la"),
        "gram",
    )
    b = grams.select(
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.col("len").alias("lb"),
        F.col("gram").alias("gram_b"),
    )
    shared = (
        a.join(
            b,
            (F.col("gram") == F.col("gram_b"))
            & (F.col("name_a") < F.col("name_b"))
            & (
                F.abs(F.col("la") - F.col("lb")) <= F.lit(max_distance)
            ),
        )
        .groupBy("name_a", "name_b", "n_a", "n_b", "la", "lb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    floor = (
        F.greatest(F.col("la"), F.col("lb"))
        - F.lit(q - 1)
        - F.lit(max_distance * q)
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    long_pairs = (
        shared.filter(F.greatest(F.col("la"), F.col("lb")) > F.lit(thresh))
        .filter(F.col("shared") >= floor)
        .withColumn("distance", dist)
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance", "n_a", "n_b")
    )
    return long_pairs.unionByName(short_pairs)
