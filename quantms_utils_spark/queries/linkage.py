"""Record-linkage queries: blocked fuzzy entity matching over the part
catalog (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.linkage import fuzzy_name_pairs
from quantms_utils_spark.tables import load


def er_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on part names: collapse the catalog to distinct
    (first-word block, name) entities, candidate pairs from the block
    equi-join with the length lower bound inside the join condition, and
    a codegen'd levenshtein verify at distance ≤ 3 — the near-miss names
    exact dedup can never see. The oracle replays blocking, the length
    filter, and DuckDB's levenshtein; output carries per-name record
    counts so a hash match also proves the entity collapse."""
    p = load(spark, sf_dir, "part")
    return fuzzy_name_pairs(
        p,
        "p_name",
        F.split(F.col("p_name"), " ").getItem(0),
        max_distance=3,
    )


ER_FUZZY_PART_SQL = """
WITH names AS (
  SELECT split_part(p_name, ' ', 1) AS block, p_name AS name,
         count(*) AS n
  FROM part GROUP BY 1, 2
)
SELECT a.block, a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS distance,
       a.n AS n_a, b.n AS n_b
FROM names a JOIN names b
  ON a.block = b.block AND a.name < b.name
 AND abs(length(a.name) - length(b.name)) <= 3
WHERE levenshtein(a.name, b.name) <= 3
"""


QUERIES = {
    "er_fuzzy_part_names": (er_fuzzy_part_names, ER_FUZZY_PART_SQL),
}


def er_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-free exact edit-distance join on part names
    (operators.linkage.edit_distance_pairs, the EDJoin q-gram
    count-filter family): candidates from the inverted 2-gram join with
    the count floor max(|a|,|b|)−q+1−d·q, which is only sound when the
    floor ≥ 1 — so the gram branch keeps pairs with max(len) > q−1+d·q
    and names at or below that threshold (≤ 5 chars here; none exist in
    the part table, but the branch is real code, not a precondition)
    take a brute-force levenshtein branch. Together: no false negatives,
    so unlike `er_fuzzy_part_names` nothing can escape across a block
    boundary. The oracle replays gram explosion, the (inflated-by-
    duplicates but verify-safe) shared counts, the floor, the threshold
    split, the short brute branch, and DuckDB's levenshtein."""
    from quantms_utils_spark.operators.linkage import edit_distance_pairs

    p = load(spark, sf_dir, "part")
    return edit_distance_pairs(p, "p_name", max_distance=2, q=2)


ER_EDJOIN_SQL = """
WITH names_all AS (
  SELECT p_name AS name, count(*) AS n, length(p_name) AS len
  FROM part GROUP BY 1
), names AS (
  SELECT * FROM names_all WHERE len >= 2
), grams AS (
  SELECT name, n, len, substr(name, i, 2) AS gram
  FROM names, UNNEST(generate_series(1, len - 1)) AS t(i)
), shared AS (
  SELECT a.name AS name_a, b.name AS name_b,
         a.n AS n_a, b.n AS n_b, a.len AS la, b.len AS lb,
         count(*) AS shared
  FROM grams a JOIN grams b
    ON a.gram = b.gram AND a.name < b.name
   AND abs(a.len - b.len) <= 2
  GROUP BY 1, 2, 3, 4, 5, 6
), long_pairs AS (
  SELECT name_a, name_b,
         levenshtein(name_a, name_b) AS distance, n_a, n_b
  FROM shared
  WHERE greatest(la, lb) > 5
    AND shared >= greatest(la, lb) - 1 - 4
    AND levenshtein(name_a, name_b) <= 2
), short_pairs AS (
  SELECT a.name AS name_a, b.name AS name_b,
         levenshtein(a.name, b.name) AS distance,
         a.n AS n_a, b.n AS n_b
  FROM names_all a JOIN names_all b
    ON a.name < b.name AND abs(a.len - b.len) <= 2
  WHERE a.len <= 5 AND b.len <= 5
    AND levenshtein(a.name, b.name) <= 2
)
SELECT * FROM long_pairs UNION ALL SELECT * FROM short_pairs
"""


QUERIES["er_edit_distance_pairs"] = (er_edit_distance_pairs, ER_EDJOIN_SQL)


def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: fuzzy match pairs → CONNECTED
    COMPONENTS → entity clusters. The composition that turns pairwise
    near-miss evidence into dedupable entities: blocked levenshtein
    pairs (the `er_fuzzy_part_names` generator) ARE the edge list —
    min-label propagation (operators.dedup.connected_components) runs
    directly over the NAME STRINGS, so every vertex converges to the
    lexicographically-least reachable name, which is exactly the
    canonical entity. No dense-id assignment exists: the old
    row_number-over-global-Window id step was the one single-partition
    funnel in the pipeline and carried no information the string labels
    don't. Only multi-member clusters emerge (singletons are exact-dedup
    territory). The oracle replays the pairs SQL, walks the TRANSITIVE
    CLOSURE with a recursive CTE, and takes min(reachable) — a
    different algorithm for the same fixpoint, so a propagation bug
    (dropped edge, premature convergence) hash-mismatches. Output
    (entity, n_members) sorted."""
    from quantms_utils_spark.operators.dedup import connected_components
    from quantms_utils_spark.operators.linkage import fuzzy_name_pairs

    p = load(spark, sf_dir, "part")
    pairs = fuzzy_name_pairs(
        p, "p_name", F.split(F.col("p_name"), " ").getItem(0), max_distance=3
    ).select("name_a", "name_b")
    cc = connected_components(pairs, "name_a", "name_b")
    return (
        cc.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(F.col("label").alias("entity"), "n_members")
        .orderBy("entity")
    )


ER_ENTITY_CLUSTERS_SQL = """
WITH RECURSIVE names AS (
  SELECT split_part(p_name, ' ', 1) AS block, p_name AS name
  FROM part GROUP BY 1, 2
), pairs AS (
  SELECT a.name AS name_a, b.name AS name_b
  FROM names a JOIN names b
    ON a.block = b.block AND a.name < b.name
   AND abs(length(a.name) - length(b.name)) <= 3
  WHERE levenshtein(a.name, b.name) <= 3
), verts AS (
  SELECT name_a AS name FROM pairs UNION SELECT name_b FROM pairs
), sym AS (
  SELECT name_a AS a, name_b AS b FROM pairs
  UNION ALL SELECT name_b, name_a FROM pairs
), walk AS (
  SELECT name AS start, name AS reach FROM verts
  UNION
  SELECT w.start, s.b
  FROM walk w JOIN sym s ON s.a = w.reach
), entity AS (
  SELECT start AS name, min(reach) AS entity FROM walk GROUP BY 1
)
SELECT entity, count(*) AS n_members
FROM entity GROUP BY 1 ORDER BY 1
"""

QUERIES["er_entity_clusters"] = (er_entity_clusters, ER_ENTITY_CLUSTERS_SQL)
