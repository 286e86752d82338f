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
