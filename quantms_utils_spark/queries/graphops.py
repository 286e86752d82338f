"""Graph queries: PageRank and degree diagnostics over a deterministic
link graph derived from the documents table.

The link graph is synthesized the way every deterministic fixture in this
repo is (md5-derived, both engines recompute it bit-identically): document
``i`` links to the three documents ``('0x'||substr(md5(i||':'||j),1,6)) % N``
for j in 1..3 — a fixed out-degree-3 random graph with self-loops allowed,
so there are no dangling nodes and the oracle's contribution term is exactly
``rank/3``. doc_id is contiguous 0..N-1 in the test tables, so the modulus
lands on a real vertex without a row_number re-indexing pass (which would be
a global-sort anti-pattern at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.operators.graph import (
    degree_stats,
    label_propagation,
    pagerank,
)
from quantms_utils_spark.tables import load

_DAMPING = 0.85
_ITERS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    n_dim = d.agg(F.count("*").alias("__n"))
    j = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("src").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    return (
        d.select(F.col("doc_id").alias("src"))
        .select("src", j)
        .crossJoin(F.broadcast(n_dim))
        .select("src", (h % F.col("__n")).alias("dst"))
    )


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank (d=0.85) over the derived doc-link graph via
    operators.graph.pagerank — the authority score a crawl-curation pipeline
    ranks sources by. The oracle unrolls the identical fixed-point by hand
    (r0→r1→r2→r3 CTEs), so a wrong damping term, a dropped dangling node, or
    a degree mis-count all hash-mismatch. Scale shape: edges partitioned by
    src once; each iteration shuffles only the |V|-row rank vector."""
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    ranks = pagerank(
        _edges(spark, sf_dir),
        nodes,
        damping=_DAMPING,
        iterations=_ITERS,
    )
    # epsilon before rounding: PageRank values on this rational-arithmetic
    # graph genuinely terminate with a 5 at the 9th decimal for some nodes,
    # where a 1-ulp cross-engine summation difference would flip
    # round(..., 8); the shared nudge moves both engines off the boundary
    # (same idiom as the ceil guard in operators/dedup.py).
    return ranks.select(
        "id", F.round(F.col("rank") + F.lit(1e-12), 8).alias("rank")
    )


_EDGES_SQL = """
  SELECT doc_id AS src,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                          || CAST(j AS VARCHAR)), 1, 6))::BIGINT
           % (SELECT count(*) FROM documents) AS dst
  FROM documents CROSS JOIN (SELECT unnest([1, 2, 3]) AS j)
"""

GRAPH_PAGERANK_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
r0 AS (SELECT doc_id AS id, 1.0 / (SELECT n FROM n) AS rank FROM documents),
r1 AS (
  SELECT d.doc_id AS id,
         0.15 / (SELECT n FROM n) + 0.85 * coalesce(s.c, 0) AS rank
  FROM documents d LEFT JOIN (
    SELECT e.dst, sum(r.rank / 3.0) AS c
    FROM edges e JOIN r0 r ON r.id = e.src GROUP BY e.dst
  ) s ON s.dst = d.doc_id
),
r2 AS (
  SELECT d.doc_id AS id,
         0.15 / (SELECT n FROM n) + 0.85 * coalesce(s.c, 0) AS rank
  FROM documents d LEFT JOIN (
    SELECT e.dst, sum(r.rank / 3.0) AS c
    FROM edges e JOIN r1 r ON r.id = e.src GROUP BY e.dst
  ) s ON s.dst = d.doc_id
),
r3 AS (
  SELECT d.doc_id AS id,
         0.15 / (SELECT n FROM n) + 0.85 * coalesce(s.c, 0) AS rank
  FROM documents d LEFT JOIN (
    SELECT e.dst, sum(r.rank / 3.0) AS c
    FROM edges e JOIN r2 r ON r.id = e.src GROUP BY e.dst
  ) s ON s.dst = d.doc_id
)
SELECT id, round(rank + 1e-12, 8) AS rank FROM r3
"""


def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the derived link graph (operators.graph.
    degree_stats): one row per (direction, degree) with the vertex count —
    the pre-flight skew scan for any iterative graph job. Out-degree is 3
    by construction (a built-in cross-check); the in-degree histogram is
    the md5-multinomial the oracle recomputes exactly."""
    return degree_stats(_edges(spark, sf_dir))


GRAPH_DEGREE_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
outd AS (
  SELECT 'out' AS direction, degree, count(*) AS n_vertices FROM (
    SELECT src, count(*) AS degree FROM edges GROUP BY src
  ) GROUP BY degree
),
ind AS (
  SELECT 'in' AS direction, degree, count(*) AS n_vertices FROM (
    SELECT dst, count(*) AS degree FROM edges GROUP BY dst
  ) GROUP BY degree
)
SELECT * FROM outd UNION ALL SELECT * FROM ind
"""


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round synchronous label propagation over the derived doc-link
    graph (operators.graph.label_propagation) — community detection with
    the deterministic smallest-label tie-break, which is exactly what lets
    the oracle UNROLL both rounds (neighbor join → count → window top-1 →
    left-join default) and value-check every node's final label."""
    d = load(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("id"))
    return label_propagation(_edges(spark, sf_dir), nodes, iterations=2)


def _lpa_round_sql(k: int) -> str:
    prev = f"l{k - 1}"
    return f"""n{k} AS (
  SELECT u.u AS id, l.label, count(*) AS cnt
  FROM und u JOIN {prev} l ON l.id = u.v
  GROUP BY 1, 2
), t{k} AS (
  SELECT id, label FROM (
    SELECT id, label,
           row_number() OVER (PARTITION BY id
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM n{k}
  ) WHERE rn = 1
), l{k} AS (
  SELECT d.doc_id AS id, coalesce(t.label, d.doc_id) AS label
  FROM documents d LEFT JOIN t{k} t ON t.id = d.doc_id
)"""


GRAPH_LPA_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
und AS (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL
  SELECT dst AS u, src AS v FROM edges
),
l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
{_lpa_round_sql(1)},
{_lpa_round_sql(2)}
SELECT id, label FROM l2
"""


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census (operators.graph.triangle_count) of the
    derived doc-link graph: canonical undirected edges, wedge count from
    the degree aggregate (never a join), triangles via the two-join MR
    algorithm on the id-oriented edge list, global clustering coefficient.
    The oracle replays the identical canonicalization + joins, so a
    double-counted triangle, a surviving self-loop, or a wedge formula
    slip all hash-mismatch."""
    from quantms_utils_spark.operators.graph import triangle_count

    return triangle_count(_edges(spark, sf_dir))


GRAPH_TRIANGLES_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
canon AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT x, count(*) AS d
  FROM (SELECT u AS x FROM canon UNION ALL SELECT v FROM canon)
  GROUP BY 1
),
wedges AS (SELECT COALESCE(CAST(sum(d * (d - 1)) AS BIGINT), 0) // 2 AS n_wedges FROM deg),
tri AS (
  SELECT count(*) AS n_triangles
  FROM canon e1
  JOIN canon e2 ON e2.u = e1.v
  JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v
),
ne AS (SELECT count(*) AS n_edges FROM canon)
SELECT n_edges, n_wedges, n_triangles,
       round(CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges ELSE 0 END, 6)
         AS clustering_coeff
FROM ne, wedges, tri
"""




def graph_triangle_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME triangle census as `graph_triangle_count` but through the
    DEGREE-ORIENTED plan (operators.graph.triangle_count
    orientation="degree"): edges point low-degree → high-degree (id
    tie-break), the pivot sits at each triangle's least vertex, and pivot
    fan-out is C(out-deg, 2) with out-deg ≤ O(√|E|) — the power-law-hub
    survival property id orientation lacks. Counting identical triangles
    through a structurally different join tree is itself the check: the
    oracle replays the orientation (degree table, lo/hi flip, pivot at
    lo, closing-edge probe), so the two registry rows cross-validate the
    whole orientation algebra, complementing the random-graph property
    test in tests/test_graph.py."""
    from quantms_utils_spark.operators.graph import triangle_count

    return triangle_count(_edges(spark, sf_dir), orientation="degree")


GRAPH_TRIANGLES_DEGREE_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
canon AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT x, count(*) AS d
  FROM (SELECT u AS x FROM canon UNION ALL SELECT v FROM canon)
  GROUP BY 1
),
wedges AS (SELECT COALESCE(CAST(sum(d * (d - 1)) AS BIGINT), 0) // 2 AS n_wedges FROM deg),
oriented AS (
  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN u ELSE v END AS lo,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN v ELSE u END AS hi,
         CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v) THEN dv.d ELSE du.d END AS dhi
  FROM canon JOIN deg du ON du.x = u JOIN deg dv ON dv.x = v
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM oriented e1
  JOIN oriented e2 ON e2.lo = e1.lo
   AND (e1.dhi < e2.dhi OR (e1.dhi = e2.dhi AND e1.hi < e2.hi))
  JOIN oriented e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
),
ne AS (SELECT count(*) AS n_edges FROM canon)
SELECT n_edges, n_wedges, n_triangles,
       round(CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges ELSE 0 END, 6)
         AS clustering_coeff
FROM ne, wedges, tri
"""




def graph_tree_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth histogram of a derived random recursive forest
    (parent(i) = md5-uniform in [0, i), root 0) computed by POINTER
    DOUBLING (operators.graph.tree_depths) — the hierarchy-traversal
    query SQL needs a recursive CTE for, resolved here in O(log depth)
    self-joins instead of O(depth) rounds. The oracle IS the recursive
    CTE (DuckDB walks every chain to the root), so a missed jump, a
    mis-accumulated step count, or a truncated chain shifts the histogram
    and hash-mismatches."""
    from quantms_utils_spark.operators.graph import tree_depths

    d = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    parents = d.select(
        F.col("doc_id").alias("node"),
        F.when(F.col("doc_id") == 0, F.lit(0))
        .otherwise(h % F.col("doc_id"))
        .alias("parent"),
    )
    depths = tree_depths(parents, max_rounds=10)
    return depths.groupBy("depth").agg(F.count(F.lit(1)).alias("n_nodes"))


GRAPH_TREE_DEPTHS_SQL = """
WITH RECURSIVE pr AS (
  SELECT doc_id AS n,
         CASE WHEN doc_id = 0 THEN 0
              ELSE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                   % doc_id END AS parent
  FROM documents
), walk(n, cur, d) AS (
  SELECT n, n, 0 FROM pr
  UNION ALL
  SELECT w.n, p.parent, w.d + 1
  FROM walk w JOIN pr p ON p.n = w.cur
  WHERE w.cur <> 0
), depth AS (
  SELECT n, max(d) AS depth FROM walk GROUP BY n
)
SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes
FROM depth GROUP BY depth
"""


QUERIES = {
    "graph_pagerank": (graph_pagerank, GRAPH_PAGERANK_SQL),
    "graph_degree_stats": (graph_degree_stats, GRAPH_DEGREE_SQL),
    "graph_label_propagation": (graph_label_propagation, GRAPH_LPA_SQL),
    "graph_triangle_count": (graph_triangle_count, GRAPH_TRIANGLES_SQL),
    "graph_triangle_degree": (graph_triangle_degree, GRAPH_TRIANGLES_DEGREE_SQL),
    "graph_tree_depths": (graph_tree_depths, GRAPH_TREE_DEPTHS_SQL),
}


def tree_depths_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECLARATIVE twin of `graph_tree_depths`: the same derived
    forest walked with Spark 4's native WITH RECURSIVE — per-level
    iteration (O(depth) joins planned by the engine) next to the
    operator's O(log depth) pointer doubling. Both registry entries over
    identical input pin the iterative operator against the engine's own
    recursion AND against DuckDB's. Per-level recursion is the right
    plan when depth is small and the frontier shrinks; pointer doubling
    wins on deep chains — having both is the point."""
    d = load(spark, sf_dir, "documents")
    d.select("doc_id").createOrReplaceTempView("__tree_docs")
    return spark.sql(
        """
        WITH RECURSIVE pr AS (
          SELECT doc_id AS n,
                 CASE WHEN doc_id = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6),
                                     16, 10) AS BIGINT) % doc_id END AS parent
          FROM __tree_docs
        ), walk(n, cur, d) AS (
          SELECT n, n, 0 FROM pr
          UNION ALL
          SELECT w.n, p.parent, w.d + 1
          FROM walk w JOIN pr p ON p.n = w.cur
          WHERE w.cur <> 0
        ), depth AS (
          SELECT n, max(d) AS depth FROM walk GROUP BY n
        )
        SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes
        FROM depth GROUP BY depth
        """
    )


QUERIES["tree_depths_recursive_cte"] = (
    tree_depths_recursive_cte,
    GRAPH_TREE_DEPTHS_SQL,
)


def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source shortest hops (operators.graph.bfs_hops) over the
    derived doc-link graph: minimum hop count from seed docs {0,1,2}
    within 4 hops, reported as a reach histogram (hop, n_vertices). The
    engine runs frontier-expansion BFS (one hash join + one anti-join
    per round, settled set grows monotonically); the oracle walks ALL
    bounded paths with a recursive CTE and takes min(hop) per vertex —
    a different algorithm for the same distances, so a premature settle,
    a lost frontier vertex, or an off-by-one hop all hash-mismatch."""
    from quantms_utils_spark.operators.graph import bfs_hops

    d = load(spark, sf_dir, "documents")
    seeds = d.filter(F.col("doc_id") < 3).select("doc_id")
    dist = bfs_hops(
        _edges(spark, sf_dir), seeds, source_col="doc_id", max_hops=4
    )
    return (
        dist.groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("hop")
    )


GRAPH_BFS_HOPS_SQL = f"""
WITH RECURSIVE edges AS ({_EDGES_SQL}),
walk AS (
  SELECT doc_id AS v, 0 AS hop FROM documents WHERE doc_id < 3
  UNION ALL
  SELECT e.dst AS v, w.hop + 1 AS hop
  FROM walk w JOIN edges e ON e.src = w.v AND e.src <> e.dst
  WHERE w.hop < 4
),
dist AS (SELECT v, min(hop) AS hop FROM walk GROUP BY 1)
SELECT hop, count(*) AS n_vertices FROM dist GROUP BY 1 ORDER BY 1
"""

QUERIES["graph_bfs_hops"] = (graph_bfs_hops, GRAPH_BFS_HOPS_SQL)
