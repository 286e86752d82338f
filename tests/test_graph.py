"""PageRank / degree-stats operators (`operators/graph.py`).

Closed-form checks on tiny graphs (hand-computed fixed points), dangling
semantics, and the checkpoint path — the registry query `graph_pagerank`
separately proves a 3-iteration run against the DuckDB unrolled oracle.
"""

from __future__ import annotations

import pytest

from quantms_utils_spark.operators.graph import degree_stats, pagerank


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src long, dst long")


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_fixed_point(spark):
    # 0 <-> 1: symmetric, rank stays 1/2 for every iteration count.
    e = _edges(spark, [(0, 1), (1, 0)])
    n = _nodes(spark, [0, 1])
    for iters in (0, 1, 5):
        r = _ranks(pagerank(e, n, iterations=iters))
        assert r[0] == pytest.approx(0.5)
        assert r[1] == pytest.approx(0.5)


def test_one_iteration_hand_computed(spark):
    # 0->1, 0->2, 1->2, 2->0 with d=0.85, N=3, r0=1/3 each:
    # r1(0) = 0.05 + 0.85*(1/3)          (all of 2's rank)
    # r1(1) = 0.05 + 0.85*(1/6)          (half of 0's rank)
    # r1(2) = 0.05 + 0.85*(1/6 + 1/3)    (half of 0 + all of 1)
    e = _edges(spark, [(0, 1), (0, 2), (1, 2), (2, 0)])
    n = _nodes(spark, [0, 1, 2])
    r = _ranks(pagerank(e, n, iterations=1))
    assert r[0] == pytest.approx(0.05 + 0.85 / 3)
    assert r[1] == pytest.approx(0.05 + 0.85 / 6)
    assert r[2] == pytest.approx(0.05 + 0.85 * (1 / 6 + 1 / 3))


def test_sink_node_gets_base_rank_and_leaks_mass(spark):
    # 0->1 where 1 has no out-edges (dangling): documented simplified-PR
    # contract — node 1 receives, node 0 gets only the base term, and the
    # total mass after one iteration is < 1 (the leak).
    e = _edges(spark, [(0, 1)])
    n = _nodes(spark, [0, 1])
    r = _ranks(pagerank(e, n, iterations=1))
    assert r[0] == pytest.approx(0.15 / 2)
    assert r[1] == pytest.approx(0.15 / 2 + 0.85 * 0.5)
    assert sum(r.values()) < 1.0


def test_checkpoint_path_matches_plain(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 1)])
    n = _nodes(spark, [0, 1, 2])
    plain = _ranks(pagerank(e, n, iterations=4, checkpoint_every=0))
    chk = _ranks(pagerank(e, n, iterations=4, checkpoint_every=2))
    for k in plain:
        assert chk[k] == pytest.approx(plain[k], rel=1e-12)


def test_rejects_negative_iterations(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, _nodes(spark, [0, 1]), iterations=-1)


def test_degree_stats_histogram(spark):
    # out-degrees: 0->2 edges, 1->1, 2->1 ; in-degrees: 1 gets 2, 0 and 2 get 1
    e = _edges(spark, [(0, 1), (0, 2), (1, 0), (2, 1)])
    rows = {
        (r["direction"], r["degree"]): r["n_vertices"]
        for r in degree_stats(e).collect()
    }
    assert rows == {
        ("out", 2): 1,
        ("out", 1): 2,
        ("in", 2): 1,
        ("in", 1): 2,
    }


def test_label_propagation_two_triangles(spark):
    # two triangles joined by one bridge edge: after 2 rounds each triangle
    # converges to its minimum member's label
    from quantms_utils_spark.operators.graph import label_propagation

    e = _edges(
        spark,
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
    )
    n = _nodes(spark, range(6))
    labels = {
        r["id"]: r["label"]
        for r in label_propagation(e, n, iterations=2).collect()
    }
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[4] == labels[5]


def test_label_propagation_isolated_node_keeps_label(spark):
    # a 2-cycle oscillates under synchronous LPA (documented): odd rounds
    # swap the pair's labels, even rounds restore them; the isolated node
    # keeps its own label at any budget
    from quantms_utils_spark.operators.graph import label_propagation

    e = _edges(spark, [(0, 1)])
    n = _nodes(spark, [0, 1, 9])
    odd = {
        r["id"]: r["label"]
        for r in label_propagation(e, n, iterations=3).collect()
    }
    even = {
        r["id"]: r["label"]
        for r in label_propagation(e, n, iterations=2).collect()
    }
    assert odd[9] == 9 and even[9] == 9
    assert odd[0] == 1 and odd[1] == 0
    assert even[0] == 0 and even[1] == 1


def test_label_propagation_tie_breaks_to_smallest(spark):
    # node 2 has neighbors 0 and 1 (one edge each): tie -> label 0
    from quantms_utils_spark.operators.graph import label_propagation

    e = _edges(spark, [(0, 2), (1, 2)])
    n = _nodes(spark, [0, 1, 2])
    labels = {
        r["id"]: r["label"]
        for r in label_propagation(e, n, iterations=1).collect()
    }
    assert labels[2] == 0


def test_triangle_count_known_graph(spark):
    from quantms_utils_spark.operators.graph import triangle_count

    # K4 minus one edge: vertices 1..4, all pairs except (3,4).
    # 5 edges; degrees 3,3,2,2 -> wedges 3+3+1+1=8; triangles 123,124 -> 2.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_edges, row.n_wedges, row.n_triangles) == (5, 8, 2)
    assert row.clustering_coeff == round(6 / 8, 6)


def test_triangle_count_dedups_and_drops_self_loops(spark):
    from quantms_utils_spark.operators.graph import triangle_count

    # same triangle listed in both orientations + duplicates + self loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (2, 2)],
        "src long, dst long",
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_edges, row.n_wedges, row.n_triangles) == (3, 3, 1)
    assert row.clustering_coeff == 1.0


def test_triangle_count_triangle_free(spark):
    from quantms_utils_spark.operators.graph import triangle_count

    # star graph: wedges but zero triangles
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    row = triangle_count(edges).collect()[0]
    assert (row.n_wedges, row.n_triangles) == (3, 0)
    assert row.clustering_coeff == 0.0


def test_tree_depths_chain_and_star(spark):
    from quantms_utils_spark.operators.graph import tree_depths

    # chain 0<-1<-2<-3 plus star leaves 4,5 under 0
    parents = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 2), (4, 0), (5, 0)],
        "node long, parent long",
    )
    got = {r.node: r.depth for r in tree_depths(parents).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


def test_tree_depths_deep_chain_needs_log_rounds(spark):
    from quantms_utils_spark.operators.graph import tree_depths

    n = 40
    parents = spark.createDataFrame(
        [(i, max(i - 1, 0)) for i in range(n)], "node long, parent long"
    )
    # depth 39 resolves in 6 doubling rounds (2^6 = 64 >= 39)
    got = {r.node: r.depth for r in tree_depths(parents, max_rounds=6).collect()}
    assert got[n - 1] == n - 1 and got[0] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="chains longer"):
        tree_depths(parents, max_rounds=3).collect()


def test_triangle_degree_orientation_matches_id(spark):
    from quantms_utils_spark.operators.graph import triangle_count

    # K4 minus one edge again: both orientations must produce the same census
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    a = triangle_count(edges, orientation="id").collect()[0]
    b = triangle_count(edges, orientation="degree").collect()[0]
    assert a == b


def test_triangle_degree_orientation_property_random(spark):
    """Property: id- and degree-orientation count identical triangles on
    random graphs, including a power-law-ish hub where degree orientation
    actually reorders edges."""
    import random

    from quantms_utils_spark.operators.graph import triangle_count

    rng = random.Random(42)
    for trial in range(3):
        n = 24
        # hub vertex 0 connects to most; the rest are sparse random
        pairs = {(0, v) for v in range(1, n) if rng.random() < 0.7}
        pairs |= {
            (min(u, v), max(u, v))
            for _ in range(60)
            for u, v in [(rng.randrange(n), rng.randrange(n))]
            if u != v
        }
        edges = spark.createDataFrame(
            [(u, v) for u, v in sorted(pairs)], "src long, dst long"
        )
        a = triangle_count(edges, orientation="id").collect()[0]
        b = triangle_count(edges, orientation="degree").collect()[0]
        assert a.n_triangles == b.n_triangles, f"trial {trial}"
        assert a.n_edges == b.n_edges and a.n_wedges == b.n_wedges


def test_triangle_count_rejects_bad_orientation(spark):
    from quantms_utils_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="orientation"):
        triangle_count(edges, orientation="nope")


def test_tree_depths_dangling_parent_raises(spark):
    """A parent id with no node row must raise up front — under the inner
    self-join the row would silently vanish (the unresolved-chain check
    cannot see rows that no longer exist)."""
    from quantms_utils_spark.operators.graph import tree_depths

    parents = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 99)], "node long, parent long"
    )
    with pytest.raises(ValueError, match="dangling parent"):
        tree_depths(parents)


class TestBfsHops:
    def _edges(self, spark, pairs):
        from pyspark.sql import Row

        return spark.createDataFrame([Row(s=a, d=b) for a, b in pairs])

    def _seeds(self, spark, ids):
        from pyspark.sql import Row

        return spark.createDataFrame([Row(id=i) for i in ids])

    def test_hand_graph_min_hops(self, spark):
        from quantms_utils_spark.operators.graph import bfs_hops

        # 0→1→2→3, plus shortcut 0→2; 9 isolated via 8→9 (unreachable)
        e = self._edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2), (8, 9)])
        got = {
            r["v"]: r["hop"]
            for r in bfs_hops(
                e, self._seeds(spark, [0]), src="s", dst="d",
                source_col="id", max_hops=5,
            ).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 2}

    def test_multi_source_and_undirected(self, spark):
        from quantms_utils_spark.operators.graph import bfs_hops

        e = self._edges(spark, [(0, 1), (2, 1), (3, 2)])
        got = {
            r["v"]: r["hop"]
            for r in bfs_hops(
                e, self._seeds(spark, [0, 3]), src="s", dst="d",
                source_col="id", max_hops=3, directed=False,
            ).collect()
        }
        # sources at 0 and 3: 1 is 1 from 0; 2 is 1 from 3
        assert got == {0: 0, 3: 0, 1: 1, 2: 1}

    def test_max_hops_bound_and_self_loops(self, spark):
        from quantms_utils_spark.operators.graph import bfs_hops

        e = self._edges(spark, [(0, 0), (0, 1), (1, 2), (2, 3), (3, 4)])
        got = {
            r["v"]: r["hop"]
            for r in bfs_hops(
                e, self._seeds(spark, [0]), src="s", dst="d",
                source_col="id", max_hops=2,
            ).collect()
        }
        assert got == {0: 0, 1: 1, 2: 2}  # 3,4 beyond bound; loop ignored


class TestKCore:
    @staticmethod
    def _brute_k_core(pairs, k):
        """Driver-python peeling ground truth."""
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for v in [v for v, nb in adj.items() if len(nb) < k]:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
        return set(adj)

    def test_triangle_with_tail(self, spark):
        from pyspark.sql import Row

        from quantms_utils_spark.operators.graph import k_core

        # triangle 0-1-2 plus a tail 2-3-4: 2-core is exactly the triangle
        pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
        e = spark.createDataFrame([Row(s=a, d=b) for a, b in pairs])
        got = {r["v"] for r in k_core(e, 2, src="s", dst="d").collect()}
        assert got == {0, 1, 2}
        # 3-core of this graph is empty
        assert k_core(e, 3, src="s", dst="d").count() == 0

    def test_cascading_peel(self, spark):
        from pyspark.sql import Row

        from quantms_utils_spark.operators.graph import k_core

        # chain hung off a 4-clique: removing the chain end cascades
        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        chain = [(3, 10), (10, 11), (11, 12)]
        e = spark.createDataFrame([Row(s=a, d=b) for a, b in clique + chain])
        got = {r["v"] for r in k_core(e, 3, src="s", dst="d").collect()}
        assert got == {0, 1, 2, 3}

    def test_random_graph_matches_brute(self, spark):
        import random

        from pyspark.sql import Row

        from quantms_utils_spark.operators.graph import k_core

        rng = random.Random(7)
        pairs = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(40), rng.randrange(40)) for _ in range(160)
                )
                if a != b
            }
        )
        e = spark.createDataFrame([Row(s=a, d=b) for a, b in pairs])
        for k in (2, 3, 4):
            got = {r["v"] for r in k_core(e, k, src="s", dst="d").collect()}
            assert got == self._brute_k_core(pairs, k), k


def test_k_core_raises_on_non_convergence(spark):
    """max_iter exhausted before the peeling fixpoint must raise, not
    silently return a superset (round-6 ADVICE fix; same contract as
    tree_depths' max_rounds raise)."""
    import pytest
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.graph import k_core

    # a long path graph peels one layer per round from each end: with
    # max_iter=1 the 2-core computation (empty) cannot converge in time
    e = spark.range(30).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("d")
    )
    with pytest.raises(RuntimeError, match="max_iter"):
        k_core(e, 2, src="s", dst="d", max_iter=1)


class TestTreeDepthsValidation:
    """Round-9 (review findings): the three silent-truncation holes in
    tree_depths' input validation — NULL parents vanished in the inner
    join, duplicate node rows multiplied geometrically, and a missing
    root node row deleted the absorbing fixpoint and emptied the whole
    result with unresolved == 0. All must fail loudly."""

    def _depths(self, spark, rows, schema="node long, parent long"):
        from quantms_utils_spark.operators.graph import tree_depths

        return tree_depths(spark.createDataFrame(rows, schema))

    def test_null_parent_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError, match="NULL parent"):
            self._depths(spark, [(0, 0), (1, None)])

    def test_duplicate_node_rows_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError, match="duplicate node"):
            self._depths(spark, [(0, 0), (1, 0), (1, 0)])

    def test_missing_root_row_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError, match="no node row"):
            self._depths(spark, [(1, 0)])  # root 0 never appears as a node

    def test_valid_forest_still_works(self, spark):
        got = {
            r["node"]: r["depth"]
            for r in self._depths(
                spark, [(0, 0), (1, 0), (2, 1), (3, 2)]
            ).collect()
        }
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_triangle_census_empty_and_exact_wedges(spark):
    """Round-9 (review findings): an all-self-loop edge set must report
    n_wedges = 0 (not NULL), and the wedge count is exact integer
    arithmetic (shiftright of the long sum, not a double division)."""
    from quantms_utils_spark.operators.graph import triangle_count

    loops = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    row = triangle_count(loops).collect()[0]
    assert row["n_edges"] == 0
    assert row["n_wedges"] == 0           # previously NULL
    assert row["n_triangles"] == 0
    assert row["clustering_coeff"] == 0.0

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    assert triangle_count(star).collect()[0]["n_wedges"] == 10  # C(5,2)


def test_triangle_census_wedge_sum_runs_in_decimal(spark):
    """Round-10 (ADVICE r9): the wedge aggregate runs in decimal(38,0) so
    a hub degree past ~3.04e9 (where long d*(d-1) wraps with ANSI off)
    cannot produce a garbage n_wedges. Pinned two ways: a real star hub
    stays exact, and the shared expression is fed a synthetic 4e9 degree
    whose long-math product would wrap negative."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.graph import (
        _wedge_count_expr,
        triangle_count,
    )

    hub = spark.range(2000).select(
        F.lit(100000).alias("src"), F.col("id").alias("dst")
    )
    row = triangle_count(hub).collect()[0]
    assert row["n_wedges"] == 2000 * 1999 // 2  # exact, type long
    assert row["n_triangles"] == 0

    d = 4_000_000_000  # long d*(d-1) = 1.6e19 wraps past 2^63
    got = (
        spark.createDataFrame([(d,)], "d long")
        .agg(_wedge_count_expr(F.col("d")).alias("w"))
        .collect()[0]["w"]
    )
    assert got == d * (d - 1) // 2  # 7999999998000000000, exact


def test_wedge_expr_empty_is_zero_but_overflow_surfaces_null(spark):
    """Round-11 (ADVICE r10): the empty-input default is gated on
    count == 0, so an empty vertex set still yields 0 wedges — but a
    decimal(38,0) sum overflow (ANSI off) surfaces as NULL instead of
    being coalesced to 0, the silent-wrong-answer class the decimal
    rewrite exists to prevent."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.graph import _wedge_count_expr

    empty = spark.createDataFrame([], "d long")
    assert (
        empty.agg(_wedge_count_expr(F.col("d")).alias("w")).collect()[0]["w"]
        == 0
    )

    # two near-long-max degrees: each d*(d-1) ~ 8.5e37, the decimal(38,0)
    # SUM ~ 1.7e38 overflows -> must surface (ANSI on: ArithmeticException;
    # ANSI off: NULL), never a silent 0
    from pyspark.errors.exceptions.captured import ArithmeticException

    d = 9_200_000_000_000_000_000
    over = spark.createDataFrame([(d,), (d,)], "d long")
    q = over.agg(_wedge_count_expr(F.col("d")).alias("w"))
    if spark.conf.get("spark.sql.ansi.enabled") == "true":
        with pytest.raises(ArithmeticException):
            q.collect()
        # eval mode is captured at plan build — rebuild under ANSI off
        spark.conf.set("spark.sql.ansi.enabled", "false")
        try:
            q2 = over.agg(_wedge_count_expr(F.col("d")).alias("w"))
            assert q2.collect()[0]["w"] is None
        finally:
            spark.conf.set("spark.sql.ansi.enabled", "true")
    else:
        assert q.collect()[0]["w"] is None
