"""Connected-components operators: min-label propagation vs the
large-star/small-star rewrite (the 100 TB path).

The star algorithm must (a) agree with min-label propagation on every graph,
(b) converge on high-diameter graphs in far fewer rounds — pinned by running
both under a tight max_iter where min-label provably cannot finish, and
(c) handle a whale component (one giant hub-and-spoke near-clique) and
string vertex ids (type-genericity).
"""

from __future__ import annotations

import random

import pytest

from quantms_utils_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "doc_a string, doc_b string"
    )


def _labels(df):
    return {r["v"]: r["label"] for r in df.collect()}


def _brute_components(pairs):
    """Driver-side union-find ground truth."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(str(a)), find(str(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in list(parent)}


PATH = [(i, i + 1) for i in range(60)]  # diameter 60

WHALE = (
    [("hub", f"w{i:04d}") for i in range(2000)]  # giant star
    + [(f"w{i:04d}", f"w{i + 1:04d}") for i in range(0, 1990, 7)]  # extra chords
    + [("zz1", "zz2"), ("zz2", "zz3"), ("aa1", "aa2")]  # small side components
)


class TestStarEquivalence:
    def test_path_graph_both_algorithms(self, spark):
        e = _edges(spark, PATH)
        expected = _brute_components(PATH)
        star = _labels(connected_components_star(e, "doc_a", "doc_b"))
        # min-label needs one round per hop of diameter: give it enough
        prop = _labels(connected_components(e, "doc_a", "doc_b", max_iter=80))
        assert star == expected
        assert prop == expected

    def test_whale_component(self, spark):
        e = _edges(spark, WHALE)
        expected = _brute_components(WHALE)
        star = _labels(connected_components_star(e, "doc_a", "doc_b"))
        assert star == expected

    def test_random_graphs_agree(self, spark):
        rng = random.Random(7)
        for trial in range(3):
            n = 120
            pairs = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(80 + 40 * trial)
            ]
            pairs = [(a, b) for a, b in pairs if a != b]
            e = _edges(spark, pairs)
            expected = _brute_components(pairs)
            star = _labels(connected_components_star(e, "doc_a", "doc_b"))
            prop = _labels(connected_components(e, "doc_a", "doc_b"))
            assert star == expected, f"trial {trial}"
            assert prop == expected, f"trial {trial}"


class TestStarRoundComplexity:
    def test_star_converges_where_label_propagation_cannot(self, spark):
        """On a diameter-60 path, min-label propagation needs ~60 rounds; the
        star algorithm is O(log² n). Under max_iter=8 the star result is
        exact while propagation is still mid-flight — the concrete reason
        the star form is the 100 TB default for whale/deep graphs."""
        e = _edges(spark, PATH)
        expected = _brute_components(PATH)
        star = _labels(connected_components_star(e, "doc_a", "doc_b", max_iter=8))
        assert star == expected

        # propagation genuinely needs more rounds — and since round 6 it
        # REFUSES to return the mid-flight (wrong) labels instead of
        # silently handing them back
        import pytest

        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(e, "doc_a", "doc_b", max_iter=8)

    def test_star_handles_int_ids(self, spark):
        pairs = [(1, 2), (2, 3), (10, 11)]
        e = spark.createDataFrame(pairs, "doc_a int, doc_b int")
        star = {
            r["v"]: r["label"]
            for r in connected_components_star(e, "doc_a", "doc_b").collect()
        }
        assert star == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


class TestClusterDispatch:
    def test_auto_routes_star_on_dense_graph(self, spark):
        """A 30-clique has avg degree ~29 — auto must route the star path,
        and the labels must equal min-label's."""
        from quantms_utils_spark.operators.dedup import (
            cluster_components,
            connected_components,
        )

        edges = spark.createDataFrame(
            [(i, j) for i in range(30) for j in range(i + 1, 30)],
            "doc_a long, doc_b long",
        )
        decided: list[str] = []
        got = {
            r["v"]: r["label"]
            for r in cluster_components(
                edges, "doc_a", "doc_b", _decision_out=decided
            ).collect()
        }
        assert decided == ["star"]
        want = {
            r["v"]: r["label"]
            for r in connected_components(edges, "doc_a", "doc_b").collect()
        }
        assert got == want
        assert set(got.values()) == {0}

    def test_auto_routes_minlabel_on_sparse_graph(self, spark):
        from quantms_utils_spark.operators.dedup import cluster_components

        edges = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long"
        )
        decided: list[str] = []
        got = {
            r["v"]: r["label"]
            for r in cluster_components(
                edges, "doc_a", "doc_b", _decision_out=decided
            ).collect()
        }
        assert decided == ["minlabel"]
        assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}

    def test_forced_star_matches_minlabel_on_lsh_pairs(self, spark):
        """The cluster query's graph with the star path FORCED must produce
        the same clusters the min-label path does (the 100 TB path is
        oracle-equivalent, per the round-2 review item #10)."""
        from quantms_utils_spark.operators.dedup import cluster_components
        from quantms_utils_spark.queries.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(spark.sparkSession if hasattr(spark, "sparkSession") else spark, "/root/testdata/sf0.001")
        a = {
            (r["v"], r["label"])
            for r in cluster_components(
                pairs, "doc_a", "doc_b", method="star"
            ).collect()
        }
        b = {
            (r["v"], r["label"])
            for r in cluster_components(
                pairs, "doc_a", "doc_b", method="minlabel"
            ).collect()
        }
        assert a == b and len(a) > 0

    def test_unknown_method_rejected(self, spark):
        import pytest
        from quantms_utils_spark.operators.dedup import cluster_components

        edges = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        with pytest.raises(ValueError, match="unknown method"):
            cluster_components(edges, "doc_a", "doc_b", method="bogus")


def test_min_label_raises_on_non_convergence(spark):
    """Round-6: a non-converged label frame is WRONG (labels not yet
    propagated), so exhausting max_iter must raise, never return."""
    import pytest
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.dedup import connected_components

    # a 30-node path needs ~diameter rounds; 2 is not enough
    e = spark.range(30).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("d")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, "s", "d", max_iter=2)


def test_star_raises_on_non_convergence(spark):
    import pytest
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.dedup import connected_components_star

    e = spark.range(200).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("d")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(e, "s", "d", max_iter=1)


def test_empty_edges_trivially_converged(spark):
    """ADVICE r6 (low): an empty edge frame (or max_iter=0 over one) is a
    pre-loop fixpoint — both variants must return an empty label frame,
    never raise non-convergence on trivially-correct output."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    empty = spark.range(0).select(
        F.col("id").alias("s"), F.col("id").alias("d")
    )
    for fn in (connected_components, connected_components_star):
        for mi in (0, 5):
            out = fn(empty, "s", "d", max_iter=mi)
            assert out.count() == 0
            assert set(out.columns) == {"v", "label"}
    # self-loop-only edges: both variants label the vertex as itself —
    # one shared contract (star completes the set _sym filters away)
    loops = spark.range(3).select(F.col("id").alias("s"), F.col("id").alias("d"))
    for fn in (connected_components, connected_components_star):
        got = sorted(tuple(r) for r in fn(loops, "s", "d").collect())
        assert got == [(0, 0), (1, 1), (2, 2)], fn.__name__
