"""Iterative graph computation over edge-list DataFrames.

The missing family next to connected components (`operators/dedup.py`):
fixed-point iteration where every round is rank-join-aggregate rather than
label-min. PageRank is the canonical member — it is the crawl-frontier /
document-authority score every web-scale curation pipeline wants next to
URL canonicalization (`operators/web.py`) and WARC ingest (`sources/warc.py`).

Scale shape (100 TB framing):
- The edge list is hash-partitioned by ``src`` ONCE and persisted; every
  iteration then shuffles only the rank vector (|V| rows, two columns) to
  meet it, never the edges (|E| rows). On a 1000-executor cluster the edge
  partitioning is the expensive asset and it is paid exactly once.
- Each iteration is one shuffle-join + one hash aggregate by ``dst`` —
  both map-side combinable; contribution sums never materialize per-edge
  rows on the driver.
- Lineage doubles per iteration, so ``checkpoint_every`` truncates the
  plan with an eager localCheckpoint (cluster deployments would set a
  checkpoint dir and use ``checkpoint``); without it Catalyst re-analyzes
  an exponentially growing tree after ~15 rounds.
- Dangling mass: nodes with no out-edges leak their rank (the standard
  "simplified PageRank" contract). Callers that need the stochastic fix
  can add a synthetic sink edge per dangling node before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "pagerank", "degree_stats", "label_propagation", "triangle_count",
    "tree_depths", "bfs_hops", "k_core",
]


def label_propagation(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts labeled with its own id; each round it adopts the most frequent
    label among its neighbors (undirected — each edge counts both ways),
    ties broken toward the SMALLEST label so every round is deterministic
    (the fixed tie-break is what makes an unrolled-SQL oracle possible);
    isolated nodes keep their label. Fixed iteration count — classic LPA
    oscillates, so callers pick the budget.

    Per round: one join of the (symmetrized, persisted) edge list with the
    |V|-row label vector, one (node, label) count aggregate, one per-node
    window top-1. Same asset discipline as :func:`pagerank` — edges are
    partitioned once, labels are the only per-round shuffle.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    und = (
        edges.select(F.col(src).alias("__u"), F.col(dst).alias("__v"))
        .unionByName(
            edges.select(F.col(dst).alias("__u"), F.col(src).alias("__v"))
        )
        .repartition("__v")
        .persist()
    )
    labels = nodes.select(F.col(id_col), F.col(id_col).alias("label"))
    from pyspark.sql import Window

    for it in range(iterations):
        neigh = und.join(
            labels, und["__v"] == labels[id_col]
        ).select(F.col("__u"), F.col("label"))
        counted = neigh.groupBy("__u", "label").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
        w = Window.partitionBy("__u").orderBy(
            F.col("__cnt").desc(), F.col("label").asc()
        )
        top = (
            counted.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("__u"), F.col("label").alias("__new"))
        )
        labels = (
            nodes.join(top, nodes[id_col] == top["__u"], "left")
            .select(
                nodes[id_col],
                F.coalesce(F.col("__new"), nodes[id_col]).alias("label"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            labels = labels.localCheckpoint(eager=True)
    # deterministic release of the pinned undirected edge frame (round 9,
    # same rationale as pagerank)
    labels = labels.localCheckpoint(eager=True)
    und.unpersist()
    return labels


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    *,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank; returns ``(id_col, rank)`` with one row per
    node in ``nodes``.

    r_0(v) = 1/N;  r_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_t(u)/outdeg(u)

    ``nodes`` must contain every vertex (including sinks that appear only
    as ``dst``). N is carried as a broadcast one-row dimension (the BM25
    corpus-stats idiom, `operators/retrieval.py`) — no driver collect.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    spark = edges.sparkSession
    n_dim = nodes.agg(F.count("*").cast("double").alias("__n"))

    deg = edges.groupBy(src).agg(F.count("*").cast("double").alias("__deg"))
    # Partition the (src, dst, deg) asset by src once; every iteration's
    # rank join then reuses this partitioning (Exchange only on the rank
    # side). persist() pins it so the per-iteration action does not rescan.
    e = (
        edges.join(deg, src)
        .select(F.col(src).alias("__src"), F.col(dst).alias("__dst"), "__deg")
        .repartition("__src")
        .persist()
    )

    ranks = (
        nodes.crossJoin(F.broadcast(n_dim))
        .select(F.col(id_col), (F.lit(1.0) / F.col("__n")).alias("rank"))
    )
    for it in range(iterations):
        contrib = (
            e.join(ranks, e["__src"] == ranks[id_col])
            .select("__dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("__dst")
            .agg(F.sum("__c").alias("__c"))
        )
        ranks = (
            nodes.join(contrib, nodes[id_col] == contrib["__dst"], "left")
            .crossJoin(F.broadcast(n_dim))
            .select(
                nodes[id_col],
                (
                    F.lit((1.0 - damping)) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # Materialize the final ranks (lineage truncated off the pinned edge
    # asset) and release the persisted |E|-row frame deterministically —
    # the discipline triangle_count already follows; previously every
    # pagerank call leaked one pinned edge copy for the session's life
    # (round 9). The returned frame carries its own O(|V|) checkpoint
    # blocks, freed by the ContextCleaner when the caller drops it.
    ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    return ranks


def degree_stats(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """In/out-degree DISTRIBUTION of an edge list: one row per
    (direction, degree) with the number of vertices at that degree — the
    graph-health scan run before any iterative job (a power-law hub would
    make the rank join skew; this is where you find out).

    Two hash aggregates per direction, all map-side combinable; output is
    bounded by the number of distinct degrees, never |V|.
    """
    out_deg = (
        edges.groupBy(F.col(src).alias("vertex"))
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
        .select(F.lit("out").alias("direction"), "degree", "n_vertices")
    )
    in_deg = (
        edges.groupBy(F.col(dst).alias("vertex"))
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_vertices"))
        .select(F.lit("in").alias("direction"), "degree", "n_vertices")
    )
    return out_deg.unionByName(in_deg)


def _wedge_count_expr(d) -> "F.Column":
    """Exact wedge aggregate Σ d·(d−1)/2 over a degree column.

    Exact integer wedges (round 9): the double-division form loses
    low-order bits past 2^53 (a 1e9-degree hub alone has ~5e17 wedges)
    and returned NULL on an empty vertex set. Round 10 (ADVICE r9): the
    per-vertex product and the cross-vertex sum both run in
    decimal(38,0) — a long d*(d-1) silently wraps past a ~3.04e9 hub
    degree with ANSI off, and the long SUM could wrap past 2^63 across
    vertices; decimal(38,0) holds ~1e38 wedges, far above any graph
    whose edge list is storable. d·(d−1) is even, so the /2 is exact;
    the final long cast is safe for any total below 2^63 wedges (a
    graph past that bound has no storable edge list either).

    Round 11 (ADVICE r10): the empty-input default is gated on
    ``count == 0``, not a blanket ``coalesce`` — a blanket coalesce also
    rewrote a decimal-overflow NULL (ANSI off) as 0 wedges, the exact
    silent-wrong-answer class this expression exists to prevent. With the
    gate, an overflow past ~1e38 wedges surfaces as NULL instead."""
    prod = d.cast("decimal(38,0)") * (d - 1).cast("decimal(38,0)")
    total = F.when(
        F.count(F.lit(1)) == F.lit(0), F.lit(0).cast("decimal(38,0)")
    ).otherwise(F.sum(prod))
    return F.floor(total / 2).cast("long")


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    orientation: str = "id",
) -> DataFrame:
    """Global triangle census of an (arbitrary, possibly directed/multi)
    edge list, treated as a simple undirected graph: one row with
    ``n_edges`` (canonical undirected, self-loops dropped), ``n_wedges``
    (open two-paths, Σ_v C(deg v, 2)), ``n_triangles``, and the global
    clustering coefficient 3·triangles/wedges.

    Spark shape — the standard two-join MR triangle algorithm on the
    ID-ORIENTED edge list (every edge stored once as u<v, every triangle
    a<b<c counted exactly once):

    - wedges come from a DEGREE AGGREGATE, not a join (Σ C(d,2) — one
      hash aggregate over the canonical edge list, both directions);
    - triangles are one self-join on the wedge pivot (``a<b`` ⋈ ``b<c``)
      followed by one semi-join probing the closing edge ``(a, c)`` — the
      wedge stream never materializes beyond the shuffle, and the probe
      side ships only (a, c) pairs.

    ``orientation`` picks the pivot strategy — both count the SAME
    triangles (property-tested on random graphs):

    - ``"id"`` (default): edges oriented u<v, pivot at the middle vertex.
      Oracle-replayable in plain SQL; fine for bounded-degree graphs.
    - ``"degree"``: edges oriented low-degree → high-degree (tie-break by
      id), pivot at the LOWEST vertex of each triangle over its
      out-neighbor pairs. The oriented out-degree is O(sqrt(|E|)) for
      every vertex (a vertex only points at neighbors of equal-or-higher
      degree), so pivot fan-out — C(outdeg, 2), the quadratic term — is
      capped even on power-law hubs where id orientation lets a celebrity
      vertex fan out to its full degree. This is the web-scale default.

    The census row is the pre-flight community-structure scan next to
    `degree_stats` — a near-zero coefficient says LPA will find nothing
    worth the rounds.
    """
    if orientation not in ("id", "degree"):
        raise ValueError(f"orientation must be 'id' or 'degree', got {orientation!r}")
    # Shared intermediates are pinned with LAZY localCheckpoint, not
    # persist() (optimization round 13, guide §5 "localCheckpoint is a
    # cheaper way to cut lineage"): every consumer (degree aggregate, both
    # join sides, closing-edge probe, edge count) reads plain row blocks
    # instead of re-building/scanning a compressed columnar cache — the
    # InMemoryRelation build was the census's single heaviest stage in the
    # event-log profile (per-task columnar batch allocation + GC), and the
    # census collects below anyway, so the checkpoint storage lives only
    # for this call. Trade (documented precedent: tree_depths,
    # connected_components, streaming/diff): truncated lineage is not
    # recomputable on executor loss — the census fails and is re-run
    # rather than silently recomputing. LAZY deliberately: an A/B
    # (9 runs per variant, one JVM each) put eager materialization at a
    # 2.7 s median degrading to 7 s within the JVM vs a stable 1.8 s
    # lazy — the extra eager jobs accumulate block-manager state the
    # census never needs. The wedge/triangle broadcast subtrees CAN race
    # on the un-materialized frame (worst case: one duplicated
    # subtree computation), which the collect below tolerates.
    canon = (
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        canon.select(F.col("u").alias("x"))
        .unionByName(canon.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    if orientation == "degree":
        # Three consumers in degree mode (wedge aggregate + the two
        # endpoint-degree attaches) — pin so the union+hash-aggregate
        # over canon runs once, not 3x (lazy localCheckpoint, same
        # rationale as `canon` above). One row per vertex; storage is
        # dropped with the collect below. In id mode wedges is the sole
        # consumer: no pin.
        deg = deg.localCheckpoint(eager=False)
    wedges = deg.agg(_wedge_count_expr(F.col("d")).alias("n_wedges"))
    if orientation == "id":
        ab = canon.select(F.col("u").alias("a"), F.col("v").alias("b"))
        bc = canon.select(F.col("u").alias("b"), F.col("v").alias("c"))
        tri = (
            ab.join(bc, "b")
            .join(
                canon,
                (F.col("a") == canon["u"]) & (F.col("c") == canon["v"]),
                "left_semi",
            )
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
    else:
        # degree orientation: lo → hi under the total order (deg, id);
        # the oriented graph is a DAG, every triangle a ≺ b ≺ c has
        # out-edges a→b, a→c at its least vertex plus closing edge b→c
        du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
        dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
        ed = canon.join(du, "u").join(dv, "v")
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        # three consumers (two wedge sides + the closing-edge probe) —
        # pin like `canon` so the canon⋈deg orientation runs once
        oriented = ed.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
        ).localCheckpoint(eager=False)
        e1 = oriented.select(
            F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("dhi").alias("db")
        )
        e2 = oriented.select(
            F.col("lo").alias("a"), F.col("hi").alias("c"), F.col("dhi").alias("dc")
        )
        wedge_at_lo = e1.join(e2, "a").filter(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        tri = (
            wedge_at_lo.join(
                oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
                ["b", "c"],
                "left_semi",
            )
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
    n_edges = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    census = (
        n_edges.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(F.col("n_wedges") > 0,
                       3.0 * F.col("n_triangles") / F.col("n_wedges"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )
    # Materialize the 1-row census here so the checkpoint storage lives
    # only for this call: once the local frames (canon/deg/oriented) go
    # out of scope the ContextCleaner reclaims their checkpoint blocks —
    # no storage leak across calls in a long-lived session. The rebuilt
    # local frame keeps the lazy-DataFrame contract.
    rows = census.collect()
    return edges.sparkSession.createDataFrame(rows, census.schema)


def tree_depths(
    parents: DataFrame,
    *,
    node: str = "node",
    parent: str = "parent",
    root: object = 0,
    max_rounds: int = 10,
) -> DataFrame:
    """Depth of every node in a rooted forest given (node, parent) rows —
    the hierarchical-traversal primitive (BOM explosion, org charts,
    category trees) SQL expresses with a recursive CTE and Spark has no
    native form for.

    POINTER DOUBLING, not per-level iteration: the state frame
    (node, ancestor, steps) starts at the parent pointer (1 step) and each
    round self-joins so every node's known ancestor jumps twice as far
    (steps add). Depth d resolves in ceil(log2 d) rounds — 10 rounds reach
    depth 1024, where a per-level walk (the naive translation of the
    recursive CTE) needs d rounds and dies on deep chains. The root's
    (root, root, 0) row is the fixpoint absorbing every chain. Each round
    is ONE equi-join + project on a |V|-row frame partitioned by the
    ancestor key; lineage is truncated with a localCheckpoint every few
    rounds like `pagerank`.

    Returns (node, depth) with depth 0 at the root. Nodes whose chain is
    longer than 2^max_rounds raise (their ancestor never reaches root) —
    the bound is explicit, not silent truncation. Dangling pointers —
    a parent id with no node row — would VANISH under the inner
    self-join (the row simply stops matching), which the unresolved-chain
    check cannot see; they are therefore rejected up front with ONE
    left-anti probe of the distinct parent set against the node set
    (broadcast-sized: distinct parents ≤ |V|), keeping the 'explicit
    error, not silent truncation' contract for arbitrary inputs.
    """
    # One validation aggregate for the OTHER silent-truncation holes
    # (round 9): a NULL parent or a duplicate node row would pass the
    # dangling probe and then vanish (NULL never equi-joins) or multiply
    # (every doubling round squares the duplicates) under the inner
    # self-join; a missing root node row deletes the absorbing fixpoint
    # and empties the whole result with unresolved == 0. All three are
    # rejected loudly instead.
    chk = parents.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(node)).alias("n_nodes"),
        F.sum(F.col(parent).isNull().cast("long")).alias("n_null_parents"),
        F.sum((F.col(node) == F.lit(root)).cast("long")).alias("n_root"),
    ).collect()[0]
    if chk["n_rows"]:
        if chk["n_null_parents"]:
            raise ValueError(
                f"{chk['n_null_parents']} NULL parent pointer(s): the rows "
                "(and their subtrees) would be silently dropped"
            )
        if chk["n_rows"] != chk["n_nodes"]:
            raise ValueError(
                "duplicate node rows: "
                f"{chk['n_rows']} rows over {chk['n_nodes']} distinct nodes "
                "— duplicates multiply geometrically under pointer doubling"
            )
        if not chk["n_root"]:
            raise ValueError(
                f"root {root!r} has no node row: the absorbing (root, root) "
                "fixpoint is missing and every chain would silently vanish"
            )
    dangling = (
        parents.select(F.col(parent).alias("a"))
        .filter(F.col("a") != F.lit(root))
        .distinct()
        .join(
            parents.select(F.col(node).alias("a")).distinct(),
            "a",
            "left_anti",
        )
        .limit(1)
        .collect()
    )
    if dangling:
        raise ValueError(
            f"dangling parent pointer {dangling[0]['a']!r}: parent id has no "
            f"node row — rows below it would be silently dropped"
        )
    f = parents.select(
        F.col(node).alias("n"),
        F.col(parent).alias("a"),
        F.when(F.col(node) == F.lit(root), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("s"),
    )
    # normalize the root row to the absorbing self-loop
    f = f.withColumn(
        "a", F.when(F.col("n") == F.lit(root), F.lit(root)).otherwise(F.col("a"))
    )
    for r in range(max_rounds):
        nxt = f.select(F.col("n").alias("a"), F.col("a").alias("a2"), F.col("s").alias("s2"))
        f = (
            f.join(nxt, "a")
            .select("n", F.col("a2").alias("a"), (F.col("s") + F.col("s2")).alias("s"))
        )
        # Checkpoint EVERY round (optimization round 13, guide §5
        # localCheckpoint / §2.4): the round's join references ``f``
        # TWICE (probe and build side), and Catalyst does not share
        # logical subplans across a self-join, so an UNCHECKPOINTED round
        # doubles the upstream plan — by the old every-4th-round cadence
        # the checkpoint planned 2^4 = 16 copies of everything since the
        # previous cut (physical ReuseExchange recovers some of it, which
        # is why the local win is modest — isolated A/B 2.47 → 2.30 s —
        # but plan size, planning time and the reuse gamble all grow
        # exponentially in the gap at depth). One eager cut per round
        # keeps every round exactly ONE join over cached state; the
        # convergence probe rides on the already-materialized partitions
        # (limit(1), no full count) and stops as soon as every chain has
        # absorbed (depth ≤ 2^(r+1)), which the old cadence only noticed
        # at the next multiple of 4.
        f = f.localCheckpoint(eager=True)
        if f.filter(F.col("a") != F.lit(root)).limit(1).count() == 0:
            break
    unresolved = f.filter(F.col("a") != F.lit(root)).limit(1).count()
    if unresolved:
        raise ValueError(
            f"chains longer than 2^{max_rounds} steps remain; raise max_rounds"
        )
    return f.select(F.col("n").alias(node), F.col("s").alias("depth"))


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "id",
    max_hops: int = 5,
    directed: bool = True,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance (≤ ``max_hops``) from ANY
    source vertex — the missing shortest-path member of the graph family
    (PageRank / LPA / triangles / components / tree depths all exist).

    Frontier expansion, the textbook distributed form: each round is ONE
    hash join (current frontier × edges) plus ONE anti-join against the
    settled set — no full-graph recomputation, and the frontier never
    re-visits a vertex, so total join work across all rounds is bounded
    by edges-reachable-within-max_hops. Rounds = max_hops (early exit on
    an empty frontier via a limit(1) probe, never a full count). The
    edge list and every per-round frame are ``localCheckpoint``-pinned —
    the same iterative-lineage discipline as ``connected_components``.

    At 100 TB: per-round state is (settled ∪ frontier) vertex rows —
    O(|V|) with small constants; the classic caveat is a low-diameter
    giant component where the frontier IS the graph by round 3, at which
    point the anti-join degenerates gracefully to one |V|-row hash join
    per remaining round. For unbounded-depth reachability use
    ``connected_components`` / ``connected_components_star`` instead of
    raising ``max_hops``.

    Returns (v, hop) — one row per reached vertex, hop = min distance;
    unreached vertices are absent (no sentinel).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    e = e.filter(F.col("a") != F.col("b")).localCheckpoint()
    settled = (
        sources.select(F.col(source_col).alias("v"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = settled
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.v == e.a)
            .select(F.col("b").alias("v"))
            .distinct()
            .join(settled.select("v"), "v", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint()
        )
        if not nxt.limit(1).count():
            break
        settled = settled.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return settled




def k_core(
    edges: DataFrame,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
) -> DataFrame:
    """Vertices of the K-CORE: the maximal subgraph where every vertex
    keeps degree ≥ k — the standard coreness filter for graph cleanup
    (drop weakly-attached crawl pages / spam satellites before PageRank
    or community detection).

    Iterative peeling, re-expressed shuffle-lean: each round is ONE
    degree aggregate over the surviving symmetric edge list plus TWO
    semi-joins (keep edges whose both endpoints survive). No
    ``collect_list`` anywhere — a whale hub's neighborhood is never
    materialized in one row; the degree is a plain count with map-side
    partial aggregation. Rounds = peeling depth (≤ the degeneracy
    ordering's layer count, typically ≤ tens even on web graphs);
    convergence is detected by the edge count (strictly decreasing until
    fixpoint — one cheap agg, no extra join). Per-round frames are
    ``localCheckpoint``-pinned, the same iterative-lineage discipline as
    ``connected_components``.

    There is no SQL-expressible oracle (peeling is a
    loop-until-fixpoint, which WITH RECURSIVE's append-only semantics
    cannot express), so evidence is property-based: brute-force peeling
    replayed in driver Python on random graphs (tests/test_graph.py).

    Returns (v,) — distinct vertices in the k-core (empty if none).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev = e.count()
    converged = prev == 0
    for _ in range(max_iter):
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("a")
        e = (
            e.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
        n = e.count()
        if n == prev:
            converged = True
            break
        prev = n
    if not converged:
        # a non-fixpoint edge set is a SUPERSET of the k-core — returning
        # it silently would be wrong-but-plausible; fail loudly instead
        # (same contract as tree_depths' max_rounds raise)
        raise RuntimeError(
            f"k_core did not reach the peeling fixpoint in max_iter={max_iter} "
            "rounds; raise max_iter (rounds needed = peeling depth)"
        )
    return e.select(F.col("a").alias("v")).distinct()


