"""Similarity search over embedding columns (array<float>).

- ``cosine_sim`` — pure Catalyst expression (zip_with + aggregate fold): stays
  JVM-side, no Python boundary.
- ``ann_bruteforce`` — exact top-k: broadcast the query vector, score every
  row, TakeOrderedAndProject (per-partition heap, no full sort shuffle).
- ``ann_partitioned`` — the scale path: restrict scoring to one coarse
  partition (here the pre-assigned ``label``; in a real IVF deployment the
  centroid assignment computed the same way) before scoring. This is an IVF
  probe with nprobe=1: at 100 TB the partition column is the parquet
  partition key, so partition pruning skips everything else at scan time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.types import DoubleType

from quantms_utils_spark.functions.core import let_once


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def unit_vector(vec: Column) -> Column:
    """L2-normalize ``vec`` with the vector and its norm each let-bound
    (``let_once``) so they evaluate once per row. Materializing the norm as a
    separate projection column does NOT achieve this — CollapseProject inlines
    a once-referenced alias into the consuming lambda, where the norm fold is
    then re-evaluated per element, O(d²) per vector (verified in the
    optimized plan)."""
    return let_once(
        vec,
        lambda v: let_once(
            l2_norm(v),
            lambda nr: F.transform(
                # zero-norm guard (round 9): an all-zero embedding would
                # divide by zero — NULL elements (ANSI off) that crash the
                # numpy GEMMs downstream, or a DivideByZeroException (ANSI
                # on). Dividing by 1 keeps it the zero vector: cosine 0
                # against everything, which is the right "no information"
                # answer.
                v,
                lambda x: x / F.when(nr > 0.0, nr).otherwise(F.lit(1.0)),
            ),
        ),
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    # Let-bind each cast array: referenced three times (dot + two norms), an
    # unbound expression would cast-transform the array three times per row.
    return let_once(
        _to_double(a),
        lambda ad: let_once(
            _to_double(b),
            lambda bd: dot(ad, bd) / (l2_norm(ad) * l2_norm(bd)),
        ),
    )


def _tile_exploded(
    df: DataFrame, id_col: str, vec_col: str, block_col: str, n_buckets: int
) -> DataFrame:
    """Shared GEMM-tiling prologue of :func:`cosine_pairs_blocked` and
    :func:`knn_self_join` (round 9: extracted so the pair-coverage scheme
    cannot drift between the two consumers): unit-normalize, hash each
    row into one of ``n_buckets`` deterministic sub-buckets, and explode
    it to the unordered (ti, tj) tiles its bucket participates in — a row
    in bucket b appears once per bucket t as (min(t,b), max(t,b)), so
    every unordered pair of rows meets in EXACTLY one tile and no
    distinct is needed."""
    normed = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        unit_vector(_to_double(F.col(vec_col))).alias("u"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        .cast("int")
        .alias("bkt"),
    )
    tiles = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda t: F.struct(
            F.least(t, F.col("bkt")).alias("ti"),
            F.greatest(t, F.col("bkt")).alias("tj"),
        ),
    )
    return normed.select(
        "block", "id", "u", "bkt",
        F.explode(F.array_distinct(tiles)).alias("tile"),
    ).select(
        "block", "id", "u", "bkt",
        F.col("tile.ti").alias("ti"), F.col("tile.tj").alias("tj"),
    )


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    n_buckets: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold within coarse blocks.

    The block column (cluster/label/IVF-centroid assignment) turns the O(n²)
    all-pairs space into Σ b² per block — the same blocking idea as LSH
    banding, but in embedding space.

    Execution shape (chosen over a pair-expanding self-join deliberately):

    1. L2-normalize each vector ONCE (vector and norm let-bound via
       ``unit_vector`` — a norm referenced inside the divide lambda, even
       through an aliased column, gets inlined by CollapseProject and
       re-evaluated per element, O(d²) per vector).
    2. Hash each row into one of ``n_buckets`` deterministic sub-buckets and
       explode it to the ``n_buckets`` unordered tiles (min(t,b), max(t,b))
       its bucket participates in. Every unordered pair of rows meets in
       EXACTLY one tile, so no distinct is needed, and parallelism is
       blocks × tiles instead of blocks — hot blocks cannot straggle.
    3. ``applyInPandas`` per (block, tile): one numpy gemm scores the whole
       tile. Each vector crosses the Arrow boundary once per tile it joins —
       NOT once per pair. A join+per-pair-UDF formulation ships
       O(pairs × 2d) doubles to Python; this ships O(rows × n_buckets × d):
       for a 200-vector block that is ~50× less traffic, and the arithmetic
       runs as one BLAS call instead of 40k interpreted folds.

    Replication factor ``n_buckets`` through the single shuffle is the
    tuning knob: raise it for hot blocks (smaller tiles, more tasks), lower
    it for many small blocks. Output pairs satisfy id_a < id_b.

    The threshold compares the score ROUNDED to 6 decimals (round 13 —
    the filter analog of the ANN round-before-rank discipline): engines
    summing the dot product in different orders disagree in the last
    ulps, so a pair whose true cosine sits exactly AT the threshold (an
    exactly-representable value like 0.4 — constructible from quantized
    embeddings) would be included by one engine and excluded by the
    other under a raw comparison. Rounding first makes membership
    engine-deterministic at every round-6-representable threshold; the
    residual boundary moves to non-cluster points like 0.3999995.
    """
    import numpy as np

    from pyspark.sql.types import StructField, StructType

    exploded = _tile_exploded(df, id_col, vec_col, block_col, n_buckets)

    id_field = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_field, True),
            StructField("id_b", id_field, True),
            StructField("cos_raw", DoubleType(), True),
        ]
    )

    def tile_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        # Threshold-first: np.nonzero over the boolean score mask touches
        # only survivors. Materializing all |A|x|B| index/id arrays and
        # filtering afterwards allocates the full pair space for (typically)
        # a sub-percent survivor rate.
        ti, tj = int(pdf["ti"].iloc[0]), int(pdf["tj"].iloc[0])
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_raw": []})
        if ti == tj:
            sub = pdf[pdf["bkt"] == ti].sort_values("id")
            if len(sub) < 2:
                return empty
            ids = sub["id"].to_numpy()
            U = np.stack(sub["u"].to_numpy())
            G = U @ U.T
            ia, ib = np.nonzero(np.triu(np.round(G, 6) >= threshold, k=1))
            return pd.DataFrame(
                {"id_a": ids[ia], "id_b": ids[ib], "cos_raw": G[ia, ib]}
            )
        a_sub = pdf[pdf["bkt"] == ti]
        b_sub = pdf[pdf["bkt"] == tj]
        if len(a_sub) == 0 or len(b_sub) == 0:
            return empty
        ids_a_all = a_sub["id"].to_numpy()
        ids_b_all = b_sub["id"].to_numpy()
        G = np.stack(a_sub["u"].to_numpy()) @ np.stack(b_sub["u"].to_numpy()).T
        ia, ib = np.nonzero(np.round(G, 6) >= threshold)
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids_a_all[ia], ids_b_all[ib]),
                "id_b": np.maximum(ids_a_all[ia], ids_b_all[ib]),
                "cos_raw": G[ia, ib],
            }
        )

    return exploded.groupBy("block", "ti", "tj").applyInPandas(
        tile_pairs, schema=out_schema
    )


def ann_bruteforce(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 20,
) -> DataFrame:
    """Exact top-k cosine neighbors of the single-row ``query`` (column
    ``q_emb``), deterministic tiebreak on id.

    Ranking is by the score ROUNDED to 6 decimals (then id) — the
    round-before-rank discipline (round 13, closing the r12 tie-grain
    gamble): two engines summing the dot product in different orders
    disagree in the last ulps, so on tie-dense data (duplicate
    embeddings) a raw-score ORDER BY can cut the top-k differently per
    engine even though every rounded output value matches. Collapsing
    sub-1e-6 noise before the rank makes the (score, id) order a total
    order both engines share.
    """
    scored = vectors.crossJoin(broadcast(query)).select(
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col("q_emb")).alias("cos_raw"),
    )
    return (
        scored.orderBy(F.round("cos_raw", 6).desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cos_raw", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# IVF: k-means coarse quantizer + nprobe search


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_to_centroids(
    vec_col: str | Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-centroid id as a Catalyst expression: per-centroid squared
    distances folded into ``array_min`` over (distance, cid) structs — struct
    ordering gives the argmin with a deterministic cid tiebreak, all inside
    whole-stage codegen (no Python, no shuffle)."""
    def _argmin(vec: Column) -> Column:
        cands = F.array(
            *[
                F.struct(_sq_dist(vec, c).alias("d"), F.lit(cid).alias("cid"))
                for cid, c in centroids
            ]
        )
        return F.array_min(cands)["cid"]

    # let-bound: the cast array is referenced by every centroid's distance
    # fold — unbound it would be re-cast k times per row
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return let_once(_to_double(vec), _argmin)


def kmeans_train(
    df: DataFrame,
    vec_col: str,
    init: list[tuple[int, list[float]]],
    n_iter: int = 2,
    round_decimals: int = 2,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means, Spark-ML-shaped: centroids live on the driver
    (k × dim doubles — trivially small at any corpus scale) and are broadcast
    into each iteration's assignment expression; the two distributed steps
    per iteration are a map-only argmin assignment and one partial-aggregated
    shuffle of (cluster, dim, value) for the centroid update. Nothing
    per-row ever returns to the driver.

    Centroid coordinates are rounded to ``round_decimals`` after each update:
    quantization makes the trained centroids bit-reproducible across engines
    (an unrolled-SQL oracle recomputes them exactly), at a recall cost that is
    negligible next to the coarse-quantizer granularity itself. Clusters left
    empty by an iteration are dropped (never re-seeded), matching the SQL
    formulation.
    """
    centroids = init
    for _ in range(n_iter):
        # two projections: mixing the argmin struct fold and a generator
        # (posexplode) in ONE select makes the analyzer rename the struct
        # fields to col1/col2 before the field access resolves
        with_cid = df.select(
            assign_to_centroids(vec_col, centroids).alias("cid"),
            F.col(vec_col).alias("_v"),
        )
        assigned = with_cid.select(
            "cid", F.posexplode(_to_double(F.col("_v"))).alias("dim", "val")
        )
        rows = (
            assigned.groupBy("cid", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = round(
                r["m"], round_decimals
            )
        centroids = [
            (cid, [dims[i] for i in range(len(dims))])
            for cid, dims in sorted(by_cid.items())
        ]
    return centroids


def ivf_search(
    vectors: DataFrame,
    query: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF probe: score only vectors assigned to the ``nprobe`` centroids
    nearest the query. At 100 TB the assignment is a stored partition/cluster
    key (computed once at ingest with ``assign_to_centroids``), so the probe
    is partition pruning at scan time; here it is computed inline. The probe
    set is resolved driver-side from the driver-held centroids (k distances
    to one vector), then folded into the filter as literals."""
    import numpy as np

    qv = np.asarray(
        query.select(F.col("q_emb")).first()[0], dtype=np.float64
    )
    order = sorted(
        centroids,
        key=lambda c: (float(((np.asarray(c[1]) - qv) ** 2).sum()), c[0]),
    )
    probe_ids = [cid for cid, _ in order[:nprobe]]
    assigned = vectors.withColumn(
        "_cid", assign_to_centroids(vec_col, centroids)
    ).filter(F.col("_cid").isin(probe_ids))
    scored = assigned.crossJoin(broadcast(query)).select(
        F.col(id_col),
        cosine_sim(F.col(vec_col), F.col("q_emb")).alias("cos_raw"),
    )
    # round-before-rank (round 13): see ann_bruteforce — collapse
    # sub-1e-6 float-summation noise before the cut so tie-dense data
    # selects the same ids on every engine.
    return (
        scored.orderBy(F.round("cos_raw", 6).desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cos_raw", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Embedding compression: symmetric int8 quantization


def quantize_int8(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: ``scale = max|v| / 127``,
    ``q_i = round(v_i / scale)`` — the storage/IO form a 100 TB embedding
    store ships (4× smaller than float32, 8× than float64). Returns a struct
    ``(scale double, q array<int>, mse double)`` where ``mse`` is the
    dequantization mean-squared error.

    Pure Catalyst; the cast vector and the scale are let-bound so each
    evaluates once per row. All arithmetic is deterministic IEEE double ops
    (max, /127, round-half-away), so any engine reproduces the exact bytes —
    the DuckDB oracle value-checks scale, the full quantized array (via
    digest), and the mse. Zero vectors get scale 0 and all-zero codes.
    """

    def _q(v: Column, scale: Column) -> Column:
        codes = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
            F.transform(v, lambda x: F.round(x / scale, 0).cast("int"))
        )
        return let_once(
            codes,
            lambda q: F.struct(
                scale.alias("scale"),
                q.alias("q"),
                F.when(scale == 0.0, F.lit(0.0))
                .otherwise(
                    F.aggregate(
                        F.zip_with(
                            v, q, lambda x, qi: (x - qi * scale) * (x - qi * scale)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / F.size(v)
                )
                .alias("mse"),
            ),
        )

    return let_once(
        _to_double(vec),
        lambda v: let_once(
            F.array_max(F.transform(v, F.abs)) / F.lit(127.0),
            lambda scale: _q(v, scale),
        ),
    )


# ---------------------------------------------------------------------------
# Distributed PCA: covariance via per-partition Gram partials


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Population covariance matrix of a vector column as (i, j, cov) rows,
    0-based indices, computed the way distributed linear algebra should be on
    Spark: one Arrow-batched ``mapInPandas`` pass emits a per-partition
    partial Gram of the 1-augmented vectors (one ``(d+1)²`` numpy GEMM per
    batch, accumulated per partition), then a single tiny aggregate merges
    partials. The shuffle moves (d+1)² doubles **per partition** — independent
    of row count — which is the property that matters at 100 TB (tree
    aggregation, no d²-per-row explode, no driver collect of data rows).
    Augmenting with a constant 1 makes one GEMM carry sums (S_x row) and the
    count (corner) alongside S_xy, so cov = S_xy/n − (S_x/n)(S_y/n) needs no
    second pass.
    """
    import numpy as np

    d = dim
    schema = "i int, j int, s double"

    def partial_gram(batches):
        acc = np.zeros((d + 1, d + 1), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            A = np.hstack([V, np.ones((V.shape[0], 1))])
            acc += A.T @ A
            seen = True
        if seen:
            ii, jj = np.meshgrid(range(d + 1), range(d + 1), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": acc.ravel()}
            )

    partials = df.select(vec_col).mapInPandas(partial_gram, schema)
    sums = partials.groupBy("i", "j").agg(F.sum("s").alias("s"))
    n = sums.where((F.col("i") == d) & (F.col("j") == d)).select(
        F.col("s").alias("n")
    )
    means = sums.where((F.col("j") == d) & (F.col("i") < d)).select(
        F.col("i").alias("mi"), F.col("s").alias("sx")
    )
    return (
        sums.where((F.col("i") < d) & (F.col("j") < d))
        .join(broadcast(means.select(F.col("mi").alias("i"), F.col("sx"))), "i")
        .join(
            broadcast(
                means.select(F.col("mi").alias("j"), F.col("sx").alias("sy"))
            ),
            "j",
        )
        .crossJoin(broadcast(n))
        .select(
            "i",
            "j",
            F.round(
                F.col("s") / F.col("n")
                - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                9,
            ).alias("cov"),
        )
    )


def pca_components(df: DataFrame, vec_col: str, dim: int, k: int):
    """Top-k principal components from the distributed covariance matrix.
    The d×d eigendecomposition is driver-side numpy — legitimate because the
    matrix is d², independent of corpus size (same pattern as k-means
    centroid updates). Returns (eigenvalues desc, components as k×d rows,
    sign-normalized so the largest-|.| entry of each component is positive)."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, dim).collect()
    C = np.zeros((dim, dim))
    for r in rows:
        C[r["i"], r["j"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v)
    return [float(vals[i]) for i in order], np.stack(comps)


def pca_project(df: DataFrame, vec_col: str, components) -> DataFrame:
    """Project vectors onto principal components as a pure Catalyst
    expression (one dot-product fold per component, broadcast literals —
    map-only, no Python on the corpus side)."""
    v = _to_double(F.col(vec_col))
    cols = [
        dot(v, F.array(*[F.lit(float(x)) for x in comp])).alias(f"pc{ci}")
        for ci, comp in enumerate(components)
    ]
    return df.select("*", *cols)


def ann_batch_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
    query_vec_col: str = "q_emb",
    k: int = 10,
) -> DataFrame:
    """Top-k cosine neighbors for a BATCH of query vectors at once — the
    retrieval workload shape (many queries against one corpus), not the
    single-probe demo. The query set is broadcast and the corpus is scored in
    one map-only pass (|corpus| × |queries| scores, each inside whole-stage
    codegen); per-query ranking is a window over the query id. At 100 TB the
    broadcast bound is the query batch size (thousands of queries × d floats
    — KBs to MBs), and the rank shuffle moves only (q_id, id, score) triples,
    never vectors. Excludes self-matches when ids collide. Deterministic
    tiebreak on neighbor id, ranking by the round-6 score
    (round-before-rank, round 13: see ann_bruteforce).
    """
    from pyspark.sql import Window

    scored = (
        vectors.join(broadcast(queries), F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            cosine_sim(F.col(vec_col), F.col(query_vec_col)).alias("cos_raw"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round("cos_raw", 6).desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("cos_raw", 4).alias("cos_sim"),
            "rank",
        )
    )


def knn_self_join(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    k: int = 3,
    n_buckets: int = 4,
) -> DataFrame:
    """Exact k-nearest-neighbor GRAPH within coarse blocks: for EVERY
    vector, its top-``k`` cosine neighbors among vectors sharing its block
    (cluster/label/IVF cell) — the all-rows generalization of the
    single-query top-k, and the candidate generator for graph-based dedup
    and diversity sampling.

    Same tiled-GEMM shape as :func:`cosine_pairs_blocked` (every unordered
    pair meets in exactly one tile, one numpy matmul per tile), but each
    tile emits only each member row's TILE-LOCAL top candidates — every
    candidate within one rounding quantum (1e-6) of the tile's k-th
    largest raw score, which is exactly the set that can still reach the
    global top-k under the final (rounded score desc, id) ordering — so
    the rank shuffle carries rows × tiles × ~k candidate triples (tie
    clusters widen it as correctness requires), never the pair space. A
    final per-id window keeps the global top-k. Scores are rounded to 6
    before ranking with an id tie-break, so ranking is
    engine-deterministic even across exact-tie clusters (duplicate
    embeddings — round-12 review fix).
    """
    import numpy as np

    from pyspark.sql import Window
    from pyspark.sql.types import StructField, StructType

    exploded = _tile_exploded(df, id_col, vec_col, block_col, n_buckets)

    id_field = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id", id_field, True),
            StructField("neighbor_id", id_field, True),
            StructField("cos_raw", DoubleType(), True),
        ]
    )

    def _emit_topk(ids_a, ids_b, G):
        # Per row of A: every tile-local candidate that could still reach
        # the row's GLOBAL top-k under the final (round-6 score desc, id)
        # ordering. Exact cutoff (round 12, review): emit all candidates
        # with raw score >= (k-th largest raw in the tile) - 1e-6 — if a
        # candidate sits more than one rounding quantum below the tile's
        # k-th raw score, at least k tile-mates beat it on the ROUNDED
        # score strictly, so it can never rank <= k globally. The previous
        # k+8 argpartition margin SILENTLY emitted an arbitrary candidate
        # subset whenever a tie cluster exceeded the margin — with
        # duplicate embeddings (the normal near-dup corpus case: 30 copies
        # of one page => 29 exact-tie cosines) the id tie-break contract
        # was violated before the final rank ever saw the right rows.
        # Tie clusters legitimately widen the emission (all-ties emit the
        # whole tile row — required for correctness); typical data emits
        # ~k per row as before.
        n_cols = G.shape[1]
        if n_cols == 0:
            return [], [], []
        k_eff = min(k, n_cols)
        # NaN similarities (corrupted embeddings) are ALWAYS emitted so
        # they propagate to the output as NULL cos (ADVICE r9: bad
        # embeddings must stay detectable, never vanish) — but they must
        # be EXCLUDED from the k-th-largest cutoff: NULL cos sorts LAST
        # in the final desc rank window, so a NaN tile-mate can never
        # beat a real candidate globally, and letting NaN rank as +inf
        # here made kth=inf for any row with >= k NaN tile-mates,
        # silently dropping every REAL candidate in that tile
        # (ADVICE r12). Cutoff over NaN->-inf keeps the quantum-cutoff
        # proof valid: a real candidate more than 1e-6 below the k-th
        # largest REAL score has >= k real tile-mates strictly ahead on
        # the rounded score.
        Gk = np.where(np.isnan(G), -np.inf, G)
        kth = np.partition(Gk, n_cols - k_eff, axis=1)[:, n_cols - k_eff]
        mask = (Gk >= (kth - 1e-6)[:, None]) | np.isnan(G)
        # the -inf-masked diagonal (self pair) must never emit — a block
        # with <= k members would otherwise hand every row a phantom
        # (id, id, -Infinity) neighbor (round 9).
        mask &= ~np.isneginf(G)
        ia, ic = np.nonzero(mask)
        return list(ids_a[ia]), list(ids_b[ic]), list(G[ia, ic])

    def tile_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ti, tj = int(pdf["ti"].iloc[0]), int(pdf["tj"].iloc[0])
        empty = pd.DataFrame({"id": [], "neighbor_id": [], "cos_raw": []})
        if ti == tj:
            sub = pdf[pdf["bkt"] == ti]
            if len(sub) < 2:
                return empty
            ids = sub["id"].to_numpy()
            U = np.stack(sub["u"].to_numpy())
            G = U @ U.T
            np.fill_diagonal(G, -np.inf)
            i, n, c = _emit_topk(ids, ids, G)
            return pd.DataFrame({"id": i, "neighbor_id": n, "cos_raw": c})
        a_sub = pdf[pdf["bkt"] == ti]
        b_sub = pdf[pdf["bkt"] == tj]
        if len(a_sub) == 0 or len(b_sub) == 0:
            return empty
        ids_a = a_sub["id"].to_numpy()
        ids_b = b_sub["id"].to_numpy()
        G = np.stack(a_sub["u"].to_numpy()) @ np.stack(b_sub["u"].to_numpy()).T
        i1, n1, c1 = _emit_topk(ids_a, ids_b, G)
        i2, n2, c2 = _emit_topk(ids_b, ids_a, G.T)
        return pd.DataFrame(
            {"id": i1 + i2, "neighbor_id": n1 + n2, "cos_raw": c1 + c2}
        )

    candidates = exploded.groupBy("block", "ti", "tj").applyInPandas(
        tile_topk, schema=out_schema
    )
    scored = candidates.select(
        "id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "neighbor_id",
            "cos_sim",
            "rank",
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
    n_buckets: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): within each
    coarse block (a trained k-means cell in the canonical setup), a row is a
    semantic duplicate when some LOWER-ID row of the same block has cosine
    similarity ≥ ``threshold`` with it; the minimum such lower id is its
    keeper. Returns one row per input row: ``(id_col, block_col, dup_of,
    is_dup)`` — the deterministic min-id keeper policy (the paper keeps the
    point farthest from the centroid; any fixed rule dedups equally, and
    min-id is reproducible across engines).

    Execution shape: candidate pairs come from the pair-tiled GEMM self-join
    (:func:`cosine_pairs_blocked` — pair space Σ block², never corpus²; each
    pair meets in exactly one tile), then ONE per-duplicate min aggregate and
    a left join back to the ids. At 100 TB the block column is the k-means
    cell id written at ingest, so the self-join is partition-local.

    The projected input (id, block, vec) is PINNED for the call's result
    lifetime (optimization round 13, guide §5 caching): the frame feeds
    both the pair tiles and the final join-back, and in the canonical
    inline setup ``block_col`` is a k×d nearest-centroid FOLD — without
    the pin the whole assignment expression re-executes for the join-back
    branch (Catalyst shares no subplan across the two consumers).
    Released when the returned frame is dropped, per the dedup-module
    cache policy (:func:`quantms_utils_spark.operators.dedup.release_caches`
    / ``cache_scope`` work on the result).
    """
    from quantms_utils_spark.operators.dedup import _release_on_drop

    base = df.select(id_col, block_col, vec_col).persist()
    pairs = cosine_pairs_blocked(
        base, id_col=id_col, vec_col=vec_col, block_col=block_col,
        threshold=threshold, n_buckets=n_buckets,
    )
    dup_of = (
        pairs.groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
        .withColumnRenamed("id_b", id_col)
    )
    return _release_on_drop(
        base.select(id_col, block_col)
        .join(dup_of, id_col, "left")
        .select(
            id_col,
            block_col,
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_dup"),
        ),
        base,
    )


def kmeans_train_fast(
    df: DataFrame,
    vec_col: str,
    init: list[tuple[int, list[float]]],
    n_iter: int = 2,
    round_decimals: int = 2,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means, production shape (the MLlib/treeAggregate form):
    one Arrow-batched ``mapInPandas`` pass per iteration computes
    per-partition (cid, count, sum-vector) partials — assignment is a single
    numpy distance matrix per batch instead of a k×d Catalyst fold whose
    expression tree grows with k (the :func:`kmeans_train` form is exact and
    oracle-replayable but its per-row fold is the wrong shape beyond small
    k). Only ≤ partitions × k partial rows ever reach the driver.

    Same contract as :func:`kmeans_train`: argmin ties break to the lowest
    cid, per-update rounding to ``round_decimals``, empty clusters dropped.
    Equivalence is pinned in tests/test_kmeans_fast.py.
    """
    import numpy as np
    import pandas as pd

    # argmin ties break to the FIRST index, so the centroid list must be
    # cid-sorted for "ties break to the lowest cid" to hold regardless of
    # the caller's init order (kmeans_train's struct array_min breaks ties
    # by actual cid; round 9 aligns the fast form)
    centroids = sorted(init, key=lambda cv: cv[0])
    for _ in range(n_iter):
        cids = [c for c, _ in centroids]
        C = np.stack([np.asarray(v, dtype=np.float64) for _, v in centroids])

        def partials(batches, C=C, cids=cids):
            sums: dict[int, np.ndarray] = {}
            counts: dict[int, int] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                # ||v-c||² expanded: the GEMM does the heavy lifting
                d2 = (
                    (V * V).sum(1)[:, None]
                    - 2.0 * (V @ C.T)
                    + (C * C).sum(1)[None, :]
                )
                a = d2.argmin(1)  # ties -> first index = lowest cid
                for j in range(len(cids)):
                    m = a == j
                    if m.any():
                        sums[j] = sums.get(j, 0) + V[m].sum(0)
                        counts[j] = counts.get(j, 0) + int(m.sum())
            rows = [
                {"cid": cids[j], "cnt": counts[j], "s": sums[j].tolist()}
                for j in sorted(sums)
            ]
            if rows:
                yield pd.DataFrame(rows)
            else:
                # explicit object dtype: an empty float64 column won't
                # convert to arrow list<double>
                yield pd.DataFrame(
                    {
                        "cid": pd.Series([], dtype="int32"),
                        "cnt": pd.Series([], dtype="int64"),
                        "s": pd.Series([], dtype="object"),
                    }
                )

        part = (
            df.select(_to_double(F.col(vec_col)).alias("_v"))
            .mapInPandas(partials, schema="cid int, cnt long, s array<double>")
            .collect()
        )
        agg: dict[int, tuple[int, object]] = {}
        for r in part:
            c, n, s = int(r["cid"]), int(r["cnt"]), np.asarray(r["s"])
            if c in agg:
                agg[c] = (agg[c][0] + n, agg[c][1] + s)
            else:
                agg[c] = (n, s)
        centroids = [
            (c, [round(float(x), round_decimals) for x in (s / n)])
            for c, (n, s) in sorted(agg.items())
        ]
    return centroids


def pq_train(
    df: DataFrame,
    vec_col: str,
    *,
    id_col: str = "vec_id",
    dim: int,
    n_subspaces: int,
    k: int,
    n_iter: int = 2,
    round_decimals: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: split the vector into
    ``n_subspaces`` contiguous sub-vectors and train an independent
    k-means codebook per subspace (:func:`kmeans_train` — driver-held
    centroids, map-only assignment, one partial-aggregated shuffle per
    iteration). Init per subspace = the sub-vectors of ids < k
    (deterministic, the IVF seeding rule); per-update rounding keeps every
    codebook oracle-reproducible. Returns one centroid list per subspace.

    Total driver state is n_subspaces × k × (dim/n_subspaces) doubles —
    the whole point of PQ: an 8-byte-ish code per vector referencing
    codebooks that fit anywhere."""
    if dim % n_subspaces != 0:
        raise ValueError("dim must divide evenly into subspaces")
    sub_d = dim // n_subspaces
    books: list[list[tuple[int, list[float]]]] = []
    vec = _to_double(F.col(vec_col))
    for m in range(n_subspaces):
        sub = df.select(
            F.col(id_col), F.slice(vec, m * sub_d + 1, sub_d).alias("_sub")
        )
        init_rows = sub.filter(F.col(id_col) < k).collect()
        init = [
            (int(r[id_col]), [float(x) for x in r["_sub"]])
            for r in sorted(init_rows, key=lambda r: r[id_col])
        ]
        books.append(
            kmeans_train(
                sub, "_sub", init, n_iter=n_iter, round_decimals=round_decimals
            )
        )
    return books


def pq_codes(
    df: DataFrame,
    vec_col: str,
    books: list[list[tuple[int, list[float]]]],
    *,
    id_col: str = "vec_id",
    dim: int,
) -> DataFrame:
    """Assign every vector its PQ code word: per subspace, the nearest
    codebook centroid (struct-fold argmin — pure codegen, map-only, no
    shuffle). Output: (id, code_0..code_{M-1})."""
    sub_d = dim // len(books)
    vec = _to_double(F.col(vec_col))
    cols = [F.col(id_col)]
    for m, book in enumerate(books):
        sub = F.slice(vec, m * sub_d + 1, sub_d)
        cols.append(assign_to_centroids(sub, book).alias(f"code_{m}"))
    return df.select(*cols)


def pq_adc_score(
    books: list[list[tuple[int, list[float]]]],
    query: list[float],
) -> Column:
    """Asymmetric-distance (ADC) squared-L2 approximation as a pure
    Catalyst expression over the code columns: per subspace a
    code→distance literal map (k entries, computed driver-side from the
    query sub-vector), summed across subspaces — scanning codes only, the
    vectors never load. The map entries are plain Python float sums in
    subspace-dim order so an engine replicating the same arithmetic gets
    identical doubles."""
    n_sub = len(books)
    sub_d = len(query) // n_sub
    total: Column | None = None
    for m, book in enumerate(books):
        q_sub = query[m * sub_d : (m + 1) * sub_d]
        entries: list[Column] = []
        for cid, cent in book:
            d = 0.0
            for a, b in zip(q_sub, cent):
                d += (a - b) * (a - b)
            entries.extend([F.lit(int(cid)), F.lit(float(d))])
        lookup = F.create_map(*entries)[F.col(f"code_{m}")]
        total = lookup if total is None else total + lookup
    return total
