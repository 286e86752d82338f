"""Skew-handling operators: hot-key detection and salted joins.

AQE's skew-join splitting (enabled in session.py) already rescues sort-merge
joins whose *partitions* are oversized, but it cannot help when a single join
KEY is hot — all of that key's rows still meet in one task. The classic fix
is salting: spread the big side's hot keys across N sub-keys and replicate
the matching small-side rows N times, so the hot key's work lands on N tasks.

These helpers keep the decision explicit and measurable:

- ``hot_keys``      — one aggregate pass returning keys whose row count
                      exceeds a threshold (run it on a sample at 100 TB).
- ``salted_join``   — equi-join with the big side salted uniformly at random
                      and the small side exploded across all salts. Result is
                      row-identical to the plain join (verified in tests);
                      cost is small-side replication ×N, which is the right
                      trade whenever small × N ≪ big's hot-key mass.

Only the *small* side is replicated, and the salt column is dropped before
returning — callers see plain join semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def hot_keys(
    df: DataFrame, keys: Sequence[str], min_count: int, top: int = 100
) -> DataFrame:
    """Keys with at least ``min_count`` rows, heaviest first — the diagnostic
    run before choosing a salting factor. Single partial+final aggregate; at
    corpus scale point it at a ``.sample()`` and scale min_count down."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )


def key_skew_profile(df: DataFrame, key: str, label: str | None = None) -> DataFrame:
    """One-row skew profile of ``key`` as a shuffle/partition key: distinct
    keys, rows, the heaviest key's row count, ``skew_ratio`` (max/avg — 1.0
    is perfectly uniform) and ``top_key_share`` (fraction of all rows on the
    hottest key). This is the number that decides between a plain hash
    join, AQE skew splitting, or ``salted_join`` — measured, not guessed.

    Two map-side-combinable aggregates (per-key count, then a global fold);
    the ratios divide exact integers so the profile is engine-deterministic.
    NULL keys count as one group, exactly as a shuffle would hash them.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("__cnt"))
    return counts.agg(
        F.lit(label or key).alias("shuffle_key"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__cnt").alias("n_rows"),
        F.max("__cnt").alias("max_rows_per_key"),
        # max·n_keys in DOUBLE: both factors are row-scale longs, so the
        # long product overflows 2^63 around 1e10 keys × 1e10-row hot key
        # (a real 100 TB shape) — ANSI off would wrap silently into a
        # nonsense skew_ratio (round 11 review). The ratio is diagnostic;
        # double precision is exact to 2^53 and fine past it.
        F.round(
            (F.max("__cnt").cast("double") * F.count(F.lit(1)))
            / F.sum("__cnt").cast("double"),
            4,
        ).alias("skew_ratio"),
        F.round(
            F.max("__cnt") / F.sum("__cnt").cast("double"), 6
        ).alias("top_key_share"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted into
    ``n_salts`` sub-keys.

    The big side gets a uniform random salt (row-independent, so the hot
    key's rows scatter across ``n_salts`` shuffle partitions); the small side
    is cross-joined with the 0..n_salts-1 range so every (key, salt) probe
    finds its match. Supports 'inner' and 'left' (the salted small side stays
    complete, so left semantics survive).

    The salt is ALWAYS seeded: ``F.rand(seed)`` is deterministic per
    (partition, row position), so a stage retry recomputes identical salts.
    An unseeded rand would re-salt recomputed partitions differently from the
    shuffle blocks already fetched — silently duplicating/losing join rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if seed is None:
        raise ValueError(
            "salted_join requires a seed: unseeded rand() re-salts recomputed "
            "partitions differently on task retry, corrupting join results"
        )
    if "_salt" in big.columns or "_salt" in small.columns:
        # round 11 review: withColumn would silently OVERWRITE an existing
        # _salt on the big side, and select("*", salts) would emit a
        # duplicate column on the small side
        raise ValueError(
            "salted_join reserves the column name '_salt'; rename it on "
            "the input frames first"
        )
    salt = (F.rand(seed) * n_salts).cast("int")
    big_s = big.withColumn("_salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_s = small.select("*", salts)
    joined = big_s.join(small_s, [*on, "_salt"], how)
    return joined.drop("_salt")
